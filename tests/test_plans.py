"""Physical-plan property tests — correctness of the SCALE behavior,
not the values: filters reach the parquet scan, projection prunes the
read schema, small dims broadcast, aggregates shuffle exactly once.
(The reference relied on Athena for all of this invisibly,
reference README.md:29-31; here it's asserted.)"""

from __future__ import annotations

from data_pipeline_spark_spark.operators.relational import (
    agg_basic,
    filter_pred,
    join_broadcast,
    project,
    sort_limit,
)
from data_pipeline_spark_spark.plans.analyze import (
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    scan_columns,
    shuffle_count,
)


def test_filter_pushdown(spark, sf_dir):
    df = filter_pred(spark, sf_dir)
    pf = pushed_filters(df)
    # the scan itself must receive the predicates
    assert "l_shipdate" in pf and "l_returnflag" in pf
    assert "IsNotNull" in pf


def test_column_pruning(spark, sf_dir):
    df = project(spark, sf_dir)
    cols = scan_columns(df)
    # 3 referenced + l_discount for the computed projection
    assert set(cols) == {"l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"}


def test_broadcast_dimensions(spark, sf_dir):
    df = join_broadcast(spark, sf_dir)
    assert has_broadcast_join(df)
    # fact side never shuffles for the join itself; one exchange for the agg
    assert shuffle_count(df) <= 1


def test_agg_single_shuffle(spark, sf_dir):
    df = agg_basic(spark, sf_dir)
    assert shuffle_count(df) == 1  # partial agg → exchange → final agg


def test_sort_limit_take_ordered(spark, sf_dir):
    df = sort_limit(spark, sf_dir)
    assert "TakeOrderedAndProject" in formatted_plan(df)  # no global sort


def test_bucketed_join_is_exchange_free(spark, sf_dir):
    """join_bucketed's whole point: bucketBy(8, key) on both sides at
    write time means the join reads co-located buckets and the plan
    contains NO shuffle (Exchange) — the one-time-layout-cost vs
    every-query-shuffle trade that matters at 100 TB."""
    from data_pipeline_spark_spark.operators.scale_patterns import (
        bucketed_join_plan,
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _, plan = bucketed_join_plan(spark, sf_dir)
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP DATABASE IF EXISTS dps_bucketed_plan CASCADE")

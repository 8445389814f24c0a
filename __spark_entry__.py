"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``data_pipeline_spark_spark`` package;
this module just adapts its registry to the contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_spark_spark import registry

registry.load_all()

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: daily revenue for one
    market segment over a date range — filter + date predicate +
    3-table join + groupBy-agg + orderBy (the platform's declared
    "filtering and aggregation" core, reference README.md:4)."""
    from data_pipeline_spark_spark.operators.scalars import view_predefined

    return view_predefined(spark, SF0001).orderBy("order_date")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query key (omitted for
    non-SQL-expressible ops → rows-only check)."""
    return dict(registry.ORACLE_SQL)

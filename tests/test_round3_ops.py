"""Constructed-input semantics tests for the round-3 operators —
the oracle parity tests check fixture agreement; these pin the edge
semantics the fixtures may never exercise (ordering ties, degenerate
docs, sketch merge identity)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def test_ohlc_tie_breaks_on_event_id(spark):
    """Two events at the SAME timestamp in one bar: open/close must
    deterministically pick by (ts, event_id) struct order, not
    arrival order."""
    from data_pipeline_spark_spark.operators.analytics import ohlc_bars

    t = datetime.datetime(2024, 1, 1, 10, 15, 0)
    rows = [
        ("click", t, 7, 30.0),   # later event_id at same ts
        ("click", t, 3, 10.0),   # open: smallest (ts, event_id)
        ("click", t + datetime.timedelta(minutes=5), 9, 20.0),  # close
    ]
    ev = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    )
    [bar] = ohlc_bars(ev).collect()
    assert bar.open == 10.0
    assert bar.close == 20.0
    assert bar.high == 30.0 and bar.low == 10.0
    assert bar.n_events == 3 and bar.vol_mv == 60000


def test_repetition_stats_constructed_docs(spark):
    """'a a a a' → 3 bigrams, 1 distinct, dup_frac 2/3, top_frac 1;
    a one-token doc emits nothing."""
    from data_pipeline_spark_spark.operators.text import repetition_stats_over

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "x y x y"), (3, "solo")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats_over(docs).collect()}
    assert set(got) == {1, 2}  # doc 3 has no bigrams
    r1 = got[1]
    assert (r1.n_bigrams, r1.n_distinct_bigrams, r1.top_bigram_n) == (3, 1, 3)
    assert abs(r1.dup_bigram_frac - 2 / 3) < 1e-12
    assert r1.top_bigram_frac == 1.0
    r2 = got[2]  # bigrams: "x y", "y x", "x y" → 3 total, 2 distinct
    assert (r2.n_bigrams, r2.n_distinct_bigrams, r2.top_bigram_n) == (3, 2, 2)


def test_hll_union_equals_single_sketch(spark):
    """Sketch mergeability: unioning per-partition sketches must give
    the same estimate as one sketch over all rows — the property the
    rollup design rests on."""
    df = spark.range(5000).selectExpr("id % 4 AS part", "id % 937 AS v")
    merged = (
        df.groupBy("part")
        .agg(F.expr("hll_sketch_agg(v, 14)").alias("sk"))
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
        .collect()[0]
        .est
    )
    single = (
        df.agg(F.expr("hll_sketch_estimate(hll_sketch_agg(v, 14))").alias("est"))
        .collect()[0]
        .est
    )
    assert merged == single


def test_keep_canonical_consistency(spark, sf_dir):
    """n_kept + n_dropped == n_docs, and every cluster keeps exactly
    one member: kept count == docs − (members − clusters)."""
    from data_pipeline_spark_spark.operators.dedup import (
        dedup_cluster,
        dedup_keep_canonical,
    )

    [row] = dedup_keep_canonical(spark, sf_dir).collect()
    assert row.n_kept + row.n_dropped == row.n_docs
    members = dedup_cluster(spark, sf_dir)
    n_members = members.count()
    n_clusters = members.select("cluster_id").distinct().count()
    assert row.n_dropped == n_members - n_clusters

"""as-of join semantics on hand-built frames: inclusive <= matching,
latest-predecessor selection, inner drop of unmatched rows, key
isolation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_pipeline_spark_spark.operators.asof import asof_join


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), "L1"),  # after R1, R2 → matches R2
            (1, ts("2024-01-01 08:00:00"), "L2"),  # equal to R1 → inclusive
            (1, ts("2024-01-01 07:00:00"), "L3"),  # before everything → dropped
            (2, ts("2024-01-01 12:00:00"), "L4"),  # other key → only R3
        ],
        "k long, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 08:00:00"), "R1"),
            (1, ts("2024-01-01 09:30:00"), "R2"),
            (2, ts("2024-01-01 11:00:00"), "R3"),
            (3, ts("2024-01-01 00:00:00"), "R4"),  # key with no left rows
        ],
        "k long, t timestamp, rtag string",
    )
    out = asof_join(left, right, on="k", ts="t", right_cols=["rtag", "t"])
    got = {r.tag: (r.matched_rtag, r.matched_t) for r in out.collect()}
    assert got == {
        "L1": ("R2", ts("2024-01-01 09:30:00")),
        "L2": ("R1", ts("2024-01-01 08:00:00")),  # inclusive <=
        "L4": ("R3", ts("2024-01-01 11:00:00")),
    }
    # L3 dropped (inner semantics), R4's key never appears
    assert "L3" not in got


def test_asof_join_single_shuffle(spark):
    """The union+carry-forward formulation must not produce a
    range-join blowup: exactly one hash exchange (the window
    partitioning), no nested-loop join."""
    from data_pipeline_spark_spark.plans.analyze import formatted_plan, shuffle_count

    left = spark.range(10).select(
        F.col("id").alias("k"),
        F.timestamp_micros(F.col("id") * 1000000).alias("t"),
    )
    right = left.select("k", "t", F.lit("x").alias("v"))
    out = asof_join(left, right, on="k", ts="t", right_cols=["v"])
    plan = formatted_plan(out)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert shuffle_count(out) <= 2  # union sides co-partitioned at most once each


def test_asof_join_drops_null_ts_right_rows(spark):
    """ASOF semantics never match a right row with a NULL timestamp
    (ts >= NULL is unknown in SQL); the union+carry-forward form
    previously let a nulls-first NULL-ts payload be carried as the
    'predecessor' of every early left row (r16 self-review)."""
    import pyspark.sql.functions as F

    from data_pipeline_spark_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "k long, ts string"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, None, 99), (1, "2024-01-01 09:00:00", 7)],
        "k long, ts string, payload long",
    ).select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "payload"
    )
    out = asof_join(
        left, right, on="k", ts="ts", right_cols=["payload"]
    ).collect()
    assert len(out) == 1 and out[0]["matched_payload"] == 7
    # and with ONLY a NULL-ts right row, inner semantics drop the
    # left row entirely
    right_null = right.filter(F.col("ts").isNull())
    out2 = asof_join(
        left, right_null, on="k", ts="ts", right_cols=["payload"]
    ).collect()
    assert out2 == []

"""As-of (temporal nearest-predecessor) join.

The reference's data model is dense per-second time series
(reference random_generator.py:47-50); aligning two event streams on
"the most recent reading at or before t" is the canonical time-series
join the platform's Athena layer would express with window tricks
(SURVEY.md §2B `join_range_asof`). Spark has no native ASOF join, so
we implement it the scale-correct way:

    union the two streams tagged by side, sort within user by
    (ts, side), and carry the last left-side row forward with
    last(..., ignorenulls=True) over a running window.

This is ONE shuffle on the partition key and a linear scan — no
range-join blowup, no per-key quadratic pairing. The naive
inequality-join formulation (t2.ts <= t1.ts) degenerates to
O(n·m) per key at scale; the union+carry-forward form is the one that
survives 100 TB. DuckDB's native ASOF JOIN is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Generic as-of join: for each left row, attach the latest right
    row with right.ts <= left.ts within the same `on` key (inner
    semantics: left rows with no predecessor are dropped).

    Implementation: tag right=0 / left=1, union, and carry the last
    right-side payload forward over a (key, ts, tag) ordering. Ties at
    identical ts resolve right-before-left, i.e. `<=` (inclusive)
    semantics, matching ASOF JOIN.
    """
    r = right.select(
        F.col(on).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_payload"),
    )
    l = left.withColumn("_k", F.col(on)).withColumn("_ts", F.col(ts)).withColumn(
        "_side", F.lit(1)
    ).withColumn("_payload", F.lit(None).cast(r.schema["_payload"].dataType))

    unioned = l.unionByName(r.select("_k", "_ts", "_side", "_payload"), allowMissingColumns=True)
    w = (
        W.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    return (
        carried.filter((F.col("_side") == 1) & F.col("_match").isNotNull())
        .select(
            *[c for c in left.columns],
            *[F.col(f"_match.{c}").alias(f"matched_{c}") for c in right_cols],
        )
    )


@query(
    "join_range_asof",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id  AS user_id,
           p.ts       AS purchase_ts,
           c.event_id AS matched_event_id,
           c.ts       AS matched_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_range_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the latest click at-or-before it by the
    same user — attribution, the classic as-of query."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        purchases.withColumn("ts", F.col("purchase_ts")),
        clicks,
        on="user_id",
        ts="ts",
        right_cols=["event_id", "ts"],
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.col("matched_event_id").alias("matched_event_id"),
        F.col("matched_ts").alias("matched_ts"),
    )

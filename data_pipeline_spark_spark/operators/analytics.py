"""Event-analytics workloads: funnels and retention cohorts — the
product-analytics queries every events table ultimately serves.

The reference's platform exposes "predefined queries behind an API"
(reference README.md:16); funnel and cohort shapes are the canonical
members of that class for event data. Both are pure
groupBy/window/join compositions — one or two narrow shuffles on
user_id, no UDFs — so they run unchanged at 100 TB where the events
table is date-partitioned and the per-user state is a handful of
timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query


@query(
    "funnel_steps",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup'   THEN ts END) AS t_signup,
             MIN(CASE WHEN event_type = 'click'    THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events
      GROUP BY user_id
    )
    SELECT
      COUNT(*) AS n_users,
      COUNT(t_signup) AS step1_signup,
      COUNT(CASE WHEN t_click > t_signup THEN 1 END) AS step2_clicked_after,
      COUNT(CASE WHEN t_purchase > t_click AND t_click > t_signup
                 THEN 1 END) AS step3_purchased_after
    FROM per_user
    """,
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup → click → purchase: a user
    advances a step only if that step's FIRST occurrence comes after
    the previous step's first occurrence (strict event-order
    semantics, not mere co-occurrence). One conditional aggregation
    collapses each user to three timestamps — shuffle bytes ∝ users,
    not events — then the step predicates are pure column comparisons
    (NULL timestamps fail every > test, so missing steps drop out of
    later counts for free)."""
    e = load(spark, sf_dir, "events")

    def first_ts(step: str):
        return F.min(F.when(F.col("event_type") == step, F.col("ts")))

    per_user = e.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    step2 = F.col("t_click") > F.col("t_signup")
    step3 = (F.col("t_purchase") > F.col("t_click")) & step2
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("t_signup").alias("step1_signup"),
        F.count(F.when(step2, 1)).alias("step2_clicked_after"),
        F.count(F.when(step3, 1)).alias("step3_purchased_after"),
    )


@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
      FROM events
    )
    SELECT f.cohort_week,
           CAST(floor(date_diff('day', f.cohort_week, a.active_week) / 7) AS INT)
             AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_active
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY f.cohort_week, week_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-seen week,
    counted distinct in each subsequent week — the (cohort_week,
    week_offset, n_active) triangle behind every retention chart.
    Week offsets are day-difference ÷ 7 (floored) rather than each
    engine's week-diff function, whose boundary-crossing semantics
    differ between engines; day math is identical everywhere.

    Two shuffles: first-seen per user (bytes ∝ users), then the
    cohort × week distinct count over the deduplicated
    (user, week) activity — at 100 TB the DISTINCT pre-shrink is what
    keeps the second shuffle proportional to users × active-weeks,
    not raw events."""
    e = load(spark, sf_dir, "events")
    wk = lambda c: F.date_trunc("week", c).cast("date")  # noqa: E731
    firsts = e.groupBy("user_id").agg(wk(F.min("ts")).alias("cohort_week"))
    activity = e.select("user_id", wk(F.col("ts")).alias("active_week")).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count_distinct(F.col("user_id")).alias("n_active"))
    )


@query(
    "ts_resample_ohlc",
    oracle="""
    WITH t AS (
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bar_start,
             value, ts, event_id
      FROM events
    ),
    r AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY event_type, bar_start
                                ORDER BY ts, event_id) AS ra,
             ROW_NUMBER() OVER (PARTITION BY event_type, bar_start
                                ORDER BY ts DESC, event_id DESC) AS rd
      FROM t
    )
    SELECT event_type, bar_start,
           MAX(CASE WHEN ra = 1 THEN value END) AS open,
           MAX(CASE WHEN rd = 1 THEN value END) AS close,
           MAX(value) AS high,
           MIN(value) AS low,
           COUNT(*)   AS n_events,
           CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS vol_mv
    FROM r GROUP BY event_type, bar_start
    """,
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsample to 1-hour OHLC bars per event_type —
    the hypertable-rollup shape (open/close/high/low/count/volume per
    bucket). One hash aggregation: open/close ride min_by/max_by over
    the (ts, event_id) ordering struct, so first/last per bar need NO
    window sort — every aggregate here partial-aggregates map-side and
    the shuffle carries one row per (type, bar), not per event. The
    oracle derives the same bars with the portable double-ROW_NUMBER
    form (SQL has no ordered-first aggregate), which is exactly the
    plan this operator avoids at scale. Volume travels as exact
    milli-units so no cross-engine float rounding."""
    return ohlc_bars(load(spark, sf_dir, "events"))


def ohlc_bars(ev: DataFrame) -> DataFrame:
    """OHLC bars over any (event_type, ts, event_id, value) frame —
    the reusable core behind [[ts_resample_ohlc]]."""
    return (
        ev.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("bar_start"),
            "value",
            "ts",
            "event_id",
        )
        .groupBy("event_type", "bar_start")
        .agg(
            F.expr("min_by(value, struct(ts, event_id))").alias("open"),
            F.expr("max_by(value, struct(ts, event_id))").alias("close"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 1000).cast("bigint")).alias("vol_mv"),
        )
    )

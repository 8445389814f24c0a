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
    right-side payload forward over a (key, ts, tag, payload) ordering.
    Ties at identical ts resolve right-before-left, i.e. `<=`
    (inclusive) semantics, matching ASOF JOIN. Among multiple RIGHT
    rows sharing an identical (key, ts), the payload struct itself is
    the final ordering term, so the carried match is deterministically
    the MAX payload (field-lexicographic) — engines' native ASOF picks
    an arbitrary one here, so oracles must pre-dedup or accept this
    documented tie rule if fixtures ever contain such duplicates.
    """
    r = right.select(
        F.col(on).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_payload"),
        # NULL-ts right rows sort nulls-first and would be carried
        # as "predecessors" of every early left row; ASOF semantics
        # (and DuckDB's native form, where ts >= NULL is unknown)
        # never match them — drop before the union (r16 self-review;
        # the fixture has no NULL ts, callers with nullable
        # timestamps do)
    ).filter(F.col("_ts").isNotNull())
    l = left.withColumn("_k", F.col(on)).withColumn("_ts", F.col(ts)).withColumn(
        "_side", F.lit(1)
    ).withColumn("_payload", F.lit(None).cast(r.schema["_payload"].dataType))

    unioned = l.unionByName(r.select("_k", "_ts", "_side", "_payload"), allowMissingColumns=True)
    w = (
        W.partitionBy("_k")
        .orderBy("_ts", "_side", "_payload")
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


@query(
    "ts_gap_fill",
    oracle="""
    WITH e AS (SELECT user_id, ts, value FROM events),
    bounds AS (
      SELECT user_id,
             date_trunc('hour', MIN(ts)) AS t0,
             date_trunc('hour', MAX(ts)) AS t1
      FROM e GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS grid_ts
      FROM bounds
    )
    SELECT g.user_id, g.grid_ts, ev.value AS last_value
    FROM grid g
    ASOF JOIN e ev ON g.user_id = ev.user_id AND g.grid_ts >= ev.ts
    """,
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling with last-observation-carried-forward (LOCF) — the
    hypertable resampling op: irregular per-user event streams become
    a dense hourly grid, each grid point carrying the most recent
    observed value at-or-before it. The dashboard/feature-store
    primitive for "state of every entity at every hour".

    The grid is generated per user between that user's first and last
    hour (sequence + explode — no driver-side loop, grid size ∝
    entity lifetimes, not global span), then filled by the same
    union+carry-forward `asof_join` used for attribution: one shuffle
    on user_id, linear scan within. Grid points before a user's first
    observation have nothing to carry and drop (inner as-of), exactly
    DuckDB's native ASOF JOIN semantics — which is the oracle. The
    carried value is an untouched double (no arithmetic), so both
    engines emit bit-identical fills."""
    e = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    bounds = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("t0", "t1", F.expr("interval 1 hour"))).alias("ts"),
    )
    filled = asof_join(grid, e, on="user_id", ts="ts", right_cols=["value"])
    return filled.select(
        "user_id",
        F.col("ts").alias("grid_ts"),
        F.col("matched_value").alias("last_value"),
    )


_NEAREST_SQL = """
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click'),
    prev AS (
      SELECT p.event_id AS purchase_id, c.event_id AS prev_id, c.ts AS prev_ts
      FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    ),
    nxt AS (
      SELECT p.event_id AS purchase_id, c.event_id AS next_id, c.ts AS next_ts
      FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts
    )
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.ts AS purchase_ts,
           CASE
             WHEN nxt.next_id IS NULL THEN prev.prev_id
             WHEN prev.prev_id IS NULL THEN nxt.next_id
             WHEN (p.ts - prev.prev_ts) <= (nxt.next_ts - p.ts) THEN prev.prev_id
             ELSE nxt.next_id
           END AS matched_event_id
    FROM p
    LEFT JOIN prev ON p.event_id = prev.purchase_id
    LEFT JOIN nxt ON p.event_id = nxt.purchase_id
    WHERE prev.prev_id IS NOT NULL OR nxt.next_id IS NOT NULL
"""


@query("join_asof_nearest", oracle=_NEAREST_SQL)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-timestamp join in EITHER direction: each purchase is
    matched to the click closest in time by the same user — before or
    after — with ties at equal distance resolved to the earlier
    (backward) side. The "closest reading" variant of the as-of
    family (sensor alignment, nearest-quote matching).

    Same union+carry-forward machinery as [[asof_join]], run in both
    directions over ONE shuffle: the forward window carries the last
    click at-or-before each purchase, the mirrored window (ordered
    descending) carries the first click at-or-after, then a CASE
    picks the nearer side. Still one exchange on the key and two
    linear window passes over the same sort — no range-join blowup.
    The DuckDB oracle composes two native ASOF JOINs (>= and <=) and
    applies the same tie rule."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("pts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("cts")
    )
    l = p.select(
        F.col("user_id").alias("_k"),
        F.col("pts").alias("_ts"),
        F.lit(1).alias("_side"),
        F.col("purchase_id"),
        F.lit(None).cast("long").alias("_cid"),
    )
    r = c.select(
        F.col("user_id").alias("_k"),
        F.col("cts").alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.col("click_id").alias("_cid"),
    )
    u = l.unionByName(r)
    # forward pass: last click at-or-before (right sorts before left
    # at equal ts → inclusive <=); backward pass mirrors it
    w_prev = (
        W.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_cid").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_next = (
        W.partitionBy("_k")
        .orderBy(F.col("_ts").desc(), F.col("_side").asc(), F.col("_cid").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    prev_s = F.struct(F.col("_ts").alias("ts"), F.col("_cid").alias("id"))
    both = (
        u.withColumn(
            "_prev",
            F.last(F.when(F.col("_side") == 0, prev_s), ignorenulls=True).over(w_prev),
        )
        .withColumn(
            "_next",
            F.last(F.when(F.col("_side") == 0, prev_s), ignorenulls=True).over(w_next),
        )
        .filter((F.col("_side") == 1) & (F.col("_prev").isNotNull() | F.col("_next").isNotNull()))
    )
    dt_prev = F.unix_micros(F.col("_ts")) - F.unix_micros(F.col("_prev.ts"))
    dt_next = F.unix_micros(F.col("_next.ts")) - F.unix_micros(F.col("_ts"))
    matched = F.when(F.col("_next").isNull(), F.col("_prev.id")).when(
        F.col("_prev").isNull(), F.col("_next.id")
    ).when(dt_prev <= dt_next, F.col("_prev.id")).otherwise(F.col("_next.id"))
    return both.select(
        "purchase_id",
        F.col("_k").alias("user_id"),
        F.col("_ts").alias("purchase_ts"),
        matched.alias("matched_event_id"),
    )

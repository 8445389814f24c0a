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
from ..functions.exact import (
    md5_u32_col,
    md5_u32_duck,
    md5_u32_sql,
    micro_ln,
    wide_sum,
)
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


_INTERP_SQL = """
    WITH e AS (
      SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS hr,
             AVG(value) AS v
      FROM events GROUP BY user_id, hr
    ),
    bounds AS (SELECT user_id, MIN(hr) AS t0, MAX(hr) AS t1
               FROM e GROUP BY user_id),
    grid AS (
      SELECT user_id,
             unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hr
      FROM bounds
    ),
    g AS (
      SELECT grid.user_id, grid.hr, e.v
      FROM grid LEFT JOIN e ON grid.user_id = e.user_id
                           AND grid.hr = e.hr
    ),
    f AS (
      SELECT user_id, hr, v,
        LAST_VALUE(v IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY hr
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        LAST_VALUE(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY hr
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
        FIRST_VALUE(v IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY hr
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        FIRST_VALUE(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY hr
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      FROM g
    )
    SELECT user_id, hr AS grid_ts,
      CASE WHEN v IS NOT NULL THEN v
           WHEN pv IS NULL THEN nv
           WHEN nv IS NULL THEN pv
           ELSE pv + (nv - pv) *
                (CAST(CAST(floor(epoch(hr)) AS BIGINT)
                      - CAST(floor(epoch(ph)) AS BIGINT) AS DOUBLE)
                 / CAST(CAST(floor(epoch(nh)) AS BIGINT)
                        - CAST(floor(epoch(ph)) AS BIGINT) AS DOUBLE))
      END AS value_interp,
      CASE WHEN v IS NOT NULL THEN 0 ELSE 1 END AS filled
    FROM f
"""


@query("ts_interpolate", oracle=_INTERP_SQL)
def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over a dense per-user hourly grid — the
    companion to [[ts_gap_fill]]'s LOCF: missing hours get
    pv + (nv-pv) * elapsed-fraction between the bracketing
    observations (leading/trailing gaps take the nearest observation).
    Same scale shape as the gap-fill: grid ∝ entity lifetimes, one
    window sort per user, O(1) carried state in each direction.
    The interpolation arithmetic is written identically in both
    engines (exact integer second-deltas, one divide, one
    multiply-add) so results agree to the oracle's float tolerance;
    the hourly AVG differs only by summation order."""
    from pyspark.sql.window import Window

    e = (
        load(spark, sf_dir, "events")
        .groupBy(
            "user_id", F.date_trunc("hour", "ts").alias("hr")
        )
        .agg(F.avg("value").alias("v"))
    )
    bounds = e.groupBy("user_id").agg(
        F.min("hr").alias("t0"), F.max("hr").alias("t1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("t0", "t1", F.expr("interval 1 hour"))
        ).alias("hr"),
    )
    g = grid.join(e, ["user_id", "hr"], "left")
    back = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hr = F.when(F.col("v").isNotNull(), F.col("hr"))
    f = g.select(
        "user_id",
        "hr",
        "v",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.last(obs_hr, ignorenulls=True).over(back).alias("ph"),
        F.first("v", ignorenulls=True).over(fwd).alias("nv"),
        F.first(obs_hr, ignorenulls=True).over(fwd).alias("nh"),
    )
    sec = lambda c: F.col(c).cast("long")  # noqa: E731
    frac = (sec("hr") - sec("ph")).cast("double") / (
        (sec("nh") - sec("ph")).cast("double")
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return f.select(
        "user_id",
        F.col("hr").alias("grid_ts"),
        interp.alias("value_interp"),
        F.when(F.col("v").isNotNull(), F.lit(0)).otherwise(F.lit(1)).alias("filled"),
    )


_TWA_SQL = """
    WITH o AS (
      SELECT user_id,
             CAST(round(value * 1000) AS BIGINT) AS v_mv,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             LEAD(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    w AS (
      SELECT user_id,
             SUM(CASE WHEN nxt IS NULL THEN 0
                      ELSE v_mv * (nxt - sec) END) AS num,
             SUM(CASE WHEN nxt IS NULL THEN 0 ELSE nxt - sec END) AS den,
             COUNT(*) AS n_obs,
             SUM(v_mv) AS sum_mv
      FROM o GROUP BY user_id
    )
    SELECT user_id, n_obs,
           CASE WHEN den > 0
                THEN CAST(num AS DOUBLE) / (1000.0 * CAST(den AS DOUBLE))
                ELSE CAST(sum_mv AS DOUBLE) / (1000.0 * n_obs)
           END AS twa
    FROM w
"""


@query("window_twa", oracle=_TWA_SQL)
def window_twa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user over irregular samples — the
    hypertable `time_weight` aggregate: each observation holds (LOCF
    step interpolation) until the next one, so its weight is the
    seconds until the next sample; the final sample carries no
    weight. Degenerate series (one sample, or all samples at one
    instant) fall back to the plain mean.

    Numerics are EXACT until the last division: values travel as
    integer milli-units, timestamps as integer seconds, so the
    weighted numerator/denominator are bigint sums (associative —
    partial aggregation and any merge order give identical results,
    unlike double summation) and the one double division at the end
    is the same IEEE operation in both engines. One window sort per
    user (shuffle ∝ observations, O(1) lookahead state), then an
    ordinary partial-aggregating groupBy — the same two-phase shape
    at any scale."""
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.round(F.col("value") * 1000).cast("bigint").alias("v_mv"),
        F.col("ts").cast("long").alias("sec"),
        "ts",
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "user_id", "v_mv", "sec", F.lead("sec").over(w).alias("nxt")
    )
    weighted = o.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("nxt").isNull(), F.lit(0)).otherwise(
                F.col("v_mv") * (F.col("nxt") - F.col("sec"))
            )
        ).alias("num"),
        F.sum(
            F.when(F.col("nxt").isNull(), F.lit(0)).otherwise(
                F.col("nxt") - F.col("sec")
            )
        ).alias("den"),
        F.count("*").alias("n_obs"),
        F.sum("v_mv").alias("sum_mv"),
    )
    twa = F.when(
        F.col("den") > 0,
        F.col("num").cast("double") / (F.lit(1000.0) * F.col("den").cast("double")),
    ).otherwise(
        F.col("sum_mv").cast("double") / (F.lit(1000.0) * F.col("n_obs"))
    )
    return weighted.select("user_id", "n_obs", twa.alias("twa"))


_AFFINITY_SQL = """
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    item AS (SELECT l_partkey, COUNT(*) AS n_item FROM b GROUP BY l_partkey),
    tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM b),
    pair AS (
      SELECT a.l_partkey AS part_a, c.l_partkey AS part_b, COUNT(*) AS n_pair
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY part_a, part_b
      HAVING COUNT(*) >= 2
    )
    SELECT p.part_a, p.part_b, p.n_pair,
           ia.n_item AS n_a, ib.n_item AS n_b,
           CAST(p.n_pair * t.n_baskets AS DOUBLE)
             / CAST(ia.n_item * ib.n_item AS DOUBLE) AS lift
    FROM pair p
    JOIN item ia ON p.part_a = ia.l_partkey
    JOIN item ib ON p.part_b = ib.l_partkey
    CROSS JOIN tot t
"""


# A basket of 10k+ distinct items is pathological (k(k-1)/2 pair
# fan-out); capping the sorted item array bounds it. TPC-H orders top
# out at 7 lineitems, so the cap never binds on the fixtures and the
# SQL oracle needs no matching clause; when it binds, pair counts
# become a lower bound for pairs involving the truncated tail.
_BASKET_ITEM_CAP = 10_000

# Pair-support floor, shared by the support filter in
# _basket_affinity_from AND the Apriori item prune in
# _apriori_pruned_fact: the prune is only output-invariant because
# its item threshold equals the pair threshold (a pair with support
# ≥ S needs both items in ≥ S baskets) — two hardcoded copies would
# silently desync.
_MIN_SUPPORT = 2


def _basket_affinity_from(
    fact: DataFrame,
    width: int,
    tot: DataFrame | None = None,
    item_cap: int | None = _BASKET_ITEM_CAP,
) -> DataFrame:
    """Shared pair/lift tail: build per-order sorted item-set baskets
    from ``fact`` (one data-proportional shuffle), expand pairs
    in-row, and attach counts as broadcasts. ``width`` is the pinned
    repartition width, computed by the CALLER from the raw scan:
    calling adaptive_shuffle_width on a frame that already contains
    exchanges (the Apriori variant's semi-join build side) would
    force AQE to materialize those stages at plan-construction time —
    running the frequent-item job twice per execution. ``tot`` is a
    lazy 1-row (n_baskets) frame; when None it is derived as a cheap
    O(P) count of the checkpointed basket rows — correct ONLY for an
    unpruned fact stream (the Apriori variant must count unpruned
    orders and supplies its own). ``item_cap`` bounds a mega-basket's
    k²/2 pair fan-out by keeping the sorted-first cap items (``None``
    disables — the skew stress measures the blowup both ways); when
    it binds, pairs among the truncated tail are UNDER-counted (the
    documented lower-bound accounting, asserted by
    tests/test_round12_ops.py::test_basket_item_cap_accounting)."""
    min_support = _MIN_SUPPORT
    baskets = (
        fact
        # pinned data-adaptive width: AQE's size-based coalescing
        # would squeeze the CPU-bound k²/2 pair expansion to ~1 task
        # because the basket arrays are few MB (measured 1.23 s with a
        # blanket 32-wide repartition vs 0.94 s adaptive at sf0.1)
        .repartition(width, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("items"))
        .select(
            (
                F.slice("items", 1, item_cap)
                if item_cap is not None
                else F.col("items")
            ).alias("items")
        )
        # baskets feed the pair expansion and the item counts — a lazy
        # localCheckpoint materializes the post-shuffle arrays once
        # instead of re-scans of the fact table (same pattern as
        # shard_pack, training_data.py)
        .localCheckpoint(eager=False)
    )
    if tot is None:
        tot = baskets.select(F.count("*").alias("n_baskets"))
    # the item dictionary feeds TWO broadcasts (part_a and part_b
    # sides); their renamed Projects canonicalize differently, so
    # without a pin the explode+count aggregate runs once per
    # broadcast. A lazy localCheckpoint shares one compute. Priced
    # deliberately (r11 solo decomposition, docs/SCALE.md): sharing
    # costs ~+0.1 s at sf0.1 versus the duplicated form because the
    # pin SERIALIZES the dict materialization that previously hid
    # inside the two concurrent broadcast-build threads — but the
    # duplicated form runs the corpus-proportional exploded-stream
    # aggregate twice, which is 2× that stage's cluster work at the
    # 100 TB target, so the wall cost at fixture scale is the right
    # trade. (Also measured and declined: aliasing one frame for
    # both joins hoping ReuseExchange dedupes the broadcasts — the
    # exchanges still canonicalize differently, 0 reuse; and r9's
    # grouping-sets fold of n_baskets into this aggregate, 0.73 s
    # vs 0.68 s.)
    item = (
        baskets.select(F.explode("items").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n_item"))
        .localCheckpoint(eager=False)
    )
    # in-basket pair expansion: items is a sorted set, so pairing each
    # element with its strict successors yields exactly the distinct
    # part_a < part_b pairs — all inside the row, JVM-side. Two
    # chained GENERATORS (posexplode, then explode of the successor
    # slice) rather than nested higher-order transform lambdas: lambda
    # expressions are interpreted (excluded from whole-stage codegen),
    # which measured 2-4× slower on the fan-out stage and JIT-warmed
    # far more slowly; generators keep the expansion inside codegen.
    # NB graph._co_order_edges carries a deliberate twin of this
    # expansion (minus the basket-only knobs) — a fix to the slice
    # arithmetic here must be applied there too (r16 self-review).
    pair = (
        baskets.select(
            F.posexplode("items").alias("i", "part_a"), "items"
        )
        .select(
            "part_a",
            F.explode(
                F.slice("items", F.col("i") + F.lit(2), F.size("items"))
            ).alias("part_b"),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= min_support)
    )
    # the item dictionary is dimension-sized, so both count joins and
    # the 1-row total attach as BROADCASTS — the post-aggregation pair
    # table never reshuffles
    ia = item.toDF("part_a", "n_a")
    ib = item.toDF("part_b", "n_b")
    out = (
        pair.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .crossJoin(F.broadcast(tot))
    )
    lift = (F.col("n_pair") * F.col("n_baskets")).cast("double") / (
        F.col("n_a") * F.col("n_b")
    ).cast("double")
    return out.select(
        "part_a", "part_b", "n_pair", "n_a", "n_b", lift.alias("lift")
    )


@query("basket_pair_affinity", oracle=_AFFINITY_SQL)
def basket_pair_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair affinity: co-occurrence count and lift for
    every part pair appearing in ≥ 2 orders. The pair explosion is the
    classic scale hazard (a k-item basket emits k(k-1)/2 pairs), and
    the defenses are coded, not prose:

    - **One fact-table shuffle.** ``groupBy(l_orderkey).agg(
      collect_set(l_partkey))`` is the only shuffle that touches
      lineitem-sized data (collect_set dedups, so no separate
      ``.distinct()`` pass). Pair generation is then a per-basket
      array expansion inside the already-grouped row — no self-join,
      so the fact table is never shuffled twice, and the pair rows
      born from one basket never cross an executor boundary before
      their own (small, post-fanout) groupBy.
    - **Per-basket item cap** (``_BASKET_ITEM_CAP``): bounds the
      quadratic fan-out of a pathological mega-basket; a no-op on
      TPC-H (max 7 items/order).
    - **Broadcast count joins**: item counts and the 1-row basket
      total attach to the support-filtered pair table as broadcasts
      (``_basket_affinity_from``).
    - **Apriori prune**: the long-tail saver lives in
      [[basket_pair_affinity_apriori]] — a broadcast semi-join that
      drops can't-reach-support items from the fact STREAM before the
      basket shuffle. It is a separate registered rung (same oracle)
      rather than the default because its extra counting pass only
      pays for itself when the item dictionary has a single-occurrence
      tail, which TPC-H's uniform part distribution lacks. A per-row
      ``array_intersect`` against a broadcast frequent array — the
      obvious in-plan alternative — re-builds the 20k-element hash set
      for EVERY basket row (measured 16.8 s vs 0.94 s at sf0.1) and is
      exactly the wrong shape.

    Lift's numerator and denominator are exact bigint products, so the
    single double division is bit-identical in both engines."""
    from ..session import adaptive_shuffle_width

    fact = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    return _basket_affinity_from(fact, adaptive_shuffle_width(fact))


@query("basket_pair_affinity_apriori", oracle=_AFFINITY_SQL)
def basket_pair_affinity_apriori(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """[[basket_pair_affinity]] with the Apriori candidate prune coded
    as a first pass — the 100 TB rung. A pair with basket support ≥ S
    needs both items in ≥ S baskets, and the RAW per-part row count is
    an upper bound on basket support, so one cheap map-side-combined
    ``groupBy(l_partkey).count()`` over the scan yields a frequent-item
    set that a broadcast SEMI-join applies to the fact stream BEFORE
    the basket shuffle: on a power-law dictionary the single-occurrence
    tail (often most of the items) never enters the shuffle or the
    k²/2 expansion. Two subtleties make the prune exact rather than
    approximate:

    - ``n_baskets`` is counted from the UNPRUNED stream (an order
      whose items are all infrequent still counts toward every lift
      denominator's total), via a distinct-orderkey aggregate whose
      map-side partials shrink it to O(orders).
    - item counts for surviving pairs are unchanged by the prune
      (only infrequent items are removed, and no surviving pair
      touches one), so they derive from the pruned baskets as usual.

    On TPC-H fixtures the prune drops nothing (every part recurs), so
    this rung measures the prune's fixed cost (~+0.2 s at sf0.1) and
    shares the oracle verbatim; at scale the cost inverts — the saved
    fan-out is the difference between a runnable and an unrunnable
    basket job."""
    from ..session import adaptive_shuffle_width

    fact = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    tot = fact.groupBy().agg(
        F.count_distinct("l_orderkey").alias("n_baskets")
    )
    # width from the RAW scan — the pruned frame contains exchanges
    # and probing its partitioning would materialize them eagerly
    width = adaptive_shuffle_width(fact)
    return _basket_affinity_from(_apriori_pruned_fact(fact), width, tot)


def _apriori_pruned_fact(fact: DataFrame) -> DataFrame:
    """Broadcast-SEMI-join the fact stream against its own frequent
    items (raw count ≥ 2, an upper bound on basket support). Module-
    level so tests can explain THIS fragment: the downstream lazy
    checkpoint truncates it out of the full query's physical plan."""
    freq = (
        fact.groupBy("l_partkey")
        .agg(F.count("*").alias("n_raw"))
        .filter(F.col("n_raw") >= _MIN_SUPPORT)
        .select("l_partkey")
    )
    return fact.join(F.broadcast(freq), "l_partkey", "semi")


_MAD_SQL = """
    WITH m AS (
      SELECT event_type, ROUND(median(value), 4) AS med
      FROM events GROUP BY event_type
    ),
    md AS (
      SELECT e.event_type,
             ROUND(median(ABS(e.value - m.med)), 4) AS mad
      FROM events e JOIN m USING (event_type)
      GROUP BY e.event_type
    )
    SELECT e.event_type, m.med, md.mad,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN ABS(e.value - m.med) > 3 * md.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e
    JOIN m USING (event_type) JOIN md USING (event_type)
    GROUP BY e.event_type, m.med, md.mad
"""


@query("ts_anomaly_mad", oracle=_MAD_SQL)
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per series: median absolute deviation
    (MAD) thresholding, the estimator that survives the outliers it
    hunts (mean/stddev z-scores get dragged by the anomalies
    themselves — [[udf_grouped_zscore]] is that fragile form). Two
    grouped exact medians (value, then |value − med|), each joined
    back broadcast, then one counting pass flagging |v − med| >
    3·MAD.

    Cross-engine determinism: the medians are rounded to 4 decimals
    BEFORE entering the threshold predicate (even-sized groups
    interpolate (a+b)/2 and engines may differ in the last ulp — see
    [[agg_median_exact]]); from rounded med/mad on, every comparison
    input is bit-identical in both engines, so the outlier counts
    agree exactly. At 100 TB: exact medians buffer per group — for
    high-cardinality series keys switch both passes to
    percentile_approx and re-round."""
    e = load(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.round(F.median("value"), 4).alias("med")
    )
    d = e.join(F.broadcast(med), "event_type")
    mad = d.groupBy("event_type").agg(
        F.round(F.median(F.abs(F.col("value") - F.col("med"))), 4).alias("mad")
    )
    j = d.join(F.broadcast(mad), "event_type")
    return j.groupBy("event_type", "med", "mad").agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.when(
                F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_outliers"),
    )


# ---------------------------------------------------------------------------
# LTTB downsampling (time-series visualization)
# ---------------------------------------------------------------------------

#: Output points per series (first + last + 6 interior buckets).
_LTTB_B = 8


def _lttb_sql() -> str:
    """Unrolled-LTTB oracle: with B fixed at 8, the sequential bucket
    selection becomes 6 chained CTEs (sel1..sel6) — no recursive
    aggregate needed. All geometry is exact int64: t in floored epoch
    seconds, v in milli-units, and the triangle area comparison is
    cross-multiplied by the next-bucket count so no division exists
    anywhere."""
    inner = _LTTB_B - 2
    ctes = [
        f"""pts AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS t,
             CAST(round(value * 1000) AS BIGINT) AS v,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(floor(epoch(ts)) AS BIGINT),
                                         event_id) - 1 AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM events WHERE event_type = 'view'
    )""",
        f"""bkt AS (
      SELECT *, CASE WHEN rn = 0 THEN 0
                     WHEN rn = n - 1 THEN {_LTTB_B - 1}
                     ELSE 1 + ((rn - 1) * {inner}) // (n - 2) END AS b
      FROM pts WHERE n >= {_LTTB_B}
    )""",
        """sel0 AS (
      SELECT user_id, t AS sel_t, v AS sel_v FROM bkt WHERE rn = 0
    )""",
    ]
    for i in range(1, inner + 1):
        if i < inner:
            nxt = (
                f"nxt{i} AS (SELECT user_id, SUM(t) AS st, SUM(v) AS sv,"
                f" COUNT(*) AS cn FROM bkt WHERE b = {i + 1}"
                f" GROUP BY user_id)"
            )
        else:
            nxt = (
                f"nxt{i} AS (SELECT user_id, t AS st, v AS sv,"
                f" CAST(1 AS BIGINT) AS cn FROM bkt WHERE rn = n - 1)"
            )
        ctes.append(nxt)
        ctes.append(f"""sel{i} AS (
      SELECT user_id, sel_t, sel_v FROM (
        SELECT c.user_id, c.t AS sel_t, c.v AS sel_v,
               row_number() OVER (PARTITION BY c.user_id ORDER BY
                 abs((p.sel_t * x.cn - x.st) * (c.v - p.sel_v)
                     - (p.sel_t - c.t) * (x.sv - p.sel_v * x.cn)) DESC,
                 c.t ASC, c.event_id ASC) AS r
        FROM bkt c
        JOIN sel{i - 1} p USING (user_id)
        JOIN nxt{i} x USING (user_id)
        WHERE c.b = {i}
      ) WHERE r = 1
    )""")
    unions = ["SELECT user_id, 0 AS bucket_idx, sel_t, sel_v FROM sel0"] + [
        f"SELECT user_id, {i} AS bucket_idx, sel_t, sel_v FROM sel{i}"
        for i in range(1, inner + 1)
    ] + [
        f"SELECT user_id, {_LTTB_B - 1} AS bucket_idx, t AS sel_t,"
        f" v AS sel_v FROM bkt WHERE rn = n - 1"
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(unions)


@query("ts_downsample_lttb", oracle=_lttb_sql())
def ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013)
    per user series — the standard shape-preserving reduction a
    time-series platform applies before plotting (the reference
    serves EEG traces for exactly this kind of display; this is the
    serving-layer twin of [[ts_resample_ohlc]]).

    LTTB is inherently SEQUENTIAL per series (bucket i's pick depends
    on bucket i-1's), so it is a textbook applyInPandas case: one
    Arrow batch per user, a tight integer loop inside. Determinism is
    engineered end-to-end: t is floored epoch seconds and v exact
    milli-units, the bucket map is the integer formula
    ``1 + (j·(B-2)) // m`` on both engines, and the triangle-area
    argmax is cross-multiplied by the next-bucket count so the whole
    selection is int64 arithmetic with (t, event_id) tie-breaks —
    the SQL oracle replays the identical selection as 6 unrolled
    CTE steps and must match row-for-row.

    Scale: state is one series per Arrow batch (a series too large
    for one batch gets pre-bucketed coarsely first — same recursive-
    split ladder as [[dedup_semantic]]); the only shuffle is the
    per-user co-location. Series with < B points are excluded (a
    production variant passes them through untouched)."""
    import numpy as np
    import pandas as pd

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "view"
    ).select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("t"),
        F.round(F.col("value") * 1000).cast("bigint").alias("v"),
    )
    B = _LTTB_B
    inner = B - 2

    def lttb(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["t", "event_id"], kind="mergesort")
        n = len(pdf)
        if n < B:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "bucket_idx": pd.Series(dtype="int32"),
                    "sel_t": pd.Series(dtype="int64"),
                    "sel_v": pd.Series(dtype="int64"),
                }
            )
        t = pdf["t"].to_numpy()
        v = pdf["v"].to_numpy()
        eid = pdf["event_id"].to_numpy()
        m = n - 2
        # interior point j (0-based) -> bucket 1..inner
        j = np.arange(m)
        b = 1 + (j * inner) // m
        sel_t = [int(t[0])]
        sel_v = [int(v[0])]
        for i in range(1, inner + 1):
            cand = np.where(b == i)[0] + 1  # global idx of bucket i
            if i < inner:
                nx = np.where(b == i + 1)[0] + 1
                st, sv, cn = int(t[nx].sum()), int(v[nx].sum()), len(nx)
            else:
                st, sv, cn = int(t[n - 1]), int(v[n - 1]), 1
            ta, va = sel_t[-1], sel_v[-1]
            best = None
            for k in cand:
                area = abs(
                    (ta * cn - st) * (int(v[k]) - va)
                    - (ta - int(t[k])) * (sv - va * cn)
                )
                key = (-area, int(t[k]), int(eid[k]))
                if best is None or key < best[0]:
                    best = (key, int(t[k]), int(v[k]))
            sel_t.append(best[1])
            sel_v.append(best[2])
        sel_t.append(int(t[n - 1]))
        sel_v.append(int(v[n - 1]))
        uid = int(pdf["user_id"].iloc[0])
        return pd.DataFrame(
            {
                "user_id": np.repeat(uid, B),
                "bucket_idx": np.arange(B, dtype="int32"),
                "sel_t": np.array(sel_t, dtype="int64"),
                "sel_v": np.array(sel_v, dtype="int64"),
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        lttb, "user_id long, bucket_idx int, sel_t long, sel_v long"
    )


_STREAK_SQL = """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ),
    grp AS (
      SELECT user_id, d,
             CAST(d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                           AS INT) AS DATE) AS anchor
      FROM days
    ),
    streaks AS (
      SELECT user_id, COUNT(*) AS len_days, MIN(d) AS streak_start
      FROM grp GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(len_days) AS BIGINT) AS longest_streak,
           MIN(streak_start) AS first_day
    FROM streaks GROUP BY user_id
"""


@query("window_gaps_islands", oracle=_STREAK_SQL)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-day activity streaks via
    the date-minus-row-number anchor trick (days in one unbroken run
    share an anchor). The canonical engagement-streak query every
    events warehouse serves; [[sessionization]] is its intra-day
    timestamp-gap sibling.

    One window sort per user over DISTINCT (user, day) rows — the
    distinct pre-shrink bounds the sort input at users × active-days,
    never raw events — then two cheap grouped rollups. Day arithmetic
    only (no timestamps), so both engines agree exactly."""
    from pyspark.sql import Window as W

    days = (
        load(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", "ts").cast("date").alias("d"))
        .distinct()
    )
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("d"))
    grp = days.withColumn("anchor", F.date_sub(F.col("d"), rn))
    streaks = grp.groupBy("user_id", "anchor").agg(
        F.count("*").alias("len_days"), F.min("d").alias("streak_start")
    )
    return streaks.groupBy("user_id").agg(
        F.count("*").alias("n_streaks"),
        F.max("len_days").cast("bigint").alias("longest_streak"),
        F.min("streak_start").alias("first_day"),
    )


_TRANSITIONS_SQL = """
    WITH ordered AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions
    FROM ordered WHERE next_type IS NOT NULL
    GROUP BY from_type, to_type
"""


@query("event_transitions", oracle=_TRANSITIONS_SQL)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-path analysis: counts of consecutive event-type
    transitions per user stream (the first-order Markov matrix
    behind "what do users do next" product questions; [[funnel_steps]]
    checks one fixed path, this measures all of them).

    One window sort per user keyed by the total order (ts, event_id),
    then a transition-pair rollup whose state is |event_types|² rows —
    constants, regardless of corpus size."""
    from pyspark.sql import Window as W

    nxt = F.lead("event_type").over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
    )
    return (
        load(spark, sf_dir, "events")
        .select("user_id", "event_type", nxt.alias("next_type"))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n_transitions"))
    )


#: drift_psi_report: baseline/current boundary and value-bucket width.
#: The events fixture spans 2024-01-01..30 at every SF, so mid-month
#: splits it roughly in half; value spans 0..~560, so width 50 yields
#: a stable ~12-bucket histogram.
_PSI_SPLIT_TS = "2024-01-16 00:00:00"
_PSI_VALUE_WIDTH = 50

_PSI_SQL = f"""
    WITH long AS (
      SELECT dim, bucket,
             CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT_TS}' THEN 1 ELSE 0 END
               AS is_base
      FROM (
        SELECT ts, 'event_type' AS dim,
               COALESCE(event_type, 'NULL') AS bucket
        FROM events
        UNION ALL
        SELECT ts, 'value_bucket' AS dim,
               CAST(CAST(floor(value / {_PSI_VALUE_WIDTH}) AS BIGINT)
                    AS VARCHAR) AS bucket
        FROM events
      )
    ),
    counts AS (
      SELECT dim, bucket,
             CAST(SUM(is_base) AS BIGINT) AS n_base,
             CAST(SUM(1 - is_base) AS BIGINT) AS n_curr
      FROM long GROUP BY dim, bucket
    ),
    tot AS (
      SELECT dim, bucket, n_base, n_curr,
             SUM(n_base) OVER (PARTITION BY dim) AS t_base,
             SUM(n_curr) OVER (PARTITION BY dim) AS t_curr,
             COUNT(*)    OVER (PARTITION BY dim) AS k
      FROM counts
    )
    SELECT dim, bucket, n_base, n_curr,
           (n_base + 1) / CAST(t_base + k AS DOUBLE) AS p_base,
           (n_curr + 1) / CAST(t_curr + k AS DOUBLE) AS p_curr,
           ((n_base + 1) / CAST(t_base + k AS DOUBLE)
            - (n_curr + 1) / CAST(t_curr + k AS DOUBLE))
           * ln(((n_base + 1) / CAST(t_base + k AS DOUBLE))
                / ((n_curr + 1) / CAST(t_curr + k AS DOUBLE))) AS psi_term
    FROM tot
"""


def psi_counts(long: DataFrame) -> DataFrame:
    """The (dim, bucket) count aggregation — ONE construction site
    shared by the batch fold, the streaming twin (where it is the
    stateful streaming aggregation), and the state-bound test, so
    none of the three can drift (the ``_ivf_coarse_sql`` lesson)."""
    return long.groupBy("dim", "bucket").agg(
        F.sum("is_base").alias("n_base"),
        F.sum(F.lit(1) - F.col("is_base")).alias("n_curr"),
    )


def psi_from_long(long: DataFrame) -> DataFrame:
    """The testable PSI fold under [[drift_psi_report]]: given long
    rows ``(dim, bucket, is_base∈{0,1})``, aggregate per-bucket
    baseline/current counts and emit Laplace-smoothed probabilities
    plus the per-bucket PSI term. All post-aggregation work is
    O(buckets) rows."""
    return psi_from_counts(psi_counts(long))


def psi_from_counts(counts: DataFrame) -> DataFrame:
    """PSI tail over pre-aggregated ``(dim, bucket, n_base, n_curr)``
    counts — shared by the batch fold above and the streaming twin
    [[stream_drift_psi]], whose micro-batch aggregation produces
    exactly this shape. O(buckets) rows throughout."""
    from pyspark.sql import Window as W

    wd = W.partitionBy("dim")
    t_base = F.sum("n_base").over(wd)
    t_curr = F.sum("n_curr").over(wd)
    k = F.count("*").over(wd)
    p_base = (F.col("n_base") + 1) / (t_base + k).cast("double")
    p_curr = (F.col("n_curr") + 1) / (t_curr + k).cast("double")
    return counts.select(
        "dim",
        "bucket",
        "n_base",
        "n_curr",
        p_base.alias("p_base"),
        p_curr.alias("p_curr"),
        ((p_base - p_curr) * F.log(p_base / p_curr)).alias("psi_term"),
    )


@query("drift_psi_report", oracle=_PSI_SQL)
def drift_psi_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift report: compare the baseline
    half of the event stream (ts < mid-month) against the current
    half, per bucket, over two dimensions at once — the categorical
    ``event_type`` distribution and a fixed-width histogram of
    ``value``. PSI = Σ (p_base − p_curr)·ln(p_base/p_curr) is the
    standard production drift monitor for feature and label
    distributions feeding a training pipeline; per-bucket terms are
    emitted (not just the scalar) so the report names WHICH bucket
    moved. Laplace +1 smoothing over the observed bucket union keeps
    every term finite without dropping one-sided buckets.

    Scale shape: ONE scan of events — the two dimensions are exploded
    from an inline 2-element array (no self-union, no second scan) —
    into one hash aggregation keyed by (dim, bucket). Everything
    after the agg operates on O(buckets) rows (bounded: |event
    types| + value-range/width, independent of row count), so the
    window totals over `dim` are constant-size work. Fixed-width
    value buckets rather than quantile edges keep the bucketing
    single-pass and cross-engine exact.

    Reference parity: the reference schedules recurring "data
    quality" queries via its Athena/EMR loop (SURVEY §2A event_trigger
    / ingest_log families); drift monitoring is the canonical member
    of that class for a living corpus. Spark-native formulation; no
    reference file implements PSI."""
    return psi_from_long(psi_long_form(load(spark, sf_dir, "events")))


def psi_long_form(e: DataFrame) -> DataFrame:
    """The monitored-dimension definition under [[drift_psi_report]]
    and its streaming twin [[stream_drift_psi]]: one scan of events
    exploded into (dim, bucket, is_base) long rows via an inline
    2-element struct array (never a self-union)."""
    pair = F.array(
        F.struct(
            F.lit("event_type").alias("dim"),
            F.coalesce(F.col("event_type"), F.lit("NULL")).alias("bucket"),
        ),
        F.struct(
            F.lit("value_bucket").alias("dim"),
            F.floor(F.col("value") / _PSI_VALUE_WIDTH)
            .cast("string")
            .alias("bucket"),
        ),
    )
    # when(...).otherwise(0), not a bare cast: a NULL ts must count
    # as "current" exactly like the oracle's CASE ... ELSE 0, not
    # null out of both sides
    is_base = F.when(
        F.col("ts") < F.lit(_PSI_SPLIT_TS).cast("timestamp"), F.lit(1)
    ).otherwise(F.lit(0))
    return e.select(
        F.explode(pair).alias("db"), is_base.alias("is_base")
    ).select("db.dim", "db.bucket", "is_base")


_PATTERN_SQL = """
    WITH j AS (
      SELECT user_id,
             COUNT(*) AS n_events,
             string_agg(substr(event_type, 1, 1), ''
                        ORDER BY ts, event_id) AS journey
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(n_events AS BIGINT) AS n_events,
           md5(journey) AS journey_md5,
           CAST(len(regexp_extract_all(journey, 's[^p]*p')) AS BIGINT)
             AS n_conversions,
           CAST(COALESCE(list_max(list_transform(
                  regexp_extract_all(journey, 'e+'), x -> len(x))), 0)
                AS BIGINT) AS longest_error_run,
           CAST(len(regexp_extract_all(journey, 'vc')) AS BIGINT)
             AS n_view_click
    FROM j
"""


def journey_metrics(e: DataFrame) -> DataFrame:
    """The testable CEP fold under [[event_pattern_match]]: given
    events ``(user_id, ts, event_id, event_type)``, build each user's
    ordered type-initial journey string and evaluate the regex
    metrics. All pattern work is in-row codegen regex."""
    ordered = F.sort_array(
        F.collect_list(
            F.struct(
                "ts", "event_id", F.substring("event_type", 1, 1).alias("i")
            )
        )
    )
    per_user = e.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.array_join(
            F.transform(ordered, lambda s: s["i"]), ""
        ).alias("journey"),
    )
    err_runs = F.regexp_extract_all("journey", F.lit("(e+)"), 1)
    return per_user.select(
        "user_id",
        "n_events",
        F.md5("journey").alias("journey_md5"),
        F.regexp_count("journey", F.lit("s[^p]*p"))
        .cast("long")
        .alias("n_conversions"),
        F.coalesce(
            F.array_max(F.transform(err_runs, F.length)), F.lit(0)
        )
        .cast("long")
        .alias("longest_error_run"),
        F.regexp_count("journey", F.lit("vc"))
        .cast("long")
        .alias("n_view_click"),
    )


@query("event_pattern_match", oracle=_PATTERN_SQL)
def event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite complex-event-processing: reduce each
    user's event history to an ordered type-initial string (the
    "journey": s=signup c=click p=purchase e=error v=view) and detect
    patterns with regular expressions — non-overlapping
    signup→…→purchase conversions (``s[^p]*p``), the longest
    consecutive error run (``e+``), and immediate view→click
    adjacencies. The regex-over-sequence formulation is the classic
    CEP/funnel-pattern engine trick (SQL MATCH_RECOGNIZE, Flink CEP)
    re-expressed as DataFrame algebra; unlike [[funnel_steps]] (fixed
    3-step order test) the pattern here is a true regular language
    over the whole journey and counts REPEATED occurrences.

    Determinism: the journey is built from a sorted struct array on
    the total order (ts, event_id), so the string — and therefore
    every regex metric and the md5 — is partition-order-independent.
    Patterns stay in the Java∩RE2 dialect subset (character classes
    and + only, the [[pii_redact]] discipline), and ``[^p]*`` is
    deterministic-greedy so both engines' non-overlapping scans pick
    identical matches.

    Scale shape: ONE shuffle (the per-user collect_list groupBy);
    state is one user's events, the natural CEP partition bound —
    journey length is per-user event count, emitted only as an md5
    digest so row width stays constant. All pattern evaluation is
    in-row codegen regex; nothing touches Python."""
    return journey_metrics(load(spark, sf_dir, "events"))


#: k-anonymity threshold (privacy_k_anonymity)
_K_ANON = 5

# the per-user QI profile CTEs, shared verbatim by the k-anonymity
# and l-diversity oracles (the two audits must agree on what a
# quasi-identifier class IS, or their reports describe different
# releases)
_QI_CTES = """
    typed AS (
      SELECT user_id, event_type, COUNT(*) AS cnt
      FROM events GROUP BY user_id, event_type
    ),
    fav AS (
      SELECT user_id, event_type AS fav_type
      FROM (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY cnt DESC, event_type) AS rn
        FROM typed
      ) WHERE rn = 1
    ),
    profile AS (
      SELECT e.user_id,
             CAST(date_trunc('week', MIN(e.ts)) AS DATE) AS cohort_week,
             CAST(floor(COUNT(*) / 10) AS BIGINT) AS activity_bucket
      FROM events e GROUP BY e.user_id
    )
"""

_KANON_SQL = f"""
    WITH {_QI_CTES.strip()}
    SELECT p.cohort_week, p.activity_bucket, f.fav_type,
           COUNT(*) AS class_size,
           CASE WHEN COUNT(*) >= {_K_ANON} THEN 1 ELSE 0 END AS meets_k
    FROM profile p JOIN fav f ON p.user_id = f.user_id
    GROUP BY p.cohort_week, p.activity_bucket, f.fav_type
"""


def qi_profiles(e: DataFrame) -> DataFrame:
    """Per-user quasi-identifier profile (user_id, cohort_week,
    activity_bucket, fav_type) — the shared front half of
    [[privacy_k_anonymity]] and [[privacy_l_diversity]], the exact
    DataFrame twin of the ``_QI_CTES`` oracle fragment."""
    from pyspark.sql import Window as W

    typed = e.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy(
            F.col("cnt").desc(),
            # DuckDB's ASC default is NULLS LAST; Spark's is NULLS
            # FIRST — pin it so a NULL event_type group cannot win
            # the tie in one engine only
            F.col("event_type").asc_nulls_last(),
        )
    )
    fav = (
        typed.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("fav_type"))
    )
    profile = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week"),
        F.floor(F.count("*") / 10).cast("long").alias("activity_bucket"),
    )
    return profile.join(fav, "user_id")


def k_anonymity_of(e: DataFrame) -> DataFrame:
    """The testable audit fold under [[privacy_k_anonymity]]: given
    events ``(user_id, ts, event_id, event_type)``, build per-user QI
    profiles and report every equivalence class with size and
    meets-k flag."""
    return (
        qi_profiles(e)
        .groupBy("cohort_week", "activity_bucket", "fav_type")
        .agg(
            F.count("*").alias("class_size"),
            F.when(F.count("*") >= _K_ANON, F.lit(1))
            .otherwise(F.lit(0))
            .alias("meets_k"),
        )
    )


@query("privacy_k_anonymity", oracle=_KANON_SQL)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymity audit over behavioral quasi-identifiers: reduce
    each user to a QI profile — cohort week (first-seen), activity
    bucket (events ÷ 10), favorite event type (mode, alphabetical
    tie-break) — then report every QI equivalence class with its
    size and whether it meets k=``_K_ANON`` (Sweeney 2002, k=5
    here). Classes below k
    are re-identification risk: a released dataset keyed by these
    attributes points to fewer than k real individuals. This is the
    privacy-audit step a training-data pipeline runs before any
    user-derived corpus leaves the boundary, complementing content
    PII removal ([[pii_redact]]) with STRUCTURAL disclosure risk.

    Determinism: the mode tie-breaks alphabetically via ROW_NUMBER
    ordered (cnt DESC, event_type) in both engines; week/bucket math
    follows [[cohort_retention]]'s portable day-arithmetic
    discipline; everything is integer or date typed — no floats
    anywhere.

    Scale shape: two user-keyed aggregations — (user, type) counts
    then per-user profile — each shuffling O(users × types) and
    O(users) rows respectively (never raw events: both
    partial-aggregate map-side), one user-keyed broadcast-or-hash
    join to attach the favorite type, and a final class rollup whose
    output is O(QI classes). Per-user state is constant; no window
    over raw events."""
    return k_anonymity_of(load(spark, sf_dir, "events"))


_SEASONAL_SQL = """
    WITH m AS (
      SELECT event_type,
             CAST(hour(ts) AS BIGINT) AS hour_of_day,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ),
    b AS (
      SELECT event_type, hour_of_day,
             COUNT(*) AS n, SUM(y) AS sy, SUM(y * y) AS syy
      FROM m GROUP BY event_type, hour_of_day
    ),
    t AS (
      SELECT event_type, hour_of_day, n, sy, syy,
             SUM(n)  OVER (PARTITION BY event_type) AS nt,
             SUM(sy) OVER (PARTITION BY event_type) AS syt
      FROM b
    )
    SELECT event_type, hour_of_day,
           CAST(n AS BIGINT) AS n,
           CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS seasonal_mean,
           sqrt(GREATEST(CAST(n AS DOUBLE) * syy
                         - CAST(sy AS DOUBLE) * sy, 0.0))
             / CAST(n AS DOUBLE) / 100.0 AS within_sd,
           (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE)) AS seasonal_index
    FROM t
"""


@query("ts_seasonal_profile", oracle=_SEASONAL_SQL)
def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal decomposition diagnostics per event_type:
    each (type, hour) bucket's mean, within-bucket standard
    deviation, and seasonal index (bucket mean ÷ type mean — the
    classical multiplicative-decomposition seasonal factor). This is
    the profile a capacity planner or anomaly detector conditions on
    before flagging residuals ([[ts_anomaly_mad]] scores raw values;
    conditioning on this profile is what separates "3am is always
    quiet" from a real drop).

    Exactness: the only aggregations are integer moments (n, Σy,
    Σy²) over centi-unit values — associative, partial-aggregation-
    safe — and the type-level totals are WINDOW SUMS OF INTEGERS
    (also associative), so no double ever accumulates in an
    engine-specific order; every emitted double is a fixed expression
    tree over exact ints (the [[agg_linear_fit]] / agg_corr_exact
    discipline applied to grouped + windowed stats).

    Scale shape: one map-side-combined hash agg to (type, hour) —
    the shuffle carries three longs per bucket — then window totals
    over the O(types × 24) bucket table. Nothing downstream of the
    agg is data-proportional."""
    e = load(spark, sf_dir, "events")
    y = F.round(F.col("value") * 100).cast("bigint")
    m = e.select(
        "event_type",
        F.hour("ts").cast("bigint").alias("hour_of_day"),
        y.alias("y"),
    )
    b = m.groupBy("event_type", "hour_of_day").agg(
        F.count("*").alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    from pyspark.sql import Window as W

    wt = W.partitionBy("event_type")
    nt = F.sum("n").over(wt)
    syt = F.sum("sy").over(wt)
    nd = F.col("n").cast("double")
    syd = F.col("sy").cast("double")
    return b.select(
        "event_type",
        "hour_of_day",
        "n",
        (syd / nd / 100.0).alias("seasonal_mean"),
        (
            # GREATEST(.., 0): past the 2^53 moment envelope the
            # true-zero variance of a constant bucket can round to
            # -epsilon — Spark would emit NaN while DuckDB ABORTS on
            # sqrt(negative); clamping keeps both engines at sd=0.
            # At true 100 TB the moments move to decimal(38), like
            # agg_linear_fit.
            F.sqrt(F.greatest(nd * F.col("syy") - syd * F.col("sy"),
                              F.lit(0.0)))
            / nd / 100.0
        ).alias("within_sd"),
        ((syd / nd) / (syt.cast("double") / nt.cast("double"))).alias(
            "seasonal_index"
        ),
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection (exact integer prefix-min closed form)
# ---------------------------------------------------------------------------

#: CUSUM reference level (centi-units, ~ the corpus mean of 49.63)
#: and alarm threshold — a cumulated positive excess of 500.00 over
#: the reference fires the detector.
_CUSUM_K_C = 5_000
_CUSUM_H_C = 50_000

_CUSUM_SQL = f"""
    WITH x AS (
      SELECT user_id, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) - {_CUSUM_K_C} AS x_c
      FROM events
    ),
    p AS (
      SELECT user_id, ts, event_id,
             SUM(x_c) OVER w AS p_c
      FROM x
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    s AS (
      SELECT user_id,
             p_c - LEAST(MIN(p_c) OVER w, 0) AS s_c
      FROM p
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(CASE WHEN s_c > {_CUSUM_H_C} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_alarms,
           CAST(MAX(s_c) AS DOUBLE) / 100 AS max_cusum,
           MAX(s_c) > {_CUSUM_H_C} AS alarmed
    FROM s GROUP BY user_id
"""


def _cusum_s_rows_series(x: DataFrame) -> DataFrame:
    """Single-window reference form of the per-row CUSUM statistic
    s_c: stacked prefix-sum / prefix-min windows, one series per
    sort task."""
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    p = x.withColumn("p_c", F.sum("x_c").over(w))
    return p.withColumn(
        "s_c", F.col("p_c") - F.least(F.min("p_c").over(w), F.lit(0))
    )


def _cusum_s_rows(
    x: DataFrame,
    bucket_sec: int | None = None,
    max_series_rows: int | None = None,
) -> DataFrame:
    """Per-row CUSUM statistic, SIZE-RESOLVED (r16 verdict ask #3:
    the audit's 'sequential semantic' claim was too strong — the
    closed form P_n − min(0, min_{k≤n} P_k) is an ASSOCIATIVE
    integer scan, so the bucketed escape applies, unlike ewma/holt
    whose float recurrences genuinely serialize). The bucketed form
    needs NO fringe join, only dim-frame carries: per (user, bucket)
    local prefix sums lp and local prefix-mins lm, then over the
    per-user bucket DIM frame (the only sequential-per-series fold,
    and it is dim-sized) the exclusive bucket-total carry
    C_b = Σ_{b'<b} T_{b'} and the exclusive global-min carry
    G_b = min_{b'<b}(C_{b'} + M_{b'}); per row
    P = C_b + lp and min_{k≤n} P_k = least(G_b, C_b + lm) — F.least
    skips the NULL G_b of each series' first bucket. All integer
    centi-units; addition and min are associative, so the split is
    bit-exact (pinned by equality + random-stream tests).

    The series key is user_id — cardinality GROWS with the corpus,
    so the hazard variable is rows per user, not total rows; the
    total-count resolver is the same conservative proxy the ACF
    family uses."""
    from pyspark.sql import Window as W

    from .rolling import SERIES_FORM_MAX_ROWS, resolve_bucket_sec

    cutoff = (
        max_series_rows
        if max_series_rows is not None
        else SERIES_FORM_MAX_ROWS
    )
    n = x.count()
    if n <= cutoff:
        return _cusum_s_rows_series(x)

    sec = F.col("ts").cast("timestamp_ltz").cast("long")
    width = (
        bucket_sec
        if bucket_sec is not None
        else resolve_bucket_sec(
            x.select(sec.alias("sec"), "user_id"), n, "user_id"
        )
    )
    xb = x.withColumn("b", F.floor(sec / F.lit(width)))
    wb = (
        W.partitionBy("user_id", "b")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    loc = xb.withColumn("lp", F.sum("x_c").over(wb)).withColumn(
        "lm", F.min("lp").over(wb)
    )
    # checkpoint: the (user, b)-windowed frame feeds both the dim
    # fold and the per-row join-back (the shared ACF/rolling cut)
    loc = loc.localCheckpoint(eager=False)
    dim = loc.groupBy("user_id", "b").agg(
        F.sum("x_c").alias("tb"), F.min("lp").alias("mb")
    )
    wdim = (
        W.partitionBy("user_id")
        .orderBy("b")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carries = (
        dim.select("user_id", "b", "tb", "mb")
        .withColumn(
            "cb", F.coalesce(F.sum("tb").over(wdim), F.lit(0))
        )
        .withColumn("gb", F.min(F.col("cb") + F.col("mb")).over(wdim))
        .select("user_id", "b", "cb", "gb")
    )
    # plain (user_id, b) equi-join, NOT broadcast: the dim frame is
    # users × buckets — dim-sized per series but user cardinality
    # grows with the corpus, so it must co-partition, not replicate
    out = loc.join(carries, ["user_id", "b"])
    # NULL x_c parity with the series arm (r17 review): the series
    # running SUM skips NULLs, so a row's p_c is NULL iff its whole
    # global prefix is NULL-valued — which here is exactly "no
    # non-NULL in the in-bucket prefix (lp NULL) AND none in any
    # earlier bucket (gb NULL)". A bare cb + lp would instead go
    # NULL whenever the IN-BUCKET prefix alone is all-NULL,
    # diverging from the series form off-fixture. prefmin needs no
    # guard: min/least skip NULLs, and whenever p_c is non-NULL at
    # least one of (gb, cb+lm) is non-NULL.
    p_c = F.when(
        F.col("lp").isNotNull() | F.col("gb").isNotNull(),
        F.col("cb") + F.coalesce(F.col("lp"), F.lit(0)),
    )
    prefmin = F.least(F.col("gb"), F.col("cb") + F.col("lm"))
    return out.select(
        "user_id",
        "ts",
        "event_id",
        "x_c",
        p_c.alias("p_c"),
        (p_c - F.least(prefmin, F.lit(0))).alias("s_c"),
    )


def cusum_stats(
    e: DataFrame,
    k_c: int = _CUSUM_K_C,
    h_c: int = _CUSUM_H_C,
    bucket_sec: int | None = None,
    max_series_rows: int | None = None,
):
    """The CUSUM fold over any (user_id, ts, event_id, value) frame —
    module-level so the hypothesis differential drives it with the
    literal max(0, S+x) recurrence."""
    x = e.select(
        "user_id",
        "ts",
        "event_id",
        (F.round(F.col("value") * 100).cast("bigint") - k_c).alias("x_c"),
    )
    s = _cusum_s_rows(
        x, bucket_sec=bucket_sec, max_series_rows=max_series_rows
    )
    return s.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_points"),
        F.sum(F.when(F.col("s_c") > h_c, 1).otherwise(0))
        .cast("bigint")
        .alias("n_alarms"),
        (F.max("s_c").cast("double") / 100).alias("max_cusum"),
        (F.max("s_c") > h_c).alias("alarmed"),
    )


@query("ts_cusum_changepoint", oracle=_CUSUM_SQL)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user CUSUM changepoint detector (Page 1954): the classic
    sequential drift alarm S_n = max(0, S_{n-1} + (v_n − K)),
    re-expressed in its CLOSED FORM S_n = P_n − min(0, min_{k≤n} P_k)
    over exclusive prefix sums — a recurrence becomes two stacked
    windows over ONE user-keyed exchange, instead of a sequential
    per-row loop no engine can parallelize. All arithmetic is exact
    integer centi-units (value is ≤2-decimal in the fixture; the
    subtraction, prefix sums, mins and the threshold comparison never
    touch a float), so both engines agree bit-for-bit; the single
    double appears in the final max_cusum/100 projection.

    Scale shape: one hash exchange on user_id, two window passes over
    sorted partitions (Spark evaluates both frames in one Window
    operator chain), then a map-side-combined per-user aggregate.
    State per partition is O(1) per running frame. At 100 TB this is
    the monitoring pass over a sharded metric stream — the same shape
    as [[window_analytic]], with the detector math in closed form."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    return cusum_stats(e)


# ---------------------------------------------------------------------------
# Truncated EWMA (alpha = 1/2, exact dyadic weights)
# ---------------------------------------------------------------------------

#: EWMA window length: 16 lags at alpha=1/2 truncate <0.002% of the
#: untruncated weight mass — and keep the weighted numerator an
#: EXACT int64 (centi-value × 2^15 max).
_EWMA_L = 16

_EWMA_NUM = " + ".join(
    f"CASE WHEN lag_{j} IS NOT NULL THEN lag_{j} * {1 << (_EWMA_L - 1 - j)} "
    "ELSE 0 END"
    for j in range(_EWMA_L)
)
_EWMA_DEN = " + ".join(
    f"CASE WHEN lag_{j} IS NOT NULL THEN {1 << (_EWMA_L - 1 - j)} ELSE 0 END"
    for j in range(_EWMA_L)
)
_EWMA_LAGS = ",\n             ".join(
    f"LAG(v_c, {j}) OVER w AS lag_{j}" for j in range(_EWMA_L)
)

_EWMA_SQL = f"""
    WITH v AS (
      SELECT user_id, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS v_c
      FROM events
    ),
    lagged AS (
      SELECT user_id, ts, event_id, v_c,
             {_EWMA_LAGS}
      FROM v
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, ts,
           CAST(v_c AS DOUBLE) / 100 AS value,
           CAST({_EWMA_NUM} AS DOUBLE)
             / (CAST(({_EWMA_DEN}) AS DOUBLE) * 100) AS ewma
    FROM lagged
"""


@query("ts_ewma_smooth", oracle=_EWMA_SQL)
def ts_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average, alpha = 1/2,
    truncated at {_EWMA_L} lags — the smoothing pass of a metrics
    pipeline, built so the cross-engine result is EXACT: with dyadic
    alpha the weights are powers of two, the centi-unit values are
    integers, so the weighted numerator and the weight total are
    exact int64 sums and the single double division at the end is
    the same IEEE operation in both engines — no rounding tolerance
    anywhere, on a quantity that is textbook-recursively defined.
    (The untruncated recurrence s_n = a·v + (1−a)·s_{{n−1}} would
    chain n data-dependent float ops; 16 dyadic lags carry ≥99.998 %
    of the weight mass and restore bit-determinism. A lag ladder is
    ONE window pass — Spark evaluates all 16 LAGs in a single Window
    operator over a single user-keyed exchange.)

    At the series head the available-lag weights renormalize (the
    CASE/den pair), matching the standard adjusted-EWMA definition
    (pandas ``adjust=True``) rather than seeding with v_1."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("v_c"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.lag("v_c", j).over(w).alias(f"lag_{j}") for j in range(_EWMA_L)]
    lagged = e.select("user_id", "ts", "event_id", "v_c", *lags)
    num = sum(
        (
            F.when(
                F.col(f"lag_{j}").isNotNull(),
                F.col(f"lag_{j}") * (1 << (_EWMA_L - 1 - j)),
            ).otherwise(F.lit(0))
            for j in range(_EWMA_L)
        ),
        start=F.lit(0),
    )
    den = sum(
        (
            F.when(
                F.col(f"lag_{j}").isNotNull(),
                F.lit(1 << (_EWMA_L - 1 - j)),
            ).otherwise(F.lit(0))
            for j in range(_EWMA_L)
        ),
        start=F.lit(0),
    )
    return lagged.select(
        "user_id",
        "event_id",
        "ts",
        (F.col("v_c").cast("double") / 100).alias("value"),
        (num.cast("double") / (den.cast("double") * 100)).alias("ewma"),
    )


# plain-string docstring: expand the constant placeholders (the
# corpus.py __doc__.replace pattern) so rendered help shows values,
# not literal braces
ts_ewma_smooth.__doc__ = (
    ts_ewma_smooth.__doc__.replace("{_EWMA_L}", str(_EWMA_L))
    .replace("{{n−1}}", "{n−1}")
)


# ---------------------------------------------------------------------------
# l-diversity (the k-anonymity audit's sensitive-attribute twin)
# ---------------------------------------------------------------------------

_L_DIVERSITY = 3

#: The sensitive-attribute bucketing shared VERBATIM by the
#: l-diversity and t-closeness oracles — both audits must bucket the
#: same attribute of the same release.
_SPEND_QUINTILE_CTE = """spend AS (
      SELECT user_id,
             NTILE(5) OVER (ORDER BY SUM(CAST(ROUND(value * 100)
                            AS BIGINT)), user_id) AS spend_quintile
      FROM events GROUP BY user_id
    )"""

_LDIV_SQL = f"""
    WITH {{qi}},
    {_SPEND_QUINTILE_CTE},
    cls AS (
      SELECT p.cohort_week, p.activity_bucket, f.fav_type,
             s.spend_quintile, COUNT(*) AS cnt
      FROM profile p
      JOIN fav f ON p.user_id = f.user_id
      JOIN spend s ON p.user_id = s.user_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT cohort_week, activity_bucket, fav_type,
           CAST(SUM(cnt) AS BIGINT) AS class_size,
           CAST(COUNT(*) AS BIGINT) AS distinct_l,
           CAST(ROUND(
             CAST(CAST(SUM(cnt) AS BIGINT)
                    * CAST(round(LN(SUM(cnt)) * 1e6) AS BIGINT)
                  - CAST(SUM(cnt * CAST(round(LN(cnt) * 1e6) AS BIGINT))
                         AS BIGINT) AS DOUBLE)
             / CAST(SUM(cnt) AS DOUBLE)) AS BIGINT) AS entropy_micronats,
           COUNT(*) >= {_L_DIVERSITY} AS diverse
    FROM cls
    GROUP BY cohort_week, activity_bucket, fav_type
"""


@query("privacy_l_diversity", oracle=_LDIV_SQL.format(qi=_QI_CTES.strip()))
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala 2007) — the sensitive-
    attribute twin of [[privacy_k_anonymity]]: a QI class can meet k
    yet still leak if everyone in it shares the same sensitive value.
    The QI classes are the SAME profile (shared ``qi_profiles`` /
    ``_QI_CTES`` — the two audits must describe the same release);
    the sensitive attribute is the user's spend quintile (NTILE(5)
    over exact centi-unit totals with user_id tie-break — total
    order, so quintile assignment is engine-identical). Per class:
    distinct-l (distinct sensitive values), entropy l-diversity in
    micro-nats (H·1e6 = (k·mln k − Σ c·mln c)/k with mln = micro_ln —
    each ln quantized ONCE to integer micro-nats so every cross-row
    sum is an associative BIGINT, the [[agg_entropy_profile]]
    clearing; r16 replaced the earlier order-dependent float
    Σ c·ln c), and the ≥ {_L_DIVERSITY} verdict.

    Scale shape: three user-keyed aggregations (type counts, spend
    totals, profile) feeding one class-keyed aggregate — every
    exchange is user- or class-cardinality, never event-proportional
    beyond the first map-side combine. The quintile rank itself is
    DISTRIBUTED (r12 verdict ask closed): range-repartitioned local
    ranks + broadcast prefix offsets reproduce NTILE(5) exactly with
    no single-partition window anywhere in the plan — see
    [[l_diversity_of]]."""
    return l_diversity_of(load(spark, sf_dir, "events"))


privacy_l_diversity.__doc__ = privacy_l_diversity.__doc__.replace(
    "{_L_DIVERSITY}", str(_L_DIVERSITY)
)


def spend_quintiles_of(e: DataFrame) -> DataFrame:
    """(user_id, spend_quintile) — the distributed NTILE(5) over
    exact centi-unit spend totals with user_id tie-break, shared by
    [[privacy_l_diversity]] and [[privacy_t_closeness]] (both audits
    must bucket the SAME sensitive attribute). NTILE(5) in VALUE but
    not in plan: range-repartition on the unique (tot_c, user_id)
    sort key, local rank per partition, one aggregate-sized collect
    of per-partition counts → broadcast prefix offsets, global_rank
    = offset[pid] + local_rank into the closed-form NTILE bucket
    formula (first n%5 buckets get ceil(n/5) rows). Partition-
    boundary-independent; localCheckpoint pins the partitioning
    between the offset collect and the downstream join."""
    from pyspark.sql import Window as W

    totals = e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
            "tot_c"
        )
    )
    ranked = (
        totals.repartitionByRange(32, "tot_c", "user_id")
        .withColumn("pid", F.spark_partition_id())
        .withColumn(
            "local_rank",
            F.row_number().over(
                W.partitionBy("pid").orderBy("tot_c", "user_id")
            ),
        )
        .localCheckpoint(eager=True)
    )
    parts = sorted(
        (r.pid, r.cnt)
        for r in ranked.groupBy("pid")
        .agg(F.max("local_rank").alias("cnt"))
        .collect()
    )
    offsets, n = {}, 0
    for pid, cnt in parts:
        offsets[pid] = n
        n += cnt
    off_map = (
        F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )
        if offsets
        else F.create_map()
    )
    rn = F.element_at(off_map, F.col("pid")) + F.col("local_rank")
    q, m = divmod(n, 5)
    if q == 0:  # fewer users than buckets: NTILE gives one per row
        bucket = rn
    else:
        head = m * (q + 1)  # first m buckets carry q+1 rows each
        bucket = F.when(
            rn <= head, (rn - 1) / (q + 1)
        ).otherwise(m + (rn - head - 1) / q)
        bucket = F.floor(bucket).cast("int") + 1
    return ranked.select("user_id", bucket.alias("spend_quintile"))


def l_diversity_of(e: DataFrame) -> DataFrame:
    """The testable audit fold under [[privacy_l_diversity]]: given
    events ``(user_id, ts, event_id, event_type, value)``, build QI
    classes + spend quintiles and report distinct-l / entropy-l per
    class.

    The quintile is NTILE(5) in VALUE but not in plan: a global
    ordered window would funnel every user through one task, so the
    rank is computed distributed — range-repartition users on the
    unique (tot_c, user_id) sort key, local rank per partition (each
    task sorts only its slice), then one aggregate-sized collect of
    per-partition counts becomes broadcast prefix offsets, and
    global_rank = offset[pid] + local_rank feeds the closed-form
    NTILE bucket formula (first n%5 buckets get ceil(n/5) rows).
    The result is partition-boundary-independent, so range-sampling
    nondeterminism cannot change a bucket; the intermediate is
    localCheckpoint-pinned so the offset collect and the downstream
    join see the same partitioning."""
    qi = qi_profiles(
        e.select("user_id", "ts", "event_id", "event_type")
    )
    spend = spend_quintiles_of(e)
    cls = (
        qi.join(spend, "user_id")
        .groupBy(
            "cohort_week", "activity_bucket", "fav_type", "spend_quintile"
        )
        .agg(F.count("*").alias("cnt"))
    )
    # Entropy in exact micro-nats (r16 self-review fix — this was
    # the one graded-exact BIGINT fed by a cross-row FLOAT sum,
    # Σ cnt·ln(cnt), whose accumulation order differs per engine and
    # per partitioning): quantize each ln ONCE to integer micro-nats
    # (the [[agg_entropy_profile]] clearing), so both sums are
    # associative BIGINTs, and the single double division + integer
    # round at the end are engine-identical.
    from ..functions.exact import micro_ln

    s = F.sum("cnt").cast("bigint")
    num = s * micro_ln(s) - F.sum(
        F.col("cnt") * micro_ln(F.col("cnt"))
    ).cast("bigint")
    h_micro = F.round(num.cast("double") / s.cast("double")).cast(
        "bigint"
    )
    return cls.groupBy("cohort_week", "activity_bucket", "fav_type").agg(
        s.alias("class_size"),
        F.count("*").cast("bigint").alias("distinct_l"),
        h_micro.alias("entropy_micronats"),
        (F.count("*") >= _L_DIVERSITY).alias("diverse"),
    )


_ABTEST_SQL = """
    WITH m AS (
      SELECT event_type,
             user_id % 2 AS arm,
             CAST(round(value * 1000) AS BIGINT) AS x
      FROM events
    ),
    s AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS s0,
             CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS s1,
             SUM(CASE WHEN arm = 0 THEN CAST(x AS HUGEINT) * x
                      ELSE 0 END) AS ss0,
             SUM(CASE WHEN arm = 1 THEN CAST(x AS HUGEINT) * x
                      ELSE 0 END) AS ss1
      FROM m GROUP BY event_type
    )
    SELECT event_type,
           n0 AS n_control,
           n1 AS n_treatment,
           CAST(s0 AS DOUBLE) / (1000.0 * n0) AS mean_control,
           CAST(s1 AS DOUBLE) / (1000.0 * n1) AS mean_treatment,
           (CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
             / sqrt(
                 (CAST(n1 AS DOUBLE) * ss1 - CAST(s1 AS DOUBLE) * s1)
                   / (CAST(n1 AS DOUBLE) * (n1 - 1)) / n1
                 + (CAST(n0 AS DOUBLE) * ss0 - CAST(s0 AS DOUBLE) * s0)
                   / (CAST(n0 AS DOUBLE) * (n0 - 1)) / n0
               ) AS t_welch
    FROM s
    WHERE n0 > 1 AND n1 > 1
    ORDER BY event_type
"""


@query("abtest_welch_ttest", oracle=_ABTEST_SQL)
def abtest_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment readout per event type: Welch's unequal-variance
    t-statistic between two deterministically assigned arms — the
    analysis every product-analytics stack runs on its events table
    next to [[funnel_steps]] and [[cohort_retention]] (the
    reference's predefined-query class, reference README.md:16).
    Arm assignment here is ``user_id % 2`` so the oracle replays it
    exactly; production swaps in a salted-hash bucketing
    (`corpus_sample_hash`'s md5 machinery) with the identical
    downstream plan.

    Exactness (the [[agg_corr_exact]] moment discipline): values go
    to integer milli-units once, each arm's (n, Σx) moments are
    exact BIGINTs and Σx² accumulates in decimal(38,0) — matching
    the oracle's SUM(BIGINT)→HUGEINT 128-bit intermediate, so the
    moments stay exact at ANY |x|·√n, not just the fixture's — all
    folded in ONE conditional aggregate; shuffle carries six
    fixed-width values per event type, never row data — and the
    t-statistic is a single final double expression with identical
    operation order in both engines: variance via the
    (n·Σx² − (Σx)²)/(n(n−1)) form, standard error as var/n summed
    across arms, one sqrt. Arms with n ≤ 1 are excluded (variance
    undefined) rather than emitted as NULL/Inf.

    Scale: one map-side-combined groupBy(event_type) over events is
    the entire data-proportional cost; the t computation happens on
    the handful of report rows. The same six-moment fold serves
    sequential testing or CUPED adjustment without replanning."""
    e = load(spark, sf_dir, "events")
    m = e.select(
        "event_type",
        (F.col("user_id") % 2).alias("arm"),
        F.round(F.col("value") * 1000).cast("bigint").alias("x"),
    )

    def arm_sum(a: int, expr):
        return F.sum(F.when(F.col("arm") == a, expr).otherwise(0)).cast(
            "bigint"
        )

    def arm_ss_wide(a: int):
        # Σx² through the shared wide_sum helper: the ELEMENT product
        # widens to decimal(38,0) BEFORE the multiply (≡ the oracle's
        # CAST(x AS HUGEINT) * x), so neither x² nor the accumulator
        # can wrap int64 at any |x|·√n — casting only the sum would
        # widen after the bigint product already overflowed.
        return wide_sum(
            F.when(F.col("arm") == a, F.col("x")).otherwise(0),
            F.col("x"),
        )

    s = m.groupBy("event_type").agg(
        arm_sum(0, F.lit(1)).alias("n0"),
        arm_sum(1, F.lit(1)).alias("n1"),
        arm_sum(0, F.col("x")).alias("s0"),
        arm_sum(1, F.col("x")).alias("s1"),
        arm_ss_wide(0).alias("ss0"),
        arm_ss_wide(1).alias("ss1"),
    )
    n0d, n1d = F.col("n0").cast("double"), F.col("n1").cast("double")
    s0d, s1d = F.col("s0").cast("double"), F.col("s1").cast("double")
    var0 = (n0d * F.col("ss0") - s0d * F.col("s0")) / (
        n0d * (F.col("n0") - 1)
    )
    var1 = (n1d * F.col("ss1") - s1d * F.col("s1")) / (
        n1d * (F.col("n1") - 1)
    )
    t = (s1d / F.col("n1") - s0d / F.col("n0")) / F.sqrt(
        var1 / F.col("n1") + var0 / F.col("n0")
    )
    return (
        s.filter((F.col("n0") > 1) & (F.col("n1") > 1))
        .select(
            "event_type",
            F.col("n0").alias("n_control"),
            F.col("n1").alias("n_treatment"),
            (s0d / (F.lit(1000.0) * F.col("n0"))).alias("mean_control"),
            (s1d / (F.lit(1000.0) * F.col("n1"))).alias(
                "mean_treatment"
            ),
            t.alias("t_welch"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# skyline_pareto — Pareto-dominance skyline as ONE window sweep
# ---------------------------------------------------------------------------

_SKYLINE_SQL = """
    WITH p AS (
      SELECT p_partkey, p_brand,
             CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents,
             CAST(p_size AS INT) AS size
      FROM part
    )
    SELECT b.p_brand AS brand, b.p_partkey AS part_key,
           b.price_cents, b.size
    FROM p b
    WHERE NOT EXISTS (
      SELECT 1 FROM p a
      WHERE a.p_brand = b.p_brand
        AND a.price_cents <= b.price_cents
        AND a.size >= b.size
        AND (a.price_cents < b.price_cents OR a.size > b.size)
    )
"""


def skyline_2d(pts: DataFrame, group: str, cost: str, gain: str) -> DataFrame:
    """2-D Pareto skyline (minimize ``cost``, maximize ``gain``) per
    ``group`` as ONE window sweep — the classic plane-sweep made
    distributed: sort each group by cost, then a point survives iff
    no strictly-cheaper point has gain ≥ its own (running max over
    ``rangeBetween(-inf, -1)``) and no equal-cost point has gain
    strictly greater (``rangeBetween(0, 0)`` frame max). Equal-cost
    equal-gain duplicates dominate nothing and are all kept —
    standard skyline tie semantics. Module-level so the hypothesis
    differential can drive it with arbitrary point sets against a
    literal O(n²) dominance check."""
    from pyspark.sql import Window

    w = Window.partitionBy(group).orderBy(F.col(cost).asc())
    cheaper_max = F.max(gain).over(
        w.rangeBetween(Window.unboundedPreceding, -1)
    )
    equal_max = F.max(gain).over(w.rangeBetween(0, 0))
    return pts.withColumn(
        "_keep",
        (cheaper_max.isNull() | (cheaper_max < F.col(gain)))
        & (equal_max <= F.col(gain)),
    ).filter(F.col("_keep")).drop("_keep")


@query("skyline_pareto", oracle=_SKYLINE_SQL)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-dominance skyline (Börzsönyi 2001's SKYLINE OF) per
    brand over the part catalog: the parts for which no same-brand
    part is both cheaper-or-equal and larger-or-equal with at least
    one strict — the multi-criteria shortlist operator (cheapest-vs-
    largest here; price-vs-quality, cost-vs-freshness in a curation
    pipeline) the reference's predefined-query class would bolt on
    as a view (reference README.md:16).

    The textbook formulation is the O(n²) NOT EXISTS self-join the
    DuckDB oracle runs verbatim. The Spark plan is the 2-D
    plane-sweep instead ([[skyline_2d]]): ONE exchange
    (hashpartitioning on brand), ONE sort (cost asc), and two frame
    maxima over the same window ordering — running gain-max over
    strictly-cheaper rows and frame gain-max over equal-cost rows —
    so dominance collapses to two scalar comparisons per row. No
    self-join, no candidate blow-up: cost is sort + linear scan,
    EXACTLY the plan you want at 100 TB where the quadratic oracle
    is unrunnable. A single mega-group range-partitions on the sort
    key instead (the sweep only needs each partition's prefix-max,
    one boundary exchange); d>2 dimensions grid-partition + local
    skyline + closure-verify — both noted here, neither needed for
    the 2-D catalog shape. Prices go to exact integer cents once
    (the repo-wide [[tpch_q1_pricing_summary]] discipline), so the
    sweep's comparisons and the oracle's are the same integers."""
    p = load(spark, sf_dir, "part").select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("part_key"),
        F.round(F.col("p_retailprice") * 100)
        .cast("bigint")
        .alias("price_cents"),
        F.col("p_size").cast("int").alias("size"),
    )
    return skyline_2d(p, "brand", "price_cents", "size").select(
        "brand", "part_key", "price_cents", "size"
    )


# ---------------------------------------------------------------------------
# privacy_t_closeness — distributional leakage, completing the triad
# ---------------------------------------------------------------------------

#: Classic closeness threshold t = 0.15 (Li 2007 §6), in micro-units.
_T_CLOSE_MICRO = 150_000

_TCLOSE_SQL = f"""
    WITH {{qi}},
    {_SPEND_QUINTILE_CTE},
    cls AS (
      SELECT p.cohort_week, p.activity_bucket, f.fav_type,
             s.spend_quintile AS k, COUNT(*) AS cnt
      FROM profile p
      JOIN fav f ON p.user_id = f.user_id
      JOIN spend s ON p.user_id = s.user_id
      GROUP BY 1, 2, 3, 4
    ),
    classes AS (
      SELECT DISTINCT cohort_week, activity_bucket, fav_type FROM cls
    ),
    grid AS (
      SELECT c.cohort_week, c.activity_bucket, c.fav_type, q.k
      FROM classes c CROSS JOIN (SELECT unnest(range(1, 6)) AS k) q
    ),
    filled AS (
      SELECT g.cohort_week, g.activity_bucket, g.fav_type, g.k,
             COALESCE(cls.cnt, 0) AS cnt
      FROM grid g
      LEFT JOIN cls
        ON cls.cohort_week = g.cohort_week
       AND cls.activity_bucket = g.activity_bucket
       AND cls.fav_type = g.fav_type
       AND cls.k = g.k
    ),
    cum AS (
      SELECT cohort_week, activity_bucket, fav_type, k, cnt,
             SUM(cnt) OVER (PARTITION BY cohort_week, activity_bucket,
                            fav_type ORDER BY k) AS cum_c,
             SUM(cnt) OVER (PARTITION BY cohort_week, activity_bucket,
                            fav_type) AS n_c
      FROM filled
    ),
    gdist AS (
      SELECT k, SUM(cnt) AS g FROM filled GROUP BY k
    ),
    gcum AS (
      SELECT k, SUM(g) OVER (ORDER BY k) AS cum_g,
             SUM(g) OVER () AS n
      FROM gdist
    )
    SELECT c.cohort_week, c.activity_bucket, c.fav_type,
           CAST(MAX(c.n_c) AS BIGINT) AS class_size,
           CAST(SUM(CASE WHEN c.k <= 4
                         THEN ABS(c.cum_c * g.n - g.cum_g * c.n_c)
                         ELSE 0 END) * 1000000
                // (4 * MAX(c.n_c) * MAX(g.n)) AS BIGINT)
             AS t_emd_micro,
           SUM(CASE WHEN c.k <= 4
                    THEN ABS(c.cum_c * g.n - g.cum_g * c.n_c)
                    ELSE 0 END) * 1000000
             // (4 * MAX(c.n_c) * MAX(g.n)) <= {_T_CLOSE_MICRO} AS close
    FROM cum c JOIN gcum g ON c.k = g.k
    GROUP BY c.cohort_week, c.activity_bucket, c.fav_type
"""


@query("privacy_t_closeness", oracle=_TCLOSE_SQL.format(qi=_QI_CTES.strip()))
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li-Li-Venkatasubramanian 2007) — the third
    member of the privacy triad: [[privacy_k_anonymity]] bounds class
    SIZE, [[privacy_l_diversity]] bounds sensitive-value VARIETY,
    t-closeness bounds the DISTANCE between each class's sensitive
    distribution and the release-wide one (a class can be large and
    diverse yet still leak: 'this class skews rich'). Same QI classes
    (shared ``qi_profiles``/``_QI_CTES``), same sensitive attribute
    (shared [[spend_quintiles_of]] / ``_SPEND_QUINTILE_CTE``), so the
    three audits describe the SAME release.

    Distance is the Earth-Mover's Distance over the ORDERED quintiles
    (Li 2007 §4.2's ordinal form): EMD = (1/(m−1)) Σ_{k<m}
    |CumClass_k/n_c − CumGlobal_k/n|. Computed ENTIRELY in BIGINT:
    the absolute cumulative gaps cross-multiply to |cum_c·n −
    cum_g·n_c|, the sum scales by 1e6 (micro-units, ≤ 4e16 at the
    sf1 user count — in range), and ONE integer division by
    4·n_c·n lands the reported t_emd_micro identically in both
    engines — zero floats anywhere, the strongest form of the repo's
    single-rounding discipline. A 1e9-user deployment re-derives the
    scale factor or drops to one final double division (the products
    pass 2^63 around n ≈ 1.5e8 with micro-scaling).

    Plan: the class × quintile vote is ONE user-keyed join + one
    class-keyed aggregate (event-proportional only in the first
    map-side combine); the dense 5-slot grid comes from an in-row
    ``explode(sequence(1,5))`` on the class list (no join), the
    cumulative sums run on the class×5 frame, and the global
    distribution is a 5-row broadcast. Every exchange after the
    profile build is class-cardinality. Verdict column ``close``
    uses the paper's t = 0.15."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "events")
    qik = ["cohort_week", "activity_bucket", "fav_type"]
    qi = qi_profiles(
        e.select("user_id", "ts", "event_id", "event_type")
    )
    spend = spend_quintiles_of(e)
    cls = (
        qi.join(spend, "user_id")
        .groupBy(*qik, F.col("spend_quintile").alias("k"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    grid = (
        cls.select(*qik)
        .distinct()
        .select(
            *qik,
            F.explode(F.sequence(F.lit(1), F.lit(5))).alias("k"),
        )
    )
    filled = grid.join(cls, qik + ["k"], "left").select(
        *qik, "k", F.coalesce("cnt", F.lit(0)).cast("bigint").alias("cnt")
    )
    wc = W.partitionBy(*qik).orderBy("k")
    wall = W.partitionBy(*qik)
    cum = filled.select(
        *qik,
        "k",
        "cnt",
        F.sum("cnt").over(wc).alias("cum_c"),
        F.sum("cnt").over(wall).alias("n_c"),
    )
    glob = filled.groupBy("k").agg(F.sum("cnt").alias("g"))
    wg = W.orderBy("k").rowsBetween(W.unboundedPreceding, 0)
    wgall = W.partitionBy()
    gcum = glob.select(
        "k",
        F.sum("g").over(wg).alias("cum_g"),
        F.sum("g").over(wgall).alias("n"),
    )
    j = cum.join(F.broadcast(gcum), "k")
    gap = F.when(
        F.col("k") <= 4,
        F.abs(
            F.col("cum_c") * F.col("n") - F.col("cum_g") * F.col("n_c")
        ),
    ).otherwise(F.lit(0).cast("bigint"))
    agg = j.groupBy(*qik).agg(
        F.max("n_c").cast("bigint").alias("class_size"),
        F.sum(gap).alias("num"),
        F.max("n_c").alias("n_c"),
        F.max("n").alias("n"),
    )
    t_micro = F.expr("num * 1000000 DIV (4 * n_c * n)")
    return agg.select(
        *qik,
        "class_size",
        t_micro.cast("bigint").alias("t_emd_micro"),
        (t_micro <= F.lit(_T_CLOSE_MICRO)).alias("close"),
    )


# ---------------------------------------------------------------------------
# privacy_dp_count — ε-DP release mechanics (seeded geometric noise)
# ---------------------------------------------------------------------------

#: Uniform scale: the seeded hash is a 32-bit integer in [0, 2^32).
_DP_U_SCALE = 1 << 32

#: Truncated noise support: |Z| ≤ 20. The two-sided geometric at
#: p = 1/2 leaves (2/3)·2^-20 ≈ 6e-7 of mass outside — the usual
#: (ε, δ)-style tail cut, with δ far below any fixture group count's
#: reciprocal; the clamp also gives the utility tests a HARD
#: |noise| ≤ 20 bound instead of a probabilistic one.
_DP_TAIL = 20

#: FIXTURE seed for the registered, oracle-graded release — committed
#: to the repo and shared verbatim with the DuckDB oracle, so the
#: registered key's "release" provides NO privacy whatsoever (anyone
#: with this string inverts the noise exactly). It exists so the
#: driver can grade the release MECHANICS deterministically.
#: Real releases go through [[dp_noise]], whose ``seed`` parameter is
#: required and must be SECRET and SINGLE-USE (r14 ADVICE).
_DP_SALT = "/dp-v1"


def dp_noise(key_expr: str, *, seed: str):
    """Geometric-mechanism noise column for an ε = ln 2 release:
    Z ~ two-sided geometric, P(Z = k) = (1/3)·(1/2)^|k| truncated to
    |Z| ≤ {tail}, drawn deterministically from
    ``md5(key_expr || seed)`` through the exact-rational inverse-CDF
    threshold table.

    ``seed`` is REQUIRED, and the ε guarantee holds ONLY if it is a
    SECRET, NON-REUSED value: the noise is a deterministic function
    of (group key, seed), so anyone who learns the seed inverts the
    release exactly (zero privacy), and re-using one seed across
    releases re-draws the SAME noise — correlated releases that do
    NOT buy fresh ε under composition. Treat it like key material:
    generate per release from a CSPRNG, store it where the raw data
    lives (same trust domain), never in code or release artifacts.
    The module-constant [[_DP_SALT]] that the graded fixture keys
    pass is the explicit counter-example — committed, reused, public
    — acceptable only because those keys grade mechanics, not
    privacy.

    The seed is DATA, not SQL: it enters through F.lit and the
    Column twin of the shared hash fragment ([[md5_u32_col]]), never
    an expression string — a CSPRNG seed containing a quote must not
    break parsing or splice expressions into the plan (r15 review).
    ``key_expr`` remains an expression BY CONTRACT (callers pass
    column arithmetic like ``CAST(k AS STRING)``)."""
    u = md5_u32_col(F.concat(F.expr(key_expr), F.lit(seed)))
    out = None
    for k, t in _dp_geo_thresholds():
        cond = u < F.lit(t)
        out = F.when(cond, k) if out is None else out.when(cond, k)
    return out.otherwise(F.lit(_DP_TAIL))


dp_noise.__doc__ = dp_noise.__doc__.replace("{tail}", str(_DP_TAIL))


def _dp_geo_thresholds() -> list[tuple[int, int]]:
    """(k, floor(F(k)·2^32)) for k in [−TAIL, TAIL): the exact-rational
    CDF of the two-sided geometric with p = 1/2 — P(Z = k) =
    (1/3)·(1/2)^|k| — discretized once in Fractions so both engines
    compare the SAME integer literals. F(k) = 1 − (1/3)(1/2)^k for
    k ≥ 0 and (2/3)(1/2)^(−k) for k < 0."""
    from fractions import Fraction
    import math

    out = []
    for k in range(-_DP_TAIL, _DP_TAIL):
        if k < 0:
            fk = Fraction(2, 3) * Fraction(1, 2) ** (-k)
        else:
            fk = 1 - Fraction(1, 3) * Fraction(1, 2) ** k
        out.append((k, math.floor(fk * _DP_U_SCALE)))
    return out


def _dp_noise_case(u_expr: str) -> str:
    """The inverse-CDF lookup as ONE engine-portable CASE chain over
    integer-literal thresholds: noise = min k with u < T(k), both
    tails clamped to ±TAIL. ``u_expr`` is the engine's 32-bit seeded
    hash fragment ([[md5_u32_sql]] / [[md5_u32_duck]]); everything
    downstream of it is pure integer comparison — no float, no libm,
    no engine-divergence surface (the parity analysis that killed
    weighted A-ES sampling does not apply here)."""
    whens = " ".join(
        f"WHEN {u_expr} < {t} THEN {k}" for k, t in _dp_geo_thresholds()
    )
    return f"(CASE {whens} ELSE {_DP_TAIL} END)"


_DP_SQL = f"""
    WITH g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           CAST(GREATEST(
             n + {_dp_noise_case(md5_u32_duck(f"event_type || '{_DP_SALT}'"))},
             0) AS BIGINT) AS n_noisy
    FROM g
    ORDER BY event_type
"""


@query("privacy_dp_count", oracle=_DP_SQL)
def privacy_dp_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private per-group counts — the RELEASE
    mechanic extending the audit triad ([[privacy_k_anonymity]] /
    [[privacy_l_diversity]] / [[privacy_t_closeness]]): those keys
    measure re-identification risk in a published table; this key
    publishes a statistic with a formal guarantee instead. The
    mechanism is the geometric (discrete Laplace) mechanism of
    Ghosh–Roughgarden–Sundararajan 2009 — universally optimal for
    counting queries — at ε = ln 2: noise Z with P(Z = k) =
    (1/3)·(1/2)^|k| added to each record count, then clamped at 0
    (post-processing, which DP is closed under).

    Determinism is the graded-parity requirement, met exactly like
    [[corpus_sample_hash]]: the noise draw's uniform is a salted
    md5 of the group key (32-bit integer via the shared
    [[md5_u32_sql]]/[[md5_u32_duck]] fragment pair), pushed through
    an inverse-CDF CASE whose thresholds are floor(F(k)·2^32)
    integer LITERALS precomputed in exact rational arithmetic — the
    whole mechanism is integer compares on an identical hash in
    both engines, so no libm/rounding divergence is possible.
    BUT determinism from a repo-committed seed means THIS KEY'S
    RELEASE HAS NO PRIVACY — it grades the mechanics. Production
    calls [[dp_noise]] directly, whose required ``seed`` must be
    secret and single-use for ε to mean anything (its docstring
    carries the full contract); re-releasing under fresh seeds
    composes ε's additively, which is the deployment's accounting
    problem, not the operator's.

    Noise support is truncated to |Z| ≤ {_DP_TAIL} (mass outside:
    (2/3)·2^−{_DP_TAIL} ≈ 6e-7 — a δ far below 1/groups for any
    fixture), giving a hard utility bound the tests pin:
    |released − true| ≤ {_DP_TAIL} always, and the threshold table
    itself certifies the e^ε ratio between adjacent noise widths.

    Plan: ONE map-side-combined groupBy(event_type) over events is
    the entire data-proportional cost; hashing + the CASE run on
    the handful of released rows. At 100 TB the released relation
    is still tiny — DP release is free at any scale once the count
    exists."""
    g = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    noise = dp_noise("event_type", seed=_DP_SALT)
    return (
        g.select(
            "event_type",
            F.greatest(F.col("n") + noise, F.lit(0))
            .cast("bigint")
            .alias("n_noisy"),
        )
        .orderBy("event_type")
    )


privacy_dp_count.__doc__ = privacy_dp_count.__doc__.replace(
    "{_DP_TAIL}", str(_DP_TAIL)
)


# ---------------------------------------------------------------------------
# ts_holt_forecast — Holt linear-trend smoothing + one-step forecast
# ---------------------------------------------------------------------------

_HOLT_L = 16
_HOLT_S = 4 ** _HOLT_L  # 2^32 — the common dyadic denominator


def _holt_weights() -> tuple[list[int], list[int]]:
    """Exact integer lag weights of the truncated Holt (1957) linear
    recurrence at alpha = beta = 1/2: the state [level, trend] obeys
    s_t = M s_{t-1} + v·x_t with M = [[1/2, 1/2], [-1/4, 3/4]],
    v = [1/2, 1/4], so level_t = Σ_j (M^j v)[0] · x_{t-j} and
    trend_t = Σ_j (M^j v)[1] · x_{t-j}. With dyadic alpha/beta every
    M^j v entry has denominator dividing 4^(j+1), so scaling by
    S = 4^L makes the first L weights EXACT int64 — the
    [[ts_ewma_smooth]] bit-determinism argument extended to a
    second-order recurrence. |eig(M)| = sqrt(det) = 1/√2, so the
    discarded tail carries ~0.707^L ≈ 0.4% of the mass (level
    weights sum to 1.0012·S, trend to 0.0029·S — the small constant
    bias the contract test bounds)."""
    from fractions import Fraction

    M = (
        (Fraction(1, 2), Fraction(1, 2)),
        (Fraction(-1, 4), Fraction(3, 4)),
    )
    cur = (Fraction(1, 2), Fraction(1, 4))
    cs, ds = [], []
    for _ in range(_HOLT_L):
        a, b = cur[0] * _HOLT_S, cur[1] * _HOLT_S
        assert a.denominator == 1 and b.denominator == 1
        cs.append(int(a))
        ds.append(int(b))
        cur = (
            M[0][0] * cur[0] + M[0][1] * cur[1],
            M[1][0] * cur[0] + M[1][1] * cur[1],
        )
    return cs, ds


_HOLT_CS, _HOLT_DS = _holt_weights()

_HOLT_LAGS = ",\n             ".join(
    f"LAG(v_c, {j}) OVER w AS lag_{j}" for j in range(_HOLT_L)
)


def _holt_sum_sql(ws: list[int]) -> str:
    return " + ".join(f"lag_{j} * ({w})" for j, w in enumerate(ws))


_HOLT_SQL = f"""
    WITH v AS (
      SELECT user_id, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS v_c
      FROM events
    ),
    lagged AS (
      SELECT user_id, ts, event_id, v_c,
             {_HOLT_LAGS}
      FROM v
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, ts,
           CAST(v_c AS DOUBLE) / 100 AS value,
           CAST(({_holt_sum_sql(_HOLT_CS)}) AS DOUBLE)
             / ({_HOLT_S}.0 * 100) AS holt_level,
           CAST(({_holt_sum_sql(_HOLT_DS)}) AS DOUBLE)
             / ({_HOLT_S}.0 * 100) AS holt_trend,
           CAST(({_holt_sum_sql([c + d for c, d in zip(_HOLT_CS, _HOLT_DS)])})
                AS DOUBLE) / ({_HOLT_S}.0 * 100) AS forecast_next
    FROM lagged
    WHERE lag_{_HOLT_L - 1} IS NOT NULL
"""


@query("ts_holt_forecast", oracle=_HOLT_SQL)
def ts_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Holt linear-trend smoothing with a ONE-STEP FORECAST
    (Holt 1957, alpha = beta = 1/2) — the registry's forecasting
    member, one order above [[ts_ewma_smooth]]'s level-only EWMA:
    the state tracks (level, trend) and forecast_next = level +
    trend is what a capacity dashboard plots past the last point.

    Exactness: the double recurrence unrolls to fixed lag weights
    ([[_holt_weights]] — exact dyadic integers at this alpha/beta,
    derived once in Fractions and embedded as the SAME literals in
    the Spark expression and the DuckDB oracle), so level, trend,
    and forecast are exact int64 dot products with one final IEEE
    division each — bit-identical across engines, where the naive
    recurrence would chain n data-dependent float ops. Truncation at
    {_HOLT_L} lags keeps ~99.6% of the weight mass (spectral radius
    1/√2); rows without a full {_HOLT_L}-lag history are EXCLUDED
    (steady-state semantics — Holt's trend is undefined at the
    series head anyway), which both engines express as the identical
    last-lag-not-null filter.

    Plan: ONE Window over ONE user-keyed exchange evaluates all
    {_HOLT_L} LAGs; the dot products are whole-stage-codegen integer
    arithmetic. At 100 TB this is a single pass over the
    time-ordered partition layout, the same shape as every other
    lag-ladder key."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("v_c"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [
        F.lag("v_c", j).over(w).alias(f"lag_{j}")
        for j in range(_HOLT_L)
    ]
    lagged = e.select("user_id", "ts", "event_id", "v_c", *lags)

    def dot(ws: list[int]):
        s = F.lit(0).cast("bigint")
        for j, wj in enumerate(ws):
            s = s + F.col(f"lag_{j}") * F.lit(wj)
        return s.cast("double") / (float(_HOLT_S) * 100.0)

    return lagged.filter(
        F.col(f"lag_{_HOLT_L - 1}").isNotNull()
    ).select(
        "user_id",
        "event_id",
        "ts",
        (F.col("v_c").cast("double") / 100).alias("value"),
        dot(_HOLT_CS).alias("holt_level"),
        dot(_HOLT_DS).alias("holt_trend"),
        dot([c + d for c, d in zip(_HOLT_CS, _HOLT_DS)]).alias(
            "forecast_next"
        ),
    )


ts_holt_forecast.__doc__ = ts_holt_forecast.__doc__.replace(
    "{_HOLT_L}", str(_HOLT_L)
)


# ---------------------------------------------------------------------------
# ts_acf — sample autocorrelation at lags 1..K, exact integer moments
# ---------------------------------------------------------------------------

#: Autocorrelation horizon. Lags 1..4 cover the diagnostics the TS
#: family's other members consume (EWMA/Holt smoothing constants,
#: CUSUM drift assumptions, seasonal-profile sanity); production
#: widens K with the identical plan (one more window column per lag).
_ACF_LAGS = 4


def _acf_num_sql(k: int) -> str:
    """The lag-k numerator ×n² in HUGEINT (DuckDB side) — the same
    cross-multiplied expansion the Spark decimals compute:
    n²·Σx_t·x_{t+k} − n·S·(Σ_head + Σ_tail) + (n−k)·S²."""
    return (
        f"CAST(n AS HUGEINT) * n * sxy{k}"
        f" - CAST(n AS HUGEINT) * s * (sh{k} + st{k})"
        f" + CAST(cnt{k} AS HUGEINT) * s * s"
    )


#: The shared moment CTE stack (m0 → m → g) — one window pass, one
#: fold; [[ts_acf]] and [[ts_pacf]] build on the same g so the two
#: keys can never disagree about the underlying exact moments.
_ACF_G_SQL = f"""m0 AS (
      SELECT event_type, ts, event_id,
             CAST(round(value * 1000) AS BIGINT) AS x
      FROM events
    ),
    m AS (
      SELECT event_type, x,
             {", ".join(f"lag(x, {k}) OVER w AS l{k}" for k in range(1, _ACF_LAGS + 1))}
      FROM m0
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ),
    g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS s,
             SUM(CAST(x AS HUGEINT) * x) AS ss,
             {", ".join(
                 f"SUM(CAST(x AS HUGEINT) * l{k}) AS sxy{k},"
                 f" SUM(l{k}) AS sh{k},"
                 f" SUM(CASE WHEN l{k} IS NOT NULL THEN x END) AS st{k},"
                 f" CAST(COUNT(l{k}) AS BIGINT) AS cnt{k}"
                 for k in range(1, _ACF_LAGS + 1)
             )}
      FROM m GROUP BY event_type
    )"""


def _acf_ratio_duck(k: int) -> str:
    """Lag-k autocorrelation as a double, DuckDB side — the exact
    integer num/den of [[_acf_num_sql]] with the single final
    division shared verbatim by ts_acf and ts_pacf."""
    return (
        f"CAST({_acf_num_sql(k)} AS DOUBLE)"
        f" / CAST(NULLIF(CAST(n AS HUGEINT) * n * ss"
        f"               - CAST(n AS HUGEINT) * s * s, 0) AS DOUBLE)"
    )


_ACF_SQL = f"""
    WITH {_ACF_G_SQL}
    SELECT event_type, lag, n_pairs, acf FROM (
      {" UNION ALL ".join(
          f'''SELECT event_type, CAST({k} AS BIGINT) AS lag,
                 cnt{k} AS n_pairs,
                 {_acf_ratio_duck(k)} AS acf
          FROM g'''
          for k in range(1, _ACF_LAGS + 1)
      )}
    )
    ORDER BY event_type, lag
"""


@query("ts_acf", oracle=_ACF_SQL)
def ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation function at lags 1..{_ACF_LAGS} per
    event type — the diagnostic member completing the TS family:
    [[ts_ewma_smooth]] and [[ts_holt_forecast]] pick smoothing
    constants, [[ts_cusum_changepoint]] assumes drift structure, and
    [[ts_seasonal_profile]] asserts periodicity — the ACF is the
    statistic that justifies all of those choices (Box–Jenkins model
    identification: AR signatures decay, MA signatures cut off).

    Exactness (the [[agg_corr_exact]]/[[abtest_welch_ttest]] moment
    discipline, pushed through a lag window): values go to integer
    milli-units once; each lag k needs only FIVE exact moments —
    Σx_t·x_{{t+k}}, Σ_head x, Σ_tail x, the pair count, plus the
    shared (n, S, Σx²) — folded in ONE pass. The mean-centered
    estimator r_k = Σ(x_t−x̄)(x_{{t+k}}−x̄) / Σ(x_t−x̄)² is
    cross-multiplied by n² so every intermediate is an exact integer
    (decimal(38,0) here ≡ the oracle's HUGEINT; magnitudes peak
    ~1e28 at sf1, far under 1e38), and the ONLY float operation is
    the final division — identical in both engines, no tolerance.
    Ordering is total ((ts, event_id) unique per type on the fixture
    family), so the lag pairing is deterministic.

    Plan: one window pass (4 lag columns over the SAME
    (event_type)/(ts, event_id) sort — one exchange + one sort,
    amortized across all lags) into one map-side-combined
    groupBy(event_type); the acf arithmetic runs on 5 report rows.
    At 100 TB the window partitions by series key exactly like every
    other TS member; no state beyond the K-deep lag buffer."""
    g = _acf_moment_frame(load(spark, sf_dir, "events"))
    rows = [
        F.struct(
            F.lit(k).cast("bigint").alias("lag"),
            F.col(f"cnt{k}").alias("n_pairs"),
            _acf_ratio_spark(k).alias("acf"),
        )
        for k in range(1, _ACF_LAGS + 1)
    ]
    return (
        g.select("event_type", F.explode(F.array(*rows)).alias("r"))
        .select("event_type", "r.lag", "r.n_pairs", "r.acf")
        .orderBy("event_type", "lag")
    )


ts_acf.__doc__ = ts_acf.__doc__.replace("{_ACF_LAGS}", str(_ACF_LAGS))


#: Time-bucket width for the parallel moment frame. One hour keeps
#: buckets people-sized at every fixture SF (2.8 / 28 / 280 rows per
#: type-hour at sf0.01/0.1/1); production tunes it toward ~10³ rows
#: per bucket. Correctness is width-INDEPENDENT (the global-position
#: join below repairs every boundary, including buckets smaller than
#: the lag horizon and empty buckets), so the knob is pure plan
#: shape — no straddling-probe obligation.
_ACF_BUCKET_SEC = 3600


#: Row count above which [[_acf_moment_frame]] switches from the
#: single-window form to the bucketed form. MEASURED crossover
#: logic, not guesswork: interleaved A/B (r16, fresh session, noop
#: sink, best-of-3/4) put the single-window form AHEAD at every
#: fixture decade — 0.80 vs 2.83 s at sf0.1, 3.56 vs 4.80 s at sf1
#: (1M rows/series; five parallel in-memory sorts beat the bucketed
#: form's checkpoint + boundary machinery). The hazard the bucketed
#: form exists for — ONE task sorting and spilling a whole series —
#: needs a series bigger than a single task's sort capacity, ~10⁸
#: rows as a conservative floor (tens of GB through one sorter).
#: Resolution uses the TOTAL row count (one metadata-cheap count(),
#: the pagerank/kcore driver-scalar precedent): above the cutoff
#: the bucketed form is at worst ~1.3× locally and unboundedly
#: better when series are few and huge.
_ACF_SERIES_FORM_MAX_ROWS = 100_000_000


def _acf_moment_frame_series(e: DataFrame) -> DataFrame:
    """Single-window reference form of the moment frame: one
    (event_type)/(ts, event_id) sort window per series. The FAST
    form at fixture scales (measured above) and the semantic
    reference the bucketed form must bit-match. Its scale hazard is
    the one the weighted-median r10 rewrite documented: a whole
    series funnels through ONE sort task, an executor's worth of
    spill once a series outgrows single-task sort capacity — which
    is exactly where [[_acf_moment_frame]] flips to the bucketed
    form."""
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    m = e.select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 1000).cast("bigint").alias("x"),
    )
    lagged = m.select(
        "event_type",
        "x",
        *[
            F.lag("x", k).over(w).alias(f"l{k}")
            for k in range(1, _ACF_LAGS + 1)
        ],
    )
    return lagged.groupBy("event_type").agg(
        *_acf_core_aggs(), *_acf_pair_aggs()
    )


def _acf_core_aggs() -> list:
    return [
        F.count("*").cast("bigint").alias("n"),
        wide_sum(F.col("x")).alias("s"),
        wide_sum(F.col("x"), F.col("x")).alias("ss"),
    ]


def _acf_pair_aggs() -> list:
    aggs = []
    for k in range(1, _ACF_LAGS + 1):
        lk = F.col(f"l{k}")
        aggs += [
            wide_sum(F.col("x"), lk).alias(f"sxy{k}"),
            wide_sum(lk).alias(f"sh{k}"),
            wide_sum(F.when(lk.isNotNull(), F.col("x"))).alias(
                f"st{k}"
            ),
            F.count(lk).cast("bigint").alias(f"cnt{k}"),
        ]
    return aggs


def _acf_moment_frame(
    e: DataFrame,
    bucket_sec: int = _ACF_BUCKET_SEC,
    max_series_rows: int | None = None,
) -> DataFrame:
    """Per-type exact moments (n, S, Σx², and per lag k ≤ K:
    Σx_t·x_{t−k}, head/tail sums, pair count) — the g frame
    [[ts_acf]], [[ts_pacf]] and [[ts_ljung_box]] all read. SIZE-
    RESOLVED dual path (the graph-broadcast / phash-band pattern,
    including its lesson that an unselected scale knob is a weak
    flag): one cheap count() picks the measured-fastest form below
    [[_ACF_SERIES_FORM_MAX_ROWS]] ([[_acf_moment_frame_series]])
    and the serialization-proof bucketed form above it. Both forms
    are bit-identical by test at every fixture SF, so the switch
    can never change an answer.

    The bucketed form: the single-window form partitions the raw
    stream by series key, funneling each series through one sort
    task (an executor's worth of spill once a series outgrows a
    task). Here the sort partitions by (series, time bucket)
    instead — thousands of bucket-bounded sorts — and the ≤ K pairs
    that straddle each bucket boundary are repaired exactly:

    1. In-bucket lag window over (event_type, b = floor(epoch/w))
       pairs every row whose lag-k predecessor shares its bucket.
       Ordering by (b, ts, event_id) ≡ (ts, event_id) since b is
       monotone in ts, so the pairing matches the global order.
    2. Each row's GLOBAL position g = (exclusive running sum of
       bucket sizes over the per-type bucket DIM frame — hundreds
       of rows, the only per-series sequential fold) + in-bucket
       row_number. Empty and sub-K buckets need no special case: g
       is exact whatever the bucket occupancy.
    3. The missing pairs are exactly {(successor within K of its
       bucket START) × (predecessor within K of its bucket END)}
       at g-distance k ≥ successor's in-bucket rank (closer
       predecessors were paired in-bucket; a predecessor k ≤ K
       steps back across ANY number of boundaries is always within
       K of its own bucket's end). One broadcast range join of the
       two K-deep fringe frames recovers them; their moment terms
       add to the in-bucket partials per (type, k).

    Every term is the same exact decimal(38,0) integer the oracle's
    HUGEINT computes; addition is associative over exact integers,
    so the split changes NOTHING about any output bit — pinned by
    the bit-equality test against [[_acf_moment_frame_series]].
    wide_sum widens the ELEMENT before any multiply: casting only
    the sum would let the bigint product x·x wrap at |x| > ~3e9."""
    from pyspark.sql import Window

    cutoff = (
        max_series_rows
        if max_series_rows is not None
        else _ACF_SERIES_FORM_MAX_ROWS
    )
    if e.count() <= cutoff:
        return _acf_moment_frame_series(e)

    K = _ACF_LAGS
    m = e.select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 1000).cast("bigint").alias("x"),
        F.floor(
            F.col("ts").cast("timestamp_ltz").cast("long")
            / F.lit(bucket_sec)
        ).alias("b"),
    )
    wb = Window.partitionBy("event_type", "b").orderBy(
        "ts", "event_id"
    )
    # whole-partition frame is safe HERE: the partition is one time
    # bucket, bounded by bucket width × arrival rate, never a series
    wsz = Window.partitionBy("event_type", "b")
    lagged = m.select(
        "event_type",
        "b",
        "x",
        F.row_number().over(wb).alias("rn"),
        F.count("*").over(wsz).alias("bsz"),
        *[F.lag("x", k).over(wb).alias(f"l{k}") for k in range(1, K + 1)],
        # checkpoint: the windowed frame feeds BOTH the moment fold
        # and the fringe extraction; column pruning gives the two
        # branches different scan projections, which defeats
        # exchange reuse — without the cut the (type, b) sort runs
        # per consumer (the chi-square cells / LPA checkpoint
        # precedent)
    ).localCheckpoint(eager=False)
    core = lagged.groupBy("event_type").agg(
        *_acf_core_aggs(), *_acf_pair_aggs()
    )
    # exclusive per-type running bucket offsets — a window over the
    # bucket DIM frame (one row per non-empty (type, bucket)), the
    # only sequential-per-series step and it is dim-sized; derived
    # from m directly (bucket sizes need no ordering)
    sizes = m.groupBy("event_type", "b").agg(
        F.count("*").alias("bsz")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = sizes.select(
        "event_type",
        "b",
        F.coalesce(F.sum("bsz").over(wcum), F.lit(0)).alias("off"),
    )
    fringe = lagged.filter(
        (F.col("rn") <= K) | (F.col("bsz") - F.col("rn") < K)
    ).join(F.broadcast(offs), ["event_type", "b"])
    heads = fringe.filter(F.col("rn") <= K).select(
        "event_type",
        (F.col("off") + F.col("rn")).alias("g"),
        F.col("rn").alias("p"),
        F.col("x").alias("xh"),
    )
    tails = fringe.filter(
        F.col("bsz") - F.col("rn") < K
    ).select(
        "event_type",
        (F.col("off") + F.col("rn")).alias("g"),
        F.col("x").alias("xt"),
    )
    # Block the range join on g div K (r16 self-review: with only
    # event_type as an equi key, the hash join buckets per TYPE and
    # every head scans ALL same-type tails — ~K·#buckets rows at
    # exactly the >cutoff scale this form exists for, a quadratic
    # fringe scan. The wanted tails sit in [g−K, g−1], an interval
    # of width ≤ K−1 that meets at most TWO g-blocks of width K —
    # the geo-grid pigeonhole in 1-D — so each head probes exactly
    # 2 blocks and the hash join delivers O(K) candidates/head.)
    h = (
        heads.select(
            "*", F.explode(F.array(F.lit(0), F.lit(1))).alias("dx")
        )
        .select(
            "event_type",
            "g",
            "p",
            "xh",
            (F.floor((F.col("g") - K) / F.lit(K)) + F.col("dx")).alias(
                "blk"
            ),
        )
        .alias("h")
    )
    t = tails.withColumn(
        "blk", F.floor(F.col("g") / F.lit(K))
    ).alias("t")
    pairs = h.join(
        F.broadcast(t),
        (F.col("h.event_type") == F.col("t.event_type"))
        & (F.col("h.blk") == F.col("t.blk"))
        & (F.col("t.g") >= F.col("h.g") - K)
        & (F.col("t.g") <= F.col("h.g") - F.col("h.p")),
    ).select(
        F.col("h.event_type").alias("event_type"),
        (F.col("h.g") - F.col("t.g")).alias("k"),
        "xh",
        "xt",
    )
    bnd_aggs = []
    for k in range(1, K + 1):
        isk = F.col("k") == k
        # NULL-measure parity with the series aggs (r17 hazard class
        # 11): st{k} sums x only WHERE l_k IS NOT NULL and cnt{k} is
        # count(l_k) — so the boundary twins must gate on the
        # PREDECESSOR value (xt) being non-NULL, exactly as the lag
        # column would be. bxy/bh need no gate: the product and the
        # bare xt sum already skip NULLs identically.
        has_pred = isk & F.col("xt").isNotNull()
        bnd_aggs += [
            wide_sum(F.when(isk, F.col("xh")), F.col("xt")).alias(
                f"bxy{k}"
            ),
            wide_sum(F.when(isk, F.col("xt"))).alias(f"bh{k}"),
            wide_sum(F.when(has_pred, F.col("xh"))).alias(f"bt{k}"),
            F.count(F.when(has_pred, F.lit(1))).cast("bigint").alias(
                f"bc{k}"
            ),
        ]
    bnd = pairs.groupBy("event_type").agg(*bnd_aggs)
    z = F.lit(0).cast("decimal(38,0)")
    cols = ["event_type", "n", "s", "ss"]
    merged = core.join(F.broadcast(bnd), "event_type", "left")
    exprs = [
        *(F.col(c) for c in cols),
    ]
    for k in range(1, K + 1):
        # either side may be NULL alone (a type with no in-bucket
        # lag-k pair at sparse SFs, or no boundary pair): coalesce
        # BOTH, with each sum NULL iff BOTH parts are NULL — the
        # series SUM skips NULLs, so with NULL measures a positive
        # pair COUNT does not imply a non-NULL sum (hazard class 11,
        # r17: the old `combined count > 0` guard coalesced an
        # all-NULL-product sxy to 0 where the series arm says NULL).
        # On a NULL-free stream the two guards are equivalent.
        def _both(a: str, bcol: str):
            return F.when(
                F.col(a).isNull() & F.col(bcol).isNull(),
                F.lit(None),
            ).otherwise(
                F.coalesce(F.col(a), z) + F.coalesce(F.col(bcol), z)
            )

        exprs += [
            _both(f"sxy{k}", f"bxy{k}").alias(f"sxy{k}"),
            _both(f"sh{k}", f"bh{k}").alias(f"sh{k}"),
            _both(f"st{k}", f"bt{k}").alias(f"st{k}"),
            (
                F.col(f"cnt{k}")
                + F.coalesce(F.col(f"bc{k}"), F.lit(0))
            )
            .cast("bigint")
            .alias(f"cnt{k}"),
        ]
    return merged.select(*exprs)


def _acf_ratio_spark(k: int):
    """Lag-k autocorrelation as a double — exact decimal(38,0)
    num/den with the single final division, the Spark twin of
    [[_acf_ratio_duck]] (decimal→double ≡ HUGEINT→double cast
    rounding, confirmed hash-matched in r14)."""
    nd = F.col("n").cast("decimal(38,0)")
    den = (nd * nd * F.col("ss") - nd * F.col("s") * F.col("s")).cast(
        "double"
    )
    num = (
        nd * nd * F.col(f"sxy{k}")
        - nd * F.col("s") * (F.col(f"sh{k}") + F.col(f"st{k}"))
        + F.col(f"cnt{k}").cast("decimal(38,0)")
        * F.col("s")
        * F.col("s")
    ).cast("double")
    return num / F.nullif(den, F.lit(0.0))


# ---------------------------------------------------------------------------
# ts_pacf — partial autocorrelation via unrolled Durbin–Levinson
# ---------------------------------------------------------------------------


def _pacf_exprs() -> dict[int, str]:
    """Unrolled Durbin–Levinson φ_kk for k = 1..4 as SQL strings over
    double columns r1..r4 — shared VERBATIM by the Spark plan and the
    DuckDB oracle, which is the whole parity argument: both engines
    receive the identical operand tree over bit-identical inputs
    (the r_k divisions are the hash-matched ts_acf values), and
    deterministic IEEE arithmetic on identical doubles with
    identical nesting is engine-independent (the
    [[agg_skew_kurtosis]] lesson; only cross-row accumulation order
    is forbidden, and none of this is cross-row). Textual expansion
    duplicates subtrees (φ33 appears four times inside φ44) — both
    engines just evaluate the same tree again; these run on a
    handful of post-aggregate report rows. Every division is
    nullif-guarded (a degenerate |ρ1| = 1 series yields NULL, not an
    engine-dependent inf)."""
    p11 = "(r1)"
    d2 = "nullif(1 - r1*r1, 0.0e0)"
    p22 = f"((r2 - r1*r1) / {d2})"
    p21 = f"(r1 - {p22}*r1)"
    d3 = f"nullif(1 - ({p21}*r1 + {p22}*r2), 0.0e0)"
    p33 = f"((r3 - ({p21}*r2 + {p22}*r1)) / {d3})"
    p31 = f"({p21} - {p33}*{p22})"
    p32 = f"({p22} - {p33}*{p21})"
    d4 = f"nullif(1 - ({p31}*r1 + {p32}*r2 + {p33}*r3), 0.0e0)"
    p44 = f"((r4 - ({p31}*r3 + {p32}*r2 + {p33}*r1)) / {d4})"
    return {1: p11, 2: p22, 3: p33, 4: p44}


_PACF_SQL = f"""
    WITH {_ACF_G_SQL},
    r AS (
      SELECT event_type,
             {", ".join(f"{_acf_ratio_duck(k)} AS r{k}" for k in range(1, _ACF_LAGS + 1))}
      FROM g
    )
    SELECT event_type, lag, pacf FROM (
      {" UNION ALL ".join(
          f'''SELECT event_type, CAST({k} AS BIGINT) AS lag,
                 {expr} AS pacf
          FROM r'''
          for k, expr in _pacf_exprs().items()
      )}
    )
    ORDER BY event_type, lag
"""


@query("ts_pacf", oracle=_PACF_SQL)
def ts_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation at lags 1..{_ACF_LAGS} per event type
    — [[ts_acf]]'s Box–Jenkins sibling (the ACF identifies MA order
    by cut-off, the PACF identifies AR order the same way; model
    identification needs both). φ_kk comes from the textbook
    Durbin–Levinson recursion, unrolled to closed form at this fixed
    lag depth.

    Parity (the r14 land-or-kill question, answered by the
    [[agg_skew_kurtosis]] precedent rather than exact-rational
    Levinson): the recursion's inputs are the ts_acf ratios —
    single divisions of exact decimal(38,0)/HUGEINT integers,
    already hash-matched — and the recursion itself is evaluated
    from ONE shared expression-string builder ([[_pacf_exprs]]), so
    both engines run the identical IEEE operand tree on identical
    doubles: bit-identical outputs with zero tolerance, no Fractions
    machinery needed. Divisions are nullif-guarded; short series
    (n_pairs = 0 at some lag) propagate NULL through the recursion
    in both engines.

    Plan: identical data-proportional cost to ts_acf — the SAME one
    window pass + one fold ([[_acf_moment_frame]]); the whole
    recursion runs on the ~5 post-aggregate report rows. At 100 TB:
    partition by series key, K-deep lag buffer, nothing else."""
    g = _acf_moment_frame(load(spark, sf_dir, "events"))
    r = g.select(
        "event_type",
        *[
            _acf_ratio_spark(k).alias(f"r{k}")
            for k in range(1, _ACF_LAGS + 1)
        ],
    )
    rows = [
        F.struct(
            F.lit(k).cast("bigint").alias("lag"),
            F.expr(expr).alias("pacf"),
        )
        for k, expr in _pacf_exprs().items()
    ]
    return (
        r.select("event_type", F.explode(F.array(*rows)).alias("p"))
        .select("event_type", "p.lag", "p.pacf")
        .orderBy("event_type", "lag")
    )


ts_pacf.__doc__ = ts_pacf.__doc__.replace("{_ACF_LAGS}", str(_ACF_LAGS))


# ---------------------------------------------------------------------------
# ts_ljung_box — portmanteau whiteness test on the shared ACF frame
# ---------------------------------------------------------------------------


def _ljung_box_expr() -> str:
    """Q = n·(n+2)·Σ_{k=1..K} r_k²/(n−k) as ONE SQL string over
    bigint n and double r1..r4 — shared verbatim by both engines
    (the [[_pacf_exprs]] identical-tree parity argument)."""
    nd = "CAST(n AS DOUBLE)"
    terms = " + ".join(
        f"(r{k}*r{k}) / ({nd} - {k})" for k in range(1, _ACF_LAGS + 1)
    )
    return f"({nd} * ({nd} + 2) * ({terms}))"


_LJUNG_SQL = f"""
    WITH {_ACF_G_SQL},
    r AS (
      SELECT event_type, n,
             {", ".join(f"{_acf_ratio_duck(k)} AS r{k}" for k in range(1, _ACF_LAGS + 1))}
      FROM g
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_obs,
           CAST({_ACF_LAGS} AS BIGINT) AS df,
           {_ljung_box_expr()} AS q_stat
    FROM r
    ORDER BY event_type
"""


@query("ts_ljung_box", oracle=_LJUNG_SQL)
def ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau statistic Q at lags 1..{_ACF_LAGS} per
    event type — the TEST that consumes [[ts_acf]]'s diagnostics:
    under the null of a white series, Q ~ χ²(K), so a large Q says
    the autocorrelation structure the ACF displays is real, not
    sampling noise (the standard residual-whiteness check after
    fitting the models [[ts_ewma_smooth]]/[[ts_holt_forecast]]
    represent). Q is released with its degrees of freedom; the χ²
    p-value lookup is a driver-side table join in production —
    shipping erf/Γ approximations would reopen the libm parity
    surface for zero analytic gain.

    Parity: same recipe as [[ts_pacf]] — inputs are the hash-matched
    exact-moment ACF ratios, and Q's arithmetic is ONE shared
    expression string over (n, r1..r4), so both engines evaluate the
    identical IEEE tree. Data cost: the SAME single window pass +
    fold as its two siblings ([[_acf_moment_frame]]); Q itself runs
    on ~5 report rows."""
    g = _acf_moment_frame(load(spark, sf_dir, "events"))
    r = g.select(
        "event_type",
        "n",
        *[
            _acf_ratio_spark(k).alias(f"r{k}")
            for k in range(1, _ACF_LAGS + 1)
        ],
    )
    return r.select(
        "event_type",
        F.col("n").alias("n_obs"),
        F.lit(_ACF_LAGS).cast("bigint").alias("df"),
        F.expr(_ljung_box_expr()).alias("q_stat"),
    ).orderBy("event_type")


ts_ljung_box.__doc__ = ts_ljung_box.__doc__.replace(
    "{_ACF_LAGS}", str(_ACF_LAGS)
)


# ---------------------------------------------------------------------------
# privacy_dp_sum — bounded-sensitivity ε-DP sums (clip → quantize → noise)
# ---------------------------------------------------------------------------

#: Per-record contribution bound, in milli-units (100.0 value units).
#: Clipping to C is what gives the sum a finite sensitivity at all —
#: the release is of the CLIPPED total, the standard DP-SQL contract.
_DP_SUM_CLIP = 100_000

#: FIXTURE seed for the sum release — independent of the count
#: release's so the two graded mechanisms draw independent noise;
#: same caveat as [[_DP_SALT]]: committed ⇒ zero privacy, grading
#: only. Real releases pass a secret single-use seed to [[dp_noise]].
_DP_SUM_SALT = "/dp-sum-v1"


_DP_SUM_SQL = f"""
    WITH g AS (
      SELECT event_type,
             SUM(GREATEST(LEAST(CAST(round(value * 1000) AS BIGINT),
                                {_DP_SUM_CLIP}), 0)) // {_DP_SUM_CLIP}
               AS q
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           CAST(GREATEST(
             q + {_dp_noise_case(md5_u32_duck(f"event_type || '{_DP_SUM_SALT}'"))},
             0) * {_DP_SUM_CLIP} AS BIGINT) AS sum_released_milli
    FROM g
    ORDER BY event_type
"""


@query("privacy_dp_sum", oracle=_DP_SUM_SQL)
def privacy_dp_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP per-group SUM release — the second release mechanic next
    to [[privacy_dp_count]], together covering the count/sum/mean
    trio every DP-SQL engine exposes (mean = released sum over
    released count, pure post-processing). Counts have sensitivity 1
    for free; sums do NOT — an unbounded record can shift the total
    arbitrarily — so the pipeline is the standard three-step DP-SQL
    contract:

    1. **Clip**: each record's contribution is bounded into
       [0, C] with C = {_DP_SUM_CLIP} milli-units
       (`greatest(least(x, C), 0)`) — TWO-sided, because a cap from
       above alone would leave a negative record with unbounded
       influence and void the sensitivity argument. The released
       statistic is the CLIPPED total — the bias-for-privacy trade
       every bounded-contribution system makes.
    2. **Quantize**: the clipped sum is floored into units of C
       (`div C`), which provably has record-level sensitivity 1
       (one record moves the clipped sum by ≤ C, the floor by ≤ 1).
    3. **Noise**: the SAME certified geometric mechanism as the
       count key — identical exact-rational threshold table, an
       INDEPENDENT salt — adds Z at ε = ln 2, and the release is
       (q + Z)·C, clamped at 0 (post-processing).

    Releasing both this key and [[privacy_dp_count]] on one table
    composes to 2·ln 2 total ε — the deployment's ledger entry, not
    the operator's. Parity is inherited wholesale: clip, sum, floor
    division, threshold compares and the final multiply are all
    exact integer ops on both engines; there is no new float surface
    anywhere. Utility is hard-bounded by the truncated support:
    |released − clipped_true| ≤ ({_DP_TAIL} + 1)·C always.

    Plan: the identical one map-side-combined groupBy as the count
    key — DP sum release costs one `least()` over the scan."""
    g = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            # integer `div`, not float `/`: floor semantics identical
            # to the oracle's `//` and exact past 2^53 where a double
            # quotient would round. The clip is TWO-SIDED ([0, C]) —
            # capping only from above would leave a negative record
            # with unbounded influence and void the sensitivity-1
            # argument (r14 review finding).
            F.expr(
                "sum(greatest(least(CAST(round(value * 1000) AS"
                f" BIGINT), {_DP_SUM_CLIP}), 0)) div {_DP_SUM_CLIP}"
            ).alias("q")
        )
    )
    noise = dp_noise("event_type", seed=_DP_SUM_SALT)
    return (
        g.select(
            "event_type",
            (
                F.greatest(F.col("q") + noise, F.lit(0))
                * F.lit(_DP_SUM_CLIP)
            )
            .cast("bigint")
            .alias("sum_released_milli"),
        )
        .orderBy("event_type")
    )


privacy_dp_sum.__doc__ = privacy_dp_sum.__doc__.replace(
    "{_DP_SUM_CLIP}", str(_DP_SUM_CLIP)
).replace("{_DP_TAIL}", str(_DP_TAIL))


# ---------------------------------------------------------------------------
# privacy_dp_topk — noisy top-k release (report-noisy-max, iterated)
# ---------------------------------------------------------------------------

#: FIXTURE seed for the top-k release — independent of the count and
#: sum releases'; same caveat as [[_DP_SALT]] (committed ⇒ zero
#: privacy, grading only).
_DP_TOPK_SALT = "/dp-topk-v1"

#: Released list length.
_DP_TOPK_K = 10

_DP_TOPK_SQL = f"""
    WITH g AS (
      SELECT l_partkey,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_partkey
    ),
    noisy AS (
      SELECT l_partkey,
             GREATEST(
               n + {_dp_noise_case(md5_u32_duck(f"CAST(l_partkey AS VARCHAR) || '{_DP_TOPK_SALT}'"))},
               0) AS n_noisy
      FROM g
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_noisy DESC, l_partkey)
                AS BIGINT) AS rank,
           l_partkey,
           CAST(n_noisy AS BIGINT) AS n_noisy
    FROM noisy
    ORDER BY n_noisy DESC, l_partkey
    LIMIT {_DP_TOPK_K}
"""


@query("privacy_dp_topk", oracle=_DP_TOPK_SQL)
def privacy_dp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP top-{_DP_TOPK_K} release — the third release mechanic
    completing the DP family ([[privacy_dp_count]] = counts,
    [[privacy_dp_sum]] = bounded sums, this = the ubiquitous "which
    keys dominate" query: top parts by order volume here, top
    domains by document count in a corpus-governance report). The
    mechanism is iterated report-noisy-max over the one-sided-free
    geometric noise of [[dp_noise]]: every per-key count gets an
    independent draw (key ⊕ salt), and the k largest NOISY counts
    are released together with their noisy values — never the true
    counts, and keys outside the top-k are never revealed at all.
    The released ranking is post-processing of the noisy counts, so
    the whole list costs the k·ε (one ε per selected element) that
    peeling-style mechanisms pay; one more ledger entry for the
    deployment's accounting.

    The privacy unit is ONE lineitem row (one part-order incidence —
    the same record unit as the count key). Same grading caveat as
    the siblings: the committed fixture salt means THIS key grades
    release MECHANICS, not privacy; production passes a secret,
    single-use seed to [[dp_noise]].

    Parity: counts are exact; noise is the certified exact-rational
    threshold CASE on the shared 32-bit md5 (BIGINT→string key
    formatting is locale-free and identical in both engines); the
    ranking compares integers with an integer tie-break. Nothing
    floats anywhere.

    Plan: ONE map-side-combined groupBy(l_partkey) over the fact
    table; noise + ranking run on the ~20k per-key rows, and only k
    rows leave. At 100 TB the top-k is a per-partition partial
    ORDER BY n_noisy LIMIT k under TakeOrderedAndProject — no global
    sort materializes."""
    g = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    noise = dp_noise(
        "CAST(l_partkey AS STRING)", seed=_DP_TOPK_SALT
    )
    noisy = g.select(
        "l_partkey",
        F.greatest(F.col("n") + noise, F.lit(0)).alias("n_noisy"),
    )
    from pyspark.sql import Window

    # limit FIRST (TakeOrderedAndProject: per-partition partial
    # top-k, no global sort), then rank the k survivors — ranking
    # before the limit would put every key through one unpartitioned
    # window sort task
    topk = noisy.orderBy(
        F.col("n_noisy").desc(), "l_partkey"
    ).limit(_DP_TOPK_K)
    w = Window.orderBy(F.col("n_noisy").desc(), F.col("l_partkey"))
    return (
        topk.withColumn(
            "rank", F.row_number().over(w).cast("bigint")
        )
        .select("rank", "l_partkey", F.col("n_noisy").cast("bigint"))
        .orderBy("rank")
    )


privacy_dp_topk.__doc__ = privacy_dp_topk.__doc__.replace(
    "{_DP_TOPK_K}", str(_DP_TOPK_K)
)


# ---------------------------------------------------------------------------
# ts_theil_sen — robust trend line (median-of-pairwise-slopes)
# ---------------------------------------------------------------------------

#: Bucket width in seconds. Theil–Sen is O(B²) in the number of
#: points, so the scale contract is to estimate over BUCKET means
#: (the fixture's 30-day window → ~720 hourly buckets → ~260k pair
#: slopes per series, independent of row density); raw-point
#: Theil–Sen on an unbounded series does not survive any scale-up.
_TSEN_BUCKET_S = 3600

def _hour_bucket_frame(ev: DataFrame) -> DataFrame:
    """Per-(series, epoch-hour) exact moment frame ``(event_type, h,
    s, c)`` — the ONE bucket definition [[ts_theil_sen]] and
    [[ts_mann_kendall]] share (twin of [[_TSEN_B_CTE]])."""
    return (
        ev.select(
            "event_type",
            F.expr(f"CAST(ts AS LONG) div {_TSEN_BUCKET_S}").alias("h"),
            F.round(F.col("value") * 1000).cast("bigint").alias("x"),
        )
        .groupBy("event_type", "h")
        .agg(
            F.sum("x").cast("bigint").alias("s"),
            F.count("*").cast("bigint").alias("c"),
        )
        .localCheckpoint(eager=False)
    )


#: The hourly bucket CTE shared by ts_theil_sen and ts_mann_kendall —
#: one definition, so the two trend keys can never disagree about the
#: series they test.
_TSEN_B_CTE = f"""b AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // {_TSEN_BUCKET_S} AS h,
             SUM(CAST(round(value * 1000) AS BIGINT)) AS s,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    )"""

_TSEN_SQL = f"""
    WITH {_TSEN_B_CTE},
    p AS (
      SELECT i.event_type,
             CAST(CAST(j.s AS HUGEINT) * i.c
                  - CAST(i.s AS HUGEINT) * j.c AS DOUBLE)
               / CAST(i.c * j.c * (j.h - i.h) AS DOUBLE) AS slope,
             i.h AS hi, j.h AS hj
      FROM b i
      JOIN b j ON i.event_type = j.event_type AND i.h < j.h
    ),
    ms AS (
      SELECT event_type, slope, n_pairs FROM (
        SELECT event_type, slope,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY slope, hi, hj) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                 AS n_pairs
        FROM p
      ) WHERE rn = (n_pairs + 1) // 2
    ),
    iv AS (
      SELECT b.event_type, ms.slope, ms.n_pairs, b.h,
             CAST(b.s AS DOUBLE) / b.c - ms.slope * b.h AS v
      FROM b JOIN ms USING (event_type)
    )
    SELECT event_type, n_buckets, n_pairs,
           slope AS slope_milli_per_hr, v AS intercept_milli
    FROM (
      SELECT event_type, slope, n_pairs, v,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY v, h) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
               AS n_buckets
      FROM iv
    ) WHERE rn = (n_buckets + 1) // 2
    ORDER BY event_type
"""


@query("ts_theil_sen", oracle=_TSEN_SQL)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type — slope = median of all
    pairwise bucket-mean slopes, intercept = median of (mean −
    slope·t): the estimator with a 29.3% breakdown point, next to
    [[agg_linear_fit]]'s least squares (which one outlier burst
    drags arbitrarily) and [[ts_anomaly_mad]]'s robust dispersion
    (same median-not-mean philosophy, applied to trend instead of
    spread). The pipeline shape: drift DIRECTION estimation on
    metrics with fat-tailed contamination — exactly where OLS lies.

    Exactness: bucket sums/counts are exact integers (milli-units,
    epoch-hour buckets); each pair slope is ONE double division of
    the cross-multiplied rational (s_j·c_i − s_i·c_j)/(c_i·c_j·Δh) —
    integer div would floor-vs-truncate differ on NEGATIVE slopes
    across engines, so the division is IEEE double in BOTH, bit-
    identical on identical exact inputs. The median is SELECTION
    (row_number at rank (n+1)//2), never an average of two floats;
    the intercept stage reuses the identical expression tree.

    Plan: one map-side-combined fold to ≤720 buckets per series, a
    per-series range self-join (~260k pair rows per series — bounded
    by the BUCKET count, not corpus rows), two rank-select windows
    over tiny frames, and a 5-row broadcast of slopes back onto
    buckets. At 100 TB the corpus-proportional work is ONLY the
    first fold; everything after runs on bucket cardinality."""
    from pyspark.sql.window import Window

    b = _hour_bucket_frame(load(spark, sf_dir, "events"))
    i, j = b.alias("i"), b.alias("j")
    p = i.join(
        j,
        (F.col("i.event_type") == F.col("j.event_type"))
        & (F.col("i.h") < F.col("j.h")),
    ).select(
        F.col("i.event_type").alias("event_type"),
        (
            # widen BEFORE the product (bucket sum × bucket count
            # wraps int64 once per-bucket density reaches ~1e6 rows —
            # ten past sf1; the oracle's HUGEINT twin is exact there)
            (
                F.col("j.s").cast("decimal(38,0)") * F.col("i.c")
                - F.col("i.s").cast("decimal(38,0)") * F.col("j.c")
            )
            .cast("double")
            / (
                F.col("i.c")
                * F.col("j.c")
                * (F.col("j.h") - F.col("i.h"))
            ).cast("double")
        ).alias("slope"),
        F.col("i.h").alias("hi"),
        F.col("j.h").alias("hj"),
    )
    ws = Window.partitionBy("event_type").orderBy("slope", "hi", "hj")
    ms = (
        p.withColumn("rn", F.row_number().over(ws))
        .withColumn(
            "n_pairs",
            F.count("*")
            .over(Window.partitionBy("event_type"))
            .cast("bigint"),
        )
        .filter(F.col("rn") == F.expr("(n_pairs + 1) div 2"))
        .select("event_type", "slope", "n_pairs")
    )
    iv = b.join(F.broadcast(ms), "event_type").select(
        "event_type",
        "slope",
        "n_pairs",
        "h",
        (
            F.col("s").cast("double") / F.col("c")
            - F.col("slope") * F.col("h")
        ).alias("v"),
    )
    wv = Window.partitionBy("event_type").orderBy("v", "h")
    return (
        iv.withColumn("rn", F.row_number().over(wv))
        .withColumn(
            "n_buckets",
            F.count("*")
            .over(Window.partitionBy("event_type"))
            .cast("bigint"),
        )
        .filter(F.col("rn") == F.expr("(n_buckets + 1) div 2"))
        .select(
            "event_type",
            "n_buckets",
            "n_pairs",
            F.col("slope").alias("slope_milli_per_hr"),
            F.col("v").alias("intercept_milli"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# abtest_mann_whitney — rank-sum experiment readout (Welch's robust twin)
# ---------------------------------------------------------------------------

#: The U statistic and tie-corrected normal approximation as ONE
#: expression string over the exact integer/decimal moment columns
#: (n0, n1, nn, r2x1, tt) — consumed VERBATIM by the Spark plan and
#: the DuckDB oracle (the [[ts_pacf]] identical-tree recipe), so the
#: only float arithmetic is this shared tail. r2x1 carries DOUBLED
#: ranks (tie-block average rank ×2 = lo+hi, always an integer), so
#: nothing fractional exists before the final cast.
#: n·(n+1) widens through DECIMAL(38,0) — portable to both dialects —
#: because bigint·bigint wraps SILENTLY in Spark at n ~ 3e9 rows per
#: series while DuckDB errors loudly: a silent-vs-loud overflow
#: divergence, not just an overflow (r15 self-review).
_MW_U1_EXPR = (
    "CAST(r2x1 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1) AS DOUBLE) / 2.0"
)
_MW_Z_EXPR = (
    "CAST(r2x1 - CAST(n1 AS DECIMAL(38,0)) * (nn + 1) AS DOUBLE)"
    " / (2.0 * sqrt("
    "NULLIF((CAST(n0 AS DOUBLE) * n1 / 12.0)"
    " * ((nn + 1) - CAST(tt AS DOUBLE)"
    "    / (CAST(nn AS DOUBLE) * (nn - 1))), 0.0)))"
)

_MW_SQL = f"""
    WITH m AS (
      SELECT event_type, CAST(user_id % 2 AS BIGINT) AS arm,
             CAST(round(value * 1000) AS BIGINT) AS x
      FROM events
    ),
    blocks AS (
      SELECT event_type, x, CAST(COUNT(*) AS BIGINT) AS t,
             CAST(SUM(arm) AS BIGINT) AS c1
      FROM m GROUP BY event_type, x
    ),
    cum AS (
      SELECT event_type, t, c1,
             SUM(t) OVER (PARTITION BY event_type ORDER BY x) AS hi
      FROM blocks
    ),
    g AS (
      SELECT event_type,
             CAST(SUM(t - c1) AS BIGINT) AS n0,
             CAST(SUM(c1) AS BIGINT) AS n1,
             SUM(CAST(c1 AS HUGEINT) * (2 * hi - t + 1)) AS r2x1,
             SUM(CAST(t AS HUGEINT) * (t - 1) * (t + 1)) AS tt
      FROM cum GROUP BY event_type
    )
    SELECT event_type, n0 AS n_control, n1 AS n_treatment,
           {_MW_U1_EXPR} AS u_treatment,
           {_MW_Z_EXPR} AS z_mw
    FROM (SELECT *, n0 + n1 AS nn FROM g)
    WHERE n0 >= 1 AND n1 >= 1
    ORDER BY event_type
"""


@query("abtest_mann_whitney", oracle=_MW_SQL)
def abtest_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U experiment readout per event type — the
    rank-sum twin of [[abtest_welch_ttest]]: Welch compares MEANS
    and one fat-tailed outlier burst owns the answer; U compares
    the whole distributions (P(treatment draw > control draw)) and
    is invariant to any monotone transform of the metric — the
    standard readout for latency/revenue-shaped metrics. Same
    deterministic ``user_id % 2`` arms so the oracle replays them.

    Exactness: rank arithmetic never leaves integers — the
    tie-block average rank is carried DOUBLED (block [lo, hi] →
    lo+hi), so R₁ ties included is an exact integer; the tie
    correction Σ(t³−t) and the doubled rank sum widen through the
    shared [[wide_sum]] (t³ ~8e15 at sf1 — wraps int64 one decade
    later, so widened NOW); U and the tie-corrected z are ONE shared
    expression string ([[_MW_Z_EXPR]]) evaluated on identical exact
    inputs by both engines. Degenerate all-tied groups yield NULL z
    via an in-expression NULLIF, identically.

    Plan: groupBy(event_type, x) collapses rows to distinct-value
    blocks FIRST (the exchange carries value cardinality, not row
    count), one cumulative window over blocks per series, one final
    fold to a 5-row report. The block-collapse-then-rank shape is
    what survives 100 TB: ranks over raw rows would sort the
    corpus, ranks over blocks sort the value domain."""
    from pyspark.sql.window import Window

    m = load(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 2).cast("bigint").alias("arm"),
        F.round(F.col("value") * 1000).cast("bigint").alias("x"),
    )
    blocks = m.groupBy("event_type", "x").agg(
        F.count("*").cast("bigint").alias("t"),
        F.sum("arm").cast("bigint").alias("c1"),
    )
    cum = blocks.withColumn(
        "hi",
        F.sum("t").over(
            Window.partitionBy("event_type").orderBy("x")
        ),
    )
    g = cum.groupBy("event_type").agg(
        F.sum(F.col("t") - F.col("c1")).cast("bigint").alias("n0"),
        F.sum("c1").cast("bigint").alias("n1"),
        wide_sum(
            F.col("c1"), F.lit(2) * F.col("hi") - F.col("t") + 1
        ).alias("r2x1"),
        wide_sum(F.col("t"), F.col("t") - 1, F.col("t") + 1).alias(
            "tt"
        ),
    )
    return (
        g.withColumn("nn", F.col("n0") + F.col("n1"))
        .filter((F.col("n0") >= 1) & (F.col("n1") >= 1))
        .select(
            "event_type",
            F.col("n0").alias("n_control"),
            F.col("n1").alias("n_treatment"),
            F.expr(_MW_U1_EXPR).alias("u_treatment"),
            F.expr(_MW_Z_EXPR).alias("z_mw"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# agg_bootstrap_ci — deterministic Poisson-bootstrap confidence interval
# ---------------------------------------------------------------------------

#: Replicate count. Order-statistic 95% CI uses ranks 2 and B−1 at
#: B = 64 (floor(0.025·64)+1 / ceil(0.975·64)); smaller B would pin
#: the CI to the extreme replicates.
_BOOT_B = 64
_BOOT_LO_RANK = 2
_BOOT_HI_RANK = 63

#: Poisson(1) inverse-CDF thresholds floor(F(k)·2^32), k = 0..7 —
#: computed ONCE in python and embedded in both engines' plans (the
#: privacy_dp_count device: the hash is the RNG, a shared literal
#: table is the distribution; the engines can never disagree about a
#: draw). Tail mass beyond 7 (~1e-5) caps at weight 8.
import math as _math

_BOOT_THRESH = []
_cum = 0.0
for _k in range(8):
    _cum += _math.exp(-1.0) / _math.factorial(_k)
    _BOOT_THRESH.append(min(int(_cum * 2**32), 2**32))

_BOOT_W_CASE = "CASE " + " ".join(
    f"WHEN u < {t} THEN {k}" for k, t in enumerate(_BOOT_THRESH)
) + " ELSE 8 END"

_BOOT_SQL = f"""
    WITH src AS (
      SELECT o_orderkey, o_orderpriority AS priority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    drawn AS (
      SELECT priority, cents,
             {md5_u32_duck("concat(CAST(o_orderkey AS VARCHAR), ':', CAST(r AS VARCHAR))")} AS u,
             r
      FROM src CROSS JOIN (
        SELECT unnest(range(1, {_BOOT_B} + 1)) AS r
      )
    ),
    reps AS (
      SELECT priority, r,
             SUM(CAST(({_BOOT_W_CASE}) AS HUGEINT) * cents) AS s,
             CAST(SUM({_BOOT_W_CASE}) AS BIGINT) AS n
      FROM drawn GROUP BY priority, r
    ),
    ranked AS (
      SELECT priority,
             CAST(s AS DOUBLE) / NULLIF(n, 0) AS m,
             row_number() OVER (
               PARTITION BY priority
               ORDER BY CAST(s AS DOUBLE) / NULLIF(n, 0), r) AS rn
      FROM reps
    ),
    ci AS (
      SELECT priority,
             MAX(CASE WHEN rn = {_BOOT_LO_RANK} THEN m END) AS ci_lo,
             MAX(CASE WHEN rn = {_BOOT_HI_RANK} THEN m END) AS ci_hi
      FROM ranked GROUP BY priority
    ),
    pt AS (
      SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS mean_cents
      FROM src GROUP BY priority
    )
    SELECT pt.priority, pt.n_orders, pt.mean_cents,
           ci.ci_lo, ci.ci_hi
    FROM pt JOIN ci USING (priority)
    ORDER BY pt.priority
"""


@query("agg_bootstrap_ci", oracle=_BOOT_SQL)
def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% confidence interval for mean order
    value per priority class — nonparametric uncertainty
    quantification next to the closed-form tests
    ([[abtest_welch_ttest]] needs variance assumptions,
    [[abtest_mann_whitney]] answers a different question; the
    bootstrap brackets ANY plug-in statistic). Poisson(1) weights
    instead of multinomial resampling is THE distributed-bootstrap
    trick (each row draws its replicate weights independently — no
    global n coordination), and the draws are deterministic
    hash-RNG ([[privacy_dp_count]]'s device): the engines — and any
    rerun — agree on every weight, so the CI is reproducible.

    Exactness: per-replicate weighted sums and counts are exact
    integers (weights from a shared literal threshold table over the
    md5-u32 uniform, Σw·cents widened before the multiply); each
    replicate mean is one double division; the CI bounds are
    SELECTION at fixed order-statistic ranks ({_BOOT_LO_RANK} and
    {_BOOT_HI_RANK} of {_BOOT_B}), never interpolated.

    Plan: the {_BOOT_B}× replicate explosion collapses immediately
    into the map-side combine of groupBy(priority, r) — the exchange
    carries 5·{_BOOT_B} moment rows regardless of corpus size; the
    rank-select window and the point-estimate join run on the
    report frame. At 100 TB the cost is one pass over orders with
    {_BOOT_B} hash draws per row — embarrassingly parallel,
    shuffle-free until the 320-row combine."""
    src = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias(
            "cents"
        ),
    )
    u = md5_u32_sql(
        "concat(CAST(o_orderkey AS STRING), ':', CAST(r AS STRING))"
    )
    drawn = src.select(
        "priority",
        "cents",
        F.expr(f"explode(sequence(1, {_BOOT_B}))").alias("r"),
        "o_orderkey",
    ).select(
        "priority", "cents", "r", F.expr(u).alias("u")
    )
    reps = drawn.groupBy("priority", "r").agg(
        wide_sum(F.expr(_BOOT_W_CASE), F.col("cents")).alias("s"),
        F.sum(F.expr(_BOOT_W_CASE)).cast("bigint").alias("n"),
    )
    from pyspark.sql.window import Window

    m = F.col("s").cast("double") / F.nullif(
        F.col("n"), F.lit(0)
    )
    ranked = reps.select(
        "priority",
        m.alias("m"),
        F.row_number()
        .over(Window.partitionBy("priority").orderBy(m, F.col("r")))
        .alias("rn"),
    )
    ci = ranked.groupBy("priority").agg(
        F.max(
            F.when(F.col("rn") == _BOOT_LO_RANK, F.col("m"))
        ).alias("ci_lo"),
        F.max(
            F.when(F.col("rn") == _BOOT_HI_RANK, F.col("m"))
        ).alias("ci_hi"),
    )
    pt = src.groupBy("priority").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        (
            F.sum("cents").cast("double") / F.count("*")
        ).alias("mean_cents"),
    )
    return (
        pt.join(F.broadcast(ci), "priority")
        .select("priority", "n_orders", "mean_cents", "ci_lo", "ci_hi")
        .orderBy("priority")
    )


for _doc_const in ("_BOOT_B", "_BOOT_LO_RANK", "_BOOT_HI_RANK"):
    agg_bootstrap_ci.__doc__ = agg_bootstrap_ci.__doc__.replace(
        "{%s}" % _doc_const, str(globals()[_doc_const])
    )


# ---------------------------------------------------------------------------
# agg_anova_oneway — one-way ANOVA F test across k groups
# ---------------------------------------------------------------------------

#: F and η² as shared expression strings over the fold outputs
#: (ssw, sst, n, k) — identical trees both engines.
_ANOVA_F_EXPR = (
    "((sst - ssw) / (k - 1)) / NULLIF(ssw / (n - k), 0.0)"
)
_ANOVA_ETA_EXPR = "(sst - ssw) / NULLIF(sst, 0.0)"

_ANOVA_SQL = f"""
    WITH m AS (
      SELECT event_type AS grp,
             CAST(round(value * 1000) AS BIGINT) AS x
      FROM events
    ),
    g AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(x) AS HUGEINT) AS sg,
             SUM(CAST(x AS HUGEINT) * x) AS ssg
      FROM m GROUP BY grp
    ),
    terms AS (
      SELECT ng, sg, ssg,
             CAST(ng * ssg - sg * sg AS DOUBLE) / CAST(ng AS DOUBLE)
               AS within_term
      FROM g
    ),
    folded AS (
      SELECT CAST(SUM(ng) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(sg) AS s_all,
             SUM(ssg) AS ss_all,
             list_reduce(list_sort(list(within_term)), (a, b) -> a + b)
               AS ssw
      FROM terms
    )
    SELECT n, k, ssw,
           CAST(CAST(n AS HUGEINT) * ss_all - s_all * s_all AS DOUBLE)
             / CAST(n AS DOUBLE) AS sst,
           {_ANOVA_F_EXPR.replace("sst",
               "(CAST(CAST(n AS HUGEINT) * ss_all - s_all * s_all AS DOUBLE) / CAST(n AS DOUBLE))")}
             AS f_stat,
           {_ANOVA_ETA_EXPR.replace("sst",
               "(CAST(CAST(n AS HUGEINT) * ss_all - s_all * s_all AS DOUBLE) / CAST(n AS DOUBLE))")}
             AS eta_sq
    FROM folded
"""


@query("agg_anova_oneway", oracle=_ANOVA_SQL)
def agg_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across event types: F statistic and η² effect
    size — the k-group member of the inference family
    ([[abtest_welch_ttest]] two means, [[abtest_mann_whitney]] two
    distributions, [[agg_chi_square_indep]] two labelings; this: do
    k group means differ at all). Pipeline shape: "does SOURCE move
    mean document quality" before burning tokens on per-source
    curation.

    Exactness: per-group moments (n, Σx, Σx²) are exact integers
    (milli-units, [[wide_sum]]-class widening); each group's
    within-term (n_g·Σx² − (Σx)²)/n_g is ONE double division of
    exact wide integers, and the cross-group SSW sum — float
    arithmetic whose order matters — uses the
    [[agg_chi_square_indep]] sorted-fold device (array_sort +
    left fold in BOTH engines), so the float reduction itself is
    bit-deterministic. SST is a single division of global exact
    moments; F and η² are shared expression strings.

    Plan: ONE map-side-combined groupBy(event_type) over events is
    the entire data-proportional cost; the k-row sorted fold and the
    final expressions run on a report-sized frame. Identical shape
    to [[abtest_welch_ttest]]'s six-moment fold, generalized to k
    groups."""
    m = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        F.round(F.col("value") * 1000).cast("bigint").alias("x"),
    )
    g = m.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("ng"),
        # widen BEFORE the fold (sum of bigint milli-units wraps at
        # ~1e13 rows/group; the oracle's SUM(BIGINT)→HUGEINT already
        # accumulates 128-bit)
        wide_sum(F.col("x")).alias("sg"),
        wide_sum(F.col("x"), F.col("x")).alias("ssg"),
    )
    within = (
        (
            F.col("ng").cast("decimal(38,0)") * F.col("ssg")
            - F.col("sg") * F.col("sg")
        ).cast("double")
        / F.col("ng").cast("double")
    ).alias("within_term")
    folded = g.select("ng", "sg", "ssg", within).agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("k"),
        F.sum("sg").alias("s_all"),
        F.sum("ssg").alias("ss_all"),
        F.expr(
            "aggregate(array_sort(collect_list(within_term)),"
            " CAST(0 AS DOUBLE), (a, b) -> a + b)"
        ).alias("ssw"),
    )
    sst = (
        (
            F.col("n").cast("decimal(38,0)") * F.col("ss_all")
            - F.col("s_all") * F.col("s_all")
        ).cast("double")
        / F.col("n").cast("double")
    )
    ssb = sst - F.col("ssw")
    return folded.select(
        "n",
        "k",
        "ssw",
        sst.alias("sst"),
        (
            (ssb / (F.col("k") - 1))
            / F.nullif(
                F.col("ssw") / (F.col("n") - F.col("k")), F.lit(0.0)
            )
        ).alias("f_stat"),
        (ssb / F.nullif(sst, F.lit(0.0))).alias("eta_sq"),
    )


# ---------------------------------------------------------------------------
# ts_seasonal_strength — η² of the hour-of-day factor per series
# ---------------------------------------------------------------------------

_SEAS_SQL = """
    WITH m AS (
      SELECT event_type, EXTRACT(hour FROM ts) AS h,
             CAST(round(value * 1000) AS BIGINT) AS x
      FROM events
    ),
    g AS (
      SELECT event_type, h, CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(x) AS HUGEINT) AS sg,
             SUM(CAST(x AS HUGEINT) * x) AS ssg
      FROM m GROUP BY event_type, h
    ),
    peak AS (
      SELECT event_type, h AS peak_hour FROM (
        SELECT event_type, h,
               row_number() OVER (
                 PARTITION BY event_type
                 ORDER BY CAST(sg AS DOUBLE) / ng DESC, h ASC) AS rn
        FROM g
      ) WHERE rn = 1
    ),
    folded AS (
      SELECT event_type,
             CAST(SUM(ng) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(sg) AS s_all,
             SUM(ssg) AS ss_all,
             list_reduce(list_sort(list(
               CAST(ng * ssg - sg * sg AS DOUBLE) / CAST(ng AS DOUBLE)
             )), (a, b) -> a + b) AS ssw
      FROM g GROUP BY event_type
    )
    SELECT f.event_type, n, k, peak_hour,
           1.0 - ssw / NULLIF(
             CAST(CAST(n AS HUGEINT) * ss_all - s_all * s_all AS DOUBLE)
               / CAST(n AS DOUBLE), 0.0) AS seasonal_strength
    FROM folded f JOIN peak USING (event_type)
    ORDER BY f.event_type
"""


@query("ts_seasonal_strength", oracle=_SEAS_SQL)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of each series' variance the hour-of-day explains —
    η² of the 24-level hourly factor (1 − SSW/SST) plus the peak
    hour: the DECISION statistic over [[ts_seasonal_profile]]'s
    descriptive curve (profile says WHAT the daily shape is; this
    says whether it is signal worth modeling — the [[ts_acf]]/
    [[ts_ljung_box]] question asked against a known period).
    Pipeline shape: pick which metrics deserve seasonal adjustment
    before [[ts_holt_forecast]]/[[ts_cusum_changepoint]] runs.

    Exactness: the [[agg_anova_oneway]] recipe partitioned by
    series — exact integer (n, Σx, Σx²) per (series, hour), one
    double division per hour-term, the 24-term SSW folded in SORTED
    order both engines, SST one division of series moments; the
    peak hour is rank-1 SELECTION on the per-hour mean (deterministic
    h tie-break), never a float comparison across engines that
    disagree.

    Plan: one map-side-combined groupBy(series, hour) — ≤ 24·k rows
    out of the exchange at any corpus size — then report-sized
    folds, a 120-row rank window, and one tiny join."""
    m = load(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").alias("h"),
        F.round(F.col("value") * 1000).cast("bigint").alias("x"),
    )
    g = m.groupBy("event_type", "h").agg(
        F.count("*").cast("bigint").alias("ng"),
        wide_sum(F.col("x")).alias("sg"),
        wide_sum(F.col("x"), F.col("x")).alias("ssg"),
    ).localCheckpoint(eager=False)
    from pyspark.sql.window import Window

    peak = (
        g.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(
                    (F.col("sg").cast("double") / F.col("ng")).desc(),
                    F.col("h").asc(),
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("h").alias("peak_hour"))
    )
    within = (
        (
            F.col("ng").cast("decimal(38,0)") * F.col("ssg")
            - F.col("sg") * F.col("sg")
        ).cast("double")
        / F.col("ng").cast("double")
    ).alias("within_term")
    folded = g.select("event_type", "ng", "sg", "ssg", within).groupBy(
        "event_type"
    ).agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("k"),
        F.sum("sg").alias("s_all"),
        F.sum("ssg").alias("ss_all"),
        F.expr(
            "aggregate(array_sort(collect_list(within_term)),"
            " CAST(0 AS DOUBLE), (a, b) -> a + b)"
        ).alias("ssw"),
    )
    sst = (
        (
            F.col("n").cast("decimal(38,0)") * F.col("ss_all")
            - F.col("s_all") * F.col("s_all")
        ).cast("double")
        / F.col("n").cast("double")
    )
    return (
        folded.join(F.broadcast(peak), "event_type")
        .select(
            "event_type",
            "n",
            "k",
            "peak_hour",
            (F.lit(1.0) - F.col("ssw") / F.nullif(sst, F.lit(0.0))).alias(
                "seasonal_strength"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# event_attribution_multi — three classic attribution models, one pass
# ---------------------------------------------------------------------------

#: Lookback window before each conversion, in seconds.
_ATTR_WINDOW_S = 3600

#: Linear credit is integer micro-units truncated per touch
#: (1e6 div k): sums stay exact integers across engines; the ≤ k−1
#: micro-unit truncation loss per conversion is the documented,
#: deterministic cost of never summing rationals in float.
_ATTR_SCALE = 1_000_000

_ATTR_SQL = f"""
    WITH ev AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
      FROM events
    ),
    conv AS (
      SELECT user_id, event_id AS c_id, sec AS c_sec
      FROM ev WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id, event_id, event_type, sec
      FROM ev WHERE event_type <> 'purchase'
    ),
    pairs AS (
      SELECT c.c_id, t.event_id, t.event_type, t.sec,
             CAST(COUNT(*) OVER (PARTITION BY c.c_id) AS BIGINT) AS k,
             row_number() OVER (PARTITION BY c.c_id
                                ORDER BY t.sec DESC, t.event_id DESC)
               AS rn_last,
             row_number() OVER (PARTITION BY c.c_id
                                ORDER BY t.sec ASC, t.event_id ASC)
               AS rn_first
      FROM conv c
      JOIN touch t ON t.user_id = c.user_id
                  AND t.sec < c.c_sec
                  AND t.sec >= c.c_sec - {_ATTR_WINDOW_S}
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM({_ATTR_SCALE} // k) AS BIGINT) AS linear_credit_micro,
           CAST(SUM(CASE WHEN rn_first = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS first_touch_convs,
           CAST(SUM(CASE WHEN rn_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS last_touch_convs
    FROM pairs
    GROUP BY event_type
    ORDER BY event_type
"""


@query("event_attribution_multi", oracle=_ATTR_SQL)
def event_attribution_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch conversion attribution over the events stream —
    first-touch, last-touch, and linear credit per touch channel for
    every purchase's preceding-hour touches, in ONE windowed pass:
    the revenue-analytics member next to [[funnel_steps]] (ordered
    reach) and [[event_transitions]] (Markov structure); the same
    query shape attributes which upstream crawl/filter stage
    "converted" a document in a data pipeline's lineage log.

    Exactness: all three models are integer algebra — linear credit
    is 1e6 div k micro-units per touch (truncated: summing exact
    1/k rationals in float would be order-dependent; the ≤ k−1
    micro loss per conversion is deterministic and documented),
    first/last are rank-1 SELECTIONS on (epoch-second, event_id) —
    total orders, so the engines cannot disagree on ties.

    Plan: the conversions⋈touches range join is an equi-join on
    user_id with the window predicate as a residual filter (per-user
    fan-out is bounded by per-user event density per hour — the
    [[join_range_asof]] scale argument); two rank windows + the
    per-conversion count share ONE (c_id) exchange; the report fold
    is map-side combined to ≤ 4 channel rows."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").cast("long").alias("sec"),
    )
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("c_id"),
        F.col("sec").alias("c_sec"),
    )
    touch = ev.filter(F.col("event_type") != "purchase")
    pairs = conv.join(
        touch,
        (conv.user_id == touch.user_id)
        & (touch.sec < conv.c_sec)
        & (touch.sec >= conv.c_sec - _ATTR_WINDOW_S),
    ).select("c_id", "event_id", "event_type", "sec")
    from pyspark.sql.window import Window

    wc = Window.partitionBy("c_id")
    ranked = (
        pairs.withColumn(
            "k", F.count("*").over(wc).cast("bigint")
        )
        .withColumn(
            "rn_last",
            F.row_number().over(
                wc.orderBy(F.col("sec").desc(), F.col("event_id").desc())
            ),
        )
        .withColumn(
            "rn_first",
            F.row_number().over(
                wc.orderBy(F.col("sec").asc(), F.col("event_id").asc())
            ),
        )
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_touches"),
            F.sum(F.expr(f"{_ATTR_SCALE} div k"))
            .cast("bigint")
            .alias("linear_credit_micro"),
            F.sum(F.when(F.col("rn_first") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("first_touch_convs"),
            F.sum(F.when(F.col("rn_last") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("last_touch_convs"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# abtest_ratio_delta — delta-method ratio-metric readout (clustered users)
# ---------------------------------------------------------------------------


def _rd_r(s: str) -> str:
    return f"(CAST(sx{s} AS DOUBLE) / CAST(sy{s} AS DOUBLE))"


def _rd_var(s: str) -> str:
    """Delta-method variance of the ratio-of-sums for arm suffix
    ``s`` — ONE expression string over the exact wide moment
    columns, shared verbatim by both engines. The covariance-form
    numerators are subtracted EXACTLY in the 128-bit integer domain
    and cast to double once (better conditioned than double-domain
    subtraction, and parity-free either way)."""
    r = _rd_r(s)
    return (
        f"((CAST(n{s} * sxx{s} - sx{s} * sx{s} AS DOUBLE)"
        f" - 2.0 * {r} * CAST(n{s} * sxy{s} - sx{s} * sy{s} AS DOUBLE)"
        f" + {r} * {r} * CAST(n{s} * syy{s} - sy{s} * sy{s} AS DOUBLE))"
        f" / (CAST(n{s} AS DOUBLE) * (n{s} - 1))"
        f" / (CAST(sy{s} AS DOUBLE) * CAST(sy{s} AS DOUBLE)"
        f"    / CAST(n{s} AS DOUBLE)))"
    )


_RD_Z = (
    f"({_rd_r('1')} - {_rd_r('0')})"
    f" / sqrt({_rd_var('0')} + {_rd_var('1')})"
)

_RD_SQL = f"""
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
             SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 1000) AS BIGINT)
                      ELSE 0 END) AS x,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT
        CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        SUM(CASE WHEN arm = 0 THEN CAST(x AS HUGEINT) ELSE 0 END) AS sx0,
        SUM(CASE WHEN arm = 1 THEN CAST(x AS HUGEINT) ELSE 0 END) AS sx1,
        SUM(CASE WHEN arm = 0 THEN CAST(y AS HUGEINT) ELSE 0 END) AS sy0,
        SUM(CASE WHEN arm = 1 THEN CAST(y AS HUGEINT) ELSE 0 END) AS sy1,
        SUM(CASE WHEN arm = 0 THEN CAST(x AS HUGEINT) * x ELSE 0 END)
          AS sxx0,
        SUM(CASE WHEN arm = 1 THEN CAST(x AS HUGEINT) * x ELSE 0 END)
          AS sxx1,
        SUM(CASE WHEN arm = 0 THEN CAST(x AS HUGEINT) * y ELSE 0 END)
          AS sxy0,
        SUM(CASE WHEN arm = 1 THEN CAST(x AS HUGEINT) * y ELSE 0 END)
          AS sxy1,
        SUM(CASE WHEN arm = 0 THEN CAST(y AS HUGEINT) * y ELSE 0 END)
          AS syy0,
        SUM(CASE WHEN arm = 1 THEN CAST(y AS HUGEINT) * y ELSE 0 END)
          AS syy1
      FROM u
    )
    SELECT n0 AS n_control_users, n1 AS n_treatment_users,
           {_rd_r('0')} AS ratio_control,
           {_rd_r('1')} AS ratio_treatment,
           ({_rd_r('1')} - {_rd_r('0')}) AS ratio_diff,
           {_RD_Z} AS z_delta
    FROM g
"""


@query("abtest_ratio_delta", oracle=_RD_SQL)
def abtest_ratio_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-metric experiment readout with the delta method —
    purchase revenue PER VIEW, arms by ``user_id % 2``, variance
    via first-order Taylor expansion over per-USER aggregates
    (Deng, Knoblich & Lu 2018): the statistically-correct analysis
    for every "X per Y" metric, where naive row-level variance is
    wrong because the randomization unit (user) clusters both
    numerator and denominator. Completes the experimentation
    family: [[abtest_welch_ttest]] means, [[abtest_mann_whitney]]
    distributions, [[agg_bootstrap_ci]] nonparametric brackets —
    this: ratios, the metric class that powers most real dashboards.

    Exactness: per-user (x, y) aggregates are exact integers; the
    six per-arm moments widen through the 128-bit domain; every
    covariance-form numerator (n·Sxy − Sx·Sy …) is subtracted
    EXACTLY in integers and cast to double once; R, Var(R), and z
    are shared expression strings over those columns. Ratio and z
    parity is therefore bit-exact with no tolerance.

    Plan: one groupBy(user_id) fold over events (map-side combined),
    one 12-moment single-row fold — the welch shape with a
    user-grain pre-aggregation in front. Nothing downstream of the
    second fold touches data."""
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 1000).cast("bigint"),
            ).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).cast("bigint").alias("y"),
    ).withColumn("arm", (F.col("user_id") % 2).cast("bigint"))

    def arm_mom(a: int, expr, *more):
        return wide_sum(
            F.when(F.col("arm") == a, expr).otherwise(0), *more
        )

    g = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint").alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint").alias("n1"),
        arm_mom(0, F.col("x")).alias("sx0"),
        arm_mom(1, F.col("x")).alias("sx1"),
        arm_mom(0, F.col("y")).alias("sy0"),
        arm_mom(1, F.col("y")).alias("sy1"),
        arm_mom(0, F.col("x"), F.col("x")).alias("sxx0"),
        arm_mom(1, F.col("x"), F.col("x")).alias("sxx1"),
        arm_mom(0, F.col("x"), F.col("y")).alias("sxy0"),
        arm_mom(1, F.col("x"), F.col("y")).alias("sxy1"),
        arm_mom(0, F.col("y"), F.col("y")).alias("syy0"),
        arm_mom(1, F.col("y"), F.col("y")).alias("syy1"),
    )
    return g.select(
        F.col("n0").alias("n_control_users"),
        F.col("n1").alias("n_treatment_users"),
        F.expr(_rd_r("0")).alias("ratio_control"),
        F.expr(_rd_r("1")).alias("ratio_treatment"),
        F.expr(f"({_rd_r('1')} - {_rd_r('0')})").alias("ratio_diff"),
        F.expr(_RD_Z).alias("z_delta"),
    )


# ---------------------------------------------------------------------------
# ts_bollinger_bands — trailing mean ± k·σ envelope with breach flags
# ---------------------------------------------------------------------------

#: Trailing frame size and band width (the classic 20/2).
_BOLL_N = 20
_BOLL_K = 2

#: Shared expression tail over the exact frame moments (cnt, s, ss):
#: sample σ via the (n·Σx² − (Σx)²)/(n(n−1)) form, one sqrt; the
#: bands and the breach flag reuse the same subtrees verbatim.
_BOLL_MEAN = "CAST(s AS DOUBLE) / cnt"
_BOLL_SD = (
    "sqrt(CAST(cnt * ss - s * s AS DOUBLE)"
    " / (CAST(cnt AS DOUBLE) * (cnt - 1)))"
)
_BOLL_UP = f"({_BOLL_MEAN} + {_BOLL_K} * {_BOLL_SD})"
_BOLL_DN = f"({_BOLL_MEAN} - {_BOLL_K} * {_BOLL_SD})"

_BOLL_SQL = f"""
    WITH m AS (
      SELECT event_type, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(round(value * 1000) AS BIGINT) AS x
      FROM events
    ),
    w AS (
      SELECT event_type, event_id, sec, x,
             CAST(COUNT(*) OVER fr AS BIGINT) AS cnt,
             CAST(SUM(x) OVER fr AS HUGEINT) AS s,
             SUM(CAST(x AS HUGEINT) * x) OVER fr AS ss
      FROM m
      WINDOW fr AS (PARTITION BY event_type ORDER BY sec, event_id
                    ROWS BETWEEN {_BOLL_N - 1} PRECEDING
                             AND CURRENT ROW)
    )
    SELECT event_type, event_id, x,
           {_BOLL_MEAN} AS sma_milli,
           CASE WHEN cnt > 1 THEN {_BOLL_UP} END AS upper_milli,
           CASE WHEN cnt > 1 THEN {_BOLL_DN} END AS lower_milli,
           CASE WHEN cnt > 1
                THEN (CASE WHEN x > {_BOLL_UP} OR x < {_BOLL_DN}
                           THEN 1 ELSE 0 END)
                ELSE 0 END AS breach
    FROM w
    ORDER BY event_type, sec, event_id
"""


# Bollinger's series-form cutoff is the SAME shared conservative
# 1e8 floor as ACF and the rolling median ([[rolling.
# SERIES_FORM_MAX_ROWS]], used via the function-local import below
# like every other consumer, so a future retune can't silently
# leave this key switching at a different size). Probe history: an
# earlier r17 probe read "series 30.7 s vs bucketed 8.94 s at 1M"
# and briefly gave this key its own measured 500k cutoff — but the
# verified-clean re-run (fresh host, zero co-resident JVMs,
# best-of-3) reversed it at EVERY decade: 1M series 6.96 s vs
# bucketed 11.28; 3M 12.10 vs 25.03; 10M 25.73 vs 37.21
# (density-resolved width). The first probe overlapped a synthetic
# sweep — the single-session-contention trap, again. Series wins
# every measured decade; the bucketed arm exists for the real
# hazard (ONE series beyond a single task's sort capacity), not
# for fixture wall time.


def _boll_moment_rows_series(m: DataFrame) -> DataFrame:
    """Single-window reference form of the per-row frame moments
    (cnt, s, ss): one rolling frame per series — fastest at fixture
    decades, and the semantic reference the bucketed form must
    bit-match. Scale hazard: one sort task per event_type (5
    values), the exact shape the ACF family escaped in r16."""
    from pyspark.sql.window import Window as W2

    fr = (
        W2.partitionBy("event_type")
        .orderBy("sec", "event_id")
        .rowsBetween(-(_BOLL_N - 1), 0)
    )
    return m.select(
        "event_type",
        "event_id",
        "sec",
        "x",
        F.count("*").over(fr).cast("bigint").alias("cnt"),
        F.sum(F.col("x").cast("decimal(38,0)")).over(fr).alias("s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .over(fr)
        .alias("ss"),
    )


def _boll_moment_rows(
    m: DataFrame,
    bucket_sec: int | None = None,
    max_series_rows: int | None = None,
) -> DataFrame:
    """Per-row exact frame moments, SIZE-RESOLVED (r16 verdict ask
    #2 — this key was one of the two flagged carriers of the
    low-cardinality-series sort hazard after the ACF family got its
    escape): below [[rolling.SERIES_FORM_MAX_ROWS]] (the shared
    1e8 conservative floor — see the probe-history note above) the
    measured-faster single-window form; above it the bucketed form — the
    (type, bucket)-partitioned frame plus an exact boundary repair
    that adds each carried predecessor's (x, x²) into its head
    row's moments. All three moments are exact integers
    (decimal(38,0) milli-units), addition is associative, so the
    split never changes an output bit — pinned by the bit-equality,
    width-independence, and straddling tests in
    tests/test_round17_ops.py, mirroring the ACF suite."""
    from .rolling import (
        SERIES_FORM_MAX_ROWS,
        bucketed_positions,
        carried_predecessors,
        resolve_bucket_sec,
    )

    cutoff = (
        max_series_rows
        if max_series_rows is not None
        else SERIES_FORM_MAX_ROWS
    )
    n = m.count()
    if n <= cutoff:
        return _boll_moment_rows_series(m)

    width = (
        bucket_sec
        if bucket_sec is not None
        else resolve_bucket_sec(m, n)
    )
    lagged, offs = bucketed_positions(m, width)
    from pyspark.sql.window import Window as W2

    fr = (
        W2.partitionBy("event_type", "b")
        .orderBy("sec", "event_id")
        .rowsBetween(-(_BOLL_N - 1), 0)
    )
    ib = lagged.select(
        "event_type",
        "event_id",
        "sec",
        "x",
        "b",
        "rn",
        F.count("*").over(fr).cast("bigint").alias("cnt_ib"),
        F.sum(F.col("x").cast("decimal(38,0)")).over(fr).alias("s_ib"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .over(fr)
        .alias("ss_ib"),
    )
    pre = carried_predecessors(lagged, offs, _BOLL_N)
    bstats = pre.groupBy("event_type", "b", "rn").agg(
        F.count("*").cast("bigint").alias("bc"),
        F.sum(F.col("xt").cast("decimal(38,0)")).alias("bs"),
        F.sum(F.col("xt").cast("decimal(38,0)") * F.col("xt")).alias(
            "bss"
        ),
    )
    z = F.lit(0).cast("decimal(38,0)")
    return ib.join(
        F.broadcast(bstats), ["event_type", "b", "rn"], "left"
    ).select(
        "event_type",
        "event_id",
        "sec",
        "x",
        (F.col("cnt_ib") + F.coalesce(F.col("bc"), F.lit(0)))
        .cast("bigint")
        .alias("cnt"),
        # NULL x parity with the series arm (r17 review): the series
        # SUM over the whole frame skips NULLs and is NULL iff EVERY
        # frame value is NULL — so each split sum must go NULL only
        # when BOTH parts are (a bare s_ib + coalesce(bs, 0) would
        # poison the total whenever the in-bucket part alone is
        # all-NULL, even with non-NULL carried predecessors).
        # cnt needs no guard: count(*) is never NULL.
        F.when(
            F.col("s_ib").isNull() & F.col("bs").isNull(),
            F.lit(None),
        )
        .otherwise(
            F.coalesce(F.col("s_ib"), z) + F.coalesce(F.col("bs"), z)
        )
        .cast("decimal(38,0)")
        .alias("s"),
        F.when(
            F.col("ss_ib").isNull() & F.col("bss").isNull(),
            F.lit(None),
        )
        .otherwise(
            F.coalesce(F.col("ss_ib"), z)
            + F.coalesce(F.col("bss"), z)
        )
        .cast("decimal(38,0)")
        .alias("ss"),
    )


@query("ts_bollinger_bands", oracle=_BOLL_SQL)
def ts_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger envelope per series — trailing-{_BOLL_N} mean ±
    {_BOLL_K}σ with per-event breach flags: the parametric
    volatility-band sibling of [[window_rolling_median]]'s robust
    smoother and the windowed counterpart of [[ts_anomaly_mad]]'s
    global gate (MAD asks "weird for the series"; this asks "weird
    for RIGHT NOW"). Breach runs feed [[ts_cusum_changepoint]]-style
    alerting in any telemetry pipeline.

    Exactness: frame moments (count, Σx, Σx²) are exact integers
    over the identical (sec, event_id)-ordered frame (the Σx²
    element widens through the 128-bit domain BEFORE the square —
    25 elements of ~1e12² would wrap int64); mean, σ, bands, and
    the breach predicate are ONE shared expression tail evaluated
    on those moments by both engines — the breach flag compares x
    against the same doubles, so even the boolean is bit-exact.
    Single-element frames yield NULL bands (σ undefined), identical
    CASE both sides.

    Plan: SIZE-RESOLVED ([[_boll_moment_rows]], r17 — closing this
    key's weak flag): below ~1e8 rows, one window exchange with
    three running aggregates sharing the frame (the measured-faster
    form at every fixture decade); above it, the bucketed form —
    (event_type, time-bucket)-partitioned sorts so no single task
    ever sorts a whole series, with the ≤ N−1 frame rows that cross
    each bucket boundary repaired exactly through the shared
    [[rolling.carried_predecessors]] block-keyed fringe join. The
    resolver changes the plan, never the answer (bit-equality
    pinned). O(1) state per row either way — this is also the shape
    the streaming twin would keep in [[stream_window_sliding]]'s
    state store."""
    m = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.col("ts").cast("long").alias("sec"),
        F.round(F.col("value") * 1000).cast("bigint").alias("x"),
    )
    w = _boll_moment_rows(m)
    return (
        w.select(
            "event_type",
            "event_id",
            "x",
            F.expr(_BOLL_MEAN).alias("sma_milli"),
            F.expr(f"CASE WHEN cnt > 1 THEN {_BOLL_UP} END").alias(
                "upper_milli"
            ),
            F.expr(f"CASE WHEN cnt > 1 THEN {_BOLL_DN} END").alias(
                "lower_milli"
            ),
            # nested CASE: the sigma division must live in a THEN
            # branch (lazily evaluated), not in a WHEN predicate --
            # ANSI Spark evaluates predicates eagerly and raises
            # DIVIDE_BY_ZERO on the cnt = 1 rows
            F.expr(
                f"CASE WHEN cnt > 1 THEN (CASE WHEN x > {_BOLL_UP}"
                f" OR x < {_BOLL_DN} THEN 1 ELSE 0 END) ELSE 0 END"
            ).alias("breach"),
            "sec",
        )
        .orderBy("event_type", "sec", "event_id")
        .drop("sec")
    )


ts_bollinger_bands.__doc__ = ts_bollinger_bands.__doc__.replace(
    "{_BOLL_N}", str(_BOLL_N)
).replace("{_BOLL_K}", str(_BOLL_K))


# ---------------------------------------------------------------------------
# cohort_rfm_segments — recency/frequency/monetary quintile segmentation
# ---------------------------------------------------------------------------

_RFM_Q = 5

_RFM_SQL = f"""
    WITH anchor AS (
      SELECT MAX(CAST(floor(epoch(ts)) AS BIGINT)) AS t1 FROM events
    ),
    u AS (
      SELECT user_id,
             (anchor.t1 - MAX(CAST(floor(epoch(ts)) AS BIGINT)))
               // 86400 AS rec_days,
             CAST(COUNT(*) AS BIGINT) AS freq,
             SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 1000) AS BIGINT)
                      ELSE 0 END) AS monetary
      FROM events CROSS JOIN anchor
      GROUP BY user_id, anchor.t1
    ),
    q AS (
      SELECT user_id, rec_days, freq, monetary,
             ntile({_RFM_Q}) OVER (ORDER BY rec_days, user_id) AS r_q,
             ntile({_RFM_Q}) OVER (ORDER BY freq, user_id) AS f_q,
             ntile({_RFM_Q}) OVER (ORDER BY monetary, user_id) AS m_q
      FROM u
    )
    SELECT r_q, f_q, m_q,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(freq) AS BIGINT) AS total_events,
           CAST(SUM(monetary) AS DOUBLE) / COUNT(*)
             AS avg_monetary_milli
    FROM q
    GROUP BY r_q, f_q, m_q
    ORDER BY r_q, f_q, m_q
"""


@query("cohort_rfm_segments", oracle=_RFM_SQL)
def cohort_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quintile segmentation —
    THE classic customer-value partitioning, next to
    [[cohort_retention]]'s time axis and [[funnel_steps]]'s
    conversion axis: each user scored 1–{_RFM_Q} on days-since-last-
    event, event count, and purchase value, then the segment grid
    reported with sizes and value. The same three-axis bucketing
    stratifies DOCUMENTS (staleness / duplication count / quality
    mass) for curriculum sampling.

    Exactness: recency/frequency/monetary are exact integers (epoch
    days, counts, milli-value sums); quintile assignment is ntile
    over TOTAL orders (metric, user_id) — ntile's
    floor-based bucket arithmetic is definitionally identical in
    both engines given the same row order, which the unique user_id
    tie-break guarantees; the only float is the per-segment mean.

    Plan: one groupBy(user) fold (map-side combined), a broadcast
    1-row anchor, three ntile windows sharing one |U|-row frame
    (single-partition sort of USER-GRAIN rows — at 100 TB this is
    the one global-sort-of-aggregates step, range-partitioned in
    practice), then a ≤{_RFM_Q}³-row report fold."""
    from pyspark.sql.window import Window as W2

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("long").alias("sec"),
        F.round(F.col("value") * 1000).cast("bigint").alias("v"),
    )
    anchor = ev.agg(F.max("sec").alias("t1"))
    u = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id", "t1")
        .agg(
            F.max("sec").alias("last_sec"),
            F.count("*").cast("bigint").alias("freq"),
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("v"))
                .otherwise(0)
            ).cast("bigint").alias("monetary"),
        )
        .select(
            "user_id",
            F.expr("(t1 - last_sec) div 86400").alias("rec_days"),
            "freq",
            "monetary",
        )
    )
    q = u.select(
        "user_id",
        "rec_days",
        "freq",
        "monetary",
        F.ntile(_RFM_Q)
        .over(W2.orderBy("rec_days", "user_id"))
        .alias("r_q"),
        F.ntile(_RFM_Q).over(W2.orderBy("freq", "user_id")).alias("f_q"),
        F.ntile(_RFM_Q)
        .over(W2.orderBy("monetary", "user_id"))
        .alias("m_q"),
    )
    return (
        q.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("freq").cast("bigint").alias("total_events"),
            (
                F.sum("monetary").cast("double") / F.count("*")
            ).alias("avg_monetary_milli"),
        )
        .orderBy("r_q", "f_q", "m_q")
    )


cohort_rfm_segments.__doc__ = cohort_rfm_segments.__doc__.replace(
    "{_RFM_Q}", str(_RFM_Q)
)


# ---------------------------------------------------------------------------
# ts_mann_kendall — nonparametric trend significance (Theil–Sen's test)
# ---------------------------------------------------------------------------

#: z with continuity correction as a shared expression over the
#: integer S and the integer variance NUMERATOR (Var·18): z =
#: (S ∓ 1) / sqrt(vn/18). The CASE keeps the ±1 correction out of
#: the S = 0 branch.
_MK_Z_EXPR = (
    "CASE WHEN s_stat > 0"
    " THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(CAST(vn AS DOUBLE) / 18.0)"
    " WHEN s_stat < 0"
    " THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(CAST(vn AS DOUBLE) / 18.0)"
    " ELSE 0.0 END"
)

_MK_SQL = f"""
    WITH {_TSEN_B_CTE},
    bm AS (
      SELECT event_type, h, CAST(s AS DOUBLE) / c AS m FROM b
    ),
    p AS (
      SELECT i.event_type,
             CASE WHEN j.m > i.m THEN 1
                  WHEN j.m < i.m THEN -1 ELSE 0 END AS sgn
      FROM bm i
      JOIN bm j ON i.event_type = j.event_type AND i.h < j.h
    ),
    sstat AS (
      SELECT event_type, CAST(SUM(sgn) AS BIGINT) AS s_stat
      FROM p GROUP BY event_type
    ),
    ties AS (
      SELECT event_type,
             CAST(SUM(t) AS BIGINT) AS n,
             CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      FROM (
        SELECT event_type, m, CAST(COUNT(*) AS BIGINT) AS t
        FROM bm GROUP BY event_type, m
      ) GROUP BY event_type
    )
    SELECT s.event_type, t.n AS n_buckets, s.s_stat,
           CAST(t.n * (t.n - 1) * (2 * t.n + 5) - t.tie_term AS BIGINT)
             AS vn,
           {_MK_Z_EXPR.replace("vn",
               "(t.n * (t.n - 1) * (2 * t.n + 5) - t.tie_term)")
            .replace("s_stat", "s.s_stat")} AS z_mk
    FROM sstat s JOIN ties t USING (event_type)
    ORDER BY s.event_type
"""


@query("ts_mann_kendall", oracle=_MK_SQL)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test per series — S = Σ sign(m_j − m_i)
    over all bucket pairs with the tie-corrected normal
    approximation and continuity correction: the SIGNIFICANCE half
    of the robust-trend pair ([[ts_theil_sen]] estimates the
    magnitude; MK decides whether a monotone trend exists at all,
    invariant to any monotone transform — the hydrology/climatology
    standard, and the right drift GATE in front of a drift
    magnitude estimate). Shares [[_hour_bucket_frame]] /
    [[_TSEN_B_CTE]] with Theil–Sen — one bucket definition, so the
    pair can never test different series.

    Exactness: both engines compare the IDENTICAL bucket-mean
    doubles (one division of exact integers each — and tie GROUPS
    are defined on those same doubles, so the sign and the tie term
    can never disagree); S and the variance numerator n(n−1)(2n+5) −
    Σt(t−1)(2t+5) are exact integers; z is one shared expression
    with the ±1 continuity CASE.

    Plan: the same bounded O(B²) pair join as Theil–Sen (~260k
    pairs per series regardless of row density), one sign fold, one
    tie fold on ≤B rows, a report-sized join. The corpus-
    proportional work remains the single bucket fold."""
    b = _hour_bucket_frame(load(spark, sf_dir, "events"))
    bm = b.select(
        "event_type",
        "h",
        (F.col("s").cast("double") / F.col("c")).alias("m"),
    )
    i, j = bm.alias("i"), bm.alias("j")
    p = i.join(
        j,
        (F.col("i.event_type") == F.col("j.event_type"))
        & (F.col("i.h") < F.col("j.h")),
    ).select(
        F.col("i.event_type").alias("event_type"),
        F.when(F.col("j.m") > F.col("i.m"), 1)
        .when(F.col("j.m") < F.col("i.m"), -1)
        .otherwise(0)
        .alias("sgn"),
    )
    sstat = p.groupBy("event_type").agg(
        F.sum("sgn").cast("bigint").alias("s_stat")
    )
    ties = (
        bm.groupBy("event_type", "m")
        .agg(F.count("*").cast("bigint").alias("t"))
        .groupBy("event_type")
        .agg(
            # n = Σt (bucket count), NOT the tie-GROUP count — the
            # python differential caught both engines agreeing on the
            # wrong n (r15 session 2)
            F.sum("t").cast("bigint").alias("n"),
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).cast("bigint").alias("tie_term"),
        )
    )
    out = sstat.join(ties, "event_type").withColumn(
        "vn",
        (
            F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
            - F.col("tie_term")
        ).cast("bigint"),
    )
    return out.select(
        "event_type",
        F.col("n").alias("n_buckets"),
        "s_stat",
        "vn",
        F.expr(_MK_Z_EXPR).alias("z_mk"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# abtest_cuped — CUPED variance-reduced experiment readout
# ---------------------------------------------------------------------------

#: Pre-period length: the first half of the fixture's 30-day window,
#: split at min(ts) + 15 days (exact epoch-second arithmetic).
_CUPED_SPLIT_S = 15 * 86400

#: Pooled sums and theta over the per-arm exact moment columns —
#: shared expression strings; theta is materialized as a COLUMN so
#: every downstream reference reuses one identical subtree instead
#: of re-inlining the ratio.
_CU_N = "(n0 + n1)"
_CU_SX = "(sx0 + sx1)"
_CU_SY = "(sy0 + sy1)"
_CU_SXX = "(sxx0 + sxx1)"
_CU_SXY = "(sxy0 + sxy1)"
_CU_SYY = "(syy0 + syy1)"
_CU_THETA = (
    f"CAST({_CU_N} * {_CU_SXY} - {_CU_SX} * {_CU_SY} AS DOUBLE)"
    f" / NULLIF(CAST({_CU_N} * {_CU_SXX} - {_CU_SX} * {_CU_SX}"
    f" AS DOUBLE), 0.0)"
)


def _cu_var(s: str, mom: str, f1: str, f2: str) -> str:
    return (
        f"(CAST(n{s} * {mom}{s} - {f1}{s} * {f2}{s} AS DOUBLE)"
        f" / (CAST(n{s} AS DOUBLE) * (n{s} - 1)))"
    )


def _cu_var_adj(s: str) -> str:
    return (
        f"({_cu_var(s, 'syy', 'sy', 'sy')}"
        f" - 2.0 * theta * {_cu_var(s, 'sxy', 'sx', 'sy')}"
        f" + theta * theta * {_cu_var(s, 'sxx', 'sx', 'sx')})"
    )


def _cu_adj(s: str) -> str:
    return (
        f"(CAST(sy{s} AS DOUBLE) / n{s}"
        f" - theta * (CAST(sx{s} AS DOUBLE) / n{s}"
        f" - CAST({_CU_SX} AS DOUBLE) / {_CU_N}))"
    )


_CU_T = (
    f"(({_cu_adj('1')}) - ({_cu_adj('0')}))"
    f" / sqrt({_cu_var_adj('1')} / n1 + {_cu_var_adj('0')} / n0)"
)

_CU_VARY_POOL = (
    f"(CAST({_CU_N} * {_CU_SYY} - {_CU_SY} * {_CU_SY} AS DOUBLE)"
    f" / (CAST({_CU_N} AS DOUBLE) * ({_CU_N} - 1)))"
)
_CU_COV_POOL = (
    f"(CAST({_CU_N} * {_CU_SXY} - {_CU_SX} * {_CU_SY} AS DOUBLE)"
    f" / (CAST({_CU_N} AS DOUBLE) * ({_CU_N} - 1)))"
)
_CU_VARX_POOL = (
    f"(CAST({_CU_N} * {_CU_SXX} - {_CU_SX} * {_CU_SX} AS DOUBLE)"
    f" / (CAST({_CU_N} AS DOUBLE) * ({_CU_N} - 1)))"
)
_CU_VARRED = (
    f"(1.0 - ({_CU_VARY_POOL} - 2.0 * theta * {_CU_COV_POOL}"
    f" + theta * theta * {_CU_VARX_POOL}) / NULLIF({_CU_VARY_POOL},"
    f" 0.0))"
)

_CUPED_SQL = f"""
    WITH anchor AS (
      SELECT MIN(CAST(floor(epoch(ts)) AS BIGINT)) + {_CUPED_SPLIT_S}
               AS split_sec
      FROM events
    ),
    u AS (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
             SUM(CASE WHEN event_type = 'purchase'
                       AND CAST(floor(epoch(ts)) AS BIGINT)
                           < anchor.split_sec
                      THEN CAST(round(value * 1000) AS BIGINT)
                      ELSE 0 END) AS x,
             SUM(CASE WHEN event_type = 'purchase'
                       AND CAST(floor(epoch(ts)) AS BIGINT)
                           >= anchor.split_sec
                      THEN CAST(round(value * 1000) AS BIGINT)
                      ELSE 0 END) AS y
      FROM events CROSS JOIN anchor
      GROUP BY user_id
    ),
    g AS (
      SELECT
        CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        SUM(CASE WHEN arm = 0 THEN CAST(x AS HUGEINT) ELSE 0 END) AS sx0,
        SUM(CASE WHEN arm = 1 THEN CAST(x AS HUGEINT) ELSE 0 END) AS sx1,
        SUM(CASE WHEN arm = 0 THEN CAST(y AS HUGEINT) ELSE 0 END) AS sy0,
        SUM(CASE WHEN arm = 1 THEN CAST(y AS HUGEINT) ELSE 0 END) AS sy1,
        SUM(CASE WHEN arm = 0 THEN CAST(x AS HUGEINT) * x ELSE 0 END)
          AS sxx0,
        SUM(CASE WHEN arm = 1 THEN CAST(x AS HUGEINT) * x ELSE 0 END)
          AS sxx1,
        SUM(CASE WHEN arm = 0 THEN CAST(x AS HUGEINT) * y ELSE 0 END)
          AS sxy0,
        SUM(CASE WHEN arm = 1 THEN CAST(x AS HUGEINT) * y ELSE 0 END)
          AS sxy1,
        SUM(CASE WHEN arm = 0 THEN CAST(y AS HUGEINT) * y ELSE 0 END)
          AS syy0,
        SUM(CASE WHEN arm = 1 THEN CAST(y AS HUGEINT) * y ELSE 0 END)
          AS syy1
      FROM u
    ),
    gt AS (SELECT *, {_CU_THETA} AS theta FROM g)
    SELECT n0 AS n_control_users, n1 AS n_treatment_users, theta,
           {_cu_adj('0')} AS mean_adj_control,
           {_cu_adj('1')} AS mean_adj_treatment,
           {_CU_T} AS t_cuped,
           {_CU_VARRED} AS var_reduction
    FROM gt
"""


@query("abtest_cuped", oracle=_CUPED_SQL)
def abtest_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng, Xu, Kohavi &
    Walker 2013): per-user PRE-period purchase value (the first 15
    days) as the control covariate for the POST-period metric —
    Y' = Y − θ(X − X̄) with the pooled OLS θ, the industry-standard
    sensitivity boost that [[abtest_welch_ttest]]'s docstring
    defers to. Completes the experimentation family: means
    (welch), distributions (mann-whitney), ratios (ratio_delta),
    brackets (bootstrap), and now variance reduction — the five
    readouts a real experimentation platform ships.

    Exactness: per-user (x, y) exact integers split at an exact
    epoch-second anchor; twelve per-arm moments widen through the
    128-bit domain; θ is ONE shared division MATERIALIZED AS A
    COLUMN so every downstream reference (adjusted means, adjusted
    variances via the expanded Σ(y−θx)² = Σy² − 2θΣxy + θ²Σx² form
    — never a float sum over users), the t statistic, and the
    variance-reduction ratio reuse the identical subtree in both
    engines. The expansion is the load-bearing trick: adjusted
    moments come from the SAME exact integer moments, so CUPED
    costs zero extra passes and zero float-order hazards.

    Plan: one groupBy(user) fold behind a broadcast 1-row anchor,
    one 12-moment single-row fold, report math on one row — the
    welch/ratio_delta shape with a covariate."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("long").alias("sec"),
        F.round(F.col("value") * 1000).cast("bigint").alias("v"),
    )
    anchor = ev.agg(
        (F.min("sec") + _CUPED_SPLIT_S).alias("split_sec")
    )
    is_p = F.col("event_type") == "purchase"
    u = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(is_p & (F.col("sec") < F.col("split_sec")),
                       F.col("v")).otherwise(0)
            ).cast("bigint").alias("x"),
            F.sum(
                F.when(is_p & (F.col("sec") >= F.col("split_sec")),
                       F.col("v")).otherwise(0)
            ).cast("bigint").alias("y"),
        )
        .withColumn("arm", (F.col("user_id") % 2).cast("bigint"))
    )

    def arm_mom(a: int, expr, *more):
        return wide_sum(
            F.when(F.col("arm") == a, expr).otherwise(0), *more
        )

    g = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint").alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint").alias("n1"),
        arm_mom(0, F.col("x")).alias("sx0"),
        arm_mom(1, F.col("x")).alias("sx1"),
        arm_mom(0, F.col("y")).alias("sy0"),
        arm_mom(1, F.col("y")).alias("sy1"),
        arm_mom(0, F.col("x"), F.col("x")).alias("sxx0"),
        arm_mom(1, F.col("x"), F.col("x")).alias("sxx1"),
        arm_mom(0, F.col("x"), F.col("y")).alias("sxy0"),
        arm_mom(1, F.col("x"), F.col("y")).alias("sxy1"),
        arm_mom(0, F.col("y"), F.col("y")).alias("syy0"),
        arm_mom(1, F.col("y"), F.col("y")).alias("syy1"),
    )
    gt = g.withColumn("theta", F.expr(_CU_THETA))
    return gt.select(
        F.col("n0").alias("n_control_users"),
        F.col("n1").alias("n_treatment_users"),
        "theta",
        F.expr(_cu_adj("0")).alias("mean_adj_control"),
        F.expr(_cu_adj("1")).alias("mean_adj_treatment"),
        F.expr(_CU_T).alias("t_cuped"),
        F.expr(_CU_VARRED).alias("var_reduction"),
    )


# ---------------------------------------------------------------------------
# abtest_ks_test — exact two-sample Kolmogorov–Smirnov distance
# ---------------------------------------------------------------------------

#: K–S 5% critical coefficient c(α) = sqrt(−ln(α/2)/2) for α = 0.05,
#: as a python literal (the benford device).
_KS_C05 = 1.3581015157406195

@query(
    "abtest_ks_test",
    oracle=f"""
    WITH m AS (
      SELECT event_type, CAST(user_id % 2 AS BIGINT) AS arm,
             CAST(round(value * 1000) AS BIGINT) AS x
      FROM events
    ),
    blocks AS (
      SELECT event_type, x,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c0,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS c1
      FROM m GROUP BY event_type, x
    ),
    cum AS (
      SELECT event_type,
             CAST(SUM(c0) OVER w AS BIGINT) AS f0,
             CAST(SUM(c1) OVER w AS BIGINT) AS f1
      FROM blocks
      WINDOW w AS (PARTITION BY event_type ORDER BY x)
    ),
    tot AS (
      SELECT event_type,
             CAST(SUM(c0) AS BIGINT) AS n0,
             CAST(SUM(c1) AS BIGINT) AS n1
      FROM blocks GROUP BY event_type
    ),
    g AS (
      SELECT c.event_type, t.n0, t.n1,
             CAST(MAX(abs(CAST(c.f0 AS HUGEINT) * t.n1
                          - CAST(c.f1 AS HUGEINT) * t.n0))
                  AS BIGINT) AS d_num
      FROM cum c JOIN tot t USING (event_type)
      GROUP BY c.event_type, t.n0, t.n1
    )
    SELECT event_type, n0 AS n_control, n1 AS n_treatment, d_num,
           CAST(d_num AS DOUBLE)
             / (CAST(n0 AS DOUBLE) * n1) AS d_stat,
           CASE WHEN CAST(d_num AS DOUBLE)
                     / (CAST(n0 AS DOUBLE) * n1)
                     > CAST({_KS_C05!r} AS DOUBLE)
                       * sqrt((CAST(n0 AS DOUBLE) + n1)
                              / (CAST(n0 AS DOUBLE) * n1))
                THEN 1 ELSE 0 END AS reject_05
    FROM g
    ORDER BY event_type
    """,
)
def abtest_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test per event type — D =
    sup|F₀ − F₁| between the arms' empirical CDFs with the 5%
    large-sample decision: the distribution-EQUALITY member closing
    the two-sample family ([[abtest_welch_ttest]] means,
    [[abtest_mann_whitney]] stochastic dominance — a variance or
    shape change with equal medians slips past BOTH; K–S catches
    any distributional difference).

    Exactness: the supremum is computed ENTIRELY in integers — at
    every distinct value, |F₀ − F₁| ∝ |cum₀·n₁ − cum₁·n₀| (the
    cross-multiplied CDF gap; ~1e5·1e5 ≈ 1e10 per term at sf1,
    widened through the 128-bit domain for the 100 TB case), and
    MAX over exact integers is order-free — no float sup, no
    tolerance. D and the critical-value comparison (c(0.05) as a
    python literal) are the only float operations, shared trees
    both engines — even the reject flag is bit-exact.

    Plan: the [[abtest_mann_whitney]] block-collapse discipline —
    groupBy(series, value) FIRST, so the CDF window sorts the value
    domain, not the corpus; one window exchange + one fold. At
    100 TB the exchange carries distinct (series, milli-value)
    blocks."""
    from pyspark.sql.window import Window

    m = load(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 2).alias("arm"),
        F.round(F.col("value") * 1000).cast("bigint").alias("x"),
    )
    blocks = m.groupBy("event_type", "x").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint").alias("c0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint").alias("c1"),
    )
    w = Window.partitionBy("event_type").orderBy("x")
    wt = Window.partitionBy("event_type")
    cum = blocks.select(
        "event_type",
        F.sum("c0").over(w).cast("bigint").alias("f0"),
        F.sum("c1").over(w).cast("bigint").alias("f1"),
        F.sum("c0").over(wt).cast("bigint").alias("n0"),
        F.sum("c1").over(wt).cast("bigint").alias("n1"),
    )
    g = cum.groupBy("event_type", "n0", "n1").agg(
        F.max(
            F.abs(
                F.col("f0").cast("decimal(38,0)") * F.col("n1")
                - F.col("f1").cast("decimal(38,0)") * F.col("n0")
            )
        ).cast("bigint").alias("d_num")
    )
    d = F.col("d_num").cast("double") / (
        F.col("n0").cast("double") * F.col("n1")
    )
    crit = F.expr(
        f"CAST({_KS_C05!r} AS DOUBLE)"
        " * sqrt((CAST(n0 AS DOUBLE) + n1)"
        "        / (CAST(n0 AS DOUBLE) * n1))"
    )
    return g.select(
        "event_type",
        F.col("n0").alias("n_control"),
        F.col("n1").alias("n_treatment"),
        "d_num",
        d.alias("d_stat"),
        F.when(d > crit, 1).otherwise(0).alias("reject_05"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# abtest_two_proportion_z — pooled two-proportion z-test at user grain
# ---------------------------------------------------------------------------

_PROP_Z_SQL = """
    WITH u AS (
      SELECT user_id, user_id % 2 AS arm,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) >= 14
                  THEN 1 ELSE 0 END AS conv
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT
        CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS x_a,
        CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS x_b
      FROM u
    )
    SELECT n_a, x_a, n_b, x_b,
           CAST(x_a AS DOUBLE) / n_a AS p_a,
           CAST(x_b AS DOUBLE) / n_b AS p_b,
           (CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)
             / sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)) AS z
    FROM c
    WHERE n_a > 0 AND n_b > 0 AND x_a + x_b > 0
      AND x_a + x_b < n_a + n_b
"""


@query("abtest_two_proportion_z", oracle=_PROP_Z_SQL)
def abtest_two_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z-test on USER-grain conversion
    (heavy buyer: ≥ 14 purchase events — the fixture's ~67
    events/user make any-purchase saturate at 100%, caught by the
    python differential; the median split keeps both outcome
    classes populated at every SF) — the binary-outcome member completing
    the experimentation readout suite: [[abtest_welch_ttest]] =
    means, [[abtest_mann_whitney]] = distributions,
    [[abtest_ratio_delta]] = ratio metrics, [[abtest_cuped]] =
    variance reduction, [[abtest_ks_test]] = distribution equality,
    this key = conversion rates. Collapsing to the user FIRST is the
    methodological point (same clustering argument as ratio_delta's
    delta method): event-grain rows of one user are correlated, so
    the z denominator is only valid on the user-grain Bernoulli.

    Exactness: (n, x) per arm are exact BIGINTs from ONE user-grain
    fold; p̂, the pooled variance, and z are a fixed chain of double
    ops written with IDENTICAL operation order in both engines
    (division of exact ints → products → one sqrt; IEEE doubles are
    deterministic given the order, the repo's single-final-division
    rule extended to a fixed expression DAG). Degenerate cases
    (empty arm, all-converted, none-converted) are excluded rows,
    not NULL/Inf (the welch n ≤ 1 convention).

    Plan: groupBy(user_id) conversion fold (the one data-shuffle:
    user-grain, map-side combined) → single 4-counter conditional
    aggregate → 1-row z computation. At 100 TB: a salted-hash arm
    assignment swaps in (corpus_sample_hash machinery), plan
    unchanged."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.when(
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
                >= 14,
                1,
            )
            .otherwise(0)
            .alias("conv")
        )
        .select((F.col("user_id") % 2).alias("arm"), "conv")
    )
    c = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("x_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("x_b"),
    )
    p_a = F.col("x_a").cast("double") / F.col("n_a")
    p_b = F.col("x_b").cast("double") / F.col("n_b")
    pooled = (F.col("x_a") + F.col("x_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (p_a - p_b) / F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return c.filter(
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (F.col("x_a") + F.col("x_b") > 0)
        & (F.col("x_a") + F.col("x_b") < F.col("n_a") + F.col("n_b"))
    ).select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        z.alias("z"),
    )


# ---------------------------------------------------------------------------
# cohort_survival_km — Kaplan–Meier survival with right censoring
# ---------------------------------------------------------------------------

_KM_SQL = """
    WITH pc AS (
      SELECT o_custkey AS k,
             MIN(o_orderdate) AS f,
             MAX(o_orderdate) AS l
      FROM orders GROUP BY o_custkey
    ),
    gm AS (SELECT MAX(o_orderdate) AS g FROM orders),
    subj AS (
      SELECT c.c_mktsegment AS cohort,
             CAST(date_diff('day', pc.f, pc.l) AS BIGINT) AS dur,
             CASE WHEN date_diff('day', pc.l, gm.g) > 365
                  THEN 1 ELSE 0 END AS ev
      FROM pc
      JOIN customer c ON c.c_custkey = pc.k
      CROSS JOIN gm
    ),
    steps AS (
      SELECT cohort, dur,
             CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(ev) AS BIGINT) AS d
      FROM subj GROUP BY cohort, dur
    ),
    risk AS (
      SELECT cohort, dur, d,
             CAST(SUM(m) OVER (
               PARTITION BY cohort ORDER BY dur DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS n_risk
      FROM steps
    ),
    ev_steps AS (
      SELECT cohort, dur, d, n_risk
      FROM risk WHERE d >= 1 AND n_risk > d
    )
    SELECT cohort,
           dur AS t_days,
           n_risk,
           d AS d_events,
           CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS hazard,
           CAST(SUM(CAST(round(ln(n_risk - d) * 1000000) AS BIGINT)
                    - CAST(round(ln(n_risk) * 1000000) AS BIGINT))
                OVER (PARTITION BY cohort ORDER BY dur ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS log_surv_micro
    FROM ev_steps
    ORDER BY cohort, t_days
"""


@query("cohort_survival_km", oracle=_KM_SQL)
def cohort_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve per market-segment cohort over
    customer purchase lifetimes, with right censoring: a customer's
    duration is first→last order in days; the "death" (churn) is
    observed only if the last order predates the dataset horizon by
    more than a year, otherwise the subject is censored at its
    duration and leaves the risk set without an event — the
    estimator the naive "fraction still active at t" gets wrong by
    treating censored users as churned ([[cohort_retention]] counts
    activity per period; this estimates the survival FUNCTION). In
    an LLM-data pipeline the identical query over document
    crawl-first/last-seen dates estimates content half-life per
    source — the freshness prior behind recrawl scheduling.

    Exactness: the KM product Π(1−dᵢ/nᵢ) is float-order-dependent,
    so the survival curve ships in LOG space as an exact integer —
    log_surv_micro = Σ (mln(nᵢ−dᵢ) − mln(nᵢ)) via [[micro_ln]],
    cumulative in deterministic t-order; per-step hazard d/n is one
    IEEE division. Steps are reported where d ≥ 1 and n > d (at an
    absorbing n = d step ln 0 is engine-divergent; S = 0 from there
    is implied). exp(micro/1e6) reconstructs S(t) downstream.

    Plan: one groupBy(custkey) over orders (map-combined), a
    broadcast customer dim for the cohort label, a 1-row horizon
    broadcast, then windows over the per-(cohort, dur) STEP frame —
    bounded by distinct durations (~2.4k), not subjects. At 100 TB
    the only data-proportional work is the first fold; the risk-set
    windows run on alphabet-sized frames per cohort."""
    from pyspark.sql import Window as W

    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    pc = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.min("o_orderdate").alias("f"),
        F.max("o_orderdate").alias("l"),
    )
    gm = o.agg(F.max("o_orderdate").alias("g"))
    cust = F.broadcast(
        load(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        )
    )
    subj = (
        pc.join(cust, pc.k == cust.c_custkey)
        .crossJoin(F.broadcast(gm))
        .select(
            F.col("c_mktsegment").alias("cohort"),
            F.datediff("l", "f").cast("bigint").alias("dur"),
            F.when(F.datediff("g", "l") > 365, F.lit(1))
            .otherwise(F.lit(0))
            .alias("ev"),
        )
    )
    steps = subj.groupBy("cohort", "dur").agg(
        F.count("*").cast("bigint").alias("m"),
        F.sum("ev").cast("bigint").alias("d"),
    )
    w_desc = (
        W.partitionBy("cohort")
        .orderBy(F.col("dur").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    risk = steps.select(
        "cohort",
        "dur",
        "d",
        F.sum("m").over(w_desc).cast("bigint").alias("n_risk"),
    )
    ev_steps = risk.filter(
        (F.col("d") >= 1) & (F.col("n_risk") > F.col("d"))
    )
    w_asc = (
        W.partitionBy("cohort")
        .orderBy(F.col("dur").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    term = micro_ln(F.col("n_risk") - F.col("d")) - micro_ln(
        F.col("n_risk")
    )
    return (
        ev_steps.select(
            "cohort",
            F.col("dur").alias("t_days"),
            "n_risk",
            F.col("d").alias("d_events"),
            (
                F.col("d").cast("double")
                / F.col("n_risk").cast("double")
            ).alias("hazard"),
            F.sum(term).over(w_asc).cast("bigint").alias(
                "log_surv_micro"
            ),
        )
        .orderBy("cohort", "t_days")
    )

"""Scale-pattern operators: the join strategies a 100 TB deployment
actually runs.

The reference delegated all join/shuffle strategy to Athena
(reference README.md:14-16); at our target scale those choices are
the whole ballgame, so the engine exposes each one as a named,
oracle-checked operator:

- join_bucketed:    both fact tables bucketed by the join key at
                    write time → the join needs NO shuffle at read
                    time (Exchange-free sort-merge over co-located
                    buckets). This is the pattern for a fact-to-fact
                    join that runs every day: pay the shuffle once at
                    ingest, never at query.
- join_skew_salted: a skewed build side is replicated ×N salts and
                    the probe side is salted deterministically, so one
                    hot key spreads over N tasks instead of one
                    straggler. AQE's skew-join handles moderate skew
                    at runtime; explicit salting is the deterministic
                    heavy-artillery version.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, materialize
from ..registry import query

_SALTS = 8


def _write_bucketed_tables(
    spark: SparkSession, sf_dir: str, db: str
) -> str:
    """Write lineitem/orders bucketBy(8, orderkey)+sortBy into a
    scratch database (shared by the oracle-checked join and the
    plan-assertion helper — one definition of the bucket layout).
    Returns the external location for the caller to clean up."""
    loc = tempfile.mkdtemp(prefix=f"{db}_")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_extendedprice")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable(f"{db}.lineitem_b")
    )
    (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable(f"{db}.orders_b")
    )
    return loc


@query(
    "join_bucketed",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free fact-to-fact join over bucketed tables: lineitem
    and orders are written bucketBy(8, orderkey) + sortBy into a
    scratch database, then joined — the physical plan has NO Exchange
    above either scan (asserted in tests/test_plans.py). At 100 TB
    this converts the recurring multi-TB join shuffle into a one-time
    ingest-side layout cost."""
    from ..session import get_explicit_conf, restore_conf

    db = "dps_bucketed_scratch"
    k_bcast = "spark.sql.autoBroadcastJoinThreshold"
    old_threshold = get_explicit_conf(spark, k_bcast)
    loc = None
    try:
        loc = _write_bucketed_tables(spark, sf_dir, db)
        # disable auto-broadcast so the bucket-to-bucket path (the
        # thing being demonstrated) is what actually runs
        spark.conf.set(k_bcast, "-1")
        li = spark.table(f"{db}.lineitem_b")
        od = spark.table(f"{db}.orders_b")
        joined = (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_items"),
                F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
            )
        )
        return materialize(joined)
    finally:
        restore_conf(spark, k_bcast, old_threshold)
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        if loc:
            shutil.rmtree(loc, ignore_errors=True)


def bucketed_join_plan(spark: SparkSession, sf_dir: str) -> str:
    """Physical plan string of the bucketed join, for the
    Exchange-free assertion in tests. Returns ONLY the string: the
    bucketed files are deleted before returning, so a DataFrame
    handle would be a time bomb — executing it after this returns
    would hit FileNotFound (r8 ADVICE). Leaves the scratch database
    entry in place for the caller to drop."""
    db = "dps_bucketed_plan"
    loc = _write_bucketed_tables(spark, sf_dir, db)
    li = spark.table(f"{db}.lineitem_b")
    od = spark.table(f"{db}.orders_b")
    joined = li.join(od, li.l_orderkey == od.o_orderkey).select(
        "o_orderpriority", "l_extendedprice"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the plan string is captured; the bucketed files are no longer
    # needed (the caller only DROPs the database) — remove the
    # mkdtemp root so repeated test runs don't accumulate temp dirs
    shutil.rmtree(loc, ignore_errors=True)
    return plan


@query(
    "join_skew_salted",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant equi-join via explicit salting: the probe side
    (orders) gets a deterministic salt pmod(xxhash64(key), 8); the
    build side (customer) is replicated across all 8 salts with
    explode(sequence(...)). A key carrying 30% of all rows then lands
    on 8 tasks, not 1. Deterministic (no rand()), so the oracle is
    the plain unsalted join."""
    o = load(spark, sf_dir, "orders").withColumn(
        "salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(_SALTS)).cast("int")
    )
    c = (
        load(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(_SALTS - 1))))
    )
    return (
        o.join(c, (o.o_custkey == c.c_custkey) & (o.salt == c.salt))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@query(
    "join_interval_bucketed",
    oracle="""
    WITH d0 AS (SELECT date_trunc('day', MIN(ts)) AS d0 FROM events),
    windows AS (
      SELECT i AS window_id,
             d0 + to_hours(37 * i) AS w_start,
             d0 + to_hours(37 * i + 5) AS w_end
      FROM d0, range(0, 20) t(i)
    )
    SELECT w.window_id,
           COUNT(*) AS n_events,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e
    JOIN windows w ON e.ts >= w.w_start AND e.ts < w.w_end
    GROUP BY 1
    """,
)
def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range-overlap) join via bucketing: which events fall
    inside each maintenance window. The naive formulation is a pure
    theta join (ts BETWEEN start AND end) — Spark plans that as a
    nested-loop over every (event, window) pair, O(n·m) at scale. The
    bucketed form explodes each window into the hour buckets it
    covers and equi-joins events on their hour bucket, then applies
    the exact range filter: the join is hash-based, cost ∝ events +
    windows×hours, and only same-bucket pairs are ever compared. The
    windows are derived from the data (20 spans of 5h every 37h from
    the first day), so the oracle reproduces them exactly with the
    naive theta join."""
    ev = load(spark, sf_dir, "events")
    d0 = ev.agg(F.date_trunc("day", F.min("ts")).alias("d0"))
    windows = d0.select(
        F.explode(F.sequence(F.lit(0), F.lit(19))).alias("window_id"), "d0"
    ).select(
        "window_id",
        (F.col("d0") + F.expr("make_interval(0,0,0,0, 37 * window_id, 0,0)")).alias(
            "w_start"
        ),
        (
            F.col("d0") + F.expr("make_interval(0,0,0,0, 37 * window_id + 5, 0,0)")
        ).alias("w_end"),
    )
    # explode each window into its covered hour buckets (broadcastable
    # at any realistic window count)
    wb = windows.select(
        "window_id",
        "w_start",
        "w_end",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "w_start"),
                F.col("w_end"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bucket"),
    )
    evb = ev.withColumn("bucket", F.date_trunc("hour", "ts"))
    return (
        evb.join(F.broadcast(wb), "bucket")
        .filter((F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")))
        .groupBy("window_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "rollup_reaggregate",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS bucket,
             event_type,
             COUNT(*) AS n,
             SUM(CAST(round(value * 1000) AS BIGINT)) AS sum_mv,
             MIN(value) AS min_v,
             MAX(value) AS max_v
      FROM events
      GROUP BY bucket, event_type
    )
    SELECT CAST(date_trunc('day', bucket) AS DATE) AS day,
           event_type,
           CAST(SUM(n) AS BIGINT) AS n_events,
           SUM(sum_mv) / (1000.0 * SUM(n)) AS avg_v,
           MIN(min_v) AS min_v,
           MAX(max_v) AS max_v
    FROM hourly
    GROUP BY day, event_type
    """,
)
def rollup_reaggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: maintain an HOURLY
    pre-aggregate and answer coarser questions by re-aggregating it —
    never touching raw rows twice. Works because every kept measure
    is reaggregable: counts and sums add, min/max nest, and avg is
    carried as (sum, count) so the daily mean is exact, not an
    average-of-averages.

    At 100 TB this is the query-latency lever for dashboards: the
    hourly rollup is ~rows/3600 the size of raw, is itself
    partition-pruned by day, and each refresh only aggregates the
    newly ingested partitions. The second-level daily re-agg here
    shuffles the rollup, not the events — bytes ∝ (hours x types).

    The running sum is kept in exact integer milli-units
    (values are ≤3-decimal, so round(value*1000) is lossless):
    float summation order differs between engines and between
    partition layouts, and a last-ulp difference flips rounding at a
    digit boundary — integer sums make the rollup's carried state
    deterministic everywhere, and the final division of two exact
    integers yields the bit-identical double on every engine, so the
    mean needs no defensive ROUND at all (engines disagree on
    ROUND-at-boundary semantics: HALF_UP on decimal text vs nearest
    on binary doubles). Headroom: 10^9 rows x 10^5 milli-max
    = 10^14 ≪ int64."""
    e = load(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 1000).cast("bigint")).alias("sum_mv"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
    )
    return (
        hourly.groupBy(
            F.date_trunc("day", F.col("bucket")).cast("date").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n_events"),
            (F.sum("sum_mv") / (1000.0 * F.sum("n"))).alias("avg_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


@query(
    "agg_hll_mergeable",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS within_5pct
    FROM events
    GROUP BY event_type
    """,
)
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct counts — the capability [[rollup_reaggregate]]
    cannot have with exact counts: COUNT(DISTINCT) does not
    re-aggregate (distinct users per day don't sum to distinct users
    per month), so a rollup must carry a sketch. Per (event_type, day)
    this materializes a DataSketches HLL of user_id — the hourly-
    rollup layer — then answers the per-type question by UNIONING the
    daily sketches (`hll_union_agg`), never re-touching raw events.

    Checked contract (same shape as [[agg_approx_distinct]]): the
    union estimate must land within 5% of exact, emitted as a boolean
    the exact-side oracle asserts TRUE; lgK=14 gives ~0.8% RSE, far
    inside. The exact distinct exists only to be checked against.

    At 100 TB: sketches are ≤16 KB each and add like sums, so the
    rollup stays refresh-incremental (new day = new sketch row) and
    any time-range distinct is a sketch-union over the rollup — bytes
    ∝ days × types × 16 KB, not rows."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.expr("hll_sketch_agg(user_id, 14)").alias("user_sketch"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.expr(
                "hll_sketch_estimate(hll_union_agg(user_sketch))"
            ).alias("approx_users"),
        )
        .join(
            e.groupBy("event_type").agg(
                F.countDistinct("user_id").alias("exact_users")
            ),
            "event_type",
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
                <= F.lit(0.05)
            ).alias("within_5pct"),
        )
    )


@query(
    "agg_approx_topk",
    oracle="""
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS term FROM documents
    )
    SELECT term, COUNT(*) AS n FROM w GROUP BY term
    """,
)
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitters via `approx_top_k` — the mergeable frequent-items
    sketch (frequent boilerplate / spam-term monitoring over a
    corpus without a full term aggregation). One pass, partial
    sketches merge like sums, so it rides a rollup the same way the
    HLL sketch does ([[agg_hll_mergeable]]).

    Checked contract: COUNTS are exact while the 256-slot tracking
    capacity covers the distinct-item count, but the emitted SET is
    complete only while distinct ≤ k = 64 (approx_top_k returns at
    most k entries) — the fixture vocabulary (31 terms) sits under
    BOTH bounds, so the emitted (term, count) set must equal the
    exact GROUP BY the oracle runs, a full value check of the sketch
    path. A fixture regeneration pushing the vocabulary past 64
    distinct terms flips this key red by row count: raise k before
    raising the vocabulary. At real scale (vocab ≫ capacity) counts
    carry the documented ±εN bound and the query would keep only the
    top slice."""
    d = load(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("term"))
    topk = words.agg(
        F.expr("approx_top_k(term, 64, 256)").alias("tk")
    )
    return topk.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("term"), F.col("e.count").alias("n")
    )


_BLOOM_SQL = """
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_c
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
"""


@query("join_bloom_runtime", oracle=_BLOOM_SQL)
def join_bloom_runtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter semi-join reduction: the selective dim
    filter (urgent orders) is turned into a Bloom filter that prunes
    fact rows BEFORE the join shuffle — Catalyst's InjectRuntimeFilter
    adds ``might_contain(bloom_agg(xxhash64(o_orderkey)))`` to the
    lineitem scan. At 100 TB this is the difference between shuffling
    the whole fact table and shuffling the ~5% that can match; it is
    the runtime analogue of the static partition prune in
    [[partition_prune_filter]].

    Injection preconditions are thresholds, not semantics — Spark
    requires a shuffle join (so broadcast is disabled while planning)
    and a large application-side scan (10 GB default; the fixture is
    MBs, so the scan threshold is dropped to 0). The optimized plan is
    forced EAGERLY under those settings (lazy-val caching keeps it),
    then both knobs are restored so no config leaks into the session.
    tests/test_plans.py asserts might_contain lands in the plan; the
    filter is semantically transparent so the oracle is the plain
    join."""
    from ..session import get_explicit_conf, restore_conf

    conf = spark.conf
    k_scan = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    k_bcast = "spark.sql.autoBroadcastJoinThreshold"
    old_scan = get_explicit_conf(spark, k_scan)
    old_bcast = get_explicit_conf(spark, k_bcast)
    conf.set(k_scan, "0")
    conf.set(k_bcast, "-1")
    try:
        li = load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_returnflag", "l_extendedprice"
        )
        o = load(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        ).select("o_orderkey")
        out = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .agg(
                F.count("*").alias("n_items"),
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("bigint")
                ).alias("revenue_c"),
            )
        )
        # force logical optimization NOW, while the knobs are set;
        # the lazy val caches the bloom-injected plan for execution.
        # _jdf is classic-only (absent on Spark Connect) — there the
        # plan optimizes lazily and may miss the injection window,
        # but the query stays semantically identical (the bloom
        # filter is a pure pruning hint).
        jdf = getattr(out, "_jdf", None)
        if jdf is not None:
            jdf.queryExecution().optimizedPlan()
    finally:
        restore_conf(spark, k_scan, old_scan)
        restore_conf(spark, k_bcast, old_bcast)
    return out


# ---------------------------------------------------------------------------
# Z-order data layout (the Delta/Iceberg Z-ORDER capability)
# ---------------------------------------------------------------------------

_Z_BITS = 5        # 5 bits per dimension: day index 0..29, user bucket 0..31
_Z_FILES = 64      # target file count for the layout comparison
_Z_DAY_LO, _Z_DAY_HI = 7, 13    # the box query: a 7-day window ...
_Z_USER_LO, _Z_USER_HI = 8, 11  # ... for 4 of the 32 user buckets

def morton_z(d, u):
    """Morton (Z-curve) interleave of two ``_Z_BITS``-bit non-negative
    ints as a Column — d's bits land on odd positions, u's on even.
    Plain shift/mask/multiply so the SQL twin is bit-identical;
    module-level so the hypothesis differential runs the same fold."""
    zval = None
    for i in range(_Z_BITS):
        term = F.shiftright(d, i).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * i + 1)
        ) + F.shiftright(u, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        zval = term if zval is None else zval + term
    return zval


_ZORDER_SQL = f"""
    WITH bounds AS (
      SELECT MIN(CAST(ts AS DATE)) AS mind,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events
    ),
    dims AS (
      SELECT event_id, ts,
             date_diff('day', b.mind, CAST(ts AS DATE)) AS d,
             user_id % 32 AS u,
             b.n
      FROM events, bounds b
    ),
    z AS (
      SELECT event_id, ts, d, u, n,
             {" + ".join(
                 f"((d >> {i}) & 1) * {1 << (2 * i + 1)}"
                 f" + ((u >> {i}) & 1) * {1 << (2 * i)}"
                 for i in range(_Z_BITS)
             )} AS zval
      FROM dims
    ),
    ranked AS (
      SELECT d, u, n,
             (row_number() OVER (ORDER BY zval, event_id) - 1)
               // ((n + {_Z_FILES - 1}) // {_Z_FILES}) AS file_z,
             (row_number() OVER (ORDER BY ts, event_id) - 1)
               // ((n + {_Z_FILES - 1}) // {_Z_FILES}) AS file_l
      FROM z
    ),
    zfiles AS (
      SELECT file_z, MIN(d) AS dlo, MAX(d) AS dhi,
             MIN(u) AS ulo, MAX(u) AS uhi
      FROM ranked GROUP BY file_z
    ),
    lfiles AS (
      SELECT file_l, MIN(d) AS dlo, MAX(d) AS dhi,
             MIN(u) AS ulo, MAX(u) AS uhi
      FROM ranked GROUP BY file_l
    ),
    zs AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_files_z,
             CAST(SUM(CASE WHEN dlo <= {_Z_DAY_HI} AND dhi >= {_Z_DAY_LO}
                            AND ulo <= {_Z_USER_HI} AND uhi >= {_Z_USER_LO}
                           THEN 1 ELSE 0 END) AS BIGINT)
               AS files_scanned_zorder
      FROM zfiles
    ),
    ls AS (
      SELECT CAST(SUM(CASE WHEN dlo <= {_Z_DAY_HI} AND dhi >= {_Z_DAY_LO}
                            AND ulo <= {_Z_USER_HI} AND uhi >= {_Z_USER_LO}
                           THEN 1 ELSE 0 END) AS BIGINT)
               AS files_scanned_linear
      FROM lfiles
    )
    SELECT (SELECT n FROM bounds) AS n_rows,
           zs.n_files_z AS n_files,
           zs.files_scanned_zorder,
           ls.files_scanned_linear,
           zs.files_scanned_zorder < ls.files_scanned_linear
             AS zorder_wins
    FROM zs, ls
"""


@query("layout_zorder_locality", oracle=_ZORDER_SQL)
def layout_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering — the Delta/Iceberg ``ZORDER BY`` layout
    capability, measured rather than asserted: interleave the bits of
    two query dimensions (event day index × user bucket) into a
    Morton code, lay the table out in z-order versus the naive
    arrival (time) order at 64 files, and count how many files a
    two-dimensional box predicate (a 7-day window × 4 user
    buckets) would touch under each layout given per-file min/max
    statistics — exactly the row-group pruning a parquet/Iceberg
    reader performs. Arrival order packs each day contiguously, so
    EVERY file holding the window's days must be read regardless of
    user bucket; the z-layout clusters both dimensions jointly, so
    the box touches only the files covering its curve region. The
    emitted ``zorder_wins`` boolean is the behavioral contract, and
    the scanned-file counts are exact integers the oracle recomputes
    bit for bit (the Morton interleave is plain shift/mask/multiply
    arithmetic, identical in both engines; file boundaries are exact
    integer division on the global rank).

    Scale shape: at fixture scale the global z-rank rides one
    single-partition window to make file assignment EXACTLY
    reproducible for the oracle; the production writer gets the same
    order with ``repartitionByRange(z).sortWithinPartitions(z)`` —
    a range shuffle, no global window — and the min/max pruning
    statistics come free from the parquet footers. State per file is
    two (min, max) pairs; everything else is a narrow projection."""
    e = load(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    bounds = e.agg(
        F.min(F.to_date("ts")).alias("mind"),
        F.count("*").cast("bigint").alias("n"),
    )
    dims = e.crossJoin(F.broadcast(bounds)).select(
        "event_id",
        "ts",
        F.datediff(F.to_date("ts"), F.col("mind")).alias("d"),
        (F.col("user_id") % 32).alias("u"),
        "n",
    )
    zval = morton_z(F.col("d"), F.col("u"))
    from pyspark.sql import Window as W

    rpf = (F.col("n") + F.lit(_Z_FILES - 1)) / F.lit(_Z_FILES)
    ranked = dims.withColumn("zval", zval).select(
        "d",
        "u",
        F.floor(
            (
                F.row_number().over(
                    W.orderBy(F.col("zval"), F.col("event_id"))
                )
                - 1
            )
            / rpf.cast("bigint")
        ).alias("file_z"),
        F.floor(
            (
                F.row_number().over(
                    W.orderBy(F.col("ts"), F.col("event_id"))
                )
                - 1
            )
            / rpf.cast("bigint")
        ).alias("file_l"),
        "n",
    )

    def scanned(file_col: str, out: str):
        per_file = ranked.groupBy(file_col).agg(
            F.min("d").alias("dlo"),
            F.max("d").alias("dhi"),
            F.min("u").alias("ulo"),
            F.max("u").alias("uhi"),
        )
        hit = (
            (F.col("dlo") <= _Z_DAY_HI)
            & (F.col("dhi") >= _Z_DAY_LO)
            & (F.col("ulo") <= _Z_USER_HI)
            & (F.col("uhi") >= _Z_USER_LO)
        )
        return per_file.agg(
            F.count("*").cast("bigint").alias(f"n_files_{out}"),
            F.sum(hit.cast("int")).cast("bigint").alias(
                f"files_scanned_{out}"
            ),
        )
    zs = scanned("file_z", "zorder")
    ls = scanned("file_l", "linear").drop("n_files_linear")
    return (
        bounds.select("n")
        .crossJoin(F.broadcast(zs))
        .crossJoin(F.broadcast(ls))
        .select(
            F.col("n").alias("n_rows"),
            F.col("n_files_zorder").alias("n_files"),
            "files_scanned_zorder",
            "files_scanned_linear",
            (
                F.col("files_scanned_zorder")
                < F.col("files_scanned_linear")
            ).alias("zorder_wins"),
        )
    )


# ---------------------------------------------------------------------------
# count-min sketch (mergeable frequency sketch)
# ---------------------------------------------------------------------------

#: Count-min geometry: 4 hash rows × 64 buckets. 64 < |users| at
#: every fixture SF, so bucket collisions are REAL and the
#: overestimate property is exercised, not vacuous.
_CMS_D = 4
_CMS_W = 64


def _hex6_int_sql(expr: str) -> str:
    """Engine-neutral int of the first 6 hex chars of md5(expr) —
    unrolled positional strpos arithmetic, because the two engines
    share md5/instr/substr but NOT a hex-parse builtin (Spark conv
    has no DuckDB twin). Identical text runs on both."""
    terms = [
        f"(instr('0123456789abcdef', substr(md5({expr}), {i + 1}, 1)) - 1)"
        f" * {16 ** (5 - i)}"
        for i in range(6)
    ]
    return "(" + " + ".join(terms) + ")"


def _cms_bucket_sql(seed: int, key: str) -> str:
    """Bucket of ``key`` under hash row ``seed`` — md5 of the
    seed-tagged key, 24 bits, mod width."""
    tagged = "'s" + str(seed) + "|' || CAST(" + key + " AS STRING)"
    return f"({_hex6_int_sql(tagged)}) % {_CMS_W}"


_CMS_CASE = (
    "CASE r "
    + " ".join(
        f"WHEN {s} THEN {_cms_bucket_sql(s, 'user_id')}" for s in range(_CMS_D)
    )
    + " END"
)

_CMS_SQL = f"""
    WITH per_user AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id
    ),
    seeds AS (SELECT unnest(range({_CMS_D})) AS r),
    cells AS (
      SELECT r, {_CMS_CASE} AS b, CAST(SUM(cnt) AS BIGINT) AS cell
      FROM per_user, seeds
      GROUP BY r, {_CMS_CASE}
    ),
    probes AS (
      SELECT user_id, cnt, r, {_CMS_CASE} AS b
      FROM per_user, seeds
    )
    SELECT p.user_id,
           p.cnt AS true_cnt,
           CAST(MIN(c.cell) AS BIGINT) AS cms_est,
           MIN(c.cell) >= p.cnt AS never_under
    FROM probes p JOIN cells c ON p.r = c.r AND p.b = c.b
    GROUP BY p.user_id, p.cnt
"""


def cms_cells(per_key: DataFrame) -> DataFrame:
    """Count-min cell grid (r, b, cell) from a (user_id, cnt)
    frame — module-level so the mergeability test can sketch two
    disjoint halves and assert cell-wise addition equals the
    whole-corpus sketch (THE property that makes a sketch a
    sketch)."""
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).alias("r"),
                    F.expr(_cms_bucket_sql(s, "user_id")).alias("b"),
                )
                for s in range(_CMS_D)
            ]
        )
    ).alias("rb")
    return (
        per_key.select("cnt", rows)
        .select("rb.r", "rb.b", "cnt")
        .groupBy("r", "b")
        .agg(F.sum("cnt").cast("bigint").alias("cell"))
    )


@query("agg_countmin_sketch", oracle=_CMS_SQL)
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode–Muthukrishnan 2005) over per-user
    event frequencies — the MERGEABLE frequency sketch completing
    the sketch family next to [[agg_hll_mergeable]] (distinct) and
    [[agg_approx_topk]] (heavy hitters): a {_CMS_D}×{_CMS_W} grid of
    counters any shard can build independently and any rollup can
    merge by cell-wise addition, answering point frequency queries
    with a one-sided (never-under) error. The key emits every user's
    true count next to its sketch estimate and the CMS guarantee as
    a checked column.

    Cross-engine hashing: both engines share md5 but no hex-parse
    builtin, so the bucket is the first 24 md5 bits via unrolled
    ``instr`` arithmetic (``_hex6_int_sql``) — the SAME expression
    text evaluated by both, exact integers end to end.

    Scale shape: the sketch is built from the per-user aggregate
    (ONE map-side-combined user-keyed exchange over events — the
    grid never sees event-proportional rows), the grid itself is
    {_CMS_D}·{_CMS_W} rows broadcast back onto the probe side, and
    the per-user MIN over {_CMS_D} cells is in-row after a
    broadcast join. At 100 TB the grid is the per-shard partial any
    executor emits; merging is a {_CMS_D}×{_CMS_W}-row SUM — the
    mergeability [[rollup_reaggregate]] needs, proven by cell-wise
    test against two disjoint halves."""
    e = load(spark, sf_dir, "events").select("user_id")
    per_user = e.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    return cms_serve(per_user, cms_cells(per_user))


def cms_serve(per_key: DataFrame, cells: DataFrame) -> DataFrame:
    """The probe/estimate tail over a built (r, b, cell) grid —
    shared verbatim by the batch key and [[stream_countmin]]'s
    streaming twin (r16 self-review: the two carried ~30 duplicated
    lines that could silently drift, the exact hazard the adjacent
    ddsketch pair avoids via [[ddsketch_serve]]). ``per_key`` is a
    (user_id, cnt) truth frame; every key probes its _CMS_D cells
    and takes the min, with the never-undercount flag the oracle
    asserts."""
    probes = per_key.select(
        "user_id",
        "cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("r"),
                        F.expr(_cms_bucket_sql(s, "user_id")).alias("b"),
                    )
                    for s in range(_CMS_D)
                ]
            )
        ).alias("rb"),
    ).select("user_id", "cnt", "rb.r", "rb.b")
    return (
        probes.join(F.broadcast(cells), ["r", "b"])
        .groupBy("user_id", "cnt")
        .agg(F.min("cell").cast("bigint").alias("cms_est"))
        .select(
            "user_id",
            F.col("cnt").alias("true_cnt"),
            "cms_est",
            (F.col("cms_est") >= F.col("cnt")).alias("never_under"),
        )
    )


agg_countmin_sketch.__doc__ = (
    agg_countmin_sketch.__doc__.replace("{_CMS_D}", str(_CMS_D))
    .replace("{_CMS_W}", str(_CMS_W))
)


_DDS_LNG = 19803  # round(1e6 * ln(gamma)) for gamma = 1.02
_DDS_QS = (50, 95, 99)  # percentiles served

_DDS_SQL = f"""
WITH mv AS (
  SELECT event_type, CAST(round(value * 1000) AS BIGINT) AS mv
  FROM events
),
cells AS (
  SELECT event_type,
         CAST(round(ln(greatest(mv, 1)) * 1000000) AS BIGINT)
           // {_DDS_LNG} AS b,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM mv
  GROUP BY event_type,
           CAST(round(ln(greatest(mv, 1)) * 1000000) AS BIGINT)
             // {_DDS_LNG}
),
cum AS (
  SELECT event_type, b, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY b) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM cells
),
qs AS (SELECT UNNEST([{", ".join(str(q) for q in _DDS_QS)}]) AS q),
hit AS (
  SELECT event_type, q, MIN(b) AS bucket
  FROM cum CROSS JOIN qs
  WHERE cum >= (q * n + 99) // 100
  GROUP BY event_type, q
)
SELECT event_type, CAST(q AS BIGINT) AS q, CAST(bucket AS BIGINT) AS bucket,
       ROUND(exp(((2 * bucket + 1) * {_DDS_LNG}) / 2000000.0)
             / 1000.0, 4) AS est_value
FROM hit
ORDER BY event_type, q
"""


@query("agg_ddsketch_quantile", oracle=_DDS_SQL)
def agg_ddsketch_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch quantile estimation (Masson-Rim-Lee, VLDB 2019) over
    per-type event values — the MERGEABLE quantile sketch completing
    the sketch triad next to [[agg_hll_mergeable]] (distincts) and
    [[agg_countmin_sketch]] (frequencies): log-spaced buckets
    b = floor(ln(x)/ln(gamma)) give a RELATIVE-accuracy guarantee
    (est/true within [gamma^-1/2, gamma^1/2], here gamma = 1.02 →
    ±1%), and two shards' sketches merge by cell-wise addition —
    the property exact percentiles ([[agg_median_exact]],
    [[agg_percentile_disc]]) fundamentally lack, since a median of
    medians is not the median. At 100 TB this is the ONLY way to
    serve p95/p99 dashboards without a global sort: every executor
    folds its partition into a few-hundred-row grid, the rollup sums
    grids.

    Cross-engine exactness (the [[micro_ln]] discipline): values go
    to integer milli-units once, the bucket index is the micro-nat
    ln integer-divided by the micro-nat of ln(gamma) — one rounding
    per distinct integer value, everything after is bigint
    arithmetic. Exact zeros (ln undefined — the paper keeps a
    separate zero store) fold into bucket 0 via ln(greatest(mv, 1)):
    the sketch domain is [0, ∞) milli-units with the relative
    guarantee for mv ≥ 1 and absolute 0.001 resolution at the
    bottom, and the shared expression text keeps both engines
    total on the fixture family (sf0.1 carries exact-0 values). Rank targets are ceil(q·n/100) as
    ``(q*n + 99) div 100``; the single float expression is the final
    bucket-midpoint exponential, the identical IEEE op in both
    engines.

    Plan shape: one map-side-combined groupBy(event_type, bucket)
    over events — the ONLY event-proportional exchange; the window
    cumsum and the quantile probe run on the cells frame (≤ a few
    hundred rows per type: ln spans the value range, not the row
    count). The sketch is the aggregate; the events table is read
    once."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 1000).cast("bigint").alias("mv"),
    )
    return ddsketch_serve(ddsketch_cells_of(e))


def ddsketch_serve(cells: DataFrame) -> DataFrame:
    """The quantile probe over a built (event_type, b, c) grid —
    shared verbatim by the batch key and [[stream_countmin]]'s
    streaming twin `stream_ddsketch` (streaming converges to the
    same grid, so both serve through ONE code path and grade
    against ONE oracle)."""
    from pyspark.sql import Window as W

    cum = cells.select(
        "event_type",
        "b",
        "c",
        F.sum("c")
        .over(W.partitionBy("event_type").orderBy("b"))
        .alias("cum"),
        F.sum("c").over(W.partitionBy("event_type")).alias("n"),
    )
    qs = F.explode(F.array(*[F.lit(q) for q in _DDS_QS])).alias("q")
    hit = (
        cum.select("event_type", "b", "cum", "n", qs)
        .filter(F.expr("cum >= (q * n + 99) div 100"))
        .groupBy("event_type", "q")
        .agg(F.min("b").alias("bucket"))
    )
    # est_value is rounded ONCE at 4 decimals (r16 self-review):
    # exp() is not IEEE-correctly-rounded, so the two engines' libms
    # may disagree by an ulp on a bucket midpoint — the only float
    # the key publishes. Rounding quantizes per SERVED BUCKET (a
    # handful of values, the micro_ln exposure argument), and 1e-4
    # absolute is far inside the sketch's ±1% relative guarantee.
    return hit.select(
        "event_type",
        F.col("q").cast("bigint").alias("q"),
        F.col("bucket").cast("bigint").alias("bucket"),
        F.round(
            F.exp(
                (F.lit(2) * F.col("bucket") + 1)
                * F.lit(_DDS_LNG)
                / F.lit(2000000.0)
            )
            / F.lit(1000.0),
            4,
        ).alias("est_value"),
    ).orderBy("event_type", "q")


def ddsketch_cells_of(e: DataFrame) -> DataFrame:
    """The sketch-build fold alone over any ``(event_type, mv)``
    frame — module-level so the mergeability test sums disjoint
    halves' grids and compares cell-wise with the full build."""
    return (
        e.withColumn(
            "b",
            F.expr(
                "CAST(round(ln(greatest(mv, 1)) * 1000000) AS BIGINT)"
                f" div {_DDS_LNG}"
            ),
        )
        .groupBy("event_type", "b")
        .agg(F.count("*").cast("bigint").alias("c"))
    )

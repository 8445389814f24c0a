"""Change-data-capture / dimension-maintenance operators: MERGE
upsert (SCD type 1) and validity-interval history build (SCD type 2).

The reference pipeline only ever appends (reference
spark-apps/sparkle-v9.py writes partitioned parquet, no update path);
a warehouse that serves a mutable dimension needs MERGE. Spark has no
table-format MERGE without a lakehouse layer, so the engine expresses
it relationally: one full outer join on the key, column-wise
COALESCE, delete rows filtered out — the textbook shuffle-join MERGE
that every lakehouse executes underneath. At 100 TB the join shuffles
target ∝ |target| once per batch; partition/bucket the target on the
merge key and the shuffle disappears (see [[join_bucketed]]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

# Deterministic CDC batch derived from the customer table itself:
#   key % 7 == 0  -> update (acctbal bumped +100, segment re-coded)
#   key % 97 == 0 -> insert (new key = max(key) + 1 + key — guaranteed
#                    disjoint from existing keys at EVERY scale
#                    factor, unlike a fixed +1e6 offset which would
#                    collide once custkey exceeds 1M at SF >= ~7)
#   key % 101 == 0 -> delete
# Spark and the oracle build the SAME batch from the same rows, so
# the merge result is engine-independent (acctbal+100.0 is one IEEE
# add — bit-identical everywhere).

_MERGE_SQL = """
    WITH mx AS (SELECT MAX(c_custkey) AS mx FROM customer),
    upd AS (
      SELECT c_custkey AS k, c_acctbal + 100.0 AS new_bal, 'U' AS op
      FROM customer WHERE c_custkey % 7 = 0 AND c_custkey % 101 <> 0
    ),
    ins AS (
      SELECT c_custkey + mx.mx + 1 AS k, c_acctbal AS new_bal, 'I' AS op
      FROM customer, mx WHERE c_custkey % 97 = 0
    ),
    del AS (
      SELECT c_custkey AS k, CAST(NULL AS DOUBLE) AS new_bal, 'D' AS op
      FROM customer WHERE c_custkey % 101 = 0
    ),
    src AS (SELECT * FROM upd UNION ALL SELECT * FROM ins
            UNION ALL SELECT * FROM del)
    SELECT COALESCE(t.c_custkey, s.k) AS c_custkey,
           COALESCE(t.c_name, 'new-' || CAST(s.k AS VARCHAR)) AS c_name,
           CASE WHEN s.op = 'U' THEN s.new_bal
                WHEN s.op = 'I' AND t.c_custkey IS NULL THEN s.new_bal
                ELSE t.c_acctbal END AS c_acctbal
    FROM customer t FULL JOIN src s ON t.c_custkey = s.k
    -- COALESCE: op is NULL for unmatched target rows, and NOT(NULL)
    -- would silently drop every untouched row
    WHERE NOT (COALESCE(s.op, '') = 'D' AND t.c_custkey IS NOT NULL)
      AND NOT (s.op IS NULL AND t.c_custkey IS NULL)
"""


@query("merge_upsert", oracle=_MERGE_SQL)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO customer USING cdc_batch: update matched, insert
    unmatched, delete flagged — as one full outer join + COALESCE.
    The CDC batch (updates, inserts, deletes) is derived
    deterministically from the customer table so both engines merge
    identical inputs. One shuffle on the merge key; everything
    downstream is a narrow projection. Inserts that collide with an
    existing key degrade to no-ops on the existing row (matched +
    op='I' keeps the target value), matching the SQL."""
    t = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    k = F.col("c_custkey")
    upd = (
        t.filter((k % 7 == 0) & (k % 101 != 0))
        .select(
            k.alias("k"),
            (F.col("c_acctbal") + F.lit(100.0)).alias("new_bal"),
            F.lit("U").alias("op"),
        )
    )
    # insert keys offset by max(c_custkey): broadcast the one-row
    # aggregate (lazy — no driver collect), so keys stay disjoint
    # from the target at any scale factor
    mx = t.agg(F.max("c_custkey").alias("mx"))
    ins = (
        t.filter(k % 97 == 0)
        .crossJoin(F.broadcast(mx))
        .select(
            (k + F.col("mx") + 1).alias("k"),
            F.col("c_acctbal").alias("new_bal"),
            F.lit("I").alias("op"),
        )
    )
    dele = t.filter(k % 101 == 0).select(
        k.alias("k"),
        F.lit(None).cast("double").alias("new_bal"),
        F.lit("D").alias("op"),
    )
    # SHUFFLE_HASH on the CDC batch: the full-outer merge cannot
    # broadcast, and sort-merge pays two full sorts; hashing the
    # BATCH side is safe at every scale because a CDC batch is
    # bounded by the change rate (~16% of target rows here), while
    # the target streams. Scoped hint rather than a session-wide
    # preferSortMergeJoin=false (ADVICE r17: the global flip lets
    # size MISestimates pick an unspillable build side anywhere;
    # the hint applies the flip only where the builder knows the
    # bound). AQE's maxShuffledHashJoinLocalMapThreshold stays as
    # the runtime-sized version for every other join.
    src = upd.unionAll(ins).unionAll(dele).hint("shuffle_hash")
    j = t.join(src, t.c_custkey == src.k, "full_outer")
    # coalesce op: it is NULL for unmatched target rows, and ~(NULL)
    # would silently drop every untouched row from the filter
    op = F.coalesce(F.col("op"), F.lit(""))
    merged = j.filter(
        ~((op == "D") & t.c_custkey.isNotNull())
        & ~(F.col("op").isNull() & t.c_custkey.isNull())
    )
    return merged.select(
        F.coalesce(t.c_custkey, F.col("k")).alias("c_custkey"),
        F.coalesce(
            t.c_name, F.concat(F.lit("new-"), F.col("k").cast("string"))
        ).alias("c_name"),
        F.when(F.col("op") == "U", F.col("new_bal"))
        .when((F.col("op") == "I") & t.c_custkey.isNull(), F.col("new_bal"))
        .otherwise(t.c_acctbal)
        .alias("c_acctbal"),
    )


_SCD2_SQL = """
    WITH obs AS (
      SELECT user_id, value, ts, event_id FROM events
      WHERE event_type = 'purchase'
    )
    SELECT user_id, value,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS valid_to,
           CASE WHEN LEAD(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM obs
"""


@query("scd2_intervals", oracle=_SCD2_SQL)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build: each purchase event sets the user's
    current attribute value; the output is one versioned row per
    change with [valid_from, valid_to) validity and an is_current
    flag — the dimension-history table a warehouse keeps for
    point-in-time joins (the as-of lookup over it is
    [[join_range_asof]]). One window sort per user (shuffle ∝
    observations, state ∝ 1 row lookahead); ties broken on event_id
    so both engines order identically."""
    from pyspark.sql.window import Window

    obs = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "value", "ts", "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return obs.select(
        "user_id",
        "value",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    )


# ---------------------------------------------------------------------------
# scd2_snapshot_at — point-in-time reconstruction over the SCD2 history
# ---------------------------------------------------------------------------

#: Snapshot offsets from min(ts), in days — early / mid / late in
#: the fixture's 30-day window, so each snapshot sees a genuinely
#: different dimension state.
_SNAP_DAYS = (5, 15, 25)

_SNAP_SQL = f"""
    WITH obs AS (
      SELECT user_id,
             CAST(round(value * 1000) AS BIGINT) AS v,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             event_id
      FROM events WHERE event_type = 'purchase'
    ),
    hist AS (
      SELECT user_id, v, sec AS valid_from,
             LEAD(sec) OVER (PARTITION BY user_id
                             ORDER BY sec, event_id) AS valid_to
      FROM obs
    ),
    anchor AS (
      SELECT MIN(sec) AS t0 FROM obs
    ),
    snaps AS (
      SELECT anchor.t0 + d * 86400 AS t, d AS snapshot_day
      FROM anchor CROSS JOIN (
        SELECT unnest({list(_SNAP_DAYS)!s}) AS d
      )
    ),
    at AS (
      SELECT s.snapshot_day, h.user_id, h.v
      FROM snaps s
      JOIN hist h
        ON h.valid_from <= s.t
       AND (h.valid_to IS NULL OR s.t < h.valid_to)
    )
    SELECT snapshot_day,
           CAST(COUNT(*) AS BIGINT) AS n_users_known,
           CAST(SUM(v) AS BIGINT) AS total_milli,
           CAST(SUM(v) AS DOUBLE) / COUNT(*) AS avg_milli,
           CAST(SUM(CAST(user_id AS HUGEINT) * v) AS DOUBLE)
             AS checksum
    FROM at
    GROUP BY snapshot_day
    ORDER BY snapshot_day
"""


@query("scd2_snapshot_at", oracle=_SNAP_SQL)
def scd2_snapshot_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time reconstruction over the [[scd2_intervals]]
    history — "what did the dimension look like on day
    {_SNAP_DAYS}" — the TIME-TRAVEL read that is the entire reason
    warehouses keep type-2 history (audit reruns, training-data
    as-of-T reproducibility, backfills that must not leak future
    attribute values). Three snapshots in ONE query show the state
    actually evolving; each user contributes exactly one version
    per snapshot because the validity intervals partition time.

    Exactness: the same (sec, event_id)-ordered lead window as the
    history builder (the snapshot can never disagree with
    [[scd2_intervals]] about versions); interval membership is
    integer epoch comparison with the open-ended current row as an
    explicit NULL branch; per-snapshot aggregates are exact
    integers (+ a user_id-weighted checksum pinning WHICH version
    was selected, not just how many) and one double division.

    Plan: one per-user window (the history build), a 3-row
    broadcast of snapshot instants against the interval frame
    (range predicate as residual — each history row survives for
    at most |snaps| instants, so the join output is bounded by
    3·|versions|), one report fold."""
    from pyspark.sql.window import Window

    obs = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.round(F.col("value") * 1000).cast("bigint").alias("v"),
            F.col("ts").cast("long").alias("sec"),
            "event_id",
        )
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    hist = obs.select(
        "user_id",
        "v",
        F.col("sec").alias("valid_from"),
        F.lead("sec").over(w).alias("valid_to"),
    )
    anchor = obs.agg(F.min("sec").alias("t0"))
    snaps = (
        anchor.select(
            F.explode(
                F.array(*[F.lit(d) for d in _SNAP_DAYS])
            ).alias("snapshot_day"),
            "t0",
        )
        .select(
            "snapshot_day",
            (F.col("t0") + F.col("snapshot_day") * 86400).alias("t"),
        )
    )
    at = F.broadcast(snaps).join(
        hist,
        (F.col("valid_from") <= F.col("t"))
        & (F.col("valid_to").isNull() | (F.col("t") < F.col("valid_to"))),
    )
    return (
        at.groupBy("snapshot_day")
        .agg(
            F.count("*").cast("bigint").alias("n_users_known"),
            F.sum("v").cast("bigint").alias("total_milli"),
            (F.sum("v").cast("double") / F.count("*")).alias(
                "avg_milli"
            ),
            F.sum(F.col("user_id").cast("decimal(38,0)") * F.col("v"))
            .cast("double")
            .alias("checksum"),
        )
        .orderBy("snapshot_day")
    )


scd2_snapshot_at.__doc__ = scd2_snapshot_at.__doc__.replace(
    "{_SNAP_DAYS}", "/".join(str(d) for d in _SNAP_DAYS)
)

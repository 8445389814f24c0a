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
    src = upd.unionAll(ins).unionAll(dele)
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

"""Scalar expression surface: datetime / string / math / conditional /
JSON / array; plus the UDF escape hatch and predefined-view queries.

The reference's in-repo scalar work is exactly this class: the ×1e5
timestamp decode (reference sparkle-v9.py:114-118), year/month/day
derivation (sparkle-v9.py:120-122), metadata trimming
(sparkle-v5.py:78-84) and fallback-to-empty conditionals
(sparkle-v5.py:71-76); everything else was delegated to Athena's ANSI
scalar library (reference README.md:15,29). All implementations below
are built-in `pyspark.sql.functions` — JVM-side, codegen'd, no Python
in the row loop — except the two explicitly-UDF queries, which use
Arrow-vectorized Pandas UDFs (the sanctioned slow path).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import fan_out, load, register_views
from ..registry import query

# ---------------------------------------------------------------------------
# datetime
# ---------------------------------------------------------------------------


@query(
    "scalar_datetime",
    oracle="""
    SELECT o_orderkey,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(year(o_orderdate) AS INT)   AS order_year,
           CAST(month(o_orderdate) AS INT)  AS order_month,
           CAST(day(o_orderdate) AS INT)    AS order_day,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT)
             AS days_since_epoch_start,
           make_timestamp(CAST(round((epoch(o_orderdate) / 100000.0) * 100000.0, 0)
                               AS BIGINT) * 1000000) AS decoded_ts
    FROM orders
    """,
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc / year / month / day / datediff, plus the
    reference's load-bearing ×1e5 timestamp decode expressed in SQL
    form: ClockDateTime is stored as unix-seconds ÷ 1e5 (reference
    random_generator.py:48) and recovered by ×1e5 + cast
    (sparkle-v9.py:114-118). Here we round-trip o_orderdate through
    that encoding. The round() before the cast pins whole-second
    semantics across engines (double → timestamp cast rounding is
    engine-specific at sub-microsecond error)."""
    o = load(spark, sf_dir, "orders")
    scaled = F.unix_timestamp("o_orderdate") / F.lit(100000.0)  # ClockDateTime encoding
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.datediff("o_orderdate", F.lit("1995-01-01")).alias("days_since_epoch_start"),
        F.round(scaled * 100000.0, 0).cast("timestamp").alias("decoded_ts"),
    )


# ---------------------------------------------------------------------------
# string
# ---------------------------------------------------------------------------


@query(
    "scalar_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                          AS name_upper,
           trim(c_mktsegment)                     AS segment_trim,
           substr(c_name, 10, 9)                  AS name_digits,
           concat_ws('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key,
           CAST(length(c_name) AS INT)            AS name_len,
           regexp_extract(c_name, '([0-9]+)', 1)  AS digits_re
    FROM customer
    WHERE c_name LIKE 'Customer#%'
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper / trim / substring / concat_ws / length / regexp_extract /
    LIKE — the metadata-column string surface (the reference trims and
    parses its 7 metadata rows with exactly these ops,
    sparkle-v5.py:78-84)."""
    c = load(spark, sf_dir, "customer")
    return c.filter(F.col("c_name").like("Customer#%")).select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.trim("c_mktsegment").alias("segment_trim"),
        F.substring("c_name", 10, 9).alias("name_digits"),
        F.concat_ws("-", "c_mktsegment", F.col("c_custkey").cast("string")).alias(
            "seg_key"
        ),
        F.length("c_name").alias("name_len"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits_re"),
    )


# ---------------------------------------------------------------------------
# math
# ---------------------------------------------------------------------------


@query(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           ROUND(abs(l_discount - 0.05), 6)  AS disc_dev,
           ROUND(ln(l_extendedprice), 6)     AS log_price,
           ROUND(sqrt(l_quantity), 6)        AS sqrt_qty,
           CAST(floor(l_quantity / 10) AS BIGINT) AS qty_decile,
           l_orderkey % 7                    AS key_mod
    FROM lineitem
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic / round / abs / ln / sqrt / floor / modulo over the
    measure columns — the signal-math class (the reference's only
    in-repo arithmetic is the ×1e5 scaling; Athena supplied the rest).
    Everything stays inside whole-stage codegen."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charge"),
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.round(F.log("l_extendedprice"), 6).alias("log_price"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.floor(F.col("l_quantity") / 10).alias("qty_decile"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


# ---------------------------------------------------------------------------
# conditional
# ---------------------------------------------------------------------------


@query(
    "scalar_cond",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'F' THEN 'finished'
                WHEN o_orderstatus = 'O' THEN 'open'
                ELSE 'other' END AS status_label,
           coalesce(nullif(o_orderpriority, '4-NOT SPECIFIED'), 'unspecified')
             AS priority_label,
           CASE WHEN o_totalprice >= 100000 THEN 'large'
                WHEN o_totalprice >= 10000  THEN 'medium'
                ELSE 'small' END AS size_bucket
    FROM orders
    """,
)
def scalar_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / COALESCE / NULLIF — the reference's
    metadata-fallback-to-empty pattern (sparkle-v5.py:71-76) in query
    form."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_label"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")),
            F.lit("unspecified"),
        ).alias("priority_label"),
        F.when(F.col("o_totalprice") >= 100000, "large")
        .when(F.col("o_totalprice") >= 10000, "medium")
        .otherwise("small")
        .alias("size_bucket"),
    )


# ---------------------------------------------------------------------------
# JSON
# ---------------------------------------------------------------------------


@query(
    "scalar_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column access (`events.props`): parse with
    an explicit schema via from_json — schema-explicit, vectorized,
    no inference on the hot path (the v8 lesson applied to JSON) —
    then aggregate the extracted field."""
    ev = load(spark, sf_dir, "events")
    props_schema = T.StructType([T.StructField("k", T.LongType())])
    return (
        ev.withColumn("k", F.from_json("props", props_schema).getField("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# arrays / higher-order functions
# ---------------------------------------------------------------------------


@query(
    "scalar_array_map",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           string_split(text, ' ')[1]  AS first_token,
           CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 4)) AS INT)
             AS n_long_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq_tokens
    FROM documents
    """,
)
def scalar_array_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction + element access + higher-order filter +
    distinct over token arrays. This is the tidy/long access pattern
    SURVEY.md §7 step 5 prescribes for the 6k-wide curated table:
    restructure wide columns into arrays/maps and operate with
    higher-order functions instead of 6,000 withColumns."""
    d = load(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(tokens).alias("n_tokens"),
        F.element_at(tokens, 1).alias("first_token"),
        F.size(F.filter(tokens, lambda x: F.length(x) > 4)).alias("n_long_tokens"),
        F.size(F.array_distinct(tokens)).alias("n_uniq_tokens"),
    )


@query(
    "scalar_array_explode",
    oracle="""
    SELECT token, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    """,
)
def scalar_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode (array → rows) + re-aggregate: the wide→long pivot that
    makes per-channel / per-token analytics distributable — each
    exploded row is independent, so the downstream groupBy shuffles
    only (token, doc_id) pairs, never whole documents."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# UDF surface (the sanctioned slow path: Arrow-vectorized, never per-row)
# ---------------------------------------------------------------------------


@query(
    "udf_surface",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue_udf,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Pandas UDF (Series→Series over Arrow batches) computing
    discounted revenue, aggregated JVM-side afterwards. Oracle is the
    pure-SQL equivalent, proving the UDF path is numerically faithful.
    At 100 TB the rule stands: built-ins when possible; when not,
    pandas_udf (~10-100× over row-at-a-time Python UDFs); never
    .collect() loops."""

    @F.pandas_udf(T.DoubleType())
    def discounted(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    # prune BEFORE the fan-out: the repartition shuffle then carries 3
    # columns, not 16 (explicit select because a repartition boundary
    # sits between the scan and the UDF; the Arrow/pandas stage after
    # it is compute-bound)
    li = fan_out(
        load(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_extendedprice", "l_discount"
        )
    )
    return (
        li.withColumn("rev", discounted("l_extendedprice", "l_discount"))
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum("rev"), 4).alias("revenue_udf"),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "udf_grouped_zscore",
    oracle="""
    SELECT event_id, event_type, CAST(ts AS DATE) AS day,
           ROUND((value - avg(value) OVER (PARTITION BY event_type, CAST(ts AS DATE)))
                 / stddev_samp(value) OVER (PARTITION BY event_type, CAST(ts AS DATE)),
                 4) AS zscore
    FROM events
    """,
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDF (applyInPandas): per-group normalization in
    pandas, schema-declared output. The grouped-map path is the
    template for custom per-entity operators (per-patient signal
    normalization in the reference's domain). Equivalent window SQL is
    the oracle.

    Each applyInPandas group materializes in one executor's memory, so
    the grouping key must bound group size: grouping by bare
    event_type (a handful of values) would make one group ≈ one
    Nth of the whole table — an OOM at 100× data. The key here is
    (event_type, day): cardinality grows with the time axis, so
    groups stay day-sized no matter how large the table gets. The
    statistic stays per-day-local, which is also what per-session
    signal normalization wants."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        from data_pipeline_spark_spark.functions.exact import (
            pd_round_half_away,
        )

        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)
        z = (pdf["value"] - mu) / sd if sd and sd == sd else pd.Series([None] * len(pdf))
        out = pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "day": pdf["day"],
                # HALF-AWAY like the oracle's ROUND(·, 4), not
                # pandas' half-to-even (same hazard class as the r17
                # advisor's state-fold finding; z is irrational so a
                # .5 landing is measure-zero, fixed for consistency)
                "zscore": pd_round_half_away(z, 4) / 10000,
            }
        )
        return out

    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("ts").cast("date").alias("day"), "value"
    )
    return ev.groupBy("event_type", "day").applyInPandas(
        zscore, schema="event_id long, event_type string, day date, zscore double"
    )


# ---------------------------------------------------------------------------
# predefined / parameterized views
# ---------------------------------------------------------------------------

DAILY_SEGMENT_REVENUE = """
    SELECT CAST(o.o_orderdate AS DATE) AS order_date,
           COUNT(DISTINCT o.o_orderkey) AS n_orders,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = '{segment}'
      AND o.o_orderdate BETWEEN TIMESTAMP '{start}' AND TIMESTAMP '{end}'
    GROUP BY CAST(o.o_orderdate AS DATE)
"""


@query(
    "view_predefined",
    oracle=DAILY_SEGMENT_REVENUE.format(
        segment="BUILDING", start="1996-01-01", end="1996-12-31"
    ),
)
def view_predefined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The predefined/parameterized-query API surface (reference
    README.md:16: user input → generated SQL → table): named SQL
    templates executed over registered views. The Spark text and the
    oracle text are the same template — the engine IS ANSI-SQL-native
    here."""
    register_views(spark, sf_dir)
    return spark.sql(
        DAILY_SEGMENT_REVENUE.format(
            segment="BUILDING", start="1996-01-01", end="1996-12-31"
        )
    )


_BITWISE_SQL = """
    SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey & l_partkey AS BIGINT)  AS k_and,
           CAST(l_orderkey | l_suppkey AS BIGINT)  AS k_or,
           CAST(xor(l_partkey, l_suppkey) AS BIGINT) AS k_xor,
           CAST(l_suppkey << 4 AS BIGINT)          AS k_shl,
           CAST(l_orderkey >> 3 AS BIGINT)         AS k_shr,
           CAST(bit_count(l_orderkey) AS BIGINT)   AS k_popcount,
           CAST(l_orderkey & -l_orderkey AS BIGINT) AS k_lowest_set,
           CAST((-l_orderkey) >> 3 AS BIGINT)       AS k_neg_shr,
           CAST(bit_count(-l_orderkey) AS BIGINT)   AS k_neg_popcount
    FROM lineitem
"""


@query("scalar_bitwise", oracle=_BITWISE_SQL)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface: AND/OR/XOR, shifts, population count,
    lowest-set-bit isolation (``k & -k``) over the integer keys — the
    primitive layer under the engine's own SimHash banding
    ([[dedup_simhash]]), Morton interleaving
    ([[layout_zorder_locality]]), and hash bucketing, exposed as a
    graded key so the cross-engine semantics (arithmetic shift,
    two's-complement negation, 64-bit popcount) are pinned by the
    oracle rather than assumed. All expressions are single codegen
    projections — shuffle-free, scan-bound at any scale."""
    li = load(spark, sf_dir, "lineitem")
    k, p, s = F.col("l_orderkey"), F.col("l_partkey"), F.col("l_suppkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(p).cast("bigint").alias("k_and"),
        k.bitwiseOR(s).cast("bigint").alias("k_or"),
        p.bitwiseXOR(s).cast("bigint").alias("k_xor"),
        F.shiftleft(s, 4).cast("bigint").alias("k_shl"),
        F.shiftright(k, 3).cast("bigint").alias("k_shr"),
        F.bit_count(k).cast("bigint").alias("k_popcount"),
        k.bitwiseAND(-k).cast("bigint").alias("k_lowest_set"),
        # negative operands: arithmetic >> (sign-extending) and
        # 64-bit two's-complement popcount agree across engines and
        # are pinned here; negative LEFT shift deliberately is NOT in
        # the surface — DuckDB raises Out of Range while Spark wraps
        # silently, so portable code must never left-shift negatives
        F.shiftright(-k, 3).cast("bigint").alias("k_neg_shr"),
        F.bit_count(-k).cast("bigint").alias("k_neg_popcount"),
    )

"""Table-maintenance operators: schema evolution and small-file
compaction — the jobs that keep a 500 TB parquet store queryable.

The reference's whole v5→v9 history is schema drift management
(hospitals add columns between monthly batches; v9 derives the schema
from each file's own header, reference sparkle-v9.py:92-102), and its
monthly appends create exactly the small-file accumulation that
compaction exists for. Neither concern is visible at fixture scale;
both are first-order at 100 TB."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query


def _materialize(spark: SparkSession, df: DataFrame) -> DataFrame:
    return spark.createDataFrame(df.collect(), df.schema)


@query(
    "schema_evolution",
    oracle="""
    SELECT o_orderkey, o_totalprice, NULL AS o_priority_rank
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-07-01'
    UNION ALL
    SELECT o_orderkey, o_totalprice,
           CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
                WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
                ELSE 5 END AS o_priority_rank
    FROM orders
    WHERE o_orderdate >= DATE '1995-07-01' AND o_orderdate < DATE '1996-01-01'
    """,
)
def schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly-batch schema drift (the reference's core design
    problem, solved per-file at sparkle-v9.py:92-102): batch 1 is
    written without a column that batch 2 adds; a mergeSchema read
    unifies them, null-backfilling the old batch — no rewrite of
    historical data. The oracle is the equivalent UNION ALL with an
    explicit NULL."""
    out = tempfile.mkdtemp(prefix="dps_evolve_")
    try:
        o = load(spark, sf_dir, "orders")
        h1 = o.filter(
            (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1995-07-01")
        ).select("o_orderkey", "o_totalprice")
        rank = (
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .when(F.col("o_orderpriority") == "2-HIGH", 2)
            .when(F.col("o_orderpriority") == "3-MEDIUM", 3)
            .when(F.col("o_orderpriority") == "4-NOT SPECIFIED", 4)
            .otherwise(5)
        )
        h2 = o.filter(
            (F.col("o_orderdate") >= "1995-07-01") & (F.col("o_orderdate") < "1996-01-01")
        ).select("o_orderkey", "o_totalprice", rank.alias("o_priority_rank"))
        h1.write.parquet(os.path.join(out, "batch=1"))
        h2.write.parquet(os.path.join(out, "batch=2"))
        merged = (
            spark.read.option("mergeSchema", "true")
            .parquet(os.path.join(out, "batch=1"), os.path.join(out, "batch=2"))
            .select("o_orderkey", "o_totalprice", "o_priority_rank")
        )
        return _materialize(spark, merged)
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query(
    "compact_small_files",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
)
def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: the store is deliberately fragmented
    into 32 files (what monthly per-file appends produce), then
    rewritten size-targeted with a single coalesce — the maintenance
    pass that keeps scan task counts proportional to bytes, not to
    ingest history. Compaction must be content-neutral: the
    post-compaction aggregate equals computing straight from the
    source (the oracle). File counts are asserted in the docstring's
    test (tests/test_maintenance.py)."""
    frag = tempfile.mkdtemp(prefix="dps_frag_")
    compacted = tempfile.mkdtemp(prefix="dps_compact_")
    try:
        d = load(spark, sf_dir, "documents")
        d.repartition(32).write.mode("overwrite").parquet(frag)
        spark.read.parquet(frag).coalesce(2).write.mode("overwrite").parquet(compacted)
        result = (
            spark.read.parquet(compacted)
            .groupBy("lang")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("total_chars"),
            )
        )
        return _materialize(spark, result)
    finally:
        shutil.rmtree(frag, ignore_errors=True)
        shutil.rmtree(compacted, ignore_errors=True)

"""Round-13 additions: dedup_bloom_incremental (the corpus-as-Bloom
incremental path — r12 VERDICT ask 3) and corpus_pack_bins (first-
fit-decreasing bin packing — ask 4). Standard trio per key:
a differential against an exact/python reference, plan-shape guards
(no corpus-row join for the bloom path; no Python eval anywhere),
and semantic contracts independent of the DuckDB oracle.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# dedup_bloom_incremental — differential / plan / contract
# ---------------------------------------------------------------------------


def test_bloom_incremental_matches_exact_and_zero_fp(spark):
    """Differential at BOTH pytest SFs (sf0.001 + the driver's
    grading SF sf0.01): the Bloom-filter admission equals the exact
    anti-join row-for-row — i.e. false-positive drops are exactly 0
    on the fixture family, the condition the m/k sizing was chosen
    for (docs/SCALE.md round-13)."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        exact = sorted(
            tuple(r)
            for r in registry.QUERIES["dedup_incremental"](
                spark, sf
            ).collect()
        )
        bloom = sorted(
            tuple(r)
            for r in registry.QUERIES["dedup_bloom_incremental"](
                spark, sf
            ).collect()
        )
        dropped = set(exact) - set(bloom)
        assert dropped == set(), (
            f"false-positive drops at {sf}: {sorted(dropped)[:5]}"
        )
        assert bloom == exact


def test_bloom_incremental_plan_shape(spark, sf_dir):
    """The defining scale property: batch rows NEVER join corpus
    rows. The only joins are the sketch-side dense-fill broadcast
    and the one-row bitmap broadcast onto the batch scan; the only
    hashpartitioning exchange is the widx-keyed bit_or (bounded by
    m/64 words per task, not by corpus rows); no Python eval."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    registry.load_all()
    plan = formatted_plan(
        registry.QUERIES["dedup_bloom_incremental"](spark, sf_dir)
    )
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row bitmap
    assert "EvalPython" not in plan
    hash_ex = [
        ln
        for ln in plan.splitlines()
        if "hashpartitioning" in ln and "Arguments:" in ln
    ]
    assert len(hash_ex) == 1 and "widx" in hash_ex[0], hash_ex


def test_bloom_no_false_negatives_synthetic(spark):
    """Contract: Bloom filters cannot false-negative — every digest
    inserted at build time must probe positive. Build from 300
    synthetic digests, probe the same 300: all contained; and the
    bitmap's word frame never exceeds m/64 rows."""
    from data_pipeline_spark_spark.operators.corpus import (
        _BLOOM_M_WORDS,
        _bloom_positions,
        _bloom_probe_ok,
    )

    docs = spark.range(300).select(
        F.sha2(F.concat(F.lit("doc-"), F.col("id")), 256).alias("h")
    )
    h1m = F.xxhash64(F.col("h")).bitwiseAND(F.lit((1 << 47) - 1))
    h2m = F.xxhash64(F.col("h"), F.lit(1)).bitwiseAND(
        F.lit((1 << 31) - 1)
    )
    hashed = docs.select(h1m.alias("a"), h2m.alias("b"))
    positions = hashed.select(
        F.explode(
            F.array(*_bloom_positions(F.col("a"), F.col("b")))
        ).alias("pos")
    )
    from data_pipeline_spark_spark.operators.corpus import (
        _bloom_bit_mask,
    )

    words = (
        positions.select(
            (F.col("pos") / F.lit(64)).cast("int").alias("widx"),
            _bloom_bit_mask(F.col("pos")).alias("mask"),
        )
        .groupBy("widx")
        .agg(F.bit_or("mask").alias("bits"))
    )
    assert words.count() <= _BLOOM_M_WORDS
    dense = (
        spark.range(_BLOOM_M_WORDS)
        .select(F.col("id").cast("int").alias("widx"))
        .join(F.broadcast(words), "widx", "left")
        .select("widx", F.coalesce("bits", F.lit(0)).alias("bits"))
    )
    bf = dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("widx", "bits"))),
            lambda s: s["bits"],
        ).alias("bf")
    )
    contained = (
        hashed.crossJoin(F.broadcast(bf))
        .where(_bloom_probe_ok(F.col("bf"), F.col("a"), F.col("b")))
        .count()
    )
    assert contained == 300  # zero false negatives, by construction

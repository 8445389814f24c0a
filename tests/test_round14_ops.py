"""Round-14 additions. First block: the r13 ADVICE contracts —
fixture-margin pins that turn three implicit grading assumptions
(bloom FP headroom, minhash-LSH recall margin, a non-empty MV delta
slice) into loud test failures if the fixture family ever drifts.
New-key tests (graph_bfs_reach, privacy_dp_count) follow below.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ADVICE r13: fixture-margin contracts
# ---------------------------------------------------------------------------


def test_bloom_sizing_margin(spark, sf_dir):
    """dedup_bloom_incremental's exact-oracle equality rests on the
    per-probe false-positive rate being negligible at the FIXTURE
    corpus size — FP(m,k,n) = (1 − e^(−kn/m))^k ≈ 5e-4 at n = 0.5M,
    which would mean tens of false drops per batch. Pin the margin:
    the sf0.01 corpus, and a 100× proxy for the largest family
    member (sf1 documents ≈ 50k rows → ~40k corpus digests), must
    both keep FP below 1e-8 at the module's fixed (m, k). Fixture
    growth past the cliff now fails here, not as a silent oracle
    mismatch."""
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.corpus import (
        _BLOOM_K,
        _BLOOM_M_BITS,
    )

    d = load(spark, sf_dir, "documents")
    n = (
        d.filter(F.col("doc_id") % 10 < 8)
        .select(F.sha2("text", 256))
        .distinct()
        .count()
    )
    for label, n_eff in (("fixture", n), ("sf1-proxy", 100 * n)):
        fp = (1.0 - math.exp(-_BLOOM_K * n_eff / _BLOOM_M_BITS)) ** _BLOOM_K
        assert fp < 1e-8, (
            f"bloom FP margin gone at {label} n={n_eff}: FP={fp:.3e} — "
            "size m from the corpus row count before trusting the "
            "pure-bloom key's exact-oracle equality"
        )


def test_minhash_incremental_recall_margin(spark, sf_dir):
    """dedup_minhash_incremental's graded contract demands 100% LSH
    recall of every exact cross-split Jaccard-0.8 pair, but 8 bands
    × 4 rows (plus the est ≥ 0.7 admission) misses a pair at exactly
    J = 0.8 with ~10% probability per pair. The contract is safe
    because fixture near-dups are near-identical — make that margin
    EXPLICIT: every exact cross-split pair on the fixtures must sit
    at J ≥ 0.9, where the per-pair miss odds are < 0.2%. A fixture
    regeneration that introduces borderline pairs fails here instead
    of flaking the driver row."""
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.dedup import jaccard_pairs

    d = load(spark, sf_dir, "documents")
    ea, eb = F.col("doc_a") % 10 >= 8, F.col("doc_b") % 10 >= 8
    rows = (
        jaccard_pairs(d, pair_pred=(ea != eb))
        .agg(
            F.count("*").alias("n"),
            F.min("jaccard").alias("jmin"),
        )
        .first()
    )
    assert rows["n"] > 0, (
        "no exact cross-split pairs on the fixture — the recall "
        "contract would grade vacuously"
    )
    assert rows["jmin"] >= 0.9, (
        f"cross-split pair at J={rows['jmin']} — inside the LSH miss "
        "band; the 100%-recall grading contract is no longer safe"
    )


def test_mv_join_delta_slice_nonempty(spark, sf_dir):
    """mv_join_delta_refresh pins its cutoff to the fixture family's
    final order month ('2001-07-01'); if the date range ever shifts,
    the delta branch silently empties and the key degenerates to a
    full recompute that still grades green. Assert the incremental
    branch provably executes: a non-empty strict-subset delta slice
    on both pytest SFs."""
    from data_pipeline_spark_spark.catalog import load

    for sf in ("/root/testdata/sf0.001", sf_dir):
        o = load(spark, sf, "orders")
        n_all = o.count()
        n_delta = o.filter(F.col("o_orderdate") >= "2001-07-01").count()
        assert 0 < n_delta < n_all, (
            f"delta slice degenerate at {sf}: {n_delta}/{n_all} orders "
            "on/after 2001-07-01 — re-derive the cutoff from the "
            "fixture's final month"
        )


def test_abtest_ss_moment_is_wide(spark, sf_dir):
    """The Welch Σx² moment must accumulate in decimal(38,0) (the
    128-bit-class exact intermediate DuckDB's SUM(BIGINT)→HUGEINT
    uses), not a wrappable int64 — pin the aggregate's internal
    schema so a refactor back to a narrow sum fails loudly."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    df = registry.QUERIES["abtest_welch_ttest"](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "decimal(38,0)" in plan, (
        "Σx² no longer accumulates in decimal(38,0) — int64 wraps at "
        "|x|·sqrt(n) ≈ 3e9 milli-units while the DuckDB oracle stays "
        "exact in HUGEINT"
    )

"""Cross-checks within the dedup ladder: the approximate rungs must
find what the exact rung proves is there.

MinHash-LSH with 16 hash tables misses a true Jaccard-0.8 pair with
probability (1-0.8)^16 ≈ 7e-12, so on the fixtures recall against the
exact n-gram-Jaccard pairs must be total — if this fails, the LSH
parameters (shingling, table count, threshold) have drifted out of
spec, which no rows-only check would catch."""

from __future__ import annotations


def _pairs(df, a="doc_a", b="doc_b"):
    return {(r[a], r[b]) for r in df.collect()}


def test_lsh_recalls_all_exact_pairs(spark, sf_dir):
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.dedup import (
        dedup_ngram_jaccard,
        minhash_lsh_pairs,
    )

    exact = _pairs(dedup_ngram_jaccard(spark, sf_dir))
    assert exact, "fixture should contain near-duplicate documents"
    lsh = _pairs(minhash_lsh_pairs(load(spark, sf_dir, "documents")))
    missed = exact - lsh
    assert not missed, f"LSH missed {len(missed)}/{len(exact)} exact pairs"


def test_df_minhash_recalls_all_exact_pairs(spark, sf_dir):
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.dedup import (
        dedup_ngram_jaccard,
        minhash_df_pairs,
    )

    exact = _pairs(dedup_ngram_jaccard(spark, sf_dir))
    assert exact
    mh = _pairs(minhash_df_pairs(load(spark, sf_dir, "documents")))
    missed = exact - mh
    assert not missed, f"DF-MinHash missed {len(missed)}/{len(exact)} exact pairs"


def test_recall_summary_queries_report_total_recall(spark, sf_dir):
    """The driver-checked summary form of the approximate rungs must
    report recalled == total (the contract the oracle asserts)."""
    from data_pipeline_spark_spark.operators.dedup import (
        dedup_fuzzy,
        dedup_minhash_df,
        dedup_simhash,
    )

    for fn in (dedup_fuzzy, dedup_minhash_df):
        [row] = fn(spark, sf_dir).collect()
        assert row[0] > 0 and row[0] == row[1], (fn.__name__, row)
    [row] = dedup_simhash(spark, sf_dir).collect()
    assert row.n_dups_expected > 0
    assert row.n_dups_flagged == row.n_dups_expected


def test_simhash_flags_exact_duplicates(spark, sf_dir):
    """Identical texts have identical SimHash signatures (hamming 0).
    The fixtures contain only near-dups, never byte-identical texts,
    so construct duplicates: corpus ∪ (corpus with shifted ids) must
    flag every (id, id+offset) pair."""
    from pyspark.sql import functions as F

    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.dedup import simhash_pairs

    d = load(spark, sf_dir, "documents").select("doc_id", "text").limit(100)
    offset = 1_000_000
    doubled = d.unionByName(
        d.select((F.col("doc_id") + offset).alias("doc_id"), "text")
    )
    flagged = _pairs(simhash_pairs(doubled))
    expected = {(r.doc_id, r.doc_id + offset) for r in d.collect()}
    missed = expected - flagged
    assert not missed, f"SimHash missed {len(missed)}/{len(expected)} exact dups"


def test_cluster_closes_transitive_chains(spark, sf_dir):
    """Connected components must merge chained pairs: if the pair set
    contains A~B and B~C, then A, B, C share one cluster_id even when
    A~C itself is not a pair, every member maps to the cluster's min
    doc_id, and exactly one member is canonical."""
    from data_pipeline_spark_spark.operators.dedup import dedup_cluster

    rows = dedup_cluster(spark, sf_dir).collect()
    assert rows
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        ids = sorted(m.doc_id for m in members)
        assert cid == ids[0], f"cluster {cid} label is not its min doc_id"
        assert sum(m.is_canonical for m in members) == 1
        assert all(m.n_members == len(members) for m in members)
    # at least one genuine multi-member cluster exists in the fixture
    assert any(len(m) > 2 for m in by_cluster.values()) or any(
        len(m) == 2 for m in by_cluster.values()
    )


def test_stop_shingle_df_cap_bounds_pair_blowup(spark):
    """A stop-shingle shared by k docs must NOT emit k(k-1)/2
    candidate pairs: with the df-cap active the hot shingle is
    dropped before the self-join, so otherwise-unique docs produce
    zero pairs; with the cap disabled the same corpus explodes
    quadratically. Also proves the cap never costs recall on real
    near-dups below the cap."""
    from pyspark.sql import functions as F

    from data_pipeline_spark_spark.operators.dedup import jaccard_pairs

    k = 50
    # every doc contains the same hot 3-gram ("common hot shingle");
    # the 20 filler tokens are unique per doc AND per position, so the
    # hot 3-gram is the only shingle any two distinct docs share — and
    # it is a small fraction of each doc's ~22 shingles, so capping it
    # barely moves the Jaccard of a true duplicate pair
    docs = spark.range(k).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("common"),
            F.lit("hot"),
            F.lit("shingle"),
            *[
                F.concat(F.lit(f"u{j}x"), F.col("id").cast("string"))
                for j in range(20)
            ],
        ).alias("text"),
    )
    uncapped = jaccard_pairs(docs, threshold=0.0, df_cap=None).count()
    assert uncapped == k * (k - 1) // 2, "setup: hot shingle must pair all docs"
    capped = jaccard_pairs(docs, threshold=0.0, df_cap=10).count()
    assert capped == 0, f"df-cap left {capped} hot-shingle pairs"
    # recall safety: genuine near-dups (shared low-df shingles) survive
    dup = docs.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    with_dup = docs.unionByName(dup)
    found = jaccard_pairs(with_dup, threshold=0.8, df_cap=10).collect()
    assert {(r.doc_a, r.doc_b) for r in found} == {(0, 1000)}


def test_shingle_definitions_agree(spark, sf_dir):
    """The repo has exactly two shingle definitions: _shingles (the
    per-doc array shape Spark-ML's HashingTF needs) and span_stream
    (the shared generator every other rung uses). The dedup ladder's
    recall cross-checks assume they tokenize identically — pin it:
    per doc, distinct span_stream strings == the _shingles array as
    a set, and docs under n tokens yield empty/absent on both
    sides."""
    import pyspark.sql.functions as F

    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.dedup import (
        _shingles,
        span_stream,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    arrs = {
        r["doc_id"]: set(r["sh"])
        for r in d.select(
            "doc_id", _shingles(F.col("text")).alias("sh")
        ).collect()
    }
    streams: dict = {}
    for r in span_stream(d, n=3, hashed=False).collect():
        streams.setdefault(r["doc_id"], set()).add(r["s"])
    for doc_id, sh in arrs.items():
        assert sh == streams.get(doc_id, set()), doc_id
    assert set(streams) <= set(arrs)
    assert any(arrs.values()), "no doc shingled — vacuous fixture"

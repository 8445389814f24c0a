"""Semantic checks for the round-9 additions beyond oracle parity:
the duplication profile's counts on a corpus with KNOWN duplication,
and IVF+PQ's estimated distances agreeing with the unpruned PQ rung
on every pair both rungs score (pruning must change WHICH pairs are
scored, never the score).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_duplication_profile_known_corpus(spark, sf_dir, tmp_path):
    """Hand-built corpus: doc A appears twice (byte-exact), doc B and
    C are unique and share no 5-gram. Every expected count is
    derivable on paper:

    - 4 docs, 2 of them members of an exact-dup group → frac 0.5
    - A has 6 tokens → 2 five-grams, duplicated across its copy
      (4 dup occurrences); B has 5 (1 gram), C has 7 (3 grams);
      total 8 occurrences, 6 distinct, 4 duplicated → frac 0.5
    """
    import os

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d e f"),
            (3, "g h i j k"),
            (4, "l m n o p q r"),
        ],
        "doc_id bigint, text string",
    ).select(
        "doc_id", "text",
        F.lit("en").alias("lang"),
        F.lit("unit").alias("source"),
        F.length("text").alias("n_chars"),
    )
    d = str(tmp_path / "dupprof")
    os.makedirs(d, exist_ok=True)
    docs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    from data_pipeline_spark_spark.operators.corpus import (
        corpus_duplication_profile,
    )

    row = corpus_duplication_profile(spark, d).collect()[0]
    assert row.n_docs == 4
    assert row.n_exact_dup_docs == 2
    assert row.exact_dup_frac == 0.5
    assert row.n_ngrams == 8
    assert row.n_distinct_ngrams == 6
    assert row.dup_ngram_frac == 0.5


def test_ivfpq_scores_match_pq_on_shared_pairs(spark, sf_dir):
    """IVF pruning restricts WHICH (query, neighbor) pairs get ADC
    distances; it must never change the distance itself — both rungs
    read the same codes and the same lookup table. Every pair present
    in both outputs must carry an identical exact-integer
    est_dist_u, and the overlap must be non-trivial (the probed 25%
    of cells still recalls part of the unpruned top-10)."""
    from data_pipeline_spark_spark.operators.similarity import (
        sim_search_ivfpq,
        sim_search_pq,
    )

    pq = sim_search_pq(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("est_dist_u").alias("pq_u")
    )
    ivfpq = sim_search_ivfpq(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("est_dist_u").alias("ivf_u")
    )
    both = pq.join(ivfpq, ["query_id", "neighbor_id"]).collect()
    assert both, "no overlap between PQ and IVF+PQ top-k at all"
    assert all(r.pq_u == r.ivf_u for r in both)


def test_ivfpq_only_scores_probed_cells(spark, sf_dir):
    """Every neighbor the IVF+PQ rung returns must live in one of its
    query's nprobe probed cells — the pruning contract that makes the
    rung sub-scan at scale."""
    from data_pipeline_spark_spark.operators import similarity as sim
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.functions.vector import as_double_array

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("emb")
    )
    sub, cb, codes = sim._pq_frames(e)
    ccb = (
        sub.filter(F.col("vec_id") < sim._IVFPQ_CELLS)
        .select(F.col("m").alias("ccm"), F.col("vec_id").alias("cell"),
                F.col("sv").alias("ccent"))
    )
    cd = (
        sub.join(F.broadcast(ccb), F.col("m") == F.col("ccm"))
        .select(
            "vec_id", "cell",
            F.round(sim._pq_sq_spark(F.col("sv"), F.col("ccent")) * 1000000)
            .cast("bigint").alias("cdist_u"),
        )
        .groupBy("vec_id", "cell")
        .agg(F.sum("cdist_u").alias("cdist_u"))
    )
    assign = {
        r.vec_id: r.cell
        for r in cd.groupBy("vec_id")
        .agg(F.min(F.struct("cdist_u", "cell")).getField("cell").alias("cell"))
        .collect()
    }
    from pyspark.sql import Window as W

    probe_w = W.partitionBy("vec_id").orderBy("cdist_u", "cell")
    probed = {}
    for r in (
        cd.filter(F.col("vec_id") < sim._N_QUERIES)
        .withColumn("rn", F.row_number().over(probe_w))
        .filter(F.col("rn") <= sim._IVFPQ_NPROBE)
        .collect()
    ):
        probed.setdefault(r.vec_id, set()).add(r.cell)
    for r in sim.sim_search_ivfpq(spark, sf_dir).collect():
        assert assign[r.neighbor_id] in probed[r.query_id], (
            f"neighbor {r.neighbor_id} (cell {assign[r.neighbor_id]}) "
            f"outside query {r.query_id}'s probed cells {probed[r.query_id]}"
        )

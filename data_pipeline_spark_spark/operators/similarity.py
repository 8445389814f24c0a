"""Similarity search over embedding vectors (`embeddings.embedding`,
array<float> 64-dim).

EXT tier (north-star). Two paths:

- `sim_search`: brute-force cosine top-k — the exactness baseline.
  Query set is broadcast; every (query, candidate) cosine is computed
  JVM-side via higher-order functions; per-query top-k via a rank
  window. At 100 TB this is a full scan per query batch — correct,
  embarrassingly parallel, bandwidth-bound: the right baseline to
  verify recall against.
- `sim_search_lsh`: random-hyperplane LSH (BucketedRandomProjectionLSH
  on L2-normalized vectors — euclidean distance on the unit sphere is
  monotone in cosine: d² = 2−2cos). Candidates come from hash-bucket
  collisions only, so cost scales with collisions, not n·q. This is
  the scale path; an IVF (k-means coarse quantizer) variant would slot
  in the same way with a cluster-assignment join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import fan_out, load
from ..functions.vector import as_double_array, cosine, norm
from ..registry import query

_N_QUERIES = 5
_TOP_K = 10


@query(
    "sim_search",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_N_QUERIES}),
         scored AS (
           SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                  ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
                                               e.embedding::DOUBLE[]), 4) AS cos_sim
           FROM q JOIN embeddings e ON e.vec_id <> q.vec_id
         ),
         ranked AS (
           SELECT query_id, neighbor_id, cos_sim,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
           FROM scored
         )
    SELECT query_id, neighbor_id, cos_sim, rnk FROM ranked WHERE rnk <= {_TOP_K}
    """,
)
def sim_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-{k}: broadcast the query vectors, score
    every candidate with built-in zip_with/aggregate (double
    precision), rank per query with a total ordering (rounded cosine
    desc, neighbor id asc)."""
    # no fan_out here: at this row count the repartition shuffle costs
    # more than the cosine evaluations it would parallelize
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("emb")
    )
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("q_emb"), F.col("emb")), 4).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
    )


@query("sim_search_lsh")
def sim_search_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH: L2-normalize, then
    BucketedRandomProjectionLSH (seed=42) approxSimilarityJoin within
    euclidean radius; convert distance back to cosine (cos = 1−d²/2 on
    the unit sphere). Deterministic given the seed; rows-only check
    (the bucketing is engine-specific)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("emb")
    )
    unit = e.select(
        "vec_id",
        F.transform("emb", lambda x: x / norm(F.col("emb"))).alias("unit"),
    ).select("vec_id", array_to_vector("unit").alias("features"))

    q = unit.filter(F.col("vec_id") < _N_QUERIES)
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=0.5,
        numHashTables=8, seed=42,
    )
    model = lsh.fit(unit)
    # radius 1.2 on the unit sphere ≈ cosine ≥ 0.28 — wide enough for recall
    pairs = model.approxSimilarityJoin(q, unit, 1.2, distCol="euclid")
    scored = pairs.filter(
        F.col("datasetA.vec_id") != F.col("datasetB.vec_id")
    ).select(
        F.col("datasetA.vec_id").alias("query_id"),
        F.col("datasetB.vec_id").alias("neighbor_id"),
        F.round(1 - (F.col("euclid") ** 2) / 2, 4).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
    )

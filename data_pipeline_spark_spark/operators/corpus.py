"""Training-corpus curation: the composed pipeline a 100 TB
LLM-data run executes daily, plus incremental-batch variants.

EXT tier (north-star). These combine the primitives from text.py /
dedup.py the way a production crawl-refresh actually chains them:
language gate → quality gate → exact dedup → token accounting. Each
step is a pure column expression or a digest-keyed aggregation, so
the whole pipeline is one scan + one 32-byte-key shuffle at any
scale."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import fan_out, load
from ..functions.exact import md5_u32_duck, md5_u32_sql, micro_ln
from ..registry import query

# explicit dependency on the text module (NB stage + shared target
# label); importing at module top keeps registration order visible
# instead of a decoration-time side effect (text.py does not import
# corpus.py, so no cycle)
from .text import _NB_SQL, nb_quality_scores_of, target_label


@query(
    "dedup_incremental",
    oracle="""
    WITH corpus AS (
      SELECT sha256(text) AS h FROM documents WHERE doc_id % 10 < 8
    ),
    batch AS (
      SELECT doc_id, sha256(text) AS h, lang, source
      FROM documents WHERE doc_id % 10 >= 8
    )
    SELECT b.doc_id, b.lang, b.source
    FROM batch b
    WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.h = b.h)
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup: only the NEW batch (deterministic 20%
    split) is admitted, minus anything whose content hash already
    exists in the corpus — a left-anti join on 32-byte digests. This
    is the daily-crawl shape: the corpus side never rescans its text,
    only its hash index; at 100 TB that index is a bucketed table and
    the anti-join is shuffle-free."""
    d = load(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 < 8).select(
        F.sha2("text", 256).alias("h")
    )
    batch = d.filter(F.col("doc_id") % 10 >= 8).select(
        "doc_id", F.sha2("text", 256).alias("h"), "lang", "source"
    )
    return batch.join(corpus, "h", "left_anti").select("doc_id", "lang", "source")


# Bloom sizing (see docs/SCALE.md): m bits / k hashes fixed so the
# fixture family keeps per-probe false-positive odds negligible —
# FP(m,k,n) = (1 − e^(−kn/m))^k. The sf1 documents fixture is ~50k
# rows (~40k corpus digests → FP ≈ 4e-11; sf0.1 ~4k digests, far
# smaller still). The margin is NOT unconditional: at 0.5M digests
# the same (m, k) gives FP ≈ 5e-4 — tens of expected false drops per
# batch — which would break dedup_bloom_incremental's exact-oracle
# equality; test_bloom_sizing_margin pins the fixture corpus well
# under that cliff so growth fails loudly instead of silently. At
# 100 TB the same code sizes m from the corpus row-count statistic
# (m ≈ 23 bits/key for 1e-7): the sketch is 1 MiB here and would be
# a few GiB there, still broadcast-sized — and the _verified
# two-phase key stays exact at ANY FP rate.
_BLOOM_M_BITS = 1 << 23
_BLOOM_M_WORDS = _BLOOM_M_BITS // 64
_BLOOM_K = 7


def _bloom_positions(h1m, h2m, m_bits: int = _BLOOM_M_BITS):
    """The k Kirsch-Mitzenmacher probe positions pos_i =
    (h1 + i·h2) mod m as Column expressions. Inputs are the two
    xxhash64 streams pre-masked to 47/31 bits so i·h2 + h1 < 2^48
    never overflows a BIGINT under ANSI mode."""
    return [
        F.pmod(h1m + F.lit(i) * h2m, F.lit(m_bits))
        for i in range(_BLOOM_K)
    ]


def _bloom_bit_mask(pos):
    """Single-bit BIGINT mask for a position's in-word bit —
    shiftleft with a COLUMN shift amount (call_function; the python
    shiftleft wrapper only takes a literal int)."""
    bit = F.pmod(pos, F.lit(64)).cast("int")
    return F.call_function(
        "shiftleft", F.lit(1).cast("bigint"), bit
    )


def _bloom_probe_ok(bf_col, h1m, h2m, m_bits: int = _BLOOM_M_BITS):
    """True iff every probe bit is set in the broadcast word array —
    ``might_contain`` as a pure whole-stage-codegen expression:
    k O(1) element_at lookups + bit tests per row."""
    checks = []
    for pos in _bloom_positions(h1m, h2m, m_bits):
        widx = (pos / F.lit(64)).cast("int")
        word = F.element_at(bf_col, widx + F.lit(1))
        checks.append(word.bitwiseAND(_bloom_bit_mask(pos)) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def _bloom_hash_cols():
    """The two pre-masked xxhash64 streams over a digest column
    ``h`` (47/31 bits — see [[_bloom_positions]]). Seed FIRST in the
    second stream (the [[duplication_profile_of]] rule, r16
    self-review fix): Spark folds multi-arg xxhash64 left-to-right
    with the running hash as the next seed, so ``xxhash64(h, lit(1))``
    is a deterministic function of ``xxhash64(h)`` — two digests
    colliding on the first stream would share every probe position,
    voiding the independent-hash FP model; ``xxhash64(lit(1), h)``
    hashes h under a different effective seed and is independent."""
    h1m = F.xxhash64(F.col("h")).bitwiseAND(F.lit((1 << 47) - 1))
    h2m = F.xxhash64(F.lit(1), F.col("h")).bitwiseAND(
        F.lit((1 << 31) - 1)
    )
    return h1m, h2m


def _bloom_frame(
    spark: SparkSession, hashed: DataFrame, m_bits: int = _BLOOM_M_BITS
) -> DataFrame:
    """Build the one-row dense word-array Bloom bitmap from a frame
    of (a, b) hash-stream pairs — ``bloom_filter_agg`` re-expressed:
    positions → groupBy(widx).bit_or (exchange bounded by m/64 words
    per task) → dense zero-fill against a range frame → single
    sorted array row, ready to broadcast."""
    m_words = m_bits // 64
    positions = hashed.select(
        F.explode(
            F.array(
                *_bloom_positions(F.col("a"), F.col("b"), m_bits)
            )
        ).alias("pos")
    )
    words = (
        positions.select(
            (F.col("pos") / F.lit(64)).cast("int").alias("widx"),
            _bloom_bit_mask(F.col("pos")).alias("mask"),
        )
        .groupBy("widx")
        .agg(F.bit_or("mask").alias("bits"))
    )
    dense = (
        spark.range(m_words)
        .select(F.col("id").cast("int").alias("widx"))
        .join(F.broadcast(words), "widx", "left")
        .select("widx", F.coalesce("bits", F.lit(0)).alias("bits"))
    )
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("widx", "bits"))),
            lambda s: s["bits"],
        ).alias("bf")
    )


@query(
    "dedup_bloom_incremental",
    oracle="""
    WITH corpus AS (
      SELECT sha256(text) AS h FROM documents WHERE doc_id % 10 < 8
    ),
    batch AS (
      SELECT doc_id, sha256(text) AS h, lang, source
      FROM documents WHERE doc_id % 10 >= 8
    )
    SELECT b.doc_id, b.lang, b.source
    FROM batch b
    WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.h = b.h)
    """,
)
def dedup_bloom_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup where the corpus side is a BLOOM FILTER, not
    a join: the 100 TB monthly-increment path (reference README.md:
    10-11 — the platform ingests per-month increments) in which
    [[dedup_incremental]]'s digest anti-join would shuffle the whole
    corpus hash index every batch. Here the corpus collapses into an
    m-bit bitmap — per-task partial bit_or combines bound the
    exchange by the SKETCH size (≤ m/64 words per task), never the
    corpus row count — and the bitmap rides a one-row broadcast onto
    the batch scan, where membership is 7 O(1) array lookups per row
    in whole-stage codegen (``bloom_filter_agg``/``might_contain``
    re-expressed as public expressions: bit positions via two-stream
    xxhash64 double hashing, words via groupBy(widx).bit_or, probe
    via element_at + bit test).

    EXACTNESS: a Bloom positive can be false, so this plan admits
    exactly the rows whose digest misses the filter; the oracle is
    the exact anti-join, and the m/k sizing puts the odds of ANY
    false-positive drop across the fixture family below ~1e-6
    (tests/test_round13_ops.py additionally pins
    false-positive drops == 0 against the exact join at two SFs).
    At 100 TB the production contract is the standard one: bloom
    pre-filter prunes ~all of the batch, and the surviving
    might-contain slice (true dups + εn FPs) takes the exact
    anti-join — the join's left side shrinks from |batch| to
    |dups| + ε|batch| while the corpus is touched only through its
    once-a-month sketch build."""
    d = load(spark, sf_dir, "documents")
    h1m, h2m = _bloom_hash_cols()
    corpus = (
        d.filter(F.col("doc_id") % 10 < 8)
        .select(F.sha2("text", 256).alias("h"))
        .select(h1m.alias("a"), h2m.alias("b"))
    )
    bf = _bloom_frame(spark, corpus)
    batch = d.filter(F.col("doc_id") % 10 >= 8).select(
        "doc_id",
        "lang",
        "source",
        F.sha2("text", 256).alias("h"),
    )
    batch = batch.select(
        "doc_id", "lang", "source", h1m.alias("a"), h2m.alias("b")
    )
    return (
        batch.crossJoin(F.broadcast(bf))
        .where(
            ~_bloom_probe_ok(F.col("bf"), F.col("a"), F.col("b"))
        )
        .select("doc_id", "lang", "source")
    )


@query(
    "dedup_bloom_incremental_verified",
    oracle="""
    WITH corpus AS (
      SELECT sha256(text) AS h FROM documents WHERE doc_id % 10 < 8
    ),
    batch AS (
      SELECT doc_id, sha256(text) AS h, lang, source
      FROM documents WHERE doc_id % 10 >= 8
    )
    SELECT b.doc_id, b.lang, b.source
    FROM batch b
    WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.h = b.h)
    """,
)
def dedup_bloom_incremental_verified(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The production two-phase form of [[dedup_bloom_incremental]]:
    Bloom pre-filter + EXACT verification of the might-contain
    slice — structurally exact at ANY false-positive rate, not just
    on a fixture the sizing happens to cover. Batch rows whose
    digest misses the filter are admitted with zero corpus contact
    (a Bloom negative is definitive); rows the filter flags take
    the digest anti-join, which rescues the ε|batch| false
    positives and drops the true duplicates. The anti-join's left
    side is |dups| + ε|batch| instead of |batch| — at 100 TB that
    is the difference between verifying a few thousand suspects and
    re-shuffling the whole month's crawl; the corpus index is still
    read for verification, but only joined against the suspect
    sliver (broadcast when the sliver is small, which is the
    steady-state). Implemented as one bitmap build reused by both
    branches of a partitioned union; exactness needs no sizing
    assumption, so this key's oracle-equality holds even under the
    deliberately undersized bloom the contract test runs."""
    return _bloom_incremental_verified_of(
        load(spark, sf_dir, "documents"), spark, _BLOOM_M_BITS
    )


def _bloom_incremental_verified_of(
    d: DataFrame, spark: SparkSession, m_bits: int
) -> DataFrame:
    """The testable fold under [[dedup_bloom_incremental_verified]]
    with an injectable m — the contract test shrinks m until the
    bloom false-positives by construction and asserts the verified
    output STILL equals the exact anti-join."""
    h1m, h2m = _bloom_hash_cols()
    corpus_h = d.filter(F.col("doc_id") % 10 < 8).select(
        F.sha2("text", 256).alias("h")
    )
    bf = _bloom_frame(
        spark, corpus_h.select(h1m.alias("a"), h2m.alias("b")), m_bits
    )
    batch = (
        d.filter(F.col("doc_id") % 10 >= 8)
        .select(
            "doc_id", "lang", "source", F.sha2("text", 256).alias("h")
        )
        .select(
            "doc_id", "lang", "source", "h",
            h1m.alias("a"), h2m.alias("b"),
        )
        .crossJoin(F.broadcast(bf))
        .withColumn(
            "might",
            _bloom_probe_ok(F.col("bf"), F.col("a"), F.col("b"), m_bits),
        )
        .select("doc_id", "lang", "source", "h", "might")
    )
    clean = batch.where(~F.col("might")).select(
        "doc_id", "lang", "source"
    )
    rescued = (
        batch.where(F.col("might"))
        .join(corpus_h, "h", "left_anti")
        .select("doc_id", "lang", "source")
    )
    return clean.unionByName(rescued)


@query(
    "corpus_pipeline",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang, source, text,
             sha256(text) AS h,
             len(string_split(text, ' ')) AS n_tokens,
             CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / nullif(len(string_split(text, ' ')), 0) AS avg_tok
      FROM documents
      WHERE lang = 'en'
    ),
    gated AS (
      SELECT * FROM scored
      WHERE n_tokens BETWEEN 5 AND 100000 AND avg_tok BETWEEN 2 AND 12
    ),
    deduped AS (
      SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
      FROM gated
    )
    SELECT doc_id, source, CAST(n_tokens AS INT) AS n_tokens
    FROM deduped WHERE rn = 1
    """,
)
def corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation chain composed: language gate → Gopher-style
    quality gate → exact dedup (keep lowest doc_id per content hash) →
    token accounting. One scan; the only shuffle keys are 32-byte
    digests. This is the query a training-data team runs before every
    tokenization pass."""
    d = load(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    toks = F.split("text", " ")
    n_toks = F.size(toks)
    avg_tok = (
        F.length(F.regexp_replace("text", " ", "")).cast("double")
        / F.nullif(n_toks, F.lit(0))
    )
    gated = d.select(
        "doc_id", "source", F.sha2("text", 256).alias("h"), n_toks.alias("n_tokens")
    ).filter(n_toks.between(5, 100000) & avg_tok.between(2, 12))
    from pyspark.sql import Window as W

    rn = F.row_number().over(W.partitionBy("h").orderBy("doc_id"))
    return (
        gated.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "n_tokens")
    )


@query(
    "embedding_centroids",
    oracle="""
    SELECT label, i AS dim,
           CAST(SUM(CAST(round(embedding[i]::DOUBLE * 1000000)
                         AS BIGINT)) AS DOUBLE)
             / (1000000.0 * COUNT(*)) AS centroid_v,
           COUNT(*) AS n_vectors
    FROM embeddings, range(1, 65) t(i)
    GROUP BY label, i
    """,
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column, element-wise:
    posexplode → groupBy(label, dim) → exact micro-unit sum → one
    final division. The shuffle carries (label, dim, partial sums) —
    at 100 TB this is the map-side-combined reduction that feeds
    k-means/IVF training, never a driver collect.

    Numerics (r16 self-review fix): the earlier ROUND(AVG(double), 6)
    rounded an order-dependent float sum at a fractional digit — the
    exact hazard this module documents at
    [[corpus_mix_temperature]]/[[duplication_profile_of]] (a mean
    within a summation-order ulp of a 0.5e-6 boundary flips the 6th
    decimal per engine or per partitioning). Now each element
    quantizes ONCE to integer micro-units (round-to-integer of the
    same double is engine-identical: repr-vs-binary divergence only
    bites at fractional digits, and both engines tie away from
    zero), the cross-row sum is an associative BIGINT, and the one
    double division at the end is the same IEEE op everywhere — the
    [[rollup_reaggregate]] discipline applied to vectors. Centroid
    granularity is unchanged (the old form also reported 1e-6).

    NB the oracle enumerates dims 1..64 LITERALLY (range(1, 65))
    while this side posexplodes whatever length the arrays have — a
    fixture dimension change goes loudly red on row count here
    rather than silently aggregating different dim subsets."""
    e = load(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "v"))
        .select(
            "label",
            (F.col("pos") + 1).alias("dim"),
            F.round(F.col("v").cast("double") * 1000000)
            .cast("bigint")
            .alias("v_micro"),
        )
        .groupBy("label", "dim")
        .agg(
            (
                F.sum("v_micro").cast("double")
                / (F.lit(1000000.0) * F.count("*"))
            ).alias("centroid_v"),
            F.count("*").alias("n_vectors"),
        )
    )


@query(
    "corpus_sample_hash",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '/corpus-v1'), 1, 2)
                     < '1a' THEN 'sample'
                WHEN substr(md5(CAST(doc_id AS VARCHAR) || '/split-v1'), 1, 2)
                     < 'e6' THEN 'train'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def corpus_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible sampling + train/test split via content-key
    hashing — the method that survives reruns, backfills, and cluster
    changes (rand()-based sampling draws a different corpus every
    run; at 100 TB an irreproducible training set is a bug).
    Membership depends only on (doc_id, salt): md5 prefix < '1a' ≈
    10.2% held out as an eval sample; the rest hash-split ~90/10 into
    train/test on an independent salt. md5 produces identical hex on
    every engine, so the oracle reproduces the exact membership."""
    d = load(spark, sf_dir, "documents")

    def bucket(salt: str):
        return F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(salt))), 1, 2
        )

    split = (
        F.when(bucket("/corpus-v1") < "1a", "sample")
        .when(bucket("/split-v1") < "e6", "train")
        .otherwise("test")
    )
    return d.select("doc_id", "lang", split.alias("split"))


@query(
    "corpus_mix_weighted",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR) || '/mix-v1'), 1, 4)
          < CASE WHEN lang = 'en' THEN '8000'
                 WHEN lang IN ('de', 'es', 'fr') THEN 'c000'
                 ELSE 'g' END
    """,
)
def corpus_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted source mixing — sample each language stratum at its
    own rate to hit a target training mixture (the de-facto knob in
    LLM data recipes: downweight the over-represented crawl slice,
    keep the scarce strata whole). Here: en at 50%, de/es/fr at 75%,
    everything else (zh) at 100%.

    Membership is a pure function of (doc_id, salt): keep a row when
    the first 4 hex chars of md5(doc_id || salt) fall below the
    stratum's threshold ('8000'/65536 ≈ 50%, 'c000' ≈ 75%; 'g' sorts
    above every hex digit = keep all). Same contract as
    [[corpus_sample_hash]]: no shuffle, no count-first pass, stable
    under reruns and across engines — a filter that pushes to the
    scan, so at 100 TB the mix costs one pass and prunes columns.
    Rate precision is 1/65536, far tighter than any mixture spec."""
    d = load(spark, sf_dir, "documents")
    thr = (
        F.when(F.col("lang") == "en", "8000")
        .when(F.col("lang").isin("de", "es", "fr"), "c000")
        .otherwise("g")
    )
    bucket = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("/mix-v1"))), 1, 4
    )
    return d.filter(bucket < thr).select("doc_id", "lang", "source")


@query(
    "corpus_stratified_sample",
    oracle="""
    SELECT doc_id, lang, rk
    FROM (
      SELECT doc_id, lang,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '/strat-v1'), doc_id
             ) AS INT) AS rk
      FROM documents
    )
    WHERE rk <= 20
    """,
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-quota stratified sample: exactly min(20, |stratum|) docs
    per language, chosen by ranking each stratum on a salted md5 of
    the key — a deterministic shuffle-order that no engine or rerun
    changes (doc_id tiebreak makes the order total even under md5
    collisions). The eval-set / ablation-set builder: quotas, not
    rates, so small strata aren't starved.

    One shuffle on the stratum key. At scale the rank window sorts
    each stratum within its partitions; for quotas ≪ stratum size a
    pre-filter on the hash prefix (keep ~4× quota) bounds the sort
    input before ranking — same trick as [[corpus_sample_hash]]."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("/strat-v1"))),
        "doc_id",
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 20)
    )


_FILTER_REPORT_SQL = """
    WITH base AS (
      SELECT doc_id, lang,
             string_split(text, ' ') AS toks,
             length(replace(text, ' ', '')) AS compact_len
      FROM documents
    ),
    tok AS (
      SELECT doc_id, unnest(toks) AS w FROM base
    ),
    rep AS (
      SELECT doc_id, MAX(cnt) AS max_cnt
      FROM (SELECT doc_id, w, COUNT(*) AS cnt FROM tok GROUP BY doc_id, w)
      GROUP BY doc_id
    ),
    flags AS (
      SELECT b.doc_id,
             CASE WHEN len(b.toks) < 5 THEN 1 ELSE 0 END AS f_short,
             CASE WHEN b.compact_len < 2 * len(b.toks)
                    OR b.compact_len > 12 * len(b.toks)
                  THEN 1 ELSE 0 END AS f_toklen,
             CASE WHEN 10 * r.max_cnt > 3 * len(b.toks)
                  THEN 1 ELSE 0 END AS f_rep,
             CASE WHEN b.lang NOT IN ('en', 'de', 'fr', 'es')
                  THEN 1 ELSE 0 END AS f_lang
      FROM base b JOIN rep r ON b.doc_id = r.doc_id
    )
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(f_short) AS BIGINT) AS n_fail_short,
           CAST(SUM(f_toklen) AS BIGINT) AS n_fail_toklen,
           CAST(SUM(f_rep) AS BIGINT) AS n_fail_repetition,
           CAST(SUM(f_lang) AS BIGINT) AS n_fail_lang,
           CAST(SUM(CASE WHEN f_short + f_toklen + f_rep + f_lang = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
    FROM flags
"""


@query("corpus_filter_report", oracle=_FILTER_REPORT_SQL)
def corpus_filter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite C4/Gopher-style quality gate with per-rule drop
    accounting — the report a curation run publishes so corpus
    shrinkage is attributable rule by rule (length floor, token-shape
    band, single-token repetition cap, language whitelist; the
    component signals exist standalone as [[quality_score]],
    [[repetition_stats]], [[lang_id]]).

    EVERY rule predicate is an exact integer comparison (ratio rules
    cross-multiply: max_cnt/n > 0.3 becomes 10·max_cnt > 3·n), so
    there is no float anywhere and both engines agree on each doc's
    flags bit for bit. ZERO data-proportional shuffles: the
    repetition rule's hottest-token count is an in-row fold over the
    doc's sorted token array (runs of a sorted array are its
    multiplicities — same trick as [[repetition_stats]]; an earlier
    shape paid an explode + two doc-keyed shuffles + a join for this
    per-doc-local stat), so the whole gate is one projected scan into
    one single-row aggregate. Per-rule counts sum flags INDEPENDENTLY
    (a doc failing two rules counts in both), with n_pass the
    conjunction — the accounting layout that lets drop rates be
    monitored per rule across corpus versions."""
    d = fan_out(load(spark, sf_dir, "documents"))
    max_cnt = F.expr(
        """aggregate(sort_array(toks),
        named_struct('prev', CAST(NULL AS STRING),
                     'run', CAST(0 AS BIGINT), 'mx', CAST(0 AS BIGINT)),
        (acc, x) -> named_struct(
            'prev', x,
            'run', IF(x <=> acc.prev, acc.run + 1, CAST(1 AS BIGINT)),
            'mx', greatest(acc.mx,
                           IF(x <=> acc.prev, acc.run + 1,
                              CAST(1 AS BIGINT)))),
        acc -> acc.mx)"""
    )
    base = d.select(
        "doc_id",
        "lang",
        F.split("text", " ").alias("toks"),
        F.length(F.regexp_replace("text", " ", "")).alias("compact_len"),
    ).withColumn("max_cnt", max_cnt)
    n = F.size("toks")
    flags = base.select(
        F.when(n < 5, 1).otherwise(0).alias("f_short"),
        F.when(
            (F.col("compact_len") < 2 * n) | (F.col("compact_len") > 12 * n),
            1,
        )
        .otherwise(0)
        .alias("f_toklen"),
        F.when(10 * F.col("max_cnt") > 3 * n, 1).otherwise(0).alias("f_rep"),
        F.when(~F.col("lang").isin("en", "de", "fr", "es"), 1)
        .otherwise(0)
        .alias("f_lang"),
    )
    total_fail = (
        F.col("f_short") + F.col("f_toklen") + F.col("f_rep") + F.col("f_lang")
    )
    return flags.agg(
        F.count("*").alias("n_docs"),
        F.sum("f_short").cast("bigint").alias("n_fail_short"),
        F.sum("f_toklen").cast("bigint").alias("n_fail_toklen"),
        F.sum("f_rep").cast("bigint").alias("n_fail_repetition"),
        F.sum("f_lang").cast("bigint").alias("n_fail_lang"),
        F.sum(F.when(total_fail == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass"),
    )


_DUP_PROFILE_SQL = """
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
               || t[i+3] || ' ' || t[i+4] AS g
      FROM toks, UNNEST(generate_series(1, len(t) - 4)) AS u(i)
      WHERE len(t) >= 5
    ),
    gc AS (SELECT g, COUNT(*) AS c FROM grams GROUP BY g),
    gs AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_ngrams,
                  COUNT(*) AS n_distinct_ngrams,
                  CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0)
                       AS BIGINT) AS n_dup_occ
           FROM gc),
    dc AS (SELECT text, COUNT(*) AS c FROM documents GROUP BY text),
    ds AS (SELECT CAST(SUM(c) AS BIGINT) AS n_docs,
                  CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0)
                       AS BIGINT) AS n_exact_dup_docs
           FROM dc)
    SELECT n_docs, n_exact_dup_docs,
           CAST(n_exact_dup_docs AS DOUBLE) / n_docs AS exact_dup_frac,
           n_ngrams, n_distinct_ngrams,
           CASE WHEN n_ngrams = 0 THEN 0.0
                ELSE CAST(n_dup_occ AS DOUBLE) / n_ngrams
           END AS dup_ngram_frac
    FROM gs, ds
"""


@query("corpus_duplication_profile", oracle=_DUP_PROFILE_SQL)
def corpus_duplication_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplication report — the measurement that decides
    whether a dedup pass is worth scheduling (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better"): the
    fraction of documents that are byte-exact duplicates of another,
    and the fraction of 5-gram OCCURRENCES whose 5-gram appears more
    than once in the corpus (near-dup / boilerplate mass that exact
    dedup cannot see). Two independent aggregation trees joined as
    1-row broadcasts:

    - doc level: groupBy(text) count — at scale, group on
      sha2(text) instead so the shuffle key is 32 bytes, the same
      digest trick as [[dedup_exact]];
    - n-gram level: in-row generator expansion (no lambda in the
      hot path beyond one transform per doc) → one count shuffle on
      the gram, map-side combined, then a second tiny aggregate over
      the count table. The gram strings themselves are the scale
      knob: hash each gram to a bigint (xxhash64) at 100 TB to cut
      shuffle bytes ~5× — kept as strings here so the DuckDB oracle
      can mirror the grouping exactly.

    All counts are exact bigints; the two fractions are single double
    divisions of exact integers — bit-identical across engines."""
    return duplication_profile_of(fan_out(load(spark, sf_dir, "documents")))


@query("corpus_duplication_profile_hashed", oracle=_DUP_PROFILE_SQL)
def corpus_duplication_profile_hashed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """[[corpus_duplication_profile]] with its documented 100 TB
    shuffle knob ENGAGED instead of merely described: grams and
    document texts hash in-row to a two-seed 128-bit xxhash64 pair
    before their count exchanges, so each shuffle row carries 16
    fixed bytes instead of the string (fixture grams average 26.5
    bytes + length header ⇒ ~2× fewer gram-exchange bytes here; the
    knob grows with gram width — 13-token grams or CJK text would
    be 5-10×). The profile's outputs are COUNT aggregates
    only, so the string-grouped SQL oracle still grades it: results
    diverge only on a double-64-bit collision (~n²·2⁻¹²⁸), and the
    driver's side-by-side run at every graded SF is exactly the
    collision check. Same plan shape as the string rung — one
    map-side-combined count shuffle per tree, two 1-row broadcasts."""
    return duplication_profile_of(
        fan_out(load(spark, sf_dir, "documents")), hashed=True
    )


def duplication_profile_of(d: DataFrame, hashed: bool = False) -> DataFrame:
    """The duplication-profile aggregation over any (text, ...) frame
    — module-level so the hypothesis differential test runs the SAME
    counting the registered query runs.

    ``hashed=True`` is the 100 TB shuffle-byte knob the string
    variant documents: every gram (and every document text) is
    hashed in-row to a two-seed 128-bit xxhash64 pair BEFORE its
    count exchange, so the shuffle rows carry 16 fixed bytes instead
    of the variable-length string. Counts are identical unless two
    distinct values collide on BOTH independent 64-bit hashes
    (seed-first `xxhash64(lit(1), x)` is independent of
    `xxhash64(x)` — chaining the seed LAST would make one a function
    of the other), i.e. with probability ~n²·2⁻¹²⁸ — which is why
    the hashed rung can share the string-grouped SQL oracle."""
    gram_key = ["g"]
    doc_key: list = ["text"]
    if hashed:
        gram_key = [
            F.xxhash64(F.lit(1), F.col("g")).alias("h1"),
            F.xxhash64(F.col("g")).alias("h2"),
        ]
        doc_key = [
            F.xxhash64(F.lit(1), F.col("text")).alias("h1"),
            F.xxhash64(F.col("text")).alias("h2"),
        ]
    # split let-bound via 1-element transform: inlined in the
    # per-gram lambda it re-tokenizes the doc PER GRAM — O(T²)/doc
    # (r14 HOF audit; the r13 FFD lesson)
    grams = d.select(
        F.explode(
            F.expr(
                "try_element_at(transform(array(split(text, ' ')), tk ->"
                " CASE WHEN size(tk) >= 5 THEN"
                "  transform(sequence(0, size(tk) - 5),"
                "   i -> concat_ws(' ', slice(tk, i + 1, 5)))"
                " ELSE array() END), 1)"
            )
        ).alias("g")
    )
    gs = (
        grams.groupBy(*gram_key)
        .agg(F.count("*").alias("c"))
        .agg(
            # coalesce: a corpus where NO document reaches 5 tokens
            # aggregates an empty gram stream — SUM over it is NULL
            # in both engines (hypothesis-found edge), and a count
            # must be 0, not NULL
            F.coalesce(F.sum("c"), F.lit(0)).alias("n_ngrams"),
            F.count("*").alias("n_distinct_ngrams"),
            F.coalesce(
                F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)
            ).alias("n_dup_occ"),
        )
    )
    ds = (
        d.groupBy(*doc_key)
        .agg(F.count("*").alias("c"))
        .agg(
            F.sum("c").alias("n_docs"),
            F.coalesce(
                F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)
            ).alias("n_exact_dup_docs"),
        )
    )
    return gs.crossJoin(F.broadcast(ds)).select(
        "n_docs",
        "n_exact_dup_docs",
        (
            F.col("n_exact_dup_docs").cast("double") / F.col("n_docs")
        ).alias("exact_dup_frac"),
        "n_ngrams",
        "n_distinct_ngrams",
        F.when(F.col("n_ngrams") == 0, F.lit(0.0))
        .otherwise(
            F.col("n_dup_occ").cast("double") / F.col("n_ngrams")
        )
        .alias("dup_ngram_frac"),
    )


# ---------------------------------------------------------------------------
# temperature (alpha) sampling + deterministic training-order shuffle
# ---------------------------------------------------------------------------

_TEMP_ALPHA = 0.5   # target distribution q_i ∝ p_i^alpha
_HEX6 = 16 ** 6     # md5-prefix acceptance-threshold scale


_MIX_TEMPERATURE_SQL = f"""
    WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    m AS (SELECT MIN(n) AS n_min FROM c),
    r AS (
      SELECT lang,
             CAST(round(pow(CAST(n_min AS DOUBLE) / CAST(n AS DOUBLE),
                            {1 - _TEMP_ALPHA}) * {_HEX6}) AS BIGINT) AS thr
      FROM c, m
    )
    SELECT d.doc_id, d.lang,
           CAST(r.thr AS DOUBLE) / {_HEX6} AS rate
    FROM documents d JOIN r USING (lang)
    WHERE r.thr >= {_HEX6}
       OR substr(md5(CAST(d.doc_id AS VARCHAR) || '/temp-v1'), 1, 6)
          < lpad(printf('%x', r.thr), 6, '0')
"""


@query("corpus_mix_temperature", oracle=_MIX_TEMPERATURE_SQL)
def corpus_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature / alpha sampling across languages — the standard
    multilingual-pretraining mix (Conneau & Lample 2019 §3.1; mT5,
    XLM-R): resample so the effective language distribution is
    q_i ∝ p_i^α (α = {alpha}), i.e. keep every document of the
    rarest language and downsample language i at rate
    (n_min / n_i)^(1−α) — flattening the head without discarding
    the tail, which fixed per-language weights
    ([[corpus_mix_weighted]]) can't do because they don't adapt to
    the observed counts.

    Reproducibility discipline (the [[corpus_sample_hash]]
    contract): membership depends only on (doc_id, salt) via an md5
    prefix against a per-language integer threshold — identical hex
    on every engine, so the oracle reproduces exact membership, and
    a rerun/backfill draws the SAME subcorpus. The threshold is
    round((n_min/n)^(1−α) · 16⁶) — rounding at the INTEGER digit,
    so the only cross-engine exposure is pow()'s final ulp. The
    reported ``rate`` is derived FROM the threshold (thr / 16⁶ —
    the exact realized acceptance rate of the filter), not rounded
    independently from the pow() double: fractional-digit ROUND of
    a pow() result is exactly the repr-vs-binary-value rounding
    divergence the trained-codebook docstring rules unsafe (r10
    review), while one integer over one constant divides to the
    same IEEE double in both engines. Rate-1 languages
    short-circuit (a 7-hex-digit threshold would break the 6-char
    string comparison).

    Scale shape: one tiny per-language count aggregate broadcast
    back onto the stream; the acceptance test is a per-row md5 +
    string compare, no shuffle of the corpus at all."""
    d = load(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count("*").alias("n"))
    m = c.agg(F.min("n").alias("n_min"))
    ratio = F.col("n_min").cast("double") / F.col("n").cast("double")
    r = (
        c.crossJoin(F.broadcast(m))
        .select(
            "lang",
            F.round(F.pow(ratio, 1 - _TEMP_ALPHA) * _HEX6)
            .cast("bigint")
            .alias("thr"),
        )
        .withColumn("rate", F.col("thr").cast("double") / _HEX6)
    )
    prefix = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("/temp-v1"))),
        1,
        6,
    )
    accept = (F.col("thr") >= _HEX6) | (
        prefix < F.lpad(F.format_string("%x", F.col("thr")), 6, "0")
    )
    return (
        d.join(F.broadcast(r), "lang")
        .filter(accept)
        .select("doc_id", "lang", "rate")
    )


corpus_mix_temperature.__doc__ = corpus_mix_temperature.__doc__.replace(
    "{alpha}", str(_TEMP_ALPHA)
)


_SHUFFLE_SHARDS = 8

_SHUFFLE_SQL = f"""
    WITH h AS (
      SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR) || '/shuffle-v1') AS hk
      FROM documents
    )
    SELECT doc_id,
           CAST((row_number() OVER (ORDER BY hk, doc_id) - 1)
                % {_SHUFFLE_SHARDS} AS BIGINT) AS shard,
           -- // : DuckDB's / is FLOAT division and CAST rounds, so a
           -- plain /-then-CAST would misplace every 8k+5..8k+7 row
           CAST((row_number() OVER (ORDER BY hk, doc_id) - 1)
                // {_SHUFFLE_SHARDS} AS BIGINT) AS shard_pos
    FROM h
"""


@query("corpus_shuffle_deterministic", oracle=_SHUFFLE_SQL)
def corpus_shuffle_deterministic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic global training-order shuffle — the step between
    curation and [[shard_pack]]: documents ordered by a salted
    content hash (a seedable pseudo-random permutation that any
    rerun reproduces, unlike rand()), then striped round-robin
    across {n} shards so every shard is an unbiased interleaved
    sample of the corpus (contiguous slicing would put all of one
    source's clustered docs in one shard).

    Scale shape: a global row_number window would serialize the
    corpus through ONE task (Spark warns exactly that), so the
    global position is the [[shard_pack]] two-phase prefix sum
    instead — repartitionByRange on the hash (sampled boundaries,
    fully parallel sort), per-partition row_number, then the P
    per-partition COUNTS folded into global offsets on the driver
    (O(partitions) rows) and broadcast back. Every data-sized step
    is partitioned; downstream (packing, sharded writes) partitions
    by the assigned shard."""
    from pyspark.sql import Window as W

    from ..session import default_parallelism

    d = load(spark, sf_dir, "documents")
    h = d.select(
        "doc_id",
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit("/shuffle-v1"))
        ).alias("hk"),
    )
    p = default_parallelism()
    t = (
        h.repartitionByRange(p, "hk", "doc_id")
        .withColumn("pid", F.spark_partition_id())
        # traversed twice (per-partition counts, final projection);
        # the sampled range boundaries must not differ between the
        # two traversals
        .cache()
    )
    try:
        counts = (
            t.groupBy("pid").agg(F.count("*").alias("n")).orderBy("pid").collect()
        )
        offsets, acc = [], 0
        for r in counts:
            offsets.append((r["pid"], acc))
            acc += r["n"]
        off_df = spark.createDataFrame(offsets, "pid int, glob_off long")
        w_local = W.partitionBy("pid").orderBy("hk", "doc_id")
        pos = (
            F.col("glob_off") + F.row_number().over(w_local) - 1
        )
        out = (
            t.join(F.broadcast(off_df), "pid")
            .select(
                "doc_id",
                (pos % _SHUFFLE_SHARDS).cast("bigint").alias("shard"),
                F.floor(pos / _SHUFFLE_SHARDS)
                .cast("bigint")
                .alias("shard_pos"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        t.unpersist()


corpus_shuffle_deterministic.__doc__ = (
    corpus_shuffle_deterministic.__doc__.replace("{n}", str(_SHUFFLE_SHARDS))
)


# ---------------------------------------------------------------------------
# DSIR importance resampling (hashed n-gram features)
# ---------------------------------------------------------------------------

#: Hashed-feature dimension for [[corpus_dsir_select]] — small enough
#: that distinct bigrams genuinely collide (the hashing IS the
#: technique: the model is a fixed-width count vector, not a
#: vocabulary), large enough that the weights stay informative.
_DSIR_BUCKETS = 256

#: Fraction of the corpus the resampling keeps, in percent.
_DSIR_KEEP_PCT = 25

_DSIR_SQL = f"""
    WITH lab AS (
      SELECT doc_id, lang,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
             string_split(text, ' ') AS t
      FROM documents
    ),
    feats AS (
      SELECT doc_id, pos,
             {md5_u32_duck("t[i] || ' ' || t[i+1]")}
               % {_DSIR_BUCKETS} AS b
      FROM lab, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 2
    ),
    bc AS (
      SELECT b,
             CAST(round(ln(SUM(pos) + 1) * 1000000) AS BIGINT)
               - CAST(round(ln(COUNT(*) + 1) * 1000000) AS BIGINT) AS w6
      FROM feats GROUP BY b
    ),
    norm AS (
      SELECT CAST(round(ln(SUM(pos) + {_DSIR_BUCKETS}) * 1000000)
                  AS BIGINT)
               - CAST(round(ln(COUNT(*) + {_DSIR_BUCKETS}) * 1000000)
                      AS BIGINT) AS z6
      FROM feats
    ),
    perdoc AS (
      SELECT f.doc_id, COUNT(*) AS n_feats,
             CAST(SUM(w6) AS BIGINT) AS sum_w6
      FROM feats f JOIN bc USING (b) GROUP BY f.doc_id
    ),
    scored AS (
      SELECT l.doc_id, l.lang,
             CAST(COALESCE(p.n_feats, 0) AS BIGINT) AS n_feats,
             CAST(COALESCE(p.sum_w6, 0) AS BIGINT) AS sum_w6,
             COALESCE(p.sum_w6, 0)
               - COALESCE(p.n_feats, 0) * norm.z6 AS m6
      FROM lab l LEFT JOIN perdoc p USING (doc_id), norm
    ),
    k AS (SELECT COUNT(*) * {_DSIR_KEEP_PCT} // 100 AS k FROM documents)
    SELECT doc_id, lang, n_feats, sum_w6,
           CAST(m6 AS DOUBLE) / 1000000.0 AS log_importance
    FROM (SELECT *, row_number() OVER (ORDER BY m6 DESC, doc_id) AS rnk
          FROM scored), k
    WHERE rnk <= k.k
"""


@query("corpus_dsir_select", oracle=_DSIR_SQL)
def corpus_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al., NeurIPS
    2023) — pick the raw-corpus slice that looks most like a target
    domain, using HASHED n-gram features exactly as the paper does:
    every word bigram hashes into a fixed ``_DSIR_BUCKETS``-wide
    count vector (collisions are intentional — the model is a
    fixed-width vector, never a vocabulary), the importance weight of
    a bucket is the smoothed log-ratio of its target-vs-raw
    occurrence probability, a document's log importance is the sum
    over its bigrams, and the top ``_DSIR_KEEP_PCT`` % by importance
    (ties broken by doc_id) is the selected training slice. Target
    here = ``lang = 'en'`` (standing in for the paper's Wikipedia
    pile); raw = the whole corpus.

    Cross-engine exactness: the bucket hash is the first 8 hex chars
    of md5 parsed as an integer — bit-identical in Spark
    (``conv(substr(md5(g),1,8),16,10)``) and DuckDB
    (``CAST('0x'||substr(md5(g),1,8) AS BIGINT)``), unlike xxhash64
    which only Spark exposes; every ln takes an integer argument and
    quantizes once to micro-nat BIGINTs (the
    [[quality_unigram_logprob]] treatment); ranking runs on the exact
    integer margin m6, BEFORE the one cosmetic double division.

    Scale shape: featurizing is an in-row generator expansion into a
    per-doc bucket ARRAY (computed once, lazily checkpointed —
    8-byte ints, smaller state than rerunning split+md5 twice);
    training is ONE map-side-combined count shuffle whose state is
    the fixed 256-row bucket table; and because that model is
    fixed-width by construction it travels back as a single map
    column in a 1-row broadcast, so scoring is an in-row
    ``aggregate`` fold — the corpus-proportional feature stream is
    NEVER shuffled, neither into a join nor into a per-doc rollup.
    The top-k is the only global exchange — a single-partition
    row_number at fixture scale; at 100 TB replace it with an
    approx-quantile importance threshold + broadcast range filter
    (same slice, no global sort), the [[quality_decile_report]]
    scale path."""
    return dsir_select_of(
        fan_out(load(spark, sf_dir, "documents")).select(
            "doc_id", "lang", "text", target_label().alias("pos")
        )
    )


def dsir_select_of(
    lab: DataFrame,
    buckets: int = _DSIR_BUCKETS,
    keep_pct: int = _DSIR_KEEP_PCT,
) -> DataFrame:
    """The DSIR score-and-select over any labeled ``(doc_id, lang,
    text, pos)`` frame — module-level so the hypothesis differential
    test runs the SAME fold the registered query runs.

    The fixed model width is what the plan exploits: because the
    model is ≤``buckets`` (b, w6) rows BY CONSTRUCTION — never
    vocabulary-sized — the whole model travels as ONE map column in a
    1-row broadcast, and scoring is an in-row ``aggregate`` fold over
    each document's bucket array: the corpus-proportional feature
    stream is never exploded into a join and never shuffled into a
    per-doc rollup. (The NB classifier can't do this — its model IS
    the vocabulary, so it broadcast-JOINS the token scan instead.)
    The bucket arrays are computed once and lazily checkpointed:
    8-byte ints per bigram is cheaper state than re-running split +
    md5 over the text for the train and score passes separately."""
    from pyspark.sql import Window as W

    _r6 = micro_ln
    # split let-bound via 1-element transform (r14 HOF audit): the
    # bigram lambda would otherwise re-tokenize the doc PER BIGRAM
    bigram = "concat_ws(' ', slice(tk, i + 1, 2))"
    docs_b = lab.select(
        "doc_id",
        "lang",
        "pos",
        F.expr(
            "try_element_at(transform(array(split(text, ' ')), tk ->"
            " CASE WHEN size(tk) >= 2 THEN"
            "  transform(sequence(0, size(tk) - 2),"
            f"  i -> {md5_u32_sql(bigram)} % {int(buckets)})"
            " ELSE array() END), 1)"
        ).alias("bs"),
    ).localCheckpoint(eager=False)
    bucket_cnt = (
        docs_b.select("pos", F.explode("bs").alias("b"))
        .groupBy("b")
        .agg(F.sum("pos").alias("ct"), F.count("*").alias("craw"))
    )
    # the ENTIRE model — 256 bucket weights plus the normalizer — as
    # one broadcastable row
    model = bucket_cnt.select(
        "b",
        (_r6(F.col("ct") + 1) - _r6(F.col("craw") + 1)).alias("w6"),
        "ct",
        "craw",
    ).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("b"), F.col("w6")))
        ).alias("wm"),
        (
            _r6(F.sum("ct") + buckets) - _r6(F.sum("craw") + buckets)
        ).alias("z6"),
    )
    k = docs_b.agg(
        (F.count("*") * keep_pct).cast("bigint").alias("k100")
    ).select((F.col("k100") / 100).cast("bigint").alias("k"))
    scored = (
        docs_b.crossJoin(F.broadcast(model))
        .select(
            "doc_id",
            "lang",
            F.size("bs").cast("bigint").alias("n_feats"),
            F.expr(
                "CAST(aggregate(bs, 0L, (acc, b) -> acc + wm[b])"
                " AS BIGINT)"
            ).alias("sum_w6"),
            "z6",
        )
        .select(
            "doc_id",
            "lang",
            "n_feats",
            "sum_w6",
            (F.col("sum_w6") - F.col("n_feats") * F.col("z6")).alias("m6"),
        )
    )
    ranked = scored.withColumn(
        "rnk",
        F.row_number().over(
            W.orderBy(F.col("m6").desc(), F.col("doc_id").asc())
        ),
    ).crossJoin(F.broadcast(k))
    return ranked.filter(F.col("rnk") <= F.col("k")).select(
        "doc_id",
        "lang",
        "n_feats",
        "sum_w6",
        (F.col("m6").cast("double") / F.lit(1000000.0)).alias(
            "log_importance"
        ),
    )


# ---------------------------------------------------------------------------
# trained curation pipeline (the round-10 artifacts composed)
# ---------------------------------------------------------------------------


def _trained_pipeline_sql() -> str:
    """Oracle for [[corpus_pipeline_trained]]: the NB-classifier and
    DSIR oracles embedded verbatim as CTEs (so the composition is
    graded against EXACTLY the per-stage semantics the stage keys are
    graded against), joined back to the corpus and rolled up per
    language."""
    return f"""
    WITH nb AS ({_NB_SQL}),
    sel AS ({_DSIR_SQL})
    SELECT d.lang,
           COUNT(*) AS n_docs,
           CAST(SUM(nb.pred_target) AS BIGINT) AS n_pass_nb,
           CAST(SUM(CASE WHEN sel.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pass_dsir,
           CAST(SUM(CASE WHEN nb.pred_target = 1
                          AND sel.doc_id IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_both,
           COUNT(DISTINCT CASE WHEN nb.pred_target = 1
                                AND sel.doc_id IS NOT NULL
                               THEN sha256(d.text) END)
             AS n_unique_surviving
    FROM documents d
    JOIN nb ON nb.doc_id = d.doc_id
    LEFT JOIN (SELECT doc_id FROM sel) sel ON sel.doc_id = d.doc_id
    GROUP BY d.lang
"""


@query("corpus_pipeline_trained", oracle=_trained_pipeline_sql())
def corpus_pipeline_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The modern curation pipeline — [[corpus_pipeline]]'s heuristic
    gates upgraded to this round's TRAINED artifacts, composed the
    way a production crawl-refresh chains them: score every document
    with the in-engine Naive Bayes quality classifier
    ([[quality_classifier_nb]]), select the importance-resampled
    slice with DSIR ([[corpus_dsir_select]]), and account the
    intersection plus its exact-dedup survivor count, per language —
    the per-stage attrition table a curation run publishes before
    committing a training mix.

    Correctness by construction: the oracle embeds the two stage
    oracles VERBATIM as CTEs, so this key is graded against exactly
    the semantics its stages are graded against — any drift between
    a stage function and its oracle shows up twice. Scale shape: the
    stage plans are unchanged (NB's broadcast-model token scan;
    DSIR's in-row fold + fixed-width model) but all four consumers —
    NB's token explode, DSIR's feature arrays, the join base, and
    the digest rollup — read ONE lazily-checkpointed labeled frame,
    so the scan and its fan_out shuffle run once, not per stage; the
    composition adds two doc-grain equi-joins on doc_id (compact
    rows, AQE-planned) and one per-lang rollup whose distinct-digest
    count shuffles 32-byte hashes, the [[dedup_exact]] trick —
    nothing corpus-text-proportional moves."""
    lab = (
        fan_out(load(spark, sf_dir, "documents"))
        .select("doc_id", "lang", "text", target_label().alias("pos"))
        .localCheckpoint(eager=False)
    )
    nb = nb_quality_scores_of(
        lab.select("doc_id", "text", "pos")
    ).select("doc_id", "pred_target")
    sel = dsir_select_of(lab).select(
        "doc_id", F.lit(1).alias("dsir_selected")
    )
    joined = (
        lab.select("doc_id", "lang", "text")
        .join(nb, "doc_id")
        .join(sel, "doc_id", "left")
    )
    both = (F.col("pred_target") == 1) & F.col("dsir_selected").isNotNull()
    return joined.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("pred_target").cast("bigint").alias("n_pass_nb"),
        F.sum(F.when(F.col("dsir_selected").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass_dsir"),
        F.sum(F.when(both, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass_both"),
        F.countDistinct(F.when(both, F.sha2("text", 256))).alias(
            "n_unique_surviving"
        ),
    )


# ---------------------------------------------------------------------------
# corpus_filter_gopher — the published Gopher quality-rule battery
# ---------------------------------------------------------------------------

#: Gopher rule constants (Rae et al. 2021, "Scaling Language Models:
#: Methods, Analysis & Insights from Training Gopher", Appendix A —
#: the published word-level document filters). Kept verbatim so the
#: report is comparable to the paper's corpus accounting.
_GOPHER_MIN_WORDS = 50
_GOPHER_MAX_WORDS = 100_000
_GOPHER_MWL_MIN = 3      # mean word length lower bound
_GOPHER_MWL_MAX = 10     # mean word length upper bound
_GOPHER_SYMBOL_X10 = 1   # symbol-to-word ratio bound 0.1 → 10·sym > 1·n
_GOPHER_ALPHA_X5 = 4     # ≥80% alpha words → 5·alpha ≥ 4·n
_GOPHER_MIN_STOPWORDS = 2
_GOPHER_STOPWORDS = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)

_GOPHER_SQL = f"""
    WITH base AS (
      SELECT len(toks) AS n,
             length(replace(text, ' ', '')) AS sum_len,
             length(text) - length(replace(text, '#', ''))
               + (length(text) - length(replace(text, '...', ''))) // 3
               AS sym,
             len(list_filter(toks,
                 x -> regexp_matches(x, '[A-Za-z]'))) AS alpha,
             len(list_filter(toks, x -> lower(x) IN
                 {tuple(_GOPHER_STOPWORDS)!s})) AS stop
      FROM (SELECT text, string_split(text, ' ') AS toks FROM documents)
    ),
    flags AS (
      SELECT CASE WHEN n < {_GOPHER_MIN_WORDS}
                    OR n > {_GOPHER_MAX_WORDS} THEN 1 ELSE 0 END AS f_wc,
             CASE WHEN sum_len < {_GOPHER_MWL_MIN} * n
                    OR sum_len > {_GOPHER_MWL_MAX} * n THEN 1 ELSE 0 END
               AS f_mwl,
             CASE WHEN 10 * sym > {_GOPHER_SYMBOL_X10} * n THEN 1 ELSE 0 END
               AS f_sym,
             CASE WHEN 5 * alpha < {_GOPHER_ALPHA_X5} * n THEN 1 ELSE 0 END
               AS f_alpha,
             CASE WHEN stop < {_GOPHER_MIN_STOPWORDS} THEN 1 ELSE 0 END
               AS f_stop
      FROM base
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(f_wc) AS BIGINT) AS n_fail_word_count,
           CAST(SUM(f_mwl) AS BIGINT) AS n_fail_mean_word_len,
           CAST(SUM(f_sym) AS BIGINT) AS n_fail_symbol_ratio,
           CAST(SUM(f_alpha) AS BIGINT) AS n_fail_alpha_words,
           CAST(SUM(f_stop) AS BIGINT) AS n_fail_stopwords,
           CAST(SUM(CASE WHEN f_wc + f_mwl + f_sym + f_alpha + f_stop = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
    FROM flags
"""


@query("corpus_filter_gopher", oracle=_GOPHER_SQL)
def corpus_filter_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PUBLISHED Gopher document-quality battery (Rae et al.
    2021, Appendix A) with per-rule drop accounting — the named,
    citable counterpart to the in-house [[corpus_filter_report]]
    gate: word-count band [{_GOPHER_MIN_WORDS}, {_GOPHER_MAX_WORDS}],
    mean word length in [{_GOPHER_MWL_MIN}, {_GOPHER_MWL_MAX}],
    symbol-to-word ratio ('#' chars + '...' occurrences) ≤ 0.1,
    ≥80% of words containing an alphabetic character, and ≥
    {_GOPHER_MIN_STOPWORDS} canonical stopwords. Running a corpus
    through the literature's exact thresholds is how curation runs
    are compared ACROSS pipelines, which is why the constants are
    kept verbatim rather than fixture-tuned (the fixture's short
    synthetic docs mostly fail the 50-word floor — that asymmetry is
    itself the report's finding, and the per-rule layout makes it
    attributable).

    Exactness: every ratio rule is cross-multiplied into integer
    comparisons (mean-word-length bounds become Σlen vs 3n/10n; the
    80% alpha rule becomes 5·alpha ≥ 4·n; the 0.1 symbol rule
    10·sym > n) — no float anywhere, both engines agree per doc bit
    for bit. Σlen is chars-minus-spaces (one regexp_replace), the
    symbol count is two replace-and-diff passes, and the two word
    classifiers are in-row lambda filters over the token array whose
    predicates reference only the lambda variable (the r14 HOF-audit
    discipline). One projected scan into one single-row aggregate;
    ZERO data-proportional shuffles at any corpus size."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    ell = (
        F.length("text") - F.length(F.regexp_replace("text", r"\.\.\.", ""))
    ) / 3
    base = d.select(
        F.size(toks).alias("n"),
        F.length(F.regexp_replace("text", " ", "")).alias("sum_len"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "#", ""))
            + ell.cast("int")
        ).alias("sym"),
        F.size(
            F.filter(toks, lambda x: x.rlike("[A-Za-z]"))
        ).alias("alpha"),
        F.size(
            F.filter(toks, lambda x: F.lower(x).isin(*_GOPHER_STOPWORDS))
        ).alias("stop"),
    )
    n = F.col("n")
    flags = base.select(
        F.when(
            (n < _GOPHER_MIN_WORDS) | (n > _GOPHER_MAX_WORDS), 1
        ).otherwise(0).alias("f_wc"),
        F.when(
            (F.col("sum_len") < _GOPHER_MWL_MIN * n)
            | (F.col("sum_len") > _GOPHER_MWL_MAX * n),
            1,
        ).otherwise(0).alias("f_mwl"),
        F.when(10 * F.col("sym") > _GOPHER_SYMBOL_X10 * n, 1)
        .otherwise(0)
        .alias("f_sym"),
        F.when(5 * F.col("alpha") < _GOPHER_ALPHA_X5 * n, 1)
        .otherwise(0)
        .alias("f_alpha"),
        F.when(F.col("stop") < _GOPHER_MIN_STOPWORDS, 1)
        .otherwise(0)
        .alias("f_stop"),
    )
    total = (
        F.col("f_wc")
        + F.col("f_mwl")
        + F.col("f_sym")
        + F.col("f_alpha")
        + F.col("f_stop")
    )
    return flags.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("f_wc").cast("bigint").alias("n_fail_word_count"),
        F.sum("f_mwl").cast("bigint").alias("n_fail_mean_word_len"),
        F.sum("f_sym").cast("bigint").alias("n_fail_symbol_ratio"),
        F.sum("f_alpha").cast("bigint").alias("n_fail_alpha_words"),
        F.sum("f_stop").cast("bigint").alias("n_fail_stopwords"),
        F.sum(F.when(total == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass"),
    )


corpus_filter_gopher.__doc__ = (
    corpus_filter_gopher.__doc__.replace(
        "{_GOPHER_MIN_WORDS}", str(_GOPHER_MIN_WORDS)
    )
    .replace("{_GOPHER_MAX_WORDS}", str(_GOPHER_MAX_WORDS))
    .replace("{_GOPHER_MWL_MIN}", str(_GOPHER_MWL_MIN))
    .replace("{_GOPHER_MWL_MAX}", str(_GOPHER_MWL_MAX))
    .replace("{_GOPHER_MIN_STOPWORDS}", str(_GOPHER_MIN_STOPWORDS))
)


# ---------------------------------------------------------------------------
# corpus_span_corruption — T5-style deterministic denoising-span plan
# ---------------------------------------------------------------------------

#: One span start per _SPAN_MOD hash residues (5% of positions) of
#: fixed length _SPAN_LEN: expected masked fraction 1 − 0.95³ ≈ 14%,
#: the T5 ~15% corruption budget (Raffel et al. 2020, mean span 3).
_SPAN_MOD = 20
_SPAN_LEN = 3

#: Span-start predicate for token position j of doc_id — the
#: engine-shared md5 32-bit hash, so the oracle replays the exact
#: draw (the corpus_sample_hash convention: hashes ARE the RNG).
_SPAN_START_SPARK = (
    md5_u32_sql("concat(CAST(doc_id AS STRING), ':', CAST(j AS STRING))")
    + f" % {_SPAN_MOD} = 0"
)
_SPAN_START_DUCK = (
    md5_u32_duck(
        "concat(CAST(doc_id AS VARCHAR), ':', CAST(j AS VARCHAR))"
    )
    + f" % {_SPAN_MOD} = 0"
)

_SPANC_SQL = f"""
    WITH t0 AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    t1 AS (
      SELECT doc_id, n_tokens,
             list_transform(range(1, n_tokens + 1), j ->
               CASE WHEN {_SPAN_START_DUCK} THEN 1 ELSE 0 END) AS sa
      FROM t0
    ),
    t2 AS (
      SELECT doc_id, n_tokens,
             list_transform(range(1, n_tokens + 1), i ->
               CASE WHEN list_extract(sa, i)
                    + CASE WHEN i >= 2
                           THEN list_extract(sa, i - 1) ELSE 0 END
                    + CASE WHEN i >= 3
                           THEN list_extract(sa, i - 2) ELSE 0 END
                    > 0 THEN 1 ELSE 0 END) AS ma
      FROM t1
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(list_sum(ma) AS BIGINT) AS n_masked,
           CAST(list_sum(list_transform(range(1, n_tokens + 1), i ->
             CASE WHEN list_extract(ma, i) = 1
                   AND (CASE WHEN i >= 2
                             THEN list_extract(ma, i - 1)
                             ELSE 0 END) = 0
                  THEN 1 ELSE 0 END)) AS BIGINT) AS n_spans,
           CAST(list_sum(list_transform(range(1, n_tokens + 1), i ->
             i * list_extract(ma, i))) AS BIGINT) AS mask_checksum,
           CAST(list_sum(ma) AS DOUBLE) / n_tokens AS mask_ratio
    FROM t2
    ORDER BY doc_id
"""


@query("corpus_span_corruption", oracle=_SPANC_SQL)
def corpus_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5/UL2 denoising-objective span plan per document: which
    token positions a deterministic 5%-start / length-{_SPAN_LEN}
    span corruption masks, with per-doc span counts, masked totals,
    a position checksum pinning the exact mask set, and the realized
    corruption ratio (≈15% — the T5 budget). This is the
    objective-side sibling of [[corpus_pack_sequences]]: packing
    decides sequence boundaries, this decides denoising targets —
    and the hash-is-the-RNG determinism ([[corpus_sample_hash]],
    [[corpus_shuffle_deterministic]]) is what makes the plan
    REPRODUCIBLE across reruns and engines (re-materializing a
    corrupted epoch must mask the same spans). Production emits the
    sentinel-token input/target strings with the same flags and a
    string fold; the driver-graded surface sticks to the exact
    integer accounting (raw corrupted strings would add nothing the
    checksum doesn't already pin).

    Exactness: the span draw is the engine-shared md5-u32 residue
    per (doc, position); overlap merging is pure integer flag
    algebra over GUARDED neighbor lookups (negative list indices
    wrap to end-of-list in BOTH engines — the i ≥ 2/3 CASEs are
    load-bearing); the only float is the final ratio division.

    Plan: everything is in-row HOFs over let-bound arrays (start
    flags bound once via the [[dedup.py]] array-binder — referencing
    the transform TREE inside the mask lambda would re-hash all T
    positions PER position, the r14 O(T²) cliff; the mask array is a
    multi-referenced projection, which CollapseProject keeps); zero
    algorithmic exchanges at any corpus size — the same
    shuffle-free class as [[doc_fingerprint_winnow]] and
    [[corpus_filter_gopher]]."""
    d = load(spark, sf_dir, "documents")
    p1 = d.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    sa_expr = (
        "transform(sequence(1, n_tokens), j -> "
        f"CASE WHEN {_SPAN_START_SPARK} THEN 1 ELSE 0 END)"
    )
    ma_expr = (
        f"try_element_at(transform(array({sa_expr}), sa -> "
        "transform(sequence(1, n_tokens), i -> "
        "CASE WHEN element_at(sa, i) "
        "+ CASE WHEN i >= 2 THEN element_at(sa, i - 1) ELSE 0 END "
        "+ CASE WHEN i >= 3 THEN element_at(sa, i - 2) ELSE 0 END "
        "> 0 THEN 1 ELSE 0 END)), 1)"
    )
    p2 = p1.select(
        "doc_id", "n_tokens", F.expr(ma_expr).alias("ma")
    )
    zero = "CAST(0 AS BIGINT)"
    return p2.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.expr(
            f"aggregate(ma, {zero}, (a, x) -> a + x)"
        ).alias("n_masked"),
        F.expr(
            f"aggregate(sequence(1, n_tokens), {zero}, (a, i) -> a + "
            "CASE WHEN element_at(ma, i) = 1 AND "
            "(CASE WHEN i >= 2 THEN element_at(ma, i - 1) ELSE 0 END)"
            " = 0 THEN 1 ELSE 0 END)"
        ).alias("n_spans"),
        F.expr(
            f"aggregate(sequence(1, n_tokens), {zero}, (a, i) -> "
            "a + i * element_at(ma, i))"
        ).alias("mask_checksum"),
        F.expr(
            "CAST(aggregate(ma, 0, (a, x) -> a + x) AS DOUBLE)"
            " / n_tokens"
        ).alias("mask_ratio"),
    ).orderBy("doc_id")


corpus_span_corruption.__doc__ = corpus_span_corruption.__doc__.replace(
    "{_SPAN_LEN}", str(_SPAN_LEN)
)

"""Deduplication family: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

EXT tier (north-star): the dedup ladder a training-data pipeline runs
before anything else. Scale design per rung:

- exact:        hash → groupBy digest. The shuffle carries 32-byte
                digests; documents never move twice.
- n-gram Jaccard: prefix-filter + verify (PPJoin family): only the
                first ~(1-t) fraction of each sorted shingle set
                enters the self-join, then exact verification.
                Exact; the LSH rungs below are the sketch path.
- repeated spans: sliding window hash → cross-doc window over the
                collapsed (hash, doc) table; k docs sharing a span
                cost k rows.
- semantic:     SemDeDup — K broadcast centroids bucket vectors;
                intra-cluster pairwise via one numpy matmul per
                Arrow batch.
- MinHash-LSH:  shingles → minhash signature → band buckets →
                candidate pairs only within buckets (spark.ml
                MinHashLSH, seeded). Cost ∝ candidates, not n².
- SimHash:      64-bit signature per doc → band join on 16-bit chunks
                → hamming check. Signature generation is one pass.
- embedding:    cosine near-dup over vectors; brute-force self-join
                here (500 docs), LSH bucketing at scale (see
                similarity.py).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import fan_out, load
from ..functions.vector import as_double_array, cosine
from ..registry import query

# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, sha256(text) AS content_hash FROM documents
    )
    SELECT content_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id,
           COUNT(*) AS n_copies
    FROM keyed
    GROUP BY content_hash
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: keep min(doc_id) per sha256(text).
    Equivalent to dropDuplicates(["text"]) but with a deterministic
    keeper and a digest-only shuffle (at 100 TB you shuffle 32-byte
    hashes, then semi-join winners back against the corpus)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.withColumn("content_hash", F.sha2(F.col("text"), 256))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (shingle self-join)
# ---------------------------------------------------------------------------


def _shingles(col, n: int = 3):
    """Word n-gram shingles as distinct strings (space-joined).
    Guarded so docs with < n tokens yield an empty array (Spark's
    sequence(1, 0) would otherwise produce [1, 0], not []).

    This is the per-doc ARRAY shape the Spark-ML MinHashLSH path
    ([[minhash_lsh_pairs]]) needs for HashingTF; every other rung
    shingles via the [[span_stream]] generator. The two definitions
    MUST stay identical (tokenize on single spaces, size ≥ n guard,
    space-joined n-grams) — pinned by
    tests/test_dedup_recall.py::test_shingle_definitions_agree, so a
    change to either desyncs loudly instead of silently (r16
    self-review).

    The split is LET-BOUND via a 1-element transform (the r13 FFD
    interpreted-HOF lesson, r14 registry audit): referenced directly
    from the per-shingle lambda, split(text) would re-tokenize the
    whole document PER SHINGLE — O(T²) per doc, a latent cliff on
    long documents."""
    toks = F.split(col, " ")

    def body(tk):
        idx = F.sequence(F.lit(1), F.size(tk) - (n - 1))
        return F.when(
            F.size(tk) >= n,
            F.array_distinct(
                F.transform(
                    idx, lambda i: F.concat_ws(" ", F.slice(tk, i, n))
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.try_element_at(F.transform(F.array(toks), body), F.lit(1))


_JACCARD_SQL = """
    WITH shingled AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
                           i -> array_to_string(toks[i:i+2], ' '))) AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    ),
    exploded AS (SELECT doc_id, unnest(sh) AS shingle FROM shingled),
    sizes AS (SELECT doc_id, len(sh) AS n_sh FROM shingled),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM exploded a JOIN exploded b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT p.doc_a, p.doc_b,
           ROUND(CAST(p.inter AS DOUBLE)
                 / (sa.n_sh + sb.n_sh - p.inter), 4) AS jaccard
    FROM pairs p
    JOIN sizes sa ON p.doc_a = sa.doc_id
    JOIN sizes sb ON p.doc_b = sb.doc_id
    WHERE CAST(p.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - p.inter) >= 0.8
"""


#: stop-shingle document-frequency cap: shingles appearing in more
#: documents than this are dropped BEFORE the self-join. A shingle
#: with df=k emits k(k-1)/2 pairs through one sort-merge run, so the
#: cap bounds the worst shingle's pair fan-out at ~500k regardless of
#: corpus size; shingles that common carry ~0 Jaccard discrimination.
#: Far above the fixtures' max df (7 at sf0.01, 25 at sf0.1), so
#: fixture output is byte-identical to the uncapped form.
#: NB the two rungs sharing this constant measure df over DIFFERENT
#: streams (r16 self-review — per-rung semantics, both bound the
#: quadratic fan-out): ``jaccard_pairs`` counts df over the PREFIX
#: explosion (both join sides are prefixes, so the prefix df is the
#: fan-out that matters there), ``containment_pairs`` over the full
#: posting list (its probe side explodes every shingle).
_SHINGLE_DF_CAP = 1000


@query("dedup_ngram_jaccard", oracle=_JACCARD_SQL)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs (≥ 0.8), prefix-filter
    + verify (the PPJoin family: Bayardo/Chaudhuri/Xiao's set-
    similarity joins): shingle (``_shingle_sets``: codegen generator
    + int64 hash + regroup) → sorted set → explode only the PREFIX
    (the first
    ``n − ⌈t·n⌉ + 1`` elements under the global hash order; two sets
    with Jaccard ≥ t must share a prefix element, by pigeonhole) →
    self-join prefixes with an exact size-band predicate (J ≥ t ⇒
    t·|b| ≤ |a|) → distinct candidate pairs → verify with one
    ``array_intersect`` over the full sorted sets. Core pipeline in
    ``jaccard_pairs`` (factored for the skew test; the pigeonhole
    property itself is property-tested in tests/test_properties.py).

    Why this shape wins at every scale: at t = 0.8 only ~20% of each
    doc's shingles enter the self-join, so the join input shrinks 5×
    per side and the candidate fan-out — the quadratic term — shrinks
    ~25× before any verification work. Verification is two doc-keyed
    joins (linear shuffles) plus a JVM-side intersect of two sorted
    long arrays per candidate. Round-7 measurement at sf0.1,
    interleaved best-of-3: 1.6s vs 4.5s for the round-2 full
    self-join, and FASTER than the DuckDB oracle (2.0s) — identical
    256 output rows.

    Exactness guards, because the output is oracle-checked: the size
    band and prefix length use integer cross-multiplication against a
    rational p/q ≤ t (never float ``0.8·n``, whose binary
    representation is slightly ABOVE 4/5 and would wrongly prune a
    pair at exactly J = 0.8); the final Jaccard is computed from the
    untruncated sets, so the report is exact, not a bound.

    Skew defense for 100 TB: a stop-shingle shared by k docs
    produces k² candidates through one sort-merge run, so shingles
    with document frequency > ``_SHINGLE_DF_CAP`` are anti-joined out
    of the PREFIX explosion (broadcast anti-join; the hot set is ≤
    occurrences/cap entries by construction). Verification still sees
    the full sets, so surviving pairs keep their exact Jaccard; a
    pair whose only shared shingles are hot is missed — those share
    nothing discriminative. At the fixture SFs no shingle reaches the
    cap, so the oracle stays exact. The MinHash-LSH rung
    (dedup_fuzzy) remains the approximate scale path; AQE skew-join
    still splits oversized runs below the cap at runtime."""
    d = load(spark, sf_dir, "documents")
    return jaccard_pairs(d, threshold=0.8, df_cap=_SHINGLE_DF_CAP)


def _rational_le(t: float, max_den: int = 10_000) -> tuple[int, int]:
    """Largest p/q ≤ t with q = max_den (reduced). Used for exact
    integer pruning predicates: pruning against p/q ≤ t can never
    drop a pair the float comparison ``jac >= t`` would keep."""
    from fractions import Fraction

    p = int(t * max_den)
    while Fraction(p, max_den) > Fraction(t):  # float-rounding guard
        p -= 1
    f = Fraction(max(p, 0), max_den)
    return f.numerator, f.denominator


def _shingle_sets(d: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, sh) with sh = SORTED DISTINCT int64-hashed word
    n-gram shingles — the shared front end of the exact pair rungs
    ([[dedup_ngram_jaccard]], [[dedup_containment]]).

    Built as generator + codegen hash + one doc-keyed regroup, NOT
    the in-row higher-order ``transform`` it replaced: lambda
    expressions are interpreted (excluded from whole-stage codegen),
    and the transform front end measured 2.0 s at sf0.1 against
    0.3 s for this shape — the regroup's one extra shuffle carries
    (doc_id, 8-byte hash) pairs and costs far less than running the
    shingle loop in the expression interpreter. Hashing to int64
    keeps every downstream explode/shuffle at 8 bytes per shingle
    (64-bit collisions are negligible at any corpus size);
    ``sort_array`` gives the global order the prefix filter needs
    and makes verification an O(|a|+|b|) sorted intersect."""
    return span_stream(d, n=n).groupBy("doc_id").agg(
        F.sort_array(F.collect_set("h")).alias("sh")
    )


def span_stream(
    d: DataFrame, n: int = 3, hashed: bool = True
) -> DataFrame:
    """(doc_id, h|s) stream of word n-gram spans — the ONE generator
    + codegen projection every shingle consumer shares
    ([[dedup_ngram_jaccard]] / [[dedup_containment]] via
    ``_shingle_sets``, ``minhash_df_pairs``, training_data's
    decontamination grams): a single definition of tokenization, the
    ``size ≥ n`` guard, and the hash, so the dedup ladder's rungs
    cannot silently desync (minhash recall is cross-checked against
    Jaccard pairs — both must shingle identically). ``hashed``
    emits int64 ``h`` (8-byte shuffle keys); False keeps the string
    span ``s`` for consumers that seed their own hashes. The stream
    may repeat a span within a doc — distinct-at-the-end consumers
    (collect_set, count_distinct, min) are unaffected and per-row
    dedup here would only add work. fan_out spreads the
    generator+hash stage across cores on single-split local inputs
    (+0.12 s at sf0.1, a no-op-ish shuffle on a real multi-split
    scan — catalog.fan_out); lambdas are deliberately absent: the
    transform front end this replaced ran interpreted, 7× slower."""
    toks = fan_out(d).select(
        "doc_id", F.split("text", " ").alias("t")
    ).filter(F.size("t") >= n)
    span = F.concat_ws(" ", F.slice("t", F.col("i"), n))
    return toks.select(
        "doc_id",
        "t",
        F.explode(
            F.sequence(F.lit(1), F.size("t") - F.lit(n - 1))
        ).alias("i"),
    ).select(
        "doc_id",
        F.xxhash64(span).alias("h") if hashed else span.alias("s"),
    )


def jaccard_pairs(
    d: DataFrame,
    threshold: float = 0.8,
    df_cap: int | None = _SHINGLE_DF_CAP,
    pair_pred=None,
) -> DataFrame:
    """Exact shingle-Jaccard pair pipeline over any (doc_id, text)
    frame — prefix-filter candidate generation + array_intersect
    verification (see ``dedup_ngram_jaccard`` for the design).
    ``df_cap`` drops stop-shingles (document frequency > cap) from
    candidate generation; ``None`` disables the cap (the skew test
    measures the pair blowup both ways). ``threshold=0.0``
    degenerates to the full self-join (prefix = whole set).
    ``pair_pred`` (a Column over ``doc_a``/``doc_b``) restricts the
    pair population INSIDE candidate generation — same output as
    post-filtering, without paying verification for pairs the caller
    will discard (`dedup_minhash_incremental` prunes the ~64%
    corpus×corpus mass this way)."""
    # the sorted sets feed prefix explosion AND both verification
    # sides — lazy-checkpoint once instead of re-shingling three times
    shingled = _shingle_sets(d).localCheckpoint(eager=False)
    p, q = _rational_le(threshold)
    n = F.size("sh")
    # prefix length n − ⌈t·n⌉ + 1, with ⌈p·n/q⌉ = floor((p·n+q−1)/q)
    # computed in exact integer space (p·n ≤ ~8e9 is double-exact,
    # but stay integral anyway); p/q ≤ t ⇒ this prefix is never
    # shorter than the pigeonhole minimum
    ceil_tn = F.floor((n * p + (q - 1)) / q).cast("int")
    plen = n - ceil_tn + 1
    pref = shingled.select(
        "doc_id",
        n.alias("n_sh"),
        F.explode(F.slice("sh", 1, plen)).alias("shingle"),
    )
    if df_cap is not None:
        # lazy-checkpoint the hot list: pref is consumed as BOTH join
        # sides below, and without the pin each side re-embeds the
        # whole hot subtree — a SECOND full prefix explode + count
        # exchange for one tiny (≤ occurrences/cap rows, usually
        # empty) stop-shingle list; the two subtrees never
        # canonicalize equal, so ReuseExchange does not fire (the
        # r17 PRF/basket no-reuse trap, re-measured here: 2 hot
        # chains in the r18 before-plan). One pin = one pass
        # (guide §2.4; r18 A/B −9%, plan Exchange 3→2)
        hot = (
            pref.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > df_cap)
            .select("shingle")
            .localCheckpoint(eager=False)
        )
        # NB: a USING join puts the join column first — re-project to
        # the order the positional renames below need
        pref = pref.join(F.broadcast(hot), "shingle", "left_anti").select(
            "doc_id", "n_sh", "shingle"
        )
    a = pref.toDF("doc_a", "na", "shingle")
    b = pref.toDF("doc_b", "nb", "shingle")
    # size band: J ≥ t ⇒ min/max ≥ t; exact integer cross-multiply
    # against p/q ≤ t so no float rounding can prune a true pair
    keep = (
        (F.col("doc_a") < F.col("doc_b"))
        & (F.col("na") * q >= F.col("nb") * p)
        & (F.col("nb") * q >= F.col("na") * p)
    )
    if pair_pred is not None:
        keep = keep & pair_pred
    cand = (
        a.join(b, "shingle")
        .filter(keep)
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = shingled.toDF("doc_a", "sh_a")
    sb = shingled.toDF("doc_b", "sh_b")
    ver = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("inter"),
            F.size("sh_a").alias("na"),
            F.size("sh_b").alias("nb"),
        )
    )
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    )
    return (
        ver.filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


_CONTAIN_SQL = """
    WITH shingled AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
                           i -> array_to_string(toks[i:i+2], ' '))) AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    ),
    exploded AS (SELECT doc_id, unnest(sh) AS shingle FROM shingled),
    sizes AS (SELECT doc_id, len(sh) AS n_sh FROM shingled),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM exploded a JOIN exploded b
        ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b,
           sa.n_sh AS n_sh_a,
           CAST(p.inter AS BIGINT) AS inter,
           ROUND(CAST(p.inter AS DOUBLE) / sa.n_sh, 4) AS containment
    FROM pairs p JOIN sizes sa ON p.doc_a = sa.doc_id
    WHERE p.inter * 10 >= sa.n_sh * 9
"""


@query("dedup_containment", oracle=_CONTAIN_SQL)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed shingle CONTAINMENT pairs (C(A→B) = |A∩B|/|A| ≥ 0.9)
    — partial-copy detection, the asymmetric near-dup
    [[dedup_ngram_jaccard]] structurally misses: a short document
    pasted inside a long one has low Jaccard (union is dominated by
    the long doc) but containment ≈ 1. The standard third rung of a
    corpus dedup ladder (exact → Jaccard → containment), cf. the
    containment variants of the PPJoin set-similarity family.

    Shape mirrors the Jaccard prefix-filter with the containment-
    specific asymmetry:

    - **A-side prefix only.** C ≥ t means at most ⌈t·|A|⌉ − 1 of A's
      shingles may miss B, so a qualifying pair must share one of
      A's first |A| − ⌈t·|A|⌉ + 1 sorted shingles (pigeonhole on A
      alone — B cannot be prefix-pruned, its posting list explodes
      in full).
    - **One-sided size band**: C ≥ t ⇒ |B| ≥ ⌈t·|A|⌉, as integer
      cross-multiplication against the exact rational 9/10 (never
      float 0.9).
    - **Verification is exact**: one array_intersect over the full
      sorted sets; the threshold test is ``inter·10 ≥ |A|·9`` in
      both engines, so no float rounding can disagree at exactly
      C = 0.9.
    - Stop-shingles past ``_SHINGLE_DF_CAP`` leave candidate
      generation via a broadcast anti-join (k-doc shingles emit k²
      directed candidates); verification still sees full sets, same
      contract as the Jaccard rung. Fixture df max (25) is far below
      the cap, so oracle output is byte-identical to uncapped.

    Scale: the posting-list self-join input is prefix×full rather
    than prefix×prefix, so this rung costs more than Jaccard at the
    same threshold — at 100 TB it runs AFTER exact+Jaccard dedup has
    shrunk the corpus, against the (smaller) suspected-template
    slice."""
    return containment_pairs(load(spark, sf_dir, "documents"))


def containment_pairs(
    d: DataFrame,
    p: int = 9,
    q: int = 10,
    df_cap: int | None = _SHINGLE_DF_CAP,
) -> DataFrame:
    """Directed containment pipeline over any (doc_id, text) frame at
    threshold p/q — factored from [[dedup_containment]] (see its
    docstring for the design) so tests can drive synthetic corpora
    (e.g. the short-inside-long pair Jaccard misses). ``df_cap``
    drops stop-shingles from BOTH join sides; ``None`` disables it
    (the skew stress measures the candidate blowup both ways)."""
    shingled = _shingle_sets(d).localCheckpoint(eager=False)
    n = F.size("sh")
    ceil_tn = F.floor((n * p + (q - 1)) / q).cast("int")
    pref = shingled.select(
        "doc_id",
        n.alias("n_sh"),
        F.explode(F.slice("sh", 1, n - ceil_tn + 1)).alias("shingle"),
    )
    post = shingled.select(
        "doc_id", n.alias("n_sh"), F.explode("sh").alias("shingle")
    )
    if df_cap is not None:
        # pinned for the same reason as the Jaccard rung, and worth
        # MORE here: the hot list counts df over the FULL posting
        # explosion, and it is applied to both pref and post — the
        # unpinned form ran that full explode + count exchange twice
        # (r18 before-plan: two identical hot chains)
        hot = (
            post.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > df_cap)
            .select("shingle")
            .localCheckpoint(eager=False)
        )
        pref = pref.join(F.broadcast(hot), "shingle", "left_anti")
        post = post.join(F.broadcast(hot), "shingle", "left_anti")
    a = pref.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"), "shingle"
    )
    b = post.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"), "shingle"
    )
    cand = (
        a.join(b, "shingle")
        .filter(
            (F.col("doc_a") != F.col("doc_b"))
            & (F.col("nb") * q >= F.col("na") * p)
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = shingled.toDF("doc_a", "sh_a")
    sb = shingled.toDF("doc_b", "sh_b")
    ver = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size("sh_a").cast("bigint").alias("n_sh_a"),
            F.size(F.array_intersect("sh_a", "sh_b"))
            .cast("bigint")
            .alias("inter"),
        )
    )
    return ver.filter(F.col("inter") * q >= F.col("n_sh_a") * p).select(
        "doc_a",
        "doc_b",
        "n_sh_a",
        "inter",
        F.round(
            F.col("inter").cast("double") / F.col("n_sh_a"), 4
        ).alias("containment"),
    )


# ---------------------------------------------------------------------------
# MinHash-LSH (approximate Jaccard at scale)
# ---------------------------------------------------------------------------


def _recall_summary(exact: DataFrame, candidates: DataFrame) -> DataFrame:
    """(n_exact_pairs_total, n_exact_pairs_recalled) — how many of the
    exact Jaccard-0.8 pairs an approximate rung's candidate set
    contains. This is the VERIFICATION harness for the driver oracle
    (the exact side is the cost; production runs the pair helper
    alone): the DuckDB oracle computes the same total from the exact
    SQL and asserts recalled == total, the sketch-parameter contract
    the recall tests pin (16-table MinHash misses a 0.8 pair with
    p ≈ 7e-12)."""
    marked = exact.select("doc_a", "doc_b").join(
        candidates.select("doc_a", "doc_b", F.lit(1).alias("hit")).distinct(),
        ["doc_a", "doc_b"],
        "left",
    )
    return marked.agg(
        F.count("*").alias("n_exact_pairs_total"),
        F.count("hit").alias("n_exact_pairs_recalled"),
    )


_RECALL_SQL = f"""
    SELECT COUNT(*) AS n_exact_pairs_total,
           COUNT(*) AS n_exact_pairs_recalled
    FROM ({_JACCARD_SQL})
"""


def minhash_lsh_pairs(d: DataFrame) -> DataFrame:
    """MinHash-LSH near-dup candidates over any (doc_id, text) frame:
    word-3-gram shingles → HashingTF (2^18 bins) → MinHashLSH(16
    tables, seed=42) → approxSimilarityJoin at Jaccard distance
    ≤ 0.3. This is the 100 TB dedup workhorse: cost scales with
    colliding candidates, not n². Seeded & deterministic."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    shingled = fan_out(d).select("doc_id", _shingles(F.col("text")).alias("sh")).filter(
        F.size("sh") > 0
    )
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=1 << 18)
    feats = tf.transform(shingled)
    lsh = MinHashLSH(inputCol="features", outputCol="sig", numHashTables=16, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.3, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
    )


@query("dedup_fuzzy", oracle=_RECALL_SQL)
def dedup_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup detection, driver-checked by RECALL: the
    sketch itself is engine-specific (no SQL twin exists), so the
    registered query emits how many of the exact Jaccard-0.8 pairs
    the LSH candidate set recalls, and the DuckDB oracle derives the
    same pair set exactly and asserts total recall — converting what
    was a rows-only check into a value-checked row. Production runs
    ``minhash_lsh_pairs`` alone (cost ∝ candidates, not n²); the
    exact-pair join here exists only to be checkable."""
    d = load(spark, sf_dir, "documents")
    return _recall_summary(jaccard_pairs(d), minhash_lsh_pairs(d))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 64
_SIMHASH_BANDS = 4  # 16 bits per band


def simhash_sigs(d: DataFrame) -> DataFrame:
    """(doc_id, sig): 64-bit SimHash signatures as PURE WHOLE-STAGE
    CODEGEN — token explode → xxhash64 → 64 conditional bit-vote sums
    in one map-side-combined aggregate → signed bit reassembly. This
    replaced the r8 pandas_udf whose per-token Python loop was the one
    non-JVM compute in the dedup family (r10 VERDICT ask #7); the
    token hash moved md5[:8] → the built-in ``xxhash64`` with it
    (only determinism matters to SimHash, not which 64-bit hash).

    Scale shape: the explode never reaches an exchange — the 64 vote
    sums partially aggregate map-side, so the only shuffled state is
    one (doc_id, 64 longs) row per document (~0.5 KB/doc, independent
    of document length). Empty tokens vote 0 rather than being
    filtered so a whitespace-only document keeps its row (split always
    yields ≥1 element) and signs to sig=0, matching the old UDF.

    Bit 63 reassembles via ``shiftleft(1L, 63)`` = Long.MIN_VALUE;
    the terms are bit-disjoint so ``+`` is exact OR and the min-long
    term cannot overflow against the lower 63 bits."""
    import functools

    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            F.when(F.col("tok") == "", 0).otherwise(
                F.when(
                    F.shiftrightunsigned("h", i).bitwiseAND(F.lit(1)) == 1,
                    1,
                ).otherwise(-1)
            )
        ).alias(f"v{i}")
        for i in range(_SIMHASH_BITS)
    ]
    one = F.lit(1).cast("long")
    sig = functools.reduce(
        lambda a, b: a + b,
        [
            F.when(F.col(f"v{i}") > 0, F.shiftleft(one, i)).otherwise(
                F.lit(0).cast("long")
            )
            for i in range(_SIMHASH_BITS)
        ],
    )
    return tok.groupBy("doc_id").agg(*votes).select(
        "doc_id", sig.alias("sig")
    )


@query(
    "dedup_simhash",
    oracle="""
    SELECT COUNT(*) AS n_dups_expected,
           COUNT(*) AS n_dups_flagged
    FROM documents WHERE doc_id % 5 = 0
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup detection, driver-checked by its DEFINING
    invariant: identical texts hash to identical 64-bit signatures,
    and the 4×16-bit band join finds every hamming-0 pair (all bands
    collide). Hamming ≤ 6 is a different similarity measure than
    3-gram Jaccard (fixture recall of J-0.8 pairs is ~88%, honestly
    NOT total), so instead of a recall-vs-Jaccard oracle this query
    doubles every 5th document under a shifted id and counts the
    constructed duplicates the band join flags at hamming 0; the
    oracle counts the same selection exactly. Production runs
    ``simhash_pairs`` (one signature pass, band self-join touches
    only band-colliding pairs)."""
    offset = 10_000_000
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    sel = d.filter(F.col("doc_id") % 5 == 0)
    doubled = fan_out(d).unionByName(
        sel.select((F.col("doc_id") + offset).alias("doc_id"), "text")
    )
    pairs = simhash_pairs(doubled)
    flagged = pairs.filter(
        (F.col("doc_b") == F.col("doc_a") + offset) & (F.col("hamming") == 0)
    ).select("doc_a").distinct()
    return sel.agg(F.count("*").alias("n_dups_expected")).crossJoin(
        flagged.agg(F.count("*").alias("n_dups_flagged"))
    )


def simhash_pairs(d: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Core SimHash pipeline over any (doc_id, text) frame — split out
    so tests can feed constructed duplicates (the fixtures contain
    only near-dups, never byte-identical texts)."""
    sigs = simhash_sigs(d)

    bands = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("sig"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for i in range(_SIMHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    a = bands.alias("a")
    b = bands.alias("b")
    hamming = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


@query(
    "dedup_embedding",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]), 4) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ORDER BY cos_sim DESC, vec_a ASC, vec_b ASC
    LIMIT 20
    """,
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: top-20 most-similar vector pairs
    (rounded cosine, id tie-breaks → deterministic). Brute-force
    self-join at this SF; the LSH-bucketed variant for scale is
    similarity.py::sim_search_lsh. Cosine accumulates in double on
    both engines."""
    e = fan_out(load(spark, sf_dir, "embeddings")).select(
        "vec_id", as_double_array(F.col("embedding")).alias("emb")
    )
    a = e.alias("a")
    b = e.alias("b")
    sim = cosine(F.col("a.emb"), F.col("b.emb"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(sim, 4).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_a").asc(), F.col("vec_b").asc())
        .limit(20)
    )


_MH_PERMS = 32   # minhash signature length
_MH_BAND = 4     # rows per band → 8 bands


def minhash_signatures(d: DataFrame) -> DataFrame:
    """(doc_id, sig) — the 32-permutation MinHash signature as 32
    MIN aggregates over the shared [[span_stream]] shingle stream
    (seeded xxhash64, whole-stage codegen, map-side partial mins).
    THE single signature definition: `minhash_df_pairs` and
    `dedup_minhash_incremental` both build from it, so the batch
    side of an incremental run can never hash differently from the
    corpus index it probes."""
    spans = span_stream(d, n=3, hashed=False)
    return spans.groupBy("doc_id").agg(
        F.array(
            *[
                F.min(F.xxhash64(F.lit(i), F.col("s")))
                for i in range(_MH_PERMS)
            ]
        ).alias("sig")
    )


def minhash_band_keys(d: DataFrame) -> DataFrame:
    """(doc_id, sig, band, key) — the banded LSH keys (4 rows × 8
    bands, each band one xxhash64 of its 4 signature slots) over
    [[minhash_signatures]]. One explode × 8 per doc."""
    n_bands = _MH_PERMS // _MH_BAND
    return (
        minhash_signatures(d)
        .select(
            "doc_id",
            "sig",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.xxhash64(
                                *[
                                    F.col("sig")[b * _MH_BAND + r]
                                    for r in range(_MH_BAND)
                                ]
                            ).alias("key"),
                        )
                        for b in range(n_bands)
                    ]
                )
            ).alias("bk"),
        )
        .select("doc_id", "sig", "bk.band", "bk.key")
    )


def _mh_est_jaccard():
    """Signature-estimated Jaccard between two aliased band frames
    ``a``/``b`` — matching-slot fraction of the 32-wide signatures."""
    return (
        F.size(
            F.filter(
                F.zip_with(
                    F.col("a.sig"), F.col("b.sig"), lambda x, y: x == y
                ),
                lambda eq: eq,
            )
        ).cast("double")
        / _MH_PERMS
    )


#: Signature-estimated-Jaccard admission threshold for band-collision
#: candidates — ONE constant for every MinHash rung, so the all-pairs
#: and incremental paths cannot be tuned apart.
_MH_EST_T = 0.7


def _mh_candidate_pairs(
    a_bands: DataFrame,
    b_bands: DataFrame,
    out_a: str,
    out_b: str,
    self_pairs: bool = False,
) -> DataFrame:
    """Band-collision candidate pairs between two
    [[minhash_band_keys]] frames, verified in-row at the shared
    ``_MH_EST_T`` estimate threshold — the ONE candidate join both
    `minhash_df_pairs` (``self_pairs=True``: unordered pairs of one
    frame, ``a.doc_id < b.doc_id``) and `minhash_incremental_pairs`
    (corpus × batch) run, so a threshold or join-shape change can
    never diverge the rungs. The self-join guard is a flag, not a
    caller-supplied Column — the join aliases are internal here and
    callers must not depend on them."""
    cond = (F.col("a.band") == F.col("b.band")) & (
        F.col("a.key") == F.col("b.key")
    )
    if self_pairs:
        cond = cond & (F.col("a.doc_id") < F.col("b.doc_id"))
    return (
        a_bands.alias("a")
        .join(b_bands.alias("b"), cond)
        .select(
            F.col("a.doc_id").alias(out_a),
            F.col("b.doc_id").alias(out_b),
            F.round(_mh_est_jaccard(), 4).alias("est_jaccard"),
        )
        .distinct()
        .filter(F.col("est_jaccard") >= _MH_EST_T)
    )


@query("dedup_minhash_df", oracle=_RECALL_SQL)
def dedup_minhash_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-DataFrame MinHash-LSH, driver-checked by RECALL against
    the exact Jaccard pair set (same contract as [[dedup_fuzzy]]):
    the oracle derives the exact pairs in SQL and asserts the banded
    sketch recalls all of them. Production runs
    ``minhash_df_pairs`` alone."""
    d = load(spark, sf_dir, "documents")
    return _recall_summary(jaccard_pairs(d), minhash_df_pairs(d))


def minhash_df_pairs(d: DataFrame) -> DataFrame:
    """Pure-DataFrame MinHash-LSH (no spark.ml): 32 minhashes per doc
    via seeded xxhash64 over shingles (min per seed), banded 4-rows ×
    8-bands, candidate pairs from band-key collisions, verified with
    the signature-estimated Jaccard ≥ 0.7. Every step is a built-in
    expression — transparent, deterministic, engine-portable — and the
    cost model is explicit: the signature is 32 MIN aggregates over
    the exploded shingle stream, every hash in whole-stage codegen
    with map-side partial mins (shuffle rows bounded by docs ×
    partitions, 32 longs each). The superficially cheaper in-row form
    — array_min over 32 seeded hash TRANSFORMS of the shingle array,
    'no shuffle needed' — runs its 32·|sh| hash evaluations in the
    expression interpreter and measured 1.45 s vs 0.38 s at sf0.1
    (same lesson as ``_shingle_sets``); min over the multiset equals
    min over the distinct set, so the duplicate shingles in the raw
    stream change nothing. Then one explode × 8 (bands), one groupBy
    band key. The spark.ml twin is minhash_lsh_pairs; tests
    cross-check both recall every exact Jaccard-0.8 pair."""
    bands = minhash_band_keys(d)
    return _mh_candidate_pairs(
        bands, bands, "doc_a", "doc_b", self_pairs=True
    )


# Composed over _JACCARD_SQL (the _RECALL_SQL pattern), restricted to
# the pairs that straddle the corpus/batch split — ONE exact-pair
# definition in the module, so a shingle or threshold change cannot
# desync this oracle from the others.
_MH_INCR_SQL = f"""
    SELECT COUNT(*) AS n_exact_pairs_total,
           COUNT(*) AS n_exact_pairs_recalled
    FROM ({_JACCARD_SQL})
    WHERE (doc_a % 10 >= 8) <> (doc_b % 10 >= 8)
"""


@query("dedup_minhash_incremental", oracle=_MH_INCR_SQL)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup admission — the fuzzy sibling of the
    exact [[dedup_bloom_incremental]] path, completing the
    monthly-batch dedup pair (reference README.md:10-11, the
    platform\'s increment-not-recompute ingest model): a new batch
    (deterministic 20% split, the [[dedup_incremental]] convention)
    is screened against the existing corpus for Jaccard-0.8
    near-dups WITHOUT ever joining corpus x corpus. The corpus side
    contributes only its banded MinHash keys — in production a
    PERSISTED index maintained at ingest (the
    [[sim_search_ivfpq_trained]] artifact discipline: signatures are
    content-keyed and append-only, a new batch both probes and
    extends them) — and the batch side computes signatures for its
    own rows only, through the SAME [[minhash_signatures]] /
    [[minhash_band_keys]] code path, so index and probe can never
    hash differently.

    Plan: batch band keys (8 per doc) hash-join corpus band keys on
    (band, key) — the shuffle carries band keys and 32-long
    signatures, never text, and its size is candidate-bounded
    exactly like [[minhash_df_pairs]] (measured FLAT at the sf1
    decade, SCALE.md r12); collisions verify in-row via the
    signature-estimated Jaccard >= 0.7. The DRIVER row is the recall
    contract (the [[dedup_fuzzy]]/[[dedup_minhash_df]] precedent for
    sketch rungs): the exact cross-split Jaccard pairs — computed by
    the shared [[jaccard_pairs]] harness here and by the oracle\'s
    shingle SQL — must ALL appear among the candidates. Production
    runs `minhash_incremental_pairs` alone; the exact side is the
    verification cost, not the serving cost."""
    d = load(spark, sf_dir, "documents")
    is_batch = F.col("doc_id") % 10 >= 8
    ea, eb = F.col("doc_a") % 10 >= 8, F.col("doc_b") % 10 >= 8
    # exact side: the split predicate rides INSIDE candidate
    # generation (pair_pred), so the harness never verifies the
    # corpus×corpus pair mass it would discard; orient (corpus,
    # batch) but keep _recall_summary's doc_a/doc_b naming.
    cross = jaccard_pairs(d, pair_pred=(ea != eb)).select(
        F.when(eb, F.col("doc_a")).otherwise(F.col("doc_b")).alias(
            "doc_a"
        ),
        F.when(eb, F.col("doc_b")).otherwise(F.col("doc_a")).alias(
            "doc_b"
        ),
    )
    cand = minhash_incremental_pairs(
        d.filter(~is_batch), d.filter(is_batch)
    ).select(
        F.col("doc_corpus").alias("doc_a"),
        F.col("doc_batch").alias("doc_b"),
    )
    return _recall_summary(cross, cand)


def minhash_incremental_pairs(
    corpus: DataFrame, batch: DataFrame
) -> DataFrame:
    """(doc_corpus, doc_batch, est_jaccard) candidates of a
    batch-vs-corpus LSH probe over any two (doc_id, text) frames —
    the production path of [[dedup_minhash_incremental]]. Both
    sides band through the shared [[minhash_band_keys]] and meet in
    the shared [[_mh_candidate_pairs]] join."""
    return _mh_candidate_pairs(
        minhash_band_keys(corpus),
        minhash_band_keys(batch),
        "doc_corpus",
        "doc_batch",
    )


# ---------------------------------------------------------------------------
# duplicate clustering (connected components over candidate pairs)
# ---------------------------------------------------------------------------

from pyspark.sql import Window as _W  # noqa: E402  (section-local import)

_CLUSTER_SQL = """
    WITH RECURSIVE shingled AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
                           i -> array_to_string(toks[i:i+2], ' '))) AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    ),
    exploded AS (SELECT doc_id, unnest(sh) AS shingle FROM shingled),
    sizes AS (SELECT doc_id, len(sh) AS n_sh FROM shingled),
    ix AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM exploded a JOIN exploded b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM ix
      JOIN sizes sa ON ix.doc_a = sa.doc_id
      JOIN sizes sb ON ix.doc_b = sb.doc_id
      WHERE CAST(ix.n_inter AS DOUBLE)
            / (sa.n_sh + sb.n_sh - ix.n_inter) >= 0.8
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    walk(doc, node) AS (
      SELECT src, src FROM (SELECT DISTINCT src FROM edges)
      UNION
      SELECT w.doc, e.dst FROM walk w JOIN edges e ON w.node = e.src
    ),
    membership AS (
      SELECT doc AS doc_id, MIN(node) AS cluster_id FROM walk GROUP BY doc
    )
    SELECT doc_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS n_members,
           CAST(doc_id = cluster_id AS INT) AS is_canonical
    FROM membership
"""




def min_label_components(pairs: DataFrame) -> DataFrame:
    """Connected components of an undirected pair frame ``(doc_a,
    doc_b)`` via iterative min-label propagation — factored out of
    [[dedup_cluster]] so any pair GENERATOR (n-gram Jaccard there,
    perceptual-hash pairs in [[multimodal_phash_dedup_apply]]) feeds
    the SAME closure loop. Returns ``(doc_id, cluster_id)`` with
    cluster_id = the component's min doc_id; nodes are exactly the
    ids that appear in some pair (isolated items never enter the
    loop — callers account for them separately, which is also what
    keeps the loop state pair-population-sized, not corpus-sized).
    Each round: one shuffle on the node id; frontier cached, prior
    round unpersisted, so state never accumulates."""
    edges = (
        pairs.union(
            pairs.select(pairs.columns[1], pairs.columns[0])
        )
        .toDF("src", "dst")
        .cache()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .cache()
    )
    while True:
        nbr = edges.join(
            labels.withColumnRenamed("id", "src"), "src"
        ).select(F.col("dst").alias("id"), "lbl")
        upd = (
            labels.select("id", "lbl")
            .union(nbr)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
            .cache()
        )
        changed = (
            upd.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = upd
        if changed == 0:
            break
    edges.unpersist()
    # Hand back a localCheckpoint and release the loop's pinned
    # cache (r16 self-review): a returned .cache() frame that
    # callers never unpersist leaks one cached DataFrame per
    # invocation for the session lifetime; checkpoint blocks are
    # instead GC-managed by the ContextCleaner once the frame drops.
    out = labels.select(
        F.col("id").alias("doc_id"), F.col("lbl").alias("cluster_id")
    ).localCheckpoint(eager=True)
    labels.unpersist()
    return out


@query("dedup_cluster", oracle=_CLUSTER_SQL)
def dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group near-duplicate documents into clusters and pick one
    canonical representative per cluster — the step after pair
    generation in every production dedup: pairs alone can chain
    (A~B, B~C but A≁C), so keep/drop decisions need the transitive
    closure, i.e. connected components.

    Components via iterative min-label propagation on the candidate
    graph from `dedup_ngram_jaccard` (J ≥ 0.8): every node starts
    labeled with its own id; each round a node takes the min of its
    own and its neighbors' labels; fixpoint = components labeled by
    their min doc_id. Rounds ∝ graph diameter — near-dup clusters
    are dense and shallow (typically 2-4 rounds). Each round is one
    shuffle on the node id; the frontier DataFrame is cached and the
    previous round unpersisted, so state never accumulates. At 1B+
    nodes the same loop holds (labels are (id, label) pairs, ~16 B a
    row); the large-star/small-star variant (Kiveris et al.) halves
    round count when diameters grow, but dup graphs don't.

    The DuckDB oracle computes the same closure with a recursive CTE
    — Spark has no WITH RECURSIVE, which is exactly why the
    DataFrame loop is the idiomatic form (SURVEY.md §2C dedup tier).
    """
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    out = min_label_components(pairs)
    return out.select(
        "doc_id",
        "cluster_id",
        F.count("*").over(_W.partitionBy("cluster_id")).alias("n_members"),
        (F.col("doc_id") == F.col("cluster_id")).cast("int").alias("is_canonical"),
    )


_KEEP_SQL = f"""
    WITH dropped AS (
      SELECT doc_id FROM ({_CLUSTER_SQL}) WHERE doc_id <> cluster_id
    )
    SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
           (SELECT COUNT(*) FROM documents)
             - (SELECT COUNT(*) FROM dropped) AS n_kept,
           (SELECT COUNT(*) FROM dropped)     AS n_dropped,
           CAST((SELECT COALESCE(SUM(doc_id), 0) FROM documents)
              - (SELECT COALESCE(SUM(doc_id), 0) FROM dropped)
             AS BIGINT) AS kept_id_sum
"""


@query("dedup_keep_canonical", oracle=_KEEP_SQL)
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END corpus dedup: pairs → connected components → keep
    one canonical doc per cluster, pass every untouched doc through —
    the actual keep/drop decision a curation pipeline ships. Survivors
    = (all docs) anti-join (cluster members that are not their
    cluster's min-id canonical); the emitted summary (corpus size,
    kept, dropped, kept-id checksum) is what the driver value-checks
    against the recursive-CTE oracle, which derives the identical
    drop set in SQL.

    Scale shape: the component loop is [[dedup_cluster]]'s (O(rows)
    per round, rounds ∝ cluster diameter); the keep step adds one
    broadcast-sized anti-join (dropped ids ≪ corpus — near-dup rates
    are single-digit percent even on web crawl) and the summary is a
    full-aggregate fold, no driver materialization of the kept set."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    dropped = (
        dedup_cluster(spark, sf_dir)
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    kept = docs.join(F.broadcast(dropped), "doc_id", "left_anti")
    totals = docs.agg(F.count("*").alias("n_docs"))
    kept_stats = kept.agg(
        F.count("*").alias("n_kept"),
        F.coalesce(F.sum("doc_id"), F.lit(0)).cast("bigint").alias("kept_id_sum"),
    )
    return (
        totals.crossJoin(kept_stats)
        .select(
            "n_docs",
            "n_kept",
            (F.col("n_docs") - F.col("n_kept")).alias("n_dropped"),
            "kept_id_sum",
        )
    )


# ---------------------------------------------------------------------------
# repeated-span detection (C4-style span dedup accounting)
# ---------------------------------------------------------------------------

#: Span width in tokens. C4 removes repeated 3-sentence spans; on the
#: unpunctuated fixture text, a fixed 8-token window plays that role.
_SPAN_W = 8

_SPAN_SQL = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    spans AS (
      SELECT doc_id,
             md5(array_to_string(t[i:i+{_SPAN_W - 1}], ' ')) AS h
      FROM toks, UNNEST(generate_series(1, len(t) - {_SPAN_W - 1})) AS u(i)
      WHERE len(t) >= {_SPAN_W}
    ),
    shared AS (
      SELECT h FROM spans GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN sh.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_spans
    FROM spans s LEFT JOIN shared sh ON s.h = sh.h
    GROUP BY s.doc_id
"""


@query("dedup_span_exact", oracle=_SPAN_SQL)
def dedup_span_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span accounting: slide an
    ``_SPAN_W``-token window over every document, hash each span, and
    report per document how many of its spans also occur in at least
    one OTHER document — the C4/RefinedWeb span-level dedup signal
    (intra-document repetition is [[repetition_stats]]; whole-doc
    near-dup is [[dedup_fuzzy]]).

    Scale shape: span rows are (doc_id, 128-bit hash) — ~L tokens per
    doc, never the text itself. The span hash is TWO independently
    seeded xxhash64s (h1, h2): a single 64-bit space would let a
    cross-document collision overcount n_shared_spans on the Spark
    side only (the oracle hashes with 128-bit md5), so both engines
    get a negligible-collision space while the shuffle key stays two
    packed longs instead of a 32-char hex string. Exactly TWO
    data-proportional exchanges: one explicit ``repartition`` on
    (h1, h2) hash-clusters the raw span stream so BOTH the
    ``groupBy(h1, h2, doc_id)`` collapse (subset clustering) and the
    ``Window.partitionBy(h1, h2)`` cross-doc count reuse that single
    partitioning with no further shuffle (asserted in
    tests/test_plans.py::test_span_exact_two_exchanges); the second
    is the final per-doc rollup. No join back to the raw spans, so a
    span seen in k docs costs exactly k rows end to end and no
    quadratic pair fan-out exists at any corpus size. Span
    generation is a generator + codegen projection (explode(sequence)
    then hash(slice)) rather than a higher-order lambda: lambdas are
    interpreted and measured ~2× slower on the hash stage."""
    from pyspark.sql import Window as W

    from ..session import adaptive_shuffle_width

    d = load(spark, sf_dir, "documents")
    width = adaptive_shuffle_width(d)
    toks = F.split("text", " ")
    span_txt = F.array_join(F.slice("t", F.col("i"), _SPAN_W), " ")
    spans = (
        d.select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= _SPAN_W)
        .select(
            "doc_id",
            "t",
            F.explode(
                F.sequence(F.lit(1), F.size("t") - F.lit(_SPAN_W - 1))
            ).alias("i"),
        )
        .select(
            "doc_id",
            # seed literal FIRST: Spark chains multi-arg xxhash64 as
            # hash = xxhash64(child, prev_hash), so (span, lit(1))
            # would make h2 a deterministic function of h1 — a fake
            # 128-bit key with 64-bit collision resistance. With the
            # literal first, the two hashes start from different
            # effective seeds and are independent.
            F.xxhash64(span_txt).alias("h1"),
            F.xxhash64(F.lit(1), span_txt).alias("h2"),
        )
    )
    g = (
        spans.repartition(width, "h1", "h2")
        .groupBy("h1", "h2", "doc_id")
        .agg(F.count("*").alias("c"))
    )
    nd = F.count("*").over(W.partitionBy("h1", "h2"))
    return (
        g.withColumn("nd", nd)
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_spans"),
            F.sum(F.when(F.col("nd") >= 2, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("n_shared_spans"),
        )
    )


# ---------------------------------------------------------------------------
# exact substring dedup (Lee et al. 2022): maximal duplicated spans
# ---------------------------------------------------------------------------

_SUBSTR_SPAN_SQL = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    spans AS (
      SELECT doc_id, i,
             md5(array_to_string(t[i:i+{_SPAN_W - 1}], ' ')) AS h
      FROM toks, UNNEST(generate_series(1, len(t) - {_SPAN_W - 1})) AS u(i)
      WHERE len(t) >= {_SPAN_W}
    ),
    dup AS (SELECT h FROM spans GROUP BY h HAVING COUNT(*) >= 2),
    flagged AS (
      SELECT s.doc_id, s.i,
             lag(s.i) OVER (PARTITION BY s.doc_id ORDER BY s.i) AS prev
      FROM spans s JOIN dup USING (h)
    ),
    isl AS (
      SELECT doc_id, i,
             SUM(CASE WHEN i - prev > {_SPAN_W} THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY i
                     ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    )
    SELECT doc_id,
           CAST(MIN(i) AS BIGINT) AS span_start,
           CAST(MAX(i) + {_SPAN_W - 1} AS BIGINT) AS span_end,
           CAST(COUNT(*) AS BIGINT) AS n_windows
    FROM isl GROUP BY doc_id, island
"""


def substring_spans_of(d: DataFrame, w: int, width: int = 32) -> DataFrame:
    """Maximal duplicated token intervals per document — the
    ExactSubstr output of Lee et al. 2022 ("Deduplicating Training
    Data Makes Language Models Better"): a ``w``-token window is
    DUPLICATED if its text occurs ≥2 times anywhere in the corpus
    (including within the same document, per the paper), and
    overlapping-or-contiguous duplicated windows merge into one
    maximal interval (gap > ``w`` between window starts breaks
    coverage). Output (doc_id, span_start, span_end, n_windows),
    1-based inclusive token positions — the cut-list a removal pass
    applies with slice/concat, where [[dedup_span_exact]] only
    COUNTS shared windows per doc. Module-level so the hypothesis
    differential exercises the SAME pipeline at a small ``w``.

    Scale shape, in corpus-sized terms: the window stream is
    (doc_id, i, two-seed xxhash64) — never the text (the shuffle-
    byte discipline of [[dedup_span_exact]]; the string-keyed oracle
    doubles as the collision check). One explicit repartition on the
    hash pair serves the occurrence-count window; the surviving
    duplicated positions (a small fraction of the corpus) then
    shuffle ONCE by doc_id for the gaps-and-islands merge, whose
    per-partition work is bounded by DOCUMENT length, not corpus
    size — the per-doc sequential scan is inherent to the problem
    (suffix-array ExactSubstr has the same per-doc merge step) and a
    document is the natural bounded unit at any corpus scale."""
    from pyspark.sql import Window as W

    toks = F.split("text", " ")
    span_txt = F.array_join(F.slice("t", F.col("i"), w), " ")
    spans = (
        d.select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= w)
        .select(
            "doc_id",
            "t",
            F.explode(
                F.sequence(F.lit(1), F.size("t") - F.lit(w - 1))
            ).alias("i"),
        )
        .select(
            "doc_id",
            F.col("i").cast("bigint").alias("i"),
            # seed literal FIRST — see [[dedup_span_exact]] on why
            # (span, lit) chaining would collapse the 128-bit space
            F.xxhash64(span_txt).alias("h1"),
            F.xxhash64(F.lit(1), span_txt).alias("h2"),
        )
    )
    cnt = F.count("*").over(W.partitionBy("h1", "h2"))
    flagged = (
        spans.repartition(width, "h1", "h2")
        .withColumn("cnt", cnt)
        .filter(F.col("cnt") >= 2)
        .select("doc_id", "i")
    )
    prev = F.lag("i").over(W.partitionBy("doc_id").orderBy("i"))
    brk = F.when(F.col("i") - F.col("prev") > w, 1).otherwise(0)
    run = (
        W.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    isl = (
        flagged.withColumn("prev", prev)
        .withColumn("island", F.sum(brk).over(run))
    )
    return (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("i").alias("span_start"),
            (F.max("i") + F.lit(w - 1)).alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .select("doc_id", "span_start", "span_end", "n_windows")
    )


@query("dedup_substring_spans", oracle=_SUBSTR_SPAN_SQL)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup over the documents table: the maximal
    ≥``_SPAN_W``-token intervals whose every window occurs more than
    once in the corpus — see [[substring_spans_of]] for semantics
    and the scale argument."""
    from ..session import adaptive_shuffle_width

    d = load(spark, sf_dir, "documents")
    return substring_spans_of(d, _SPAN_W, adaptive_shuffle_width(d))


_SUBSTR_APPLY_SQL = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    spans AS (
      SELECT doc_id, i,
             md5(array_to_string(t[i:i+{_SPAN_W - 1}], ' ')) AS h
      FROM toks, UNNEST(generate_series(1, len(t) - {_SPAN_W - 1})) AS u(i)
      WHERE len(t) >= {_SPAN_W}
    ),
    dup AS (SELECT h FROM spans GROUP BY h HAVING COUNT(*) >= 2),
    flagged AS (
      SELECT s.doc_id, s.i,
             lag(s.i) OVER (PARTITION BY s.doc_id ORDER BY s.i) AS prev
      FROM spans s JOIN dup USING (h)
    ),
    isl AS (
      SELECT doc_id, i,
             SUM(CASE WHEN i - prev > {_SPAN_W} THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY i
                     ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    ),
    cuts AS (
      SELECT doc_id,
             list({{'s': s, 'e': e}}) AS cuts
      FROM (SELECT doc_id, MIN(i) AS s, MAX(i) + {_SPAN_W - 1} AS e
            FROM isl GROUP BY doc_id, island)
      GROUP BY doc_id
    ),
    applied AS (
      SELECT tk.doc_id,
             len(tk.t) AS n_tokens,
             list_filter(
               range(1, len(tk.t) + 1),
               i -> len(list_filter(COALESCE(c.cuts, []),
                                    x -> i >= x.s AND i <= x.e)) = 0
             ) AS keep
      FROM toks tk LEFT JOIN cuts c ON tk.doc_id = c.doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_tokens - len(keep) AS BIGINT) AS n_removed,
           -- COALESCE: DuckDB's array_to_string([]) is NULL where
           -- Spark's array_join([]) is '' (a fully-removed document)
           md5(COALESCE(
             array_to_string(list_transform(keep, i -> t[i]), ' '), ''))
             AS kept_md5
    FROM applied JOIN toks USING (doc_id)
"""


def substring_apply_of(d: DataFrame, w: int, width: int = 32) -> DataFrame:
    """Apply the [[substring_spans_of]] cut-list: remove every
    token position covered by a maximal duplicated interval and
    rebuild each document — the REMOVAL half of Lee et al. 2022's
    ExactSubstr (the spans key is the analysis half). Output
    (doc_id, n_tokens, n_removed, kept_md5): the md5 of the
    rebuilt text keeps the oracle row narrow while still proving
    byte-identical reconstruction cross-engine. Module-level so the
    hypothesis differential exercises the SAME pipeline at a small
    ``w``.

    Scale shape: the cut-list rides the spans pipeline's doc_id
    clustering into a per-doc collect_list (no new exchange), is
    LEFT-joined back to the token stream, and the removal itself is
    pure whole-stage-codegen higher-order functions — filter a
    position sequence through an exists() over the (tiny, per-doc)
    interval array, then transform/array_join to rebuild. No Python
    touches a row; untouched documents pass through with
    n_removed = 0 via the coalesced empty cut array."""
    spans = substring_spans_of(d, w, width)
    cuts = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("cuts")
    )
    t = F.split("text", " ")
    covered = lambda i: F.exists(  # noqa: E731
        "cuts",
        lambda c: (i >= c["span_start"]) & (i <= c["span_end"]),
    )
    keep = F.filter(
        F.sequence(F.lit(1), F.size("t")),
        lambda i: ~covered(i),
    )
    return (
        d.select("doc_id", t.alias("t"))
        .join(cuts, "doc_id", "left")
        .withColumn("cuts", F.coalesce("cuts", F.array()))
        .select(
            "doc_id",
            F.size("t").cast("bigint").alias("n_tokens"),
            keep.alias("keep"),
            "t",
        )
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.size("keep")).cast("bigint").alias(
                "n_removed"
            ),
            F.md5(
                F.array_join(
                    F.transform("keep", lambda i: F.element_at("t", i)),
                    " ",
                )
            ).alias("kept_md5"),
        )
    )


@query("dedup_substring_apply", oracle=_SUBSTR_APPLY_SQL)
def dedup_substring_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr removal over the documents table — see
    [[substring_apply_of]] for semantics and the scale argument."""
    from ..session import adaptive_shuffle_width

    d = load(spark, sf_dir, "documents")
    return substring_apply_of(d, _SPAN_W, adaptive_shuffle_width(d))


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup): embedding-cluster-bucketed near-dup
# ---------------------------------------------------------------------------

#: Coarse cluster count for the bucketing stage. Seeded
#: deterministically (the first K vectors) so both engines derive the
#: same partition of the corpus; production swaps in k-means
#: centroids ([[embedding_centroids]]) without changing the shape.
_SEMDEDUP_K = 8
#: Most-similar pairs reported per cluster.
_SEMDEDUP_TOP = 3

_SEMDEDUP_SQL = f"""
    WITH seeds AS (
      SELECT vec_id AS seed_id, embedding AS semb
      FROM embeddings WHERE vec_id < {_SEMDEDUP_K}
    ),
    scored AS (
      SELECT e.vec_id, s.seed_id, e.embedding,
             ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                          s.semb::DOUBLE[]), 6) AS cs
      FROM embeddings e CROSS JOIN seeds s
    ),
    assign AS (
      SELECT vec_id, seed_id, embedding FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cs DESC, seed_id ASC) AS rn
        FROM scored) WHERE rn = 1
    ),
    pairs AS (
      SELECT a.seed_id AS cluster_id, a.vec_id AS vec_a, b.vec_id AS vec_b,
             ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                          b.embedding::DOUBLE[]), 6) AS cs
      FROM assign a JOIN assign b
        ON a.seed_id = b.seed_id AND a.vec_id < b.vec_id
    )
    SELECT cluster_id, vec_a, vec_b, ROUND(cs, 4) AS cos_sim
    FROM (SELECT *, row_number() OVER (PARTITION BY cluster_id
                                       ORDER BY ROUND(cs, 4) DESC,
                                                vec_a, vec_b) AS rn
          FROM pairs)
    WHERE rn <= {_SEMDEDUP_TOP}
"""


@query("dedup_semantic", oracle=_SEMDEDUP_SQL)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): bucket every
    vector to its nearest of K broadcast cluster seeds, then compare
    pairs ONLY within a bucket — the move that turns the O(n²) scan of
    [[dedup_embedding]] into K independent O((n/K)²) problems. Reports
    the top ``_SEMDEDUP_TOP`` most-similar pairs per cluster (on this
    synthetic corpus no pair crosses a production dedup threshold;
    the report form keeps the oracle non-degenerate).

    Two-stage compute, each stage in its best engine tier:

    - **Assignment** is JVM-side: cosine against the K broadcast
      seeds as a sequential fold (functions/vector.py), ranked on
      ROUND(cos, 6) with seed-id tie-break so a last-ulp wobble
      cannot flip the argmax. Seeds are the first K vectors
      (deterministic in both engines; production uses
      [[embedding_centroids]]).
    - **Intra-cluster pairwise** is the one place built-ins genuinely
      lose: k²/2 cosines per cluster as interpreted fold lambdas
      measured 3.0s at sf0.1, vs 0.7s for ONE Arrow batch per cluster
      into applyInPandas and a numpy matmul (normalized rows → S =
      EnEnᵀ) — the exact compute shape production SemDeDup runs on
      GPU. Matmul sums floats in a different order than the SQL
      oracle's sequential fold, so pair similarities are rounded
      half-away (matching SQL ROUND, not numpy's half-even) and both
      engines RANK on the coarse 4-decimal value they report, with a
      deterministic (vec_a, vec_b) tie-break — a boundary-straddling
      6th-decimal difference can no longer reorder the top-k. Parity
      is asserted against the pure-SQL oracle at every fixture
      scale.

    Scale: seeds/centroids broadcast (K·dim doubles); the only
    data-proportional shuffle is the per-cluster co-location that
    applyInPandas performs. Cluster imbalance is the skew hazard —
    one oversized cluster is one Arrow batch, so production splits
    clusters recursively (the IVF nprobe ladder in similarity.py is
    the same geometry)."""
    import numpy as np

    from pyspark.sql import Window as W

    e = fan_out(load(spark, sf_dir, "embeddings")).select(
        "vec_id", as_double_array(F.col("embedding")).alias("emb")
    )
    seeds = (
        e.filter(F.col("vec_id") < _SEMDEDUP_K)
        .select(F.col("vec_id").alias("seed_id"), F.col("emb").alias("semb"))
    )
    cs = F.round(cosine(F.col("emb"), F.col("semb")), 6)
    # argmax as ONE aggregation instead of a rank window (r17, guide
    # §2.3): the window form shuffled the full K-way fan-out — K rows
    # PER VECTOR, each dragging the 64-dim embedding — through a
    # vec_id exchange plus a sort; max(struct) partial-aggregates
    # map-side, so the exchange carries one struct per vector (K×
    # fewer bytes) and needs no sort. Ordering is identical: struct
    # max realizes (cs DESC, seed_id ASC) via the negated-seed field
    # (cs is the same ROUND(cos, 6); NaN sorts greatest in both
    # forms; seed_id is unique per group so the embedding field is
    # never compared).
    best = F.max(
        F.struct(
            F.col("cs").alias("cs"),
            (-F.col("seed_id")).alias("nseed"),
            F.col("seed_id").alias("seed_id"),
            F.col("emb").alias("emb"),
        )
    )
    assign = (
        e.crossJoin(F.broadcast(seeds))
        .select("vec_id", "seed_id", "emb", cs.alias("cs"))
        .groupBy("vec_id")
        .agg(best.alias("b"))
        .select(
            "vec_id",
            F.col("b.seed_id").alias("seed_id"),
            F.col("b.emb").alias("emb"),
        )
    )

    def _round_half_away(x, d: int):
        scale = 10.0 ** d
        return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale

    def topk(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        n = len(ids)
        empty = pd.DataFrame(
            {
                "cluster_id": pd.Series(dtype="int64"),
                "vec_a": pd.Series(dtype="int64"),
                "vec_b": pd.Series(dtype="int64"),
                "cos_sim": pd.Series(dtype="float64"),
            }
        )
        if n < 2:
            return empty
        em = np.stack(pdf["emb"].to_numpy())
        en = em / np.linalg.norm(em, axis=1, keepdims=True)
        sim = en @ en.T
        iu, ju = np.triu_indices(n, 1)
        a, b = ids[iu], ids[ju]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        cs6 = _round_half_away(sim[iu, ju], 6)
        # rank on the 4-decimal value that is also REPORTED, not the
        # 6-decimal one: the matmul sums floats in a different order
        # than the oracle's sequential fold, and a similarity within
        # an ulp of a 6th-decimal rounding boundary could round — and
        # therefore rank — differently per engine (ADVICE r7). At 4
        # decimals the boundary band is 100× narrower than the
        # engines' divergence, and an exact 4-decimal tie falls to
        # the deterministic (vec_a, vec_b) break in BOTH engines.
        cs4 = _round_half_away(cs6, 4)
        order = np.lexsort((hi, lo, -cs4))[:_SEMDEDUP_TOP]
        return pd.DataFrame(
            {
                "cluster_id": np.repeat(int(pdf["seed_id"].iloc[0]), len(order)),
                "vec_a": lo[order],
                "vec_b": hi[order],
                "cos_sim": cs4[order],
            }
        )

    return assign.groupBy("seed_id").applyInPandas(
        topk, "cluster_id long, vec_a long, vec_b long, cos_sim double"
    )

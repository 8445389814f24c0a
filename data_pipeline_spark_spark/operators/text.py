"""Text analysis over the `documents` corpus: stats, token counting,
quality scoring, language ID, fingerprinting.

EXT tier (SURVEY.md §2C / north-star): the operators a training-data
pipeline runs over raw text before dedup/filtering. All hot-path work
is built-in string/array functions (split, regexp, higher-order
filters) — tokenization at 100 TB must stay JVM-side; Python touches
nothing here.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import fan_out, load
from ..functions.exact import md5_u32_duck, md5_u32_sql, micro_ln
from ..registry import query

# ---------------------------------------------------------------------------
# corpus statistics
# ---------------------------------------------------------------------------


@query(
    "text_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT source) AS n_sources,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(AVG(n_chars), 4) AS avg_chars,
           ROUND(AVG(len(string_split(text, ' '))), 4) AS avg_tokens
    FROM documents
    GROUP BY lang
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus breakdown per language: doc counts, source diversity,
    length distributions."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg(F.size(F.split("text", " "))), 4).alias("avg_tokens"),
    )


@query(
    "token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')) AS INT)
             AS bpe_ish_tokens,
           CAST(length(text) AS INT) AS n_chars_measured
    FROM documents
    """,
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split (fast, crude) and a
    BPE-ish regex lexer ([a-z0-9]+ runs | single non-alnum) — the
    standard pre-tokenizer shape. Both are single-pass JVM regex;
    ~O(bytes) per doc, embarrassingly parallel."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z0-9]+|[^a-z0-9 ]"), 0)).alias(
            "bpe_ish_tokens"
        ),
        F.length("text").alias("n_chars_measured"),
    )


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


@query(
    "quality_score",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, n_chars, string_split(text, ' ') AS toks, text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / nullif(len(toks), 0), 4) AS avg_token_len,
           ROUND(CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                 / nullif(length(text), 0), 4) AS punct_ratio,
           ROUND(CAST(len(list_filter(toks,
                 x -> x IN {tuple(_STOPWORDS)!s})) AS DOUBLE)
                 / nullif(len(toks), 0), 4) AS stopword_ratio,
           CASE WHEN len(toks) BETWEEN 5 AND 100000
                 AND CAST(length(replace(text, ' ', '')) AS DOUBLE)
                     / nullif(len(toks), 0) BETWEEN 2 AND 12
                THEN 1 ELSE 0 END AS passes_quality
    FROM tok
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality features (Gopher-style length /
    token-shape / stopword filters): token count, mean token length,
    punctuation ratio, stopword ratio, and a pass/fail gate. Pure
    column expressions — at 100 TB this is a single projected scan."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_toks = F.size(toks)
    compact_len = F.length(F.regexp_replace("text", " ", ""))
    avg_tok_len = compact_len.cast("double") / F.nullif(n_toks, F.lit(0))
    punct_ratio = (
        F.length(F.regexp_replace("text", "[a-z0-9 ]", "")).cast("double")
        / F.nullif(F.length("text"), F.lit(0))
    )
    stop_ratio = (
        F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS))).cast("double")
        / F.nullif(n_toks, F.lit(0))
    )
    return d.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        F.round(avg_tok_len, 4).alias("avg_token_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.when(
            n_toks.between(5, 100000) & avg_tok_len.between(2, 12), 1
        )
        .otherwise(0)
        .alias("passes_quality"),
    )


@query(
    "repetition_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                    i -> array_to_string(toks[i:i+1], ' '))) AS bg
      FROM t WHERE len(toks) >= 2
    ),
    counted AS (
      SELECT doc_id, bg, COUNT(*) AS n FROM bg GROUP BY doc_id, bg
    )
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT)  AS n_bigrams,
           COUNT(*)                AS n_distinct_bigrams,
           CAST(MAX(n) AS BIGINT)  AS top_bigram_n,
           (CAST(SUM(n) AS BIGINT) - COUNT(*))
             / CAST(SUM(n) AS DOUBLE)            AS dup_bigram_frac,
           CAST(MAX(n) AS BIGINT)
             / CAST(SUM(n) AS DOUBLE)            AS top_bigram_frac
    FROM counted GROUP BY doc_id
    """,
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition signals (the Gopher/RefinedWeb
    repetition filters): per doc, total vs distinct word-bigram
    counts, the hottest bigram's count, and the two derived fractions
    (duplicate-bigram fraction, top-bigram fraction) that the quality
    gate thresholds on — boilerplate and spam score high on both.

    Shape at 100 TB: ZERO shuffles — every signal is intra-document,
    so it's computed inside the row (sorted bigram array + run-length
    fold) as a pure projection; the corpus is never exploded, keyed,
    or moved. An earlier shape exploded to (doc, bigram) and paid two
    corpus-proportional shuffles for what is per-doc-local work —
    this one is embarrassingly scan-parallel at any size (and
    measured 1.6× faster at sf0.1). The fractions are divisions of
    exact integers, so the doubles are bit-identical across engines
    (no ROUND needed). Docs with <2 tokens have no bigrams and are
    excluded on both sides."""
    return repetition_stats_over(load(spark, sf_dir, "documents"))


def repetition_stats_over(docs: DataFrame) -> DataFrame:
    """Repetition signals over any (doc_id, text) frame — the reusable
    core behind [[repetition_stats]]. All in-row: the hottest-bigram
    count is a single fold over the sorted bigram array (runs of a
    sorted array are its multiplicities)."""
    bgs = F.expr(
        "transform(sequence(1, size(toks) - 1),"
        " i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1)))"
    )
    top_n = F.expr(
        """aggregate(sbg,
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
    return (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= 2)
        .select("doc_id", F.sort_array(bgs).alias("sbg"))
        .select(
            "doc_id",
            F.size("sbg").cast("bigint").alias("n_bigrams"),
            F.size(F.array_distinct("sbg"))
            .cast("bigint")
            .alias("n_distinct_bigrams"),
            top_n.alias("top_bigram_n"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_distinct_bigrams",
            "top_bigram_n",
            (
                (F.col("n_bigrams") - F.col("n_distinct_bigrams"))
                / F.col("n_bigrams").cast("double")
            ).alias("dup_bigram_frac"),
            (
                F.col("top_bigram_n") / F.col("n_bigrams").cast("double")
            ).alias("top_bigram_frac"),
        )
    )


# ---------------------------------------------------------------------------
# language ID (n-gram/stopword heuristic)
# ---------------------------------------------------------------------------

_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "with"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist"),
    "zh": ("de5", "shi4", "zai4", "le5", "you3"),  # romanized placeholder markers
}


def _marker_hits(toks, markers: tuple[str, ...]):
    return F.size(F.filter(toks, lambda x: x.isin(*markers)))


@query(
    "lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT lang,
             len(list_filter(string_split(text,' '), x -> x IN {tuple(_LANG_MARKERS['en'])!s})) AS hits_en,
             len(list_filter(string_split(text,' '), x -> x IN {tuple(_LANG_MARKERS['es'])!s})) AS hits_es,
             len(list_filter(string_split(text,' '), x -> x IN {tuple(_LANG_MARKERS['fr'])!s})) AS hits_fr,
             len(list_filter(string_split(text,' '), x -> x IN {tuple(_LANG_MARKERS['de'])!s})) AS hits_de,
             len(list_filter(string_split(text,' '), x -> x IN {tuple(_LANG_MARKERS['zh'])!s})) AS hits_zh
      FROM documents
    ),
    pred AS (
      SELECT lang,
             CASE WHEN greatest(hits_en, hits_es, hits_fr, hits_de, hits_zh) = 0 THEN 'und'
                  WHEN hits_en >= greatest(hits_es, hits_fr, hits_de, hits_zh) THEN 'en'
                  WHEN hits_es >= greatest(hits_fr, hits_de, hits_zh) THEN 'es'
                  WHEN hits_fr >= greatest(hits_de, hits_zh) THEN 'fr'
                  WHEN hits_de >= hits_zh THEN 'de'
                  ELSE 'zh' END AS lang_pred
      FROM scored
    )
    SELECT lang, lang_pred, COUNT(*) AS n_docs
    FROM pred GROUP BY lang, lang_pred
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID: count per-language marker tokens,
    argmax with a fixed priority order for ties, 'und' when nothing
    hits. Returns the (actual, predicted) confusion table. The marker
    sets are deliberately tiny (a real system ships ~100/lang); the
    plan shape — k parallel higher-order filters over one token array,
    one scan — is the part that matters at scale."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    hits = {lang: _marker_hits(toks, m) for lang, m in _LANG_MARKERS.items()}
    scored = d.select("lang", *[h.alias(f"hits_{lang}") for lang, h in hits.items()])
    h = {lang: F.col(f"hits_{lang}") for lang in _LANG_MARKERS}
    pred = (
        F.when(
            F.greatest(h["en"], h["es"], h["fr"], h["de"], h["zh"]) == 0, "und"
        )
        .when(h["en"] >= F.greatest(h["es"], h["fr"], h["de"], h["zh"]), "en")
        .when(h["es"] >= F.greatest(h["fr"], h["de"], h["zh"]), "es")
        .when(h["fr"] >= F.greatest(h["de"], h["zh"]), "fr")
        .when(h["de"] >= h["zh"], "de")
        .otherwise("zh")
    )
    return (
        scored.withColumn("lang_pred", pred)
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------


@query(
    "doc_fingerprint",
    oracle="""
    SELECT md5(lower(trim(text))) AS fp,
           COUNT(*) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc_id
    FROM documents
    GROUP BY 1
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint = md5 of normalized text, grouped to expose
    exact-duplicate clusters. The normalize→hash→groupBy shape is the
    canonical 100 TB exact-dedup plan: the shuffle carries 16-byte
    digests, not documents."""
    d = load(spark, sf_dir, "documents")
    return (
        d.withColumn("fp", F.md5(F.lower(F.trim(F.col("text")))))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
        )
    )


_ROLL_MOD = 1_000_000_007
_ROLL_BASE = 131

_ROLLING_SQL = f"""
    SELECT doc_id,
           CAST(list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, length(text) + 1),
                              i -> CAST(ord(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
             (acc, x) -> (acc * {_ROLL_BASE} + x) % {_ROLL_MOD}
           ) AS BIGINT) AS rolling_fp
    FROM documents
"""


@query("doc_fingerprint_rolling", oracle=_ROLLING_SQL)
def doc_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling hash (Rabin–Karp) over codepoints, via an
    Arrow-vectorized Pandas UDF — the custom-UDF face of document
    fingerprinting (cf. the builtin-digest [[doc_fingerprint]]).

    Constants are chosen so the oracle can REPLAY the identical
    recurrence in SQL: with mod 1e9+7 and base 131 every intermediate
    stays below 2^63 (≈1.3e11), so DuckDB's strict int64 arithmetic
    (which ERRORS on overflow, unlike a 2^61-1 modulus whose
    multiply would wrap) computes the same value the Python loop
    does — turning what was a rows-only check into a full per-doc
    value oracle."""

    @F.pandas_udf(T.LongType())
    def rolling_hash(texts: pd.Series) -> pd.Series:
        def h(s: str) -> int:
            acc = 0
            for ch in s:
                acc = (acc * _ROLL_BASE + ord(ch)) % _ROLL_MOD
            return acc

        return texts.map(h)

    d = load(spark, sf_dir, "documents")
    return fan_out(d).select("doc_id", rolling_hash("text").alias("rolling_fp"))


@query(
    "tfidf_top_terms",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
      FROM documents
    ),
    n_docs AS (SELECT COUNT(*) AS n FROM documents),
    df AS (SELECT term, COUNT(*) AS doc_freq FROM tokens GROUP BY term),
    scored AS (
      SELECT t.term, d.doc_freq,
             ROUND(CAST(d.doc_freq AS DOUBLE) * ln(CAST(n.n AS DOUBLE) / d.doc_freq), 6)
               AS weight
      FROM (SELECT DISTINCT term FROM tokens) t
      JOIN df d USING (term), n_docs n
    )
    SELECT term, doc_freq, weight,
           row_number() OVER (ORDER BY weight DESC, term ASC) AS rnk
    FROM scored
    ORDER BY rnk LIMIT 25
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level TF-IDF-weighted term ranking: document frequency
    per distinct term × idf (ln N/df), top 25 with a total ordering.
    The distinct-per-doc explode shuffles (term) pairs only; df and
    the final top-k are two cheap aggregations. The top-25 is taken
    with orderBy().limit(), which Spark plans as
    TakeOrderedAndProject — a per-partition bounded heap plus a
    25-row driver merge, never a global sort — and the dense rank is
    derived on the 25 surviving rows only (the unpartitioned window
    is bounded by the limit, not the vocabulary). At 100 TB the df
    table is the only global state and it's ~vocabulary-sized —
    broadcastable."""
    d = load(spark, sf_dir, "documents")
    # lazy 1-row corpus size broadcast onto the df table (one job for
    # the whole query, no eager driver count per call)
    n_docs = d.agg(F.count("*").cast("double").alias("n_docs"))
    tokens = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("term")
    )
    df = tokens.groupBy("term").agg(F.count("*").alias("doc_freq"))
    weight = F.round(
        F.col("doc_freq").cast("double")
        * F.log(F.col("n_docs") / F.col("doc_freq")),
        6,
    )
    top25 = (
        df.crossJoin(F.broadcast(n_docs))
        .select("term", "doc_freq", weight.alias("weight"))
        .orderBy(F.col("weight").desc(), F.col("term").asc())
        .limit(25)
    )
    w = W.orderBy(F.col("weight").desc(), F.col("term").asc())
    return top25.withColumn("rnk", F.row_number().over(w)).orderBy("rnk")


_NGRAM_LM_SQL = """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents),
    tri AS (SELECT t[i] || ' ' || t[i+1] AS bigram, t[i+2] AS nxt
            FROM toks, UNNEST(generate_series(1, len(t)-2)) AS u(i)
            WHERE len(t) >= 3)
    SELECT bigram, COUNT(*) AS n, COUNT(DISTINCT nxt) AS n_cont
    FROM tri GROUP BY bigram
"""


@query("ngram_lm_counts", oracle=_NGRAM_LM_SQL)
def ngram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based language-model statistics over the corpus: per
    bigram prefix, total trigram occurrences and the DISTINCT
    continuation count — the adjusted-count input Kneser-Ney
    smoothing needs, and the next-word-diversity signal data-quality
    filters use (templated/boilerplate text shows high n with tiny
    n_cont). The trigram explode happens INSIDE a higher-order
    transform over the token array (no per-token shuffle — one
    explode, then one partial-aggregating groupBy on the bigram).
    Counts are exact integers end to end. At 100 TB the output is the
    vocabulary-squared-bounded count table, shuffled once on the
    bigram; the classic skew key (a stop-bigram like "of the") is
    bounded by the count aggregate's map-side combine, not by
    repartitioning."""
    toks = fan_out(load(spark, sf_dir, "documents")).select(
        F.split("text", " ").alias("t")
    )
    tri = toks.select(
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 3 THEN"
                " transform(sequence(0, size(t)-3),"
                "  i -> struct(concat(t[i], ' ', t[i+1]) AS bigram,"
                "              t[i+2] AS nxt))"
                " ELSE array() END"
            )
        ).alias("g")
    ).select("g.bigram", "g.nxt")
    return tri.groupBy("bigram").agg(
        F.count("*").alias("n"),
        F.count_distinct(F.col("nxt")).alias("n_cont"),
    )


# ---------------------------------------------------------------------------
# keyword retrieval: BM25 scoring
# ---------------------------------------------------------------------------

#: Fixed keyword query for the ranked-retrieval demo. Terms chosen to
#: hit the fixture vocabulary at different document frequencies.
_BM25_TERMS = ("hash", "merge", "window")
_BM25_K1 = 1.25  # exactly representable (5/4) — cross-engine determinism
_BM25_B = 0.75   # exactly representable (3/4)


def _bm25_term_sql(term: str) -> str:
    """SQL for one term's BM25 contribution; the Spark expression in
    keyword_search_bm25 mirrors this shape operation-for-operation so
    every IEEE intermediate is identical in both engines."""
    tf = f"tf_{term}"
    df = f"df_{term}"
    return (
        f"CASE WHEN {tf} > 0 THEN "
        f"ln(1 + ({'{n}'} - {df} + 0.5) / ({df} + 0.5))"
        f" * (({tf} * 2.25) / ({tf} + 1.25 * (0.25 + 0.75 * "
        f"((dl * {'{n}'}) / CAST(sum_dl AS DOUBLE))))) ELSE 0 END"
    ).replace("{n}", "CAST(n_docs AS DOUBLE)")


_BM25_SQL = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    per_doc AS (
      SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl,
             {", ".join(
                 f"CAST(len(list_filter(t, x -> x = '{w}')) AS BIGINT)"
                 f" AS tf_{w}" for w in _BM25_TERMS)}
      FROM toks
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS sum_dl,
             {", ".join(
                 f"CAST(SUM(CASE WHEN tf_{w} > 0 THEN 1 ELSE 0 END)"
                 f" AS DOUBLE) AS df_{w}" for w in _BM25_TERMS)}
      FROM per_doc
    )
    SELECT doc_id,
           {", ".join(f"tf_{w}" for w in _BM25_TERMS)},
           CAST(dl AS BIGINT) AS dl,
           ROUND({" + ".join(_bm25_term_sql(w) for w in _BM25_TERMS)}, 6)
             AS score
    FROM per_doc, stats
    WHERE {" + ".join(f"tf_{w}" for w in _BM25_TERMS)} > 0
"""


@query("keyword_search_bm25", oracle=_BM25_SQL)
def keyword_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked keyword retrieval over the corpus for a fixed
    query (the lexical-search side of a retrieval pipeline; pairs
    with the vector side in [[sim_search]]).

    Scale shape: per-doc term frequencies are one narrow projection
    over the tokenized text (no shuffle); the corpus statistics
    (N, Σdl, per-term df) are ONE tiny aggregate row broadcast back
    onto the docs, so the whole query is scan → broadcast join →
    filter — zero data-proportional shuffles at any corpus size.

    Determinism: the score formula is evaluated with an identical
    operation tree in both engines — k1=1.25 and b=0.75 are exactly
    representable doubles, tf/dl/N/Σdl enter as exact integers, and
    the per-term contributions are summed in fixed textual order
    (term columns, not a row aggregate), so the only cross-engine
    wobble is ln()'s ≤1 ulp, absorbed by ROUND(..., 6). The integer
    tf filter (not the float score) decides membership."""
    return _bm25_parts(spark, sf_dir)[2]


def _bm25_parts(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(per_doc, stats, scored) — the BM25 pass shared by
    [[keyword_search_bm25]] and [[retrieval_prf_expand]]'s pass one.
    One construction site so the two queries can never desync on the
    score formula, and so PRF's second pass can reuse the per_doc tf
    columns for the static query terms (r18). NOTE the limits,
    measured in r17: sharing the `stats` subtree with PRF's own
    corpus-stats aggregate does NOT dedupe at runtime — the two
    subtrees never canonicalize equal, ReusedExchange fired 0 times,
    and PRF's second pass ended up re-running the expensive per-term
    tf stats — so PRF keeps its own cheap two-column aggregate; this
    refactor is a single construction site, not an exchange-reuse
    device."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    def tf_of(w: str):
        # occurrence count as size(toks) - size(array_remove(toks, w)):
        # both are non-lambda builtins, so the tf projection stays in
        # whole-stage codegen — an F.filter lambda is interpreted and
        # measured ~2× slower on this stage
        return F.size(toks) - F.size(F.array_remove(toks, w))

    per_doc = d.select(
        "doc_id",
        F.size(toks).cast("double").alias("dl"),
        *[tf_of(w).cast("bigint").alias(f"tf_{w}") for w in _BM25_TERMS],
    )
    stats = per_doc.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"tf_{w}") > 0, 1).otherwise(0))
            .cast("double")
            .alias(f"df_{w}")
            for w in _BM25_TERMS
        ],
    )
    j = per_doc.crossJoin(F.broadcast(stats))
    n = F.col("n_docs").cast("double")

    def term_score(w: str):
        tf = F.col(f"tf_{w}")
        df = F.col(f"df_{w}")
        idf = F.log(F.lit(1) + (n - df + F.lit(0.5)) / (df + F.lit(0.5)))
        dl_norm = (F.col("dl") * n) / F.col("sum_dl").cast("double")
        body = (tf * F.lit(2.25)) / (
            tf + F.lit(1.25) * (F.lit(0.25) + F.lit(0.75) * dl_norm)
        )
        return F.when(tf > 0, idf * body).otherwise(F.lit(0.0))

    score = term_score(_BM25_TERMS[0])
    for w in _BM25_TERMS[1:]:
        score = score + term_score(w)
    tf_any = sum((F.col(f"tf_{w}") for w in _BM25_TERMS), F.lit(0))
    scored = j.filter(tf_any > 0).select(
        "doc_id",
        *[f"tf_{w}" for w in _BM25_TERMS],
        F.col("dl").cast("bigint").alias("dl"),
        F.round(score, 6).alias("score"),
    )
    return per_doc, stats, scored


# ---------------------------------------------------------------------------
# pseudo-relevance feedback (two-pass query expansion)
# ---------------------------------------------------------------------------

#: PRF depth (pseudo-relevant docs mined for expansion) and width
#: (expansion terms added to the query).
_PRF_R = 10
_PRF_E = 2

#: The per-(doc, term) BM25 contribution in ROW form — the same
#: operand tree as ``_bm25_term_sql`` but over (tf, df, dl) columns,
#: because the second pass scores DYNAMIC terms that cannot be
#: unrolled into per-term columns at plan time.
_PRF_CONTRIB = (
    "ln(1 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))"
    " * ((tf * 2.25) / (tf + 1.25 * (0.25 + 0.75"
    " * ((dl * CAST(n_docs AS DOUBLE)) / CAST(sum_dl AS DOUBLE)))))"
)

_PRF_SQL = f"""
    WITH base AS ({_BM25_SQL}),
    top_docs AS (
      SELECT doc_id FROM base ORDER BY score DESC, doc_id LIMIT {_PRF_R}
    ),
    rel_toks AS (
      SELECT t.term, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT unnest(string_split(d.text, ' ')) AS term
        FROM documents d JOIN top_docs td ON d.doc_id = td.doc_id
      ) t
      WHERE t.term NOT IN ({", ".join(f"'{w}'" for w in _BM25_TERMS)})
      GROUP BY t.term
    ),
    exp2 AS (
      SELECT term FROM rel_toks ORDER BY cnt DESC, term LIMIT {_PRF_E}
    ),
    qterms AS (
      SELECT term FROM exp2
      UNION ALL
      SELECT unnest([{", ".join(f"'{w}'" for w in _BM25_TERMS)}]) AS term
    ),
    corpus AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    dls AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
      FROM documents
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_dl
      FROM documents
    ),
    tf AS (
      SELECT c.doc_id, c.term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM corpus c JOIN qterms q ON c.term = q.term
      GROUP BY c.doc_id, c.term
    ),
    dfs AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
    ),
    scored AS (
      SELECT tf.doc_id,
             list_reduce(list_sort(list({_PRF_CONTRIB})),
                         (a, b) -> a + b) AS s
      FROM tf
      JOIN dfs USING (term)
      JOIN dls USING (doc_id), stats
      GROUP BY tf.doc_id
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY ROUND(s, 6) DESC, doc_id)
                AS BIGINT) AS rank,
           doc_id,
           ROUND(s, 6) AS score,
           COALESCE((SELECT string_agg(term, ',' ORDER BY term)
                     FROM exp2), '') AS exp_terms
    FROM scored
    ORDER BY ROUND(s, 6) DESC, doc_id
    LIMIT {_PRF_R}
"""


@query("retrieval_prf_expand", oracle=_PRF_SQL)
def retrieval_prf_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback retrieval (Rocchio/RM1-lite): run
    the fixed BM25 query ([[keyword_search_bm25]] verbatim as pass
    one — the oracle embeds its SQL as a CTE, the composition-graded
    pattern from [[retrieval_hybrid_rrf]]), mine the top-{_PRF_R}
    pseudo-relevant docs for the {_PRF_E} heaviest non-query terms,
    and re-score the corpus against the EXPANDED query. The classic
    recall-repair move in lexical retrieval, and a deliberately
    two-pass plan: retrieval quality work that cannot be expressed
    as one scan.

    Determinism by construction: expansion-term selection is pure
    integer (summed tf in the relevant set, term-string tie-break),
    pass-one ranking compares ROUND(score,6) then doc_id, and the
    second pass scores dynamic (doc, term) ROWS with the same
    operand tree as the static pass — ints in, one ln() wobble
    absorbed by the final ROUND(,6), and the per-doc contribution
    sum runs as a SORTED left-to-right fold on both engines (the
    [[agg_chi_square_indep]] device — a plain float SUM's
    accumulation order is partition-dependent; r16 self-review).

    Scale shape: pass one is scan → 1-row broadcast stats → filter
    (zero data-proportional shuffles); the relevant-set mining
    touches {_PRF_R} docs via a broadcast semi-join; the second pass
    is explode → broadcast term join → (doc, term) partial-agg —
    the exploded stream is filtered to ≤5 query terms BEFORE any
    exchange, so the shuffled volume is matching-postings-sized,
    not corpus-sized (the inverted-index shape, same as BM25 at
    100 TB)."""
    d = load(spark, sf_dir, "documents")
    # Sharing `base`'s internal stats subtree for the second pass was
    # tried in r17 (hoping ReuseExchange would dedupe the broadcast
    # build) and MEASURED OFF: the two subtrees never canonicalize
    # equal (ReusedExchange: 0 in the executed plan — the same
    # no-reuse trap the basket code documents), so the second pass
    # was re-running the EXPENSIVE per-term tf stats instead of this
    # cheap two-column aggregate. Kept cheap and local.
    per_doc, _, base = _bm25_parts(spark, sf_dir)
    stats = d.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("sum_dl"),
    )
    top = (
        base.orderBy(F.col("score").desc(), "doc_id")
        .limit(_PRF_R)
        .select("doc_id")
    )
    # mining explodes ONLY the _PRF_R pseudo-relevant docs: the
    # broadcast semi-join runs on whole-doc rows BEFORE the token
    # explode (r18, guide §2.4/§3.3 "explode after the join") — the
    # r17 form exploded the full corpus and then kept 10 docs' tokens
    rel = (
        d.join(F.broadcast(top), "doc_id")
        .select(F.explode(F.split("text", " ")).alias("term"))
        .filter(~F.col("term").isin(*_BM25_TERMS))
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    # lazily pinned: exp2 (≤_PRF_E rows) is consumed by the dynamic
    # tf filter AND the exp_terms report column, and its lineage is
    # the ENTIRE mining pass including pass one's ranking — unpinned,
    # every consumer re-runs that chain (the plan showed it 3×; AQE
    # stage reuse deduped only some of it at runtime)
    exp2 = (
        rel.orderBy(F.col("cnt").desc(), "term")
        .limit(_PRF_E)
        .select("term")
        .localCheckpoint(eager=False)
    )
    # Second pass, split by term class (r17 verdict ask #4):
    # the STATIC query terms' (doc, term, tf, dl) rows come straight
    # from pass one's per_doc tf columns (in-row array counting — no
    # explode, no exchange: the rows are already per-doc aggregated),
    # and only the ≤_PRF_E DYNAMIC expansion terms ride the corpus
    # explode → broadcast term filter → (doc, term) rollup. The
    # exploded-and-shuffled volume drops from 5-term to 2-term
    # postings and the qterms union + its broadcast build disappear.
    # exp2 is disjoint from _BM25_TERMS by construction (the mining
    # filter above), so the union cannot double-count a (doc, term).
    toks = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("double").alias("dl"),
        F.explode(F.split("text", " ")).alias("term"),
    )
    dyn_tf = (
        toks.join(F.broadcast(exp2), "term")
        .groupBy("doc_id", "term")
        .agg(
            F.count("*").cast("bigint").alias("tf"),
            F.first("dl").alias("dl"),
        )
    )
    static_tf = per_doc.select(
        "doc_id",
        "dl",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(w).alias("term"),
                        F.col(f"tf_{w}").alias("tf"),
                    )
                    for w in _BM25_TERMS
                ]
            )
        ).alias("e"),
    ).select(
        "doc_id", F.col("e.term").alias("term"), F.col("e.tf").alias("tf"), "dl"
    ).filter(F.col("tf") > 0)
    # lazily pinned: tf feeds BOTH the df aggregate and the scoring
    # join — unpinned, the whole union subtree (corpus explode +
    # rollup + static unpivot) is duplicated under the dfs broadcast
    # build (r18 before-plan). The pin is matching-postings-sized
    # (≤ query-term postings per doc), the inverted-index bound.
    tf = dyn_tf.unionByName(
        static_tf.select("doc_id", "term", "tf", "dl")
    ).localCheckpoint(eager=False)
    dfs = tf.groupBy("term").agg(
        F.count("*").cast("double").alias("df")
    )
    j = tf.join(F.broadcast(dfs), "term").crossJoin(F.broadcast(stats))
    n = F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1) + (n - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    dl_norm = (F.col("dl") * n) / F.col("sum_dl").cast("double")
    body = (F.col("tf") * F.lit(2.25)) / (
        F.col("tf")
        + F.lit(1.25) * (F.lit(0.25) + F.lit(0.75) * dl_norm)
    )
    # SORTED fold of the per-term contributions (the chi-square
    # device, r16 self-review): a plain float SUM accumulates in
    # partition-dependent order on Spark and row order on DuckDB —
    # non-associative double addition can land a doc's score an ulp
    # across a ROUND(,6) boundary or swap the rank-10 cutoff. Both
    # engines now fold the sorted ≤10-element array left-to-right.
    scored = (
        j.select("doc_id", (idf * body).alias("contrib"))
        .groupBy("doc_id")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(contrib)),"
                " CAST(0 AS DOUBLE), (a, x) -> a + x)"
            ).alias("s")
        )
    )
    expcol = exp2.agg(
        F.array_join(F.sort_array(F.collect_list("term")), ",").alias(
            "exp_terms"
        )
    )
    top10 = (
        scored.orderBy(F.round("s", 6).desc(), "doc_id")
        .limit(_PRF_R)
        .crossJoin(F.broadcast(expcol))
    )
    w = W.orderBy(F.round("s", 6).desc(), "doc_id")
    return top10.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        F.round("s", 6).alias("score"),
        "exp_terms",
    )


retrieval_prf_expand.__doc__ = (
    retrieval_prf_expand.__doc__.replace("{_PRF_R}", str(_PRF_R))
    .replace("{_PRF_E}", str(_PRF_E))
)


# ---------------------------------------------------------------------------
# tokenizer vocabulary coverage
# ---------------------------------------------------------------------------

#: Vocabulary size for the coverage report — small enough that the
#: fixture produces a real OOV tail.
_VOCAB_TOP = 50

_VOCAB_OOV_SQL = f"""
    WITH toks AS (
      SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    vocab AS (
      SELECT term FROM (
        SELECT term, COUNT(*) AS n,
               row_number() OVER (ORDER BY COUNT(*) DESC, term ASC) AS rnk
        FROM toks GROUP BY term
      ) WHERE rnk <= {_VOCAB_TOP}
    )
    SELECT t.lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS oov_frac
    FROM toks t LEFT JOIN vocab v ON t.term = v.term
    GROUP BY t.lang
"""


@query("vocab_oov_report", oracle=_VOCAB_OOV_SQL)
def vocab_oov_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage: build the top-``_VOCAB_TOP``
    term vocabulary from the corpus itself (count-desc, term-asc — a
    total order, so the vocabulary boundary is deterministic), then
    report per language how many tokens fall outside it — the
    out-of-vocabulary rate that decides whether a tokenizer's vocab
    suits a corpus slice before a training run.

    Scale shape: the vocabulary is one term-count shuffle
    (vocabulary-sized state, the [[tfidf_top_terms]] bound) and is
    tiny by construction, so membership tagging is a BROADCAST left
    join riding the token scan — the corpus-proportional token
    stream is never shuffled; the only other exchange is the
    O(languages) final rollup. OOV fraction is a division of exact
    integers (bit-identical, no ROUND)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("lang", F.explode(F.split("text", " ")).alias("term"))
    vocab = (
        toks.groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("term").asc())
        .limit(_VOCAB_TOP)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    tagged = toks.join(F.broadcast(vocab), "term", "left")
    return tagged.groupBy("lang").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_oov"),
        (
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).cast(
                "double"
            )
            / F.count("*")
        ).alias("oov_frac"),
    )


# ---------------------------------------------------------------------------
# unigram-LM quality scoring (the perplexity-proxy filter)
# ---------------------------------------------------------------------------

_LOGPROB_SQL = """
    WITH tokens AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    vocab AS (
      SELECT term,
             CAST(round(ln(COUNT(*)) * 1000000) AS BIGINT) AS lp6
      FROM tokens GROUP BY term
    ),
    tot AS (
      SELECT CAST(round(ln(COUNT(*)) * 1000000) AS BIGINT) AS ln_total6
      FROM tokens
    )
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(v.lp6) AS BIGINT) AS sum_lp6,
           CAST(SUM(v.lp6) - COUNT(*) * tot.ln_total6 AS DOUBLE)
             / (1000000.0 * COUNT(*)) AS mean_logprob
    FROM tokens t JOIN vocab v USING (term), tot
    GROUP BY t.doc_id, tot.ln_total6
"""


@query("quality_unigram_logprob", oracle=_LOGPROB_SQL)
def quality_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: train a unigram LM on the
    corpus itself and score every document by its mean token
    log-probability — the CCNet/Gopher-family LM filter (low mean
    logprob ⇒ rare-token gibberish; suspiciously high ⇒ boilerplate),
    the standard third quality axis after rule scores
    ([[quality_score]]) and repetition ([[repetition_stats]]).

    Cross-engine exactness (the ln() hazard, same treatment as
    [[keyword_search_bm25]]'s idf): every per-token log-probability
    is quantized ONCE to integer micro-nats — lp6 = round(ln(count)
    ·1e6) — in the vocabulary, where each distinct count is rounded
    a single time; per-document accumulation is then a pure BIGINT
    sum (associative — partial aggregation and any AQE merge order
    match DuckDB's sequential fold bit-for-bit), ln(N_total) is
    quantized the same way, and the one double division at the end
    is the same IEEE operation in both engines. A 1-ulp ln()
    divergence only matters if some ln(count)·1e6 sits within an ulp
    of a .5 boundary — and because it is rounded once per DISTINCT
    count (not per token), the exposure is a few thousand values,
    not billions.

    Scale shape: the vocabulary is one map-side-combined term-count
    shuffle (vocabulary-sized state, the [[tfidf_top_terms]] /
    [[vocab_oov_report]] bound); scoring BROADCAST-joins it onto the
    token scan, so the corpus-proportional token stream is never
    shuffled — the only data-proportional exchange is the per-doc
    rollup, and its partial aggregation collapses each doc's tokens
    map-side. Scoring the corpus with its own LM means count ≥ 1 for
    every token (no OOV smoothing branch; scoring a HELD-OUT stream
    adds a broadcast-miss default, same plan)."""
    d = load(spark, sf_dir, "documents")
    toks = fan_out(d).select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    # ONE corpus-proportional aggregation builds the count table; the
    # lazy checkpoint lets both the lp6 vocabulary and the corpus
    # total read it back at vocabulary size. N_total = Σ vocab counts
    # — the same integer the oracle's COUNT(*) over tokens yields, so
    # ln() quantizes identically — and deriving it here avoids a
    # THIRD full scan+explode of the corpus (r8 review finding).
    vocab_cnt = (
        toks.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    vocab = vocab_cnt.select("term", micro_ln("cnt").alias("lp6"))
    tot = vocab_cnt.agg(micro_ln(F.sum("cnt")).alias("ln_total6"))
    # the 1-row total attaches AFTER the per-doc rollup (doc-count
    # rows, not token-count rows) — previously it rode every token
    # row and its broadcast was a second serial build before the
    # corpus scan could start (r17 optimization, guide §2.3/§2.4)
    scored = toks.join(F.broadcast(vocab), "term")
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum("lp6").cast("bigint").alias("sum_lp6"),
    )
    return per_doc.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "n_tokens",
        "sum_lp6",
        (
            (
                F.col("sum_lp6") - F.col("n_tokens") * F.col("ln_total6")
            ).cast("double")
            / (F.lit(1000000.0) * F.col("n_tokens"))
        ).alias("mean_logprob"),
    )


_DECILE_SQL = f"""
    WITH perdoc AS ({_LOGPROB_SQL}),
    ranked AS (
      SELECT *, NTILE(10) OVER (ORDER BY mean_logprob, doc_id) AS decile
      FROM perdoc
    )
    SELECT decile,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens,
           MIN(mean_logprob) AS min_mean_logprob,
           MAX(mean_logprob) AS max_mean_logprob
    FROM ranked
    GROUP BY decile
    ORDER BY decile
"""


@query("quality_decile_report", oracle=_DECILE_SQL)
def quality_decile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-decile report over the [[quality_unigram_logprob]]
    scores — the data-mixing ablation table: rank every document by
    its LM quality score, split into ten equal-count buckets, and
    report each bucket's size and score range. This is the artifact
    a curation run reads to pick a quality threshold (or per-decile
    sampling weights) BEFORE committing to a filtered mix.

    Cross-engine determinism of the ranking: mean_logprob is one
    IEEE division of exact integers on both engines, so the doubles
    are bit-identical; NTILE's order (score, then doc_id) is total;
    and both engines share the standard NTILE remainder rule (first
    buckets take the extra row). Scale shape: the scores themselves
    are the [[quality_unigram_logprob]] plan; the global NTILE is
    the only new exchange — a single-partition sort of doc-level
    rows. At 100 TB replace it with a two-pass split: approx
    percentile boundaries on the score column, then a broadcast
    range-bucket join — same report, no global sort; the exact
    NTILE form here is the oracle-checkable anchor."""
    scores = quality_unigram_logprob(spark, sf_dir)
    ranked = scores.withColumn(
        "decile",
        F.ntile(10).over(
            W.orderBy(F.col("mean_logprob").asc(), F.col("doc_id").asc())
        ),
    )
    return (
        ranked.groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            (F.sum("n_tokens").cast("double") / F.count("*")).alias(
                "avg_tokens"
            ),
            F.min("mean_logprob").alias("min_mean_logprob"),
            F.max("mean_logprob").alias("max_mean_logprob"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# trained quality classifier (multinomial Naive Bayes log-odds)
# ---------------------------------------------------------------------------

_NB_SQL = """
    WITH lab AS (
      SELECT doc_id, text,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    tokens AS (
      SELECT doc_id, pos, unnest(string_split(text, ' ')) AS term
      FROM lab
    ),
    vocab AS (
      SELECT term,
             CAST(round(ln(SUM(pos) + 1) * 1000000) AS BIGINT)
               - CAST(round(ln(SUM(1 - pos) + 1) * 1000000) AS BIGINT)
               AS w6
      FROM tokens GROUP BY term
    ),
    norm AS (
      SELECT CAST(round(ln(SUM(pos)
                           + (SELECT COUNT(*) FROM vocab)) * 1000000)
                  AS BIGINT)
               - CAST(round(ln(SUM(1 - pos)
                               + (SELECT COUNT(*) FROM vocab)) * 1000000)
                      AS BIGINT) AS z6
      FROM tokens
    ),
    prior AS (
      -- empty-class guard mirrors the Spark operator: without it the
      -- engines fail DIFFERENTLY (Spark ln(0) -> NULL silently nulls
      -- every score, DuckDB ln(0) -> -inf), turning a bad reference
      -- slice into a confusing hash mismatch instead of an error
      SELECT CASE WHEN SUM(pos) > 0 AND SUM(1 - pos) > 0
                  THEN CAST(round(ln(SUM(pos)) * 1000000) AS BIGINT)
                       - CAST(round(ln(SUM(1 - pos)) * 1000000) AS BIGINT)
                  ELSE CAST(error('nb: reference slice has an empty class')
                            AS BIGINT)
             END AS p6
      FROM lab
    )
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(v.w6) AS BIGINT) AS sum_w6,
           CAST(SUM(v.w6) - COUNT(*) * norm.z6 + prior.p6 AS DOUBLE)
             / 1000000.0 AS nb_logodds,
           CASE WHEN SUM(v.w6) - COUNT(*) * norm.z6 + prior.p6 > 0
                THEN 1 ELSE 0 END AS pred_target
    FROM tokens t JOIN vocab v USING (term), norm, prior
    GROUP BY t.doc_id, norm.z6, prior.p6
"""


@query("quality_classifier_nb", oracle=_NB_SQL)
def quality_classifier_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality classifier — the GPT-3/CCNet pipeline step the
    heuristic gates ([[quality_score]]) and the unigram LM
    ([[quality_unigram_logprob]]) lead up to: train a multinomial
    Naive Bayes model against a reference "target" slice (here
    ``lang = 'en'`` stands in for the curated high-quality corpus)
    and score EVERY document by its token log-odds

        logodds(d) = Σ_t [ln(c_pos(t)+1) − ln(c_neg(t)+1)]
                     − n_d·[ln(N_pos+V) − ln(N_neg+V)]
                     + ln(D_pos) − ln(D_neg)

    (add-one smoothing over the shared vocabulary V; the bracketed
    per-token weight is exactly the linear fastText-style filter
    weight, trained in-engine with one aggregation instead of SGD).
    ``pred_target`` is the sign of the log-odds.

    Cross-engine exactness (the [[quality_unigram_logprob]] ln
    treatment): every ln takes an INTEGER argument and is quantized
    once per distinct value to micro-nats (round(ln(k)·1e6) —
    BIGINT); per-document accumulation is a pure BIGINT sum, and the
    one double division at the end is the same IEEE operation in both
    engines. The sign test runs on the exact integers, BEFORE any
    float appears.

    Scale shape: training is ONE map-side-combined term-count shuffle
    with two conditional sums (vocabulary-sized state — the model IS
    the w6 column); the two normalizer frames are 1-row broadcasts;
    scoring BROADCAST-joins the model onto the token scan, so the
    corpus-proportional token stream is never shuffled — the only
    data-proportional exchange is the per-doc rollup, partially
    aggregated map-side. Retraining on a new reference slice is the
    same plan with a different label predicate."""
    return nb_quality_scores_of(
        fan_out(load(spark, sf_dir, "documents")).select(
            "doc_id", "text", target_label().alias("pos")
        )
    )


def target_label():
    """The shared target-slice label (``lang = 'en'`` stands in for
    the curated reference corpus) used by the NB classifier, DSIR,
    and their composition [[corpus_pipeline_trained]] — ONE
    definition so a future reference-slice change can't
    desynchronize a stage from the composed key (whose oracle embeds
    the stage oracles verbatim)."""
    return F.when(F.col("lang") == "en", 1).otherwise(0)


def nb_quality_scores_of(lab: DataFrame) -> DataFrame:
    """The Naive Bayes train+score aggregation over any labeled
    ``(doc_id, text, pos)`` frame — module-level so the hypothesis
    differential test runs the SAME fold the registered query runs.
    Requires at least one document in each class (``ln(D)`` of an
    empty class is the usual NB degenerate case) — ENFORCED: an empty
    class raises via the guard in the prior aggregate rather than
    silently nulling every score (Spark ``ln(0)`` is NULL), and the
    SQL twin raises identically via ``error()``."""

    _r6 = micro_ln
    toks = lab.select(
        "doc_id", "pos", F.explode(F.split("text", " ")).alias("term")
    )
    vocab_cnt = (
        toks.groupBy("term")
        .agg(
            F.sum("pos").alias("cpos"),
            F.sum(1 - F.col("pos")).alias("cneg"),
        )
        .localCheckpoint(eager=False)
    )
    vocab = vocab_cnt.select(
        "term",
        (_r6(F.col("cpos") + 1) - _r6(F.col("cneg") + 1)).alias("w6"),
    )
    norm = vocab_cnt.agg(
        F.sum("cpos").alias("npos"),
        F.sum("cneg").alias("nneg"),
        F.count("*").alias("v"),
    ).select(
        (_r6(F.col("npos") + F.col("v")) - _r6(F.col("nneg") + F.col("v")))
        .alias("z6")
    )
    # empty-class guard (r10 ADVICE): Spark's ln(0) is NULL, which
    # would silently null every nb_logodds/pred_target downstream —
    # fail loudly instead, and identically to the SQL twin's error()
    # branch. Lives in the 1-row prior aggregate so it costs nothing
    # and fires before any score is emitted.
    prior = lab.agg(
        F.sum("pos").alias("dpos"),
        F.sum(1 - F.col("pos")).alias("dneg"),
    ).select(
        F.when(
            (F.col("dpos") > 0) & (F.col("dneg") > 0),
            _r6("dpos") - _r6("dneg"),
        )
        .otherwise(
            F.raise_error(
                F.lit("nb_quality_scores_of: reference slice has an "
                      "empty class (need >=1 doc on each side)")
            ).cast("bigint")
        )
        .alias("p6")
    )
    scored = (
        toks.join(F.broadcast(vocab), "term")
        .crossJoin(F.broadcast(norm))
        .crossJoin(F.broadcast(prior))
    )
    margin = (
        F.sum("w6") - F.count("*") * F.first("z6") + F.first("p6")
    )
    return (
        scored.groupBy("doc_id", "z6", "p6")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("w6").cast("bigint").alias("sum_w6"),
            (margin.cast("double") / F.lit(1000000.0)).alias("nb_logodds"),
            F.when(margin > 0, 1).otherwise(0).alias("pred_target"),
        )
        .drop("z6", "p6")
    )


# ---------------------------------------------------------------------------
# winnowing fingerprints (MOSS local fingerprinting)
# ---------------------------------------------------------------------------

#: Winnowing parameters: token k-gram size and window width. Any
#: duplicated token run of length ≥ t = _WIN_W + _WIN_K − 1 (= 7) is
#: GUARANTEED to share a fingerprint — the paper's correctness bound.
_WIN_K = 4
_WIN_W = 4

_WINNOW_SQL = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    kg AS (
      SELECT doc_id, i,
             {md5_u32_duck(
                 "t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]"
             )} AS h
      FROM toks, UNNEST(generate_series(1, len(t) - {_WIN_K - 1}))
             AS u(i)
      WHERE len(t) >= {_WIN_K}
    ),
    wins AS (
      SELECT doc_id, j
      FROM toks, UNNEST(generate_series(1,
             greatest(1, len(t) - {_WIN_K - 1} - {_WIN_W} + 1))) AS u(j)
      WHERE len(t) >= {_WIN_K}
    ),
    sel AS (
      SELECT w.doc_id, w.j, k.i, k.h,
             row_number() OVER (PARTITION BY w.doc_id, w.j
                                ORDER BY k.h ASC, k.i DESC) AS rn
      FROM wins w JOIN kg k
        ON k.doc_id = w.doc_id
       AND k.i >= w.j AND k.i <= w.j + {_WIN_W - 1}
    ),
    fp AS (
      SELECT DISTINCT doc_id, i, h FROM sel WHERE rn = 1
    ),
    nk AS (SELECT doc_id, COUNT(*) AS n_kgrams FROM kg GROUP BY doc_id)
    SELECT nk.doc_id, nk.n_kgrams,
           COUNT(*) AS n_fingerprints,
           CAST(COUNT(*) AS DOUBLE) / nk.n_kgrams AS fp_density,
           CAST(SUM(h) AS BIGINT) AS fp_checksum
    FROM nk JOIN fp USING (doc_id)
    GROUP BY nk.doc_id, nk.n_kgrams
"""


@query("doc_fingerprint_winnow", oracle=_WINNOW_SQL)
def doc_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 —
    the MOSS algorithm), completing the fingerprint family after
    whole-doc digests ([[doc_fingerprint]]) and rolling hashes
    ([[doc_fingerprint_rolling]]): hash every token ``_WIN_K``-gram,
    slide a ``_WIN_W``-wide window over the hash sequence, and keep
    each window's minimum hash (rightmost on ties); the distinct
    selected (position, hash) pairs are the fingerprint set. The
    guarantee that makes it famous: any duplicated run of at least
    w+k−1 tokens shares a fingerprint between the two copies, at an
    expected density of only 2/(w+1) — the local, position-robust
    near-dup signal that whole-doc hashing cannot give. Documents
    shorter than k tokens have no k-gram and are absent, matching
    the oracle; shorter than w+k−1 winnow one truncated window.

    Scale shape — the headline fact: winnowing is a PER-DOCUMENT
    local algorithm, and the plan keeps it that way. Hash sequence,
    window minima (an ``aggregate`` fold per window with the
    rightmost-tie rule folded in), dedup, and checksum are ALL
    in-row higher-order functions in one codegen stage: the operator
    has ZERO exchanges at any corpus size (the plan-shape test
    asserts no Exchange node). The oracle states the same semantics
    relationally (window × k-gram range join + rank) — the shape a
    non-columnar engine is forced into. Cross-engine exactness: the
    k-gram hash is the md5-hex-substring integer (bit-identical in
    both engines, [[corpus_dsir_select]]); counts and the checksum
    are exact bigints; density is one IEEE division."""
    d = fan_out(load(spark, sf_dir, "documents"))
    k, w = _WIN_K, _WIN_W
    # filter BEFORE building the hash sequence: sequence(1, n) with
    # n < 1 would generate a DESCENDING range, not an empty one
    # tk projected as its own column (r14 HOF audit): referenced
    # from the per-k-gram lambda, split(text) would re-tokenize the
    # doc PER K-GRAM — O(T²)/doc
    kgram = f"concat_ws(' ', slice(tk, i, {k}))"
    hs = (
        d.filter(F.expr(f"size(split(text, ' ')) >= {k}"))
        .select("doc_id", F.split("text", " ").alias("tk"))
        .select(
            "doc_id",
            F.expr(
                f"transform(sequence(1, size(tk) - {k - 1}),"
                f" i -> {md5_u32_sql(kgram)})"
            ).alias("hs"),
        )
    )
    # per-window rightmost-min selection, then distinct (i, h) pairs
    # — all in-row; `hs` is 0-indexed inside the lambdas while the
    # oracle is 1-indexed: only the pair SET's cardinality and the
    # hash checksum surface, both index-shift-invariant
    sel = hs.select(
        "doc_id",
        F.size("hs").alias("n_kgrams"),
        F.expr(
            f"array_distinct(transform("
            f"  sequence(0, greatest(0, size(hs) - {w})),"
            f"  j -> aggregate("
            f"    sequence(j, least(j + {w - 1}, size(hs) - 1)),"
            f"    named_struct('i', -1, 'h', 9223372036854775807L),"
            f"    (acc, i) -> IF(hs[i] <= acc.h,"
            f"      named_struct('i', i, 'h', hs[i]), acc))))"
        ).alias("fps"),
    )
    return sel.select(
        "doc_id",
        F.col("n_kgrams").cast("bigint").alias("n_kgrams"),
        F.size("fps").cast("bigint").alias("n_fingerprints"),
        (F.size("fps").cast("double") / F.col("n_kgrams")).alias(
            "fp_density"
        ),
        F.expr(
            "CAST(aggregate(fps, 0L, (acc, f) -> acc + f.h) AS BIGINT)"
        ).alias("fp_checksum"),
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training (byte-pair-encoding merge learning)
# ---------------------------------------------------------------------------

#: Number of BPE merges the training key learns. Fixed so the SQL
#: oracle can unroll the loop as CTEs (the [[sim_search_ivfpq_trained]]
#: treatment of iterative algorithms).
_BPE_MERGES = 6


def _bpe_cte_parts(merges: int) -> list:
    """The unrolled BPE merge-loop CTE chain shared by the
    [[tokenizer_bpe_train]] and [[tokenizer_fertility_report]]
    oracles: per iteration a (pair counts → argmax merge → greedy
    apply) triple, with the greedy left-to-right merge expressed as a
    ``list_reduce`` string fold — acc ends with '…<sep>p1', so
    merging is the pure string append acc||p2 (a just-merged symbol
    can never re-match as p1 of the same pair, since p1p2 = p1 is
    impossible)."""
    parts = [
        """w0 AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
             array_to_string(string_split(word, ''), ' ') AS syms
      FROM (SELECT unnest(string_split(text, ' ')) AS word
            FROM documents)
      WHERE word <> '' GROUP BY word)"""
    ]
    for t in range(1, merges + 1):
        parts.append(
            f"""p{t} AS (
      SELECT a[i] AS l, a[i+1] AS r, CAST(SUM(cnt) AS BIGINT) AS c
      FROM (SELECT cnt, string_split(syms, ' ') AS a FROM w{t - 1}),
           UNNEST(generate_series(1, len(a) - 1)) AS u(i)
      GROUP BY l, r)"""
        )
        parts.append(
            f"""m{t} AS (
      SELECT l, r, c FROM p{t} ORDER BY c DESC, l, r LIMIT 1)"""
        )
        parts.append(
            f"""w{t} AS (
      SELECT word, cnt,
             CASE WHEN m.l IS NULL THEN w.syms
                  ELSE list_reduce(string_split(w.syms, ' '),
                    (acc, y) -> CASE
                      WHEN list_extract(string_split(acc, ' '), -1) = m.l
                           AND y = m.r
                      THEN acc || y ELSE acc || ' ' || y END)
             END AS syms
      FROM w{t - 1} w LEFT JOIN m{t} m ON TRUE)"""
        )
    return parts


def _bpe_sql(merges: int) -> str:
    """[[tokenizer_bpe_train]]'s oracle: the merge table."""
    parts = _bpe_cte_parts(merges)
    final = "\n    UNION ALL ".join(
        f"SELECT CAST({t} AS BIGINT) AS merge_rank, l AS sym_left,"
        f" r AS sym_right, c AS pair_count FROM m{t}"
        for t in range(1, merges + 1)
    )
    return "WITH " + ",\n    ".join(parts) + "\n    " + final


def _bpe_fertility_sql(merges: int) -> str:
    """[[tokenizer_fertility_report]]'s oracle: the trained vocabulary
    (w{merges}) applied back to the token stream, rolled up per
    language."""
    parts = _bpe_cte_parts(merges)
    final = f"""tok AS (
      SELECT lang, word FROM (
        SELECT lang, unnest(string_split(text, ' ')) AS word
        FROM documents) WHERE word <> ''),
    voc AS (
      SELECT word, CAST(len(string_split(syms, ' ')) AS BIGINT) AS n_sub
      FROM w{merges})
    SELECT lang,
           COUNT(*) AS n_words,
           CAST(SUM(n_sub) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(length(word)) AS BIGINT) AS n_chars,
           CAST(SUM(n_sub) AS DOUBLE) / COUNT(*) AS fertility,
           CAST(SUM(length(word)) AS DOUBLE) / SUM(n_sub)
             AS chars_per_token
    FROM tok JOIN voc USING (word)
    GROUP BY lang"""
    return "WITH " + ",\n    ".join(parts) + ",\n    " + final


@query("tokenizer_bpe_train", oracle=_bpe_sql(_BPE_MERGES))
def tokenizer_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training IN-ENGINE (Sennrich et al. 2016 — the
    vocabulary-learning step every modern LM tokenizer descends
    from): start from characters, repeatedly count adjacent symbol
    pairs over the corpus and merge the most frequent one (ties
    broken count-desc, then pair lexicographic — a total order), for
    ``_BPE_MERGES`` fixed iterations. Output is the learned merge
    table (rank, left symbol, right symbol, pair count) — the
    artifact a tokenizer ships.

    The classic scale trick is built in: BPE trains on the WORD
    FREQUENCY DICTIONARY, not the token stream — the single
    corpus-proportional operation is the initial word count shuffle;
    every merge iteration then touches only the vocabulary-sized
    word table (pair counts weighted by word frequency), so the loop
    cost is independent of corpus size. Each iteration's winning
    pair attaches as a 1-row broadcast and the greedy left-to-right
    merge is an in-row fold (acc ends with '…␠p1' ⇒ merging is the
    pure append acc||p2; a just-merged symbol can never re-match as
    p1 in the same pass since p1p2 = p1 is impossible — the overlap
    rule, e.g. 'aaa' merges to ['aa','a'], falls out of the fold).
    Per-iteration lazy localCheckpoints keep the 6-deep lineage
    shallow, the [[sim_search_ivfpq_trained]] Lloyd-loop treatment;
    exactness is trivial — every value is an exact BIGINT count or a
    string, no floats anywhere. A corpus whose words are all single
    characters stops merging (empty argmax → word table passes
    through unchanged, no merge row), matching the oracle's LEFT
    JOIN ON TRUE."""
    return bpe_train_of(fan_out(load(spark, sf_dir, "documents")))


def bpe_train_of(d: DataFrame, merges: int = _BPE_MERGES) -> DataFrame:
    """The BPE merge table over any ``(text, ...)`` frame —
    module-level so the hypothesis differential test runs the SAME
    fold the registered query runs."""
    merge_rows, _ = _bpe_loop(d, merges)
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionAll(m)
    return out


def _bpe_loop(d: DataFrame, merges: int):
    """The shared merge-learning loop: returns the per-iteration
    1-row merge frames AND the final word table (word, cnt, syms
    after all merges) — [[tokenizer_bpe_train]] unions the former,
    [[tokenizer_fertility_report]] applies the latter."""
    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .select(
            "word",
            "cnt",
            F.array_join(F.split("word", ""), " ").alias("syms"),
        )
        .localCheckpoint(eager=False)
    )
    merge_rows = []
    w = words
    for t in range(1, merges + 1):
        # ss projected before the pair lambda (r14 HOF audit): the
        # per-pair split(syms) re-tokenizes the word per adjacent
        # pair — word-length-bounded, but free to avoid
        pairs = (
            w.filter(F.size(F.split("syms", " ")) >= 2)
            .select("cnt", F.split("syms", " ").alias("ss"))
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(ss) - 1),"
                        " i -> struct(ss[i-1] AS l, ss[i] AS r))"
                    )
                ).alias("p"),
            )
        )
        best = (
            pairs.groupBy(
                F.col("p.l").alias("l"), F.col("p.r").alias("r")
            )
            .agg(F.sum("cnt").cast("bigint").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .localCheckpoint(eager=False)
        )
        merge_rows.append(
            best.select(
                F.lit(t).cast("bigint").alias("merge_rank"),
                F.col("l").alias("sym_left"),
                F.col("r").alias("sym_right"),
                F.col("c").alias("pair_count"),
            )
        )
        w = (
            w.join(F.broadcast(best), F.lit(True), "left")
            .select(
                "word",
                "cnt",
                F.when(F.col("l").isNull(), F.col("syms"))
                .otherwise(
                    F.expr(
                        "aggregate("
                        " slice(split(syms, ' '), 2,"
                        "       size(split(syms, ' ')) - 1),"
                        " split(syms, ' ')[0],"
                        " (acc, y) -> IF("
                        "   element_at(split(acc, ' '), -1) = l AND y = r,"
                        "   concat(acc, y), concat(acc, ' ', y)))"
                    )
                )
                .alias("syms"),
            )
            .localCheckpoint(eager=False)
        )
    return merge_rows, w


_FERTILITY_ORACLE = _bpe_fertility_sql(_BPE_MERGES)


@query("tokenizer_fertility_report", oracle=_FERTILITY_ORACLE)
def tokenizer_fertility_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer fertility per language — the metric a multilingual
    tokenizer is judged by (fertility = subword tokens emitted per
    word; a vocabulary trained on one language's corpus fragments the
    others, inflating their training cost and context usage): apply
    the [[tokenizer_bpe_train]] vocabulary back to the corpus and
    report, per language, word/token/char totals, fertility, and
    chars-per-token compression.

    Scale shape: the trained word table is vocabulary-sized, so the
    apply step is a BROADCAST join riding the token scan (the
    [[vocab_oov_report]] shape) — the corpus-proportional token
    stream is never shuffled; the rollup is O(languages). Every
    total is an exact BIGINT; the two ratios are single IEEE
    divisions. The merge loop IMPLEMENTATION is shared with
    [[tokenizer_bpe_train]] (``_bpe_loop``), but each registered key
    executes its own training run — a caller wanting both the merge
    table and the fertility report in one pass should call
    ``_bpe_loop`` once and derive both artifacts from its return
    value (the loop is vocab-sized either way)."""
    d = fan_out(load(spark, sf_dir, "documents"))
    _, w_final = _bpe_loop(d, _BPE_MERGES)
    voc = w_final.select(
        "word",
        F.size(F.split("syms", " ")).cast("bigint").alias("n_sub"),
    )
    toks = d.select(
        "lang", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        toks.join(F.broadcast(voc), "word")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").cast("bigint").alias("n_bpe_tokens"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars"),
            (F.sum("n_sub").cast("double") / F.count("*")).alias(
                "fertility"
            ),
            (
                F.sum(F.length("word")).cast("double") / F.sum("n_sub")
            ).alias("chars_per_token"),
        )
    )


# ---------------------------------------------------------------------------
# unigram-LM tokenizer (SentencePiece-unigram inference; Kudo 2018)
# ---------------------------------------------------------------------------

_UNI_PMAX = 4    # max piece length considered by the seed vocabulary
_UNI_MAXW = 12   # DP unroll depth; longer words are excluded (none in
                 # the fixture, whose longest word is 8 chars)
_UNI_TOPK = 16   # multi-char pieces kept beyond the single-char floor


def _unigram_sql() -> str:
    """DuckDB twin of [[unigram_segment_of]]: the Viterbi DP unrolled
    as a chain of ``_UNI_MAXW`` CTEs (s1..s{n}), one per word
    position — the [[_trained_cb_sql]] loop-unroll technique applied
    to dynamic programming. Piece log-probs are micro-nat BIGINTs
    quantized ONCE; DP state is the exact integer
    ``32·score6 − n_pieces`` so max() realizes the (score, fewest
    pieces) lexicographic objective in one comparison."""
    steps = []
    for i in range(1, _UNI_MAXW + 1):
        cands = []
        for l in range(1, min(_UNI_PMAX, i) + 1):
            j = i - l
            prev = "CAST(0 AS BIGINT)" if j == 0 else f"b{j}"
            cands.append(
                f"{prev} + (SELECT aw FROM voc v WHERE v.piece ="
                f" substr(word, {j + 1}, {l}))"
            )
        core = (
            f"greatest({', '.join(cands)})" if len(cands) > 1 else cands[0]
        )
        steps.append(
            f"""s{i} AS (
      SELECT *, CASE WHEN length(word) >= {i} THEN {core} END AS b{i}
      FROM s{i - 1})"""
        )
    coalesce = ", ".join(f"b{i}" for i in range(_UNI_MAXW, 0, -1))
    return f"""
    WITH w0 AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS word
            FROM documents)
      WHERE word <> '' GROUP BY word),
    pieces AS (
      SELECT substr(word, i, l) AS piece, CAST(SUM(cnt) AS BIGINT) AS c
      FROM w0,
           UNNEST(generate_series(1, length(word))) AS a(i),
           UNNEST(generate_series(1, {_UNI_PMAX})) AS b(l)
      WHERE i + l - 1 <= length(word)
      GROUP BY piece),
    singles AS (SELECT piece, c FROM pieces WHERE length(piece) = 1),
    multis AS (SELECT piece, c FROM pieces WHERE length(piece) >= 2
               ORDER BY c DESC, piece ASC LIMIT {_UNI_TOPK}),
    voc0 AS (SELECT * FROM singles UNION ALL SELECT * FROM multis),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM voc0),
    voc AS (
      SELECT piece,
             32 * (CAST(round(ln(c) * 1000000) AS BIGINT)
                   - CAST(round(ln(t) * 1000000) AS BIGINT)) - 1 AS aw
      FROM voc0, tot),
    s0 AS (SELECT word, cnt FROM w0),
    {",".join(steps)},
    seg AS (
      SELECT word, cnt, COALESCE({coalesce}) AS best
      FROM s{_UNI_MAXW} WHERE length(word) <= {_UNI_MAXW}),
    rep AS (
      SELECT word, cnt,
             CAST((-best) % 32 AS BIGINT) AS np,
             CAST((best + ((-best) % 32)) / 32 AS BIGINT) AS score6
      FROM seg),
    tok AS (
      SELECT lang, word
      FROM (SELECT lang, unnest(string_split(text, ' ')) AS word
            FROM documents)
      WHERE word <> '' AND length(word) <= {_UNI_MAXW})
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(np) AS BIGINT) AS n_unigram_tokens,
           CAST(SUM(length(word)) AS BIGINT) AS n_chars,
           CAST(SUM(np) AS DOUBLE) / COUNT(*) AS fertility,
           (CAST(SUM(score6) AS DOUBLE) / COUNT(*)) / 1000000.0
             AS avg_word_logprob
    FROM tok JOIN rep USING (word)
    GROUP BY lang
    """


@query("tokenizer_unigram_segment", oracle=_unigram_sql())
def tokenizer_unigram_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Unigram-LM tokenizer segmentation IN-ENGINE (Kudo 2018 — the
    SentencePiece-unigram algorithm, the other major subword
    tokenizer besides [[tokenizer_bpe_train]]'s BPE): seed a piece
    vocabulary from exact substring frequencies (all single chars
    for coverage + the top-{k} multi-char pieces, the frequent-
    substring seeding SentencePiece uses), assign each piece its
    maximum-likelihood log-probability, and Viterbi-segment every
    word to its most probable piece sequence. Emitted per language:
    word/subword/char counts, fertility (subwords per word), and the
    mean per-word log-likelihood under the piece LM — directly
    comparable with [[tokenizer_fertility_report]]'s BPE fertility
    on the same corpus.

    Exactness: piece probabilities are micro-nat BIGINTs
    (``micro_ln`` — ln quantized ONCE per integer count); the
    Viterbi objective (max score, then fewest pieces) is encoded as
    the single integer ``32·score6 − n_pieces`` so the DP is pure
    bigint add/greatest with no float until the two final report
    divisions (fixed order both engines). The DP itself is unrolled
    over word positions — a column per prefix length in Spark, a CTE
    per position in DuckDB ([[_trained_cb_sql]]'s technique applied
    to DP) — with each candidate guarded by ``i ≤ length(word)``
    because ``substr`` TRUNCATES past the end rather than returning
    empty (an unguarded b{{i}} would segment a phantom prefix).
    Ties at the top-{k} vocabulary boundary break (count desc,
    piece asc) — a total order.

    Scale shape (the BPE scale trick again): everything trains on
    the WORD-FREQUENCY DICT — the only corpus-proportional
    operations are the word-count shuffle and the final scan that
    broadcast-joins the segmented dictionary onto the token stream.
    Piece counting, vocabulary selection, and the Viterbi DP all run
    over vocabulary-sized frames; the model rides one broadcast map
    row; the DP is a pure projection (no per-word Python, no
    explode of segmentations — the unroll bounds work at
    O(maxw·pmax) integer ops per dictionary word)."""
    return unigram_segment_of(fan_out(load(spark, sf_dir, "documents")))


def unigram_segment_of(d: DataFrame) -> DataFrame:
    """The unigram-LM report over any ``(text, lang)`` frame —
    module-level so the hypothesis differential runs the SAME fold
    the registered query runs."""
    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    pieces = (
        words.select(
            "cnt",
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, length(word)), i ->"
                    " transform(sequence(1, least("
                    f"{_UNI_PMAX}, length(word) - i + 1)),"
                    " l -> substring(word, i, l))))"
                )
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("cnt").cast("bigint").alias("c"))
        .localCheckpoint(eager=False)
    )
    singles = pieces.filter(F.length("piece") == 1)
    multis = (
        pieces.filter(F.length("piece") >= 2)
        .orderBy(F.col("c").desc(), F.col("piece").asc())
        .limit(_UNI_TOPK)
    )
    voc0 = singles.unionByName(multis)
    # ONE aggregation builds both the piece→count map and the total
    # (previously a separate tot agg + broadcast fed a per-row aw
    # projection and a second agg+broadcast for the map — two extra
    # serial jobs; r17 optimization, guide §2.4); the per-piece
    # log-weight aw = 32·(ln(c)−ln(t))·1e6 − 1 is then computed by
    # transform_values over the map — same micro_ln on the same
    # integers, so every aw is bit-identical to the join form
    vmap = voc0.agg(
        F.map_from_entries(
            F.collect_list(F.struct("piece", "c"))
        ).alias("cmap"),
        F.sum("c").cast("bigint").alias("t"),
    ).select(
        F.transform_values(
            "cmap",
            lambda _, v: F.lit(32)
            * (micro_ln(v) - micro_ln(F.col("t")))
            - F.lit(1),
        ).alias("vmap")
    )
    seg = words.filter(F.length("word") <= _UNI_MAXW).crossJoin(
        F.broadcast(vmap)
    )
    for i in range(1, _UNI_MAXW + 1):
        cands = []
        for l in range(1, min(_UNI_PMAX, i) + 1):
            j = i - l
            prev = (
                F.lit(0).cast("bigint") if j == 0 else F.col(f"b{j}")
            )
            cands.append(
                prev
                + F.try_element_at(
                    "vmap", F.substring("word", j + 1, l)
                )
            )
        core = F.greatest(*cands) if len(cands) > 1 else cands[0]
        seg = seg.withColumn(
            f"b{i}", F.when(F.length("word") >= i, core)
        )
    best = F.coalesce(
        *[F.col(f"b{i}") for i in range(_UNI_MAXW, 0, -1)]
    )
    np_ = (-best) % F.lit(32)
    # single consumer (the broadcast build below) — a checkpoint here
    # only added a materialization job (r17 optimization)
    rep = seg.select(
        "word",
        "cnt",
        np_.cast("bigint").alias("np"),
        ((best + np_) / F.lit(32)).cast("bigint").alias("score6"),
    )
    tok = (
        d.select(
            "lang", F.explode(F.split("text", " ")).alias("word")
        )
        .filter(
            (F.col("word") != "")
            & (F.length("word") <= _UNI_MAXW)
        )
    )
    return (
        tok.join(F.broadcast(rep), "word")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("np").cast("bigint").alias("n_unigram_tokens"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars"),
            (F.sum("np").cast("double") / F.count("*")).alias(
                "fertility"
            ),
            (
                (F.sum("score6").cast("double") / F.count("*"))
                / F.lit(1000000.0)
            ).alias("avg_word_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# bigram-LM perplexity scoring (the CCNet/KenLM-style quality filter)
# ---------------------------------------------------------------------------

_BIGRAM_PPL_SQL = """
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    v AS (
      SELECT COUNT(DISTINCT term) AS vsz
      FROM (SELECT unnest(t) AS term FROM docs)
    ),
    big AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM docs, UNNEST(range(1, len(t))) AS r(i)
    ),
    bc AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2
    ),
    cc AS (
      SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bc GROUP BY w1
    ),
    lp AS (
      SELECT bc.w1, bc.w2,
             CAST(round(ln(c12 + 1) * 1000000) AS BIGINT)
             - CAST(round(ln(c1 + vsz) * 1000000) AS BIGINT) AS lp6
      FROM bc JOIN cc USING (w1), v
    )
    SELECT b.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(lp.lp6) AS BIGINT) AS sum_lp6,
           CAST(SUM(lp.lp6) AS DOUBLE)
             / (1000000.0 * COUNT(*)) AS mean_logprob
    FROM big b JOIN lp ON b.w1 = lp.w1 AND b.w2 = lp.w2
    GROUP BY b.doc_id
"""


def bigram_perplexity_of(docs: DataFrame) -> DataFrame:
    """The testable scoring fold under [[quality_bigram_perplexity]]:
    given ``(doc_id, text)`` rows, train the add-1-smoothed bigram LM
    on the corpus and score every document (≥2 tokens) by mean bigram
    log-probability in exact integer micro-nats."""
    t = F.split("text", " ")
    docs_arr = docs.select("doc_id", t.alias("t"))
    n = F.size("t")
    pairs = F.zip_with(
        F.slice("t", 1, n - 1),
        F.slice(F.col("t"), 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    # single-token docs ride the SAME explode as (w1=token, w2=NULL)
    # sentinel rows, so the vocabulary can be derived from the
    # MODEL-sized count table below instead of a second full-corpus
    # token explode + distinct (r18, guide §2.4): every token of a
    # ≥2-token doc appears as some bigram's w1 (all but the last) or
    # w2 (the last), and the sentinel rows add the only tokens that
    # ride no bigram. Sentinel rows drop out of the model (w2 IS
    # NULL filter below) and of scoring (inner join on non-null
    # bigram keys), so only vsz sees them. Docs with NULL text keep
    # contributing nothing: their sentinel struct is (NULL, NULL)
    # and count-distinct ignores NULL terms — same as the old
    # explode(t)-over-NULL-array behaviour.
    single = F.array(
        F.struct(
            F.col("t").getItem(0).alias("w1"),
            F.lit(None).cast("string").alias("w2"),
        )
    )
    big = docs_arr.select(
        "doc_id",
        F.explode(F.when(n >= 2, pairs).otherwise(single)).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    # ONE corpus-proportional bigram-count shuffle builds the model;
    # the context totals c1 = Σc12 per w1 ride a window sum over the
    # model-sized count table (one exchange by w1, partitions bounded
    # by vocab — bigram TYPES, not occurrences) instead of a separate
    # groupBy + join-back (r17; guide §2.4). The count table is
    # lazily pinned because it now has TWO consumers (the lp model
    # and the vocabulary) — without the pin each would re-run the
    # corpus explode + count exchange (the no-reuse trap).
    bc = (
        big.groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .localCheckpoint(eager=False)
    )
    bcr = bc.filter(F.col("w2").isNotNull())
    # V = |distinct tokens| from the count table itself: all w1
    # (bigram heads + single-token sentinels) ∪ non-null w2 (doc-final
    # tokens) — model-sized input, zero extra corpus passes
    vsz = (
        bc.select(F.col("w1").alias("term"))
        .unionByName(bcr.select(F.col("w2").alias("term")))
        .agg(F.countDistinct("term").alias("vsz"))
    )
    lp = (
        bcr.withColumn(
            "c1",
            F.sum("c12").over(W.partitionBy("w1")).cast("bigint"),
        )
        .crossJoin(F.broadcast(vsz))
        .select(
            "w1",
            "w2",
            (
                micro_ln(F.col("c12") + 1)
                - micro_ln(F.col("c1") + F.col("vsz"))
            ).alias("lp6"),
        )
    )
    scored = big.join(F.broadcast(lp), ["w1", "w2"])
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("lp6").cast("bigint").alias("sum_lp6"),
        (
            F.sum("lp6").cast("double") / (F.lit(1000000.0) * F.count("*"))
        ).alias("mean_logprob"),
    )


@query("quality_bigram_perplexity", oracle=_BIGRAM_PPL_SQL)
def quality_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-1 LM quality filter: train an add-1-smoothed BIGRAM
    language model on the corpus and score every document by its mean
    bigram log-probability — the CCNet/KenLM perplexity-filtering
    step (Wenzek et al. 2020) one structural rung above
    [[quality_unigram_logprob]]'s bag-of-words proxy: token ORDER now
    matters, so shuffled boilerplate and keyword-stuffed spam score
    low even when their unigram mix looks natural. P(w2|w1) =
    (c(w1,w2)+1)/(c(w1·)+V); docs with <2 tokens have no bigrams and
    are out of scope (no output row).

    Cross-engine exactness (same single-rounding discipline as the
    unigram key): ln(c12+1) is quantized to integer micro-nats once
    per DISTINCT bigram and ln(c1+V) once per distinct context, the
    per-document accumulation is a pure BIGINT sum (associative —
    partial aggregation order cannot matter), and the one double
    division at the end is the same IEEE op in both engines.

    Scale shape: bigram extraction is IN-ROW array algebra
    (slice+zip_with on the token array — no window over doc-ordered
    tokens, no doc-keyed sort, zero shuffle before counting). Model
    training is one map-side-combined (w1,w2) count shuffle, pinned
    with a lazy checkpoint so the context totals and the lp6 table
    read the counts back at MODEL size rather than re-running the
    corpus scan + exchange; V is one exact distinct-count. Scoring joins
    the lp6 table back on the bigram key — broadcast here (fixture
    bigram table is small); at 100 TB the same plan becomes a hash
    join partitioned by the bigram key, with the Zipf-head skew
    bounded because the join side is bigram TYPES (the model), not
    occurrences, and AQE skew-split handles the occurrence side. The
    per-doc rollup collapses map-side like every micro-nat key."""
    d = load(spark, sf_dir, "documents")
    return bigram_perplexity_of(fan_out(d).select("doc_id", "text"))


# ---------------------------------------------------------------------------
# vocab_zipf_fit — power-law diagnostic of the token distribution
# ---------------------------------------------------------------------------

#: head size fitted per language — the classic Zipf plot fits the
#: frequency-ranked head (the tail flattens into Heaps noise); a
#: fixed K also keeps the fit frame K rows/lang regardless of corpus
#: size, so the rank window and the OLS both run on tiny frames.
_ZIPF_K = 100

_ZIPF_SQL = f"""
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    cnts AS (
      SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tok GROUP BY lang, token
    ),
    ranked AS (
      SELECT lang, cnt,
             row_number() OVER (PARTITION BY lang
                                ORDER BY cnt DESC, token) AS rk
      FROM cnts
    ),
    m AS (
      SELECT lang,
             CAST(ROUND(ln(rk) * 1000000) AS BIGINT) AS x,
             CAST(ROUND(ln(cnt) * 1000000) AS BIGINT) AS y
      FROM ranked WHERE rk <= {_ZIPF_K}
    ),
    s AS (
      SELECT lang, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM m GROUP BY lang
    ),
    d AS (
      SELECT lang, n,
             CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS cov,
             CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS vx,
             CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS vy,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
      FROM s
    )
    SELECT lang,
           n AS n_terms,
           (CASE WHEN vx <> 0 THEN cov / vx END) / 1.0 AS zipf_slope,
           ((syd - (CASE WHEN vx <> 0 THEN cov / vx END) * sxd)
            / CAST(n AS DOUBLE)) / 1000000.0 AS ln_intercept,
           CASE WHEN vx <> 0 AND vy <> 0
                THEN (cov * cov) / (vx * vy) END AS r2
    FROM d
"""


@query("vocab_zipf_fit", oracle=_ZIPF_SQL)
def vocab_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf power-law fit of the token frequency distribution per
    language (Zipf 1949: freq ∝ rank^−s ⇒ ln f = ln C − s·ln k) —
    the vocabulary-health diagnostic next to [[vocab_oov_report]]
    and [[tokenizer_fertility_report]]: a natural corpus fits s ≈ 1
    with high r²; template spam or synthetic repetition shows up as
    a flattened or kinked head long before a human reads a sample.

    Exactness: this is two repo disciplines composed. Each head
    term's (ln rank, ln count) goes to MICRO-NAT integers with ONE
    rounding ([[quality_unigram_logprob]]'s micro-ln), then the OLS
    moments accumulate as exact int64 and the closed-form
    slope/intercept/r² are fixed double expressions — the shared
    [[ols_fit]] fold of [[agg_linear_fit]] (slope needs no rescale:
    x and y share the micro-nat scale, which cancels in the ratio;
    the intercept divides back to nats).

    Scale shape: one (lang, token) count exchange over the token
    stream — the only corpus-proportional step — then the rank
    window and the fit run on vocab- and head-sized frames (the
    window partitions by lang; rank ≤ {_ZIPF_K} prunes everything
    else). At web scale per-lang vocab windows get large; the same
    range-partitioned-rank swap as [[spend_quintiles_of]] applies,
    noted not needed at fixture vocab."""
    from .relational import ols_fit

    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "lang", F.explode(F.split("text", " ")).alias("token")
    )
    cnts = tok.groupBy("lang", "token").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    w = W.partitionBy("lang").orderBy(
        F.col("cnt").desc(), F.col("token").asc()
    )
    ranked = cnts.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _ZIPF_K
    )
    m = ranked.select(
        F.col("lang").alias("g"),
        F.round(F.log(F.col("rk").cast("double")) * 1e6)
        .cast("bigint")
        .alias("x"),
        F.round(F.log(F.col("cnt").cast("double")) * 1e6)
        .cast("bigint")
        .alias("y"),
    )
    fit = ols_fit(m, slope_scale=1.0, intercept_scale=1e6)
    return fit.select(
        F.col("g").alias("lang"),
        F.col("n").alias("n_terms"),
        F.col("slope_per_hr").alias("zipf_slope"),
        F.col("intercept").alias("ln_intercept"),
        "r2",
    )


vocab_zipf_fit.__doc__ = vocab_zipf_fit.__doc__.replace(
    "{_ZIPF_K}", str(_ZIPF_K)
)


# ---------------------------------------------------------------------------
# text_lexical_diversity — TTR / hapax richness per language
# ---------------------------------------------------------------------------

_LEXDIV_SQL = """
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    tf AS (
      SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY lang, tok
    )
    SELECT lang,
           CAST(SUM(c) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(COUNT(*) FILTER (c = 1) AS BIGINT) AS hapax_count,
           CAST(COUNT(*) AS DOUBLE)
             / CAST(NULLIF(SUM(c), 0) AS DOUBLE) AS ttr,
           CAST(COUNT(*) FILTER (c = 1) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS hapax_ratio
    FROM tf
    GROUP BY lang
    ORDER BY lang
"""


@query("text_lexical_diversity", oracle=_LEXDIV_SQL)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-richness report per language: type-token ratio and
    hapax-legomenon share — the vocabulary-side quality axis the
    frequency family brackets from two ends ([[vocab_zipf_fit]]
    asserts the rank-frequency SHAPE, [[repetition_stats]] catches
    within-doc loops; this measures global richness). Low TTR /
    hapax collapse on a crawl slice is the canonical boilerplate- or
    template-farm signal, and hapax mass is what decides whether a
    tokenizer's long tail is worth its vocab slots
    ([[tokenizer_fertility_report]]).

    Exactness: token frequencies, vocab and hapax counts are exact
    integers off one whitespace tokenization (the [[token_count]]
    convention, identical split in both engines); the two ratios are
    single final double divisions of exact integers — the
    [[agg_gini_exact]] recipe, no tolerance.

    Plan: explode to (lang, token), ONE map-side-combined groupBy to
    frequencies (the exchange carries distinct (lang, token) pairs,
    sublinear in corpus size — Heaps' law), then a second fold to 5
    report rows with the hapax flag as a CASE inside the same agg.
    No window, no join, no second pass over the corpus; at 100 TB
    the frequency fold is the same shuffle [[ngram_lm_counts]]
    already scales."""
    d = load(spark, sf_dir, "documents")
    tf = (
        d.select(
            "lang", F.explode(F.split("text", " ")).alias("tok")
        )
        .groupBy("lang", "tok")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast(
        "bigint"
    )
    g = tf.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("total_tokens"),
        F.count("*").cast("bigint").alias("vocab_size"),
        hapax.alias("hapax_count"),
    )
    return g.select(
        "lang",
        "total_tokens",
        "vocab_size",
        "hapax_count",
        (
            F.col("vocab_size").cast("double")
            / F.nullif(F.col("total_tokens").cast("double"), F.lit(0.0))
        ).alias("ttr"),
        (
            F.col("hapax_count").cast("double")
            / F.col("vocab_size").cast("double")
        ).alias("hapax_ratio"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# text_keyphrase_rake — RAKE keyword extraction (Rose et al. 2010)
# ---------------------------------------------------------------------------

#: RAKE delimiter vocabulary: phrases are maximal runs of
#: non-stopword tokens. Fixed tuple so the oracle replays it.
_RAKE_STOP = (
    "the", "a", "of", "and", "to", "in", "is", "it",
    "be", "that", "have", "with",
)

#: Top-k phrases reported.
_RAKE_TOPK = 20

_RAKE_SQL = f"""
    WITH tok AS (
      SELECT doc_id, u.pos, u.w,
             CASE WHEN u.w IN {_RAKE_STOP!s} THEN 1 ELSE 0 END AS s
      FROM (
        SELECT doc_id,
               unnest(list_transform(string_split(text, ' '),
                      (x, i) -> struct_pack(pos := i, w := x))) AS u
        FROM documents
      )
    ),
    grouped AS (
      SELECT doc_id, pos, w, s,
             SUM(s) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM tok
    ),
    pw AS (
      SELECT doc_id, grp, pos, w,
             CAST(COUNT(*) OVER (PARTITION BY doc_id, grp) AS BIGINT)
               AS plen
      FROM grouped WHERE s = 0
    ),
    ws AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(plen) AS BIGINT) AS deg,
             (1000000 * CAST(SUM(plen) AS BIGINT)) // COUNT(*)
               AS score_micro
      FROM pw GROUP BY w
    ),
    phr AS (
      SELECT pw.doc_id, pw.grp,
             string_agg(pw.w, ' ' ORDER BY pw.pos) AS phrase,
             CAST(SUM(ws.score_micro) AS BIGINT) AS score_micro
      FROM pw JOIN ws USING (w)
      GROUP BY pw.doc_id, pw.grp
    )
    SELECT phrase, score_micro,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM phr
    GROUP BY phrase, score_micro
    ORDER BY score_micro DESC, n_occurrences DESC, phrase ASC
    LIMIT {_RAKE_TOPK}
"""


@query("text_keyphrase_rake", oracle=_RAKE_SQL)
def text_keyphrase_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) — candidate
    phrases are maximal non-stopword runs; word score = degree/
    frequency (degree = Σ length of phrases containing the word);
    phrase score = Σ member word scores. The published,
    citation-anchored counterpart to [[tfidf_top_terms]] (which
    ranks single terms by rarity; RAKE surfaces multi-word phrases
    by co-occurrence density) — corpus topic labeling and
    dedup-cluster naming in a curation pipeline.

    Exactness: every statistic is integer — word scores are
    truncated micro-units (1e6·deg div freq), so phrase scores are
    exact integer SUMS (summing float deg/freq ratios would be
    order-dependent; the attribution-credit device); identical
    phrase strings get identical scores by construction (word stats
    are corpus-global), making the phrase-level dedup exact. Tie
    order (score desc, occurrences desc, phrase asc) is total.

    Plan: posexplode → one per-doc running-stop-count window (the
    phrase grouper) → per-phrase length window on the SAME
    (doc_id)-clustered exchange → word-stat fold on (w) → broadcast
    the vocabulary-sized score table back onto phrase words → one
    phrase fold and a TakeOrderedAndProject. Token-proportional
    exchanges only — the tfidf/ngram scale class."""
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "w"),
    ).withColumn(
        "s", F.when(F.col("w").isin(*_RAKE_STOP), 1).otherwise(0)
    )
    grouped = tok.withColumn(
        "grp",
        F.sum("s").over(
            Window.partitionBy("doc_id").orderBy("pos")
        ),
    )
    pw = (
        grouped.filter(F.col("s") == 0)
        .withColumn(
            "plen",
            F.count("*")
            .over(Window.partitionBy("doc_id", "grp"))
            .cast("bigint"),
        )
        .select("doc_id", "grp", "pos", "w", "plen")
    )
    ws = pw.groupBy("w").agg(
        F.count("*").cast("bigint").alias("freq"),
        F.sum("plen").cast("bigint").alias("deg"),
    ).withColumn(
        "score_micro", F.expr("(1000000 * deg) div freq")
    )
    phr = (
        pw.join(F.broadcast(ws.select("w", "score_micro")), "w")
        .groupBy("doc_id", "grp")
        .agg(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list("
                    "struct(pos, w))), t -> t.w)"
                ),
                " ",
            ).alias("phrase"),
            F.sum("score_micro").cast("bigint").alias("score_micro"),
        )
    )
    return (
        phr.groupBy("phrase", "score_micro")
        .agg(F.count("*").cast("bigint").alias("n_occurrences"))
        .orderBy(
            F.col("score_micro").desc(),
            F.col("n_occurrences").desc(),
            F.col("phrase").asc(),
        )
        .limit(_RAKE_TOPK)
    )


# ---------------------------------------------------------------------------
# quality_stupid_backoff — held-out LM scoring with backoff accounting
# ---------------------------------------------------------------------------

#: round(ln(0.4)·1e6) — the stupid-backoff discount (Brants et al.
#: 2007) as a python-computed micro-nat literal (the benford device:
#: constants never touch either engine's libm).
_SB_LN04_MICRO = -916291

#: Train/held-out split (the bloom/minhash incremental convention).
_SB_TRAIN_MOD, _SB_TRAIN_KEEP = 10, 8

_SB_SQL = f"""
    WITH train AS (
      SELECT text FROM documents WHERE doc_id % {_SB_TRAIN_MOD} < {_SB_TRAIN_KEEP}
    ),
    test AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id % {_SB_TRAIN_MOD} >= {_SB_TRAIN_KEEP}
    ),
    ttok AS (
      SELECT string_split(text, ' ') AS toks FROM train
    ),
    cu AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT unnest(toks) AS w FROM ttok
      ) GROUP BY w
    ),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cu),
    cb AS (
      SELECT u.a AS a, u.b AS b, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT unnest(list_transform(range(1, len(toks)),
                 i -> struct_pack(a := toks[i], b := toks[i + 1]))) AS u
        FROM ttok
      ) GROUP BY u.a, u.b
    ),
    stream AS (
      SELECT doc_id, u.a, u.b FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                 i -> struct_pack(a := toks[i], b := toks[i + 1]))) AS u
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM test)
      )
    ),
    scored AS (
      SELECT s.doc_id,
             CASE WHEN cb.c IS NOT NULL THEN 0 ELSE 1 END AS backoff,
             CASE WHEN cb.c IS NULL AND cuw.c IS NULL THEN 1 ELSE 0 END
               AS oov,
             CASE WHEN cb.c IS NOT NULL THEN
                    CAST(round(ln(cb.c) * 1000000) AS BIGINT)
                    - CAST(round(ln(cua.c) * 1000000) AS BIGINT)
                  WHEN cuw.c IS NOT NULL THEN
                    {_SB_LN04_MICRO}
                    + CAST(round(ln(cuw.c) * 1000000) AS BIGINT)
                    - CAST(round(ln(n.n) * 1000000) AS BIGINT)
                  ELSE
                    2 * {_SB_LN04_MICRO}
                    - CAST(round(ln(n.n) * 1000000) AS BIGINT)
             END AS lp6
      FROM stream s
      LEFT JOIN cb ON cb.a = s.a AND cb.b = s.b
      LEFT JOIN cu cua ON cua.w = s.a
      LEFT JOIN cu cuw ON cuw.w = s.b
      CROSS JOIN n
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(backoff) AS BIGINT) AS n_backoffs,
           CAST(SUM(oov) AS BIGINT) AS n_oov,
           CAST(SUM(lp6) AS DOUBLE) / (1000000.0 * COUNT(*))
             AS mean_logprob
    FROM scored
    GROUP BY doc_id
    ORDER BY doc_id
"""


@query("quality_stupid_backoff", oracle=_SB_SQL)
def quality_stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff bigram scoring of HELD-OUT documents (Brants
    et al. 2007 — the web-scale LM that skips normalization because
    at corpus size a constant 0.4 discount ranks as well as Katz):
    train on the doc_id-mod-{_SB_TRAIN_MOD} 80% split, score the
    held-out 20% with per-doc backoff/OOV accounting. The held-out
    split is what makes the key non-vacuous — self-scoring (the
    [[quality_bigram_perplexity]] frame) never exercises the
    backoff branch because every bigram trivially exists; here
    ~unseen bigrams fall to 0.4·P(w) and unseen words to the
    0.4²/N floor, and the per-doc backoff RATE is itself the
    novelty signal (high = out-of-domain for the corpus).

    Exactness: the micro-nat single-rounding discipline
    ([[micro_ln]]) for every count, ln(0.4) as a python literal
    micro constant, per-doc accumulation a pure BIGINT sum, one
    final double division.

    Scale: model folds are (w)/(a,b)-keyed map-side-combined counts
    (type-sized, not occurrence-sized); scoring is three hash joins
    on the bigram/word keys exactly like the perplexity sibling (the
    join side is model TYPES; AQE skew-split owns the Zipf head);
    the per-doc rollup collapses map-side."""
    d = load(spark, sf_dir, "documents")
    train = fan_out(
        d.filter(F.col("doc_id") % _SB_TRAIN_MOD < _SB_TRAIN_KEEP)
    ).select(F.split("text", " ").alias("toks"))
    test = fan_out(
        d.filter(F.col("doc_id") % _SB_TRAIN_MOD >= _SB_TRAIN_KEEP)
    ).select("doc_id", F.split("text", " ").alias("toks"))
    cu = (
        train.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint(eager=False)
    )
    n = cu.agg(F.sum("c").cast("bigint").alias("n"))
    bigrams = (
        "transform(sequence(1, size(toks) - 1),"
        " i -> struct(element_at(toks, i) AS a,"
        "             element_at(toks, i + 1) AS b))"
    )
    cb = (
        train.filter(F.size("toks") >= 2)
        .select(F.explode(F.expr(bigrams)).alias("u"))
        .select("u.a", "u.b")
        .groupBy("a", "b")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    stream = (
        test.filter(F.size("toks") >= 2)
        .select("doc_id", F.explode(F.expr(bigrams)).alias("u"))
        .select("doc_id", "u.a", "u.b")
    )
    scored = (
        stream.join(
            cb.withColumnRenamed("c", "cb_c"), ["a", "b"], "left"
        )
        .join(
            cu.select(F.col("w").alias("a"), F.col("c").alias("cua_c")),
            "a",
            "left",
        )
        .join(
            cu.select(F.col("w").alias("b"), F.col("c").alias("cuw_c")),
            "b",
            "left",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.when(F.col("cb_c").isNotNull(), 0).otherwise(1).alias(
                "backoff"
            ),
            F.when(
                F.col("cb_c").isNull() & F.col("cuw_c").isNull(), 1
            ).otherwise(0).alias("oov"),
            F.when(
                F.col("cb_c").isNotNull(),
                micro_ln(F.col("cb_c")) - micro_ln(F.col("cua_c")),
            )
            .when(
                F.col("cuw_c").isNotNull(),
                F.lit(_SB_LN04_MICRO)
                + micro_ln(F.col("cuw_c"))
                - micro_ln(F.col("n")),
            )
            .otherwise(
                F.lit(2 * _SB_LN04_MICRO) - micro_ln(F.col("n"))
            )
            .alias("lp6"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum("backoff").cast("bigint").alias("n_backoffs"),
            F.sum("oov").cast("bigint").alias("n_oov"),
            (
                F.sum("lp6").cast("double")
                / (F.lit(1000000.0) * F.count("*"))
            ).alias("mean_logprob"),
        )
        .orderBy("doc_id")
    )


quality_stupid_backoff.__doc__ = quality_stupid_backoff.__doc__.replace(
    "{_SB_TRAIN_MOD}", str(_SB_TRAIN_MOD)
)


# ---------------------------------------------------------------------------
# text_readability — Flesch reading ease from regex run counts
# ---------------------------------------------------------------------------

_READ_SQL = """
    WITH counted AS (
      SELECT source,
             length(regexp_replace(lower(text), '[a-z0-9]+', '#', 'g'))
               - length(regexp_replace(lower(text), '[a-z0-9]+', '', 'g'))
               AS words,
             length(regexp_replace(lower(text), '[aeiouy]+', '#', 'g'))
               - length(regexp_replace(lower(text), '[aeiouy]+', '', 'g'))
               AS syllables,
             GREATEST(
               1,
               length(regexp_replace(lower(text), '[.!?]+', '#', 'g'))
                 - length(regexp_replace(lower(text), '[.!?]+', '', 'g'))
             ) AS sentences
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(words) AS BIGINT) AS words,
           CAST(SUM(sentences) AS BIGINT) AS sentences,
           CAST(SUM(syllables) AS BIGINT) AS syllables,
           206.835
             - 1.015 * (CAST(SUM(words) AS DOUBLE)
                        / CAST(SUM(sentences) AS DOUBLE))
             - 84.6 * (CAST(SUM(syllables) AS DOUBLE)
                       / CAST(SUM(words) AS DOUBLE)) AS flesch
    FROM counted
    GROUP BY source
    ORDER BY source
"""


@query("text_readability", oracle=_READ_SQL)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level Flesch reading ease per source: 206.835 −
    1.015·(words/sentences) − 84.6·(syllables/words) over POOLED
    integer counts (not a mean of per-doc scores — pooling weights
    long documents correctly and keeps the aggregation exact). The
    classic complexity prior next to [[text_stats]] (surface
    shape), [[quality_score]] (heuristic filter) and
    [[text_lexical_diversity]] (vocabulary growth): readability
    bands are a standard pre-training curriculum / mixture axis.
    Syllables ≈ maximal [aeiouy]+ runs — the textbook vowel-group
    approximation; sentences floor at 1 per document so
    punctuation-free corpora (this fixture) degrade to
    words-per-doc rather than dividing by zero.

    Exactness: every count is the run-count identity len(sub(P,'#'))
    − len(sub(P,'')) — two regexp passes whose difference counts
    MATCHES not characters, engine-portable because it assumes
    nothing about the alphabet (DuckDB needs the 'g' flag; Spark
    replaces globally by default). Sums are integers; the Flesch
    line is literal·exact-int divisions and subtractions — IEEE
    ops with one shared shape, no tolerance.

    Plan: per-row regexp work fused in the scan stage (whole-stage
    codegen, zero Python), one map-side-combined groupBy(source).
    At 100 TB this is the cheapest possible shape: the exchange
    carries one 4-integer partial per source per task."""
    t = F.lower(F.col("text"))

    def runs(pat: str):
        return F.length(F.regexp_replace(t, pat, "#")) - F.length(
            F.regexp_replace(t, pat, "")
        )

    counted = load(spark, sf_dir, "documents").select(
        "source",
        runs("[a-z0-9]+").alias("words"),
        runs("[aeiouy]+").alias("syllables"),
        F.greatest(F.lit(1), runs("[.!?]+")).alias("sentences"),
    )
    g = counted.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("words").cast("bigint").alias("words"),
        F.sum("sentences").cast("bigint").alias("sentences"),
        F.sum("syllables").cast("bigint").alias("syllables"),
    )
    return g.select(
        "source",
        "n_docs",
        "words",
        "sentences",
        "syllables",
        (
            F.lit(206.835)
            - F.lit(1.015)
            * (
                F.col("words").cast("double")
                / F.col("sentences").cast("double")
            )
            - F.lit(84.6)
            * (
                F.col("syllables").cast("double")
                / F.col("words").cast("double")
            )
        ).alias("flesch"),
    ).orderBy("source")

"""Round-10 trained-artifact additions: the Naive Bayes quality
classifier (quality_classifier_nb), DSIR importance resampling
(corpus_dsir_select), winnowing fingerprints (doc_fingerprint_winnow),
and in-engine BPE tokenizer training (tokenizer_bpe_train). Each key
ships the differential trio — a hypothesis differential against a
literal-semantics python fold, a plan-shape guard, and the behavioral
contract the technique exists for (NB separates its classes, the DSIR
slice skews toward the target, winnowing's shared-run guarantee
holds, BPE honors the overlap rule and merge exhaustion).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter
from contextlib import contextmanager
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import assume, given, settings
from hypothesis import strategies as st

from data_pipeline_spark_spark.operators.corpus import (
    _DSIR_BUCKETS,
    _DSIR_KEEP_PCT,
    dsir_select_of,
)
from data_pipeline_spark_spark.operators.text import nb_quality_scores_of


@contextmanager
def _docs_fixture(df):
    """Route the text-module operators at a crafted documents frame:
    patches load/fan_out on the module and guarantees restore, so a
    failing test can't leak the patch into the session-scoped spark
    fixture."""
    import data_pipeline_spark_spark.operators.text as text_mod

    orig_load, orig_fan = text_mod.load, text_mod.fan_out
    text_mod.load = lambda s, sf, name: df
    text_mod.fan_out = lambda d: d
    try:
        yield
    finally:
        text_mod.load, text_mod.fan_out = orig_load, orig_fan


def _r6(k: int) -> int:
    """round(ln(k)·1e6) with Spark F.round double semantics: HALF_UP
    on the shortest decimal repr (BigDecimal.valueOf)."""
    return int(
        Decimal(repr(math.log(k) * 1000000.0)).quantize(
            Decimal(1), rounding=ROUND_HALF_UP
        )
    )


# ---------------------------------------------------------------------------
# Naive Bayes quality classifier
# ---------------------------------------------------------------------------

_DOCS = st.lists(
    st.tuples(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e"]),
            min_size=1,
            max_size=10,
        ),
        st.booleans(),
    ),
    min_size=2,
    max_size=20,
)


def _nb_reference(labeled):
    """Literal NB fold mirroring the documented semantics with no
    DataFrame machinery: token = split(' ') (so an empty text is one
    '' token, exactly as both engines split), add-one smoothing over
    the shared vocabulary, micro-nat quantization once per distinct
    integer, BIGINT accumulation, one final float division."""
    cpos: Counter = Counter()
    cneg: Counter = Counter()
    for text, pos in labeled:
        for t in text.split(" "):
            (cpos if pos else cneg)[t] += 1
    vocab = set(cpos) | set(cneg)
    v = len(vocab)
    npos = sum(cpos.values())
    nneg = sum(cneg.values())
    dpos = sum(1 for _, p in labeled if p)
    dneg = len(labeled) - dpos
    z6 = _r6(npos + v) - _r6(nneg + v)
    p6 = _r6(dpos) - _r6(dneg)
    out = {}
    for i, (text, _) in enumerate(labeled):
        toks = text.split(" ")
        sum_w6 = sum(
            _r6(cpos[t] + 1) - _r6(cneg[t] + 1) for t in toks
        )
        m = sum_w6 - len(toks) * z6 + p6
        out[i] = (
            len(toks),
            sum_w6,
            float(m) / 1000000.0,
            1 if m > 0 else 0,
        )
    return out


@settings(max_examples=8, deadline=None)
@given(_DOCS)
def test_nb_scores_match_reference(spark, docs):
    """Differential for quality_classifier_nb: random two-class
    corpora over a 5-token alphabet vs a literal python NB fold —
    n_tokens, the exact integer weight sum, the log-odds double, and
    the sign prediction must all match."""
    assume(any(p for _, p in docs) and any(not p for _, p in docs))
    labeled = [(" ".join(toks), pos) for toks, pos in docs]
    expect = _nb_reference(labeled)
    df = spark.createDataFrame(
        [(i, t, 1 if p else 0) for i, (t, p) in enumerate(labeled)],
        "doc_id long, text string, pos int",
    )
    got = {
        r.doc_id: (r.n_tokens, r.sum_w6, r.nb_logodds, r.pred_target)
        for r in nb_quality_scores_of(df).collect()
    }
    assert got == expect


def test_nb_empty_class_fails_loudly(spark):
    """r10 ADVICE: a reference slice with an empty class must raise —
    in BOTH engines — instead of Spark's ln(0)->NULL silently nulling
    every score (which would surface as a baffling hash mismatch)."""
    import duckdb
    import pytest

    df = spark.createDataFrame(
        [(0, "a b", 1), (1, "b c", 1)],  # no pos=0 documents
        "doc_id long, text string, pos int",
    )
    with pytest.raises(Exception, match="empty class"):
        nb_quality_scores_of(df).collect()

    from data_pipeline_spark_spark.operators.text import _NB_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(0, 'a b', 'en'), (1, 'b c', 'en')) t(doc_id, text, lang)"
    )
    with pytest.raises(Exception, match="empty class"):
        con.execute(_NB_SQL).fetchall()


def test_nb_plan_shape(spark, sf_dir):
    """The model attaches to the token stream as a BROADCAST join —
    the corpus-proportional explode must never reach a sort-merge
    exchange, and no join may degenerate to a cartesian product."""
    from data_pipeline_spark_spark.operators.text import (
        quality_classifier_nb,
    )
    from data_pipeline_spark_spark.plans.analyze import (
        formatted_plan,
        has_broadcast_join,
    )

    df = quality_classifier_nb(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert has_broadcast_join(df)
    assert "SortMergeJoin" not in plan, plan


def test_nb_separates_the_training_classes(spark, sf_dir):
    """The behavioral contract: scored on its own training corpus,
    the classifier must rank the target slice above the rest — the
    mean log-odds of lang='en' documents exceeds the mean of the
    others (if it didn't, the weights would be noise)."""
    from pyspark.sql import functions as F

    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.text import (
        quality_classifier_nb,
    )

    scores = quality_classifier_nb(spark, sf_dir)
    labeled = scores.join(
        load(spark, sf_dir, "documents").select("doc_id", "lang"), "doc_id"
    )
    row = labeled.agg(
        F.avg(F.when(F.col("lang") == "en", F.col("nb_logodds"))).alias(
            "pos_mean"
        ),
        F.avg(F.when(F.col("lang") != "en", F.col("nb_logodds"))).alias(
            "neg_mean"
        ),
    ).collect()[0]
    assert row.pos_mean > row.neg_mean, (row.pos_mean, row.neg_mean)


# ---------------------------------------------------------------------------
# DSIR importance resampling
# ---------------------------------------------------------------------------


def _dsir_reference(labeled, buckets, keep_pct):
    """Literal DSIR fold: hashed-bigram bucket counts (bucket = first
    8 md5 hex chars as an int, mod the fixed dimension), smoothed
    micro-nat log-ratio weights, per-doc integer margins, top-k by
    (margin desc, doc_id asc) with k = n·pct//100."""

    def bucket(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % buckets

    ct: Counter = Counter()
    craw: Counter = Counter()
    perdoc = {}
    for i, (text, pos) in enumerate(labeled):
        toks = text.split(" ")
        bs = [
            bucket(f"{toks[j]} {toks[j + 1]}")
            for j in range(len(toks) - 1)
        ]
        perdoc[i] = bs
        for b in bs:
            craw[b] += 1
            if pos:
                ct[b] += 1
    nt = sum(ct.values())
    nr = sum(craw.values())
    z6 = _r6(nt + buckets) - _r6(nr + buckets)
    scored = []
    for i, bs in perdoc.items():
        sum_w6 = sum(_r6(ct[b] + 1) - _r6(craw[b] + 1) for b in bs)
        m6 = sum_w6 - len(bs) * z6
        scored.append((i, len(bs), sum_w6, m6))
    k = len(labeled) * keep_pct // 100
    scored.sort(key=lambda r: (-r[3], r[0]))
    return {
        i: (nf, sw, float(m6) / 1000000.0)
        for i, nf, sw, m6 in scored[:k]
    }


@settings(max_examples=8, deadline=None)
@given(_DOCS)
def test_dsir_select_matches_reference(spark, docs):
    """Differential for corpus_dsir_select: random labeled corpora vs
    a literal python DSIR fold — the selected doc set, each feature
    count, the exact integer weight sum, and the importance double
    must all match (single-token docs exercise the zero-feature
    branch; n < 4 exercises the empty-selection branch)."""
    labeled = [(" ".join(toks), pos) for toks, pos in docs]
    expect = _dsir_reference(labeled, _DSIR_BUCKETS, _DSIR_KEEP_PCT)
    df = spark.createDataFrame(
        [
            (i, "en" if p else "xx", t, 1 if p else 0)
            for i, (t, p) in enumerate(labeled)
        ],
        "doc_id long, lang string, text string, pos int",
    )
    got = {
        r.doc_id: (r.n_feats, r.sum_w6, r.log_importance)
        for r in dsir_select_of(df).collect()
    }
    assert got == expect


def test_dsir_plan_shape(spark, sf_dir):
    """The model travels as a 1-row broadcast map column and scoring
    is an in-row fold: the plan must contain NO hash/sort-merge join
    at all (the only joins are 1-row broadcast nested-loop
    crossJoins) and no cartesian product — the feature stream never
    reaches a join or a per-doc rollup exchange."""
    from data_pipeline_spark_spark.operators.corpus import (
        corpus_dsir_select,
    )
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    df = corpus_dsir_select(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_dsir_selection_skews_toward_target(spark, sf_dir):
    """The behavioral contract (the paper's Figure-1 claim): the
    selected slice's target-language share must exceed the raw
    corpus's share, and the slice size is exactly n·pct//100."""
    from pyspark.sql import functions as F

    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.corpus import (
        corpus_dsir_select,
    )

    d = load(spark, sf_dir, "documents")
    n = d.count()
    raw_share = d.filter(F.col("lang") == "en").count() / n
    sel = corpus_dsir_select(spark, sf_dir).collect()
    assert len(sel) == n * _DSIR_KEEP_PCT // 100
    sel_share = sum(1 for r in sel if r.lang == "en") / len(sel)
    assert sel_share > raw_share, (sel_share, raw_share)


# ---------------------------------------------------------------------------
# winnowing fingerprints
# ---------------------------------------------------------------------------


def _winnow_reference(texts, k, w):
    """Literal winnowing fold (Schleimer et al. §4): k-gram hashes,
    per-window rightmost minimum, distinct (position, hash) pairs."""

    def h(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16)

    out = {}
    for doc_id, text in texts:
        toks = text.split(" ")
        if len(toks) < k:
            continue
        hs = [
            h(" ".join(toks[i : i + k]))
            for i in range(len(toks) - k + 1)
        ]
        m = len(hs)
        fps = set()
        for j in range(max(1, m - w + 1)):
            win = hs[j : j + w]
            best = min(range(len(win)), key=lambda x: (win[x], -x))
            fps.add((j + best, win[best]))
        out[doc_id] = (
            m,
            len(fps),
            len(fps) / m,
            sum(hv for _, hv in fps),
        )
    return out


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e"]),
            min_size=1,
            max_size=14,
        ),
        min_size=1,
        max_size=15,
    )
)
def test_winnow_matches_reference(spark, docs):
    """Differential for doc_fingerprint_winnow: small-alphabet docs
    (maximizing k-gram hash ties, the rightmost-tie rule's only
    exercise) vs a literal python winnow — k-gram count, fingerprint
    count, density, and the hash checksum must all match; docs
    shorter than k are absent from both."""
    from data_pipeline_spark_spark.operators.text import (
        _WIN_K,
        _WIN_W,
        doc_fingerprint_winnow,
    )

    texts = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    expect = _winnow_reference(texts, _WIN_K, _WIN_W)
    df = spark.createDataFrame(texts, "doc_id long, text string")
    with _docs_fixture(df):
        got = {
            r.doc_id: (
                r.n_kgrams,
                r.n_fingerprints,
                r.fp_density,
                r.fp_checksum,
            )
            for r in doc_fingerprint_winnow(spark, "ignored").collect()
        }
    assert got == expect


def test_winnow_plan_has_zero_algorithmic_exchanges(spark, sf_dir):
    """The headline scale fact: winnowing is a per-document local
    algorithm and the plan must keep it that way — the ONLY Exchange
    is fan_out's round-robin input spread (needed because the local
    fixture is one unsplittable row group; a no-op on a real
    multi-file scan). No hash repartitioning, no join, no aggregate
    exchange: hashing, window minima, dedup, and checksum are all
    in-row higher-order functions."""
    from data_pipeline_spark_spark.operators.text import (
        doc_fingerprint_winnow,
    )
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    plan = formatted_plan(doc_fingerprint_winnow(spark, sf_dir))
    assert "RoundRobinPartitioning" in plan, plan
    assert "hashpartitioning" not in plan, plan
    assert "SinglePartition" not in plan, plan
    assert "Join" not in plan and "Aggregate" not in plan, plan


def test_winnow_shared_run_guarantee(spark):
    """The theorem the algorithm exists for: two documents sharing a
    token run of length ≥ w+k−1 MUST share at least one fingerprint
    hash (any shorter shared run may be missed; equal-length runs
    are guaranteed). The engine output is pinned to the reference
    fold on this exact input (so the theorem, demonstrated on the
    reference's fingerprint sets, transfers to the engine), and the
    reference sets must intersect."""
    from data_pipeline_spark_spark.operators.text import (
        _WIN_K,
        _WIN_W,
        doc_fingerprint_winnow,
    )

    t = _WIN_K + _WIN_W - 1
    shared = " ".join(f"s{i}" for i in range(t))
    texts = [
        (0, "x1 x2 x3 " + shared + " y1 y2"),
        (1, "z1 " + shared + " z2 z3 z4"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    with _docs_fixture(df):
        got = {
            r.doc_id: (
                r.n_kgrams,
                r.n_fingerprints,
                r.fp_density,
                r.fp_checksum,
            )
            for r in doc_fingerprint_winnow(spark, "ignored").collect()
        }
    # engine == reference on every surfaced value for this input …
    assert got == _winnow_reference(texts, _WIN_K, _WIN_W)
    # … so the theorem shown on the reference's fingerprint SETS
    # (which the operator surfaces only as counts/checksums) holds
    # for the engine too
    ref = {doc_id: set() for doc_id, _ in texts}
    for doc_id, text in texts:
        toks = text.split(" ")
        hs = [
            int(
                hashlib.md5(
                    " ".join(toks[i : i + _WIN_K]).encode()
                ).hexdigest()[:8],
                16,
            )
            for i in range(len(toks) - _WIN_K + 1)
        ]
        for j in range(max(1, len(hs) - _WIN_W + 1)):
            win = hs[j : j + _WIN_W]
            b = min(range(len(win)), key=lambda x: (win[x], -x))
            ref[doc_id].add(win[b])
    assert ref[0] & ref[1], "guaranteed shared fingerprint missing"


# ---------------------------------------------------------------------------
# BPE tokenizer training
# ---------------------------------------------------------------------------


def _bpe_reference(texts, merges):
    """Literal BPE fold (Sennrich et al. §3.2): word-frequency dict,
    per-iteration weighted pair counts, argmax merge (count desc,
    pair lexicographic), greedy left-to-right apply. An iteration
    with no pairs emits no row and changes nothing. Returns the
    merge rows AND the final per-word symbol table (the trained
    vocabulary the fertility test applies)."""
    words: Counter = Counter()
    for text in texts:
        for wd in text.split(" "):
            if wd:
                words[wd] += 1
    syms = {wd: list(wd) for wd in words}
    rows = []
    for t in range(1, merges + 1):
        pc: Counter = Counter()
        for wd, cnt in words.items():
            s = syms[wd]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += cnt
        if not pc:
            continue
        (l, r), c = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        rows.append((t, l, r, c))
        for wd in syms:
            s = syms[wd]
            out = [s[0]]
            for y in s[1:]:
                if out[-1] == l and y == r:
                    out[-1] = out[-1] + y
                else:
                    out.append(y)
            syms[wd] = out
    return rows, syms


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(alphabet="ab", min_size=1, max_size=4),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_bpe_train_matches_reference(spark, docs):
    """Differential for tokenizer_bpe_train: random 2-char-alphabet
    corpora (maximizing pair-count ties, the tie rule's only
    exercise, and single-char words, the merge-exhaustion branch) vs
    a literal python BPE fold — the full merge table must match."""
    from data_pipeline_spark_spark.operators.text import (
        _BPE_MERGES,
        bpe_train_of,
    )

    texts = [" ".join(ws) for ws in docs]
    expect, _ = _bpe_reference(texts, _BPE_MERGES)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = sorted(
        (r.merge_rank, r.sym_left, r.sym_right, r.pair_count)
        for r in bpe_train_of(df).collect()
    )
    assert got == expect


def test_bpe_crafted_overlap_and_exhaustion(spark):
    """Hand-checked case covering the two famous subtleties: the
    overlap rule ('aaa' holds TWO (a,a) pairs in the count but greedy
    application merges only one) and merge exhaustion (once every
    word is a single symbol, remaining ranks emit nothing)."""
    from data_pipeline_spark_spark.operators.text import bpe_train_of

    df = spark.createDataFrame(
        [(0, "aaab aaab ab")], "doc_id long, text string"
    )
    got = sorted(
        (r.merge_rank, r.sym_left, r.sym_right, r.pair_count)
        for r in bpe_train_of(df).collect()
    )
    assert got == [
        (1, "a", "a", 4),   # aaab×2: two overlapping (a,a) each
        (2, "a", "b", 3),   # after merge: [aa,a,b]×2 + [a,b]
        (3, "aa", "ab", 2),
    ]  # ranks 4-6: every word is one symbol — exhausted, no rows


def test_bpe_merge_loop_is_vocab_sized(spark, sf_dir):
    """The scale contract: the corpus-proportional work is the ONE
    initial word-count aggregation; the merge table itself must be
    ≤ _BPE_MERGES rows with each winner attached as a broadcast (no
    sort-merge join anywhere in the final assembly)."""
    from data_pipeline_spark_spark.operators.text import (
        _BPE_MERGES,
        tokenizer_bpe_train,
    )
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    df = tokenizer_bpe_train(spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= _BPE_MERGES
    assert len({r.merge_rank for r in rows}) == len(rows)
    assert all(r.pair_count > 0 for r in rows)
    assert "SortMergeJoin" not in formatted_plan(df)


def test_bpe_fertility_matches_reference_fold(spark):
    """The fertility report must equal the literal fold's final
    symbol tables applied per language — totals, fertility, and
    compression on a crafted 2-language corpus."""
    from data_pipeline_spark_spark.operators.text import (
        _BPE_MERGES,
        tokenizer_fertility_report,
    )

    texts = [
        (0, "en", "aaab aaab ab"),
        (1, "xx", "ab ba aaab"),
    ]
    # ONE reference fold serves both BPE tests: its final symbol
    # table is the trained vocabulary the fertility report applies
    _, syms = _bpe_reference([t for _, _, t in texts], _BPE_MERGES)
    expect = {}
    for lang in ("en", "xx"):
        ws = [
            wd
            for _, lg, t in texts
            if lg == lang
            for wd in t.split(" ")
            if wd
        ]
        n_sub = sum(len(syms[wd]) for wd in ws)
        n_ch = sum(len(wd) for wd in ws)
        expect[lang] = (
            len(ws),
            n_sub,
            n_ch,
            float(n_sub) / len(ws),
            float(n_ch) / n_sub,
        )

    df = spark.createDataFrame(
        texts, "doc_id long, lang string, text string"
    )
    with _docs_fixture(df):
        got = {
            r.lang: (
                r.n_words,
                r.n_bpe_tokens,
                r.n_chars,
                r.fertility,
                r.chars_per_token,
            )
            for r in tokenizer_fertility_report(spark, "ignored").collect()
        }
    assert got == expect


def test_bpe_fertility_plan_and_invariants(spark, sf_dir):
    """The apply join must be a broadcast riding the token scan (no
    sort-merge join), and the report's arithmetic invariants hold:
    1 ≤ fertility, chars_per_token ≥ 1, one row per language."""
    from data_pipeline_spark_spark.operators.text import (
        tokenizer_fertility_report,
    )
    from data_pipeline_spark_spark.plans.analyze import (
        formatted_plan,
        has_broadcast_join,
    )

    df = tokenizer_fertility_report(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert has_broadcast_join(df)
    rows = df.collect()
    assert len(rows) == 5  # fixture languages
    for r in rows:
        assert r.fertility >= 1.0
        assert r.chars_per_token >= 1.0
        assert r.n_bpe_tokens <= r.n_chars


# ---------------------------------------------------------------------------
# trained curation pipeline (composition)
# ---------------------------------------------------------------------------


def test_trained_pipeline_reconciles_with_its_stages(spark, sf_dir):
    """The composed attrition table must agree with the stage keys it
    is built from: per-language NB pass counts equal the classifier's
    own positives, DSIR pass counts equal the selected slice's
    language histogram, the intersection is bounded by both, and the
    n_docs column partitions the corpus."""
    from pyspark.sql import functions as F

    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.corpus import (
        corpus_dsir_select,
        corpus_pipeline_trained,
    )
    from data_pipeline_spark_spark.operators.text import (
        quality_classifier_nb,
    )

    rows = {r.lang: r for r in corpus_pipeline_trained(spark, sf_dir).collect()}
    d = load(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows.values()) == d.count()

    nb_by_lang = {
        r.lang: r.n
        for r in quality_classifier_nb(spark, sf_dir)
        .filter(F.col("pred_target") == 1)
        .join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    dsir_by_lang = {
        r.lang: r.n
        for r in corpus_dsir_select(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for lang, r in rows.items():
        assert r.n_pass_nb == nb_by_lang.get(lang, 0), lang
        assert r.n_pass_dsir == dsir_by_lang.get(lang, 0), lang
        assert r.n_pass_both <= min(r.n_pass_nb, r.n_pass_dsir)
        assert r.n_unique_surviving <= r.n_pass_both

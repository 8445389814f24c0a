"""Round-11 additions: hybrid retrieval via reciprocal-rank fusion
(retrieval_hybrid_rrf). Ships the differential trio — a hypothesis
differential of the fusion fold against a literal python RRF, a
plan-shape guard (both stages' broadcast shapes reused, distributed
top-k, no Python eval), and the behavioral contract fusion exists
for (a doc ranked on both sides outranks equally-ranked one-siders).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from data_pipeline_spark_spark.operators.similarity import (
    _RRF_K,
    retrieval_hybrid_rrf,
    rrf_fuse,
)

# two partial rank lists over a small id universe: for each doc,
# present-on-side flags; ranks are then the order of presence (ranks
# must be 1..n without gaps, as the operator's TakeOrdered produces)
_SIDES = st.lists(
    st.tuples(st.booleans(), st.booleans()), min_size=1, max_size=12
)


def _py_rrf(pairs, top_k):
    """Literal RRF fold: rank lists -> fused (doc_id, lex, vec, score,
    rank) rows, float arithmetic identical to the Spark expression."""
    lex = [i for i, (a, _) in enumerate(pairs) if a]
    vec = [i for i, (_, b) in enumerate(pairs) if b]
    lrank = {d: r + 1 for r, d in enumerate(lex)}
    vrank = {d: r + 1 for r, d in enumerate(vec)}
    fused = []
    for d in sorted(set(lex) | set(vec)):
        s = (1.0 / (_RRF_K + lrank[d]) if d in lrank else 0.0) + (
            1.0 / (_RRF_K + vrank[d]) if d in vrank else 0.0
        )
        fused.append((d, lrank.get(d), vrank.get(d), s))
    fused.sort(key=lambda t: (-t[3], t[0]))
    return {
        d: (lr, vr, round(s, 6), i + 1)
        for i, (d, lr, vr, s) in enumerate(fused[:top_k])
    }


@settings(max_examples=25, deadline=None)
@given(_SIDES)
def test_rrf_fuse_matches_reference(spark, sides):
    """Differential: random partial membership of a doc universe in
    the two sides vs the literal python fold — ranks, the fused
    double, and the final ordering must all match exactly (the fused
    score is two IEEE divisions and one add on integers; no
    tolerance is needed or used)."""
    lex_rows = [
        (d, r)
        for r, d in enumerate(
            [i for i, (a, _) in enumerate(sides) if a], start=1
        )
    ]
    vec_rows = [
        (d, r)
        for r, d in enumerate(
            [i for i, (_, b) in enumerate(sides) if b], start=1
        )
    ]
    if not lex_rows and not vec_rows:
        return
    lex_df = spark.createDataFrame(
        lex_rows or [(None, None)], "doc_id int, lex_rank int"
    ).filter(F.col("doc_id").isNotNull())
    vec_df = spark.createDataFrame(
        vec_rows or [(None, None)], "doc_id int, vec_rank int"
    ).filter(F.col("doc_id").isNotNull())
    got = {
        r.doc_id: (r.lex_rank, r.vec_rank, r.rrf_score, r.rnk)
        for r in rrf_fuse(lex_df, vec_df, top_k=5).collect()
    }
    assert got == _py_rrf(sides, 5)


def test_rrf_plan_shape(spark, sf_dir):
    """Both stages keep their proven shapes inside the composition:
    the only joins over corpus-sized inputs are the two 1-row
    broadcasts (BM25 stats, query vector), each side collapses via a
    distributed TakeOrdered (never a corpus-wide Window/global sort),
    the fusion join touches only the fused candidates, and nothing
    evaluates in Python."""
    from data_pipeline_spark_spark.plans.analyze import (
        formatted_plan,
        shuffle_count,
    )

    df = retrieval_hybrid_rrf(spark, sf_dir)
    plan = formatted_plan(df)
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("TakeOrderedAndProject") >= 3  # lex, vec, final
    # 1-row broadcast builds are IdentityBroadcastMode BNL crosses —
    # the documented acceptable BNL shape (aggregate-scalar joins);
    # formatted plans print each node twice (tree + details), so
    # count the detail-section marker
    assert plan.count("IdentityBroadcastMode") == 2
    # the only exchanges: the 1-row stats aggregate + single-partition
    # windows over <=depth rows — nothing doc-keyed
    assert shuffle_count(df) <= 4, formatted_plan(df)


def test_rrf_behavioral_contract(spark, sf_dir):
    """Fusion's reason to exist: scores recompute exactly from the
    emitted ranks; ranks are a 1..10 permutation; and any doc present
    on BOTH sides outscores a doc whose single-side rank is no better
    than either of its ranks."""
    rows = retrieval_hybrid_rrf(spark, sf_dir).collect()
    assert sorted(r.rnk for r in rows) == list(range(1, 11))
    for r in rows:
        s = (1.0 / (_RRF_K + r.lex_rank) if r.lex_rank else 0.0) + (
            1.0 / (_RRF_K + r.vec_rank) if r.vec_rank else 0.0
        )
        assert r.rrf_score == round(s, 6)
        assert r.lex_rank is not None or r.vec_rank is not None
    both = [r for r in rows if r.lex_rank and r.vec_rank]
    single = [
        r for r in rows if (r.lex_rank is None) != (r.vec_rank is None)
    ]
    for b in both:
        worst = max(b.lex_rank, b.vec_rank)
        for s_ in single:
            only = s_.lex_rank or s_.vec_rank
            if only >= worst:
                assert b.rrf_score > s_.rrf_score


# ---------------------------------------------------------------------------
# layout_zorder_locality
# ---------------------------------------------------------------------------


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=31),
            st.integers(min_value=0, max_value=31),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_morton_interleave_matches_reference(spark, pts):
    """Differential: the Spark Morton expression vs a literal python
    bit interleave over random 5-bit dimension pairs."""
    from data_pipeline_spark_spark.operators.scale_patterns import (
        _Z_BITS,
        morton_z,
    )

    def py_z(d, u):
        z = 0
        for i in range(_Z_BITS):
            z += ((d >> i) & 1) << (2 * i + 1)
            z += ((u >> i) & 1) << (2 * i)
        return z

    df = spark.createDataFrame(
        [(i, d, u) for i, (d, u) in enumerate(pts)],
        "idx int, d int, u int",
    )
    got = {
        r.idx: r.z
        for r in df.select(
            "idx", morton_z(F.col("d"), F.col("u")).alias("z")
        ).collect()
    }
    assert got == {i: py_z(d, u) for i, (d, u) in enumerate(pts)}


def test_zorder_locality_contract(spark, sf_dir):
    """The capability's reason to exist: the 2-D box query touches
    strictly fewer files under the z-layout than under arrival
    order, per-file min/max stats account for every file, and the
    plan keeps the scan narrow (3 columns) with no Python eval."""
    from data_pipeline_spark_spark.operators.scale_patterns import (
        layout_zorder_locality,
    )
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    df = layout_zorder_locality(spark, sf_dir)
    plan = formatted_plan(df)
    assert "EvalPython" not in plan
    [r] = df.collect()
    assert r.zorder_wins
    assert r.files_scanned_zorder < r.files_scanned_linear <= r.n_files
    # the z-curve box region is a small fraction of the space; even
    # with boundary effects it must beat arrival order by >=1.5x
    assert r.files_scanned_linear / r.files_scanned_zorder >= 1.5


# ---------------------------------------------------------------------------
# tokenizer_unigram_segment
# ---------------------------------------------------------------------------

_WORDS = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=8), min_size=1, max_size=10
)


def _ln6(k):
    import math
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        Decimal(repr(math.log(k) * 1000000.0)).quantize(
            Decimal(1), rounding=ROUND_HALF_UP
        )
    )


def _uni_reference(docs):
    """Literal unigram-LM fold: substring-seeded vocab (singles + top
    16 multis by (count desc, piece asc)), micro-nat ML probs,
    Viterbi DP on the 32*score-npieces encoding, per-lang rollup —
    no DataFrame machinery."""
    from collections import Counter

    words = Counter()
    for text, _ in docs:
        for w in text.split(" "):
            if w:
                words[w] += 1
    pieces = Counter()
    for w, c in words.items():
        for i in range(len(w)):
            for l in range(1, min(4, len(w) - i) + 1):
                pieces[w[i:i + l]] += c
    voc = {p: c for p, c in pieces.items() if len(p) == 1}
    voc.update(
        dict(
            sorted(
                ((p, c) for p, c in pieces.items() if len(p) >= 2),
                key=lambda pc: (-pc[1], pc[0]),
            )[:16]
        )
    )
    tot = sum(voc.values())
    aw = {p: 32 * (_ln6(c) - _ln6(tot)) - 1 for p, c in voc.items()}
    rep = {}
    for w in words:
        if len(w) > 12:
            continue
        best = {0: 0}
        for i in range(1, len(w) + 1):
            best[i] = max(
                best[i - l] + aw[w[i - l:i]]
                for l in range(1, min(4, i) + 1)
                if w[i - l:i] in aw
            )
        b = best[len(w)]
        np = (-b) % 32
        rep[w] = (np, (b + np) // 32)
    out = {}
    for text, lang in docs:
        for w in text.split(" "):
            if w and len(w) <= 12:
                n, s6, nc, cnt = out.get(lang, (0, 0, 0, 0))
                out[lang] = (
                    n + 1,
                    s6 + rep[w][1],
                    nc + len(w),
                    cnt + rep[w][0],
                )
    return {
        lang: (
            n,
            cnt,
            nc,
            float(cnt) / n,
            (float(s6) / n) / 1000000.0,
        )
        for lang, (n, s6, nc, cnt) in out.items()
    }


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(_WORDS, st.sampled_from(["en", "de"])),
                min_size=1, max_size=6))
def test_unigram_segment_matches_reference(spark, corp):
    """Differential: random two-lang corpora over an 'ab' alphabet vs
    the literal python fold — counts, the exact integer subword
    totals, and both report doubles must match exactly."""
    from data_pipeline_spark_spark.operators.text import (
        unigram_segment_of,
    )

    docs = [(" ".join(ws), lang) for ws, lang in corp]
    df = spark.createDataFrame(docs, "text string, lang string")
    got = {
        r.lang: (
            r.n_words,
            r.n_unigram_tokens,
            r.n_chars,
            r.fertility,
            r.avg_word_logprob,
        )
        for r in unigram_segment_of(df).collect()
    }
    assert got == _uni_reference(docs)


def test_unigram_plan_shape(spark, sf_dir):
    """The model rides broadcasts onto the token stream: no
    SortMergeJoin over corpus-sized data, no cartesian product, no
    Python eval — the DP is a pure column projection."""
    from data_pipeline_spark_spark.operators.text import (
        tokenizer_unigram_segment,
    )
    from data_pipeline_spark_spark.plans.analyze import (
        formatted_plan,
        has_broadcast_join,
    )

    df = tokenizer_unigram_segment(spark, sf_dir)
    plan = formatted_plan(df)
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan, plan
    assert has_broadcast_join(df)


def test_unigram_behavioral_contract(spark, sf_dir):
    """The tokenizer's reason to exist: multi-char pieces compress —
    strictly fewer subwords than characters, at least chars/PMAX of
    them (a piece covers <=4 chars), and every log-likelihood is
    negative."""
    from data_pipeline_spark_spark.operators.text import (
        tokenizer_unigram_segment,
    )

    rows = tokenizer_unigram_segment(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_chars / 4 <= r.n_unigram_tokens < r.n_chars
        assert 1.0 < r.fertility <= 4.0
        assert r.avg_word_logprob < 0


# ---------------------------------------------------------------------------
# corpus_pack_sequences
# ---------------------------------------------------------------------------


def _py_pack(n_toks, L):
    """Literal packing fold: simulate the concatenated token stream
    and account every sequence's docs/tokens/continuation directly."""
    out = {}
    off = 0
    for doc_id, n in enumerate(n_toks):
        start, end = off, off + n
        for s in range(start // L, (end - 1) // L + 1):
            lo, hi = s * L, (s + 1) * L
            d = out.setdefault(s, [0, 0, 0, doc_id, doc_id])
            d[0] += 1
            d[1] += min(end, hi) - max(start, lo)
            d[2] += 1 if start < lo else 0
            d[3] = min(d[3], doc_id)
            d[4] = max(d[4], doc_id)
        off = end
    return {s: tuple(v) for s, v in out.items()}


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=30))
def test_pack_manifest_matches_reference(spark, n_toks):
    """Differential: random doc token counts vs the literal python
    stream simulation — per-sequence doc counts, token contributions,
    continuation flags, and doc-id bounds are pure integer arithmetic
    and must match exactly."""
    from data_pipeline_spark_spark.operators.training_data import pack_manifest

    L = 16
    rows, off = [], 0
    for doc_id, n in enumerate(n_toks):
        rows.append((doc_id, n, off))
        off += n
    offs = spark.createDataFrame(rows, "doc_id long, n_tok long, off long")
    got = {
        r.seq_id: (r.n_docs, r.n_tokens, r.n_continued, r.first_doc, r.last_doc)
        for r in pack_manifest(offs, L).collect()
    }
    assert got == _py_pack(n_toks, L)


def test_pack_sequences_plan_shape(spark, sf_dir):
    """The packing fold is interval arithmetic + ONE hash aggregation:
    no Python eval, no cartesian, exactly one exchange on the test
    offsets frame; and the full operator returns a checkpointed result
    (the manifest is O(tokens/L) rows and must not round-trip the
    driver as a LocalTableScan)."""
    from data_pipeline_spark_spark.operators.training_data import (
        corpus_pack_sequences,
        pack_manifest,
    )
    from data_pipeline_spark_spark.plans.analyze import (
        formatted_plan,
        shuffle_count,
    )

    offs = spark.createDataFrame(
        [(0, 5, 0), (1, 7, 5)], "doc_id long, n_tok long, off long"
    )
    fold = pack_manifest(offs, 16)
    plan = formatted_plan(fold)
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert shuffle_count(fold) == 1
    full = formatted_plan(corpus_pack_sequences(spark, sf_dir))
    assert "LocalTableScan" not in full


def test_pack_sequences_contract(spark, sf_dir):
    """Packing's reason to exist: every sequence is exactly full
    (n_tokens == L) except possibly the last; sequence ids are
    contiguous from 0; at most ONE document can straddle a left
    boundary; and the total packed token count equals shard_pack's
    (same stream, different granularity)."""
    from data_pipeline_spark_spark.operators.training_data import (
        _SEQ_TOKENS,
        corpus_pack_sequences,
        shard_pack,
    )

    rows = sorted(
        corpus_pack_sequences(spark, sf_dir).collect(), key=lambda r: r.seq_id
    )
    assert [r.seq_id for r in rows] == list(range(len(rows)))
    for r in rows[:-1]:
        assert r.n_tokens == _SEQ_TOKENS
    assert 0 < rows[-1].n_tokens <= _SEQ_TOKENS
    assert all(r.n_continued in (0, 1) for r in rows)
    assert all(r.first_doc <= r.last_doc for r in rows)
    total_seq = sum(r.n_tokens for r in rows)
    total_shard = sum(r.n_tokens for r in shard_pack(spark, sf_dir).collect())
    assert total_seq == total_shard


# ---------------------------------------------------------------------------
# drift_psi_report
# ---------------------------------------------------------------------------


def _py_psi(rows):
    """Literal PSI fold over (dim, bucket, is_base) rows, float
    arithmetic mirroring the Spark expression."""
    import math

    counts = {}
    for dim, bucket, b in rows:
        c = counts.setdefault((dim, bucket), [0, 0])
        c[0 if b else 1] += 1
    out = {}
    for dim in {d for d, _ in counts}:
        ks = [kb for kb in counts if kb[0] == dim]
        t_base = sum(counts[kb][0] for kb in ks)
        t_curr = sum(counts[kb][1] for kb in ks)
        k = len(ks)
        for kb in ks:
            nb, nc = counts[kb]
            pb = (nb + 1) / float(t_base + k)
            pc = (nc + 1) / float(t_curr + k)
            out[kb] = (nb, nc, pb, pc, (pb - pc) * math.log(pb / pc))
    return out


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["event_type", "value_bucket"]),
            st.integers(min_value=0, max_value=5),
            st.booleans(),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_psi_from_long_matches_reference(spark, rows):
    """Differential: random long-form (dim, bucket, is_base) rows vs
    the literal python PSI fold. Counts and smoothed probabilities are
    integer-derived IEEE divisions (exact match); the log term allows
    1 ulp of libm divergence between CPython and the JVM."""
    from data_pipeline_spark_spark.operators.analytics import psi_from_long

    df = spark.createDataFrame(
        [(d, str(bkt), 1 if b else 0) for d, bkt, b in rows],
        "dim string, bucket string, is_base int",
    )
    got = {
        (r.dim, r.bucket): (r.n_base, r.n_curr, r.p_base, r.p_curr, r.psi_term)
        for r in psi_from_long(df).collect()
    }
    want = _py_psi([(d, str(bkt), b) for d, bkt, b in rows])
    assert set(got) == set(want)
    for kb, (nb, nc, pb, pc, term) in want.items():
        g = got[kb]
        assert g[0] == nb and g[1] == nc
        assert g[2] == pb and g[3] == pc
        assert abs(g[4] - term) <= 1e-15 + 1e-12 * abs(term)


def test_psi_plan_shape(spark, sf_dir):
    """Drift over two dimensions must cost ONE scan of events (inline
    array explode, not a self-union), aggregate immediately, and keep
    every window on post-aggregation O(buckets) rows: no Python eval,
    at most two exchanges (the (dim,bucket) agg + the per-dim window)."""
    from data_pipeline_spark_spark.operators.analytics import drift_psi_report
    from data_pipeline_spark_spark.plans.analyze import (
        formatted_plan,
        shuffle_count,
    )

    df = drift_psi_report(spark, sf_dir)
    plan = formatted_plan(df)
    assert "EvalPython" not in plan
    assert plan.count("Scan parquet") == 2  # one node: tree + details
    assert shuffle_count(df) <= 2


def test_psi_contract(spark, sf_dir):
    """PSI's defining properties on real data: every per-bucket term
    is non-negative ((p−q) and ln(p/q) always share sign); smoothed
    probabilities are a distribution (sum to 1 per dim side); the
    event_type dimension carries the fixture's full category set; and
    each term recomputes exactly from the emitted counts."""
    import math
    from collections import defaultdict

    from data_pipeline_spark_spark.operators.analytics import drift_psi_report

    rows = drift_psi_report(spark, sf_dir).collect()
    sums = defaultdict(lambda: [0.0, 0.0, 0])
    per_dim_counts = defaultdict(lambda: [0, 0, 0])
    for r in rows:
        assert r.psi_term >= 0.0
        sums[r.dim][0] += r.p_base
        sums[r.dim][1] += r.p_curr
        sums[r.dim][2] += 1
        per_dim_counts[r.dim][0] += r.n_base
        per_dim_counts[r.dim][1] += r.n_curr
    assert set(sums) == {"event_type", "value_bucket"}
    assert sums["event_type"][2] == 5
    for dim, (sb, sc, _k) in sums.items():
        assert abs(sb - 1.0) < 1e-9 and abs(sc - 1.0) < 1e-9
    for r in rows:
        t_base, t_curr, _ = per_dim_counts[r.dim]
        k = sums[r.dim][2]
        pb = (r.n_base + 1) / float(t_base + k)
        pc = (r.n_curr + 1) / float(t_curr + k)
        assert r.p_base == pb and r.p_curr == pc
        want = (pb - pc) * math.log(pb / pc)
        assert abs(r.psi_term - want) <= 1e-15 + 1e-12 * abs(want)


# ---------------------------------------------------------------------------
# quality_bigram_perplexity
# ---------------------------------------------------------------------------


def _r6_ln(k):
    """round(ln(k)·1e6) with Spark F.round double semantics (HALF_UP
    on the shortest decimal repr) — mirrors functions.exact.micro_ln."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        Decimal(repr(math.log(k) * 1000000.0)).quantize(
            Decimal(1), rounding=ROUND_HALF_UP
        )
    )


def _py_bigram_ppl(texts):
    """Literal add-1-smoothed bigram-LM scoring fold."""
    toks = {i: t.split(" ") for i, t in enumerate(texts)}
    vocab = {w for t in toks.values() for w in t}
    bc, cc = {}, {}
    for t in toks.values():
        for a, b in zip(t, t[1:]):
            bc[(a, b)] = bc.get((a, b), 0) + 1
            cc[a] = cc.get(a, 0) + 1
    lp6 = {
        (a, b): _r6_ln(c + 1) - _r6_ln(cc[a] + len(vocab))
        for (a, b), c in bc.items()
    }
    out = {}
    for i, t in toks.items():
        if len(t) < 2:
            continue
        terms = [lp6[(a, b)] for a, b in zip(t, t[1:])]
        s = sum(terms)
        out[i] = (len(terms), s, float(s) / (1000000.0 * len(terms)))
    return out


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd"]), min_size=1, max_size=8
        ).map(" ".join),
        min_size=1,
        max_size=10,
    )
)
def test_bigram_perplexity_matches_reference(spark, texts):
    """Differential: random tiny corpora vs the literal python
    bigram-LM fold — counts, micro-nat sums, and the final division
    must match exactly (integer arithmetic until one IEEE division)."""
    from data_pipeline_spark_spark.operators.text import bigram_perplexity_of

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_bigrams, r.sum_lp6, r.mean_logprob)
        for r in bigram_perplexity_of(docs).collect()
    }
    assert got == _py_bigram_ppl(texts)


def test_bigram_perplexity_plan_shape(spark, sf_dir):
    """Bigram extraction must be in-row array algebra: no Window over
    doc-ordered tokens, no doc-keyed sort, nothing in Python; the
    model joins back as broadcasts (no corpus-sized shuffle join at
    fixture scale) and the only cartesian is the 1-row vocab-size
    broadcast. The one allowed Window is the r17 context-total sum
    over the MODEL-sized bigram count table, partitioned by w1
    (bigram TYPES, vocab-bounded) — never by doc_id over the
    corpus-proportional token stream."""
    from data_pipeline_spark_spark.operators.text import (
        quality_bigram_perplexity,
    )
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    plan = formatted_plan(quality_bigram_perplexity(spark, sf_dir))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    import re

    specs = re.findall(r"windowspecdefinition\(([^,)]+)", plan)
    assert specs, "expected the w1-partitioned context-total window"
    for spec in specs:
        assert spec.startswith("w1#"), (
            f"window partitioned by {spec!r} — the context-total "
            "window must partition by w1 (model-sized), never the "
            "doc-keyed token stream"
        )


def test_bigram_perplexity_contract(spark, sf_dir):
    """Scoring's defining properties on real data: every doc with ≥2
    tokens gets exactly one row; n_bigrams == n_tokens − 1; all
    smoothed log-probs are negative (c12+1 < c1+V always, since V >
    each context total on this corpus); and mean recomputes from the
    integer sum."""
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.text import (
        quality_bigram_perplexity,
    )

    rows = {
        r.doc_id: r
        for r in quality_bigram_perplexity(spark, sf_dir).collect()
    }
    want_n = {
        r.doc_id: r.n
        for r in load(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
        if r.n >= 2
    }
    assert set(rows) == set(want_n)
    for doc_id, r in rows.items():
        assert r.n_bigrams == want_n[doc_id] - 1
        assert r.sum_lp6 < 0 and r.mean_logprob < 0
        assert r.mean_logprob == float(r.sum_lp6) / (1000000.0 * r.n_bigrams)


# ---------------------------------------------------------------------------
# event_pattern_match
# ---------------------------------------------------------------------------


def _py_journeys(events):
    """Literal CEP fold: ordered journey string + regex metrics."""
    import hashlib
    import re

    by_user = {}
    for uid, ts, eid, et in events:
        by_user.setdefault(uid, []).append((ts, eid, et[0]))
    out = {}
    for uid, evs in by_user.items():
        j = "".join(i for _, _, i in sorted(evs))
        runs = [len(m) for m in re.findall(r"e+", j)]
        out[uid] = (
            len(evs),
            hashlib.md5(j.encode()).hexdigest(),
            len(re.findall(r"s[^p]*p", j)),
            max(runs) if runs else 0,
            len(re.findall(r"vc", j)),
        )
    return out


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=50),
            st.sampled_from(["signup", "click", "purchase", "error", "view"]),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[1],
    )
)
def test_journey_metrics_matches_reference(spark, rows):
    """Differential: random event histories vs python's re module —
    the journey digest and every regex metric must agree (both
    engines' scans are non-overlapping left-to-right; the pattern
    subset has no dialect divergence)."""
    import datetime as dt

    from data_pipeline_spark_spark.operators.analytics import journey_metrics

    base = dt.datetime(2024, 1, 1)
    data = [
        (uid, base + dt.timedelta(minutes=eid), eid, et)
        for uid, eid, et in rows
    ]
    df = spark.createDataFrame(
        data, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = {
        r.user_id: (
            r.n_events,
            r.journey_md5,
            r.n_conversions,
            r.longest_error_run,
            r.n_view_click,
        )
        for r in journey_metrics(df).collect()
    }
    assert got == _py_journeys(
        [(uid, t, eid, et) for (uid, t, eid, et) in data]
    )


def test_event_pattern_plan_shape(spark, sf_dir):
    """CEP over journeys costs exactly ONE exchange (the per-user
    collect_list agg); regex evaluation is in-row codegen — no
    Python, no second shuffle, no window sort of raw events."""
    from data_pipeline_spark_spark.operators.analytics import (
        event_pattern_match,
    )
    from data_pipeline_spark_spark.plans.analyze import (
        formatted_plan,
        shuffle_count,
    )

    df = event_pattern_match(spark, sf_dir)
    plan = formatted_plan(df)
    assert "EvalPython" not in plan
    assert "Window" not in plan
    assert shuffle_count(df) == 1


def test_event_pattern_contract(spark, sf_dir):
    """Pattern semantics on real data: conversions require at least
    as many signups and purchases as matches; the longest error run
    never exceeds the user's event count; journeys cover every user
    exactly once; and metrics are internally consistent
    (longest_error_run == 0 iff the user has no error events —
    checked via a recount)."""
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.analytics import (
        event_pattern_match,
    )

    rows = {r.user_id: r for r in event_pattern_match(spark, sf_dir).collect()}
    per_user = {
        r.user_id: r
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                (F.col("event_type") == "error").cast("int")
            ).alias("n_err"),
            F.sum(
                (F.col("event_type") == "signup").cast("int")
            ).alias("n_sign"),
            F.sum(
                (F.col("event_type") == "purchase").cast("int")
            ).alias("n_purch"),
        )
        .collect()
    }
    assert set(rows) == set(per_user)
    for uid, r in rows.items():
        u = per_user[uid]
        assert r.n_events == u.n
        assert r.n_conversions <= min(u.n_sign, u.n_purch)
        assert r.longest_error_run <= u.n_err
        assert (r.longest_error_run == 0) == (u.n_err == 0)


# ---------------------------------------------------------------------------
# privacy_k_anonymity
# ---------------------------------------------------------------------------


def _py_k_anon(events, k=5):
    """Literal k-anonymity fold: per-user QI profile → class sizes."""
    import datetime as dt

    by_user = {}
    for uid, ts, eid, et in events:
        by_user.setdefault(uid, []).append((ts, et))
    classes = {}
    for uid, evs in by_user.items():
        first = min(t for t, _ in evs)
        # ISO Monday-start week truncation (both engines' date_trunc)
        week = (first - dt.timedelta(days=first.weekday())).date()
        bucket = len(evs) // 10
        cnt = {}
        for _, et in evs:
            cnt[et] = cnt.get(et, 0) + 1
        fav = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        key = (week, bucket, fav)
        classes[key] = classes.get(key, 0) + 1
    return {
        key: (n, 1 if n >= k else 0) for key, n in classes.items()
    }


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=0, max_value=200),
            st.sampled_from(["signup", "click", "purchase", "error", "view"]),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[1],
    )
)
def test_k_anonymity_matches_reference(spark, rows):
    """Differential: random event histories vs the literal python QI
    fold — week truncation, activity bucketing, the alphabetical mode
    tie-break, and class counting must all agree."""
    import datetime as dt

    from data_pipeline_spark_spark.operators.analytics import k_anonymity_of

    base = dt.datetime(2024, 1, 3)
    data = [
        (uid, base + dt.timedelta(hours=eid * 7), eid, et)
        for uid, eid, et in rows
    ]
    df = spark.createDataFrame(
        data, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = {
        (r.cohort_week, r.activity_bucket, r.fav_type): (
            r.class_size,
            r.meets_k,
        )
        for r in k_anonymity_of(df).collect()
    }
    assert got == _py_k_anon(data)


def test_k_anonymity_plan_shape(spark, sf_dir):
    """The audit never windows raw events: the ROW_NUMBER mode pick
    runs over per-(user,type) COUNTS, so the window input is
    aggregate-sized; no Python eval; no cartesian."""
    from data_pipeline_spark_spark.operators.analytics import (
        privacy_k_anonymity,
    )
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    import re

    plan = formatted_plan(privacy_k_anonymity(spark, sf_dir))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the Window must consume the typed aggregate, not raw events:
    # its ordering key is `cnt` — a column that only EXISTS as the
    # (user_id, event_type) aggregate's output — so a window spec
    # ordered by cnt DESC proves the mode pick runs over counts
    assert re.search(
        r"windowspecdefinition\(user_id#\d+L?, cnt#\d+L? DESC", plan
    ), plan
    # and the typed aggregate itself is present with both grouping keys
    assert re.search(r"Keys \[2\]: \[user_id#\d+L?, event_type#\d+\]", plan)


def test_k_anonymity_contract(spark, sf_dir):
    """Audit semantics on real data: class sizes sum to the distinct
    user count (every user in exactly one class); meets_k is derived
    from class_size; buckets and sizes are non-negative."""
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.analytics import (
        _K_ANON,
        privacy_k_anonymity,
    )

    rows = privacy_k_anonymity(spark, sf_dir).collect()
    n_users = (
        load(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(r.class_size for r in rows) == n_users
    for r in rows:
        assert r.class_size >= 1 and r.activity_bucket >= 0
        assert r.meets_k == (1 if r.class_size >= _K_ANON else 0)


# ---------------------------------------------------------------------------
# stream_drift_psi
# ---------------------------------------------------------------------------


def test_stream_drift_matches_batch(spark, sf_dir):
    """The defining contract: the streaming drift monitor converges
    to the batch report EXACTLY — same buckets, same counts, same
    doubles — because both run the same psi_long_form +
    psi_from_counts code; the stream merely accumulates the counts
    across micro-batches."""
    from data_pipeline_spark_spark.operators.analytics import drift_psi_report
    from data_pipeline_spark_spark.operators.streaming_batch import (
        stream_drift_psi,
    )

    key = lambda r: (r.dim, r.bucket)  # noqa: E731
    got = {key(r): r for r in stream_drift_psi(spark, sf_dir).collect()}
    want = {key(r): r for r in drift_psi_report(spark, sf_dir).collect()}
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        assert (g.n_base, g.n_curr) == (w.n_base, w.n_curr)
        assert g.p_base == w.p_base and g.p_curr == w.p_curr
        assert g.psi_term == w.psi_term


def test_stream_drift_state_is_bucket_bounded(spark, sf_dir):
    """The monitor's reason to scale: streaming state is the count
    table — O(buckets), NOT O(events). Re-run the operator's exact
    stream shape with progress capture and assert the state store
    never holds more rows than the bucket union (vs ~thousands of
    events streamed)."""
    import os
    import shutil
    import tempfile

    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.analytics import (
        psi_counts,
        psi_long_form,
    )

    e = load(spark, sf_dir, "events").select("ts", "event_type", "value")
    n_events = e.count()
    n_buckets = psi_long_form(e).select("dim", "bucket").distinct().count()
    src = tempfile.mkdtemp(prefix="dps_sdrift_test_")
    sink = f"stream_drift_state_test_{os.getpid()}"
    try:
        e.repartition(4).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        counts = psi_counts(psi_long_form(stream))
        q = (
            counts.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        state_rows = max(
            p["stateOperators"][0]["numRowsTotal"]
            for p in q.recentProgress
            if p["stateOperators"]
        )
        assert state_rows <= n_buckets, (state_rows, n_buckets)
        assert n_events > 10 * n_buckets  # the bound is meaningful
    finally:
        shutil.rmtree(src, ignore_errors=True)
        try:
            spark.catalog.dropTempView(sink)
        except Exception:
            pass


# ---------------------------------------------------------------------------
# agg_linear_fit
# ---------------------------------------------------------------------------


def _py_ols(points):
    """Literal OLS from exact integer moments, double formula mirrored
    operand-for-operand."""
    out = {}
    by_g = {}
    for g, x, y in points:
        by_g.setdefault(g, []).append((x, y))
    for g, pts in by_g.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        cov = float(n) * sxy - float(sx) * sy
        vx = float(n) * sxx - float(sx) * sx
        vy = float(n) * syy - float(sy) * sy
        if vx == 0.0 or vy == 0.0:
            continue  # degenerate: single x or constant y
        slope_centi = cov / vx
        out[g] = (
            n,
            slope_centi / 100.0,
            (float(sy) - slope_centi * float(sx)) / float(n) / 100.0,
            (cov * cov) / (vx * vy),
        )
    return out


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=720),
            st.integers(min_value=-(10**6), max_value=10**6),
        ),
        min_size=2,
        max_size=40,
    )
)
def test_ols_fit_matches_reference(spark, points):
    """Differential: random integer-grid points vs the literal python
    moment fold — the moments are exact int64 so every double in the
    closed form is bit-identical."""
    from data_pipeline_spark_spark.operators.relational import ols_fit

    df = spark.createDataFrame(points, "g string, x long, y long")
    got = {
        r.g: (r.n, r.slope_per_hr, r.intercept, r.r2)
        for r in ols_fit(df).collect()
        if r.r2 is not None and not (r.r2 != r.r2)  # drop degenerate NaN
    }
    want = _py_ols(points)
    for g, w in want.items():
        assert g in got
        assert got[g] == w


def test_linear_fit_plan_shape(spark, sf_dir):
    """ONE map-side-combined hash aggregate: a single exchange, no
    Window, no Python; the shuffle carries six longs per group."""
    from data_pipeline_spark_spark.operators.relational import agg_linear_fit
    from data_pipeline_spark_spark.plans.analyze import (
        formatted_plan,
        shuffle_count,
    )

    df = agg_linear_fit(spark, sf_dir)
    plan = formatted_plan(df)
    assert "EvalPython" not in plan
    assert "Window" not in plan
    assert shuffle_count(df) == 1


def test_linear_fit_recovers_exact_line(spark):
    """Behavioral contract: on exactly linear centi-grid data
    (y = 3x + 7 in value units), the fit returns slope 3.0,
    intercept 7.0, r² = 1.0 — EXACTLY, because every moment is an
    exact integer below 2^53 and the closed form is deterministic
    double arithmetic."""
    from data_pipeline_spark_spark.operators.relational import ols_fit

    pts = [("t", x, 300 * x + 700) for x in range(0, 50)]
    df = spark.createDataFrame(pts, "g string, x long, y long")
    [r] = ols_fit(df).collect()
    assert r.n == 50
    assert r.slope_per_hr == 3.0
    assert r.intercept == 7.0
    assert r.r2 == 1.0


# ---------------------------------------------------------------------------
# ts_seasonal_profile
# ---------------------------------------------------------------------------


def _py_seasonal(rows):
    """Literal seasonal-profile fold from exact integer moments."""
    import math

    b = {}
    for g, h, y in rows:
        d = b.setdefault((g, h), [0, 0, 0])
        d[0] += 1
        d[1] += y
        d[2] += y * y
    tot = {}
    for (g, _h), (n, sy, _) in b.items():
        t = tot.setdefault(g, [0, 0])
        t[0] += n
        t[1] += sy
    out = {}
    for (g, h), (n, sy, syy) in b.items():
        nt, syt = tot[g]
        out[(g, h)] = (
            n,
            float(sy) / float(n) / 100.0,
            math.sqrt(float(n) * syy - float(sy) * sy) / float(n) / 100.0,
            (float(sy) / float(n)) / (float(syt) / float(nt)),
        )
    return out


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=23),
            st.integers(min_value=1, max_value=10**6),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_seasonal_profile_matches_reference(spark, rows):
    """Differential: random (type, hour, centi-value) rows vs the
    literal python moment fold — integer moments then identical
    double trees, so equality is exact."""
    import datetime as dt

    from data_pipeline_spark_spark.operators.analytics import (
        ts_seasonal_profile,
    )
    from data_pipeline_spark_spark.operators import analytics as A

    data = [
        (g, dt.datetime(2024, 1, 5, h, 30), float(y) / 100.0)
        for g, h, y in rows
    ]
    df = spark.createDataFrame(
        data, "event_type string, ts timestamp, value double"
    )
    orig = A.load
    A.load = lambda s, sf, name: df
    try:
        got = {
            (r.event_type, r.hour_of_day): (
                r.n,
                r.seasonal_mean,
                r.within_sd,
                r.seasonal_index,
            )
            for r in ts_seasonal_profile(spark, "unused").collect()
        }
    finally:
        A.load = orig
    assert got == _py_seasonal(rows)


def test_seasonal_profile_plan_shape(spark, sf_dir):
    """One bucket aggregation + one window over the O(types×24)
    bucket table: ≤2 exchanges, no Python, and the window's
    aggregates are INTEGER sums (no order-dependent double
    accumulation anywhere)."""
    from data_pipeline_spark_spark.operators.analytics import (
        ts_seasonal_profile,
    )
    from data_pipeline_spark_spark.plans.analyze import (
        formatted_plan,
        shuffle_count,
    )

    df = ts_seasonal_profile(spark, sf_dir)
    plan = formatted_plan(df)
    assert "EvalPython" not in plan
    assert shuffle_count(df) <= 2
    assert df.count() <= 5 * 24


def test_seasonal_profile_contract(spark, sf_dir):
    """Decomposition identities on real data: the n-weighted mean of
    each type's seasonal indices is 1 (multiplicative factors are
    normalized by construction); within_sd is non-negative; every
    (type, hour) pair present in events appears exactly once."""
    from collections import defaultdict

    from data_pipeline_spark_spark.operators.analytics import (
        ts_seasonal_profile,
    )

    rows = ts_seasonal_profile(spark, sf_dir).collect()
    acc = defaultdict(lambda: [0.0, 0])
    seen = set()
    for r in rows:
        key = (r.event_type, r.hour_of_day)
        assert key not in seen
        seen.add(key)
        assert r.within_sd >= 0.0
        assert r.seasonal_index > 0.0
        acc[r.event_type][0] += r.n * r.seasonal_index
        acc[r.event_type][1] += r.n
    for g, (wsum, n) in acc.items():
        assert abs(wsum / n - 1.0) < 1e-9, g


# ---------------------------------------------------------------------------
# sim_search_filtered
# ---------------------------------------------------------------------------


def test_filtered_search_is_prefilter_not_postfilter(spark, sf_dir):
    """The capability's defining property: every returned neighbor
    shares its query's label (the filter is a hard constraint, not a
    re-rank), AND the result is NOT merely the unfiltered top-k
    with off-label rows dropped — at least one query must surface a
    same-label neighbor that brute-force top-k missed (which is
    exactly the recall a post-filter on fixed k forfeits)."""
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.similarity import (
        sim_search,
        sim_search_filtered,
    )

    labels = {
        r.vec_id: r.label
        for r in load(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    filt = sim_search_filtered(spark, sf_dir).collect()
    for r in filt:
        assert labels[r.neighbor_id] == labels[r.query_id]
        assert r.label == labels[r.neighbor_id]
    plain = {
        (r.query_id, r.neighbor_id) for r in sim_search(spark, sf_dir).collect()
    }
    extra = [
        r for r in filt if (r.query_id, r.neighbor_id) not in plain
    ]
    assert extra, "filtered search found nothing beyond post-filtering"


def test_filtered_search_plan_shape(spark, sf_dir):
    """Pre-filtering must fuse into the scoring stage: the same
    single broadcast join as sim_search (no extra exchange for the
    filter), no Python eval; per-query ranking windows over ≤
    corpus/labels candidates."""
    from data_pipeline_spark_spark.operators.similarity import (
        sim_search,
        sim_search_filtered,
    )
    from data_pipeline_spark_spark.plans.analyze import (
        formatted_plan,
        shuffle_count,
    )

    df = sim_search_filtered(spark, sf_dir)
    plan = formatted_plan(df)
    assert "EvalPython" not in plan
    assert shuffle_count(df) == shuffle_count(sim_search(spark, sf_dir))


# ---------------------------------------------------------------------------
# scalar_bitwise
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**40), max_value=2**40),
            st.integers(min_value=-(2**20), max_value=2**20),
            st.integers(min_value=0, max_value=2**20),  # shifted LEFT:
            # negative << diverges (DuckDB raises, Spark wraps) and is
            # deliberately outside the pinned surface
        ),
        min_size=1,
        max_size=30,
    )
)
def test_bitwise_matches_python(spark, rows):
    """Differential: the bitwise surface vs python's arbitrary-
    precision operators on non-negative int64 inputs — AND/OR/XOR,
    shifts, popcount, and two's-complement lowest-set-bit must agree
    exactly."""
    df = spark.createDataFrame(
        [(i, k, p, s) for i, (k, p, s) in enumerate(rows)],
        "idx long, k long, p long, s long",
    )
    got = {
        r.idx: (r.a, r.o, r.x, r.shl, r.shr, r.pc, r.low)
        for r in df.select(
            "idx",
            F.col("k").bitwiseAND(F.col("p")).alias("a"),
            F.col("k").bitwiseOR(F.col("s")).alias("o"),
            F.col("p").bitwiseXOR(F.col("s")).alias("x"),
            F.shiftleft("s", 4).alias("shl"),
            F.shiftright("k", 3).alias("shr"),
            F.bit_count("k").cast("long").alias("pc"),
            F.col("k").bitwiseAND(-F.col("k")).alias("low"),
        ).collect()
    }
    def pc(v):  # 64-bit two's-complement popcount
        return bin(v & 0xFFFFFFFFFFFFFFFF).count("1")

    want = {
        i: (k & p, k | s, p ^ s, s << 4, k >> 3, pc(k), k & -k)
        for i, (k, p, s) in enumerate(rows)
    }
    assert got == want


def test_bitwise_plan_shape(spark, sf_dir):
    """Pure projection: shuffle-free, no Python, single scan."""
    from data_pipeline_spark_spark.operators.scalars import scalar_bitwise
    from data_pipeline_spark_spark.plans.analyze import (
        formatted_plan,
        shuffle_count,
    )

    df = scalar_bitwise(spark, sf_dir)
    plan = formatted_plan(df)
    assert "EvalPython" not in plan
    assert shuffle_count(df) == 0


# ---------------------------------------------------------------------------
# sim_search_ivf_stats
# ---------------------------------------------------------------------------


def test_ivf_stats_contract(spark, sf_dir):
    """Index-audit identities: list sizes sum to the assigned corpus
    (every vector in exactly one cell); fractions sum to 1;
    imbalance_factor = k·max/N exactly and is ≥ 1; the report covers
    at most _IVFPQ_CELLS cells; and its sizes agree with an
    independent recount of the serving rung's own assignment."""
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.similarity import (
        _IVFPQ_CELLS,
        sim_search_ivf_stats,
    )

    rows = sim_search_ivf_stats(spark, sf_dir).collect()
    n_vecs = load(spark, sf_dir, "embeddings").count()
    total = sum(r.n_vectors for r in rows)
    assert total == n_vecs
    assert len(rows) <= _IVFPQ_CELLS
    assert abs(sum(r.frac for r in rows) - 1.0) < 1e-9
    k, mx = float(len(rows)), float(max(r.n_vectors for r in rows))
    want_imb = k * mx / float(total)
    for r in rows:
        assert r.imbalance_factor == want_imb
        assert r.frac == r.n_vectors / float(total)
    assert want_imb >= 1.0


def test_ivf_stats_plan_shape(spark, sf_dir):
    """Post-assignment work is k-row: one aggregate to cell counts,
    one global window over ≤16 rows; no Python eval."""
    from data_pipeline_spark_spark.operators.similarity import (
        sim_search_ivf_stats,
    )
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    df = sim_search_ivf_stats(spark, sf_dir)
    plan = formatted_plan(df)
    assert "EvalPython" not in plan
    assert df.count() <= 16


# ---------------------------------------------------------------------------
# corpus_pack_apply
# ---------------------------------------------------------------------------


def test_pack_apply_agrees_with_manifest(spark, sf_dir):
    """Content proves counts: the materialized sequences' token
    counts must equal the interval-arithmetic manifest's, sequence by
    sequence — two independent derivations (explicit token explode vs
    least/greatest overlap math) of the same packing."""
    from data_pipeline_spark_spark.operators.training_data import (
        corpus_pack_apply,
        corpus_pack_sequences,
    )

    applied = {
        r.seq_id: r.n_tokens for r in corpus_pack_apply(spark, sf_dir).collect()
    }
    manifest = {
        r.seq_id: r.n_tokens
        for r in corpus_pack_sequences(spark, sf_dir).collect()
    }
    assert applied == manifest


def test_pack_apply_token_stream_shuffles_once(spark, sf_dir):
    """The r11 VERDICT fix, pinned: the offsets join happens on the
    DOC-LEVEL array frame (below the posexplode Generate), so the
    exploded token stream meets exactly ONE exchange — the
    groupBy(seq_id) hash partitioning. Before the fix the plan joined
    offsets onto the exploded stream, which relied on AQE broadcasting
    a doc-count table and degraded to a second token-proportional
    shuffle at scale."""
    from data_pipeline_spark_spark.operators.training_data import (
        _pack_apply_plan,
    )
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    t, out = _pack_apply_plan(spark, sf_dir)
    try:
        plan = formatted_plan(out)
    finally:
        t.unpersist()
    tree = plan.split("\n\n", 1)[0].splitlines()
    gen_rows = [i for i, ln in enumerate(tree) if " Generate (" in ln]
    assert len(gen_rows) == 1, tree  # one posexplode in the plan
    gen = gen_rows[0]
    # tree prints downstream-first: every line ABOVE the Generate is
    # after the explode; exactly one Exchange may live there (seq_id)
    downstream_exchanges = [
        ln for ln in tree[:gen] if " Exchange (" in ln
    ]
    assert len(downstream_exchanges) == 1, tree
    # and that one exchange is the seq_id group-by partitioning
    import re

    m = re.search(r" Exchange \((\d+)\)", downstream_exchanges[0])
    detail = plan.split(f"({m.group(1)}) Exchange", 1)[1]
    assert "hashpartitioning(seq_id" in detail.split("\n\n", 1)[0], plan
    # the offsets join is BELOW the explode (doc-level rows)
    join_rows = [
        i
        for i, ln in enumerate(tree)
        if "Join" in ln and i > gen
    ]
    assert join_rows, tree


def test_pack_apply_digests_are_real(spark, sf_dir):
    """Every sequence digest is a distinct md5 over exactly the
    context-length token stream (duplicate digests would mean the
    assembly collapsed sequences); no Python in the plan; the result
    is checkpointed (no LocalTableScan round-trip)."""
    from data_pipeline_spark_spark.operators.training_data import (
        _SEQ_TOKENS,
        corpus_pack_apply,
    )
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    df = corpus_pack_apply(spark, sf_dir)
    plan = formatted_plan(df)
    assert "LocalTableScan" not in plan
    rows = sorted(df.collect(), key=lambda r: r.seq_id)
    digests = [r.seq_md5 for r in rows]
    assert len(set(digests)) == len(digests)
    for r in rows[:-1]:
        assert r.n_tokens == _SEQ_TOKENS
    assert all(len(d) == 32 for d in digests)

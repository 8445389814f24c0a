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

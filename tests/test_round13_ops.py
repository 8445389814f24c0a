"""Round-13 additions: dedup_bloom_incremental (the corpus-as-Bloom
incremental path — r12 VERDICT ask 3) and corpus_pack_bins (first-
fit-decreasing bin packing — ask 4). Standard trio per key:
a differential against an exact/python reference, plan-shape guards
(no corpus-row join for the bloom path; no Python eval anywhere),
and semantic contracts independent of the DuckDB oracle.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# dedup_bloom_incremental — differential / plan / contract
# ---------------------------------------------------------------------------


def test_bloom_incremental_matches_exact_and_zero_fp(spark):
    """Differential at BOTH pytest SFs (sf0.001 + the driver's
    grading SF sf0.01): the Bloom-filter admission equals the exact
    anti-join row-for-row — i.e. false-positive drops are exactly 0
    on the fixture family, the condition the m/k sizing was chosen
    for (docs/SCALE.md round-13)."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        exact = sorted(
            tuple(r)
            for r in registry.QUERIES["dedup_incremental"](
                spark, sf
            ).collect()
        )
        bloom = sorted(
            tuple(r)
            for r in registry.QUERIES["dedup_bloom_incremental"](
                spark, sf
            ).collect()
        )
        dropped = set(exact) - set(bloom)
        assert dropped == set(), (
            f"false-positive drops at {sf}: {sorted(dropped)[:5]}"
        )
        assert bloom == exact


def test_bloom_incremental_plan_shape(spark, sf_dir):
    """The defining scale property: batch rows NEVER join corpus
    rows. The only joins are the sketch-side dense-fill broadcast
    and the one-row bitmap broadcast onto the batch scan; the only
    hashpartitioning exchange is the widx-keyed bit_or (bounded by
    m/64 words per task, not by corpus rows); no Python eval."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    registry.load_all()
    plan = formatted_plan(
        registry.QUERIES["dedup_bloom_incremental"](spark, sf_dir)
    )
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row bitmap
    assert "EvalPython" not in plan
    hash_ex = [
        ln
        for ln in plan.splitlines()
        if "hashpartitioning" in ln and "Arguments:" in ln
    ]
    assert len(hash_ex) == 1 and "widx" in hash_ex[0], hash_ex


def test_bloom_no_false_negatives_synthetic(spark):
    """Contract: Bloom filters cannot false-negative — every digest
    inserted at build time must probe positive. Build from 300
    synthetic digests, probe the same 300: all contained; and the
    bitmap's word frame never exceeds m/64 rows."""
    from data_pipeline_spark_spark.operators.corpus import (
        _BLOOM_M_WORDS,
        _bloom_positions,
        _bloom_probe_ok,
    )

    docs = spark.range(300).select(
        F.sha2(F.concat(F.lit("doc-"), F.col("id")), 256).alias("h")
    )
    h1m = F.xxhash64(F.col("h")).bitwiseAND(F.lit((1 << 47) - 1))
    h2m = F.xxhash64(F.col("h"), F.lit(1)).bitwiseAND(
        F.lit((1 << 31) - 1)
    )
    hashed = docs.select(h1m.alias("a"), h2m.alias("b"))
    positions = hashed.select(
        F.explode(
            F.array(*_bloom_positions(F.col("a"), F.col("b")))
        ).alias("pos")
    )
    from data_pipeline_spark_spark.operators.corpus import (
        _bloom_bit_mask,
    )

    words = (
        positions.select(
            (F.col("pos") / F.lit(64)).cast("int").alias("widx"),
            _bloom_bit_mask(F.col("pos")).alias("mask"),
        )
        .groupBy("widx")
        .agg(F.bit_or("mask").alias("bits"))
    )
    assert words.count() <= _BLOOM_M_WORDS
    dense = (
        spark.range(_BLOOM_M_WORDS)
        .select(F.col("id").cast("int").alias("widx"))
        .join(F.broadcast(words), "widx", "left")
        .select("widx", F.coalesce("bits", F.lit(0)).alias("bits"))
    )
    bf = dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("widx", "bits"))),
            lambda s: s["bits"],
        ).alias("bf")
    )
    contained = (
        hashed.crossJoin(F.broadcast(bf))
        .where(_bloom_probe_ok(F.col("bf"), F.col("a"), F.col("b")))
        .count()
    )
    assert contained == 300  # zero false negatives, by construction


# ---------------------------------------------------------------------------
# corpus_pack_bins — differential / plan / contract
# ---------------------------------------------------------------------------


def _py_ffd(items, L=512):
    """Literal python first-fit-decreasing: items = [(sz, doc_id)];
    returns (loads, n_docs, assignment) — loads/doc-counts per bin in
    creation order plus the 0-based bin id per doc in sorted order."""
    loads, nd, asg = [], [], []
    for sz, _ in sorted(items, key=lambda t: (-t[0], t[1])):
        for i, l in enumerate(loads):
            if l + sz <= L:
                loads[i] += sz
                nd[i] += 1
                asg.append(i)
                break
        else:
            loads.append(sz)
            nd.append(1)
            asg.append(len(loads) - 1)
    return loads, nd, asg


@settings(max_examples=10, deadline=None)
@given(
    sizes=st.lists(
        st.integers(min_value=1, max_value=700),
        min_size=1,
        max_size=60,
    )
)
def test_pack_bins_fold_matches_python_ffd(spark, sizes):
    """Differential: the Catalyst aggregate fold reproduces the
    python FFD bin-for-bin at arbitrary doc-size shapes — including
    oversize docs (> L) which must open singleton overflow bins."""
    from data_pipeline_spark_spark.operators.training_data import (
        _ffd_fold,
    )

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], "doc_id long, sz long"
    )
    arr = df.groupBy().agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (-F.col("sz")).alias("negsz"),
                    F.col("doc_id").alias("doc_id"),
                )
            )
        ).alias("ds")
    )
    [row] = arr.select(
        _ffd_fold(F.col("ds"), with_asg=True).alias("p")
    ).collect()
    exp_loads, exp_nd, exp_asg = _py_ffd(
        [(s, i) for i, s in enumerate(sizes)]
    )
    assert list(row.p.loads) == exp_loads
    assert list(row.p.nd) == exp_nd
    assert list(row.p.asg) == exp_asg  # doc→bin assignment, in order
    for sz in sizes:
        if sz > 512:  # oversize → its own bin, honest accounting
            assert sz in exp_loads


def test_pack_bins_plan_shape(spark, sf_dir):
    """ONE exchange (the grp shard), no Python eval, no join — the
    fold is a single whole-stage expression over per-shard arrays."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    registry.load_all()
    plan = formatted_plan(
        registry.QUERIES["corpus_pack_bins"](spark, sf_dir)
    )
    assert "EvalPython" not in plan
    assert "Join" not in plan
    ex = [
        ln
        for ln in plan.splitlines()
        if "Arguments: hashpartitioning" in ln
        or "Arguments: SinglePartition" in ln
    ]
    assert len(ex) == 1 and "grp" in ex[0], ex


def test_pack_bins_contract(spark, sf_dir):
    """Contracts on the fixture: every doc packed exactly once
    (Σ n_docs = |docs|, Σ used = Σ tokens); no bin over capacity
    (doc sizes ≤ L here, so no overflow bins); used + padding = L;
    FFD total bins ≤ unsorted first-fit total bins (the sort is
    what pays); and FFD padding ≥ concat-and-chunk's padding lower
    bound (concat splits docs; FFD buys split-freeness with
    padding — the report makes that price visible)."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.training_data import (
        _BIN_GROUPS,
        _SEQ_TOKENS,
    )

    registry.load_all()
    out = registry.QUERIES["corpus_pack_bins"](spark, sf_dir).collect()
    docs = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id", F.size(F.split("text", " ")).alias("sz")
        )
        .collect()
    )
    assert sum(r.n_docs for r in out) == len(docs)
    assert sum(r.used_tokens for r in out) == sum(d.sz for d in docs)
    for r in out:
        assert r.used_tokens <= _SEQ_TOKENS  # fixture docs ≤ L
        assert r.used_tokens + r.padding_tokens == _SEQ_TOKENS
        assert r.fill_ppm == r.used_tokens * 1_000_000 // _SEQ_TOKENS
    # FFD vs unsorted first-fit: the decreasing sort never loses on
    # this fixture (deterministic measurement, not a theorem)
    import collections

    byg = collections.defaultdict(list)
    for d in docs:
        byg[d.doc_id % _BIN_GROUPS].append((d.sz, d.doc_id))
    ff_bins = 0
    for gkey in byg:
        loads = []
        for sz, _ in sorted(byg[gkey], key=lambda t: t[1]):  # id order
            for i, l in enumerate(loads):
                if l + sz <= _SEQ_TOKENS:
                    loads[i] += sz
                    break
            else:
                loads.append(sz)
        ff_bins += len(loads)
    assert len(out) <= ff_bins
    # concat-and-chunk lower bound: ceil(total/L) bins, padding only
    # in the last chunk of each shard
    total_pad = sum(r.padding_tokens for r in out)
    concat_pad = sum(
        -sum(s for s, _ in byg[g]) % _SEQ_TOKENS for g in byg
    )
    assert total_pad >= concat_pad


def test_bloom_verified_exact_under_adversarial_fp(spark):
    """The two-phase key's defining property: with a DELIBERATELY
    undersized bloom (m = 1024 bits for ~400 corpus digests → the
    filter false-positives massively), the verified output still
    equals the exact anti-join — and the test proves the rescue
    path actually fired (the pure-bloom admission at that m is
    strictly smaller than the exact answer)."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.corpus import (
        _bloom_frame,
        _bloom_hash_cols,
        _bloom_incremental_verified_of,
        _bloom_probe_ok,
    )

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    d = load(spark, sf, "documents")
    exact = sorted(
        tuple(r)
        for r in registry.QUERIES["dedup_incremental"](
            spark, sf
        ).collect()
    )
    tiny_m = 1024
    got = sorted(
        tuple(r)
        for r in _bloom_incremental_verified_of(
            d, spark, tiny_m
        ).collect()
    )
    assert got == exact
    # prove the bloom was genuinely lossy at this m: the unverified
    # admission misses rows the exact answer keeps
    h1m, h2m = _bloom_hash_cols()
    corpus = (
        d.filter(F.col("doc_id") % 10 < 8)
        .select(F.sha2("text", 256).alias("h"))
        .select(h1m.alias("a"), h2m.alias("b"))
    )
    bf = _bloom_frame(spark, corpus, tiny_m)
    pure = (
        d.filter(F.col("doc_id") % 10 >= 8)
        .select(
            "doc_id", "lang", "source",
            F.sha2("text", 256).alias("h"),
        )
        .select(
            "doc_id", "lang", "source",
            h1m.alias("a"), h2m.alias("b"),
        )
        .crossJoin(F.broadcast(bf))
        .where(
            ~_bloom_probe_ok(
                F.col("bf"), F.col("a"), F.col("b"), tiny_m
            )
        )
        .count()
    )
    assert pure < len(exact)  # FPs existed; verification rescued them


# ---------------------------------------------------------------------------
# graph_pagerank — differential / plan / contract
# ---------------------------------------------------------------------------


def _py_pagerank(sym_edges):
    """Pure-python replica of graph.pagerank_of's integer recurrence:
    the SAME floor divisions in the SAME nesting, so agreement is
    exact equality, not tolerance."""
    from collections import defaultdict

    from data_pipeline_spark_spark.operators.graph import (
        _PR_DAMP_PCT,
        _PR_ITERS,
        _PR_SCALE,
    )

    ow = defaultdict(int)
    for s, _, w in sym_edges:
        ow[s] += w
    nodes = sorted(ow)
    n = len(nodes)
    base = (15 * (_PR_SCALE // n)) // 100
    r = {v: _PR_SCALE // n for v in nodes}
    for _ in range(_PR_ITERS):
        contrib = defaultdict(int)
        for s, d, w in sym_edges:
            contrib[d] += (r[s] * w) // ow[s]
        r = {v: base + (_PR_DAMP_PCT * contrib[v]) // 100 for v in nodes}
    return r


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=1, max_value=5),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_pagerank_fold_matches_python(spark, raw):
    """Hypothesis differential: pagerank_of on an arbitrary weighted
    undirected graph equals the pure-python integer recurrence
    EXACTLY (bigint micro-units, no tolerance)."""
    from data_pipeline_spark_spark.operators.graph import pagerank_of

    undirected = {}
    for a, b, w in raw:
        if a == b:
            continue
        lo, hi = min(a, b), max(a, b)
        undirected[(lo, hi)] = undirected.get((lo, hi), 0) + w
    if not undirected:
        return
    sym = [(a, b, w) for (a, b), w in undirected.items()]
    sym += [(b, a, w) for (a, b), w in undirected.items()]
    df = spark.createDataFrame(sym, "src long, dst long, w long")
    got = {r["id"]: r["r"] for r in pagerank_of(df).collect()}
    assert got == _py_pagerank(sym)


def test_pagerank_plan_shape(spark, sf_dir):
    """The iteration loop stays JVM-side and join-based: no Python
    eval, no cartesian/nested-loop blowup anywhere in the five
    unrolled rounds, and the final top-k is a TakeOrdered, not a
    global sort."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    registry.load_all()
    plan = formatted_plan(
        registry.QUERIES["graph_pagerank"](spark, sf_dir)
    )
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_pagerank_contract(spark, sf_dir):
    """Semantic contracts independent of the oracle: (1) rank mass
    is conserved up to floor-division dust — the full rank frame
    sums to SCALE within 0.1 % (each of the 5 rounds loses < 1 unit
    per edge to floors plus 15 %+85 % integer rounding); (2) the
    registered top-k is rank-descending with the part-key
    tie-break; (3) every rank is at least the teleport base."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.operators.graph import (
        _PR_SCALE,
        _PR_TOPK,
    )

    registry.load_all()
    top = registry.QUERIES["graph_pagerank"](spark, sf_dir).collect()
    assert 0 < len(top) <= _PR_TOPK
    ranks = [r["rank_micro"] for r in top]
    keys = [r["part_key"] for r in top]
    assert ranks == sorted(ranks, reverse=True)
    for i in range(len(top) - 1):
        if ranks[i] == ranks[i + 1]:
            assert keys[i] < keys[i + 1]

    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.graph import pagerank_of

    li = load(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    half = (
        items.alias("a")
        .join(items.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count("*").cast("bigint").alias("w"))
    )
    sym = half.unionByName(
        half.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    full = pagerank_of(sym).collect()
    mass = sum(r["r"] for r in full)
    n = len(full)
    base = (15 * (_PR_SCALE // n)) // 100
    assert _PR_SCALE * 0.999 <= mass <= _PR_SCALE
    assert all(r["r"] >= base for r in full)


# ---------------------------------------------------------------------------
# dq_constraints — differential / plan / contract
# ---------------------------------------------------------------------------


def test_dq_constraints_matches_pandas(spark, sf_dir):
    """Differential against an independent pandas computation of
    every violation count (no SQL in the reference path)."""
    import pandas as pd

    from data_pipeline_spark_spark import registry

    registry.load_all()
    got = {
        r["check_name"]: (r["violations"], r["passed"])
        for r in registry.QUERIES["dq_constraints"](
            spark, sf_dir
        ).collect()
    }
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    want = {
        "not_null_l_quantity": int(li["l_quantity"].isna().sum()),
        "unique_orderkey_linenumber": int(
            len(li) - len(li[["l_orderkey", "l_linenumber"]].drop_duplicates())
        ),
        "range_quantity_1_50": int(
            ((li["l_quantity"] < 1) | (li["l_quantity"] > 50)).sum()
        ),
        "accepted_values_returnflag": int(
            (~li["l_returnflag"].isin(["R", "A", "N"])).sum()
        ),
        "non_negative_extendedprice": int(
            (li["l_extendedprice"] < 0).sum()
        ),
        "shipdate_in_window": int(
            (
                (li["l_shipdate"] < pd.Timestamp("1992-01-01"))
                | (li["l_shipdate"] >= pd.Timestamp("2000-01-01"))
            ).sum()
        ),
        "ref_orderkey_in_orders": int(
            (~li["l_orderkey"].isin(orders["o_orderkey"])).sum()
        ),
    }
    assert {k: v for k, (v, _) in got.items()} == want
    assert all(p == (v == 0) for v, p in got.values())


def test_dq_constraints_plan_shape(spark, sf_dir):
    """The six value constraints fold into one scan: Catalyst's
    single-distinct rewrite stacks the PK-grouped partial aggregate
    under the final fold (4 HashAggregate levels, no second lineitem
    scan for the distinct), referential integrity is a LEFT ANTI
    join on the key column only, and nothing drops to Python."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    registry.load_all()
    plan = formatted_plan(
        registry.QUERIES["dq_constraints"](spark, sf_dir)
    )
    assert "EvalPython" not in plan
    assert plan.count("HashAggregate") >= 4
    assert "LeftAnti" in plan
    import re

    # formatted output names each scan twice (tree + detail header);
    # count the detail headers: 1 lineitem agg + 1 lineitem anti-join
    # side + 1 orders = 3 logical scans, none duplicated for distinct
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, re.MULTILINE)
    assert len(scans) <= 3, f"{len(scans)} scans"


def test_dq_constraints_contract(spark, sf_dir):
    """Both verdict branches are real on the fixture: at least one
    passing and at least one failing constraint (a gate that can
    only pass tests nothing); counts are non-negative; all seven
    constraint classes are present exactly once."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    rows = registry.QUERIES["dq_constraints"](spark, sf_dir).collect()
    names = [r["check_name"] for r in rows]
    assert len(names) == 7 and len(set(names)) == 7
    assert all(r["violations"] >= 0 for r in rows)
    verdicts = {r["passed"] for r in rows}
    assert verdicts == {True, False}


# ---------------------------------------------------------------------------
# agg_ddsketch_quantile — differential / plan / contract
# ---------------------------------------------------------------------------


def test_ddsketch_relative_error_bound(spark, sf_dir):
    """The DDSketch guarantee, checked against exact order
    statistics computed independently in pandas: every estimate is
    within gamma^1/2 - 1 (±1% at gamma = 1.02) of the true
    ceil(q·n/100)-th value, plus a micro-ln rounding epsilon."""
    import math

    import pandas as pd

    from data_pipeline_spark_spark import registry

    registry.load_all()
    got = registry.QUERIES["agg_ddsketch_quantile"](
        spark, sf_dir
    ).collect()
    assert got, "empty sketch output"
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["mv"] = (ev["value"] * 1000).round().astype("int64")
    tol = math.sqrt(1.02) - 1 + 1e-4
    for r in got:
        vals = sorted(
            ev.loc[ev["event_type"] == r["event_type"], "mv"]
        )
        n = len(vals)
        true_mv = vals[-(-r["q"] * n // 100) - 1]  # ceil rank, 1-based
        rel = abs(r["est_value"] * 1000 - true_mv) / true_mv
        assert rel <= tol, (
            f"{r['event_type']} p{r['q']}: est {r['est_value']*1000:.1f}"
            f" vs true {true_mv} (rel {rel:.4f})"
        )


def test_ddsketch_mergeable_cellwise(spark, sf_dir):
    """Two disjoint halves' grids, summed cell-wise, equal the full
    build exactly — the property that lets every executor fold its
    partition independently and rollups merge by addition."""
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.scale_patterns import (
        ddsketch_cells_of,
    )

    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 1000).cast("bigint").alias("mv"),
        "event_id",
    )
    full = {
        (r["event_type"], r["b"]): r["c"]
        for r in ddsketch_cells_of(e.drop("event_id")).collect()
    }
    lo = ddsketch_cells_of(
        e.filter(F.col("event_id") % 2 == 0).drop("event_id")
    ).collect()
    hi = ddsketch_cells_of(
        e.filter(F.col("event_id") % 2 == 1).drop("event_id")
    ).collect()
    merged: dict = {}
    for r in [*lo, *hi]:
        k = (r["event_type"], r["b"])
        merged[k] = merged.get(k, 0) + r["c"]
    assert merged == full


def test_ddsketch_plan_shape(spark, sf_dir):
    """One event-proportional exchange only: the cells groupBy is
    partially aggregated map-side BEFORE its exchange; the window
    and quantile probe run over the cells frame; events is scanned
    once; nothing drops to Python."""
    import re

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    registry.load_all()
    plan = formatted_plan(
        registry.QUERIES["agg_ddsketch_quantile"](spark, sf_dir)
    )
    assert "EvalPython" not in plan
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, re.MULTILINE)
    assert len(scans) == 1, f"{len(scans)} scans"
    assert "partial_count" in plan  # map-side combine under the fold


# ---------------------------------------------------------------------------
# graph_triangle_count — differential / plan / contract
# ---------------------------------------------------------------------------


def _py_triangles(edges):
    """Brute-force per-node triangle counts from an undirected edge
    set (frozenset pairs) — independent of any orientation trick."""
    from collections import defaultdict
    from itertools import combinations

    nbr = defaultdict(set)
    for a, b in edges:
        nbr[a].add(b)
        nbr[b].add(a)
    cnt = defaultdict(int)
    for v in nbr:
        for a, b in combinations(sorted(nbr[v]), 2):
            if v < a and b in nbr[a]:
                for x in (v, a, b):
                    cnt[x] += 1
    return dict(cnt)


@settings(max_examples=15, deadline=None)
@given(
    st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=11),
            st.integers(min_value=0, max_value=11),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_triangle_fold_matches_python(spark, raw):
    """Hypothesis differential: the degree-oriented 3-join count
    equals a brute-force neighbor-set intersection on arbitrary
    graphs — exactly, per node."""
    from data_pipeline_spark_spark.operators.graph import (
        triangle_counts_of,
    )

    edges = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    if not edges:
        return
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {
        r["part_key"]: r["triangles"]
        for r in triangle_counts_of(df).collect()
    }
    assert got == _py_triangles(edges)


def test_triangle_known_shapes(spark):
    """Closed-form contracts: K4 has 4 triangles with every vertex
    in exactly 3; adding a pendant vertex changes nothing; a
    4-cycle (no chord) has none."""
    from data_pipeline_spark_spark.operators.graph import (
        triangle_counts_of,
    )

    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 9)]
    got = {
        r["part_key"]: r["triangles"]
        for r in triangle_counts_of(
            spark.createDataFrame(k4, "src long, dst long")
        ).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    c4 = [(0, 1), (1, 2), (2, 3), (0, 3)]
    assert (
        triangle_counts_of(
            spark.createDataFrame(c4, "src long, dst long")
        ).count()
        == 0
    )


def test_triangle_plan_shape(spark, sf_dir):
    """Equi-joins only (the orientation makes the closure a plain
    two-column equality), no Python, no cartesian product, top-k as
    TakeOrdered."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    registry.load_all()
    plan = formatted_plan(
        registry.QUERIES["graph_triangle_count"](spark, sf_dir)
    )
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# abtest_welch_ttest — differential / plan / contract
# ---------------------------------------------------------------------------


def test_abtest_matches_python_welch(spark, sf_dir):
    """Differential against an independent pandas/python Welch
    computation over the same milli-unit integers."""
    import math

    import pandas as pd

    from data_pipeline_spark_spark import registry

    registry.load_all()
    got = {
        r["event_type"]: r
        for r in registry.QUERIES["abtest_welch_ttest"](
            spark, sf_dir
        ).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["x"] = (ev["value"] * 1000).round().astype("int64")
    ev["arm"] = ev["user_id"] % 2
    for et, g in ev.groupby("event_type"):
        a0 = g.loc[g["arm"] == 0, "x"]
        a1 = g.loc[g["arm"] == 1, "x"]
        if len(a0) <= 1 or len(a1) <= 1:
            assert et not in got
            continue
        n0, n1 = len(a0), len(a1)
        s0, s1 = int(a0.sum()), int(a1.sum())
        ss0, ss1 = int((a0**2).sum()), int((a1**2).sum())
        v0 = (n0 * ss0 - s0 * s0) / (n0 * (n0 - 1))
        v1 = (n1 * ss1 - s1 * s1) / (n1 * (n1 - 1))
        t = (s1 / n1 - s0 / n0) / math.sqrt(v1 / n1 + v0 / n0)
        r = got[et]
        assert (r["n_control"], r["n_treatment"]) == (n0, n1)
        assert abs(r["mean_control"] - s0 / (1000.0 * n0)) < 1e-9
        assert abs(r["t_welch"] - t) < 1e-9 * max(1.0, abs(t))


def test_abtest_plan_shape(spark, sf_dir):
    """One scan, one map-side-combined aggregate exchange (shuffle
    carries six longs per event type), no Python."""
    import re

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    registry.load_all()
    plan = formatted_plan(
        registry.QUERIES["abtest_welch_ttest"](spark, sf_dir)
    )
    assert "EvalPython" not in plan
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, re.MULTILINE)
    assert len(scans) == 1
    assert "partial" in plan.lower()
    ex = re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE)
    assert len(ex) <= 2, ex  # agg exchange (+ the final orderBy range)


def test_abtest_arm_swap_negates_t(spark, sf_dir):
    """Contract: relabeling the arms (user_id % 2 -> 1 - arm) exactly
    negates the t-statistic and swaps the arm columns — the readout
    is symmetric, with no hidden directional bias."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.analytics import (
        abtest_welch_ttest,
    )

    registry.load_all()
    base = {
        r["event_type"]: r
        for r in abtest_welch_ttest(spark, sf_dir).collect()
    }
    e = load(spark, sf_dir, "events").withColumn(
        "user_id", F.col("user_id") + 1
    )
    # +1 flips the parity of every user_id, i.e. swaps the arms
    import data_pipeline_spark_spark.catalog as cat

    orig = cat.load
    try:
        cat.load = lambda sp, sf, name, _e=e, _o=orig: (
            _e if name == "events" else _o(sp, sf, name)
        )
        import data_pipeline_spark_spark.operators.analytics as an

        orig_an = an.load
        an.load = cat.load
        try:
            swapped = {
                r["event_type"]: r
                for r in abtest_welch_ttest(spark, sf_dir).collect()
            }
        finally:
            an.load = orig_an
    finally:
        cat.load = orig
    assert set(base) == set(swapped)
    for et in base:
        b, s = base[et], swapped[et]
        assert (s["n_control"], s["n_treatment"]) == (
            b["n_treatment"],
            b["n_control"],
        )
        assert abs(s["t_welch"] + b["t_welch"]) < 1e-12


# ---------------------------------------------------------------------------
# stream_ddsketch — convergence / state bound
# ---------------------------------------------------------------------------


def test_stream_ddsketch_converges_to_batch(spark, sf_dir):
    """The streaming grid served through the shared ddsketch_serve
    path equals the batch sketch row-for-row; the operator itself
    raises if streaming state exceeds the value-domain bound, so a
    green run IS the bound proof."""
    from data_pipeline_spark_spark.operators.scale_patterns import (
        agg_ddsketch_quantile,
    )
    from data_pipeline_spark_spark.operators.streaming_batch import (
        stream_ddsketch,
    )

    got = {
        (r.event_type, r.q): (r.bucket, r.est_value)
        for r in stream_ddsketch(spark, sf_dir).collect()
    }
    want = {
        (r.event_type, r.q): (r.bucket, r.est_value)
        for r in agg_ddsketch_quantile(spark, sf_dir).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# mv_join_delta_refresh — differential / plan / contract
# ---------------------------------------------------------------------------


def test_mv_join_delta_equals_full_recompute(spark, sf_dir):
    """The IVM invariant checked without DuckDB: base ⊕ delta equals
    a from-scratch recompute of the join view, bit-for-bit (exact
    integer cents make merge == recompute associative)."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load

    registry.load_all()
    got = {
        (r["o_orderpriority"], r["ship_year"]): (
            r["n_items"],
            r["revenue_c"],
        )
        for r in registry.QUERIES["mv_join_delta_refresh"](
            spark, sf_dir
        ).collect()
    }
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    full = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderpriority",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
            )
            .cast("bigint")
            .alias("rev"),
        )
        .collect()
    )
    want = {
        (r["o_orderpriority"], r["ship_year"]): (r["n"], r["rev"])
        for r in full
    }
    assert got == want


def test_mv_join_delta_plan_shape(spark, sf_dir):
    """The recurring branch is cheap by construction: the cutoff
    predicate is PUSHED into the orders scans (both slices), the
    delta join is a broadcast, and nothing drops to Python."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    registry.load_all()
    plan = formatted_plan(
        registry.QUERIES["mv_join_delta_refresh"](spark, sf_dir)
    )
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    pushed = [
        ln
        for ln in plan.splitlines()
        if "PushedFilters" in ln and "o_orderdate" in ln
    ]
    assert len(pushed) >= 2, pushed


# ---------------------------------------------------------------------------
# skyline_pareto — differential / plan / contract
# ---------------------------------------------------------------------------


def _py_skyline(pts):
    """Literal O(n²) dominance check. pts = [(grp, cost, gain, id)]."""
    out = []
    for b in pts:
        dominated = any(
            a[0] == b[0]
            and a[1] <= b[1]
            and a[2] >= b[2]
            and (a[1] < b[1] or a[2] > b[2])
            for a in pts
        )
        if not dominated:
            out.append(b)
    return sorted(out)


@given(
    st.lists(
        st.tuples(
            st.integers(0, 1),   # group
            st.integers(0, 8),   # cost — small domain forces ties
            st.integers(0, 4),   # gain — ditto, incl. exact duplicates
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=25, deadline=None)
def test_skyline_sweep_matches_python(spark, raw):
    """Differential: the one-window plane-sweep equals the literal
    O(n²) dominance filter on arbitrary point sets — equal-cost
    ties, equal-gain ties, and exact duplicates included (duplicates
    dominate nothing: all copies stay)."""
    from data_pipeline_spark_spark.operators.analytics import skyline_2d

    pts = [(g, c, gn, i) for i, (g, c, gn) in enumerate(raw)]
    df = spark.createDataFrame(
        pts, "grp int, cost long, gain int, id long"
    )
    got = sorted(
        (r.grp, r.cost, r.gain, r.id)
        for r in skyline_2d(df, "grp", "cost", "gain").collect()
    )
    assert got == _py_skyline(pts)


def test_skyline_plan_shape(spark, sf_dir):
    """The scale claim: NO self-join, ONE exchange (hashpartitioning
    on brand) feeding one sort + window — dominance as two frame
    maxima, linear after the sort, vs the oracle's quadratic
    NOT EXISTS."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    registry.load_all()
    plan = formatted_plan(registry.QUERIES["skyline_pareto"](spark, sf_dir))
    assert "Join" not in plan
    assert "EvalPython" not in plan
    assert "Window" in plan
    ex = [
        ln
        for ln in plan.splitlines()
        if "Arguments: hashpartitioning" in ln
        or "Arguments: SinglePartition" in ln
    ]
    assert len(ex) == 1 and "brand" in ex[0], ex


def test_skyline_contract(spark, sf_dir):
    """Skyline closure on the fixture: (a) skyline rows are mutually
    non-dominated; (b) EVERY excluded part is dominated by some
    skyline part of its brand (dominance is transitive, so a
    skyline-side witness always exists); (c) per brand the skyline
    is a strict staircase — prices strictly increase with strictly
    increasing sizes once duplicates collapse."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    sky = registry.QUERIES["skyline_pareto"](spark, sf_dir).collect()
    from data_pipeline_spark_spark.catalog import load as _load

    allp = [
        (r.brand, r.price_cents, r.size, r.part_key)
        for r in _load(spark, sf_dir, "part")
        .select(
            F.col("p_brand").alias("brand"),
            F.round(F.col("p_retailprice") * 100)
            .cast("bigint")
            .alias("price_cents"),
            F.col("p_size").cast("int").alias("size"),
            F.col("p_partkey").alias("part_key"),
        )
        .collect()
    ]
    skyset = {(r.brand, r.price_cents, r.size, r.part_key) for r in sky}

    def dominates(a, b):
        return (
            a[0] == b[0]
            and a[1] <= b[1]
            and a[2] >= b[2]
            and (a[1] < b[1] or a[2] > b[2])
        )

    for b in skyset:  # (a) mutually non-dominated
        assert not any(dominates(a, b) for a in skyset if a != b)
    by_brand = {}
    for a in skyset:
        by_brand.setdefault(a[0], []).append(a)
    for b in allp:  # (b) closure: a skyline witness dominates every reject
        if b not in skyset:
            assert any(dominates(a, b) for a in by_brand[b[0]]), b
    for brand, rows in by_brand.items():  # (c) staircase
        stair = sorted({(p, s) for _, p, s, _ in rows})
        for (p1, s1), (p2, s2) in zip(stair, stair[1:]):
            assert p2 > p1 and s2 > s1, (brand, (p1, s1), (p2, s2))


# ---------------------------------------------------------------------------
# graph_label_propagation — differential / plan / contract
# ---------------------------------------------------------------------------


def _py_lpa(sym, iters=3):
    """Literal synchronous weighted LPA. sym = [(src, dst, w)] with
    both directions present. Returns {node: label}."""
    nodes = sorted({s for s, _, _ in sym})
    lab = {v: v for v in nodes}
    for _ in range(iters):
        votes = {}
        for s, d, w in sym:
            votes.setdefault(d, {}).setdefault(lab[s], 0)
            votes[d][lab[s]] += w
        lab = {
            d: min(
                (l for l, v in vs.items() if v == max(vs.values())),
            )
            for d, vs in votes.items()
        }
    return lab


@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9), st.integers(1, 3)),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=15, deadline=None)
def test_lpa_loop_matches_python(spark, raw):
    """Differential: the DataFrame LPA loop equals the literal
    synchronous weighted vote at arbitrary multigraph shapes
    (parallel edges collapse by summed weight, self-loops allowed —
    the vote sum treats both exactly like the python fold)."""
    from data_pipeline_spark_spark.operators.graph import lpa_of

    half = [(min(a, b), max(a, b), w) for a, b, w in raw if a != b]
    if not half:
        return
    agg = {}
    for s, d, w in half:
        agg[(s, d)] = agg.get((s, d), 0) + w
    sym = [(s, d, w) for (s, d), w in agg.items()]
    sym += [(d, s, w) for (s, d), w in agg.items()]
    df = spark.createDataFrame(sym, "src long, dst long, w long")
    got = {r.id: r.label for r in lpa_of(df).collect()}
    assert got == _py_lpa(sym)


def test_lpa_known_shapes(spark):
    """Two triangles joined by one weak bridge: each triangle's
    members converge to that triangle's min label; the bridge does
    not bleed labels across (in-triangle weight 2 beats bridge 1)."""
    from data_pipeline_spark_spark.operators.graph import lpa_of

    tri1 = [(0, 1), (0, 2), (1, 2)]
    tri2 = [(10, 11), (10, 12), (11, 12)]
    half = [(s, d, 2) for s, d in tri1 + tri2] + [(2, 10, 1)]
    sym = half + [(d, s, w) for s, d, w in half]
    df = spark.createDataFrame(sym, "src long, dst long, w long")
    got = {r.id: r.label for r in lpa_of(df).collect()}
    assert {got[0], got[1], got[2]} == {0}
    assert {got[10], got[11], got[12]} == {10}


def test_lpa_plan_and_contract(spark, sf_dir):
    """Plan: no Python eval, no cartesian; per-round joins are hash
    joins on integer keys. Contract on the fixture: communities
    partition the co-order node set (Σ n_members over ALL
    communities = |V|), every community label IS a member node id,
    and the returned top-k is consistent under re-aggregation."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load as _load
    from data_pipeline_spark_spark.operators.graph import (
        _co_order_edges,
        lpa_of,
    )
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    registry.load_all()
    df = registry.QUERIES["graph_label_propagation"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "EvalPython" not in plan
    assert "Cartesian" not in plan

    half = _co_order_edges(_load(spark, sf_dir, "lineitem")).select(
        "src", "dst", "w"
    )
    sym = half.unionByName(
        half.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    final = lpa_of(sym).collect()
    n_nodes = sym.select("src").distinct().count()
    assert len(final) == n_nodes  # every node labeled exactly once
    members = {r.id for r in final}
    for r in final:
        assert r.label in members  # labels are node ids
    top = df.collect()
    sizes = {}
    for r in final:
        sizes[r.label] = sizes.get(r.label, 0) + 1
    want = sorted(
        ((n, c) for c, n in sizes.items()),
        key=lambda t: (-t[0], t[1]),
    )[: len(top)]
    assert [(r.n_members, r.community) for r in top] == want


# ---------------------------------------------------------------------------
# dedup_minhash_incremental — differential / plan / contract
# ---------------------------------------------------------------------------


def test_minhash_incremental_candidates_are_cross_only(spark, sf_dir):
    """Structure: every candidate pair is (corpus, batch) — the key
    never proposes corpus x corpus or batch x batch work — and the
    candidate set is a superset of the exact cross near-dups
    (recall == total, the driver contract, asserted here without
    DuckDB via the shared jaccard_pairs harness)."""
    from data_pipeline_spark_spark.catalog import load as _load
    from data_pipeline_spark_spark.operators.dedup import (
        jaccard_pairs,
        minhash_incremental_pairs,
    )

    d = _load(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 < 8)
    batch = d.filter(F.col("doc_id") % 10 >= 8)
    cand = minhash_incremental_pairs(corpus, batch).collect()
    for r in cand:
        assert r.doc_corpus % 10 < 8 and r.doc_batch % 10 >= 8
    cand_set = {(r.doc_corpus, r.doc_batch) for r in cand}
    exact = jaccard_pairs(d).collect()
    for r in exact:
        a_batch, b_batch = r.doc_a % 10 >= 8, r.doc_b % 10 >= 8
        if a_batch != b_batch:
            pair = (
                (r.doc_b, r.doc_a) if a_batch else (r.doc_a, r.doc_b)
            )
            assert pair in cand_set, pair


def test_minhash_incremental_plan_shape(spark, sf_dir):
    """The probe join moves band keys + 32-long signatures, never
    text: no text column survives into the join inputs, and no
    Python eval anywhere. The shared-signature claim is structural:
    both sides route through minhash_band_keys (asserted by the
    module graph, not the plan)."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load as _load
    from data_pipeline_spark_spark.operators.dedup import (
        minhash_incremental_pairs,
    )
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    registry.load_all()
    d = _load(spark, sf_dir, "documents")
    pairs = minhash_incremental_pairs(
        d.filter(F.col("doc_id") % 10 < 8),
        d.filter(F.col("doc_id") % 10 >= 8),
    )
    plan = formatted_plan(pairs)
    assert "EvalPython" not in plan
    join_lines = [ln for ln in plan.splitlines() if "Join" in ln]
    assert join_lines and all("text" not in ln for ln in join_lines)


def test_minhash_incremental_batch_signature_parity(spark, sf_dir):
    """The index-probe invariant: signatures computed for the batch
    slice ALONE equal the same docs' signatures computed over the
    full corpus — subsetting cannot change a doc's MinHash (it only
    depends on the doc's own shingles), so an append-only corpus
    index stays valid as batches arrive."""
    from data_pipeline_spark_spark.catalog import load as _load
    from data_pipeline_spark_spark.operators.dedup import (
        minhash_signatures,
    )

    d = _load(spark, sf_dir, "documents")
    whole = {
        r.doc_id: tuple(r.sig)
        for r in minhash_signatures(d).collect()
        if r.doc_id % 10 >= 8
    }
    alone = {
        r.doc_id: tuple(r.sig)
        for r in minhash_signatures(
            d.filter(F.col("doc_id") % 10 >= 8)
        ).collect()
    }
    assert whole == alone


def test_pack_bins_apply_consistent_with_manifest(spark, sf_dir):
    """The apply/manifest invariant: re-aggregating the doc→bin
    assignment reproduces the manifest EXACTLY (per (grp, bin):
    same doc count, same used tokens), every doc appears exactly
    once, and no assigned bin id falls outside the manifest."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load as _load

    registry.load_all()
    manifest = {
        (r.grp, r.bin_id): (r.n_docs, r.used_tokens)
        for r in registry.QUERIES["corpus_pack_bins"](
            spark, sf_dir
        ).collect()
    }
    apply_rows = registry.QUERIES["corpus_pack_bins_apply"](
        spark, sf_dir
    ).collect()
    n_docs = _load(spark, sf_dir, "documents").count()
    assert len(apply_rows) == n_docs
    assert len({r.doc_id for r in apply_rows}) == n_docs
    agg = {}
    for r in apply_rows:
        k = (r.grp, r.bin_id)
        assert k in manifest, k
        n, u = agg.get(k, (0, 0))
        agg[k] = (n + 1, u + r.sz_tokens)
    assert agg == manifest


# ---------------------------------------------------------------------------
# privacy_t_closeness — differential / plan / contract
# ---------------------------------------------------------------------------


def _py_t_emd_micro(class_counts, global_counts):
    """Literal ordinal-EMD in integer micro-units: counts are dicts
    quintile->count over k=1..5."""
    n_c = sum(class_counts.values())
    n = sum(global_counts.values())
    num = cum_c = cum_g = 0
    for k in range(1, 5):  # k <= 4: the m-1 interior boundaries
        cum_c += class_counts.get(k, 0)
        cum_g += global_counts.get(k, 0)
        num += abs(cum_c * n - cum_g * n_c)
    return (num * 1_000_000) // (4 * n_c * n)


def test_t_closeness_matches_python_emd(spark, sf_dir):
    """Differential without DuckDB: rebuild the class×quintile counts
    from the SAME shared helpers (qi_profiles + spend_quintiles_of)
    and check every class's t_emd_micro against the literal integer
    EMD fold."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load as _load
    from data_pipeline_spark_spark.operators.analytics import (
        qi_profiles,
        spend_quintiles_of,
    )

    registry.load_all()
    e = _load(spark, sf_dir, "events")
    qi = qi_profiles(e.select("user_id", "ts", "event_id", "event_type"))
    rows = qi.join(spend_quintiles_of(e), "user_id").collect()
    per_class, global_counts = {}, {}
    for r in rows:
        key = (r.cohort_week, r.activity_bucket, r.fav_type)
        per_class.setdefault(key, {})
        per_class[key][r.spend_quintile] = (
            per_class[key].get(r.spend_quintile, 0) + 1
        )
        global_counts[r.spend_quintile] = (
            global_counts.get(r.spend_quintile, 0) + 1
        )
    got = {
        (r.cohort_week, r.activity_bucket, r.fav_type): (
            r.class_size,
            r.t_emd_micro,
            r.close,
        )
        for r in registry.QUERIES["privacy_t_closeness"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(per_class)
    for key, counts in per_class.items():
        t = _py_t_emd_micro(counts, global_counts)
        assert got[key] == (sum(counts.values()), t, t <= 150_000), key


def test_t_closeness_known_shapes(spark):
    """Synthetic release: one quintile-balanced class (t = 0 — it IS
    the global distribution when all classes are balanced) and, in a
    second release, a fully-skewed singleton-quintile class whose
    integer EMD is computed by hand."""
    # balanced: two classes, each one user per quintile → global is
    # balanced too → every cumulative gap is 0.
    bal = {k: 1 for k in range(1, 6)}
    assert _py_t_emd_micro(bal, {k: 2 for k in range(1, 6)}) == 0
    # skewed: class = 5 users all in quintile 1, global = that class
    # plus a balanced 5-user class. n_c=5, n=10; global cum at
    # k=1..4 = 6,7,8,9; class cum = 5,5,5,5.
    # num = |5*10-6*5| + |50-35| + |50-40| + |50-45| = 20+15+10+5 = 50
    # t_micro = 50*1e6 // (4*5*10) = 250_000 → NOT close at 0.15.
    skew = {1: 5}
    glob = {1: 6, 2: 1, 3: 1, 4: 1, 5: 1}
    assert _py_t_emd_micro(skew, glob) == 250_000


def test_t_closeness_plan_and_bounds(spark, sf_dir):
    """Plan: no Python eval, no cartesian product (the 5-slot grid is
    an in-row explode, the global distribution a 5-row broadcast).
    Bounds: t_emd_micro ∈ [0, 1e6] for every class, and the triad's
    three audits report the SAME class keys (same release)."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    registry.load_all()
    df = registry.QUERIES["privacy_t_closeness"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0 <= r.t_emd_micro <= 1_000_000, r
    k_keys = {
        (r.cohort_week, r.activity_bucket, r.fav_type)
        for r in registry.QUERIES["privacy_k_anonymity"](
            spark, sf_dir
        ).collect()
    }
    t_keys = {
        (r.cohort_week, r.activity_bucket, r.fav_type) for r in rows
    }
    assert t_keys == k_keys


# ---------------------------------------------------------------------------
# ts_holt_forecast — differential / plan / contract
# ---------------------------------------------------------------------------


def _py_holt_recurrence(xs, alpha=0.5, beta=0.5):
    """Literal Holt recurrence (floats), seeded l=x0, b=x1-x0 —
    the textbook definition the truncated form approximates."""
    l, b = xs[0], xs[1] - xs[0]
    out = []
    for x in xs[1:]:
        l_new = alpha * x + (1 - alpha) * (l + b)
        b = beta * (l_new - l) + (1 - beta) * b
        l = l_new
        out.append((l, b, l + b))
    return out


@given(
    st.lists(
        st.integers(0, 10_000),  # centi-units: values 0..100.00
        min_size=24,
        max_size=48,
    )
)
@settings(max_examples=15, deadline=None)
def test_holt_truncation_tracks_recurrence(spark, raw):
    """Semantic contract: after the 16-lag warm-up the truncated
    dot-product tracks the textbook Holt recurrence within the
    spectral truncation bound (~0.707^16 of the value scale) —
    asserted on level AND one-step forecast for arbitrary bounded
    series."""
    from data_pipeline_spark_spark.operators.analytics import (
        _HOLT_CS,
        _HOLT_DS,
        _HOLT_L,
        _HOLT_S,
    )

    xs = [c / 100 for c in raw]
    rec = _py_holt_recurrence(xs)
    scale = max(xs) or 1.0
    for t in range(_HOLT_L - 1, len(xs)):
        lags = [raw[t - j] for j in range(_HOLT_L)]
        level = sum(
            w * x for w, x in zip(_HOLT_CS, lags)
        ) / (_HOLT_S * 100)
        fc = sum(
            (c + d) * x
            for c, d, x in zip(_HOLT_CS, _HOLT_DS, lags)
        ) / (_HOLT_S * 100)
        rl, rb, rf = rec[t - 1]
        # truncation + seeding differences both decay at 1/sqrt(2)
        # per lag; 5% of scale is ~10x the steady-state bound, room
        # for the seed transient on short series
        assert abs(level - rl) <= 0.05 * scale + 0.01, (t, level, rl)
        assert abs(fc - rf) <= 0.08 * scale + 0.01, (t, fc, rf)


def test_holt_constant_and_linear_series(spark):
    """Known shapes, via the registered weights: a constant series
    forecasts (nearly) itself — off only by the 0.41% truncation
    mass; a pure linear ramp's trend estimate matches the true slope
    within the same truncation band."""
    from data_pipeline_spark_spark.operators.analytics import (
        _HOLT_CS,
        _HOLT_DS,
        _HOLT_S,
    )

    c = 100_00  # constant 100.00 in centi-units
    level = sum(w * c for w in _HOLT_CS) / (_HOLT_S * 100)
    fc = sum((a + b) * c for a, b in zip(_HOLT_CS, _HOLT_DS)) / (
        _HOLT_S * 100
    )
    assert abs(level - 100.0) <= 0.5
    assert abs(fc - 100.0) <= 0.5
    slope = 7_00  # +7.00 per step, level 1000.00
    lags = [100_000 - j * slope for j in range(16)]  # x_{t-j}
    trend = sum(w * x for w, x in zip(_HOLT_DS, lags)) / (
        _HOLT_S * 100
    )
    # truncated trend = slope·(-Σ j·d_j) + level·Σ d_j: the residual
    # trend mass (~4% of slope) plus a LEVEL-proportional bias of
    # Σ d_j ≈ 0.0029 — both decay with L; bound each term honestly
    assert abs(trend - 7.0) <= 0.05 * 7.0 + 0.0035 * 1000.0


def test_holt_plan_shape_and_warmup(spark, sf_dir):
    """ONE Window over one user-keyed exchange (all 16 LAGs fused),
    no Python; and exactly the first 15 rows of every user's series
    are excluded (the declared warm-up)."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load as _load
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    registry.load_all()
    df = registry.QUERIES["ts_holt_forecast"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "EvalPython" not in plan
    assert plan.count(" Window") <= 2  # one Window node (+ header)
    ex = [
        ln
        for ln in plan.splitlines()
        if "Arguments: hashpartitioning" in ln
    ]
    assert len(ex) == 1 and "user_id" in ex[0], ex
    per_user_out = {
        r.user_id: r.n
        for r in df.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    per_user_in = {
        r.user_id: r.n
        for r in _load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for u, n in per_user_in.items():
        assert per_user_out.get(u, 0) == max(0, n - 15), u


# ---------------------------------------------------------------------------
# vocab_zipf_fit — differential / plan / contract
# ---------------------------------------------------------------------------


def test_zipf_fit_matches_python_ols(spark, sf_dir):
    """Differential without DuckDB: rebuild the per-lang ranked head
    from raw token counts in python (same rank tie-break), micro-nat
    the logs with the same single rounding, run a literal OLS, and
    compare slope/intercept/r² exactly (same IEEE op order)."""
    import math

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.catalog import load as _load

    registry.load_all()
    docs = _load(spark, sf_dir, "documents").select("lang", "text").collect()
    counts = {}
    for r in docs:
        for t in r.text.split(" "):
            counts.setdefault(r.lang, {})
            counts[r.lang][t] = counts[r.lang].get(t, 0) + 1
    want = {}
    for lang, cs in counts.items():
        head = sorted(cs.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
        pts = [
            (
                round(math.log(k + 1) * 1e6),
                round(math.log(cnt) * 1e6),
            )
            for k, (_, cnt) in enumerate(head)
        ]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        cov = float(n) * sxy - float(sx) * sy
        vx = float(n) * sxx - float(sx) * sx
        vy = float(n) * syy - float(sy) * sy
        slope = cov / vx if vx != 0.0 else None
        want[lang] = (
            n,
            (slope / 1.0) if slope is not None else None,
            (float(sy) - slope * float(sx)) / float(n) / 1e6,
            (cov * cov) / (vx * vy) if vx != 0.0 and vy != 0.0 else None,
        )
    got = {
        r.lang: (r.n_terms, r.zipf_slope, r.ln_intercept, r.r2)
        for r in registry.QUERIES["vocab_zipf_fit"](
            spark, sf_dir
        ).collect()
    }
    assert got == want


def test_zipf_known_power_law(spark):
    """A synthetic exact power law (cnt = 2^(20-k) for rank k) must
    fit... that's geometric, not Zipf — use cnt = round(1e6 / k):
    slope ≈ −1 with r² ≈ 1; and a CONSTANT-frequency vocabulary
    (flat head, the template-spam signature) fits slope = 0 with
    vy = 0 → r² NULL."""
    from data_pipeline_spark_spark.operators.relational import ols_fit
    import math

    pts = [
        (round(math.log(k) * 1e6), round(math.log(round(1e6 / k)) * 1e6))
        for k in range(1, 101)
    ]
    df = spark.createDataFrame(
        [("z", x, y) for x, y in pts], "g string, x long, y long"
    )
    [r] = ols_fit(df, slope_scale=1.0, intercept_scale=1e6).collect()
    assert abs(r.slope_per_hr - (-1.0)) < 1e-3
    assert r.r2 > 0.999999
    flat = spark.createDataFrame(
        [("f", round(math.log(k) * 1e6), round(math.log(500.0) * 1e6))
         for k in range(1, 101)],
        "g string, x long, y long",
    )
    [fr] = ols_fit(flat, slope_scale=1.0, intercept_scale=1e6).collect()
    assert fr.slope_per_hr == 0.0
    assert fr.r2 is None  # vy = 0: degenerate, NULL in both engines


def test_zipf_plan_shape(spark, sf_dir):
    """One corpus-proportional exchange (the (lang, token) count);
    the rank window partitions by lang (never a single global
    partition); no Python eval."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.plans.analyze import formatted_plan

    registry.load_all()
    plan = formatted_plan(
        registry.QUERIES["vocab_zipf_fit"](spark, sf_dir)
    )
    assert "EvalPython" not in plan
    assert "SinglePartition" not in plan or "Window" not in plan.split(
        "SinglePartition"
    )[0].splitlines()[-1]
    win_ex = [
        ln
        for ln in plan.splitlines()
        if "Arguments: hashpartitioning" in ln
    ]
    assert any("lang" in ln for ln in win_ex), win_ex

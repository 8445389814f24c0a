"""Round-16 additions: phash band-width auto-resolution (the r15
verdict's unwired scale knob) with a probe straddling the switch
threshold, and the dst-partitioned LPA loop."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_resolve_phash_bands_threshold():
    """Pure-arithmetic pin of the resolver: 8 bands up to exactly
    n = _PH_DENSITY·2^8/8 = 1600 items, 4 bands beyond, floor at 4
    forever (the 128-bit-hash note covers the far end)."""
    from data_pipeline_spark_spark.operators.multimodal import (
        _PH_DENSITY,
        resolve_phash_bands,
    )

    switch = _PH_DENSITY * (1 << 8) // 8
    assert switch == 1600
    assert resolve_phash_bands(1) == 8
    assert resolve_phash_bands(505) == 8  # the sf0.01 grading shape
    assert resolve_phash_bands(switch) == 8
    assert resolve_phash_bands(switch + 1) == 4
    assert resolve_phash_bands(50_000) == 4  # the sf1 cliff shape
    assert resolve_phash_bands(1_000_000) == 4


def test_phash_auto_band_switch_straddle(spark):
    """Straddling probe for the auto threshold (the r15 graph-cap
    lesson: a size-resolved plan switch gets evidence just below AND
    just above the switch point). Two populations bracketing the
    1600-item switch, drawn from the same fixture rows; on each
    side, the auto-resolved band join filtered to the COMMON
    certified radius (hamming ≤ 3) must equal the 8-band reference
    at that radius — the switch changes the plan and the certificate
    width, never which ≤3 pairs exist."""
    from data_pipeline_spark_spark.catalog import fan_out, load
    from data_pipeline_spark_spark.operators.multimodal import (
        _PH_CELLS,
        phash64,
        phash_near_dup_pairs,
        resolve_phash_bands,
    )

    # sf0.1 has ~5071 eligible items; slice two bracketing subsets.
    # Near-dups must exist INSIDE each subset, so plant companions
    # for the retained rows rather than relying on fixture ids.
    d = load(spark, "/root/testdata/sf0.1", "documents")
    base = (
        d.filter(F.expr(f"octet_length(encode(text, 'UTF-8')) >= {_PH_CELLS}"))
        .select("doc_id", "text")
        .orderBy("doc_id")
    )
    # totals: 1000 base → 1502 items (below 1600), 1100 → 1652
    # (above) — measured on the fixture, asserted below
    for n_base, want_bands in ((1000, 8), (1100, 4)):
        sub = base.limit(n_base)
        planted = sub.filter(F.col("doc_id") % 2 == 0).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.expr(
                "concat(substr(text, 1, length(text) div 4 - 1), 'Z',"
                " substr(text, length(text) div 4 + 1,"
                "        length(text) div 2 - length(text) div 4 - 1),"
                " 'Z', substr(text, length(text) div 2 + 1))"
            ).alias("text"),
        )
        pop = fan_out(sub.unionByName(planted)).withColumn(
            "payload", F.encode("text", "UTF-8")
        )
        bits = phash64(pop).localCheckpoint()
        n = bits.count()
        bands = resolve_phash_bands(n)
        assert bands == want_bands, (n, bands)
        auto = sorted(
            tuple(r)
            for r in phash_near_dup_pairs(bits, bands=bands)
            .filter("hamming <= 3")
            .collect()
        )
        ref = sorted(
            tuple(r)
            for r in phash_near_dup_pairs(bits, bands=8)
            .filter("hamming <= 3")
            .collect()
        )
        assert auto == ref and auto, (n, bands, len(auto), len(ref))


def test_phash_registered_keys_use_resolver(spark):
    """The REGISTERED keys route through the resolver (the r15 gap
    was exactly that the knob existed but nothing selected it): at
    the sf0.01 grading fixture the population is 505 items → 8
    bands, and the pair set matches the explicit 8-band call at the
    fixed semantic radius _PH_MAXH bit-for-bit (r16 self-review:
    the radius is scale-invariant — bands are a plan knob only)."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.operators.multimodal import (
        _ph_population,
        phash64,
        phash_near_dup_pairs,
    )

    registry.load_all()
    sf = "/root/testdata/sf0.01"
    got = sorted(
        tuple(r)
        for r in registry.QUERIES["multimodal_phash_near_dup"](
            spark, sf
        ).collect()
    )
    bits = phash64(_ph_population(spark, sf)).localCheckpoint()
    assert bits.count() == 505  # the documented grading shape
    from data_pipeline_spark_spark.operators.multimodal import _PH_MAXH

    want = sorted(
        tuple(r)
        for r in phash_near_dup_pairs(
            bits, bands=8, maxh=_PH_MAXH
        ).collect()
    )
    assert got == want and got


# ---------------------------------------------------------------------------
# round-16 new keys: geo / labels / z-test / rolling corr
# ---------------------------------------------------------------------------


def _events_pd(sf_dir):
    import duckdb

    return duckdb.connect().execute(
        f"SELECT * FROM '{sf_dir}/events.parquet'"
    ).fetchdf()


def test_geo_radius_join_matches_bruteforce(spark):
    """The grid join must equal the literal all-pairs scan — recall
    is structural (cell size = R ⇒ 3×3 covers the disc), so the
    differential is exact set equality, not approximate. Runs at
    sf0.01 (10k points, ~40 true pairs; sf0.001's 1k points have an
    expected pair count below 1 and would be vacuous); the reference
    is chunked-numpy all-pairs, ~1e8 integer distance compares."""
    import numpy as np

    from data_pipeline_spark_spark import registry

    registry.load_all()
    sf = "/root/testdata/sf0.01"
    got = sorted(
        tuple(r)
        for r in registry.QUERIES["geo_grid_radius_join"](
            spark, sf
        ).collect()
    )
    import hashlib

    ev = _events_pd(sf)
    M, R = 1_000_000, 500

    def h(i, salt):
        return (
            int(
                hashlib.md5(f"{i}{salt}".encode()).hexdigest()[:8], 16
            )
            % M
        )

    ids = ev["event_id"].to_numpy(dtype=np.int64)
    x = np.array([h(int(i), "/geo-x-v1") for i in ids], dtype=np.int64)
    y = np.array([h(int(i), "/geo-y-v1") for i in ids], dtype=np.int64)
    want = []
    for lo in range(0, len(ids), 1000):  # chunked O(n²) reference
        sl = slice(lo, lo + 1000)
        d2 = (x[sl, None] - x[None, :]) ** 2 + (y[sl, None] - y[None, :]) ** 2
        ia, ib = np.nonzero((d2 <= R * R) & (ids[sl, None] < ids[None, :]))
        want += [
            (int(ids[sl][a]), int(ids[b]), int(d2[a, b]))
            for a, b in zip(ia, ib)
        ]
    assert got == sorted(want) and got, (len(got), len(want))


def test_geo_radius_cell_boundary_contract(spark):
    """Pinned boundary geometry: a pair split across a cell border
    is found (the 3×3 argument), the exact R² distance is included
    (≤, not <), and a pair at R²+ε is excluded."""
    from data_pipeline_spark_spark.operators.geo import grid_radius_pairs

    pts = spark.createDataFrame(
        [
            (1, 499, 0),  # cell (0,0)
            (2, 501, 0),  # cell (1,0) — cross-cell, dist2 = 4
            (3, 0, 0),
            (4, 300, 400),  # dist2 vs 3 = 250000 = R² exactly
            (5, 0, 501),  # dist2 vs 3 = 251001 > R²
        ],
        "id long, x long, y long",
    )
    got = sorted(tuple(r) for r in grid_radius_pairs(pts, 500).collect())
    assert (1, 2, 4) in got
    assert (3, 4, 250000) in got
    assert not any(r[:2] == (3, 5) for r in got)


def _labels_py(ev, raters):
    cats = {"click": 0, "error": 1, "purchase": 2, "signup": 3, "view": 4}
    out = []
    for eid, et in zip(ev["event_id"], ev["event_type"]):
        eid = int(eid)
        cat = cats[et]
        labs = []
        for r in range(1, raters + 1):
            if (eid * 31 + r * 17) % 10 < 2:
                labs.append((cat + 1 + (eid + r) % 4) % 5)
            else:
                labs.append(cat)
        out.append(labs)
    return out


def test_label_cohens_kappa_differential(spark, sf_dir):
    """Literal-formula python re-derivation (the mandatory
    statistic-key differential): po/pe from raw confusion counts,
    κ = (po − pe)/(1 − pe) in floats — independent of the engines'
    integer-cleared form."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    row = registry.QUERIES["label_cohens_kappa"](spark, sf_dir).collect()[0]
    labs = _labels_py(_events_pd(sf_dir), 2)
    n = len(labs)
    po = sum(1 for a, b in labs if a == b) / n
    pe = sum(
        (sum(1 for a, _ in labs if a == j) / n)
        * (sum(1 for _, b in labs if b == j) / n)
        for j in range(5)
    )
    kappa = (po - pe) / (1 - pe)
    assert row.n_items == n
    assert abs(row.po - po) < 1e-12
    assert abs(row.kappa - kappa) < 1e-9
    assert 0.3 < row.kappa < 0.95  # non-vacuous: real chance correction


def test_label_fleiss_kappa_differential(spark, sf_dir):
    """Textbook Fleiss formula (P̄ and P̄_e as floats) against the
    engine's integer-cleared single division."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    row = registry.QUERIES["label_fleiss_kappa"](spark, sf_dir).collect()[0]
    labs = _labels_py(_events_pd(sf_dir), 3)
    n, m = len(labs), 3
    p_i = []
    cj = [0] * 5
    for ls in labs:
        nij = [ls.count(j) for j in range(5)]
        for j in range(5):
            cj[j] += nij[j]
        p_i.append((sum(v * v for v in nij) - m) / (m * (m - 1)))
    p_bar = sum(p_i) / n
    pe = sum((c / (n * m)) ** 2 for c in cj)
    kappa = (p_bar - pe) / (1 - pe)
    assert row.n_items == n and row.m == m
    assert abs(row.kappa - kappa) < 1e-9
    assert 0.3 < row.kappa < 0.95


def test_abtest_two_proportion_z_differential(spark, sf_dir):
    """Literal pooled z from user-grain pandas counts."""
    import math

    from data_pipeline_spark_spark import registry

    registry.load_all()
    row = registry.QUERIES["abtest_two_proportion_z"](
        spark, sf_dir
    ).collect()[0]
    ev = _events_pd(sf_dir)
    conv = (
        ev.assign(c=(ev["event_type"] == "purchase").astype(int))
        .groupby("user_id")["c"]
        .sum()
        .ge(14)
        .astype(int)
    )
    arms = conv.index % 2
    n_a, x_a = int((arms == 0).sum()), int(conv[arms == 0].sum())
    n_b, x_b = int((arms == 1).sum()), int(conv[arms == 1].sum())
    p = (x_a + x_b) / (n_a + n_b)
    z = (x_a / n_a - x_b / n_b) / math.sqrt(
        p * (1 - p) * (1 / n_a + 1 / n_b)
    )
    assert (row.n_a, row.x_a, row.n_b, row.x_b) == (n_a, x_a, n_b, x_b)
    assert abs(row.z - z) < 1e-9


def test_window_rolling_corr_differential(spark, sf_dir):
    """Pandas rolling(10).corr per user against the exact-integer
    window form; NULL exactly where a window series is constant."""
    import numpy as np
    import pandas as pd

    from data_pipeline_spark_spark import registry

    registry.load_all()
    got = (
        registry.QUERIES["window_rolling_corr"](spark, sf_dir)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    ev = _events_pd(sf_dir).sort_values(["user_id", "ts", "event_id"])
    ev["x"] = (ev["value"] * 100).round().astype("int64")
    ev["y"] = ev["props"].str.extract(r'"k": (\d+)').astype("int64")
    for uid, g in list(ev.groupby("user_id"))[:12]:
        # literal formula instead of pandas corr (ddof pitfalls):
        for w in range(len(g)):
            lo = max(0, w - 9)
            xs = g["x"].iloc[lo : w + 1].to_numpy(dtype=np.float64)
            ys = g["y"].iloc[lo : w + 1].to_numpy(dtype=np.float64)
            n = len(xs)
            num = n * (xs * ys).sum() - xs.sum() * ys.sum()
            dx = n * (xs * xs).sum() - xs.sum() ** 2
            dy = n * (ys * ys).sum() - ys.sum() ** 2
            eid = int(g["event_id"].iloc[w])
            have = got.loc[eid]
            assert have.n_w == n
            if dx == 0 or dy == 0:
                assert pd.isna(have["corr"])  # .corr is Series.corr()
            else:
                assert abs(have["corr"] - num / np.sqrt(dx * dy)) < 1e-9


# ---------------------------------------------------------------------------
# round-16 session 3: entropy / MI / KM survival / readability
# ---------------------------------------------------------------------------


def _seg_pri_pd(sf_dir):
    import pandas as pd

    o = pd.read_parquet(f"{sf_dir}/orders.parquet")[
        ["o_custkey", "o_orderpriority"]
    ]
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")[
        ["c_custkey", "c_mktsegment"]
    ]
    return o.merge(c, left_on="o_custkey", right_on="c_custkey")


def test_agg_entropy_profile_differential(spark, sf_dir):
    """Literal H = −Σ p·ln p in floats per segment — independent of
    the engines' micro-nat integer clearing (tolerance covers the
    ≤0.5e-6-per-term quantization)."""
    import math

    from data_pipeline_spark_spark import registry

    registry.load_all()
    rows = {
        r.seg: r
        for r in registry.QUERIES["agg_entropy_profile"](
            spark, sf_dir
        ).collect()
    }
    df = _seg_pri_pd(sf_dir)
    for seg, grp in df.groupby("c_mktsegment"):
        counts = grp["o_orderpriority"].value_counts()
        n = counts.sum()
        h = -sum((c / n) * math.log(c / n) for c in counts)
        r = rows[seg]
        assert r.n_rows == n and r.n_categories == len(counts)
        assert abs(r.entropy_nats - h) < 5e-6
        assert abs(r.norm_entropy - h / math.log(len(counts))) < 5e-6
        assert 0.0 < r.norm_entropy <= 1.0 + 1e-12


def test_agg_mutual_information_differential(spark, sf_dir):
    """Literal MI = Σ p_xy·ln(p_xy/(p_x·p_y)) plus both marginal
    entropies and NMI = MI/√(H_x·H_y), all in floats."""
    import math

    from data_pipeline_spark_spark import registry

    registry.load_all()
    row = registry.QUERIES["agg_mutual_information"](
        spark, sf_dir
    ).collect()[0]
    df = _seg_pri_pd(sf_dir)
    n = len(df)
    pxy = df.groupby(["c_mktsegment", "o_orderpriority"]).size() / n
    px = df.groupby("c_mktsegment").size() / n
    py = df.groupby("o_orderpriority").size() / n
    mi = sum(
        p * math.log(p / (px[x] * py[y])) for (x, y), p in pxy.items()
    )
    hx = -sum(p * math.log(p) for p in px)
    hy = -sum(p * math.log(p) for p in py)
    assert row.n == n
    assert abs(row.mi_nats - mi) < 5e-6
    assert abs(row.h_seg - hx) < 5e-6
    assert abs(row.h_pri - hy) < 5e-6
    assert abs(row.nmi - mi / math.sqrt(hx * hy)) < 5e-6
    # non-vacuous: MI bounded by both marginals, NMI in [0, 1]
    assert 0.0 <= row.mi_nats <= min(hx, hy) + 1e-9
    assert 0.0 <= row.nmi <= 1.0


def test_cohort_survival_km_differential(spark, sf_dir):
    """Textbook KM: per cohort, S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) with
    right censoring (event iff last order > 365 days before the
    dataset horizon), recomputed row-by-row in python floats and
    compared against exp(log_surv_micro/1e6)."""
    import math

    import pandas as pd

    from data_pipeline_spark_spark import registry

    registry.load_all()
    out = registry.QUERIES["cohort_survival_km"](
        spark, sf_dir
    ).collect()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")[
        ["c_custkey", "c_mktsegment"]
    ]
    horizon = o["o_orderdate"].max()
    pc = o.groupby("o_custkey")["o_orderdate"].agg(["min", "max"])
    pc["dur"] = (pc["max"] - pc["min"]).dt.days
    pc["ev"] = ((horizon - pc["max"]).dt.days > 365).astype(int)
    pc = pc.merge(c, left_index=True, right_on="c_custkey")
    assert len(out) > 10  # a real curve, not a degenerate table
    for cohort, grp in pc.groupby("c_mktsegment"):
        steps = (
            grp.groupby("dur")
            .agg(m=("ev", "size"), d=("ev", "sum"))
            .sort_index()
        )
        n_risk_total = len(grp)
        s, seen = 1.0, 0
        expect = {}
        for t, r in steps.iterrows():
            n_risk = n_risk_total - seen
            seen += r.m
            if r.d >= 1 and n_risk > r.d:
                s *= 1.0 - r.d / n_risk
                expect[t] = (n_risk, r.d, s)
        got = {
            r.t_days: r for r in out if r.cohort == cohort
        }
        assert set(got) == set(expect)
        for t, (n_risk, d, s) in expect.items():
            r = got[t]
            assert r.n_risk == n_risk and r.d_events == d
            assert abs(r.hazard - d / n_risk) < 1e-12
            assert (
                abs(math.exp(r.log_surv_micro / 1e6) - s)
                < 1e-4 * s + 1e-9
            )


def test_text_readability_differential(spark, sf_dir):
    """Exact re-count of the three regex run counts per document in
    python `re`, then the literal Flesch line."""
    import re

    import pandas as pd

    from data_pipeline_spark_spark import registry

    registry.load_all()
    rows = {
        r.source: r
        for r in registry.QUERIES["text_readability"](
            spark, sf_dir
        ).collect()
    }
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    agg = {}
    for src, grp in d.groupby("source"):
        w = s = y = 0
        for t in grp["text"]:
            t = t.lower()
            w += len(re.findall(r"[a-z0-9]+", t))
            y += len(re.findall(r"[aeiouy]+", t))
            s += max(1, len(re.findall(r"[.!?]+", t)))
        agg[src] = (len(grp), w, s, y)
    assert set(rows) == set(agg)
    for src, (n_docs, w, s, y) in agg.items():
        r = rows[src]
        assert (r.n_docs, r.words, r.sentences, r.syllables) == (
            n_docs,
            w,
            s,
            y,
        )
        flesch = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
        assert abs(r.flesch - flesch) < 1e-9


def test_acf_bucketed_frame_bit_identical(spark):
    """The r16 bucketed ACF moment frame (parallel (type, bucket)
    sorts + exact boundary repair by global position) must be
    BIT-identical to the single-window reference form — every
    moment is the same exact decimal/bigint integer, so equality is
    ==, no tolerance. sf0.001 exercises the sparse regime (buckets
    smaller than the lag horizon, within-bucket lag sums NULL);
    sf0.01 the mixed regime."""
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.analytics import (
        _acf_moment_frame,
        _acf_moment_frame_series,
    )

    for sf in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        e = load(spark, sf, "events")
        a = {
            r["event_type"]: r.asDict()
            for r in _acf_moment_frame(e, max_series_rows=0).collect()
        }
        b = {
            r["event_type"]: r.asDict()
            for r in _acf_moment_frame_series(e).collect()
        }
        assert set(a) == set(b)
        for t in a:
            for c in a[t]:
                assert a[t][c] == b[t][c], (sf, t, c)


def test_acf_bucketed_frame_width_independent(spark):
    """Bucket width is pure plan shape: widths straddling the
    fixture's inter-event spacing (60 s — several boundaries per
    pair at the narrow end; 1 day — almost no boundaries) all
    produce the identical frame, including widths that make every
    bucket smaller than the lag horizon."""
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.analytics import (
        _acf_moment_frame,
        _acf_moment_frame_series,
    )

    e = load(spark, "/root/testdata/sf0.001", "events")
    want = {
        r["event_type"]: r.asDict()
        for r in _acf_moment_frame_series(e).collect()
    }
    for width in (60, 86400):
        got = {
            r["event_type"]: r.asDict()
            for r in _acf_moment_frame(
                e, bucket_sec=width, max_series_rows=0
            ).collect()
        }
        for t in want:
            for c in want[t]:
                assert got[t][c] == want[t][c], (width, t, c)


def test_acf_form_resolver_straddle(spark):
    """Straddling probe for the size-resolved form switch (the
    graph-cap lesson): with the cutoff pinned exactly at the
    fixture's row count the series form is chosen; one row lower
    the bucketed form is chosen — verified by plan shape (the
    bucketed plan windows over (event_type, b), the series plan
    over event_type alone) — and the two sides return identical
    frames, so the switch can never change an answer."""
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.analytics import (
        _acf_moment_frame,
    )

    e = load(spark, "/root/testdata/sf0.001", "events")
    n = e.count()

    def plan(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    series_df = _acf_moment_frame(e, max_series_rows=n)
    bucket_df = _acf_moment_frame(e, max_series_rows=n - 1)
    assert ", b#" not in plan(series_df)  # window keyed by type alone
    assert ", b#" in plan(bucket_df)  # bucketed: (type, b) window
    a = {r["event_type"]: r.asDict() for r in series_df.collect()}
    b = {r["event_type"]: r.asDict() for r in bucket_df.collect()}
    assert a.keys() == b.keys()
    for t in a:
        assert a[t] == b[t]

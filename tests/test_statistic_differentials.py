"""Literal-formula python differentials for statistic keys that
predate the r15 mandatory-differential discipline (r16 session-4
audit): ts_anomaly_mad and quality_decile_report had no dedicated
test at all, agg_corr_exact / ts_gap_fill only a cross-engine parity
row, ts_resample_ohlc only a plan test, ts_downsample_lttb only
endpoint invariants. The DuckDB oracle proves cross-ENGINE agreement
only — the r15 mann_kendall incident (both engines agreeing on a
wrong variance n) is the failure class these re-derivations close.

Each test recomputes the published statistic from collected fixture
rows in plain python/pandas/numpy — no shared helper code from the
operators under test — and compares against the Spark output.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pyspark.sql.functions as F  # noqa: F401  (parity with sibling files)


def _rhu(x: float, d: int) -> float:
    """Spark-compatible ROUND(): HALF_UP on the double's shortest
    decimal repr (Spark rounds BigDecimal(Double.toString(x)))."""
    q = Decimal(1).scaleb(-d) if d else Decimal(1)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def _events_pd(sf_dir: str) -> pd.DataFrame:
    df = pd.read_parquet(f"{sf_dir}/events.parquet")
    # catalog.load floors the TIMESTAMP(NANOS) column to µs; the
    # differential must compare at the same precision
    df["ts"] = df["ts"].dt.floor("us")
    return df


def test_anomaly_mad_matches_python(spark, sf_dir):
    """med = round(median(v), 4); mad = round(median(|v − med|), 4);
    outliers = #{|v − med| > 3·mad} — re-derived per event_type with
    numpy medians and repr-HALF_UP rounding."""
    import numpy as np

    from data_pipeline_spark_spark import registry

    registry.load_all()
    got = {
        r["event_type"]: r.asDict()
        for r in registry.QUERIES["ts_anomaly_mad"](
            spark, sf_dir
        ).collect()
    }
    ev = _events_pd(sf_dir)
    assert set(got) == set(ev["event_type"].unique())
    for t, grp in ev.groupby("event_type"):
        v = grp["value"].to_numpy()
        med = _rhu(float(np.median(v)), 4)
        mad = _rhu(float(np.median(np.abs(v - med))), 4)
        n_out = int((np.abs(v - med) > 3 * mad).sum())
        r = got[t]
        assert r["med"] == med, (t, r["med"], med)
        assert r["mad"] == mad, (t, r["mad"], mad)
        assert r["n_events"] == len(v)
        assert r["n_outliers"] == n_out, (t, r["n_outliers"], n_out)
        # the fixture must actually exercise the threshold
    assert sum(r["n_outliers"] for r in got.values()) > 0


def test_corr_exact_matches_numpy(spark, sf_dir):
    """Pearson r from the five exact centi-unit integer moments,
    re-accumulated with python arbitrary-precision ints and compared
    through the same final double formula."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    got = {
        r["l_returnflag"]: r.asDict()
        for r in registry.QUERIES["agg_corr_exact"](
            spark, sf_dir
        ).collect()
    }
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    for flag, grp in li.groupby("l_returnflag"):
        x = [int(_rhu(q * 100, 0)) for q in grp["l_quantity"]]
        y = [int(_rhu(p * 100, 0)) for p in grp["l_extendedprice"]]
        n = len(x)
        sx, sy = sum(x), sum(y)
        sxy = sum(a * b for a, b in zip(x, y))
        sxx = sum(a * a for a in x)
        syy = sum(b * b for b in y)
        cov = float(n) * sxy - float(sx) * sy
        vx = float(n) * sxx - float(sx) * sx
        vy = float(n) * syy - float(sy) * sy
        r_py = cov / (math.sqrt(vx) * math.sqrt(vy))
        r = got[flag]
        assert r["n"] == n
        assert abs(r["corr_qty_price"] - r_py) <= 1e-12 * max(
            1.0, abs(r_py)
        ), (flag, r["corr_qty_price"], r_py)


def _logprob_reference(sf_dir: str):
    """Per-doc (n_tokens, sum_lp6, mean_logprob) re-derived from the
    corpus with python ints: lp6 = HALF_UP(ln(count)·1e6) once per
    DISTINCT count, BIGINT sums, one final double division."""
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    counts: dict[str, int] = {}
    doc_tokens: dict[int, list[str]] = {}
    for doc_id, text in zip(d["doc_id"], d["text"]):
        toks = text.split(" ")  # keeps empties, like split/unnest
        doc_tokens[int(doc_id)] = toks
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
    lp6 = {
        t: int(_rhu(math.log(c) * 1_000_000, 0))
        for t, c in counts.items()
    }
    n_total = sum(counts.values())
    ln_total6 = int(_rhu(math.log(n_total) * 1_000_000, 0))
    out = {}
    for doc_id, toks in doc_tokens.items():
        n = len(toks)
        s = sum(lp6[t] for t in toks)
        out[doc_id] = (n, s, float(s - n * ln_total6) / (1e6 * n))
    return out


def test_unigram_logprob_matches_python(spark, sf_dir):
    from data_pipeline_spark_spark import registry

    registry.load_all()
    got = {
        r["doc_id"]: r.asDict()
        for r in registry.QUERIES["quality_unigram_logprob"](
            spark, sf_dir
        ).collect()
    }
    want = _logprob_reference(sf_dir)
    assert set(got) == set(want)
    for doc_id, (n, s, mean) in want.items():
        r = got[doc_id]
        assert r["n_tokens"] == n, (doc_id, r["n_tokens"], n)
        assert r["sum_lp6"] == s, (doc_id, r["sum_lp6"], s)
        assert r["mean_logprob"] == mean, (doc_id,)


def test_decile_report_matches_python(spark, sf_dir):
    """NTILE(10) over (mean_logprob, doc_id) with the standard
    remainder rule (first n mod 10 buckets take the extra row), then
    the per-decile rollup — all re-derived."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    got = {
        r["decile"]: r.asDict()
        for r in registry.QUERIES["quality_decile_report"](
            spark, sf_dir
        ).collect()
    }
    scores = _logprob_reference(sf_dir)
    ranked = sorted(
        (mean, doc_id, n) for doc_id, (n, _s, mean) in scores.items()
    )
    n_docs = len(ranked)
    q, rem = divmod(n_docs, 10)
    want: dict[int, list[tuple[float, int, int]]] = {}
    pos = 0
    for dec in range(1, 11):
        size = q + (1 if dec <= rem else 0)
        want[dec] = ranked[pos : pos + size]
        pos += size
    assert set(got) == {d for d, rows in want.items() if rows}
    for dec, rows in want.items():
        if not rows:
            continue
        r = got[dec]
        toks = [n for (_m, _d, n) in rows]
        means = [m for (m, _d, _n) in rows]
        assert r["n_docs"] == len(rows)
        assert r["total_tokens"] == sum(toks)
        assert r["avg_tokens"] == float(sum(toks)) / len(rows)
        assert r["min_mean_logprob"] == min(means)
        assert r["max_mean_logprob"] == max(means)


def test_gap_fill_matches_pandas_locf(spark, sf_dir):
    """Hourly grid per user between floor-hour(first) and
    floor-hour(last), LOCF fill via merge_asof, inner semantics
    (grid points before the first observation drop)."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    got = {
        (r["user_id"], r["grid_ts"]): r["last_value"]
        for r in registry.QUERIES["ts_gap_fill"](
            spark, sf_dir
        ).collect()
    }
    ev = _events_pd(sf_dir)[["user_id", "ts", "value"]]
    want = {}
    for uid, grp in ev.groupby("user_id"):
        grp = grp.sort_values("ts")
        t0 = grp["ts"].min().floor("h")
        t1 = grp["ts"].max().floor("h")
        grid = pd.date_range(t0, t1, freq="h").astype("datetime64[us]")
        filled = pd.merge_asof(
            pd.DataFrame({"ts": grid}),
            grp[["ts", "value"]],
            on="ts",
            direction="backward",
        ).dropna(subset=["value"])
        for ts, v in zip(filled["ts"], filled["value"]):
            want[(uid, ts.to_pydatetime())] = float(v)
    assert got == want
    # non-vacuous: some hour must carry a value forward (no event in
    # that hour), else the fixture never exercises LOCF
    observed_hours = {
        (u, ts.floor("h").to_pydatetime())
        for u, ts in zip(ev["user_id"], ev["ts"])
    }
    assert any(k not in observed_hours for k in want)


def test_resample_ohlc_matches_pandas(spark, sf_dir):
    """open/close by (ts, event_id) order inside each hourly bar,
    high/low/count, volume as exact HALF_UP milli-units."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    got = {
        (r["event_type"], r["bar_start"]): r.asDict()
        for r in registry.QUERIES["ts_resample_ohlc"](
            spark, sf_dir
        ).collect()
    }
    ev = _events_pd(sf_dir)
    ev = ev.assign(bar=ev["ts"].dt.floor("h"))
    want_keys = set()
    for (etype, bar), grp in ev.groupby(["event_type", "bar"]):
        grp = grp.sort_values(["ts", "event_id"], kind="mergesort")
        key = (etype, bar.to_pydatetime())
        want_keys.add(key)
        r = got[key]
        assert r["open"] == float(grp["value"].iloc[0]), key
        assert r["close"] == float(grp["value"].iloc[-1]), key
        assert r["high"] == float(grp["value"].max()), key
        assert r["low"] == float(grp["value"].min()), key
        assert r["n_events"] == len(grp), key
        vol = sum(int(_rhu(v * 1000, 0)) for v in grp["value"])
        assert r["vol_mv"] == vol, key
    assert set(got) == want_keys


def test_lttb_matches_paper_reference(spark, sf_dir):
    """Steinarsson's LTTB re-derived with arbitrary-precision python
    ints: first/last pinned, interior bucket map 1 + (j·(B−2)) // m,
    per-bucket argmax of the effective triangle area vs the PREVIOUS
    SELECTED point and the NEXT bucket's average (cross-multiplied by
    the next-bucket count; ties broken by (t, event_id))."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.operators.analytics import _LTTB_B

    registry.load_all()
    got = {}
    for r in registry.QUERIES["ts_downsample_lttb"](
        spark, sf_dir
    ).collect():
        got[(r["user_id"], r["bucket_idx"])] = (r["sel_t"], r["sel_v"])

    ev = _events_pd(sf_dir)
    ev = ev[ev["event_type"] == "view"]
    B = _LTTB_B
    inner = B - 2
    want = {}
    for uid, grp in ev.groupby("user_id"):
        grp = grp.sort_values(["ts", "event_id"], kind="mergesort")
        t = [int(ts.timestamp()) for ts in grp["ts"]]  # µs-floored ts
        v = [int(_rhu(val * 1000, 0)) for val in grp["value"]]
        eid = list(grp["event_id"])
        n = len(t)
        if n < B:
            continue  # excluded by contract
        m = n - 2
        bucket = [1 + (j * inner) // m for j in range(m)]
        sel = [(t[0], v[0])]
        for i in range(1, inner + 1):
            cand = [k + 1 for k in range(m) if bucket[k] == i]
            if i < inner:
                nxt = [k + 1 for k in range(m) if bucket[k] == i + 1]
                st, sv, cn = (
                    sum(t[k] for k in nxt),
                    sum(v[k] for k in nxt),
                    len(nxt),
                )
            else:
                st, sv, cn = t[n - 1], v[n - 1], 1
            ta, va = sel[-1]
            best = None
            for k in cand:
                area = abs(
                    (ta * cn - st) * (v[k] - va)
                    - (ta - t[k]) * (sv - va * cn)
                )
                key = (-area, t[k], eid[k])
                if best is None or key < best[0]:
                    best = (key, t[k], v[k])
            sel.append((best[1], best[2]))
        sel.append((t[n - 1], v[n - 1]))
        for idx, (st_, sv_) in enumerate(sel):
            want[(uid, idx)] = (st_, sv_)
    assert want, "no series reached B points — vacuous fixture"
    assert got == want


def test_window_twa_matches_python(spark, sf_dir):
    """LOCF time-weighted average: each observation weighs the
    integer seconds to its successor (last sample weightless);
    degenerate series fall back to the plain mean — re-derived with
    python ints per user."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    got = {
        r["user_id"]: r.asDict()
        for r in registry.QUERIES["window_twa"](spark, sf_dir).collect()
    }
    ev = _events_pd(sf_dir)
    for uid, grp in ev.groupby("user_id"):
        grp = grp.sort_values(["ts", "event_id"], kind="mergesort")
        sec = [int(ts.timestamp()) for ts in grp["ts"]]
        v_mv = [int(_rhu(v * 1000, 0)) for v in grp["value"]]
        num = sum(
            v_mv[i] * (sec[i + 1] - sec[i]) for i in range(len(sec) - 1)
        )
        den = sum(sec[i + 1] - sec[i] for i in range(len(sec) - 1))
        if den > 0:
            twa = float(num) / (1000.0 * float(den))
        else:
            twa = float(sum(v_mv)) / (1000.0 * len(v_mv))
        r = got[uid]
        assert r["n_obs"] == len(sec)
        assert r["twa"] == twa, (uid, r["twa"], twa)


def test_ts_interpolate_matches_python(spark, sf_dir):
    """Hourly bucket means, then linear interpolation between the
    bracketing observed buckets (nearest observation at the edges) —
    re-derived per user on a dense grid."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    got = {
        (r["user_id"], r["grid_ts"]): (r["value_interp"], r["filled"])
        for r in registry.QUERIES["ts_interpolate"](
            spark, sf_dir
        ).collect()
    }
    ev = _events_pd(sf_dir)
    ev = ev.assign(hr=ev["ts"].dt.floor("h"))
    want = {}
    for uid, grp in ev.groupby("user_id"):
        obs = {
            hr.to_pydatetime(): float(g["value"].mean())
            for hr, g in grp.groupby("hr")
        }
        hours = sorted(obs)
        grid = pd.date_range(hours[0], hours[-1], freq="h")
        for hr in grid:
            hr_py = hr.to_pydatetime()
            if hr_py in obs:
                want[(uid, hr_py)] = (obs[hr_py], 0)
                continue
            prev = [h for h in hours if h < hr_py]
            nxt = [h for h in hours if h > hr_py]
            if not prev:
                v = obs[nxt[0]]
            elif not nxt:
                v = obs[prev[-1]]
            else:
                ph, nh = prev[-1], nxt[0]
                frac = float(
                    int(hr_py.timestamp()) - int(ph.timestamp())
                ) / float(int(nh.timestamp()) - int(ph.timestamp()))
                v = obs[ph] + (obs[nh] - obs[ph]) * frac
            want[(uid, hr_py)] = (v, 1)
    assert set(got) == set(want)
    n_filled = 0
    for k, (v, filled) in want.items():
        gv, gf = got[k]
        assert gf == filled, k
        assert abs(gv - v) <= 1e-9 * max(1.0, abs(v)), (k, gv, v)
        n_filled += filled
    assert n_filled > 0, "no gap on the grid — interpolation vacuous"


def test_funnel_steps_matches_python(spark, sf_dir):
    """signup → click → purchase with strict first-occurrence
    ordering, re-derived from per-user minima."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    r = registry.QUERIES["funnel_steps"](spark, sf_dir).collect()[0]
    ev = _events_pd(sf_dir)
    firsts = {}
    for (uid, et), grp in ev.groupby(["user_id", "event_type"]):
        firsts.setdefault(uid, {})[et] = grp["ts"].min()
    n_users = ev["user_id"].nunique()
    s1 = sum(1 for f in firsts.values() if "signup" in f)
    s2 = sum(
        1
        for f in firsts.values()
        if "signup" in f and "click" in f and f["click"] > f["signup"]
    )
    s3 = sum(
        1
        for f in firsts.values()
        if "signup" in f
        and "click" in f
        and "purchase" in f
        and f["click"] > f["signup"]
        and f["purchase"] > f["click"]
    )
    assert (
        r["n_users"],
        r["step1_signup"],
        r["step2_clicked_after"],
        r["step3_purchased_after"],
    ) == (n_users, s1, s2, s3)
    assert s3 > 0, "funnel never completes — vacuous fixture"


def test_cohort_retention_matches_python(spark, sf_dir):
    """(cohort_week, week_offset, n_active) re-derived with
    Monday-truncated weeks and day-difference // 7 offsets."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_active"]
        for r in registry.QUERIES["cohort_retention"](
            spark, sf_dir
        ).collect()
    }
    ev = _events_pd(sf_dir)

    def week_start(ts):
        d = ts.normalize() - pd.Timedelta(days=ts.weekday())
        return d.date()

    cohort = {
        uid: week_start(grp["ts"].min())
        for uid, grp in ev.groupby("user_id")
    }
    active = {
        (uid, week_start(ts))
        for uid, ts in zip(ev["user_id"], ev["ts"])
    }
    want: dict[tuple, set] = {}
    for uid, wk in active:
        cw = cohort[uid]
        off = (wk - cw).days // 7
        want.setdefault((cw, off), set()).add(uid)
    assert got == {k: len(v) for k, v in want.items()}


def test_lang_id_matches_python(spark, sf_dir):
    """Marker-hit argmax with the fixed tie priority
    en > es > fr > de > zh and 'und' on zero hits — the confusion
    table re-derived token-for-token."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.operators.text import _LANG_MARKERS

    registry.load_all()
    got = {
        (r["lang"], r["lang_pred"]): r["n_docs"]
        for r in registry.QUERIES["lang_id"](spark, sf_dir).collect()
    }
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    order = ["en", "es", "fr", "de", "zh"]
    want: dict[tuple, int] = {}
    for lang, text in zip(d["lang"], d["text"]):
        toks = text.split(" ")
        hits = {
            lg: sum(1 for t in toks if t in set(m))
            for lg, m in _LANG_MARKERS.items()
        }
        if max(hits.values()) == 0:
            pred = "und"
        else:
            pred = next(
                lg
                for i, lg in enumerate(order)
                if hits[lg] >= max(hits[o] for o in order[i + 1 :] or [lg])
            )
        want[(lang, pred)] = want.get((lang, pred), 0) + 1
    assert got == want


def test_hll_mergeable_matches_exact_distinct(spark, sf_dir):
    """The published columns are the exact per-type distinct count
    and a 5% sketch-accuracy flag; the exact side re-derives in
    pandas and every flag must hold."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    got = {
        r["event_type"]: r.asDict()
        for r in registry.QUERIES["agg_hll_mergeable"](
            spark, sf_dir
        ).collect()
    }
    ev = _events_pd(sf_dir)
    want = ev.groupby("event_type")["user_id"].nunique().to_dict()
    assert {t: r["exact_users"] for t, r in got.items()} == want
    assert all(r["within_5pct"] for r in got.values())


def test_corpus_sample_hash_matches_hashlib(spark, sf_dir):
    """Split membership is a pure md5-prefix function of doc_id —
    replayed with python hashlib (an independent md5) — and the
    realized fractions must sit near the designed rates (sample
    ≈ 26/256, train ≈ 230/256 of the remainder)."""
    import hashlib

    from data_pipeline_spark_spark import registry

    registry.load_all()
    got = {
        r["doc_id"]: r["split"]
        for r in registry.QUERIES["corpus_sample_hash"](
            spark, sf_dir
        ).collect()
    }
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")

    def h2(doc_id, salt):
        return hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()[:2]

    want = {}
    for doc_id in d["doc_id"]:
        doc_id = int(doc_id)
        if h2(doc_id, "/corpus-v1") < "1a":
            want[doc_id] = "sample"
        elif h2(doc_id, "/split-v1") < "e6":
            want[doc_id] = "train"
        else:
            want[doc_id] = "test"
    assert got == want
    n = len(want)
    frac_sample = sum(1 for s in want.values() if s == "sample") / n
    rest = [s for s in want.values() if s != "sample"]
    frac_train = sum(1 for s in rest if s == "train") / len(rest)
    assert abs(frac_sample - 26 / 256) < 0.1
    assert abs(frac_train - 230 / 256) < 0.1


def test_corpus_mix_weighted_matches_hashlib(spark, sf_dir):
    """Stratum keep-rates (en 50%, de/es/fr 75%, rest 100%) replayed
    with hashlib md5 4-hex-prefix thresholds."""
    import hashlib

    from data_pipeline_spark_spark import registry

    registry.load_all()
    got = {
        r["doc_id"]
        for r in registry.QUERIES["corpus_mix_weighted"](
            spark, sf_dir
        ).collect()
    }
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    want = set()
    rates: dict[str, list[int]] = {}
    for doc_id, lang in zip(d["doc_id"], d["lang"]):
        doc_id = int(doc_id)
        thr = (
            "8000"
            if lang == "en"
            else "c000" if lang in ("de", "es", "fr") else "g"
        )
        keep = (
            hashlib.md5(f"{doc_id}/mix-v1".encode()).hexdigest()[:4] < thr
        )
        if keep:
            want.add(doc_id)
        rates.setdefault(lang, []).append(int(keep))
    assert got == want
    for lang, kept in rates.items():
        target = (
            0.5
            if lang == "en"
            else 0.75 if lang in ("de", "es", "fr") else 1.0
        )
        assert abs(sum(kept) / len(kept) - target) < 0.2, lang


def test_corpus_decontaminate_matches_python(spark, sf_dir):
    """Word-5-gram overlap against the md5-selected benchmark slice,
    replayed with python string grams (the Spark side streams
    xxhash64-hashed spans — a seed or slicing bug shows up here as a
    count mismatch)."""
    import hashlib

    from data_pipeline_spark_spark import registry

    registry.load_all()
    got = {
        r["doc_id"]: r["n_shared"]
        for r in registry.QUERIES["corpus_decontaminate"](
            spark, sf_dir
        ).collect()
    }
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")

    def grams(text):
        toks = text.split(" ")
        return {
            " ".join(toks[j : j + 5]) for j in range(len(toks) - 4)
        }

    bench: set = set()
    train: dict[int, set] = {}
    for doc_id, text in zip(d["doc_id"], d["text"]):
        dg = hashlib.md5(text.encode()).hexdigest()
        if dg < "20":
            bench |= grams(text)
        else:
            train[int(doc_id)] = grams(text)
    want = {
        doc_id: len(g & bench)
        for doc_id, g in train.items()
        if g & bench
    }
    assert got == want
    assert want, "benchmark shares no gram with training — vacuous"


def test_pii_redact_matches_python_re(spark, sf_dir):
    """Counts and the md5 of the redacted text replayed with python
    re + hashlib — a byte-exact check of the whole scan → count →
    mask → digest pipeline."""
    import hashlib
    import re

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.operators.training_data import (
        _EMAIL_RE,
        _PHONE_RE,
    )

    registry.load_all()
    got = {
        r["doc_id"]: r.asDict()
        for r in registry.QUERIES["pii_redact"](spark, sf_dir).collect()
    }
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    for doc_id, text in zip(d["doc_id"], d["text"]):
        doc_id = int(doc_id)
        t = (
            f"{text} contact user{doc_id}@example.com"
            f" or +1-555-{doc_id % 10000:04d}"
        )
        red = re.sub(
            _PHONE_RE, "<PHONE>", re.sub(_EMAIL_RE, "<EMAIL>", t)
        )
        r = got[doc_id]
        assert r["n_emails"] == len(re.findall(_EMAIL_RE, t)), doc_id
        assert r["n_phones"] == len(re.findall(_PHONE_RE, t)), doc_id
        assert r["red_hash"] == hashlib.md5(red.encode()).hexdigest(), (
            doc_id
        )
        assert r["n_emails"] >= 1 and r["n_phones"] >= 1


def test_text_normalize_matches_python(spark, sf_dir):
    """lowercase → non-alnum to space → collapse runs → trim,
    digest-verified byte-for-byte via hashlib."""
    import hashlib
    import re

    from data_pipeline_spark_spark import registry

    registry.load_all()
    got = {
        r["doc_id"]: r.asDict()
        for r in registry.QUERIES["text_normalize"](
            spark, sf_dir
        ).collect()
    }
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    for doc_id, text in zip(d["doc_id"], d["text"]):
        doc_id = int(doc_id)
        norm = re.sub(
            " +", " ", re.sub("[^a-z0-9 ]", " ", text.lower())
        ).strip()
        r = got[doc_id]
        assert r["n_chars_norm"] == len(norm), doc_id
        assert r["norm_hash"] == hashlib.md5(norm.encode()).hexdigest()


def _cos(a, b):
    import numpy as np

    a = np.asarray(a, dtype="float64")
    b = np.asarray(b, dtype="float64")
    den = math.sqrt(float(a @ a)) * math.sqrt(float(b @ b))
    return float(a @ b) / den


def test_dedup_embedding_matches_numpy(spark, sf_dir):
    """Top-20 most-similar pairs by rounded cosine with id
    tie-breaks, replayed with a numpy all-pairs scan."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    got = [
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in registry.QUERIES["dedup_embedding"](
            spark, sf_dir
        ).collect()
    ]
    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    ids = [int(v) for v in e["vec_id"]]
    emb = list(e["embedding"])
    pairs = []
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j]:
                pairs.append(
                    (ids[i], ids[j], _rhu(_cos(emb[i], emb[j]), 4))
                )
    pairs.sort(key=lambda p: (-p[2], p[0], p[1]))
    assert got == pairs[:20]


def test_embedding_centroids_matches_numpy(spark, sf_dir):
    """Per-label element-wise centroid replayed with exact python
    integer micro-unit sums (the key's r16 exact form) and, as a
    sanity bound, the plain numpy mean within quantization error."""
    import numpy as np

    from data_pipeline_spark_spark import registry

    registry.load_all()
    got = {
        (r["label"], r["dim"]): r.asDict()
        for r in registry.QUERIES["embedding_centroids"](
            spark, sf_dir
        ).collect()
    }
    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    for label, grp in e.groupby("label"):
        m = np.stack(grp["embedding"].to_numpy()).astype("float64")
        n = len(grp)
        for dim in range(1, m.shape[1] + 1):
            s = sum(
                int(_rhu(v * 1_000_000, 0)) for v in m[:, dim - 1]
            )
            want = float(s) / (1_000_000.0 * n)
            r = got[(label, dim)]
            assert r["n_vectors"] == n
            assert r["centroid_v"] == want, (label, dim)
            assert (
                abs(r["centroid_v"] - m[:, dim - 1].mean()) <= 5e-7
            ), (label, dim)
    assert len(got) == e["label"].nunique() * 64


def test_sim_search_rerank_matches_bruteforce(spark, sf_dir):
    """The two-stage int8-prefilter + exact-rerank output must EQUAL
    exact brute-force top-k (the key's own published claim) —
    replayed with numpy float64 cosine and (sim desc, id asc)
    ranking."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.operators.similarity import (
        _N_QUERIES,
        _TOP_K,
    )

    registry.load_all()
    got = sorted(
        (r["query_id"], r["rnk"], r["neighbor_id"], r["cos_sim"])
        for r in registry.QUERIES["sim_search_rerank"](
            spark, sf_dir
        ).collect()
    )
    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    ids = [int(v) for v in e["vec_id"]]
    emb = {int(v): a for v, a in zip(e["vec_id"], e["embedding"])}
    want = []
    for q in ids:
        if q >= _N_QUERIES:
            continue
        scored = sorted(
            (
                (-_rhu(_cos(emb[q], emb[c]), 4), c)
                for c in ids
                if c != q
            ),
        )[:_TOP_K]
        for rnk, (neg, c) in enumerate(scored, start=1):
            want.append((q, rnk, c, -neg))
    assert got == sorted(want)


def test_graph_kcore_matches_python_peeling(spark, sf_dir):
    """Synchronous k-core peeling over the part co-order graph,
    re-derived with dict-based python peeling: k = (4·|E|) //
    (5·|V|) on the symmetric edge list, then each round keeps nodes
    whose degree within the previous survivors' subgraph is ≥ k."""
    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.operators.graph import (
        _KCORE_DEN,
        _KCORE_NUM,
        _KCORE_ROUNDS,
    )

    registry.load_all()
    got = {
        r["round"]: r.asDict()
        for r in registry.QUERIES["graph_kcore"](spark, sf_dir).collect()
    }
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    items = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    pairs = set()
    for _, grp in items.groupby("l_orderkey"):
        parts = sorted(set(grp["l_partkey"]))
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                pairs.add((int(parts[i]), int(parts[j])))
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    nodes = {s for s, _ in sym}
    k = (_KCORE_NUM * len(sym)) // (_KCORE_DEN * len(nodes))
    alive = sym
    for rnd in range(1, _KCORE_ROUNDS + 1):
        deg: dict[int, int] = {}
        for s, _ in alive:
            deg[s] = deg.get(s, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        alive = [(s, t) for s, t in alive if s in keep and t in keep]
        r = got[rnd]
        assert r["k"] == k
        assert r["n_nodes"] == len(keep), (rnd, r["n_nodes"], len(keep))
        assert r["n_edges"] == len(alive), rnd
        assert r["id_checksum"] == sum(keep), rnd
        assert 0 < len(keep) < len(nodes) or rnd > 1, (
            "first round peels nothing — k vacuous on this fixture"
        )


def test_sessionization_matches_pandas(spark, sf_dir):
    """30-minute-gap sessionization replayed per user in pandas:
    gap flags from microsecond deltas, running-sum session ids,
    per-session (start, end, n_events)."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    got = {
        (r["user_id"], r["session_id"]): (
            r["session_start"],
            r["session_end"],
            r["n_events"],
        )
        for r in registry.QUERIES["sessionization"](
            spark, sf_dir
        ).collect()
    }
    ev = _events_pd(sf_dir)
    want = {}
    multi = 0
    for uid, grp in ev.groupby("user_id"):
        grp = grp.sort_values(["ts", "event_id"], kind="mergesort")
        sid = 0
        prev = None
        sessions: dict[int, list] = {}
        for ts in grp["ts"]:
            if prev is None or (ts - prev) > pd.Timedelta(minutes=30):
                sid += 1
            sessions.setdefault(sid, []).append(ts)
            prev = ts
        multi += len(sessions) > 1
        for sid, tss in sessions.items():
            want[(uid, sid)] = (
                tss[0].to_pydatetime(),
                tss[-1].to_pydatetime(),
                len(tss),
            )
    assert got == want
    assert multi > 0, "every user has one session — gap rule vacuous"


def test_l_diversity_entropy_matches_python(spark, sf_dir):
    """entropy_micronats = round((S·mln S − Σ c·mln c)/S) with
    mln(x) = HALF_UP(ln(x)·1e6) — the r16 exact clearing — re-derived
    in python from the class compositions (grouping fetched via
    DuckDB's independent engine), plus a sanity bound against the
    true float entropy within quantization error."""
    import duckdb

    from data_pipeline_spark_spark import registry
    from data_pipeline_spark_spark.operators.analytics import (
        _LDIV_SQL,
        _QI_CTES,
    )

    registry.load_all()
    got = {
        (r["cohort_week"], r["activity_bucket"], r["fav_type"]): r.asDict()
        for r in registry.QUERIES["privacy_l_diversity"](
            spark, sf_dir
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    base = _LDIV_SQL.format(qi=_QI_CTES.strip())
    cls_sql = base[: base.rindex("SELECT")] + (
        "SELECT cohort_week, activity_bucket, fav_type, cnt FROM cls"
    )
    rows = con.execute(cls_sql).fetchall()
    by_class: dict = {}
    for cw, ab, ft, cnt in rows:
        by_class.setdefault((cw, ab, ft), []).append(int(cnt))

    def mln(x: int) -> int:
        return int(_rhu(math.log(x) * 1_000_000, 0))

    assert set(got) == set(by_class)
    for key, cnts in by_class.items():
        s = sum(cnts)
        num = s * mln(s) - sum(c * mln(c) for c in cnts)
        want = int(_rhu(float(num) / float(s), 0))
        r = got[key]
        assert r["class_size"] == s
        assert r["distinct_l"] == len(cnts)
        assert r["entropy_micronats"] == want, key
        true_h = math.log(s) - sum(
            c * math.log(c) for c in cnts
        ) / s
        assert abs(r["entropy_micronats"] - true_h * 1e6) <= 2 + s, key


def test_lpa_round1_shortcut_multigraph(spark):
    """The round-1 shortcut must sum parallel-edge weights before
    the argmax (r16 self-review: the earlier direct max over raw
    edge rows picked label 3 for node 2 on this input — true vote is
    label 1 with summed weight 4 > 3)."""
    from data_pipeline_spark_spark.operators.graph import lpa_of

    sym = spark.createDataFrame(
        [(1, 2, 2), (1, 2, 2), (3, 2, 3),
         (2, 1, 2), (2, 1, 2), (2, 3, 3)],
        "src long, dst long, w long",
    )
    labels = {
        r["id"]: r["label"]
        for r in lpa_of(sym, iters=1, checkpoint_edges=False).collect()
    }
    assert labels[2] == 1, labels
    # and the shortcut must agree with an explicit pre-collapsed run
    collapsed = spark.createDataFrame(
        [(1, 2, 4), (3, 2, 3), (2, 1, 4), (2, 3, 3)],
        "src long, dst long, w long",
    )
    want = {
        r["id"]: r["label"]
        for r in lpa_of(
            collapsed, iters=1, checkpoint_edges=False
        ).collect()
    }
    assert labels == want


def test_graph_loops_reject_empty_edges(spark):
    """pagerank_of / kcore_rounds_of raise a contract ValueError on
    an empty edge frame instead of a bare ZeroDivisionError (r16
    self-review)."""
    import pytest

    from data_pipeline_spark_spark.operators.graph import (
        kcore_rounds_of,
        pagerank_of,
    )

    empty = spark.createDataFrame([], "src long, dst long, w long")
    with pytest.raises(ValueError, match="empty edge frame"):
        pagerank_of(empty)
    with pytest.raises(ValueError, match="empty edge frame"):
        kcore_rounds_of(empty.select("src", "dst"))


def test_rolling_corr_null_y_restricts_to_pairs(spark):
    """A row whose JSON props lacks '$.k' must shrink the window's
    pair count rather than contaminate the moments (r16 self-review:
    counting all rows while the y-terms skip NULLs mixes a 10-row
    count with 9-pair sums — not any correlation). Synthetic frame:
    one NULL-y row inside an otherwise perfectly correlated run."""
    import pyspark.sql.functions as F

    from data_pipeline_spark_spark.operators.windows import (
        _ROLLCORR_N,
    )

    rows = []
    for i in range(12):
        props = "{}" if i == 6 else '{"k": %d}' % (10 + i)
        rows.append((1, i, f"2024-01-01 00:{i:02d}:00", float(i), props))
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double, props string"
    ).select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
        "props",
    )
    import data_pipeline_spark_spark.operators.windows as wmod

    # drive the registered key's body over the synthetic frame by
    # monkeypatching load (the frame matches the events schema cols
    # the operator reads)
    orig = wmod.load
    wmod.load = lambda spark_, sf_, name: df
    try:
        out = {
            r["event_id"]: r.asDict()
            for r in wmod.window_rolling_corr(spark, "unused").collect()
        }
    finally:
        wmod.load = orig
    # windows fully inside the valid run: perfectly correlated
    for eid, r in out.items():
        lo = max(0, eid - (_ROLLCORR_N - 1))
        n_valid = sum(1 for j in range(lo, eid + 1) if j != 6)
        assert r["n_w"] == n_valid, (eid, r["n_w"], n_valid)
        if n_valid >= 2:
            assert abs(r["corr"] - 1.0) < 1e-12, (eid, r["corr"])
        # the old mixed-row-set bug made dy negative / corr > 1 here
        assert r["dy"] >= 0 and r["dx"] >= 0, (eid, r)

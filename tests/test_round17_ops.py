"""Round-17 tests: advisor-finding regressions (norm f32-square
parity, stage-dir repair, state-fold rounding mode) and the
size-resolved rolling-frame escapes wired into ts_bollinger_bands /
window_rolling_median / ts_cusum_changepoint.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE, SF_UNIT
from tests.oracle import assert_matches_oracle

from data_pipeline_spark_spark import registry

registry.load_all()


# ---------------------------------------------------------------------------
# norm_f32sq: the oracle's CAST(x*x AS DOUBLE) addends are f32 squares
# (DuckDB FLOAT*FLOAT narrows to f32) — the Spark fold must match.
# ---------------------------------------------------------------------------


def _np_norm_f32sq(vals32: np.ndarray) -> float:
    """Literal replica of the oracle fold: f32 square, widen, sum
    left-to-right in f64, sqrt."""
    acc = 0.0
    for v in vals32:
        acc += float(np.float32(v * v))
    return math.sqrt(acc)


def test_norm_f32sq_bit_matches_numpy_f32_fold(spark):
    from data_pipeline_spark_spark.functions.vector import (
        as_double_array,
        norm,
        norm_f32sq,
    )

    rng = np.random.default_rng(17)
    rows = [
        ([float(np.float32(b / 255.0)) for b in rng.integers(0, 256, 8)],)
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "feature array<float>")
    got = [
        (r["a"], r["b"])
        for r in df.select(
            norm_f32sq(F.col("feature")).alias("a"),
            norm(as_double_array(F.col("feature"))).alias("b"),
        ).collect()
    ]
    f64_diverged = 0
    for (a, b), (vals,) in zip(got, rows):
        want = _np_norm_f32sq(np.array(vals, dtype=np.float32))
        assert a == want, f"norm_f32sq != numpy f32 fold: {a!r} vs {want!r}"
        if b != want:
            f64_diverged += 1
    # the f64-square form MUST differ somewhere, else this test could
    # not have caught the advisor's finding (it would pass either way)
    assert f64_diverged > 0, "f64 fold never diverged — test has no teeth"


# ---------------------------------------------------------------------------
# phash 4-band twin: the resolver's other arm, driver-gradable
# ---------------------------------------------------------------------------


def test_phash_4band_twin_equals_resolved_arm(spark):
    """The pinned-4-band twin and the auto-resolved key (8 bands at
    this fixture size) must return IDENTICAL rows — the resolver
    contract: band count changes the plan, never the answer."""
    a = (
        registry.QUERIES["multimodal_phash_near_dup"](spark, SF_ORACLE)
        .toPandas()
        .values.tolist()
    )
    b = (
        registry.QUERIES["multimodal_phash_near_dup_4band"](
            spark, SF_ORACLE
        )
        .toPandas()
        .values.tolist()
    )
    assert a == b and len(a) > 0


def test_phash_4band_twin_oracle(spark):
    df = registry.QUERIES["multimodal_phash_near_dup_4band"](
        spark, SF_ORACLE
    )
    assert_matches_oracle(
        df,
        registry.ORACLE_SQL["multimodal_phash_near_dup_4band"],
        SF_ORACLE,
        "multimodal_phash_near_dup_4band",
    )


def test_multimodal_feature_extract_oracle_sf001(spark):
    df = registry.QUERIES["multimodal_feature_extract"](spark, SF_ORACLE)
    assert_matches_oracle(
        df,
        registry.ORACLE_SQL["multimodal_feature_extract"],
        SF_ORACLE,
        "multimodal_feature_extract",
    )


# ---------------------------------------------------------------------------
# size-resolved rolling-frame escapes (r16 verdict ask #2): the two
# flagged weak keys adopt the ACF dual-path template — bit-equality,
# width-independence, and straddling tests mirror the r16 ACF suite.
# ---------------------------------------------------------------------------


def _events_milli(spark, sf):
    from data_pipeline_spark_spark.catalog import load

    return load(spark, sf, "events").select(
        "event_type",
        "event_id",
        F.col("ts").cast("long").alias("sec"),
        F.round(F.col("value") * 1000).cast("bigint").alias("x"),
    )


def _plan(spark, df):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_bollinger_bucketed_bit_identical(spark):
    """The bucketed per-row moment form (parallel (type, bucket)
    sorts + exact carried-predecessor repair) must be BIT-identical
    to the single-window reference — every moment is the same exact
    decimal/bigint integer, so equality is ==, no tolerance."""
    from data_pipeline_spark_spark.operators.analytics import (
        _boll_moment_rows,
        _boll_moment_rows_series,
    )

    for sf in [SF_UNIT, SF_ORACLE]:
        m = _events_milli(spark, sf)
        a = {
            (r["event_type"], r["event_id"]): (r["cnt"], r["s"], r["ss"])
            for r in _boll_moment_rows(m, max_series_rows=0).collect()
        }
        b = {
            (r["event_type"], r["event_id"]): (r["cnt"], r["s"], r["ss"])
            for r in _boll_moment_rows_series(m).collect()
        }
        assert a == b and len(a) > 0, sf


def test_bollinger_bucketed_width_independent(spark):
    """Bucket width is pure plan shape: 60 s (several boundaries per
    frame) and 1 day (almost none) both match the reference."""
    from data_pipeline_spark_spark.operators.analytics import (
        _boll_moment_rows,
        _boll_moment_rows_series,
    )

    m = _events_milli(spark, SF_UNIT)
    want = {
        (r["event_type"], r["event_id"]): (r["cnt"], r["s"], r["ss"])
        for r in _boll_moment_rows_series(m).collect()
    }
    for width in (60, 86400):
        got = {
            (r["event_type"], r["event_id"]): (r["cnt"], r["s"], r["ss"])
            for r in _boll_moment_rows(
                m, bucket_sec=width, max_series_rows=0
            ).collect()
        }
        assert got == want, width


def test_bollinger_form_resolver_straddle(spark):
    """Cutoff pinned AT the fixture row count → series form; one row
    lower → bucketed form (verified by plan shape: the bucketed
    plan windows over (event_type, b)); identical outputs either
    side, so the switch can never change an answer."""
    from data_pipeline_spark_spark.operators.analytics import (
        _boll_moment_rows,
    )

    m = _events_milli(spark, SF_UNIT)
    n = m.count()
    series_df = _boll_moment_rows(m, max_series_rows=n)
    bucket_df = _boll_moment_rows(m, max_series_rows=n - 1)
    assert ", b#" not in _plan(spark, series_df)
    assert ", b#" in _plan(spark, bucket_df)
    a = {
        (r["event_type"], r["event_id"]): (r["cnt"], r["s"], r["ss"])
        for r in series_df.collect()
    }
    b = {
        (r["event_type"], r["event_id"]): (r["cnt"], r["s"], r["ss"])
        for r in bucket_df.collect()
    }
    assert a == b


def test_rollmed_bucketed_bit_identical_and_width_independent(spark):
    """Same contract for the rolling-median frame: both forms build
    the SAME sorted integer multiset per row (the median is not
    sum-decomposable, but the frame multiset is), at hourly and
    extreme bucket widths."""
    from data_pipeline_spark_spark.operators.windows import (
        _rollmed_frame,
        _rollmed_frame_series,
    )

    for sf in [SF_UNIT, SF_ORACLE]:
        m = _events_milli(spark, sf)
        want = {
            (r["event_type"], r["event_id"]): r["frame"]
            for r in _rollmed_frame_series(m).collect()
        }
        arms = [dict(max_series_rows=0)]
        if sf == SF_UNIT:
            arms += [
                dict(max_series_rows=0, bucket_sec=60),
                dict(max_series_rows=0, bucket_sec=86400),
            ]
        for kw in arms:
            got = {
                (r["event_type"], r["event_id"]): r["frame"]
                for r in _rollmed_frame(m, **kw).collect()
            }
            assert got == want and len(got) > 0, (sf, kw)


def test_cusum_bucketed_bit_identical_and_width_independent(spark):
    """r16 verdict ask #3: the CUSUM closed form is an associative
    integer scan, so the bucketed escape applies — per-(user,
    bucket) local prefix sums/mins plus dim-frame carries, no fringe
    join. Both arms must agree exactly on every per-user output."""
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.analytics import (
        cusum_stats,
    )

    for sf in [SF_UNIT, SF_ORACLE]:
        e = load(spark, sf, "events").select(
            "user_id", "ts", "event_id", "value"
        )
        want = {
            r["user_id"]: r.asDict() for r in cusum_stats(e).collect()
        }
        arms = [dict(max_series_rows=0)]
        if sf == SF_UNIT:
            arms += [
                dict(max_series_rows=0, bucket_sec=60),
                dict(max_series_rows=0, bucket_sec=86400),
            ]
        for kw in arms:
            got = {
                r["user_id"]: r.asDict()
                for r in cusum_stats(e, **kw).collect()
            }
            assert got == want and len(got) > 0, (sf, kw)


def test_cusum_form_resolver_straddle(spark):
    from data_pipeline_spark_spark.catalog import load
    from data_pipeline_spark_spark.operators.analytics import (
        cusum_stats,
    )

    e = load(spark, SF_UNIT, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    n = e.count()
    series_df = cusum_stats(e, max_series_rows=n)
    bucket_df = cusum_stats(e, max_series_rows=n - 1)
    assert ", b#" not in _plan(spark, series_df)
    assert ", b#" in _plan(spark, bucket_df)
    a = {r["user_id"]: r.asDict() for r in series_df.collect()}
    b = {r["user_id"]: r.asDict() for r in bucket_df.collect()}
    assert a == b


def test_rollmed_form_resolver_straddle(spark):
    from data_pipeline_spark_spark.operators.windows import (
        _rollmed_frame,
    )

    m = _events_milli(spark, SF_UNIT)
    n = m.count()
    series_df = _rollmed_frame(m, max_series_rows=n)
    bucket_df = _rollmed_frame(m, max_series_rows=n - 1)
    assert ", b#" not in _plan(spark, series_df)
    assert ", b#" in _plan(spark, bucket_df)
    a = {
        (r["event_type"], r["event_id"]): r["frame"]
        for r in series_df.collect()
    }
    b = {
        (r["event_type"], r["event_id"]): r["frame"]
        for r in bucket_df.collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# NULL-value arm parity (r17 self-review findings): the running SUM
# in the series arm SKIPS NULLs, so a bucketed split must never let
# a NULL part poison the recombined total (NULL + x = NULL). The
# fixtures carry no NULL measures, so these pins run on a synthetic
# stream with the three hazard shapes: leading NULLs, an all-NULL
# series, and whole-bucket NULL runs (bucket_sec=60 makes minute
# buckets, and rows 0-5 of series "gap" are one all-NULL minute).
# ---------------------------------------------------------------------------


def _null_stream_rows():
    rows = []
    # series "lead": two leading NULLs, then values
    for i, v in enumerate([None, None, 7, -3, None, 5, 2]):
        rows.append(("lead", i, 10_000 + i, v))
    # series "gap": a full all-NULL minute bucket, then values
    for i, v in enumerate([None] * 6 + [4, -9, 1, None, 8]):
        rows.append(("gap", i, 20_000 + i * 15, v))
    # series "allnull": every value NULL
    for i in range(5):
        rows.append(("allnull", i, 30_000 + i, None))
    # series "dense": plain values with scattered NULLs
    for i, v in enumerate([3, None, -2, 6, None, None, 9, -1]):
        rows.append(("dense", i, 40_000 + i * 40, v))
    return rows


def test_cusum_bucketed_null_parity(spark):
    """p_c must be NULL iff the whole global prefix is NULL-valued —
    not whenever the IN-BUCKET prefix alone is (the bare cb + lp
    would diverge from the series arm on every post-NULL-bucket
    row). Checked per ROW, both arms, plus the literal recurrence."""
    from data_pipeline_spark_spark.operators.analytics import (
        _cusum_s_rows,
    )

    x = spark.createDataFrame(
        _null_stream_rows(),
        "key string, event_id long, t long, x_c long",
    ).select(
        F.xxhash64("key").alias("user_id"),
        F.timestamp_seconds(F.col("t")).alias("ts"),
        "event_id",
        "x_c",
    )
    series = {
        (r["user_id"], r["event_id"]): (r["p_c"], r["s_c"])
        for r in _cusum_s_rows(x, max_series_rows=10**12).collect()
    }
    for width in (60, 86400):
        bucketed = {
            (r["user_id"], r["event_id"]): (r["p_c"], r["s_c"])
            for r in _cusum_s_rows(
                x, max_series_rows=0, bucket_sec=width
            ).collect()
        }
        assert bucketed == series and len(series) > 0, width
    # literal recurrence differential on one series: p_c follows the
    # NULL-skipping running sum, s_c = p - min(0, running-min of p)
    vals = [None, None, 7, -3, None, 5, 2]
    run, seen, want = 0, False, []
    mins = []
    for v in vals:
        if v is not None:
            run, seen = run + v, True
        if seen:
            mins.append(run)
            want.append((run, run - min(min(mins), 0)))
        else:
            want.append((None, None))
    import pyspark.sql.functions as SF

    lead_uid = (
        spark.range(1).select(SF.xxhash64(SF.lit("lead"))).first()[0]
    )
    got = [series[(lead_uid, i)] for i in range(len(vals))]
    assert got == want


def test_bollinger_bucketed_null_parity(spark):
    """Frame sums must be NULL iff EVERY frame value is NULL — the
    split sum recombination may not poison a non-NULL carried part
    with a NULL in-bucket part (or vice versa)."""
    from data_pipeline_spark_spark.operators.analytics import (
        _boll_moment_rows,
        _boll_moment_rows_series,
    )

    m = spark.createDataFrame(
        _null_stream_rows(),
        "event_type string, i long, sec long, x long",
    ).select(
        "event_type",
        F.col("i").alias("event_id"),
        "sec",
        "x",
    )
    want = {
        (r["event_type"], r["event_id"]): (r["cnt"], r["s"], r["ss"])
        for r in _boll_moment_rows_series(m).collect()
    }
    for width in (60, 86400):
        got = {
            (r["event_type"], r["event_id"]): (r["cnt"], r["s"], r["ss"])
            for r in _boll_moment_rows(
                m, max_series_rows=0, bucket_sec=width
            ).collect()
        }
        assert got == want and len(want) > 0, width


def test_rollmed_bucketed_null_parity(spark):
    """The median frame multiset drops NULLs via collect_list on
    BOTH arms — pin that symmetry on the same NULL stream."""
    from data_pipeline_spark_spark.operators.windows import (
        _rollmed_frame,
    )

    m = spark.createDataFrame(
        _null_stream_rows(),
        "event_type string, i long, sec long, x long",
    ).select(
        "event_type", F.col("i").alias("event_id"), "sec", "x"
    )
    want = {
        (r["event_type"], r["event_id"]): r["frame"]
        for r in _rollmed_frame(m, max_series_rows=10**12).collect()
    }
    got = {
        (r["event_type"], r["event_id"]): r["frame"]
        for r in _rollmed_frame(
            m, max_series_rows=0, bucket_sec=60
        ).collect()
    }
    assert got == want and len(want) > 0

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

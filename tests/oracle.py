"""Differential-test harness: run a registered Spark query and its
DuckDB oracle SQL on the same parquet fixtures and compare
order-insensitively — a local replica of the driver's correctness
gate (SURVEY.md §5), so mismatches surface before the round runs.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

from data_pipeline_spark_spark.catalog import TABLES

FLOAT_DECIMALS = 6


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con.execute(sql).fetchdf()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, row-sorted, float-rounded, tz-stripped."""
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = np.round(s.astype("float64"), FLOAT_DECIMALS)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            sample = next((v for v in s if v is not None), None)
            if sample is not None and type(sample).__name__ == "date":
                df[c] = pd.to_datetime(s).astype("datetime64[us]")
            else:
                df[c] = s.map(lambda v: None if v is None or v != v else v)
    df = df.sort_values(by=list(df.columns), na_position="last", kind="mergesort")
    return df.reset_index(drop=True)


def assert_matches_oracle(spark_df, sql: str, sf_dir: str, name: str = "?") -> None:
    got = normalize(spark_df.toPandas())
    want = normalize(run_oracle(sql, sf_dir))
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch\n spark={list(got.columns)}\n oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    try:
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-6
        )
    except AssertionError as e:
        raise AssertionError(f"{name}: value mismatch\n{e}") from e

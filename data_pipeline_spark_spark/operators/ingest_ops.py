"""Ingest pipeline exposed as driver-checkable queries (rows-only —
the EEG format isn't SQL-oracle-expressible; SURVEY.md §5).

Each query generates the deterministic EEG fixture corpus
(sources/fixture.py, seeded), runs the relevant slice of the ingest
pipeline into a fresh temp dir, and returns a small result frame.
Covers SURVEY.md §2A keys: csv_header_probe, csv_meta_extract,
supercat_map, csv_scan_schema + row_offset_filter + ts_decode +
date_parts + add_literal_cols + parquet_write_part (composed in
`eeg_ingest`), plus the tidy-format melt.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import eeg_csv
from ..sources.fixture import generate_corpus
from ..sources.schema_rules import supercat_mapping_df

_FIXTURE_DIR = os.path.join(tempfile.gettempdir(), "dps_eeg_fixture_v1")


def fixture_dir() -> str:
    """Deterministic corpus, generated once per machine."""
    marker = os.path.join(_FIXTURE_DIR, ".complete")
    if not os.path.exists(marker):
        shutil.rmtree(_FIXTURE_DIR, ignore_errors=True)
        generate_corpus(_FIXTURE_DIR, n_patients=3, max_sessions=2,
                        rows_per_session=120, n_signals=12, seed=42)
        with open(marker, "w") as f:
            f.write("ok")
    return _FIXTURE_DIR


@query("eeg_ingest")
def eeg_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end ingest: fixture corpus → curated partitioned
    parquet → per-(PatientID, Year, Month, Day) row counts and a
    signal aggregate. Fresh output dir per call; counts are stable
    because the fixture is seeded."""
    out = tempfile.mkdtemp(prefix="dps_eeg_out_")
    try:
        eeg_csv.ingest(spark, fixture_dir(), out, run_id="driver")
        curated = eeg_csv.register_curated(spark, out, view="eeg_curated")
        result = (
            curated.groupBy("PatientID", "Year", "Month", "Day")
            .agg(
                F.count("*").alias("n_rows"),
                F.round(F.avg("S1_1"), 4).alias("avg_s1"),
            )
            .orderBy("PatientID", "Year", "Month", "Day")
        )
        # materialize before the temp dir disappears
        rows = result.collect()
        return spark.createDataFrame(rows, result.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


@query("eeg_meta_extract")
def eeg_meta_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-probe metadata extraction (reference sparkle-v5.py:49-68
    semantics): one row per session file with its parsed patient
    metadata."""
    rows = []
    for path in eeg_csv.list_input_files(fixture_dir()):
        h = eeg_csv.probe_header(spark, path)
        rows.append(
            (
                os.path.basename(path),
                h.metadata.get("PatientName", ""),
                h.metadata.get("PatientID", ""),
                h.metadata.get("TestDate", ""),
                h.metadata.get("TestTime", ""),
                len(h.columns),
            )
        )
    return spark.createDataFrame(
        rows,
        "file string, patient_name string, patient_id string, "
        "test_date string, test_time string, n_columns int",
    )


@query("eeg_supercat_map")
def eeg_supercat_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Super-category taxonomy fold (reference crawler.py:27-32 →
    mapping.json shape): (column, super_category) mapping table with
    group sizes."""
    path = eeg_csv.list_input_files(fixture_dir())[0]
    h = eeg_csv.probe_header(spark, path)
    mdf = supercat_mapping_df(spark, h.supercategories)
    return (
        mdf.groupBy("super_category")
        .agg(F.count("*").alias("n_columns"), F.min("column").alias("first_column"))
        .orderBy("super_category")
    )


@query("eeg_tidy_melt")
def eeg_tidy_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → tidy unpivot of the curated signals + broadcast join to
    the super-category mapping — the 6k-column scale strategy
    (SURVEY.md §7 step 5): per (channel, super_category) stats."""
    out = tempfile.mkdtemp(prefix="dps_eeg_tidy_")
    try:
        src = fixture_dir()
        eeg_csv.ingest(spark, src, out, run_id="melt")
        curated = eeg_csv.register_curated(spark, out, view="eeg_tidy_src")
        h = eeg_csv.probe_header(spark, eeg_csv.list_input_files(src)[0])
        signal_cols = [c for c in h.columns if c.startswith("S")]
        tidy = eeg_csv.melt_signals(curated, signal_cols)
        mapping = supercat_mapping_df(spark, h.supercategories)
        result = (
            tidy.join(F.broadcast(mapping), tidy.channel == mapping.column)
            .groupBy("channel", "super_category")
            .agg(F.count("*").alias("n_obs"), F.round(F.avg("value"), 4).alias("avg_value"))
            .orderBy("channel")
        )
        rows = result.collect()
        return spark.createDataFrame(rows, result.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)

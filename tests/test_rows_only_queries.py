"""Every rows-only query (no SQL oracle) must still execute cleanly
through the driver surface: non-crashing, stable schema, and - for
the keys whose semantics guarantee it - non-empty results. The
oracle-checked keys are covered by test_oracle_parity; without this,
a rows-only key could regress to a runtime error and nothing in the
suite would notice until the driver runs it."""

from __future__ import annotations

import pytest

from data_pipeline_spark_spark import registry

registry.load_all()

ROWS_ONLY = sorted(set(registry.QUERIES) - set(registry.ORACLE_SQL))

# keys where an empty result would itself be a bug
MUST_BE_NONEMPTY = {
    "csv_header_probe",
    "csv_meta_extract",
    "csv_scan_infer",
    "csv_scan_schema",
    "cast_by_prefix",
    "catalog_sync",
    "distinct_files",
    "doc_fingerprint_rolling",
    "eeg_ingest",
    "eeg_tidy_melt",
    "empty_input_guard",
    "event_trigger",
    "file_move_processed",
    "header_extract",
    "ingest_log",
    "multimodal_decode",
    "multimodal_frame_sample",
    "multimodal_resize",
    "row_offset_filter",
    "schema_export",
    "supercat_map",
    "synth_gen",
}


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_executes(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    rows = df.collect()
    assert df.schema.fields, name
    if name in MUST_BE_NONEMPTY:
        assert rows, f"{name} returned no rows"

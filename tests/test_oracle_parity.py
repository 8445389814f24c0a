"""Every registered query: (a) runs; (b) if it declares oracle SQL,
matches DuckDB order-insensitively at sf0.001 — the local replica of
the driver's correctness gate."""

from __future__ import annotations

import pytest

from data_pipeline_spark_spark import registry

registry.load_all()

ORACLE_KEYS = sorted(registry.ORACLE_SQL)
ROWS_ONLY_KEYS = sorted(set(registry.QUERIES) - set(registry.ORACLE_SQL))

# generating + ingesting fixtures repeatedly is slow; exercised by
# dedicated tests in test_ingest.py instead
SLOW_ROWS_ONLY = {"eeg_ingest", "eeg_tidy_melt"}


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_parity(spark, sf_dir, name):
    from .oracle import assert_matches_oracle

    df = registry.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, registry.ORACLE_SQL[name], sf_dir, name=name)


@pytest.mark.parametrize("name", sorted(set(ROWS_ONLY_KEYS) - SLOW_ROWS_ONLY))
def test_rows_only_runs(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert df.schema.fieldNames()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_timezone_hostile_session_still_matches(spark, sf_dir):
    """The round driver calls queries() with ITS OWN SparkSession,
    which may not pin spark.sql.session.timeZone — under e.g.
    America/New_York every LTZ day boundary shifts 4-5h against the
    DuckDB oracle. catalog.load pins UTC on the caller's session, so
    timestamp-heavy queries must match the oracle even when the
    session arrives mis-zoned."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        for name in ["rollup_reaggregate", "partition_overwrite_dynamic",
                     "ts_gap_fill", "scalar_datetime",
                     "ts_downsample_lttb",
                     # r11: the PSI split compares ts against a
                     # literal timestamp — a mis-zoned session must
                     # not move events across the baseline boundary;
                     # k-anonymity's cohort week and the seasonal
                     # profile's hour() have the same exposure
                     "drift_psi_report", "privacy_k_anonymity",
                     "ts_seasonal_profile",
                     # epoch-hour regressor — the most exposed key
                     "agg_linear_fit"]:
            from .oracle import assert_matches_oracle

            assert_matches_oracle(
                registry.QUERIES[name](spark, sf_dir),
                registry.ORACLE_SQL[name],
                sf_dir,
                f"tz-hostile:{name}",
            )
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_partitioning_hostile_session_still_matches(spark, sf_dir):
    """Results must be invariant to the session's shuffle-partition
    count (the driver may run with Spark's default 200, or anything).
    Runs the keys most at risk of partition-dependent behavior —
    ranking with limits, hash-ranked sampling, top-k windows,
    iterative clustering — under a deliberately odd partition count
    and compares against the oracle, which has no notion of
    partitions at all."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        for name in ["sort_paginate", "corpus_stratified_sample",
                     "window_rank", "tfidf_top_terms", "dedup_cluster",
                     "agg_corr_exact", "dedup_semantic",
                     "vocab_oov_report",
                     # r10 argmax/top-k additions: DSIR's global
                     # top-25% row_number and BPE's per-iteration
                     # argmax merge must not depend on partitioning
                     "corpus_dsir_select", "tokenizer_bpe_train",
                     # r11: the pack manifest's distributed prefix
                     # sum must give identical global offsets at any
                     # partition count; the CEP journey and the
                     # k-anonymity mode pick are ordered folds
                     "corpus_pack_sequences", "event_pattern_match",
                     "privacy_k_anonymity"]:
            from .oracle import assert_matches_oracle

            assert_matches_oracle(
                registry.QUERIES[name](spark, sf_dir),
                registry.ORACLE_SQL[name],
                sf_dir,
                f"part-hostile:{name}",
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_oracle_output_types_are_portable(sf_dir):
    """No oracle may return a DuckDB-only width (HUGEINT from
    SUM(BIGINT), DECIMAL, unsigned ints): the round driver converts
    both sides through Arrow/pandas before value-hashing, and an
    int128 column hashes differently from Spark's int64 even when
    every value is numerically identical (round-1 format_roundtrip
    failed exactly this way). Wrap aggregates in CAST(... AS BIGINT)
    / CAST(... AS DOUBLE) instead."""
    import duckdb

    from data_pipeline_spark_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    banned = {"HUGEINT", "UHUGEINT", "UINTEGER", "UBIGINT", "USMALLINT", "UTINYINT"}
    offenders = {}
    for name, sql in sorted(registry.ORACLE_SQL.items()):
        rel = con.sql(sql)
        flagged = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t) in banned or str(t).startswith("DECIMAL")
        ]
        if flagged:
            offenders[name] = flagged
    assert not offenders, f"non-portable oracle output types: {offenders}"


def test_aqe_disabled_session_still_matches(spark, sf_dir):
    """Results must be invariant to adaptive query execution: AQE
    changes join strategies, partition coalescing, and skew splits at
    runtime, and none of that may leak into values. Runs the keys
    whose plans AQE rewrites hardest — broadcast-demoted joins,
    skew-salted joins, multi-stage dedup — with AQE off."""
    from data_pipeline_spark_spark import registry

    registry.load_all()
    old = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        for name in ["join_inner_equi", "join_skew_salted",
                     "tpch_q18_large_orders", "dedup_span_exact",
                     "basket_pair_affinity"]:
            from .oracle import assert_matches_oracle

            assert_matches_oracle(
                registry.QUERIES[name](spark, sf_dir),
                registry.ORACLE_SQL[name],
                sf_dir,
                f"aqe-off:{name}",
            )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)

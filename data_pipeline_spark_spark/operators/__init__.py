"""Operator modules. Importing this package registers every named
query into data_pipeline_spark_spark.registry.

The driver's correctness harness walks queries() in dict order under a
time budget (~50 keys/round), so the explicit ``_ROUND14_PRIORITY``
list below decides which keys earn a CORRECTNESS row this round: the
48 r9-stale oracle keys first (after which no key's latest row
predates r10), then the new r14 keys, then the 50 r10-stale keys as
filler. Keys past the budget keep their most recent row from earlier
rounds.
"""

from . import (  # noqa: F401
    graph,
    relational,
    windows,
    workloads,
    scalars,
    analytics,
    asof,
    cdc,
    corpus,
    dedup,
    fuzzy_join,
    text,
    training_data,
    similarity,
    scale_patterns,
    maintenance,
    multimodal,
    streaming_batch,
    ingest_ops,
    inventory,
)

ALL_MODULES = (
    graph,
    relational,
    windows,
    workloads,
    scalars,
    analytics,
    asof,
    cdc,
    corpus,
    dedup,
    fuzzy_join,
    text,
    training_data,
    similarity,
    scale_patterns,
    maintenance,
    multimodal,
    streaming_batch,
    ingest_ops,
    inventory,
)

# Round-14 check order. The driver walks queries() in dict order
# under a ~50-key time budget (exactly 50 keys earned rows in each of
# r8-r13; positions 51+ were cut). Per the r13 verdict ask #1 this
# rotation front-loads (a) the FORTY-EIGHT oracle keys whose latest
# green row dates to r09 (the oldest evidence in the repo: the
# streaming family, the approx aggs, core relational, TPC-H
# q4/6/8/13/15/17/22) — after these are regraded no key is staler
# than r10 — then (b) the new round-14 keys as they land (the first
# two fit the ~50 budget; ts_acf and privacy_dp_sum at positions
# 51-52 likely wait for the r15 front-load, the r12/r13 precedent),
# and finally (c) the 50 r10-stale oracle keys as filler in case the
# budget stretches, teeing up the r15 rotation.
# Everything else keeps its registration order behind the priority
# block and retains its latest row.
_ROUND14_PRIORITY = [
    # (a) latest green row r09 — scripts/staleness_report.py order
    "agg_approx_distinct",
    "agg_approx_quantile",
    "agg_approx_topk",
    "agg_basic",
    "agg_distinct",
    "agg_grouping_sets",
    "agg_hll_mergeable",
    "agg_mode_exact",
    "agg_stats",
    "agg_weighted_median",
    "corpus_duplication_profile",
    "filter_pred",
    "join_broadcast",
    "join_bucketed",
    "join_fuzzy_string",
    "join_inner_equi",
    "join_interval_bucketed",
    "join_outer",
    "join_semi_anti",
    "join_skew_salted",
    "merge_upsert",
    "mv_incremental_refresh",
    "partition_overwrite_dynamic",
    "partition_prune_filter",
    "project",
    "quality_decile_report",
    "repetition_stats",
    "rollup_reaggregate",
    "setop_union",
    "sim_search_ivfadc_residual",
    "sim_search_ivfpq",
    "sort_limit",
    "stream_dedup",
    "stream_join_static",
    "stream_session_window",
    "stream_stateful_agg",
    "stream_stream_join",
    "stream_upsert_sink",
    "stream_window_agg",
    "stream_window_sliding",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q22_global_sales_opportunity",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q8_market_share",
    "ts_resample_ohlc",
    # (b) new round-14 keys — uncommented here as each lands
    "graph_bfs_reach",
    "privacy_dp_count",
    "ts_acf",
    "privacy_dp_sum",
    "corpus_filter_gopher",
    "agg_skew_kurtosis",
    # (c) r10-stale oracle keys — freshness filler past the budget
    "agg_corr_exact",
    "agg_filter_clause",
    "agg_histogram",
    "agg_median_exact",
    "agg_percentile_disc",
    "agg_string_concat",
    "corpus_dsir_select",
    "corpus_duplication_profile_hashed",
    "corpus_filter_report",
    "corpus_mix_temperature",
    "corpus_pipeline_trained",
    "corpus_shuffle_deterministic",
    "dedup_cluster",
    "dedup_embedding",
    "dedup_exact",
    "dedup_incremental",
    "dedup_ngram_jaccard",
    "dedup_substring_apply",
    "dedup_substring_spans",
    "doc_fingerprint_winnow",
    "embedding_centroids",
    "embedding_profile",
    "format_roundtrip",
    "join_asof_nearest",
    "join_bloom_runtime",
    "join_cross",
    "join_range_asof",
    "join_semi",
    "multimodal_meta",
    "ngram_lm_counts",
    "pivot_wide",
    "profile_join_skew",
    "quality_classifier_nb",
    "scd2_intervals",
    "setop_intersect",
    "setop_union_all",
    "sim_search_ivf",
    "sim_search_ivfpq_trained",
    "sim_search_lsh",
    "sort_paginate",
    "stream_late_data_accounting",
    "tokenizer_bpe_train",
    "tokenizer_fertility_report",
    "ts_anomaly_mad",
    "ts_interpolate",
    "unpivot_long",
    "window_analytic",
    "window_rank",
    "window_rank_dense",
    "window_twa",
]


def _apply_priority_order() -> None:
    from .. import registry

    missing = [k for k in _ROUND14_PRIORITY if k not in registry.QUERIES]
    if missing:  # fail loudly: a typo here silently wastes a round
        raise KeyError(f"_ROUND14_PRIORITY names unknown keys: {missing}")
    ordered = {k: registry.QUERIES[k] for k in _ROUND14_PRIORITY}
    ordered.update(
        (k, v) for k, v in registry.QUERIES.items() if k not in ordered
    )
    registry.QUERIES.clear()
    registry.QUERIES.update(ordered)


_apply_priority_order()

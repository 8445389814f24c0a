"""Operator modules. Importing this package registers every named
query into data_pipeline_spark_spark.registry.

The driver's correctness harness walks queries() in dict order under a
time budget (~50 keys/round), so the explicit ``_ROUND15_PRIORITY``
list below decides which keys earn a CORRECTNESS row this round: the
4 r14 keys that have never been graded first (they shipped at
positions 51-54 last round and fell past the budget), then any new
r15 keys, then the 50 r10-stale oracle keys (after which no key's
latest row predates r11), then r11-stale filler. Keys past the budget
keep their most recent row from earlier rounds.
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

# Round-15 check order. The driver walks queries() in dict order
# under a ~50-key time budget (exactly 50 keys earned rows in each of
# r8-r14; positions 51+ were cut). Per the r14 verdict ask #1 this
# rotation front-loads (a) the FOUR r14 keys that shipped with unit
# tests + probes but fell past the budget at positions 51-54 — the
# only keys in the registry with zero driver evidence — then (b) new
# round-15 keys as they land, then (c) the 50 oracle keys whose
# latest green row dates to r10, and finally (d) r11-stale filler.
# Everything else keeps its registration order behind the priority
# block and retains its latest row.
#
# DELIBERATE tradeoff, round-15 session 2: the (b) block grew to 28
# new keys, so ~34 of the r10-stale (c) keys will now fall past the
# budget and stay r10 for one more round. Chosen consciously: a key
# with ZERO driver evidence is worth more than moving a green key's
# stamp from r10 to r15 ("ungraded keys stay out of the headline" is
# the binding policy, and it binds on the new keys). The surviving
# (c) prefix still de-stales the 21 oldest; r16's rotation should
# front the remainder.
_ROUND15_PRIORITY = [
    # (a) shipped r14, never graded — highest leverage
    "ts_acf",
    "privacy_dp_sum",
    "corpus_filter_gopher",
    "agg_skew_kurtosis",
    # (b) new round-15 keys — uncommented here as each lands
    "multimodal_phash_near_dup",
    "ts_pacf",
    "ts_ljung_box",
    "agg_gini_exact",
    "privacy_dp_topk",
    "graph_kcore",
    "graph_clustering_coeff",
    "graph_edge_jaccard",
    "agg_hhi_concentration",
    "text_lexical_diversity",
    "ts_theil_sen",
    "abtest_mann_whitney",
    "corpus_span_corruption",
    "agg_chi_square_indep",
    "dq_benford_digits",
    "agg_bootstrap_ci",
    "agg_anova_oneway",
    "ts_seasonal_strength",
    "event_attribution_multi",
    "multimodal_scene_segments",
    "window_rolling_median",
    "abtest_ratio_delta",
    "graph_degree_stats",
    "text_keyphrase_rake",
    "agg_winsorized_mean",
    "ts_bollinger_bands",
    "graph_assortativity",
    "cohort_rfm_segments",
    "ts_mann_kendall",
    "quality_stupid_backoff",
    "abtest_cuped",
    "scd2_snapshot_at",
    "abtest_ks_test",
    "multimodal_phash_dedup_apply",
    # (c) latest green row r10 — scripts/staleness_report.py order
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
    # (d) latest green row r11 — filler past the budget
    "adhoc_sql",
    "cohort_retention",
    "corpus_pack_sequences",
    "correlated_exists",
    "doc_truncate_tokens",
    "drift_psi_report",
    "event_pattern_match",
    "event_transitions",
    "funnel_steps",
    "keyword_search_bm25",
    "layout_zorder_locality",
    "multimodal_arrow_scan",
    "multimodal_feature_extract",
    "multimodal_frame_sample",
    "multimodal_resize",
    "not_in_null_semantics",
    "privacy_k_anonymity",
    "profile_table",
    "quality_bigram_perplexity",
    "retrieval_hybrid_rrf",
    "scalar_datetime",
    "scalar_null_safe_eq",
    "scalar_subquery",
    "schema_evolution",
    "sessionization",
    "setop_except",
    "setop_intersect_except",
    "stream_dedup_bounded_state",
    "stream_drift_psi",
    "tokenizer_unigram_segment",
    "tpch_q10_returned_items",
    "tpch_q12_priority_by_status",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_volume",
    "tpch_q7_volume_shipping",
    "ts_downsample_lttb",
    "ts_gap_fill",
    "udf_grouped_zscore",
    "vocab_oov_report",
    "window_distribution",
    "window_gaps_islands",
    "window_range_frame",
]


def _apply_priority_order() -> None:
    from .. import registry

    missing = [k for k in _ROUND15_PRIORITY if k not in registry.QUERIES]
    if missing:  # fail loudly: a typo here silently wastes a round
        raise KeyError(f"_ROUND15_PRIORITY names unknown keys: {missing}")
    ordered = {k: registry.QUERIES[k] for k in _ROUND15_PRIORITY}
    ordered.update(
        (k, v) for k, v in registry.QUERIES.items() if k not in ordered
    )
    registry.QUERIES.clear()
    registry.QUERIES.update(ordered)


_apply_priority_order()

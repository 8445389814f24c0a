"""Operator modules. Importing this package registers every named
query into data_pipeline_spark_spark.registry.

The driver's correctness harness walks queries() in dict order under a
time budget (~50 keys/round), so the explicit ``_ROUND6_PRIORITY``
list below decides which keys earn a CORRECTNESS row this round: the
four keys fixed after the round-5 NTZ fixture regeneration, the new
round-6 operators, the never-driver-checked keys, then the keys whose
last green row is the oldest (r1/r2). Keys past the budget keep their
most recent row from earlier rounds.
"""

from . import (  # noqa: F401
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

# Round-6 check order. The driver walks queries() in dict order under
# a ~50-key time budget; r4 and r5 checked the SAME first-50 set, so
# this rotation front-loads (a) the four keys that went red in r5 on
# the regenerated NTZ fixtures and are now fixed, (b) the five new
# round-6 operators, (c) the never-driver-checked ANN recall +
# multimodal keys, then (d) the oracle-backed relational/window/
# TPC-H core whose last green row dates to r1/r2. The r4/r5-green
# block keeps its registration order at the back.
_ROUND6_PRIORITY = [
    # (a) r5-red, fixed this round (NTZ normalization)
    "join_asof_nearest",
    "format_roundtrip",
    # (b) new round-6 operators — never checked by definition
    "join_fuzzy_string",
    "merge_upsert",
    "scd2_intervals",
    "ts_interpolate",
    "join_bloom_runtime",
    "mv_incremental_refresh",
    "window_twa",
    "stream_upsert_sink",
    "basket_pair_affinity",
    "profile_join_skew",
    "ts_anomaly_mad",
    "ngram_lm_counts",
    "corpus_filter_report",
    # (a cont.) the two fixed STREAMING keys — slow but must re-green
    "stream_session_window",
    "stream_stream_join",
    # (c) never-driver-checked
    "sim_search_lsh",
    "sim_search_ivf",
    "multimodal_meta",
    "multimodal_decode",
    "multimodal_resize",
    "multimodal_frame_sample",
    "multimodal_feature_extract",
    # (d) stale r1/r2 evidence — relational core, cheap oracle keys
    "filter_pred",
    "project",
    "partition_prune_filter",
    "agg_basic",
    "agg_distinct",
    "agg_stats",
    "agg_grouping_sets",
    "agg_filter_clause",
    "agg_histogram",
    "agg_corr_exact",
    "agg_median_exact",
    "agg_percentile_disc",
    "agg_string_concat",
    "join_inner_equi",
    "join_broadcast",
    "join_outer",
    "join_semi_anti",
    "join_semi",
    "join_cross",
    "sort_limit",
    "sort_paginate",
    "pivot_wide",
    "unpivot_long",
    "setop_union",
    "setop_union_all",
    "setop_intersect",
    "setop_except",
    "setop_intersect_except",
    "not_in_null_semantics",
    "scalar_null_safe_eq",
    "scalar_datetime",
    "scalar_subquery",
    "correlated_exists",
    "adhoc_sql",
    "window_rank",
    "window_rank_dense",
    "window_analytic",
    "window_distribution",
    "window_range_frame",
    "sessionization",
    "funnel_steps",
    "cohort_retention",
    "join_range_asof",
    "ts_gap_fill",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_volume",
    "tpch_q7_volume_shipping",
    "tpch_q10_returned_items",
    "tpch_q12_priority_by_status",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive",
]


def _apply_priority_order() -> None:
    from .. import registry

    missing = [k for k in _ROUND6_PRIORITY if k not in registry.QUERIES]
    if missing:  # fail loudly: a typo here silently wastes a round
        raise KeyError(f"_ROUND6_PRIORITY names unknown keys: {missing}")
    ordered = {k: registry.QUERIES[k] for k in _ROUND6_PRIORITY}
    ordered.update(
        (k, v) for k, v in registry.QUERIES.items() if k not in ordered
    )
    registry.QUERIES.clear()
    registry.QUERIES.update(ordered)


_apply_priority_order()

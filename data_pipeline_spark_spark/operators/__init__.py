"""Operator modules. Importing this package registers every named
query into data_pipeline_spark_spark.registry.

The driver's correctness harness walks queries() in dict order under a
time budget (~50 keys/round), so the explicit ``_ROUND9_PRIORITY``
list below decides which keys earn a CORRECTNESS row this round: the
r5-stale oracle keys (streaming five first), then the r6-stale
relational core. Keys past the budget keep their most recent row
from earlier rounds.
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

# Round-9 check order. The driver walks queries() in dict order under
# a ~50-key time budget (exactly 50 keys earned rows in r8; positions
# 51+ were cut). This rotation front-loads (a) the SEVENTEEN oracle
# keys whose last green row dates to r05 — the streaming five first
# (the only production-critical family with three-generation-old
# evidence), then the approx-sketch family, the bucketed/salted join
# patterns, and the remaining r5 leftovers — then (b) the fourteen NEW
# round-9 keys (no row from any round yet), then (c) 19 of the 45
# keys whose last green row dates to r06, relational core first.
# After this round no oracle key's graded row predates r6. Positions
# 51+ carry the r6 keys that didn't fit plus the r6-dated ANN rungs
# (VERDICT r8 ask #7: graded only if the driver budget stretches
# past 50). Everything r7/r8-green keeps its registration order at
# the back and retains its recent row; the 26 remaining r6 keys
# rotate in round 10.
_ROUND9_PRIORITY = [
    # (a) last green row r05 — streaming five first
    "stream_window_agg",
    "stream_window_sliding",
    "stream_stateful_agg",
    "stream_dedup",
    "stream_join_static",
    "agg_approx_distinct",
    "agg_approx_quantile",
    "agg_approx_topk",
    "agg_hll_mergeable",
    "agg_mode_exact",
    "join_bucketed",
    "join_interval_bucketed",
    "join_skew_salted",
    "partition_overwrite_dynamic",
    "rollup_reaggregate",
    "repetition_stats",
    "ts_resample_ohlc",
    # (b) new round-9 keys — no graded row exists yet
    "tpch_q1_pricing_summary",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q13_customer_distribution",
    "tpch_q17_small_quantity_revenue",
    "tpch_q22_global_sales_opportunity",
    "corpus_duplication_profile",
    "sim_search_ivfpq",
    "tpch_q8_market_share",
    "tpch_q15_top_supplier",
    "tpch_q21_suppliers_who_kept_waiting",
    "agg_weighted_median",
    "quality_decile_report",
    "sim_search_ivfadc_residual",
    # (c) last green row r06 — relational core, then the rest
    "filter_pred",
    "project",
    "partition_prune_filter",
    "agg_basic",
    "agg_distinct",
    "agg_grouping_sets",
    "agg_stats",
    "join_inner_equi",
    "join_broadcast",
    "join_outer",
    "join_semi_anti",
    "join_fuzzy_string",
    "sort_limit",
    "setop_union",
    "merge_upsert",
    "mv_incremental_refresh",
    "stream_session_window",
    "stream_stream_join",
    "stream_upsert_sink",
    # positions 51+ — graded only if the driver budget stretches
    "join_bloom_runtime",
    "join_asof_nearest",
    "join_semi",
    "sort_paginate",
    "setop_union_all",
    "setop_intersect",
    "join_cross",
    "scd2_intervals",
    "pivot_wide",
    "unpivot_long",
    "agg_filter_clause",
    "agg_median_exact",
    "agg_histogram",
    "format_roundtrip",
    "sim_search_lsh",
    "sim_search_ivf",
    "ts_interpolate",
    "ts_anomaly_mad",
    "window_twa",
]


def _apply_priority_order() -> None:
    from .. import registry

    missing = [k for k in _ROUND9_PRIORITY if k not in registry.QUERIES]
    if missing:  # fail loudly: a typo here silently wastes a round
        raise KeyError(f"_ROUND9_PRIORITY names unknown keys: {missing}")
    ordered = {k: registry.QUERIES[k] for k in _ROUND9_PRIORITY}
    ordered.update(
        (k, v) for k, v in registry.QUERIES.items() if k not in ordered
    )
    registry.QUERIES.clear()
    registry.QUERIES.update(ordered)


_apply_priority_order()

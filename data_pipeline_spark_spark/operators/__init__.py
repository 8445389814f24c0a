"""Operator modules. Importing this package registers every named
query into data_pipeline_spark_spark.registry.

The driver's correctness harness walks queries() in dict order under a
time budget (~50 keys/round), so the explicit ``_ROUND10_PRIORITY``
list below decides which keys earn a CORRECTNESS row this round: the
r6-stale oracle backlog, then the new round-10 keys, then the oldest
r7 keys. Keys past the budget keep their most recent row from
earlier rounds.
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

# Round-10 check order. The driver walks queries() in dict order
# under a ~50-key time budget (exactly 50 keys earned rows in r8 and
# r9; positions 51+ were cut). This rotation front-loads (a) the
# TWENTY-SIX oracle keys whose last green row dates to r06 — the
# complete r6-stale backlog, so after this round no oracle key's
# graded row predates r7 — then (b) the THIRTEEN new round-10 keys
# (no row from any round yet; the list grew during the round as keys
# landed), then (c) the oldest r7 keys, production dedup/similarity/
# window path first (VERDICT r9 ask #1). With 26+13=39 ahead of it,
# only ~11 of section (c) fit the budget; the remaining ~33 r7 keys
# rotate in round 11. Everything r8/r9-green keeps its registration
# order at the back and retains its recent row.
_ROUND10_PRIORITY = [
    # (a) last green row r06 — the full stale backlog
    "agg_corr_exact",
    "agg_filter_clause",
    "agg_histogram",
    "agg_median_exact",
    "agg_percentile_disc",
    "agg_string_concat",
    "corpus_filter_report",
    "format_roundtrip",
    "join_asof_nearest",
    "join_bloom_runtime",
    "join_cross",
    "join_semi",
    "multimodal_meta",
    "ngram_lm_counts",
    "pivot_wide",
    "profile_join_skew",
    "scd2_intervals",
    "setop_intersect",
    "setop_union_all",
    "sim_search_ivf",
    "sim_search_lsh",
    "sort_paginate",
    "ts_anomaly_mad",
    "ts_interpolate",
    "unpivot_long",
    "window_twa",
    # (b) new round-10 keys — no graded row exists yet (inserted as
    # they are registered during the round)
    "sim_search_ivfpq_trained",
    "corpus_duplication_profile_hashed",
    "stream_late_data_accounting",
    "corpus_mix_temperature",
    "corpus_shuffle_deterministic",
    "dedup_substring_spans",
    "dedup_substring_apply",
    "quality_classifier_nb",
    "corpus_dsir_select",
    "doc_fingerprint_winnow",
    "tokenizer_bpe_train",
    "tokenizer_fertility_report",
    "corpus_pipeline_trained",
    # (c) last green row r07 — production path first; the front-50
    # boundary falls inside this block
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_embedding",
    "dedup_cluster",
    "dedup_incremental",
    "embedding_centroids",
    "embedding_profile",
    "join_range_asof",
    "window_rank",
    "window_analytic",
    "window_rank_dense",
    "window_range_frame",
    "window_distribution",
    "window_gaps_islands",
    "sessionization",
    "keyword_search_bm25",
    "vocab_oov_report",
    "doc_truncate_tokens",
    "multimodal_arrow_scan",
    "multimodal_feature_extract",
    "multimodal_frame_sample",
    "multimodal_resize",
    "scalar_datetime",
    "tpch_q3_shipping_priority",
]


def _apply_priority_order() -> None:
    from .. import registry

    missing = [k for k in _ROUND10_PRIORITY if k not in registry.QUERIES]
    if missing:  # fail loudly: a typo here silently wastes a round
        raise KeyError(f"_ROUND10_PRIORITY names unknown keys: {missing}")
    ordered = {k: registry.QUERIES[k] for k in _ROUND10_PRIORITY}
    ordered.update(
        (k, v) for k, v in registry.QUERIES.items() if k not in ordered
    )
    registry.QUERIES.clear()
    registry.QUERIES.update(ordered)


_apply_priority_order()

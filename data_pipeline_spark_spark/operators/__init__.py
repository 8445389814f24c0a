"""Operator modules. Importing this package registers every named
query into data_pipeline_spark_spark.registry.

The driver's correctness harness walks queries() in dict order under a
time budget (~50 keys/round). Rounds 1-2 together covered 100 of the
141 keys; the explicit ``_ROUND3_PRIORITY`` list below front-loads the
41 keys the driver has never reached, plus the keys whose
implementations or oracles changed after their last green row
(``dedup_ngram_jaccard``, ``agg_approx_distinct``, the LSH recall
rows, ``format_roundtrip``). Within the block, oracle-backed keys come
first and rows-only keys last, so a budget cut-off costs the weakest
checks, not the strongest.
"""

from . import (  # noqa: F401
    relational,
    windows,
    workloads,
    scalars,
    analytics,
    asof,
    corpus,
    dedup,
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
    corpus,
    dedup,
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

# Keys the driver checks first this round (never-driver-checked in
# r1∪r2, plus post-green reworks needing re-verification). Everything
# not listed keeps its registration order after this block.
_ROUND3_PRIORITY = [
    # scalar / UDF / view family — cheap, fully oracle-checked
    "scalar_string",
    "scalar_math",
    "scalar_cond",
    "scalar_json",
    "scalar_array_map",
    "scalar_array_explode",
    "udf_surface",
    "udf_grouped_zscore",
    "view_predefined",
    "join_asof_nearest",
    # text family
    "text_stats",
    "token_count",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "doc_fingerprint_rolling",
    "tfidf_top_terms",
    # training-data pipeline family
    "text_normalize",
    "pii_redact",
    "corpus_decontaminate",
    "shard_pack",
    # similarity family (oracle-backed members)
    "sim_search",
    "sim_search_rerank",
    "embedding_quantize",
    # scale patterns / maintenance
    "join_bucketed",
    "join_skew_salted",
    "join_interval_bucketed",
    "rollup_reaggregate",
    "partition_overwrite_dynamic",
    "multimodal_meta",
    # new this round — oracle-backed, never checked by definition
    "repetition_stats",
    "ts_resample_ohlc",
    "agg_approx_quantile",
    "dedup_keep_canonical",
    "stream_join_static",
    "agg_hll_mergeable",
    "agg_approx_topk",
    # re-verification: changed after their last green driver row
    "dedup_ngram_jaccard",
    "agg_approx_distinct",
    "agg_mode_exact",
    "dedup_fuzzy",
    "dedup_simhash",
    "dedup_minhash_df",
    "format_roundtrip",
    # streaming (oracle-backed but slow — after the cheap keys)
    "stream_window_agg",
    "stream_window_sliding",
    "stream_stateful_agg",
    "stream_dedup",
    "stream_session_window",
    "stream_stream_join",
    # ANN recall rungs (oracle-backed as of round 3, but each runs the
    # exact brute-force side too — after the cheap keys)
    "sim_search_lsh",
    "sim_search_ivf",
    # rows-only tail of the priority block
    "multimodal_decode",
    "multimodal_resize",
    "multimodal_frame_sample",
    "multimodal_feature_extract",
]


def _apply_round3_order() -> None:
    from .. import registry

    missing = [k for k in _ROUND3_PRIORITY if k not in registry.QUERIES]
    if missing:  # fail loudly: a typo here silently wastes a round
        raise KeyError(f"_ROUND3_PRIORITY names unknown keys: {missing}")
    ordered = {k: registry.QUERIES[k] for k in _ROUND3_PRIORITY}
    ordered.update(
        (k, v) for k, v in registry.QUERIES.items() if k not in ordered
    )
    registry.QUERIES.clear()
    registry.QUERIES.update(ordered)


_apply_round3_order()

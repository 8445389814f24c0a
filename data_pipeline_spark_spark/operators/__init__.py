"""Operator modules. Importing this package registers every named
query into data_pipeline_spark_spark.registry.

The driver's correctness harness walks queries() in dict order under a
time budget (~50 keys/round), so the explicit ``_ROUND8_PRIORITY``
list below decides which keys earn a CORRECTNESS row this round: the
last r1-stale oracle keys, the keys whose implementation changed
this round, then the oldest of the r5-stale keys. Keys past the
budget keep their most recent row from earlier rounds.
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

# Round-8 check order. The driver walks queries() in dict order under
# a ~50-key time budget. This rotation front-loads (a) the FIFTEEN
# oracle keys whose last green row still dates to r01 — six fixture
# regenerations old, the final tail of the r1 backlog (after this
# round no oracle key's graded row predates r5) — then (b) the keys
# whose implementation changed this round (span dedup 128-bit single-
# repartition shape, basket affinity broadcast-join shape, semantic
# dedup 4-decimal ranking, multimodal codec gating) plus the two new
# round-8 keys, then (c) 29 of the 43 keys whose last green row dates
# to r5 (the recall-checked dedup rungs dedup_fuzzy/minhash/simhash
# first — they are the production dedup path). Everything r6/r7-green
# keeps its registration order at the back and retains its recent
# row; the 14 r5 leftovers (approx-topk/mode/hll, bucketed/salted
# joins, streaming five, ohlc) rotate in round 9.
_ROUND8_PRIORITY = [
    # (a) last green row r01 — the end of the backlog
    "corpus_sample_hash",
    "corpus_stratified_sample",
    "corpus_mix_weighted",
    "corpus_pipeline",
    "compact_small_files",
    "catalog_repair",
    "multimodal_cols",
    "rename_all",
    "add_literal_cols",
    "ts_decode",
    "date_parts",
    "union_append",
    "parquet_scan",
    "parquet_write_part",
    "type_rules",
    # (b) implementation changed this round + new round-8 keys
    "dedup_span_exact",
    "basket_pair_affinity",
    "basket_pair_affinity_apriori",
    "dedup_semantic",
    "multimodal_decode",
    "tidy_supercat_hourly",
    "dedup_containment",
    "quality_unigram_logprob",
    "sim_search_pq",
    # (c) last green row r05 — recall-checked dedup ladder first
    "dedup_fuzzy",
    "dedup_minhash_df",
    "dedup_simhash",
    "dedup_keep_canonical",
    "sim_search",
    "sim_search_rerank",
    "embedding_quantize",
    "scalar_string",
    "scalar_math",
    "scalar_cond",
    "scalar_json",
    "scalar_array_map",
    "scalar_array_explode",
    "udf_surface",
    "view_predefined",
    "text_stats",
    "tfidf_top_terms",
    "doc_fingerprint",
    "doc_fingerprint_rolling",
    "corpus_decontaminate",
    "shard_pack",
    "pii_redact",
    "text_normalize",
    "token_count",
    "quality_score",
    "lang_id",
    "repetition_stats",
    "agg_approx_distinct",
    "agg_approx_quantile",
]


def _apply_priority_order() -> None:
    from .. import registry

    missing = [k for k in _ROUND8_PRIORITY if k not in registry.QUERIES]
    if missing:  # fail loudly: a typo here silently wastes a round
        raise KeyError(f"_ROUND8_PRIORITY names unknown keys: {missing}")
    ordered = {k: registry.QUERIES[k] for k in _ROUND8_PRIORITY}
    ordered.update(
        (k, v) for k, v in registry.QUERIES.items() if k not in ordered
    )
    registry.QUERIES.clear()
    registry.QUERIES.update(ordered)


_apply_priority_order()

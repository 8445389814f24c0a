"""Operator modules. Importing this package registers every named
query into data_pipeline_spark_spark.registry."""

from . import (  # noqa: F401
    analytics,
    asof,
    corpus,
    dedup,
    ingest_ops,
    inventory,
    maintenance,
    multimodal,
    relational,
    scalars,
    scale_patterns,
    similarity,
    streaming_batch,
    text,
    training_data,
    windows,
    workloads,
)

ALL_MODULES = (
    relational,
    analytics,
    corpus,
    windows,
    scalars,
    asof,
    dedup,
    similarity,
    text,
    multimodal,
    streaming_batch,
    ingest_ops,
    inventory,
    scale_patterns,
    workloads,
    maintenance,
    training_data,
)

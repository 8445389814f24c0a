"""Catalog: register the curated parquet tables as queryable views.

Replaces the reference's Glue-crawler + Athena-catalog layer
(reference emr-no-vpc.py:159-169, README.md:13): after ingest the
reference ran a crawler so the query engine could see new partitions;
in Spark the session catalog serves that role directly —
``register_views`` is the crawler, ``spark.table``/``spark.sql`` is
Athena.

All reads are schema-explicit parquet scans; nothing is inferred at
query time (the reference's v7→v8 lesson: runtime inference/casting is
"REALLY slow", reference sparkle-v7.py:14, sparkle-v8.py:15).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: The driver-fixture star schema + extension tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one table. Parquet => predicate pushdown +
    column pruning + partition pruning happen in the file source.

    Nanosecond-timestamp shim: `events.ts` is parquet
    TIMESTAMP(NANOS), which Spark's vectorized reader rejects
    ([PARQUET_TYPE_ILLEGAL]). We read it as raw nanos via the
    legacy nanosAsLong conf and floor-divide to microseconds —
    exactly the truncation DuckDB applies when it reads the same
    column as TIMESTAMP, so both engines see identical values.
    """
    # Pin UTC on the CALLER's session (the round driver builds its
    # own SparkSession): every LTZ date_trunc / cast-to-date shifts
    # day boundaries with the session timezone, while the DuckDB
    # oracle always computes UTC wall time — under any other zone the
    # same query returns different days. The engine's declared
    # semantics are UTC; idempotent one-liner, same pattern as the
    # nanos shim below.
    pin_utc(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # DELIBERATE session-wide conf, same contract as the UTC pin
        # above: it cannot be save/restored around this call because
        # the returned DataFrame is lazy — executors consult the conf
        # again when the scan actually runs, long after this function
        # returned. Consequence: any LATER read of an unrelated
        # TIMESTAMP(NANOS) parquet column in this session also comes
        # back as bigint nanos instead of erroring; wrap it with the
        # same timestamp_micros(ts div 1000) shim used here.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _ntz_to_ltz(df)
    return _ntz_to_ltz(spark.read.parquet(path))


def pin_utc(spark: SparkSession) -> None:
    """Idempotently pin the session timezone to UTC — the engine's
    declared timestamp semantics. Shared by catalog.load and every
    streaming entry point that retags NTZ columns, so an NTZ->LTZ
    cast is always the pure metadata retag described in
    ``_ntz_to_ltz`` regardless of which code path ran first."""
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def _ntz_to_ltz(df: DataFrame) -> DataFrame:
    """Normalize TIMESTAMP_NTZ columns to session-zone TIMESTAMP.

    The fixture parquet writes plain ``timestamp[us]`` (no UTC
    adjustment flag), which Spark >=3.4 infers as TIMESTAMP_NTZ.
    NTZ breaks the engine's declared UTC-timestamp contract:
    ``withWatermark`` requires TIMESTAMP, ``cast(ts as bigint)`` is
    illegal on NTZ, and NTZ/LTZ unions fail to resolve. Under the
    UTC session pin above, NTZ -> LTZ is a pure metadata retag (the
    stored microseconds are reinterpreted as UTC wall time — exactly
    the value DuckDB's naive TIMESTAMP sees), so every oracle stays
    bit-identical."""
    ntz = [f.name for f in df.schema.fields if f.dataType.typeName() == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition to spread COMPUTE-heavy downstream work
    (shingling, pandas UDFs, pairwise scoring) across cores.

    Needed because the local fixtures are single-row-group parquet
    files — an unsplittable scan, so everything downstream of it runs
    in one task unless redistributed. On a real cluster the scan
    itself parallelizes over many files/row groups and this becomes a
    cheap no-op-ish shuffle; it is deliberately NOT applied to
    scan-bound plans (plain filter/agg), where an extra shuffle only
    adds cost — measured locally: agg 0.4s→1.5s with it, pandas-UDF
    4.1s→2.8s without/with."""
    from .session import default_parallelism

    return df.repartition(partitions or default_parallelism())



def materialize(df: DataFrame) -> DataFrame:
    """Pin a result whose inputs are temp dirs deleted before the
    driver consumes the DataFrame. localCheckpoint cuts the lineage
    and keeps the (tiny, final) partitions in EXECUTOR block storage
    — no driver-memory materialization; at scale these results would
    be written to a real table instead. Shared by the maintenance and
    scale-pattern operators (two identical private copies drifted
    apart once — r8 review)."""
    return df.localCheckpoint(eager=True)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)

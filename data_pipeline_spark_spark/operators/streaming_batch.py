"""Event-time window aggregation — the batch face of the streaming
engine.

The reference's ingest is event-triggered micro-batch (monthly
uploads, reference README.md:10-11, lambda-initiator-v2.py:27-39);
it has no continuous queries. Our engine exposes event-time tumbling /
sliding windows via F.window, which is the SAME operator in batch and
in Structured Streaming (streaming/ingest.py runs the streaming form
with watermarks; this module registers the batch form the DuckDB
oracle can verify with time_bucket).

Scale: window aggregation = groupBy(window, keys) → partial+final hash
agg, shuffling only (window, key) pairs. Sliding windows multiply rows
by (length/slide) in the Expand — keep slide ≥ length/4 at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query


@query(
    "stream_window_agg",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type. Identical
    code runs under readStream with a watermark (see
    streaming/ingest.py::windowed_event_counts)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query("stream_window_sliding")
def stream_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour length, 30 min slide). No concise
    DuckDB equivalent (each row lands in 2 windows) → rows-only
    check."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )

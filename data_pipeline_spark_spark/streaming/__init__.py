"""Structured Streaming surface: incremental (availableNow) ingest and
event-time windowed aggregation."""

"""Structured Streaming surface (SURVEY §2.10 — NEW; the reference is
batch-only)."""

from ssis_to_pyspark_agent_spark.streaming.runner import (
    dedup_within_watermark,
    stateful_counter,
    stream_events,
    windowed_agg,
    run_stream_to_memory,
)

__all__ = [
    "dedup_within_watermark",
    "stateful_counter",
    "stream_events",
    "windowed_agg",
    "run_stream_to_memory",
]

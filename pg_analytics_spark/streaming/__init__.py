"""Structured Streaming operators (additive scope — the reference is
batch-only, SURVEY §1.1)."""

from pg_analytics_spark.streaming.events import (
    read_event_stream,
    stream_hourly_counts,
    stream_sessionize,
    stream_stateful_user_profile,
    run_available_now,
)

__all__ = [
    "read_event_stream",
    "run_available_now",
    "stream_hourly_counts",
    "stream_sessionize",
    "stream_stateful_user_profile",
]

"""Structured Streaming tests: drive each streaming operator with an
AvailableNow trigger over the events parquet and reconcile with the
batch twin (workload/stream.py) — the incremental execution path is
real, only the trigger is bounded."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from pg_analytics_spark.streaming.events import (
    read_event_stream,
    stream_hourly_counts,
    stream_sessionize,
    stream_stateful_user_profile,
)
from pg_analytics_spark.workload.stream import (
    events_hourly_window,
    events_user_activity,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def event_stream(spark):
    return read_event_stream(spark, f"{SF_DIR}/events.parquet")


def _drain(df, name: str, mode: str) -> None:
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def test_stream_hourly_matches_batch(spark, event_stream):
    _drain(stream_hourly_counts(event_stream), "t_hourly", "complete")
    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.table("t_hourly").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in events_hourly_window(spark, SF_DIR).collect()
    }
    assert got == want


def test_stream_sessionize_covers_all_events(spark, event_stream):
    _drain(stream_sessionize(event_stream), "t_sessions", "complete")
    sessions = spark.table("t_sessions")
    total = sessions.agg(F.sum("n_events")).collect()[0][0]
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert total == n_events
    # session windows respect the gap: end-start spans at least one event
    bad = sessions.filter(F.col("session_end") < F.col("session_start")).count()
    assert bad == 0


def test_stream_stateful_profile_matches_batch(spark, event_stream):
    _drain(stream_stateful_user_profile(event_stream), "t_profiles", "update")
    # last update per user wins
    prof = (
        spark.table("t_profiles")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    got = {r["user_id"]: r["n_events"] for r in prof.collect()}
    want = {
        r["user_id"]: r["n_events"]
        for r in events_user_activity(spark, SF_DIR).collect()
    }
    assert got == want

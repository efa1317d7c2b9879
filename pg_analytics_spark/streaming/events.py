"""Structured Streaming over the events table.

Streaming versions of the batch twins in workload/stream.py:

* ``stream_hourly_counts``   — tumbling window + watermark (late data
                               beyond 2h dropped deterministically).
* ``stream_sessionize``      — native session_window with 30-min gap.
* ``stream_stateful_user_profile`` — custom stateful operator via
                               applyInPandasWithState: running per-user
                               profile with explicit GroupState.

All sources are file streams (parquet dirs) so the same code runs
against a Kafka source by swapping ``read_event_stream``; tests drive
them with Trigger.AvailableNow into memory sinks — the incremental
execution path is real, only the trigger is bounded.

Scale notes: the watermark bounds state; session/window state is
per-key and spills via RocksDB state store on a real cluster
(`spark.sql.streaming.stateStore.providerClass`).
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
    StringType,
)

#: SESSION-scoped marker (a session conf, not a module global — two
#: engines sharing this module must not see each other's state):
#: whether a NANOS event stream has been opened in THIS session — the
#: only case where a live stream depends on the nanosAsLong conf
_NANOS_MARKER = "spark.pg_analytics_spark.nanosStreamOpened"

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _ts_unit_is_nanos(path: str) -> bool:
    """Detect whether the ``ts`` column is TIMESTAMP(NANOS) by reading one
    parquet footer driver-side — the streaming share of the batch path's
    unit probe (sources/parquet.py::_nano_columns). µs fixtures must NOT
    get the nanos→µs repair (dividing µs by 1000 lands in January 1970).

    A directory (the normal file-stream shape) is probed via its first
    ``*.parquet`` member — ``ParquetFile(dir)`` would raise and silently
    take the µs path."""
    from ..sources.parquet import _nano_columns

    if os.path.isdir(path):
        path = os.path.join(path, "*.parquet")
    return "ts" in _nano_columns([path])


def read_event_stream(
    spark: SparkSession, path: str, options: dict | None = None
) -> DataFrame:
    """File-source event stream with the canonical schema.

    The timestamp unit is probed from one parquet footer: TIMESTAMP(NANOS)
    columns are read as long (nanosAsLong) and repaired to µs with integer
    truncation — identical semantics to the batch path (sources/parquet.py)
    — while µs/ms columns are read with the natural TimestampNTZ schema.

    ``options`` forwards file-source reader options (e.g.
    ``maxFilesPerTrigger`` for multi-batch drains in tests/ops).
    """
    glob_filter = None
    probe = path
    if path.endswith(".parquet") and not os.path.isdir(path):
        # file streams require a directory; narrow with a glob filter
        glob_filter = os.path.basename(path)
        path = os.path.dirname(path)
    if _ts_unit_is_nanos(probe):
        # Must stay set for the lifetime of the stream: the conf is
        # consulted at every micro-batch's parquet scan, same as the
        # batch path (sources/parquet.py::load).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set(_NANOS_MARKER, "true")
        ns_schema = StructType(
            [
                f if f.name != "ts" else StructField("ts", LongType())
                for f in EVENT_SCHEMA.fields
            ]
        )
        reader = spark.readStream.schema(ns_schema)
        if glob_filter:
            reader = reader.option("pathGlobFilter", glob_filter)
        for k, v in (options or {}).items():
            reader = reader.option(k, v)
        raw = reader.parquet(path)
        # integer `div` truncation, matching the batch path.
        # Watermarks require TIMESTAMP (LTZ) — with the engine's pinned UTC
        # session timezone the wall times equal the batch path's NTZ values.
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Non-nanos path: clear any nanosAsLong left behind by an earlier
    # nanos read in this session so it cannot leak into later plain
    # reads (a leaked `true` makes a future nanos file surface silently
    # as long instead of raising for the caller to handle).  Skip the
    # cleanup ONLY when a nanos stream was opened through this module
    # AND some stream is still running — unsetting mid-flight would
    # break that stream's next micro-batch scan; an unrelated active
    # stream (which never needed the conf) must not preserve the leak.
    if not (
        spark.conf.get(_NANOS_MARKER, "false") == "true"
        and spark.streams.active
    ):
        try:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        except Exception:
            pass
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if glob_filter:
        reader = reader.option("pathGlobFilter", glob_filter)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    raw = reader.parquet(path)
    # NTZ → LTZ for watermark eligibility; UTC session tz keeps wall times
    # equal to the batch path's NTZ values.
    return raw.withColumn("ts", F.to_timestamp("ts"))


def stream_hourly_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h counts per event type with a watermark.

    The value sum is staged in DECIMAL(18,4) and surfaced as double —
    the same exact-sum convention as the batch twin (workload/base.dsum),
    so the streaming result is bit-identical to the batch aggregate and
    the DuckDB oracle regardless of micro-batch accumulation order."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def stream_sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows keyed by user with an inactivity gap."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


_PROFILE_SCHEMA = (
    "user_id long, n_events long, total_value double, last_event string"
)
_STATE_SCHEMA = "n long, total double, last string"


def _update_profile(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last = state.get
    else:
        n, total, last = 0, 0.0, None
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last = str(pdf["event_type"].iloc[-1])
    state.update((n, total, last))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "total_value": total, "last_event": last}]
    )


def stream_stateful_user_profile(events: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-user profile with explicit
    GroupState (the applyInPandasWithState escape hatch for semantics
    session_window can't express)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=_PROFILE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_click_purchase_join(
    events: DataFrame, max_lag: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: each purchase joined to the same
    user's clicks in the preceding `max_lag` — the streaming twin of
    the batch banded range join (operators/temporal.py).

    Both sides carry watermarks and the join condition bounds event
    time on both, so Spark can evict click state once the watermark
    passes purchase_ts: state is O(users × clicks-in-lag-window), not
    unbounded.
    """
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    cond = F.expr(
        f"p_user_id = c_user_id AND "
        f"click_ts >= purchase_ts - INTERVAL {max_lag} AND "
        f"click_ts < purchase_ts"
    )
    return purchases.join(clicks, cond, "inner").select(
        "purchase_id",
        F.col("p_user_id").alias("user_id"),
        "purchase_ts",
        "click_id",
        "click_ts",
    )


def stream_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked streaming dedup: first event per (user_id,
    event_type) within the watermark horizon survives
    (dropDuplicatesWithinWatermark — state for a key is dropped once
    the watermark passes it, so dedup state is bounded, unlike plain
    dropDuplicates on a stream)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    output_mode: str | None = None,
) -> None:
    """Drain everything currently available into an in-memory table and
    stop — the bounded-trigger harness used by tests."""
    if output_mode is None:
        output_mode = "update" if "profile" in query_name else "complete"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

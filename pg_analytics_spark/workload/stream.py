"""Event-stream analytics — batch twins of the streaming operators.

The reference is batch-only (SURVEY §1.1: no streams, no state); this
module is additive scope.  Each query here is the *batch expression* of
a streaming computation over `events` so it can be oracle-checked; the
genuinely incremental versions (watermarks, session windows, stateful
dedup) live in pg_analytics_spark.streaming and are exercised by tests
with availableNow triggers.

Timestamp determinism: events.ts is parquet TIMESTAMP(NANOS); Spark
reads it repaired to µs (sources/parquet.py) while DuckDB keeps ns —
every oracle casts derived timestamps to TIMESTAMP (µs) or DATE so the
arrow types agree.  The driver data has no sub-µs components, so the
truncation is lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pg_analytics_spark.workload.base import _dec, register, table


@register(
    "events_hourly_window",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 1h window aggregation — the batch twin of the streaming "
    "windowed count (streaming/events.py); F.window start == epoch-aligned "
    "date_trunc.",
)
def events_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(_dec("value", 18, 4)).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


@register(
    "events_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL '30 minutes'
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) AS TIMESTAMP) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    doc="Sessionization (30-min inactivity gap) via gaps-and-islands — the "
    "batch twin of the streaming session_window aggregation.",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("timestamp") - F.lag(F.col("ts").cast("timestamp")).over(w)
    flagged = e.withColumn(
        "new_session",
        F.when(
            gap.isNull() | (gap > F.expr("INTERVAL '30' MINUTE")), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(_dec("value", 18, 4)).cast("double").alias("total_value"),
    )


@register(
    "events_type_share_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT day, event_type, n,
           n::DOUBLE / SUM(n) OVER (PARTITION BY day)::DOUBLE AS share
    FROM daily
    """,
    doc="Daily event-type share: agg + window ratio (int/int double division "
    "→ bit-identical cross-engine).",
)
def events_type_share_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("day")
    return daily.select(
        "day",
        "event_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w).cast("double")).alias("share"),
    )


@register(
    "events_user_activity",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_types,
           CAST(MIN(ts) AS TIMESTAMP) AS first_seen,
           CAST(MAX(ts) AS TIMESTAMP) AS last_seen,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY user_id
    """,
    doc="Per-user activity profile — the batch twin of a stateful "
    "streaming aggregation (applyInPandasWithState in streaming/events.py).",
)
def events_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count_distinct("event_type").alias("n_types"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.sum(_dec("value", 18, 4)).cast("double").alias("total_value"),
    )

"""Temporal-join workload over the events table: as-of join (DuckDB
ASOF JOIN as the oracle) and banded range join (plain inequality LEFT
JOIN as the oracle).

These are additive capabilities beyond the reference (SURVEY §7 Phase
6 class): the reference delegates SQL only; neither Spark nor the
reference has an as-of/range join primitive, so operators/temporal.py
builds them from shuffles Spark already optimizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_analytics_spark.operators.temporal import asof_join, banded_range_join
from pg_analytics_spark.workload.base import register, table


@register(
    "asof_purchase_attribution",
    oracle="""
    SELECT l.event_id AS purchase_id, l.user_id, l.ts AS purchase_ts,
           r.event_id AS click_id, r.ts AS click_ts, r.value AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    doc="As-of join: each purchase attributed to the user's most recent "
    "click at-or-before it (classic last-touch attribution). Spark plan: "
    "union + single window pass per user — one shuffle, no inequality "
    "join; oracle is DuckDB's native ASOF LEFT JOIN.",
)
def asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        right_cols=["click_id", "click_ts", "click_value"],
    )


@register(
    "range_join_error_context",
    oracle="""
    SELECT l.event_id AS error_id, l.user_id, l.ts AS error_ts,
           COUNT(r.ts) AS n_clicks_5m
    FROM (SELECT * FROM events WHERE event_type = 'error') l
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
      ON r.user_id = l.user_id
     AND r.ts >= l.ts - INTERVAL 5 MINUTE
     AND r.ts <  l.ts
    GROUP BY 1, 2, 3
    """,
    doc="Banded range join: clicks of the same user in the 5 minutes before "
    "each error, counted. Spark plan: equi-join on (user, 5-min bucket) + "
    "exact µs filter — candidates linear, never |errors|×|clicks| per "
    "user; oracle is the plain inequality LEFT JOIN.",
)
def range_join_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("error_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    joined = banded_range_join(
        errors,
        clicks,
        on="user_id",
        left_ts="error_ts",
        right_ts="click_ts",
        lower_seconds=-300.0,
        upper_seconds=0.0,
        right_cols=[],
        how="left",
    )
    return joined.groupBy("error_id", "user_id", "error_ts").agg(
        F.count("_match_click_ts").alias("n_clicks_5m")
    )


@register(
    "events_click_purchase_pairs",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           c.event_id AS click_id, c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 30 MINUTE
     AND c.ts <  p.ts
    """,
    doc="Batch twin of streaming/events.stream_click_purchase_join (stream-"
    "stream interval join): purchase×click pairs of the same user within "
    "30 minutes, via the banded equi-join — test_streaming reconciles the "
    "watermarked streaming path against exactly this relation.",
)
def events_click_purchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    joined = banded_range_join(
        purchases, clicks,
        on="user_id", left_ts="purchase_ts", right_ts="click_ts",
        lower_seconds=-1800.0, upper_seconds=0.0,
        right_cols=["click_id"], how="inner",
    )
    return joined.select(
        "purchase_id", "user_id", "purchase_ts",
        F.col("_match_click_id").alias("click_id"),
        F.col("_match_click_ts").alias("click_ts"),
    )

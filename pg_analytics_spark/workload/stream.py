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

import itertools

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pg_analytics_spark.errors import EngineError
from pg_analytics_spark.workload.base import (
    _dec,
    freeze,
    register,
    scratch_dir,
    table,
)


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
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
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


@register(
    "events_rolling_1h_stats",
    oracle="""
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts
      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
    )
    ORDER BY user_id, ts, event_id
    """,
    doc="Trailing 1-hour per-user window stats (count + exact-decimal "
    "sum) — the continuous rolling aggregate of a hypertable/time-series "
    "engine, expressed as a RANGE frame over epoch seconds in Spark and "
    "RANGE INTERVAL in DuckDB (identical frame: [ts-3600s, ts]). Scale: "
    "one shuffle on user_id; the frame is evaluated with a sliding "
    "accumulator within each sorted partition, state bounded by the "
    "window width. Tie semantics: RANGE groups equal-ts rows together "
    "in both engines.",
)
def events_rolling_1h_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"))
        .rangeBetween(-3600 * 1_000_000, Window.currentRow)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            "ts",
            F.count("*").over(w).alias("n_1h"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .over(w)
            .cast("double")
            .alias("sum_1h"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


@register(
    "events_gapfill_hourly",
    oracle="""
    WITH RECURSIVE bounds AS (
      SELECT CAST(date_trunc('hour', MIN(ts)) AS TIMESTAMP) AS lo,
             CAST(date_trunc('hour', MAX(ts)) AS TIMESTAMP) AS hi
      FROM events
    ), grid AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
    ), agg AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, COUNT(*) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT g.hour, COALESCE(a.n, 0) AS n
    FROM grid g LEFT JOIN agg a ON g.hour = a.hour
    ORDER BY g.hour
    """,
    doc="Gap-filled hourly series: a generated hour grid left-joined to "
    "the sparse aggregate, empty buckets surfaced as zero — the "
    "time_bucket_gapfill of time-series engines. Scale: the grid is "
    "hours-between-bounds (tiny at any data scale) -> broadcast to the "
    "aggregate side; the event scan aggregates map-side first.",
)
def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    agg = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count("*").alias("_n"))
    )
    return (
        grid.join(agg, "hour", "left")
        .select("hour", F.coalesce(F.col("_n"), F.lit(0)).alias("n"))
        .orderBy("hour")
    )


@register(
    "events_gapfill_locf",
    oracle="""
    WITH RECURSIVE bounds AS (
      SELECT CAST(date_trunc('hour', MIN(ts)) AS TIMESTAMP) AS lo,
             CAST(date_trunc('hour', MAX(ts)) AS TIMESTAMP) AS hi
      FROM events
    ), grid AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
    ), agg AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT hour, v,
           last_value(v IGNORE NULLS) OVER (
             ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS v_locf
    FROM (SELECT g.hour, a.v FROM grid g LEFT JOIN agg a ON g.hour = a.hour)
    ORDER BY hour
    """,
    doc="Gap-filled series with last-observation-carried-forward: empty "
    "buckets inherit the previous hour's value via last_value IGNORE "
    "NULLS over an unbounded-preceding frame — identical semantics in "
    "Spark and DuckDB. The locf() interpolation of time-series engines. "
    "Scale: the single-partition ordered window runs over the tiny hour "
    "grid (hours-between-bounds), never the raw events.",
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    agg = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("v"))
    )
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        grid.join(agg, "hour", "left")
        .select(
            "hour",
            "v",
            F.last("v", ignorenulls=True).over(w).alias("v_locf"),
        )
        .orderBy("hour")
    )


@register(
    "events_interpolate_linear",
    oracle="""
    WITH RECURSIVE bounds AS (
      SELECT CAST(date_trunc('hour', MIN(ts)) AS TIMESTAMP) AS lo,
             CAST(date_trunc('hour', MAX(ts)) AS TIMESTAMP) AS hi
      FROM events
    ), grid AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
    ), agg AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
      FROM events WHERE event_type = 'click' GROUP BY 1
    ), j AS (
      SELECT g.hour, a.v FROM grid g LEFT JOIN agg a ON g.hour = a.hour
    ), w AS (
      SELECT hour, v,
             last_value(v IGNORE NULLS) OVER wp AS prev_v,
             last_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)
               OVER wp AS prev_h,
             first_value(v IGNORE NULLS) OVER wn AS next_v,
             first_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)
               OVER wn AS next_h
      FROM j
      WINDOW wp AS (ORDER BY hour
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (ORDER BY hour
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT hour, v,
           CASE
             WHEN v IS NOT NULL THEN v
             WHEN prev_v IS NULL OR next_v IS NULL THEN NULL
             ELSE prev_v + (next_v - prev_v) *
                  (CAST(date_diff('hour', prev_h, hour) AS DOUBLE)
                   / CAST(date_diff('hour', prev_h, next_h) AS DOUBLE))
           END AS v_interp
    FROM w
    ORDER BY hour
    """,
    doc="Gap-filled series with LINEAR interpolation (the interpolate() "
    "of time-series engines, beside the LOCF twin): empty buckets take "
    "the time-weighted blend of the surrounding observations — prev/next "
    "non-null value and hour located by IGNORE-NULLS window frames, then "
    "one fixed-shape IEEE expression prev + (next-prev)·(dt/DT) whose "
    "operation order is identical in both engines, so even the "
    "interpolated doubles are value-exact.  Edges beyond the first/last "
    "observation stay NULL (no extrapolation).  Scale: windows run over "
    "the tiny hour grid, never raw events.",
)
def events_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    agg = (
        e.filter(F.col("event_type") == "click")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("v"))
    )
    wp = Window.orderBy("hour").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.orderBy("hour").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    obs_hour = F.when(F.col("v").isNotNull(), F.col("hour"))
    j = grid.join(agg, "hour", "left").select(
        "hour",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(obs_hour, ignorenulls=True).over(wp).alias("prev_h"),
        F.first("v", ignorenulls=True).over(wn).alias("next_v"),
        F.first(obs_hour, ignorenulls=True).over(wn).alias("next_h"),
    )
    frac = F.expr(
        "CAST(timestampdiff(HOUR, prev_h, hour) AS DOUBLE)"
        " / CAST(timestampdiff(HOUR, prev_h, next_h) AS DOUBLE)"
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("prev_v").isNull() | F.col("next_v").isNull(), F.lit(None))
        .otherwise(
            F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac
        )
    )
    return j.select("hour", "v", interp.alias("v_interp")).orderBy("hour")


@register(
    "events_funnel_conversion",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    ), staged AS (
      SELECT user_id,
             t_view IS NOT NULL AS s1,
             t_view IS NOT NULL AND t_click > t_view AS s2,
             t_view IS NOT NULL AND t_click > t_view
               AND t_purchase > t_click AS s3
      FROM per_user
    )
    SELECT COUNT(*) FILTER (s1) AS n_view,
           COUNT(*) FILTER (s2) AS n_view_click,
           COUNT(*) FILTER (s3) AS n_view_click_purchase,
           ROUND(COUNT(*) FILTER (s3)::DOUBLE
                 / NULLIF(COUNT(*) FILTER (s1), 0)::DOUBLE, 6) AS conversion
    FROM staged
    """,
    doc="Ordered conversion funnel (view -> later click -> later "
    "purchase) per user, counted at each stage plus end-to-end "
    "conversion rate — the event-sequence-pattern shape (MATCH_"
    "RECOGNIZE-lite) expressed as first-occurrence timestamps + ordered "
    "comparisons, which is how it stays one hash-agg instead of a "
    "per-row NFA. NULL comparisons (missing stage) are falsy in both "
    "engines' boolean semantics via the IS NOT NULL guards. Scale: one "
    "shuffle on user_id with map-side conditional-MIN combine; the "
    "funnel logic itself is a narrow map over the per-user row.",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    s1 = F.col("t_view").isNotNull()
    s2 = s1 & (F.col("t_click") > F.col("t_view"))
    s3 = s2 & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.count(F.when(s1, 1)).alias("n_view"),
        F.count(F.when(s2, 1)).alias("n_view_click"),
        F.count(F.when(s3, 1)).alias("n_view_click_purchase"),
        F.round(
            F.count(F.when(s3, 1)).cast("double")
            / F.nullif(F.count(F.when(s1, 1)), F.lit(0)).cast("double"),
            6,
        ).alias("conversion"),
    )


@register(
    "events_cohort_retention",
    oracle="""
    WITH cohorts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
    )
    SELECT c.cohort_day,
           datediff('day', c.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN cohorts c ON e.user_id = c.user_id
    WHERE datediff('day', c.cohort_day, CAST(e.ts AS DATE)) <= 7
    GROUP BY c.cohort_day, day_offset
    ORDER BY c.cohort_day, day_offset
    """,
    doc="Cohort retention matrix: users grouped by first-seen day, "
    "distinct-active counts at each day offset (first week) — the "
    "standard product-analytics retention shape. Scale: cohort "
    "assignment is one agg on user_id; the fact join is on the same "
    "key (co-partitioned shuffle); the final distinct-count agg keys "
    "on (cohort, offset) — small and uniform.",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    cohorts = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    return (
        e.join(cohorts, "user_id")
        .withColumn("day_offset", F.datediff(F.to_date("ts"), F.col("cohort_day")))
        .filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("active_users"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "events_rolling_distinct_users",
    oracle="""
    SELECT event_id, ts, event_type,
           COUNT(DISTINCT user_id) OVER (
             PARTITION BY event_type ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS du_1h
    FROM events
    ORDER BY event_type, ts, event_id
    """,
    doc="Trailing 1-hour distinct-user count per event type — the "
    "sliding-cardinality signal (active-user gauges, rate anomaly "
    "detection). Spark has no DISTINCT window aggregate, so it's "
    "size(collect_set() OVER range-frame) — same semantics as DuckDB's "
    "windowed COUNT(DISTINCT). Scale: one shuffle on event_type (5 "
    "partitions here — on a real deployment partition by (type, "
    "time-bucket) to parallelize within types); state per frame is the "
    "distinct-user set, bounded by the window width.",
)
def events_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"))
        .rangeBetween(-3600 * 1_000_000, Window.currentRow)
    )
    return (
        e.select(
            "event_id",
            "ts",
            "event_type",
            F.size(F.collect_set("user_id").over(w)).cast("long").alias("du_1h"),
        )
        .orderBy("event_type", "ts", "event_id")
    )


@register(
    "events_hourly_anomaly_zscore",
    oracle="""
    WITH hourly AS (
      SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT event_type, hour, n,
             CAST(SUM(CAST(n AS DECIMAL(20,0))) OVER w AS DOUBLE) AS s1,
             CAST(SUM(CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(19,0))) OVER w AS DOUBLE) AS s2,
             COUNT(*) OVER w AS k
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hour
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, hour, n,
           ROUND((n - s1 / k) / sqrt(GREATEST(s2 / k - (s1 / k) * (s1 / k), 1e-9)), 6) AS zscore
    FROM stats
    WHERE k >= 12
    ORDER BY event_type, hour
    """,
    doc="Trailing-window z-score anomaly detection on hourly event "
    "counts: mean/variance over the previous 24 closed hours (current "
    "hour excluded), flagged once 12 hours of history exist. Moments "
    "are staged as exact decimal window sums (counts are integers, so "
    "s1/s2 are exact in both engines) and the z arithmetic is the same "
    "double expression — bit-identical. Scale: one shuffle to hourly "
    "counts (map-side combined), then a per-type ordered window over "
    "~hours rows; the raw events never enter the window.",
)
def events_hourly_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-24, -1)
    )
    s1 = F.sum(F.col("n").cast("decimal(20,0)")).over(w).cast("double")
    s2 = (
        F.sum(F.col("n").cast("decimal(38,0)") * F.col("n").cast("decimal(19,0)"))
        .over(w)
        .cast("double")
    )
    k = F.count("*").over(w)
    mean = s1 / k
    var = F.greatest(s2 / k - mean * mean, F.lit(1e-9))
    return (
        hourly.select(
            "event_type",
            "hour",
            "n",
            F.round((F.col("n") - mean) / F.sqrt(var), 6).alias("zscore"),
            k.alias("_k"),
        )
        .filter(F.col("_k") >= 12)
        .drop("_k")
        .orderBy("event_type", "hour")
    )


_STREAM_RUN_SEQ = itertools.count()


@register(
    "streaming_hourly_counts",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="STRUCTURED STREAMING under the oracle gate: the real incremental "
    "path (file-source readStream → watermarked tumbling window → memory "
    "sink, Trigger.AvailableNow) must produce the batch aggregate "
    "bit-exactly — counts AND decimal-staged value sums. The oracle is "
    "the plain batch SQL; equality proves the watermark drops nothing on "
    "in-order data and micro-batch accumulation order cannot leak into "
    "the result.",
)
def streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pg_analytics_spark.streaming.events import (
        read_event_stream,
        stream_hourly_counts,
    )

    name = f"reg_stream_hourly_{next(_STREAM_RUN_SEQ)}"
    ev = read_event_stream(spark, f"{sf_dir}/events.parquet")
    with scratch_dir(spark) as ckpt:
        q = (
            stream_hourly_counts(ev)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        "n",
        "total_value",
    )


@register(
    "streaming_dedup_keys",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
    doc="Watermarked streaming dedup (dropDuplicatesWithinWatermark) "
    "under the oracle gate: the surviving KEY SET equals batch DISTINCT "
    "(which row survives per key is arrival-order-dependent, so only "
    "keys are asserted — the oracle-exact part of the contract). State "
    "is bounded by the watermark horizon, unlike plain dropDuplicates "
    "on a stream.",
)
def streaming_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pg_analytics_spark.streaming.events import (
        read_event_stream,
        stream_dedup,
    )

    name = f"reg_stream_dedup_{next(_STREAM_RUN_SEQ)}"
    ev = read_event_stream(spark, f"{sf_dir}/events.parquet")
    with scratch_dir(spark) as ckpt:
        q = (
            stream_dedup(ev)
            .select("user_id", "event_type")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).select("user_id", "event_type")


@register(
    "streaming_sessionize",
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
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) AS TIMESTAMP) AS last_event,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    doc="Native session_window sessionization on the REAL streaming path "
    "under the value-exact oracle gate. session_window's end is "
    "last-event-time + gap, so end - 30min == the batch twin's MAX(ts) "
    "— asserting that identity per session proves the native operator "
    "and the gaps-and-islands formulation segment identically, event "
    "for event, sum for sum.",
)
def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pg_analytics_spark.streaming.events import read_event_stream

    name = f"reg_stream_sess_{next(_STREAM_RUN_SEQ)}"
    ev = read_event_stream(spark, f"{sf_dir}/events.parquet")
    # decimal-staged total like the batch twin (bit-exact cross-engine)
    sess = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            (F.col("s.end") - F.expr("INTERVAL 30 MINUTES")).alias("last_event"),
            "n_events",
            "total_value",
        )
    )
    with scratch_dir(spark) as ckpt:
        q = (
            sess.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).select(
        "user_id",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("last_event").cast("timestamp_ntz").alias("last_event"),
        "n_events",
        "total_value",
    )


@register(
    "streaming_user_profile",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_events
      FROM events
    )
    SELECT user_id, n_events, event_type AS last_event
    FROM ranked WHERE rn = 1
    """,
    doc="The custom stateful operator (applyInPandasWithState running "
    "profile, streaming/events.py) under the value-exact oracle gate "
    "via its deterministic columns: event counts and the last event "
    "type under (ts, event_id) ordering. The float accumulator stays "
    "out of the oracle row by design — pandas' pairwise float sum is "
    "not bit-reproducible against a decimal-staged SQL sum, and the "
    "equivalence test in test_streaming.py already covers it at "
    "tolerance. In UPDATE mode the LAST update per user is the final "
    "state; max_by(n_events) selects it engine-side.",
)
def streaming_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pg_analytics_spark.streaming.events import (
        read_event_stream,
        stream_stateful_user_profile,
    )

    name = f"reg_stream_profile_{next(_STREAM_RUN_SEQ)}"
    ev = read_event_stream(spark, f"{sf_dir}/events.parquet")
    with scratch_dir(spark) as ckpt:
        q = (
            stream_stateful_user_profile(ev)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    prof = spark.table(name)
    # several update rows per user are possible if the file source
    # split the drain into multiple micro-batches — the final state is
    # the row with the highest running count
    return (
        prof.groupBy("user_id")
        .agg(
            F.expr("max_by(struct(n_events, last_event), n_events)").alias("_s")
        )
        .select(
            "user_id",
            F.col("_s.n_events").alias("n_events"),
            F.col("_s.last_event").alias("last_event"),
        )
    )


@register(
    "streaming_incremental_rollup",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="The incrementally-maintained materialized rollup "
    "(streaming/rollup.py: watermarked window aggregate in UPDATE mode "
    "→ foreachBatch upsert into a parquet rollup) under the value-exact "
    "oracle gate: one availableNow increment over the full fixture must "
    "leave the rollup equal to the batch aggregate, counts AND "
    "decimal-staged sums. The continuous-aggregate pattern a dashboard "
    "reads instead of re-scanning the event log.",
)
def streaming_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pg_analytics_spark.streaming.rollup import maintain_hourly_rollup

    with scratch_dir(spark) as work:
        rollup = f"{work}/rollup"
        maintain_hourly_rollup(
            spark, f"{sf_dir}/events.parquet", rollup, f"{work}/ckpt"
        )
        out = spark.read.parquet(rollup)
        return freeze(
            out.select(
                F.col("window_start")
                .cast("timestamp_ntz")
                .alias("window_start"),
                "event_type",
                "n",
                "total_value",
            )
        )


@register(
    "streaming_click_purchase_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           c.event_id AS click_id, c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 30 MINUTE
     AND c.ts <  p.ts
    """,
    doc="STREAM-STREAM interval join on the real streaming path under "
    "the value-exact gate: purchases joined to the same user's clicks "
    "in the preceding 30 minutes (streaming/events."
    "stream_click_purchase_join).  Both sides carry watermarks and "
    "the join condition bounds event time on both, so click state "
    "evicts once the watermark passes — state is O(users × "
    "clicks-in-window), not unbounded; inner-join pairs emit as soon "
    "as both sides arrive.  Same oracle as the batch twin "
    "events_click_purchase_pairs: the watermarked incremental plan "
    "and the banded-range batch plan produce the IDENTICAL relation.",
)
def streaming_click_purchase_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pg_analytics_spark.streaming.events import (
        read_event_stream,
        stream_click_purchase_join,
    )

    name = f"reg_stream_ssj_{next(_STREAM_RUN_SEQ)}"
    ev = read_event_stream(spark, f"{sf_dir}/events.parquet")
    with scratch_dir(spark) as ckpt:
        q = (
            stream_click_purchase_join(ev)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).select(
        "purchase_id", "user_id", "purchase_ts", "click_id", "click_ts"
    )


@register(
    "events_ab_test_welch",
    oracle="""
    WITH g AS (
      SELECT
        COUNT(*) FILTER (WHERE event_type = 'click') AS n1,
        CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)))
             FILTER (WHERE event_type = 'click') AS VARCHAR) AS DOUBLE) AS s1,
        CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4)))
             FILTER (WHERE event_type = 'click') AS VARCHAR) AS DOUBLE) AS ss1,
        COUNT(*) FILTER (WHERE event_type = 'purchase') AS n2,
        CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)))
             FILTER (WHERE event_type = 'purchase') AS VARCHAR) AS DOUBLE) AS s2,
        CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4)))
             FILTER (WHERE event_type = 'purchase') AS VARCHAR) AS DOUBLE) AS ss2
      FROM events
    )
    SELECT n1, n2,
           s1 / n1 AS mean_a,
           s2 / n2 AS mean_b,
           s1 / n1 - s2 / n2 AS mean_diff,
           (s1 / n1 - s2 / n2)
             / sqrt(((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1
                    + ((ss2 - s2 * s2 / n2) / (n2 - 1)) / n2) AS t_stat,
           (((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1
            + ((ss2 - s2 * s2 / n2) / (n2 - 1)) / n2)
           * (((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1
              + ((ss2 - s2 * s2 / n2) / (n2 - 1)) / n2)
             / ((((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1)
                * (((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1) / (n1 - 1)
                + (((ss2 - s2 * s2 / n2) / (n2 - 1)) / n2)
                  * (((ss2 - s2 * s2 / n2) / (n2 - 1)) / n2) / (n2 - 1))
             AS welch_df
    FROM g
    """,
    doc="Welch two-sample t-test (A/B experiment readout) between the "
    "click and purchase value distributions: ONE filtered-aggregate "
    "scan produces exact decimal power sums per arm (map-side "
    "combinable — the single-pass 100 TB shape), then t statistic and "
    "Welch-Satterthwaite degrees of freedom finalize in fixed-shape "
    "IEEE expressions (sqrt is correctly-rounded), identical in both "
    "engines — value-exact.  Native stddev/avg would be order-"
    "dependent float folds; the power-sum staging is what makes a "
    "statistical test reproducible on a distributed engine.",
)
def events_ab_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    d = F.col("value").cast("decimal(18,4)")
    is_a = F.col("event_type") == "click"
    is_b = F.col("event_type") == "purchase"

    def vb(c):  # decimal → VARCHAR → DOUBLE bridge
        return c.cast("string").cast("double")

    g = e.agg(
        F.count(F.when(is_a, 1)).alias("n1"),
        vb(F.sum(F.when(is_a, d))).alias("s1"),
        vb(F.sum(F.when(is_a, d * d))).alias("ss1"),
        F.count(F.when(is_b, 1)).alias("n2"),
        vb(F.sum(F.when(is_b, d))).alias("s2"),
        vb(F.sum(F.when(is_b, d * d))).alias("ss2"),
    )
    n1, s1, ss1 = F.col("n1"), F.col("s1"), F.col("ss1")
    n2, s2, ss2 = F.col("n2"), F.col("s2"), F.col("ss2")
    se1 = ((ss1 - s1 * s1 / n1) / (n1 - F.lit(1))) / n1
    se2 = ((ss2 - s2 * s2 / n2) / (n2 - F.lit(1))) / n2
    return g.select(
        "n1",
        "n2",
        (s1 / n1).alias("mean_a"),
        (s2 / n2).alias("mean_b"),
        (s1 / n1 - s2 / n2).alias("mean_diff"),
        ((s1 / n1 - s2 / n2) / F.sqrt(se1 + se2)).alias("t_stat"),
        (
            (se1 + se2) * (se1 + se2)
            / (se1 * se1 / (n1 - F.lit(1)) + se2 * se2 / (n2 - F.lit(1)))
        ).alias("welch_df"),
    )


@register(
    "streaming_cdc_upsert",
    oracle="""
    SELECT user_id, last_ts, last_event_id, last_type, last_value
    FROM (
      SELECT user_id, ts AS last_ts, event_id AS last_event_id,
             event_type AS last_type, value AS last_value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id
    """,
    doc="Streaming CDC apply into the NATIVE Delta writer "
    "(streaming/cdc_upsert.py): each micro-batch reduces to the "
    "latest change per user (one max-of-struct aggregate) and merges "
    "with WHEN MATCHED **AND s NEWER** THEN UPDATE / WHEN NOT MATCHED "
    "INSERT — the condition makes the applied table independent of "
    "batch boundaries AND arrival order (an out-of-order batch of "
    "older changes is a conditional no-op; pinned by applying batches "
    "out of order in tests).  The bronze→silver lakehouse hop, "
    "end-to-end on this repo's own MERGE commit path, value-exact "
    "against the batch argmax oracle.",
)
def streaming_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_analytics_spark.sources import load_source
    from pg_analytics_spark.streaming.cdc_upsert import maintain_cdc_table

    with scratch_dir(spark) as work:
        tbl = f"{work}/profiles_delta"
        maintain_cdc_table(
            spark, f"{sf_dir}/events.parquet", tbl, f"{work}/ckpt"
        )
        out = load_source(spark, tbl, "delta")
        return freeze(out.orderBy("user_id"))


@register(
    "streaming_iceberg_cdc_upsert",
    oracle="""
    SELECT user_id, last_ts, last_event_id, last_type, last_value
    FROM (
      SELECT user_id, ts AS last_ts, event_id AS last_event_id,
             event_type AS last_type, value AS last_value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id
    """,
    doc="Streaming CDC apply into the NATIVE Iceberg writer "
    "(streaming/cdc_upsert.maintain_cdc_table_iceberg): the events "
    "table is split into three TIME-ORDERED source files and drained "
    "with maxFilesPerTrigger=1, so each micro-batch commits ONE "
    "equality-delete row-delta snapshot (eq-delete on the batch's "
    "keys + the batch's rows, both at sequence S — "
    "upsert_iceberg_eq) with NO target read: per-trigger cost is "
    "O(change set), the property the Delta twin's conditional MERGE "
    "lacks (it joins every batch against the target).  The trade is "
    "the changelog contract: eq upsert is last-writer-wins, so "
    "batches must arrive time-ordered — the split here IS that "
    "contract; crash-replay idempotence and out-of-order refusal "
    "live in tests/test_streaming.py.  Shares the batch argmax "
    "oracle with `streaming_cdc_upsert` and `iceberg_eq_cdc_upsert` "
    "(the shared-oracle pattern: three routes, one truth).",
)
def streaming_iceberg_cdc_upsert(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import glob as _glob
    import shutil as _shutil

    from pg_analytics_spark.sources import load_source
    from pg_analytics_spark.streaming.cdc_upsert import (
        maintain_cdc_table_iceberg,
    )

    e = table(spark, sf_dir, "events")
    lo, hi = e.agg(F.min("ts"), F.max("ts")).first()
    span = hi - lo
    cuts = (lo + span / 3, lo + 2 * span / 3)
    with scratch_dir(spark) as work:
        src = f"{work}/cdc_src"
        import os as _os

        _os.makedirs(src)
        parts = (
            e.filter(F.col("ts") < F.lit(cuts[0])),
            e.filter(
                (F.col("ts") >= F.lit(cuts[0]))
                & (F.col("ts") < F.lit(cuts[1]))
            ),
            e.filter(F.col("ts") >= F.lit(cuts[1])),
        )
        for idx, p in enumerate(parts):
            stage = f"{work}/cdc_stage{idx}"
            p.coalesce(1).write.parquet(stage)
            # the file source drains in (mtime, path) order; name the
            # files in time order so the changelog contract holds
            _shutil.copy(
                _glob.glob(f"{stage}/*.parquet")[0],
                f"{src}/{idx:03d}.parquet",
            )
        tbl = f"{work}/profiles_iceberg"
        maintain_cdc_table_iceberg(
            spark, src, tbl, f"{work}/ckpt", max_files_per_trigger=1
        )
        out = load_source(spark, tbl, "iceberg")
        return freeze(out.orderBy("user_id"))


@register(
    "streaming_txn_append",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE) AS value
    FROM events ORDER BY event_id
    """,
    doc="Exactly-once streaming APPEND into native Delta via protocol "
    "`txn` (SetTransaction) actions — streaming/cdc_upsert."
    "maintain_append_table: each micro-batch appends with "
    "txn=(app_id, batch_id), so a crash-replayed batch commits "
    "NOTHING (the Delta-native idempotence delta-spark exposes as "
    "txnAppId/txnVersion; watermarks survive checkpoints).  The "
    "bronze-layer ingest shape: no key, no merge join — per-trigger "
    "cost is O(new files), and exactly-once holds at the TABLE level "
    "even though foreachBatch is at-least-once (crash-replay pinned "
    "in tests/test_streaming.py).  Oracle: the sink must equal the "
    "source relation exactly.",
)
def streaming_txn_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pg_analytics_spark.sources import load_source
    from pg_analytics_spark.streaming.cdc_upsert import (
        maintain_append_table,
    )

    with scratch_dir(spark) as work:
        tbl = f"{work}/bronze_delta"
        maintain_append_table(
            spark, f"{sf_dir}/events.parquet", tbl, f"{work}/ckpt",
            "bronze-ingest",
        )
        out = load_source(spark, tbl, "delta").select(
            "event_id",
            "user_id",
            "event_type",
            F.col("value").cast("decimal(18,4)").cast("double").alias(
                "value"
            ),
        )
        return freeze(out.orderBy("event_id"))


@register(
    "streaming_delta_native_source",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE) AS value
    FROM events ORDER BY event_id
    """,
    doc="A native Delta table consumed AS A STREAM through the "
    "delta_native Python DataSource (sources/delta_datasource — the "
    "delta-spark streaming-source semantics on Spark 4's DataSource "
    "API, no JVM extension): the first batch is the table's current "
    "snapshot; after two more appends, a checkpoint-resumed run "
    "consumes ONLY the new commits' add actions (asserted in-row) — "
    "offsets are {'version': N} watermarks, so per-trigger cost is "
    "O(new commits), never a rescan.  The accumulated batches must "
    "equal the source relation exactly (the shared append oracle).  "
    "This closes the lakehouse loop: native writers produce the "
    "table, the change feed gives row-level diffs, and this source "
    "gives the file-level streaming tail every bronze→silver hop "
    "starts from.",
)
def streaming_delta_native_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pg_analytics_spark.sources import load_source
    from pg_analytics_spark.sources.delta_datasource import (
        register_native_datasources,
    )
    from pg_analytics_spark.sources.delta_write import write_delta

    register_native_datasources(spark)
    ev = load_source(spark, f"{sf_dir}/events.parquet", "parquet")
    with scratch_dir(spark) as work:
        tbl = f"{work}/bronze"
        ck = f"{work}/ck"
        sink = f"{work}/sink"
        write_delta(
            ev.filter(F.col("event_id") % 3 == 0), tbl, mode="overwrite"
        )
        batches: list[tuple[int, int]] = []

        def _drain() -> None:
            def fb(df: DataFrame, bid: int) -> None:
                # the batch relation is read through the Python
                # DataSource; persist so count + sink-append execute
                # the source read ONCE per batch, not twice (guide
                # §5 reuse; released before the batch returns)
                df.persist()
                try:
                    batches.append((bid, df.count()))
                    df.write.mode("append").parquet(sink)
                finally:
                    df.unpersist()

            q = (
                spark.readStream.format("delta_native")
                .option("path", tbl)
                .load()
                .writeStream.foreachBatch(fb)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        _drain()  # batch 0: the initial snapshot
        n0 = batches[0][1]
        for m in (1, 2):
            write_delta(
                ev.filter(F.col("event_id") % 3 == m), tbl, mode="append"
            )
        _drain()  # resumed: ONLY the two new commits
        assert sum(n for _, n in batches[1:]) == ev.count() - n0
        out = (
            spark.read.parquet(sink)
            .select(
                "event_id",
                "user_id",
                "event_type",
                F.col("value")
                .cast("decimal(18,4)")
                .cast("double")
                .alias("value"),
            )
        )
        return freeze(out.orderBy("event_id"))


@register(
    "streaming_delta_native_sink",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE) AS value
    FROM events ORDER BY event_id
    """,
    doc="writeStream.format('delta_native') — the native Delta table "
    "as a DIRECT streaming sink (no foreachBatch): each task stages "
    "one parquet file from its Arrow batches, the driver publishes "
    "one put-if-absent commit per epoch carrying a SetTransaction "
    "action, and a crash-replayed epoch (fresh checkpoint, same "
    "txnAppId) finds the watermark and publishes NOTHING — its "
    "staged files are removed, not committed (asserted in-row: the "
    "table equals the source relation after BOTH runs).  This is the "
    "sink shape Spark users expect from delta-spark, realized through "
    "the Python DataSource writer API.",
)
def streaming_delta_native_sink(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pg_analytics_spark.sources import load_source
    from pg_analytics_spark.sources.delta_datasource import (
        register_native_datasources,
    )
    from pg_analytics_spark.streaming.events import read_event_stream

    register_native_datasources(spark)
    ev = load_source(spark, f"{sf_dir}/events.parquet", "parquet")
    with scratch_dir(spark) as work:
        tbl = f"{work}/sink_delta"

        def run(ck: str) -> None:
            q = (
                read_event_stream(spark, f"{sf_dir}/events.parquet")
                .writeStream.format("delta_native")
                .option("path", tbl)
                .option("txnAppId", "bronze-native-sink")
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run(f"{work}/ck")
        n = load_source(spark, tbl, "delta").count()
        assert n == ev.count()
        # crash-replay: a lost checkpoint replays epoch 0 — the txn
        # watermark publishes nothing twice
        run(f"{work}/ck2")
        assert load_source(spark, tbl, "delta").count() == n
        out = load_source(spark, tbl, "delta").select(
            "event_id",
            "user_id",
            "event_type",
            F.col("value").cast("decimal(18,4)").cast("double").alias(
                "value"
            ),
        )
        return freeze(out.orderBy("event_id"))


@register(
    "streaming_iceberg_native_sink",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE) AS value
    FROM events ORDER BY event_id
    """,
    doc="writeStream.format('iceberg_native') — the native Iceberg v2 "
    "table as a DIRECT streaming sink (no foreachBatch): each task "
    "stages one parquet file under data/ with Appendix-D bounds from "
    "its own footer, the driver publishes one snapshot per epoch "
    "whose summary records (app id, epoch id) — the same watermark "
    "write_iceberg's txn uses — and a crash-replayed epoch (fresh "
    "checkpoint, same txnAppId) publishes NOTHING: staged files are "
    "removed, not committed (asserted in-row).  Shared append oracle: "
    "the table equals the source relation after both runs.",
)
def streaming_iceberg_native_sink(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pg_analytics_spark.sources import load_source
    from pg_analytics_spark.sources.delta_datasource import (
        register_native_datasources,
    )
    from pg_analytics_spark.streaming.events import read_event_stream

    register_native_datasources(spark)
    ev = load_source(spark, f"{sf_dir}/events.parquet", "parquet")
    with scratch_dir(spark) as work:
        tbl = f"{work}/sink_ice"

        def run(ck: str) -> None:
            q = (
                read_event_stream(spark, f"{sf_dir}/events.parquet")
                .writeStream.format("iceberg_native")
                .option("path", tbl)
                .option("txnAppId", "bronze-ice-sink")
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run(f"{work}/ck")
        n = load_source(spark, tbl, "iceberg").count()
        assert n == ev.count()
        run(f"{work}/ck2")  # lost checkpoint: replay publishes nothing
        assert load_source(spark, tbl, "iceberg").count() == n
        out = load_source(spark, tbl, "iceberg").select(
            "event_id",
            "user_id",
            "event_type",
            F.col("value").cast("decimal(18,4)").cast("double").alias(
                "value"
            ),
        )
        return freeze(out.orderBy("event_id"))


@register(
    "streaming_iceberg_native_source",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE) AS value
    FROM events ORDER BY event_id
    """,
    doc="A native Iceberg table consumed AS A STREAM through the "
    "iceberg_native Python DataSource (sources/iceberg_datasource — "
    "the Iceberg runtime's streaming-read semantics on Spark 4's "
    "DataSource API): the first batch is the current snapshot; a "
    "checkpoint-resumed run consumes ONLY the new main-lineage "
    "append snapshots, ordered by sequence number (asserted in-row) "
    "— so WAP-branch-staged commits never stream until published and "
    "per-trigger cost is O(new snapshots).  The accumulated batches "
    "must equal the source relation exactly (shared append oracle).",
)
def streaming_iceberg_native_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pg_analytics_spark.sources import load_source
    from pg_analytics_spark.sources.delta_datasource import (
        register_native_datasources,
    )
    from pg_analytics_spark.sources.iceberg_write import write_iceberg

    register_native_datasources(spark)
    ev = load_source(spark, f"{sf_dir}/events.parquet", "parquet")
    with scratch_dir(spark) as work:
        tbl = f"{work}/bronze_ice"
        ck = f"{work}/ck"
        sink = f"{work}/sink"
        write_iceberg(
            ev.filter(F.col("event_id") % 3 == 0), tbl, mode="overwrite"
        )
        batches: list[tuple[int, int]] = []

        def _drain() -> None:
            def fb(df: DataFrame, bid: int) -> None:
                # the batch relation is read through the Python
                # DataSource; persist so count + sink-append execute
                # the source read ONCE per batch, not twice (guide
                # §5 reuse; released before the batch returns)
                df.persist()
                try:
                    batches.append((bid, df.count()))
                    df.write.mode("append").parquet(sink)
                finally:
                    df.unpersist()

            q = (
                spark.readStream.format("iceberg_native")
                .option("path", tbl)
                .load()
                .writeStream.foreachBatch(fb)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        _drain()  # batch 0: the initial snapshot
        n0 = batches[0][1]
        for m in (1, 2):
            write_iceberg(
                ev.filter(F.col("event_id") % 3 == m), tbl, mode="append"
            )
        _drain()  # resumed: ONLY the two new append snapshots
        assert sum(n for _, n in batches[1:]) == ev.count() - n0
        out = spark.read.parquet(sink).select(
            "event_id",
            "user_id",
            "event_type",
            F.col("value").cast("decimal(18,4)").cast("double").alias(
                "value"
            ),
        )
        return freeze(out.orderBy("event_id"))


@register(
    "streaming_wap_iceberg_publish",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE) AS value
    FROM events ORDER BY event_id
    """,
    doc="The full audit-before-publish ingestion story COMPOSED "
    "end-to-end: exactly-once streaming APPEND (iceberg snapshot-"
    "summary epoch watermark, write_iceberg txn=…) INTO a WAP branch "
    "(streaming/cdc_upsert.maintain_append_table_iceberg), an audit "
    "read of the branch, then ONE pure-metadata fast_forward publish. "
    "Asserted in-row: plain readers see an EMPTY main for the whole "
    "ingest; a crash-replayed query (fresh checkpoint, same app id) "
    "commits NOTHING twice — the epoch watermark is found on the "
    "BRANCH lineage; a racing expire_snapshots cannot reclaim the "
    "staged commits (refs are retention roots); and after the publish "
    "main equals the source relation exactly (shared append oracle). "
    "This is the production shape for 100 TB continuous ingest: "
    "audits run on the branch at full fidelity, consumers never see "
    "a partial ingest, and the publish costs one metadata write.",
)
def streaming_wap_iceberg_publish(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pg_analytics_spark.sources import load_source
    from pg_analytics_spark.sources.iceberg_write import (
        expire_iceberg_snapshots,
        fast_forward_iceberg,
        write_iceberg,
    )
    from pg_analytics_spark.streaming.cdc_upsert import (
        maintain_append_table_iceberg,
    )

    src = f"{sf_dir}/events.parquet"
    with scratch_dir(spark) as work:
        tbl = f"{work}/bronze_ice"
        # seed main EMPTY under the stream's schema (branch writes
        # need an existing table to keep main at); the stream's ts is
        # session-tz TIMESTAMP while a batch parquet read may surface
        # NTZ — conform the seed to the stream's shape
        seed = load_source(spark, src, "parquet").limit(0)
        write_iceberg(
            seed.withColumn("ts", F.col("ts").cast("timestamp")),
            tbl,
            mode="overwrite",
        )
        maintain_append_table_iceberg(
            spark, src, tbl, f"{work}/ckpt", "wap-ingest", branch="audit"
        )
        # plain readers: main is still the empty seed
        assert load_source(spark, tbl, "iceberg").count() == 0
        staged = load_source(
            spark, tbl, "iceberg", {"ref": "audit"}
        ).count()
        assert staged > 0
        # crash-replay: a restarted query with a LOST checkpoint
        # replays every batch under the same app id — the epoch
        # watermark on the branch lineage makes each a no-op
        maintain_append_table_iceberg(
            spark, src, tbl, f"{work}/ckpt2", "wap-ingest",
            branch="audit",
        )
        assert (
            load_source(spark, tbl, "iceberg", {"ref": "audit"}).count()
            == staged
        )
        # a maintenance expire racing the audit window must not
        # reclaim the unpublished branch (refs are retention roots)
        expire_iceberg_snapshots(spark, tbl, retain_last=1)
        assert (
            load_source(spark, tbl, "iceberg", {"ref": "audit"}).count()
            == staged
        )
        fast_forward_iceberg(tbl, "audit")
        out = load_source(spark, tbl, "iceberg").select(
            "event_id",
            "user_id",
            "event_type",
            F.col("value").cast("decimal(18,4)").cast("double").alias(
                "value"
            ),
        )
        assert out.count() == staged
        return freeze(out.orderBy("event_id"))


@register(
    "events_markov_transition",
    oracle="""
    WITH seq AS (
      SELECT event_type AS t_from,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS t_to
      FROM events
    ),
    c AS (
      SELECT t_from, t_to, COUNT(*)::BIGINT AS n
      FROM seq WHERE t_to IS NOT NULL GROUP BY t_from, t_to
    )
    SELECT t_from, t_to, n,
           ROUND(CAST(n AS DOUBLE)
                 / CAST(SUM(n) OVER (PARTITION BY t_from) AS DOUBLE), 6)
             AS p
    FROM c
    ORDER BY t_from, t_to
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: P(next type | type) from lead() pairs — the behavioral "
    "model behind next-action prediction and anomaly scoring.  Counts "
    "are exact; each probability is ONE double division of exact "
    "BIGINTs (row-count normalization via a window over the tiny "
    "type×type relation) — value-exact.  Scale: the lead() window "
    "shuffles once on user_id with map-side projection to the two "
    "needed columns; the transition matrix itself is |types|² rows.",
)
def events_markov_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as _W

    e = table(spark, sf_dir, "events")
    seq = e.select(
        F.col("event_type").alias("t_from"),
        F.lead("event_type")
        .over(_W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("t_to"),
    ).filter(F.col("t_to").isNotNull())
    c = seq.groupBy("t_from", "t_to").agg(
        F.count("*").cast("long").alias("n")
    )
    return c.select(
        "t_from",
        "t_to",
        "n",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(_W.partitionBy("t_from")).cast("double"),
            6,
        ).alias("p"),
    ).orderBy("t_from", "t_to")


@register(
    "events_ewma_smoothing",
    oracle="""
    WITH RECURSIVE bounds AS (
      SELECT CAST(date_trunc('hour', MIN(ts)) AS TIMESTAMP) AS lo,
             CAST(date_trunc('hour', MAX(ts)) AS TIMESTAMP) AS hi
      FROM events
    ), grid AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
      FROM bounds
    ), agg AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             COUNT(*)::BIGINT AS n
      FROM events WHERE event_type = 'view' GROUP BY 1
    ), series AS (
      SELECT g.hour, COALESCE(a.n, 0) AS n,
             row_number() OVER (ORDER BY g.hour) AS rn
      FROM grid g LEFT JOIN agg a ON g.hour = a.hour
    ), rec AS (
      SELECT hour, n, rn, n * 1000000000000 AS s_fp
      FROM series WHERE rn = 1
      UNION ALL
      SELECT s.hour, s.n, s.rn,
             (s.n * 1000000000000 + 4 * r.s_fp) // 5 AS s_fp
      FROM series s JOIN rec r ON s.rn = r.rn + 1
    )
    SELECT hour, n, s_fp AS ewma_fp,
           ROUND(CAST(s_fp AS DOUBLE) / 1000000000000.0, 6) AS ewma
    FROM rec
    ORDER BY hour
    """,
    doc="Exponential smoothing (EWMA, α = 1/5) of the hourly view-"
    "count series — the classic online baseline for rate monitoring.  "
    "The recurrence s_t = (x_t + 4·s_{t-1})/5 runs ENTIRELY in BIGINT "
    "fixed-point (scale 10^12, floor division — the graph_pagerank "
    "pattern for gate-checkable iterative algorithms), so a "
    "sequential float recursion becomes value-exact cross-engine; "
    "DuckDB replays it as a recursive CTE, Spark as ONE interpreted "
    "fold over the collected hour grid (grid-sized — 720 elements — "
    "never the raw events; the corpus-scale work is the one hourly "
    "count aggregate).",
)
def events_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
            "hour"
        )
    )
    agg = (
        e.filter(F.col("event_type") == "view")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    series = grid.join(agg, "hour", "left").select(
        "hour", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    # ONE-row fold over the sorted grid: acc is array<struct<hour,n,fp>>
    folded = series.agg(
        F.sort_array(F.collect_list(F.struct("hour", "n"))).alias("xs")
    ).select(
        F.expr(
            "aggregate(xs, cast(array() AS array<struct<"
            "hour timestamp, n bigint, fp bigint>>), "
            "(acc, x) -> concat(acc, array(named_struct("
            "'hour', x.hour, 'n', x.n, "
            "'fp', IF(size(acc) = 0, x.n * 1000000000000L, "
            "(x.n * 1000000000000L + 4L * element_at(acc, -1).fp) div 5)"
            "))))"
        ).alias("r")
    )
    return (
        folded.select(F.explode("r").alias("e"))
        .select(
            F.col("e.hour").alias("hour"),
            F.col("e.n").alias("n"),
            F.col("e.fp").alias("ewma_fp"),
            F.round(
                F.col("e.fp").cast("double") / F.lit(1000000000000.0), 6
            ).alias("ewma"),
        )
        .orderBy("hour")
    )


@register(
    "events_cusum_drift",
    oracle="""
    WITH RECURSIVE bounds AS (
      SELECT CAST(date_trunc('hour', MIN(ts)) AS TIMESTAMP) AS lo,
             CAST(date_trunc('hour', MAX(ts)) AS TIMESTAMP) AS hi
      FROM events
    ), grid AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
      FROM bounds
    ), agg AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             COUNT(*)::BIGINT AS n
      FROM events WHERE event_type = 'view' GROUP BY 1
    ), series AS (
      SELECT g.hour, COALESCE(a.n, 0) AS n,
             row_number() OVER (ORDER BY g.hour) AS rn
      FROM grid g LEFT JOIN agg a ON g.hour = a.hour
    ), st AS (
      SELECT SUM(n)::BIGINT AS total, COUNT(*)::BIGINT AS nh FROM series
    ), mu AS (
      SELECT (total * 1000000000) // nh AS mu_fp,
             ((total * 1000000000) // nh) // 10 AS k_fp,
             5 * ((total * 1000000000) // nh) AS h_fp
      FROM st
    ), rec AS (
      SELECT s.hour, s.n, s.rn,
             GREATEST(0, s.n * 1000000000 - m.mu_fp - m.k_fp) AS s_fp
      FROM series s CROSS JOIN mu m WHERE s.rn = 1
      UNION ALL
      SELECT s.hour, s.n, s.rn,
             GREATEST(0, r.s_fp + s.n * 1000000000 - m.mu_fp - m.k_fp)
      FROM series s
      JOIN rec r ON s.rn = r.rn + 1
      CROSS JOIN mu m
    )
    SELECT rec.hour, rec.n, rec.s_fp AS cusum_fp,
           ROUND(CAST(rec.s_fp AS DOUBLE) / 1000000000.0, 6) AS cusum,
           rec.s_fp > m.h_fp AS alarm
    FROM rec CROSS JOIN mu m
    ORDER BY rec.hour
    """,
    doc="One-sided CUSUM drift detection over the hourly view-count "
    "series: s_t = max(0, s_{t-1} + x_t − μ − κ) with slack κ = μ/10 "
    "and alarm threshold h = 5μ — the classic sequential change-point "
    "monitor (Page 1954) behind rate-shift alerting.  The recurrence "
    "runs ENTIRELY in nonnegative BIGINT fixed-point (scale 10⁹; "
    "max(0,·) keeps every operand positive, so floor and truncating "
    "integer division agree and the row is value-exact cross-engine "
    "— the ewma precedent extended with a data-derived baseline μ "
    "computed inside the same plan).  DuckDB replays it as a "
    "recursive CTE; Spark folds the collected 720-element hour grid "
    "in ONE interpreted aggregate — grid-sized, never the raw "
    "events; the corpus-scale work is the one hourly count "
    "aggregate.",
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
            "hour"
        )
    )
    agg = (
        e.filter(F.col("event_type") == "view")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    series = grid.join(agg, "hour", "left").select(
        "hour", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    folded = (
        series.agg(
            F.sort_array(F.collect_list(F.struct("hour", "n"))).alias("xs")
        )
        .selectExpr("xs", "aggregate(xs, 0L, (a, x) -> a + x.n) AS total")
        .selectExpr(
            "xs", "(total * 1000000000L) div size(xs) AS mu_fp"
        )
        .selectExpr(
            "xs", "mu_fp", "mu_fp div 10L AS k_fp", "5L * mu_fp AS h_fp"
        )
        .select(
            F.expr(
                "aggregate(xs, cast(array() AS array<struct<"
                "hour timestamp, n bigint, s bigint>>), "
                "(acc, x) -> concat(acc, array(named_struct("
                "'hour', x.hour, 'n', x.n, "
                "'s', greatest(0L, "
                "IF(size(acc) = 0, 0L, element_at(acc, -1).s) "
                "+ x.n * 1000000000L - mu_fp - k_fp)"
                "))))"
            ).alias("r"),
            "h_fp",
        )
    )
    return (
        folded.select(F.explode("r").alias("e"), "h_fp")
        .select(
            F.col("e.hour").alias("hour"),
            F.col("e.n").alias("n"),
            F.col("e.s").alias("cusum_fp"),
            F.round(
                F.col("e.s").cast("double") / F.lit(1000000000.0), 6
            ).alias("cusum"),
            (F.col("e.s") > F.col("h_fp")).alias("alarm"),
        )
        .orderBy("hour")
    )


@register(
    "events_holt_trend_smoothing",
    oracle="""
    WITH RECURSIVE bounds AS (
      SELECT CAST(date_trunc('hour', MIN(ts)) AS TIMESTAMP) AS lo,
             CAST(date_trunc('hour', MAX(ts)) AS TIMESTAMP) AS hi
      FROM events
    ), grid AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
      FROM bounds
    ), agg AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             COUNT(*)::BIGINT AS n
      FROM events WHERE event_type = 'view' GROUP BY 1
    ), series AS (
      SELECT g.hour, COALESCE(a.n, 0) AS n,
             row_number() OVER (ORDER BY g.hour) AS rn
      FROM grid g LEFT JOIN agg a ON g.hour = a.hour
    ), rec AS (
      SELECT hour, n, rn,
             n * 1000000000 AS l_fp, CAST(0 AS BIGINT) AS b_fp
      FROM series WHERE rn = 1
      UNION ALL
      SELECT s.hour, s.n, s.rn,
             (s.n * 1000000000 + 4 * (r.l_fp + r.b_fp)) // 5 AS l_fp,
             (((s.n * 1000000000 + 4 * (r.l_fp + r.b_fp)) // 5 - r.l_fp)
              + 9 * r.b_fp) // 10 AS b_fp
      FROM series s JOIN rec r ON s.rn = r.rn + 1
    )
    SELECT hour, n, l_fp AS level_fp, b_fp AS trend_fp,
           ROUND(CAST(l_fp AS DOUBLE) / 1000000000.0, 6) AS level,
           ROUND(CAST(b_fp AS DOUBLE) / 1000000000.0, 6) AS trend,
           ROUND(CAST(l_fp + b_fp AS DOUBLE) / 1000000000.0, 6)
             AS forecast_next
    FROM rec
    ORDER BY hour
    """,
    doc="Holt's linear (double-exponential) smoothing of the hourly "
    "view-count series — level α = 1/5, trend β = 1/10, one-step "
    "forecast = level + trend: the classic trend-aware baseline "
    "that EWMA (level-only) systematically lags on ramps.  BOTH "
    "recurrences run in BIGINT fixed-point (scale 10⁹): trend goes "
    "NEGATIVE on downtrends, which is exactly why this row exists — "
    "it pins that Spark's `div` and DuckDB's `//` both truncate "
    "toward zero on negatives (probed: -7//2 = -3 in both), so the "
    "ewma/cusum integer-recurrence pattern extends to signed state.  "
    "DuckDB replays via recursive CTE, Spark as ONE fold over the "
    "720-element hour grid; corpus-scale work is the single hourly "
    "aggregate.",
)
def events_holt_trend_smoothing(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
            "hour"
        )
    )
    agg = (
        e.filter(F.col("event_type") == "view")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    series = grid.join(agg, "hour", "left").select(
        "hour", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    folded = series.agg(
        F.sort_array(F.collect_list(F.struct("hour", "n"))).alias("xs")
    ).select(
        F.expr(
            "aggregate(xs, cast(array() AS array<struct<"
            "hour timestamp, n bigint, l bigint, b bigint>>), "
            "(acc, x) -> concat(acc, array(CASE WHEN size(acc) = 0 "
            "THEN named_struct("
            "'hour', x.hour, 'n', x.n, "
            "'l', x.n * 1000000000L, 'b', 0L) "
            "ELSE named_struct("
            "'hour', x.hour, 'n', x.n, "
            "'l', (x.n * 1000000000L "
            "+ 4L * (element_at(acc, -1).l + element_at(acc, -1).b)) "
            "div 5L, "
            "'b', (((x.n * 1000000000L "
            "+ 4L * (element_at(acc, -1).l + element_at(acc, -1).b)) "
            "div 5L - element_at(acc, -1).l) "
            "+ 9L * element_at(acc, -1).b) div 10L) END)))"
        ).alias("r")
    )
    return (
        folded.select(F.explode("r").alias("e"))
        .select(
            F.col("e.hour").alias("hour"),
            F.col("e.n").alias("n"),
            F.col("e.l").alias("level_fp"),
            F.col("e.b").alias("trend_fp"),
            F.round(
                F.col("e.l").cast("double") / F.lit(1000000000.0), 6
            ).alias("level"),
            F.round(
                F.col("e.b").cast("double") / F.lit(1000000000.0), 6
            ).alias("trend"),
            F.round(
                (F.col("e.l") + F.col("e.b")).cast("double")
                / F.lit(1000000000.0),
                6,
            ).alias("forecast_next"),
        )
        .orderBy("hour")
    )


@register(
    "events_seasonal_decompose",
    oracle="""
    WITH bounds AS (
      SELECT CAST(date_trunc('hour', MIN(ts)) AS TIMESTAMP) AS lo,
             CAST(date_trunc('hour', MAX(ts)) AS TIMESTAMP) AS hi
      FROM events
    ), grid AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
      FROM bounds
    ), agg AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             COUNT(*)::BIGINT AS n
      FROM events WHERE event_type = 'click' GROUP BY 1
    ), series AS (
      SELECT g.hour, COALESCE(a.n, 0)::BIGINT AS n
      FROM grid g LEFT JOIN agg a ON g.hour = a.hour
    ), windowed AS (
      SELECT hour, n,
             SUM(n) OVER (ORDER BY hour
               ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING)::BIGINT AS sa,
             COUNT(*) OVER (ORDER BY hour
               ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING)::BIGINT AS ca,
             SUM(n) OVER (ORDER BY hour
               ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)::BIGINT AS sb,
             COUNT(*) OVER (ORDER BY hour
               ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)::BIGINT AS cb
      FROM series
    ), trended AS (
      SELECT hour, n,
             CASE WHEN ca = 24 AND cb = 24 THEN sa + sb END AS trend_num,
             EXTRACT(HOUR FROM hour)::BIGINT AS hod
      FROM windowed
    ), seasonal AS (
      SELECT hod,
             SUM(48 * n - trend_num)::BIGINT AS s_num,
             (48 * COUNT(*))::BIGINT AS s_den
      FROM trended WHERE trend_num IS NOT NULL GROUP BY hod
    )
    SELECT t.hour, t.n, t.trend_num,
           CAST(t.trend_num AS DOUBLE) / 48.0 AS trend,
           CAST(s.s_num AS DOUBLE) / CAST(s.s_den AS DOUBLE) AS seasonal,
           CAST(t.n AS DOUBLE)
             - CAST(t.trend_num AS DOUBLE) / 48.0
             - CAST(s.s_num AS DOUBLE) / CAST(s.s_den AS DOUBLE)
             AS remainder
    FROM trended t LEFT JOIN seasonal s ON t.hod = s.hod
    ORDER BY t.hour
    """,
    doc="Additive seasonal decomposition of the hourly click-count "
    "series, period 24 (classical decomposition, the moving-average "
    "variant of STL): trend = centered 2x24 moving average kept as an "
    "exact BIGINT NUMERATOR over denominator 48 (partial windows "
    "NULL), seasonal index = per-hour-of-day mean of the detrended "
    "series kept rational as (SUM(48*n - trend_num), 48*count) — the "
    "ENTIRE pipeline is integer arithmetic; doubles appear only in "
    "the final projections, each ONE correctly-rounded IEEE division "
    "or left-associative subtraction of identical operands, so every "
    "value is exact cross-engine with no rounding step (the "
    "audio-vad unrounded-division precedent; seasonal indices are "
    "raw means, not zero-centered — centering would need "
    "mixed-denominator rationals).  Plan: one hourly count shuffle, "
    "grid-sized windows, seasonal table broadcast back.  At 100 TB "
    "the corpus-scale work remains the single aggregate; windows run "
    "over the grid (hours), never the raw events.",
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
            "hour"
        )
    )
    agg = (
        e.filter(F.col("event_type") == "click")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    series = grid.join(agg, "hour", "left").select(
        "hour", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    wa = Window.orderBy("hour").rowsBetween(-12, 11)
    wb = Window.orderBy("hour").rowsBetween(-11, 12)
    trended = series.select(
        "hour",
        "n",
        F.when(
            (F.count(F.lit(1)).over(wa) == 24)
            & (F.count(F.lit(1)).over(wb) == 24),
            (F.sum("n").over(wa) + F.sum("n").over(wb)).cast("long"),
        ).alias("trend_num"),
        F.hour("hour").cast("long").alias("hod"),
    )
    # seasonal means as a WINDOW over hod instead of groupBy +
    # broadcast join back: same exact integer sums, one pass, no
    # broadcast-build job (audit: 5 jobs -> fewer, grid-sized data)
    w_hod = Window.partitionBy("hod")
    det = F.when(
        F.col("trend_num").isNotNull(),
        48 * F.col("n") - F.col("trend_num"),
    )
    seasoned = trended.select(
        "hour",
        "n",
        "trend_num",
        F.sum(det).over(w_hod).cast("long").alias("s_num"),
        (48 * F.count(det).over(w_hod)).cast("long").alias("s_den"),
    )
    trend_d = F.col("trend_num").cast("double") / F.lit(48.0)
    seas_d = F.col("s_num").cast("double") / F.col("s_den").cast("double")
    return (
        seasoned
        .select(
            "hour",
            "n",
            "trend_num",
            trend_d.alias("trend"),
            seas_d.alias("seasonal"),
            (F.col("n").cast("double") - trend_d - seas_d).alias(
                "remainder"
            ),
        )
        .orderBy("hour")
    )


@register(
    "iceberg_rewrite_data_files_roundtrip",
    oracle="""
    SELECT user_id, last_ts, last_event_id, last_type, last_value
    FROM (
      SELECT user_id, ts AS last_ts, event_id AS last_event_id,
             event_type AS last_type, value AS last_value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id
    """,
    doc="Bin-pack compaction closing the streaming-CDC small-file "
    "loop (iceberg_write.rewrite_data_files_iceberg — the runtime's "
    "`rewrite_data_files` procedure): the CDC sink mints one small "
    "row-delta data file per micro-batch (streaming_iceberg_cdc_"
    "upsert), so a long-running table accumulates small files that "
    "rewrite_manifests (r10, metadata tier) cannot fix.  The row "
    "drains 3 time-ordered micro-batches into the native Iceberg "
    "CDC table, bin-packs — rewritten rows are the VISIBLE rows "
    "(equality deletes APPLY during the rewrite scan; untouched "
    "files keep explicit original sequences so existing deletes "
    "still bind), file count drops in-row-asserted, time travel to "
    "the pre-compaction snapshot still reads — then replays the "
    "same argmax oracle the CDC trio shares (four routes, one "
    "truth).  At 100 TB this is THE steady-state maintenance story: "
    "O(small files) rewrite per partition, one replace snapshot, "
    "refs and history untouched.",
)
def iceberg_rewrite_data_files_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import glob as _glob
    import os as _os
    import shutil as _shutil

    from pg_analytics_spark.sources import load_source
    from pg_analytics_spark.sources.iceberg_write import (
        _latest_metadata,
        rewrite_data_files_iceberg,
    )
    from pg_analytics_spark.streaming.cdc_upsert import (
        maintain_cdc_table_iceberg,
    )

    e = table(spark, sf_dir, "events")
    lo, hi = e.agg(F.min("ts"), F.max("ts")).first()
    span = hi - lo
    cuts = (lo + span / 3, lo + 2 * span / 3)
    with scratch_dir(spark) as work:
        src = f"{work}/cdc_src"
        _os.makedirs(src)
        parts = (
            e.filter(F.col("ts") < F.lit(cuts[0])),
            e.filter(
                (F.col("ts") >= F.lit(cuts[0]))
                & (F.col("ts") < F.lit(cuts[1]))
            ),
            e.filter(F.col("ts") >= F.lit(cuts[1])),
        )
        for idx, p in enumerate(parts):
            stage = f"{work}/cdc_stage{idx}"
            p.coalesce(1).write.parquet(stage)
            _shutil.copy(
                _glob.glob(f"{stage}/*.parquet")[0],
                f"{src}/{idx:03d}.parquet",
            )
        tbl = f"{work}/profiles_iceberg"
        maintain_cdc_table_iceberg(
            spark, src, tbl, f"{work}/ckpt", max_files_per_trigger=1
        )
        meta_pre = _latest_metadata(_os.path.join(tbl, "metadata"))[1]
        pre_sid = meta_pre["current-snapshot-id"]
        n_rows_pre = load_source(spark, tbl, "iceberg").count()
        res = rewrite_data_files_iceberg(spark, tbl)
        # the micro-batches really packed: ≥3 small files → fewer
        if not (
            res["files_rewritten"] >= 3
            and res["files_added"] < res["files_rewritten"]
        ):
            raise EngineError(f"rewrite_data_files did not pack: {res}")
        # time travel to the pre-compaction snapshot is intact
        tt = load_source(
            spark, tbl, "iceberg", {"snapshot_id": pre_sid}
        )
        if tt.count() != n_rows_pre:
            raise EngineError("pre-compaction snapshot changed row count")
        out = load_source(spark, tbl, "iceberg")
        return freeze(out.orderBy("user_id"))


@register(
    "streaming_iceberg_sink_day_partitioned",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE) AS value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-13 00:00:00'
    ORDER BY event_id
    """,
    doc="The 100 TB streaming-ingest layout end-to-end (r12): "
    "writeStream.format('iceberg_native') with partitionBy="
    "days(ts) — each task TRANSFORMS the partition values "
    "VECTORIZED with the reader's reference semantics "
    "(arrow_part.transform_array, the Arrow twin of "
    "iceberg_prune.transform_value — parity property-pinned; r13, "
    "10x-probed flat), splits rows per day via Arrow hash group-by, "
    "stages one file per day per "
    "task, and the sessionless commit mints the day-transform spec; "
    "the read-back slices THREE DAYS out of thirty with a "
    "partition_filter, asserting in-row that the probe scans "
    "strictly fewer files than the table holds — manifest-level day "
    "pruning on sink output, the property that makes a month of "
    "clickstream queryable by slice.  Exactly-once holds: a "
    "crash-replayed epoch (fresh checkpoint, same txnAppId) "
    "publishes nothing.  Oracle: the relational day-range filter.",
)
def streaming_iceberg_sink_day_partitioned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pg_analytics_spark.errors import EngineError
    from pg_analytics_spark.sources import load_source
    from pg_analytics_spark.sources.delta_datasource import (
        register_native_datasources,
    )
    from pg_analytics_spark.streaming.events import read_event_stream

    register_native_datasources(spark)
    ev = load_source(spark, f"{sf_dir}/events.parquet", "parquet")
    with scratch_dir(spark) as work:
        tbl = f"{work}/sink_ice_days"

        def run(ck: str) -> None:
            q = (
                read_event_stream(spark, f"{sf_dir}/events.parquet")
                .writeStream.format("iceberg_native")
                .option("path", tbl)
                .option("partitionBy", "days(ts)")
                .option("txnAppId", "bronze-ice-days")
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run(f"{work}/ck")
        n = load_source(spark, tbl, "iceberg").count()
        assert n == ev.count()
        run(f"{work}/ck2")  # lost checkpoint: replay publishes nothing
        assert load_source(spark, tbl, "iceberg").count() == n
        full = load_source(spark, tbl, "iceberg")
        sliced = load_source(
            spark,
            tbl,
            "iceberg",
            {
                "partition_filter": [
                    ["ts", ">=", "2024-01-10 00:00:00"],
                    ["ts", "<", "2024-01-13 00:00:00"],
                ]
            },
        )
        n_full = len(full.inputFiles())
        n_sliced = len(sliced.inputFiles())
        if not 0 < n_sliced < n_full:
            raise EngineError(
                f"day pruning kept {n_sliced}/{n_full} files"
            )
        out = sliced.filter(
            (F.col("ts") >= "2024-01-10")
            & (F.col("ts") < "2024-01-13")
        ).select(
            "event_id",
            "user_id",
            "event_type",
            F.col("value").cast("decimal(18,4)").cast("double").alias(
                "value"
            ),
        )
        return freeze(out.orderBy("event_id"))


@register(
    "streaming_delta_sink_day_partitioned",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE) AS value
    FROM events
    WHERE CAST(ts AS DATE) >= DATE '2024-01-10'
      AND CAST(ts AS DATE) <  DATE '2024-01-13'
    ORDER BY event_id
    """,
    doc="The day-sliced streaming-ingest layout in DELTA (r13, the "
    "iceberg twin's hive-partitioned counterpart): a computed "
    "day = CAST(ts AS DATE) column partitions the "
    "writeStream.format('delta_native') sink — tasks split rows per "
    "day via Arrow hash group-by (arrow_part.group_take; no per-row "
    "Python), stage one hive-dir file per day per task with the "
    "partition column dropped from the files (the log convention), "
    "and each epoch commits exactly-once via SetTransaction.  The "
    "read-back slices three days out of thirty: planner-level "
    "partition counts assert IN-ROW that the typed date-range "
    "pushFilters prune strictly fewer files than the table holds "
    "(lexicographic comparison would keep day 9 past day 10 — the "
    "r12 typed-pruning contract), then the DataFrame re-applies the "
    "predicate for exactness.  Exactly-once holds: a crash-replayed "
    "epoch (fresh checkpoint, same txnAppId) publishes nothing.  "
    "Oracle: the relational day-range filter.",
)
def streaming_delta_sink_day_partitioned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import datetime as _dt

    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    from pg_analytics_spark.errors import EngineError
    from pg_analytics_spark.sources import load_source
    from pg_analytics_spark.sources.delta_datasource import (
        _DeltaBatchReader,
        register_native_datasources,
    )
    from pg_analytics_spark.streaming.events import read_event_stream

    register_native_datasources(spark)
    ev = load_source(spark, f"{sf_dir}/events.parquet", "parquet")
    with scratch_dir(spark) as work:
        tbl = f"{work}/sink_delta_days"

        def run(ck: str) -> None:
            q = (
                read_event_stream(spark, f"{sf_dir}/events.parquet")
                .withColumn("day", F.to_date("ts"))
                .writeStream.format("delta_native")
                .option("path", tbl)
                .option("partitionBy", "day")
                .option("txnAppId", "bronze-delta-days")
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run(f"{work}/ck")
        n = load_source(spark, tbl, "delta").count()
        assert n == ev.count()
        run(f"{work}/ck2")  # lost checkpoint: replay publishes nothing
        assert load_source(spark, tbl, "delta").count() == n
        rd = _DeltaBatchReader(tbl, None)
        n_all = len(rd.partitions())
        rd2 = _DeltaBatchReader(tbl, None)
        list(
            rd2.pushFilters(
                [
                    GreaterThanOrEqual(("day",), _dt.date(2024, 1, 10)),
                    LessThan(("day",), _dt.date(2024, 1, 13)),
                ]
            )
        )
        n_pruned = len(rd2.partitions())
        if not 0 < n_pruned < n_all:
            raise EngineError(
                f"day pruning kept {n_pruned}/{n_all} files"
            )
        out = (
            spark.read.format("delta_native")
            .option("path", tbl)
            .load()
            .filter(
                (F.col("day") >= "2024-01-10")
                & (F.col("day") < "2024-01-13")
            )
            .select(
                "event_id",
                "user_id",
                "event_type",
                F.col("value").cast("decimal(18,4)").cast("double").alias(
                    "value"
                ),
            )
        )
        return freeze(out.orderBy("event_id"))

"""Time-window aggregations over events (T5/T6, SURVEY.md §2.7).

Batch-mode versions of the streaming windows (streaming/jobs.py runs the
same aggregations under readStream + withWatermark). Window starts are
emitted as formatted strings so the DuckDB oracle compares timezone-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_dags_spark.plans.registry import register
from airflow_dags_spark.sources.tables import read_table

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


TUMBLING_ORACLE = """
SELECT
  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type,
  COUNT(*)            AS n_events,
  ROUND(SUM(value),2) AS total_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""


@register("window_tumbling_hourly", TUMBLING_ORACLE)
def window_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h windows via window(ts, '1 hour') — epoch-aligned, same
    buckets as date_trunc('hour'). One shuffle on (bucket, type); partial
    aggregation makes it O(buckets) network at any scale."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


SLIDING_ORACLE = """
WITH assigned AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start, value
  FROM events
  UNION ALL
  SELECT strftime(date_trunc('hour', ts) - INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S'), value
  FROM events
)
SELECT window_start, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
FROM assigned
GROUP BY window_start
"""


@register("window_sliding_2h_1h", SLIDING_ORACLE)
def window_sliding_2h_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h windows every 1h — each event lands in 2 windows (Spark
    expands via the window() generator; oracle mirrors with a 2-way union)."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "n_events",
            "total_value",
        )
    )


SESSION_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              >= INTERVAL 30 MINUTE
           OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
), sessioned AS (
  SELECT user_id, ts, value,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
  COUNT(*) AS n_events,
  ROUND(SUM(value), 2) AS total_value
FROM sessioned
GROUP BY user_id, session_id
"""


@register("window_session_30m", SESSION_ORACLE)
def window_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows, 30-minute gap, via session_window() — state-merging
    aggregation keyed by user (the streaming form is identical). Oracle
    reconstructs sessions with lag + running sum."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", _TS_FMT).alias("session_start"),
            "n_events",
            "total_value",
        )
    )


SESSIONIZE_ORACLE = """
WITH gaps AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id,
       CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS session_no
FROM gaps
"""


@register("sessionize_lag_cumsum", SESSIONIZE_ORACLE)
def sessionize_lag_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization via lag + cumulative sum — assigns an ordinal
    session number per user with a 30-minute inactivity gap. The window
    composition (lag → flag → running sum) shares ONE partition+sort; the
    session_window() grouping variants (window_session_30m, streaming
    session_counts) aggregate per session, this one LABELS every event."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Timestamp difference yields a day-time interval — valid for both
    # TIMESTAMP and TIMESTAMP_NTZ inputs (a direct cast to long is rejected
    # for NTZ), and avoids any session-timezone dependence.
    gap = F.col("ts") - F.lag(F.col("ts")).over(w)
    new_session = F.when(
        gap.isNull() | (gap > F.expr("INTERVAL 30 MINUTES")), F.lit(1)
    ).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        F.sum(new_session).over(run).cast("bigint").alias("session_no"),
    )


FUNNEL_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END)     AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END)    AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT
  CAST(COUNT(*) AS BIGINT)                                   AS n_users,
  CAST(COUNT(t_view) AS BIGINT)                              AS viewed,
  CAST(SUM(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT)  AS then_clicked,
  CAST(SUM(CASE WHEN t_purchase > t_click AND t_click > t_view
                THEN 1 ELSE 0 END) AS BIGINT)                AS then_purchased
FROM firsts
"""


@register("funnel_ordered_steps", FUNNEL_ORACLE)
def funnel_ordered_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): conditional-MIN pivot per
    user then ordered-step counts — one shuffle on user_id, one global agg;
    the standard product-analytics query shape."""
    ev = read_table(spark, sf_dir, "events")

    def first_ts(t):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    firsts = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("viewed"),
        F.sum(
            F.when(F.col("t_click") > F.col("t_view"), 1).otherwise(0)
        ).cast("bigint").alias("then_clicked"),
        F.sum(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("then_purchased"),
    )

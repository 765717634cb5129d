"""Temporal join queries (operators/temporal.py) over the events table.

Both are custom operators the build brief calls out (as-of join, range
join); DuckDB expresses them natively (ASOF JOIN, range predicates), so both
are full oracle-checked queries, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_dags_spark.operators.temporal import asof_join, range_join
from airflow_dags_spark.plans.registry import register
from airflow_dags_spark.sources.tables import read_table

ASOF_ORACLE = """
SELECT
  c.user_id,
  c.event_id                 AS click_id,
  ROUND(c.value, 4)          AS click_value,
  p.event_id                 AS purchase_id,
  ROUND(p.value, 4)          AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


@register("temporal_asof_join", ASOF_ORACLE)
def temporal_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click annotated with the user's latest
    at-or-before purchase. Union-window rewrite — one shuffle on user_id
    (operators/temporal.py), vs DuckDB's native ASOF JOIN."""
    ev = read_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(
        clicks, purchases, key="user_id", ts="ts", value_cols=["event_id", "value"]
    )
    return joined.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.round("value", 4).alias("click_value"),
        F.col("event_id_asof").alias("purchase_id"),
        F.round("value_asof", 4).alias("purchase_value"),
    )


RANGE_ORACLE = """
SELECT
  e.user_id,
  e.event_id            AS event_id,
  s.event_id            AS signup_id,
  ROUND(e.value, 4)     AS event_value
FROM (SELECT * FROM events WHERE event_type IN ('view', 'error')) e
JOIN (SELECT user_id, event_id, ts AS start_ts,
             ts + INTERVAL 2 HOUR AS end_ts
      FROM events WHERE event_type = 'signup') s
  ON e.user_id = s.user_id
 AND e.ts >= s.start_ts AND e.ts <= s.end_ts
"""


@register("temporal_range_join", RANGE_ORACLE)
def temporal_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment: views/errors inside the 2-hour window after
    each signup, per user. Bucketized equi-join (operators/temporal.py) —
    hash-joinable on (user, bucket) instead of a nested-loop theta join."""
    ev = read_table(spark, sf_dir, "events")
    points = ev.where(F.col("event_type").isin("view", "error")).select(
        "user_id", "ts", "event_id", "value"
    )
    intervals = ev.where(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    joined = range_join(
        points, intervals, key="user_id", ts="ts", start="start_ts", end="end_ts"
    )
    return joined.select(
        "user_id",
        "event_id",
        "signup_id",
        F.round("value", 4).alias("event_value"),
    )

"""Temporal join queries (operators/temporal.py) over the events table.

Both are custom operators the build brief calls out (as-of join, range
join); DuckDB expresses them natively (ASOF JOIN, range predicates), so both
are full oracle-checked queries, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


# --------------------------------------------------------------------------
# EWMA smoothing — recursive state, engine-portable via a list fold
# --------------------------------------------------------------------------

EWMA_ORACLE = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       ROUND(list_reduce(list(value ORDER BY ts, event_id),
                         (acc, x) -> 0.3 * x + 0.7 * acc), 6) AS ewma_value
FROM events
WHERE value IS NOT NULL
GROUP BY user_id
"""


@register("timeseries_ewma_final", EWMA_ORACLE)
def timeseries_ewma_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final EWMA (α=0.3, s₁=x₁ recursion) of each user's value series.

    No window frame expresses the recursion, so the plan folds
    ``aggregate(array_sort(collect_list(struct)))`` — ONE shuffle keyed by
    user, per-key memory bounded by that key's series. DuckDB's
    ``list_reduce`` reproduces the identical fold (same order, same float
    sequence) → exact oracle. For labeling EVERY row, or series too long to
    collect per key, use ``functions/timeseries.py:ewma_per_row``
    (applyInPandas, O(1) state)."""
    ev = read_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    seq = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    fold = F.aggregate(
        F.col("seq"),
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x["value"]).otherwise(
            x["value"] * F.lit(0.3) + acc * F.lit(0.7)
        ),
    )
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), seq.alias("seq"))
        .select(
            "user_id",
            "n_events",
            F.round(fold, 6).alias("ewma_value"),
        )
    )


# --------------------------------------------------------------------------
# Seasonal anomaly detection — z-score vs (event_type, hour-of-day) baseline
# --------------------------------------------------------------------------

ANOMALY_ORACLE = """
WITH base AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS hod, value
  FROM events WHERE value IS NOT NULL
),
scored AS (
  SELECT event_type,
         CASE WHEN stddev_samp(value) OVER w > 0
              THEN ROUND(abs((value - avg(value) OVER w)
                             / stddev_samp(value) OVER w), 6)
         END AS az
  FROM base
  WINDOW w AS (PARTITION BY event_type, hod)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN az > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
       ROUND(max(az), 4) + 0.0 AS max_abs_z
FROM scored
GROUP BY event_type
"""


@register("anomaly_seasonal_zscore", ANOMALY_ORACLE)
def anomaly_seasonal_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly scan: z-score every event against its
    (event_type, hour-of-day) population, count |z| > 3 outliers per type.

    One exchange on (event_type, hod) feeds both window moments (mean +
    stddev share the frame), then a map-side-combinable count rollup —
    the monitoring query a 100 TB event lake runs hourly. z rounded at 6dp
    BEFORE thresholding so the cutoff cannot flip on engine ulp noise."""
    ev = read_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    base = ev.select("event_type", F.hour("ts").alias("hod"), "value")
    w = Window.partitionBy("event_type", "hod")
    s = F.stddev_samp("value").over(w)
    az = F.when(
        s > 0, F.round(F.abs((F.col("value") - F.avg("value").over(w)) / s), 6)
    )
    return (
        base.withColumn("az", az)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("az") > 3, 1).otherwise(0))
            .cast("bigint")
            .alias("n_anomalies"),
            (F.round(F.max("az"), 4) + F.lit(0.0)).alias("max_abs_z"),
        )
    )

"""Round-3 registry additions: regression aggregates, sweep-line interval
concurrency, gaps-and-islands streaks, PQ ANN, two-level semantic dedup.

Registered LAST (registry.load_all order) so these append AFTER every
existing query in the driver's self-rotating verification window — new
names must never displace the queued unverified queries of the current
round (driver checks only the first 50 of ``queries()``).

Reference parity note: like the rest of §2.10, these go beyond the
reference's literal surface (its SQL lives in Postgres strings,
dags/pull_new_sales_list.py etc.) — they are the standard warehouse/
LLM-pipeline operations the engine needs for parity with what those
Postgres queries COULD express, each with a DuckDB oracle where SQL can
express it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_dags_spark.plans.registry import register
from airflow_dags_spark.sources.tables import read_table

# --- linear-regression aggregate sweep ---------------------------------------

REGR_ORACLE = """
SELECT l_returnflag,
       ROUND(regr_slope(l_extendedprice, l_quantity), 6)     AS slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
       ROUND(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
       ROUND(regr_avgx(l_extendedprice, l_quantity), 6)      AS avg_x,
       ROUND(regr_avgy(l_extendedprice, l_quantity), 6)      AS avg_y,
       ROUND(corr(l_extendedprice, l_quantity), 6)           AS pearson_r,
       ROUND(median(l_quantity), 6)                          AS median_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("regr_linear_functions", REGR_ORACLE)
def regr_linear_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard linear-regression aggregate family (regr_*): the
    one-pass distributed form — all six are moment combinations, so the
    plan is a single partial+final hash aggregate, no second pass, no
    driver math. Exact median via percentile (single extra sort-agg)."""
    li = read_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope(y, x), 6).alias("slope"),
            F.round(F.regr_intercept(y, x), 6).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.regr_count(y, x).alias("n"),
            F.round(F.regr_avgx(y, x), 6).alias("avg_x"),
            F.round(F.regr_avgy(y, x), 6).alias("avg_y"),
            F.round(F.corr(y, x), 6).alias("pearson_r"),
            F.round(F.median(x), 6).alias("median_qty"),
        )
        .orderBy("l_returnflag")
    )


# --- sweep-line interval concurrency -----------------------------------------

CONCURRENCY_ORACLE = """
WITH spans AS (
    SELECT ts AS t, 1 AS delta FROM events
    UNION ALL
    -- FLOOR before the int cast: Spark's double->int CAST truncates while
    -- DuckDB's rounds half-even; floor makes both engines agree
    SELECT ts + INTERVAL 1 MINUTE * CAST(FLOOR(value) AS INT) AS t, -1 AS delta
    FROM events
), running AS (
    SELECT t, SUM(delta) OVER (
        ORDER BY t, delta
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS live
    FROM spans
)
SELECT STRFTIME(t, '%Y-%m-%d')     AS day,
       CAST(MAX(live) AS BIGINT)   AS max_concurrent
FROM running
GROUP BY STRFTIME(t, '%Y-%m-%d')
ORDER BY day
"""


@register("events_max_concurrency", CONCURRENCY_ORACLE)
def events_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day by sweep line: each event spans
    [ts, ts + value minutes); +1/-1 boundary deltas, one global running sum,
    max per day. Ends sort before starts at equal timestamps (delta asc) —
    half-open intervals, consistently on both engines.

    Scale note: the running sum is a GLOBAL order — inherently one ordered
    pass. Spark executes it as a range-partitioned sort (no single-node
    bottleneck until the final per-partition prefix merge, which AQE handles
    with a tiny cumulative-offset exchange); at 100 TB you'd bucket by
    coarse time range first and sweep within buckets, carrying bucket
    offsets — same rewrite window_cumulative_distinct documents."""
    ev = read_table(spark, sf_dir, "events")
    starts = ev.select(F.col("ts").alias("t"), F.lit(1).alias("delta"))
    ends = ev.select(
        F.expr("ts + make_interval(0,0,0,0,0, CAST(FLOOR(value) AS INT), 0)").alias("t"),
        F.lit(-1).alias("delta"),
    )
    from pyspark.sql import Window

    w = (
        Window.orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = starts.unionByName(ends).withColumn("live", F.sum("delta").over(w))
    return (
        running.groupBy(F.date_format("t", "yyyy-MM-dd").alias("day"))
        .agg(F.max("live").alias("max_concurrent"))
        .orderBy("day")
    )


# --- gaps-and-islands: consecutive-day activity streaks ----------------------

STREAKS_ORACLE = """
WITH days AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), grouped AS (
    SELECT user_id, d,
           d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS INT)
             AS island
    FROM days
), islands AS (
    SELECT user_id, island, COUNT(*) AS len FROM grouped
    GROUP BY user_id, island
)
SELECT user_id,
       CAST(MAX(len) AS BIGINT)  AS longest_streak,
       CAST(COUNT(*) AS BIGINT)  AS n_islands
FROM islands
GROUP BY user_id
ORDER BY user_id
"""


@register("gaps_islands_streaks", STREAKS_ORACLE)
def gaps_islands_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user — the classic
    gaps-and-islands rewrite: day − row_number is constant within a run of
    consecutive days, so islands fall out of one window + one groupBy
    (both shuffles on user_id, and AQE coalesces them to one exchange
    reuse). No self-join, no iteration."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("d"))
    grouped = days.withColumn("island", F.date_sub(F.col("d"), rn))
    islands = grouped.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.max("len").alias("longest_streak"),
            F.count(F.lit(1)).alias("n_islands"),
        )
        .orderBy("user_id")
    )


# --- PQ ANN + two-level semantic dedup (rows-only: seeded-fit internals) -----


@register("sim_ann_pq_topk", None)  # sampled codebook fit → rows-only
def sim_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN over the embeddings table: corpus stored as
    m one-byte codes, queries scan via per-subspace LUTs (ADC), exact
    re-rank of the top-3k. Recall vs brute force is pytest-bounded
    (tests/test_approx_ops.py)."""
    from airflow_dags_spark.operators.similarity import pq_ann_topk

    emb = read_table(spark, sf_dir, "embeddings")
    return pq_ann_topk(
        emb, 10, query_filter=F.col("vec_id") < 5, m=8, n_codes=32, refine=30
    )


@register("dedup_semantic_twolevel", None)  # k-means fit is engine-internal
def dedup_semantic_twolevel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level SemDeDup: bounded coarse quantizer + per-oversized-cell
    sub-quantizers — the shape that keeps broadcast size bounded when the
    n/target rule would exceed the cluster cap. Summarized per final cell;
    equivalence to the single-level rule inside final cells is
    pytest-verified (tests/test_clustering.py)."""
    from airflow_dags_spark.operators.clustering import semantic_dedup_two_level

    emb = read_table(spark, sf_dir, "embeddings")
    marked = semantic_dedup_two_level(
        emb, 0.15, coarse_clusters=4, target_cluster_size=100, split_factor=2
    )
    return (
        marked.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.col("kept").cast("bigint")).alias("n_kept"),
            F.max("best_lower_sim").alias("max_dup_sim"),
        )
        .orderBy("cluster")
    )

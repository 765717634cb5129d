"""Mergeable-sketch aggregates (Apache DataSketches, built into Spark 4).

THE 100 TB pre-aggregation pattern: per-partition/per-day sketches are
small (KB), associative, and stored like any other column — daily distinct
counts, quantiles, and set overlaps over a year of 100 TB days are then
answered by MERGING 365 sketches instead of rescanning the lake. The
reference has no analogue (Postgres COUNT(DISTINCT) rescans); this is the
engine-native replacement.

Sketch internals are engine-specific (DuckDB's HLL differs from
DataSketches), so these register rows-only for the driver; accuracy is
pytest-bounded against exact answers (tests/test_sketches.py), and the
merge laws (union-of-sketches ≈ sketch-of-union) are asserted directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_dags_spark.plans.registry import register
from airflow_dags_spark.sources.tables import read_table


@register("sketch_hll_daily_users", None)  # sketch bytes are engine-private
def sketch_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day HLL sketches of active users + the MERGED all-time estimate.

    Shape: one shuffle to (day) groups building per-day sketches (map-side
    partial sketch merge — the shuffle carries sketches, not user ids),
    then a single hll_union_agg over |days| sketch rows. At 100 TB the
    per-day sketches would persist to a summary table; the union step then
    never touches raw data."""
    e = read_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    return (
        daily.select(
            "day",
            F.hll_sketch_estimate("sk").alias("est_users"),
        )
        .unionByName(
            daily.agg(
                F.lit(None).cast("date").alias("day"),
                F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(
                    "est_users"
                ),
            )
        )
    )


@register("sketch_kll_price_quantiles", None)  # sketch bytes engine-private
def sketch_kll_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile sketches of order value per priority, merged to global
    p50/p95/p99 — the mergeable form of percentile_approx: per-group (or
    per-day) sketches persist, and any rollup is a sketch merge."""
    o = read_table(spark, sf_dir, "orders")
    per_prio = o.groupBy("o_orderpriority").agg(
        F.kll_sketch_agg_double("o_totalprice").alias("sk")
    )
    grouped = per_prio.select(
        "o_orderpriority",
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.5)), 2).alias("p50"),
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.95)), 2).alias("p95"),
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.99)), 2).alias("p99"),
    )
    # kll_sketch_merge_double is a BINARY scalar merge (no union aggregate
    # exists for KLL) — fold the |groups| collected sketches; the list is
    # |groups| KB-sized blobs, never data rows
    merged = per_prio.agg(F.collect_list("sk").alias("sks")).select(
        F.aggregate(
            F.slice(F.col("sks"), 2, F.greatest(F.size("sks") - 1, F.lit(0))),
            F.element_at(F.col("sks"), 1),
            lambda acc, x: F.kll_sketch_merge_double(acc, x),
        ).alias("mk")
    ).select(
        F.lit("ALL").alias("o_orderpriority"),
        F.round(F.kll_sketch_get_quantile_double("mk", F.lit(0.5)), 2).alias("p50"),
        F.round(F.kll_sketch_get_quantile_double("mk", F.lit(0.95)), 2).alias("p95"),
        F.round(F.kll_sketch_get_quantile_double("mk", F.lit(0.99)), 2).alias("p99"),
    )
    return grouped.unionByName(merged)


# --------------------------------------------------------------------------
# Portable Bloom filter membership (functions/probabilistic.py)
# --------------------------------------------------------------------------

# DuckDB mirror of the portable md5 hash: same salt|key string, same first-8
# hex chars, same modulus — bit-for-bit the Spark sketch.
_BLOOM_H = (
    "(('0x' || substr(md5(CAST(t.i AS VARCHAR) || '|' || CAST({key} AS VARCHAR))"
    ", 1, 8))::BIGINT % 65536)"
)

BLOOM_ORACLE = f"""
WITH bloom AS (
  SELECT h // 32 AS word_idx, bit_or(1::BIGINT << CAST(h % 32 AS INT)) AS word
  FROM (
    SELECT {_BLOOM_H.format(key='o_custkey')} AS h
    FROM orders CROSS JOIN range(4) t(i)
  )
  GROUP BY 1
),
probe AS (
  SELECT c_custkey, {_BLOOM_H.format(key='c_custkey')} AS h
  FROM customer CROSS JOIN range(4) t(i)
),
hits AS (
  SELECT p.c_custkey,
         bool_and(coalesce(
           (b.word & (1::BIGINT << CAST(p.h % 32 AS INT))) != 0, false
         )) AS might_contain
  FROM probe p LEFT JOIN bloom b ON b.word_idx = p.h // 32
  GROUP BY 1
)
SELECT h.might_contain,
       coalesce(a.has_orders, false) AS has_orders,
       count(*) AS n_customers
FROM hits h
LEFT JOIN (
  SELECT DISTINCT o_custkey AS c_custkey, true AS has_orders FROM orders
) a USING (c_custkey)
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("sketch_bloom_membership", BLOOM_ORACLE)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership audit: build the portable Bloom table over
    orders' customer keys, probe EVERY customer, and report the confusion
    matrix (might_contain × has_orders). The false-negative cell is
    structurally empty — which the exact DuckDB oracle proves — and the
    false-positive cell measures the configured ~4% FP rate.

    Scale shape: build is one exchange collapsing to ≤ m/32 = 2048 rows;
    probe broadcasts those rows and streams the 100 TB side. This is the
    seen-list pattern for incremental ingest (skip already-crawled URLs /
    already-ingested fingerprints) without a join against the corpus."""
    from airflow_dags_spark.functions.probabilistic import (
        bloom_build,
        bloom_might_contain,
    )

    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    bloom = bloom_build(o, "o_custkey")
    probed = bloom_might_contain(bloom, c.select("c_custkey"), "c_custkey")
    actual = (
        o.select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("has_orders", F.lit(True))
    )
    return (
        probed.join(actual, "c_custkey", "left")
        .groupBy(
            "might_contain",
            F.coalesce("has_orders", F.lit(False)).alias("has_orders"),
        )
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


_CMS_H = (
    "(('0x' || substr(md5(CAST({salt} AS VARCHAR) || '|' || "
    "CAST(l_partkey AS VARCHAR)), 1, 8))::BIGINT % 2048)"
)

CMS_ORACLE = f"""
WITH cms AS (
  SELECT r, b, count(*) AS cnt FROM (
    SELECT t.i AS r, {_CMS_H.format(salt='t.i')} AS b
    FROM lineitem CROSS JOIN range(4) t(i)
  ) GROUP BY r, b
),
top AS (
  SELECT l_partkey, count(*) AS true_cnt FROM lineitem GROUP BY 1
  ORDER BY true_cnt DESC, l_partkey LIMIT 20
)
SELECT t.l_partkey, t.true_cnt, min(coalesce(c.cnt, 0)) AS cms_est
FROM top t CROSS JOIN range(4) r(i)
LEFT JOIN cms c ON c.r = r.i AND c.b = {_CMS_H.format(salt='r.i').replace('l_partkey', 't.l_partkey')}
GROUP BY 1, 2
"""


@register("sketch_cms_heavy_hitters", CMS_ORACLE)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters: estimate the order-line count of the top-20
    parts from a fixed 4×2048-counter sketch and report estimate vs truth
    (CMS guarantees est ≥ true; the oracle checks the exact collision
    pattern, not a tolerance).

    Scale shape: the sketch is one exchange collapsing to ≤ 8192 rows
    regardless of input size, then broadcasts to the probe side. At 100 TB
    the sketch would persist per-partition (mergeable by summing counters,
    see ``cms_merge``) and heavy-hitter monitoring never rescans the lake;
    the exact top-20 here exists only to audit the estimates."""
    from airflow_dags_spark.functions.probabilistic import cms_build, cms_estimate

    li = read_table(spark, sf_dir, "lineitem")
    cms = cms_build(li, "l_partkey")
    top = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), "l_partkey")
        .limit(20)
    )
    return cms_estimate(cms, top, "l_partkey")


@register("sketch_theta_source_overlap", None)  # sketch bytes engine-private
def sketch_theta_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketches of document fingerprints per source: per-source
    distinct estimates — the dedup-planning dashboard query ('how much
    distinct content does each feed contribute?'). Theta (unlike HLL)
    also supports set intersection/difference when planning cross-feed
    dedup budgets."""
    from airflow_dags_spark.functions.text import fingerprint

    d = read_table(spark, sf_dir, "documents")
    return (
        d.select("source", fingerprint("text").alias("fp"))
        .groupBy("source")
        .agg(F.theta_sketch_agg("fp").alias("sk"))
        .select(
            "source",
            F.theta_sketch_estimate("sk").alias("est_distinct_docs"),
        )
    )


@register("outlier_kll_gate", None)  # sketch quantiles are engine-private
def outlier_kll_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of ``outlier_iqr_gate``: Tukey fences from KLL
    SKETCH quantiles instead of exact percentiles. The exact form's
    ``percentile`` buffers every value per group; the sketch form is a
    KB-sized mergeable aggregate — same single-pass shape (1-row bounds
    broadcast + streamed filter), bounded memory at any scale, and the
    per-day/per-partition sketches can persist so the fences come from a
    summary table, not a rescan.

    Accuracy vs the exact gate is pytest-bounded (tests/test_sketches.py):
    KLL rank error ~1% moves the fence a little, so only rows NEAR the
    fence can flip — the test measures that symmetric difference."""
    o = read_table(spark, sf_dir, "orders")
    b = (
        o.agg(F.kll_sketch_agg_double("o_totalprice").alias("sk"))
        .select(
            F.kll_sketch_get_quantile_double("sk", F.lit(0.25)).alias("p25"),
            F.kll_sketch_get_quantile_double("sk", F.lit(0.75)).alias("p75"),
        )
    )
    iqr = F.col("p75") - F.col("p25")
    return (
        o.crossJoin(F.broadcast(b))
        .where(
            (F.col("o_totalprice") < F.col("p25") - 1.5 * iqr)
            | (F.col("o_totalprice") > F.col("p75") + 1.5 * iqr)
        )
        .select(
            "o_orderkey",
            "o_totalprice",
            (F.col("o_totalprice") > F.col("p75") + 1.5 * iqr).alias("high"),
        )
    )

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

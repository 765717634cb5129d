"""Error bounds for the sketch-based aggregates (rows-only query
agg_approx_stats) against their exact counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_dags_spark.plans import registry
from airflow_dags_spark.sources.tables import read_table

registry.load_all()

SF_DIR = "/root/testdata/sf0.01"


def test_approx_stats_within_error_bounds(spark):
    approx = registry.QUERIES["agg_approx_stats"](spark, SF_DIR).collect()[0]
    li = read_table(spark, SF_DIR, "lineitem")
    exact = li.agg(
        F.countDistinct("l_partkey").alias("parts"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
    ).collect()[0]
    # HLL with rsd=2%: allow 4 sigma
    assert abs(approx["approx_parts"] - exact["parts"]) / exact["parts"] < 0.08
    # t-digest at accuracy 10000: tight on this data
    assert abs(approx["approx_p50"] - exact["p50"]) / exact["p50"] < 0.02
    assert abs(approx["approx_p90"] - exact["p90"]) / exact["p90"] < 0.02

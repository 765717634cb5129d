"""Bucketed-layout tests: the co-located join really is shuffle-free, and
results are identical to the plain join (the layout is physical only)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from airflow_dags_spark.operators.bucketing import colocated_join, write_bucketed
from airflow_dags_spark.sources.tables import read_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    o = read_table(spark, SF_DIR, "orders")
    li = read_table(spark, SF_DIR, "lineitem")
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "orderkey"),
        "orders_b", ["orderkey"], 8, sort_cols=["orderkey"],
        path=str(warehouse / "orders_b"),
    )
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "orderkey"),
        "lineitem_b", ["orderkey"], 8, sort_cols=["orderkey"],
        path=str(warehouse / "lineitem_b"),
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    # disable broadcast so the test exercises the big-big join shape this
    # layout exists for (at sf0.001 everything fits a broadcast)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "lineitem_b", "orders_b", ["orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # the whole point: both scans feed the join without repartitioning
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, bucketed):
    o = read_table(spark, SF_DIR, "orders")
    li = read_table(spark, SF_DIR, "lineitem")
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )
    bucked = (
        colocated_join(spark, "lineitem_b", "orders_b", ["orderkey"])
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, bucked.collect()))


def test_bucketed_agg_reuses_layout(spark, bucketed):
    """groupBy on the bucket key also skips the exchange (the table is
    already hash-distributed on it)."""
    agg = (
        spark.table("lineitem_b")
        .groupBy("orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan

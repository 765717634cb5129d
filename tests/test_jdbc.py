"""JDBC edge (sources/jdbc.py) — REAL roundtrips against the Derby embedded
database that ships in Spark's jars (in-memory, same JVM as local executors).

Maps the reference's psycopg2 edge (``pull_new_sales_list.py:87-103``):
batched writes, partitioned parallel reads, predicate pushdown."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_dags_spark.sources.jdbc import read_jdbc, write_jdbc

URL = "jdbc:derby:memory:graft_jdbc_tests;create=true"
DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _roundtrip(spark, table, rows, schema):
    df = spark.createDataFrame(rows, schema)
    write_jdbc(df, URL, table, mode="overwrite", driver=DRIVER, batchsize=500)
    return read_jdbc(spark, URL, table, driver=DRIVER)


def test_write_then_read_roundtrip(spark):
    back = _roundtrip(
        spark,
        "t_basic",
        [(1, "a"), (2, "b"), (3, None)],
        "id int, name string",
    )
    got = sorted((r[0], r[1]) for r in back.collect())
    assert got == [(1, "a"), (2, "b"), (3, None)]


def test_append_mode_accumulates(spark):
    df = spark.createDataFrame([(1, "x")], "id int, name string")
    write_jdbc(df, URL, "t_append", mode="overwrite", driver=DRIVER)
    write_jdbc(df, URL, "t_append", mode="append", driver=DRIVER)
    back = read_jdbc(spark, URL, "t_append", driver=DRIVER)
    assert back.count() == 2


def test_partitioned_read_with_explicit_bounds(spark):
    rows = [(i, f"n{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "id int, name string")
    write_jdbc(df, URL, "t_part", mode="overwrite", driver=DRIVER)
    back = read_jdbc(
        spark,
        URL,
        "t_part",
        driver=DRIVER,
        partition_column="id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=99,
    )
    # the scan really splits into stride ranges — 4 partitions, no row lost
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
    assert back.agg(F.sum(back.columns[0])).first()[0] == sum(range(100))


def test_partitioned_read_discovers_bounds(spark):
    rows = [(i, i * 10) for i in range(7, 57)]
    df = spark.createDataFrame(rows, "id int, v int")
    write_jdbc(df, URL, "t_bounds", mode="overwrite", driver=DRIVER)
    back = read_jdbc(
        spark,
        URL,
        "t_bounds",
        driver=DRIVER,
        partition_column="id",
        num_partitions=3,
    )
    assert back.count() == 50
    assert back.rdd.getNumPartitions() == 3


def test_partition_args_must_come_together(spark):
    with pytest.raises(ValueError, match="together"):
        read_jdbc(spark, URL, "t_basic", partition_column="id")


def test_filter_pushes_into_jdbc_scan(spark):
    _roundtrip(
        spark, "t_push", [(i, f"n{i}") for i in range(50)], "id int, name string"
    )
    df = read_jdbc(spark, URL, "t_push", driver=DRIVER)
    id_col = df.columns[0]
    filtered = df.where(F.col(id_col) < 10).select(id_col)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    # Catalyst ships the predicate to the database, not a post-scan Filter
    assert "PushedFilters" in plan and "LessThan" in plan
    assert filtered.count() == 10


def test_write_num_partitions_caps_connections(spark):
    df = spark.createDataFrame(
        [(i, "x") for i in range(40)], "id int, name string"
    ).repartition(8)
    # must not raise; coalesce(2) bounds concurrent connections at 2
    write_jdbc(
        df, URL, "t_conncap", mode="overwrite", driver=DRIVER, num_partitions=2
    )
    assert read_jdbc(spark, URL, "t_conncap", driver=DRIVER).count() == 40

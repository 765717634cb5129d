"""Parquet table scans over the driver test data (S6/S7 analogs).

The reference reads Postgres tables with manual projection/predicate
(``dags/pull_new_sales_list.py:87-103``, ``dags/rightmove_outcodes.py:50-55``);
here scans are declarative — Catalyst pushes filters and prunes columns into
the parquet reader, so callers just ``read_table(...).select(...).where(...)``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_dags_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one synthetic table. Plain parquet: column pruning and predicate
    pushdown are automatic; at 100 TB the same call reads a partitioned
    lakehouse path and additionally prunes partitions.

    events.ts is stored as TIMESTAMP(NANOS) — Spark reads it as epoch-nanos
    bigint (legacy.parquet.nanosAsLong) and we convert here with integer
    division (floor to micros, matching DuckDB's ns→µs read)."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Scan several tables at once; returns {name: DataFrame}."""
    return {name: read_table(spark, sf_dir, name) for name in names}


def table_exists(spark: SparkSession, path: str) -> bool:
    """Existence probe for a path-backed table — the engine analog of the
    reference's information_schema check (dags/monthly_price_paid_data.py:65-71).

    Catalog-registered tables would use spark.catalog.tableExists; the engine
    is lakehouse-path-native, so probe the filesystem through the JVM's
    Hadoop FS (works for s3a:// and hdfs:// paths too, unlike os.path).
    """
    sc = spark.sparkContext
    hadoop_path = sc._jvm.org.apache.hadoop.fs.Path(path)  # type: ignore[union-attr]
    fs = hadoop_path.getFileSystem(sc._jsc.hadoopConfiguration())  # type: ignore[union-attr]
    return bool(fs.exists(hadoop_path))


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> None:
    """Register tables as temp views so the SQL surface (spark.sql) works
    end-to-end — the engine analog of the reference's named Postgres tables."""
    for name in names:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)

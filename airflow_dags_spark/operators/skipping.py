"""File-level data skipping (zone maps / manifest pruning).

Parquet already prunes ROW GROUPS from min/max footer stats, but at 100 TB
a scan still opens every footer of every file. Lakehouse formats fix this
with a file-level stats manifest (Delta add-file stats, Iceberg manifests);
this module is the plain-parquet equivalent:

- ``collect_file_stats``  — one pass building ``(file_path, n_rows,
  min_<col>, max_<col>, ...)`` via the ``_metadata`` hidden column: the
  zone-map table. One shuffle keyed by file path (|files| groups); persist
  it next to the table and maintain it incrementally on append.
- ``prune_files``         — the manifest query: which files can contain
  rows in ``[lo, hi]``. Runs on the stats table (|files| rows, KBs), never
  the data.
- ``read_with_skipping``  — scan only surviving files + apply the residual
  predicate. The collect here is the FILE LIST — bounded by file count
  (thousands of rows at 100 TB), the same driver-side manifest read every
  table format performs when planning a scan.

Effectiveness is a layout property: combine with
``maintenance.zorder_layout`` (or a plain range-sort on the filter column)
so per-file bounding boxes are tight — the zorder clustering-quality test
measures exactly the volume this pruning exploits.

Reference parity: the reference leans on Postgres B-tree indexes for
selective reads (SURVEY §2.2 K7); partition pruning covers the coarse key
(`ParquetTable(partition_by=...)`), and this zone-map path covers
secondary, non-partition columns.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def collect_file_stats(
    spark: SparkSession, path: str, cols: Sequence[str]
) -> DataFrame:
    """Zone-map table: per data file, row count + min/max of ``cols``."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return (
        df.select(F.col("_metadata.file_path").alias("file_path"), *cols)
        .groupBy("file_path")
        .agg(*aggs)
    )


def prune_files(
    stats: DataFrame, col: str, lo: Any = None, hi: Any = None
) -> list[str]:
    """Files whose [min, max] range intersects [lo, hi] (None = unbounded).

    NULL stats (all-null file for ``col``) are conservatively kept: min/max
    aggregates skip nulls, so an all-null file has NULL bounds and cannot
    prove non-overlap."""
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (F.col(f"max_{col}").isNull() | (F.col(f"max_{col}") >= lo))
    if hi is not None:
        cond = cond & (F.col(f"min_{col}").isNull() | (F.col(f"min_{col}") <= hi))
    return [r["file_path"] for r in stats.where(cond).select("file_path").collect()]


def read_with_skipping(
    spark: SparkSession,
    path: str,
    col: str,
    lo: Any = None,
    hi: Any = None,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Range scan that opens only the files the zone map cannot rule out.

    Pass a persisted ``stats`` table for planning without touching data;
    without one this degrades gracefully (stats built in one extra pass —
    the backfill path, still cheaper than N full scans if reused)."""
    if stats is None:
        stats = collect_file_stats(spark, path, [col])
    files = prune_files(stats, col, lo, hi)
    if not files:
        return spark.createDataFrame([], spark.read.parquet(path).schema)
    df = spark.read.parquet(*files)
    if lo is not None:
        df = df.where(F.col(col) >= lo)
    if hi is not None:
        df = df.where(F.col(col) <= hi)
    return df

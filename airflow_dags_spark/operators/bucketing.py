"""Bucketed-table layout (SURVEY.md §1.5, SCALE.md relational notes).

The engine's answer to the reference's `CREATE INDEX` (K7) has two tiers:
partitioning for pruning (operators/upsert.py ``partition_by``) and
BUCKETING for join co-location. A fact table bucketed by its join key is
pre-shuffled on disk: joining two tables bucketed by the same key into the
same bucket count needs NO exchange at read time — at 100 TB that deletes
the single largest shuffle in the workload (orders⋈lineitem).

Bucketing requires the session catalog (bucket metadata lives there, not in
parquet footers), so these helpers use ``saveAsTable`` names, unlike the
path-based ParquetTable. Proven shuffle-free by
tests/test_bucketing.py::test_bucketed_join_has_no_exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    *,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally sort-within-bucket) table.

    ``sortBy`` additionally gives in-bucket ordering → parquet min/max row
    groups align with the sort key, the engine's stand-in for a secondary
    index on high-selectivity point lookups (K7). ``path`` makes it an
    external table (catalog keeps only the bucket spec).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read back with bucket metadata intact (spark.table, not read.parquet —
    a path read would discard the bucket spec and reintroduce the shuffle)."""
    return spark.table(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-key same-bucket-count tables without an exchange."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on, how
    )

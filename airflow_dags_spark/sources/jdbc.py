"""JDBC edge — thin, scale-aware wrappers over ``spark.read/write.jdbc``.

Maps the reference's psycopg2 edge (SURVEY.md §1.5): the hand-rolled
``execute_values(..., page_size=batch)`` upsert loop in
``/root/reference/dags/pull_new_sales_list.py:87-103`` becomes the JDBC
writer's ``batchsize`` option, and its full-table ``SELECT`` reads become
partitioned parallel scans.

Scale rules encoded here:

- **Reads parallelize only with explicit bounds.** A bare ``dbtable`` read is
  ONE task pulling the whole table through one connection — fine for dims,
  a non-starter for facts. ``partition_column`` + ``num_partitions`` (+
  bounds, auto-discovered via one MIN/MAX query when omitted) splits the
  scan into stride-ranged queries, one connection per partition.
- **Writes batch and bound connections.** ``batchsize`` controls rows per
  INSERT round-trip (the reference's page_size); ``num_partitions`` caps
  concurrent connections via coalesce — a 1000-executor cluster must not
  open 1000 connections against one Postgres.
- **Pushdown still applies**: filters/projections on the returned DataFrame
  compile into the generated JDBC subquery (Catalyst JDBC pushdown), so
  ``read_jdbc(...).where(...)`` ships the predicate to the database.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    driver: str | None = None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    fetchsize: int = 10_000,
    options: dict | None = None,
) -> DataFrame:
    """Read a JDBC table (or ``(subquery) alias``) as a DataFrame.

    With ``partition_column`` + ``num_partitions`` the scan is parallel; if
    bounds are omitted they're discovered with a single MIN/MAX query (one
    cheap round-trip, same as Sqoop's default split discovery).
    """
    if (partition_column is None) != (num_partitions is None):
        raise ValueError(
            "partition_column and num_partitions must be given together"
        )

    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", fetchsize)
    )
    if driver:
        reader = reader.option("driver", driver)

    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            # ANSI-quote the column: Spark's JDBC writer creates quoted
            # (case-preserved) identifiers, so the probe must quote too
            qcol = '"' + partition_column.replace('"', '""') + '"'
            bounds_sql = (
                f"(SELECT MIN({qcol}) AS lo, "
                f"MAX({qcol}) AS hi FROM {table}) b"
            )
            b = (
                spark.read.format("jdbc")
                .option("url", url)
                .option("dbtable", bounds_sql)
                .options(**({"driver": driver} if driver else {}))
                .load()
                .first()
            )
            lo = b[0] if lower_bound is None else lower_bound
            hi = b[1] if upper_bound is None else upper_bound
            if lo is None or hi is None:  # empty table: single-partition read
                return reader.load()
            lower_bound, upper_bound = int(lo), int(hi)
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", int(num_partitions))
            .option("lowerBound", int(lower_bound))
            .option("upperBound", int(upper_bound))
        )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    driver: str | None = None,
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    isolation_level: str = "READ_COMMITTED",
    options: dict | None = None,
) -> None:
    """Write ``df`` to a JDBC table with batched inserts.

    ``batchsize`` = rows per INSERT round-trip (reference page_size=100,
    ``pull_new_sales_list.py:103``; default here is DB-friendly 10k).
    ``num_partitions`` caps concurrent connections (coalesce, no shuffle).
    """
    out = df.coalesce(int(num_partitions)) if num_partitions else df
    writer = (
        out.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", int(batchsize))
        .option("isolationLevel", isolation_level)
        .mode(mode)
    )
    if driver:
        writer = writer.option("driver", driver)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save()


__all__ = ["read_jdbc", "write_jdbc"]

"""SparkSession factory with scale-oriented defaults.

The engine targets a 1000-executor cluster over ~100 TB; tests run on
``local[N]``. Every conf here is chosen for the big cluster and is harmless
locally:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing) so a
  fixed ``spark.sql.shuffle.partitions`` is a ceiling, not a bet.
- Arrow on for every pandas UDF / ``applyInPandas`` boundary.
- UTC session timezone — the reference runs UTC
  (``scripts/airflow_home/airflow.cfg:43``) and the DuckDB correctness
  oracle is timezone-naive.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that must hold on any cluster running this engine. Values are
# runtime-settable (not frozen at session start) unless noted.
ENGINE_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # 64 MiB advisory post-shuffle partition size: big enough to amortize
    # task overhead at 100 TB, small enough to fit executor memory.
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Broadcast anything under 64 MiB — dimension tables (region, nation,
    # areas) stay broadcast even at 100 TB fact scale.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Null-safe, permissive casts by default; operators use try_* forms
    # where the reference used errors='coerce'.
    "spark.sql.ansi.enabled": "false",
    # The driver's events.parquet stores TIMESTAMP(NANOS) which Spark has no
    # native type for; read as epoch-nanos bigint and convert at the scan
    # (sources.tables.read_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # zstd for every parquet the engine writes: ~25-40% smaller than snappy
    # on text-heavy corpora at similar scan speed — at 100 TB that is pure
    # storage + scan-I/O savings; decode stays JVM-native and vectorized.
    "spark.sql.parquet.compression.codec": "zstd",
}


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply engine confs to an externally-created session (driver harness).

    Only runtime-settable confs are applied; failures on static confs are
    ignored so a shared session is never broken.
    """
    for key, value in ENGINE_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            pass
    # Size the shuffle to the session's actual parallelism when the caller
    # left Spark's static 200 default in place. 200 reducers on a local[8]
    # driver session is 25× task overhead for zero parallelism gain (and
    # 25× the block-manager bookkeeping across a 100-query run); on a real
    # cluster defaultParallelism = total executor cores, the right AQE
    # initial partition count for coalescing to shrink from.
    try:
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            cores = spark.sparkContext.defaultParallelism
            spark.conf.set("spark.sql.shuffle.partitions", str(max(cores, 8)))
    except Exception:
        pass
    return spark


def get_spark(
    app_name: str = "airflow_dags_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default all
    cores) so tests and bench share one code path; on a real cluster the
    caller passes no master and spark-submit supplies it.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    # Static conf (JVM-launch only; ignored by tune_session on shared
    # sessions): in local mode the driver JVM hosts every executor thread,
    # so Spark's 1g default heap starves 32 concurrent tasks' sort/write
    # buffers long before the box's memory is used.
    builder = builder.config(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    )
    for key, value in ENGINE_CONFS.items():
        builder = builder.config(key, value)
    if shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    for key, value in (extra_confs or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    return tune_session(spark)

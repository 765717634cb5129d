"""Query-construction helpers shared across plan modules.

These exist so the SAME derived frame isn't re-implemented per query —
the monthly-revenue frame below previously had three identical copies
(stats_durbin_watson, stats_mann_kendall, timeseries_sax_symbols) that
could silently drift. The matching oracle SQL stays INLINE in each
query's oracle string (the driver reads oracles as self-contained ANSI
SQL), so when editing the frame here, update the three oracles' ``m``
CTEs in plans/round9.py and plans/round10.py to match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_dags_spark.sources.tables import read_table


def monthly_revenue_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(nation, month) order revenue in EXACT integer cents:
    ``(nk, t, y)`` with ``t`` = months since 1992-01 and ``y`` = bigint
    cents — the calendar-bounded series frame behind the per-nation
    time-series statistics (≤ ~84 rows per nation at any data scale).

    ``y`` stays in exact cents so every downstream double derives from
    the same bit-identical integers in both engines; callers needing
    dollars divide AFTER this aggregate (``sum(cents)/100.0`` ==
    ``col(y)/100.0`` exactly, since the sum happens first either way)."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            ((F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate"))
            .alias("t"),
        )
        .agg(F.sum(cents).alias("y"))
    )


def scan_spread(df: DataFrame, *cols: str) -> DataFrame:
    """Spread a small scan across the session's parallelism before a
    map-heavy stage (per-position md5 hashing, signature computation):
    at test scale factors the documents table is a couple of parquet
    files, so without this the expensive map stage runs on 1-2 tasks.

    The partition count derives from ``defaultParallelism`` instead of a
    literal — a hard-coded 16 (the pre-round-10 convention) silently
    under-parallelizes on a 1000-executor cluster, and a number wider
    than the cluster buys nothing. Hash-partitioning on the key keeps
    downstream per-key windows/joins co-located. At production scale the
    scan already arrives in many splits and AQE coalesces as needed; the
    explicit spread is the small-input floor, not a scheduling policy."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *cols)

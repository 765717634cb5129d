"""Registry pairing each named query with its DuckDB oracle SQL.

The driver harness (``/root/repo/__spark_entry__.py``) runs every
``QUERIES[name](spark, sf_dir)`` and compares row-count + schema +
order-insensitive value-hash against ``ORACLES[name]`` executed by DuckDB on
the same parquet files (tables pre-registered as views). Rules that keep the
two engines hash-identical (SURVEY.md §5.2):

- alias every computed column identically on both sides;
- cast aggregate outputs explicitly (DuckDB sum(int) is HUGEINT, Spark is
  bigint — cast the oracle);
- round float aggregates (sums/avgs accumulate in partition order; both
  engines agree to well beyond 2–6 dp, not to the last ulp);
- no ``rand()``; deterministic sampling via md5 (functions.sampling);
- timestamps → strings (``yyyy-MM-dd HH:mm:ss``) at the result boundary;
  session timezone is UTC.

Ops with no SQL-expressible oracle (LSH, streaming state, HTTP sources)
register with ``oracle=None`` → the driver records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None):
    """Decorator: add a (query, oracle) pair to the driver surface."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from airflow_dags_spark.plans import (  # noqa: F401
        relational,
        scalar,
        writeback,
        llm,
        windowed,
        temporal,
        tpch,
        advanced,
        sketches,
        # round3/round4 must import LAST (in round order): their queries
        # append AFTER every earlier registration so the driver's
        # self-rotating 50-query window is not displaced mid-round (see
        # plans/round3.py docstring)
        round3,
        round4,
        round5,
        round6,
        round7,
        round8,
        round9,
        round10,
        round11,
        round12,
        round13,
    )

"""Arrow-backed construction of TINY driver-local DataFrames.

``spark.createDataFrame(<python list>)`` ships the rows through
``sc.parallelize`` — ``defaultParallelism`` pickled partitions, each
executed by a Python worker round-trip. For the engine's k×dim state
frames, one-row ledger commits and bucket-target frames that is pure
overhead: measured **4.5-5 s per job** on a cold local[32] session (32
Python worker spawns to move 16 rows) vs **~0.2 s** for the same rows
passed as a ``pyarrow.Table``, which becomes a JVM-local relation with no
Python execution at all — and, unlike the pandas fast path, does NOT
depend on ``spark.sql.execution.arrow.pyspark.enabled`` (the external
driver's plain session leaves it off).

Use for BOUNDED frames only (state rows, ledger rows, bucket targets —
things that must fit on the driver anyway); big data belongs in scans.
"""

from __future__ import annotations

from collections.abc import Iterable

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.pandas.types import to_arrow_schema
from pyspark.sql.types import StructType, _parse_datatype_string


def tiny_df(
    spark: SparkSession,
    rows: Iterable[tuple],
    schema: str | StructType,
) -> DataFrame:
    """Local relation from driver-resident rows via Arrow (no Python
    workers at execution). ``rows`` are tuples matching ``schema`` (a DDL
    string or StructType); empty input yields an empty frame of the exact
    schema, same as ``createDataFrame([], schema)``."""
    st = (
        _parse_datatype_string(schema) if isinstance(schema, str) else schema
    )
    pa_schema = to_arrow_schema(st)
    rows = list(rows)
    cols = list(zip(*rows)) if rows else [[] for _ in st.fields]
    arrays = [
        pa.array(list(c), type=f.type) for c, f in zip(cols, pa_schema)
    ]
    return spark.createDataFrame(
        pa.Table.from_arrays(arrays, schema=pa_schema), schema=st
    )

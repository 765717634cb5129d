"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL on the same parquet files, then
compares row-count + column names + order-insensitive values. Comparison is
EXACT on canonicalized cells (the driver hashes values), with a diagnostic
diff on failure.
"""

from __future__ import annotations

import datetime as dt
import math
import os

import duckdb
import pandas as pd

from airflow_dags_spark.schemas import TESTDATA_TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse 1-ulp engine differences left after explicit rounding
        return f"{v:.9g}"
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return tuple(_canon_cell(x) for x in seq)
    if isinstance(v, (int, bool, str, bytes)):
        return v
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_cell(v) for v in row))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Returns [] on match; list of problem descriptions otherwise."""
    problems: list[str] = []
    spark_pdf = spark_df.toPandas()
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row counts differ: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_rows = canonical_rows(spark_pdf)
    o_rows = canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        s_only = [r for r in s_rows if r not in set(o_rows)][:5]
        o_only = [r for r in o_rows if r not in set(s_rows)][:5]
        problems.append(
            f"values differ ({len(s_only)}+ spark-only / {len(o_only)}+ oracle-only)\n"
            f"  spark-only sample: {s_only}\n  oracle-only sample: {o_only}"
        )
    return problems

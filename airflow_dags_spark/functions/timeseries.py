"""Time-series smoothing (EWMA) — the recursive-state operator Spark's
window frames cannot express.

``s_1 = x_1;  s_t = α·x_t + (1-α)·s_{t-1}`` has unbounded dependence on all
prior rows, so no RANGE/ROWS frame computes it. Two forms:

- ``ewma_per_row`` — labels EVERY row with its running EWMA via
  ``applyInPandas`` per key (one shuffle on the key, Arrow-batched
  vectorized pandas recursion inside each group). The scale path for long
  per-key series: group state is one float, series never leave executors.
- The driver query form (plans/temporal.py:timeseries_ewma_final) folds
  ``aggregate(array_sort(collect_list(...)))`` to the FINAL smoothed value
  per key — fully engine-portable (DuckDB ``list_reduce``) and so
  oracle-checkable; memory is bounded by the per-key series length.

The closed-form rewrite ``s_t = (1-α)^t · running_sum(x_k/(1-α)^k)`` stays
in pure window functions but overflows doubles past ~10³ rows per key —
rejected; the recursion is the numerically honest form.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType


def ewma_per_row(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
) -> DataFrame:
    """Running EWMA per key, ordered by ``order_cols`` (must totally order
    rows within a key for determinism). Null values propagate as null and
    do not advance the state."""
    # NB: StructType.add MUTATES, and df.schema is the DataFrame's cached
    # object — build a fresh schema instead of df.schema.add(...)
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )
    cols = list(df.columns)

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        # pandas ewm(adjust=False) is exactly the recursion; min_periods=1
        # keeps leading nulls null without consuming state
        pdf[out_col] = (
            pdf[value_col].ewm(alpha=alpha, adjust=False, ignore_na=True).mean()
        )
        pdf.loc[pdf[value_col].isna(), out_col] = None
        return pdf[cols + [out_col]]

    return df.groupBy(key_col).applyInPandas(smooth, out_schema)

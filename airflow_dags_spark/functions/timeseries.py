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


def lttb_downsample(
    df,
    n_out: int,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
):
    """Largest-Triangle-Three-Buckets downsampling per key (Steinarsson
    2013, "Downsampling Time Series for Visual Representation") — keep
    ``n_out`` points per series that preserve the visual shape (spikes,
    trend reversals) far better than uniform striding.

    Distributed shape: one shuffle on ``key_col`` (applyInPandas), each
    series processed independently with the O(n) single-pass algorithm —
    a series is dashboard-sized by contract (per-key, not the corpus), so
    per-task memory is bounded by the largest single series; series count
    scales horizontally. First/last points are always retained (the
    algorithm's anchor invariant).

    Output: key, ts, value, pt_index (0-based position in the downsample).
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    ts_field = df.schema[ts_col]
    out_schema = T.StructType(
        [
            df.schema[key_col],
            ts_field,
            df.schema[value_col],
            T.StructField("pt_index", T.IntegerType()),
        ]
    )

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        pdf = pdf[pdf[value_col].notna()].reset_index(drop=True)
        n = len(pdf)
        if n == 0:
            return pdf.assign(pt_index=pd.Series([], dtype="int32"))[
                [key_col, ts_col, value_col, "pt_index"]
            ]
        if n <= n_out:
            out = pdf.copy()
            out["pt_index"] = np.arange(n, dtype="int32")
            return out[[key_col, ts_col, value_col, "pt_index"]]
        x = pdf[ts_col].astype("int64").to_numpy(dtype=np.float64)
        y = pdf[value_col].to_numpy(dtype=np.float64)
        # bucket boundaries over the interior points (anchors excluded)
        bounds = np.linspace(1, n - 1, n_out - 1).astype(int)
        chosen = [0]
        a = 0
        for i in range(n_out - 2):
            lo, hi = bounds[i], bounds[i + 1]
            nlo, nhi = hi, bounds[i + 2] if i + 2 < len(bounds) else n
            # average of the NEXT bucket is the third triangle vertex
            avg_x = x[nlo:nhi].mean() if nhi > nlo else x[-1]
            avg_y = y[nlo:nhi].mean() if nhi > nlo else y[-1]
            # max triangle area between anchor a, candidate, next-avg
            area = np.abs(
                (x[a] - avg_x) * (y[lo:hi] - y[a])
                - (x[a] - x[lo:hi]) * (avg_y - y[a])
            )
            a = lo + int(np.argmax(area))
            chosen.append(a)
        chosen.append(n - 1)
        out = pdf.iloc[chosen].copy()
        out["pt_index"] = np.arange(len(chosen), dtype="int32")
        return out[[key_col, ts_col, value_col, "pt_index"]]

    # EXPLICIT-count keyed repartition feeding the groupBy: the exchange is
    # required either way (applyInPandas clusters by key), but left to the
    # planner AQE coalesces it by BYTE size — a few MB of (key, ts, value)
    # rows collapse to ONE post-shuffle partition and every series' Python
    # work (frame build + sort + selection loop) serializes through a
    # single worker (measured 7.1 s for 100k events / ~5k series at sf0.1;
    # 8→32-core scaling 0.94). AQE honors a user-specified count (the
    # stats_poisson_bootstrap_ci precedent: byte-sized coalescing is blind
    # to downstream Python cost). The count derives from the session's
    # parallelism, not a literal; groupBy reuses the keyed partitioning so
    # no second exchange appears.
    n = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(key_col, ts_col, value_col)
        .repartition(n, key_col)
        .groupBy(key_col)
        .applyInPandas(per_key, out_schema)
    )


def stitched_lead_ts(
    df,
    key_col: str,
    ts_col: str,
    tie_col: str,
    bucket_expr,
    out_col: str = "next_ts",
):
    """``lead(ts)`` per key WITHOUT a monolithic per-key window.

    A plain ``lead() OVER (PARTITION BY key ORDER BY ts)`` serializes each
    key onto one reducer — with a handful of keys (event types, symbols)
    that is the whole table through a few tasks. This is the prefix-sum
    trick applied to lead: compute lead WITHIN (key, bucket) in parallel,
    then stitch bucket boundaries with the tiny per-(key, bucket) firsts
    table — the next reading after the last row of bucket b is the first
    reading of the key's next NON-EMPTY bucket, which one ordered lead over
    the |keys|×|buckets| firsts table yields.

    ``bucket_expr`` must be monotone in ``ts_col`` (e.g. ``to_date(ts)``).
    Output is hash-identical to the plain window (oracle-checked by
    events_twap). Ties on ts are broken by ``tie_col``; the stitch is
    unaffected because equal timestamps share a bucket."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    b = df.withColumn("__bucket", bucket_expr)
    w_in = Window.partitionBy(key_col, "__bucket").orderBy(ts_col, tie_col)
    within = b.withColumn("__lead_in", F.lead(ts_col).over(w_in))
    firsts = b.groupBy(key_col, "__bucket").agg(F.min(ts_col).alias("__first"))
    # |keys| partitions of |buckets| rows — the only cross-bucket pass
    w_f = Window.partitionBy(key_col).orderBy("__bucket")
    stitch = firsts.withColumn(
        "__next_first", F.lead("__first").over(w_f)
    ).select(key_col, "__bucket", "__next_first")
    return (
        within.join(F.broadcast(stitch), [key_col, "__bucket"])
        .withColumn(out_col, F.coalesce("__lead_in", "__next_first"))
        .drop("__bucket", "__lead_in", "__next_first")
    )

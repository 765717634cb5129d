"""Batch model scoring on the Arrow fast path.

``linear_score_arrow`` applies a linear model inside ``mapInArrow`` —
numpy vectorized over whole Arrow record batches, zero per-row Python.
The linear form is deliberately the simplest instance of the pattern that
matters at 100 TB: an embarrassingly parallel scorer whose Python cost is
one vectorized call per ~10k-row Arrow batch, not per row. Swapping the
numpy expression for an sklearn ``predict`` / onnxruntime session keeps
the batch plumbing (schema handling, null policy, column append)
unchanged — which is why the plumbing is tested bit-exactly against SQL
arithmetic (plans/round9.py::ml_batch_score_arrow).

Determinism contract: features are accumulated LEFT TO RIGHT
(``((b + w₁x₁) + w₂x₂) + …``), matching SQL's left-associative ``+`` so
the per-row doubles are bit-identical to any engine evaluating the same
expression — no np.dot, whose BLAS kernels are free to reorder the sum.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType


def linear_score_arrow(
    df: DataFrame,
    feature_cols: Sequence[str],
    weights: Sequence[float],
    intercept: float,
    output_col: str = "score",
) -> DataFrame:
    """Append ``output_col`` = intercept + Σ wᵢ·featureᵢ via mapInArrow.

    Feature columns must be numeric and non-null (cast/coalesce upstream);
    they are read zero-copy where Arrow allows and promoted to float64.
    All other columns pass through untouched.
    """
    if len(feature_cols) != len(weights):
        raise ValueError(
            f"{len(feature_cols)} feature cols vs {len(weights)} weights"
        )
    if output_col in df.columns:
        raise ValueError(f"output column {output_col!r} already exists")
    out_schema = StructType(
        df.schema.fields + [StructField(output_col, DoubleType(), True)]
    )
    feats = list(feature_cols)
    ws = [float(w) for w in weights]
    b = float(intercept)

    def score_batches(
        batches: Iterator[pa.RecordBatch],
    ) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            n = batch.num_rows
            # left-to-right accumulation: matches SQL's left-assoc `+`
            score = np.full(n, b, dtype=np.float64)
            for name, w in zip(feats, ws):
                x = batch.column(name).to_numpy(zero_copy_only=False)
                score = score + w * x.astype(np.float64, copy=False)
            yield batch.append_column(
                output_col, pa.array(score, type=pa.float64())
            )

    return df.mapInArrow(score_batches, out_schema)

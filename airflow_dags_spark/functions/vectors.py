"""Vector math over ``array<float>`` embedding columns (north-star §2.9).

Pure array-expression implementations (zip_with + aggregate) — JVM-side,
codegen-friendly, no Python. Floats are cast to double BEFORE multiplying so
Spark and the DuckDB oracle (``CAST(v AS DOUBLE[])`` + list_dot_product)
perform the identical sequential double-precision fold.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def as_double(vec: Column | str) -> Column:
    return F.transform(_c(vec), lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs.

    NB: evaluated per PAIR this recomputes both norms (and, if ``a``/``b``
    are cast trees like ``as_double(col)``, both casts) for every pair a
    row participates in. Join/top-k paths should stage each side once per
    ROW and use :func:`cosine_pre` — float-identical, ~5× less array work
    per pair (guide §2.3: don't recompute what a projection can carry)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine_pre(av: Column, bv: Column, an: Column, bn: Column) -> Column:
    """Cosine from pre-staged double arrays and their pre-computed L2 norms.

    Bit-identical to ``cosine(av, bv)`` when ``an = l2_norm(av)`` and
    ``bn = l2_norm(bv)`` were staged in each side's own projection: the
    denominator is the same ``sqrt(dot(a,a)) * sqrt(dot(b,b))`` product in
    the same order, the zero guard is the same ``denom > 0``, and the
    numerator is the same sequential fold — only WHERE the norms are
    evaluated changes (once per row, not once per joined pair)."""
    denom = an * bn
    return F.when(denom > 0, dot(av, bv) / denom).otherwise(F.lit(0.0))

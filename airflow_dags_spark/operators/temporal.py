"""Temporal joins Spark lacks as builtins (build brief: custom operators via
composition of DataFrame ops where semantics allow).

- ``asof_join``  — for each left row, the latest right row with
  ``right.ts <= left.ts`` per key. Implemented as the union-window rewrite:
  tag sides, union, one window per key ordered by (ts, side) with
  ``last(value, ignorenulls=True)`` — a SINGLE shuffle on the key, no
  range-condition nested loop. This is the scalable classic; a naive
  theta-join (``r.ts <= l.ts`` + max) is O(n·m) per key.
- ``range_join`` — pairs with ``left.ts ∈ [right.start, right.end]``,
  bucketized: both sides explode to coarse time buckets, equi-join on
  (key, bucket) — Catalyst gets an EQUI join (hash/sort-merge-able) —
  then the exact range predicate filters within buckets. Bucket width trades
  replication (right side spans ⌈interval/width⌉ buckets) against
  selectivity; without it Spark falls back to BroadcastNestedLoopJoin.

Both are deterministic and DuckDB-oracle-checkable (ASOF JOIN / range
predicates exist there natively).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    *,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: each left row gains the most recent ``value_cols``
    from right where ``right.ts <= left.ts`` (per key); null if none.

    Union-window plan: one shuffle (hashpartition by key), one sort within
    partitions — the same cost as a sort-merge join, but expressing a
    predicate sort-merge can't do directly.
    """
    l_tag = left.withColumn("__side", F.lit(1))
    r_tag = right.select(
        key, ts, *value_cols
    ).withColumn("__side", F.lit(0))
    # align schemas for union: left carries nulls for right's values and
    # keeps its own payload columns
    for c in value_cols:
        l_tag = l_tag.withColumn(f"__r_{c}", F.lit(None).cast(right.schema[c].dataType))
    r_aligned = r_tag.select(
        F.col(key),
        F.col(ts),
        F.lit(None).alias("__placeholder"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col("__side"),
    ).drop("__placeholder")
    left_cols = [c for c in left.columns]
    l_aligned = l_tag.select(
        F.col(key),
        F.col(ts),
        *[F.col(f"__r_{c}") for c in value_cols],
        F.col("__side"),
        *[F.col(c).alias(f"__l_{c}") for c in left_cols if c not in (key, ts)],
    )
    r_full = r_aligned
    for c in left_cols:
        if c not in (key, ts):
            r_full = r_full.withColumn(
                f"__l_{c}", F.lit(None).cast(left.schema[c].dataType)
            )
    unioned = l_aligned.unionByName(r_full)
    # right rows sort BEFORE left rows at equal ts (side 0 < 1): <= semantics
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in value_cols
        ],
    )
    out = filled.where(F.col("__side") == 1).select(
        F.col(key),
        F.col(ts),
        *[F.col(f"__l_{c}").alias(c) for c in left_cols if c not in (key, ts)],
        *[F.col(f"__f_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    start: str,
    end: str,
    *,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Equi-bucketized interval join: rows of ``left`` matched to every
    ``right`` interval containing their timestamp, per key.

    Both sides map to coarse epoch-second buckets (plain integer division —
    codegen-friendly, no window-expression restrictions); the join condition
    becomes (key, bucket) equality + the exact range predicate — a shuffled
    equi-join instead of a nested loop. Right intervals explode over every
    bucket they span, so correctness is bucket-width-free: width only trades
    right-side replication against in-bucket selectivity.
    """

    def to_bucket(c: Column) -> Column:
        return (F.unix_timestamp(c) / bucket_seconds).cast("bigint")

    l_b = left.withColumn("__bucket", to_bucket(F.col(ts)))
    r_b = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(to_bucket(F.col(start)), to_bucket(F.col(end)), F.lit(1))
        ),
    )
    joined = l_b.join(r_b, [key, "__bucket"]).where(
        (F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end))
    )
    return joined.drop("__bucket")


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    *,
    suffix: str = "_asof",
) -> DataFrame:
    """``asof_join`` via ``cogroup().applyInPandas`` — the per-key
    imperative form of the same contract (right's most recent value_cols
    at ``right.ts <= left.ts``, per key, null when none).

    When to prefer which: the union-window form (``asof_join``) stays
    JVM-side — always faster for plain as-of. The cogrouped form exists
    for matching logic SQL can't express (per-key interpolation, custom
    staleness rules, model scoring against a timeline): both sides of a
    key arrive in ONE Python function as two pandas frames after a single
    co-partitioned shuffle each — the escape hatch with the same
    distribution shape. Equality with the declarative form is
    pytest-verified (tests/test_temporal.py), which is exactly the
    pattern for validating any custom cogrouped operator: prove the
    SQL-expressible core first, then extend."""
    import pandas as pd

    from pyspark.sql import types as T

    out_fields = list(left.schema.fields) + [
        T.StructField(f"{c}{suffix}", right.schema[c].dataType, True)
        for c in value_cols
    ]
    out_schema = T.StructType(out_fields)
    left_cols = [f.name for f in left.schema.fields]

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if not len(l):
            return pd.DataFrame(columns=[f.name for f in out_fields])
        l = l.sort_values(ts, kind="mergesort")
        r = r.sort_values(ts, kind="mergesort")
        merged = pd.merge_asof(
            l,
            r[[ts, *value_cols]].rename(
                columns={c: f"{c}{suffix}" for c in value_cols}
            ),
            on=ts,
            direction="backward",
            suffixes=("", "__r"),
        )
        return merged[[*left_cols, *[f"{c}{suffix}" for c in value_cols]]]

    return (
        left.groupBy(key)
        .cogroup(right.select(key, ts, *value_cols).groupBy(key))
        .applyInPandas(merge, out_schema)
    )


def dtw_pairwise(
    series: DataFrame,
    key_col: str,
    seq_col: str,
) -> DataFrame:
    """All-pairs dynamic-time-warping distance between BOUNDED per-entity
    sequences (Sakoe & Chiba 1978 DP, symmetric step, |a−b| local cost).

    Contract and scale shape: ``series`` is one row per ENTITY with its
    whole (short) sequence as an array — entities are dimension-bounded
    (nations, SKUs, sensors), never fact-scale, so the a<b pair frame is
    |entities|²/2 rows and the broadcast non-equi join is the intended
    plan, not an accident. The DP itself is an Arrow-batched pandas UDF
    (len(a)·len(b) cells per pair — bounded by the sequence contract),
    distributed across executors per pair row. For fact-scale inputs
    aggregate to per-entity sequences FIRST; this operator refuses nothing
    but its cost is Θ(pairs · len²) by construction.

    Deterministic: pure arithmetic on the input arrays, no seeds, ties
    need no breaking (min of floats)."""
    from pyspark.sql.functions import pandas_udf

    a = series.select(
        F.col(key_col).alias("key_a"), F.col(seq_col).alias("seq_a")
    )
    b = series.select(
        F.col(key_col).alias("key_b"), F.col(seq_col).alias("seq_b")
    )

    @pandas_udf("double")
    def _dtw(sa: pd.Series, sb: pd.Series) -> pd.Series:
        out = []
        for va, vb in zip(sa, sb):
            A = np.asarray(va, dtype=np.float64)
            B = np.asarray(vb, dtype=np.float64)
            n, m = len(A), len(B)
            if n == 0 or m == 0:
                out.append(float("nan"))
                continue
            D = np.full((n + 1, m + 1), np.inf)
            D[0, 0] = 0.0
            for i in range(1, n + 1):
                cost = np.abs(A[i - 1] - B)
                row, prev = D[i], D[i - 1]
                for j in range(1, m + 1):
                    row[j] = cost[j - 1] + min(
                        prev[j], row[j - 1], prev[j - 1]
                    )
            out.append(float(D[n, m]))
        return pd.Series(out)

    return (
        a.join(F.broadcast(b), F.col("key_a") < F.col("key_b"))
        .select(
            "key_a",
            "key_b",
            F.round(_dtw("seq_a", "seq_b"), 6).alias("dtw"),
        )
    )

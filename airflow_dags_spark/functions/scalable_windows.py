"""Scale rewrites for the two classic window-function bottlenecks.

1. ``bucketed_running_sum`` — a GLOBAL running sum (``Window.orderBy`` with
   no partitionBy) plans as ``Exchange SinglePartition``: one reducer sorts
   and scans the WHOLE table, the canonical 100 TB straggler. The rewrite
   is prefix-sum composition: cumulate WITHIN coarse buckets (parallel),
   cumulate the |buckets| bucket totals (tiny), broadcast the per-bucket
   offsets back. Identical results, no single-partition exchange — the
   only global pass runs over |buckets| rows.

2. ``salted_topn_per_key`` — per-key top-N under a HOT key: the window
   shuffles every row of the hot key to one reducer. Two phases: top-N per
   (key, salt) — hot keys split across ``n_salts`` reducers — then top-N of
   the ≤ n_salts×N survivors per key. Any per-key monotone-prunable
   aggregate (top-N, min/max) composes this way; ranks beyond N do not.

Both are pure plan rewrites: oracle queries prove hash-identical results,
plan gates prove the single-partition exchange is gone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucketed_running_sum(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    bucket_expr: Column,
    out_col: str = "running_sum",
) -> DataFrame:
    """Global running sum of ``value_col`` in ``order_cols`` order, without
    an Exchange SinglePartition.

    ``bucket_expr`` must be MONOTONE in the order (e.g. ``to_date(ts)``
    when ordering by ts): all rows of bucket b sort before all rows of
    b+1, so global position = within-bucket position + offset(bucket).
    Bucket count should be ≫ cores (parallelism) and ≪ rows (the offsets
    table broadcasts); days/hours over event time are the natural choice."""
    b = df.withColumn("__bucket", bucket_expr)
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = b.withColumn("__in_sum", F.sum(value_col).over(w_in))
    totals = b.groupBy("__bucket").agg(F.sum(value_col).alias("__total"))
    # offset = sum of STRICTLY EARLIER buckets; this window IS a global
    # sort, but over |buckets| rows, not the table
    offsets = totals.withColumn(
        "__offset",
        F.coalesce(
            F.sum("__total").over(
                Window.orderBy("__bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            # integer 0: coalesce widens to the sum's own type (bigint for
            # int inputs, double for double) instead of forcing double
            F.lit(0),
        ),
    ).select("__bucket", "__offset")
    return (
        within.join(F.broadcast(offsets), "__bucket")
        .withColumn(out_col, F.col("__in_sum") + F.col("__offset"))
        .drop("__bucket", "__in_sum", "__offset")
    )


def salted_topn_per_key(
    df: DataFrame,
    key_col: str,
    order_by: list[Column],
    n: int,
    n_salts: int = 16,
    salt_src: str | None = None,
) -> DataFrame:
    """Top-N rows per key with hot keys split across ``n_salts`` reducers.

    Phase 1 ranks within (key, salt) — a salt derived from a high-entropy
    column (``salt_src``, default: the first order column) so a hot key's
    rows spread; each (key, salt) keeps its local top-N. Phase 2 ranks the
    ≤ n_salts×N survivors per key — the second window sees bounded input
    per key no matter how hot the key was. Output = exactly the plain
    per-key top-N (same tie rule: ``order_by`` must be a total order)."""
    salt = (
        F.pmod(F.hash(F.col(salt_src)), F.lit(n_salts))
        if salt_src
        else F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    salted = df.withColumn("__salt", salt)
    w1 = Window.partitionBy(key_col, "__salt").orderBy(*order_by)
    survivors = (
        salted.withColumn("__rn1", F.row_number().over(w1))
        .where(F.col("__rn1") <= n)
        .drop("__rn1", "__salt")
    )
    w2 = Window.partitionBy(key_col).orderBy(*order_by)
    return (
        survivors.withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )

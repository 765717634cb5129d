"""Work sampling L1/L2 (SURVEY.md §2.5).

The reference selects random work batches with ``ORDER BY RANDOM() LIMIT k``
(dags/pull_new_sales_list.py:93-102, dags/rightmove_outcodes.py:50-55).
``rand()`` streams differ across engines and runs, so the engine's canonical
sampler is deterministic: order by ``md5(key)`` — a stable, uniform-ish
permutation any SQL engine reproduces (SURVEY.md §4.3#4).

Scale note: ORDER BY md5 LIMIT k is a global top-k — Spark executes it as
per-partition top-k + single-reducer merge of k·p rows (TakeOrderedAndProject),
no full sort, no full shuffle; fine for the reference's k ∈ {5, 50} even on
a 100 TB dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deterministic_sample(df: DataFrame, key: Column | str, k: int) -> DataFrame:
    """L1 — deterministic 'random' batch of k work items."""
    c = F.col(key) if isinstance(key, str) else key
    return df.orderBy(F.md5(c.cast("string"))).limit(k)


def random_sample(df: DataFrame, k: int, seed: int = 42) -> DataFrame:
    """Literal ORDER BY RANDOM() LIMIT k with a pinned seed — kept for parity
    with the reference; not oracle-comparable across engines."""
    return df.orderBy(F.rand(seed)).limit(k)


def stratified_sample(
    df: DataFrame, group_col: Column | str, key: Column | str, k: int
) -> DataFrame:
    """Deterministic stratified sample: k rows PER GROUP, selected by the
    same md5-permutation as ``deterministic_sample`` — the per-stratum work
    batch (and, in a training pipeline, the per-source/per-language holdout
    or eval slice that must stay stable across runs).

    Scale: one hash-exchange on the group column + per-group sort of only
    that group's rows (window row_number), never a global sort; output is
    |groups|·k rows. Skewed strata sort more rows but never more than the
    stratum's own size; compose with functions/skew.py salting only if a
    single stratum dwarfs executor memory.
    """
    from pyspark.sql import Window

    g = F.col(group_col) if isinstance(group_col, str) else group_col
    c = F.col(key) if isinstance(key, str) else key
    w = Window.partitionBy(g).orderBy(F.md5(c.cast("string")))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )

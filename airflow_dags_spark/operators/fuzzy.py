"""Fuzzy (edit-distance) matching — the data-integration join.

The reference's domain is full of almost-joinable strings (addresses,
postcodes, scraped display names); the relational answer is an
edit-distance join. All-pairs × levenshtein is O(n²·len²) — a 100 TB
non-starter — so the operator prunes with a LOSSLESS candidate filter
first:

- levenshtein(a, b) ≤ d  ⇒  |len(a) − len(b)| ≤ d, so bucketing strings by
  ``len div (d+1)`` and joining each string to its own and neighboring
  buckets covers every qualifying pair (a superset — the exact distance
  then filters);
- an optional scope column (brand, region, postcode area) bounds buckets
  the way real entity-resolution blocks do.

The pruning claim is *proved by the oracle*: the driver compares this
pruned plan against DuckDB's brute-force all-pairs form — identical result
sets mean the candidate filter lost nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_self_join(
    df: DataFrame,
    text_col: str,
    key_col: str,
    *,
    max_dist: int = 2,
    scope_cols: list[str] | None = None,
) -> DataFrame:
    """Pairs (key_a < key_b) whose ``text_col`` values are within
    ``max_dist`` edits, optionally blocked by ``scope_cols``.

    One equi-join on (scope, bucket) — each row explodes to 3 bucket probes
    on ONE side only (the other side keeps its single home bucket, so every
    neighboring pair meets exactly once per shared bucket; dropDuplicates
    guards the double-count when both probes hit). Exact levenshtein runs
    only on candidates."""
    width = max_dist + 1
    bucket = (F.length(F.col(text_col)) / width).cast("int")
    scope = list(scope_cols or [])

    left = df.select(
        *scope,
        F.col(key_col).alias("key_a"),
        F.col(text_col).alias("text_a"),
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("__bucket"),
    )
    right = df.select(
        *scope,
        F.col(key_col).alias("key_b"),
        F.col(text_col).alias("text_b"),
        bucket.alias("__bucket"),
    )
    cand = left.join(right, scope + ["__bucket"]).where(
        F.col("key_a") < F.col("key_b")
    )
    return (
        cand.where(
            F.abs(F.length("text_a") - F.length("text_b")) <= max_dist
        )
        # threshold form (Spark 3.5+): banded DP that early-exits past
        # max_dist — O(len·d) instead of O(len²) per candidate, returning
        # -1 for pairs beyond the band. For qualifying pairs the returned
        # distance is exact, so results are identical to the unbounded
        # form (r10: measured 2.2× on 7.9M candidates at sf0.1,
        # oracle-hash-identical against the brute-force DuckDB form).
        .withColumn("dist", F.levenshtein("text_a", "text_b", max_dist))
        .where((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select("key_a", "key_b", "dist")
        .dropDuplicates(["key_a", "key_b"])
    )


__all__ = ["fuzzy_self_join"]

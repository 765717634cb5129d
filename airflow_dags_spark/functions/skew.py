"""Skew mitigation (SURVEY.md §6 scale notes; north-star 100 TB design).

The reference's data is skew-prone in exactly the ways big joins/aggs hurt:
postcode prefixes follow city-size distributions and a handful of areas
produce most sales rows. Two standard rewrites, engine-owned so they are
testable semantics-preserving transforms:

- ``salted_agg``  — two-phase aggregation: partial agg on (key, salt),
  final agg on key. Spark's map-side partial aggregation already absorbs
  most groupBy skew; the salt phase additionally splits a hot REDUCE key
  across ``n_salt`` reducers — needed when one key dominates a partition
  even after AQE splitting (e.g. count-distinct-heavy aggs, collect_list).
- ``salted_join`` — replicate the small side ``n_salt``× (explode over the
  salt domain), salt the big side uniformly, join on (key, salt). Turns one
  hot reducer into ``n_salt`` reducers at the cost of replicating the small
  side. Prefer ``broadcast()`` when the small side fits (engine default
  threshold 64 MiB, session.py); prefer AQE skew-join splitting
  (``spark.sql.adaptive.skewJoin`` — on by default here) when skew is
  moderate; reach for salting when a single key is pathological.

Both rewrites are RESULT-IDENTICAL to their plain forms — proven by the
``agg_salted_skew`` driver query hash-matching the plain GROUP BY oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Aggregates that decompose as agg(agg(partial)) — safe for two-phase salting.
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _salt_col(n_salt: int) -> Column:
    """Uniform deterministic-per-row salt. Correctness never depends on the
    salt value — only the split of work does — so a cheap per-row hash is
    enough and keeps the plan fully deterministic (no rand())."""
    return F.pmod(
        F.hash(F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(n_salt),
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    sum/count/min/max (decomposable). avg is derived: request sum+count and
    divide. Example::

        salted_agg(li, ["l_returnflag"], {
            "sum_qty": ("l_quantity", "sum"),
            "n_rows": ("l_quantity", "count"),
        })
    """
    for out, (_, fn) in aggs.items():
        if fn not in _DECOMPOSABLE:
            raise ValueError(f"{fn} is not decomposable for salting ({out})")
    salted = df.withColumn("__salt", _salt_col(n_salt))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            _DECOMPOSABLE[fn][0](col).alias(f"__p_{out}")
            for out, (col, fn) in aggs.items()
        ]
    )
    final = partial.groupBy(*keys).agg(
        *[
            _DECOMPOSABLE[fn][1](f"__p_{out}").alias(out)
            for out, (_, fn) in aggs.items()
        ]
    )
    return final


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side over
    the full salt domain, join on keys + salt. Supports inner/left (left =
    the big side) — the salt column never changes match semantics because
    every (key, salt) pair exists on the replicated side exactly once."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left with big side first")
    big_salted = big.withColumn("__salt", _salt_col(n_salt))
    salt_domain = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    small_rep = small.withColumn("__salt", salt_domain)
    joined = big_salted.join(small_rep, [*on, "__salt"], how)
    return joined.drop("__salt")


def left_join_null_split(
    left: DataFrame, right: DataFrame, on: list[str] | str
) -> DataFrame:
    """Left join that routes NULL-keyed rows AROUND the shuffle.

    SQL equi-joins never match NULL keys, but Spark still hashes them: in a
    left outer join every null-keyed left row shuffles into partition
    hash(null) — with null-heavy keys (unparsed FKs, optional dimensions)
    that is THE single-reducer hotspot AQE's skew handling splits late and
    expensively. The rewrite is free: null-keyed rows take a metadata-only
    union branch (right columns null-filled), only genuinely joinable rows
    enter the exchange. Result is exactly LEFT JOIN (oracle-checked by
    ``join_null_skew_split``).
    """
    keys = [on] if isinstance(on, str) else list(on)
    null_pred = F.lit(False)
    for k in keys:
        null_pred = null_pred | F.col(k).isNull()
    joined = left.where(~null_pred).join(right, keys, "left")
    right_only = [c for c in joined.columns if c not in left.columns]
    bypass = left.where(null_pred).select(
        "*", *[F.lit(None).cast(joined.schema[c].dataType).alias(c) for c in right_only]
    )
    return joined.unionByName(bypass.select(*joined.columns))

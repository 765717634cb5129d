"""Declarative data-quality expectations compiled into ONE aggregation pass.

The reference enforces quality constraints through Postgres DDL — NOT NULL
columns, unique indexes, CHECKs implied by its parse helpers
(dags/monthly_price_paid_data.py:120-141 casts + rejects) — and through
per-batch try/except quarantine. A lakehouse table has no resident DBMS to
enforce anything, so the engine provides the audit as an operator
(the public Deequ/Great-Expectations shape, Spark-first):

- every expectation compiles to AGGREGATE EXPRESSIONS over one scan —
  N constraints cost one job, one shuffle (partial aggs combine map-side),
  never N passes;
- the result is a small DataFrame (constraint, metric, observed, passed) —
  pipeable into the webhook sink (jobs/notify.py) or a quality history
  table, exactly how the reference's failure callbacks consume state;
- `expect_unique` is the one constraint needing a distinct count — exact
  by default; pass ``approx=True`` to use HLL (approx_count_distinct) when
  the 100 TB key column makes exact distinct the dominant cost and a
  ±2% tolerance is acceptable (tolerance applied to the pass rule).

Usage::

    report = (Expectations()
        .expect_complete("o_custkey")
        .expect_unique("o_orderkey")
        .expect_min("o_totalprice", 0.0)
        .expect_in_set("o_orderstatus", ["O", "F", "P"])
        .expect_regex("o_orderpriority", r"^[1-5]-[A-Z]+$")
        .run(orders))
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Expectations:
    """Builder: each expect_* queues (name, metric_expr, pass_expr_maker);
    ``run`` evaluates all of them in a single groupBy-less aggregate."""

    def __init__(self) -> None:
        # (constraint_name, metric_column, pass_fn(observed_col) -> Column)
        self._checks: list[tuple[str, Column, object]] = []

    def _add(self, name: str, metric: Column, passes) -> "Expectations":
        if any(name == n for n, _, _ in self._checks):
            raise ValueError(f"duplicate constraint name: {name}")
        self._checks.append((name, metric, passes))
        return self

    # -- constraint vocabulary ------------------------------------------------

    def expect_complete(self, col: str) -> "Expectations":
        """Fraction of non-null values; passes when 1.0."""
        frac = F.avg(F.col(col).isNotNull().cast("double"))
        return self._add(f"complete({col})", frac, lambda v: v >= 1.0)

    def expect_unique(self, col: str, approx: bool = False) -> "Expectations":
        """distinct/total ratio; passes when 1.0 (±2% when approx)."""
        distinct = (
            F.approx_count_distinct(col) if approx else F.count_distinct(F.col(col))
        )
        ratio = distinct.cast("double") / F.count(F.lit(1))
        bound = 0.98 if approx else 1.0
        return self._add(
            f"unique({col})" + ("~" if approx else ""), ratio, lambda v: v >= bound
        )

    def expect_min(self, col: str, at_least: float) -> "Expectations":
        return self._add(
            f"min({col})>={at_least}",
            F.min(F.col(col)).cast("double"),
            lambda v: v >= at_least,
        )

    def expect_max(self, col: str, at_most: float) -> "Expectations":
        return self._add(
            f"max({col})<={at_most}",
            F.max(F.col(col)).cast("double"),
            lambda v: v <= at_most,
        )

    @staticmethod
    def _frac(cond: Column) -> Column:
        """Fraction of ALL rows satisfying ``cond``; a NULL predicate result
        (null input) counts as a FAILURE, not a skipped row — avg() would
        silently ignore nulls and report a clean 1.0 over a dirty column."""
        return F.avg(F.coalesce(cond.cast("double"), F.lit(0.0)))

    def expect_between(
        self, col: str, lo: float, hi: float, min_fraction: float = 1.0
    ) -> "Expectations":
        """Fraction of rows inside [lo, hi] (nulls fail)."""
        frac = self._frac(F.col(col).between(lo, hi))
        return self._add(
            f"between({col},{lo},{hi})", frac, lambda v: v >= min_fraction
        )

    def expect_in_set(self, col: str, values: list) -> "Expectations":
        frac = self._frac(F.col(col).isin(values))
        shown = ",".join(str(v) for v in values)
        return self._add(f"in_set({col},[{shown}])", frac, lambda v: v >= 1.0)

    def expect_regex(
        self, col: str, pattern: str, min_fraction: float = 1.0
    ) -> "Expectations":
        frac = self._frac(F.col(col).rlike(pattern))
        return self._add(
            f"regex({col})", frac, lambda v: v >= min_fraction
        )

    def expect_row_count(self, at_least: int) -> "Expectations":
        return self._add(
            "row_count", F.count(F.lit(1)).cast("double"), lambda v: v >= at_least
        )

    # -- execution ------------------------------------------------------------

    def run(self, df: DataFrame) -> DataFrame:
        """One aggregate over ``df`` → (constraint, observed, passed) rows.

        The wide 1-row aggregate is unpivoted with ``stack`` — plan shape is
        scan → partial agg → single exchange → final agg → generate; adding
        constraints adds columns, never jobs."""
        if not self._checks:
            raise ValueError("no expectations queued")
        aggs = [
            (F.round(metric, 6) + F.lit(0.0)).alias(f"__m{i}")
            for i, (_, metric, _) in enumerate(self._checks)
        ]
        row = df.agg(*aggs)
        stack_args = ", ".join(
            f"'{name.replace(chr(39), '')}', __m{i}"
            for i, (name, _, _) in enumerate(self._checks)
        )
        long = row.select(
            F.expr(
                f"stack({len(self._checks)}, {stack_args}) as (constraint, observed)"
            )
        )
        # pass rules re-applied on the observed column, per constraint
        passed = F.lit(False)
        for name, _, rule in self._checks:
            clean = name.replace(chr(39), "")
            passed = F.when(
                F.col("constraint") == clean, rule(F.col("observed"))
            ).otherwise(passed)
        return long.withColumn("passed", F.coalesce(passed, F.lit(False)))

"""Privacy transforms for training-data release: k-anonymity suppression
on top of the redaction layer (functions/text.redact_pii masks direct
identifiers; THIS handles quasi-identifiers — combinations like
(zip, age, gender) that re-identify without naming anyone).

``k_anonymize`` applies caller-supplied GENERALIZATION expressions
(coarsen age → decade, timestamp → hour, zip → prefix) and then enforces
the k-anonymity property: every released quasi-identifier combination is
shared by ≥ k rows. Two enforcement modes:

- ``suppress`` (default): drop rows in groups smaller than k — the
  strict release form.
- ``null_out``: keep the rows, null the quasi columns of small groups —
  preserves row counts/other columns for aggregate statistics.

Plan shape: one shuffle (the group-size window over the quasi columns) —
generalization is a scan-stage projection, enforcement a filter. At
100 TB the quasi-combination cardinality, not the row count, drives the
window state; generalize FIRST (that is also what makes k reachable).

This is syntactic k-anonymity — it bounds re-identification by exact
quasi match; it does not defend attribute disclosure (l-diversity) or
differencing attacks across releases. Document the release regime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def k_anonymize(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    *,
    generalize: dict[str, Column] | None = None,
    mode: str = "suppress",
) -> DataFrame:
    if k < 1:
        raise ValueError("k must be >= 1")
    if mode not in ("suppress", "null_out"):
        raise ValueError(f"mode must be suppress|null_out, got {mode!r}")
    g = df
    for c, expr in (generalize or {}).items():
        g = g.withColumn(c, expr)
    # null-safe grouping: NULL quasi values form their own group (two rows
    # with NULL zip are identical to an attacker) — Window.partitionBy
    # already groups nulls together, matching that reading
    w = Window.partitionBy(*quasi_cols)
    sized = g.withColumn("__gsize", F.count(F.lit(1)).over(w))
    if mode == "suppress":
        return sized.where(F.col("__gsize") >= k).drop("__gsize")
    out = sized
    for c in quasi_cols:
        out = out.withColumn(
            c,
            F.when(F.col("__gsize") >= k, F.col(c)).otherwise(
                F.lit(None).cast(g.schema[c].dataType)
            ),
        )
    return out.drop("__gsize")


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int,
    *,
    generalize: dict[str, Column] | None = None,
) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al., ICDE'06): for
    every quasi-identifier equivalence class, report its size ``k_size``,
    the number of DISTINCT sensitive values ``l_distinct``, and whether
    the class meets the policy (``l_distinct >= l``). k-anonymity alone
    leaves attribute disclosure open — a class of 50 rows that all share
    one diagnosis reveals it for every member; this is the audit a
    release gate runs after ``k_anonymize``.

    Plan shape: ONE hash aggregate over the quasi columns — the distinct
    sensitive count uses the exact two-phase expansion only within each
    class (count_distinct inside groupBy partial-aggregates per class).
    No window, no join; output cardinality = |quasi combinations|.
    """
    if l < 1:
        raise ValueError("l must be >= 1")
    g = df
    for c, expr in (generalize or {}).items():
        g = g.withColumn(c, expr)
    return g.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("k_size"),
        F.count_distinct(F.col(sensitive_col)).alias("l_distinct"),
        (F.count_distinct(F.col(sensitive_col)) >= l).alias("diverse"),
    )

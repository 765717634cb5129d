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

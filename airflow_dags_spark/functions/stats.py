"""Distributed statistical tests and model fits.

The reference pushed every statistic to Postgres SQL (SURVEY.md §1.5); the
round-3/4 modules already cover drift (PSI/KS/chi-square) and simple
regression. This module adds the two-sample location tests and the
closed-form multi-feature fit a data-quality pipeline runs before/after a
curation change:

- Mann-Whitney U (rank-sum): EXACT average-rank handling of ties without a
  global sort of the table — ranks are derived from the per-distinct-value
  histogram (|distinct| ≪ rows) with the bucketed prefix-sum cascade, so the
  only single-partition exchange is over a bounded offsets frame.
- Welch's t-test: one aggregation pass of conditional moments.
- Two-feature OLS via the normal equations: population moments from ONE
  aggregate (var_pop/covar_pop are partial-aggregable map-side), 2×2 solve
  in a projection — no iteration, no driver data motion.

All formulas are plain column arithmetic on aggregate outputs, so every
statistic is exact given exact moments and matches an independent SQL
derivation to float rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from airflow_dags_spark.functions.scalable_windows import bucketed_running_sum


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    n_buckets: int = 512,
) -> DataFrame:
    """Two-sided Mann-Whitney U with average ranks for ties.

    Plan shape: one hash aggregation to the distinct-value histogram
    (carrying per-group counts), the bucketed running-sum cascade to turn
    the histogram into exact midranks (range buckets over the value are
    monotone in the rank order), one final aggregate. The table itself is
    never globally sorted; the rank window runs per range-bucket in
    parallel.

    Returns one row: ``n_a, n_b, u_a, u_b, z`` where ``z`` uses the
    normal approximation with the tie-correction term
    ``sigma^2 = n_a*n_b/12 * ((n+1) - sum(t^3-t)/(n*(n-1)))``.
    """
    v, g = F.col(value_col), F.col(group_col)
    x = df.where(g.isin([group_a, group_b]) & v.isNotNull()).select(
        v.alias("__v"), F.when(g == group_a, 1).otherwise(0).alias("__ia")
    )
    hist = x.groupBy("__v").agg(
        F.sum("__ia").alias("__ca"), F.count(F.lit(1)).alias("__c")
    )
    rng = x.agg(F.min("__v").alias("lo"), F.max("__v").alias("hi")).first()
    lo, hi = rng["lo"], rng["hi"]
    width = ((hi - lo) / float(n_buckets)) or 1.0
    bucket = F.least(
        F.floor((F.col("__v") - F.lit(lo)) / F.lit(width)),
        F.lit(n_buckets - 1),
    ).cast("int")
    ranked = bucketed_running_sum(hist, "__c", ["__v"], bucket, "__cum")
    # midrank of a tie block = (#strictly below) + (block size + 1)/2
    mid = (F.col("__cum") - F.col("__c")) + (F.col("__c") + 1) / 2.0
    agg = ranked.agg(
        F.sum("__ca").alias("n_a"),
        F.sum(F.col("__c") - F.col("__ca")).alias("n_b"),
        F.sum(F.col("__ca") * mid).alias("r_a"),
        F.sum(F.pow(F.col("__c"), 3) - F.col("__c")).alias("ties"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    n = n_a + n_b
    u_a = F.col("r_a") - n_a * (n_a + 1) / 2.0
    u_b = n_a * n_b - u_a
    sigma = F.sqrt(
        n_a * n_b / 12.0 * ((n + 1) - F.col("ties") / (n * (n - 1)))
    )
    return agg.select(
        n_a,
        n_b,
        F.round(u_a, 4).alias("u_a"),
        F.round(u_b, 4).alias("u_b"),
        (F.round((u_a - n_a * n_b / 2.0) / sigma, 6) + 0.0).alias("z"),
    )


def _midranks(
    df: DataFrame, value_col: str, out_col: str, n_buckets: int = 512
) -> DataFrame:
    """(value, midrank) table for one column: histogram → bucketed
    prefix-sum cascade → average rank per tie block. |output| =
    |distinct values| ≪ rows; the only single-partition step is the
    bounded offsets frame."""
    hist = df.groupBy(value_col).agg(F.count(F.lit(1)).alias("__c"))
    rng = df.agg(
        F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
    ).first()
    lo, hi = rng["lo"], rng["hi"]
    width = ((hi - lo) / float(n_buckets)) or 1.0
    bucket = F.least(
        F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)),
        F.lit(n_buckets - 1),
    ).cast("int")
    ranked = bucketed_running_sum(hist, "__c", [value_col], bucket, "__cum")
    mid = (F.col("__cum") - F.col("__c")) + (F.col("__c") + 1) / 2.0
    return ranked.select(value_col, mid.alias(out_col))


def spearman_corr(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Spearman rank correlation with exact average-rank tie handling:
    midranks for each variable come from its distinct-value histogram
    (never a global sort of the table), join back on the value (the
    low-cardinality side broadcasts under AQE), then Pearson over the
    rank columns. Midranks are half-integers — exact in doubles — so
    both the ranks and the final moment arithmetic are engine-stable.
    Returns one row: ``n, rho``."""
    x = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(F.col(x_col).alias("__x"), F.col(y_col).alias("__y"))
    rx = _midranks(x, "__x", "__rx")
    ry = _midranks(x, "__y", "__ry")
    j = x.join(rx, "__x").join(ry, "__y")
    return j.agg(
        F.count(F.lit(1)).alias("n"),
        (F.round(F.corr("__rx", "__ry"), 6) + 0.0).alias("rho"),
    )


def welch_ttest(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Welch's unequal-variance t-test in ONE aggregation pass.

    Conditional moments (``avg/var_samp`` over a CASE-masked column skip
    the other group's rows as nulls) mean no second scan and no join;
    every moment partial-aggregates map-side. Returns one row:
    ``n_a, n_b, mean_a, mean_b, t_stat, df_welch``.
    """
    v, g = F.col(value_col), F.col(group_col)
    x = df.where(g.isin([group_a, group_b]) & v.isNotNull())
    va = F.when(g == group_a, v)
    vb = F.when(g == group_b, v)
    agg = x.agg(
        F.count(va).alias("n_a"),
        F.count(vb).alias("n_b"),
        F.avg(va).alias("m_a"),
        F.avg(vb).alias("m_b"),
        F.var_samp(va).alias("s2_a"),
        F.var_samp(vb).alias("s2_b"),
    )
    se_a = F.col("s2_a") / F.col("n_a")
    se_b = F.col("s2_b") / F.col("n_b")
    t = (F.col("m_a") - F.col("m_b")) / F.sqrt(se_a + se_b)
    dfw = F.pow(se_a + se_b, 2) / (
        F.pow(se_a, 2) / (F.col("n_a") - 1) + F.pow(se_b, 2) / (F.col("n_b") - 1)
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round("m_a", 6).alias("mean_a"),
        F.round("m_b", 6).alias("mean_b"),
        (F.round(t, 6) + 0.0).alias("t_stat"),
        F.round(dfw, 4).alias("df_welch"),
    )


def ols_two_features(
    df: DataFrame, y_col: str, x1_col: str, x2_col: str
) -> DataFrame:
    """Closed-form OLS ``y ~ b0 + b1*x1 + b2*x2`` via the normal equations.

    One aggregation computes the population moment matrix; the 2×2 inverse
    is literal arithmetic in the final projection. R² uses the moment
    identity ``(b1*cov(x1,y) + b2*cov(x2,y)) / var(y)`` — exact for the
    population-moment fit, no residual pass needed. Returns one row:
    ``n, b0, b1, b2, r2``.
    """
    y, x1, x2 = F.col(y_col), F.col(x1_col), F.col(x2_col)
    m = df.where(y.isNotNull() & x1.isNotNull() & x2.isNotNull()).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(y).alias("my"),
        F.avg(x1).alias("m1"),
        F.avg(x2).alias("m2"),
        F.var_pop(x1).alias("v1"),
        F.var_pop(x2).alias("v2"),
        F.var_pop(y).alias("vy"),
        F.covar_pop(x1, x2).alias("c12"),
        F.covar_pop(x1, y).alias("c1y"),
        F.covar_pop(x2, y).alias("c2y"),
    )
    det = F.col("v1") * F.col("v2") - F.col("c12") * F.col("c12")
    b1 = (F.col("v2") * F.col("c1y") - F.col("c12") * F.col("c2y")) / det
    b2 = (F.col("v1") * F.col("c2y") - F.col("c12") * F.col("c1y")) / det
    b0 = F.col("my") - b1 * F.col("m1") - b2 * F.col("m2")
    r2 = (b1 * F.col("c1y") + b2 * F.col("c2y")) / F.col("vy")
    return m.select(
        "n",
        (F.round(b0, 6) + 0.0).alias("b0"),
        (F.round(b1, 6) + 0.0).alias("b1"),
        (F.round(b2, 6) + 0.0).alias("b2"),
        (F.round(r2, 6) + 0.0).alias("r2"),
    )

"""Round-6 registry additions — classical-statistics, time-series
decomposition, and window-semantics operators:

- one-way ANOVA F (two-pass centered sums), full pairwise correlation
  matrix in one centered aggregate, grouped skewness / excess kurtosis
  from central moments;
- classical additive decomposition (centered moving-average trend +
  weekday seasonal + residual), cross-correlation of two daily series at
  signed lags, Holt linear-trend smoothing as an engine-portable list
  fold (the ``timeseries_ewma_final`` pattern extended to a struct
  accumulator);
- GROUPS-frame window semantics (peer rows of an ORDER BY value) via the
  dense_rank + RANGE emulation, since neither engine's SQL frame covers
  it directly on both sides.

Registered LAST (after plans/round5 in registry.load_all) so these append
AFTER every existing query in the driver's self-rotating verification
window — new names must never displace the queued unverified queries of
the current round.

Scale notes (100 TB): every query here aggregates the raw table
distributively FIRST (group means, daily sums, per-group lists bounded by
the calendar, window partitions bounded by the key) — the only
single-partition structures are O(groups)- or O(days)-sized frames, each
asserted aggregate-fed by tests/test_plan_quality.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_dags_spark.plans.registry import register
from airflow_dags_spark.sources.tables import read_table

# --------------------------------------------------------------------------
# One-way ANOVA F-test — value across event types
# --------------------------------------------------------------------------

ANOVA_ORACLE = """
WITH g AS (
  SELECT event_type AS grp, COUNT(*) AS n, AVG(value) AS m
  FROM events WHERE value IS NOT NULL GROUP BY event_type
),
tot AS (SELECT SUM(n * m) / SUM(n) AS gm, CAST(SUM(n) AS BIGINT) AS n_total,
               CAST(COUNT(*) AS BIGINT) AS k FROM g),
ssw AS (
  SELECT SUM(POW(e.value - g.m, 2)) AS ss_within
  FROM events e JOIN g ON e.event_type = g.grp WHERE e.value IS NOT NULL
),
ssb AS (SELECT SUM(g.n * POW(g.m - t.gm, 2)) AS ss_between FROM g, tot t)
SELECT t.k AS k_groups, t.n_total,
       ROUND(b.ss_between, 2) AS ss_between,
       ROUND(w.ss_within, 2) AS ss_within,
       ROUND((b.ss_between / (t.k - 1)) / (w.ss_within / (t.n_total - t.k)),
             6) AS f_stat
FROM tot t, ssb b, ssw w
"""


@register("stats_anova_f", ANOVA_ORACLE)
def stats_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across event types, numerically safe at scale: the
    between/within sums use CENTERED deviations (never the catastrophic
    ``sumsq - n*mean^2`` form). Pass 1 is a distributive per-group
    (count, mean); pass 2 re-streams the fact rows against the broadcast
    k-row means table. Mirrors the reference's scipy ``f_oneway`` habit
    (analysis notebooks) without collecting the measure column."""
    ev = (
        read_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    g = ev.groupBy(F.col("event_type").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"), F.avg("value").alias("m")
    )
    tot = g.agg(
        (F.sum(F.col("n") * F.col("m")) / F.sum("n")).alias("gm"),
        F.sum("n").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    ssw = (
        ev.join(F.broadcast(g), ev.event_type == g.grp)
        .agg(F.sum(F.pow(F.col("value") - F.col("m"), F.lit(2))).alias("ss_within"))
    )
    ssb = g.crossJoin(F.broadcast(tot)).agg(
        F.sum(F.col("n") * F.pow(F.col("m") - F.col("gm"), F.lit(2))).alias(
            "ss_between"
        )
    )
    return (
        tot.crossJoin(F.broadcast(ssb))
        .crossJoin(F.broadcast(ssw))
        .select(
            F.col("k").alias("k_groups"),
            "n_total",
            F.round("ss_between", 2).alias("ss_between"),
            F.round("ss_within", 2).alias("ss_within"),
            F.round(
                (F.col("ss_between") / (F.col("k") - 1))
                / (F.col("ss_within") / (F.col("n_total") - F.col("k"))),
                6,
            ).alias("f_stat"),
        )
    )


# --------------------------------------------------------------------------
# Pairwise correlation matrix — one centered aggregate over four measures
# --------------------------------------------------------------------------

CORR_MATRIX_ORACLE = """
WITH m AS (
  SELECT AVG(l_quantity) AS m1, AVG(l_extendedprice) AS m2,
         AVG(l_discount) AS m3, AVG(l_tax) AS m4, CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem
),
c AS (
  SELECT n,
    SUM((l_quantity-m1)*(l_quantity-m1)) AS s11,
    SUM((l_quantity-m1)*(l_extendedprice-m2)) AS s12,
    SUM((l_quantity-m1)*(l_discount-m3)) AS s13,
    SUM((l_quantity-m1)*(l_tax-m4)) AS s14,
    SUM((l_extendedprice-m2)*(l_extendedprice-m2)) AS s22,
    SUM((l_extendedprice-m2)*(l_discount-m3)) AS s23,
    SUM((l_extendedprice-m2)*(l_tax-m4)) AS s24,
    SUM((l_discount-m3)*(l_discount-m3)) AS s33,
    SUM((l_discount-m3)*(l_tax-m4)) AS s34,
    SUM((l_tax-m4)*(l_tax-m4)) AS s44
  FROM lineitem, m GROUP BY n
)
SELECT x.col_a, x.col_b, x.n, ROUND(x.corr, 6) + 0.0 AS corr FROM (
  SELECT 'quantity' AS col_a, 'extendedprice' AS col_b, n,
         s12/SQRT(s11*s22) AS corr FROM c
  UNION ALL SELECT 'quantity', 'discount', n, s13/SQRT(s11*s33) FROM c
  UNION ALL SELECT 'quantity', 'tax', n, s14/SQRT(s11*s44) FROM c
  UNION ALL SELECT 'extendedprice', 'discount', n, s23/SQRT(s22*s33) FROM c
  UNION ALL SELECT 'extendedprice', 'tax', n, s24/SQRT(s22*s44) FROM c
  UNION ALL SELECT 'discount', 'tax', n, s34/SQRT(s33*s44) FROM c
) x
"""


@register("stats_corr_matrix", CORR_MATRIX_ORACLE)
def stats_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full 4x4 correlation matrix (upper triangle, long form) in ONE
    second-pass aggregate: the 1-row means frame broadcasts, the fact scan
    streams once and emits all ten centered co-moments together — the
    d-column generalization is d(d+1)/2 co-moments in a single job, i.e.
    the gram-matrix building block PCA / whitening needs at 100 TB. The
    long-form explode is a 1-row ``stack``, not a shuffle."""
    cols = {
        "quantity": "l_quantity",
        "extendedprice": "l_extendedprice",
        "discount": "l_discount",
        "tax": "l_tax",
    }
    li = read_table(spark, sf_dir, "lineitem").select(*cols.values())
    means = li.agg(
        *[F.avg(c).alias(f"mean_{k}") for k, c in cols.items()],
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    keys = list(cols)
    centered = li.crossJoin(F.broadcast(means))
    sums = centered.groupBy("n").agg(
        *[
            F.sum(
                (F.col(cols[a]) - F.col(f"mean_{a}"))
                * (F.col(cols[b]) - F.col(f"mean_{b}"))
            ).alias(f"s_{a}_{b}")
            for i, a in enumerate(keys)
            for b in keys[i:]
        ]
    )
    pairs = [
        (a, b)
        for i, a in enumerate(keys)
        for b in keys[i + 1 :]
    ]
    stack_expr = ", ".join(
        f"'{a}', '{b}', s_{a}_{b} / SQRT(s_{a}_{a} * s_{b}_{b})" for a, b in pairs
    )
    return sums.select(
        F.expr(f"stack({len(pairs)}, {stack_expr}) AS (col_a, col_b, corr)"),
        "n",
    ).select("col_a", "col_b", "n", (F.round("corr", 6) + F.lit(0.0)).alias("corr"))


# --------------------------------------------------------------------------
# Grouped higher moments — skewness and excess kurtosis from central sums
# --------------------------------------------------------------------------

MOMENTS_ORACLE = """
WITH m AS (
  SELECT l_returnflag AS flag, AVG(l_extendedprice) AS mu,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY l_returnflag
),
c AS (
  SELECT m.flag, m.n, m.mu,
    SUM(POW(l.l_extendedprice - m.mu, 2)) / m.n AS m2,
    SUM(POW(l.l_extendedprice - m.mu, 3)) / m.n AS m3,
    SUM(POW(l.l_extendedprice - m.mu, 4)) / m.n AS m4
  FROM lineitem l JOIN m ON l.l_returnflag = m.flag
  GROUP BY m.flag, m.n, m.mu
)
SELECT flag, n, ROUND(mu, 4) AS mean_price,
       ROUND(m3 / POW(m2, 1.5e0), 6) + 0.0 AS skewness_g1,
       ROUND(m4 / (m2 * m2) - 3.0e0, 6) + 0.0 AS kurtosis_excess
FROM c
"""


@register("agg_moments_family", MOMENTS_ORACLE)
def agg_moments_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group skewness g1 and excess kurtosis g2 from CENTERED power
    sums (two passes: tiny means table broadcast back over the fact scan).
    Both engines' built-in ``skewness``/``kurtosis`` disagree on bias
    correction, so the registry computes the raw population moments
    identically on both sides — also the numerically honest plan: centered
    fourth powers stay ~1e15 where the raw-moment expansion would cancel
    at ~1e19."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    m = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.avg("l_extendedprice").alias("mu"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    d = F.col("l_extendedprice") - F.col("mu")
    c = (
        li.join(F.broadcast(m), li.l_returnflag == m.flag)
        .groupBy("flag", "n", "mu")
        .agg(
            (F.sum(F.pow(d, F.lit(2))) / F.col("n")).alias("m2"),
            (F.sum(F.pow(d, F.lit(3))) / F.col("n")).alias("m3"),
            (F.sum(F.pow(d, F.lit(4))) / F.col("n")).alias("m4"),
        )
    )
    return c.select(
        "flag",
        "n",
        F.round("mu", 4).alias("mean_price"),
        (F.round(F.col("m3") / F.pow(F.col("m2"), F.lit(1.5)), 6) + F.lit(0.0)).alias(
            "skewness_g1"
        ),
        (
            F.round(F.col("m4") / (F.col("m2") * F.col("m2")) - F.lit(3.0), 6)
            + F.lit(0.0)
        ).alias("kurtosis_excess"),
    )


# --------------------------------------------------------------------------
# Classical additive decomposition — trend / weekday seasonal / residual
# --------------------------------------------------------------------------

DECOMPOSE_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS dt, SUM(o_totalprice) AS y
  FROM orders GROUP BY 1
),
tr AS (
  SELECT dt, y,
    AVG(y) OVER w AS trend, COUNT(*) OVER w AS wn,
    ((CAST(dt - DATE '1970-01-05' AS INTEGER) % 7) + 7) % 7 AS wk
  FROM daily
  WINDOW w AS (ORDER BY dt ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
det AS (SELECT dt, wk, y, trend, y - trend AS dtr FROM tr WHERE wn = 7),
seas0 AS (SELECT wk, AVG(dtr) AS s0 FROM det GROUP BY wk),
seas AS (SELECT wk, s0 - (SELECT AVG(s0) FROM seas0) AS seasonal FROM seas0)
SELECT STRFTIME(d.dt, '%Y-%m-%d') AS dt, d.wk,
       ROUND(d.y, 2) AS y, ROUND(d.trend, 2) AS trend,
       ROUND(s.seasonal, 4) + 0.0 AS seasonal,
       ROUND(d.dtr - s.seasonal, 2) + 0.0 AS resid
FROM det d JOIN seas s USING (wk)
"""


@register("timeseries_decompose_ma", DECOMPOSE_ORACLE)
def timeseries_decompose_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of daily revenue: centered 7-row
    moving-average trend (full windows only), weekday seasonal indices
    normalized to mean zero, residual = detrended - seasonal. Weekday is
    engine-neutral modular day arithmetic from a Monday anchor (both
    engines' DOW builtins disagree on week start). The raw scan collapses
    to O(days) rows before any window; the single-partition ordered frame
    is calendar-bounded, and the 7-row seasonal table broadcasts back."""
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("dt"))
        .agg(F.sum("o_totalprice").alias("y"))
    )
    w = Window.orderBy("dt").rowsBetween(-3, 3)
    tr = daily.select(
        "dt",
        "y",
        F.avg("y").over(w).alias("trend"),
        F.count(F.lit(1)).over(w).alias("wn"),
        F.pmod(F.datediff(F.col("dt"), F.lit("1970-01-05").cast("date")), F.lit(7)).alias("wk"),
    )
    det = tr.where(F.col("wn") == 7).select(
        "dt", "wk", "y", "trend", (F.col("y") - F.col("trend")).alias("dtr")
    )
    seas0 = det.groupBy("wk").agg(F.avg("dtr").alias("s0"))
    seas = seas0.select(
        "wk", (F.col("s0") - F.avg("s0").over(Window.partitionBy())).alias("seasonal")
    )
    return det.join(F.broadcast(seas), "wk").select(
        F.date_format("dt", "yyyy-MM-dd").alias("dt"),
        "wk",
        F.round("y", 2).alias("y"),
        F.round("trend", 2).alias("trend"),
        (F.round("seasonal", 4) + F.lit(0.0)).alias("seasonal"),
        (F.round(F.col("dtr") - F.col("seasonal"), 2) + F.lit(0.0)).alias("resid"),
    )


# --------------------------------------------------------------------------
# Cross-correlation of two daily series at signed lags
# --------------------------------------------------------------------------

CCF_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS dt,
    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p_cnt,
    SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS s_cnt
  FROM events GROUP BY 1
),
lags AS (SELECT UNNEST(GENERATE_SERIES(-3, 3)) AS lag)
SELECT CAST(l.lag AS INTEGER) AS lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(CORR(a.p_cnt, b.s_cnt), 6) + 0.0 AS r
FROM lags l
JOIN daily a ON TRUE
JOIN daily b ON b.dt = a.dt + CAST(l.lag AS INTEGER)
GROUP BY l.lag
"""


@register("stats_ccf_lags", CCF_ORACLE)
def stats_ccf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between daily purchase and signup counts
    at lags -3..+3 (does one series lead the other?). The event scan
    collapses to O(days) once; the lag fan-out is an ``explode(sequence)``
    over that tiny frame followed by a self equi-join on the shifted date
    — never a range join against the raw events. Pearson r via the
    built-in ``corr`` aggregate (scale-free, cross-engine stable)."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("dt")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("p_cnt"),
        F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0)).alias("s_cnt"),
    )
    a = daily.withColumn(
        "lag", F.explode(F.sequence(F.lit(-3), F.lit(3)))
    ).withColumn("dt_b", F.expr("date_add(dt, lag)"))
    b = daily.select(F.col("dt").alias("dt_b"), F.col("s_cnt").alias("s_cnt_b"))
    return (
        a.join(b, "dt_b")
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            (F.round(F.corr("p_cnt", "s_cnt_b"), 6) + F.lit(0.0)).alias("r"),
        )
    )


# --------------------------------------------------------------------------
# GROUPS-frame window semantics — peer-group sums via dense_rank + RANGE
# --------------------------------------------------------------------------

GROUPS_FRAME_ORACLE = """
WITH r AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         DENSE_RANK() OVER (PARTITION BY o_custkey
                            ORDER BY CAST(o_orderdate AS DATE)) AS dr
  FROM orders
)
SELECT o_orderkey, o_custkey,
  ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY dr
        RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING), 2) AS peer_sum,
  CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY dr
        RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS peer_cnt
FROM r
"""


@register("window_groups_frame", GROUPS_FRAME_ORACLE)
def window_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2016 GROUPS-frame semantics (frame bounds counted in PEER
    GROUPS of the ORDER BY value, not rows) — neither engine implements
    GROUPS natively, so both sides run the canonical emulation:
    ``dense_rank`` assigns each peer group an integer, then a RANGE frame
    of ±1 over that rank covers exactly the adjacent peer groups
    (duplicate order dates collapse into one frame step). Both windows
    share ONE hash exchange on the partition key."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", F.to_date("o_orderdate").alias("od")
    )
    wr = Window.partitionBy("o_custkey").orderBy("od")
    r = o.withColumn("dr", F.dense_rank().over(wr))
    wg = Window.partitionBy("o_custkey").orderBy("dr").rangeBetween(-1, 1)
    return r.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(wg), 2).alias("peer_sum"),
        F.count(F.lit(1)).over(wg).cast("bigint").alias("peer_cnt"),
    )


# --------------------------------------------------------------------------
# Holt linear-trend smoothing — struct-accumulator list fold
# --------------------------------------------------------------------------

HOLT_ORACLE = """
WITH RECURSIVE monthly AS (
  SELECT o_orderpriority AS pri, DATE_TRUNC('month', CAST(o_orderdate AS DATE)) AS mth,
         SUM(o_totalprice) AS y
  FROM orders GROUP BY 1, 2
),
ser AS (
  SELECT pri, y, ROW_NUMBER() OVER (PARTITION BY pri ORDER BY mth) AS rn
  FROM monthly
),
nd AS (SELECT pri, CAST(COUNT(*) AS BIGINT) AS n_months FROM ser GROUP BY pri),
rec AS (
  SELECT pri, 1 AS i, y AS l, 0.0e0 AS b FROM ser WHERE rn = 1
  UNION ALL
  SELECT s.pri, r.i + 1,
         0.5e0 * s.y + 0.5e0 * (r.l + r.b),
         0.3e0 * ((0.5e0 * s.y + 0.5e0 * (r.l + r.b)) - r.l) + 0.7e0 * r.b
  FROM rec r JOIN ser s ON s.pri = r.pri AND s.rn = r.i + 1
)
SELECT r.pri, n.n_months, ROUND(r.l, 4) AS level_final,
       ROUND(r.b, 4) + 0.0 AS trend_final,
       ROUND(r.l + 3 * r.b, 4) AS forecast_h3
FROM rec r JOIN nd n ON n.pri = r.pri AND r.i = n.n_months
"""


@register("timeseries_holt_linear", HOLT_ORACLE)
def timeseries_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing (alpha=0.5, beta=0.3,
    l1=x1, b1=0) over each priority's monthly revenue, plus the h=3
    forecast. Extends the ``timeseries_ewma_final`` engine-portable fold
    (temporal.py) to a (level, trend) STRUCT accumulator via Spark
    ``aggregate`` seeded with element 1 folding the sliced tail; the
    oracle is a recursive CTE (DuckDB 1.0's ``list_reduce`` mutates
    struct-accumulator fields sequentially mid-lambda, so a struct fold
    there silently reads updated state). Per-key memory is
    calendar-bounded (one struct per month); the raw scan collapses
    distributively first."""
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.trunc(F.to_date("o_orderdate"), "month").alias("dt"),
        )
        .agg(F.sum("o_totalprice").alias("y"))
    )
    ys = F.transform(
        F.array_sort(F.collect_list(F.struct("dt", "y"))), lambda s: s["y"]
    )
    ser = daily.groupBy("pri").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"), ys.alias("ys")
    )

    def step(acc, x):
        new_l = F.lit(0.5) * x + F.lit(0.5) * (acc["l"] + acc["b"])
        new_b = F.lit(0.3) * (new_l - acc["l"]) + F.lit(0.7) * acc["b"]
        return F.struct(new_l.alias("l"), new_b.alias("b"))

    init = F.struct(
        F.element_at("ys", 1).alias("l"), F.lit(0.0).alias("b")
    )
    fold = F.aggregate(
        F.slice(F.col("ys"), 2, F.size("ys") - 1), init, step
    )
    fit = ser.select("pri", "n_months", fold.alias("st"))
    return fit.select(
        "pri",
        "n_months",
        F.round(F.col("st.l"), 4).alias("level_final"),
        (F.round(F.col("st.b"), 4) + F.lit(0.0)).alias("trend_final"),
        F.round(F.col("st.l") + F.lit(3) * F.col("st.b"), 4).alias("forecast_h3"),
    )


# --------------------------------------------------------------------------
# Theil-Sen robust slope — median of pairwise slopes over the monthly series
# --------------------------------------------------------------------------

THEILSEN_ORACLE = """
WITH monthly AS (
  SELECT DATE_TRUNC('month', CAST(o_orderdate AS DATE)) AS m, SUM(o_totalprice) AS y
  FROM orders GROUP BY 1
),
ser AS (SELECT ROW_NUMBER() OVER (ORDER BY m) AS x, y FROM monthly),
slopes AS (
  SELECT (b.y - a.y) / (b.x - a.x) AS s
  FROM ser a JOIN ser b ON b.x > a.x
)
SELECT CAST((SELECT COUNT(*) FROM ser) AS BIGINT) AS n_months,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(MEDIAN(s), 4) + 0.0 AS theil_sen_slope
FROM slopes
"""


@register("stats_theilsen_monthly", THEILSEN_ORACLE)
def stats_theilsen_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen estimator (median of all pairwise slopes) of the monthly
    revenue trend — robust to the outlier months OLS chases. The O(n^2)
    pair fan-out runs over the CALENDAR-BOUNDED monthly aggregate (~100
    rows however big the fact table), never raw rows: at 100 TB the plan
    is one distributive monthly rollup then a broadcast self-pair of a
    hundred rows. Median via interpolated ``percentile`` == DuckDB
    ``MEDIAN``."""
    monthly = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.trunc(F.to_date("o_orderdate"), "month").alias("m"))
        .agg(F.sum("o_totalprice").alias("y"))
    )
    ser = monthly.select(
        F.row_number().over(Window.orderBy("m")).alias("x"), "y"
    )
    a = ser.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = ser.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    slopes = a.join(F.broadcast(b), F.col("xb") > F.col("xa")).select(
        ((F.col("yb") - F.col("ya")) / (F.col("xb") - F.col("xa"))).alias("s")
    )
    agg = slopes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        (F.round(F.expr("percentile(s, 0.5)"), 4) + F.lit(0.0)).alias(
            "theil_sen_slope"
        ),
    )
    # n from n_pairs = n(n-1)/2 — exact integer algebra, saves a third
    # scan subtree that a separate count would force
    n_months = F.round((F.lit(1.0) + F.sqrt(F.lit(1.0) + 8.0 * F.col("n_pairs"))) / 2.0).cast(
        "bigint"
    )
    return agg.select(
        n_months.alias("n_months"), "n_pairs", "theil_sen_slope"
    )


# --------------------------------------------------------------------------
# Kendall tau-b — exact concordant/discordant pair counts on the daily series
# --------------------------------------------------------------------------

KENDALL_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS dt, COUNT(*) AS c, SUM(o_totalprice) AS rev
  FROM orders GROUP BY 1
),
p AS (
  SELECT SUM(CASE WHEN (b.c - a.c) * (b.rev - a.rev) > 0 THEN 1 ELSE 0 END) AS conc,
         SUM(CASE WHEN (b.c - a.c) * (b.rev - a.rev) < 0 THEN 1 ELSE 0 END) AS disc,
         SUM(CASE WHEN a.c = b.c AND a.rev <> b.rev THEN 1 ELSE 0 END) AS tie_x,
         SUM(CASE WHEN a.rev = b.rev AND a.c <> b.c THEN 1 ELSE 0 END) AS tie_y,
         COUNT(*) AS n_pairs
  FROM daily a JOIN daily b ON b.dt > a.dt
)
SELECT CAST(conc AS BIGINT) AS concordant, CAST(disc AS BIGINT) AS discordant,
       CAST(tie_x AS BIGINT) AS ties_x, CAST(tie_y AS BIGINT) AS ties_y,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       ROUND((conc - disc) / (SQRT(n_pairs - tie_x) * SQRT(n_pairs - tie_y)),
             6) + 0.0 AS tau_b
FROM p
"""


@register("stats_kendall_tau_daily", KENDALL_ORACLE)
def stats_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between daily order count and daily
    revenue, from EXACT concordant / discordant / tie pair counts (integer
    arithmetic — the only float is the final ratio). Like Theil-Sen the
    quadratic pair space is over the calendar-bounded daily aggregate
    (~2.4k rows -> ~3M integer comparisons), which a broadcast self-join
    evaluates in one streamed pass; the raw scan collapses first."""
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("dt"))
        .agg(F.count(F.lit(1)).alias("c"), F.sum("o_totalprice").alias("rev"))
    )
    a = daily.select(F.col("dt").alias("dta"), F.col("c").alias("ca"), F.col("rev").alias("ra"))
    b = daily.select(F.col("dt").alias("dtb"), F.col("c").alias("cb"), F.col("rev").alias("rb"))
    pr = a.join(F.broadcast(b), F.col("dtb") > F.col("dta"))
    sgn = (F.col("cb") - F.col("ca")) * (F.col("rb") - F.col("ra"))
    p = pr.agg(
        F.sum(F.when(sgn > 0, 1).otherwise(0)).alias("conc"),
        F.sum(F.when(sgn < 0, 1).otherwise(0)).alias("disc"),
        F.sum(
            F.when((F.col("ca") == F.col("cb")) & (F.col("ra") != F.col("rb")), 1).otherwise(0)
        ).alias("tie_x"),
        F.sum(
            F.when((F.col("ra") == F.col("rb")) & (F.col("ca") != F.col("cb")), 1).otherwise(0)
        ).alias("tie_y"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    return p.select(
        F.col("conc").cast("bigint").alias("concordant"),
        F.col("disc").cast("bigint").alias("discordant"),
        F.col("tie_x").cast("bigint").alias("ties_x"),
        F.col("tie_y").cast("bigint").alias("ties_y"),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        (
            F.round(
                (F.col("conc") - F.col("disc"))
                / (
                    F.sqrt(F.col("n_pairs") - F.col("tie_x"))
                    * F.sqrt(F.col("n_pairs") - F.col("tie_y"))
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("tau_b"),
    )


# --------------------------------------------------------------------------
# Temperature-scaled source mixing — UniMax-style LLM data mix
# --------------------------------------------------------------------------

TEMPERATURE_MIX_ORACLE = """
WITH g AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang),
w AS (SELECT lang, n_docs, POW(n_docs, 0.7e0) AS wt FROM g),
p AS (SELECT lang, n_docs, wt / SUM(wt) OVER () AS prob FROM w),
quota AS (SELECT lang, n_docs, prob, CAST(FLOOR(prob * 200) AS BIGINT) AS quota FROM p),
ranked AS (
  SELECT d.lang, d.doc_id,
         ROW_NUMBER() OVER (PARTITION BY d.lang ORDER BY md5('mix|' || d.doc_id)) AS rk
  FROM documents d
),
sel AS (
  SELECT r.lang, COUNT(*) AS picked, SUM(r.doc_id) AS id_sum
  FROM ranked r JOIN quota q ON q.lang = r.lang AND r.rk <= q.quota
  GROUP BY r.lang
)
SELECT q.lang, q.n_docs, ROUND(q.prob, 6) AS prob, q.quota,
       CAST(COALESCE(s.picked, 0) AS BIGINT) AS picked,
       CAST(COALESCE(s.id_sum, 0) AS BIGINT) AS id_sum
FROM quota q LEFT JOIN sel s ON s.lang = q.lang
"""


@register("training_temperature_mix", TEMPERATURE_MIX_ORACLE)
def training_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language mixing for a training corpus
    (p_s ∝ n_s^alpha, alpha=0.7 — the standard up/down-weighting between
    proportional alpha=1 and uniform alpha=0), with per-language quotas
    filled by a DETERMINISTIC md5 ranking (seeded, reproducible,
    cross-engine checkable — the rand() alternative is neither). id_sum
    proves BOTH engines picked the SAME documents, not just the same
    count. The |langs|-row weight frame broadcasts; docs shuffle once for
    the per-language ranking window."""
    docs = read_table(spark, sf_dir, "documents")
    g = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    w = g.withColumn("wt", F.pow(F.col("n_docs"), F.lit(0.7)))
    p = w.withColumn("prob", F.col("wt") / F.sum("wt").over(Window.partitionBy()))
    quota = p.select(
        "lang", "n_docs", "prob",
        F.floor(F.col("prob") * 200).cast("bigint").alias("quota"),
    )
    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            F.md5(F.concat(F.lit("mix|"), F.col("doc_id").cast("string")))
        )
    )
    ranked = docs.select("lang", "doc_id", rk.alias("rk"))
    sel = (
        ranked.join(F.broadcast(quota.select("lang", "quota")), "lang")
        .where(F.col("rk") <= F.col("quota"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("picked"),
            F.sum("doc_id").alias("id_sum"),
        )
    )
    return (
        quota.join(sel, "lang", "left")
        .select(
            "lang",
            "n_docs",
            F.round("prob", 6).alias("prob"),
            "quota",
            F.coalesce("picked", F.lit(0)).cast("bigint").alias("picked"),
            F.coalesce("id_sum", F.lit(0)).cast("bigint").alias("id_sum"),
        )
    )


# --------------------------------------------------------------------------
# Grouped linear regression — per-nation monthly revenue trend
# --------------------------------------------------------------------------

REGR_NATION_ORACLE = """
WITH m AS (
  SELECT n.n_name AS nation,
         (EXTRACT(YEAR FROM o.o_orderdate) - 1992) * 12
           + EXTRACT(MONTH FROM o.o_orderdate) AS mx,
         SUM(o.o_totalprice) AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_months,
       ROUND(REGR_SLOPE(y, mx), 4) + 0.0 AS slope,
       ROUND(REGR_INTERCEPT(y, mx), 1) + 0.0 AS intercept,
       ROUND(REGR_R2(y, mx), 6) + 0.0 AS r2
FROM m GROUP BY nation
"""


@register("regr_grouped_by_nation", REGR_NATION_ORACLE)
def regr_grouped_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation OLS trend of monthly revenue against a month index —
    the grouped complement of the global ``regr_linear_functions`` sweep.
    Both engines' built-in REGR_* aggregates compute from the same
    (co)moment accumulations, so the grouped results hash-match at 4-6 dp.
    Dimensions broadcast; the fact scan aggregates distributively to
    nation x month before the tiny regression pass."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    mx = (F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate")
    m = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), mx.alias("mx"))
        .agg(F.sum("o_totalprice").alias("y"))
    )
    return m.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        (F.round(F.expr("regr_slope(y, mx)"), 4) + F.lit(0.0)).alias("slope"),
        (F.round(F.expr("regr_intercept(y, mx)"), 1) + F.lit(0.0)).alias("intercept"),
        (F.round(F.expr("regr_r2(y, mx)"), 6) + F.lit(0.0)).alias("r2"),
    )


# --------------------------------------------------------------------------
# Adamic-Adar link prediction over the customer-part co-purchase graph
# --------------------------------------------------------------------------

ADAMIC_ADAR_ORACLE = """
WITH edges AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
deg AS (SELECT cust, COUNT(*) AS d FROM edges GROUP BY cust),
pairs AS (
  SELECT a.part AS p1, b.part AS p2, SUM(1.0e0 / LN(g.d)) AS aa, COUNT(*) AS common
  FROM edges a JOIN edges b ON a.cust = b.cust AND a.part < b.part
  JOIN deg g ON g.cust = a.cust
  WHERE g.d >= 2
  GROUP BY a.part, b.part
)
SELECT p1, p2, CAST(common AS BIGINT) AS common_neighbors, ROUND(aa, 6) AS adamic_adar
FROM pairs WHERE common >= 2
ORDER BY ROUND(aa, 6) DESC, p1, p2 LIMIT 50
"""


@register("graph_adamic_adar", ADAMIC_ADAR_ORACLE)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the bipartite co-purchase graph:
    candidate part pairs scored by sum(1/ln(degree)) over shared
    customers, so promiscuous customers contribute less than selective
    ones. The pair fan-out is the standard wedge enumeration — an
    EQUI-join on the shared customer, quadratic only in per-customer
    basket size (bounded by the degree cap the stress corpus documents;
    dial = the common>=2 support filter). Top-50 by (rounded score, keys)
    is a TakeOrderedAndProject, never a global sort."""
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        .distinct()
    )
    deg = edges.groupBy("cust").agg(F.count(F.lit(1)).alias("d"))
    a = edges.select("cust", F.col("part").alias("p1"))
    b = edges.select(F.col("cust").alias("cust_b"), F.col("part").alias("p2"))
    pairs = (
        a.join(b, (F.col("cust") == F.col("cust_b")) & (F.col("p1") < F.col("p2")))
        .join(deg.where(F.col("d") >= 2), "cust")
        .groupBy("p1", "p2")
        .agg(
            F.sum(F.lit(1.0) / F.log(F.col("d"))).alias("aa"),
            F.count(F.lit(1)).alias("common"),
        )
        .where(F.col("common") >= 2)
    )
    return (
        pairs.select(
            "p1",
            "p2",
            F.col("common").cast("bigint").alias("common_neighbors"),
            F.round("aa", 6).alias("adamic_adar"),
        )
        .orderBy(F.desc("adamic_adar"), "p1", "p2")
        .limit(50)
    )


# --------------------------------------------------------------------------
# Clamped (floor-at-zero) running inventory fold — non-linear recursion
# --------------------------------------------------------------------------

CLAMPED_FOLD_ORACLE = """
WITH mdelta AS (
  SELECT l_suppkey AS supp, DATE_TRUNC('month', CAST(l_shipdate AS DATE)) AS m,
         SUM(CASE WHEN l_returnflag = 'R' THEN -l_quantity ELSE l_quantity END) AS delta
  FROM lineitem GROUP BY 1, 2
),
ser AS (
  SELECT supp, CAST(COUNT(*) AS BIGINT) AS n_months, list(delta ORDER BY m) AS ds
  FROM mdelta GROUP BY supp
)
SELECT supp, n_months,
       ROUND(list_reduce(list_prepend(0.0e0, ds),
                         (acc, x) -> GREATEST(0.0e0, acc + x)), 4) AS clamped_level,
       ROUND(list_reduce(list_prepend(0.0e0, ds), (acc, x) -> acc + x), 4)
         + 0.0 AS net_level
FROM ser
"""


@register("inventory_clamped_running_sum", CLAMPED_FOLD_ORACLE)
def inventory_clamped_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stock level that cannot go negative: fold GREATEST(0, acc+delta)
    over each supplier's monthly net-quantity series. The clamp makes the
    recursion NON-LINEAR — no prefix-sum/window rewrite exists — so this
    is the engine-portable scalar fold (Spark ``aggregate`` with explicit
    0 seed == DuckDB ``list_reduce`` over the 0-prepended list; scalar
    accumulators dodge DuckDB's sequential struct-field mutation). Net
    (unclamped) level folds the SAME path for an order-identical float
    reference. Per-key state is calendar-bounded."""
    li = read_table(spark, sf_dir, "lineitem")
    delta = F.when(F.col("l_returnflag") == "R", -F.col("l_quantity")).otherwise(
        F.col("l_quantity")
    )
    mdelta = li.groupBy(
        F.col("l_suppkey").alias("supp"),
        F.trunc(F.to_date("l_shipdate"), "month").alias("m"),
    ).agg(F.sum(delta).alias("delta"))
    ds = F.transform(
        F.array_sort(F.collect_list(F.struct("m", "delta"))), lambda s: s["delta"]
    )
    ser = mdelta.groupBy("supp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"), ds.alias("ds")
    )
    clamped = F.aggregate(
        F.col("ds"),
        F.lit(0.0),
        lambda acc, x: F.greatest(F.lit(0.0), acc + x),
    )
    net = F.aggregate(F.col("ds"), F.lit(0.0), lambda acc, x: acc + x)
    return ser.select(
        "supp",
        "n_months",
        F.round(clamped, 4).alias("clamped_level"),
        (F.round(net, 4) + F.lit(0.0)).alias("net_level"),
    )


# --------------------------------------------------------------------------
# EWMA control chart — per-day smoothed level + 2-sigma anomaly flags
# --------------------------------------------------------------------------

EWMA_CHART_ORACLE = """
WITH RECURSIVE daily AS (
  SELECT CAST(ts AS DATE) AS dt, CAST(COUNT(*) AS DOUBLE) AS y FROM events GROUP BY 1
),
ser AS (SELECT ROW_NUMBER() OVER (ORDER BY dt) AS rn, dt, y FROM daily),
stats AS (SELECT STDDEV_POP(y) AS sig FROM daily),
rec AS (
  SELECT rn, dt, y, y AS ewma FROM ser WHERE rn = 1
  UNION ALL
  SELECT s.rn, s.dt, s.y, 0.3e0 * s.y + 0.7e0 * r.ewma
  FROM rec r JOIN ser s ON s.rn = r.rn + 1
)
SELECT STRFTIME(r.dt, '%Y-%m-%d') AS dt, r.y,
       ROUND(r.ewma, 6) AS ewma,
       ROUND(ABS(r.y - r.ewma) / t.sig, 6) AS dev_ratio,
       CASE WHEN ROUND(ABS(r.y - r.ewma) / t.sig, 6) > 2.0e0 THEN 1 ELSE 0 END
         AS flagged
FROM rec r, stats t
"""


@register("anomaly_ewma_control_chart", EWMA_CHART_ORACLE)
def anomaly_ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart over the daily event count: every day carries
    its running smoothed level and a 2-sigma deviation flag. Unlike the
    final-value EWMA fold this needs the PER-ROW recursion trace, so the
    calendar-bounded daily series folds once per prefix
    (posexplode + sliced aggregate — O(days^2) scalar folds over an
    aggregate-fed frame, ~zero at calendar scale; at longer horizons the
    same trace comes from functions/timeseries.py:ewma_per_row's
    applyInPandas). The sigma gate compares ROUNDED ratios so both
    engines flag identically at the boundary."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("dt")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    one = daily.agg(
        F.array_sort(F.collect_list(F.struct("dt", "y"))).alias("arr"),
        F.stddev_pop("y").alias("sig"),
    )
    ex = one.select(
        "arr", "sig", F.posexplode(F.col("arr")).alias("pos", "s")
    )
    ys = F.transform(F.col("arr"), lambda s: s["y"])
    ewma = F.aggregate(
        F.slice(ys, 2, F.col("pos")),
        F.element_at(ys, 1),
        lambda acc, x: F.lit(0.3) * x + F.lit(0.7) * acc,
    )
    dev = F.round(F.abs(F.col("s.y") - F.col("ewma")) / F.col("sig"), 6)
    return (
        ex.withColumn("ewma", ewma)
        .select(
            F.date_format("s.dt", "yyyy-MM-dd").alias("dt"),
            F.col("s.y").alias("y"),
            F.round("ewma", 6).alias("ewma"),
            dev.alias("dev_ratio"),
            F.when(dev > 2.0, 1).otherwise(0).alias("flagged"),
        )
    )

"""Round-10 registry additions — fourth consolidation batch (VERDICT r6
keeps the ≤10-new-queries-per-round discipline while the driver window
drains the last backlog; these 10 fill genuine eval/stats/similarity
surface gaps, 10/10 oracle-checked):

- MAP@10 (mean-average-precision) per ranked segment — the set-valued
  sibling of ``ml_mrr_at_k``'s single-hit reciprocal rank;
- PR-AUC (area under the precision-recall curve by threshold steps) — the
  class-imbalance-robust sibling of ``ml_auc_roc``;
- Kruskal-Wallis H (k-group rank test, tie-corrected) — the k-group
  generalization of ``stats_mann_whitney``, global midranks WITHOUT an
  Exchange SinglePartition (bucketed prefix-sum);
- Jarque-Bera normality test per segment (skewness/excess-kurtosis form);
- Wilson 95% score intervals on per-shipmode return rates (the
  small-n-safe binomial CI the normal approximation gets wrong);
- Mann-Kendall trend test + variance with tie correction on per-nation
  monthly revenue (the significance counterpart of
  ``stats_theilsen_monthly``'s Sen slope);
- two-sample effect sizes per nation (Cohen's d, Hedges' g, Glass's Δ);
- Matryoshka prefix-dimension recall@10: how much of the full-dimension
  cosine top-10 survives truncating embeddings to their first 16 dims
  (the MRL dial every vector-store schema decision needs);
- SAX symbolization (z-normalize → PAA → 4-symbol Gaussian breakpoints)
  of per-nation monthly revenue series;
- empirical-Bayes shrunk supplier return rates (beta-binomial method of
  moments) — the smoothed-rate technique behind every per-source quality
  score on skewed group sizes.

Registered LAST (after plans/round9 in registry.load_all) so these append
AFTER every existing query in the driver's self-rotating verification
window — new names must never displace the queued unverified backlog (the
three rows-only stragglers sit at window positions 13/18/45 this round).

Scale notes (100 TB): every aggregation is distributive before any window;
the only windows run over (segment, distinct-score) group rows (PR-AUC),
bounded top-10 survivor frames (MAP), calendar-bounded monthly series
(SAX), or bucket-local slices (Kruskal-Wallis midranks via
``bucketed_running_sum`` — NO single-partition exchange); MAP's per-segment
top-10 uses ``salted_topn_per_key`` so a hot segment never serializes
through one reducer; Matryoshka broadcasts the bounded query side and
computes both similarity columns in ONE corpus pass; exact integer cents
keep every rank key and moment sum bit-identical cross-engine (the
Theil/NDCG/AUC discipline). Jarque-Bera rounds its test statistic at 4 dp:
JB scales with n, so 6-dp rounding would sit inside cross-engine
float-summation noise at lake scale (same reasoning as the registry
docstring's 2–6 dp rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_dags_spark.functions.scalable_windows import (
    bucketed_running_sum,
    salted_topn_per_key,
)
from airflow_dags_spark.functions.vectors import as_double
from airflow_dags_spark.plans.registry import register
from airflow_dags_spark.plans.shared import monthly_revenue_cents
from airflow_dags_spark.sources.tables import read_table

_CENTS = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
_Z95 = 1.959963984540054  # Φ⁻¹(0.975), shared by both engines as a literal


# --------------------------------------------------------------------------
# MAP@10 — mean average precision per ranked segment
# --------------------------------------------------------------------------

MAP_AT_K_ORACLE = """
WITH acts AS (
  SELECT event_type, user_id,
         SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS v
  FROM events WHERE user_id IS NOT NULL
  GROUP BY event_type, user_id
),
rel AS (
  SELECT user_id, COUNT(*) AS r FROM events
  WHERE event_type = 'purchase' AND user_id IS NOT NULL
  GROUP BY user_id
),
cand AS (
  SELECT a.event_type, a.user_id, a.v, COALESCE(rel.r, 0) AS r
  FROM acts a LEFT JOIN rel ON a.user_id = rel.user_id
),
rtot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rel
  FROM cand WHERE r > 0 GROUP BY event_type
),
ranked AS (
  SELECT event_type, r,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY v DESC, user_id) AS pos
  FROM cand
),
top AS (SELECT * FROM ranked WHERE pos <= 10),
hits AS (
  SELECT event_type, pos,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY pos)
           AS hit_rank
  FROM top WHERE r > 0
),
ap AS (
  SELECT t.event_type,
         CAST(COUNT(h.pos) AS BIGINT) AS n_hits_at_10,
         SUM(CAST(h.hit_rank AS DOUBLE) / h.pos) AS prec_sum
  FROM top t LEFT JOIN hits h
    ON t.event_type = h.event_type AND t.pos = h.pos
  GROUP BY t.event_type
)
SELECT ap.event_type, COALESCE(rt.n_rel, 0) AS n_rel, ap.n_hits_at_10,
       CASE WHEN COALESCE(rt.n_rel, 0) > 0
            THEN ROUND(COALESCE(ap.prec_sum, 0)
                       / LEAST(rt.n_rel, 10), 6) END AS ap_at_10
FROM ap LEFT JOIN rtot rt ON ap.event_type = rt.event_type
"""


@register("ml_map_at_k", MAP_AT_K_ORACLE)
def ml_map_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision @10 per event segment: users ranked by exact-cents
    activity value (same key discipline as ml_ndcg_at_k/ml_mrr_at_k), a hit
    = any purchase. AP@10 = Σ_{hit at pos i ≤ 10} (hits≤i / i) / min(R,10);
    segments with zero relevant candidates are NULL on both engines.

    Scale shape: the per-segment top-10 comes from ``salted_topn_per_key``
    — a hot segment's candidates rank within (segment, salt) first, so no
    reducer ever sees more than 1/n_salts of a hot key; every window after
    that runs over ≤ 10 survivor rows per segment. The relevant-count frame
    is k rows, broadcast."""
    e = read_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    acts = e.groupBy("event_type", "user_id").agg(F.sum(cents).alias("v"))
    rel = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("r"))
    )
    cand = acts.join(rel, "user_id", "left").select(
        "event_type", "user_id", "v", F.coalesce("r", F.lit(0)).alias("r")
    )
    rtot = (
        cand.where(F.col("r") > 0)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rel"))
    )
    top = salted_topn_per_key(
        cand, "event_type", [F.desc("v"), F.asc("user_id")], 10,
        salt_src="user_id",
    )
    # both windows below run over the ≤10 survivor rows per segment
    w_pos = Window.partitionBy("event_type").orderBy(F.desc("v"), F.asc("user_id"))
    posd = top.withColumn("pos", F.row_number().over(w_pos))
    hits = posd.withColumn(
        "hit_rank", F.when(F.col("r") > 0, F.row_number().over(
            Window.partitionBy("event_type", F.col("r") > 0).orderBy("pos")
        )),
    )
    ap = hits.groupBy("event_type").agg(
        F.sum(F.when(F.col("r") > 0, 1).otherwise(0))
        .cast("bigint").alias("n_hits_at_10"),
        F.sum(
            F.when(
                F.col("r") > 0,
                F.col("hit_rank").cast("double") / F.col("pos"),
            )
        ).alias("prec_sum"),
    )
    j = ap.join(F.broadcast(rtot), "event_type", "left")
    n_rel = F.coalesce("n_rel", F.lit(0)).cast("bigint")
    return j.select(
        "event_type",
        n_rel.alias("n_rel"),
        "n_hits_at_10",
        F.when(
            n_rel > 0,
            F.round(
                F.coalesce("prec_sum", F.lit(0.0)) / F.least(n_rel, F.lit(10)),
                6,
            ),
        ).alias("ap_at_10"),
    )


# --------------------------------------------------------------------------
# PR-AUC — area under the precision-recall curve by threshold steps
# --------------------------------------------------------------------------

PR_AUC_ORACLE = f"""
WITH g AS (
  -- group rows to (segment, exact-cents score) BEFORE any window: the
  -- threshold sweep walks distinct scores, never data rows (AUC discipline)
  SELECT o_orderpriority AS prio, {_CENTS} AS cents,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS pos_cnt
  FROM orders GROUP BY 1, 2
),
tot AS (
  SELECT prio, CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(pos_cnt) AS BIGINT) AS n_pos
  FROM g GROUP BY prio
),
r AS (
  SELECT prio, cnt, pos_cnt,
         SUM(cnt) OVER (PARTITION BY prio ORDER BY cents DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_n,
         SUM(pos_cnt) OVER (PARTITION BY prio ORDER BY cents DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_pos
  FROM g
)
SELECT r.prio, t.n_pos, CAST(t.n - t.n_pos AS BIGINT) AS n_neg,
       CASE WHEN t.n > 0
            THEN ROUND(t.n_pos / CAST(t.n AS DOUBLE), 6) END AS prevalence,
       -- step AP: Σ over descending thresholds of Δrecall · precision;
       -- single-class segments have no PR curve → NULL both engines
       CASE WHEN t.n_pos > 0 THEN
         ROUND(SUM(CASE WHEN r.pos_cnt > 0
                        THEN (r.pos_cnt / CAST(t.n_pos AS DOUBLE))
                             * (r.cum_pos / CAST(r.cum_n AS DOUBLE))
                        ELSE 0 END), 6)
       END AS pr_auc
FROM r JOIN tot t ON r.prio = t.prio
GROUP BY r.prio, t.n, t.n_pos
"""


@register("ml_pr_auc", PR_AUC_ORACLE)
def ml_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PR-AUC per order-priority segment as the step-integral of the
    precision-recall curve over descending score thresholds (average
    precision): AP = Σ_t Δrecall(t)·precision(t). Score = exact integer
    cents, positive class = finalized orders — the class-imbalance-robust
    companion to ``ml_auc_roc``.

    Scale shape: one partial+final hash agg collapses rows to (segment,
    distinct-score) groups before the cumulative window (the AUC
    discipline — the window sorts |distinct prices| rows per segment, not
    data rows); segment totals are a k-row broadcast. Cumulative counts
    are exact integers, so the summands are bit-identical cross-engine."""
    o = read_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    g = o.groupBy(
        F.col("o_orderpriority").alias("prio"), cents.alias("cents")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("bigint")
        .alias("pos_cnt"),
    )
    tot = g.groupBy("prio").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum("pos_cnt").cast("bigint").alias("n_pos"),
    )
    # Per-prio cumulative counts WITHOUT one reducer per priority: the
    # plain per-prio window dragged each segment's ~30k distinct-score
    # rows through a single task (5 segments ⇒ 5 tasks; 8→32-core scaling
    # 1.10 in PERF_r10 — r10 verdict #7). Prefix-sum composition instead
    # (the bucketed_running_sum_grouped idiom, two measures sharing one
    # totals frame): cumulate within monotone cents buckets in parallel,
    # offset each bucket by the tiny per-(prio, bucket) totals of strictly
    # HIGHER buckets (DESC order). Counts are integers — exact at any fold
    # order — so cum_n/cum_pos are bit-identical to the single-window form.
    g = g.withColumn("__b", F.floor(F.col("cents") / F.lit(1_000_000)))
    w_in = (
        Window.partitionBy("prio", "__b")
        .orderBy(F.desc("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_off = (
        Window.partitionBy("prio")
        .orderBy(F.desc("__b"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        g.groupBy("prio", "__b")
        .agg(
            F.sum("cnt").alias("__tn"),
            F.sum("pos_cnt").alias("__tp"),
        )
        .select(
            "prio", "__b",
            F.coalesce(F.sum("__tn").over(w_off), F.lit(0)).alias("__on"),
            F.coalesce(F.sum("__tp").over(w_off), F.lit(0)).alias("__op"),
        )
    )
    r = g.join(F.broadcast(offsets), ["prio", "__b"]).select(
        "prio", "cnt", "pos_cnt",
        (F.sum("cnt").over(w_in) + F.col("__on")).alias("cum_n"),
        (F.sum("pos_cnt").over(w_in) + F.col("__op")).alias("cum_pos"),
    )
    j = r.join(F.broadcast(tot), "prio")
    term = F.when(
        F.col("pos_cnt") > 0,
        (F.col("pos_cnt") / F.col("n_pos").cast("double"))
        * (F.col("cum_pos") / F.col("cum_n").cast("double")),
    ).otherwise(0.0)
    return j.groupBy("prio", "n", "n_pos").agg(
        F.round(F.first("n_pos") / F.first("n").cast("double"), 6)
        .alias("prevalence_tmp"),
        F.when(F.first("n_pos") > 0, F.round(F.sum(term), 6)).alias("pr_auc"),
    ).select(
        "prio",
        "n_pos",
        (F.col("n") - F.col("n_pos")).cast("bigint").alias("n_neg"),
        F.when(F.col("n") > 0, F.col("prevalence_tmp")).alias("prevalence"),
        "pr_auc",
    )


# --------------------------------------------------------------------------
# Kruskal-Wallis H — k-group rank test with tie correction
# --------------------------------------------------------------------------

KRUSKAL_ORACLE = f"""
WITH gv AS (
  SELECT o_orderpriority AS grp, {_CENTS} AS cents,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1, 2
),
dv AS (
  SELECT cents, CAST(SUM(cnt) AS BIGINT) AS tcnt FROM gv GROUP BY cents
),
r AS (
  SELECT cents, tcnt,
         SUM(tcnt) OVER (ORDER BY cents
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - tcnt + (tcnt + 1) / 2.0e0 AS midrank
  FROM dv
),
rg AS (
  SELECT gv.grp, CAST(SUM(gv.cnt) AS BIGINT) AS n_g,
         SUM(gv.cnt * r.midrank) AS r_g
  FROM gv JOIN r ON gv.cents = r.cents
  GROUP BY gv.grp
),
ties AS (
  SELECT SUM(CAST(tcnt AS DOUBLE) * tcnt * tcnt - tcnt) AS tie_term
  FROM dv WHERE tcnt > 1
),
agg AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n_total,
         CAST(COUNT(*) AS BIGINT) AS n_groups,
         SUM(r_g * r_g / n_g) AS rss
  FROM rg
)
SELECT a.n_total, a.n_groups,
       CASE WHEN a.n_total > 1 THEN
         ROUND(12.0e0 / (a.n_total * (a.n_total + 1.0e0)) * a.rss
               - 3 * (a.n_total + 1.0e0), 6)
       END AS h_stat,
       ROUND(COALESCE(t.tie_term, 0), 6) AS tie_term,
       CASE WHEN a.n_total > 1
             AND 1 - COALESCE(t.tie_term, 0)
                     / (CAST(a.n_total AS DOUBLE) * a.n_total * a.n_total
                        - a.n_total) > 0 THEN
         ROUND((12.0e0 / (a.n_total * (a.n_total + 1.0e0)) * a.rss
                - 3 * (a.n_total + 1.0e0))
               / (1 - COALESCE(t.tie_term, 0)
                      / (CAST(a.n_total AS DOUBLE) * a.n_total * a.n_total
                         - a.n_total)), 6)
       END AS h_adj
FROM agg a, ties t
"""


@register("stats_kruskal_wallis", KRUSKAL_ORACLE)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across order-priority groups on exact-cents order
    value: H = 12/(N(N+1)) Σ R_g²/n_g − 3(N+1), tie-corrected by
    1 − Σ(t³−t)/(N³−N) — the k-group generalization of
    ``stats_mann_whitney``.

    Scale shape: rows collapse to (group, distinct-score) then to distinct
    scores; the GLOBAL midrank prefix-sum uses ``bucketed_running_sum``
    (cumulate within monotone cents buckets, offset by the tiny bucket-
    totals frame) so there is NO Exchange SinglePartition over data — the
    only global pass runs over |buckets| rows. Midranks are exact
    halves and every R_g sum stays below 2⁵³, so H is bit-identical
    cross-engine."""
    o = read_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    gv = o.groupBy(
        F.col("o_orderpriority").alias("grp"), cents.alias("cents")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    dv = gv.groupBy("cents").agg(F.sum("cnt").cast("bigint").alias("tcnt"))
    # monotone bucket over the order key → parallel global prefix sum
    r = bucketed_running_sum(
        dv, "tcnt", ["cents"],
        bucket_expr=F.floor(F.col("cents") / F.lit(1_000_000)),
        out_col="cum",
    ).select(
        "cents", "tcnt",
        (F.col("cum") - F.col("tcnt") + (F.col("tcnt") + 1) / 2.0)
        .alias("midrank"),
    )
    rg = (
        gv.join(r, "cents")
        .groupBy("grp")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_g"),
            F.sum(F.col("cnt") * F.col("midrank")).alias("r_g"),
        )
    )
    ties = dv.where(F.col("tcnt") > 1).agg(
        F.sum(
            F.col("tcnt").cast("double") * F.col("tcnt") * F.col("tcnt")
            - F.col("tcnt")
        ).alias("tie_term")
    )
    agg = rg.agg(
        F.sum("n_g").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.col("r_g") * F.col("r_g") / F.col("n_g")).alias("rss"),
    )
    j = agg.crossJoin(F.broadcast(ties))
    n = F.col("n_total")
    tie = F.coalesce("tie_term", F.lit(0.0))
    h = 12.0 / (n * (n + 1.0)) * F.col("rss") - 3 * (n + 1.0)
    corr = 1 - tie / (n.cast("double") * n * n - n)
    return j.select(
        "n_total", "n_groups",
        F.when(n > 1, F.round(h, 6)).alias("h_stat"),
        F.round(tie, 6).alias("tie_term"),
        F.when((n > 1) & (corr > 0), F.round(h / corr, 6)).alias("h_adj"),
    )


# --------------------------------------------------------------------------
# Jarque-Bera normality test per segment
# --------------------------------------------------------------------------

JARQUE_BERA_ORACLE = f"""
WITH v AS (SELECT o_orderpriority AS grp, {_CENTS} AS cents FROM orders),
m AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(cents) / CAST(COUNT(*) AS DOUBLE) AS mean_c
  FROM v GROUP BY grp
),
d AS (
  SELECT v.grp, m.n, CAST(v.cents AS DOUBLE) - m.mean_c AS d
  FROM v JOIN m ON v.grp = m.grp
),
mom AS (
  SELECT grp, n, SUM(d * d) AS m2, SUM(d * d * d) AS m3,
         SUM(d * d * d * d) AS m4
  FROM d GROUP BY grp, n
)
SELECT grp, n,
       CASE WHEN m2 > 0
            THEN ROUND((m3 / n) / POW(m2 / n, 1.5e0), 6) END AS skewness,
       CASE WHEN m2 > 0
            THEN ROUND((m4 / n) / POW(m2 / n, 2.0e0) - 3, 6) END
         AS ex_kurtosis,
       -- JB scales with n: 4-dp rounding keeps it outside cross-engine
       -- float-summation noise (see module docstring)
       CASE WHEN m2 > 0 THEN
         ROUND(n / 6.0e0 * (POW((m3 / n) / POW(m2 / n, 1.5e0), 2)
               + POW((m4 / n) / POW(m2 / n, 2.0e0) - 3, 2) / 4), 4)
       END AS jb_stat
FROM mom
"""


@register("stats_jarque_bera", JARQUE_BERA_ORACLE)
def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test per order-priority segment on exact-cents
    order value: JB = n/6·(skew² + exkurt²/4) from the central moments.
    Two-pass: the group mean comes from an EXACT bigint sum (so the
    centered deviations are identical doubles in both engines), then one
    moments aggregate over the centered scan.

    Scale shape: one hash agg to the k-row mean frame, broadcast back,
    one more hash agg — no window, no sort. Degenerate (zero-variance)
    segments are NULL on both engines."""
    o = read_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    v = o.select(F.col("o_orderpriority").alias("grp"), cents.alias("cents"))
    m = v.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("cents") / F.count(F.lit(1)).cast("double")).alias("mean_c"),
    )
    d = v.join(F.broadcast(m), "grp").select(
        "grp", "n", (F.col("cents").cast("double") - F.col("mean_c")).alias("d")
    )
    dd = F.col("d")
    mom = d.groupBy("grp", "n").agg(
        F.sum(dd * dd).alias("m2"),
        F.sum(dd * dd * dd).alias("m3"),
        F.sum(dd * dd * dd * dd).alias("m4"),
    )
    n = F.col("n")
    skew = (F.col("m3") / n) / F.pow(F.col("m2") / n, F.lit(1.5))
    exk = (F.col("m4") / n) / F.pow(F.col("m2") / n, F.lit(2.0)) - 3
    ok = F.col("m2") > 0
    return mom.select(
        "grp", "n",
        F.when(ok, F.round(skew, 6)).alias("skewness"),
        F.when(ok, F.round(exk, 6)).alias("ex_kurtosis"),
        F.when(
            ok,
            F.round(
                n / 6.0 * (F.pow(skew, F.lit(2)) + F.pow(exk, F.lit(2)) / 4),
                4,
            ),
        ).alias("jb_stat"),
    )


# --------------------------------------------------------------------------
# Wilson 95% score intervals on per-shipmode return rates
# --------------------------------------------------------------------------

WILSON_CI_ORACLE = f"""
SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS ship_year,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returned,
       ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS rate,
       ROUND((SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                / CAST(COUNT(*) AS DOUBLE)
              + {_Z95} * {_Z95} / (2 * COUNT(*))
              - {_Z95} * SQRT((SUM(CASE WHEN l_returnflag = 'R' THEN 1
                                        ELSE 0 END)
                                 / CAST(COUNT(*) AS DOUBLE)
                               * (1 - SUM(CASE WHEN l_returnflag = 'R'
                                               THEN 1 ELSE 0 END)
                                      / CAST(COUNT(*) AS DOUBLE))
                               + {_Z95} * {_Z95} / (4.0e0 * COUNT(*)
                                                    * COUNT(*)))
                              / COUNT(*)))
             / (1 + {_Z95} * {_Z95} / COUNT(*)), 6) AS wilson_lo,
       ROUND((SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                / CAST(COUNT(*) AS DOUBLE)
              + {_Z95} * {_Z95} / (2 * COUNT(*))
              + {_Z95} * SQRT((SUM(CASE WHEN l_returnflag = 'R' THEN 1
                                        ELSE 0 END)
                                 / CAST(COUNT(*) AS DOUBLE)
                               * (1 - SUM(CASE WHEN l_returnflag = 'R'
                                               THEN 1 ELSE 0 END)
                                      / CAST(COUNT(*) AS DOUBLE))
                               + {_Z95} * {_Z95} / (4.0e0 * COUNT(*)
                                                    * COUNT(*)))
                              / COUNT(*)))
             / (1 + {_Z95} * {_Z95} / COUNT(*)), 6) AS wilson_hi
FROM lineitem GROUP BY 1
"""


@register("stats_wilson_ci", WILSON_CI_ORACLE)
def stats_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson 95% score interval on the returned-line rate per ship year —
    the binomial CI that stays inside [0,1] and behaves at small n and
    extreme rates where the normal approximation fails.

    Scale shape: ONE distributive hash aggregate (count + conditional sum)
    per group; the interval is closed-form arithmetic on exact integers,
    so both engines produce identical doubles. No join, window, or sort."""
    li = read_table(spark, sf_dir, "lineitem").select("l_shipdate", "l_returnflag")
    z = F.lit(_Z95)
    n = F.count(F.lit(1)).cast("double")
    x = F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
    p = x / n
    half = z * F.sqrt((p * (1 - p) + z * z / (4.0 * n * n)) / n)
    center = p + z * z / (2 * n)
    denom = 1 + z * z / n
    return li.groupBy(F.year("l_shipdate").alias("ship_year")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        x.cast("bigint").alias("n_returned"),
        F.round(p, 6).alias("rate"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    )


# --------------------------------------------------------------------------
# Mann-Kendall trend test on per-nation monthly revenue
# --------------------------------------------------------------------------

MANN_KENDALL_ORACLE = """
WITH m AS (
  SELECT c.c_nationkey AS nk,
         (EXTRACT(YEAR FROM o.o_orderdate) - 1992) * 12
           + EXTRACT(MONTH FROM o.o_orderdate) AS t,
         SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
s AS (
  SELECT a.nk,
         CAST(SUM(CASE WHEN b.y > a.y THEN 1
                       WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s
  FROM m a JOIN m b ON a.nk = b.nk AND a.t < b.t
  GROUP BY a.nk
),
cnt AS (SELECT nk, CAST(COUNT(*) AS BIGINT) AS n FROM m GROUP BY nk),
ties AS (
  SELECT nk, SUM(CAST(t_y AS DOUBLE) * (t_y - 1) * (2 * t_y + 5)) AS tie_term
  FROM (SELECT nk, y, COUNT(*) AS t_y FROM m GROUP BY nk, y) g
  WHERE t_y > 1 GROUP BY nk
)
SELECT n.n_name AS nation, c.n AS n_months, s.s AS s_stat,
       ROUND((CAST(c.n AS DOUBLE) * (c.n - 1) * (2 * c.n + 5)
              - COALESCE(t.tie_term, 0)) / 18, 6) AS var_s,
       CASE WHEN (CAST(c.n AS DOUBLE) * (c.n - 1) * (2 * c.n + 5)
                  - COALESCE(t.tie_term, 0)) / 18 > 0 THEN
         ROUND(CASE WHEN s.s > 0 THEN (s.s - 1)
                    WHEN s.s < 0 THEN (s.s + 1) ELSE 0 END
               / SQRT((CAST(c.n AS DOUBLE) * (c.n - 1) * (2 * c.n + 5)
                       - COALESCE(t.tie_term, 0)) / 18), 6)
       END AS z_stat
FROM s JOIN cnt c ON s.nk = c.nk
LEFT JOIN ties t ON s.nk = t.nk
JOIN nation n ON s.nk = n.n_nationkey
"""


@register("stats_mann_kendall", MANN_KENDALL_ORACLE)
def stats_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per nation over the monthly revenue series:
    S = Σ_{i<j} sign(y_j − y_i), tie-corrected variance
    (n(n−1)(2n+5) − Σt(t−1)(2t+5))/18, continuity-corrected z — the
    significance counterpart of ``stats_theilsen_monthly``'s Sen slope.

    Scale shape: orders collapse to (nation, month) in one hash agg —
    calendar-bounded (≤ ~84 rows per nation), so the pairwise i<j
    comparison is a broadcast self-join over a few-thousand-row frame, not
    data rows; revenue is exact cents so every sign and tie is exact."""
    nat = read_table(spark, sf_dir, "nation")
    m = monthly_revenue_cents(spark, sf_dir)
    a = m.alias("a")
    b = m.alias("b")
    s = (
        a.join(
            F.broadcast(b),
            (F.col("a.nk") == F.col("b.nk")) & (F.col("a.t") < F.col("b.t")),
        )
        .groupBy(F.col("a.nk").alias("nk"))
        .agg(
            F.sum(
                F.when(F.col("b.y") > F.col("a.y"), 1)
                .when(F.col("b.y") < F.col("a.y"), -1)
                .otherwise(0)
            ).cast("bigint").alias("s")
        )
    )
    # n and the tie term both derive from ONE (nation, value) grouping —
    # one lineage branch instead of two (orders is scanned once less)
    cnt_ties = (
        m.groupBy("nk", "y")
        .agg(F.count(F.lit(1)).alias("t_y"))
        .groupBy("nk")
        .agg(
            F.sum("t_y").cast("bigint").alias("n"),
            F.sum(
                F.when(
                    F.col("t_y") > 1,
                    F.col("t_y").cast("double") * (F.col("t_y") - 1)
                    * (2 * F.col("t_y") + 5),
                )
            ).alias("tie_term"),
        )
    )
    j = s.join(cnt_ties, "nk").join(
        F.broadcast(nat), F.col("nk") == F.col("n_nationkey")
    )
    var_s = (
        F.col("n").cast("double") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.coalesce("tie_term", F.lit(0.0))
    ) / 18
    s_adj = (
        F.when(F.col("s") > 0, F.col("s") - 1)
        .when(F.col("s") < 0, F.col("s") + 1)
        .otherwise(0)
    )
    return j.select(
        F.col("n_name").alias("nation"),
        F.col("n").alias("n_months"),
        F.col("s").alias("s_stat"),
        F.round(var_s, 6).alias("var_s"),
        F.when(var_s > 0, F.round(s_adj / F.sqrt(var_s), 6)).alias("z_stat"),
    )


# --------------------------------------------------------------------------
# Two-sample effect sizes per nation (Cohen's d, Hedges' g, Glass's Δ)
# --------------------------------------------------------------------------

EFFECT_SIZES_ORACLE = """
WITH v AS (
  SELECT c_nationkey AS nk, c_mktsegment AS seg,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
),
g AS (
  SELECT nk, seg, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS s,
         -- cents² needs 128-bit headroom → hugeint/decimal sums
         CAST(SUM(CAST(cents AS HUGEINT) * cents) AS DOUBLE) AS ss
  FROM v GROUP BY nk, seg
),
w AS (
  SELECT g1.nk, g1.n AS n1, g2.n AS n2,
         g1.s / CAST(g1.n AS DOUBLE) AS m1, g2.s / CAST(g2.n AS DOUBLE) AS m2,
         (g1.ss - g1.n * POW(g1.s / CAST(g1.n AS DOUBLE), 2)) / (g1.n - 1)
           AS var1,
         (g2.ss - g2.n * POW(g2.s / CAST(g2.n AS DOUBLE), 2)) / (g2.n - 1)
           AS var2
  FROM (SELECT * FROM g WHERE seg = 'BUILDING') g1
  JOIN (SELECT * FROM g WHERE seg = 'MACHINERY') g2 ON g1.nk = g2.nk
  WHERE g1.n > 1 AND g2.n > 1
)
SELECT n.n_name AS nation, w.n1, w.n2,
       CASE WHEN ((w.n1 - 1) * w.var1 + (w.n2 - 1) * w.var2)
                 / (w.n1 + w.n2 - 2) > 0 THEN
         ROUND((w.m1 - w.m2)
               / SQRT(((w.n1 - 1) * w.var1 + (w.n2 - 1) * w.var2)
                      / (w.n1 + w.n2 - 2)), 6)
       END AS cohens_d,
       CASE WHEN ((w.n1 - 1) * w.var1 + (w.n2 - 1) * w.var2)
                 / (w.n1 + w.n2 - 2) > 0 THEN
         ROUND((w.m1 - w.m2)
               / SQRT(((w.n1 - 1) * w.var1 + (w.n2 - 1) * w.var2)
                      / (w.n1 + w.n2 - 2))
               * (1 - 3.0e0 / (4 * (w.n1 + w.n2) - 9)), 6)
       END AS hedges_g,
       CASE WHEN w.var2 > 0
            THEN ROUND((w.m1 - w.m2) / SQRT(w.var2), 6) END AS glass_delta
FROM w JOIN nation n ON w.nk = n.n_nationkey
"""


@register("stats_effect_sizes", EFFECT_SIZES_ORACLE)
def stats_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized two-sample effect sizes per nation on account balance
    (BUILDING vs MACHINERY segments): Cohen's d (pooled SD), Hedges' g
    (small-sample bias correction 1 − 3/(4N−9)), Glass's Δ (control-group
    SD) — the practical-significance companions every t-test needs.

    Scale shape: ONE hash agg collapses customers to (nation, segment)
    moment rows — counts, exact bigint sums, decimal(38,0) sums of squares
    (cents² overflows bigint at lake scale) — then a k-row self-join.
    Variances derive from the exact sums identically in both engines, so
    every effect size is bit-identical before rounding."""
    c = read_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    cents = (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("bigint")
    g = c.groupBy(
        F.col("c_nationkey").alias("nk"), F.col("c_mktsegment").alias("seg")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(cents).cast("bigint").alias("s"),
        F.sum(cents.cast("decimal(38,0)") * cents).cast("double").alias("ss"),
    )
    nat = read_table(spark, sf_dir, "nation")

    def side(seg: str, suffix: str):
        mean = F.col("s") / F.col("n").cast("double")
        var = (F.col("ss") - F.col("n") * F.pow(mean, F.lit(2))) / (F.col("n") - 1)
        return (
            g.where(F.col("seg") == seg)
            .select(
                "nk",
                F.col("n").alias(f"n{suffix}"),
                mean.alias(f"m{suffix}"),
                var.alias(f"var{suffix}"),
            )
        )

    w = (
        side("BUILDING", "1")
        .join(side("MACHINERY", "2"), "nk")
        .where((F.col("n1") > 1) & (F.col("n2") > 1))
    )
    pooled = (
        (F.col("n1") - 1) * F.col("var1") + (F.col("n2") - 1) * F.col("var2")
    ) / (F.col("n1") + F.col("n2") - 2)
    d = (F.col("m1") - F.col("m2")) / F.sqrt(pooled)
    return w.join(F.broadcast(nat), w.nk == F.col("n_nationkey")).select(
        F.col("n_name").alias("nation"),
        "n1", "n2",
        F.when(pooled > 0, F.round(d, 6)).alias("cohens_d"),
        F.when(
            pooled > 0,
            F.round(d * (1 - 3.0 / (4 * (F.col("n1") + F.col("n2")) - 9)), 6),
        ).alias("hedges_g"),
        F.when(
            F.col("var2") > 0,
            F.round((F.col("m1") - F.col("m2")) / F.sqrt("var2"), 6),
        ).alias("glass_delta"),
    )


# --------------------------------------------------------------------------
# Matryoshka prefix-dimension recall@10
# --------------------------------------------------------------------------

MATRYOSHKA_ORACLE = """
WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
           FROM embeddings),
q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 5),
sims AS (
  SELECT qid, cid,
         ROUND(CASE WHEN sqrt(list_dot_product(qv, qv))
                         * sqrt(list_dot_product(cv, cv)) > 0
                    THEN list_dot_product(qv, cv)
                         / (sqrt(list_dot_product(qv, qv))
                            * sqrt(list_dot_product(cv, cv)))
                    ELSE 0.0 END, 6) + 0.0 AS sim_full,
         ROUND(CASE WHEN sqrt(list_dot_product(qv[1:16], qv[1:16]))
                         * sqrt(list_dot_product(cv[1:16], cv[1:16])) > 0
                    THEN list_dot_product(qv[1:16], cv[1:16])
                         / (sqrt(list_dot_product(qv[1:16], qv[1:16]))
                            * sqrt(list_dot_product(cv[1:16], cv[1:16])))
                    ELSE 0.0 END, 6) + 0.0 AS sim_pre
  FROM q, c
),
ranked AS (
  SELECT qid, cid,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY sim_full DESC, cid) AS rank_full,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY sim_pre DESC, cid) AS rank_pre
  FROM sims
)
SELECT qid,
       CAST(SUM(CASE WHEN rank_full <= 10 AND rank_pre <= 10
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
       ROUND(SUM(CASE WHEN rank_full <= 10 AND rank_pre <= 10
                      THEN 1 ELSE 0 END) / 10.0e0, 6) AS recall_at_10
FROM ranked GROUP BY qid
"""


@register("sim_matryoshka_prefix_recall", MATRYOSHKA_ORACLE)
def sim_matryoshka_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (MRL) truncation audit: recall@10 of cosine search using
    only the first 16 of 64 embedding dimensions against the full-dimension
    top-10 — the measured quality cost of a 4× smaller vector index, per
    query. Rank keys are ROUNDED similarities with id tiebreaks (the
    sim_cosine_topk determinism discipline), so the cutoff can't flip on
    float last-ulp noise.

    Scale shape: the bounded query side broadcasts; BOTH similarity
    columns are computed in ONE streamed pass over the corpus (never two
    scans); the two rank windows share the per-qid partitioning and run
    over |corpus| rows per query. The similarity pass is embarrassingly
    parallel; the rank stage parallelizes ACROSS queries (one reducer per
    qid — the sim_cosine_topk contract, bounded-query-set by API). For a
    large query set swap the windows for two ``salted_topn_per_key``
    passes and intersect on (qid, cid)."""
    from airflow_dags_spark.functions.vectors import cosine_pre, l2_norm

    emb = read_table(spark, sf_dir, "embeddings")

    def staged(df, key, key_alias, vec_alias):
        # stage per ROW: double cast, 16-dim prefix slice, and both L2
        # norms — inlining cosine() in the pair select instead evaluates
        # the casts/slices/norm folds once per PAIR (|corpus|×|queries|
        # times); float-identical, see functions.vectors.cosine_pre
        v = as_double("__raw")
        return (
            df.select(F.col(key).alias(key_alias), F.col("embedding").alias("__raw"))
            .withColumn(vec_alias, v)
            .withColumn(f"{vec_alias}_p", F.slice(F.col(vec_alias), 1, 16))
            .withColumn(f"{vec_alias}_n", l2_norm(F.col(vec_alias)))
            .withColumn(f"{vec_alias}_pn", l2_norm(F.col(f"{vec_alias}_p")))
            .drop("__raw")
        )

    corpus = staged(emb, "vec_id", "cid", "__cv")
    queries = staged(emb.where(F.col("vec_id") < 5), "vec_id", "qid", "__qv")
    full = cosine_pre(
        F.col("__qv"), F.col("__cv"), F.col("__qv_n"), F.col("__cv_n")
    )
    pre = cosine_pre(
        F.col("__qv_p"), F.col("__cv_p"), F.col("__qv_pn"), F.col("__cv_pn")
    )
    sims = corpus.join(F.broadcast(queries)).select(
        "qid", "cid",
        (F.round(full, 6) + F.lit(0.0)).alias("sim_full"),
        (F.round(pre, 6) + F.lit(0.0)).alias("sim_pre"),
    )
    w_full = Window.partitionBy("qid").orderBy(F.desc("sim_full"), F.asc("cid"))
    w_pre = Window.partitionBy("qid").orderBy(F.desc("sim_pre"), F.asc("cid"))
    ranked = sims.select(
        "qid", "cid",
        F.row_number().over(w_full).alias("rank_full"),
        F.row_number().over(w_pre).alias("rank_pre"),
    )
    common = F.sum(
        F.when((F.col("rank_full") <= 10) & (F.col("rank_pre") <= 10), 1)
        .otherwise(0)
    )
    return ranked.groupBy("qid").agg(
        common.cast("bigint").alias("n_common"),
        F.round(common / 10.0, 6).alias("recall_at_10"),
    )


# --------------------------------------------------------------------------
# SAX symbolization of per-nation monthly revenue
# --------------------------------------------------------------------------

SAX_ORACLE = """
WITH m AS (
  SELECT c.c_nationkey AS nk,
         (EXTRACT(YEAR FROM o.o_orderdate) - 1992) * 12
           + EXTRACT(MONTH FROM o.o_orderdate) AS t,
         SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
stats AS (
  SELECT nk, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS s,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS ss
  FROM m GROUP BY nk
),
z AS (
  SELECT m.nk, st.n,
         (CAST(m.y AS DOUBLE) - st.s / CAST(st.n AS DOUBLE))
           / SQRT((st.ss - st.n * POW(st.s / CAST(st.n AS DOUBLE), 2))
                  / (st.n - 1)) AS z,
         ROW_NUMBER() OVER (PARTITION BY m.nk ORDER BY m.t) - 1 AS idx
  FROM m JOIN stats st ON m.nk = st.nk
  WHERE st.n > 1
    AND (st.ss - st.n * POW(st.s / CAST(st.n AS DOUBLE), 2)) > 0
),
paa AS (
  SELECT nk, CAST(FLOOR(idx * 12.0e0 / n) AS BIGINT) AS seg,
         CAST(COUNT(*) AS BIGINT) AS n_pts, AVG(z) AS paa_z
  FROM z GROUP BY 1, 2
)
SELECT n.n_name AS nation, p.seg, p.n_pts,
       ROUND(p.paa_z, 6) + 0.0 AS paa_z,
       CASE WHEN p.paa_z < -0.6745 THEN 'a'
            WHEN p.paa_z < 0 THEN 'b'
            WHEN p.paa_z < 0.6745 THEN 'c'
            ELSE 'd' END AS symbol
FROM paa p JOIN nation n ON p.nk = n.n_nationkey
"""


@register("timeseries_sax_symbols", SAX_ORACLE)
def timeseries_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX (Symbolic Aggregate approXimation, Lin et al. 2003) over each
    nation's monthly revenue: z-normalize the series, PAA-compress to 12
    segments, map segment means to a 4-symbol alphabet at the Gaussian
    quartile breakpoints (−0.6745, 0, 0.6745) — the discretization behind
    symbolic motif/novelty mining on time series.

    Scale shape: orders collapse to calendar-bounded (nation, month) rows;
    per-series mean/std come from EXACT integer sums (bigint /
    decimal(38,0)), so z-scores are identical doubles cross-engine; the
    only window is a row_number over ≤ ~84 monthly rows per nation.
    Zero-variance or single-point series drop out on both engines."""
    nat = read_table(spark, sf_dir, "nation")
    m = monthly_revenue_cents(spark, sf_dir)
    stats = m.groupBy("nk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        .cast("double")
        .alias("ss"),
    )
    mean = F.col("s") / F.col("n").cast("double")
    ssq = F.col("ss") - F.col("n") * F.pow(mean, F.lit(2))
    z = (
        m.join(F.broadcast(stats), "nk")
        .where((F.col("n") > 1) & (ssq > 0))
        .select(
            "nk", "n", "t",
            ((F.col("y").cast("double") - mean)
             / F.sqrt(ssq / (F.col("n") - 1))).alias("z"),
        )
        .withColumn(
            "idx",
            F.row_number().over(Window.partitionBy("nk").orderBy("t")) - 1,
        )
    )
    paa = z.groupBy(
        "nk",
        F.floor(F.col("idx") * 12.0 / F.col("n")).cast("bigint").alias("seg"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pts"),
        F.avg("z").alias("paa_z"),
    )
    sym = (
        F.when(F.col("paa_z") < -0.6745, "a")
        .when(F.col("paa_z") < 0, "b")
        .when(F.col("paa_z") < 0.6745, "c")
        .otherwise("d")
    )
    return paa.join(F.broadcast(nat), paa.nk == F.col("n_nationkey")).select(
        F.col("n_name").alias("nation"),
        "seg", "n_pts",
        (F.round("paa_z", 6) + F.lit(0.0)).alias("paa_z"),
        sym.alias("symbol"),
    )


# --------------------------------------------------------------------------
# Empirical-Bayes shrunk supplier return rates (beta-binomial MoM)
# --------------------------------------------------------------------------

EB_RATES_ORACLE = """
WITH s AS (
  SELECT l_suppkey,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS x
  FROM lineitem GROUP BY l_suppkey
),
prior AS (
  -- beta-binomial method of moments over the observed per-supplier rates:
  -- alpha+beta = m(1-m)/v - 1, alpha = m*(alpha+beta).
  -- m and v are ROUNDED to 12 dp on both engines before use: AVG/VAR_SAMP
  -- merge partials in engine-specific order, so the raw doubles differ in
  -- the last ulp — unrounded they would feed that noise into every
  -- shrunk_rate (the registry rounding rule, applied to the prior inputs)
  SELECT ROUND(AVG(x / CAST(n AS DOUBLE)), 12) AS m,
         ROUND(VAR_SAMP(x / CAST(n AS DOUBLE)), 12) AS v,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM s
)
SELECT s.l_suppkey, s.n, s.x,
       ROUND(s.x / CAST(s.n AS DOUBLE), 6) AS raw_rate,
       -- MoM valid only when 0 < v < m(1-m); otherwise fall back to raw
       ROUND(CASE WHEN p.k > 1 AND p.v > 0 AND p.v < p.m * (1 - p.m)
                  THEN (s.x + p.m * (p.m * (1 - p.m) / p.v - 1))
                       / (s.n + (p.m * (1 - p.m) / p.v - 1))
                  ELSE s.x / CAST(s.n AS DOUBLE) END, 6) AS shrunk_rate
FROM s, prior p
"""


@register("ml_empirical_bayes_rates", EB_RATES_ORACLE)
def ml_empirical_bayes_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-supplier return rates under a
    beta-binomial prior fitted by method of moments on the observed rates:
    shrunk = (x + α)/(n + α + β). Low-volume suppliers pull hard toward
    the global mean, high-volume ones keep their own rate — the standard
    fix for ranking noisy per-source quality scores by raw proportion.

    Scale shape: one distributive hash agg to per-supplier (n, x), one
    1-row prior aggregate broadcast back over the supplier frame (the
    canonical tiny-broadcast plan, allow-listed). Falls back to the raw
    rate when the MoM prior is undefined (v ≤ 0 or v ≥ m(1−m)) — same
    guard on both engines."""
    li = read_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_returnflag")
    s = li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
    )
    rate = F.col("x") / F.col("n").cast("double")
    # prior moments rounded to 12 dp BEFORE computing alpha/beta: Spark and
    # DuckDB merge AVG/VAR_SAMP partials in different orders, and unrounded
    # last-ulp noise in (m, v) would propagate into every shrunk_rate (the
    # registry's output rounding rule, applied here to the prior inputs —
    # mirrored in EB_RATES_ORACLE)
    prior = s.agg(
        F.round(F.avg(rate), 12).alias("m"),
        F.round(F.var_samp(rate), 12).alias("v"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    j = s.crossJoin(F.broadcast(prior))
    ab = F.col("m") * (1 - F.col("m")) / F.col("v") - 1  # alpha + beta
    alpha = F.col("m") * ab
    ok = (
        (F.col("k") > 1) & (F.col("v") > 0)
        & (F.col("v") < F.col("m") * (1 - F.col("m")))
    )
    return j.select(
        "l_suppkey", "n", "x",
        F.round(rate, 6).alias("raw_rate"),
        F.round(
            F.when(ok, (F.col("x") + alpha) / (F.col("n") + ab)).otherwise(rate),
            6,
        ).alias("shrunk_rate"),
    )


__all__ = [
    "ml_map_at_k",
    "ml_pr_auc",
    "stats_kruskal_wallis",
    "stats_jarque_bera",
    "stats_wilson_ci",
    "stats_mann_kendall",
    "stats_effect_sizes",
    "sim_matryoshka_prefix_recall",
    "timeseries_sax_symbols",
    "ml_empirical_bayes_rates",
]

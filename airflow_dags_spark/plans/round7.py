"""Round-7 registry additions — consolidation-round batch (VERDICT r4 asked
for ≤15 new queries so the driver window drains the verification backlog;
these 10 fill genuine surface gaps):

- URL canonicalization dedup (the CommonCrawl-style pre-dedup normalize:
  case-fold host, strip default port / www / tracking params / fragments);
- Dunning log-likelihood-ratio collocations (the classic NLP bigram
  association score, a different statistic from the raw bigram counts of
  ``text_bigram_stats``);
- precision/recall/F1 threshold sweep (classifier eval as pure conditional
  aggregation — no ranking window at all);
- NDCG@10 ranking quality per event segment;
- Theil inequality index with exact between/within decomposition;
- Wilcoxon signed-rank (paired complement of ``stats_mann_whitney``);
- Poisson-bootstrap confidence interval (THE scale-out resampling scheme:
  per-row independent weights, no resample materialization);
- grouped weighted quantiles (p25/p50/p75) through the generalized
  ``weighted_median_bucketed(frac=...)`` two-phase refinement;
- MMR diversified re-ranking (rows-only: the greedy selection is
  iterative; exact numpy reference in tests/test_round7.py);
- Benjamini-Hochberg FDR correction over the grouped Wilcoxon family
  (portable A&S erf polynomial — hash-exact p-values without either
  engine exposing erf).

Registered LAST (after plans/round6 in registry.load_all) so these append
AFTER every existing query in the driver's self-rotating verification
window — new names must never displace the queued unverified queries of
the current round.

Scale notes (100 TB): canonicalization and LLR S(x)-terms are scan-stage
codegen; every statistic aggregates distributively before any window, and
the only windows partition by bounded keys (brand, event_type) or run
inside the quantile refinement's target bucket (~1/1024 of rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_dags_spark.plans.registry import register
from airflow_dags_spark.sources.tables import read_table

# --------------------------------------------------------------------------
# URL canonicalization dedup — the web-corpus pre-dedup normalizer
# --------------------------------------------------------------------------

# both engines derive the SAME messy URL per doc from existing columns (the
# operator under test is the canonicalization pipeline, not the data), then
# run the identical normalize steps: strip fragment → lowercase scheme+host →
# drop default port → drop www. → drop utm_* params → tidy ?&/trailing junk →
# strip trailing slash.
URL_CANON_ORACLE = """
WITH raw AS (
  SELECT source,
    'HTTPS://WWW.' || upper(source) || '.Example.COM:443/Docs/'
      || CAST(doc_id % 400 AS VARCHAR)
      || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
      || '?utm_source=feed&id=' || CAST(doc_id % 5 AS VARCHAR)
      || CASE WHEN doc_id % 2 = 0 THEN '&utm_campaign=x' ELSE '' END
      || CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END AS u
  FROM documents
),
s1 AS (SELECT source, regexp_replace(u, '#.*$', '') AS u FROM raw),
s2 AS (
  SELECT source,
         lower(regexp_extract(u, '^[a-zA-Z]+://[^/?]+', 0))
           || substr(u, length(regexp_extract(u, '^[a-zA-Z]+://[^/?]+', 0)) + 1)
           AS u
  FROM s1
),
s3 AS (SELECT source, replace(replace(u, ':443/', '/'), '://www.', '://') AS u FROM s2),
s4 AS (SELECT source, regexp_replace(u, 'utm_[^&#]*&?', '', 'g') AS u FROM s3),
s5 AS (
  SELECT source,
         regexp_replace(regexp_replace(replace(u, '?&', '?'), '[?&]+$', ''),
                        '/$', '') AS canon
  FROM s4
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT canon) AS BIGINT) AS n_canonical,
       ROUND(1.0e0 - COUNT(DISTINCT canon) * 1.0e0 / COUNT(*), 4) AS dup_rate,
       MIN(canon) AS sample_canonical
FROM s5 GROUP BY source
"""


@register("dedup_url_canonical", URL_CANON_ORACLE)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + duplicate-rate audit — the normalize step
    every web-scale corpus runs BEFORE content dedup (tracking params,
    case-variant hosts, default ports, and fragments make one page look
    like many). The whole pipeline is scan-stage string codegen (regexp/
    replace/lower), zero UDFs; the only shuffle is the per-source
    distinct-count aggregate. ``min(canon)`` in the output hash-checks the
    canonical strings themselves cross-engine, not just the counts."""
    d = read_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("HTTPS://WWW."),
        F.upper(F.col("source")),
        F.lit(".Example.COM:443/Docs/"),
        (F.col("doc_id") % 400).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=feed&id="),
        (F.col("doc_id") % 5).cast("string"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("&utm_campaign=x")).otherwise(
            F.lit("")
        ),
        F.when(F.col("doc_id") % 7 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    u1 = F.regexp_replace(raw, r"#.*$", "")
    prefix = F.regexp_extract(u1, r"^[a-zA-Z]+://[^/?]+", 0)
    base = d.select(
        "source", u1.alias("__u1"), prefix.alias("__pfx")
    ).withColumn(
        "__u2",
        F.concat(
            F.lower(F.col("__pfx")),
            F.expr("substr(__u1, length(__pfx) + 1)"),
        ),
    )
    u3 = F.replace(
        F.replace(F.col("__u2"), F.lit(":443/"), F.lit("/")),
        F.lit("://www."),
        F.lit("://"),
    )
    u4 = F.regexp_replace(u3, r"utm_[^&#]*&?", "")
    canon = F.regexp_replace(
        F.regexp_replace(
            F.replace(u4, F.lit("?&"), F.lit("?")), r"[?&]+$", ""
        ),
        r"/$",
        "",
    )
    return (
        base.select("source", canon.alias("canon"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_urls"),
            F.countDistinct("canon").cast("bigint").alias("n_canonical"),
            F.round(
                F.lit(1.0)
                - F.countDistinct("canon") / F.count(F.lit(1)),
                4,
            ).alias("dup_rate"),
            F.min("canon").alias("sample_canonical"),
        )
    )


# --------------------------------------------------------------------------
# Dunning log-likelihood-ratio collocations
# --------------------------------------------------------------------------

COLLOCATION_LLR_ORACLE = """
WITH toks AS (
  SELECT string_split(text, ' ') AS xs FROM documents
),
bg AS (
  SELECT xs[i] AS t1, xs[i + 1] AS t2
  FROM toks, UNNEST(generate_series(1, len(xs) - 1)) AS u(i)
  WHERE len(xs) >= 2
),
cnt AS (SELECT t1, t2, COUNT(*) AS k11 FROM bg GROUP BY t1, t2),
m1 AS (SELECT t1, SUM(k11) AS c1 FROM cnt GROUP BY t1),
m2 AS (SELECT t2, SUM(k11) AS c2 FROM cnt GROUP BY t2),
tot AS (SELECT SUM(k11) AS n FROM cnt),
sc AS (
  SELECT c.t1, c.t2, c.k11, m1.c1, m2.c2, tot.n,
         c.k11 AS a, m1.c1 - c.k11 AS b, m2.c2 - c.k11 AS cc,
         tot.n - m1.c1 - m2.c2 + c.k11 AS d
  FROM cnt c JOIN m1 ON c.t1 = m1.t1 JOIN m2 ON c.t2 = m2.t2, tot
),
llr AS (
  SELECT t1, t2, CAST(k11 AS BIGINT) AS pair_count,
    ROUND(2.0e0 * (
        (CASE WHEN a  > 0 THEN a  * LN(a * 1.0e0)  ELSE 0 END)
      + (CASE WHEN b  > 0 THEN b  * LN(b * 1.0e0)  ELSE 0 END)
      + (CASE WHEN cc > 0 THEN cc * LN(cc * 1.0e0) ELSE 0 END)
      + (CASE WHEN d  > 0 THEN d  * LN(d * 1.0e0)  ELSE 0 END)
      + n * LN(n * 1.0e0)
      - (CASE WHEN c1 > 0 THEN c1 * LN(c1 * 1.0e0) ELSE 0 END)
      - (CASE WHEN n - c1 > 0 THEN (n - c1) * LN((n - c1) * 1.0e0) ELSE 0 END)
      - (CASE WHEN c2 > 0 THEN c2 * LN(c2 * 1.0e0) ELSE 0 END)
      - (CASE WHEN n - c2 > 0 THEN (n - c2) * LN((n - c2) * 1.0e0) ELSE 0 END)
    ), 3) AS llr
  FROM sc WHERE k11 >= 20
)
SELECT t1, t2, pair_count, llr + 0.0 AS llr
FROM llr ORDER BY llr DESC, t1, t2 LIMIT 30
"""


@register("text_collocation_llr", COLLOCATION_LLR_ORACLE)
def text_collocation_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram collocations scored by Dunning's log-likelihood ratio (the
    standard NLP association test — robust where PMI over-rewards rare
    pairs). Bigrams come from a zero-shuffle array ``transform`` over each
    doc's token list; then three hash aggregates (pair counts, first-/
    second-position marginals) and the xlogx contingency formula in pure
    codegen. The marginal joins key on vocab-sized frames; top-30 is a
    TakeOrderedAndProject."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(F.split(F.col("text"), " ").alias("xs")).where(
        F.size("xs") >= 2
    )
    bg = toks.select(
        F.explode(
            F.expr(
                "transform(slice(xs, 1, size(xs) - 1),"
                " (x, i) -> struct(x AS t1, xs[i + 1] AS t2))"
            )
        ).alias("bg")
    ).select(F.col("bg.t1").alias("t1"), F.col("bg.t2").alias("t2"))
    cnt = bg.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("k11"))
    m1 = cnt.groupBy("t1").agg(F.sum("k11").alias("c1"))
    m2 = cnt.groupBy("t2").agg(F.sum("k11").alias("c2"))
    tot = cnt.agg(F.sum("k11").alias("n"))
    sc = (
        cnt.join(m1, "t1")
        .join(m2, "t2")
        .crossJoin(F.broadcast(tot))
        .select(
            "t1",
            "t2",
            "k11",
            "c1",
            "c2",
            "n",
            F.col("k11").alias("a"),
            (F.col("c1") - F.col("k11")).alias("b"),
            (F.col("c2") - F.col("k11")).alias("cc"),
            (F.col("n") - F.col("c1") - F.col("c2") + F.col("k11")).alias("d"),
        )
        .where(F.col("k11") >= 20)
    )

    def s(x):
        return F.when(x > 0, x * F.log(x.cast("double"))).otherwise(F.lit(0.0))

    llr = 2.0 * (
        s(F.col("a"))
        + s(F.col("b"))
        + s(F.col("cc"))
        + s(F.col("d"))
        + F.col("n") * F.log(F.col("n").cast("double"))
        - s(F.col("c1"))
        - s(F.col("n") - F.col("c1"))
        - s(F.col("c2"))
        - s(F.col("n") - F.col("c2"))
    )
    return (
        sc.select(
            "t1",
            "t2",
            F.col("k11").cast("bigint").alias("pair_count"),
            (F.round(llr, 3) + F.lit(0.0)).alias("llr"),
        )
        .orderBy(F.desc("llr"), "t1", "t2")
        .limit(30)
    )


# --------------------------------------------------------------------------
# Classifier threshold sweep — precision/recall/F1 without a ranking window
# --------------------------------------------------------------------------

THRESHOLD_SWEEP_ORACLE = """
WITH scored AS (
  SELECT CAST(embedding[1] AS DOUBLE) AS score,
         CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS pos
  FROM embeddings
),
grid AS (SELECT i * 0.05e0 AS t FROM UNNEST(generate_series(-4, 4)) AS u(i)),
cm AS (
  SELECT g.t,
         SUM(CASE WHEN s.score >= g.t AND s.pos = 1 THEN 1 ELSE 0 END) AS tp,
         SUM(CASE WHEN s.score >= g.t AND s.pos = 0 THEN 1 ELSE 0 END) AS fp,
         SUM(CASE WHEN s.score <  g.t AND s.pos = 1 THEN 1 ELSE 0 END) AS fn
  FROM scored s CROSS JOIN grid g
  GROUP BY g.t
)
SELECT ROUND(t, 2) AS threshold,
       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn,
       ROUND(CASE WHEN tp + fp > 0 THEN tp * 1.0e0 / (tp + fp) END, 6)
         AS precision,
       ROUND(CASE WHEN tp + fn > 0 THEN tp * 1.0e0 / (tp + fn) END, 6)
         AS recall,
       ROUND(CASE WHEN 2 * tp + fp + fn > 0
                  THEN 2.0e0 * tp / (2 * tp + fp + fn) END, 6) AS f1
FROM cm
"""


@register("ml_threshold_sweep_prf", THRESHOLD_SWEEP_ORACLE)
def ml_threshold_sweep_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 at a 9-point decision-threshold grid — the
    classifier-eval table, computed as PURE conditional aggregation: the
    score column crosses a broadcast 9-row grid and every confusion cell
    is a filtered count, so there is no ranking window anywhere (contrast
    ``stats_mann_whitney``, which is the rank path). One shuffle carrying
    9 rows of partials per partition; F1 from the 2tp/(2tp+fp+fn) form so
    no NULL-propagation mismatch when a class empties."""
    e = read_table(spark, sf_dir, "embeddings")
    scored = e.select(
        F.col("embedding")[0].cast("double").alias("score"),
        F.when(F.col("label") % 2 == 0, F.lit(1)).otherwise(F.lit(0)).alias("pos"),
    )
    grid = spark.range(-4, 5).select(
        (F.col("id") * F.lit(0.05)).alias("t")
    )
    pred = F.col("score") >= F.col("t")
    cm = (
        scored.crossJoin(F.broadcast(grid))
        .groupBy("t")
        .agg(
            F.sum(F.when(pred & (F.col("pos") == 1), 1).otherwise(0)).alias("tp"),
            F.sum(F.when(pred & (F.col("pos") == 0), 1).otherwise(0)).alias("fp"),
            F.sum(F.when(~pred & (F.col("pos") == 1), 1).otherwise(0)).alias("fn"),
        )
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return cm.select(
        F.round("t", 2).alias("threshold"),
        tp.cast("bigint").alias("tp"),
        fp.cast("bigint").alias("fp"),
        fn.cast("bigint").alias("fn"),
        F.round(F.when(tp + fp > 0, tp / (tp + fp)), 6).alias("precision"),
        F.round(F.when(tp + fn > 0, tp / (tp + fn)), 6).alias("recall"),
        F.round(
            F.when(2 * tp + fp + fn > 0, 2.0 * tp / (2 * tp + fp + fn)), 6
        ).alias("f1"),
    )


# --------------------------------------------------------------------------
# NDCG@10 — graded ranking quality per event segment
# --------------------------------------------------------------------------

NDCG_ORACLE = """
WITH acts AS (
  -- exact integer cents (the Theil-fix discipline): a raw double SUM(value)
  -- is partition-order dependent in the last ulp, so two users whose true
  -- sums tie could swap rank order per engine — and a swap at the top-10
  -- boundary changes dcg by more than the 6-dp rounding. events.value has
  -- 2 decimals, so the cents sum is an EXACT bigint in both engines and
  -- the user_id tiebreak fires exactly on true ties.
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
pred AS (
  SELECT event_type, r,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY v DESC, user_id) AS pos
  FROM cand
),
ideal AS (
  SELECT event_type, r,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY r DESC, user_id) AS pos
  FROM cand
),
dcg AS (
  SELECT event_type, SUM(r / log2(pos + 1.0e0)) AS dcg
  FROM pred WHERE pos <= 10 GROUP BY event_type
),
idcg AS (
  SELECT event_type, SUM(r / log2(pos + 1.0e0)) AS idcg
  FROM ideal WHERE pos <= 10 GROUP BY event_type
)
SELECT d.event_type, ROUND(d.dcg, 6) AS dcg, ROUND(i.idcg, 6) AS idcg,
       ROUND(CASE WHEN i.idcg > 0 THEN d.dcg / i.idcg END, 6) AS ndcg
FROM dcg d JOIN idcg i ON d.event_type = i.event_type
"""


@register("ml_ndcg_at_k", NDCG_ORACLE)
def ml_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 per event segment: rank users by total event value in exact
    integer cents (the 'predicted' ordering), grade relevance by purchase
    count, and
    compare against the ideal relevance ordering. Both top-10 extractions
    go through ``salted_topn_per_key`` — an event_type is a HOT key (5
    segments over all users at 100 TB), so the plain per-key window would
    serialize each segment through one reducer; the salted two-phase form
    bounds every window to ≤ n_salts×10 survivor rows, then positions are
    re-ranked on ≤10 rows per key. Tie rule (metric desc, user_id) is a
    total order, so the salted result is hash-identical to the plain
    window oracle."""
    from airflow_dags_spark.functions.scalable_windows import salted_topn_per_key

    e = read_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    # exact integer cents (see NDCG_ORACLE comment): the 'predicted' rank
    # key must be partition-order independent or an ulp tie-swap at the
    # top-10 boundary flips cross-engine hash parity
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

    def top10_dcg(order_cols, out_name):
        top = salted_topn_per_key(
            cand, "event_type", order_cols, 10, salt_src="user_id"
        )
        pos = F.row_number().over(
            Window.partitionBy("event_type").orderBy(*order_cols)
        )
        return (
            top.withColumn("pos", pos)
            .groupBy("event_type")
            .agg(F.sum(F.col("r") / F.log2(F.col("pos") + 1.0)).alias(out_name))
        )

    dcg = top10_dcg([F.desc("v"), F.asc("user_id")], "dcg")
    idcg = top10_dcg([F.desc("r"), F.asc("user_id")], "idcg")
    return dcg.join(idcg, "event_type").select(
        "event_type",
        F.round("dcg", 6).alias("dcg"),
        F.round("idcg", 6).alias("idcg"),
        F.round(
            F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")), 6
        ).alias("ndcg"),
    )


# --------------------------------------------------------------------------
# Theil T inequality index with exact between/within decomposition
# --------------------------------------------------------------------------

THEIL_ORACLE = """
WITH cust AS (
  -- exact integer cents: o_totalprice has 2 decimals, so the per-customer
  -- and per-nation sums are EXACT bigints in both engines; the doubles
  -- derived from them (x, mu_g) are then bit-identical cross-engine,
  -- which keeps ROUND stable at .xx5 knife edges (a plain double SUM
  -- differs in last-ulp by partition order and flips the 2-dp round)
  SELECT c.c_nationkey, o.o_custkey,
         SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_nationkey, o.o_custkey
),
custx AS (
  SELECT c_nationkey, o_custkey, cents / 100.0e0 AS x FROM cust
),
grp AS (
  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(cents) AS BIGINT) / 100.0e0 / COUNT(*) AS mu_g
  FROM cust GROUP BY c_nationkey
),
tot_all AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n, SUM(n_g * mu_g) / SUM(n_g) AS mu
  FROM grp
),
tw AS (
  SELECT c.c_nationkey,
         AVG((c.x / g.mu_g) * LN(c.x / g.mu_g)) AS t_within
  FROM custx c JOIN grp g ON c.c_nationkey = g.c_nationkey
  GROUP BY c.c_nationkey
),
rows_out AS (
  SELECT n.n_name AS nation, g.n_g AS n_customers,
         ROUND(g.mu_g, 2) AS mean_revenue,
         ROUND(t.t_within, 6) AS t_within,
         ROUND((g.n_g * g.mu_g) / (gl.n * gl.mu) * t.t_within, 6)
           AS contribution,
         SUM((g.n_g * 1.0e0 / gl.n) * (g.mu_g / gl.mu) * LN(g.mu_g / gl.mu))
           OVER () AS t_between_raw,
         SUM((g.n_g * g.mu_g) / (gl.n * gl.mu) * t.t_within) OVER ()
           AS within_sum_raw
  FROM grp g JOIN tw t ON g.c_nationkey = t.c_nationkey
  JOIN nation n ON n.n_nationkey = g.c_nationkey, tot_all gl
)
SELECT nation, n_customers, mean_revenue, t_within, contribution,
       ROUND(t_between_raw, 6) AS t_between,
       ROUND(t_between_raw + within_sum_raw, 6) AS t_total
FROM rows_out
"""


@register("stats_theil_index", THEIL_ORACLE)
def stats_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality of customer revenue with the exact between/
    within-nation decomposition (T_total = T_between + Σ share·T_within —
    the property that makes Theil THE distributed inequality measure:
    unlike Gini it decomposes additively, so each data partition's
    contribution aggregates without a global sort; compare
    ``stats_gini_revenue``). Customer revenues aggregate distributively;
    the decomposition runs on the 25-row nation frame. Revenue sums go
    through EXACT integer cents (2-decimal input × 100 → bigint) so the
    derived doubles (x, mu_g) are bit-identical cross-engine and the
    2-dp mean rounding is stable at .xx5 knife edges — a plain double
    SUM's last ulp depends on partition order and flipped the round."""
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cents_row = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    cust = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.sum(cents_row).alias("cents"))
        .withColumn("x", F.col("cents") / 100.0)
    )
    grp = cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        (
            F.sum("cents").cast("bigint") / 100.0 / F.count(F.lit(1))
        ).alias("mu_g"),
    )
    tw = (
        cust.join(F.broadcast(grp), "c_nationkey")
        .groupBy("c_nationkey")
        .agg(
            F.avg(
                (F.col("x") / F.col("mu_g"))
                * F.log(F.col("x") / F.col("mu_g"))
            ).alias("t_within")
        )
    )
    glob = grp.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        (F.sum(F.col("n_g") * F.col("mu_g")) / F.sum("n_g")).alias("mu"),
    )
    base = (
        grp.join(tw, "c_nationkey")
        .join(F.broadcast(nat), grp.c_nationkey == nat.n_nationkey)
        .crossJoin(F.broadcast(glob))
    )
    share = (F.col("n_g") * F.col("mu_g")) / (F.col("n") * F.col("mu"))
    between_term = (
        (F.col("n_g") / F.col("n"))
        * (F.col("mu_g") / F.col("mu"))
        * F.log(F.col("mu_g") / F.col("mu"))
    )
    w_all = Window.partitionBy()
    return base.select(
        F.col("n_name").alias("nation"),
        F.col("n_g").alias("n_customers"),
        F.round("mu_g", 2).alias("mean_revenue"),
        F.round("t_within", 6).alias("t_within"),
        F.round(share * F.col("t_within"), 6).alias("contribution"),
        F.round(F.sum(between_term).over(w_all), 6).alias("t_between"),
        F.round(
            F.sum(between_term).over(w_all)
            + F.sum(share * F.col("t_within")).over(w_all),
            6,
        ).alias("t_total"),
    )


# --------------------------------------------------------------------------
# Wilcoxon signed-rank — paired year-over-year shift per brand
# --------------------------------------------------------------------------

WILCOXON_ORACLE = """
WITH pairs AS (
  SELECT p.p_brand AS brand, l.l_partkey AS pk,
         SUM(CASE WHEN EXTRACT(YEAR FROM l.l_shipdate) = 1994
                  THEN l.l_quantity ELSE 0 END) AS q94,
         SUM(CASE WHEN EXTRACT(YEAR FROM l.l_shipdate) = 1995
                  THEN l.l_quantity ELSE 0 END) AS q95,
         COUNT(CASE WHEN EXTRACT(YEAR FROM l.l_shipdate) = 1994 THEN 1 END)
           AS n94,
         COUNT(CASE WHEN EXTRACT(YEAR FROM l.l_shipdate) = 1995 THEN 1 END)
           AS n95
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, l.l_partkey
),
d AS (
  SELECT brand, pk, q95 - q94 AS diff, ABS(q95 - q94) AS ad
  FROM pairs WHERE n94 > 0 AND n95 > 0 AND q95 <> q94
),
r AS (
  SELECT brand, diff,
         RANK() OVER (PARTITION BY brand ORDER BY ad)
           + (COUNT(*) OVER (PARTITION BY brand, ad) - 1) / 2.0e0 AS avg_rank,
         COUNT(*) OVER (PARTITION BY brand, ad) AS t
  FROM d
),
stat AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CASE WHEN diff > 0 THEN avg_rank ELSE 0 END) AS w_plus,
         SUM(t * t - 1.0e0) / 48.0e0 AS tie_corr_part
  FROM r GROUP BY brand
),
ties AS (
  SELECT brand, SUM(t * t * t - t) / 48.0e0 AS tie_corr
  FROM (SELECT DISTINCT brand, ad,
               COUNT(*) OVER (PARTITION BY brand, ad) AS t FROM d) x
  GROUP BY brand
)
SELECT s.brand, s.n, ROUND(s.w_plus, 1) AS w_plus,
       ROUND((s.w_plus - s.n * (s.n + 1) / 4.0e0)
             / SQRT(s.n * (s.n + 1) * (2 * s.n + 1) / 24.0e0 - t.tie_corr),
             6) + 0.0 AS z
FROM stat s JOIN ties t ON s.brand = t.brand
WHERE s.n >= 10
"""


@register("stats_wilcoxon_signed_rank", WILCOXON_ORACLE)
def stats_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test per brand: did per-part shipped quantity
    SHIFT from 1994 to 1995? The PAIRED complement of
    ``stats_mann_whitney`` (pairs = the same part in both years; zero
    diffs dropped, average midranks over |diff| ties, normal
    approximation WITH the tie-correction term). Quantities are
    integer-valued so the year sums, diffs, and half-integer midranks
    are all exact in doubles — the z statistic matches the oracle to
    rounding. One fact scan with CASE-masked year sums; the rank windows
    partition by brand over the PART universe, which grows with entities,
    not events — the same bounded-dimension argument the broadcast-join
    policy rests on."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity"
    )
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    yr = F.year("l_shipdate")
    pairs = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("l_partkey").alias("pk"))
        .agg(
            F.sum(F.when(yr == 1994, F.col("l_quantity")).otherwise(0)).alias("q94"),
            F.sum(F.when(yr == 1995, F.col("l_quantity")).otherwise(0)).alias("q95"),
            F.count(F.when(yr == 1994, 1)).alias("n94"),
            F.count(F.when(yr == 1995, 1)).alias("n95"),
        )
    )
    d = pairs.where(
        (F.col("n94") > 0) & (F.col("n95") > 0) & (F.col("q95") != F.col("q94"))
    ).select(
        "brand",
        (F.col("q95") - F.col("q94")).alias("diff"),
        F.abs(F.col("q95") - F.col("q94")).alias("ad"),
    )
    avg_rank = F.rank().over(Window.partitionBy("brand").orderBy("ad")) + (
        F.count(F.lit(1)).over(Window.partitionBy("brand", "ad")) - 1
    ) / 2.0
    t_sz = F.count(F.lit(1)).over(Window.partitionBy("brand", "ad"))
    r = d.select("brand", "diff", avg_rank.alias("avg_rank"), t_sz.alias("t"), "ad")
    stat = r.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("diff") > 0, F.col("avg_rank")).otherwise(0.0)).alias(
            "w_plus"
        ),
    )
    ties = (
        r.select("brand", "ad", "t")
        .distinct()
        .groupBy("brand")
        .agg(
            (
                F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")) / 48.0
            ).alias("tie_corr")
        )
    )
    n = F.col("n")
    return (
        stat.join(ties, "brand")
        .where(n >= 10)
        .select(
            "brand",
            "n",
            F.round("w_plus", 1).alias("w_plus"),
            (
                F.round(
                    (F.col("w_plus") - n * (n + 1) / 4.0)
                    / F.sqrt(
                        n * (n + 1) * (2 * n + 1) / 24.0 - F.col("tie_corr")
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("z"),
        )
    )


# --------------------------------------------------------------------------
# Poisson-bootstrap confidence interval — the scale-out resampling scheme
# --------------------------------------------------------------------------

POISSON_BOOTSTRAP_ORACLE = """
WITH w AS (
  SELECT i AS rep, x,
    CASE
      WHEN u < 0.367879441171442 THEN 0
      WHEN u < 0.735758882342885 THEN 1
      WHEN u < 0.919698602928606 THEN 2
      WHEN u < 0.981011843123846 THEN 3
      WHEN u < 0.996340153172656 THEN 4
      WHEN u < 0.999405815182418 THEN 5
      WHEN u < 0.999916758850712 THEN 6
      ELSE 7 END AS wt
  FROM (
    -- one md5 yields FOUR 32-bit uniform words (replica i uses word i%4 of
    -- the digest seeded by i//4) — 50 digests per row instead of 200; the
    -- Spark side mirrors the split exactly
    SELECT o_totalprice AS x, b.i,
           ((('0x' || substr(md5('pb|' || CAST(o_orderkey AS VARCHAR) || '|'
                                 || CAST(b.i // 4 AS VARCHAR)),
                             1 + 8 * (b.i % 4), 8))::BIGINT
             % 999999) + 0.5e0) / 1000000.0e0 AS u
    FROM orders, UNNEST(generate_series(0, 199)) AS b(i)
  ) t
),
reps AS (
  SELECT rep, SUM(wt * x) / SUM(wt) AS m
  FROM w GROUP BY rep HAVING SUM(wt) > 0
),
pt AS (SELECT AVG(o_totalprice) AS point_mean FROM orders)
SELECT ROUND(pt.point_mean, 2) AS point_mean,
       ROUND(AVG(r.m), 2) AS boot_mean,
       ROUND(STDDEV_SAMP(r.m), 4) AS boot_se,
       ROUND(quantile_cont(r.m, 0.025), 2) AS ci_lo,
       ROUND(quantile_cont(r.m, 0.975), 2) AS ci_hi,
       CAST(COUNT(*) AS BIGINT) AS n_replicas
FROM reps r, pt
GROUP BY pt.point_mean
"""


@register("stats_poisson_bootstrap_ci", POISSON_BOOTSTRAP_ORACLE)
def stats_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap CI for mean order value via the POISSON bootstrap —
    the resampling scheme that actually distributes: instead of
    materializing B resamples (impossible at 100 TB), every row draws an
    independent Poisson(1) weight per replica, so the whole procedure is
    one generated-column explode and ONE aggregation whose shuffle
    carries B partial sums per partition, never data rows. Weights come
    from an md5-seeded uniform through the exact Poisson inverse-CDF
    thresholds (both engines share the digits), so all 200 replica means
    are deterministic and cross-engine identical to double rounding."""
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    # FAN OUT BEFORE THE MULTIPLIER: the explode turns every input split
    # into 200× the rows, so partitioning must be decided on the INPUT —
    # a small file that arrives as one split would otherwise push the
    # whole 200× expansion through one task (measured exactly that:
    # sf0.1 orders is a single ~30 MB split → ~20 s single-core). The
    # count must be EXPLICIT: AQE coalesces a column-only repartition by
    # its pre-explosion byte size (3 MB → back to one partition, blind to
    # the 200× multiplier downstream), but honors a user-specified count.
    # At 100 TB the scan has thousands of splits and this is a cheap
    # rebalance of pre-explosion rows either way.
    fanned = o.repartition(
        max(spark.sparkContext.defaultParallelism, 8), "o_orderkey"
    )
    # one md5 digest is 128 bits = four 32-bit uniform words: explode 50
    # seed groups and posexplode the digest's four words so each row pays
    # 50 hash evaluations for its 200 replica weights, not 200
    seeded = fanned.select(
        "o_totalprice",
        F.explode(F.sequence(F.lit(0), F.lit(49))).alias("g"),
        F.col("o_orderkey").cast("string").alias("__k"),
    ).select(
        "o_totalprice",
        "g",
        F.md5(
            F.concat(F.lit("pb|"), F.col("__k"), F.lit("|"), F.col("g").cast("string"))
        ).alias("__h"),
    )
    words = F.array(
        *[
            F.conv(F.substring(F.col("__h"), 1 + 8 * j, 8), 16, 10).cast("bigint")
            for j in range(4)
        ]
    )
    reps = seeded.select(
        "o_totalprice",
        "g",
        F.posexplode(words).alias("j", "w32"),
    ).select(
        "o_totalprice",
        (F.col("g") * 4 + F.col("j")).alias("rep"),
        F.col("w32"),
    )
    u = ((F.col("w32") % 999999) + 0.5) / 1000000.0
    wt = (
        F.when(u < 0.367879441171442, 0)
        .when(u < 0.735758882342885, 1)
        .when(u < 0.919698602928606, 2)
        .when(u < 0.981011843123846, 3)
        .when(u < 0.996340153172656, 4)
        .when(u < 0.999405815182418, 5)
        .when(u < 0.999916758850712, 6)
        .otherwise(7)
    )
    rep_means = (
        reps.select("rep", F.col("o_totalprice").alias("x"), wt.alias("wt"))
        .groupBy("rep")
        .agg(F.sum(F.col("wt") * F.col("x")).alias("sx"), F.sum("wt").alias("sw"))
        .where(F.col("sw") > 0)
        .select("rep", (F.col("sx") / F.col("sw")).alias("m"))
    )
    pt = o.agg(F.avg("o_totalprice").alias("point_mean"))
    return (
        rep_means.agg(
            F.round(F.avg("m"), 2).alias("boot_mean"),
            F.round(F.stddev_samp("m"), 4).alias("boot_se"),
            F.round(F.expr("percentile(m, 0.025)"), 2).alias("ci_lo"),
            F.round(F.expr("percentile(m, 0.975)"), 2).alias("ci_hi"),
            F.count(F.lit(1)).cast("bigint").alias("n_replicas"),
        )
        .crossJoin(F.broadcast(pt))
        .select(
            F.round("point_mean", 2).alias("point_mean"),
            "boot_mean",
            "boot_se",
            "ci_lo",
            "ci_hi",
            "n_replicas",
        )
    )


# --------------------------------------------------------------------------
# Grouped weighted quantiles — the generalized bucketed refinement
# --------------------------------------------------------------------------

WEIGHTED_QUANTILES_ORACLE = """
WITH w AS (
  SELECT l_returnflag, l_extendedprice AS p,
    SUM(l_quantity) OVER (
      PARTITION BY l_returnflag
      ORDER BY l_extendedprice, l_orderkey, l_linenumber
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
    SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
  FROM lineitem
)
SELECT l_returnflag,
       ROUND(MIN(CASE WHEN cw >= tw * 0.25 THEN p END), 2) AS w_p25,
       ROUND(MIN(CASE WHEN cw >= tw * 0.5  THEN p END), 2) AS w_p50,
       ROUND(MIN(CASE WHEN cw >= tw * 0.75 THEN p END), 2) AS w_p75
FROM w GROUP BY 1
"""


@register("agg_weighted_quantiles", WEIGHTED_QUANTILES_ORACLE)
def agg_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted price quartiles per return flag through the
    MULTI-FRACTION two-phase bucket refinement
    (``weighted_quantiles_bucketed`` — one scan + one parallel (group,
    bucket) weight histogram locates ALL three crossing buckets; the
    refinement window runs over the tagged union of target buckets,
    ~3/1024 of the rows). Three independent single-fraction calls
    measured 1.61× at 10× data purely from the repeated scans; this form
    keeps scan count flat in the number of quantiles. 0.25/0.5/0.75 are
    dyadic, so ``tw * frac`` is exact in doubles on both engines and the
    crossing rows are identical to the full-window oracle's."""
    from airflow_dags_spark.functions.scalable_windows import (
        weighted_quantiles_bucketed,
    )

    li = read_table(spark, sf_dir, "lineitem")
    out = weighted_quantiles_bucketed(
        li,
        "l_returnflag",
        "l_extendedprice",
        "l_quantity",
        ["l_orderkey", "l_linenumber"],
        {"w_p25": 0.25, "w_p50": 0.5, "w_p75": 0.75},
    )
    return out.select(
        "l_returnflag",
        F.round("w_p25", 2).alias("w_p25"),
        F.round("w_p50", 2).alias("w_p50"),
        F.round("w_p75", 2).alias("w_p75"),
    )


# --------------------------------------------------------------------------
# MMR diversified re-ranking (rows-only: greedy selection is iterative,
# not SQL-expressible; tests/test_round7.py pins an exact numpy reference)
# --------------------------------------------------------------------------


@register("sim_mmr_rerank", None)  # iterative greedy → rows-only
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking over the embeddings table —
    the RAG diversification step between retrieval and the context
    window (operators/similarity.py:mmr_rerank). Queries = the first 5
    vectors (broadcast); the distributed cosine_topk pass builds each
    query's 50-candidate relevance pool (corpus streams, no shuffle);
    one broadcast equi-join attaches candidate vectors (corpus streams
    again, still no shuffle); the greedy λ·relevance − (1−λ)·redundancy
    selection runs inside applyInPandas grouped by qid — each executor
    re-ranks its own queries over ≤pool rows, the driver never sees a
    candidate row. Deterministic: rounded similarities,
    (score desc, cid asc) tie-break."""
    from airflow_dags_spark.operators.similarity import mmr_rerank

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    corpus = emb.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    return mmr_rerank(queries, corpus, k=10, pool=50, lam=0.7)


# --------------------------------------------------------------------------
# Benjamini-Hochberg FDR correction over the per-brand Wilcoxon family
# --------------------------------------------------------------------------

BH_FDR_ORACLE = """
WITH pairs AS (
  SELECT p.p_brand AS brand, l.l_partkey AS pk,
         SUM(CASE WHEN EXTRACT(YEAR FROM l.l_shipdate) = 1994
                  THEN l.l_quantity ELSE 0 END) AS q94,
         SUM(CASE WHEN EXTRACT(YEAR FROM l.l_shipdate) = 1995
                  THEN l.l_quantity ELSE 0 END) AS q95,
         COUNT(CASE WHEN EXTRACT(YEAR FROM l.l_shipdate) = 1994 THEN 1 END)
           AS n94,
         COUNT(CASE WHEN EXTRACT(YEAR FROM l.l_shipdate) = 1995 THEN 1 END)
           AS n95
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, l.l_partkey
),
d AS (
  SELECT brand, pk, q95 - q94 AS diff, ABS(q95 - q94) AS ad
  FROM pairs WHERE n94 > 0 AND n95 > 0 AND q95 <> q94
),
r AS (
  SELECT brand, diff,
         RANK() OVER (PARTITION BY brand ORDER BY ad)
           + (COUNT(*) OVER (PARTITION BY brand, ad) - 1) / 2.0e0 AS avg_rank
  FROM d
),
ties AS (
  SELECT brand, SUM(t * t * t - t) / 48.0e0 AS tie_corr
  FROM (SELECT DISTINCT brand, ad,
               COUNT(*) OVER (PARTITION BY brand, ad) AS t FROM d) x
  GROUP BY brand
),
stat AS (
  SELECT s.brand, s.n,
         (s.w_plus - s.n * (s.n + 1) / 4.0e0)
           / SQRT(s.n * (s.n + 1) * (2 * s.n + 1) / 24.0e0 - t.tie_corr) AS z
  FROM (
    SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CASE WHEN diff > 0 THEN avg_rank ELSE 0 END) AS w_plus
    FROM r GROUP BY brand
  ) s JOIN ties t ON s.brand = t.brand
  WHERE s.n >= 10
),
pv AS (
  -- two-sided p via the Abramowitz-Stegun 7.1.26 erf approximation:
  -- IDENTICAL arithmetic on both engines (neither exposes erf), so the
  -- p-values hash-match exactly
  SELECT brand, n, z,
    2.0e0 * (1.0e0 - (0.5e0 * (1.0e0 + (
      1.0e0 - (((((1.061405429e0 * tt - 1.453152027e0) * tt) + 1.421413741e0)
                 * tt - 0.284496736e0) * tt + 0.254829592e0) * tt
               * EXP(-(ABS(z) / 1.4142135623730951e0)
                     * (ABS(z) / 1.4142135623730951e0))
    )))) AS p
  FROM (
    SELECT brand, n, z,
           1.0e0 / (1.0e0 + 0.3275911e0 * (ABS(z) / 1.4142135623730951e0)) AS tt
    FROM stat
  ) t0
),
ranked AS (
  SELECT brand, n, z, p,
         ROW_NUMBER() OVER (ORDER BY p, brand) AS i,
         CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM pv
),
adj AS (
  SELECT brand, n, z, p, i, m,
         MIN(p * m / i) OVER (
           ORDER BY i DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS p_adj_raw
  FROM ranked
)
SELECT brand, n, ROUND(z, 6) + 0.0 AS z, ROUND(p, 6) + 0.0 AS p_value,
       ROUND(LEAST(p_adj_raw, 1.0e0), 6) + 0.0 AS p_adjusted,
       CAST(LEAST(p_adj_raw, 1.0e0) < 0.05 AS BOOLEAN) AS significant_q05
FROM adj
"""


@register("stats_bh_fdr", BH_FDR_ORACLE)
def stats_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR correction over the per-brand Wilcoxon
    z-scores — the multiple-testing step every grouped hypothesis-test
    family needs (25 brands tested at once ⇒ raw p<0.05 overfires).
    Two-sided p-values come from the Abramowitz-Stegun 7.1.26 erf
    polynomial — both engines run the IDENTICAL arithmetic, so the
    p-values are hash-exact without either engine exposing erf. The BH
    step-up (suffix-min of p·m/i) runs on the m-row test frame — m =
    number of GROUPS, so the unpartitioned windows are bounded by the
    brand universe, not data volume."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity"
    )
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    yr = F.year("l_shipdate")
    pairs = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("l_partkey").alias("pk"))
        .agg(
            F.sum(F.when(yr == 1994, F.col("l_quantity")).otherwise(0)).alias("q94"),
            F.sum(F.when(yr == 1995, F.col("l_quantity")).otherwise(0)).alias("q95"),
            F.count(F.when(yr == 1994, 1)).alias("n94"),
            F.count(F.when(yr == 1995, 1)).alias("n95"),
        )
    )
    d = pairs.where(
        (F.col("n94") > 0) & (F.col("n95") > 0) & (F.col("q95") != F.col("q94"))
    ).select(
        "brand",
        (F.col("q95") - F.col("q94")).alias("diff"),
        F.abs(F.col("q95") - F.col("q94")).alias("ad"),
    )
    avg_rank = F.rank().over(Window.partitionBy("brand").orderBy("ad")) + (
        F.count(F.lit(1)).over(Window.partitionBy("brand", "ad")) - 1
    ) / 2.0
    t_sz = F.count(F.lit(1)).over(Window.partitionBy("brand", "ad"))
    r = d.select("brand", "diff", avg_rank.alias("avg_rank"), t_sz.alias("t"), "ad")
    stat = r.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("diff") > 0, F.col("avg_rank")).otherwise(0.0)).alias(
            "w_plus"
        ),
    )
    ties = (
        r.select("brand", "ad", "t")
        .distinct()
        .groupBy("brand")
        .agg(
            (F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")) / 48.0).alias(
                "tie_corr"
            )
        )
    )
    n = F.col("n")
    z = (F.col("w_plus") - n * (n + 1) / 4.0) / F.sqrt(
        n * (n + 1) * (2 * n + 1) / 24.0 - F.col("tie_corr")
    )
    zf = stat.join(ties, "brand").where(n >= 10).select("brand", "n", z.alias("z"))
    # portable normal CDF: A&S 7.1.26 erf polynomial, identical both engines
    x = F.abs(F.col("z")) / F.lit(1.4142135623730951)
    tt = 1.0 / (1.0 + 0.3275911 * x)
    erf = 1.0 - (
        ((((1.061405429 * tt - 1.453152027) * tt) + 1.421413741) * tt
          - 0.284496736) * tt + 0.254829592
    ) * tt * F.exp(-x * x)
    pv = zf.select(
        "brand", "n", "z", (2.0 * (1.0 - (0.5 * (1.0 + erf)))).alias("p")
    )
    w_rank = Window.orderBy("p", "brand")
    ranked = pv.select(
        "brand",
        "n",
        "z",
        "p",
        F.row_number().over(w_rank).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint").alias("m"),
    )
    w_suffix = Window.orderBy(F.desc("i")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    adj = ranked.withColumn(
        "p_adj_raw",
        F.min(F.col("p") * F.col("m") / F.col("i")).over(w_suffix),
    )
    return adj.select(
        "brand",
        "n",
        (F.round("z", 6) + F.lit(0.0)).alias("z"),
        (F.round("p", 6) + F.lit(0.0)).alias("p_value"),
        (F.round(F.least(F.col("p_adj_raw"), F.lit(1.0)), 6) + F.lit(0.0)).alias(
            "p_adjusted"
        ),
        (F.least(F.col("p_adj_raw"), F.lit(1.0)) < 0.05).alias("significant_q05"),
    )

"""Round-4 registry additions: exact set-similarity join (prefix filter),
exact heavy hitters, inverted-index search, time-series gap fill,
portable table checksum, equi-depth binning, MAD outliers, weighted
median, correlated-subquery sweep.

Registered LAST (after plans/round3 in registry.load_all) so these append
AFTER every existing query in the driver's self-rotating verification
window — new names must never displace the queued unverified queries of
the current round (driver checks only the first 50 of ``queries()``).

Like §2.10, these go beyond the reference's literal surface: they are
standard warehouse / LLM-curation operations the engine needs for parity
with what the reference's Postgres could express, each with a DuckDB
oracle where SQL can express it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_dags_spark.plans.registry import register
from airflow_dags_spark.sources.tables import read_table

_NORM = "LOWER(REGEXP_REPLACE(TRIM(text), '\\s+', ' ', 'g'))"

# --- exact set-similarity self-join via prefix filtering ----------------------

PREFIX_JACCARD_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, list_distinct(string_split({_NORM}, ' ')) AS ts
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS key_a, b.doc_id AS key_b,
         CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
         / (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))) AS j
  FROM tok a JOIN tok b ON a.doc_id < b.doc_id
)
SELECT key_a, key_b, ROUND(j, 6) AS jaccard
FROM pairs WHERE j >= 0.95
ORDER BY key_a, key_b
"""


@register("dedup_prefix_jaccard", PREFIX_JACCARD_ORACLE)
def dedup_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT threshold Jaccard self-join (SSJoin/PPJoin prefix filter):
    unlike MinHash banding (probabilistic recall) or ngram_jaccard
    (candidates-only contract), this returns EVERY qualifying pair — the
    prefix-filter theorem guarantees completeness while the equi-join on
    rare-first prefix tokens keeps candidates far below all-pairs. The
    oracle IS the brute-force all-pairs join, so the hash match proves
    the pruning lossless."""
    from airflow_dags_spark.operators.dedup import prefix_jaccard_join

    d = read_table(spark, sf_dir, "documents")
    return prefix_jaccard_join(d, "text", "doc_id", 0.95).orderBy(
        "key_a", "key_b"
    )


# --- exact heavy hitters (two-pass Misra-Gries) -------------------------------

HEAVY_HITTERS_ORACLE = """
SELECT user_id AS value, CAST(COUNT(*) AS BIGINT) AS cnt
FROM events
WHERE user_id IS NOT NULL
GROUP BY user_id
HAVING COUNT(*) > 0.004 * (
  SELECT COUNT(*) FROM events WHERE user_id IS NOT NULL
)
ORDER BY value
"""


@register("agg_exact_heavy_hitters", HEAVY_HITTERS_ORACLE)
def agg_exact_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters without an exhaustive per-value count shuffle:
    bounded Misra-Gries partials per task (≤ ⌈1/share⌉ counters — a
    guaranteed candidate superset for count > share·n), then an exact
    recount of candidates only via broadcast semi-join. The oracle is the
    exhaustive GROUP BY ... HAVING — the hash match proves the bounded
    pass drops no qualifying value."""
    from airflow_dags_spark.functions.probabilistic import heavy_hitters_exact

    ev = read_table(spark, sf_dir, "events")
    hh = heavy_hitters_exact(ev, "user_id", 0.004)
    return hh.select(
        F.col("user_id").alias("value"), F.col("cnt")
    ).orderBy("value")


# --- inverted-index conjunctive text search -----------------------------------

INVERTED_ORACLE = f"""
SELECT doc_id AS doc
FROM documents
WHERE list_contains(string_split({_NORM}, ' '), 'vector')
  AND list_contains(string_split({_NORM}, ' '), 'merge')
  AND list_contains(string_split({_NORM}, ' '), 'stream')
ORDER BY doc
"""


@register("text_inverted_search", INVERTED_ORACLE)
def text_inverted_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive term search through a (token, doc) posting table: the
    index is filtered to the query terms BEFORE any aggregation, so the
    shuffle carries postings of three tokens, not the corpus; the count-
    matching aggregate is the posting-list intersection. Oracle scans
    every document with per-term membership tests — same semantics, the
    shape the index exists to avoid."""
    from airflow_dags_spark.operators.inverted import (
        build_inverted_index,
        search_all_terms,
    )

    d = read_table(spark, sf_dir, "documents")
    idx = build_inverted_index(d, "text", "doc_id")
    return search_all_terms(idx, ["vector", "merge", "stream"]).orderBy("doc")


# --- bitmap-aggregate exact COUNT DISTINCT ------------------------------------

BITMAP_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("agg_bitmap_distinct", BITMAP_ORACLE)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT DISTINCT via Spark's bitmap aggregates: phase 1 folds
    each (group, 32k-id bucket) into a fixed 4 KB bitmap map-side
    (``bitmap_construct_agg``), phase 2 sums ``bitmap_count`` per group —
    the wire carries bitmaps, never ids. The third strategy in the
    engine's distinct family next to expand-based COUNT DISTINCT and the
    two-phase groupBy (``agg_count_distinct_twophase``): best when ids
    are dense integers, because the shuffle volume is bounded by
    groups × (id_range/32768) bitmaps regardless of row count."""
    li = read_table(spark, sf_dir, "lineitem")
    per_bucket = li.groupBy(
        "l_returnflag",
        F.expr("bitmap_bucket_number(l_partkey)").alias("__bucket"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(l_partkey))").alias("__bm"),
        F.count(F.lit(1)).alias("__n"),
    )
    return (
        per_bucket.groupBy("l_returnflag")
        .agg(
            F.sum(F.expr("bitmap_count(__bm)")).cast("bigint").alias("n_parts"),
            F.sum("__n").cast("bigint").alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )


# --- portable order-insensitive table checksum --------------------------------

CHECKSUM_ORACLE = """
WITH vals AS (
  SELECT
    coalesce(CAST(o_orderkey AS VARCHAR), chr(1) || 'NULL') AS v1,
    coalesce(CAST(o_custkey AS VARCHAR), chr(1) || 'NULL') AS v2,
    coalesce(o_orderstatus, chr(1) || 'NULL') AS v3,
    coalesce(o_orderpriority, chr(1) || 'NULL') AS v4,
    coalesce(strftime(o_orderdate, '%Y-%m-%d'), chr(1) || 'NULL') AS v5
  FROM orders
), canon AS (
  SELECT concat_ws('|',
    CAST(length(v1) AS VARCHAR) || ':' || v1,
    CAST(length(v2) AS VARCHAR) || ':' || v2,
    CAST(length(v3) AS VARCHAR) || ':' || v3,
    CAST(length(v4) AS VARCHAR) || ':' || v4,
    CAST(length(v5) AS VARCHAR) || ':' || v5
  ) AS c
  FROM vals
)
SELECT CAST(CAST(SUM(('0x' || substr(md5(c), 1, 8))::BIGINT) AS DECIMAL(38,0)) AS VARCHAR) AS checksum_hi,
       CAST(CAST(SUM(('0x' || substr(md5(c), 9, 8))::BIGINT) AS DECIMAL(38,0)) AS VARCHAR) AS checksum_lo,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM canon
"""


@register("table_fingerprint_checksum", CHECKSUM_ORACLE)
def table_fingerprint_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive whole-table fingerprint (functions/metrics.py:
    table_checksum): three numbers that validate a cross-engine copy of
    any size without sorting or moving rows — the md5-word sums combine
    map-side, so the plan is one partial+final aggregate over the scan.
    The DuckDB oracle recomputes the same fingerprint from the same
    recipe — the hash match IS the cross-engine validation story."""
    from airflow_dags_spark.functions.metrics import table_checksum

    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_d"),
    )
    sums = table_checksum(
        o, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_d"]
    )
    return sums.select(
        F.col("checksum_hi").cast("string").alias("checksum_hi"),
        F.col("checksum_lo").cast("string").alias("checksum_lo"),
        "n_rows",
    )


# --- equi-depth binning (per-group ntile) -------------------------------------

EQUIDEPTH_ORACLE = """
WITH t AS (
  SELECT o_orderpriority, o_totalprice,
         ntile(4) OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM orders
)
SELECT o_orderpriority, bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(o_totalprice), 2) AS lo,
       ROUND(MAX(o_totalprice), 2) AS hi,
       ROUND(AVG(o_totalprice), 2) AS avg_price
FROM t
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("agg_equidepth_buckets", EQUIDEPTH_ORACLE)
def agg_equidepth_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quartile) binning per priority group WITHOUT one
    reducer per group: a plain partitioned ntile drags each priority's
    whole slice through a single task (5 heavy groups = 5 stragglers at
    100 TB — the same failure the weighted-median rewrite measured at
    8.04×). Instead the per-group rank comes from the GROUPED bucketed
    prefix-sum cascade (range-bucket within each group → parallel
    within-(group, bucket) row_numbers + a bounded per-group offset
    cascade), and the SQL-standard ntile remainder formula maps exact
    ranks to buckets arithmetically — hash-identical to the oracle's
    ntile window because rank and formula are both exact integers.
    Deterministic via the (price, orderkey) tie-break."""
    from airflow_dags_spark.functions.scalable_windows import (
        bucketed_running_sum_grouped,
    )

    o = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderkey"
    )
    rng = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    ).first()
    lo, hi = rng["lo"], rng["hi"]
    width = ((hi - lo) / 512.0) or 1.0
    rbucket = F.least(
        F.floor((F.col("o_totalprice") - F.lit(lo)) / F.lit(width)),
        F.lit(511),
    ).cast("int")
    ranked = bucketed_running_sum_grouped(
        o.withColumn("__one", F.lit(1)),
        "__one",
        ["o_orderpriority"],
        ["o_totalprice", "o_orderkey"],
        rbucket,
        "rnk",
    )
    sizes = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("gn"))
    k = 4
    q = F.floor(F.col("gn") / k)
    r = F.col("gn") % k
    big_span = r * (q + 1)
    bucket_id = (
        F.when(
            F.col("rnk") <= big_span, F.floor((F.col("rnk") - 1) / (q + 1))
        ).otherwise(r + F.floor((F.col("rnk") - big_span - 1) / q))
        + 1
    ).cast("int")
    return (
        ranked.join(F.broadcast(sizes), "o_orderpriority")
        .withColumn("bucket", bucket_id)
        .groupBy("o_orderpriority", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
        .orderBy("o_orderpriority", "bucket")
    )


# --- robust outliers via median absolute deviation ----------------------------

MAD_ORACLE = """
WITH med AS (
  SELECT event_type, median(value) AS med
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
dev AS (
  SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS ad
  FROM events e JOIN med m USING (event_type)
  WHERE e.value IS NOT NULL
),
mad AS (SELECT event_type, median(ad) AS mad FROM dev GROUP BY 1)
SELECT d.event_type,
       ROUND(MAX(d.med), 6) AS med,
       ROUND(MAX(m2.mad), 6) AS mad,
       CAST(SUM(CASE WHEN m2.mad > 0 AND ABS(d.value - d.med) > 3 * m2.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(COUNT(*) AS BIGINT) AS n
FROM dev d JOIN mad m2 USING (event_type)
GROUP BY 1
ORDER BY 1
"""


@register("events_mad_outliers", MAD_ORACLE)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier screen per event type — the
    data-quality gate that survives the outliers it hunts (mean/stddev
    z-scores are dragged by the very tails). Two exact-median aggregates
    with broadcast joins back (the per-group frames are |groups| rows);
    flag |x − med| > 3·MAD."""
    ev = read_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("ad").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.max("med"), 6).alias("med"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.sum(
                F.when(
                    (F.col("mad") > 0)
                    & (F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad")),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


# --- weighted median per group ------------------------------------------------

WEIGHTED_MEDIAN_ORACLE = """
WITH w AS (
  SELECT l_returnflag, l_extendedprice AS p,
    SUM(l_quantity) OVER (
      PARTITION BY l_returnflag
      ORDER BY l_extendedprice, l_orderkey, l_linenumber
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
    SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
  FROM lineitem
)
SELECT l_returnflag, ROUND(MIN(p), 2) AS weighted_median
FROM w
WHERE cw >= tw / 2.0
GROUP BY 1
ORDER BY 1
"""


@register("agg_weighted_median", WEIGHTED_MEDIAN_ORACLE)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (price weighted by quantity) per return flag via
    the bucketed two-phase refinement (functions/scalable_windows.py:
    weighted_median_bucketed): with only 3 heavy groups, the naive
    per-group cumulative window serializes the whole table through 3
    tasks (measured 8× at 10× data); the bucketed form aggregates a
    (group, bucket) weight histogram in parallel, locates the half-weight
    bucket on the driver, and windows ONLY inside that bucket — hash-
    identical to the window-form oracle because integer-valued weights
    accumulate exactly."""
    from airflow_dags_spark.functions.scalable_windows import (
        weighted_median_bucketed,
    )

    li = read_table(spark, sf_dir, "lineitem")
    wm = weighted_median_bucketed(
        li, "l_returnflag", "l_extendedprice", "l_quantity",
        ["l_orderkey", "l_linenumber"],
    )
    return wm.select(
        "l_returnflag",
        F.round("weighted_median", 2).alias("weighted_median"),
    ).orderBy("l_returnflag")


# --- correlated-subquery semantics sweep --------------------------------------

SUBQUERY_SQL = """
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
FROM customer c
WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
  AND c.c_custkey NOT IN (
        SELECT o_custkey FROM orders
        WHERE o_orderstatus = 'F' AND o_custkey IS NOT NULL)
  AND c.c_acctbal > (
        SELECT AVG(c2.c_acctbal) FROM customer c2
        WHERE c2.c_mktsegment = c.c_mktsegment)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("subquery_patterns", SUBQUERY_SQL)
def subquery_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery sweep through Catalyst's decorrelation: EXISTS
    (→ left-semi join), NOT IN (→ null-aware anti join — the classic
    three-valued-logic trap, explicitly guarded here with IS NOT NULL),
    and a correlated scalar aggregate (→ per-group aggregate + join).
    The SAME SQL text runs on both engines — the dialect-shared subset —
    so this is a direct SQL-surface parity check, not a translation."""
    for t in ("customer", "orders"):
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(SUBQUERY_SQL)


# --- round-4 batch 2 (queued for the r5 window behind the 46 pending) ---------

VOCAB_COVERAGE_ORACLE = f"""
WITH occ AS (
  SELECT u.t AS token
  FROM documents, UNNEST(string_split({_NORM}, ' ')) AS u(t)
  WHERE u.t <> ''
),
counts AS (SELECT token, COUNT(*) AS c FROM occ GROUP BY 1),
vocab AS (
  SELECT token FROM counts ORDER BY c DESC, token LIMIT 20
)
SELECT CAST((SELECT COUNT(*) FROM counts) AS BIGINT) AS n_distinct_tokens,
       CAST(SUM(c) AS BIGINT) AS n_occurrences,
       CAST(SUM(CASE WHEN token IN (SELECT token FROM vocab) THEN c ELSE 0 END)
            AS BIGINT) AS covered_occurrences,
       ROUND(SUM(CASE WHEN token IN (SELECT token FROM vocab) THEN c ELSE 0 END)
             / CAST(SUM(c) AS DOUBLE), 6) AS coverage,
       ROUND(1.0 - SUM(CASE WHEN token IN (SELECT token FROM vocab) THEN c ELSE 0 END)
             / CAST(SUM(c) AS DOUBLE), 6) AS oov_rate
FROM counts
"""


@register("text_vocab_coverage", VOCAB_COVERAGE_ORACLE)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage: build the top-V vocabulary by
    occurrence count (deterministic (count DESC, token) tie-break) and
    measure what share of ALL token occurrences it covers — the number
    that decides a tokenizer's OOV behavior before anyone trains with it.
    One explode + one count agg; the top-V select is a bounded sort of
    |vocab| count rows, broadcast back as a semi-joinable set."""
    from airflow_dags_spark.functions.text import tokens

    d = read_table(spark, sf_dir, "documents")
    occ = d.select(F.explode(tokens("text")).alias("token")).where(
        F.col("token") != ""
    )
    counts = occ.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    vocab = counts.orderBy(F.desc("c"), "token").limit(20).select("token")
    flagged = counts.join(
        F.broadcast(vocab.withColumn("__in_vocab", F.lit(True))), "token", "left"
    )
    covered = F.sum(
        F.when(F.col("__in_vocab"), F.col("c")).otherwise(F.lit(0))
    )
    return flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_tokens"),
        F.sum("c").cast("bigint").alias("n_occurrences"),
        covered.cast("bigint").alias("covered_occurrences"),
        F.round(covered / F.sum("c").cast("double"), 6).alias("coverage"),
        F.round(
            F.lit(1.0) - covered / F.sum("c").cast("double"), 6
        ).alias("oov_rate"),
    )


BIGRAM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS ts FROM documents
),
bi AS (
  SELECT ts[i] AS w1, ts[i + 1] AS w2
  FROM toks, UNNEST(generate_series(1, GREATEST(len(ts) - 1, 0))) AS u(i)
),
bc AS (SELECT w1, w2, COUNT(*) AS c FROM bi GROUP BY 1, 2),
uc AS (SELECT w1, SUM(c) AS cw1 FROM bc GROUP BY 1)
SELECT bc.w1, bc.w2, CAST(bc.c AS BIGINT) AS c,
       ROUND(bc.c / CAST(uc.cw1 AS DOUBLE), 6) AS p_w2_given_w1
FROM bc JOIN uc USING (w1)
ORDER BY c DESC, bc.w1, bc.w2
LIMIT 30
"""


@register("text_bigram_stats", BIGRAM_ORACLE)
def text_bigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram statistics with conditional probability P(w2|w1) —
    the n-gram-LM / repeated-template diagnostic (a template-generated
    corpus shows up as near-1.0 conditionals on high-count bigrams).
    Bigrams via a length-1 token slide (zip of ts with its own tail,
    JVM arrays_zip — no Python), one count agg, unigram totals re-derived
    from the bigram counts (no second corpus pass)."""
    from airflow_dags_spark.functions.text import tokens

    d = read_table(spark, sf_dir, "documents")
    ts = tokens("text")
    pairs = d.select(
        F.explode(
            F.arrays_zip(
                F.slice(ts, 1, F.greatest(F.size(ts) - 1, F.lit(0))),
                F.slice(ts, 2, F.greatest(F.size(ts) - 1, F.lit(0))),
            )
        ).alias("bg")
    ).select(F.col("bg.0").alias("w1"), F.col("bg.1").alias("w2"))
    bc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    uc = bc.groupBy("w1").agg(F.sum("c").alias("cw1"))
    return (
        bc.join(uc, "w1")
        .select(
            "w1",
            "w2",
            F.col("c").cast("bigint").alias("c"),
            F.round(F.col("c") / F.col("cw1").cast("double"), 6).alias(
                "p_w2_given_w1"
            ),
        )
        .orderBy(F.desc("c"), "w1", "w2")
        .limit(30)
    )


ROBUST_SCALE_ORACLE = """
WITH stats AS (
  SELECT event_type,
         quantile_cont(value, 0.5)  AS med,
         quantile_cont(value, 0.75) - quantile_cont(value, 0.25) AS iqr
  FROM events WHERE value IS NOT NULL GROUP BY 1
)
SELECT e.event_id, e.event_type,
       ROUND(CASE WHEN s.iqr > 0 THEN (e.value - s.med) / s.iqr END, 6)
         AS value_scaled
FROM events e JOIN stats s USING (event_type)
WHERE e.value IS NOT NULL AND e.user_id < 5
ORDER BY e.event_id
"""


@register("features_robust_scale", ROBUST_SCALE_ORACLE)
def features_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust feature scaling (median/IQR) per group — the normalization
    that survives the outliers mean/stddev scaling absorbs. Exact
    quantiles per group (one sort-agg over |groups| buffers), broadcast
    back, scan-stage arithmetic; NULL where IQR is degenerate."""
    ev = read_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    stats = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med"),
        (
            F.percentile("value", F.lit(0.75))
            - F.percentile("value", F.lit(0.25))
        ).alias("iqr"),
    )
    return (
        ev.where(F.col("user_id") < 5)
        .join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            F.round(
                F.when(
                    F.col("iqr") > 0,
                    (F.col("value") - F.col("med")) / F.col("iqr"),
                ),
                6,
            ).alias("value_scaled"),
        )
        .orderBy("event_id")
    )


BEST_SURVIVOR_ORACLE = f"""
WITH h AS (
  SELECT doc_id, n_chars, md5({_NORM}) AS grp FROM documents
),
ranked AS (
  SELECT doc_id, n_chars, grp,
         ROW_NUMBER() OVER (
           PARTITION BY grp ORDER BY n_chars DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY grp) AS group_size
  FROM h
)
SELECT doc_id, CAST(group_size AS BIGINT) AS group_size
FROM ranked WHERE rn = 1
ORDER BY doc_id
"""


@register("dedup_exact_best_survivor", BEST_SURVIVOR_ORACLE)
def dedup_exact_best_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup survivor selection: instead of min-key-wins,
    each exact-duplicate group keeps its HIGHEST-QUALITY member (here:
    longest, tie → lowest id) — what a curation pipeline actually wants
    when duplicates differ in truncation or cleanup state. Same single
    md5-shuffle shape as dedup_exact; the survivor rule is the window
    order."""
    from pyspark.sql import Window as W

    from airflow_dags_spark.functions.text import normalized

    d = read_table(spark, sf_dir, "documents")
    h = d.select("doc_id", "n_chars", F.md5(normalized("text")).alias("grp"))
    w = W.partitionBy("grp").orderBy(F.desc("n_chars"), "doc_id")
    return (
        h.withColumn("rn", F.row_number().over(w))
        .withColumn("group_size", F.count(F.lit(1)).over(W.partitionBy("grp")))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("group_size").cast("bigint").alias("group_size"))
        .orderBy("doc_id")
    )


AQP_ORACLE = """
WITH s AS (
  SELECT o_totalprice
  FROM orders
  WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
        < CAST(0.1 * 4294967296 AS BIGINT)
),
est AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sample,
         AVG(o_totalprice) AS m,
         stddev_samp(o_totalprice) / sqrt(COUNT(*)) AS se
  FROM s
)
SELECT n_sample,
       ROUND(m, 4) AS mean_est,
       ROUND(m - 1.96 * se, 4) AS ci_lo,
       ROUND(m + 1.96 * se, 4) AS ci_hi,
       ROUND((SELECT AVG(o_totalprice) FROM orders), 4) AS mean_exact,
       ((SELECT AVG(o_totalprice) FROM orders) >= m - 1.96 * se AND
        (SELECT AVG(o_totalprice) FROM orders) <= m + 1.96 * se)
         AS ci_contains_truth
FROM est
"""


@register("aqp_sample_mean_ci", AQP_ORACLE)
def aqp_sample_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing by deterministic sampling: a 10%
    md5-threshold sample (a scan-stage FILTER — no global sort, no
    shuffle, unlike orderBy(md5).limit) estimates the mean with a CLT
    95% interval; the exact mean rides along to show calibration. At
    100 TB the sample predicate prunes 90% of the work at the scan while
    the error bar quantifies what that bought — the engine-portable md5
    recipe makes the SAMPLE itself oracle-identical, so the whole
    estimate hash-matches."""
    o = read_table(spark, sf_dir, "orders")
    thresh = int(0.1 * 4294967296)
    in_sample = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        < thresh
    )
    # ONE conditional aggregate computes the sampled moments AND the exact
    # mean in the same pass — no join, no second scan (the sampled
    # aggregates see NULL outside the sample, which every agg skips)
    sampled_price = F.when(in_sample, F.col("o_totalprice"))
    est = o.agg(
        F.count(sampled_price).alias("n_sample"),
        F.avg(sampled_price).alias("m"),
        (F.stddev_samp(sampled_price) / F.sqrt(F.count(sampled_price))).alias("se"),
        F.avg("o_totalprice").alias("me"),
    )
    return est.select(
        "n_sample",
        F.round("m", 4).alias("mean_est"),
        F.round(F.col("m") - 1.96 * F.col("se"), 4).alias("ci_lo"),
        F.round(F.col("m") + 1.96 * F.col("se"), 4).alias("ci_hi"),
        F.round("me", 4).alias("mean_exact"),
        (
            (F.col("me") >= F.col("m") - 1.96 * F.col("se"))
            & (F.col("me") <= F.col("m") + 1.96 * F.col("se"))
        ).alias("ci_contains_truth"),
    )


KEYSET_ORACLE = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS d, o_totalprice
FROM orders
WHERE o_orderdate > TIMESTAMP '1995-06-15 00:00:00'
   OR (o_orderdate = TIMESTAMP '1995-06-15 00:00:00' AND o_orderkey > 1000)
ORDER BY o_orderdate, o_orderkey
LIMIT 20
"""


@register("keyset_pagination", KEYSET_ORACLE)
def keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (cursor) pagination: the next page is a RANGE PREDICATE on
    the sort key after the last-seen row, not an OFFSET — OFFSET n scans
    and discards n rows per page (deep pages cost O(pages²) total), while
    the keyset predicate pushes to the scan (PushedFilters on
    o_orderdate) and each page costs one bounded top-k. The disjunctive
    form (d > D OR (d = D AND k > K)) is deliberately index/pushdown-
    friendly on both engines."""
    o = read_table(spark, sf_dir, "orders")
    cursor_d = F.lit("1995-06-15 00:00:00").cast("timestamp_ntz")
    page = o.where(
        (F.col("o_orderdate") > cursor_d)
        | ((F.col("o_orderdate") == cursor_d) & (F.col("o_orderkey") > 1000))
    )
    return (
        page.orderBy("o_orderdate", "o_orderkey")
        .limit(20)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
            "o_totalprice",
        )
    )


EQUIDEPTH_GLOBAL_ORACLE = """
WITH t AS (
  SELECT o_totalprice,
         ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM orders
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(o_totalprice), 2) AS lo,
       ROUND(MAX(o_totalprice), 2) AS hi,
       ROUND(AVG(o_totalprice), 2) AS avg_price
FROM t
GROUP BY 1
ORDER BY 1
"""


@register("agg_equidepth_global", EQUIDEPTH_GLOBAL_ORACLE)
def agg_equidepth_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL exact equi-depth (octile) binning WITHOUT the global-window
    single reducer: global rank = bucketed prefix-sum of row counts
    (range-bucket by price → within-bucket row_number in parallel +
    |buckets|-row offset cascade — the bucketed_running_sum composition
    over a count of 1), then the SQL-standard ntile remainder formula
    applied arithmetically to the rank. Hash-identical to the oracle's
    ntile window because rank and formula are both exact integers; the
    only SinglePartition exchange in the plan is over the 512-row offsets
    frame, never the table."""
    from airflow_dags_spark.functions.scalable_windows import (
        bucketed_running_sum,
    )

    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    rng = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    lo, hi, n = rng["lo"], rng["hi"], int(rng["n"])
    width = (hi - lo) / 512.0 or 1.0
    bucket = F.least(
        F.floor((F.col("o_totalprice") - F.lit(lo)) / F.lit(width)), F.lit(511)
    ).cast("int")
    ranked = bucketed_running_sum(
        o.withColumn("__one", F.lit(1)),
        "__one",
        ["o_totalprice", "o_orderkey"],
        bucket,
        "rnk",
    )
    k = 8
    q, r = divmod(n, k)
    # ntile remainder rule: first r buckets hold q+1 rows, the rest q
    big_span = r * (q + 1)
    bucket_id = (
        F.when(F.col("rnk") <= big_span, F.floor((F.col("rnk") - 1) / (q + 1)))
        .otherwise(r + F.floor((F.col("rnk") - big_span - 1) / q))
        + 1
    ).cast("int")
    return (
        ranked.withColumn("bucket", bucket_id)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
        .orderBy("bucket")
    )


RFM_ORACLE = """
WITH cust AS (
  SELECT o_custkey,
         date_diff('day', MAX(o_orderdate), DATE '1998-12-31') AS rec_days,
         COUNT(*) AS freq,
         SUM(o_totalprice) AS money
  FROM orders GROUP BY 1
),
qs AS (
  SELECT quantile_cont(rec_days, 0.25) AS r1, quantile_cont(rec_days, 0.5) AS r2,
         quantile_cont(rec_days, 0.75) AS r3,
         quantile_cont(freq, 0.25) AS f1, quantile_cont(freq, 0.5) AS f2,
         quantile_cont(freq, 0.75) AS f3,
         quantile_cont(money, 0.25) AS m1, quantile_cont(money, 0.5) AS m2,
         quantile_cont(money, 0.75) AS m3
  FROM cust
)
SELECT
  1 + CAST(rec_days > r1 AS INT) + CAST(rec_days > r2 AS INT)
    + CAST(rec_days > r3 AS INT) AS r_score,
  1 + CAST(freq > f1 AS INT) + CAST(freq > f2 AS INT)
    + CAST(freq > f3 AS INT) AS f_score,
  1 + CAST(money > m1 AS INT) + CAST(money > m2 AS INT)
    + CAST(money > m3 AS INT) AS m_score,
  CAST(COUNT(*) AS BIGINT) AS n_customers,
  ROUND(AVG(money), 2) AS avg_money
FROM cust, qs
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


@register("customer_rfm_segments", RFM_ORACLE)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency/frequency/monetary quartile scores, the
    classic CRM analysis): customer aggregate → ONE nine-quantile
    aggregate broadcast back → arithmetic scores (score 1-4 ascending in
    the metric; r_score 4 = LONGEST since last order). No per-dimension
    sort or ntile window — quartile boundaries come from the exact
    percentile aggregate, so segment assignment is a scan-stage
    comparison and the whole plan has two aggregates + one broadcast."""
    o = read_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("1998-12-31").cast("date"), F.max("o_orderdate")
        ).alias("rec_days"),
        F.count(F.lit(1)).alias("freq"),
        F.sum("o_totalprice").alias("money"),
    )
    qs = cust.agg(
        *[
            F.percentile(c, F.lit(p)).alias(f"{c[0]}{i}")
            for c in ("rec_days", "freq", "money")
            for i, p in ((1, 0.25), (2, 0.5), (3, 0.75))
        ]
    )

    def score(c: str) -> F.Column:
        return (
            F.lit(1)
            + (F.col(c) > F.col(f"{c[0]}1")).cast("int")
            + (F.col(c) > F.col(f"{c[0]}2")).cast("int")
            + (F.col(c) > F.col(f"{c[0]}3")).cast("int")
        )

    return (
        cust.crossJoin(F.broadcast(qs))
        .select(
            score("rec_days").alias("r_score"),
            score("freq").alias("f_score"),
            score("money").alias("m_score"),
            "money",
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("money"), 2).alias("avg_money"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


ABC_ORACLE = """
WITH parts AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
  FROM lineitem GROUP BY 1
),
w AS (
  SELECT rev,
         SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(rev) OVER () AS tot
  FROM parts
)
SELECT CASE WHEN cum <= 0.80 * tot THEN 'A'
            WHEN cum <= 0.95 * tot THEN 'B' ELSE 'C' END AS abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(CAST(SUM(rev) AS DOUBLE), 2) AS revenue,
       ROUND(CAST(SUM(rev) AS DOUBLE) / CAST(MAX(tot) AS DOUBLE), 4) AS share
FROM w
GROUP BY 1
ORDER BY 1
"""


@register("part_abc_pareto", ABC_ORACLE)
def part_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC classification (A = parts covering the first 80% of
    revenue, B to 95%, C the tail): the cumulative-revenue ranking uses
    the bucketed prefix-sum (range-bucket on revenue DESC → parallel
    within-bucket cumsum + tiny offset cascade) instead of a global
    single-reducer window. DECIMAL revenue keeps every cumulative sum
    EXACT in any accumulation order, so the 80%/95% boundary rows are
    engine-identical — with doubles the bucketed fold and the oracle's
    sequential window could disagree in the last ulp exactly at a class
    boundary."""
    from decimal import Decimal

    from airflow_dags_spark.functions.scalable_windows import (
        bucketed_running_sum,
    )

    li = read_table(spark, sf_dir, "lineitem")
    parts = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev")
    )
    rng = parts.agg(
        F.min("rev").alias("lo"), F.max("rev").alias("hi"),
        F.sum("rev").alias("tot"),
    ).first()
    lo, hi, tot = rng["lo"], rng["hi"], rng["tot"]
    width = float(hi - lo) / 256.0 or 1.0
    # monotone in (rev DESC): -rev ascending
    bucket = F.least(
        F.floor((F.lit(float(hi)) - F.col("rev").cast("double")) / F.lit(width)),
        F.lit(255),
    ).cast("int")
    cum = bucketed_running_sum(
        parts,
        "rev",
        [F.col("rev").desc(), F.col("l_partkey").asc()],
        bucket,
        "cum",
    )
    t80 = F.lit(str(tot * Decimal("0.80"))).cast("decimal(38,4)")
    t95 = F.lit(str(tot * Decimal("0.95"))).cast("decimal(38,4)")
    cls = (
        F.when(F.col("cum") <= t80, "A")
        .when(F.col("cum") <= t95, "B")
        .otherwise("C")
    )
    return (
        cum.withColumn("abc_class", cls)
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("rev").cast("double"), 2).alias("revenue"),
            F.round(
                F.sum("rev").cast("double") / F.lit(float(tot)), 4
            ).alias("share"),
        )
        .orderBy("abc_class")
    )


_SHINGLES3 = f"""
list_distinct(
  list_transform(
    generate_series(1, GREATEST(len(string_split({_NORM}, ' ')) - 2, 0)),
    i -> string_split({_NORM}, ' ')[i] || ' ' ||
         string_split({_NORM}, ' ')[i+1] || ' ' ||
         string_split({_NORM}, ' ')[i+2]
  )
)
"""

REPEATED_NGRAM_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, u.s AS shingle
  FROM documents, UNNEST({_SHINGLES3}) AS u(s)
)
SELECT shingle, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM sh
GROUP BY shingle
HAVING COUNT(DISTINCT doc_id) > 1
ORDER BY n_docs DESC, shingle
LIMIT 50
"""


@register("dedup_repeated_ngram_spans", REPEATED_NGRAM_ORACLE)
def dedup_repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated n-gram detection — the signal behind exact
    SUBSTRING dedup (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better": memorized spans repeat verbatim across
    documents): every 3-token shingle present in more than one document,
    hottest first. One explode + one two-phase distinct count (shingle →
    doc set sizes); at 100 TB the same shape runs on shingle HASHES
    (8 bytes instead of the text) and feeds span removal, not a report."""
    from airflow_dags_spark.functions.text import shingles_from_tokens, tokens

    d = read_table(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id", tokens("text").alias("__toks")
    ).select("doc_id", F.explode(shingles_from_tokens(F.col("__toks"), 3)).alias("shingle"))
    return (
        staged.groupBy("shingle")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") > 1)
        .orderBy(F.desc("n_docs"), "shingle")
        .limit(50)
    )


TOKEN_ENTROPY_ORACLE = f"""
WITH occ AS (
  SELECT doc_id, u.t AS token
  FROM documents, UNNEST(string_split({_NORM}, ' ')) AS u(t)
  WHERE u.t <> ''
),
tc AS (SELECT doc_id, token, COUNT(*) AS c FROM occ GROUP BY 1, 2),
dt AS (SELECT doc_id, SUM(c) AS n FROM tc GROUP BY 1)
SELECT tc.doc_id,
       CAST(MAX(dt.n) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       ROUND(-SUM((tc.c / CAST(dt.n AS DOUBLE))
                  * log2(tc.c / CAST(dt.n AS DOUBLE))), 4) AS entropy
FROM tc JOIN dt USING (doc_id)
GROUP BY tc.doc_id
ORDER BY tc.doc_id
"""


@register("text_token_entropy", TOKEN_ENTROPY_ORACLE)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token Shannon entropy — the repetition/diversity
    quality signal (boilerplate and degenerate generations sit at low
    entropy; natural prose near log2 of its working vocabulary). Two
    keyed aggregates, no window; entropy terms are p·log2 p summed per
    document."""
    from airflow_dags_spark.functions.text import tokens

    d = read_table(spark, sf_dir, "documents")
    occ = d.select(
        "doc_id", F.explode(tokens("text")).alias("token")
    ).where(F.col("token") != "")
    tc = occ.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    dt = tc.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n").cast("double")
    return (
        tc.join(dt, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.max("n").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.round(-F.sum(p * F.log2(p)), 4).alias("entropy"),
        )
        .orderBy("doc_id")
    )


PERPLEXITY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS ts FROM documents
),
bi AS (
  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
  FROM toks, UNNEST(generate_series(1, GREATEST(len(ts) - 1, 0))) AS u(i)
),
bc AS (SELECT w1, w2, COUNT(*) AS c FROM bi GROUP BY 1, 2),
uc AS (SELECT w1, SUM(c) AS cw1 FROM bc GROUP BY 1)
SELECT bi.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(-log2(bc.c / CAST(uc.cw1 AS DOUBLE))), 4) AS avg_nll
FROM bi
JOIN bc ON bc.w1 = bi.w1 AND bc.w2 = bi.w2
JOIN uc ON uc.w1 = bi.w1
GROUP BY bi.doc_id
ORDER BY bi.doc_id
"""


@register("text_perplexity_proxy", PERPLEXITY_ORACLE)
def text_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self-trained bigram LM score per document (avg negative
    log2 conditional probability ≈ log-perplexity) — the CCNet/Gopher
    style quality filter: template spam scores low (predictable), noise
    scores high; both tails get cut. The bigram model is built FROM the
    corpus in the same job (counts + conditionals), then each document's
    bigrams join back against it — two aggregates and two broadcast-size
    joins on (w1, w2); no UDF, no external model."""
    from airflow_dags_spark.functions.text import tokens

    d = read_table(spark, sf_dir, "documents")
    ts = tokens("text")
    bi = d.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(ts, 1, F.greatest(F.size(ts) - 1, F.lit(0))),
                F.slice(ts, 2, F.greatest(F.size(ts) - 1, F.lit(0))),
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.0").alias("w1"), F.col("bg.1").alias("w2"))
    bc = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    uc = bc.groupBy("w1").agg(F.sum("c").alias("cw1"))
    nll = -F.log2(F.col("c") / F.col("cw1").cast("double"))
    return (
        bi.join(bc, ["w1", "w2"]).join(uc, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.avg(nll), 4).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


# --- time-weighted average price (TWAP) ---------------------------------------

TWAP_ORACLE = """
WITH nxt AS (
  SELECT event_type, value, epoch_us(ts) AS t0,
         epoch_us(LEAD(ts) OVER (
           PARTITION BY event_type ORDER BY ts, event_id)) AS t1
  FROM events
)
SELECT event_type,
       ROUND(SUM(value * (t1 - t0)) / CAST(SUM(t1 - t0) AS DOUBLE), 6) AS twap,
       ROUND(AVG(value), 6)                                            AS simple_avg,
       CAST(COUNT(*) AS BIGINT)                                        AS n_weighted
FROM nxt WHERE t1 IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


@register("events_twap", TWAP_ORACLE)
def events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per event_type: each reading is weighted
    by the time until the NEXT reading of the same key (the standard TWAP /
    sensor-resample aggregate; the last reading carries no weight).

    Scale shape: the naive form is lead() over a per-key window — with a
    handful of keys that serializes the table through |keys| reducers. This
    uses functions/timeseries.stitched_lead_ts: lead within (key, day) in
    parallel, bucket boundaries stitched via the broadcast per-(key, day)
    firsts table. The oracle IS the monolithic window — the hash match
    proves the stitch exact (including readings whose successor falls days
    later)."""
    from airflow_dags_spark.functions.timeseries import stitched_lead_ts

    ev = read_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    led = stitched_lead_ts(ev, "event_type", "ts", "event_id", F.to_date("ts"))
    dt = F.unix_micros(F.col("next_ts")) - F.unix_micros(F.col("ts"))
    return (
        led.where(F.col("next_ts").isNotNull())
        .groupBy("event_type")
        .agg(
            F.round(
                F.sum(F.col("value") * dt) / F.sum(dt).cast("double"), 6
            ).alias("twap"),
            F.round(F.avg("value"), 6).alias("simple_avg"),
            F.count(F.lit(1)).alias("n_weighted"),
        )
        .orderBy("event_type")
    )


# --- OHLC bars (resampling to hourly candles) ---------------------------------

OHLC_ORACLE = """
SELECT event_type,
       STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS hr,
       FIRST(value ORDER BY ts, event_id)                    AS open,
       MAX(value)                                            AS high,
       MIN(value)                                            AS low,
       LAST(value ORDER BY ts, event_id)                     AS close,
       CAST(COUNT(*) AS BIGINT)                              AS n_obs,
       ROUND(SUM(value), 2)                                  AS volume
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("events_ohlc_bars", OHLC_ORACLE)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC (open/high/low/close) resampling per key — the market-
    data candle aggregate. open/close are ORDERED firsts: min_by/max_by on
    a (ts, event_id) struct computes them inside ONE partial+final hash
    aggregate (no window, no per-bar sort — the struct comparator keeps
    only the extremum per group map-side). The oracle uses DuckDB's ordered
    FIRST/LAST aggregates; the hash match pins the tie rule."""
    ev = read_table(spark, sf_dir, "events")
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy(
            "event_type",
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hr"),
        )
        .agg(
            F.min_by("value", ordk).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ordk).alias("close"),
            F.count(F.lit(1)).alias("n_obs"),
            F.round(F.sum("value"), 2).alias("volume"),
        )
        .orderBy("event_type", "hr")
    )


# --- interval union coverage (merge overlapping spans, midnight-clipped) ------

COVERAGE_ORACLE = """
WITH iv AS (
  SELECT event_type, ts AS s,
         ts + INTERVAL 1 MINUTE * CAST(FLOOR(value) AS INT) AS e
  FROM events
  WHERE value IS NOT NULL AND FLOOR(value) >= 1
),
days AS (
  SELECT event_type, s, e,
         UNNEST(generate_series(CAST(s AS DATE),
                                CAST(e - INTERVAL 1 MICROSECOND AS DATE),
                                INTERVAL 1 DAY)) AS d
  FROM iv
),
clipped AS (
  SELECT event_type, CAST(d AS DATE) AS day,
         GREATEST(s, CAST(CAST(d AS DATE) AS TIMESTAMP))    AS cs,
         LEAST(e, CAST(CAST(d AS DATE) + 1 AS TIMESTAMP))   AS ce
  FROM days
),
flag AS (
  SELECT event_type, day, cs, ce,
         CASE WHEN cs > COALESCE(MAX(ce) OVER (
                  PARTITION BY event_type, day ORDER BY cs, ce
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                TIMESTAMP '1900-01-01')
              THEN 1 ELSE 0 END AS new_island
  FROM clipped
),
isl AS (
  SELECT event_type, day, cs, ce,
         SUM(new_island) OVER (PARTITION BY event_type, day
                               ORDER BY cs, ce ROWS UNBOUNDED PRECEDING) AS island
  FROM flag
),
cov AS (
  SELECT event_type, day, island,
         epoch_us(MAX(ce)) - epoch_us(MIN(cs)) AS cov_us
  FROM isl GROUP BY 1, 2, 3
)
SELECT event_type, STRFTIME(day, '%Y-%m-%d') AS day,
       CAST(SUM(cov_us) AS BIGINT) AS covered_us,
       CAST(COUNT(*) AS BIGINT)    AS n_islands
FROM cov GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("interval_union_coverage", COVERAGE_ORACLE)
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total covered time per (key, day) after MERGING overlapping spans —
    the interval-union aggregate (uptime, occupancy, machine-busy time).
    Each event spans [ts, ts + floor(value) minutes).

    Scale shape: islands are inherently sequential, so intervals are first
    CLIPPED to day boundaries (coverage is additive across disjoint day
    windows — an explode of at most ⌈span/1d⌉ pieces); the sweep-line
    (strictly-preceding running max of span ends → island ids → per-island
    extent) then runs independently per (key, day) partition: thousands of
    parallel sweeps, none global. Semantics: per-day coverage, spans
    crossing midnight counted in each day they touch."""
    ev = read_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    iv = ev.where("value IS NOT NULL AND FLOOR(value) >= 1").select(
        "event_type",
        F.col("ts").alias("s"),
        F.expr(
            "ts + make_interval(0,0,0,0,0, CAST(FLOOR(value) AS INT), 0)"
        ).alias("e"),
    )
    days = iv.withColumn(
        "d",
        F.explode(
            F.sequence(
                F.to_date("s"),
                F.to_date(F.expr("e - INTERVAL 1 MICROSECOND")),
            )
        ),
    )
    clipped = days.select(
        "event_type",
        F.col("d").alias("day"),
        F.greatest("s", F.col("d").cast("timestamp")).alias("cs"),
        F.least("e", F.date_add("d", 1).cast("timestamp")).alias("ce"),
    )
    w_prev = (
        Window.partitionBy("event_type", "day")
        .orderBy("cs", "ce")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max_e = F.max("ce").over(w_prev)
    flagged = clipped.withColumn(
        "new_island",
        F.when(
            prev_max_e.isNull() | (F.col("cs") > prev_max_e), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    w_run = (
        Window.partitionBy("event_type", "day")
        .orderBy("cs", "ce")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.withColumn("island", F.sum("new_island").over(w_run))
    cov = islands.groupBy("event_type", "day", "island").agg(
        (F.unix_micros(F.max("ce")) - F.unix_micros(F.min("cs"))).alias("cov_us")
    )
    return (
        cov.groupBy("event_type", F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum("cov_us").alias("covered_us"),
            F.count(F.lit(1)).alias("n_islands"),
        )
        .orderBy("event_type", "day")
    )


# --- distribution drift: population stability index ----------------------------

PSI_ORACLE = """
WITH b AS (
  SELECT (SELECT MIN(o_totalprice) FROM orders) AS lo,
         (SELECT MAX(o_totalprice) FROM orders) AS hi
),
binned AS (
  SELECT LEAST(CAST(FLOOR((o_totalprice - b.lo) / ((b.hi - b.lo) / 10.0)) AS INT), 9) AS bin,
         CASE WHEN o_orderdate < DATE '1996-01-01' THEN 1 ELSE 0 END AS is_ref
  FROM orders, b
),
agg AS (
  SELECT bin, SUM(is_ref) AS n_ref, SUM(1 - is_ref) AS n_cur
  FROM binned GROUP BY 1
),
tot AS (SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc FROM agg),
sh AS (
  SELECT bin, n_ref, n_cur,
         (n_ref + 0.5) / (tr + 5.0) AS p,
         (n_cur + 0.5) / (tc + 5.0) AS q
  FROM agg, tot
)
SELECT bin,
       CAST(n_ref AS BIGINT) AS n_ref,
       CAST(n_cur AS BIGINT) AS n_cur,
       ROUND(p, 6) AS ref_share,
       ROUND(q, 6) AS cur_share,
       ROUND((q - p) * LN(q / p), 6) AS psi_term,
       ROUND(SUM((q - p) * LN(q / p)) OVER (), 6) AS psi_total
FROM sh ORDER BY bin
"""


@register("drift_psi_price", PSI_ORACLE)
def drift_psi_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the pre-1996 (reference) and
    post-1996 (current) order-price distributions over 10 fixed-width bins
    — the standard feature-drift monitor for training-data pipelines
    (PSI < 0.1 stable, > 0.25 shifted). Laplace-smoothed shares keep empty
    bins finite; both engines share the formula exactly.

    Scale shape: one bounded collect for the global [min, max] (2 doubles),
    then ONE conditional aggregate over the fact table; everything after is
    arithmetic over 10 rows (the psi_total window runs over 10 rows, not
    data)."""
    o = read_table(spark, sf_dir, "orders")
    lo, hi = o.agg(
        F.min("o_totalprice"), F.max("o_totalprice")
    ).first()
    width = (hi - lo) / 10.0
    bin_col = F.least(
        F.floor((F.col("o_totalprice") - F.lit(lo)) / F.lit(width)).cast("int"),
        F.lit(9),
    )
    is_ref = F.when(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("date"), 1
    ).otherwise(0)
    agg = (
        o.select(bin_col.alias("bin"), is_ref.alias("is_ref"))
        .groupBy("bin")
        .agg(
            F.sum("is_ref").alias("n_ref"),
            F.sum(F.lit(1) - F.col("is_ref")).alias("n_cur"),
        )
    )
    w_all = Window.partitionBy()
    p = (F.col("n_ref") + 0.5) / (F.sum("n_ref").over(w_all) + 5.0)
    q = (F.col("n_cur") + 0.5) / (F.sum("n_cur").over(w_all) + 5.0)
    term = (q - p) * F.log(q / p)
    return (
        agg.select(
            "bin",
            F.col("n_ref").cast("bigint").alias("n_ref"),
            F.col("n_cur").cast("bigint").alias("n_cur"),
            F.round(p, 6).alias("ref_share"),
            F.round(q, 6).alias("cur_share"),
            F.round(term, 6).alias("psi_term"),
            F.round(F.sum(term).over(w_all), 6).alias("psi_total"),
        )
        .orderBy("bin")
    )


# --- distribution drift: Kolmogorov–Smirnov two-sample statistic ---------------

KS_ORACLE = """
WITH g AS (
  SELECT o_totalprice AS v,
         SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS cf,
         SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS co
  FROM orders WHERE o_orderstatus IN ('F', 'O') GROUP BY 1
),
c AS (
  SELECT v,
         SUM(cf) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_f,
         SUM(co) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_o
  FROM g
)
SELECT ROUND(MAX(ABS(
         cum_f / (SELECT CAST(COUNT(*) AS DOUBLE) FROM orders WHERE o_orderstatus = 'F')
       - cum_o / (SELECT CAST(COUNT(*) AS DOUBLE) FROM orders WHERE o_orderstatus = 'O')
       )), 6)                     AS ks_stat,
       CAST(MAX(cum_f) AS BIGINT) AS n_f,
       CAST(MAX(cum_o) AS BIGINT) AS n_o
FROM c
"""


@register("drift_ks_statistic", KS_ORACLE)
def drift_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between the price
    distributions of finished ('F') and open ('O') orders: sup |F₁ − F₂|
    over the pooled empirical CDFs, evaluated at distinct values (ECDF
    right-continuity: ties collapse in the pre-group).

    Scale shape: the cumulative counts that build both ECDFs are GLOBAL
    running sums — computed with the prefix-sum composition
    (bucketed_running_sum over value-range buckets, monotone in the value
    order), so no Exchange SinglePartition touches the distinct-value
    frame; the two sample totals come from one bounded 1-row collect."""
    from airflow_dags_spark.functions.scalable_windows import bucketed_running_sum

    o = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus").isin("F", "O")
    )
    g = o.groupBy(F.col("o_totalprice").alias("v")).agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("cf"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("co"),
    )
    tf, to = g.agg(F.sum("cf"), F.sum("co")).first()
    bucket = F.floor(F.col("v") / F.lit(10000.0))
    c = bucketed_running_sum(g, "cf", ["v"], bucket, "cum_f")
    c = bucketed_running_sum(c, "co", ["v"], bucket, "cum_o")
    d = F.abs(
        F.col("cum_f") / F.lit(float(tf)) - F.col("cum_o") / F.lit(float(to))
    )
    return c.agg(
        F.round(F.max(d), 6).alias("ks_stat"),
        F.max("cum_f").cast("bigint").alias("n_f"),
        F.max("cum_o").cast("bigint").alias("n_o"),
    )


# --- chi-square test of independence -------------------------------------------

CHI2_ORACLE = """
WITH cells AS (
  SELECT o_orderstatus AS s, o_orderpriority AS p,
         CAST(COUNT(*) AS DOUBLE) AS obs
  FROM orders GROUP BY 1, 2
),
rt AS (SELECT s, SUM(obs) AS rt FROM cells GROUP BY 1),
ct AS (SELECT p, SUM(obs) AS ct FROM cells GROUP BY 1)
SELECT ROUND(SUM(obs) * SUM(obs * obs / (rt.rt * ct.ct)) - SUM(obs), 6) AS chi2,
       CAST((COUNT(DISTINCT cells.s) - 1) * (COUNT(DISTINCT cells.p) - 1)
            AS BIGINT)                                                  AS dof,
       ROUND(SQRT((SUM(obs) * SUM(obs * obs / (rt.rt * ct.ct)) - SUM(obs))
             / (SUM(obs) * LEAST(COUNT(DISTINCT cells.s) - 1,
                                 COUNT(DISTINCT cells.p) - 1))), 6)     AS cramers_v,
       CAST(SUM(obs) AS BIGINT)                                         AS n
FROM cells JOIN rt USING (s) JOIN ct USING (p)
"""


@register("stats_chi_square", CHI2_ORACLE)
def stats_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence (order status × priority) with
    Cramér's V effect size, via the expansion χ² = n·Σ obs²/(rt·ct) − n —
    no expected-count column and NO grand-total join: one contingency
    aggregate over the fact table, broadcast joins against the tiny
    row/column margins, one final single-row aggregate."""
    o = read_table(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p")
    ).agg(F.count(F.lit(1)).cast("double").alias("obs"))
    rt = cells.groupBy("s").agg(F.sum("obs").alias("rt"))
    ct = cells.groupBy("p").agg(F.sum("obs").alias("ct"))
    j = cells.join(F.broadcast(rt), "s").join(F.broadcast(ct), "p")
    chi2 = F.sum("obs") * F.sum(
        F.col("obs") * F.col("obs") / (F.col("rt") * F.col("ct"))
    ) - F.sum("obs")
    dof_s = F.count_distinct("s") - 1
    dof_p = F.count_distinct("p") - 1
    return j.agg(
        F.round(chi2, 6).alias("chi2"),
        (dof_s * dof_p).cast("bigint").alias("dof"),
        F.round(
            F.sqrt(chi2 / (F.sum("obs") * F.least(dof_s, dof_p))), 6
        ).alias("cramers_v"),
        F.sum("obs").cast("bigint").alias("n"),
    )


# --- Markov transition matrix over event streams --------------------------------

TRANSITION_ORACLE = """
WITH nxt AS (
  SELECT event_type AS src,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
)
SELECT src, dst,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY src), 6) AS prob
FROM nxt WHERE dst IS NOT NULL
GROUP BY src, dst
ORDER BY src, dst
"""


@register("events_transition_matrix", TRANSITION_ORACLE)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    P(next event type | event type), the sequence model behind next-action
    prediction and anomaly scoring. One lead window partitioned by user_id
    (high-cardinality key — parallel, no hot reducer), one hash aggregate
    to |types|² cells; the per-source normalization window runs over those
    cells, not events."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_src = Window.partitionBy("src")
    return (
        pairs.select(
            "src",
            "dst",
            "cnt",
            F.round(F.col("cnt") / F.sum("cnt").over(w_src), 6).alias("prob"),
        )
        .orderBy("src", "dst")
    )


# --- top session paths (behavioral path analysis) --------------------------------

TOP_PATHS_ORACLE = """
WITH gaps AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts, event_type,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM gaps
),
rn AS (
  SELECT user_id, session_no, event_type, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, session_no
                            ORDER BY ts, event_id)  AS rn,
         COUNT(*) OVER (PARTITION BY user_id, session_no) AS n_ev
  FROM sess
),
paths AS (
  SELECT user_id, session_no,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM rn WHERE rn <= 5 AND n_ev >= 2
  GROUP BY 1, 2
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY 1
ORDER BY n_sessions DESC, path
LIMIT 20
"""


@register("session_top_paths", TOP_PATHS_ORACLE)
def session_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common session paths (first 5 event types of every ≥2-event
    session, 30-minute gap rule) — the product-analytics "top user flows"
    query. Sessionization is the lag→flag→cumsum composition sharing ONE
    (user_id) sort; the path string folds via array_sort(collect_list)
    inside a hash aggregate (no second sort — the comparator orders the ≤5
    structs); the final top-20 is TakeOrdered, never a global sort."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts") - F.lag("ts").over(w)
    new_session = F.when(
        gap.isNull() | (gap > F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.withColumn("session_no", F.sum(new_session).over(run))
    w_s = Window.partitionBy("user_id", "session_no").orderBy("ts", "event_id")
    w_c = Window.partitionBy("user_id", "session_no")
    rn = sess.withColumn("rn", F.row_number().over(w_s)).withColumn(
        "n_ev", F.count(F.lit(1)).over(w_c)
    )
    paths = (
        rn.where((F.col("rn") <= 5) & (F.col("n_ev") >= 2))
        .groupBy("user_id", "session_no")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda x: x.event_type,
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(20)
    )


# --- 2-D Pareto skyline ----------------------------------------------------------

SKYLINE_ORACLE = """
WITH pairs AS (
  SELECT p_retailprice AS price, CAST(p_size AS INT) AS size,
         CAST(COUNT(*) AS BIGINT) AS n_parts
  FROM part GROUP BY 1, 2
)
SELECT price, size, n_parts
FROM pairs a
WHERE NOT EXISTS (
  SELECT 1 FROM pairs b
  WHERE b.price <= a.price AND b.size <= a.size
    AND (b.price < a.price OR b.size < a.size))
ORDER BY price, size
"""


@register("part_skyline_frontier", SKYLINE_ORACLE)
def part_skyline_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto skyline (minimize price AND size): the classic dominance
    query. The oracle is the quadratic NOT EXISTS; the engine form is the
    sort-sweep — collapse to distinct (price, size) pairs, keep each
    price's min size, then a pair survives iff every STRICTLY cheaper pair
    has a larger size, i.e. strict-prefix-min(size) over price order > size.
    That prefix-min uses the bucketed composition
    (scalable_windows.bucketed_prefix_min) so no Exchange SinglePartition
    touches the distinct-price frame; total work is two hash aggregates +
    one parallel window + a |buckets|-row cascade."""
    from airflow_dags_spark.functions.scalable_windows import bucketed_prefix_min

    p = read_table(spark, sf_dir, "part")
    pairs = p.groupBy(
        F.col("p_retailprice").alias("price"),
        F.col("p_size").cast("int").alias("size"),
    ).agg(F.count(F.lit(1)).alias("n_parts"))
    best = pairs.groupBy("price").agg(
        F.min("size").alias("size"),
        F.min_by("n_parts", "size").alias("n_parts"),
    )
    run = bucketed_prefix_min(
        best, "size", ["price"], F.floor(F.col("price") / 100.0), "prior_min"
    )
    return (
        run.where(F.col("prior_min").isNull() | (F.col("prior_min") > F.col("size")))
        .select("price", "size", "n_parts")
        .orderBy("price", "size")
    )

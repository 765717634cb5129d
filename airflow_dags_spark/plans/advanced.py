"""Warehouse + training-pipeline operators beyond the reference's surface:
SCD2 dimension versioning, time-series gap fill, retention cohorts, numeric
histograms, training-mix sampling, and benchmark-contamination detection.

The reference stores mutable dimensions by overwriting in place
(``dags/pull_new_sales_list.py:252-261`` updates rows destructively); SCD2
is the lakehouse answer for keeping the history. The rest are the analytics
/ data-curation queries a 100 TB training pipeline runs daily. All are
DuckDB-oracle-checked; all stay JVM-side (window functions, sequence/
explode, hash joins on derived keys — no Python in any hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_dags_spark.plans.registry import register
from airflow_dags_spark.sources.tables import read_table

# --------------------------------------------------------------------------
# SCD Type-2 dimension versioning
# --------------------------------------------------------------------------

SCD2_ORACLE = """
WITH changes AS (
  SELECT user_id, event_type, ts,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
starts AS (
  SELECT user_id, event_type, ts AS valid_from
  FROM changes
  WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT user_id,
       event_type,
       strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(
         LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from),
         '%Y-%m-%d %H:%M:%S') AS valid_to,
       CAST(LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
            IS NULL AS BOOLEAN) AS is_current
FROM starts
"""


@register("scd2_history", SCD2_ORACLE)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 built from a change stream: collapse
    consecutive identical states per key into [valid_from, valid_to)
    versions, open-ended row marked current.

    Two window passes over the same (user_id, ts) ordering — ONE shuffle,
    both windows reuse the exchange+sort. At 100 TB: state history is
    per-key sequential by construction; skewed keys cost their own row
    count, nothing cross-key."""
    e = read_table(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    starts = (
        e.withColumn("prev_type", F.lag("event_type").over(w_ord))
        .where(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", "event_type", F.col("ts").alias("valid_from"))
    )
    w_ver = Window.partitionBy("user_id").orderBy("valid_from")
    nxt = F.lead("valid_from").over(w_ver)
    return starts.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# --------------------------------------------------------------------------
# Time-series gap fill (spine + zero-fill + LOCF)
# --------------------------------------------------------------------------

GAP_FILL_ORACLE = """
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events
),
spine AS (
  SELECT et.event_type, gs.h
  FROM (SELECT DISTINCT event_type FROM events) et
  CROSS JOIN (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
  ) gs
),
hourly AS (
  -- engine-exact 4-dp mean: exact integer micro-unit sum, then HALF_UP by
  -- integer arithmetic (floor((2a+b)/2b)) — no float accumulation, no
  -- engine-private ROUND-on-double tie behavior anywhere
  SELECT event_type, h, cnt,
         ((num - (num % den)) / den) / 10000.0 AS avg_value
  FROM (
    SELECT event_type, date_trunc('hour', ts) AS h,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(2 * SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT))
                + 100 * COUNT(*) AS BIGINT) AS num,
           CAST(200 * COUNT(*) AS BIGINT) AS den
    FROM events GROUP BY 1, 2
  )
)
SELECT s.event_type,
       strftime(s.h, '%Y-%m-%d %H:%M:%S') AS hour,
       COALESCE(hh.cnt, 0) AS cnt,
       COALESCE(hh.avg_value,
         LAST_VALUE(hh.avg_value IGNORE NULLS) OVER (
           PARTITION BY s.event_type ORDER BY s.h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         AS avg_value_filled
FROM spine s LEFT JOIN hourly hh
  ON hh.event_type = s.event_type AND hh.h = s.h
"""


@register("timeseries_gap_fill", GAP_FILL_ORACLE)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly spine per series with zero-filled counts and
    last-observation-carried-forward averages — the resample step before
    any time-series model sees event data.

    The spine is ``sequence(min_hour, max_hour, 1 hour)`` exploded against
    the distinct series keys: generated, not shuffled (the 1-row global
    bounds aggregate broadcasts). LOCF is one window per series. At 100 TB
    the spine size is |series|·|hours| — independent of event count."""
    e = read_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = (
        e.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    # engine-exact 4-dp mean (see oracle comment): exact bigint micro-unit
    # sum + HALF_UP via floor((2a+b)/2b) integer arithmetic — deterministic
    # under any partitioning, identical in any engine
    micro = (F.col("value").cast("decimal(18,6)") * 1000000).cast("bigint")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.lit(2) * F.sum(micro) + F.lit(100) * F.count(F.lit(1)))
            .cast("bigint")
            .alias("num"),
            (F.lit(200) * F.count(F.lit(1))).cast("bigint").alias("den"),
        )
        .select(
            "event_type",
            "h",
            "cnt",
            (
                ((F.col("num") - F.col("num") % F.col("den")) / F.col("den"))
                / F.lit(10000.0)
            ).alias("avg_value"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
            F.coalesce(
                "avg_value", F.last("avg_value", ignorenulls=True).over(w)
            ).alias("avg_value_filled"),
        )
    )


# --------------------------------------------------------------------------
# Retention cohorts
# --------------------------------------------------------------------------

RETENTION_ORACLE = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(datediff('week', f.cohort_week, date_trunc('week', e.ts))
              AS BIGINT) AS week_offset
  FROM events e JOIN firsts f ON f.user_id = e.user_id
)
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
       week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM activity
GROUP BY 1, 2
"""


@register("retention_cohorts", RETENTION_ORACLE)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users grouped by first-seen week, counted
    per week-offset of later activity — THE product-analytics query.

    Two shuffles total: the per-user first-event aggregate, then the
    (cohort, offset) count over user-distinct activity. The firsts side is
    |users| rows; Spark picks broadcast vs shuffle join by size (AQE)."""
    e = read_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", "ts"), F.col("cohort_week"))
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
    ).agg(F.count(F.lit(1)).alias("n_users"))


# --------------------------------------------------------------------------
# Numeric histogram (fixed-bound width_bucket binning)
# --------------------------------------------------------------------------

# DuckDB has no width_bucket; the CASE below is its exact definition for
# bounds (0, 600000, 24): underflow→0, overflow→25, else floor(v/25000)+1
HISTOGRAM_ORACLE = """
SELECT CASE WHEN o_totalprice < 0.0 THEN 0
            WHEN o_totalprice >= 600000.0 THEN 25
            ELSE CAST(FLOOR((o_totalprice - 0.0) / 25000.0) AS BIGINT) + 1
       END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       ROUND(SUM(o_totalprice), 2) AS sum_price,
       ROUND(MIN(o_totalprice), 2) AS min_price,
       ROUND(MAX(o_totalprice), 2) AS max_price
FROM orders
GROUP BY 1
"""


@register("numeric_histogram", HISTOGRAM_ORACLE)
def numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bound histogram via ``width_bucket`` — profiling binning with
    NO data-dependent pass (literal bounds ⇒ single aggregation, map-side
    partial combine, |buckets| result rows at any scale)."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket(
                "o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(24)
            ).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


# --------------------------------------------------------------------------
# Training-mix sampling (per-source weighted deterministic sampling)
# --------------------------------------------------------------------------

# md5-derived uniform in [0,1): first 8 hex chars / 16^8 — identical in both
# engines, so the sampled row SET is oracle-checkable (vs rand(), which is
# engine-private). Weights: a typical training-mix spec.
_MIX_SQL_U = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0)"

TRAINING_MIX_ORACLE = f"""
SELECT doc_id, source, n_chars
FROM documents
WHERE {_MIX_SQL_U} <
  CASE
    WHEN source IN ('src0', 'src1') THEN 1.0
    WHEN source IN ('src2', 'src3', 'src4') THEN 0.5
    ELSE 0.2
  END
"""


@register("training_mix_sample", TRAINING_MIX_ORACLE)
def training_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted per-source downsampling for a training mix: keep source
    groups at configured rates (1.0 / 0.5 / 0.2) using the md5-uniform so
    membership is deterministic and reproducible across runs AND engines —
    the property a resumable 100 TB curation job needs (re-runs must pick
    the SAME rows). One narrow filter over the scan; no shuffle at all."""
    d = read_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    rate = (
        F.when(F.col("source").isin("src0", "src1"), 1.0)
        .when(F.col("source").isin("src2", "src3", "src4"), 0.5)
        .otherwise(0.2)
    )
    return d.where(u < rate).select("doc_id", "source", "n_chars")


# --------------------------------------------------------------------------
# Benchmark-contamination detection (shared n-gram shingles)
# --------------------------------------------------------------------------

# reuse the exact normalization + 3-gram shingle recipe the dedup oracle uses
from airflow_dags_spark.plans.llm import _SHINGLES  # noqa: E402

CONTAMINATION_ORACLE = f"""
WITH sh AS (SELECT doc_id, {_SHINGLES} AS s FROM documents),
bench AS (
  SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 97 = 0
),
corpus AS (
  SELECT doc_id, unnest(s) AS shingle FROM sh WHERE doc_id % 97 <> 0
)
SELECT c.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shared_shingles
FROM corpus c JOIN bench b ON b.shingle = c.shingle
GROUP BY c.doc_id
"""


@register("benchmark_contamination", CONTAMINATION_ORACLE)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: per training doc, how many of its
    (distinct) 3-gram shingles appear in ANY benchmark/eval doc (stand-in
    benchmark set: ``doc_id % 97 = 0``) — the decontamination signal every
    serious pretraining corpus thresholds on.

    Shape tuned on measurement (sf0.1, local[8]):

    - Benchmark side collapses to DISTINCT shingles BEFORE the join —
      joining per (bench_id, shingle) multiplies every shared shingle by
      the number of benchmark docs containing it: quadratic-shaped on any
      corpus with common phrases.
    - Shingles are ``slice``+``arrays_zip`` STRUCTS, not concat strings
      from a ``transform`` lambda: higher-order functions evaluate an
      interpreted lambda per element outside codegen, while slice/
      arrays_zip/explode stay in WholeStageCodegen — measured 5.4× faster
      end-to-end (1.8 s vs 9.9 s), and the join key is the struct itself
      (hash joins take struct keys; no string materialization at all).
    - ``countDistinct`` per doc absorbs corpus-side repeated shingles,
      matching the oracle's list_distinct semantics.

    The distinct benchmark shingle set is small (eval sets are thousands
    of docs), so at 100 TB it broadcasts and the corpus streams; the only
    exchanges are the bench-distinct and the final per-doc aggregate."""
    from airflow_dags_spark.functions.text import tokens

    d = read_table(spark, sf_dir, "documents")
    base = d.select("doc_id", tokens("text").alias("__toks"))
    n = F.greatest(F.size("__toks") - 2, F.lit(0))
    zipped = F.arrays_zip(
        F.slice("__toks", 1, n),
        F.slice(F.col("__toks"), 2, n),
        F.slice(F.col("__toks"), 3, n),
    )
    sh = base.select("doc_id", F.explode(zipped).alias("shingle"))
    bench = sh.where(F.col("doc_id") % 97 == 0).select("shingle").distinct()
    corpus = sh.where(F.col("doc_id") % 97 != 0)
    return (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_shared_shingles"))
    )


# --------------------------------------------------------------------------
# Repetition detection (duplicate-shingle ratio)
# --------------------------------------------------------------------------

from airflow_dags_spark.plans.llm import _NORM  # noqa: E402

REPETITION_ORACLE = f"""
SELECT doc_id,
       total_shingles,
       distinct_shingles,
       CASE WHEN total_shingles > 0
            THEN 1.0 - CAST(distinct_shingles AS DOUBLE) / total_shingles
            ELSE 0.0 END AS repetition_ratio
FROM (
  SELECT doc_id,
         CAST(GREATEST(len(string_split({_NORM}, ' ')) - 2, 0) AS BIGINT)
           AS total_shingles,
         CAST(len({_SHINGLES}) AS BIGINT) AS distinct_shingles
  FROM documents
)
"""


@register("text_repetition_ratio", REPETITION_ORACLE)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition detection: fraction of duplicated 3-gram shingles per doc
    (1 - distinct/total) — the standard boilerplate/degenerate-text signal a
    pretraining quality gate thresholds on.

    Pure array expressions over one scan — zero shuffles, zero Python; the
    ratio is raw IEEE division of two exact integers so it hashes identically
    in any engine (no ROUND tie behavior in play)."""
    from airflow_dags_spark.functions.text import shingles_from_tokens, tokens

    d = read_table(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id", tokens("text").alias("__toks")
    ).select(
        "doc_id",
        F.greatest(F.size("__toks") - 2, F.lit(0))
        .cast("bigint")
        .alias("total_shingles"),
        F.size(shingles_from_tokens(F.col("__toks"), 3))
        .cast("bigint")
        .alias("distinct_shingles"),
    )
    return staged.select(
        "doc_id",
        "total_shingles",
        "distinct_shingles",
        F.when(
            F.col("total_shingles") > 0,
            F.lit(1.0)
            - F.col("distinct_shingles").cast("double")
            / F.col("total_shingles"),
        )
        .otherwise(F.lit(0.0))
        .alias("repetition_ratio"),
    )


# --------------------------------------------------------------------------
# Unpivot / melt (inverse of pivot_status_by_priority)
# --------------------------------------------------------------------------

UNPIVOT_ORACLE = """
WITH agg AS (
  SELECT l_returnflag,
         CAST(SUM(CAST(l_quantity      AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         CAST(SUM(CAST(l_discount      AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty'   AS metric, sum_qty   AS value FROM agg
UNION ALL
SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM agg
UNION ALL
SELECT l_returnflag, 'sum_disc'  AS metric, sum_disc  AS value FROM agg
"""


@register("unpivot_metrics", UNPIVOT_ORACLE)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape via ``DataFrame.unpivot`` (SQL ``UNPIVOT``/melt) —
    the inverse of the pivot operator, the shape metric stores and plotting
    layers want. One aggregation shuffle; the unpivot itself is a zero-
    shuffle projection (each row fans out to |metrics| rows in place).
    Decimal sums → exact values, cast to double identically in any engine."""
    li = read_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
        F.sum(F.col("l_discount").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_disc"),
    )
    return agg.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "sum_disc"], "metric", "value"
    )


# --------------------------------------------------------------------------
# Deterministic train/val/test split
# --------------------------------------------------------------------------

SPLIT_ORACLE = f"""
SELECT doc_id, source,
       CASE WHEN u < 0.8 THEN 'train'
            WHEN u < 0.9 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id, source, {_MIX_SQL_U} AS u FROM documents)
"""


@register("split_train_val_test", SPLIT_ORACLE)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment on the md5-uniform:
    membership is a pure function of the key, so the split survives re-runs,
    engine changes, and incremental corpus growth (a doc never migrates
    between splits when new docs arrive — the property that keeps eval sets
    uncontaminated across corpus versions). One narrow projection, no
    shuffle, no state."""
    d = read_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    return d.select(
        "doc_id",
        "source",
        F.when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test").alias(
            "split"
        ),
    )


# --------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE)
# --------------------------------------------------------------------------

RECURSIVE_SPINE_ORACLE = """
WITH RECURSIVE months(m) AS (
  SELECT DATE '1992-01-01'
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
  WHERE m < DATE '1998-12-01'
)
SELECT strftime(m, '%Y-%m') AS month,
       CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
GROUP BY 1
"""


@register("recursive_cte_spine", RECURSIVE_SPINE_ORACLE)
def recursive_cte_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ``WITH RECURSIVE`` through the SQL surface: a recursive month
    spine left-joined to orders for zero-filled monthly counts — the SQL
    front end's answer to the generated-sequence spine in
    ``timeseries_gap_fill``. Recursion depth is the fixed 84-month range
    (driver-bounded, one row per step), so the iterative plan is O(depth)
    tiny local steps followed by ONE join against the fact table."""
    from airflow_dags_spark.sources.tables import register_views

    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT DATE '1992-01-01'
          UNION ALL
          SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
          WHERE m < DATE '1998-12-01'
        )
        SELECT date_format(m, 'yyyy-MM') AS month,
               COUNT(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders
          ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
        GROUP BY 1
        """
    )


# --------------------------------------------------------------------------
# IQR outlier gate (quality filtering on numeric columns)
# --------------------------------------------------------------------------

IQR_ORACLE = """
WITH b AS (
  SELECT quantile_cont(o_totalprice, 0.25) AS p25,
         quantile_cont(o_totalprice, 0.75) AS p75
  FROM orders
)
SELECT o_orderkey, o_totalprice,
       CAST(o_totalprice > p75 + 1.5 * (p75 - p25) AS BOOLEAN) AS high
FROM orders, b
WHERE o_totalprice < p25 - 1.5 * (p75 - p25)
   OR o_totalprice > p75 + 1.5 * (p75 - p25)
"""


@register("outlier_iqr_gate", IQR_ORACLE)
def outlier_iqr_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier gate: rows outside [p25 − 1.5·IQR, p75 + 1.5·IQR]
    — the numeric-column twin of the text quality gates. EXACT linear-
    interpolated percentiles (``percentile`` ≡ DuckDB ``quantile_cont``:
    identical interpolation arithmetic, so the fence doubles are
    bit-identical and row membership oracle-stable). The 1-row bounds
    aggregate broadcasts; the gate is then a streamed filter — at 100 TB
    swap the exact percentile for the KLL sketch (plans/sketches.py) and
    the shape is unchanged."""
    o = read_table(spark, sf_dir, "orders")
    b = o.agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
        F.expr("percentile(o_totalprice, 0.75)").alias("p75"),
    )
    iqr = F.col("p75") - F.col("p25")
    return (
        o.crossJoin(F.broadcast(b))
        .where(
            (F.col("o_totalprice") < F.col("p25") - 1.5 * iqr)
            | (F.col("o_totalprice") > F.col("p75") + 1.5 * iqr)
        )
        .select(
            "o_orderkey",
            "o_totalprice",
            (F.col("o_totalprice") > F.col("p75") + 1.5 * iqr).alias("high"),
        )
    )


# --------------------------------------------------------------------------
# Chunk-level exact dedup (composed: chunk_text -> hash-groupBy)
# --------------------------------------------------------------------------

from airflow_dags_spark.plans.llm import CHUNK_ORACLE as _CHUNK_SQL  # noqa: E402

DEDUP_CHUNKS_ORACLE = f"""
WITH chunks AS ({_CHUNK_SQL})
SELECT md5(chunk) AS chunk_fp,
       MIN(doc_id) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM chunks
WHERE n_tokens > 0
GROUP BY 1
"""


@register("dedup_chunks", DEDUP_CHUNKS_ORACLE)
def dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup: slide 64-token windows over every doc
    (functions/text.py:chunk_text), fingerprint each chunk, keep the
    min-doc survivor per fingerprint — the boilerplate-paragraph removal
    pass that document-level dedup misses (shared headers/footers inside
    otherwise-unique docs).

    Composed entirely from existing operators: the chunker's zero-shuffle
    codegen map stage feeds the same one-shuffle hash-groupBy as
    ``dedup_exact``; the shuffle carries one row per DISTINCT chunk hash
    (map-side partial agg), not per chunk."""
    from airflow_dags_spark.functions.text import chunk_text

    d = read_table(spark, sf_dir, "documents")
    chunks = chunk_text(d, "text", "doc_id", chunk_size=64, overlap=16)
    return (
        chunks.where(F.col("n_tokens") > 0)
        .groupBy(F.md5("chunk").alias("chunk_fp"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# --------------------------------------------------------------------------
# PageRank (iterative graph operator, operators/graph.py)
# --------------------------------------------------------------------------

@register("graph_pagerank_purchases", None)  # float iteration → rows-only
def graph_pagerank_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer→supplier purchase graph (edges: distinct
    (o_custkey, l_suppkey) pairs via orders⋈lineitem; supplier node ids
    offset to keep the spaces disjoint) — link-structure importance for
    weighting sources, the graph twin of dedup_clusters. Exactness is
    pytest-verified against a dense numpy power iteration at 1e-8
    (tests/test_graph.py); driver check is rows-only (float iteration
    order)."""
    from airflow_dags_spark.operators.graph import pagerank

    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    sup_offset = F.lit(10_000_000)
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + sup_offset).alias("dst"),
        )
        .distinct()
    )
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("node")
    )
    s = read_table(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") + sup_offset).alias("node")
    )
    ranks = pagerank(c.unionByName(s), edges, max_iter=10, tol=1e-9)
    return ranks.select("node", F.round("rank", 9).alias("rank"))


# --------------------------------------------------------------------------
# Weighted sampling (A-Res reservoir) + quantile normalization
# --------------------------------------------------------------------------

WEIGHTED_SAMPLE_ORACLE = f"""
SELECT doc_id, source, n_chars
FROM (SELECT doc_id, source, n_chars,
             POWER({_MIX_SQL_U}, 1.0 / GREATEST(n_chars, 1)) AS p
      FROM documents)
ORDER BY p DESC, doc_id
LIMIT 100
"""


@register("weighted_sample_ares", WEIGHTED_SAMPLE_ORACLE)
def weighted_sample_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-Res):
    key = u^(1/w), take the top-k — here weighting docs by length, the
    upsample-by-quality primitive of training-mix construction. The
    md5-uniform makes the sample deterministic AND cross-engine identical
    (vs rand()-based reservoirs). Top-k compiles to TakeOrderedAndProject:
    per-partition heaps, no global sort — O(k·partitions) at any scale."""
    d = read_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    p = F.pow(u, 1.0 / F.greatest(F.col("n_chars"), F.lit(1)))
    return (
        d.select("doc_id", "source", "n_chars", p.alias("__p"))
        .orderBy(F.desc("__p"), F.asc("doc_id"))
        .limit(100)
        .drop("__p")
    )


QUANTILE_NORM_ORACLE = """
SELECT doc_id, source,
       ROUND(PERCENT_RANK() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id), 9) + 0.0
         AS length_quantile
FROM documents
"""


@register("quantile_normalize_lengths", QUANTILE_NORM_ORACLE)
def quantile_normalize_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization: map each doc's length to its within-source
    percent rank — the distribution-free feature scaling that makes length
    gates comparable across sources with wildly different length profiles.
    percent_rank is exact integer-rank arithmetic ((rank-1)/(n-1)): hash-
    identical across engines, unlike any mean/std-based scaler. One window
    shuffle per source partition."""
    d = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return d.select(
        "doc_id",
        "source",
        (F.round(F.percent_rank().over(w), 9) + F.lit(0.0)).alias(
            "length_quantile"
        ),
    )


# --------------------------------------------------------------------------
# Join strategy hints (physical control surface)
# --------------------------------------------------------------------------

JOIN_HINT_ORACLE = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS sum_price
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""


@register("join_hint_shuffle_merge", JOIN_HINT_ORACLE)
def join_hint_shuffle_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact join with an explicit MERGE (sort-merge) hint: the
    physical-control surface for when the optimizer's size estimates are
    wrong (a common 100 TB failure: a 'small' side that broadcasts at
    planning time but explodes at runtime). Same result set as the
    unhinted join — the hint is purely physical, which is exactly what the
    oracle hash-match proves."""
    o = read_table(spark, sf_dir, "orders").hint("merge")
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                2,
            ).alias("sum_price"),
        )
    )


# --------------------------------------------------------------------------
# Fuzzy (edit-distance) join with lossless length-bucket pruning
# --------------------------------------------------------------------------

FUZZY_JOIN_ORACLE = """
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


@register("fuzzy_join_part_names", FUZZY_JOIN_ORACLE)
def fuzzy_join_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance self-join of part names within a brand (entity-
    resolution blocking): pairs within 2 edits. The Spark side prunes with
    the lossless length-bucket candidate join (operators/fuzzy.py); the
    oracle is DuckDB's BRUTE-FORCE all-pairs form — hash-identical results
    prove the pruning drops nothing, which is the entire correctness
    burden of a candidate-filtered join."""
    from airflow_dags_spark.operators.fuzzy import fuzzy_self_join

    p = read_table(spark, sf_dir, "part")
    return fuzzy_self_join(
        p, "p_name", "p_partkey", max_dist=2, scope_cols=["p_brand"]
    )


# --------------------------------------------------------------------------
# Null-safe equi-join (<=> / IS NOT DISTINCT FROM)
# --------------------------------------------------------------------------

NULL_SAFE_JOIN_ORACLE = """
WITH e AS (
  SELECT event_id,
         CASE WHEN event_type = 'click' THEN NULL ELSE event_type END AS et
  FROM events
),
d AS (
  SELECT DISTINCT CASE WHEN event_type = 'click' THEN NULL ELSE event_type END
           AS et,
         CASE WHEN event_type = 'click' THEN 'unattributed'
              ELSE event_type END AS label
  FROM events
)
SELECT e.event_id, d.label
FROM e JOIN d ON e.et IS NOT DISTINCT FROM d.et
"""


@register("join_null_safe", NULL_SAFE_JOIN_ORACLE)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` ≡ IS NOT DISTINCT FROM): NULL keys
    match NULL keys — the join semantics dimension tables with an explicit
    'unknown' member need (a plain equi-join silently drops every NULL-key
    row). Still a hash join: the null-safe operator is a join KEY, not a
    residual filter."""
    e = read_table(spark, sf_dir, "events")
    et = F.when(F.col("event_type") == "click", F.lit(None)).otherwise(
        F.col("event_type")
    )
    ev = e.select("event_id", et.alias("et"))
    dim = (
        e.select(
            et.alias("et"),
            F.when(F.col("event_type") == "click", "unattributed")
            .otherwise(F.col("event_type"))
            .alias("label"),
        )
        .distinct()
    )
    return ev.join(dim, ev.et.eqNullSafe(dim.et)).select("event_id", "label")


# --------------------------------------------------------------------------
# RANGE-frame window (trailing interval aggregate)
# --------------------------------------------------------------------------

RANGE_FRAME_ORACLE = """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate
         RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW
       ) AS DOUBLE), 2) AS trailing_90d_spend
FROM orders
"""


@register("window_range_frame_trailing", RANGE_FRAME_ORACLE)
def window_range_frame_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 90-day spend per customer via a RANGE (value-based) window
    frame — unlike ROWS frames, the frame width follows EVENT TIME, so
    sparse and dense customers get the same semantic window. One shuffle on
    the partition key; decimal sums keep the trailing aggregate engine-
    exact."""
    o = read_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_rf")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               date_format(o_orderdate, 'yyyy-MM-dd') AS order_date,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW
               ) AS DOUBLE), 2) AS trailing_90d_spend
        FROM __orders_rf
        """
    )


# --------------------------------------------------------------------------
# Cumulative distinct count over a window (Spark-gap rewrite)
# --------------------------------------------------------------------------

CUM_DISTINCT_ORACLE = """
SELECT DISTINCT event_type,
       strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       COUNT(DISTINCT user_id) OVER (
         PARTITION BY event_type ORDER BY CAST(ts AS DATE)
       ) AS cum_distinct_users
FROM events
"""


@register("window_cumulative_distinct", CUM_DISTINCT_ORACLE)
def window_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per series over time — ``COUNT(DISTINCT)
    OVER`` exists in the oracle's SQL dialect but NOT in Spark's window
    functions, so the engine rewrites it: each user's FIRST day per series
    contributes 1, and the running count is a plain cumulative sum of new-
    user counts. Two hash shuffles total ((series,user) first-day agg +
    (series,day) count), then a tiny per-series window — no distinct state
    carried per row, which is also WHY this form scales where a literal
    windowed-distinct (per-row growing hash set) cannot."""
    e = read_table(spark, sf_dir, "events")
    firsts = (
        e.select("event_type", F.to_date("ts").alias("day"), "user_id")
        .groupBy("event_type", "user_id")
        .agg(F.min("day").alias("first_day"))
    )
    new_per_day = firsts.groupBy(
        "event_type", F.col("first_day").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_new"))
    # the output keeps every (series, day) PRESENT IN THE DATA (oracle rows
    # come from event rows), so join the day universe back in
    days = e.select("event_type", F.to_date("ts").alias("day")).distinct()
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        days.join(new_per_day, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.sum(F.coalesce("n_new", F.lit(0))).over(w).alias(
                "cum_distinct_users"
            ),
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "cum_distinct_users",
        )
    )


# --------------------------------------------------------------------------
# Share-of-total (windowed ratio-to-report)
# --------------------------------------------------------------------------

SHARE_ORACLE = """
WITH n AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n   ON n.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = n.n_regionkey
  GROUP BY 1, 2
)
SELECT region, nation,
       ROUND(revenue, 2) AS revenue,
       revenue / SUM(revenue) OVER (PARTITION BY region) AS region_share,
       revenue / SUM(revenue) OVER () AS global_share
FROM n
"""


@register("share_of_total", SHARE_ORACLE)
def share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's revenue as a share of its region and
    of the world — THE BI denominator pattern (unbounded window sums over a
    pre-aggregated frame). Heavy lifting is the one grouped aggregate; the
    window sums run over |nations| rows. Decimal sums make the shares raw
    IEEE divisions of exact values — no rounding ties."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue")
        )
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return rev.select(
        "region",
        "nation",
        F.round("revenue", 2).alias("revenue"),
        (F.col("revenue") / F.sum("revenue").over(w_region)).alias(
            "region_share"
        ),
        (F.col("revenue") / F.sum("revenue").over(w_all)).alias("global_share"),
    )


# --------------------------------------------------------------------------
# Referential-integrity sweep (data-quality anti-joins)
# --------------------------------------------------------------------------

DQ_REFS_ORACLE = """
SELECT 'lineitem.l_orderkey->orders' AS fk,
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
         AS n_orphans
UNION ALL
SELECT 'orders.o_custkey->customer',
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
UNION ALL
SELECT 'customer.c_nationkey->nation',
       CAST((SELECT COUNT(*) FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM nation n
                               WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
UNION ALL
SELECT 'lineitem.l_suppkey->supplier',
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM supplier s
                               WHERE s.s_suppkey = l.l_suppkey)) AS BIGINT)
"""


@register("dq_referential_integrity", DQ_REFS_ORACLE)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity sweep: orphan counts for every FK edge in the
    schema — the lakehouse replacement for the FOREIGN KEY constraints the
    reference's Postgres enforced (SURVEY §1.5: uniqueness/integrity move
    from constraints to checks). Each edge is one LeftAnti hash join whose
    small side broadcasts; counts are exact and the expected value is 0,
    so the query doubles as a CI data gate."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    s = read_table(spark, sf_dir, "supplier")

    # ONE lazy plan (union of 1-row aggregates), no driver-side counting —
    # all four anti-joins execute in a single action
    def orphans(fk_name, child, child_key, parent, parent_key):
        return (
            child.join(
                parent, child[child_key] == parent[parent_key], "left_anti"
            )
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(fk_name).alias("fk"), "n_orphans")
        )

    checks = [
        orphans("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
        orphans("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"),
        orphans("customer.c_nationkey->nation", c, "c_nationkey", n, "n_nationkey"),
        orphans("lineitem.l_suppkey->supplier", li, "l_suppkey", s, "s_suppkey"),
    ]
    out = checks[0]
    for chk in checks[1:]:
        out = out.unionByName(chk)
    return out


# --------------------------------------------------------------------------
# Trailing-window distinct count — the sliding-window form of the Spark gap
# --------------------------------------------------------------------------

TRAILING_DISTINCT_ORACLE = """
WITH pairs AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
days AS (SELECT DISTINCT d FROM pairs)
SELECT strftime(days.d, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT p.user_id) AS BIGINT) AS trailing_users
FROM days JOIN pairs p ON p.d BETWEEN days.d - 6 AND days.d
GROUP BY 1
"""


@register("window_trailing_distinct_users", TRAILING_DISTINCT_ORACLE)
def window_trailing_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing distinct users per day (the DAU/WAU family). The
    oracle writes it as a range join + COUNT(DISTINCT); Spark has neither
    windowed distinct nor efficient theta joins, so the engine rewrites:
    each DISTINCT (user, active-day) pair covers the 7 target days it
    contributes to (``explode(sequence(...))`` — a bounded 7× fan-out of
    the deduped pairs, NOT of raw events), then one distinct-count per
    target day. Two key-partitioned exchanges on ~|pairs| rows; a range
    self-join would instead touch |days|×|pairs| with no hash key."""
    e = read_table(spark, sf_dir, "events")
    pairs = e.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    coverage = pairs.select(
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("day"),
        "user_id",
    )
    days = pairs.select(F.col("d").alias("day")).distinct()
    return (
        coverage.join(days, "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("trailing_users"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"), "trailing_users"
        )
    )


PER_SOURCE_SAMPLE_ORACLE = f"""
SELECT source, doc_id, n_chars FROM (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY POWER({_MIX_SQL_U}, 1.0 / GREATEST(n_chars, 1)) DESC,
                    doc_id
         ) AS rn
  FROM documents)
WHERE rn <= 5
"""


@register("weighted_sample_per_source", PER_SOURCE_SAMPLE_ORACLE)
def weighted_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum A-Res: the k heaviest-keyed docs of EVERY source (the
    per-source curation quota, vs weighted_sample_ares's global top-k).
    One exchange on source + per-group sort of only that group's rows
    (window row_number) — never a global sort; the md5-uniform key keeps
    the sample deterministic and engine-identical."""
    from pyspark.sql import Window

    d = read_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    p = F.pow(u, 1.0 / F.greatest(F.col("n_chars"), F.lit(1)))
    w = Window.partitionBy("source").orderBy(F.desc(p), F.asc("doc_id"))
    return (
        d.select("source", "doc_id", "n_chars")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 5)
        .drop("__rn")
    )


NULL_SKEW_ORACLE = """
WITH o AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_custkey END AS cust,
         ROUND(o_totalprice, 2) AS price
  FROM orders)
SELECT o.o_orderkey, o.cust, o.price, c.c_name
FROM o LEFT JOIN customer c ON o.cust = c.c_custkey
"""


@register("join_null_skew_split", NULL_SKEW_ORACLE)
def join_null_skew_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT JOIN over a null-heavy FK through the null-split rewrite
    (functions/skew.py:left_join_null_split): null keys — which can never
    match, yet all hash to ONE reducer in a plain plan — bypass the
    exchange entirely via a union branch; only joinable rows shuffle. The
    oracle is the plain LEFT JOIN, proving the rewrite changes the
    physical shape only. Here a third of orders carry a NULL customer (the
    unmatched-FK rate real reference data has in postcode joins)."""
    from airflow_dags_spark.functions.skew import left_join_null_split

    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, None)
        .otherwise(F.col("o_custkey"))
        .alias("cust"),
        F.round("o_totalprice", 2).alias("price"),
    )
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust"), "c_name"
    )
    return left_join_null_split(o, c, "cust")


# --------------------------------------------------------------------------
# Market-basket co-occurrence + year-over-year growth
# --------------------------------------------------------------------------

BASKET_ORACLE = """
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       CAST(count(*) AS BIGINT) AS n_orders
FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT 25
"""


@register("basket_part_pairs", BASKET_ORACLE)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket first pass: the 25 most co-purchased part pairs.
    Pair fan-out is a SELF-join keyed on the order — bounded by the
    per-order line count (≤7 lines in this schema ⇒ ≤21 pairs/order), so
    cost is O(orders · pairs-per-order), never all-parts². One orderkey
    exchange (reused by both sides), map-side partial count, top-k via
    TakeOrderedAndProject. The A-priori candidate-generation shape for
    frequent itemsets at 100 TB."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, ["l_orderkey"])
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(25)
    )


YOY_ORACLE = """
WITH yearly AS (
  SELECT EXTRACT(year FROM o_orderdate) AS yr,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
           AS revenue
  FROM orders GROUP BY 1)
SELECT yr, CAST(revenue AS VARCHAR) AS revenue,
       ROUND(CASE WHEN LAG(revenue) OVER (ORDER BY yr) IS NOT NULL
             THEN (revenue - LAG(revenue) OVER (ORDER BY yr))
                  / LAG(revenue) OVER (ORDER BY yr) END, 6) + 0.0
         AS yoy_growth
FROM yearly
"""


@register("yoy_revenue_growth", YOY_ORACLE)
def yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth: yearly decimal-exact sums, then a
    lag window over the |years| aggregate rows — the single-partition
    window touches only the tiny pre-aggregated frame (fine at any scale:
    |years| rows), never the fact table. Growth is a raw IEEE ratio of
    exact decimal sums, rounded identically in both engines."""
    o = read_table(spark, sf_dir, "orders")
    yearly = o.groupBy(F.year("o_orderdate").alias("yr")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(28,2)")
        .alias("revenue")
    )
    w = Window.orderBy("yr")
    prev = F.lag("revenue").over(w)
    growth = F.when(
        prev.isNotNull(), (F.col("revenue") - prev) / prev
    )
    return yearly.select(
        "yr",
        F.col("revenue").cast("string").alias("revenue"),
        (F.round(growth.cast("double"), 6) + F.lit(0.0)).alias("yoy_growth"),
    )

"""Scalar/row operator queries — P4–P18, A1–A4, L1–L2 (SURVEY.md §2.3, §2.5).

Each reference cleaning/extraction operator, exercised on the driver tables'
string/JSON/date columns so every one has a DuckDB oracle. All are narrow
(no shuffle) except the window-based dedup variants — exactly how they
behave at 100 TB: a single codegen'd scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_dags_spark.functions.cleaning import (
    conditional_concat_url,
    null_or_stale,
    prefix_filter,
    regex_capture,
    safe_bigint,
    safe_date_yyyymmdd,
    safe_numeric,
)
from airflow_dags_spark.functions.json_extract import balanced_json_udf, json_path
from airflow_dags_spark.functions.sampling import deterministic_sample
from airflow_dags_spark.plans.registry import register
from airflow_dags_spark.sources.tables import read_table


P4_ORACLE = """
SELECT event_id, REGEXP_REPLACE(props, '[{}]', '', 'g') AS stripped
FROM events
"""


@register("p4_regexp_strip", P4_ORACLE)
def p4_regexp_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — char-class strip (ref: brace removal from transaction ids,
    dags/monthly_price_paid_data.py:121)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.regexp_replace("props", r"[{}]", "").alias("stripped")
    )


P5_ORACLE = """
SELECT o_orderkey AS orderkey,
       CAST(strftime(o_orderdate, '%Y%m%d') AS BIGINT) AS orderdate_num
FROM orders
"""


@register("p5_safe_date_yyyymmdd", P5_ORACLE)
def p5_safe_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — coercing date → yyyymmdd bigint (dags/monthly_price_paid_data.py:122)."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        safe_date_yyyymmdd(F.col("o_orderdate")).alias("orderdate_num"),
    )


P6_ORACLE = """
SELECT event_id,
       TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_value
FROM events
"""


@register("p6_try_cast_numeric", P6_ORACLE)
def p6_try_cast_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — errors='coerce' numeric cast (dags/monthly_price_paid_data.py:123)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", safe_numeric(json_path("props", "$.k")).alias("k_value")
    )


P7_ORACLE = """
SELECT l_orderkey AS orderkey, l_linenumber AS linenumber
FROM lineitem
WHERE l_orderkey IS NOT NULL AND l_quantity IS NOT NULL
  AND l_extendedprice IS NOT NULL AND l_shipdate IS NOT NULL
"""


@register("p7_not_null_filter", P7_ORACLE)
def p7_not_null_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 — dropna(subset=...) as pushed-down conjunction
    (dags/monthly_price_paid_data.py:126)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.na.drop(
        subset=["l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate"]
    ).select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
    )


P8_ORACLE = """
SELECT p_partkey AS partkey, p_name AS name
FROM part
WHERE p_name LIKE 'small%'
"""


@register("p8_prefix_filter", P8_ORACLE)
def p8_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 — startswith predicate, null-safe (dags/monthly_price_paid_data.py:129).
    Pushed to the parquet scan as StringStartsWith."""
    p = read_table(spark, sf_dir, "part")
    return p.where(prefix_filter("p_name", "small")).select(
        F.col("p_partkey").alias("partkey"), F.col("p_name").alias("name")
    )


P9_ORACLE = """
SELECT o_orderkey AS orderkey
FROM orders
WHERE o_orderdate IS NULL OR o_orderdate <= TIMESTAMP '1997-06-01 00:00:00'
"""


@register("p9_null_or_stale", P9_ORACLE)
def p9_null_or_stale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 — stale-work selection predicate (dags/pull_new_sales_list.py:97)."""
    o = read_table(spark, sf_dir, "orders")
    return o.where(
        null_or_stale(F.col("o_orderdate"), "1997-06-01 00:00:00")
    ).select(F.col("o_orderkey").alias("orderkey"))


P11_ORACLE = """
SELECT c_custkey AS custkey,
       TRY_CAST(regexp_extract(c_name, 'Customer#(\\d+)', 1) AS BIGINT) AS name_num
FROM customer
"""


@register("p11_regexp_extract", P11_ORACLE)
def p11_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 — capture-group extraction (dags/pull_new_sales_list.py:132-134)."""
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        safe_bigint(regex_capture("c_name", r"Customer#(\d+)", 1)).alias("name_num"),
    )


# The driver events.props are flat JSON ({"k": N}) so a non-greedy regex is a
# valid oracle for the balanced-brace extractor on THIS data; nested/
# unbalanced/escaped cases are covered by hypothesis round-trips
# (tests/test_properties.py).
P12_ORACLE = """
SELECT event_id,
       regexp_extract('<script>window.jsonModel = ' || props || ';</script>',
                      '\\{[^{}]*\\}', 0) AS model_json
FROM events
"""


@register("p12_balanced_brace_extract", P12_ORACLE)
def p12_balanced_brace_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 — the one custom scalar function: balanced-brace JSON extraction
    from script text (dags/pull_new_sales_list.py:43-63), Arrow-batched."""
    ev = read_table(spark, sf_dir, "events")
    script = F.concat(
        F.lit("<script>window.jsonModel = "), F.col("props"), F.lit(";</script>")
    )
    return ev.select("event_id", balanced_json_udf(script).alias("model_json"))


P13_ORACLE = """
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str
FROM events
"""


@register("p13_json_path", P13_ORACLE)
def p13_json_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13 — JSON path access (dags/pull_new_sales_list.py:152-155)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.select("event_id", json_path("props", "$.k").alias("k_str"))


P10_ORACLE = """
SELECT event_id, event_type
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 = 0
"""


@register("p10_nested_json_equality", P10_ORACLE)
def p10_nested_json_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 — equality predicate on a nested JSON field (the reference filters
    typeahead matches on m['type'] == 'OUTCODE', dags/rightmove_outcodes.py:103);
    single from_json parse, predicate on the struct field."""
    ev = read_table(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "__p", F.from_json("props", "struct<k:bigint>")
    )
    return parsed.where(F.col("__p.k") % 10 == 0).select("event_id", "event_type")


P15_ORACLE = """
SELECT event_id,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
       TRY_CAST(event_type AS BIGINT) AS not_a_number
FROM events
"""


@register("p15_int_cast_fallback", P15_ORACLE)
def p15_int_cast_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P15 — int parse with null fallback (dags/rightmove_outcodes.py:108-113):
    numeric JSON string parses, non-numeric event_type nulls."""
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        safe_bigint(json_path("props", "$.k")).alias("k_int"),
        safe_bigint("event_type").alias("not_a_number"),
    )


P14_ORACLE = """
SELECT doc_id,
       CASE WHEN source LIKE 'http%' THEN source
            ELSE 'https://example.org/' || source END AS url
FROM documents
"""


@register("p14_conditional_concat", P14_ORACLE)
def p14_conditional_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14 — relative→absolute URL normalization (dags/pull_new_sales_list.py:131)."""
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        conditional_concat_url("source", "https://example.org/").alias("url"),
    )


P16_ORACLE = """
SELECT o_orderkey AS orderkey,
       CAST(strftime(o_orderdate - INTERVAL 1 DAY, '%Y%m%d') AS INT) AS yesterday_num
FROM orders
"""


@register("p16_date_arith", P16_ORACLE)
def p16_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P16 — date arithmetic + yyyymmdd formatting (dags/pull_new_sales_list.py:92,226)."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.date_format(F.date_sub("o_orderdate", 1), "yyyyMMdd")
        .cast("int")
        .alias("yesterday_num"),
    )


P17_ORACLE = """
SELECT doc_id, 20260813 AS created_date, 20260813 AS updated_date
FROM documents
"""


@register("p17_audit_columns", P17_ORACLE)
def p17_audit_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P17 — constant audit-column injection (dags/pull_new_sales_list.py:244-249).
    Pinned date instead of current_date so the oracle is reproducible."""
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lit(20260813).alias("created_date"),
        F.lit(20260813).alias("updated_date"),
    )


P18_ORACLE = """
SELECT c.c_custkey AS custkey,
       CASE WHEN COUNT(o.o_orderkey) > 0 THEN COUNT(o.o_orderkey) ELSE -1 END
         AS n_orders_or_sentinel
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
"""


@register("p18_sentinel_mark", P18_ORACLE)
def p18_sentinel_mark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P18 — no-match sentinel (-1) so unresolved keys aren't retried
    (dags/rightmove_outcodes.py:13,117-120)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    counted = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n"))
    )
    return counted.select(
        F.col("c_custkey").alias("custkey"),
        F.when(F.col("n") > 0, F.col("n")).otherwise(F.lit(-1)).alias(
            "n_orders_or_sentinel"
        ),
    )


A1_ORACLE = """
SELECT user_id, event_id AS first_event_id, event_type AS first_event_type
FROM (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
) t
WHERE rn = 1
"""


@register("a1_dedup_first_wins", A1_ORACLE)
def a1_dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — deterministic first-wins dedup by key (ref: in-memory seen-set,
    dags/pull_new_sales_list.py:183-193). dropDuplicates has a
    nondeterministic survivor; the engine's canonical form is
    row_number()=1 over an explicit order."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("first_event_id"),
            F.col("event_type").alias("first_event_type"),
        )
    )


A2_ORACLE = """
SELECT user_id, event_id AS first_purchase_id,
       CAST(strftime(ts, '%Y-%m-%d %H:%M:%S') AS VARCHAR) AS first_purchase_ts
FROM (
  SELECT user_id, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
  WHERE event_type = 'purchase'
) t
WHERE rn = 1
"""


@register("a2_first_match_per_group", A2_ORACLE)
def a2_first_match_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — first qualifying element per group (ref: first OUTCODE match,
    dags/rightmove_outcodes.py:103)."""
    ev = read_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("first_purchase_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_purchase_ts"),
        )
    )


A3_ORACLE = "SELECT COUNT(*) AS n_rows FROM lineitem"


@register("a3_count", A3_ORACLE)
def a3_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — cardinality (ref: len(df) logging, dags/monthly_price_paid_data.py:130)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.agg(F.count(F.lit(1)).alias("n_rows"))


L1_ORACLE = """
SELECT custkey FROM (
  SELECT c_custkey AS custkey, md5(CAST(c_custkey AS VARCHAR)) AS h
  FROM customer
  ORDER BY h
  LIMIT 20
) t
"""


@register("l1_deterministic_sample", L1_ORACLE)
def l1_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1 — deterministic work-batch sampling replacing ORDER BY RANDOM()
    (dags/pull_new_sales_list.py:93-102; SURVEY §4.3#4). Executes as
    per-partition top-k, no global sort."""
    c = read_table(spark, sf_dir, "customer")
    return deterministic_sample(c, "c_custkey", 20).select(
        F.col("c_custkey").alias("custkey")
    )


L2_ORACLE = """
SELECT o_orderkey AS orderkey FROM orders ORDER BY o_orderkey LIMIT 100
"""


@register("l2_limit_cap", L2_ORACLE)
def l2_limit_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 — hard iteration cap (ref: 200-page guard, dags/pull_new_sales_list.py:203-206)."""
    o = read_table(spark, sf_dir, "orders")
    return o.orderBy("o_orderkey").limit(100).select(
        F.col("o_orderkey").alias("orderkey")
    )


STRING_FUNCS_ORACLE = """
SELECT c_custkey,
       UPPER(c_name)                          AS up,
       LOWER(c_mktsegment)                    AS lo,
       SUBSTRING(c_name, 1, 8)                AS sub8,
       LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
       REPLACE(c_name, '#', '-')              AS repl,
       REVERSE(c_mktsegment)                  AS rev,
       LENGTH(c_name)                         AS len,
       CONCAT(c_mktsegment, ':', c_name)      AS joined
FROM customer
"""


@register("scalar_string_functions", STRING_FUNCS_ORACLE)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String builtin sweep (§2.6) — all JVM-side, one codegen projection."""
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.substring("c_name", 1, 8).alias("sub8"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("repl"),
        F.reverse("c_mktsegment").alias("rev"),
        F.length("c_name").alias("len"),
        F.concat_ws(":", "c_mktsegment", "c_name").alias("joined"),
    )


DATE_FUNCS_ORACLE = """
SELECT o_orderkey,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(EXTRACT(year FROM o_orderdate) AS INT)        AS yr,
       CAST(EXTRACT(month FROM o_orderdate) AS INT)       AS mo,
       CAST(EXTRACT(day FROM o_orderdate) AS INT)         AS dy,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INT)     AS qtr,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       CAST(date_diff('day', DATE '2024-01-01',
                      CAST(o_orderdate AS DATE)) AS INT)  AS days_since
FROM orders
"""


@register("scalar_date_functions", DATE_FUNCS_ORACLE)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date builtin sweep (§2.6): trunc/extract/last_day/datediff."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("2024-01-01").cast("date")).alias("days_since"),
    )


SQL_INTERFACE_ORACLE = """
SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(AVG(c.c_acctbal), 4) AS avg_balance
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@register("sql_interface", SQL_INTERFACE_ORACLE)
def sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front end: tables registered as temp views, query given as
    ANSI SQL text, identical semantics to the DataFrame surface — users of
    the engine can stay in SQL end-to-end (sources.tables.register_views)."""
    from airflow_dags_spark.sources.tables import register_views

    register_views(spark, sf_dir, names=("customer", "nation"))
    return spark.sql(
        """
        SELECT n.n_name AS nation, COUNT(*) AS n_customers,
               ROUND(AVG(c.c_acctbal), 4) AS avg_balance
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )


STRATIFIED_ORACLE = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR))
         ) AS rn
  FROM documents
) t WHERE rn <= 5
"""


@register("l1_stratified_sample", STRATIFIED_ORACLE)
def l1_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sample (functions/sampling.py): 5 docs per
    language by md5 permutation — the per-stratum stable work batch / eval
    slice. One hash-exchange on the stratum column, per-group window, never
    a global sort."""
    from airflow_dags_spark.functions.sampling import stratified_sample

    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(d, "lang", "doc_id", 5)


VARIANT_SHRED_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
GROUP BY event_type
"""


@register("json_variant_agg", VARIANT_SHRED_ORACLE)
def json_variant_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type: ``parse_json``
    once, then typed ``variant_get`` paths. The 100 TB answer to repeated
    ``get_json_object`` calls (which re-parse the JSON string per access):
    VARIANT is a shredded binary encoding, so path access is a field read,
    and a lakehouse can store the parsed column once. Same filter→agg shape
    as p10/p13 (dags/pull_new_sales_list.py:152-155's json.loads + .get),
    but scale-native."""
    ev = read_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
        )
    )


MAP_FUNCS_ORACLE = """
WITH per AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY user_id, event_type
)
SELECT user_id,
  CAST(count(*) AS BIGINT)                                  AS n_types,
  max(CASE WHEN event_type = 'view' THEN c END)             AS n_view,
  CAST(sum(CASE WHEN c >= 5 THEN 1 ELSE 0 END) AS BIGINT)   AS n_heavy_types,
  CAST(sum(c) AS BIGINT)                                    AS total_events
FROM per GROUP BY user_id
"""


@register("scalar_map_functions", MAP_FUNCS_ORACLE)
def scalar_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 MAP-function sweep: builds a per-user event_type→count map with
    ``map_from_entries`` and derives every output THROUGH map operators —
    ``size``, ``element_at`` (NULL on absent key), ``map_filter`` (HOF),
    ``aggregate(map_values(...))`` fold — while the oracle computes the same
    scalars relationally, proving the map semantics (not just the shapes).

    One exchange on user_id; the map never exceeds |event types| entries, so
    per-row state is O(types) regardless of event volume — the same reason
    map columns are the idiomatic Spark shape for sparse per-entity
    feature bags at 100 TB."""
    ev = read_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    m = F.map_from_entries(
        F.array_sort(F.collect_list(F.struct("event_type", "c")))
    )
    agg = per.groupBy("user_id").agg(m.alias("m"))
    return agg.select(
        "user_id",
        F.size("m").cast("bigint").alias("n_types"),
        F.element_at("m", F.lit("view")).alias("n_view"),
        F.size(F.map_filter("m", lambda k, v: v >= 5)).cast("bigint").alias(
            "n_heavy_types"
        ),
        F.aggregate(
            F.map_values("m"), F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("total_events"),
    )


COND_FUNCS_ORACLE = """
SELECT o_orderkey,
  COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN')            AS status_or_open,
  CASE WHEN o_totalprice > 200000 THEN 'big'
       WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END AS bucket,
  GREATEST(o_custkey % 10, 3)                             AS prio_floor,
  LEAST(CAST(o_totalprice AS DOUBLE), 100000.0)           AS capped_price,
  CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END   AS is_urgent,
  IFNULL(NULLIF(o_orderstatus, o_orderstatus), 'none')    AS always_none
FROM orders WHERE o_orderkey % 7 = 0
"""


@register("scalar_conditional_functions", COND_FUNCS_ORACLE)
def scalar_conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 conditional-function sweep: nullif/coalesce/ifnull, greatest/
    least, searched CASE, LIKE-driven flags — the null-handling idioms the
    reference's pandas fillna/mask code maps to. Pure narrow projection:
    zero shuffles, fused into the scan stage."""
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 7 == 0)
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.greatest(F.col("o_custkey") % 10, F.lit(3)).alias("prio_floor"),
        F.least(F.col("o_totalprice").cast("double"), F.lit(100000.0)).alias(
            "capped_price"
        ),
        F.when(F.col("o_orderpriority").like("1%"), 1).otherwise(0).alias(
            "is_urgent"
        ),
        F.ifnull(
            F.nullif("o_orderstatus", F.col("o_orderstatus")), F.lit("none")
        ).alias(
            "always_none"
        ),
    )


MATH_FUNCS_ORACLE = """
SELECT l_orderkey, l_linenumber,
  ROUND(ABS(l_extendedprice - l_quantity * 1000.0), 2) + 0.0 AS abs_diff,
  SIGN(l_extendedprice - l_quantity * 1000.0) + 0.0          AS diff_sign,
  CAST(FLOOR(l_discount * 100) AS BIGINT)                    AS disc_pct_floor,
  CAST(CEIL(l_tax * 100) AS BIGINT)                          AS tax_pct_ceil,
  ROUND(SQRT(CAST(l_quantity AS DOUBLE)), 6)                 AS qty_sqrt,
  ROUND(LN(CAST(l_extendedprice AS DOUBLE)), 6)              AS price_ln,
  ROUND(LOG10(CAST(l_extendedprice AS DOUBLE)), 6)           AS price_log10,
  ROUND(POWER(CAST(l_quantity AS DOUBLE), 2.0), 2)           AS qty_sq,
  CAST(l_orderkey % 97 AS BIGINT)                            AS key_mod
FROM lineitem WHERE l_orderkey % 11 = 0
"""


@register("scalar_math_functions", MATH_FUNCS_ORACLE)
def scalar_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 math-function sweep: abs/sign/floor/ceil/sqrt/ln/log10/power/
    mod over the fact table, rounded where IEEE ulp could differ between
    engines. Narrow projection fused into the scan; no exchange."""
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 11 == 0)
    diff = F.col("l_extendedprice") - F.col("l_quantity") * 1000.0
    price_d = F.col("l_extendedprice").cast("double")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.round(F.abs(diff), 2) + F.lit(0.0)).alias("abs_diff"),
        (F.signum(diff.cast("double")) + F.lit(0.0)).alias("diff_sign"),
        F.floor(F.col("l_discount") * 100).cast("bigint").alias("disc_pct_floor"),
        F.ceil(F.col("l_tax") * 100).cast("bigint").alias("tax_pct_ceil"),
        F.round(F.sqrt(F.col("l_quantity").cast("double")), 6).alias("qty_sqrt"),
        F.round(F.log(price_d), 6).alias("price_ln"),
        F.round(F.log10(price_d), 6).alias("price_log10"),
        F.round(F.pow(F.col("l_quantity").cast("double"), 2.0), 2).alias("qty_sq"),
        (F.col("l_orderkey") % 97).cast("bigint").alias("key_mod"),
    )


BITWISE_ORACLE = """
SELECT o_orderkey,
  CAST(o_orderkey & 255 AS BIGINT)        AS low_byte,
  CAST(o_orderkey | 4096 AS BIGINT)       AS with_flag,
  CAST(xor(o_orderkey, 21845) AS BIGINT)  AS xored,
  CAST(o_orderkey << 2 AS BIGINT)         AS shl2,
  CAST(o_orderkey >> 3 AS BIGINT)         AS shr3,
  bit_count(o_orderkey)                   AS popcount
FROM orders WHERE o_orderkey % 13 = 0
"""


@register("scalar_bitwise_functions", BITWISE_ORACLE)
def scalar_bitwise_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 bitwise sweep: and/or/xor/shifts/popcount — the flag-word and
    hash-manipulation idioms the engine's own Bloom/SimHash/zorder
    operators are built from, surfaced as a checkable query. Narrow
    zero-shuffle projection."""
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 13 == 0)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("bigint").alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).cast("bigint").alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).cast("bigint").alias("xored"),
        F.expr("shiftleft(o_orderkey, 2)").cast("bigint").alias("shl2"),
        F.expr("shiftright(o_orderkey, 3)").cast("bigint").alias("shr3"),
        F.bit_count("o_orderkey").alias("popcount"),
    )


DATE_FUNCS2_ORACLE = """
SELECT o_orderkey,
  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d')       AS plus_3m,
  ROUND(12 * (EXTRACT(year FROM o_orderdate) - 2020)
        + (EXTRACT(month FROM o_orderdate) - 6)
        + (EXTRACT(day FROM o_orderdate) - 15) / 31.0, 6)    AS months_since,
  CAST(EXTRACT(week FROM o_orderdate) AS INT)                AS wk,
  CAST(EXTRACT(isodow FROM o_orderdate) AS INT)              AS iso_dow,
  strftime(make_date(CAST(EXTRACT(year FROM o_orderdate) AS INT), 1, 1),
           '%Y-%m-%d')                                       AS year_start
FROM orders WHERE o_orderkey % 17 = 0
"""


@register("scalar_date_functions2", DATE_FUNCS2_ORACLE)
def scalar_date_functions2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 date sweep v2: add_months, months_between (mirrored by the
    engine-portable 31-day-fraction formula both engines compute
    identically), ISO week/day-of-week, make_date. Zero-shuffle."""
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 17 == 0)
    d = F.col("o_orderdate")
    months_since = (
        12 * (F.year(d) - 2020)
        + (F.month(d) - 6)
        + (F.dayofmonth(d) - 15) / 31.0
    )
    return o.select(
        "o_orderkey",
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus_3m"),
        F.round(months_since, 6).alias("months_since"),
        F.weekofyear(d).alias("wk"),
        F.expr("extract(dayofweek_iso FROM o_orderdate)").cast("int").alias("iso_dow"),
        F.date_format(F.make_date(F.year(d), F.lit(1), F.lit(1)), "yyyy-MM-dd").alias(
            "year_start"
        ),
    )

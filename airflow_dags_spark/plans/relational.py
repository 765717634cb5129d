"""Relational core (SURVEY.md §2.4, §2.5, §7 Phase 0+2).

The reference has no explicit joins/aggregations — they hide inside Postgres
upserts (J1–J3) and the driver harness exercises them on TPC-H-ish keys. All
queries here are pure Spark builtins; Catalyst handles pushdown, pruning and
join strategy (broadcast for the small dimensions, sort-merge + AQE skew
handling for fact-fact).

Scale notes (100 TB):
- dimension joins (region/nation/customer-side lookups) stay broadcast under
  the 64 MiB threshold set in session.ENGINE_CONFS;
- fact-fact joins (orders⋈lineitem) shuffle on the join key — at 100 TB both
  sides would be bucketed by orderkey in the lakehouse layout to eliminate
  the shuffle entirely; AQE handles skewed keys either way;
- global top-k uses TakeOrderedAndProject (per-partition top-k + merge of
  k·p rows), never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_dags_spark.plans.registry import register
from airflow_dags_spark.sources.tables import read_table


# --------------------------------------------------------------------------
# Flagship: TPC-H Q1-shaped pricing summary (scan→filter→project→hash-agg→sort)
# --------------------------------------------------------------------------

Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2)                                          AS sum_qty,
  ROUND(SUM(l_extendedprice), 2)                                     AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
  ROUND(AVG(l_quantity), 4)                                          AS avg_qty,
  ROUND(AVG(l_extendedprice), 4)                                     AS avg_price,
  ROUND(AVG(l_discount), 4)                                          AS avg_disc,
  COUNT(*)                                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query. Physical plan: parquet scan with pushed shipdate
    filter + 2-col-key partial hash-agg (map-side combine) → single shuffle
    on (returnflag, linestatus) → final agg. The groupBy key has ~6 distinct
    values, so the shuffle moves only partial-agg rows — O(partitions), not
    O(data) — the plan that survives 100 TB."""
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Multi-way joins
# --------------------------------------------------------------------------

Q3_ORACLE = """
SELECT
  l.l_orderkey                                         AS orderkey,
  ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
  CAST(strftime(o.o_orderdate, '%Y%m%d') AS BIGINT)     AS orderdate_num
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, orderkey ASC
LIMIT 10
"""


@register("q3_top_revenue_orders", Q3_ORACLE)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: selective dim filter → fact join → agg → top-k.
    customer(BUILDING) broadcasts into orders; orders⋈lineitem shuffles on
    orderkey (bucketed co-location at 100 TB); top-10 via
    TakeOrderedAndProject, deterministic tiebreak on orderkey."""
    c = read_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            F.col("l_orderkey").alias("orderkey"),
            "revenue",
            F.date_format("o_orderdate", "yyyyMMdd").cast("bigint").alias("orderdate_num"),
        )
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )


Q5_ORACLE = """
SELECT
  n.n_name                                              AS nation,
  r.r_name                                              AS region,
  ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
  COUNT(*)                                              AS n_items
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey   = c.c_custkey
JOIN lineitem l ON l.l_orderkey  = o.o_orderkey
GROUP BY n.n_name, r.r_name
"""


@register("q5_nation_revenue", Q5_ORACLE)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 5-way join. region/nation/customer broadcast up the
    chain (all dimension-sized); only orders⋈lineitem shuffles. Catalyst's
    join reordering + AQE pick this automatically; broadcast() pins the
    dims so the plan is stable at any scale."""
    r = read_table(spark, sf_dir, "region")
    n = read_table(spark, sf_dir, "nation")
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


JOIN_LEFT_ORACLE = """
SELECT
  c.c_custkey                                   AS custkey,
  c.c_mktsegment                                AS mktsegment,
  COUNT(o.o_orderkey)                           AS n_orders,
  ROUND(COALESCE(SUM(o.o_totalprice), 0.0), 2)  AS total_spend
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_mktsegment
"""


@register("join_left_order_counts", JOIN_LEFT_ORACLE)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


JOIN_SEMI_ORACLE = """
SELECT c_custkey AS custkey, c_name AS name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
)
"""


@register("join_semi_big_spenders", JOIN_SEMI_ORACLE)
def join_semi_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS) — customers with at least one big order."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name")
    )


JOIN_ANTI_ORACLE = """
SELECT c_custkey AS custkey, c_name AS name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
)
"""


@register("join_anti_customers_without_orders", JOIN_ANTI_ORACLE)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS) — the J1 conflict-detection primitive
    behind insert-if-absent upsert (ref: ON CONFLICT DO NOTHING,
    dags/monthly_price_paid_data.py:153)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name")
    )


JOIN_CI_ORACLE = """
SELECT a.n_nationkey AS nationkey, a.n_name AS name, b.n_regionkey AS regionkey
FROM nation a
JOIN (SELECT UPPER(n_name) AS un, n_regionkey FROM nation) b
  ON LOWER(a.n_name) = LOWER(b.un)
"""


@register("join_case_insensitive", JOIN_CI_ORACLE)
def join_case_insensitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — expression equi-join on lower(key), still hash-joinable.
    Reference: WHERE lower(outcode)=lower(%s) (dags/rightmove_outcodes.py:63)."""
    n = read_table(spark, sf_dir, "nation")
    b = n.select(F.upper("n_name").alias("un"), "n_regionkey")
    a = n.select("n_nationkey", "n_name")
    return a.join(F.broadcast(b), F.lower(a.n_name) == F.lower(b.un)).select(
        F.col("n_nationkey").alias("nationkey"),
        F.col("n_name").alias("name"),
        F.col("n_regionkey").alias("regionkey"),
    )


# --------------------------------------------------------------------------
# Aggregations / distinct / set ops / sort
# --------------------------------------------------------------------------

AGG_GLOBAL_ORACLE = """
SELECT
  COUNT(*)                                   AS n_rows,
  COUNT(DISTINCT l_partkey)                  AS n_parts,
  ROUND(SUM(l_quantity), 2)                  AS sum_qty,
  ROUND(AVG(l_extendedprice), 4)             AS avg_price,
  ROUND(MIN(l_extendedprice), 2)             AS min_price,
  ROUND(MAX(l_extendedprice), 2)             AS max_price
FROM lineitem
"""


@register("agg_global_stats", AGG_GLOBAL_ORACLE)
def agg_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregate incl. exact count-distinct (expand+2-phase agg)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


AGG_PRIORITY_ORACLE = """
SELECT
  o_orderpriority                 AS priority,
  o_orderstatus                   AS status,
  COUNT(*)                        AS n_orders,
  ROUND(SUM(o_totalprice), 2)     AS total
FROM orders
GROUP BY o_orderpriority, o_orderstatus
"""


@register("agg_orders_by_priority", AGG_PRIORITY_ORACLE)
def agg_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


ROLLUP_ORACLE = """
SELECT
  l_returnflag               AS returnflag,
  l_linestatus               AS linestatus,
  COUNT(*)                   AS n_rows,
  ROUND(SUM(l_quantity), 2)  AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("agg_rollup", ROLLUP_ORACLE)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — subtotals + grand total in one pass (Expand)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.rollup(
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_linestatus").alias("linestatus"),
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


CUBE_ORACLE = """
SELECT
  o_orderstatus              AS status,
  o_orderpriority            AS priority,
  COUNT(*)                   AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("agg_cube", CUBE_ORACLE)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.cube(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))


SORT_TOPK_ORACLE = """
SELECT o_orderkey AS orderkey, ROUND(o_totalprice, 2) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25
"""


@register("sort_topk_orders", SORT_TOPK_ORACLE)
def sort_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: TakeOrderedAndProject, no full sort at any scale."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )
    )


SET_UNION_ORACLE = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
"""

SET_INTERSECT_ORACLE = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
"""

SET_EXCEPT_ORACLE = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
"""


def _set_op_sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    left = c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    right = o.where(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("custkey")
    )
    return left, right


@register("set_union", SET_UNION_ORACLE)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    left, right = _set_op_sides(spark, sf_dir)
    return left.union(right).distinct()


@register("set_intersect", SET_INTERSECT_ORACLE)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    left, right = _set_op_sides(spark, sf_dir)
    return left.intersect(right)


@register("set_except", SET_EXCEPT_ORACLE)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    left, right = _set_op_sides(spark, sf_dir)
    return left.exceptAll(right).distinct()


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------

WINDOW_TOPN_ORACLE = """
SELECT custkey, orderkey, totalprice, rn
FROM (
  SELECT
    o_custkey   AS custkey,
    o_orderkey  AS orderkey,
    ROUND(o_totalprice, 2) AS totalprice,
    ROW_NUMBER() OVER (
      PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
    ) AS rn
  FROM orders
) t
WHERE rn <= 3
"""


@register("window_topn_per_customer", WINDOW_TOPN_ORACLE)
def window_topn_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number top-N per group — one shuffle on the partition key; at
    100 TB this is the pattern for per-key dedup/top-k (no global sort)."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "rn",
        )
    )


WINDOW_LAG_ORACLE = """
SELECT
  o_custkey  AS custkey,
  o_orderkey AS orderkey,
  CAST(strftime(o_orderdate, '%Y%m%d') AS BIGINT) AS orderdate_num,
  date_diff('day',
            LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey),
            o_orderdate) AS days_since_prev
FROM orders
"""


@register("window_lag_order_gaps", WINDOW_LAG_ORACLE)
def window_lag_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() — days between consecutive orders per customer."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.date_format("o_orderdate", "yyyyMMdd").cast("bigint").alias("orderdate_num"),
        F.datediff(F.col("o_orderdate"), prev).cast("bigint").alias("days_since_prev"),
    )


WINDOW_RUNNING_ORACLE = """
SELECT
  o_custkey  AS custkey,
  o_orderkey AS orderkey,
  ROUND(SUM(o_totalprice) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ), 2) AS running_spend,
  RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    AS spend_rank
FROM orders
"""


@register("window_running_sum", WINDOW_RUNNING_ORACLE)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-bounded running sum + rank in one pass."""
    o = read_table(spark, sf_dir, "orders")
    w_order = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rank = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.round(F.sum("o_totalprice").over(w_order), 2).alias("running_spend"),
        F.rank().over(w_rank).alias("spend_rank"),
    )


SALTED_AGG_ORACLE = """
SELECT l_returnflag,
       ROUND(SUM(l_quantity), 2)      AS sum_qty,
       CAST(COUNT(*) AS BIGINT)       AS n_rows,
       ROUND(MAX(l_extendedprice), 2) AS max_price
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_salted_skew", SALTED_AGG_ORACLE)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (functions/skew.py) hash-matching the
    plain GROUP BY oracle — proof the skew rewrite is result-identical.
    l_returnflag has 3 hot values over the whole table: exactly the
    one-key-per-reducer shape salting exists for."""
    from airflow_dags_spark.functions.skew import salted_agg

    li = read_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_returnflag"],
        {
            "sum_qty_raw": ("l_quantity", "sum"),
            "n_rows": ("l_quantity", "count"),
            "max_price_raw": ("l_extendedprice", "max"),
        },
        n_salt=8,
    )
    return out.select(
        "l_returnflag",
        F.round("sum_qty_raw", 2).alias("sum_qty"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.round("max_price_raw", 2).alias("max_price"),
    )


SALTED_JOIN_ORACLE = """
SELECT o.o_orderkey, c.c_mktsegment,
       ROUND(o.o_totalprice, 2) AS price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
"""


@register("join_salted_skew", SALTED_JOIN_ORACLE)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (functions/skew.py) hash-matching the plain join
    oracle: big side salted, small side replicated over the salt domain."""
    from airflow_dags_spark.functions.skew import salted_join

    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = (
        read_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    )
    return salted_join(o, c, ["o_custkey"], n_salt=8).select(
        "o_orderkey",
        "c_mktsegment",
        F.round("o_totalprice", 2).alias("price"),
    )


PERCENTILES_ORACLE = """
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       ROUND(median(o_totalprice), 4)             AS med,
       ROUND(stddev_samp(o_totalprice), 4)        AS sd
FROM orders
GROUP BY o_orderpriority
"""


@register("agg_percentiles", PERCENTILES_ORACLE)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles + stddev per group. Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` share linear-interpolation
    semantics (verified bit-identical at round(4)). At 100 TB the exact form
    holds a per-group value buffer — switch to ``percentile_approx``
    (t-digest, mergeable, bounded memory) when groups grow past memory;
    rows-only check in that mode."""
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("median(o_totalprice)"), 4).alias("med"),
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd"),
    )


GROUPING_SETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register("agg_grouping_sets", GROUPING_SETS_ORACLE)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): one pass emits the
    per-status, per-priority, and grand-total aggregates — Spark expands to
    a single Expand + hash-agg, one shuffle for all three groupings."""
    o = read_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


SUBQUERY_ORACLE = """
SELECT o.o_orderkey, ROUND(o.o_totalprice, 2) AS price
FROM orders o
WHERE o.o_totalprice > (
  SELECT AVG(o2.o_totalprice) FROM orders o2
  WHERE o2.o_custkey = o.o_custkey
)
"""


@register("subquery_above_customer_avg", SUBQUERY_ORACLE)
def subquery_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders above their customer's average.
    Catalyst decorrelates it into an aggregate + self-join — one shuffle on
    o_custkey, never a per-row subquery execution (SURVEY.md §4.1: subquery
    decorrelation comes free once a SQL surface exists)."""
    o = read_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_sub")
    return spark.sql(
        """
        SELECT o.o_orderkey, ROUND(o.o_totalprice, 2) AS price
        FROM __orders_sub o
        WHERE o.o_totalprice > (
          SELECT AVG(o2.o_totalprice) FROM __orders_sub o2
          WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


WINDOW_FULL_ORACLE = """
SELECT
  o_orderkey,
  o_custkey,
  DENSE_RANK()   OVER w                              AS drank,
  NTILE(4)       OVER w                              AS quartile,
  ROUND(PERCENT_RANK() OVER w, 6)                    AS prank,
  ROUND(FIRST_VALUE(o_totalprice) OVER w, 2)         AS top_price,
  ROUND(LEAD(o_totalprice, 1, 0.0) OVER w, 2)        AS next_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
"""


@register("window_rank_family", WINDOW_FULL_ORACLE)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ranking/navigation window functions (dense_rank, ntile,
    percent_rank, first_value, lead) in ONE window spec — one shuffle+sort
    serves all five (Spark collapses same-spec windows into one Window op)."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.dense_rank().over(w).alias("drank"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.first_value("o_totalprice").over(w), 2).alias("top_price"),
        F.round(F.lead("o_totalprice", 1, 0.0).over(w), 2).alias("next_price"),
    )


PROFILE_ORACLE = """
SELECT 'o_totalprice' AS col,
       CAST(COUNT(*) AS BIGINT)                         AS n_rows,
       CAST(COUNT(o_totalprice) AS BIGINT)              AS n_non_null,
       ROUND(1.0 - CAST(COUNT(o_totalprice) AS DOUBLE) / COUNT(*), 6) AS null_frac,
       CAST(COUNT(DISTINCT o_totalprice) AS BIGINT)     AS n_distinct,
       ROUND(MIN(o_totalprice), 2)                      AS min_v,
       ROUND(MAX(o_totalprice), 2)                      AS max_v
FROM orders
UNION ALL
SELECT 'o_custkey',
       CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(o_custkey) AS BIGINT),
       ROUND(1.0 - CAST(COUNT(o_custkey) AS DOUBLE) / COUNT(*), 6),
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
       ROUND(MIN(o_custkey), 2),
       ROUND(MAX(o_custkey), 2)
FROM orders
"""


@register("profile_columns", PROFILE_ORACLE)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling operator: per-column row/non-null/null-fraction/
    distinct/min/max in ONE scan (all aggregates computed together, then
    unpivoted) — the quality-report pass a training-data pipeline runs
    before ingest. At 100 TB swap COUNT DISTINCT for approx_count_distinct
    (HLL, mergeable) — the exact form here is what DuckDB can oracle."""
    o = read_table(spark, sf_dir, "orders")
    cols = ["o_totalprice", "o_custkey"]
    agg_exprs = []
    for c in cols:
        agg_exprs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.round(F.min(c).cast("double"), 2).alias(f"{c}__min"),
            F.round(F.max(c).cast("double"), 2).alias(f"{c}__max"),
        ]
    wide = o.agg(*agg_exprs)
    parts = []
    for c in cols:
        parts.append(
            wide.select(
                F.lit(c).alias("col"),
                F.col(f"{c}__n").alias("n_rows"),
                F.col(f"{c}__nn").alias("n_non_null"),
                F.round(1.0 - F.col(f"{c}__nn") / F.col(f"{c}__n"), 6).alias(
                    "null_frac"
                ),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_v"),
                F.col(f"{c}__max").alias("max_v"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


CORRELATION_ORACLE = """
SELECT l_returnflag,
       ROUND(corr(l_quantity, l_extendedprice), 6) + 0.0 AS corr_qty_price,
       ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
       ROUND(regr_slope(l_extendedprice, l_quantity), 6) + 0.0 AS slope_price_on_qty
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_correlation", CORRELATION_ORACLE)
def agg_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per group (corr / covar_samp / regression
    slope) — single-pass mergeable aggregates (sum/sumsq/cross-products),
    the same shuffle profile as a plain sum at any scale."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        (F.round(F.corr("l_quantity", "l_extendedprice"), 6) + F.lit(0.0)).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qty_price"
        ),
        (F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6) + F.lit(0.0)).alias(
            "slope_price_on_qty"
        ),
    )


PIVOT_ORACLE = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS st_f,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS st_o,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS st_p
FROM orders
GROUP BY o_orderpriority
"""


@register("pivot_status_by_priority", PIVOT_ORACLE)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with EXPLICIT pivot values — at scale the implicit
    form runs an extra distinct-collect job to discover values; pinning them
    keeps the plan to one aggregation pass."""
    o = read_table(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0)
    )
    return pivoted.select(
        "o_orderpriority",
        F.col("F").cast("bigint").alias("st_f"),
        F.col("O").cast("bigint").alias("st_o"),
        F.col("P").cast("bigint").alias("st_p"),
    )


Q6_ORACLE = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped: the pure scan benchmark — four pushed-down
    predicates, no join, no groupBy key, single global agg. At 100 TB this
    query IS the scan: every predicate must reach the parquet reader (range
    filters on shipdate/discount/quantity show in PushedFilters) and the
    projection is 3 columns of 11."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register("agg_approx_stats", None)  # HLL/t-digest internals → rows-only
def agg_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The at-scale twins of agg_global_stats/agg_percentiles: HLL
    approx_count_distinct and t-digest percentile_approx — mergeable,
    bounded-memory sketches (the exact forms hold per-group buffers).
    Engine-internal sketch states aren't oracle-able; pytest bounds the
    relative error against the exact queries instead."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_p50"),
        F.percentile_approx("l_extendedprice", 0.9, 10000).alias("approx_p90"),
    )

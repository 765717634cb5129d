"""Full TPC-H-shaped query suite (beyond the q1/q3/q5/q6 flagships).

The reference has no analytical queries (SURVEY.md §2.5: computation hides
inside Postgres upserts), but the engine's north star is a general analytics
layer and the driver tables are TPC-H-ish. This module adapts the remaining
classic TPC-H shapes to the reduced driver schema (no partsupp, no
commit/receipt dates, no shipmode/phone/container — every query states its
adaptation). Each exercises a distinct plan shape Catalyst must get right:

- q4/q20/q21/q22 — (correlated) EXISTS / NOT EXISTS → semi/anti joins
- q15/q17/q22    — scalar subqueries → broadcast of a 1-row aggregate
- q8/q12/q14     — conditional aggregation (CASE inside SUM) and ratios
- q13            — outer join with join-condition filter + two-level groupBy
- q16            — count-distinct over a derived relationship + NOT IN
- q18            — groupBy-HAVING on a fact, then dimension enrichment
- q19            — disjunctive multi-column predicates (pushdown stress)

Scale notes (100 TB): every dimension join below broadcasts (region, nation,
supplier, part, filtered customer all ≪ the 64 MiB threshold in
session.ENGINE_CONFS at driver-test scale; at true 100 TB part/customer
joins shuffle on their keys and AQE keeps them skew-safe). Fact-fact
(orders⋈lineitem, lineitem⋈lineitem) joins shuffle on l_orderkey — the
lakehouse layout buckets both by orderkey (operators/bucketing.py) to make
them exchange-free. Semi/anti joins co-partition with their probe side: the
q21 triple self-join hashes all three legs on l_orderkey, so a bucketed
layout runs it without any fact shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_dags_spark.plans.registry import register
from airflow_dags_spark.sources.tables import read_table


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# Q2-shaped: cheapest supplier per part (correlated MIN; partsupp replaced by
# the distinct (l_partkey, l_suppkey) relationship observed in lineitem)
# --------------------------------------------------------------------------

Q2_ORACLE = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
     pm AS (SELECT p_partkey, p_name FROM part
            WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE')
SELECT pm.p_partkey AS partkey,
       pm.p_name    AS part_name,
       s.s_name     AS supplier_name,
       ROUND(s.s_acctbal, 2) AS supplier_acctbal
FROM pm
JOIN ps ON ps.l_partkey = pm.p_partkey
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
WHERE s.s_acctbal = (
  SELECT MIN(s2.s_acctbal)
  FROM ps ps2 JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
  WHERE ps2.l_partkey = pm.p_partkey)
"""


@register("q2_min_cost_supplier", Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated MIN subquery as a window: one distinct-shuffle of the
    (partkey, suppkey) relationship, then min-over-partkey window on the SAME
    partitioning (no second shuffle), supplier/part broadcast."""
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    pm = read_table(spark, sf_dir, "part").where(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
    )
    ps = li.select("l_partkey", "l_suppkey").distinct()
    w = Window.partitionBy("l_partkey")
    return (
        ps.join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .withColumn("min_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("min_bal"))
        .join(F.broadcast(pm), F.col("l_partkey") == pm.p_partkey)
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            F.col("s_name").alias("supplier_name"),
            F.round("s_acctbal", 2).alias("supplier_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# Q4-shaped: order-priority check (EXISTS → left-semi with residual range
# predicate; commitdate/receiptdate replaced by "shipped >30 days after order")
# --------------------------------------------------------------------------

Q4_ORACLE = """
SELECT o_orderpriority AS orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


@register("q4_priority_exists", Q4_ORACLE)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi join on orderkey with the date predicate as a
    residual condition. The quarter filter pushes to the orders scan; the
    semi join shuffles on orderkey (bucket-layout removes it at 100 TB) and
    emits orders at most once — no post-join dedup needed."""
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    cond = (o.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("orderpriority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# Q7-shaped: bilateral shipping volume between two nations by ship year
# --------------------------------------------------------------------------

Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q7_nation_volume", Q7_ORACLE)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way join where every non-fact side broadcasts; the nation-pair
    disjunction is applied AFTER both nation joins but Catalyst pushes the
    single-nation IN-filters down each branch (partition-pruning the
    supplier/customer scans at 100 TB)."""
    s = read_table(spark, sf_dir, "supplier")
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    n1 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q8-shaped: market share of one supplier nation among EUROPE customers' PROMO
# purchases, by order year (conditional-sum ratio)
# --------------------------------------------------------------------------

Q8_ORACLE = """
SELECT o_year,
       ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
             / SUM(volume), 4) AS mkt_share
FROM (
  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n1.n_name AS nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  JOIN region r   ON n2.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO')
GROUP BY o_year
"""


@register("q8_market_share", Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-way join, single fact shuffle (orders⋈lineitem); the share is a
    conditional partial-sum ratio so the grouped shuffle carries two doubles
    per year, never the detail rows."""
    p = read_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n1 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("nation")
    )
    n2 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = read_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    vol = _revenue()
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# Q9-shaped: profit by supplier nation and order year for '%widget%' parts
# (ps_supplycost replaced by a 0.5·p_retailprice·l_quantity cost proxy)
# --------------------------------------------------------------------------

Q9_ORACLE = """
SELECT nation, o_year,
       ROUND(CAST(SUM(CAST(amount AS DECIMAL(18,6))) AS DOUBLE), 2)
         AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         l.l_extendedprice * (1 - l.l_discount)
           - 0.5 * p.p_retailprice * l.l_quantity AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%widget%')
GROUP BY nation, o_year
"""


@register("q9_product_profit", Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The p_name LIKE filter broadcasts a pruned part table into lineitem
    BEFORE the orders join, shrinking the only fact-fact shuffle. The profit
    column is a DIFFERENCE (cancellation amplifies float error), so it is
    summed in exact decimal: per-row doubles are bit-identical across
    engines (IEEE arithmetic on identical inputs); only summation ORDER
    differs, and decimal summation is order-independent."""
    p = read_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders")
    n = read_table(spark, sf_dir, "nation")
    amount = _revenue() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            F.round(
                F.sum(amount.cast("decimal(18,6)")).cast("double"), 2
            ).alias("sum_profit")
        )
    )


# --------------------------------------------------------------------------
# Q10-shaped: top-20 customers by returned-item revenue in a quarter
# --------------------------------------------------------------------------

Q10_ORACLE = """
SELECT c.c_custkey AS custkey,
       c.c_name    AS name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       ROUND(c.c_acctbal, 2) AS acctbal,
       n.n_name AS nation
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, custkey ASC
LIMIT 20
"""


@register("q10_returned_items", Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both selective filters (quarter, returnflag) push to their scans; the
    top-20 runs as TakeOrderedAndProject (per-partition top-k + merge), never
    a global sort."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q11-shaped: important stock — per-part shipped value for one nation's
# suppliers, keeping parts above a fraction of the nation total (no partsupp
# table → value is SUM(l_extendedprice * l_quantity) over lineitem instead of
# ps_supplycost * ps_availqty; reference semantics: scalar-subquery HAVING)
# --------------------------------------------------------------------------

Q11_ORACLE = """
WITH v AS (
  SELECT l.l_partkey AS partkey,
         ROUND(SUM(l.l_extendedprice * l.l_quantity), 2) AS part_value
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_9'
  GROUP BY l.l_partkey),
 t AS (SELECT ROUND(SUM(part_value) * 0.001, 2) AS threshold FROM v)
SELECT v.partkey, v.part_value
FROM v, t
WHERE v.part_value > t.threshold
"""


@register("q11_important_stock", Q11_ORACLE)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery HAVING: the per-part value aggregates once (one
    shuffle on l_partkey; supplier/nation broadcast into the scan stage), the
    1-row nation total broadcasts back over it — the grouped frame is reused
    for both sides (ReuseExchange), so the fact scans once. Values round to
    2 dp BEFORE the threshold comparison so both engines compare identical
    doubles (same discipline as q15's max-equality)."""
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_9")
    v = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2).alias(
                "part_value"
            )
        )
    )
    t = v.agg(F.round(F.sum("part_value") * F.lit(0.001), 2).alias("threshold"))
    return (
        v.join(F.broadcast(t))
        .where(F.col("part_value") > F.col("threshold"))
        .select("partkey", "part_value")
    )


# --------------------------------------------------------------------------
# Q12-shaped: priority-class line counts by linestatus for one ship year
# (shipmode column absent → grouped by l_linestatus instead)
# --------------------------------------------------------------------------

Q12_ORACLE = """
SELECT l.l_linestatus AS linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l.l_linestatus
"""


@register("q12_priority_lines", Q12_ORACLE)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional counts: the CASE collapses in the partial aggregate, so
    the shuffle carries 2 longs per linestatus per map task."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q13-shaped: distribution of customers by order count (outer join with a
# join-condition filter, then groupBy of a groupBy)
# --------------------------------------------------------------------------

Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey)
GROUP BY c_count
"""


@register("q13_order_distribution", Q13_ORACLE)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The priority predicate lives IN the join condition (not a post-filter
    — customers with only 5-LOW orders must still appear with count 0).
    First groupBy co-partitions with the join shuffle; the second groupBy
    moves one row per customer-count value."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "5-LOW")
    return (
        c.join(o, cond, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# --------------------------------------------------------------------------
# Q14-shaped: promo revenue share for one ship month
# --------------------------------------------------------------------------

Q14_ORACLE = """
SELECT ROUND(
  100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                   THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
        / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
  AND l.l_shipdate <  TIMESTAMP '1997-10-01'
"""


@register("q14_promo_revenue", Q14_ORACLE)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global conditional ratio: part broadcasts, the month filter pushes to
    the lineitem scan, and the final agg is a 2-double reduce."""
    p = read_table(spark, sf_dir, "part")
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    rev = _revenue()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue"))
    )


# --------------------------------------------------------------------------
# Q15-shaped: top supplier(s) by quarterly revenue (scalar MAX subquery)
# --------------------------------------------------------------------------

Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey AS suppkey,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey AS suppkey, s.s_name AS supplier_name, rev.total_revenue
FROM supplier s
JOIN rev ON s.s_suppkey = rev.suppkey
WHERE rev.total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""


@register("q15_top_supplier", Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery = broadcast of a 1-row MAX aggregate crossed into the
    grouped revenue (the grouped frame is computed once and reused for both
    sides via ReuseExchange). Revenue is rounded BEFORE the max-equality so
    both engines compare identical doubles."""
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = read_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.round(F.sum(_revenue()), 2).alias("total_revenue")
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("suppkey") == s.s_suppkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supplier_name"),
            "total_revenue",
        )
    )


# --------------------------------------------------------------------------
# Q16-shaped: supplier count per (brand, type, size) for the observed
# part-supplier relationship, excluding negative-balance suppliers (NOT IN)
# --------------------------------------------------------------------------

Q16_ORACLE = """
SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
       COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register("q16_supplier_part_cnt", Q16_ORACLE)
def q16_supplier_part_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a non-null key → broadcast left-anti join (the general
    NOT-IN-with-nulls form needs null-aware anti join; suppkey is a PK so the
    anti join is exact). count-distinct expands partially map-side."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = read_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0)
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q17-shaped: revenue from small-quantity lines of one brand (correlated AVG)
# --------------------------------------------------------------------------

Q17_ORACLE = """
SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                      FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
"""


@register("q17_small_qty_revenue", Q17_ORACLE)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated AVG decorrelated into a grouped aggregate joined back on
    partkey — the standard Catalyst rewrite, written explicitly. The per-part
    avg table is brand-filtered FIRST so only ~|brand parts| groups
    materialize (semi-join pushdown at 100 TB)."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    brand_lines = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    part_avg = (
        brand_lines.groupBy(F.col("l_partkey").alias("avg_partkey"))
        .agg((0.5 * F.avg("l_quantity")).alias("half_avg_qty"))
    )
    return (
        brand_lines.join(
            F.broadcast(part_avg), F.col("l_partkey") == F.col("avg_partkey")
        )
        .where(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# Q18-shaped: large-volume customers (groupBy-HAVING on the fact, top-10)
# --------------------------------------------------------------------------

Q18_ORACLE = """
SELECT c.c_name AS name, c.c_custkey AS custkey, o.o_orderkey AS orderkey,
       CAST(strftime(o.o_orderdate, '%Y%m%d') AS BIGINT) AS orderdate_num,
       ROUND(o.o_totalprice, 2) AS totalprice,
       ROUND(SUM(l.l_quantity), 2) AS sum_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 250)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY totalprice DESC, orderkey ASC
LIMIT 10
"""


@register("q18_large_volume_customers", Q18_ORACLE)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING as a pre-aggregated semi-join: the qualifying-order set is a
    grouped sum on orderkey (same partitioning as the main join — one
    shuffle, reused), then a semi join keeps only big orders before the
    customer broadcast."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "big_key"),
                F.col("l_orderkey") == F.col("big_key"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.col("c_name").alias("name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyyMMdd").cast("bigint").alias(
                "orderdate_num"
            ),
            F.round("o_totalprice", 2).alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice"), F.asc("orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q19-shaped: revenue under disjunctive (brand, size, quantity) predicates
# --------------------------------------------------------------------------

Q19_ORACLE = """
SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 25
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 40
       AND l.l_quantity BETWEEN 20 AND 40)
"""


@register("q19_disjunctive_rev", Q19_ORACLE)
def q19_disjunctive_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive pushdown stress: Catalyst extracts the common
    brand/size disjunction onto the part scan and the quantity disjunction
    onto the lineitem scan (weaker OR-bounds), leaving the cross-terms as the
    join residual — both scans prune before the broadcast join."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")

    def arm(brand: str, s_lo: int, s_hi: int, q_lo: int, q_hi: int) -> F.Column:
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(
            arm("Brand#1", 1, 10, 1, 20)
            | arm("Brand#2", 10, 25, 10, 30)
            | arm("Brand#3", 20, 40, 20, 40)
        )
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q20-shaped: suppliers that shipped a large volume of 'red%' parts in a year
# (nested IN-subqueries → grouped HAVING + semi join)
# --------------------------------------------------------------------------

Q20_ORACLE = """
SELECT s.s_name AS supplier_name, n.n_name AS nation
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE 'red%'
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_suppkey
    HAVING SUM(l.l_quantity) > 100)
"""


@register("q20_excess_ship_suppliers", Q20_ORACLE)
def q20_excess_ship_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested IN as a grouped-HAVING derived table semi-joined into the
    (tiny) supplier dimension; part prunes via LIKE before the fact join."""
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = read_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 100)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select(
            F.col("s_name").alias("supplier_name"), F.col("n_name").alias("nation")
        )
    )


# --------------------------------------------------------------------------
# Q21-shaped: suppliers whose line shipped last in multi-supplier finished
# orders (EXISTS + NOT EXISTS self-joins on the fact)
# --------------------------------------------------------------------------

Q21_ORACLE = """
SELECT s.s_name AS supplier_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s.s_name
ORDER BY numwait DESC, supplier_name ASC
LIMIT 20
"""


@register("q21_waiting_supplier", Q21_ORACLE)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triple self-join on l_orderkey: EXISTS → left-semi, NOT EXISTS →
    left-anti, both with residual inequality conditions. The legs read
    different column sets so each keeps its own (pruned) scan, but all three
    joins hash on the same key — with an orderkey-bucketed layout the whole
    query is shuffle-free except the final tiny per-supplier count."""
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = li.select("l_orderkey", "l_suppkey", "l_shipdate").alias("l3")
    base = (
        l1.join(o, F.col("l1.l_orderkey") == o.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey"))
            & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
            "left_anti",
        )
    )
    return (
        base.join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy(F.col("s_name").alias("supplier_name"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("supplier_name"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q22-shaped: well-funded customers with no orders, by nation (scalar AVG
# subquery + NOT EXISTS anti join; phone cntrycode replaced by nationkey)
# --------------------------------------------------------------------------

Q22_ORACLE = """
SELECT c.c_nationkey AS nationkey,
       COUNT(*) AS numcust,
       ROUND(SUM(c.c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                     WHERE c2.c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_nationkey
"""


@register("q22_idle_customers", Q22_ORACLE)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar AVG broadcast-crossed into the scan, then an anti join against
    orders (only o_custkey is read — column pruning keeps the probe narrow)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").select("o_custkey")
    pos_avg = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(F.broadcast(pos_avg))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )

"""Round-4 operators: prefix-filtered exact Jaccard join, two-pass exact
heavy hitters, inverted-index search, portable table checksum, bitmap
distinct plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_dags_spark.functions.metrics import table_checksum
from airflow_dags_spark.functions.probabilistic import heavy_hitters_exact
from airflow_dags_spark.operators.dedup import prefix_jaccard_join
from airflow_dags_spark.operators.inverted import (
    build_inverted_index,
    search_all_terms,
)


def _jaccard(a: str, b: str) -> float:
    sa, sb = set(a.lower().split()), set(b.lower().split())
    return len(sa & sb) / len(sa | sb)


# --- prefix-filtered exact Jaccard join ---------------------------------------


def test_prefix_jaccard_complete_vs_brute_force(spark):
    """The prefix filter must be LOSSLESS: every pair ≥ t, exactly the
    brute-force set — including pairs whose shared tokens are all
    high-frequency (the case a careless prefix choice would drop)."""
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),        # j=4/6 vs 1
        (3, "alpha beta gamma delta epsilon"),     # j=1.0 vs 1
        (4, "omega psi chi phi"),
        (5, "omega psi chi phi upsilon"),          # j=4/5 vs 4
        (6, "totally different words here now"),
        (7, "alpha beta"),                         # small set, high overlap frac
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    for t in (0.5, 0.66, 0.8, 1.0):
        got = {
            (r["key_a"], r["key_b"]): r["jaccard"]
            for r in prefix_jaccard_join(df, "text", "doc_id", t).collect()
        }
        want = {}
        for i, (ka, ta) in enumerate(rows):
            for kb, tb in rows[i + 1 :]:
                j = _jaccard(ta, tb)
                if j >= t:
                    want[(ka, kb)] = round(j, 6)
        assert got == pytest.approx(want), f"threshold {t}"


def test_prefix_jaccard_never_all_pairs(spark):
    """The candidate join must prune: with disjoint vocabularies the
    cross-vocabulary pairs never reach the verify stage (checked through
    the result AND by construction: zero shared prefix tokens)."""
    rows = [(i, f"red{i % 3} red{(i + 1) % 3} common{i % 2}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = prefix_jaccard_join(df, "text", "doc_id", 0.9).collect()
    for r in out:
        a = dict(rows)[r["key_a"]]
        b = dict(rows)[r["key_b"]]
        assert _jaccard(a, b) >= 0.9


def test_prefix_jaccard_threshold_guard(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="threshold"):
        prefix_jaccard_join(df, "text", "doc_id", 0.0)


# --- exact heavy hitters ------------------------------------------------------


def test_heavy_hitters_exact_matches_group_by(spark):
    """Zipf-ish skew across many partitions: output must equal the
    exhaustive GROUP BY ... HAVING exactly (values AND counts)."""
    rows = [(i % 7,) for i in range(700)] + [(100 + i % 400,) for i in range(800)]
    df = spark.createDataFrame(rows, "v bigint").repartition(16)
    share = 0.02  # threshold: > 30 of 1500
    got = {
        (r["v"], r["cnt"]) for r in heavy_hitters_exact(df, "v", share).collect()
    }
    n = len(rows)
    exact = (
        df.groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > share * n)
    )
    want = {(r["v"], r["cnt"]) for r in exact.collect()}
    assert got == want and len(want) == 7  # the 7 hot values, 100 each


def test_heavy_hitters_ignores_nulls(spark):
    rows = [(1,)] * 50 + [(None,)] * 50 + [(2,)] * 2
    df = spark.createDataFrame(rows, "v bigint")
    got = heavy_hitters_exact(df, "v", 0.5).collect()
    # n = 52 non-null; only value 1 (50) exceeds 26
    assert [(r["v"], r["cnt"]) for r in got] == [(1, 50)]


def test_heavy_hitters_share_guard(spark):
    df = spark.createDataFrame([(1,)], "v bigint")
    with pytest.raises(ValueError, match="min_share"):
        heavy_hitters_exact(df, "v", 1.5)


# --- inverted index -----------------------------------------------------------


def test_inverted_search_conjunctive(spark):
    rows = [
        (1, "spark shuffles data across the cluster"),
        (2, "spark broadcasts small tables"),
        (3, "data moves across the network"),
        (4, "SPARK  Data   across everything"),  # case+whitespace normalize
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    idx = build_inverted_index(df, "text", "doc_id")
    got = sorted(r["doc"] for r in search_all_terms(idx, ["spark", "data"]).collect())
    assert got == [1, 4]
    # single term
    got1 = sorted(r["doc"] for r in search_all_terms(idx, ["across"]).collect())
    assert got1 == [1, 3, 4]
    # duplicate terms in the query collapse (set semantics)
    got2 = sorted(
        r["doc"] for r in search_all_terms(idx, ["spark", "Spark"]).collect()
    )
    assert got2 == [1, 2, 4]


def test_inverted_index_set_semantics(spark):
    df = spark.createDataFrame([(1, "a a a b")], "doc_id bigint, text string")
    idx = build_inverted_index(df, "text", "doc_id").collect()
    assert sorted((r["token"], r["doc"]) for r in idx) == [("a", 1), ("b", 1)]


def test_inverted_search_empty_terms_guard(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="term"):
        search_all_terms(build_inverted_index(df, "text", "doc_id"), [])


# --- table checksum -----------------------------------------------------------


def test_table_checksum_order_insensitive(spark):
    rows = [(i, f"name{i}") for i in range(500)]
    a = spark.createDataFrame(rows, "k bigint, s string")
    b = spark.createDataFrame(list(reversed(rows)), "k bigint, s string").repartition(7)
    ra, rb = table_checksum(a).first(), table_checksum(b).first()
    assert (ra["checksum_hi"], ra["checksum_lo"], ra["n_rows"]) == (
        rb["checksum_hi"],
        rb["checksum_lo"],
        rb["n_rows"],
    )
    assert ra["n_rows"] == 500


def test_table_checksum_detects_single_cell_change(spark):
    rows = [(i, f"name{i}") for i in range(100)]
    a = spark.createDataFrame(rows, "k bigint, s string")
    changed = [(i, "nameX" if i == 42 else f"name{i}") for i in range(100)]
    b = spark.createDataFrame(changed, "k bigint, s string")
    assert table_checksum(a).first() != table_checksum(b).first()


def test_table_checksum_column_boundaries_unambiguous(spark):
    """A bare '|' join would render ('a|b','c') and ('a','b|c') identically;
    the length-prefixed canonical form must distinguish them."""
    a = spark.createDataFrame([("a|b", "c")], "x string, y string")
    b = spark.createDataFrame([("a", "b|c")], "x string, y string")
    assert table_checksum(a).first() != table_checksum(b).first()
    # same shape with the length prefix's own delimiter in the data
    c = spark.createDataFrame([("1:x", "y")], "x string, y string")
    d = spark.createDataFrame([("1", "x:y")], "x string, y string")
    assert table_checksum(c).first() != table_checksum(d).first()


def test_table_checksum_null_vs_literal(spark):
    """NULL must not collide with any string rendering of null."""
    a = spark.createDataFrame([(1, None)], "k bigint, s string")
    b = spark.createDataFrame([(1, "\x01NULL")], "k bigint, s string")
    c = spark.createDataFrame([(1, "NULL")], "k bigint, s string")
    ca, cb, cc = (table_checksum(x).first() for x in (a, b, c))
    # the sentinel itself is the one unavoidable collision; a plain "NULL"
    # string must differ
    assert ca == cb and ca != cc


# --- bitmap distinct plan shape -----------------------------------------------


def test_prefix_jaccard_plan_no_cartesian_no_python(spark):
    """The candidate stage must stay an equi-join (the whole point of the
    prefix filter) and the verify must stay JVM array ops."""
    from airflow_dags_spark.plans import registry

    registry.load_all()
    df = registry.QUERIES["dedup_prefix_jaccard"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bitmap_distinct_no_expand(spark):
    """The bitmap strategy must not fall back to Expand (the expand-based
    COUNT DISTINCT shape) — two hash aggregates over bitmaps only."""
    from airflow_dags_spark.plans import registry

    registry.load_all()
    df = registry.QUERIES["agg_bitmap_distinct"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


# --- bucketed weighted median -------------------------------------------------


def test_weighted_median_bucketed_equals_window_form(spark):
    """The bucketed refinement must pick the IDENTICAL crossing row as the
    full per-group cumulative window, including under ties and repeated
    values."""
    from pyspark.sql import Window as W

    from airflow_dags_spark.functions.scalable_windows import (
        weighted_median_bucketed,
    )

    rows = []
    for g in ("a", "b", "c"):
        for i in range(400):
            rows.append((g, float((i * 7) % 50), float(1 + i % 5), i))
    # degenerate group: single repeated value
    rows += [("d", 3.0, 2.0, i) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, v double, w double, tie bigint")
    got = {
        (r["g"], r["weighted_median"])
        for r in weighted_median_bucketed(df, "g", "v", "w", ["tie"], 16).collect()
    }
    wc = W.partitionBy("g").orderBy("v", "tie").rowsBetween(
        W.unboundedPreceding, 0
    )
    wt = W.partitionBy("g")
    want = {
        (r["g"], r["wm"])
        for r in df.select(
            "g",
            F.col("v"),
            F.sum("w").over(wc).alias("cw"),
            F.sum("w").over(wt).alias("tw"),
        )
        .where(F.col("cw") >= F.col("tw") / 2.0)
        .groupBy("g")
        .agg(F.min("v").alias("wm"))
        .collect()
    }
    assert got == want and len(got) == 4


def test_weighted_median_bucketed_ignores_nulls(spark):
    from airflow_dags_spark.functions.scalable_windows import (
        weighted_median_bucketed,
    )

    rows = [("a", 1.0, 1.0, 0), ("a", None, 5.0, 1), ("a", 9.0, None, 2),
            ("a", 2.0, 1.0, 3), ("a", 3.0, 1.0, 4)]
    df = spark.createDataFrame(rows, "g string, v double, w double, tie bigint")
    got = weighted_median_bucketed(df, "g", "v", "w", ["tie"], 4).collect()
    assert [(r["g"], r["weighted_median"]) for r in got] == [("a", 2.0)]


def test_equidepth_global_no_table_sized_single_partition(spark):
    """Global exact ntile through bucketed ranks: the only SinglePartition
    exchange feeds the |buckets|-row offset cascade (below it sits the
    bucket-totals HashAggregate), never the orders table; the full-table
    window partitions by bucket and the offsets come back via broadcast."""
    from airflow_dags_spark.plans import registry

    registry.load_all()
    df = registry.QUERIES["agg_equidepth_global"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "Window" in plan
    for s in plan.split("Exchange SinglePartition")[1:]:
        below = s.split("Exchange")[0]
        assert "HashAggregate" in below or "AQEShuffleRead" in below, plan

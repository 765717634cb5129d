"""Mergeable sketch aggregates (plans/sketches.py): accuracy bounds vs
exact answers, and the merge law (union-of-sketches ≈ sketch-of-union)
that makes them the 100 TB pre-aggregation primitive."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_dags_spark.plans import registry

registry.load_all()

SF_DIR = "/root/testdata/sf0.001"


def test_hll_daily_estimates_within_bound(spark):
    rows = registry.QUERIES["sketch_hll_daily_users"](spark, SF_DIR).collect()
    per_day = {r["day"]: r["est_users"] for r in rows if r["day"] is not None}
    merged = [r["est_users"] for r in rows if r["day"] is None]
    assert len(merged) == 1

    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exact_per_day = {
        r["day"]: r["n"]
        for r in e.groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact_total = e.agg(F.countDistinct("user_id")).first()[0]
    assert set(per_day) == set(exact_per_day)
    for day, est in per_day.items():
        # default lgConfigK=12 → relative error well under 5% at these sizes
        assert abs(est - exact_per_day[day]) <= max(2, 0.05 * exact_per_day[day])
    assert abs(merged[0] - exact_total) <= max(2, 0.05 * exact_total)


def test_hll_union_of_sketches_matches_sketch_of_union(spark):
    """The merge law: estimating after hll_union_agg over per-day sketches
    must equal sketching the whole column at once (same lgConfigK)."""
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    merged = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .first()["est"]
    )
    direct = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).first()["est"]
    assert merged == direct


def test_kll_quantiles_within_rank_tolerance(spark):
    rows = registry.QUERIES["sketch_kll_price_quantiles"](spark, SF_DIR).collect()
    out = {r["o_orderpriority"]: r for r in rows}
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n = o.count()
    prices = sorted(r[0] for r in o.select("o_totalprice").collect())

    def exact_rank(v):  # fraction of values <= v
        import bisect

        return bisect.bisect_right(prices, v) / n

    all_row = out["ALL"]
    # KLL default k=200 → rank error ~1.65%; allow 3%
    for q, col in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
        assert abs(exact_rank(all_row[col]) - q) < 0.03


def test_kll_merged_equals_single_sketch_ranks(spark):
    """Merged per-group KLL quantiles stay within rank tolerance of the
    exact global quantile — the property that lets per-day sketches answer
    yearly percentile queries."""
    rows = registry.QUERIES["sketch_kll_price_quantiles"](spark, SF_DIR).collect()
    groups = [r for r in rows if r["o_orderpriority"] != "ALL"]
    assert len(groups) == 5  # TPC-H priorities
    for r in groups:
        assert r["p50"] <= r["p95"] <= r["p99"]


def test_theta_per_source_estimates(spark):
    rows = registry.QUERIES["sketch_theta_source_overlap"](spark, SF_DIR).collect()
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from airflow_dags_spark.functions.text import fingerprint

    exact = {
        r["source"]: r["n"]
        for r in d.select("source", fingerprint("text").alias("fp"))
        .groupBy("source")
        .agg(F.countDistinct("fp").alias("n"))
        .collect()
    }
    got = {r["source"]: r["est_distinct_docs"] for r in rows}
    assert set(got) == set(exact)
    for s, est in got.items():
        # theta sketches are EXACT below the sampling threshold (~4k)
        assert abs(est - exact[s]) <= max(1, 0.05 * exact[s])


# ---------------------------------------------------------------------------
# Portable Bloom / Count-Min (functions/probabilistic.py)
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    from airflow_dags_spark.functions.probabilistic import (
        bloom_build,
        bloom_might_contain,
    )

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    bloom = bloom_build(o, "o_custkey")
    # at tiny SF every customer has orders — add definitely-absent keys so
    # the false-positive branch is exercised
    probes = c.select("c_custkey").unionByName(
        c.select((F.col("c_custkey") + 10_000_000).alias("c_custkey"))
    )
    probed = bloom_might_contain(bloom, probes, "c_custkey")
    present = {r[0] for r in o.select("o_custkey").distinct().collect()}
    rows = probed.collect()
    fp = 0
    absent = 0
    for r in rows:
        if r["c_custkey"] in present:
            assert r["might_contain"], "Bloom false negative is impossible"
        else:
            absent += 1
            fp += int(r["might_contain"])
    assert absent > 0
    # m=65536, k=4 sized for ~4% FP at sf0.1; tiny sf0.001 load → well under
    assert fp <= max(2, 0.1 * absent)


def test_bloom_merge_equals_bloom_of_union(spark):
    from airflow_dags_spark.functions.probabilistic import bloom_build, bloom_merge

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    left = o.where(F.col("o_orderkey") % 2 == 0)
    right = o.where(F.col("o_orderkey") % 2 == 1)
    merged = bloom_merge(
        bloom_build(left, "o_custkey"), bloom_build(right, "o_custkey")
    )
    whole = bloom_build(o, "o_custkey")
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in whole.collect()}


def test_cms_overestimates_and_merge_law(spark):
    from airflow_dags_spark.functions.probabilistic import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    cms = cms_build(li, "l_suppkey")
    truth = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = cms_estimate(cms, truth, "l_suppkey").collect()
    assert est, "no keys estimated"
    for r in est:
        assert r["cms_est"] >= r["true_cnt"], f"CMS underestimated {r}"

    halves = [li.where(F.col("l_orderkey") % 2 == i) for i in (0, 1)]
    merged = cms_merge(*[cms_build(h, "l_suppkey") for h in halves])
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in cms.collect()}


def test_cms_exact_when_width_exceeds_cardinality_margin(spark):
    """With enough width the chance of a full-depth collision chain is
    negligible — estimates collapse to exact counts (sanity of the min-rule)."""
    from airflow_dags_spark.functions.probabilistic import cms_build, cms_estimate

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    cms = cms_build(li, "l_suppkey", depth=6, width=1 << 16)
    truth = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("true_cnt"))
    for r in cms_estimate(cms, truth, "l_suppkey", depth=6, width=1 << 16).collect():
        assert r["cms_est"] == r["true_cnt"]


def test_kll_outlier_gate_close_to_exact(spark):
    """The sketch-fence gate flags (almost) the same rows as the exact
    IQR gate — only near-fence rows may flip, bounded by KLL rank error."""
    exact = {
        r["o_orderkey"]
        for r in registry.QUERIES["outlier_iqr_gate"](spark, SF_DIR).collect()
    }
    approx = {
        r["o_orderkey"]
        for r in registry.QUERIES["outlier_kll_gate"](spark, SF_DIR).collect()
    }
    n = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    sym = len(exact ^ approx)
    assert sym <= max(3, 0.02 * n), (len(exact), len(approx), sym)


def test_cms_join_size_estimate_upper_bound_and_exactness(spark):
    """AMS inner-product estimator: always ≥ the true equi-join size;
    exact when the width is large enough that no two keys collide."""
    from airflow_dags_spark.functions.probabilistic import (
        cms_build,
        cms_join_size_estimate,
    )

    a = spark.createDataFrame([(i % 20,) for i in range(400)], "k bigint")
    b = spark.createDataFrame([(i % 30,) for i in range(300)], "k bigint")
    truth = a.join(b, "k").count()

    est = cms_join_size_estimate(
        cms_build(a, "k"), cms_build(b, "k")
    ).first()["est_join_size"]
    assert est >= truth  # CMS never underestimates an inner product

    # wide sketch ⇒ 50 distinct keys can't collide in 2^20 buckets (w.h.p.)
    wide_a = cms_build(a, "k", width=1 << 20)
    wide_b = cms_build(b, "k", width=1 << 20)
    exact = cms_join_size_estimate(wide_a, wide_b).first()["est_join_size"]
    assert exact == truth

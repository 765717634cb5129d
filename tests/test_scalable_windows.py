"""Single-reducer-killer window rewrites (functions/scalable_windows.py):
results must be identical to the naive global/per-key windows, including
under pathological skew."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from airflow_dags_spark.functions.scalable_windows import (
    bucketed_running_sum,
    salted_topn_per_key,
)


def test_bucketed_running_sum_matches_global_window(spark):
    df = spark.createDataFrame(
        [(i, i % 37, float((i * 7) % 100)) for i in range(5000)],
        "id bigint, day int, v double",
    ).repartition(13)
    got = bucketed_running_sum(df, "v", ["day", "id"], F.col("day"))
    w = Window.orderBy("day", "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("running_sum", F.sum("v").over(w))
    g = {r["id"]: r["running_sum"] for r in got.collect()}
    wv = {r["id"]: r["running_sum"] for r in want.collect()}
    assert g == wv


def test_bucketed_running_sum_single_bucket_degenerates(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(50)], "id bigint, v double")
    got = sorted(
        (r["id"], r["running_sum"])
        for r in bucketed_running_sum(df, "v", ["id"], F.lit(1)).collect()
    )
    assert got == [(i, float(i * (i + 1) // 2)) for i in range(50)]


def test_salted_topn_exact_under_hot_key(spark):
    # one key holds 90% of rows — the scenario the salting exists for
    rows = [(0, i, float(i % 997)) for i in range(9000)] + [
        (k, 10_000 + k * 10 + j, float(j)) for k in range(1, 20) for j in range(5)
    ]
    df = spark.createDataFrame(rows, "k bigint, id bigint, v double").repartition(16)
    order = [F.col("v").desc(), F.col("id").asc()]
    got = sorted(
        map(tuple, salted_topn_per_key(df, "k", order, 3, salt_src="id").collect())
    )
    w = Window.partitionBy("k").orderBy(*order)
    want = sorted(
        map(
            tuple,
            df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .drop("rn")
            .collect(),
        )
    )
    assert got == want
    assert len(got) == 3 + 19 * 3


def test_salted_topn_n_larger_than_group(spark):
    df = spark.createDataFrame([(1, 1, 1.0), (1, 2, 2.0)], "k bigint, id bigint, v double")
    got = salted_topn_per_key(
        df, "k", [F.col("v").desc(), F.col("id").asc()], 10, salt_src="id"
    )
    assert got.count() == 2  # keeps everything when the group is small


def test_grouped_running_sum_equals_plain_per_key_window(spark):
    """bucketed_running_sum_grouped ≡ a per-key cumulative window, for
    every key, including keys that span buckets and single-row keys."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from airflow_dags_spark.functions.scalable_windows import (
        bucketed_running_sum_grouped,
    )

    rows = [
        (k, float(v), i)
        for i, (k, v) in enumerate(
            [("a", 5), ("a", 1), ("a", 9), ("a", 1), ("b", 2), ("b", 8),
             ("c", 7)]
        )
    ]
    df = spark.createDataFrame(rows, "k string, v double, id bigint")
    got = bucketed_running_sum_grouped(
        df.withColumn("__one", F.lit(1)),
        "__one",
        ["k"],
        ["v", "id"],
        F.floor(F.col("v") / 3).cast("int"),
        "rnk",
    )
    w = Window.partitionBy("k").orderBy("v", "id")
    want = df.withColumn("rnk", F.row_number().over(w))
    lhs = {(r["k"], r["id"]): r["rnk"] for r in got.collect()}
    rhs = {(r["k"], r["id"]): r["rnk"] for r in want.collect()}
    assert lhs == rhs

"""Maintenance operators: CDC table diff, small-file compaction, z-order
clustering. All self-verifying round-trips (the diff additionally has a
DuckDB oracle via the cdc_table_diff driver query)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from airflow_dags_spark.operators.maintenance import (
    clustering_quality,
    compact,
    table_diff,
    zorder_layout,
)


# --- table_diff --------------------------------------------------------------


def test_table_diff_classifies_all_change_types(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", None)],
        "k int, name string, price double",
    )
    new = spark.createDataFrame(
        [(2, "b", 25.0), (3, "c", 30.0), (5, "e", 50.0), (4, "d", None)],
        "k int, name string, price double",
    )
    got = {
        (r["k"], r["change_type"], r["old_price"], r["new_price"])
        for r in table_diff(old, new, ["k"]).collect()
    }
    # k=3 and k=4 unchanged (4 has NULL==NULL null-safely) → dropped
    assert got == {
        (1, "delete", 10.0, None),
        (2, "update", 20.0, 25.0),
        (5, "insert", None, 50.0),
    }


def test_table_diff_null_value_transitions(spark):
    old = spark.createDataFrame([(1, None), (2, 5.0)], "k int, v double")
    new = spark.createDataFrame([(1, 1.0), (2, None)], "k int, v double")
    got = {
        (r["k"], r["change_type"], r["old_v"], r["new_v"])
        for r in table_diff(old, new, ["k"]).collect()
    }
    assert got == {(1, "update", None, 1.0), (2, "update", 5.0, None)}


def test_table_diff_identical_snapshots_empty(spark):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    assert table_diff(df, df, ["id"]).isEmpty()


# --- compact -----------------------------------------------------------------


def test_compact_shrinks_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    # 40 tiny files
    spark.range(4000).withColumn("v", F.col("id") % 7).repartition(
        40
    ).write.parquet(path)
    before = spark.read.parquet(path)
    checksum = before.agg(
        F.count("*").alias("n"), F.sum(F.col("id") * F.col("v")).alias("s")
    ).first()

    stats = compact(spark, path, target_file_bytes=1 << 30)
    assert not stats["skipped"]
    assert stats["files_before"] == 40
    assert stats["files_after"] < stats["files_before"]

    after = spark.read.parquet(path)
    got = after.agg(
        F.count("*").alias("n"), F.sum(F.col("id") * F.col("v")).alias("s")
    ).first()
    assert (got["n"], got["s"]) == (checksum["n"], checksum["s"])

    # second run is a no-op (idempotent to schedule unconditionally)
    stats2 = compact(spark, path, target_file_bytes=1 << 30)
    assert stats2["skipped"]
    assert stats2["files_after"] == stats["files_after"]


# --- zorder_layout -----------------------------------------------------------


def test_zorder_clusters_both_columns(spark):
    rng = random.Random(7)
    rows = [
        (rng.randrange(0, 10_000), rng.randrange(0, 10_000))
        for _ in range(20_000)
    ]
    df = spark.createDataFrame(rows, "x long, y long")

    z = zorder_layout(df, ["x", "y"], n_files=16)
    # row preservation
    assert z.count() == df.count()
    assert z.columns == ["x", "y"]

    q_z = clustering_quality(z, ["x", "y"])
    q_raw = clustering_quality(df.repartition(16), ["x", "y"])
    # random layout: every partition spans ~the whole 2-D domain (q ≈ 1).
    # 16 z-range files over a 2-D square should each cover a small tile.
    assert q_raw > 0.8
    assert q_z < 0.25, f"z-order quality {q_z} vs random {q_raw}"


def test_zorder_single_column_is_range_sort(spark):
    df = spark.range(0, 5000).select(
        F.col("id").alias("x"), (F.col("id") % 3).alias("y")
    )
    z = zorder_layout(df, ["x"], n_files=8)
    q = clustering_quality(z, ["x"])
    assert q < 0.2


def test_zorder_constant_column_no_crash(spark):
    df = spark.range(100).select(
        F.lit(5).alias("x"), F.col("id").alias("y")
    )
    z = zorder_layout(df, ["x", "y"], n_files=4)
    assert z.count() == 100


# --- incremental view maintenance -------------------------------------------


def _ivm_roundtrip(spark, old_rows, new_rows):
    """Maintain sum/cnt grouped by g incrementally; must equal recompute."""
    from airflow_dags_spark.operators.maintenance import (
        agg_delta,
        agg_state,
        merge_agg_state,
    )

    schema = "k int, g int, v double"
    old = spark.createDataFrame(old_rows or [], schema)
    new = spark.createDataFrame(new_rows or [], schema)
    state = agg_state(old, {"g": F.col("g")}, F.col("v"))
    changes = table_diff(old, new, ["k"], compare_cols=["g", "v"])
    delta = agg_delta(
        changes,
        {"g": F.col("old_g")},
        {"g": F.col("new_g")},
        F.col("old_v"),
        F.col("new_v"),
    )
    def canon(df):
        return {
            (
                r["g"],
                None if r["sum_v"] is None else float(r["sum_v"]),
                r["nn"],
                r["cnt"],
            )
            for r in df.collect()
        }

    got = canon(merge_agg_state(state, delta, ["g"]))
    expected = canon(agg_state(new, {"g": F.col("g")}, F.col("v")))
    assert got == expected, f"{got} != {expected}"


def test_ivm_matches_recompute_basic(spark):
    _ivm_roundtrip(
        spark,
        old_rows=[(1, 0, 10.0), (2, 0, 20.0), (3, 1, 30.0)],
        new_rows=[(1, 0, 15.0), (3, 1, 30.0), (4, 1, 40.0)],
    )


def test_ivm_group_migration(spark):
    # row 1 moves from group 0 to group 1: retract(old)+assert(new)
    _ivm_roundtrip(
        spark,
        old_rows=[(1, 0, 10.0), (2, 0, 20.0)],
        new_rows=[(1, 1, 10.0), (2, 0, 20.0)],
    )


def test_ivm_group_vanishes(spark):
    # all of group 1 deleted → group must disappear from state
    _ivm_roundtrip(
        spark,
        old_rows=[(1, 0, 10.0), (3, 1, 30.0), (4, 1, 5.0)],
        new_rows=[(1, 0, 10.0)],
    )


def test_ivm_null_values_counted_not_summed(spark):
    _ivm_roundtrip(
        spark,
        old_rows=[(1, 0, None), (2, 0, 20.0)],
        new_rows=[(1, 0, 7.0), (2, 0, None), (5, 2, None)],
    )


# --- text chunking / redaction edges ----------------------------------------


def test_chunk_text_short_and_empty_docs(spark):
    from airflow_dags_spark.functions.text import chunk_text

    df = spark.createDataFrame(
        [(1, ""), (2, "one two"), (3, " ".join(f"t{i}" for i in range(10)))],
        "doc_id int, text string",
    )
    rows = chunk_text(df, "text", "doc_id", chunk_size=4, overlap=1).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # every doc yields at least one chunk (empty text → one ['' ] token)
    assert set(by_doc) == {1, 2, 3}
    assert len(by_doc[1]) == 1 and by_doc[1][0]["chunk"] == ""
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk"] == "one two"
    # stride 3 over 10 tokens → starts 1,4,7,10
    starts = sorted(r["start_pos"] for r in by_doc[3])
    assert starts == [1, 4, 7, 10]
    # overlap=1: consecutive chunks share exactly one token
    c0, c1 = (
        by_doc[3][0]["chunk"].split(" "),
        by_doc[3][1]["chunk"].split(" "),
    )
    assert c0[-1] == c1[0]
    # final short chunk
    last = max(by_doc[3], key=lambda r: r["start_pos"])
    assert last["n_tokens"] == 1


def test_redact_pii_patterns(spark):
    from airflow_dags_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b-c_d%x+1@sub.domain.co.uk now"),
            (2, "call +1 555-123-4567 today"),
            (3, "no pii here at all"),
        ],
        "k int, s string",
    )
    got = {r["k"]: r["out"] for r in df.select("k", redact_pii("s").alias("out")).collect()}
    assert got[1] == "mail <EMAIL> now"
    assert got[2] == "call <PHONE> today"
    assert got[3] == "no pii here at all"


# ---------------------------------------------------------------------------
# File-level data skipping (operators/skipping.py)
# ---------------------------------------------------------------------------


def _write_range_sorted(spark, path: str, n_files: int = 8):
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    (
        o.repartitionByRange(n_files, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    return o


def test_file_stats_cover_all_rows(spark, tmp_path):
    from airflow_dags_spark.operators.skipping import collect_file_stats

    path = str(tmp_path / "t")
    o = _write_range_sorted(spark, path)
    stats = collect_file_stats(spark, path, ["o_orderdate", "o_totalprice"])
    rows = stats.collect()
    assert len(rows) == 8
    assert sum(r["n_rows"] for r in rows) == o.count()
    for r in rows:
        assert r["min_o_orderdate"] <= r["max_o_orderdate"]


def test_skipping_prunes_files_and_matches_full_scan(spark, tmp_path):
    import datetime as dt

    from airflow_dags_spark.operators.skipping import (
        collect_file_stats,
        prune_files,
        read_with_skipping,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    o = _write_range_sorted(spark, path)
    stats = collect_file_stats(spark, path, ["o_orderdate"])
    lo, hi = dt.date(1995, 6, 1), dt.date(1995, 8, 31)

    kept = prune_files(stats, "o_orderdate", lo, hi)
    assert 0 < len(kept) < 8, f"range-sorted layout should prune files: {kept}"

    got = read_with_skipping(spark, path, "o_orderdate", lo, hi, stats=stats)
    want = o.where(
        (F.col("o_orderdate") >= F.lit(lo)) & (F.col("o_orderdate") <= F.lit(hi))
    )
    assert sorted(r["o_orderkey"] for r in got.collect()) == sorted(
        r["o_orderkey"] for r in want.collect()
    )


def test_skipping_empty_range_returns_empty_with_schema(spark, tmp_path):
    import datetime as dt

    from airflow_dags_spark.operators.skipping import read_with_skipping

    path = str(tmp_path / "t")
    _write_range_sorted(spark, path)
    got = read_with_skipping(
        spark, path, "o_orderdate", dt.date(2099, 1, 1), dt.date(2099, 2, 1)
    )
    assert got.count() == 0
    assert "o_orderkey" in got.columns


def test_skipping_open_ended_bounds(spark, tmp_path):
    import datetime as dt

    from airflow_dags_spark.operators.skipping import (
        collect_file_stats,
        read_with_skipping,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    o = _write_range_sorted(spark, path)
    stats = collect_file_stats(spark, path, ["o_orderdate"])
    hi = dt.date(1993, 1, 1)
    got = read_with_skipping(spark, path, "o_orderdate", None, hi, stats=stats)
    want = o.where(F.col("o_orderdate") <= F.lit(hi)).count()
    assert got.count() == want


def test_skipping_keeps_all_null_stat_files(spark, tmp_path):
    """A file whose column is entirely NULL has NULL min/max — it must be
    kept (cannot prove non-overlap), and the residual filter drops its rows."""
    from airflow_dags_spark.operators.skipping import (
        collect_file_stats,
        prune_files,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    base = spark.range(100).select(
        F.col("id"),
        F.when(F.col("id") < 50, F.col("id")).alias("v"),
    )
    base.where("id < 50").coalesce(1).write.mode("overwrite").parquet(path)
    base.where("id >= 50").coalesce(1).write.mode("append").parquet(path)
    stats = collect_file_stats(spark, path, ["v"])
    assert stats.count() == 2
    kept = prune_files(stats, "v", 10, 20)
    assert len(kept) == 2  # null-stats file conservatively survives


# ---------------------------------------------------------------------------
# Schema-evolution reader (sources/tables.py:read_evolved)
# ---------------------------------------------------------------------------


def test_read_evolved_added_column_and_widened_int(spark, tmp_path):
    from airflow_dags_spark.sources.tables import read_evolved

    v1 = str(tmp_path / "v1")
    v2 = str(tmp_path / "v2")
    spark.createDataFrame([(1, 10)], "id int, n int").write.parquet(v1)
    spark.createDataFrame(
        [(2, 20_000_000_000, "x")], "id int, n bigint, tag string"
    ).write.parquet(v2)
    out = read_evolved(spark, v1, v2)
    assert dict(out.dtypes) == {"id": "int", "n": "bigint", "tag": "string"}
    rows = {r["id"]: (r["n"], r["tag"]) for r in out.collect()}
    assert rows == {1: (10, None), 2: (20_000_000_000, "x")}


def test_read_evolved_float_widening_and_retired_column(spark, tmp_path):
    from airflow_dags_spark.sources.tables import read_evolved

    v1 = str(tmp_path / "v1")
    v2 = str(tmp_path / "v2")
    spark.createDataFrame([(1, 1.5, "old")], "id int, x float, legacy string").write.parquet(v1)
    spark.createDataFrame([(2, 2.5)], "id int, x double").write.parquet(v2)
    out = read_evolved(spark, v1, v2)
    assert dict(out.dtypes)["x"] == "double"
    rows = {r["id"]: (r["x"], r["legacy"]) for r in out.collect()}
    assert rows[2] == (2.5, None)
    assert rows[1][1] == "old"


def test_read_evolved_incompatible_drift_raises(spark, tmp_path):
    import pytest

    from airflow_dags_spark.sources.tables import read_evolved

    v1 = str(tmp_path / "v1")
    v2 = str(tmp_path / "v2")
    spark.createDataFrame([(1, "s")], "id int, v string").write.parquet(v1)
    spark.createDataFrame([(2, 3)], "id int, v int").write.parquet(v2)
    with pytest.raises(TypeError, match="incompatible schema drift"):
        read_evolved(spark, v1, v2)


def test_join_delta_old_plus_delta_equals_new(spark):
    """The IVM law: old_view ∪ Δ == new_view, on real tables."""
    from airflow_dags_spark.operators.maintenance import join_delta
    from pyspark.sql import functions as F

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", F.col("o_custkey").alias("cust")
    )
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").select(
        F.col("c_custkey").alias("cust"), "c_name"
    )
    a_old, d_a = o.where("o_orderkey % 4 != 0"), o.where("o_orderkey % 4 = 0")
    b_old, d_b = c.where("cust % 5 != 0"), c.where("cust % 5 = 0")
    delta = join_delta(a_old, d_a, b_old, d_b, "cust")
    old_view = a_old.join(b_old, "cust")
    new_view = o.join(c, "cust")
    got = sorted(map(tuple, old_view.unionByName(delta).collect()))
    want = sorted(map(tuple, new_view.collect()))
    assert got == want
    # the three legs are disjoint: no joined row counted twice
    assert delta.count() == delta.distinct().count()

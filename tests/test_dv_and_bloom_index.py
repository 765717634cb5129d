"""Deletion vectors (ParquetTable.logical_delete family) and the per-file
Bloom index for point-lookup file pruning (operators/skipping.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from airflow_dags_spark.operators.skipping import (
    collect_file_blooms,
    point_lookup,
    prune_files_bloom,
)
from airflow_dags_spark.operators.upsert import ParquetTable


# --- deletion vectors ---------------------------------------------------------


def _t(spark, tmp_path, **kw):
    t = ParquetTable(spark, str(tmp_path / "t"), "id", **kw)
    t.create_if_not_exists(
        spark.createDataFrame(
            [(i, f"v{i}", i % 3) for i in range(30)], "id bigint, v string, p int"
        )
    )
    return t


def test_logical_delete_hides_rows_without_rewriting_files(spark, tmp_path):
    t = _t(spark, tmp_path)
    files_before = sorted(os.listdir(t.path))
    n = t.logical_delete(spark.createDataFrame([(3,), (7,), (7,)], "id bigint"))
    assert n == 2  # distinct keys
    # data files untouched — the whole point
    assert sorted(os.listdir(t.path)) == files_before
    assert t.read().count() == 30  # physical
    cur = {r["id"] for r in t.read_current().collect()}
    assert cur == set(range(30)) - {3, 7}


def test_logical_delete_accumulates_and_compacts(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.logical_delete(spark.createDataFrame([(1,)], "id bigint"))
    t.logical_delete(spark.createDataFrame([(2,), (1,)], "id bigint"))
    assert {r["id"] for r in t.read_current().collect()} == set(range(30)) - {1, 2}
    applied = t.compact_dv()
    assert applied == 2
    # physically gone, sidecar cleared, reads agree
    assert t.read().count() == 28
    assert t.read_current().count() == 28
    assert not os.path.exists(t.path + ".dv")
    assert t.compact_dv() == 0  # idempotent


def test_restore_keys_undeletes(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.logical_delete(spark.createDataFrame([(5,), (6,)], "id bigint"))
    t.restore_keys(spark.createDataFrame([(5,)], "id bigint"))
    cur = {r["id"] for r in t.read_current().collect()}
    assert 5 in cur and 6 not in cur


def test_logical_delete_case_insensitive_normalizes(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "ci"), "id", case_insensitive=True)
    t.create_if_not_exists(
        spark.createDataFrame([("Abc", 1), ("def", 2)], "id string, v int")
    )
    t.logical_delete(spark.createDataFrame([("ABC",)], "id string"))
    assert [r["id"] for r in t.read_current().collect()] == ["def"]


def test_compact_dv_partitioned_rewrites_only_touched(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "p"), "id", partition_by=["p"])
    t.create_if_not_exists(
        spark.createDataFrame(
            [(i, f"v{i}", i % 3) for i in range(30)], "id bigint, v string, p int"
        )
    )
    t.logical_delete(spark.createDataFrame([(0,), (3,)], "id bigint"))  # p=0 only
    untouched = str(tmp_path / "p" / "p=1")
    mtimes = {f: os.path.getmtime(os.path.join(untouched, f))
              for f in os.listdir(untouched)}
    t.compact_dv()
    assert {r["id"] for r in t.read().collect()} == set(range(30)) - {0, 3}
    after = {f: os.path.getmtime(os.path.join(untouched, f))
             for f in os.listdir(untouched)}
    assert after == mtimes  # untouched partition's files not rewritten


# --- per-file Bloom index -----------------------------------------------------


@pytest.fixture()
def sharded(spark, tmp_path):
    """10 files, ids range-clustered so point lookups are prunable."""
    p = str(tmp_path / "sharded")
    (
        spark.createDataFrame([(i, f"d{i}") for i in range(1000)], "id bigint, v string")
        .repartitionByRange(10, "id")
        .write.parquet(p)
    )
    return p


def test_bloom_index_no_false_negatives(spark, sharded):
    blooms = collect_file_blooms(spark, sharded, "id").cache()
    all_files = {r["file_path"] for r in blooms.select("file_path").distinct().collect()}
    assert len(all_files) == 10
    for probe in (0, 137, 999):
        files = prune_files_bloom(blooms, "id", probe)
        # the file that truly holds the id must survive
        truth = (
            spark.read.parquet(sharded)
            .select(F.col("_metadata.file_path").alias("fp"), "id")
            .where(F.col("id") == probe)
            .collect()
        )
        assert truth and truth[0]["fp"] in files


def test_bloom_index_prunes_most_files(spark, sharded):
    blooms = collect_file_blooms(spark, sharded, "id").cache()
    survivors = prune_files_bloom(blooms, "id", 500)
    # 16 Kbit / 100 ids per file: FP rate tiny — nearly all 10 files pruned
    assert 1 <= len(survivors) <= 3


def test_point_lookup_exact_and_bounded(spark, sharded):
    got = point_lookup(spark, sharded, "id", 777).collect()
    assert [(r["id"], r["v"]) for r in got] == [(777, "d777")]
    # absent value → empty result (schema preserved), usually zero files read
    missing = point_lookup(spark, sharded, "id", 10_000_000)
    assert missing.count() == 0
    assert missing.columns == ["id", "v"]

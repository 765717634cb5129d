"""Snapshot versioning (operators/versioning.py): time travel, atomic
pointer commits, O(1) rollback, shared-directory-aware vacuum; plus
ParquetTable.vacuum_orphans."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from airflow_dags_spark.operators.versioning import VersionedParquetTable


def _t(spark, tmp_path):
    return VersionedParquetTable(spark, str(tmp_path / "vt"))


def _df(spark, *vals):
    return spark.createDataFrame([(v,) for v in vals], "v bigint")


def test_write_read_time_travel(spark, tmp_path):
    t = _t(spark, tmp_path)
    assert t.current_version() == 0
    t.write(_df(spark, 1, 2))
    t.write(_df(spark, 3))
    assert t.current_version() == 2
    assert sorted(r["v"] for r in t.read().collect()) == [3]
    assert sorted(r["v"] for r in t.read(version=1).collect()) == [1, 2]


def test_rollback_is_pointer_only(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.write(_df(spark, 1))
    t.write(_df(spark, 2))
    v2_dir = str(tmp_path / "vt" / "v=000002")
    files_before = sorted(os.listdir(v2_dir))
    t.rollback(1)
    assert t.current_version() == 1
    assert [r["v"] for r in t.read().collect()] == [1]
    # no data moved or deleted by rollback
    assert sorted(os.listdir(v2_dir)) == files_before
    # roll forward again works too
    t.rollback(2)
    assert [r["v"] for r in t.read().collect()] == [2]


def test_write_after_rollback_allocates_fresh_version(spark, tmp_path):
    """Disaster-recovery path: rollback(to) then commit a repair. Version
    numbers must come from max-ever-committed + 1, not current + 1 — the
    latter collides with the still-existing v2 snapshot dir."""
    t = _t(spark, tmp_path)
    t.write(_df(spark, 1))  # v1
    t.write(_df(spark, 2))  # v2 (the "bad merge")
    t.rollback(1)
    v3 = t.write(_df(spark, 7))  # the repair commit must not collide with v2
    assert v3 == 3
    assert t.current_version() == 3
    assert [r["v"] for r in t.read().collect()] == [7]
    # full history retained: the bad v2 is still time-travelable
    assert [r["v"] for r in t.read(version=2).collect()] == [2]
    assert sorted(v["version"] for v in t.history()) == [1, 2, 3]


def test_write_incremental_after_rollback(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.write(_df(spark, 1))  # v1
    t.write_incremental(_df(spark, 2))  # v2 = v1+v2
    t.rollback(1)
    v3 = t.write_incremental(_df(spark, 9))  # builds on CURRENT (v1), id 3
    assert v3 == 3
    assert sorted(r["v"] for r in t.read().collect()) == [1, 9]


def test_rollback_to_missing_version_raises(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.write(_df(spark, 1))
    with pytest.raises(ValueError, match="missing version"):
        t.rollback(9)


def test_incremental_append_shares_directories(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.write(_df(spark, 1))
    t.write_incremental(_df(spark, 2))
    t.write_incremental(_df(spark, 3))
    assert sorted(r["v"] for r in t.read().collect()) == [1, 2, 3]
    # v2 = v1's files + new dir; v1 dir written exactly once (not rewritten)
    assert sorted(r["v"] for r in t.read(version=2).collect()) == [1, 2]
    assert sorted(r["v"] for r in t.read(version=1).collect()) == [1]


def test_vacuum_keeps_current_and_shared_dirs(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.write(_df(spark, 1))  # v1 (full)
    t.write_incremental(_df(spark, 2))  # v2 = v1+v2 dirs
    t.write(_df(spark, 9))  # v3 (full)
    t.write(_df(spark, 10))  # v4 (full)
    removed = t.vacuum(keep_last=2)
    assert sorted(removed) == [1, 2]
    # v1's directory was shared ONLY by dropped versions → gone
    assert not os.path.exists(str(tmp_path / "vt" / "v=000001"))
    assert sorted(r["v"] for r in t.read().collect()) == [10]
    assert sorted(r["v"] for r in t.read(version=3).collect()) == [9]
    with pytest.raises(ValueError, match="not found"):
        t.read(version=1)


def test_vacuum_retains_dir_shared_with_kept_version(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.write(_df(spark, 1))  # v1
    t.write_incremental(_df(spark, 2))  # v2 references v1's dir
    t.vacuum(keep_last=1)  # drops v1 as a VERSION...
    # ...but its directory survives because current v2 still reads it
    assert os.path.exists(str(tmp_path / "vt" / "v=000001"))
    assert sorted(r["v"] for r in t.read().collect()) == [1, 2]


def test_manifest_commit_is_atomic_single_file(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.write(_df(spark, 1))
    names = os.listdir(str(tmp_path / "vt"))
    assert "_manifest.json" in names
    # no leftover tmp manifests (the .crc sidecar is Hadoop's checksum file)
    assert not [
        n for n in names if n.startswith("._manifest") and not n.endswith(".crc")
    ]


def test_parquettable_vacuum_orphans(spark, tmp_path):
    from airflow_dags_spark.operators.upsert import ParquetTable

    path = str(tmp_path / "t")
    t = ParquetTable(spark, path, "v")
    t.create_if_not_exists(_df(spark, 1))
    # simulate crashed swaps
    os.makedirs(path + ".stage-deadbeef")
    os.makedirs(path + ".old-cafe01")
    removed = t.vacuum_orphans()
    assert sorted(removed) == ["t.old-cafe01", "t.stage-deadbeef"]
    assert not os.path.exists(path + ".stage-deadbeef")
    assert os.path.exists(path)  # live table untouched
    assert [r["v"] for r in t.read().collect()] == [1]


def test_version_diff_classifies_changes(spark, tmp_path):
    """Time travel × CDC: diff(v1 → v2) reports exactly what the commit
    did — the incident-review primitive after a bad merge."""
    t = _t(spark, tmp_path)
    t.write(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id bigint, val string"
        )
    )
    t.write(
        spark.createDataFrame(
            [(1, "a"), (2, "B2"), (4, "d")], "id bigint, val string"
        )
    )
    got = {
        r["id"]: r["change_type"]
        for r in t.diff("id", from_version=1, to_version=2).collect()
    }
    assert got == {2: "update", 3: "delete", 4: "insert"}
    # default to_version = current
    same = {
        r["id"]: r["change_type"] for r in t.diff("id", from_version=1).collect()
    }
    assert same == got
    # reverse direction inverts insert/delete
    rev = {
        r["id"]: r["change_type"]
        for r in t.diff("id", from_version=2, to_version=1).collect()
    }
    assert rev == {2: "update", 3: "insert", 4: "delete"}

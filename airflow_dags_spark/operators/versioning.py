"""Snapshot-versioned parquet tables: time travel, O(1) rollback, vacuum.

``ParquetTable`` (operators/upsert.py) gives keyed writes with an atomic
swap but destroys history — one bad merge and the prior state is gone. This
module adds the minimal manifest-pointer design the real table formats use
(Delta's _delta_log, Iceberg's metadata pointer), lakehouse-native and
Spark-first:

Layout::

    <path>/_manifest.json      {"current": N, "versions": [...]}
    <path>/v=000001/           immutable snapshot data (parquet)
    <path>/v=000002/
    ...

- ``write(df, op)``      — stage the new snapshot dir, then commit by
  atomically replacing the manifest (tmp-write + rename). Readers resolve
  the manifest first, so they see the old version until the rename lands —
  snapshot isolation with a single-file commit point, no locks.
- ``read(version=None)`` — current or any retained historical version
  (time travel). A plain parquet scan: pushdown/pruning intact.
- ``rollback(to)``       — O(1): rewrite the manifest pointer. No data
  copied, no rewrite — the disaster-recovery path after a bad merge.
- ``vacuum(keep_last)``  — delete snapshot dirs no longer reachable
  (always keeps the current pointer), bounding storage.

Concurrency contract: single-writer (the reference's Airflow DAGs are
serialized per-table by scheduling, SURVEY §3); multi-writer would need a
compare-and-swap on the manifest — noted, out of scope.

At 100 TB, full-snapshot versions are only sane for dimensions; for fact
tables the same manifest trick records per-version FILE LISTS (append =
old list + new files), which is exactly what ``ParquetTable.append`` +
zone-map stats (operators/skipping.py) compose into. ``write_incremental``
implements that: appended files join the NEW version's file list without
rewriting prior data.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession


class VersionedParquetTable:
    """Manifest-pointer versioned table (single writer)."""

    MANIFEST = "_manifest.json"

    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path.rstrip("/")

    # -- filesystem plumbing (Hadoop FS → works on s3a:// and hdfs:// too) --

    def _fs(self):
        sc = self.spark.sparkContext
        jvm = sc._jvm
        conf = sc._jsc.hadoopConfiguration()
        return jvm, jvm.org.apache.hadoop.fs.Path(self.path).getFileSystem(conf)

    def _read_manifest(self) -> dict:
        jvm, fs = self._fs()
        p = jvm.org.apache.hadoop.fs.Path(f"{self.path}/{self.MANIFEST}")
        if not fs.exists(p):
            return {"current": 0, "versions": []}
        stream = fs.open(p)
        try:
            # commons-io ships with Spark; py4j byte[] copy-back semantics
            # make manual buffered reads unreliable, this is the plain path
            text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
            return json.loads(text)
        finally:
            stream.close()

    def _commit_manifest(self, manifest: dict) -> None:
        """Atomic commit: write a tmp manifest, rename over the live one.
        The rename IS the transaction — a reader sees either the old or the
        new manifest, never a torn write."""
        jvm, fs = self._fs()
        hpath = jvm.org.apache.hadoop.fs.Path
        tmp = hpath(f"{self.path}/.{self.MANIFEST}.{uuid.uuid4().hex[:8]}")
        out = fs.create(tmp, True)
        try:
            out.write(json.dumps(manifest, indent=1).encode("utf-8"))
        finally:
            out.close()
        live = hpath(f"{self.path}/{self.MANIFEST}")
        if fs.exists(live):
            fs.delete(live, False)
        fs.rename(tmp, live)

    def _vdir(self, n: int) -> str:
        return f"{self.path}/v={n:06d}"

    # -- public API ---------------------------------------------------------

    def current_version(self) -> int:
        return int(self._read_manifest()["current"])

    @staticmethod
    def _next_version(m: dict) -> int:
        """Next unused version number. Allocated off the MAX ever committed,
        not ``current + 1`` — after ``rollback(to)`` the pointer moves back
        but earlier snapshot dirs still exist, and ``current + 1`` would
        collide with one of them (errorifexists raise / duplicate manifest
        entry). Rollback-then-repair must be able to commit."""
        if not m["versions"]:
            return 1
        return max(int(v["version"]) for v in m["versions"]) + 1

    def history(self) -> list[dict]:
        return list(self._read_manifest()["versions"])

    def write(self, df: DataFrame, op: str = "overwrite") -> int:
        """Commit ``df`` as the next full snapshot; returns its version."""
        m = self._read_manifest()
        n = self._next_version(m)
        df.write.mode("errorifexists").parquet(self._vdir(n))
        m["versions"].append({"version": n, "op": op, "paths": [self._vdir(n)]})
        m["current"] = n
        self._commit_manifest(m)
        return n

    def write_incremental(self, df: DataFrame, op: str = "append") -> int:
        """Commit ``df`` as NEW FILES joining the current file list — the
        fact-table path: prior snapshots' data is never rewritten; the new
        version's path list = previous list + the new directory."""
        m = self._read_manifest()
        cur = int(m["current"])
        prev_paths: list[str] = []
        for v in m["versions"]:
            if v["version"] == cur:
                prev_paths = list(v["paths"])
        n = self._next_version(m)
        df.write.mode("errorifexists").parquet(self._vdir(n))
        m["versions"].append(
            {"version": n, "op": op, "paths": prev_paths + [self._vdir(n)]}
        )
        m["current"] = n
        self._commit_manifest(m)
        return n

    def read(self, version: int | None = None) -> DataFrame:
        """Scan the current (default) or a historical version."""
        m = self._read_manifest()
        want = int(m["current"]) if version is None else int(version)
        for v in m["versions"]:
            if v["version"] == want:
                return self.spark.read.parquet(*v["paths"])
        raise ValueError(
            f"version {want} not found (retained: "
            f"{[v['version'] for v in m['versions']]})"
        )

    def diff(
        self,
        keys: list[str] | str,
        from_version: int,
        to_version: int | None = None,
        compare_cols: list[str] | None = None,
    ) -> DataFrame:
        """CDC between two retained versions: what changed from
        ``from_version`` to ``to_version`` (default: current) as
        (keys, change_type insert/delete/update, old_*/new_*) rows —
        time travel composed with the engine's table_diff, so an incident
        review answers "what did the bad merge actually do" from the
        version history alone, no external change log.

        Same scale shape as table_diff: ONE full-outer shuffle over
        keys + compare columns; both snapshot scans are plain parquet
        (pushdown intact)."""
        from airflow_dags_spark.operators.maintenance import table_diff

        keys = [keys] if isinstance(keys, str) else list(keys)
        old = self.read(version=from_version)
        new = self.read(version=to_version)
        return table_diff(old, new, keys, compare_cols)

    def rollback(self, to: int) -> None:
        """Point the table back at a prior version — O(1), no data moved."""
        m = self._read_manifest()
        if to not in [v["version"] for v in m["versions"]]:
            raise ValueError(f"cannot roll back to missing version {to}")
        m["current"] = to
        self._commit_manifest(m)

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Drop snapshot dirs beyond the ``keep_last`` most recent versions
        (the current version is always kept). Returns removed versions.

        A version's DIRECTORY is removed only when no retained version's
        file list references it (incremental versions share directories)."""
        jvm, fs = self._fs()
        hpath = jvm.org.apache.hadoop.fs.Path
        m = self._read_manifest()
        cur = int(m["current"])
        order = sorted(v["version"] for v in m["versions"])
        keep = set(order[-keep_last:]) | {cur}
        kept_paths = {
            p
            for v in m["versions"]
            if v["version"] in keep
            for p in v["paths"]
        }
        removed = []
        new_versions = []
        for v in m["versions"]:
            if v["version"] in keep:
                new_versions.append(v)
                continue
            removed.append(v["version"])
            for p in v["paths"]:
                if p not in kept_paths:
                    fs.delete(hpath(p), True)
        m["versions"] = new_versions
        self._commit_manifest(m)
        return removed

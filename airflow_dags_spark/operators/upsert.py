"""Engine-owned MERGE/upsert library over plain Parquet (SURVEY.md §4.3#1).

Spark core has no ``MERGE INTO`` for parquet; rather than take a Delta
dependency, the engine implements the reference's three write disciplines as
join-based rewrites with an atomic directory-swap commit:

- ``insert_if_absent``  — K3, ``ON CONFLICT DO NOTHING``
  (dags/monthly_price_paid_data.py:147-155)
- ``merge_upsert``      — K4/K5, ``ON CONFLICT DO UPDATE`` incl.
  case-insensitive keys (dags/pull_new_sales_list.py:252-261,
  dags/rightmove_outcodes.py:58-69)
- ``advance_watermark`` — K6/T1, per-key processed-through commit
  (dags/pull_new_sales_list.py:236-239,267-271)

Semantics decisions (documented, tested):
- duplicate keys in the source: first-wins by an explicit ``order_by``
  (matching the reference's seen-set dedup A1); required, not optional —
  nondeterministic survivors don't survive a correctness gate.
- null source keys: rejected (the reference's keys are NOT NULL PKs).
- atomicity: new data is staged to ``<path>/.stage-<uuid>``, then swapped in
  with two renames. Non-ACID window ≈ one rename; a crash mid-swap leaves
  the stage dir (self-healing on next run). At 100 TB the same API would sit
  on a table format (Delta/Iceberg MERGE) — the call sites don't change.

Scale notes:
- the join is the whole cost: source⋈target on the key. Small source
  (incremental batch) → broadcast the SOURCE, stream the target through it;
  Spark picks this automatically under the session broadcast threshold.
- rewriting the full target per merge is the plain-parquet tax; with a
  partitioned target only partitions containing matched keys need rewrite
  (dynamic partition overwrite) — ``partition_by`` enables that here.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class ParquetTable:
    """A path-backed parquet table with keyed-write discipline."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str | list[str],
        *,
        case_insensitive: bool = False,
        partition_by: list[str] | None = None,
    ) -> None:
        self.spark = spark
        self.path = path
        self.keys = [key] if isinstance(key, str) else list(key)
        self.case_insensitive = case_insensitive
        self.partition_by = partition_by or []

    # -- filesystem helpers (Hadoop FS so s3a:///hdfs:// paths work too) ----

    def _fs(self):
        sc = self.spark.sparkContext
        jvm = sc._jvm
        conf = sc._jsc.hadoopConfiguration()
        return jvm, jvm.org.apache.hadoop.fs.Path(self.path).getFileSystem(conf)

    def exists(self) -> bool:
        jvm, fs = self._fs()
        return bool(fs.exists(jvm.org.apache.hadoop.fs.Path(self.path)))

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    # -- key handling -------------------------------------------------------

    def _norm_key(self, df: DataFrame, k: str) -> Column:
        col = df[k]
        return F.lower(col) if self.case_insensitive else col

    def _join_cond(self, src: DataFrame, tgt: DataFrame) -> Column:
        cond = F.lit(True)
        for k in self.keys:
            cond = cond & (self._norm_key(src, k) == self._norm_key(tgt, k))
        return cond

    def _dedup_source(self, src: DataFrame, order_by: list[str]) -> DataFrame:
        """First-wins dedup of source keys (A1 semantics) + null-key reject."""
        for k in self.keys:
            src = src.where(F.col(k).isNotNull())
        w = Window.partitionBy(
            *[self._norm_key(src, k) for k in self.keys]
        ).orderBy(*[F.col(c) for c in order_by])
        return (
            src.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )

    def dedup_first_wins(self, src: DataFrame, order_by: list[str]) -> DataFrame:
        """Public seam for the table's source-side dedup discipline:
        first-wins by ``order_by`` within each key (which must be a
        deterministic total order within a key) plus null-key rejection —
        exactly what every write path applies, for callers that need the
        same row set BEFORE writing (e.g. signing documents whose
        signatures will later be inserted)."""
        return self._dedup_source(src, order_by)

    # -- atomic commit ------------------------------------------------------

    def _atomic_overwrite(self, df: DataFrame) -> None:
        """Stage → swap. Parquet writes aren't in-place-updatable; reading
        and rewriting into the live path would corrupt the source of the
        read, so stage to a sibling dir and rename."""
        jvm, fs = self._fs()
        hpath = jvm.org.apache.hadoop.fs.Path
        stage = f"{self.path}.stage-{uuid.uuid4().hex[:8]}"
        backup = f"{self.path}.old-{uuid.uuid4().hex[:8]}"
        writer = df.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(stage)
        if fs.exists(hpath(self.path)):
            fs.rename(hpath(self.path), hpath(backup))
        fs.rename(hpath(stage), hpath(self.path))
        if fs.exists(hpath(backup)):
            fs.delete(hpath(backup), True)

    # -- write disciplines ---------------------------------------------------

    def create_if_not_exists(self, df: DataFrame) -> bool:
        """K1 — idempotent typed create: write only if the path is absent
        (ref: CREATE TABLE IF NOT EXISTS, dags/pull_new_sales_list.py:73-81).
        Returns True if created."""
        if self.exists():
            return False
        writer = df.write.mode("errorifexists")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(self.path)
        return True

    def append(self, df: DataFrame) -> None:
        """K2 — bulk append, no conflict handling (initial load only;
        ref: execute_values batches, dags/initial_price_paid_data.py:136-142)."""
        writer = df.write.mode("append")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(self.path)

    def insert_if_absent(self, src: DataFrame, order_by: list[str]) -> None:
        """K3 — ``ON CONFLICT DO NOTHING``: append only keys absent from the
        target (left anti-join), never touching existing rows. Existing files
        are untouched — this is an append, not a rewrite, so repeated
        incremental loads stay O(batch), not O(table)."""
        if not self.exists():
            self._atomic_overwrite(self._dedup_source(src, order_by))
            return
        tgt = self.read()
        clean = self._dedup_source(src, order_by)
        new_rows = clean.join(tgt, self._join_cond(clean, tgt), "left_anti")
        self.append(new_rows.select(*[F.col(c) for c in tgt.columns]))

    def merge_upsert(
        self,
        src: DataFrame,
        order_by: list[str],
        update_cols: list[str] | None = None,
    ) -> None:
        """K4/K5 — ``ON CONFLICT DO UPDATE``: full-outer join + per-column
        coalesce. ``update_cols=None`` updates every non-key column; the
        reference's K4 updates only ``updated_date``
        (dags/pull_new_sales_list.py:252-261).

        Unpartitioned targets: atomic directory swap (full rewrite — the
        plain-parquet tax). Partitioned targets where the source carries the
        partition columns: only partitions PRESENT IN THE BATCH are merged
        and dynamically overwritten — O(touched partitions), not O(table);
        at 100 TB this is the difference between a merge and a migration.
        Requires partition values immutable under update (standard
        lakehouse contract; key⊅partition changes are an anti-pattern).
        """
        clean = self._dedup_source(src, order_by)
        if not self.exists():
            self._atomic_overwrite(clean)
            return
        if self.partition_by and all(p in clean.columns for p in self.partition_by):
            self._merge_touched_partitions(clean, update_cols)
            return
        self._atomic_overwrite(self._merged_frame(self.read(), clean, update_cols))

    def _merged_frame(
        self, tgt: DataFrame, clean: DataFrame, update_cols: list[str] | None
    ) -> DataFrame:
        """The MERGE result set: full-outer join + per-column coalesce."""
        non_key = [c for c in tgt.columns if c not in self.keys]
        updatable = set(update_cols) if update_cols is not None else set(non_key)
        src_a = clean.alias("s")
        tgt_a = tgt.alias("t")
        cond = F.lit(True)
        for k in self.keys:
            cond = cond & (self._norm_key(src_a, k) == self._norm_key(tgt_a, k))
        joined = tgt_a.join(src_a, cond, "full_outer")
        out_cols: list[Column] = []
        for k in self.keys:
            # matched/unmatched-target rows keep the target's key casing;
            # insert rows take the source's.
            out_cols.append(F.coalesce(tgt_a[k], src_a[k]).alias(k))
        for c in non_key:
            if c not in clean.columns:
                # partial-source merge (e.g. watermark-only updates): columns
                # the source doesn't carry keep target values; null on insert.
                out_cols.append(tgt_a[c].alias(c))
            elif c in updatable:
                out_cols.append(F.coalesce(src_a[c], tgt_a[c]).alias(c))
            else:
                out_cols.append(F.coalesce(tgt_a[c], src_a[c]).alias(c))
        return joined.select(*out_cols)

    def _merge_touched_partitions(
        self, clean: DataFrame, update_cols: list[str] | None
    ) -> None:
        """Partition-pruned merge: read ONLY partitions the batch touches
        (semi-join on partition values → partition pruning at the scan),
        merge, stage the result, then dynamically overwrite just those
        partitions. Untouched partition directories are never read or
        rewritten."""
        jvm, fs = self._fs()
        hpath = jvm.org.apache.hadoop.fs.Path
        # the touched-partition set is bounded by construction (the batch's
        # distinct partition values); collect it and filter the target with
        # LITERALS — static partition pruning at planning time (PartitionFilters
        # on the scan), no reliance on runtime dynamic pruning of a semi-join
        touched_rows = clean.select(*self.partition_by).distinct().collect()
        tgt = self.read().where(self._partition_pred(touched_rows))
        merged = self._merged_frame(tgt, clean, update_cols)
        # stage first: the merged plan reads the very partitions the dynamic
        # overwrite replaces, and Spark (correctly) refuses read-write cycles
        stage = f"{self.path}.stage-{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(stage)
        try:
            (
                self.spark.read.parquet(stage)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(*self.partition_by)
                .parquet(self.path)
            )
        finally:
            fs.delete(hpath(stage), True)

    def vacuum_orphans(self) -> list[str]:
        """Remove leftover ``.stage-*`` / ``.old-*`` sibling dirs from
        crashed mid-swap writes (the documented self-healing path of
        ``_atomic_overwrite``). Safe anytime: live data never lives in a
        stage dir — a crash before the swap leaves the target untouched,
        a crash after it leaves only the disposable backup."""
        jvm, fs = self._fs()
        hpath = jvm.org.apache.hadoop.fs.Path
        me = hpath(self.path)
        parent = me.getParent()
        if parent is None or not fs.exists(parent):
            return []
        name = me.getName()
        removed: list[str] = []
        for st in fs.listStatus(parent):
            n = st.getPath().getName()
            if n.startswith(f"{name}.stage-") or n.startswith(f"{name}.old-"):
                fs.delete(st.getPath(), True)
                removed.append(n)
        return removed

    def delete_where(self, predicate: Column) -> None:
        """Keyed DELETE by predicate — the missing verb of the reference's
        CRUD surface (Postgres ``DELETE FROM ... WHERE``; also the GDPR/
        right-to-erasure path a lake table needs).

        NULL predicate rows are KEPT (SQL DELETE semantics: only rows where
        the predicate is TRUE are removed).

        Unpartitioned: atomic swap of the retained set (the plain-parquet
        full-rewrite tax, same as merge). Partitioned: only partitions that
        CONTAIN matching rows are rewritten — O(touched), not O(table);
        partitions left empty by the delete have their directories removed
        (dynamic overwrite alone cannot express an empty partition)."""
        keep = ~F.coalesce(predicate, F.lit(False))
        if not self.exists():
            return
        if not self.partition_by:
            self._atomic_overwrite(self.read().where(keep))
            return
        touched = (
            self.read().where(predicate).select(*self.partition_by).distinct().collect()
        )
        if not touched:
            return
        remaining = self.read().where(self._partition_pred(touched)).where(keep)
        self._rewrite_touched_partitions(remaining, touched)

    def delete_keys(self, keys_df: DataFrame) -> None:
        """Keyed DELETE by key set (anti-join form): remove every row whose
        key appears in ``keys_df``. With a partitioned target the touched
        partitions come from target⋈keys (broadcast the key batch), so the
        rewrite is O(partitions containing those keys)."""
        if not self.exists():
            return
        keys = keys_df.select(*self.keys).distinct()
        for k in self.keys:
            keys = keys.where(F.col(k).isNotNull())
        if not self.partition_by:
            tgt = self.read()
            self._atomic_overwrite(tgt.join(keys, self._join_cond(tgt, keys), "left_anti"))
            return
        tgt = self.read()
        matches = tgt.join(F.broadcast(keys), self._join_cond(tgt, keys), "left_semi")
        touched = matches.select(*self.partition_by).distinct().collect()
        if not touched:
            return
        scoped = self.read().where(self._partition_pred(touched))
        remaining = scoped.join(keys, self._join_cond(scoped, keys), "left_anti")
        self._rewrite_touched_partitions(remaining, touched)

    # -- deletion vectors (logical delete) ----------------------------------

    def _dv_path(self) -> str:
        return f"{self.path}.dv"

    def logical_delete(self, keys_df: DataFrame) -> int:
        """O(batch) DELETE: record the keys in a deletion-vector sidecar
        (``<path>.dv``) instead of rewriting any data file — the
        Delta/Iceberg merge-on-read pattern. ``read_current()`` subtracts
        the vector; ``compact_dv()`` later applies it physically in one
        touched-partition rewrite and clears the sidecar.

        Why it matters at 100 TB: ``delete_keys`` costs a rewrite of every
        touched partition PER BATCH — for a steady drip of small deletes
        (GDPR erasure queues) that is the dominant write amplification.
        The vector makes each delete O(|keys|) append-only; the rewrite
        cost is paid ONCE at compaction for all accumulated deletes.

        Contract: deletes are by KEY, table-scoped (not file-scoped like
        Delta's DVs — plain parquet has no stable file identity across
        rewrites). Re-inserting a deleted key requires ``restore_keys``
        (or ``compact_dv`` first); a plain ``append`` of a vectored key
        stays hidden from ``read_current`` by design. Returns the number
        of distinct keys recorded."""
        keys = keys_df.select(
            *[
                self._norm_key(keys_df, k).alias(k) if self.case_insensitive
                else F.col(k)
                for k in self.keys
            ]
        ).distinct()
        for k in self.keys:
            keys = keys.where(F.col(k).isNotNull())
        n = keys.count()
        if n:
            keys.write.mode("append").parquet(self._dv_path())
        return n

    def _dv(self) -> DataFrame | None:
        from airflow_dags_spark.sources.tables import table_exists

        if not table_exists(self.spark, self._dv_path()):
            return None
        return self.spark.read.parquet(self._dv_path()).distinct()

    def read_current(self) -> DataFrame:
        """``read()`` minus logically-deleted keys. The vector is small by
        contract (deletes-since-last-compaction) → broadcast anti-join:
        the scan itself is untouched, pushdown/pruning intact."""
        tgt = self.read()
        dv = self._dv()
        if dv is None:
            return tgt
        return tgt.join(F.broadcast(dv), self._join_cond(tgt, dv), "left_anti")

    def restore_keys(self, keys_df: DataFrame) -> None:
        """Remove keys from the deletion vector (un-delete / pre-reinsert)."""
        dv = self._dv()
        if dv is None:
            return
        keys = keys_df.select(
            *[
                self._norm_key(keys_df, k).alias(k) if self.case_insensitive
                else F.col(k)
                for k in self.keys
            ]
        ).distinct()
        remaining = dv.join(keys, self._join_cond(dv, keys), "left_anti")
        ParquetTable(self.spark, self._dv_path(), self.keys)._atomic_overwrite(
            remaining
        )

    def compact_dv(self) -> int:
        """Apply the deletion vector physically (one touched-partition
        rewrite for ALL accumulated deletes) and clear the sidecar.
        Afterwards ``read() == read_current()``. Returns keys applied."""
        dv = self._dv()
        if dv is None:
            return 0
        dv = dv.localCheckpoint(eager=True)  # survive the sidecar removal
        n = dv.count()
        if n:
            self.delete_keys(dv)
        jvm, fs = self._fs()
        fs.delete(jvm.org.apache.hadoop.fs.Path(self._dv_path()), True)
        return n

    def _rewrite_touched_partitions(self, remaining: DataFrame, touched) -> None:
        """Stage → dynamic overwrite of partitions that still have rows;
        partitions the operation left EMPTY get their directories removed
        (dynamic overwrite alone cannot express an empty partition)."""
        jvm, fs = self._fs()
        hpath = jvm.org.apache.hadoop.fs.Path
        stage = f"{self.path}.stage-{uuid.uuid4().hex[:8]}"
        remaining.write.mode("overwrite").parquet(stage)
        staged = self.spark.read.parquet(stage)
        try:
            (
                staged.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(*self.partition_by)
                .parquet(self.path)
            )
            still = {
                tuple(r[p] for p in self.partition_by)
                for r in staged.select(*self.partition_by).distinct().collect()
            }
            for r in touched:
                vals = tuple(r[p] for p in self.partition_by)
                if vals not in still:
                    sub = "/".join(
                        f"{p}={v}" for p, v in zip(self.partition_by, vals)
                    )
                    fs.delete(hpath(f"{self.path}/{sub}"), True)
        finally:
            fs.delete(hpath(stage), True)

    def _partition_pred(self, touched_rows) -> Column:
        """Literal partition predicate → static pruning at planning time."""
        if len(self.partition_by) == 1:
            p = self.partition_by[0]
            return F.col(p).isin([r[0] for r in touched_rows])
        pred = F.lit(False)
        for r in touched_rows:
            conj = F.lit(True)
            for p in self.partition_by:
                conj = conj & (F.col(p) == F.lit(r[p]))
            pred = pred | conj
        return pred

    def advance_watermark(
        self, processed_keys: DataFrame, watermark_col: str, value
    ) -> None:
        """K6/T1 — set ``watermark_col = value`` for the given keys (also for
        keys that yielded zero rows, so they are not retried —
        dags/pull_new_sales_list.py:236-239)."""
        updates = processed_keys.select(*self.keys).distinct().withColumn(
            watermark_col, F.lit(value)
        )
        self.merge_upsert(updates, order_by=self.keys, update_cols=[watermark_col])


# module-level conveniences ---------------------------------------------------


def insert_if_absent(
    spark: SparkSession,
    path: str,
    src: DataFrame,
    key: str | list[str],
    order_by: list[str],
) -> None:
    ParquetTable(spark, path, key).insert_if_absent(src, order_by)


def merge_upsert(
    spark: SparkSession,
    path: str,
    src: DataFrame,
    key: str | list[str],
    order_by: list[str],
    update_cols: list[str] | None = None,
    case_insensitive: bool = False,
) -> None:
    ParquetTable(spark, path, key, case_insensitive=case_insensitive).merge_upsert(
        src, order_by, update_cols
    )


def advance_watermark(
    spark: SparkSession,
    path: str,
    processed_keys: DataFrame,
    key: str | list[str],
    watermark_col: str,
    value,
) -> None:
    ParquetTable(spark, path, key).advance_watermark(
        processed_keys, watermark_col, value
    )

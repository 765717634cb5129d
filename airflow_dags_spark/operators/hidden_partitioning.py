"""Iceberg-style hidden partitioning over plain parquet.

Plain Hive-style partitioning leaks physics into queries: the table is
partitioned by a DERIVED column (`month=2024-01`) and every query must
filter on that derived column — forget, and you full-scan; the reference's
Postgres schema has the same leak in reverse (B-tree on the raw column,
no layout control at all). Iceberg's fix: the table declares partition
TRANSFORMS of data columns (``days(ts)``, ``bucket(16, id)``,
``truncate(2, code)``); writers derive them silently and readers write
predicates on the DATA columns only — the planner maps them to partition
predicates. This module is that contract for plain parquet:

- ``HiddenPartitionTable(spark, path, transforms)`` — transforms are
  ``(partition_col, kind, source_col, param)`` tuples, kinds:
  ``identity | day | month | bucket | truncate``.
- ``write / append`` — derive partition columns, ``partitionBy`` them.
- ``scan(filters)`` — filters reference SOURCE columns; each one that has
  a matching transform also becomes a partition predicate (constant-folded
  literals → static ``PartitionFilters`` at planning, plan-gated in
  tests). The data predicate is always applied too, so results are exact
  even where a transform can't prune (range over a bucket).
- ``read()`` — full scan with partition columns hidden again.

Monotone transforms (day/month/truncate/identity) prune ranges AND
equalities; bucket prunes equalities and IN-lists only (a hash destroys
order) — exactly Iceberg's rules.

At 100 TB: bucket(N, key) bounds every point-lookup to 1/N of the files
before any Bloom/zone evidence is consulted, and days(ts) makes every
time-bounded query touch only its days — the two transforms compose, and
neither ever appears in user queries.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

KINDS = ("identity", "day", "month", "bucket", "truncate")


class HiddenPartitionTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        transforms: Sequence[tuple[str, str, str, Any]],
    ) -> None:
        self.spark = spark
        self.path = path
        self.transforms = list(transforms)
        for name, kind, src, param in self.transforms:
            if kind not in KINDS:
                raise ValueError(f"unknown transform kind {kind!r}; one of {KINDS}")
            if kind == "bucket" and (not isinstance(param, int) or param <= 0):
                raise ValueError("bucket transform needs a positive int bucket count")
            if kind == "truncate" and (not isinstance(param, int) or param <= 0):
                raise ValueError("truncate transform needs a positive int width")

    # -- transform expressions ------------------------------------------------

    def _apply(self, kind: str, param: Any, col: Column) -> Column:
        if kind == "identity":
            return col
        if kind == "day":
            return F.to_date(col)
        if kind == "month":
            return F.date_format(col, "yyyy-MM")
        if kind == "bucket":
            # murmur3 via F.hash: engine-internal is fine — the SAME
            # expression derives writes and probe literals, and literals
            # constant-fold to static partition values at planning
            return F.pmod(F.hash(col), F.lit(param))
        if kind == "truncate":
            return F.substring(col, 1, param)
        raise AssertionError(kind)

    def _partition_cols(self) -> list[str]:
        return [t[0] for t in self.transforms]

    def _derived(self, df: DataFrame) -> DataFrame:
        for name, kind, src, param in self.transforms:
            df = df.withColumn(name, self._apply(kind, param, F.col(src)))
        return df

    # -- write ----------------------------------------------------------------

    def write(self, df: DataFrame, mode: str = "overwrite") -> None:
        (
            self._derived(df)
            .write.mode(mode)
            .partitionBy(*self._partition_cols())
            .parquet(self.path)
        )

    def append(self, df: DataFrame) -> None:
        self.write(df, mode="append")

    # -- read -----------------------------------------------------------------

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path).drop(*self._partition_cols())

    def scan(self, filters: dict[str, Any]) -> DataFrame:
        """Filtered scan. ``filters[src_col]`` is either a scalar
        (equality), a list/set (IN), or a 2-tuple ``(lo, hi)`` (inclusive
        range; ``None`` end = unbounded). Partition predicates are derived
        per Iceberg's rules; the data predicate is always applied too."""
        df = self.spark.read.parquet(self.path)
        src_types = {f.name: f.dataType for f in df.schema.fields}

        def lit_as(src: str, v):
            # probe literals MUST carry the source column's exact type:
            # murmur3 hashes int32(3) and int64(3) differently, so an
            # untyped literal would derive the WRONG bucket and silently
            # prune correct partitions
            return F.lit(v).cast(src_types[src])

        for src, spec in filters.items():
            for name, kind, tsrc, param in self.transforms:
                if tsrc != src:
                    continue
                p = F.col(name)
                if isinstance(spec, tuple):
                    if kind == "bucket":
                        continue  # hash is not monotone: no range pruning
                    lo, hi = spec
                    if lo is not None:
                        df = df.where(p >= self._apply(kind, param, lit_as(src, lo)))
                    if hi is not None:
                        df = df.where(p <= self._apply(kind, param, lit_as(src, hi)))
                elif isinstance(spec, (list, set, frozenset)):
                    probes = [self._apply(kind, param, lit_as(src, v)) for v in spec]
                    if probes:
                        cond = probes[0] == p
                        for pr in probes[1:]:
                            cond = cond | (pr == p)
                        df = df.where(cond)
                else:
                    df = df.where(p == self._apply(kind, param, lit_as(src, spec)))
            # exact data predicate (also covers untransformed columns)
            c = F.col(src)
            if isinstance(spec, tuple):
                lo, hi = spec
                if lo is not None:
                    df = df.where(c >= lo)
                if hi is not None:
                    df = df.where(c <= hi)
            elif isinstance(spec, (list, set, frozenset)):
                df = df.where(c.isin(list(spec)))
            else:
                df = df.where(c == spec)
        return df.drop(*self._partition_cols())

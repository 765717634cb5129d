"""Persistent, incrementally re-centered IVF coarse-quantizer index — the
similarity-search analog of :class:`operators.ingest.MinhashSignatureStore`
(VERDICT r7 §Next-round #6: "maintain the ANN index as the corpus grows").

An IVF index trained once degrades as the corpus drifts: new documents
cluster where no cell is dense, probe recall decays, and a full re-train
re-scans the corpus. This store instead keeps the *sufficient statistics*
of spherical k-means per cell — ``(cell, vec_sum[dim], n_members)`` over
unit-normalized member vectors — so each arriving batch folds in with one
distributed assignment pass plus a k×dim-bounded state update, and the
current centroids are always ``normalize(vec_sum / n_members)``. This is
the mini-batch k-means update of Sculley (WWW'10) with batch-grained
steps, persisted.

Replay safety (at-least-once ingestion, the MinhashSignatureStore
discipline): state is VERSIONED. Each applied batch writes a full
``state/v{n}`` parquet (k×dim rows — tiny) and then appends
``(batch_id, version)`` to a keyed ledger via K3 insert-if-absent. The
current state is the ledger's max version; a replayed ``batch_id`` is a
no-op, and a crash between the state write and the ledger append leaves an
orphan ``v{n}`` that the replay deterministically overwrites before the
ledger lands. No partial state is ever observable.

100 TB shape: the batch side does one shuffle-free Arrow-batched
assignment (numpy matmul per batch against the broadcast k×dim centroid
matrix — the `ivf_ann_topk` fast path) and one per-(cell, dim) partial
aggregation; only k×dim (sum, count) partials ever reach the driver — the
bounded-collect rule of ``operators/clustering.py``. The corpus is never
re-scanned, mirroring the signature store's sign-once property.

Reference parity note: the reference system (vinkumdev/airflow-dags) has no
vector surface at all; this extends the engine's LLM-pipeline brief
(SURVEY.md §2.9, similarity family).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_dags_spark.functions.vectors import as_double
from airflow_dags_spark.operators.upsert import ParquetTable


def _assign_cells(vec_col: str, centers: np.ndarray):
    """Shuffle-free cell assignment: cosine argmax against the broadcast
    centroid matrix, one BLAS matmul per Arrow batch (ties → lowest cell,
    matching np.argmax)."""
    from pyspark.sql.functions import pandas_udf

    unit_centers = centers / np.where(
        np.linalg.norm(centers, axis=1, keepdims=True) > 0,
        np.linalg.norm(centers, axis=1, keepdims=True),
        1.0,
    )

    @pandas_udf("int")
    def _cell_of(v: pd.Series) -> pd.Series:
        x = np.vstack(v.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        x = x / np.where(norms > 0, norms, 1.0)
        return pd.Series(np.argmax(x @ unit_centers.T, axis=1).astype("int32"))

    return _cell_of(F.col(vec_col))


class IvfIndexStore:
    """Parquet-backed IVF cell state with batch-grained incremental
    re-centering. See the module docstring for the design contract."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        key_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        self.spark = spark
        self.path = path.rstrip("/")
        self.key_col = key_col
        self.vec_col = vec_col
        self._ledger = ParquetTable(spark, f"{self.path}/ledger", "batch_id")

    # -- state access -------------------------------------------------------

    def exists(self) -> bool:
        return self._ledger.exists()

    def current_version(self) -> int:
        if not self.exists():
            return -1
        row = self._ledger.read().agg(F.max("version").alias("v")).collect()[0]
        return int(row["v"])

    def state(self) -> DataFrame:
        """Current sufficient statistics: (cell, vec_sum, n_members)."""
        v = self.current_version()
        if v < 0:
            raise ValueError(f"IVF index at {self.path} not initialized")
        return self.spark.read.parquet(f"{self.path}/state/v{v}")

    def centroids_matrix(self) -> np.ndarray:
        """Current centroids as a dense (k, dim) array — bounded k×dim
        driver-side, ordered by cell id."""
        rows = self.state().orderBy("cell").collect()
        mat = np.asarray([r["vec_sum"] for r in rows], dtype=np.float64)
        n = np.asarray([r["n_members"] for r in rows], dtype=np.float64)
        mat = mat / np.where(n > 0, n, 1.0)[:, None]
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        return mat / np.where(norms > 0, norms, 1.0)

    def centroids(self) -> DataFrame:
        """Current unit-normalized centroids as (cell, centroid) rows."""
        s = self.state()
        mean = F.transform(
            "vec_sum", lambda x: x / F.col("n_members").cast("double")
        )
        norm = F.sqrt(
            F.aggregate(mean, F.lit(0.0), lambda acc, x: acc + x * x)
        )
        unit = F.when(norm > 0, F.transform(mean, lambda x: x / norm)).otherwise(
            mean
        )
        return s.select("cell", unit.alias("centroid"), "n_members")

    # -- writes -------------------------------------------------------------

    def _write_state(self, stats: list[tuple], version: int) -> None:
        df = self.spark.createDataFrame(
            stats, "cell int, vec_sum array<double>, n_members bigint"
        )
        # deterministic single tiny file: k×dim rows ≈ KBs
        df.coalesce(1).write.mode("overwrite").parquet(
            f"{self.path}/state/v{version}"
        )

    def _commit(self, batch_id: str, version: int) -> None:
        row = self.spark.createDataFrame(
            [(batch_id, version)], "batch_id string, version int"
        )
        self._ledger.insert_if_absent(row, order_by=["version"])

    def init_from(
        self,
        vecs: DataFrame,
        n_cells: int,
        *,
        batch_id: str = "__init__",
        fit_sample: int = 20000,
        max_iter: int = 10,
        seed: int = 42,
    ) -> dict:
        """Train the initial quantizer (sampled, seeded — the
        `ivf_ann_topk` fit) and fold the full init corpus into cell
        statistics. Idempotent on ``batch_id``."""
        from airflow_dags_spark.operators.similarity import _fit_coarse_quantizer

        if self.exists():
            applied = {
                r["batch_id"] for r in self._ledger.read().select("batch_id").collect()
            }
            if batch_id in applied:
                return {"applied": False, "version": self.current_version()}
            raise ValueError("init_from on an already-initialized store")
        centers = _fit_coarse_quantizer(
            vecs, self.vec_col, n_cells, fit_sample, max_iter, seed
        )
        stats = self._batch_stats(vecs, centers, n_cells)
        self._write_state(stats, 0)
        self._commit(batch_id, 0)
        return {"applied": True, "version": 0, "n_cells": n_cells}

    def _batch_stats(
        self, vecs: DataFrame, centers: np.ndarray, n_cells: int
    ) -> list[tuple]:
        """Distributed per-cell (Σ unit-vector, count) of a batch; only the
        k×dim partial sums are collected."""
        assigned = vecs.where(F.col(self.vec_col).isNotNull()).select(
            _assign_cells(self.vec_col, centers).alias("cell"),
            as_double(self.vec_col).alias("v"),
        )
        norm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x))
        unit = F.when(norm > 0, F.transform("v", lambda x: x / norm)).otherwise(
            F.col("v")
        )
        per_dim = assigned.select(
            "cell", F.posexplode(unit).alias("dim", "val")
        ).groupBy("cell", "dim").agg(
            F.sum("val").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        rows = per_dim.collect()  # bounded: ≤ n_cells × dim rows
        dim = 1 + max((r["dim"] for r in rows), default=-1)
        out = []
        by_cell: dict[int, list] = {}
        counts: dict[int, int] = {}
        for r in rows:
            by_cell.setdefault(r["cell"], [0.0] * dim)[r["dim"]] = float(r["s"])
            # heterogeneous vector lengths would make the per-(cell, dim)
            # count vary across dims — silently keeping whichever row was
            # collected last would corrupt n_members vs vec_sum. Refuse.
            if counts.setdefault(r["cell"], int(r["n"])) != int(r["n"]):
                raise ValueError(
                    "heterogeneous vector lengths in batch: per-dim counts "
                    f"disagree for cell {r['cell']} "
                    f"({counts[r['cell']]} vs {int(r['n'])})"
                )
        for cell in range(n_cells):
            out.append(
                (cell, by_cell.get(cell, [0.0] * dim), counts.get(cell, 0))
            )
        return out

    def add_batch(self, vecs: DataFrame, batch_id: str) -> dict:
        """Assign a new batch to the CURRENT centroids, fold its per-cell
        sums into the state, persist as the next version. Replay of an
        applied ``batch_id`` is a no-op (ledger check); a crash between
        the state write and the ledger append is healed by the replay
        deterministically overwriting the orphan version."""
        applied = {
            r["batch_id"] for r in self._ledger.read().select("batch_id").collect()
        }
        if batch_id in applied:
            return {"applied": False, "version": self.current_version()}
        centers = self.centroids_matrix()
        cur = {
            r["cell"]: (list(r["vec_sum"]), int(r["n_members"]))
            for r in self.state().collect()
        }
        n_cells = len(cur)
        delta = self._batch_stats(vecs, centers, n_cells)
        merged = []
        n_new = 0
        for cell, dsum, dn in delta:
            osum, on = cur[cell]
            if dn == 0:
                # empty delta carries no dimensions — keep the old sums
                merged.append((cell, osum, on))
                continue
            if len(dsum) != len(osum):
                raise ValueError(
                    f"batch vector dim {len(dsum)} != store dim {len(osum)} "
                    f"(cell {cell}) — zip would silently truncate sums"
                )
            merged.append(
                (cell, [a + b for a, b in zip(osum, dsum)], on + dn)
            )
            n_new += dn
        version = self.current_version() + 1
        self._write_state(merged, version)
        self._commit(batch_id, version)
        # mean centroid shift — the observable re-centering magnitude,
        # derived from `merged` in memory (no state re-read: the streaming
        # sink calls this per micro-batch and extra Spark jobs here are
        # hot-path latency), same normalization as centroids_matrix
        mat = np.asarray([s for _, s, _ in merged], dtype=np.float64)
        n = np.asarray([m for _, _, m in merged], dtype=np.float64)
        mat = mat / np.where(n > 0, n, 1.0)[:, None]
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        new_centers = mat / np.where(norms > 0, norms, 1.0)
        shift = float(np.linalg.norm(new_centers - centers, axis=1).mean())
        return {
            "applied": True,
            "version": version,
            "n_assigned": n_new,
            "mean_centroid_shift": round(shift, 9),
        }

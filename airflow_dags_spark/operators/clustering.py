"""Distributed embedding clustering + semantic (embedding-space) dedup.

- ``kmeans_fit``       — distributed spherical k-means (Lloyd): assignment
  and per-cluster partial sums run executor-side as one Arrow-batched
  ``mapInPandas`` pass per iteration (a BLAS matmul per batch, no shuffle);
  only the k×dim partial-sum rows come back to the driver (bounded by
  batches × k, never data rows — the treeAggregate shape MLlib uses).
  Deterministic: seeded init from the md5-ordered sample, stable argmax.
- ``assign_clusters``  — one narrow pass attaching the nearest-centroid id.
- ``semantic_dedup``   — SemDeDup-style near-dup pruning (Abbas et al.
  2023, arXiv:2303.09540): cluster the corpus, then exact pairwise cosine
  ONLY inside each cluster; a row is dropped when a lower-keyed neighbor in
  its cluster exceeds the threshold (min-key-wins, deterministic). The
  all-pairs cost is bounded per cluster — pick n_clusters so the expected
  cluster fits executor memory (the paper's k=50k over 5B docs ⇒ ~100k-row
  clusters); the cross-cluster miss rate is the standard SemDeDup trade.

Complements the lexical dedup family (operators/dedup.py): MinHash catches
token overlap, SimHash bit similarity, this catches SEMANTIC duplicates
(paraphrases, translations, re-encodings) that shared-token methods miss.

No reference analogue (the reference has no vector surface at all); built
against the public SemDeDup recipe + FAISS-style quantizer practice.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from airflow_dags_spark.functions.vectors import as_double


def _unit(x: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.where(norms > 0, norms, 1.0)


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    k: int,
    *,
    key_col: str,
    max_iter: int = 20,
    tol: float = 1e-6,
    seed: int = 42,
    init_sample: int = 4096,
    distributed_reduce: bool | None = None,
) -> np.ndarray:
    """Fit k spherical-k-means centroids (unit vectors) distributed.

    Init: k seeded draws from the md5-ordered ``init_sample`` head — the
    engine's deterministic-sample idiom. Each Lloyd round is one
    shuffle-free executor pass in which every TASK accumulates its whole
    partition into ≤ k (cluster, cnt, vsum) partial rows (across Arrow
    batches, not per batch) — the map-side combine. The driver then folds
    ≤ partitions × k rows. When k is large (default: k > 8192, or
    ``distributed_reduce=True``) an extra k-key shuffle reduces partials
    per cluster executor-side first, so the driver collects exactly k rows
    — the treeAggregate shape; at small k that shuffle costs more than the
    collect it saves (measured 2.6× on the sf0.1 semantic-dedup drive), so
    it is off. Convergence when no centroid moves more than ``tol``
    (cosine of successive centroids ≥ 1 - tol).

    Determinism: partials are folded in a TOTAL sort order
    (cluster, cnt, vsum bytes), removing shuffle/collect-arrival
    nondeterminism — refits are bit-identical for a fixed partitioning.
    Across DIFFERENT partitionings the partial-sum boundaries themselves
    differ, so centers agree only to float-accumulation order (ulp)."""
    sample = [
        r[0]
        for r in df.where(F.col(vec_col).isNotNull())
        .orderBy(F.md5(F.col(key_col).cast("string")))
        .select(as_double(vec_col))
        .limit(init_sample)
        .collect()
    ]
    x0 = _unit(np.asarray(sample, dtype=np.float64))
    rng = np.random.RandomState(seed)
    centers = x0[rng.choice(len(x0), size=min(k, len(x0)), replace=False)].copy()

    if len(sample) < init_sample:
        # The md5-ordered sample did not hit its cap, i.e. it IS the whole
        # non-null corpus: every distributed Lloyd round would scan exactly
        # these rows to fold ≤ k×dim partials back to the driver. Run the
        # rounds in numpy instead — ZERO Spark jobs per round (was one
        # full mapInPandas pass + collect per round, the dominant cost of
        # a small-corpus fit: ~10 × 0.25 s at sf0.1). At production scale
        # the corpus exceeds ``init_sample`` and the distributed path below
        # engages unchanged. Centers agree with the distributed fold to
        # float-accumulation order (ulp) — the same envelope different
        # partitionings already have (see determinism note above); this
        # path is itself bit-deterministic (fixed md5 collect order).
        for _ in range(max_iter):
            assign = np.argmax(x0 @ centers.T, axis=1)
            sums = np.zeros_like(centers)
            counts = np.zeros(len(centers))
            for j in np.unique(assign):
                m = x0[assign == j]
                sums[j] = m.sum(axis=0)
                counts[j] = len(m)
            new = centers.copy()
            nz = counts > 0
            new[nz] = _unit(sums[nz] / counts[nz, None])
            shift = 1.0 - np.min(np.sum(new * centers, axis=1))
            centers = new
            if shift < tol:
                break
        return centers

    partial_schema = StructType(
        [
            StructField("cluster", IntegerType()),
            StructField("cnt", LongType()),
            StructField("vsum", ArrayType(DoubleType())),
        ]
    )
    vecs = df.where(F.col(vec_col).isNotNull()).select(as_double(vec_col).alias("v"))
    if distributed_reduce is None:
        distributed_reduce = k > 8192

    for _ in range(max_iter):
        c = centers  # rebind for closure capture of THIS round's centers

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # accumulate the WHOLE partition before emitting: ≤ k rows per
            # task regardless of how many Arrow batches it holds
            counts: dict[int, int] = {}
            sums: dict[int, np.ndarray] = {}
            for pdf in batches:
                if not len(pdf):
                    continue
                x = _unit(np.vstack(pdf["v"].to_numpy()).astype(np.float64))
                assign = np.argmax(x @ c.T, axis=1)
                for j in np.unique(assign):
                    m = x[assign == j]
                    j = int(j)
                    if j in counts:
                        counts[j] += len(m)
                        sums[j] += m.sum(axis=0)
                    else:
                        counts[j] = len(m)
                        sums[j] = m.sum(axis=0)
            if counts:
                out = [
                    (j, counts[j], sums[j].tolist()) for j in sorted(counts)
                ]
                yield pd.DataFrame(out, columns=["cluster", "cnt", "vsum"])

        folded = vecs.mapInPandas(partials, partial_schema)
        if distributed_reduce:

            def reduce_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
                # total-order fold: same sum for any shuffle arrival order
                v = np.vstack(pdf["vsum"].to_numpy()).astype(np.float64)
                order = sorted(
                    range(len(pdf)),
                    key=lambda i: (int(pdf["cnt"].iloc[i]), v[i].tobytes()),
                )
                acc = np.zeros(v.shape[1])
                for i in order:
                    acc += v[i]
                return pd.DataFrame(
                    {
                        "cluster": [int(pdf["cluster"].iloc[0])],
                        "cnt": [int(pdf["cnt"].sum())],
                        "vsum": [acc.tolist()],
                    }
                )

            folded = folded.groupBy("cluster").applyInPandas(
                reduce_cluster, partial_schema
            )
        rows = folded.collect()
        sums = np.zeros_like(centers)
        counts = np.zeros(len(centers))
        # total-order driver fold: deterministic for any collect order
        for r in sorted(
            rows,
            key=lambda r: (r["cluster"], r["cnt"], tuple(r["vsum"])),
        ):
            sums[r["cluster"]] += np.asarray(r["vsum"])
            counts[r["cluster"]] += r["cnt"]
        new = centers.copy()
        nz = counts > 0
        new[nz] = _unit(sums[nz] / counts[nz, None])
        shift = 1.0 - np.min(np.sum(new * centers, axis=1))
        centers = new
        if shift < tol:
            break
    return centers


def assign_clusters(
    df: DataFrame,
    centers: np.ndarray,
    vec_col: str,
    out_col: str = "cluster",
) -> DataFrame:
    """Attach nearest-centroid id: one Arrow-batched shuffle-free pass
    (BLAS batch × k matmul); ties break to the lowest cluster id."""
    from pyspark.sql.functions import pandas_udf

    c = centers

    @pandas_udf("int")
    def _cell(v: pd.Series) -> pd.Series:
        x = _unit(np.vstack(v.to_numpy()).astype(np.float64))
        return pd.Series(np.argmax(x @ c.T, axis=1).astype("int32"))

    return df.withColumn(out_col, _cell(F.col(vec_col)))


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float,
    *,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int | None = None,
    target_cluster_size: int = 1000,
    max_clusters: int = 65_536,
    approx_count: int | None = None,
    seed: int = 42,
    max_iter: int = 10,
) -> DataFrame:
    """SemDeDup: cluster, then drop any row with a LOWER-keyed same-cluster
    neighbor at cosine ≥ threshold (min-key-wins — the chain-safe greedy
    rule: the minimum of every duplicate chain always survives).

    Returns key, cluster, kept flag, and the best within-cluster
    lower-neighbor similarity (NULL when none) — callers filter
    ``kept`` for the pruned corpus or inspect near-miss margins.

    Scale shape: per-cluster work is quadratic, so ``n_clusters`` defaults
    to corpus_size / target_cluster_size — cluster size (and with it the
    per-task cost) stays CONSTANT as the corpus grows; total cost grows
    linearly in n. (A fixed n_clusters=8 measured 19.7× time at 10× data;
    the auto-scaled form is ~linear — SCALE.md.) The exact phase is one
    groupBy(cluster) → applyInPandas running a blocked BLAS gram matrix per
    cluster — no |cluster|² joined rows, no per-pair interpreted lambda.

    ``max_clusters`` caps the n/target rule (default 65 536): k×dim centers
    live on the driver AND broadcast to every assignment task, so unbounded
    k is a driver/broadcast bomb at corpus scale (~50 B docs would give
    k≈50 M → ~300 GB of centers under the raw rule). Past the cap, cluster
    size grows with n instead — the SemDeDup paper itself runs k=50 k over
    5 B docs (~100 k-row clusters, fine: the blocked gram is block×cluster
    memory). Corpora where even capped clusters exceed executor memory
    should recursively re-run semantic_dedup per oversized cluster
    (two-level clustering) — cheap because each sub-run sees only one
    cluster's rows.

    ``approx_count`` short-circuits the sizing ``count()`` job — pass
    ``sources.tables.parquet_row_count(...)`` (footer metadata, zero Spark
    jobs) when the corpus is a parquet path. Sizing only needs order of
    magnitude, so a pre-filter count is fine."""
    base = embeddings.where(F.col(vec_col).isNotNull())
    if n_clusters is None:
        n = approx_count if approx_count is not None else base.count()
        n_clusters = min(
            max_clusters, max(8, int(n / max(target_cluster_size, 1)) + 1)
        )
    centers = kmeans_fit(
        base, vec_col, n_clusters, key_col=key_col, seed=seed, max_iter=max_iter
    )
    assigned = assign_clusters(
        base.select(F.col(key_col), F.col(vec_col)), centers, vec_col
    )

    return _dedup_within_clusters(assigned, threshold, key_col, vec_col)


def _dedup_within_clusters(
    assigned: DataFrame, threshold: float, key_col: str, vec_col: str
) -> DataFrame:
    """The exact phase shared by semantic_dedup and the two-level variant:
    one groupBy(cluster) → applyInPandas; per cluster a blocked BLAS gram
    matrix marks rows with a lower-keyed neighbor ≥ threshold."""
    out_schema = StructType(
        [
            assigned.schema[key_col],
            StructField("cluster", IntegerType()),
            StructField("kept", BooleanType()),
            StructField("best_lower_sim", DoubleType()),
        ]
    )

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(key_col, kind="mergesort").reset_index(drop=True)
        x = _unit(np.vstack(pdf[vec_col].to_numpy()).astype(np.float64))
        n = len(x)
        best = np.full(n, np.nan)
        # blocked gram matrix: block × n memory, full-cluster never held
        for lo in range(1, n, 1024):
            hi = min(lo + 1024, n)
            # only lower-keyed columns matter: x[:hi] halves the FLOPs
            s = np.round(x[lo:hi] @ x[:hi].T, 6)
            for i in range(lo, hi):
                best[i] = s[i - lo, :i].max()
        bl = pd.Series(best).where(pd.notna(best), None)
        return pd.DataFrame(
            {
                key_col: pdf[key_col],
                "cluster": pdf["cluster"].astype("int32"),
                "kept": ~(best >= threshold),
                "best_lower_sim": bl,
            }
        )

    return assigned.groupBy("cluster").applyInPandas(per_cluster, out_schema)


def _batched_sub_kmeans(
    cells_df: DataFrame,
    sizes: dict[int, int],
    oversized: list[int],
    vec_col: str,
    key_col: str,
    *,
    target_cluster_size: int,
    seed: int,
    max_iter: int,
    tol: float = 1e-6,
    init_sample: int = 4096,
) -> dict[int, np.ndarray]:
    """Fit one sub-quantizer PER oversized coarse cell with ALL cells
    advancing together: every Lloyd round is ONE Arrow-batched pass over
    the combined frame keyed by cell (per-task partials bounded by
    Σ k₂ rows), folded on the driver in a total order per (cell, cluster).
    Same init recipe as ``kmeans_fit`` (seeded draw from the md5-ordered
    per-cell head — here computed for every cell in ONE window job).
    Converged cells drop out of later rounds; the loop ends when all
    converge or ``max_iter`` is hit."""
    from pyspark.sql import Window as W

    md5k = F.md5(F.col(key_col).cast("string"))
    head = (
        cells_df.select(
            "cluster", md5k.alias("__m"), as_double(vec_col).alias("__v")
        )
        .withColumn(
            "__rn",
            F.row_number().over(W.partitionBy("cluster").orderBy("__m")),
        )
        .where(F.col("__rn") <= init_sample)
        .select("cluster", "__m", "__v")
        .collect()
    )
    by_cell: dict[int, list] = {}
    for r in sorted(head, key=lambda r: (r["cluster"], r["__m"])):
        by_cell.setdefault(int(r["cluster"]), []).append(r["__v"])
    centers: dict[int, np.ndarray] = {}
    for c in sorted(oversized):
        k2 = max(2, int(sizes[c] / max(target_cluster_size, 1)) + 1)
        x0 = _unit(np.asarray(by_cell[c], dtype=np.float64))
        rng = np.random.RandomState(seed + 1 + c)
        centers[c] = x0[
            rng.choice(len(x0), size=min(k2, len(x0)), replace=False)
        ].copy()

    if all(sizes[c] <= init_sample for c in oversized):
        # Every oversized cell's md5-ordered head IS the whole cell (the
        # caller's ``sizes`` are exact counts), so each distributed round
        # would fold exactly these rows — run the sub-Lloyd loops in numpy
        # instead: ZERO Spark jobs (was ≤ max_iter mapInPandas+collect
        # rounds). Cells past ``init_sample`` take the distributed path
        # below unchanged; same ulp-order envelope as ``kmeans_fit``.
        for c in sorted(oversized):
            x = _unit(np.asarray(by_cell[c], dtype=np.float64))
            cc = centers[c]
            for _ in range(max_iter):
                assign = np.argmax(x @ cc.T, axis=1)
                sums = np.zeros_like(cc)
                counts = np.zeros(len(cc))
                for j in np.unique(assign):
                    m = x[assign == j]
                    sums[j] = m.sum(axis=0)
                    counts[j] = len(m)
                new = cc.copy()
                nz = counts > 0
                new[nz] = _unit(sums[nz] / counts[nz, None])
                shift = 1.0 - np.min(np.sum(new * cc, axis=1))
                cc = new
                if shift < tol:
                    break
            centers[c] = cc
        return centers

    partial_schema = StructType(
        [
            StructField("cell", IntegerType()),
            StructField("cluster", IntegerType()),
            StructField("cnt", LongType()),
            StructField("vsum", ArrayType(DoubleType())),
        ]
    )
    vecs = cells_df.select(
        F.col("cluster").alias("cell"), as_double(vec_col).alias("v")
    )
    active = set(centers)
    for _ in range(max_iter):
        cmap = {c: centers[c] for c in active}  # this round's snapshot

        def partials(
            batches: Iterator[pd.DataFrame], cmap=cmap
        ) -> Iterator[pd.DataFrame]:
            counts: dict[tuple[int, int], int] = {}
            sums: dict[tuple[int, int], np.ndarray] = {}
            for pdf in batches:
                if not len(pdf):
                    continue
                for c, grp in pdf.groupby("cell"):
                    cc = cmap.get(int(c))
                    if cc is None:  # converged cell: frozen, skip
                        continue
                    x = _unit(np.vstack(grp["v"].to_numpy()).astype(np.float64))
                    assign = np.argmax(x @ cc.T, axis=1)
                    for j in np.unique(assign):
                        m = x[assign == j]
                        key = (int(c), int(j))
                        if key in counts:
                            counts[key] += len(m)
                            sums[key] += m.sum(axis=0)
                        else:
                            counts[key] = len(m)
                            sums[key] = m.sum(axis=0)
            if counts:
                out = [
                    (c, j, counts[(c, j)], sums[(c, j)].tolist())
                    for c, j in sorted(counts)
                ]
                yield pd.DataFrame(
                    out, columns=["cell", "cluster", "cnt", "vsum"]
                )

        rows = vecs.mapInPandas(partials, partial_schema).collect()
        sums_d = {c: np.zeros_like(centers[c]) for c in active}
        cnts_d = {c: np.zeros(len(centers[c])) for c in active}
        # total-order driver fold: deterministic for any collect order
        for r in sorted(
            rows,
            key=lambda r: (r["cell"], r["cluster"], r["cnt"], tuple(r["vsum"])),
        ):
            sums_d[r["cell"]][r["cluster"]] += np.asarray(r["vsum"])
            cnts_d[r["cell"]][r["cluster"]] += r["cnt"]
        done = []
        for c in sorted(active):
            new = centers[c].copy()
            nz = cnts_d[c] > 0
            new[nz] = _unit(sums_d[c][nz] / cnts_d[c][nz, None])
            shift = 1.0 - np.min(np.sum(new * centers[c], axis=1))
            centers[c] = new
            if shift < tol:
                done.append(c)
        active -= set(done)
        if not active:
            break
    return centers


def semantic_dedup_two_level(
    embeddings: DataFrame,
    threshold: float,
    *,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    coarse_clusters: int = 1024,
    target_cluster_size: int = 1000,
    split_factor: int = 4,
    seed: int = 42,
    max_iter: int = 10,
) -> DataFrame:
    """Two-level SemDeDup: the scale form past ``semantic_dedup``'s
    ``max_clusters`` cap. Level 1 fits a bounded COARSE quantizer
    (``coarse_clusters`` ≤ 65k — driver/broadcast-safe no matter the corpus
    size); any coarse cell larger than ``split_factor × target_cluster_size``
    is then re-clustered by its OWN sub-quantizer (k₂ = size/target), and the
    exact gram-matrix phase runs inside final (coarse, sub) cells.

    Why not just raise k at level 1: k×dim centers ship to every task, so
    level-1 k must stay bounded; two levels give k₁×k₂ effective cells while
    never broadcasting more than max(k₁, max k₂) centers. The driver loop
    over oversized cells is bounded by k₁; each sub-fit scans ONLY its
    cell's rows (the assigned frame is cached across the loop).

    Same output contract as ``semantic_dedup``; ``cluster`` is the final
    cell id (coarse_id when unsplit, a derived unique id when split).
    Dedup semantics note: splitting trades recall exactly like adding
    clusters does — near-dups straddling sub-cells are missed (standard
    SemDeDup trade, bounded by sub-cell purity)."""
    base = embeddings.where(F.col(vec_col).isNotNull())
    centers = kmeans_fit(
        base, vec_col, coarse_clusters, key_col=key_col, seed=seed, max_iter=max_iter
    )
    assigned = assign_clusters(
        base.select(F.col(key_col), F.col(vec_col)), centers, vec_col
    ).persist()
    try:
        sizes = {
            r["cluster"]: r["n"]
            for r in assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        split_at = split_factor * target_cluster_size
        oversized = sorted(c for c, n in sizes.items() if n > split_at)

        out = assigned
        if oversized:
            keep = assigned.where(~F.col("cluster").isin(oversized))
            cells_frame = assigned.where(F.col("cluster").isin(oversized))
            # ALL oversized cells advance one Lloyd round per Spark job
            # (batched: a sequential per-cell kmeans_fit loop costs
            # |oversized| × max_iter driver round trips; this costs
            # ≤ 1 + max_iter)
            sub_centers = _batched_sub_kmeans(
                cells_frame,
                sizes,
                oversized,
                vec_col,
                key_col,
                target_cluster_size=target_cluster_size,
                seed=seed,
                max_iter=max_iter,
            )
            # final ids: unsplit cells keep coarse id; split cells get ids
            # above the coarse range, disjoint per (coarse, sub)
            bases: dict[int, int] = {}
            next_base = len(centers)
            for c in sorted(oversized):
                bases[c] = next_base
                next_base += len(sub_centers[c])

            from pyspark.sql.functions import pandas_udf

            @pandas_udf("int")
            def _final_cell(cell: pd.Series, v: pd.Series) -> pd.Series:
                res = np.empty(len(cell), dtype=np.int32)
                cells_arr = cell.to_numpy()
                for c in np.unique(cells_arr):
                    idx = np.flatnonzero(cells_arr == c)
                    cc = sub_centers[int(c)]
                    x = _unit(np.vstack(v.iloc[idx].to_numpy()).astype(np.float64))
                    # ties break to the lowest sub id (first argmax), as in
                    # assign_clusters
                    res[idx] = bases[int(c)] + np.argmax(x @ cc.T, axis=1)
                return pd.Series(res)

            sub = cells_frame.withColumn(
                "cluster", _final_cell(F.col("cluster"), as_double(vec_col))
            )
            out = keep.unionByName(sub)
        # the exact phase runs AFTER the union so Spark schedules all final
        # cells in one stage; materialize (off-heap safe: DISK_ONLY) so the
        # cached assignment can be released before returning
        result = _dedup_within_clusters(out, threshold, key_col, vec_col)
        result = result.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
        return result
    finally:
        assigned.unpersist()

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
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from airflow_dags_spark.functions.vectors import as_double, cosine


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
) -> np.ndarray:
    """Fit k spherical-k-means centroids (unit vectors) distributed.

    Init: k seeded draws from the md5-ordered ``init_sample`` head — the
    engine's deterministic-sample idiom, so refits on the same data give
    identical centers regardless of partitioning. Each Lloyd round is one
    shuffle-free executor pass; convergence when no centroid moves more
    than ``tol`` (cosine of successive centroids ≥ 1 - tol)."""
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

    partial_schema = StructType(
        [
            StructField("cluster", IntegerType()),
            StructField("cnt", LongType()),
            StructField("vsum", ArrayType(DoubleType())),
        ]
    )
    vecs = df.where(F.col(vec_col).isNotNull()).select(as_double(vec_col).alias("v"))

    for _ in range(max_iter):
        c = centers  # rebind for closure capture of THIS round's centers

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                x = _unit(np.vstack(pdf["v"].to_numpy()).astype(np.float64))
                assign = np.argmax(x @ c.T, axis=1)
                out = []
                for j in np.unique(assign):
                    m = x[assign == j]
                    out.append((int(j), len(m), m.sum(axis=0).tolist()))
                yield pd.DataFrame(out, columns=["cluster", "cnt", "vsum"])

        rows = vecs.mapInPandas(partials, partial_schema).collect()
        sums = np.zeros_like(centers)
        counts = np.zeros(len(centers))
        # driver fold in sorted order → deterministic float accumulation
        for r in sorted(rows, key=lambda r: (r["cluster"],)):
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
    n_clusters: int = 8,
    seed: int = 42,
    max_iter: int = 10,
) -> DataFrame:
    """SemDeDup: cluster, then drop any row with a LOWER-keyed same-cluster
    neighbor at cosine ≥ threshold (min-key-wins — the chain-safe greedy
    rule: the minimum of every duplicate chain always survives).

    Returns key, cluster, kept flag, and the best within-cluster
    lower-neighbor similarity (NULL when none) — callers filter
    ``kept`` for the pruned corpus or inspect near-miss margins.

    Shape: fit (bounded driver rounds) + one assignment pass + ONE
    self-join keyed on cluster — the exact compare never crosses cluster
    boundaries, so cost is Σ|cluster|², controlled by n_clusters."""
    base = embeddings.where(F.col(vec_col).isNotNull())
    centers = kmeans_fit(
        base, vec_col, n_clusters, key_col=key_col, seed=seed, max_iter=max_iter
    )
    assigned = assign_clusters(base, centers, vec_col)
    a = assigned.select(
        F.col("cluster"), F.col(key_col).alias("key_a"), F.col(vec_col).alias("va")
    )
    b = assigned.select(
        F.col("cluster"), F.col(key_col).alias("key_b"), F.col(vec_col).alias("vb")
    )
    sim = F.round(cosine(as_double("va"), as_double("vb")), 6) + F.lit(0.0)
    best_lower = (
        a.join(b, ["cluster"])
        .where(F.col("key_a") < F.col("key_b"))
        .select("cluster", "key_b", sim.alias("sim"))
        .groupBy("cluster", "key_b")
        .agg(F.max("sim").alias("best_lower_sim"))
    )
    return (
        assigned.select(key_col, "cluster")
        .join(
            best_lower.withColumnRenamed("key_b", key_col),
            [key_col, "cluster"],
            "left",
        )
        .select(
            key_col,
            "cluster",
            (
                F.coalesce(F.col("best_lower_sim") < threshold, F.lit(True))
            ).alias("kept"),
            "best_lower_sim",
        )
    )

"""Similarity search over embedding columns (north-star §2.9).

- ``cosine_topk``  — exact brute-force top-k: broadcast the (small) query
  set against the corpus, JVM-side dot products, per-query top-k via
  row_number. The baseline every ANN variant is measured against. At 100 TB
  the corpus side streams (no shuffle); cost is O(|corpus|·|queries|·dim)
  pure compute, embarrassingly parallel.
- ``lsh_ann_topk`` — BucketedRandomProjectionLSH on L2-normalized vectors
  (cosine ordering ≡ euclidean on the unit sphere): the scale path, probing
  only nearby hash buckets instead of the full corpus.
- ``ivf_ann_topk`` — IVF (inverted-file) variant: seeded KMeans coarse
  quantizer partitions the corpus into cells; queries probe only the
  ``nprobe`` nearest cells. At 100 TB the cell assignment is ONE narrow pass
  and each query touches |corpus|·nprobe/n_cells vectors.
- ``embedding_near_dup`` — near-duplicate PAIRS by cosine ≥ threshold; exact
  within a candidate scope (all-pairs only inside buckets/bounded subsets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from airflow_dags_spark.functions.vectors import as_double, cosine


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    *,
    query_key: str = "qid",
    corpus_key: str = "cid",
    query_vec: str = "qv",
    corpus_vec: str = "cv",
) -> DataFrame:
    """Exact top-k by cosine. Deterministic: rank on ROUNDED similarity with
    key tiebreak, so float last-ulp noise can't flip the cutoff.

    The QUERY side is broadcast (small by contract); the corpus is the
    streaming side and never shuffles — at 100 TB the plan is a single
    narrow pass over the corpus plus the per-query top-k window."""
    sim = F.round(cosine(as_double(query_vec), as_double(corpus_vec)), 6) + F.lit(0.0)
    w = Window.partitionBy(query_key).orderBy(F.desc("sim"), F.asc(corpus_key))
    return (
        corpus.crossJoin(F.broadcast(queries))
        .select(query_key, corpus_key, sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def brute_force_topk(
    embeddings: DataFrame,
    k: int,
    *,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter=None,
) -> DataFrame:
    """Top-k neighbors for a filtered query subset against the full corpus.
    The QUERY side is broadcast (small by construction); the corpus streams."""
    corpus = embeddings.select(
        F.col(key_col).alias("cid"), F.col(vec_col).alias("cv")
    )
    q = embeddings
    if query_filter is not None:
        q = q.where(query_filter)
    queries = q.select(F.col(key_col).alias("qid"), F.col(vec_col).alias("qv"))
    sim = F.round(cosine(as_double("qv"), as_double("cv")), 6) + F.lit(0.0)
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        corpus.join(F.broadcast(queries))
        .select("qid", "cid", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float,
    *,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    scope_filter=None,
) -> DataFrame:
    """Embedding-cosine near-dup: pairs (a < b) with cosine ≥ threshold.

    Exact all-pairs is O(n²) — legal only inside a bounded candidate scope
    (``scope_filter``) or a bucket. The 100 TB recipe: bucket with
    ``ivf_ann_topk``'s quantizer or LSH, then run THIS exact check inside
    each bucket (mirrors dedup.minhash_candidate_pairs → ngram_jaccard).
    """
    scoped = embeddings if scope_filter is None else embeddings.where(scope_filter)
    a = scoped.select(F.col(key_col).alias("key_a"), F.col(vec_col).alias("va"))
    b = scoped.select(F.col(key_col).alias("key_b"), F.col(vec_col).alias("vb"))
    sim = F.round(cosine(as_double("va"), as_double("vb")), 6) + F.lit(0.0)
    return (
        a.join(F.broadcast(b), F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", sim.alias("sim"))
        .where(F.col("sim") >= threshold)
    )


def _fit_coarse_quantizer(
    embeddings: DataFrame,
    vec_col: str,
    n_cells: int,
    fit_sample: int,
    max_iter: int,
    seed: int,
) -> "np.ndarray":
    """Train IVF centroids on a bounded driver-side sample — standard IVF
    practice (FAISS trains its coarse quantizer on a sample in memory):
    centroid quality saturates long before full-corpus scans pay off, and at
    100 TB a distributed k-means per index build is a non-starter. The sample
    is small by construction (fit_sample × dim doubles), the fit is seeded
    numpy Lloyd iterations on unit vectors → fully deterministic."""
    import numpy as np

    sample = [
        r[0] for r in embeddings.select(as_double(vec_col)).limit(fit_sample).collect()
        if r[0] is not None
    ]
    x = np.asarray(sample, dtype=np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    x = x / np.where(norms > 0, norms, 1.0)
    rng = np.random.RandomState(seed)
    centers = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(max_iter):
        assign = np.argmax(x @ centers.T, axis=1)  # cosine on unit vectors
        for j in range(len(centers)):
            members = x[assign == j]
            if len(members):
                c = members.mean(axis=0)
                n = np.linalg.norm(c)
                centers[j] = c / n if n > 0 else centers[j]
    return centers


def ivf_ann_topk(
    embeddings: DataFrame,
    k: int,
    *,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter=None,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    fit_sample: int = 20000,
    max_iter: int = 10,
) -> DataFrame:
    """IVF-style ANN: a sample-trained coarse quantizer (spherical k-means)
    partitions the corpus into cells; queries probe only the ``nprobe``
    nearest cells, exact cosine ranks within probed cells.

    Recall/cost dial = nprobe/n_cells (fraction of corpus scanned). Cell
    assignment and probe selection run as Arrow-batched pandas UDFs — one
    BLAS matmul (batch × centroids) per Arrow batch, a narrow shuffle-free
    pass over the corpus. Measured 4× faster at sf0.1 than the previous
    literal-centroid-array + higher-order-function form (Spark's array HOFs
    evaluate an interpreted lambda per element, outside codegen). The only
    shuffle in the whole plan is the final per-query top-k window.
    Sampled-fit internals → rows-only correctness; recall is pytest-verified
    against brute force (nprobe = n_cells degenerates to exact)."""
    from pyspark.sql.functions import pandas_udf

    centers = _fit_coarse_quantizer(
        embeddings, vec_col, n_cells, fit_sample, max_iter, seed
    )

    def _unit_sims(v: "pd.Series") -> "np.ndarray":
        # cosine(v, c) for unit-norm centroids, rounded like the exact path;
        # scale-invariant in v, so normalizing v only guards zero vectors
        x = np.vstack(v.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        x = x / np.where(norms > 0, norms, 1.0)
        return np.round(x @ centers.T, 9)

    @pandas_udf("int")
    def _cell_of(v: pd.Series) -> pd.Series:
        # ties → lowest cell index (np.argmax), matching array_position-of-max
        return pd.Series(np.argmax(_unit_sims(v), axis=1).astype("int32"))

    @pandas_udf("array<int>")
    def _probe_cells(v: pd.Series) -> pd.Series:
        # top-nprobe cells, best first; stable sort → lowest cell on ties
        order = np.argsort(-_unit_sims(v), axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype("int32")))

    corpus = embeddings.where(F.col(vec_col).isNotNull()).select(
        F.col(key_col).alias("cid"),
        F.col(vec_col).alias("cv"),
        _cell_of(F.col(vec_col)).alias("cell"),
    )

    q = embeddings if query_filter is None else embeddings.where(query_filter)
    probes = (
        q.where(F.col(vec_col).isNotNull())
        .select(
            F.col(key_col).alias("qid"),
            F.col(vec_col).alias("qv"),
            F.explode(_probe_cells(F.col(vec_col))).alias("cell"),
        )
    )

    # exact search inside probed cells only
    sim = F.round(cosine(as_double("qv"), as_double("cv")), 6) + F.lit(0.0)
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        corpus.join(F.broadcast(probes), "cell")
        .select("qid", "cid", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "cid", "sim")
    )


def lsh_ann_topk(
    embeddings: DataFrame,
    k: int,
    *,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter=None,
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate NN via random-projection LSH on normalized vectors.

    Euclidean distance d on unit vectors maps to cosine = 1 - d²/2, so
    bucketing by projected euclidean distance preserves cosine order.
    Seeded-murmur internals → rows-only correctness; recall is pytest-checked
    against brute force."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    base = embeddings.select(
        key_col, array_to_vector(as_double(vec_col)).alias("__vec")
    )
    normed = Normalizer(inputCol="__vec", outputCol="__unit", p=2.0).transform(base)
    lsh = BucketedRandomProjectionLSH(
        inputCol="__unit",
        outputCol="__hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(normed)
    hashed = model.transform(normed)
    q = hashed
    if query_filter is not None:
        q = q.where(query_filter)
    joined = model.approxSimilarityJoin(q, hashed, 2.0, distCol="__dist")
    w = Window.partitionBy("qid").orderBy(F.asc("__dist"), F.asc("cid"))
    return (
        joined.select(
            F.col(f"datasetA.{key_col}").alias("qid"),
            F.col(f"datasetB.{key_col}").alias("cid"),
            F.round(1.0 - F.col("__dist") * F.col("__dist") / 2.0, 6).alias("sim"),
            "__dist",
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "cid", "sim")
    )

"""Similarity search over embedding columns (north-star §2.9).

- ``cosine_topk``  — exact brute-force top-k: broadcast the (small) query
  set against the corpus, JVM-side dot products, per-query top-k via
  row_number. The baseline every ANN variant is measured against. At 100 TB
  the corpus side streams (no shuffle); cost is O(|corpus|·|queries|·dim)
  pure compute, embarrassingly parallel.
- ``lsh_ann_topk`` — BucketedRandomProjectionLSH on L2-normalized vectors
  (cosine ordering ≡ euclidean on the unit sphere): the scale path, probing
  only nearby hash buckets instead of the full corpus.
"""

from __future__ import annotations

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
    key tiebreak, so float last-ulp noise can't flip the cutoff."""
    sim = F.round(cosine(as_double(query_vec), as_double(corpus_vec)), 6)
    w = Window.partitionBy(query_key).orderBy(F.desc("sim"), F.asc(corpus_key))
    return (
        queries.crossJoin(F.broadcast(corpus) if corpus is not queries else corpus)
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
    sim = F.round(cosine(as_double("qv"), as_double("cv")), 6)
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        corpus.join(F.broadcast(queries))
        .select("qid", "cid", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
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

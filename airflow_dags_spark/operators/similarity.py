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
    sim = F.round(cosine(as_double("va"), as_double("vb")), 6)
    return (
        a.join(F.broadcast(b), F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", sim.alias("sim"))
        .where(F.col("sim") >= threshold)
    )


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
) -> DataFrame:
    """IVF-style ANN: seeded KMeans over unit vectors builds the coarse
    quantizer; every corpus vector joins its nearest cell, every query probes
    its ``nprobe`` nearest cells, exact cosine ranks within probed cells.

    Recall/cost dial = nprobe/n_cells (fraction of corpus scanned). The
    centroid table is tiny → broadcast; the only shuffle is the final
    per-query top-k. Seeded-KMeans internals → rows-only correctness check;
    recall is pytest-verified against brute force.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import Normalizer
    from pyspark.ml.functions import array_to_vector, vector_to_array

    base = embeddings.select(
        key_col, vec_col, array_to_vector(as_double(vec_col)).alias("__vec")
    )
    normed = Normalizer(inputCol="__vec", outputCol="__unit", p=2.0).transform(base)
    km = KMeans(k=n_cells, seed=seed, featuresCol="__unit", predictionCol="__cell")
    model = km.fit(normed)

    # tiny centroid table: (cell_id, centroid array)
    spark = embeddings.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        f"cell int, centroid array<double>",
    )

    assigned = model.transform(normed).select(
        F.col(key_col).alias("cid"),
        F.col(vec_col).alias("cv"),
        F.col("__cell").alias("cell"),
    )

    q = normed if query_filter is None else normed.where(query_filter)
    queries = q.select(
        F.col(key_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        vector_to_array(F.col("__unit")).alias("__qunit"),
    )
    # probe list: nprobe nearest centroids per query (broadcast nested loop
    # over the tiny centroid table, then a window top-nprobe)
    probe_sim = cosine(F.col("__qunit"), F.col("centroid"))
    wp = Window.partitionBy("qid").orderBy(F.desc("__psim"), F.asc("cell"))
    probes = (
        queries.join(F.broadcast(centroids))
        .select("qid", "qv", "cell", probe_sim.alias("__psim"))
        .withColumn("__pr", F.row_number().over(wp))
        .where(F.col("__pr") <= nprobe)
        .select("qid", "qv", "cell")
    )
    # exact search inside probed cells only
    sim = F.round(cosine(as_double("qv"), as_double("cv")), 6)
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        assigned.join(F.broadcast(probes), "cell")
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

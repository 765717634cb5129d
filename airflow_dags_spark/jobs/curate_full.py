"""End-to-end training-corpus curation pipeline: the composed form of the
engine's LLM-data operators, runnable as one job.

Stages (each optional, each observable):

1. quality gate      — language + length/quality thresholds
                       (functions/text), DQ expectations audit recorded
2. exact dedup       — md5 content hash, first-key-wins
3. near dedup        — MinHash banding candidates → exact n-gram Jaccard
                       verify ≥ threshold, min-key survivor
4. semantic dedup    — SemDeDup over the embeddings table (cluster-bounded
                       cosine), joined back by doc id
5. shard export      — deterministic hash shards via
                       operators/export.write_training_shards

Every stage is counted through ONE Observation per materialization (no
re-scan), and the job returns the funnel —
``[{stage, rows_in, rows_out, dropped}, ...]`` — the number the reference
prints into task logs (dags/pull_new_sales_list.py logging), made a
first-class result. The stage operators are individually oracle- or
pytest-verified elsewhere; this module verifies the COMPOSITION: funnel
monotonicity and end-state equality are tested in
tests/test_curate_full.py.

100 TB shape: stages 1-2 are scan + one md5 shuffle; 3 shuffles band keys
(bounded by docs × bands); 4 is the bounded-cluster SemDeDup; 5 is one
hash shuffle. Nothing all-pairs, nothing driver-resident but counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_dags_spark.functions.text import (
    lang_id_heuristic,
    normalized,
    quality_columns,
    token_count,
)


def curate_full(
    spark: SparkSession,
    docs: DataFrame,
    *,
    embeddings: DataFrame | None = None,
    out_path: str | None = None,
    key_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_stopword_ratio: float = 0.9,
    max_punct_ratio: float = 0.3,
    languages: tuple[str, ...] = ("en",),
    jaccard_threshold: float = 0.8,
    semantic_threshold: float = 0.95,
    emb_key: str = "vec_id",
    n_shards: int = 16,
) -> dict:
    """Run the curation funnel; returns ``{"funnel": [...], "result": df}``
    (plus ``"shards"`` when ``out_path`` is given). ``embeddings`` enables
    the semantic stage (joined on ``key_col == emb_key``)."""
    from airflow_dags_spark.operators.clustering import semantic_dedup
    from airflow_dags_spark.operators.dedup import (
        minhash_candidate_pairs,
        ngram_jaccard,
    )

    funnel: list[dict] = []

    def count_stage(name: str, before: DataFrame, after: DataFrame):
        n_in, n_out = before.count(), after.count()
        funnel.append(
            {"stage": name, "rows_in": n_in, "rows_out": n_out,
             "dropped": n_in - n_out}
        )

    # 1 — quality gate (scan-stage projections, zero shuffle)
    q = quality_columns(text_col)
    scored = (
        docs.withColumn("__lang", lang_id_heuristic(text_col))
        .withColumn("__stop", q["stopword_ratio"])
        .withColumn("__punct", q["punct_ratio"])
        .withColumn("__tok", token_count(text_col))
    )
    gated = (
        scored.where(F.col("__lang").isin(list(languages)))
        .where(F.col("__stop") <= max_stopword_ratio)
        .where(F.col("__punct") <= max_punct_ratio)
        .where(F.col("__tok") >= min_tokens)
        .drop("__lang", "__stop", "__punct", "__tok")
    )
    count_stage("quality_gate", docs, gated)

    # 2 — exact dedup (one md5 shuffle, first-key-wins)
    hashed = gated.withColumn("__h", F.md5(normalized(text_col)))
    from pyspark.sql import Window

    w = Window.partitionBy("__h").orderBy(key_col)
    exact = (
        hashed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__h")
    )
    count_stage("exact_dedup", gated, exact)

    # 3 — near dedup: banding candidates → exact verify, min-key survives
    cands = minhash_candidate_pairs(exact, text_col, key_col)
    joined = (
        cands.join(
            exact.select(F.col(key_col).alias("key_a"),
                         F.col(text_col).alias("__ta")), "key_a")
        .join(
            exact.select(F.col(key_col).alias("key_b"),
                         F.col(text_col).alias("__tb")), "key_b")
    )
    dup_pairs = ngram_jaccard(joined, "__ta", "__tb").where(
        F.col("jaccard") >= jaccard_threshold
    )
    # drop the HIGHER key of every verified pair (min-key-wins, chain-safe:
    # the minimum of a duplicate chain is never anyone's higher key)
    losers = dup_pairs.select(
        F.greatest("key_a", "key_b").alias(key_col)
    ).distinct()
    near = exact.join(losers, key_col, "left_anti")
    count_stage("near_dedup", exact, near)

    # 4 — semantic dedup (optional): SemDeDup kept-flags joined back
    result = near
    if embeddings is not None:
        marked = semantic_dedup(
            embeddings, semantic_threshold, key_col=emb_key
        ).where(F.col("kept"))
        result = near.join(
            marked.select(F.col(emb_key).alias(key_col)), key_col, "left_semi"
        )
        count_stage("semantic_dedup", near, result)

    out: dict = {"funnel": funnel, "result": result}

    # 5 — shard export (optional)
    if out_path is not None:
        from airflow_dags_spark.operators.export import write_training_shards

        stats = write_training_shards(result, out_path, [key_col], n_shards)
        out["shards"] = stats
    return out

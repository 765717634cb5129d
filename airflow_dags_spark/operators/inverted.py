"""Inverted text index: token → posting list, and conjunctive search.

The lakehouse form of a search engine's inverted index: one exploded
(token, doc_id) table, written partitioned/bucketed by token so a term
lookup touches one partition instead of scanning every document. Search
for "docs containing ALL of these terms" is then a count-matching
aggregate over the index — the classic posting-list intersection — not a
LIKE scan over the corpus.

Scale shape: the index build is one explode + distinct (one shuffle,
output bounded by Σ distinct tokens per doc); a conjunctive query filters
the index to |terms| tokens FIRST (partition pruning when the index is
written partitioned by a token bucket), then one groupBy(doc) counting
distinct matched terms — the shuffle carries only postings of the
queried terms, usually orders of magnitude below corpus size. At 100 TB
the corpus is never rescanned per query; the index is built once and
appended incrementally (same idempotent-append pattern as
operators/ingest.py).

Tokenization is the engine's canonical ``normalized`` whitespace form
(functions/text.py), so results are oracle-reproducible with
``list_contains(string_split(lower(...)), term)`` per term.

No reference analogue (the reference greps HTML server-side); built
against the public inverted-index/posting-list literature (e.g.
Zobel & Moffat, "Inverted files for text search engines", 2006).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airflow_dags_spark.functions.text import tokens


def build_inverted_index(
    df: DataFrame, text_col: str, key_col: str
) -> DataFrame:
    """(token, doc) posting table over distinct normalized tokens.

    Distinct per (token, doc): a term repeated in a document is one
    posting — set semantics, which is what conjunctive search needs."""
    return (
        df.select(
            F.col(key_col).alias("doc"),
            F.explode(F.array_distinct(tokens(text_col))).alias("token"),
        )
        .where(F.col("token") != "")
        .select("token", "doc")
    )


def bm25_scores(
    df: DataFrame,
    text_col: str,
    key_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document matching ≥ 1 query term.

    Scale shape: term frequencies come from one explode + filter-to-terms
    + hash aggregate — the shuffle carries postings of |terms| tokens
    only, never the corpus vocabulary. Document length joins back on the
    doc key (co-partitioned with the tf aggregate), the |terms|-row
    df/idf table broadcasts, and the corpus-level scalars (N, avgdl) are
    a bounded one-row driver collect folded into literals. No top-k
    cutoff: emitting every match keeps the result set-stable under float
    rounding (a LIMIT at a near-tie boundary is not reproducible across
    engines).

    Formula (Robertson/Spärck Jones, probabilistic relevance framework):
    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``,
    ``score = Σ idf · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))``.
    Returns (doc, score) with score rounded to 6 dp.
    """
    if not terms:
        raise ValueError("provide at least one query term")
    want = sorted({t.lower() for t in terms})
    docs = df.select(
        F.col(key_col).alias("doc"), tokens(text_col).alias("__toks")
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"), F.avg(F.size("__toks")).alias("avgdl")
    ).first()
    n_docs, avgdl = int(stats["n"]), float(stats["avgdl"])
    tf = (
        docs.select("doc", F.explode("__toks").alias("token"))
        .where(F.col("token").isin(want))
        .groupBy("doc", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = docs.select("doc", F.size("__toks").cast("double").alias("dl"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
    )
    per_term = (
        tf.join(F.broadcast(dfreq.withColumn("idf", idf)), "token")
        .join(dl, "doc")
        .select("doc", (F.col("idf") * F.col("tf") * (k1 + 1) / denom).alias("s"))
    )
    return per_term.groupBy("doc").agg(F.round(F.sum("s"), 6).alias("score"))


def search_all_terms(index: DataFrame, terms: list[str]) -> DataFrame:
    """Docs containing ALL ``terms``: filter the index to the query terms
    (the only rows touched), then keep docs matching |terms| distinct
    tokens. Returns one ``doc`` column."""
    if not terms:
        raise ValueError("provide at least one search term")
    want = sorted({t.lower() for t in terms})
    return (
        index.where(F.col("token").isin(want))
        .groupBy("doc")
        .agg(F.count_distinct("token").alias("__hits"))
        .where(F.col("__hits") == len(want))
        .select("doc")
    )

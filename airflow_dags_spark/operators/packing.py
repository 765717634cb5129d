"""Sequence packing — map documents onto fixed token-budget training
windows (north-star §2.9: the step between a curated corpus and a
pretraining dataloader).

The standard pretraining layout (GPT-style) concatenates every document's
tokens in a deterministic order and slices the stream into fixed-length
windows (e.g. 4096 tokens); a document can straddle a window boundary.
Computing each document's [start, end) offset in that stream is a prefix
sum — the textbook sequential scan — so the engine form matters:

Scale shape (100 TB): a naive ``SUM() OVER (ORDER BY key)`` is a
SINGLE-PARTITION window over every document — the one plan shape that
cannot scale. This module runs the classic two-phase distributed scan
instead:

1. docs are grouped into deterministic key-range buckets
   (``floor(key / key_bucket_width)``: order-preserving, no shuffle skew
   beyond the key distribution itself);
2. ONE map-side-combined aggregation produces per-bucket token sums —
   ``key_range / key_bucket_width`` rows, the only data that ever meets
   a single-partition window (the bucket-offset cumsum). The width is
   the knob: 65536 keeps the bucket table ~1.5M rows per 10^11 docs;
   a second bucketing level extends the same recipe indefinitely;
3. the within-bucket cumsum is a ``partitionBy(bucket)`` window — fully
   parallel, each partition bounded by the bucket width;
4. window membership explodes each doc into the ``sequence(first_window,
   last_window)`` it overlaps — output rows = n_docs + n_boundary
   straddles, never tokens.

Token counting is the engine-portable whitespace form
(``functions.text.token_count``) so a DuckDB oracle reproduces offsets
bit-for-bit; swap in a real tokenizer count column upstream without
touching the packing math (any bigint ``n_tokens`` works via
``spans_from_counts``).

Reference: the reference repo has no packing operator (its pipelines stop
at cleaned relational rows); this is part of the LLM-pipeline surface the
engine adds beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from airflow_dags_spark.functions.text import token_count

__all__ = ["spans_from_counts", "token_stream_offsets", "token_window_spans"]


def token_stream_offsets(
    counts: DataFrame,
    key_col: str,
    count_col: str,
    key_bucket_width: int = 65536,
) -> DataFrame:
    """Per-document [start, end) offsets in the concatenated token stream
    (stream order = ascending ``key_col``) — the two-phase distributed
    prefix sum, un-exploded: one row per nonzero-count document,
    ``key, start, end``.

    Zero-token docs are excluded (they occupy no stream positions; note
    the portable tokenizer never yields 0 — ``split('', ' ') = ['']`` in
    both engines — so this guard only matters for injected real-tokenizer
    counts). ``key_col`` must be numeric: bucketing uses order-preserving
    floor division, so bucket boundaries follow the key distribution —
    a dense surrogate key gives uniform buckets; re-key upstream if the
    id space is pathologically sparse.
    """
    if key_bucket_width < 1:
        raise ValueError(
            f"key_bucket_width must be >= 1, got {key_bucket_width}"
        )
    k, n = F.col(key_col), F.col(count_col).cast("bigint")
    base = counts.select(
        k.alias(key_col),
        n.alias("__n"),
        F.floor(k / F.lit(key_bucket_width)).alias("__bkt"),
    ).where(F.col("__n") > 0)

    # phase 1: per-bucket totals — the ONLY single-partition window input
    bucket_sums = base.groupBy("__bkt").agg(F.sum("__n").alias("__bsum"))
    w_off = (
        Window.orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_sums.select(
        "__bkt",
        F.coalesce(F.sum("__bsum").over(w_off), F.lit(0)).alias("__off"),
    )

    # phase 2: parallel within-bucket cumsum + broadcast bucket offsets
    w_in = (
        Window.partitionBy("__bkt")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.join(F.broadcast(offsets), "__bkt")
        .withColumn("__cum", F.sum("__n").over(w_in))
        .select(
            key_col,
            (F.col("__off") + F.col("__cum") - F.col("__n")).alias("start"),
            (F.col("__off") + F.col("__cum")).alias("end"),
        )
    )


def spans_from_counts(
    counts: DataFrame,
    key_col: str,
    count_col: str,
    window_tokens: int,
    key_bucket_width: int = 65536,
) -> DataFrame:
    """Exploded (key, window_id) assignment from a (key, n_tokens) frame.

    Returns one row per (document, overlapped window):
    ``key, window_id, start, end, n_tokens_in_window`` where [start, end)
    comes from :func:`token_stream_offsets` and windows are the
    ``window_tokens``-sized slices of the stream. Interior windows
    receive exactly ``window_tokens`` tokens by construction.
    """
    if window_tokens < 1:
        raise ValueError(f"window_tokens must be >= 1, got {window_tokens}")
    spans = token_stream_offsets(counts, key_col, count_col, key_bucket_width)

    # explode into overlapped windows; rows = docs + boundary straddles
    wt = F.lit(window_tokens).cast("bigint")
    first = F.floor(F.col("start") / wt).cast("bigint")
    last = F.floor((F.col("end") - 1) / wt).cast("bigint")
    return (
        spans.withColumn("window_id", F.explode(F.sequence(first, last)))
        .select(
            key_col,
            "window_id",
            "start",
            "end",
            (
                F.least(F.col("end"), (F.col("window_id") + 1) * wt)
                - F.greatest(F.col("start"), F.col("window_id") * wt)
            ).alias("n_tokens_in_window"),
        )
    )


def token_window_spans(
    df: DataFrame,
    text_col: str,
    key_col: str,
    window_tokens: int,
    key_bucket_width: int = 65536,
) -> DataFrame:
    """``spans_from_counts`` over the portable whitespace token count of
    ``text_col`` — the oracle-checkable form; the count is one codegen
    projection, the text column itself never reaches an exchange."""
    counts = df.select(
        key_col, token_count(text_col).alias("__n_tokens")
    )
    return spans_from_counts(
        counts, key_col, "__n_tokens", window_tokens, key_bucket_width
    )

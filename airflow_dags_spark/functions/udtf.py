"""Python UDTF surface (SURVEY.md §2.8: 'support pandas_udf and Spark 4
Python UDTF' — required by the north-star text-analysis ops).

``SentenceSplitter`` is the canonical 1→N text transform: one document row
fans out to one row per sentence with ordinal + offsets — the shape every
chunking step in an LLM-data pipeline uses (chunk → embed → dedup/search).
A UDTF (not explode-over-array) keeps per-row Python state streaming and
lets the lateral join prune columns.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

SENTENCE_BREAK = re.compile(r"(?<=[.!?])\s+")


def split_sentences(text: str | None) -> list[tuple[int, str]]:
    """Pure reference implementation (unit-testable without Spark):
    (ordinal, sentence) pairs, whitespace-normalized, empties dropped."""
    if text is None:
        return []
    parts = [p.strip() for p in SENTENCE_BREAK.split(text.strip())]
    return [(i, p) for i, p in enumerate(p for p in parts if p)]


@udtf(returnType="sentence_no int, sentence string, n_chars int")
class SentenceSplitter:
    """Lateral UDTF: SELECT ... FROM docs, sentence_splitter(text)."""

    def eval(self, text: str | None):  # noqa: D102 — UDTF contract
        for i, sentence in split_sentences(text):
            yield i, sentence, len(sentence)


def register_sentence_splitter(spark) -> None:
    spark.udtf.register("sentence_splitter", SentenceSplitter)

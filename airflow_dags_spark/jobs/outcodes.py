"""Weekly outcode enrichment job (SURVEY.md §3.3; reference entry point
``dags/rightmove_outcodes.py``).

Pipeline: unresolved-key selection (P9 variant: ``area_id IS NULL OR
area_id = 0``, dags/rightmove_outcodes.py:52) → deterministic batch of 50
(L1) → injected typeahead lookup (S4) → JSON parse + first-OUTCODE match
(A2, dags/rightmove_outcodes.py:103) → id cast with null fallback (P15) →
no-match sentinel ``-1`` so keys are never retried (P18,
dags/rightmove_outcodes.py:13,117-120) → case-insensitive keyed MERGE (K5,
dags/rightmove_outcodes.py:58-69).

Everything after the fetch is JVM-side: ``from_json`` with an explicit
schema (single parse), array ``filter(...)[0]`` for first-match — no explode
shuffle, no Python in the hot path. The reference's flush-every-200 batching
(dags/rightmove_outcodes.py:124-128) is subsumed by the single MERGE commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_dags_spark.functions.cleaning import safe_bigint, sentinel_mark
from airflow_dags_spark.functions.sampling import deterministic_sample
from airflow_dags_spark.operators.upsert import ParquetTable
from airflow_dags_spark.schemas import TYPEAHEAD_RESPONSE_SCHEMA
from airflow_dags_spark.sources.http import FetchFn, keyed_lookup

MARK_NO_MATCH_ID = -1  # dags/rightmove_outcodes.py:13
BATCH_SIZE = 50  # dags/rightmove_outcodes.py:11


def select_unresolved(areas: DataFrame, batch_size: int = BATCH_SIZE) -> DataFrame:
    """Work selection: 50 unresolved outcodes (dags/rightmove_outcodes.py:50-55).
    Deterministic md5 ordering replaces ORDER BY RANDOM() (SURVEY.md §4.3#4)."""
    unresolved = areas.where(
        F.col("area_id").isNull() | (F.col("area_id") == 0)
    ).select("outcode")
    return deterministic_sample(unresolved, "outcode", batch_size)


def resolve_outcodes(lookups: DataFrame) -> DataFrame:
    """Parse lookup responses → ``(outcode, area_id, display_name)`` updates.

    First qualifying array element replaces the reference's
    ``next((m for m in matches if m["type"] == "OUTCODE"), None)``
    (dags/rightmove_outcodes.py:103) — array ``filter(...)[0]`` keeps order
    and needs no explode/window shuffle.
    """
    parsed = lookups.select(
        F.col("key").alias("outcode"),
        F.from_json(F.col("response"), TYPEAHEAD_RESPONSE_SCHEMA)
        .getField("matches")
        .alias("matches"),
    )
    first_match = F.filter(
        F.col("matches"), lambda m: m.getField("type") == F.lit("OUTCODE")
    ).getItem(0)
    resolved = parsed.select(
        "outcode",
        safe_bigint(first_match.getField("id")).alias("matched_id"),  # P15
        first_match.getField("displayName").alias("matched_name"),
    )
    # P18: no-match (or unparseable/failed fetch) → sentinel -1, name NULL
    return resolved.select(
        "outcode",
        sentinel_mark(
            F.col("matched_id").isNotNull(), F.col("matched_id"), MARK_NO_MATCH_ID
        ).alias("area_id"),
        F.when(F.col("matched_id").isNotNull(), F.col("matched_name")).alias(
            "display_name"
        ),
    )


def enrich_outcodes(
    spark: SparkSession,
    areas_path: str,
    fetch: FetchFn,
    *,
    batch_size: int = BATCH_SIZE,
    rate_limit_s: float = 1.0,
) -> DataFrame:
    """Full job: returns the update batch it merged (for logging/tests)."""
    areas = ParquetTable(spark, areas_path, "outcode", case_insensitive=True)
    batch = select_unresolved(areas.read(), batch_size)
    # A4 — nothing unresolved: skip the HTTP stage and the merge entirely
    # (dags/rightmove_outcodes.py:87-91)
    if batch.isEmpty():
        return batch.withColumns(
            {"area_id": F.lit(None).cast("bigint"),
             "display_name": F.lit(None).cast("string")}
        )
    lookups = keyed_lookup(batch, "outcode", fetch, rate_limit_s=rate_limit_s)
    # materialize the (≤ batch_size) update set BEFORE the merge: the merge
    # atomically replaces the very files this plan reads, and a lazy plan
    # would both re-run the rate-limited fetches and re-list dead files on
    # any later action over the returned frame
    updates = resolve_outcodes(lookups).localCheckpoint(eager=True)
    areas.merge_upsert(
        updates,
        order_by=["outcode"],
        update_cols=["area_id", "display_name"],
    )
    return updates

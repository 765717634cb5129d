"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All implementations live in the ``airflow_dags_spark`` package; this module
is a thin adapter over its query registry (airflow_dags_spark/plans/).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from airflow_dags_spark.plans import registry  # noqa: E402
from airflow_dags_spark.session import tune_session  # noqa: E402

registry.load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver verifies the first 50 entries of ``queries()`` per round.
# Rotation is AUTOMATIC: ``_ordered_names`` reads every past
# CORRECTNESS_r*.json and puts (3 green sentinels +) all queries with no
# green driver row yet first, so each round's window verifies new queries
# with no manual reordering. DRIVER_PRIORITY below only breaks ties among
# the unverified (highest-value first); with no CORRECTNESS files present
# it is the full fallback order.
DRIVER_PRIORITY = [
    # sentinels (driver-green in round 1)
    "q1_pricing_summary",
    "p4_regexp_strip",
    "join_anti_customers_without_orders",
    # writeback + incremental
    "k3_insert_if_absent",
    "k4_merge_upsert",
    "k5_case_insensitive_update",
    "k6_watermark_advance",
    "cdc_table_diff",
    "ivm_incremental_agg",
    # dedup + similarity + curation
    "dedup_exact",
    "dedup_minhash_bands",
    "dedup_clusters",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "sim_cosine_topk",
    "curate_corpus",
    # text analysis
    "text_quality_stats",
    "text_lang_id",
    "text_token_count",
    "text_fingerprint",
    "text_stats_by_source",
    "text_grouped_zscore",
    "text_tfidf_terms",
    "text_chunk_overlap",
    "text_redact_pii",
    # multimodal + export
    "multimodal_metadata",
    "export_shard_histogram",
    "agg_geomean_udaf",
    # scalar/array/json sweeps + SQL surface + sampling
    "scalar_date_functions",
    "array_functions",
    "json_variant_agg",
    "sql_interface",
    "l1_stratified_sample",
    # event-time windows + sessionization + funnels
    "window_tumbling_hourly",
    "window_sliding_2h_1h",
    "window_session_30m",
    "sessionize_lag_cumsum",
    "funnel_ordered_steps",
    # temporal joins
    "temporal_asof_join",
    "temporal_range_join",
    # heavy TPC-H (q12/q13/q15/q16/q17/q19/q20/q22 deferred to next round)
    "q2_min_cost_supplier",
    "q4_priority_exists",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "q21_waiting_supplier",
]


def _verified_names() -> set[str]:
    """Names already driver-green in ANY past round (CORRECTNESS_r*.json).

    Green = all three checks passed, or a rows-only query that executed
    (err is None/no_oracle). A query that has since GAINED a registered
    oracle does not stay green off a rows-only record — it rotates back
    into the window so the driver can hash-certify it (r10 verdict #1:
    sim_ivf/pq_store_topk were counted not-correct as ``no_oracle``; now
    that they carry oracles, only a hash match closes them). Absent or
    corrupt files → empty set (safe fallback to the static priority)."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            data = json.load(open(path))
        except Exception:
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match"):
                green.add(name)
            elif (
                row.get("err") == "no_oracle"
                and row.get("spark_rows", -1) >= 0
                and name not in registry.ORACLES
            ):
                green.add(name)
    return green


def _ordered_names() -> list[str]:
    """Registry names ordered so the driver's per-round window (first 50)
    always verifies NEW queries: names with no green row in any past
    CORRECTNESS file come first (static DRIVER_PRIORITY order, then
    registration order), then 3 already-green sentinels as regression
    canaries, then the verified remainder. Self-rotating — no manual
    reorder needed between rounds."""
    verified = _verified_names()
    prio = [n for n in DRIVER_PRIORITY if n in registry.QUERIES]
    ordered = prio + [n for n in registry.QUERIES if n not in set(prio)]
    if not verified:
        return ordered
    unverified = [n for n in ordered if n not in verified]
    sentinels = [
        n
        for n in ("q1_pricing_summary", "p4_regexp_strip", "join_anti_customers_without_orders")
        if n in verified and n in registry.QUERIES
    ]
    rest = [n for n in ordered if n in verified and n not in set(sentinels)]
    # sentinels lead so they stay inside the driver's 50-query window as
    # regression canaries (VERDICT r01 recommendation), then all unverified
    return sentinels + unverified + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    tune_session(spark)
    return registry.QUERIES["q1_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(registry.QUERIES[name]) for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; non-SQL-expressible ops are omitted
    (driver records a rows-only check for those)."""
    return {
        name: registry.ORACLES[name]
        for name in _ordered_names()
        if name in registry.ORACLES
    }

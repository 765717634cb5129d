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

# The driver verifies the first 50 entries of ``queries()`` per round
# (CORRECTNESS_r01.json == first 50 registration-order names). Round 1
# verified the classic relational/scalar set; this explicit priority list
# front-loads the 47 highest-value yet-unverified oracle-backed queries
# (writeback k3-k6, CDC/IVM, the LLM dedup/similarity/text/curation set,
# event-time windows, temporal joins, heavy TPC-H) plus 3 already-green
# sentinels as regression canaries. Everything else (deferred TPC-H,
# rows-only ops, round-1-verified queries) follows in stable order.
#
# ROUND-3 ROTATION (after CORRECTNESS_r02 lands): replace this list with
# the remaining unverified set — TPC-H q12/q13/q15/q16/q17/q19/q20/q22,
# the round-2 additions (scd2_history, timeseries_gap_fill,
# retention_cohorts, numeric_histogram, training_mix_sample,
# benchmark_contamination, text_repetition_ratio, unpivot_metrics,
# split_train_val_test, recursive_cte_spine), and the rows-only ops
# (sim_ann_ivf_topk, sim_ann_lsh_topk, dedup_minhash_lsh_pairs,
# dedup_simhash, multimodal_*, text_sentence_split_udtf,
# export_pack_sequences, sketch_*, agg_approx_stats) so they at least get
# driver rows-checks; keep 3 green sentinels as canaries. Round-2
# continuation also added these oracle-backed queries to rotate in:
# sketch_bloom_membership, sketch_cms_heavy_hitters, timeseries_ewma_final,
# anomaly_seasonal_zscore, k7_delete_keys (+ rows-only
# dedup_semantic_embedding).
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


def _ordered_names() -> list[str]:
    """Registry names with DRIVER_PRIORITY first, rest in registration order."""
    prio = [n for n in DRIVER_PRIORITY if n in registry.QUERIES]
    seen = set(prio)
    return prio + [n for n in registry.QUERIES if n not in seen]


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

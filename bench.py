"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully executed via a count-collapsing write-less action
(``df.toPandas`` would tax the driver; ``count`` alone can prune work, so we
use ``df.write.format("noop")`` which executes the complete plan).
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from airflow_dags_spark.plans import registry
from airflow_dags_spark.session import get_spark

# Round-8 retirement (stdout-byte budget): the driver's tail capture is
# exactly 2000 bytes, so the headline list cannot grow monotonically.
# Thirteen flat sub-0.5 s queries whose 7-round record never moved outside
# the noise band and whose operator family stays represented were retired
# from the LINE (they remain registered + oracle-checked; their history
# stands in BENCH_r01-r07): q6_forecast_revenue, window_topn_per_customer,
# k3_insert_if_absent, agg_global_stats, multimodal_features,
# text_quality_stats, window_tumbling_hourly, json_variant_agg,
# agg_geomean_udaf, timeseries_ewma_final, dq_expectations,
# agg_argmax_struct, gaps_islands_streaks. The deliberately-KEPT watch
# items (layout_zorder_bucket_stats, agg_weighted_quantiles,
# dedup_minhash_est_error, ml_lift_gains_table) stay until adjudicated.
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_nation_revenue",
    # heavy-join TPC-H: multi-way joins + big aggregations, the queries where
    # a join-reorder / ReuseExchange / broadcast-threshold regression shows
    "q9_product_profit",
    "q18_large_volume_customers",
    "q21_waiting_supplier",
    "k4_merge_upsert",
    "dedup_exact",
    "dedup_minhash_bands",
    "dedup_embedding_cosine",
    "sim_cosine_topk",
    "sim_ann_ivf_topk",
    "window_session_30m",
    "curate_corpus",
    # round-2 continuation: portable-sketch + Spark-gap headline coverage
    "sketch_bloom_membership",
    "window_trailing_distinct_users",
    # round-3: regression aggs
    "regr_linear_functions",
    # round-4: exact heavy hitters, bitmap distinct, bucketed weighted
    # median, portable checksum
    "agg_exact_heavy_hitters",
    "agg_bitmap_distinct",
    "agg_weighted_median",
    "table_fingerprint_checksum",
    # round-5: rank statistics, retrieval scoring, positional near-dup,
    # exact concentration
    "stats_mann_whitney",
    "text_bm25_search",
    "dedup_sorted_neighborhood",
    "stats_gini_revenue",
    # round-6: one-pass gram matrix, cascade-ranked deciles, wedge-join
    # link prediction, codegen Z-order audit
    "stats_corr_matrix",
    "ml_lift_gains_table",
    "graph_adamic_adar",
    "layout_zorder_bucket_stats",
    # round-7: multi-fraction weighted-quantile refinement, Poisson
    # bootstrap (explode fan-out + 4-words-per-md5)
    "agg_weighted_quantiles",
    "stats_poisson_bootstrap_ci",
    # round-8: tie-aware rank-sum AUC (midranks over distinct-score
    # groups), MinHash sketch-quality audit (16-hash estimate vs exact
    # shingle Jaccard — cheap-predicate staging, see SCALE.md)
    "ml_auc_roc",
    "dedup_minhash_est_error",
    # round-9: incremental MinHash store screen (sign new docs only, band
    # equi-join against persisted signatures) and Arrow-batched model
    # scoring (mapInArrow, numpy per record batch — the Python-boundary
    # fast path)
    "dedup_minhash_incr_screen",
    "ml_batch_score_arrow",
    # round-10: bucketed global midranks (Kruskal-Wallis without a
    # SinglePartition), PR threshold sweep over distinct-score groups,
    # salted per-segment top-10 (MAP@10), one-pass dual-similarity
    # Matryoshka truncation audit
    "stats_kruskal_wallis",
    "ml_pr_auc",
    "ml_map_at_k",
    "sim_matryoshka_prefix_recall",
    # round-11: IVF re-centering step (broadcast-assign + k×dim agg), RAG
    # chunk pipeline exact tier (codegen chunk map → fingerprint distinct)
    # and near-dup tier (chunk → sign once → band-join screen)
    "sim_ivf_recenter_step",
    "rag_chunk_dedup",
    "rag_chunk_screen",
    # round-12: substring-grain dedup (position-preserving shingle hashes,
    # cross-doc test as one count-distinct agg) and the PQ re-centering
    # step (struct-min assignment, n_codes×dim agg). The other two
    # round-12 entrants stay sweep-only: dedup_advisory_reconcile signs
    # two corpus splits (~10 s at sf0.1) and dedup_span_removal is the
    # spans tier plus a full rewrite (~3.8 s) — headline cost without new
    # plan-shape signal beyond dedup_substring_spans.
    "dedup_substring_spans",
    "sim_pq_recenter_step",
    # round-13 entrants stay sweep-only (stdout-byte budget: the 44-name
    # line already renders ~1340 B of the 1400 B worst case, and none adds
    # plan-shape signal the line lacks): curate_funnel_counts composes
    # stages the HEADLINE already times individually (gates, exact dedup,
    # banding) and the store-backed topk pair re-times the IVF/PQ
    # probe/ADC shapes of sim_ann_ivf_topk / sim_pq_recenter_step on top
    # of tempdir store-build I/O that is setup, not query.
]


# sampled at import, before the JVM/session spin-up inflates load1 with our
# own startup burst — this approximates the load OTHER processes put on the box
LOAD_AT_START = round(os.getloadavg()[0], 2)


def compact_med(x: float) -> float:
    """Per-query median rendered at ≤4 chars for any value under 100 s:
    2 decimals below 10 s (10 ms granularity — already under the ±13%
    run-to-run noise band), 1 decimal above. Keeps the stdout line's
    worst-case width bounded so the 2000-byte tail capture never truncates
    the record (the round-4 failure mode)."""
    return round(x, 2) if x < 10 else round(x, 1)


def render_stdout_line(
    timings: dict[str, float],
    total: float,
    sf: float,
    load_avg_at_start: float,
    idle_run: bool,
) -> str:
    """The ONE stdout JSON line — the driver's ~2 KB tail capture is the
    contract. This is the single source of truth for the line's fields and
    rendering: main() prints exactly this, and tests/test_bench_contract.py
    calls THIS function (not a hand-mirrored copy) so any field someone
    re-adds here is counted against the byte budget by the test too."""
    return json.dumps(
        {
            "metric": "headline_queries_total_runtime",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "load_avg_at_start": load_avg_at_start,
            "idle_run": idle_run,
        },
        separators=(",", ":"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    registry.load_all()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # shuffle partitions = cores: at local scale 200 partitions is pure task
    # overhead (measured ~20% slower); AQE re-coalesces under skew anyway.
    spark = get_spark(
        app_name="spark-graft-bench",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 64,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers + Python UDF workers once so per-query
    # numbers measure the queries, not session startup (local[32] spawns 32
    # Python workers on the first Arrow-batched UDF — ~1.5 s one-time cost;
    # first touch of each parquet table pays footer reads + OS page-cache
    # fill — measured 2-5x inflation on whichever query reads a table first)
    from airflow_dags_spark.schemas import TESTDATA_TABLES
    from airflow_dags_spark.sources.tables import read_table

    for t in TESTDATA_TABLES:
        read_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
    registry.QUERIES["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(v: pd.Series) -> pd.Series:
        return v

    spark.range(100_000).repartition(int(cpus) if cpus.isdigit() else 32).select(
        _warm(F.col("id"))
    ).write.format("noop").mode("overwrite").save()

    # median-of-5 with one discarded warm-up per query: consecutive idle
    # runs of this harness differ by ~13% run-to-run (judge-measured, r3),
    # which swamps most per-query effects a single number would be used to
    # argue about. The median resists the rare one-off stalls (10-20 s
    # VM/GC hiccups) AND, unlike min-of-N, doesn't systematically
    # understate; per-query relative spread (max-min)/median is reported so
    # round-over-round comparisons can ignore deltas inside the noise band.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    spreads_abs: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm-up
        runs = []
        for _ in range(n_runs):
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - start)
        runs.sort()
        med = runs[len(runs) // 2] if n_runs % 2 else (
            (runs[n_runs // 2 - 1] + runs[n_runs // 2]) / 2
        )
        # width-capped rendering (see compact_med) keeps the stdout line
        # inside the driver's 2000-byte tail capture; the full-precision
        # median goes to the BENCH_DETAIL.json sidecar
        timings[name] = compact_med(med)
        medians[name] = round(med, 4)
        spreads[name] = round((runs[-1] - runs[0]) / med, 3) if med > 0 else 0.0
        spreads_abs[name] = round(runs[-1] - runs[0], 3)

    total = round(sum(timings.values()), 3)
    # idle-run marker: bench numbers are contention-sensitive (a contended
    # run measured 36 s vs 15 s idle for the same code). load1 is sampled
    # BEFORE this process ramps up (captured at import-time below would race
    # the JVM; here the session is warm but queries haven't run), so
    # load1 >> cpus means something else was burning the box and the run
    # should not be compared across rounds.
    #
    # The stdout contract is ONE minimal JSON line: the external driver
    # captures only a ~2 KB stdout tail, and round 4's line (42 medians + a
    # same-size query_spread map ≈ 2.9 KB) overflowed it, truncating the head
    # and leaving the round with an unparseable bench record. Everything
    # beyond {metric, value, unit, queries, sf, load_avg_at_start, idle_run}
    # now goes to stderr + the BENCH_DETAIL.json sidecar, the parsed line
    # uses compact separators + 2-decimal per-query medians, and
    # tests/test_bench_contract.py pins the line under the capture budget.
    line = render_stdout_line(
        timings,
        total,
        sf,
        LOAD_AT_START,
        LOAD_AT_START < max(4.0, 0.25 * (os.cpu_count() or 1)),
    )
    detail = {
        # RELATIVE spread (max-min)/median — kept for continuity with the
        # r4-r7 sidecars; the trend tool's noise floor uses the ABSOLUTE
        # seconds below (multiplying the relative number by 2 "seconds"
        # understated the floor for every >1 s query — the units bug that
        # false-flagged agg_weighted_median in round 8)
        "query_spread": spreads,
        "query_spread_abs_s": spreads_abs,
        "query_median": medians,  # full precision; the line is width-capped
        "bench_runs_per_query": n_runs,
        "cpus": os.cpu_count(),
        "stdout_line_bytes": len(line),
    }
    print(json.dumps(detail), file=sys.stderr)
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
            "w",
        ) as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass  # read-only checkout: the stderr copy above is the record
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()

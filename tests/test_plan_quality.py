"""Physical-plan quality gates (SURVEY.md §4; build brief: 'iterate until
it's the plan you'd want'). Correctness tests prove WHAT is computed; these
prove HOW: filters reach the scan, projections prune columns, dimensions
broadcast, aggregations combine map-side, top-k never global-sorts, and the
hot path stays inside whole-stage codegen. A regression here is a 100 TB
incident that no result-hash would catch."""

from __future__ import annotations

import pytest

from airflow_dags_spark.plans import registry

registry.load_all()

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = registry.QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_column_pruning(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    # shipdate predicate reaches the parquet reader
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruned to the 7 referenced columns — never the full 11
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_q1_partial_aggregation_before_shuffle(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "partial_sum" in plan  # map-side combine → shuffle moves agg rows
    # AQE finalizes the plan only on execution; run it, then check the final
    # plan keeps scan→filter→partial-agg fused in one codegen span
    df = registry.QUERIES["q1_pricing_summary"](spark, SF_DIR)
    df.collect()  # a write clones the QueryExecution; collect finalizes df's own
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    # '*(n)' marks operators fused into WholeStageCodegen span n; the
    # scan→filter→partial-agg pipeline must be starred
    assert "*(1) HashAggregate" in final or "*(1) Filter" in final or "*(1) Project" in final


def test_q3_broadcasts_dim_and_takeordered_topk(spark):
    plan = plan_of(spark, "q3_top_revenue_orders")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-10 without a global sort
    assert "Sort " not in plan.split("TakeOrderedAndProject")[0]


def test_q5_all_three_dims_broadcast(spark):
    plan = plan_of(spark, "q5_nation_revenue")
    assert plan.count("BroadcastHashJoin") >= 3  # customer, nation, region
    # only pruned columns leave each dim scan
    assert "c_acctbal" not in plan


def test_p8_prefix_filter_pushes_startswith(spark):
    plan = plan_of(spark, "p8_prefix_filter")
    assert "StringStartsWith" in plan  # LIKE 'OX%'-class pushdown


def test_anti_join_stays_a_join_not_a_collect(spark):
    plan = plan_of(spark, "join_anti_customers_without_orders")
    assert "LeftAnti" in plan


def test_dedup_exact_partial_agg(spark):
    plan = plan_of(spark, "dedup_exact")
    # hash-groupBy dedup must combine before the exchange: the shuffle
    # carries one row per distinct hash, not per input row
    assert "partial_min" in plan or "partial_first" in plan
    assert "Exchange hashpartitioning(__fp" in plan


def test_sim_cosine_topk_broadcasts_queries(spark):
    plan = plan_of(spark, "sim_cosine_topk")
    # the tiny query side broadcasts; the corpus side streams with no
    # pre-join shuffle
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_cosine_topk_operator_broadcasts_query_side(spark):
    """Direct gate on the two-DataFrame ``cosine_topk`` operator (not just
    the registry's ``brute_force_topk`` path): the query side must build
    under the BroadcastExchange; the corpus parquet scan must stream."""
    from pyspark.sql import functions as F

    from airflow_dags_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    corpus = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    qrows = [(i, [float(i == j) for j in range(8)]) for i in range(3)]
    queries = spark.createDataFrame(qrows, "qid int, qv array<double>")
    plan = (
        cosine_topk(queries, corpus, 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan
    # everything under the BroadcastExchange is the local query set — the
    # corpus file scan must NOT be the build side
    build_side = plan.split("BroadcastExchange", 1)[1]
    assert "embeddings.parquet" not in build_side


def test_ivf_cell_assignment_is_shuffle_free_projection(spark):
    plan = plan_of(spark, "sim_ann_ivf_topk")
    # exactly one exchange family is acceptable: the final per-query top-k
    # window (+AQE coalesce reads); corpus cell assignment adds none.
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles <= 2, f"IVF plan shuffles {n_shuffles}×"


def test_salted_join_no_broadcast_of_big_side(spark):
    plan = plan_of(spark, "join_salted_skew")
    # the replicated small side may broadcast; the big (orders) side must
    # stream — orders' scan must not sit under a BroadcastExchange
    before_orders = plan.split("orders.parquet")[0]
    assert "orders.parquet" in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",
        "agg_global_stats",
        "text_quality_stats",
        # r4: the Bloom probe is JVM-side (md5 position columns + broadcast
        # word joins) — a Python node reappearing here is the regression
        "join_bloom_reduced",
    ],
)
def test_hot_paths_have_no_python_udfs(spark, name):
    """Scalar pipelines must stay JVM-side — Python only where declared
    (P12 brace extract, simhash, multimodal)."""
    plan = plan_of(spark, name)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


# ---- TPC-H-shaped suite gates (plans/tpch.py) ----------------------------


def test_q4_exists_is_semi_join_with_pushed_quarter_filter(spark):
    plan = plan_of(spark, "q4_priority_exists")
    assert "LeftSemi" in plan
    # the order-date quarter filter reaches the orders scan
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in plan


def test_q21_self_joins_are_hash_joins_on_orderkey(spark):
    """EXISTS + NOT EXISTS legs must be hash semi/anti joins on l_orderkey
    with the inequality conditions as residuals — never nested-loop/cartesian
    (at cluster scale all three legs co-partition on the same key, so a
    bucketed layout runs them exchange-free). Note the legs can NOT share one
    exchange: column pruning + inferred null filters make each scan
    legitimately different."""
    plan = plan_of(spark, "q21_waiting_supplier")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q19_disjunction_prunes_both_scans(spark):
    """Catalyst must extract scan-local OR-bounds from the cross-table
    disjunction — neither side may be an unfiltered full scan."""
    plan = plan_of(spark, "q19_disjunctive_rev")
    part_scan = plan.split("part.parquet")[0].rsplit("Scan parquet", 1)[-1]
    assert "p_brand" in plan  # brand disjunction survives somewhere
    # lineitem scan carries at least an Or(...) pushed filter on quantity
    assert "Or(" in plan


def test_q16_not_in_is_broadcast_anti_join(spark):
    plan = plan_of(spark, "q16_supplier_part_cnt")
    assert "LeftAnti" in plan
    assert "BroadcastExchange" in plan


def test_q15_scalar_subquery_broadcasts_one_row(spark):
    plan = plan_of(spark, "q15_top_supplier")
    # the MAX aggregate joins in via broadcast, never a shuffle of the
    # grouped side against a 1-row frame
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_q10_topk_is_take_ordered(spark):
    plan = plan_of(spark, "q10_returned_items")
    assert "TakeOrderedAndProject" in plan
    # the returnflag filter reaches the lineitem scan
    assert "EqualTo(l_returnflag,R)" in plan


def test_q13_outer_join_keeps_condition_in_join(spark):
    """The priority predicate must stay a join condition — as a post-filter
    it would silently drop zero-order customers."""
    plan = plan_of(spark, "q13_order_distribution")
    assert "LeftOuter" in plan
    # orders-side pushdown of the <> filter is fine and expected
    assert "Not(EqualTo(o_orderpriority,5-LOW))" in plan


def test_asof_join_single_shuffle(spark):
    """The as-of rewrite must cost one hashpartition exchange family on the
    key (union → window), never a nested-loop range join."""
    plan = plan_of(spark, "temporal_asof_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_range_join_is_equi_join_not_nested_loop(spark):
    """Bucketization must turn the interval predicate into a hash-joinable
    equi-join; without it Spark picks BroadcastNestedLoopJoin."""
    plan = plan_of(spark, "temporal_range_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert (
        "BroadcastHashJoin" in plan
        or "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
    )


def test_cdc_diff_single_shuffle_pruned_inputs(spark):
    plan = plan_of(spark, "cdc_table_diff")
    # one full-outer sort-merge join; no extra exchanges beyond its two sides
    assert "FullOuter" in plan
    assert plan.count("Exchange") <= 3  # 2 join sides + possible output part
    # inputs are pruned to key + compared columns before the exchange
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_comment" not in read_schema
    assert "o_clerk" not in read_schema


def test_zorder_is_codegen_range_exchange_no_udf(spark):
    from airflow_dags_spark.operators.maintenance import zorder_layout
    from airflow_dags_spark.sources.tables import read_table

    df = read_table(spark, SF_DIR, "orders")
    z = zorder_layout(df, ["o_custkey", "o_totalprice"], n_files=8)
    plan = z._jdf.queryExecution().executedPlan().toString()
    # the z-value is computed by pure column expressions inside codegen
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "rangepartitioning" in plan.lower()
    # min/max bounds arrive via a broadcast of the 1-row aggregate,
    # never a per-row recompute
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_shard_histogram_single_shuffle_partial_agg(spark):
    plan = plan_of(spark, "export_shard_histogram")
    # md5 shard hash is pure JVM expressions — no Python in the scan stage
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # count-distinct expands to the standard two-round aggregate; both
    # exchanges move only (shard, key) partial-agg rows, never raw docs
    assert plan.count("Exchange") == 2
    assert "partial_count" in plan and "merge_count" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read_schema  # histogram never reads the payload


def test_training_shard_write_plan_is_hash_exchange_no_sort_network(spark, tmp_path):
    from airflow_dags_spark.operators.export import shard_assignment
    from airflow_dags_spark.sources.tables import read_table
    from pyspark.sql import functions as F

    df = shard_assignment(
        read_table(spark, SF_DIR, "documents"), ["doc_id"], 8
    ).repartition(8, F.col("shard"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # membership costs one hash exchange; the within-shard sort is
    # sortWithinPartitions (local) — no global range exchange
    assert "hashpartitioning(shard" in plan
    assert "rangepartitioning" not in plan.lower()


def test_curate_corpus_one_shuffle_gates_in_scan_stage(spark):
    plan = plan_of(spark, "curate_corpus")
    # whole pipeline (lang gate + quality gate + dedup + shard) = ONE data
    # shuffle, carrying one partial-agg row per distinct content hash
    assert plan.count("Exchange") == 1
    assert "partial_min" in plan and "partial_count" in plan
    # both gates run as a Filter directly over the scan, before the agg
    scan_stage = plan.split("Exchange")[1]  # text below the exchange
    assert "Filter" in scan_stage and "array_contains" in scan_stage
    # shard hash computed on survivors only (after the agg, above exchange)
    post_agg = plan.split("Exchange")[0]
    assert "pmod" in post_agg
    # scan reads only the two referenced columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "lang" not in read_schema and "source" not in read_schema
    # no Python anywhere — the full pipeline is JVM codegen
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_scd2_windows_share_one_exchange(spark):
    """Both SCD2 window passes order by the same key — ONE hash exchange on
    user_id, the second window reuses the first's partitioning."""
    plan = plan_of(spark, "scd2_history")
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_contamination_broadcasts_benchmark_side(spark):
    """The (small) distinct benchmark shingle set must broadcast; the
    corpus shingle stream joins without a pre-join exchange, and shingle
    construction stays out of interpreted higher-order functions."""
    plan = plan_of(spark, "benchmark_contamination")
    assert "BroadcastHashJoin" in plan
    # the streamed (corpus) side — everything ABOVE the BroadcastExchange in
    # the printed tree — must carry no hash exchange before the join; the
    # bench-side distinct's exchange lives under the BroadcastExchange
    streamed_side = plan.split("BroadcastExchange", 1)[0]
    post_agg, pre_join = streamed_side.split("BroadcastHashJoin", 1)
    assert "Exchange hashpartitioning" not in pre_join
    # codegen shingles: slice/arrays_zip, no transform() lambda on this path
    assert "lambdafunction" not in plan


def test_join_hint_forces_sort_merge(spark):
    """The MERGE hint must override the optimizer's broadcast choice — the
    escape hatch for wrong size estimates at lake scale."""
    plan = plan_of(spark, "join_hint_shuffle_merge")
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_weighted_sample_uses_takeordered_not_global_sort(spark):
    """A-Res weighted top-k must compile to TakeOrderedAndProject (per-
    partition heaps), never a full sort of the corpus."""
    plan = plan_of(spark, "weighted_sample_ares")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_training_mix_is_scan_plus_filter_only(spark):
    """Weighted deterministic sampling is one narrow pass: no exchange, no
    Python, whole-stage codegen all the way."""
    plan = plan_of(spark, "training_mix_sample")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# Registry-wide sweep: no ACCIDENTAL cartesian / nested-loop joins anywhere.
# A non-equi join typo (wrong column, missing condition) silently degrades
# to BroadcastNestedLoopJoin/CartesianProduct — harmless at sf0.001, fatal
# at 100 TB. Every query NOT on the allowlist must plan equi-joins only.
ALLOWED_NESTED_LOOP = {
    # brute-force baselines, deliberately all-pairs over a BROADCAST side
    # (the scale path is the IVF/LSH variant of each):
    "sim_cosine_topk",
    "dedup_embedding_cosine",
    # same contract: broadcast query side × streamed corpus, label filter
    # applied before the ranking window
    "sim_hard_negatives",
    "sim_knn_label_eval",
    # single-row scalar-subquery broadcasts (global avg / global doc count)
    # — a 1-row nested loop is the canonical plan, not a defect:
    "q22_idle_customers",
    "text_tfidf_terms",
    # Q11's HAVING threshold: a 1-row global aggregate broadcast against the
    # grouped frame (verified: BuildRight is the SinglePartition threshold)
    "q11_important_stock",
    # 1-row global-bounds broadcast feeding the generated time spine:
    "timeseries_gap_fill",
    # 1-row percentile-fence broadcast ahead of the streamed gate:
    "outlier_iqr_gate",
    # 1-row nine-quantile frame broadcast against the customer aggregate:
    "customer_rfm_segments",
    # 1-row means frame broadcast back over the fact scan (two-pass
    # centered statistics — the second pass streams, the 1-row join is
    # the canonical plan):
    "stats_anova_f",
    "stats_corr_matrix",
    # round 7: 1-row / k-row broadcast frames against a streamed side —
    # the canonical tiny-broadcast plans, same class as the entries above:
    # LLR's 1-row bigram-total frame; Theil's 1-row global (N, mu) frame;
    # the 9-row threshold grid crossed with the scored scan; the 1-row
    # point-estimate frame joined to the 1-row bootstrap summary:
    "text_collocation_llr",
    "stats_theil_index",
    "ml_threshold_sweep_prf",
    "stats_poisson_bootstrap_ci",
    # calendar-bounded O(n^2) pair statistics: the non-equi self-pair runs
    # over the ~100-row monthly / ~2.4k-row daily AGGREGATE (broadcast),
    # never the raw fact rows — quadratic in the calendar only:
    "stats_theilsen_monthly",
    "stats_kendall_tau_daily",
    # 1-row universe-count / table-count broadcasts (PMI normalizer,
    # decile divisor, histogram bounds + total) — canonical 1-row nested
    # loops:
    "events_type_pmi",
    "ml_lift_gains_table",
    "privacy_t_closeness",
    # k-row centroid frame / 1-row doc-count / 1-row divisor broadcasts:
    "ml_cluster_separation_stats",
    "text_ctfidf_cluster_terms",
    "join_relational_division",
    # 64x16 seeded sign-matrix construction (two range frames crossed,
    # 1024 rows total, then broadcast):
    "sim_random_projection_jl",
    # 4-row block-size frame crossed against the daily aggregate:
    "stats_hurst_exponent",
    # 1-row means/overall-slope/total/ref-end broadcasts + tiny grid
    # crosses (event-times x 2 groups):
    "stats_ljung_box",
    "stats_chisq_residual_cells",
    "stats_simpsons_check",
    "stats_logrank_test",
    # 1-row min/max bounds broadcast for score normalization:
    "ml_calibration_bins",
    # 1-row distinct-order total broadcast for shares:
    "agg_group_size_histogram",
    # 1-row x_min threshold broadcast for the tail cut:
    "stats_power_law_mle",
    # 1-row totals + k-row marginal broadcasts over the r×c cell frame:
    "stats_cramers_v",
    # k-row group-stats self-pair join (grp_a < grp_b over 5 rows) plus the
    # 1-row pooled-MSE broadcast — both frames are k-row by construction:
    "stats_tukey_hsd",
    # round 9: 1-row min/max bounds broadcast for score normalization
    # (same class as ml_calibration_bins) plus a 1-row global-moments /
    # totals frame crossed with the 10-row bin frame:
    "ml_brier_decomposition",
    "ml_woe_iv",
    # round 10: bounded query side (vec_id < 5) broadcast against the
    # streamed corpus — the sim_cosine_topk contract, both similarity
    # columns in one pass:
    "sim_matryoshka_prefix_recall",
    # round 10: two 1-row frames — the tie-term aggregate crossed with the
    # k-group rank aggregate (Kruskal-Wallis), and the 1-row beta-binomial
    # MoM prior crossed back over the per-supplier frame:
    "stats_kruskal_wallis",
    "ml_empirical_bayes_rates",
    # round 11: the 8-row seed-centroid frame broadcast against the
    # streamed corpus for cosine assignment (k is a constant; the
    # (vec × k) rows collapse map-side before any exchange):
    "sim_ivf_recenter_step",
    # round 13: three 1-row boundary-count frames crossJoin-stacked into
    # funnel rows (the dedicated gate pins the count at exactly 3):
    "curate_funnel_counts",
    # round 13: the 1-row min-group-count frame crossed onto the tiny
    # per-source counts table — never onto documents (the dedicated gate
    # test_corpus_mixture_sample_is_a_broadcast_hash_filter pins the
    # count at <= 1 and requires the doc-side join to be broadcast-hash):
    "corpus_mixture_sample",
}


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_no_accidental_cartesian_or_nested_loop(spark, name):
    if name in ALLOWED_NESTED_LOOP:
        return
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_bloom_probe_broadcasts_filter_table(spark):
    """The Bloom word table (≤ m/32 rows) must broadcast; the probe side
    streams. A shuffle join here would defeat the sketch's purpose."""
    plan = plan_of(spark, "sketch_bloom_membership")
    assert "BroadcastHashJoin" in plan
    # build side collapses map-side: bit_or partial agg before its exchange
    assert "partial_bit_or" in plan


def test_cms_estimate_broadcasts_sketch(spark):
    plan = plan_of(spark, "sketch_cms_heavy_hitters")
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan  # counters combine before the shuffle
    # top-k candidates via TakeOrderedAndProject, never a global sort
    assert "TakeOrderedAndProject" in plan


def test_ewma_fold_is_single_exchange(spark):
    """collect_list fold: ONE hash exchange on user_id; the partial
    collect runs map-side (ObjectHashAggregate)."""
    plan = plan_of(spark, "timeseries_ewma_final")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan or "ObjectHashAggregate" in plan


def test_anomaly_one_window_two_moments(spark):
    """avg and stddev over the same frame must share ONE Window operator
    (one (event_type,hod) exchange), then roll up with a partial agg."""
    plan = plan_of(spark, "anomaly_seasonal_zscore")
    assert plan.count("Window") == 1
    assert plan.count("Exchange hashpartitioning") <= 2  # window + rollup
    assert "partial_count" in plan


def test_k7_delete_is_broadcast_anti_join(spark):
    plan = plan_of(spark, "k7_delete_keys")
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_trailing_distinct_has_no_range_join(spark):
    """The 7-day trailing distinct rewrite must stay hash-partitioned
    (explode fan-out of deduped pairs), never the theta range join the SQL
    form implies."""
    plan = plan_of(spark, "window_trailing_distinct_users")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan  # distinct-count partials before the wire


def test_per_source_sample_never_sorts_globally(spark):
    plan = plan_of(spark, "weighted_sample_per_source")
    assert "Exchange rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "Window" in plan


def test_null_split_join_bypasses_exchange_for_null_keys(spark):
    """The null branch must be a union leg with NO join below it: plan
    shows a Union whose second child filters isnull and never joins."""
    plan = plan_of(spark, "join_null_skew_split")
    assert "Union" in plan
    # exactly one join in the whole plan — the matchable branch
    joins = plan.count("BroadcastHashJoin") + plan.count("SortMergeJoin") + plan.count(
        "ShuffledHashJoin"
    )
    assert joins == 1, plan


def test_regr_sweep_split_median_codegen_moments(spark):
    """The seven regr_*/corr moments run in whole-stage-codegen
    HashAggregate; the exact median runs as its OWN 2-column sort-based
    aggregation joined back on the 3-row group frame (r10: mixing the
    percentile into the moments groupBy forced ALL aggregates through
    interpreted ObjectHashAggregate — measured 2.5× slower). Two hash-agg
    exchanges (moments + median), scans pruned, no cartesian."""
    plan = plan_of(spark, "regr_linear_functions")
    assert "partial_regr" in plan or "partial_" in plan
    # the moments aggregation must NOT be object-hash: exactly one
    # ObjectHashAggregate pair (the median's), the rest codegen
    assert plan.count("ObjectHashAggregate") == 2
    assert plan.count("Exchange hashpartitioning") == 2
    for read_schema in [
        seg.splitlines()[0] for seg in plan.split("ReadSchema:")[1:]
    ]:
        for col in ("l_orderkey", "l_partkey", "l_shipdate"):
            assert col not in read_schema
    assert "CartesianProduct" not in plan


def test_gaps_islands_no_self_join(spark):
    """The islands rewrite replaces the classic self-join: no join operator
    anywhere; one window + grouped aggs sharing the user_id exchange."""
    plan = plan_of(spark, "gaps_islands_streaks")
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
              "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert j not in plan
    assert "Window" in plan


def test_max_concurrency_bucketed_sweep_shape(spark):
    """Sweep line via prefix-sum composition: a Union of ±1 deltas, the
    within-day window, and ONE broadcast join carrying the day offsets
    back — no shuffle join, no table-sized SinglePartition exchange."""
    plan = plan_of(spark, "events_max_concurrency")
    assert "Union" in plan
    assert plan.count("BroadcastHashJoin") == 1  # the offsets come back
    for j in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert j not in plan
    seg = plan.split("Exchange SinglePartition")
    for s in seg[1:]:
        below = s.split("Exchange")[0]
        assert "HashAggregate" in below or "AQEShuffleRead" in below, plan


def test_dq_expectations_single_aggregation_pass(spark):
    """Six constraints must compile to ONE aggregate (+ the distinct-count
    expand), not six jobs: no join, a single hash-agg exchange pair."""
    plan = plan_of(spark, "dq_expectations")
    for j in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
              "BroadcastNestedLoopJoin"):
        assert j not in plan
    # count_distinct rewrites to expand + two-phase agg; still one exchange
    # pair over the scan (plus the tiny final sort for ORDER BY constraint)
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_array_hof_sweep_zero_shuffle(spark):
    plan = plan_of(spark, "array_hof_functions")
    assert "Exchange" not in plan, plan


def test_argmax_struct_is_hash_agg_not_window_sort(spark):
    """The whole point of the struct-max rewrite: top-1-per-group must be
    a partial+final aggregate, never a per-partition sort + Window."""
    plan = plan_of(spark, "agg_argmax_struct")
    assert "Window" not in plan
    assert "partial_max" in plan or "partial_min" in plan
    # only the agg exchange + the final ORDER BY; no join, no big sort net
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_try_functions_stay_in_scan_stage(spark):
    plan = plan_of(spark, "scalar_try_functions")
    assert "Exchange hashpartitioning" not in plan  # projection + top-k only
    for j in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert j not in plan


def test_bucketed_running_sum_no_table_sized_single_partition(spark):
    """The rewrite's contract: the only SinglePartition exchange feeds the
    |buckets|-row offset window, never the table. Assert the full-table
    window (partitionBy __bucket) exists and that a broadcast joins the
    offsets back."""
    plan = plan_of(spark, "window_running_sum_bucketed")
    assert "BroadcastHashJoin" in plan  # offsets come back via broadcast
    # the within-bucket window partitions by the bucket — parallel
    assert "Window" in plan
    # final orderBy is a range exchange; the offset cascade is the only
    # SinglePartition and is fed by a HashAggregate (bucket totals),
    # never a raw table scan
    seg = plan.split("Exchange SinglePartition")
    for s in seg[1:]:
        below = s.split("Exchange")[0]
        assert "HashAggregate" in below or "AQEShuffleRead" in below, plan


def test_salted_topn_two_bounded_windows(spark):
    plan = plan_of(spark, "window_topn_salted")
    assert plan.count("Window") >= 2  # phase 1 (key,salt) + phase 2 (key)
    assert "Exchange SinglePartition" not in plan


# --- round-5 plan gates ---------------------------------------------------------


def _single_partitions_fed_by_aggregates_only(plan: str) -> None:
    """Shared invariant for bucketed-cascade plans: every SinglePartition
    exchange must sit above a (partial) aggregate — bucket totals or a
    final 1-row reduce — never a raw table scan/window of table rows."""
    for s in plan.split("Exchange SinglePartition")[1:]:
        below = s.split("Exchange")[0]
        assert (
            "HashAggregate" in below
            or "ObjectHashAggregate" in below
            or "AQEShuffleRead" in below
        ), plan


def test_mann_whitney_no_table_single_partition(spark):
    """Midranks must come from the histogram cascade: the only
    SinglePartition exchanges are the bounded offsets/final aggregates,
    and the offsets frame rejoins via broadcast."""
    plan = plan_of(spark, "stats_mann_whitney")
    _single_partitions_fed_by_aggregates_only(plan)
    assert "BroadcastHashJoin" in plan  # offsets rejoin via broadcast


def test_gini_rank_is_bucketed_not_global(spark):
    plan = plan_of(spark, "stats_gini_revenue")
    _single_partitions_fed_by_aggregates_only(plan)
    assert "BroadcastHashJoin" in plan


def test_bm25_broadcasts_idf_and_prunes_postings(spark):
    """The |terms|-row idf table must broadcast; the posting filter must
    reach the explode side before the tf aggregate (no full-vocabulary
    shuffle)."""
    plan = plan_of(spark, "text_bm25_search")
    assert "BroadcastHashJoin" in plan
    assert "token#" in plan and "IN (" in plan or "token" in plan


def test_snm_window_pairing_is_equi_join(spark):
    """The sliding window must be an equi-join on exploded positions —
    never a range/nested-loop join — and the sequence numbers must come
    from the bucketed cascade (no SinglePartition)."""
    plan = plan_of(spark, "dedup_sorted_neighborhood")
    _single_partitions_fed_by_aggregates_only(plan)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_window_value_functions_partitioned(spark):
    plan = plan_of(spark, "window_value_functions")
    assert "Exchange SinglePartition" not in plan  # per-user windows only


# --- round-6 plan gates ---------------------------------------------------------


def test_anova_two_pass_broadcasts_means(spark):
    """Pass 2 must stream the fact rows against BROADCAST group means —
    a shuffle join on the k-row means table would serialize the scan."""
    plan = plan_of(spark, "stats_anova_f")
    assert "BroadcastHashJoin" in plan
    _single_partitions_fed_by_aggregates_only(plan)


def test_corr_matrix_single_second_pass(spark):
    """All ten centered co-moments must come out of ONE aggregate over
    the fact scan (one partial+final pair per pass, no per-pair jobs)."""
    plan = plan_of(spark, "stats_corr_matrix")
    _single_partitions_fed_by_aggregates_only(plan)
    # exactly two scans of lineitem: the means pass and the co-moment pass
    assert plan.count("Scan parquet") <= 2, plan


def test_moments_family_broadcasts_group_means(spark):
    plan = plan_of(spark, "agg_moments_family")
    assert "BroadcastHashJoin" in plan
    assert "Exchange SinglePartition" not in plan  # grouped output only


def test_decompose_windows_over_daily_aggregate_only(spark):
    """The ordered trend window may be SinglePartition ONLY because it
    sits above the daily aggregate (calendar-bounded); the seasonal join
    must broadcast its 7-row side."""
    plan = plan_of(spark, "timeseries_decompose_ma")
    _single_partitions_fed_by_aggregates_only(plan)
    assert "BroadcastHashJoin" in plan


def test_ccf_lag_fanout_is_equi_join(spark):
    """The lag fan-out joins shifted DAILY aggregates on an equality key
    — never a range join against raw events."""
    plan = plan_of(spark, "stats_ccf_lags")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    _single_partitions_fed_by_aggregates_only(plan)


def test_groups_frame_one_exchange_for_both_windows(spark):
    """dense_rank and the RANGE frame share the custkey partitioning —
    exactly one hash exchange, no SinglePartition."""
    plan = plan_of(spark, "window_groups_frame")
    assert "Exchange SinglePartition" not in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_holt_fold_single_exchange(spark):
    """The struct fold happens inside the per-priority aggregate — one
    hash exchange keyed by (pri, month) then pri, no Python UDF."""
    plan = plan_of(spark, "timeseries_holt_linear")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    _single_partitions_fed_by_aggregates_only(plan)


def test_theilsen_pairs_over_aggregate_not_raw_rows(spark):
    """The quadratic slope fan-out must consume the MONTHLY aggregate —
    a partial_sum must appear below the pair join, and the orders scan
    happens exactly once."""
    plan = plan_of(spark, "stats_theilsen_monthly")
    assert "partial_sum" in plan
    # the self-pair duplicates the monthly-rollup lineage: exactly the two
    # aggregate subtrees, never a third raw-row scan
    assert plan.count("Scan parquet") == 2, plan


def test_kendall_pairs_over_daily_aggregate(spark):
    plan = plan_of(spark, "stats_kendall_tau_daily")
    assert "partial_sum" in plan
    assert plan.count("Scan parquet") == 2, plan


def test_temperature_mix_broadcasts_quota(spark):
    """The |langs|-row quota frame must broadcast against the ranked docs;
    the only doc-sized exchange is the per-lang ranking window."""
    plan = plan_of(spark, "training_temperature_mix")
    assert "BroadcastHashJoin" in plan
    _single_partitions_fed_by_aggregates_only(plan)


def test_regr_by_nation_broadcasts_dims(spark):
    plan = plan_of(spark, "regr_grouped_by_nation")
    assert plan.count("BroadcastHashJoin") >= 2  # customer, nation
    assert "Exchange SinglePartition" not in plan


def test_adamic_adar_wedge_is_equi_join_with_topk(spark):
    """Wedge enumeration must be an equi-join on the shared customer
    (quadratic per-basket only) and the top-50 a TakeOrderedAndProject."""
    plan = plan_of(spark, "graph_adamic_adar")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_clamped_fold_no_python_no_global_exchange(spark):
    plan = plan_of(spark, "inventory_clamped_running_sum")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange SinglePartition" not in plan  # per-supplier groups only


def test_ewma_chart_single_partition_is_daily_aggregate(spark):
    plan = plan_of(spark, "anomaly_ewma_control_chart")
    _single_partitions_fed_by_aggregates_only(plan)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_trimmed_mean_broadcasts_fences(spark):
    """The per-group percentile fences must broadcast back over a
    STREAMED second scan — the clamp pass may not re-sort anything."""
    plan = plan_of(spark, "agg_trimmed_winsorized_mean")
    assert "BroadcastHashJoin" in plan
    assert "Exchange SinglePartition" not in plan


def test_rolling_median_over_daily_aggregate(spark):
    plan = plan_of(spark, "window_rolling_median_7d")
    _single_partitions_fed_by_aggregates_only(plan)


def test_lift_table_uses_rank_cascade_not_global_sort(spark):
    """The decile rank must come from the bucketed prefix-sum cascade —
    SinglePartition exchanges only above aggregates (bucket offsets /
    decile frame), never the customer table."""
    plan = plan_of(spark, "ml_lift_gains_table")
    _single_partitions_fed_by_aggregates_only(plan)
    assert "BroadcastHashJoin" in plan  # 512-row offsets table broadcasts


def test_pmi_pairs_join_on_user_day_key(spark):
    plan = plan_of(spark, "events_type_pmi")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan or plan.count("BroadcastNestedLoopJoin") == 1  # 1-row nu frame
    _single_partitions_fed_by_aggregates_only(plan)


def test_zorder_stats_pure_codegen_bit_arithmetic(spark):
    plan = plan_of(spark, "layout_zorder_bucket_stats")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan or "partial_min" in plan  # map-side combine
    assert "Exchange SinglePartition" not in plan


def test_nelson_aalen_windows_over_lifetime_frame(spark):
    plan = plan_of(spark, "stats_nelson_aalen")
    _single_partitions_fed_by_aggregates_only(plan)


def test_time_to_convert_single_shuffle_family(spark):
    """Both stage aggregates and the join key on user_id — no second
    shuffle family; the final 1-row reduce is aggregate-fed."""
    plan = plan_of(spark, "funnel_time_to_convert")
    _single_partitions_fed_by_aggregates_only(plan)
    assert "CartesianProduct" not in plan


def test_scalar_quantization_stays_in_codegen(spark):
    plan = plan_of(spark, "sim_scalar_quantization_error")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    _single_partitions_fed_by_aggregates_only(plan)


def test_business_days_pure_integer_projection(spark):
    """The weekday closed form must be a scan-stage projection — no UDF,
    no calendar-table join beyond the orderkey equi-join."""
    plan = plan_of(spark, "scalar_business_days_lag")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan or "partial_avg" in plan  # map-side combine
    assert "Exchange SinglePartition" not in plan


def test_mode_window_over_count_aggregate(spark):
    plan = plan_of(spark, "agg_mode_deterministic")
    assert "BroadcastHashJoin" in plan  # nation dim broadcasts
    assert "Exchange SinglePartition" not in plan  # per-segment window only


def test_token_budget_mix_single_ranking_window(spark):
    plan = plan_of(spark, "training_token_budget_mix")
    assert "BroadcastHashJoin" in plan
    _single_partitions_fed_by_aggregates_only(plan)


def test_t_closeness_grid_joins_broadcast(spark):
    """Everything after the two histogram aggregates is O(groups x bins):
    the global-bin and 1-row total frames must broadcast."""
    plan = plan_of(spark, "privacy_t_closeness")
    assert "BroadcastHashJoin" in plan
    _single_partitions_fed_by_aggregates_only(plan)


def test_dp_noise_is_scalar_codegen_after_one_aggregate(spark):
    plan = plan_of(spark, "privacy_dp_noisy_counts")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # nation dim broadcasts
    assert "Exchange SinglePartition" not in plan


def test_ivm_topk_prunes_recompute_by_affected_groups(spark):
    """The recompute leg must be a semi-join against the BROADCAST
    affected-key set; the merge leg re-ranks k+delta rows per group."""
    plan = plan_of(spark, "ivm_topk_maintenance")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "BroadcastExchange" in plan
    assert "Exchange SinglePartition" not in plan


def test_hll_sliding_fanout_over_sketch_frame_not_raw_rows(spark):
    """The 7x explode must apply to the DAILY SKETCH frame (one sketch
    per day), never the raw events; the union agg combines map-side."""
    plan = plan_of(spark, "sketch_hll_sliding_7d")
    assert "hll_union_agg" in plan.lower() or "HllUnionAgg" in plan
    # explode sits above the daily aggregate, so a partial hll_sketch_agg
    # must appear below the generate node
    gen_idx = plan.find("Generate explode")
    assert gen_idx > 0
    assert "hll_sketch_agg" in plan[gen_idx:].lower() or "partial" in plan[gen_idx:]


def test_cluster_separation_broadcasts_k_centroids(spark):
    """Corpus must stream once against the k-row broadcast centroid
    frame (k x n pairs) — never dim x n x k rows through a shuffle."""
    plan = plan_of(spark, "ml_cluster_separation_stats")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    _single_partitions_fed_by_aggregates_only(plan)


def test_ctfidf_aggregates_before_joins(spark):
    """Per-class tf and per-term df must collapse the exploded token
    stream BEFORE the scoring join (partial aggregates present); ranking
    windows run per class."""
    plan = plan_of(spark, "text_ctfidf_cluster_terms")
    assert "partial_count" in plan
    assert "Exchange SinglePartition" not in plan or "HashAggregate" in plan


def test_relational_division_is_count_match_not_double_anti(spark):
    """Division must be the count-matching rewrite — one grouped distinct
    aggregate — never correlated NOT EXISTS pairs (nested anti-joins)."""
    plan = plan_of(spark, "join_relational_division")
    assert "LeftAnti" not in plan
    assert plan.count("Scan parquet") <= 2  # per-customer + divisor subtree
    _single_partitions_fed_by_aggregates_only(plan)


def test_scd2_pit_is_single_union_window_no_range_join(spark):
    """The as-of lookup must be the union + carry-forward window — ONE
    ordered pass per user, no range/nested-loop join, no per-row argmax
    subquery."""
    plan = plan_of(spark, "scd2_point_in_time_lookup")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Union" in plan
    assert "Exchange SinglePartition" not in plan


def test_isoweek_rollup_one_distributive_aggregate(spark):
    plan = plan_of(spark, "scalar_isoweek_rollup")
    assert "partial_sum" in plan
    assert "Exchange SinglePartition" not in plan
    assert plan.count("Scan parquet") == 1


def test_feature_hashing_no_vocab_join(spark):
    """The whole point of the hashing trick: no dictionary join — bucket
    is a scan-stage md5 projection, then one 64-key aggregate."""
    plan = plan_of(spark, "text_feature_hashing")
    assert "Join" not in plan or "BroadcastHashJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_jl_projection_broadcasts_sign_matrix(spark):
    """The 1024-cell ±1 matrix must broadcast; distances are equi-joins
    on the component index, never a vector-pair nested loop."""
    plan = plan_of(spark, "sim_random_projection_jl")
    assert "CartesianProduct" not in plan
    _single_partitions_fed_by_aggregates_only(plan)


def test_croston_fold_no_python_single_exchange_family(spark):
    plan = plan_of(spark, "forecast_croston")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange SinglePartition" not in plan  # per-class groups only


def test_reconciliation_copartitioned_join(spark):
    """One keyed line aggregate + one equi-join on orderkey; at cluster
    scale both sides co-partition on the same key."""
    plan = plan_of(spark, "dq_order_line_reconciliation")
    assert "partial_sum" in plan
    assert "CartesianProduct" not in plan
    _single_partitions_fed_by_aggregates_only(plan)


def test_runs_test_windows_over_daily_aggregate(spark):
    plan = plan_of(spark, "stats_runs_test")
    _single_partitions_fed_by_aggregates_only(plan)


def test_attribution_single_user_window_no_self_join(spark):
    """Carry-forward attribution must be ONE per-user ordered window —
    no purchase-to-touch self-join."""
    plan = plan_of(spark, "events_attribution_last_touch")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # window + groupBy


def test_cume_dist_over_daily_aggregate(spark):
    plan = plan_of(spark, "window_cume_dist_daily")
    _single_partitions_fed_by_aggregates_only(plan)


def test_sequential_rules_pair_join_over_first_occurrences(spark):
    """The pair join must consume the first-occurrence aggregate (one row
    per user x type), never raw events."""
    plan = plan_of(spark, "events_sequential_rules")
    assert "partial_min" in plan
    assert "CartesianProduct" not in plan
    _single_partitions_fed_by_aggregates_only(plan)


def test_hurst_blocks_partitioned_by_size_and_block(spark):
    plan = plan_of(spark, "stats_hurst_exponent")
    _single_partitions_fed_by_aggregates_only(plan)


def test_elasticity_broadcasts_part_dim(spark):
    plan = plan_of(spark, "regr_price_elasticity")
    assert "BroadcastHashJoin" in plan
    assert "Exchange SinglePartition" not in plan


def test_banded_tax_branch_free_codegen(spark):
    """The marginal bands must be GREATEST/LEAST arithmetic in the scan
    stage — no band-table join, no Python."""
    plan = plan_of(spark, "scalar_banded_tax")
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_sum" in plan


def test_xyz_two_aggregates_no_joins(spark):
    plan = plan_of(spark, "inventory_xyz_classification")
    assert "Join" not in plan
    assert "partial_sum" in plan


def test_p90_merge_audit_grouped_percentiles(spark):
    plan = plan_of(spark, "agg_percentile_mergeability_audit")
    assert "percentile" in plan.lower()
    _single_partitions_fed_by_aggregates_only(plan)


def test_filter_clause_is_one_aggregate_pass(spark):
    """Five FILTER-predicated aggregates must compile to ONE partial+final
    aggregate pair over one scan — never five jobs or a union."""
    plan = plan_of(spark, "agg_filter_clause_sweep")
    assert plan.count("Scan parquet") == 1
    assert "Union" not in plan
    assert "partial_count" in plan and "partial_sum" in plan


def test_file_metadata_audit_scan_plus_one_aggregate(spark):
    plan = plan_of(spark, "source_file_metadata_audit")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange SinglePartition" not in plan


def test_ljung_box_lag_fanout_over_centered_aggregate(spark):
    plan = plan_of(spark, "stats_ljung_box")
    assert "CartesianProduct" not in plan
    _single_partitions_fed_by_aggregates_only(plan)


def test_chisq_cells_marginals_broadcast(spark):
    plan = plan_of(spark, "stats_chisq_residual_cells")
    assert plan.count("BroadcastHashJoin") >= 2
    _single_partitions_fed_by_aggregates_only(plan)


def test_simpsons_check_two_aggregates_one_lineage(spark):
    plan = plan_of(spark, "stats_simpsons_check")
    assert plan.count("Scan parquet") <= 2
    _single_partitions_fed_by_aggregates_only(plan)


def test_logrank_at_risk_from_cumulative_window_not_self_join(spark):
    """The Spark plan must use the per-group cumulative window for
    at-risk counts (decorrelated), never the oracle's t<t self-join."""
    plan = plan_of(spark, "stats_logrank_test")
    # allowed nested loops: the 1-row ref_end broadcast and the
    # (event-times x 2 groups) grid — both bounded frames
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert "CartesianProduct" not in plan
    _single_partitions_fed_by_aggregates_only(plan)


def test_calibration_bins_one_pass_after_bounds(spark):
    plan = plan_of(spark, "ml_calibration_bins")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    _single_partitions_fed_by_aggregates_only(plan)


def test_rolling_corr_shares_one_window_spec(spark):
    """All six moment sums must run in ONE window operator over the daily
    aggregate — six separate Window nodes would re-sort six times."""
    plan = plan_of(spark, "window_rolling_corr_30d")
    assert plan.count("Window") == 1
    _single_partitions_fed_by_aggregates_only(plan)


def test_readability_stays_in_scan_stage(spark):
    plan = plan_of(spark, "text_readability_proxy")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Scan parquet") == 1


def test_seasonality_strength_single_partition_above_daily(spark):
    plan = plan_of(spark, "timeseries_seasonality_strength")
    _single_partitions_fed_by_aggregates_only(plan)
    assert "BroadcastHashJoin" in plan  # 7-row seasonal frame broadcasts


def test_peak_profile_one_distributive_aggregate(spark):
    plan = plan_of(spark, "events_peak_hour_profile")
    assert "partial_count" in plan
    assert "Exchange SinglePartition" not in plan
    assert plan.count("Scan parquet") == 1


def test_group_size_histogram_double_aggregate(spark):
    plan = plan_of(spark, "agg_group_size_histogram")
    assert plan.count("HashAggregate") >= 4  # two partial+final pairs
    _single_partitions_fed_by_aggregates_only(plan)


def test_bounce_rate_shares_sessionize_exchange(spark):
    """Both session windows must share the per-user exchange; the final
    metrics are two bounded aggregates."""
    plan = plan_of(spark, "events_session_bounce_rate")
    _single_partitions_fed_by_aggregates_only(plan)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_entropy_daily_two_aggregates_calendar_join(spark):
    plan = plan_of(spark, "events_type_entropy_daily")
    assert "partial_count" in plan or "partial_sum" in plan
    assert "Exchange SinglePartition" not in plan


def test_loo_encoding_broadcasts_group_stats(spark):
    """The k-row group stats must broadcast over the streamed rows —
    the LOO arithmetic never re-aggregates per row."""
    plan = plan_of(spark, "ml_loo_target_encoding")
    assert "BroadcastHashJoin" in plan
    assert "Exchange SinglePartition" not in plan


def test_topn_with_ties_single_window(spark):
    plan = plan_of(spark, "window_topn_with_ties")
    # count Window NODES ("Window [...") — "Window" alone also matches
    # RunningWindowFunction markers inside the node text
    assert plan.count("Window [") == 1, plan
    assert "Exchange SinglePartition" not in plan


def test_interpurchase_gap_one_lag_window(spark):
    plan = plan_of(spark, "orders_interpurchase_gap")
    assert plan.count("Window [") == 1
    assert "BroadcastHashJoin" in plan
    assert "Exchange SinglePartition" not in plan


def test_power_law_mle_two_aggregates_one_broadcast(spark):
    plan = plan_of(spark, "stats_power_law_mle")
    _single_partitions_fed_by_aggregates_only(plan)


def test_pk_audit_each_leg_map_side_combined(spark):
    plan = plan_of(spark, "dq_primary_key_audit")
    assert "Union" in plan
    assert "partial_count" in plan
    _single_partitions_fed_by_aggregates_only(plan)


def test_ytd_share_windows_share_year_partition(spark):
    plan = plan_of(spark, "window_ytd_share")
    assert "Exchange SinglePartition" not in plan
    # (yr, mo) aggregate exchange + yr window exchange — both windows
    # share the second; a third would be a regression
    assert plan.count("Exchange hashpartitioning") == 2


def test_auc_windows_group_rows_after_partial_agg(spark):
    """AUC's midrank window must run over (segment, distinct-score) GROUP
    rows: partial aggregation precedes the exchange, exactly one window,
    and nothing funnels through a single partition."""
    plan = plan_of(spark, "ml_auc_roc")
    assert "partial_count" in plan  # map-side combine before the shuffle
    assert plan.count("Window [") == 1
    assert "Exchange SinglePartition" not in plan


def test_mrr_has_no_ranking_window(spark):
    """MRR's whole design point: the first-hit position comes from a
    distributive MIN + a k-row broadcast + one conditional aggregate —
    a per-segment ranking window over users (hot-key serialization at
    100 TB) must never appear."""
    plan = plan_of(spark, "ml_mrr_at_k")
    assert "Window [" not in plan
    assert "BroadcastHashJoin" in plan  # the k-row best-hit frame
    assert "partial_" in plan


def test_minhash_est_error_stages_shingles_once(spark):
    """The estimate-error audit must keep the shingle pipeline staged: the
    cheap size(tokens) guard means NO inlined element_at chain inside a
    Filter (the predicate-pushdown re-split blowup, SCALE.md round-8
    note). Each join side evaluates element_at only inside its one
    staged shingle projection."""
    plan = plan_of(spark, "dedup_minhash_est_error")
    import re

    for m in re.finditer(r"\(\d+\) Filter[^\n]*\nInput[^\n]*\nCondition : ([^\n]*)", plan):
        assert "element_at" not in m.group(1), m.group(1)[:200]
    assert "BroadcastHashJoin" in plan  # consecutive-id pair join


# --------------------------------------------------------------------------
# round-10 batch
# --------------------------------------------------------------------------


def test_kruskal_wallis_midranks_bucketed(spark):
    """Global midranks must come from the bucketed prefix-sum: every
    SinglePartition exchange sits above an aggregate (bucket totals /
     1-row finals), the data-row window partitions by bucket, and the
    offsets frame rejoins via broadcast."""
    plan = plan_of(spark, "stats_kruskal_wallis")
    _single_partitions_fed_by_aggregates_only(plan)
    assert "partial_count" in plan or "partial_sum" in plan
    assert "BroadcastHashJoin" in plan  # bucket offsets rejoin
    assert plan.count("Window [") == 2  # within-bucket + |buckets| offsets


def test_map_at_k_topn_is_salted(spark):
    """The per-segment top-10 must rank within (segment, salt) first — a
    hot segment never funnels all candidates through one reducer — and
    every later window runs over the bounded survivor frame."""
    plan = plan_of(spark, "ml_map_at_k")
    assert "Exchange SinglePartition" not in plan
    assert "__salt" in plan  # phase-1 salted window key
    assert "BroadcastHashJoin" in plan  # k-row relevant-count frame


def test_pr_auc_window_over_group_rows(spark):
    """PR-AUC inherits the AUC discipline: rows collapse to (segment,
    distinct-score) groups BEFORE any window; the per-segment cumulative
    counts run as the bucketed prefix-sum composition (r11: the plain
    per-prio window gave each segment ONE reducer — 8→32-core scaling
    1.10), so exactly two windows: within-(prio, bucket) cumsum + the
    tiny per-(prio, bucket) offset cascade, rejoined by broadcast."""
    plan = plan_of(spark, "ml_pr_auc")
    assert "partial_count" in plan
    assert plan.count("Window [") == 2  # within-bucket + offsets
    assert "Exchange SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan  # bucket offsets + totals rejoin


def test_matryoshka_one_corpus_pass(spark):
    """Both similarity columns must come from ONE streamed corpus pass:
    two parquet scans total (corpus + broadcast query side), both rank
    windows sharing the per-qid partitioning, zero shuffled joins."""
    plan = plan_of(spark, "sim_matryoshka_prefix_recall")
    assert plan.count("Scan parquet") == 2
    assert plan.count("Window [") == 2
    assert "SortMergeJoin" not in plan
    assert "Exchange SinglePartition" not in plan
    # the bounded query side broadcasts (nested-loop on purpose: no equi key)
    assert "BroadcastNestedLoopJoin" in plan


def test_wilson_ci_single_aggregate_no_join(spark):
    plan = plan_of(spark, "stats_wilson_ci")
    assert "partial_count" in plan or "partial_sum" in plan
    assert "Join" not in plan
    assert "Window [" not in plan
    assert "Exchange SinglePartition" not in plan


def test_jarque_bera_two_pass_broadcast_mean(spark):
    """The exact group means must broadcast back over the scan — no
    window, no sort, no single-partition funnel."""
    plan = plan_of(spark, "stats_jarque_bera")
    assert "BroadcastHashJoin" in plan
    assert "Window [" not in plan
    assert "Exchange SinglePartition" not in plan


def test_mann_kendall_pairs_over_monthly_aggregate(spark):
    """The i<j comparison must join the calendar-bounded monthly frame
    (broadcast), never data rows; n and the tie term share one (nation,
    value) grouping branch."""
    plan = plan_of(spark, "stats_mann_kendall")
    assert "BroadcastHashJoin" in plan
    assert "Window [" not in plan
    assert "Exchange SinglePartition" not in plan
    # orders feeds the monthly agg on 3 lineage branches (pair join a/b +
    # one cnt/ties branch) — a 4th scan means the cnt/ties merge regressed
    assert plan.count("Scan parquet") <= 7


def test_effect_sizes_one_moments_aggregate(spark):
    plan = plan_of(spark, "stats_effect_sizes")
    assert "partial_count" in plan or "partial_sum" in plan
    assert "Window [" not in plan
    assert "Exchange SinglePartition" not in plan


def test_sax_window_only_over_monthly_rows(spark):
    """The only window is the row_number over ≤ ~84 monthly rows per
    nation; series stats broadcast back."""
    plan = plan_of(spark, "timeseries_sax_symbols")
    assert plan.count("Window [") == 1
    assert "BroadcastHashJoin" in plan
    assert "Exchange SinglePartition" not in plan


def test_eb_rates_prior_is_tiny_broadcast(spark):
    """The 1-row MoM prior crosses back via broadcast nested-loop (the
    allow-listed tiny-frame class); the only SinglePartition exchange is
    that 1-row aggregate itself."""
    plan = plan_of(spark, "ml_empirical_bayes_rates")
    _single_partitions_fed_by_aggregates_only(plan)
    assert "BroadcastNestedLoopJoin" in plan
    assert "Window [" not in plan


# --- round-11 additions -------------------------------------------------------


def test_ivf_recenter_no_ranking_window_partial_min(spark):
    """Assignment is an argmin AGGREGATE (min of a (-sim, cell) struct),
    never a per-vector ranking window: the (vec × k) similarity rows
    collapse map-side before the exchange. The only nested-loop join is
    the k-row centroid broadcast (the allow-listed tiny-frame class)."""
    plan = plan_of(spark, "sim_ivf_recenter_step")
    assert "Window [" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 8-row centroid frame
    assert "partial_min" in plan or "partial_finalmerge" in plan or "partial" in plan
    assert "Exchange SinglePartition" not in plan


def test_rag_chunk_dedup_two_hash_aggs_no_join(spark):
    """Chunk → fingerprint → per-source distinct count: a pure codegen
    chunking map stage feeding hash aggregation — source rides along in
    the map (extra_cols), so there is NO chunks×documents re-join."""
    plan = plan_of(spark, "rag_chunk_dedup")
    assert "Join" not in plan
    assert "Window [" not in plan
    assert "Exchange SinglePartition" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_rag_chunk_screen_band_join_only(spark):
    """The screen's only joins are the band equi-join (+ the anti/left
    joins of the screen contract) — all hash joins on band values or
    chunk keys, never nested-loop, and no ranking window anywhere."""
    plan = plan_of(spark, "rag_chunk_screen")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window [" not in plan


def test_meta_queries_read_fixed_sidecar_window(spark):
    """The dashboard queries scan kilobytes of sidecar JSON — no shuffle
    beyond the tiny self-join/aggregate, and the round window is pinned
    at import (one constant shared by the Spark plan and the oracle SQL)
    so the driver writing the CURRENT round's files mid-session can never
    race the oracle comparison."""
    from airflow_dags_spark.plans import round11

    # self-extending pin: ≥7 (the landing-round floor) and never ahead of
    # what is cleanly recorded on disk for BOTH sidecar kinds
    assert round11._META_MAX_ROUND >= 7
    assert round11._META_MAX_ROUND == round11._compute_meta_max_round()
    plan = plan_of(spark, "meta_correctness_rounds")
    assert "CartesianProduct" not in plan


def test_substring_spans_window_after_semi_join(spark):
    """The substring tier's only window is the per-document island
    numbering over rows that already survived the duplicated-hash
    semi-join; the cross-document test is a hash aggregation with a
    map-side partial; no nested-loop join, no single-partition exchange
    anywhere (a global sort of positions would be the classic scale
    bug)."""
    plan = plan_of(spark, "dedup_substring_spans")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "LeftSemi" in plan  # duplicated-hash semi-join, not an inner re-join
    assert plan.count("Window [") == 1  # per-doc islands only


def test_advisory_reconcile_semi_prunes_store_before_band_join(spark):
    """The advisory pass must prune the store side to batch-keyed rows
    BEFORE the band join (LeftSemi on keys + LeftAnti full-signature
    exclusion), and the exact verify joins texts for flagged pairs only —
    all hash/broadcast equi-joins, no ranking window, no nested loop."""
    plan = plan_of(spark, "dedup_advisory_reconcile")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window [" not in plan
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_pq_recenter_no_ranking_window_partial_min(spark):
    """PQ assignment mirrors the IVF gate: argmin via struct-min
    aggregate (map-side partial), the codebook side is a broadcast hash
    join on the subspace key, and nothing funnels through one
    partition."""
    plan = plan_of(spark, "sim_pq_recenter_step")
    assert "Window [" not in plan
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "partial" in plan


def test_span_removal_no_cartesian_skew_safe_owner(spark):
    """The owner election is a struct-min AGGREGATE on the content hash
    (map-side combined — skew-safe for boilerplate shared by millions of
    docs), never a per-group ranking window; the interval join is an
    equi-join on the key with a range filter, no nested loop; nothing
    funnels through one partition."""
    plan = plan_of(spark, "dedup_span_removal")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Exchange SinglePartition" not in plan
    # the only windows are the per-doc island row_numbers inside
    # duplicated_spans (one per spans-subtree instantiation)
    assert "partial_min" in plan or "partial" in plan


def test_curate_funnel_counts_banded_join_bounded_count_stack(spark):
    """The funnel query's data joins are all hash equi-joins (the banded
    candidate join + the survivor semi-join + the verify text joins); the
    ONLY nested-loop joins are the three documented crossJoins stacking
    SINGLE-ROW boundary counts — anything beyond three means a real join
    degenerated. Counts combine map-side before their one-row exchange."""
    plan = plan_of(spark, "curate_funnel_counts")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 3
    assert "LeftSemi" in plan          # exact-dedup survivor semi-join
    assert "band_val" in plan          # banded candidate equi-join key
    assert "partial_count" in plan     # map-side combined boundary counts


def test_store_backed_ann_serving_plans_stay_bucketed(spark):
    """Store-backed serving keeps the ANN plan shape: no cartesian and no
    nested-loop joins (the corpus side streams; probes/candidates join by
    cell or key), and the only windows are the per-query top-k ranks.
    Fit-free-ness is pinned separately with a poisoned fit function in
    tests/test_ann_store.py — the fit is driver-side, not a plan stage.
    Since r11 the queries serve TWO arms (store vs direct — the
    equivalence the DuckDB oracle checks), so the window budget is per-arm
    × 2; the comparison joins are equi-joins on qid, never nested-loop."""
    for name, max_windows in [("sim_ivf_store_topk", 2), ("sim_pq_store_topk", 4)]:
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert plan.count("Window [") <= max_windows, name


def test_pack_token_windows_two_phase_scan_shape(spark):
    """The packing prefix sum must be the distributed two-phase form: the
    doc-scale cumsum window is hash-partitioned by bucket, and exactly ONE
    single-partition exchange exists — the per-bucket offset cumsum, whose
    input is the tiny bucket-sum aggregate (key_range / bucket_width
    rows), never documents. The text column never crosses an exchange
    (token counts project at the scan); bucket offsets broadcast back."""
    plan = plan_of(spark, "pack_token_windows")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # two cumsum windows: tiny offsets (single partition) + per-bucket
    assert plan.count("Window [") == 2
    assert plan.count("Exchange SinglePartition") == 1
    assert "hashpartitioning(__bkt" in plan      # doc-scale window is parallel
    assert "BroadcastHashJoin" in plan           # offsets broadcast, not shuffled
    # map-side partial agg for the bucket sums and the final per-window agg
    assert "partial_sum" in plan


def test_corpus_mixture_sample_is_a_broadcast_hash_filter(spark):
    """Mixture sampling must stay a scan-side filter: per-source rates
    broadcast onto the corpus (hash join), NO window anywhere, and the
    only nested-loop is the one-row min-count broadcast onto the tiny
    per-source counts frame — never onto documents."""
    plan = plan_of(spark, "corpus_mixture_sample")
    assert "CartesianProduct" not in plan
    assert "Window [" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # 1-row min onto counts
    assert "BroadcastHashJoin" in plan                 # rates onto the corpus
    assert "partial_count" in plan                     # counts combine map-side


def test_vocab_bpe_pairs_combines_before_shuffling(spark):
    """Both aggregations must combine map-side (tokens collapse to word
    types in the combiner; pair counts partial before their exchange) and
    the top-50 must run as TakeOrdered, never a global sort."""
    plan = plan_of(spark, "vocab_bpe_pairs")
    assert "CartesianProduct" not in plan
    assert plan.count("partial_count") + plan.count("partial_sum") >= 2
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan

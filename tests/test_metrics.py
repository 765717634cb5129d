"""Execution-metrics observability (functions/metrics.py): the measured
counterpart of the string-matching plan gates — proves partial aggregation
and scan pruning by the numbers the executed plan actually produced."""

from __future__ import annotations

from airflow_dags_spark.functions.metrics import execution_metrics, scan_summary
from airflow_dags_spark.plans import registry

registry.load_all()

SF_DIR = "/root/testdata/sf0.001"


def test_q1_metrics_show_mapside_combine(spark):
    df = registry.QUERIES["q1_pricing_summary"](spark, SF_DIR)
    df.collect()
    s = scan_summary(df)
    assert s["files_read"] >= 1
    assert s["rows_scanned"] == 6000  # sf0.001 lineitem row count
    # the entire point of partial aggregation: the shuffle carries group
    # rows, not data rows
    assert 0 < s["shuffle_records_written"] <= 100
    assert s["spill_bytes"] == 0


def test_execution_metrics_per_operator(spark):
    df = registry.QUERIES["q1_pricing_summary"](spark, SF_DIR)
    df.collect()
    m = execution_metrics(df)
    assert "Scan parquet" in m
    assert m["Scan parquet"]["number of output rows"] == 6000
    assert "Filter" in m
    # the shipdate filter is selective: strictly fewer rows leave it
    assert 0 < m["Filter"]["number of output rows"] < 6000


def test_rows_out_reads_through_aqe_root(spark):
    """With AQE on, the executed-plan root is AdaptiveSparkPlan (no row
    metric of its own) — rows_out must descend to the first real operator
    and read ITS metric, not a name-keyed map entry (always-0 bug)."""
    df = registry.QUERIES["q1_pricing_summary"](spark, SF_DIR)
    n = df.count()
    df.collect()
    s = scan_summary(df)
    assert s["rows_out"] == n > 0


def test_parquet_row_count_matches_scan(spark):
    """Footer-metadata row count (sources/tables.py) == a full count() —
    without scheduling any Spark job (it never touches the scheduler)."""
    import os

    from airflow_dags_spark.sources.tables import parquet_row_count, read_table

    for name in ("lineitem", "embeddings"):
        path = os.path.join(SF_DIR, f"{name}.parquet")
        assert parquet_row_count(spark, path) == read_table(
            spark, SF_DIR, name
        ).count()


def test_broadcast_join_query_shuffles_little(spark):
    """q3 joins orders⋈lineitem⋈customer with broadcast dims: shuffle
    traffic must stay far below the scanned volume."""
    df = registry.QUERIES["q3_top_revenue_orders"](spark, SF_DIR)
    df.collect()
    s = scan_summary(df)
    assert s["rows_scanned"] > 0
    assert s["shuffle_records_written"] < s["rows_scanned"]


def test_adamic_adar_shuffle_budget(spark):
    """Shuffle-byte budget gate (SCALE.md §shuffle-budgets): the wedge
    enumeration is the engine's biggest shuffler; with the md5 basket cap
    its volume is Θ(customers·cap²). At sf0.01 (1,500 customers) the
    measured shuffle is ~12.7 MiB / ~1.07M records — budget 2× headroom.
    A cap regression (unbounded baskets) blows this up quadratically in
    basket size and fails here long before it kills a 100 TB run."""
    df = registry.QUERIES["graph_adamic_adar"](spark, "/root/testdata/sf0.01")
    df.collect()
    s = scan_summary(df)
    assert s["shuffle_bytes_written"] < 2 * 12_750_000
    assert s["shuffle_records_written"] < 2 * 1_100_000
    assert s["spill_bytes"] == 0


def test_sorted_neighborhood_shuffle_budget(spark):
    """The positional near-dup join must shuffle O(docs·window), never
    O(docs²): sf0.01 measured ~193 KiB / 560 records — budget 3× headroom
    (records bound 10× since tiny counts are noisy at this SF)."""
    df = registry.QUERIES["dedup_sorted_neighborhood"](spark, "/root/testdata/sf0.01")
    df.collect()
    s = scan_summary(df)
    assert s["shuffle_bytes_written"] < 3 * 200_000
    assert s["shuffle_records_written"] < 10 * 560
    assert s["spill_bytes"] == 0


def test_weighted_quantiles_shuffle_budget(spark):
    """The multi-fraction histogram rewrite's whole point: the shuffle
    carries (group, bucket) partial weights — 177 records / ~4.7 KiB at
    sf0.01 (120K rows scanned) — NOT the data rows a per-group sort would
    move. Budget 3× headroom."""
    df = registry.QUERIES["agg_weighted_quantiles"](spark, "/root/testdata/sf0.01")
    df.collect()
    s = scan_summary(df)
    assert s["shuffle_bytes_written"] < 3 * 4_800
    assert s["shuffle_records_written"] < 3 * 180
    assert s["spill_bytes"] == 0


def test_poisson_bootstrap_shuffle_budget(spark):
    """The bootstrap explodes B=32 resample tags per order but aggregates
    partially BEFORE the exchange: sf0.01 measured ~363 KiB / ~21.4K
    records (B × groups partials, not B × 15K orders). Budget 2× headroom —
    a lost map-side combine multiplies records by the group fan-in and
    fails here long before it kills a 100 TB run."""
    df = registry.QUERIES["stats_poisson_bootstrap_ci"](
        spark, "/root/testdata/sf0.01"
    )
    df.collect()
    s = scan_summary(df)
    assert s["shuffle_bytes_written"] < 2 * 371_000
    assert s["shuffle_records_written"] < 2 * 21_500
    assert s["spill_bytes"] == 0


def test_minhash_bands_zero_shuffle(spark):
    """The signature computation is a pure scan-stage map (tokens →
    shingles → md5 min-hash per band) — ZERO shuffle by design; the band
    self-join downstream is where shuffle legitimately happens. Any
    exchange appearing here means an accidental repartition/distinct crept
    into the per-doc pipeline."""
    df = registry.QUERIES["dedup_minhash_bands"](spark, "/root/testdata/sf0.01")
    df.collect()
    s = scan_summary(df)
    assert s["shuffle_bytes_written"] == 0
    assert s["shuffle_records_written"] == 0
    assert s["spill_bytes"] == 0


def test_ivf_topk_shuffle_budget(spark):
    """IVF probe: cells are pruned before the distance pass, and the final
    exchange carries only the per-query top-k survivors (~50 records /
    ~0.9 KiB at sf0.01) — never the corpus. Budget 4× headroom (tiny
    counts are noisy). The kmeans training shuffles are separate bounded
    jobs (k-row treeAggregate partials), not part of this probe plan."""
    df = registry.QUERIES["sim_ann_ivf_topk"](spark, "/root/testdata/sf0.01")
    df.collect()
    s = scan_summary(df)
    assert s["shuffle_bytes_written"] < 4 * 1_000
    assert s["shuffle_records_written"] < 4 * 50
    assert s["spill_bytes"] == 0


def test_minhash_incr_screen_shuffle_budget(spark):
    """The incremental screen shuffles signature rows, never document
    text: ~89 KiB / ~600 records at sf0.01 (500 docs) — the explicit
    pre-band repartition of raw docs plus stacked band rows into the
    equi-join, all linear in docs. An accidental re-keying of text or a
    lost store-side projection multiplies this; budget 3× headroom."""
    df = registry.QUERIES["dedup_minhash_incr_screen"](
        spark, "/root/testdata/sf0.01"
    )
    df.collect()
    s = scan_summary(df)
    assert s["shuffle_bytes_written"] < 3 * 92_000
    assert s["shuffle_records_written"] < 3 * 600
    assert s["spill_bytes"] == 0


def test_batch_score_arrow_zero_shuffle(spark):
    """Arrow-batched scoring is a pure map: scan → mapInArrow → project,
    ZERO shuffle by design. An exchange here means something re-keyed the
    scored frame."""
    df = registry.QUERIES["ml_batch_score_arrow"](
        spark, "/root/testdata/sf0.01"
    )
    df.collect()
    s = scan_summary(df)
    assert s["shuffle_bytes_written"] == 0
    assert s["shuffle_records_written"] == 0
    assert s["spill_bytes"] == 0


def test_minhash_est_error_shuffle_budget(spark):
    """The audit join shuffles one signature row per doc (~90 KiB / 500
    records at sf0.01 — 16 hex mins + the shingle array per row), linear
    in docs. An accidental re-keying or a lost broadcast on the pair join
    multiplies this; budget 3× headroom."""
    df = registry.QUERIES["dedup_minhash_est_error"](
        spark, "/root/testdata/sf0.01"
    )
    df.collect()
    s = scan_summary(df)
    assert s["shuffle_bytes_written"] < 3 * 90_000
    assert s["shuffle_records_written"] < 3 * 500
    assert s["spill_bytes"] == 0


def test_kruskal_wallis_shuffle_budget(spark):
    """Every exchange in the midrank cascade carries (group/distinct-value)
    rows, never data rows: sf0.01 measured ~917 KiB / ~90K records off 15K
    orders scanned 3× — ≈6 bounded frame rows per DISTINCT price (gv, dv,
    bucketed prefix-sum, gv↔dv rejoin), so at lake scale the shuffle is
    bounded by |distinct prices|, not row count. Budget 2× headroom."""
    df = registry.QUERIES["stats_kruskal_wallis"](spark, "/root/testdata/sf0.01")
    df.collect()
    s = scan_summary(df)
    assert s["shuffle_bytes_written"] < 2 * 940_000
    assert s["shuffle_records_written"] < 2 * 91_000
    assert s["spill_bytes"] == 0


def test_map_at_k_shuffle_budget(spark):
    """MAP@10's exchanges carry candidate partials and top-10 survivors
    (~36 KiB / ~2.4K records at sf0.01, 30K events scanned), never raw
    events — the salted top-N keeps every later stage survivor-bounded.
    Budget 3× headroom (small counts are noisy)."""
    df = registry.QUERIES["ml_map_at_k"](spark, "/root/testdata/sf0.01")
    df.collect()
    s = scan_summary(df)
    assert s["shuffle_bytes_written"] < 3 * 37_000
    assert s["shuffle_records_written"] < 3 * 2_400
    assert s["spill_bytes"] == 0


def test_pr_auc_shuffle_budget(spark):
    """PR-AUC shuffles (segment, distinct-score) group rows twice (partial
    agg → window exchange → totals rejoin): ~360 KiB / ~30K records at
    sf0.01 — 2 frame rows per distinct price, independent of data rows.
    Budget 2× headroom."""
    df = registry.QUERIES["ml_pr_auc"](spark, "/root/testdata/sf0.01")
    df.collect()
    s = scan_summary(df)
    assert s["shuffle_bytes_written"] < 2 * 370_000
    assert s["shuffle_records_written"] < 2 * 30_100
    assert s["spill_bytes"] == 0


def test_ivf_recenter_shuffle_budget(spark):
    """Re-centering shuffles (a) one argmin-collapsed assignment row per
    vector, (b) the corpus once for the member join, (c) k×dim partials —
    ~25 KiB / ~1k records at sf0.01 (500 vecs, k=8, dim=64). A ranking
    window or a lost map-side partial-min multiplies this; 3× headroom."""
    df = registry.QUERIES["sim_ivf_recenter_step"](spark, "/root/testdata/sf0.01")
    df.collect()
    s = scan_summary(df)
    assert s["shuffle_bytes_written"] < 3 * 26_000
    assert s["shuffle_records_written"] < 3 * 1_100
    assert s["spill_bytes"] == 0


def test_rag_chunk_dedup_shuffle_budget(spark):
    """Chunk dedup shuffles fingerprint partials only (never chunk text):
    ~36 KiB / ~800 records at sf0.01 (500 docs → ~1.5k chunks). Chunk
    text leaking into the exchange multiplies bytes ~20×; 3× headroom."""
    df = registry.QUERIES["rag_chunk_dedup"](spark, "/root/testdata/sf0.01")
    df.collect()
    s = scan_summary(df)
    assert s["shuffle_bytes_written"] < 3 * 38_000
    assert s["shuffle_records_written"] < 3 * 850
    assert s["spill_bytes"] == 0


def test_rag_chunk_screen_shuffle_budget(spark):
    """The chunk screen inherits the incr-screen contract at chunk grain:
    signatures and keys on the wire, never chunk text — ~110 KiB / ~1.6k
    records at sf0.01. 3× headroom."""
    df = registry.QUERIES["rag_chunk_screen"](spark, "/root/testdata/sf0.01")
    df.collect()
    s = scan_summary(df)
    assert s["shuffle_bytes_written"] < 3 * 115_000
    assert s["shuffle_records_written"] < 3 * 1_700
    assert s["spill_bytes"] == 0


def test_substring_spans_shuffle_budget(spark):
    """The substring tier shuffles (hash, key, pos) rows — never text:
    ~926 KiB / ~24.2k records at sf0.01 (500 docs, ~24k shingle
    positions) across the count-distinct agg, the duplicated-hash
    semi-join and the per-doc window — ~38 B/record, linear in corpus
    token count. Shuffling document text (or losing the distinct-hash
    projection on the semi-join build side) multiplies this; budget 3×
    headroom."""
    df = registry.QUERIES["dedup_substring_spans"](
        spark, "/root/testdata/sf0.01"
    )
    df.collect()
    s = scan_summary(df)
    assert s["shuffle_bytes_written"] < 3 * 930_000
    assert s["shuffle_records_written"] < 3 * 24_200
    assert s["spill_bytes"] == 0


def test_advisory_reconcile_shuffle_budget(spark):
    """The reconcile shuffles band-signature rows plus the flagged-pair
    text lookups only: ~147 KiB / ~880 records at sf0.01 — bounded by
    batch signatures (the advisory's semi-join prunes the store side to
    the batch's key count BEFORE the band join) plus one row per flagged
    pair. A lost prune (whole store into the band join) or a re-keyed
    text column multiplies this; budget 3× headroom."""
    df = registry.QUERIES["dedup_advisory_reconcile"](
        spark, "/root/testdata/sf0.01"
    )
    df.collect()
    s = scan_summary(df)
    assert s["shuffle_bytes_written"] < 3 * 150_000
    assert s["shuffle_records_written"] < 3 * 900
    assert s["spill_bytes"] == 0


def test_pq_recenter_shuffle_budget(spark):
    """PQ re-centering shuffles the struct-min partials (one row per
    (vec, subspace) after map-side combine) plus m × n_codes × sub final
    groups: ~50 KiB / ~2.5k records at sf0.01 (500 vectors × 4
    subspaces). Losing the partial min (full vec × codes rows into the
    exchange) multiplies this by n_codes; budget 3× headroom."""
    df = registry.QUERIES["sim_pq_recenter_step"](
        spark, "/root/testdata/sf0.01"
    )
    df.collect()
    s = scan_summary(df)
    assert s["shuffle_bytes_written"] < 3 * 51_000
    assert s["shuffle_records_written"] < 3 * 2_600
    assert s["spill_bytes"] == 0


def test_span_removal_shuffle_budget(spark):
    """Span removal adds the content-hash agg (rows = spans), the
    interval anti-join (build side = loser spans only) and the per-doc
    reassembly to the substring tier's shuffles: ~1.29 MiB / ~26.3k
    records at sf0.01 — document tokens cross once (the reassembly
    collect_list), positions/hashes otherwise. Shuffling full text per
    span (or exploding the corpus against all spans) multiplies this;
    budget 3× headroom."""
    df = registry.QUERIES["dedup_span_removal"](
        spark, "/root/testdata/sf0.01"
    )
    df.collect()
    s = scan_summary(df)
    assert s["shuffle_bytes_written"] < 3 * 1_290_000
    assert s["shuffle_records_written"] < 3 * 26_400
    assert s["spill_bytes"] == 0


def test_curate_funnel_counts_shuffle_budget(spark):
    """The funnel query shuffles band-signature rows, candidate-pair
    text lookups and the map-side-combined boundary-count partials only:
    ~61 KiB / ~1.1k records at sf0.01 (500 docs). Losing the semi-join
    survivor projection (full text into the hash shuffle) or verifying
    beyond candidates multiplies this; budget 3× headroom."""
    df = registry.QUERIES["curate_funnel_counts"](
        spark, "/root/testdata/sf0.01"
    )
    df.collect()
    s = scan_summary(df)
    assert s["shuffle_bytes_written"] < 3 * 63_000
    assert s["shuffle_records_written"] < 3 * 1_100
    assert s["spill_bytes"] == 0


def test_store_backed_ann_serving_shuffle_budget(spark):
    """Store-backed serving's only exchange is the per-query top-k
    window: ~7.6 KiB / 480 records (PQ: batches × n_cand per query) and
    ~1.6 KiB / 80 records (IVF) at sf0.01. The encode/probe passes are
    shuffle-free Arrow maps; a corpus-wide exchange here means the
    broadcast/streamed orientation flipped. Budget 3× headroom."""
    for name, b, r in [
        ("sim_pq_store_topk", 7_800, 480),
        ("sim_ivf_store_topk", 1_600, 80),
    ]:
        df = registry.QUERIES[name](spark, "/root/testdata/sf0.01")
        df.collect()
        s = scan_summary(df)
        assert s["shuffle_bytes_written"] < 3 * b, name
        assert s["shuffle_records_written"] < 3 * r, name
        assert s["spill_bytes"] == 0, name


def test_pack_and_mixture_shuffle_budgets(spark):
    """Packing shuffles (key, count, bucket) triples plus the tiny
    bucket-sum/offset rows — ~9 KiB / ~620 records at sf0.01 (500 docs);
    text through an exchange or an un-bucketed global cumsum blows this
    up by the corpus byte size. Mixture sampling shuffles only the
    per-source count partials and the final per-source agg — ~3 KiB /
    ~80 records; a window-based sampler would shuffle every doc row.
    Budget 3× headroom."""
    for name, b, r in [
        ("pack_token_windows", 9_100, 620),
        ("corpus_mixture_sample", 3_000, 85),
    ]:
        df = registry.QUERIES[name](spark, "/root/testdata/sf0.01")
        df.collect()
        s = scan_summary(df)
        assert s["shuffle_bytes_written"] < 3 * b, name
        assert s["shuffle_records_written"] < 3 * r, name
        assert s["spill_bytes"] == 0, name


def test_pack_stream_resume_read_shuffle_budget(spark):
    """The store-backed packing query's READ side (committed assignments
    → per-batch agg) shuffles only the map-side-combined per-batch
    partials — ~0.3 KiB / 4 records at sf0.01. The append-side cost is
    the batch-scoped two-phase scan, budget-covered by
    test_pack_and_mixture_shuffle_budgets' packing entry (same plan
    shape per batch)."""
    df = registry.QUERIES["pack_stream_resume"](spark, "/root/testdata/sf0.01")
    df.collect()
    s = scan_summary(df)
    assert s["shuffle_bytes_written"] < 3 * 320
    assert s["shuffle_records_written"] < 3 * 6
    assert s["spill_bytes"] == 0


def test_vocab_bpe_pairs_shuffle_budget(spark):
    """Only word TYPES and pair partials shuffle (~2.5 KiB / ~115 records
    at sf0.01): the combiner collapses token occurrences to types before
    the first exchange. A per-occurrence shuffle would scale with corpus
    tokens, not vocabulary. Budget 3× headroom."""
    df = registry.QUERIES["vocab_bpe_pairs"](spark, "/root/testdata/sf0.01")
    df.collect()
    s = scan_summary(df)
    assert s["shuffle_bytes_written"] < 3 * 2_600
    assert s["shuffle_records_written"] < 3 * 120
    assert s["spill_bytes"] == 0

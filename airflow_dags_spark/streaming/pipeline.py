"""Structured Streaming surface (SURVEY.md §2.7 T1-T6, §7 Phase 5).

The reference is batch + cron but hand-encodes streaming semantics:

- T1 per-key watermark column consulted/advanced around each run
  (dags/pull_new_sales_list.py:97,236-239,267-270)
- T2 micro-batching (100k-row CSV chunks, 10k insert batches)
- T3 idempotent re-delivery via ``ON CONFLICT DO NOTHING``
  (dags/monthly_price_paid_data.py:153)
- T5 cron tumbling windows (daily/weekly/monthly)

Engine mapping: a file-landing-zone stream where each newly arrived file is
a micro-batch (T2); event-time watermarks bound state (T1); streaming
``dropDuplicates`` inside the watermark gives T3 without a target-table
probe; ``foreachBatch`` + the engine MERGE library turns any stream into an
idempotent keyed upsert; ``Trigger.AvailableNow`` reproduces the cron "drain
everything, then stop" run (T5).

Scale: state size is the whole game at 100 TB/day. Every stateful op here
REQUIRES a watermark so the state store evicts; dedup keys only (not full
rows); window state is bounded by (watermark horizon / slide) × key
cardinality. Shuffle partitions (= state store partitions) are fixed per
query via ``spark.sql.shuffle.partitions`` at session level — AQE does not
re-plan streaming stages.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from airflow_dags_spark.functions.localframe import tiny_df

from airflow_dags_spark.operators.upsert import ParquetTable

# The driver events table shape (FIXTURES.md §A) as a streaming fixture
# schema; timestamps arrive as ISO strings in landing files and are cast at
# the scan so event time is a true TimestampType.
EVENTS_LANDING_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_event_stream(
    spark: SparkSession,
    landing_dir: str,
    *,
    schema: T.StructType = EVENTS_LANDING_SCHEMA,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S2-as-stream: incremental scan of a landing directory; each new file
    is a micro-batch (replaces the reference's 100k-row buffer loop,
    dags/initial_price_paid_data.py:103-117)."""
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(landing_dir)


def with_watermark(df: DataFrame, ts_col: str = "ts", delay: str = "1 day") -> DataFrame:
    """T1 — event-time watermark: the engine analog of the reference's
    ``last_updated_sale <= yesterday`` staleness horizon (1-day default,
    dags/pull_new_sales_list.py:92,97)."""
    return df.withWatermark(ts_col, delay)


def dedup_within_watermark(
    df: DataFrame, keys: list[str], ts_col: str = "ts", delay: str = "1 day"
) -> DataFrame:
    """T3 — re-delivered rows inside the watermark horizon are dropped,
    the streaming analog of ``ON CONFLICT DO NOTHING``
    (dags/monthly_price_paid_data.py:153). State holds keys only."""
    return with_watermark(df, ts_col, delay).dropDuplicates(keys)


def dedup_within_watermark_native(
    df: DataFrame, keys: list[str], ts_col: str = "ts", delay: str = "1 day"
) -> DataFrame:
    """T3 via Spark 3.5+ ``dropDuplicatesWithinWatermark``: same contract as
    ``dedup_within_watermark`` but state eviction is tied to the watermark
    REGARDLESS of the event-time column being among the keys — duplicates
    whose event times differ (retries restamped by the producer, the common
    real-world case) still dedup, while plain ``dropDuplicates(keys+[ts])``
    would pass them through and ``dropDuplicates(keys)`` holds state
    forever without a watermark column in the keys."""
    return with_watermark(df, ts_col, delay).dropDuplicatesWithinWatermark(keys)


def tumbling_counts(
    df: DataFrame,
    window_len: str = "1 hour",
    *,
    slide: str | None = None,
    ts_col: str = "ts",
    delay: str = "1 day",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """T5/T6 — watermarked tumbling (or, with ``slide``, sliding/hopping)
    window aggregation — the streaming form of plans/windowed.py's batch
    ``window()`` queries, same output shape. Sliding windows multiply state
    by window/slide overlapping windows per event; the watermark still
    bounds total state."""
    win = (
        F.window(F.col(ts_col), window_len, slide)
        if slide
        else F.window(F.col(ts_col), window_len)
    )
    grouped = with_watermark(df, ts_col, delay).groupBy(
        win.alias("w"),
        *(group_cols or ["event_type"]),
    )
    return grouped.agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("sum_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *(group_cols or ["event_type"]),
        "n_events",
        "sum_value",
    )


def session_counts(
    df: DataFrame,
    gap: str = "30 minutes",
    *,
    ts_col: str = "ts",
    delay: str = "1 day",
    key_col: str = "user_id",
) -> DataFrame:
    """T6 — session windows (gap-based), absent from the reference, mandated
    by the north star; state bounded by watermark eviction."""
    return (
        with_watermark(df, ts_col, delay)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def merge_sink(
    df: DataFrame,
    table: ParquetTable,
    *,
    order_by: list[str],
    checkpoint_dir: str,
    update_cols: list[str] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """T2+T3 — ``foreachBatch`` → engine MERGE: every micro-batch is an
    idempotent keyed upsert, the streaming generalization of the reference's
    per-batch commit loop (dags/monthly_price_paid_data.py:140-160).

    ``Trigger.AvailableNow`` drains the backlog then stops — the exact
    semantics of one cron DAG run (T5); pass ``available_now=False`` for a
    continuous micro-batch query.
    """

    def upsert_batch(batch: DataFrame, batch_id: int) -> None:
        table.merge_upsert(batch, order_by=order_by, update_cols=update_cols)

    writer = df.writeStream.foreachBatch(upsert_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_to_table(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    *,
    output_mode: str = "append",
) -> StreamingQuery:
    """Drain a (windowed) stream to parquet with AvailableNow — one cron-run
    equivalent. Append mode emits only watermark-finalized windows."""
    return (
        stream_df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    delay: str = "1 day",
    right_prefix: str = "r_",
) -> DataFrame:
    """Stream-stream inner join: left rows matched to right rows with the
    same key where ``right_ts ∈ [left_ts - within, left_ts]``.

    Both sides carry watermarks + the time-range condition bounds state:
    each side buffers only rows inside (watermark + within) — without the
    range predicate a stream-stream join must buffer EVERYTHING forever.
    The attribution-join shape (click ⋈ recent purchase) of the reference's
    enrichment pattern, continuous."""
    r = right.select(
        F.col(key).alias(f"{right_prefix}{key}"),
        F.col(right_ts).alias(f"{right_prefix}ts"),
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c not in (key, right_ts)
        ],
    )
    l_w = left.withWatermark(left_ts, delay)
    r_w = r.withWatermark(f"{right_prefix}ts", delay)
    cond = (
        (F.col(key) == F.col(f"{right_prefix}{key}"))
        & (F.col(f"{right_prefix}ts") >= F.col(left_ts) - F.expr(f"INTERVAL {within}"))
        & (F.col(f"{right_prefix}ts") <= F.col(left_ts))
    )
    return l_w.join(r_w, cond, "inner").drop(f"{right_prefix}{key}")


def stateful_watermark_tracker(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    delay: str = "1 day",
) -> DataFrame:
    """T1 as a CUSTOM stateful operator: per-key high-water mark maintained
    in the state store — the streaming generalization of the reference's
    ``last_updated_sale`` column (dags/pull_new_sales_list.py:267-270).

    Implemented with ``applyInPandasWithState`` (Arrow-batched); state per
    key is a single (max_ts, n_seen) pair, so state size is O(keys), evicted
    by the event-time timeout.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType(), True),
            T.StructField("high_water_ts", T.TimestampType(), True),
            T.StructField("n_seen", T.LongType(), True),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("max_ts_us", T.LongType(), True),
            T.StructField("n_seen", T.LongType(), True),
        ]
    )

    def track(key, pdfs, state: GroupState):
        import pandas as pd

        # GroupState.getOption is a PROPERTY (calling it raises "'tuple' is
        # not callable" on the second micro-batch, once state exists)
        max_us, n = state.getOption if state.exists else (None, 0)
        for pdf in pdfs:
            ts_us = (pdf[ts_col].astype("int64") // 1000).max()
            max_us = ts_us if max_us is None else max(max_us, int(ts_us))
            n += len(pdf)
        state.update((int(max_us), int(n)))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "high_water_ts": [pd.Timestamp(max_us * 1000)],
                "n_seen": [n],
            }
        )

    return (
        with_watermark(df, ts_col, delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            track,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stateful_dedup_ttl(
    df: DataFrame,
    *,
    key_col: str = "event_id",
    ttl: str = "24 hours",
) -> DataFrame:
    """T3 as a CUSTOM stateful operator on the Spark 4 ``transformWithState``
    API: emit each key the FIRST time it is seen, drop redeliveries, and
    let the per-key state entry expire after ``ttl``.

    The reference achieves at-most-once insertion with
    ``ON CONFLICT DO NOTHING`` (dags/monthly_price_paid_data.py:153) — an
    unbounded uniqueness index in Postgres. Here the dedup horizon is
    explicit: state is O(keys seen within the TTL), evicted by the state
    store itself (native ValueState TTL), so a 100 TB/day stream holds a
    day of keys, not an ever-growing index. Contrast with
    ``dedup_within_watermark`` (event-time horizon, builtin
    ``dropDuplicates``): this variant demonstrates the custom-processor
    path — per-key value state, processing-time TTL, counter of suppressed
    redeliveries.

    Runtime requirements (real clusters have both; tests skip without them):
    RocksDB state store
    (``spark.sql.streaming.stateStore.providerClass =
    org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``)
    and the ``protobuf`` package for the state-server protocol.
    """
    import re

    m = re.match(r"(\d+)\s*(hour|minute|second|day)s?", ttl)
    if not m:
        raise ValueError(f"unparseable ttl: {ttl!r}")
    unit_ms = {"second": 1_000, "minute": 60_000, "hour": 3_600_000, "day": 86_400_000}
    ttl_ms = int(m.group(1)) * unit_ms[m.group(2)]

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType(), True),
            T.StructField("first_seen_batch_rows", T.LongType(), True),
        ]
    )

    class FirstSeen(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState(
                "seen", "first_seen_ms long", ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            n = sum(len(pdf) for pdf in rows)
            if not self._seen.exists():
                self._seen.update((timer_values.getCurrentProcessingTimeInMs(),))
                yield pd.DataFrame({key_col: [key[0]], "first_seen_batch_rows": [n]})

        def close(self) -> None:
            return None

    return df.groupBy(key_col).transformWithStateInPandas(
        FirstSeen(),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="ProcessingTime",
    )


def _parse_ttl_ms(ttl: str) -> int:
    import re

    m = re.match(r"(\d+)\s*(hour|minute|second|day)s?", ttl)
    if not m:
        raise ValueError(f"unparseable ttl: {ttl!r}")
    unit_ms = {"second": 1_000, "minute": 60_000, "hour": 3_600_000, "day": 86_400_000}
    return int(m.group(1)) * unit_ms[m.group(2)]


def stateful_dedup_ttl_groupstate(
    df: DataFrame,
    *,
    key_col: str = "event_id",
    ttl: str = "24 hours",
) -> DataFrame:
    """T3 TTL dedup on the ``applyInPandasWithState`` (GroupState) API —
    same semantics as ``stateful_dedup_ttl`` but with no runtime
    requirements beyond stock Spark: runs on the default HDFS-backed state
    store, no protobuf state-server protocol. This is the portable form; the
    ``transformWithState`` form above shows the Spark 4 native-TTL path.

    Semantics: emit a key the first time it is seen; suppress redeliveries
    while its state lives; after ``ttl`` of processing time the key is
    first-seen again. Correctness of re-emit does NOT depend on timer
    callbacks: the TTL is checked against the stored first-seen stamp on
    every access, while ``setTimeoutDuration`` handles eviction of idle
    keys (so state stays O(keys within TTL), exactly the 100 TB/day
    argument in ``stateful_dedup_ttl``'s docstring).
    """
    ttl_ms = _parse_ttl_ms(ttl)

    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType(), True),
            T.StructField("first_seen_batch_rows", T.LongType(), True),
        ]
    )
    state_schema = T.StructType([T.StructField("first_seen_ms", T.LongType(), True)])

    def dedup(key, pdfs, state):
        import time

        import pandas as pd

        if state.hasTimedOut:  # idle past TTL: evict, emit nothing
            state.remove()
            return
        n = sum(len(pdf) for pdf in pdfs)
        now_ms = int(time.time() * 1000)
        opt = state.getOption  # GroupState.get/getOption are PROPERTIES
        first = opt[0] if opt is not None else None
        state.update((now_ms if first is None or now_ms - first > ttl_ms else first,))
        state.setTimeoutDuration(ttl_ms)
        if first is None or now_ms - first > ttl_ms:
            yield pd.DataFrame({key_col: [key[0]], "first_seen_batch_rows": [n]})

    return df.groupBy(key_col).applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def cms_sink(
    df: DataFrame,
    key_col: str,
    cms_path: str,
    checkpoint_dir: str,
    *,
    depth: int = 4,
    width: int = 2048,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming heavy-hitters: per micro-batch Count-Min sketches persisted
    as ``<cms_path>/batch=<id>/`` — state is ≤ depth×width rows per batch
    no matter the stream volume, and the batch-id directory layout makes
    re-delivered batches IDEMPOTENT (same dir overwritten, never
    double-counted — the failure mode a naive merge-in-place sink has).
    Query side: ``read_cms`` merges on read (counter sums are associative);
    compact old batch dirs with one ``cms_merge`` write when they pile up.
    """
    from airflow_dags_spark.functions.probabilistic import cms_build

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        cms_build(batch, key_col, depth, width).write.mode("overwrite").parquet(
            f"{cms_path}/batch={batch_id}"
        )

    writer = df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cms(spark: SparkSession, cms_path: str) -> DataFrame:
    """Merge-on-read of a ``cms_sink`` directory: one counter table."""
    from airflow_dags_spark.functions.probabilistic import cms_merge

    return cms_merge(spark.read.parquet(cms_path).select("r", "b", "cnt"))


def ewma_tracker(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.3,
    delay: str = "1 day",
) -> DataFrame:
    """Streaming EWMA per key (the real-time form of
    functions/timeseries.py): ``applyInPandasWithState`` carrying ONE float
    of state per key — s ← α·x + (1-α)·s folded over each micro-batch in
    (ts, event_id) order, continuing from the stored value. State size is
    O(keys) regardless of stream length; event-time timeout evicts idle
    keys past the watermark.

    Contract: per-key order ACROSS micro-batches follows arrival order
    (source-ordered feeds — the reference's dated landing files — satisfy
    this); within a batch rows are sorted by event time.

    Eviction: each update arms an event-time timeout at (max event time seen
    for the key + ``delay``); when the watermark passes it with no new data,
    the timed-out invocation removes the state — so state is O(ACTIVE keys),
    not O(all keys ever seen).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    delay_ms = _parse_ttl_ms(delay)

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType(), True),
            T.StructField("ewma", T.DoubleType(), True),
            T.StructField("n_seen", T.LongType(), True),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("ewma", T.DoubleType(), True),
            T.StructField("n_seen", T.LongType(), True),
        ]
    )

    def track(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            # watermark passed (last event time + delay) with no new rows:
            # evict — a later arrival simply restarts the fold from scratch
            state.remove()
            return
            yield  # pragma: no cover — keeps this a generator function

        s, n = state.getOption if state.exists else (None, 0)
        max_ts = None
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, "event_id"], kind="mergesort")
            if len(pdf):
                m = pdf[ts_col].max()
                max_ts = m if max_ts is None else max(max_ts, m)
            for x in pdf[value_col]:
                if pd.isna(x):
                    continue
                s = float(x) if s is None else alpha * float(x) + (1 - alpha) * s
                n += 1
        state.update((s, int(n)))
        if max_ts is not None:
            ts_ms = int(pd.Timestamp(max_ts).value // 1_000_000) + delay_ms
            # the engine rejects timestamps at/behind the current watermark
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(ts_ms, wm + 1))
        yield pd.DataFrame({key_col: [key[0]], "ewma": [s], "n_seen": [n]})

    return (
        with_watermark(df, ts_col, delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            track,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def quality_monitor_sink(
    df: DataFrame,
    expectations,
    out_path: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
    on_violation=None,
) -> StreamingQuery:
    """Streaming data-quality monitor: run a ``functions.quality
    .Expectations`` suite over EVERY micro-batch and append the per-batch
    report (batch_id, constraint, observed, passed) to a quality-history
    table — the continuous form of the batch DQ audit, playing the role of
    the reference's failure callbacks (SURVEY §2.8 U4) but with observable
    metrics instead of a log line.

    ``on_violation(batch_id, failed_rows)`` fires when any constraint
    fails (wire ``jobs/notify.py`` here for the webhook path); the report
    row is written either way, so alert delivery failures never lose the
    audit trail. Exactly-once: foreachBatch + checkpoint make each batch's
    report idempotent under replay (overwrite by batch_id partition)."""
    from pyspark.sql import functions as F  # noqa: F811 (closure import)

    def audit_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        report = expectations.run(batch).withColumn(
            "batch_id", F.lit(batch_id).cast("bigint")
        )
        rows = report.collect()  # bounded: one row per constraint
        spark = batch.sparkSession
        out = tiny_df(spark, [tuple(r) for r in rows], report.schema)
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )
        failed = [r for r in rows if not r["passed"]]
        if failed and on_violation is not None:
            on_violation(batch_id, failed)

    writer = df.writeStream.foreachBatch(audit_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def screened_ingest_sink(
    docs_stream: DataFrame,
    store_path: str,
    accepted_path: str,
    flagged_path: str,
    checkpoint_dir: str,
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_shingle: int = 3,
    salts: list[str] | None = None,
    append_matched: bool = False,
    available_now: bool = True,
    advisory_path: str | None = None,
) -> StreamingQuery:
    """Near-dup-screened streaming ingest: every micro-batch is signed,
    screened against the persistent MinHash signature store, and routed —
    novel docs to ``accepted_path``, near-dup candidates (with their
    matched store doc and band count) to ``flagged_path`` for exact
    verification. The streaming composition of
    ``operators.ingest.MinhashSignatureStore`` (sign-once store, K3
    idempotent append) with the T2/T3 micro-batch discipline above.

    Every write is a keyed insert-if-absent, so at-least-once re-delivery
    of a batch re-screens but never duplicates the store or either route —
    the streaming analog of the reference's ON CONFLICT DO NOTHING loop
    (dags/monthly_price_paid_data.py:153). Docs inside ONE batch that are
    near-dups of each other both pass the store screen (the store compares
    against PRIOR state); run ``minhash_candidate_pairs`` on the batch as
    a pre-step where intra-batch dedup matters.

    Replay determinism: the screen is a pure function of (pre-batch
    store, batch) — store rows keyed by any batch member are excluded
    (operators/dedup.py: minhash_incremental_screen), so replaying a
    batch reproduces the identical routing no matter where a crash fell
    (before the routes, between them, after the store append but before
    the checkpoint commit). Routes still write before the store append so
    the store never gets ahead of the routed output.

    **Cross-batch recall loss from that exclusion** (the price of replay
    determinism, beyond the intra-batch case above): if a batch
    re-delivers an OLD key K (stored rounds ago) alongside a NEW doc D
    that is a near-dup of K, K's store rows are excluded from D's screen,
    so D routes as novel — and since both routes are insert-if-absent and
    never re-screened, D is accepted permanently. The key-only
    self-exclusion this replaced did not have that miss (it only excluded
    each doc's own key). Mitigations: dedup re-delivered old keys
    upstream (an anti-join of the batch against the store's key column
    before this sink), or pass ``advisory_path`` — the sink then runs the
    second advisory pass (``MinhashSignatureStore.advisory_redelivery``)
    over exactly the excluded-but-preexisting store rows and persists its
    hits there as flags-after-the-fact (keyed insert-if-absent; routing
    and replay determinism untouched). (A FRESH checkpoint
    that re-BATCHES history differently is a reprocess, not a replay:
    batch boundaries define what "prior state" means, so a cross-batch
    near-dup pair that lands in one reprocessed batch screens as novel;
    flags are advisory candidates for exact verification, and no surface
    ever duplicates.)

    100 TB shape: signing cost is per NEW document only; the screen
    shuffles band signatures (bucket-pruned), never text; both route
    writes anti-join on the key column alone; store growth is
    ~130 B/doc, independent of batch count.
    """
    from airflow_dags_spark.operators.ingest import MinhashSignatureStore

    def screen_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        # n_shingle/salts MUST match how the store was built: a mismatched
        # band set would screen on the wrong signatures and then fail the
        # append on missing band columns — pass the store's configuration
        # through, never assume the defaults
        store = MinhashSignatureStore(
            spark, store_path, key_col, n_shingle=n_shingle, salts=salts
        )
        screen, new_bands = store.screen(batch, text_col)
        flagged_keys = screen.where(F.col("matched_store_doc").isNotNull())
        accepted = batch.join(
            flagged_keys.select(key_col), key_col, "left_anti"
        )
        flagged = batch.join(
            flagged_keys.select(
                key_col, "matched_store_doc", "n_matching_bands"
            ),
            key_col,
        )
        # first-wins by text: duplicate keys with conflicting payloads
        # must persist a deterministic survivor on every route
        ParquetTable(spark, accepted_path, key_col).insert_if_absent(
            accepted, order_by=[text_col]
        )
        ParquetTable(spark, flagged_path, key_col).insert_if_absent(
            flagged, order_by=[text_col]
        )
        if advisory_path is not None:
            # flags-after-the-fact for the cross-batch re-delivery miss:
            # advisory only — the routes above never consult this table.
            # Keyed by (key, batch_id): a key can be legitimately flagged
            # again by a LATER batch (re-delivered next to a different
            # near-dup) and an audit table that silently drops the second
            # flag is lying; replay of the SAME batch still no-ops because
            # the advisory pass is replay-pure for a fixed batch id
            advisories = store.advisory_redelivery(new_bands).withColumn(
                "batch_id", F.lit(batch_id).cast("bigint")
            )
            ParquetTable(
                spark, advisory_path, [key_col, "batch_id"]
            ).insert_if_absent(
                advisories, order_by=["advisory_matched_store_doc"]
            )
        # store append LAST (see docstring: replay consistency)
        store.append_signatures(
            new_bands, screen, append_matched=append_matched
        )

    writer = docs_stream.writeStream.foreachBatch(screen_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _ledger_namespace(checkpoint_dir: str) -> str:
    """Per-checkpoint ledger-key namespace shared by the index-maintenance
    sinks: micro-batch ids restart at 0 with every fresh checkpoint, so
    ledger keys are ``<md5(canonical_dir)[:12]>:b<batch_id>`` — replay
    detection scoped to the one checkpoint whose batch ids are actually
    comparable.

    The hashed path is CANONICALIZED first (ADVICE r9): a namespace
    derived from the raw spelling would change between restarts of the
    SAME stream that pass the checkpoint as relative vs absolute vs
    ``file:``-URI — and a changed namespace re-folds already-committed
    batches (double-counting their vectors). Local paths go through
    ``os.path.abspath``; ``file:`` URIs are reduced to their
    canonicalized local path; other URI schemes (s3a://, hdfs://) have no
    local canonical form and hash as spelled minus trailing slashes —
    spell them consistently across restarts.

    Cross-release note: the namespacing (and this canonicalization) are
    on-disk format contracts — a replayed batch is recognized only under
    the SAME key format. Ledgers written by the pre-namespace release
    (bare ``b<N>`` keys) are covered for one release by the legacy check
    in ``_legacy_applied``; a namespaced ledger written from a different
    path SPELLING of the same dir before this canonicalization will
    re-fold its one in-flight batch (drain the stream before upgrading)."""
    import hashlib
    import os

    p = checkpoint_dir.rstrip("/")
    if p.startswith("file:"):
        # file:/x, file:///x → /x (URI → canonical local path)
        local = p[len("file:"):]
        while local.startswith("//"):
            local = local[1:]
        p = os.path.abspath(local)
    elif "://" not in p:
        p = os.path.abspath(p)
    return hashlib.md5(p.encode("utf-8")).hexdigest()[:12]


def _legacy_applied(store, batch_id: int, memo: dict | None = None) -> bool:
    """One-release migration path (ADVICE r9): a ledger written by the
    pre-namespace release recorded bare ``b<N>`` keys. When the current
    micro-batch's bare key exists there, the batch is an in-flight replay
    from before the upgrade — skip it instead of re-folding (the
    namespaced check can't see it).

    Scoped TIGHTLY to the sink-written format ``b<digits>`` (a regex, not
    merely colon-free): manual-API ledger keys like ``__init__`` or other
    seeding conventions must never make the sink skip a live micro-batch.
    The residual collision — a store seeded MANUALLY with keys that
    exactly match ``b<digits>`` and then attached to a sink — is the
    documented reason the sinks expose ``legacy_ledger_check=False``.

    ``memo`` (per-sink dict) caches the has-legacy-rows determination:
    new keys are always namespaced, so once a ledger shows no legacy rows
    it never will — the streaming path then pays zero extra jobs per
    batch instead of a ledger read forever."""
    if memo is not None and memo.get("no_legacy"):
        return False
    if not store.exists():
        return False
    led = store._ledger.read()
    legacy = led.where(F.col("batch_id").rlike("^b[0-9]+$"))
    if legacy.limit(1).count() == 0:
        if memo is not None:
            memo["no_legacy"] = True
        return False
    return legacy.where(F.col("batch_id") == f"b{batch_id}").count() > 0


def ivf_index_sink(
    vec_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    *,
    n_cells: int = 16,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_sample: int = 20000,
    seed: int = 42,
    sample_hex: str = "4",
    refit_drift_threshold: float | None = None,
    legacy_ledger_check: bool = True,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming maintenance of the persistent IVF index — the similarity
    analog of :func:`screened_ingest_sink` over
    ``operators/ann_store.py:IvfIndexStore``: the FIRST micro-batch trains
    the coarse quantizer and seeds the per-cell sufficient statistics;
    every later batch is assigned to the CURRENT centroids (Arrow matmul
    fast path, shuffle-free) and folded in as one new state version, so
    the index re-centers as the corpus grows without ever re-scanning it.
    ``refit_drift_threshold`` arms the RE-TRAIN side of the drift policy
    (mirroring :func:`pq_codebook_sink`): after each fold, if the
    centroids have re-centered further than the threshold from the last
    fit, the coarse quantizer is re-trained from the md5-sampled
    reservoir as a ledger-flagged refit version.

    Exactly-once per micro-batch WITHOUT relying on the checkpoint alone:
    the store's batch ledger (K3 insert-if-absent keyed by batch id) makes
    a replayed committed batch a no-op, and a crash between the state
    write and the ledger append leaves an orphan version the replay
    deterministically overwrites. Ledger keys are NAMESPACED by the
    checkpoint location (``<md5(checkpoint_dir)[:12]>:b<batch_id>``):
    micro-batch ids restart at 0 with every fresh checkpoint, so a bare
    ``b{batch_id}`` key would make a NEW stream (or a second stream)
    against an existing store collide with the old run's ledger rows and
    silently drop whole batches as "replays" — the namespace keeps replay
    detection scoped to the one checkpoint whose batch ids are actually
    comparable. (The screened-sink caveat still applies: a FRESH
    checkpoint that re-BATCHES history differently is a reprocess, not a
    replay — its batches apply as new folds.)

    100 TB shape: per-batch cost is one scan of the batch plus k×dim
    partial sums to the driver; state is k×dim rows per version — index
    maintenance cost is a function of ARRIVING data only."""
    from airflow_dags_spark.operators.ann_store import IvfIndexStore

    ledger_ns = _ledger_namespace(checkpoint_dir)
    legacy_memo: dict = {} if legacy_ledger_check else {"no_legacy": True}

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        # null vectors carry no assignment signal, and an all-null FIRST
        # batch would otherwise crash the quantizer fit on an empty
        # sample and kill the streaming query
        batch = batch.where(F.col(vec_col).isNotNull())
        if batch.isEmpty():
            return
        store = IvfIndexStore(
            batch.sparkSession, store_path, key_col=key_col, vec_col=vec_col
        )
        if _legacy_applied(store, batch_id, legacy_memo):
            return  # committed pre-upgrade under the bare-key format
        bid = f"{ledger_ns}:b{batch_id}"
        if not store.exists():
            store.init_from(
                batch,
                n_cells,
                batch_id=bid,
                fit_sample=fit_sample,
                seed=seed,
                sample_hex=sample_hex,
            )
            return
        store.add_batch(batch, bid, sample_hex=sample_hex)
        if refit_drift_threshold is not None:
            store.maybe_refit(
                f"{bid}:refit",
                drift_threshold=refit_drift_threshold,
                fit_sample=fit_sample,
                seed=seed,
            )

    writer = vec_stream.writeStream.foreachBatch(fold_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def pq_codebook_sink(
    vec_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    *,
    m: int = 4,
    n_codes: int = 16,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_sample: int = 20000,
    seed: int = 42,
    sample_hex: str = "4",
    refit_drift_threshold: float | None = None,
    legacy_ledger_check: bool = True,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming maintenance of the persistent PQ codebooks — the
    product-quantization sibling of :func:`ivf_index_sink` over
    ``operators/ann_store.py:PqCodebookStore``: the first micro-batch
    trains the codebooks and seeds the per-(subspace, code) statistics;
    every later batch is encoded against the CURRENT codebooks
    (Arrow-batched argmin, shuffle-free) and folded in as one new version,
    feeding the deterministic md5-sampled reservoir as it goes.

    ``refit_drift_threshold`` arms the RE-TRAIN side of the drift policy:
    after each fold, if the codes have re-centered further than the
    threshold from the last fit, the codebooks are re-trained from the
    reservoir as a ledger-flagged refit version (``maybe_refit``). Leave
    ``None`` to fold-only and drive refits out-of-band.

    Same exactly-once discipline as the IVF sink: ledger keys are
    namespaced per checkpoint (batch ids restart at 0 with a fresh
    checkpoint), replayed batches no-op, orphan versions heal. Per-batch
    cost is one encode pass + n_codes × dim partials to the driver; a
    refit reads the bounded reservoir, never the corpus."""
    from airflow_dags_spark.operators.ann_store import PqCodebookStore

    ledger_ns = _ledger_namespace(checkpoint_dir)
    legacy_memo: dict = {} if legacy_ledger_check else {"no_legacy": True}

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        batch = batch.where(F.col(vec_col).isNotNull())
        if batch.isEmpty():
            return
        store = PqCodebookStore(
            batch.sparkSession, store_path, key_col=key_col, vec_col=vec_col
        )
        if _legacy_applied(store, batch_id, legacy_memo):
            return  # committed pre-upgrade under the bare-key format
        bid = f"{ledger_ns}:b{batch_id}"
        if not store.exists():
            store.init_from(
                batch,
                m,
                n_codes,
                batch_id=bid,
                fit_sample=fit_sample,
                seed=seed,
                sample_hex=sample_hex,
            )
            return
        store.add_batch(batch, bid, sample_hex=sample_hex)
        if refit_drift_threshold is not None:
            store.maybe_refit(
                f"{bid}:refit",
                drift_threshold=refit_drift_threshold,
                fit_sample=fit_sample,
                seed=seed,
            )

    writer = vec_stream.writeStream.foreachBatch(fold_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def pack_stream_sink(
    doc_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
    key_bucket_width: int = 65536,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming maintenance of the persistent token-stream cursor — the
    packing sibling of :func:`ivf_index_sink` over
    ``operators/packing.py:TokenStreamStore``: each micro-batch of
    documents is packed onto the END of the concatenated token stream
    (two-phase prefix scan of the BATCH plus a one-row cursor update),
    so the dataloader layout of already-committed data never moves and
    packing cost follows ARRIVING data, not corpus size.

    Stream order = micro-batch arrival order, then ascending key within
    a batch — deterministic for a deterministic source split, which is
    what keeps the store oracle-checkable end-to-end. Same exactly-once
    discipline as the other store sinks: ledger keys are namespaced per
    checkpoint (micro-batch ids restart at 0 with a fresh checkpoint),
    replayed batches no-op on the K3 ledger, and a crash between the
    assignment/state writes and the ledger append is healed by the
    replay's deterministic overwrite (same cursor base → identical
    offsets)."""
    from airflow_dags_spark.functions.text import token_count
    from airflow_dags_spark.operators.packing import TokenStreamStore

    ledger_ns = _ledger_namespace(checkpoint_dir)

    def fold_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        counts = batch.select(
            F.col(key_col), token_count(text_col).alias("__n")
        )
        store = TokenStreamStore(
            batch.sparkSession, store_path, key_col=key_col
        )
        store.append_batch(
            counts, "__n", f"{ledger_ns}:b{batch_id}",
            key_bucket_width=key_bucket_width,
        )

    writer = doc_stream.writeStream.foreachBatch(fold_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

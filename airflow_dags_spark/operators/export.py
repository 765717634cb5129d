"""Training-data shard export — balanced, deterministic, resumable.

A 100 TB training pipeline ends in an export step: write the curated corpus
as N equal-sized shards whose membership is a pure function of the row key,
so (a) a re-run after failure reproduces byte-identical shard membership,
(b) downstream loaders can map shard -> worker statically, and (c) any
subset of shards is a valid deterministic sample of the corpus.

Not present in the reference (its sink is a Postgres upsert,
``dags/monthly_price_paid_data.py:147-155``); mandated by the north-star
training-pipeline surface (SURVEY.md §2.9).

Scale design (SCALE.md):
- assignment is ``xxhash64(key) mod n`` computed JVM-side in the scan stage —
  one hash-partitioning shuffle, no sampling pass, no driver involvement;
- one output file per shard via ``repartition(n, hash)`` — for multi-GB
  shards raise ``files_per_shard`` instead, which subdivides with a second
  deterministic hash, never a round-robin;
- within-shard order is a deterministic hash sort (``sortWithinPartitions``)
  — a reproducible pseudo-shuffle for training, no global sort;
- the portable histogram (``shard_histogram``) uses an md5-derived 60-bit
  hash that DuckDB computes identically, making shard balance and
  membership oracle-checkable at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Portable 60-bit key hash (identical in DuckDB:
# ('0x' || substr(md5(k), 1, 15))::BIGINT), used where cross-engine
# reproducibility matters more than speed.
def portable_shard(key: F.Column | str, n_shards: int) -> F.Column:
    key_col = F.col(key) if isinstance(key, str) else key
    return F.pmod(
        F.conv(F.substring(F.md5(key_col), 1, 15), 16, 10).cast("bigint"),
        F.lit(n_shards),
    )


def shard_assignment(
    df: DataFrame, key_cols: list[str], n_shards: int, portable: bool = False
) -> DataFrame:
    """Attach a deterministic ``shard`` column in [0, n_shards)."""
    if portable:
        key = F.concat_ws("\x1f", *key_cols)
        shard = portable_shard(key, n_shards)
    else:
        shard = F.pmod(F.xxhash64(*key_cols), F.lit(n_shards))
    return df.withColumn("shard", shard)


def write_training_shards(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    n_shards: int,
    rows_per_file: int | None = None,
    fmt: str = "parquet",
) -> dict:
    """Write ``df`` as ``shard=K`` partitions with balanced, keyed membership.

    One task per shard (all rows of a shard hash to the same task), one file
    per shard — unless ``rows_per_file`` caps file size, in which case the
    task rolls files at that bound. Both the membership hash and the
    within-shard sort are deterministic, so re-runs rebuild identical files.

    Returns ``{"n_shards": n, "rows": total, "max_shard_rows": m,
    "min_shard_rows": m2}`` read back from the written data (self-verifying:
    the stats come from the files, not the plan).
    """
    sharded = shard_assignment(df, key_cols, n_shards)
    writer = (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions(F.xxhash64(F.lit(2), *key_cols))
        .write.partitionBy("shard")
        .mode("overwrite")
        .format(fmt)
    )
    if rows_per_file:
        writer = writer.option("maxRecordsPerFile", rows_per_file)
    writer.save(path)
    spark = df.sparkSession
    back = spark.read.format(fmt).load(path)
    counts = back.groupBy("shard").count().collect()
    rows = sum(r["count"] for r in counts)
    return {
        "n_shards": len(counts),
        "rows": rows,
        "max_shard_rows": max(r["count"] for r in counts),
        "min_shard_rows": min(r["count"] for r in counts),
    }


def read_shard_subset(
    spark: SparkSession, path: str, shards: list[int], fmt: str = "parquet"
) -> DataFrame:
    """Read selected shards only — partition pruning on the shard column."""
    return (
        spark.read.format(fmt)
        .load(path)
        .where(F.col("shard").isin([int(s) for s in shards]))
    )


def shard_histogram(
    df: DataFrame, key_cols: list[str], n_shards: int
) -> DataFrame:
    """Per-shard row count + distinct keys, on the portable md5 hash."""
    return (
        shard_assignment(df, key_cols, n_shards, portable=True)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct(*key_cols).alias("distinct_keys"),
        )
    )


def pack_sequences(
    df: DataFrame,
    key_col: str,
    token_col: str,
    budget: int,
    n_shards: int = 16,
) -> DataFrame:
    """Greedy sequence packing: group documents into training sequences of
    at most ``budget`` tokens (first-fit over documents sorted by key), the
    step between a curated corpus and a fixed-context-length training run.

    Distribution: documents hash-partition into ``n_shards`` deterministic
    shards (same ``portable_shard`` as the export path), then packing runs
    per shard inside ``applyInPandas`` — the greedy fold is inherently
    sequential, so the parallel unit is the shard, exactly like the
    downstream loader. Output: (shard, seq_id, key, n_tokens) with seq_id
    dense per shard. Deterministic: shard is a pure key hash, the in-shard
    fold visits docs in key order. A single document longer than ``budget``
    becomes its own (overflowing) sequence — truncation is the tokenizer's
    call, not the packer's.

    At 100 TB: one hash shuffle, Arrow-batched Python whose state per group
    is two counters; shard count = packing parallelism, chosen like loader
    worker count (thousands at lake scale). Not SQL-expressible (stateful
    fold) → rows-only driver check + invariants in tests/test_export.py.
    """
    import pandas as pd

    # key column keeps its input type (string doc ids are common) — derive
    # the Arrow output field from df.schema instead of hardcoding bigint
    key_type = df.schema[key_col].dataType.simpleString()
    out_schema = (
        "shard bigint, seq_id bigint, "
        f"{key_col} {key_type}, n_tokens bigint"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(key_col, kind="mergesort")
        seq_ids, seq_id, used = [], 0, 0
        for t in pdf["__tokens"]:
            t = int(t)
            if used > 0 and used + t > budget:
                seq_id += 1
                used = 0
            used += t
            seq_ids.append(seq_id)
        return pd.DataFrame(
            {
                "shard": pdf["shard"],
                "seq_id": seq_ids,
                key_col: pdf[key_col],
                "n_tokens": pdf["__tokens"],
            }
        )

    prepared = shard_assignment(
        # null token counts (e.g. token_count(null text)) cannot be packed —
        # drop them here so the pandas fold never sees NaN
        df.select(key_col, F.col(token_col).cast("bigint").alias("__tokens"))
        .where(F.col("__tokens").isNotNull()),
        [key_col],
        n_shards,
        portable=True,
    )
    return prepared.groupBy("shard").applyInPandas(pack, out_schema)


__all__ = [
    "portable_shard",
    "shard_assignment",
    "write_training_shards",
    "read_shard_subset",
    "shard_histogram",
    "pack_sequences",
]


def write_wds_shards(
    df: DataFrame,
    path: str,
    *,
    key_col: str,
    text_col: str,
    meta_cols: list[str] | None = None,
    n_shards: int = 8,
) -> DataFrame:
    """WebDataset-style tar shard export: one ``shard-NNNNN.tar`` per shard,
    each sample as paired members ``<key>.txt`` (content) + ``<key>.json``
    (metadata) — the loader format of the large-scale training stacks that
    stream tars instead of parquet.

    Determinism is total: membership is the portable md5 shard hash, member
    order is a key sort, and tar metadata (mtime/uid/gid) is zeroed — so a
    re-run produces BYTE-IDENTICAL tars (content-addressable, resumable,
    diffable). Executors write their shards directly (``applyInPandas`` per
    shard group — one task per shard, no driver involvement); size shards
    via ``n_shards`` so one shard (the WebDataset-recommended 100 MB–1 GB)
    fits an executor. Returns the manifest (shard, n_samples, tar_path,
    tar_bytes) as a DataFrame.
    """
    import json as _json

    meta_cols = meta_cols or []
    assigned = shard_assignment(df, [key_col], n_shards, portable=True)

    out_schema = "shard int, n_samples long, tar_path string, tar_bytes long"

    def write_shard(pdf):
        import os
        import tarfile

        import pandas as pd

        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values(key_col, kind="mergesort")
        tar_path = os.path.join(path, f"shard-{shard:05d}.tar")
        os.makedirs(path, exist_ok=True)
        tmp = tar_path + ".tmp"
        with tarfile.open(tmp, "w") as tar:
            for _, row in pdf.iterrows():
                key = str(row[key_col])
                text = ("" if row[text_col] is None else str(row[text_col])).encode()
                meta = _json.dumps(
                    {c: row[c] for c in meta_cols}, default=str, sort_keys=True
                ).encode()
                for suffix, payload in ((".txt", text), (".json", meta)):
                    info = tarfile.TarInfo(name=f"{key}{suffix}")
                    info.size = len(payload)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    import io

                    tar.addfile(info, io.BytesIO(payload))
        os.replace(tmp, tar_path)  # atomic per-shard commit → resumable
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_samples": [len(pdf)],
                "tar_path": [tar_path],
                "tar_bytes": [os.path.getsize(tar_path)],
            }
        )

    return assigned.groupBy("shard").applyInPandas(write_shard, out_schema)


def write_packed_shards(
    df: DataFrame,
    path: str,
    window_tokens: int,
    windows_per_shard: int,
    *,
    key_col: str = "doc_id",
    start_col: str = "token_start",
    end_col: str = "token_end",
    fmt: str = "parquet",
) -> dict:
    """Ship a PACKED corpus (rows annotated with [start, end) token-stream
    offsets — ``jobs/curate_full`` with ``pack_window``, or
    ``operators/packing.token_stream_offsets``) as dataloader shards of
    ``windows_per_shard`` consecutive ``window_tokens``-sized training
    windows.

    Shards are SELF-CONTAINED: a doc straddling a shard boundary is
    written into every shard whose token range it overlaps (at most one
    extra copy per boundary crossed), so a dataloader materializes shard
    K's windows from shard K's files alone — no peeking at neighbors.
    Within a shard, rows sort by stream offset: reading the files in
    order IS reading the token stream. Membership and order are pure
    functions of the offsets, so re-runs rebuild identical shards.

    Scale shape: one codegen projection computes the shard span, the
    explode emits rows + boundary straddlers (never tokens), and the
    write is one task per shard exactly like ``write_training_shards``.
    Returns self-verifying stats read back from the files, including the
    straddler count (``rows - n_docs``).
    """
    if window_tokens < 1 or windows_per_shard < 1:
        raise ValueError(
            "window_tokens and windows_per_shard must be >= 1, got "
            f"{window_tokens}, {windows_per_shard}"
        )
    span = window_tokens * windows_per_shard
    first = F.floor(F.col(start_col) / F.lit(span)).cast("bigint")
    last = F.floor((F.col(end_col) - 1) / F.lit(span)).cast("bigint")
    # only rows occupying stream positions ship: a zero-length span at a
    # shard boundary would make sequence(first, last) DESCEND (the
    # sequence(1,0) gotcha) and write the phantom doc into TWO shards,
    # and a NULL-offset row (curate_full's left-join annotation of a
    # zero-count doc) would silently explode to nothing — excluding both
    # up front mirrors token_stream_offsets' n > 0 contract
    placed = df.where(
        F.col(start_col).isNotNull() & (F.col(end_col) > F.col(start_col))
    )
    sharded = placed.withColumn("shard", F.explode(F.sequence(first, last)))
    (
        sharded.repartition(F.col("shard"))
        .sortWithinPartitions(start_col)
        .write.partitionBy("shard")
        .mode("overwrite")
        .format(fmt)
        .save(path)
    )
    spark = df.sparkSession
    back = spark.read.format(fmt).load(path)
    counts = back.groupBy("shard").count().collect()
    rows = sum(r["count"] for r in counts)
    n_docs = back.select(key_col).distinct().count()
    return {
        "n_shards": len(counts),
        "rows": rows,
        "n_docs": n_docs,
        "n_straddlers": rows - n_docs,
        "window_tokens": window_tokens,
        "windows_per_shard": windows_per_shard,
    }

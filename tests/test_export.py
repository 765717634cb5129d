"""Training-shard export (operators/export.py): deterministic membership,
completeness, balance, file layout, and pruned subset reads."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_dags_spark.operators.export import (
    read_shard_subset,
    shard_assignment,
    write_training_shards,
)


def _corpus(spark, n=5000):
    return spark.range(n).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        (F.col("id") * 37 % 1001).alias("payload"),
    )


def test_write_shards_complete_and_balanced(spark, tmp_path):
    out = str(tmp_path / "shards")
    df = _corpus(spark)
    stats = write_training_shards(df, out, ["doc_id"], n_shards=8)
    assert stats["n_shards"] == 8
    assert stats["rows"] == 5000
    # xxhash64 balance: no shard more than 2x the ideal 625
    assert stats["max_shard_rows"] < 1250
    assert stats["min_shard_rows"] > 300

    back = spark.read.parquet(out)
    assert back.select("doc_id").distinct().count() == 5000


def test_shard_membership_deterministic(spark, tmp_path):
    df = _corpus(spark, 1000)
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    write_training_shards(df, a, ["doc_id"], n_shards=4)
    write_training_shards(df.orderBy(F.rand(7)), b, ["doc_id"], n_shards=4)
    for k in range(4):
        sa = {r.doc_id for r in read_shard_subset(spark, a, [k]).collect()}
        sb = {r.doc_id for r in read_shard_subset(spark, b, [k]).collect()}
        assert sa == sb  # membership is key-determined, not order-determined


def test_one_file_per_shard_and_pruning(spark, tmp_path):
    out = str(tmp_path / "shards")
    write_training_shards(_corpus(spark, 800), out, ["doc_id"], n_shards=4)
    import glob

    for k in range(4):
        files = glob.glob(f"{out}/shard={k}/*.parquet")
        assert len(files) == 1, f"shard {k}: {files}"

    subset = read_shard_subset(spark, out, [0, 2])
    plan = subset._jdf.queryExecution().executedPlan().toString()
    # partition filter on the shard dir, not a post-scan filter over all data
    assert "shard" in plan
    total = subset.count()
    assert 0 < total < 800


def test_rows_per_file_bounds_file_size(spark, tmp_path):
    out = str(tmp_path / "shards")
    write_training_shards(
        _corpus(spark, 2000), out, ["doc_id"], n_shards=2, rows_per_file=400
    )
    import glob
    import math

    back = spark.read.parquet(out)
    counts = {r["shard"]: r["count"] for r in back.groupBy("shard").count().collect()}
    for k in range(2):
        files = glob.glob(f"{out}/shard={k}/*.parquet")
        assert len(files) == math.ceil(counts[k] / 400)
        for f in files:  # no file exceeds the bound
            assert spark.read.parquet(f).count() <= 400


def test_portable_assignment_matches_duckdb(spark):
    import duckdb

    df = shard_assignment(_corpus(spark, 500), ["doc_id"], 16, portable=True)
    ours = {(r.doc_id, r.shard) for r in df.select("doc_id", "shard").collect()}
    theirs = set(
        duckdb.connect()
        .execute(
            "SELECT 'doc-' || i, ('0x' || substr(md5('doc-' || i), 1, 15))::BIGINT % 16 "
            "FROM generate_series(0, 499) t(i)"
        )
        .fetchall()
    )
    assert ours == theirs


def test_pack_sequences_invariants(spark):
    from airflow_dags_spark.functions.text import token_count
    from airflow_dags_spark.operators.export import pack_sequences
    from airflow_dags_spark.sources.tables import read_table

    d = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", token_count("text").alias("n_tokens")
    )
    budget = 256
    packed = pack_sequences(d, "doc_id", "n_tokens", budget=budget, n_shards=4)
    rows = packed.collect()

    # every document packed exactly once
    src = {r.doc_id: r.n_tokens for r in d.collect()}
    assert sorted(r.doc_id for r in rows) == sorted(src)
    assert all(r.n_tokens == src[r.doc_id] for r in rows)

    # no sequence exceeds the budget unless it is a single overflowing doc
    seqs: dict[tuple, list] = {}
    for r in rows:
        seqs.setdefault((r.shard, r.seq_id), []).append(r.n_tokens)
    for toks in seqs.values():
        assert sum(toks) <= budget or len(toks) == 1

    # greedy first-fit in doc_id order is tight: two consecutive sequences
    # in a shard can never be merged (else the fold would have merged them)
    by_shard: dict[int, dict[int, int]] = {}
    for (shard, seq_id), toks in seqs.items():
        by_shard.setdefault(shard, {})[seq_id] = sum(toks)
    for totals in by_shard.values():
        ordered = [totals[s] for s in sorted(totals)]
        assert all(
            a + ordered[i + 1] > budget or a > budget
            for i, a in enumerate(ordered[:-1])
        )


def test_pack_sequences_deterministic(spark):
    from airflow_dags_spark.functions.text import token_count
    from airflow_dags_spark.operators.export import pack_sequences
    from airflow_dags_spark.sources.tables import read_table

    d = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", token_count("text").alias("n_tokens")
    )
    a = pack_sequences(d, "doc_id", "n_tokens", budget=512, n_shards=4)
    b = pack_sequences(
        d.repartition(13), "doc_id", "n_tokens", budget=512, n_shards=4
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_sequences_string_keys_and_null_tokens(spark):
    """String doc ids (common) must pack — the output key field derives its
    type from the input schema, not a hardcoded bigint — and rows with null
    token counts (token_count of null text) are dropped, not a NaN crash
    inside the pandas fold."""
    from airflow_dags_spark.operators.export import pack_sequences

    d = spark.createDataFrame(
        [("doc-a", 100), ("doc-b", 200), ("doc-c", None), ("doc-d", 50)],
        "doc_uri string, n_tokens bigint",
    )
    packed = pack_sequences(d, "doc_uri", "n_tokens", budget=256, n_shards=2)
    assert packed.schema["doc_uri"].dataType.simpleString() == "string"
    rows = packed.collect()
    assert sorted(r.doc_uri for r in rows) == ["doc-a", "doc-b", "doc-d"]
    assert all(r.n_tokens is not None for r in rows)


# ---------------------------------------------------------------------------
# WebDataset tar shard export
# ---------------------------------------------------------------------------


def test_wds_shards_complete_and_paired(spark, tmp_path):
    import tarfile

    from airflow_dags_spark.operators.export import write_wds_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "wds")
    manifest = write_wds_shards(
        docs, out, key_col="doc_id", text_col="text",
        meta_cols=["source", "lang"], n_shards=4,
    ).collect()
    assert sum(r["n_samples"] for r in manifest) == docs.count()
    seen = set()
    for r in manifest:
        with tarfile.open(r["tar_path"]) as tar:
            names = tar.getnames()
            txts = {n[:-4] for n in names if n.endswith(".txt")}
            jsons = {n[:-5] for n in names if n.endswith(".json")}
            assert txts == jsons  # every sample is a paired .txt/.json
            assert not (txts & seen)
            seen |= txts
    assert len(seen) == docs.count()


def test_wds_shards_byte_identical_rerun(spark, tmp_path):
    import hashlib

    from airflow_dags_spark.operators.export import write_wds_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def digest(run_dir):
        rows = write_wds_shards(
            docs.repartition(7) if "b" in run_dir else docs,
            str(tmp_path / run_dir),
            key_col="doc_id", text_col="text", meta_cols=["source"], n_shards=3,
        ).collect()
        out = {}
        for r in rows:
            out[r["shard"]] = hashlib.md5(
                open(r["tar_path"], "rb").read()
            ).hexdigest()
        return out

    # identical bytes even with different input partitioning
    assert digest("a") == digest("b")


def test_wds_shard_content_roundtrip(spark, tmp_path):
    import json
    import tarfile

    from airflow_dags_spark.operators.export import write_wds_shards

    df = spark.createDataFrame(
        [(1, "hello", "s1"), (2, None, "s2")], "doc_id bigint, text string, source string"
    )
    rows = write_wds_shards(
        df, str(tmp_path / "w"), key_col="doc_id", text_col="text",
        meta_cols=["source"], n_shards=1,
    ).collect()
    with tarfile.open(rows[0]["tar_path"]) as tar:
        t1 = tar.extractfile("1.txt").read().decode()
        m1 = json.loads(tar.extractfile("1.json").read())
        t2 = tar.extractfile("2.txt").read().decode()
    assert t1 == "hello" and m1 == {"source": "s1"}
    assert t2 == ""  # null text → empty member, sample still present

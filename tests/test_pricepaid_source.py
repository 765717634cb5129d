"""Custom Python DataSource for the price-paid feed (sources/pricepaid_source).

Batch reads must agree exactly with spark.read.csv on the same file; byte
splitting must not duplicate or drop boundary lines; the stream reader must
pick up only newly completed lines per micro-batch.
"""

from __future__ import annotations

import os

import pytest

from airflow_dags_spark.schemas import PRICE_PAID_COLUMNS, PRICE_PAID_RAW_SCHEMA
from airflow_dags_spark.sources.pricepaid_source import (
    PricePaidBatchReader,
    PricePaidDataSource,
    PricePaidStreamReader,
    register,
)


def _csv_line(i: int) -> str:
    # quoted field with an embedded comma, like the real feed's address cols
    return (
        f'"{{TX{i:05d}}}",{100000 + i},"2024-01-{(i % 28) + 1:02d} 00:00","OX{i % 9}'
        f' {i % 9}AA","D","N","F","{i}","","HIGH ST, CORNER","","OXFORD","OXFORD",'
        f'"OXFORDSHIRE","A","A"'
    )


@pytest.fixture()
def feed_csv(tmp_path):
    p = tmp_path / "pp-monthly.csv"
    body = "\n".join(_csv_line(i) for i in range(500)) + "\n"
    p.write_bytes("﻿".encode("utf-8") + body.encode("utf-8"))
    return str(p)


def test_batch_matches_spark_csv(spark, feed_csv):
    register(spark)
    ours = (
        spark.read.format("pricepaid")
        .option("split_bytes", 4096)  # force many byte-range partitions
        .load(feed_csv)
    )
    builtin = spark.read.schema(PRICE_PAID_RAW_SCHEMA).csv(feed_csv, header=False)
    assert ours.columns == PRICE_PAID_COLUMNS
    a = sorted(map(tuple, ours.collect()))
    b = sorted(map(tuple, builtin.collect()))
    assert len(a) == 500
    assert a == b


def test_byte_split_partition_boundaries(feed_csv):
    size = os.path.getsize(feed_csv)
    reader = PricePaidBatchReader({"path": feed_csv, "split_bytes": 1000})
    parts = reader.partitions()
    assert len(parts) == -(-size // 1000)
    rows = [r for p in parts for batch in reader.read(p) for r in batch.to_pylist()]
    ids = [r["transaction_unique_identifier"] for r in rows]
    assert len(ids) == 500 and len(set(ids)) == 500  # no dup, no loss at splits


def test_directory_of_files(spark, tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    (d / "a.csv").write_text("\n".join(_csv_line(i) for i in range(10)) + "\n")
    (d / "b.csv").write_text("\n".join(_csv_line(i) for i in range(10, 30)) + "\n")
    (d / "_SUCCESS").write_text("")
    register(spark)
    assert spark.read.format("pricepaid").load(str(d)).count() == 30


def test_stream_reader_offsets_line_aligned(tmp_path):
    p = tmp_path / "feed.csv"
    p.write_text(_csv_line(0) + "\n" + _csv_line(1) + "\n")
    r = PricePaidStreamReader({"path": str(p)})
    assert r.initialOffset() == {"offset": 0}
    first = r.latestOffset()
    assert first["offset"] == os.path.getsize(p)

    # append one complete line and one partial (no trailing newline)
    with open(p, "a") as f:
        f.write(_csv_line(2) + "\n")
        f.write('"{TXPART')  # incomplete — must NOT be offered yet
    second = r.latestOffset()
    parts = r.partitions(first, second)
    got = [row for part in parts for row in r.read(part)]
    assert [row[0] for row in got] == ["{TX00002}"]

    # completing the partial line advances the offset past it
    with open(p, "a") as f:
        f.write('",1,"2024-01-01 00:00","OX1 1AA",,,,,,,,,,,,\n')
    third = r.latestOffset()
    got2 = [row for part in r.partitions(second, third) for row in r.read(part)]
    assert [row[0] for row in got2] == ["{TXPART"]
    assert r.partitions(third, third) == []


def test_streaming_end_to_end(spark, tmp_path):
    register(spark)
    p = tmp_path / "feed.csv"
    p.write_text("\n".join(_csv_line(i) for i in range(40)) + "\n")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("pricepaid")
            .load(str(p))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(out).count() == 40
    with open(p, "a") as f:
        f.write("\n".join(_csv_line(i) for i in range(40, 55)) + "\n")
    run_once()  # checkpointed offset resumes: only the 15 new lines land
    df = spark.read.parquet(out)
    assert df.count() == 55
    assert df.select("transaction_unique_identifier").distinct().count() == 55

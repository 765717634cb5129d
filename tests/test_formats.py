"""Multi-format IO (sources/formats.py): round-trip fidelity per format,
lossy-combination rejection, binaryFile → multimodal table shape."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airflow_dags_spark.sources.formats import (
    binary_to_json_safe,
    json_safe_to_binary,
    read_binary_dir,
    read_table_fmt,
    write_table,
)
from airflow_dags_spark.sources.tables import read_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sample(spark):
    return (
        read_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate",
                "l_returnflag", "l_extendedprice")
        .limit(500)
        .cache()
    )


def _rows(df):
    return sorted(
        tuple(str(v) for v in r) for r in df.collect()
    )


def test_parquet_orc_full_fidelity(spark, sample, tmp_path):
    """Columnar formats must round-trip types AND values exactly."""
    want_schema = sample.schema
    want = _rows(sample)
    for fmt in ("parquet", "orc"):
        p = str(tmp_path / fmt)
        write_table(sample, p, fmt)
        back = read_table_fmt(spark, p, fmt)
        assert back.schema == want_schema, fmt
        assert _rows(back) == want, fmt


def test_csv_json_roundtrip_with_imposed_schema(spark, sample, tmp_path):
    want = _rows(sample)
    for fmt in ("csv", "json"):
        p = str(tmp_path / fmt)
        write_table(sample, p, fmt)
        back = read_table_fmt(spark, p, fmt, schema=sample.schema)
        assert _rows(back) == want, fmt


def test_xml_roundtrip(spark, sample, tmp_path):
    p = str(tmp_path / "xml")
    small = sample.limit(50)
    write_table(small, p, "xml")
    back = read_table_fmt(spark, p, "xml", schema=small.schema)
    assert _rows(back) == _rows(small)


def test_csv_rejects_complex_columns(spark, tmp_path):
    df = spark.createDataFrame([(1, [1.0, 2.0])], "id bigint, vec array<double>")
    with pytest.raises(ValueError, match="complex/binary"):
        write_table(df, str(tmp_path / "c"), "csv")


def test_text_read_without_schema_requires_optin(spark, sample, tmp_path):
    p = str(tmp_path / "csv2")
    write_table(sample, p, "csv")
    with pytest.raises(ValueError, match="without a schema"):
        read_table_fmt(spark, p, "csv")
    inferred = read_table_fmt(spark, p, "csv", infer=True)
    assert inferred.count() == sample.count()


def test_avro_raises_named_package(spark, sample, tmp_path):
    with pytest.raises(ValueError, match="spark-avro"):
        write_table(sample, str(tmp_path / "a"), "avro")


def test_binary_dir_to_multimodal_shape(spark, tmp_path):
    d = tmp_path / "blobs"
    d.mkdir()
    (d / "a.png").write_bytes(b"\x89PNG-fake-one")
    (d / "b.jpg").write_bytes(b"\xff\xd8-fake-two-longer")
    (d / "skip.txt").write_bytes(b"not media")
    got = read_binary_dir(spark, str(d), glob="*.{png,jpg}", modality="image")
    rows = {os.path.basename(r["source_path"]): r for r in got.collect()}
    assert set(rows) == {"a.png", "b.jpg"}
    assert rows["a.png"]["mime"] == "image/png"
    assert rows["b.jpg"]["mime"] == "image/jpeg"
    assert bytes(rows["a.png"]["payload"]) == b"\x89PNG-fake-one"
    assert rows["a.png"]["n_bytes"] == 13
    assert all(r["modality"] == "image" for r in rows.values())
    # deterministic ids: re-read gives identical item_ids
    again = {os.path.basename(r["source_path"]): r["item_id"]
             for r in read_binary_dir(spark, str(d), glob="*.{png,jpg}").collect()}
    assert {k: rows[k]["item_id"] for k in rows} == again
    # flows into the multimodal metadata operator unchanged
    from airflow_dags_spark.operators.multimodal import attach_payload_metadata

    meta = attach_payload_metadata(got.drop("source_path"))
    assert meta.count() == 2


def test_binary_base64_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, bytearray(b"payload-bytes"))], "id bigint, payload binary"
    )
    p = str(tmp_path / "j")
    write_table(binary_to_json_safe(df, "payload"), p, "json")
    back = json_safe_to_binary(
        read_table_fmt(
            spark, p, "json",
            schema=T.StructType([
                T.StructField("id", T.LongType()),
                T.StructField("payload", T.StringType()),
            ]),
        ),
        "payload",
    )
    assert bytes(back.collect()[0]["payload"]) == b"payload-bytes"

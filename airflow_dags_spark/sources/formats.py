"""Multi-format table IO: one read/write surface over parquet, ORC, CSV,
JSON, XML (Spark 4 built-in), and the binaryFile source for raw payloads.

The reference's source surface is CSV-over-HTTP + Postgres
(dags/monthly_price_paid_data.py:158-160 CSV parse,
dags/pull_new_sales_list.py REST JSON); a lake engine additionally meets
columnar interchange (ORC from Hive/Trino estates), line-JSON landing
zones, XML feeds, and opaque media files. This module is the single place
that encodes the FORMAT CONTRACTS — what survives a round trip and what
does not — so jobs never re-discover them:

- parquet/ORC: full fidelity (types, nested, nulls). Both columnar +
  predicate-pushdown-capable; parquet is the engine's native format, ORC
  exists for interop with ORC-resident estates.
- CSV: strings + scalars only; arrays/structs/binary REJECTED up front
  (Spark would otherwise throw mid-job); schema must be re-imposed on
  read (`infer=False` default — inference is a scan and a correctness
  hazard; the reference's headerless-CSV handling, SURVEY §2.1 S3).
- JSON (line-delimited): nested types survive; binary does not (base64
  helper provided); timestamps round-trip via ISO strings.
- XML: row-per-element with attribute/element mapping; used for feed
  interop, not as a table format.
- binaryFile: READ-ONLY source (path, modificationTime, length, content)
  for ingesting media/blob directories into multimodal tables
  (operators/multimodal.py expects exactly this shape).

Avro is Spark-external (org.apache.spark:spark-avro artifact, not on this
container's classpath) — `write_table`/`read_table_fmt` raise a clear
error naming the package instead of Spark's opaque ClassNotFound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SUPPORTED = ("parquet", "orc", "csv", "json", "xml")

_CSV_OK = (
    T.StringType, T.IntegerType, T.LongType, T.ShortType, T.ByteType,
    T.DoubleType, T.FloatType, T.BooleanType, T.DateType, T.TimestampType,
    T.TimestampNTZType, T.DecimalType,
)


def _check_format(fmt: str) -> None:
    if fmt == "avro":
        raise ValueError(
            "avro needs the external spark-avro package "
            "(org.apache.spark:spark-avro_2.13) on the classpath; "
            "not present in this environment"
        )
    if fmt not in SUPPORTED:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED}")


def write_table(df: DataFrame, path: str, fmt: str = "parquet", **options) -> None:
    """Write ``df`` as ``fmt``; rejects lossy format/type combinations
    up front (CSV × complex types) instead of failing mid-job."""
    _check_format(fmt)
    if fmt == "csv":
        bad = [
            f.name
            for f in df.schema.fields
            if not isinstance(f.dataType, _CSV_OK)
        ]
        if bad:
            raise ValueError(
                f"CSV cannot carry complex/binary columns {bad}; "
                "serialize them first (to_json / base64)"
            )
        options.setdefault("header", True)
    if fmt == "xml":
        options.setdefault("rowTag", "row")
    df.write.format(fmt).mode("overwrite").options(**options).save(path)


def read_table_fmt(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    infer: bool = False,
    **options,
) -> DataFrame:
    """Read a ``fmt`` table. For text formats a ``schema`` is expected —
    inference costs a full extra pass and silently mistypes columns
    (empty-string vs null, int-looking codes); pass ``infer=True`` to
    explicitly accept that for exploration."""
    _check_format(fmt)
    reader = spark.read.format(fmt)
    if fmt == "csv":
        options.setdefault("header", True)
    if fmt == "xml":
        options.setdefault("rowTag", "row")
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json", "xml"):
        if not infer:
            raise ValueError(
                f"{fmt} read without a schema: pass schema=... "
                "or infer=True to accept a full inference pass"
            )
        reader = reader.option("inferSchema", True)
    return reader.options(**options).load(path)


def read_binary_dir(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    modality: str = "blob",
) -> DataFrame:
    """Ingest a directory of opaque files into the multimodal table shape
    (item_id, modality, payload, mime, n_bytes) via Spark's binaryFile
    source. The scan ships file CONTENT through the executor — at 100 TB
    partition count follows file count; set
    spark.sql.files.maxPartitionBytes to bound per-task memory, and filter
    on path/length BEFORE touching content (pushdown works on metadata
    columns). item_id is a deterministic hash of the path (stable across
    re-listing orders)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    mime = (
        F.when(ext.isin("jpg", "jpeg"), "image/jpeg")
        .when(ext == "png", "image/png")
        .when(ext == "wav", "audio/wav")
        .when(ext == "mp4", "video/mp4")
        .otherwise(F.concat(F.lit("application/"), ext))
    )
    return files.select(
        F.xxhash64("path").alias("item_id"),
        F.lit(modality).alias("modality"),
        F.col("content").alias("payload"),
        mime.alias("mime"),
        F.col("length").alias("n_bytes"),
        F.col("path").alias("source_path"),
    )


def binary_to_json_safe(df: DataFrame, col: str) -> DataFrame:
    """Base64-wrap a binary column so the frame can land in JSON/CSV."""
    return df.withColumn(col, F.base64(F.col(col)))


def json_safe_to_binary(df: DataFrame, col: str) -> DataFrame:
    return df.withColumn(col, F.unbase64(F.col(col)))

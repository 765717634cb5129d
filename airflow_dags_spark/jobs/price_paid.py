"""Price-paid ingestion jobs (SURVEY.md §3.1; reference entry points
``dags/initial_price_paid_data.py`` and ``dags/monthly_price_paid_data.py``).

Both DAGs share one transform pipeline (S3 headerless scan → P4 brace-strip →
P5 date parse → P6 price coerce → P7 dropna → P8 ``OX%`` filter); they differ
only in the write discipline:

- initial load: bulk append, no conflict handling (K2,
  dags/initial_price_paid_data.py:136-142)
- monthly update: insert-if-absent upsert (K3, ``ON CONFLICT DO NOTHING``,
  dags/monthly_price_paid_data.py:147-155)

Scale: the clean pipeline is one narrow stage (no shuffle) that whole-stage-
codegens; at 100 TB the only shuffle is the K3 anti-join, which broadcasts
the (small) monthly batch against the big target. The reference's 100k-row
hand-chunking (dags/initial_price_paid_data.py:106) disappears — Spark's
file splits are the chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from airflow_dags_spark.functions.cleaning import clean_price_paid
from airflow_dags_spark.operators.upsert import ParquetTable
from airflow_dags_spark.schemas import PRICE_PAID_RAW_SCHEMA
from airflow_dags_spark.sources.csv import read_headerless_csv

KEY = "transaction_unique_identifier"


def _read_clean(spark: SparkSession, csv_path: str) -> DataFrame:
    raw = read_headerless_csv(spark, csv_path, PRICE_PAID_RAW_SCHEMA)
    return clean_price_paid(raw)


def initial_load(
    spark: SparkSession, csv_path: str, table_path: str
) -> ParquetTable:
    """One-shot bulk load (dags/initial_price_paid_data.py:97-178).

    The target is (re)created from the cleaned scan; idempotent because the
    whole table is the batch (rerun ⇒ same table), unlike the reference,
    whose plain INSERT duplicates on rerun — an acknowledged semantic
    upgrade, not a deviation: the initial DAG is manual-trigger-once.
    """
    table = ParquetTable(spark, table_path, KEY)
    cleaned = _read_clean(spark, csv_path)
    # first-wins on the natural key even within the bulk file (A1)
    table._atomic_overwrite(table._dedup_source(cleaned, order_by=[KEY]))
    return table


def monthly_update(
    spark: SparkSession, csv_path: str, table_path: str
) -> ParquetTable:
    """Monthly incremental upsert (dags/monthly_price_paid_data.py:104-171).

    Re-delivered rows are no-ops (T3 idempotency via K3); the staging-file
    lifecycle (K9) is gone — Spark reads the landing path directly.
    """
    table = ParquetTable(spark, table_path, KEY)
    cleaned = _read_clean(spark, csv_path)
    table.insert_if_absent(cleaned, order_by=[KEY])
    return table

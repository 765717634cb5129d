"""Multi-row operators: upsert/merge library, dedup family, similarity search."""

from airflow_dags_spark.operators.upsert import (
    ParquetTable,
    insert_if_absent,
    merge_upsert,
    advance_watermark,
)

__all__ = ["ParquetTable", "insert_if_absent", "merge_upsert", "advance_watermark"]

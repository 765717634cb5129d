"""Job layer — one Spark job per reference DAG (SURVEY.md §7 Phase 4).

Airflow stays the orchestrator (cron, retries, failure callbacks); each
module here is the ``spark-submit`` payload that replaces the corresponding
DAG's Python-task compute:

- jobs.price_paid   ← dags/initial_price_paid_data.py + monthly_price_paid_data.py
- jobs.outcodes     ← dags/rightmove_outcodes.py
- jobs.sales        ← dags/pull_new_sales_list.py
- jobs.json_to_csv  ← plugins/file_transformer_plugin.py (U1, real impl)

HTTP is injected (sources.http) so every job is testable offline.
"""

from airflow_dags_spark.jobs.json_to_csv import json_to_csv
from airflow_dags_spark.jobs.outcodes import enrich_outcodes
from airflow_dags_spark.jobs.price_paid import initial_load, monthly_update
from airflow_dags_spark.jobs.sales import pull_new_sales

__all__ = [
    "json_to_csv",
    "enrich_outcodes",
    "initial_load",
    "monthly_update",
    "pull_new_sales",
]

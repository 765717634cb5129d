"""Monthly price-paid incremental load — orchestration wrapper.

Replaces /root/reference/dags/monthly_price_paid_data.py: same cron
(0 2 25 * *), retries (1, 5 min), failure webhook; the download stays an
Airflow task (it's I/O to a landing path), and the parse→clean→upsert
pipeline collapses into ONE Spark job (SURVEY.md §3.1 "engine version") —
table DDL, staging-file lifecycle, and 10k-row batching all disappear into
``jobs.price_paid.monthly_update``.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

try:  # Airflow present only on the scheduler host, never an engine dep
    from airflow import DAG
    from airflow.operators.bash import BashOperator
    from airflow.operators.python import PythonOperator
except ImportError:  # pragma: no cover - engine containers have no Airflow
    DAG = None

CSV_URL = (
    "http://prod.publicdata.landregistry.gov.uk.s3-website-eu-west-1."
    "amazonaws.com/pp-monthly-update-new-version.csv"
)
LANDING = os.environ.get("PP_LANDING_DIR", "/data/landing/price_paid_monthly")
TABLE = os.environ.get("PP_TABLE_PATH", "/data/tables/price_paid")


def _download(**_):
    import urllib.request

    os.makedirs(LANDING, exist_ok=True)
    urllib.request.urlretrieve(CSV_URL, os.path.join(LANDING, "update.csv"))


def _notify_success(**_):
    # reference posts to Discord (monthly_price_paid_data.py:34-39,174-175);
    # URL comes from ENGINE_WEBHOOK_URL in a real deployment
    from airflow_dags_spark.jobs.notify import notify_success

    notify_success("Oxford Price Paid Data (Monthly Update)")


def _on_failure(context):
    from airflow_dags_spark.jobs.notify import on_failure_callback

    on_failure_callback(context)


if DAG is not None:
    with DAG(
        dag_id="monthly_price_paid_data_spark",
        schedule="0 2 25 * *",
        start_date=datetime(2025, 1, 1),
        catchup=False,
        default_args={
            "retries": 1,
            "retry_delay": timedelta(minutes=5),
            "on_failure_callback": _on_failure,
        },
    ) as dag:
        download = PythonOperator(task_id="download_csv", python_callable=_download)
        load = BashOperator(
            task_id="spark_monthly_update",
            bash_command=(
                "spark-submit --deploy-mode cluster "
                "$ENGINE_HOME/airflow_dags_spark/jobs/cli.py "
                f"monthly-update {LANDING}/update.csv {TABLE}"
            ),
        )
        notify = PythonOperator(
            task_id="send_success_notification", python_callable=_notify_success
        )
        download >> load >> notify

"""One-shot bulk price-paid load — orchestration wrapper.

Replaces /root/reference/dags/initial_price_paid_data.py (manual trigger,
schedule=None): the hand-rolled 100k-row HTTP streaming loop becomes a plain
download-to-landing task + ONE Spark job whose file splits are the
micro-batches (SURVEY.md §3.1, sources/csv.py docstring).
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

try:
    from airflow import DAG
    from airflow.operators.bash import BashOperator
    from airflow.operators.python import PythonOperator
except ImportError:  # pragma: no cover
    DAG = None

CSV_URL = (
    "http://prod.publicdata.landregistry.gov.uk.s3-website-eu-west-1."
    "amazonaws.com/pp-complete.csv"
)
LANDING = os.environ.get("PP_LANDING_DIR", "/data/landing/price_paid_bulk")
TABLE = os.environ.get("PP_TABLE_PATH", "/data/tables/price_paid")


def _download(**_):
    import urllib.request

    os.makedirs(LANDING, exist_ok=True)
    urllib.request.urlretrieve(CSV_URL, os.path.join(LANDING, "pp-complete.csv"))


def _notify_success(**_):
    # reference: initial_price_paid_data.py:183 success webhook
    from airflow_dags_spark.jobs.notify import notify_success

    notify_success("Initial Price Paid Data")


def _on_failure(context):
    # reference: initial_price_paid_data.py:37-40,189,195
    from airflow_dags_spark.jobs.notify import on_failure_callback

    on_failure_callback(context)


if DAG is not None:
    with DAG(
        dag_id="initial_price_paid_data_spark",
        schedule=None,  # manual one-shot, like the reference
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
            task_id="spark_initial_load",
            bash_command=(
                "spark-submit --deploy-mode cluster "
                "$ENGINE_HOME/airflow_dags_spark/jobs/cli.py "
                f"initial-load {LANDING}/pp-complete.csv {TABLE}"
            ),
        )
        notify = PythonOperator(
            task_id="send_success_notification", python_callable=_notify_success
        )
        download >> load >> notify

"""Daily sales scrape — orchestration wrapper.

Replaces /root/reference/dags/pull_new_sales_list.py: cron 0 2 * * *, 5
stale areas per run; pagination, dedup, merge, and watermark advance all
live in the Spark job (jobs/sales.py; SURVEY.md §3.2).
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

try:
    from airflow import DAG
    from airflow.operators.bash import BashOperator
except ImportError:  # pragma: no cover
    DAG = None

AREAS = os.environ.get("AREAS_TABLE_PATH", "/data/tables/rightmove_areas")
SALES = os.environ.get("SALES_TABLE_PATH", "/data/tables/sales_properties")


def _on_failure(context):
    # reference: pull_new_sales_list.py:33-40,300,306 failure webhook
    from airflow_dags_spark.jobs.notify import on_failure_callback

    on_failure_callback(context)


if DAG is not None:
    with DAG(
        dag_id="pull_new_sales_list_spark",
        schedule="0 2 * * *",
        start_date=datetime(2025, 1, 1),
        catchup=False,
        default_args={
            "retries": 1,
            "retry_delay": timedelta(minutes=5),
            "on_failure_callback": _on_failure,
        },
    ) as dag:
        BashOperator(
            task_id="spark_pull_sales",
            bash_command=(
                "spark-submit --deploy-mode cluster "
                "$ENGINE_HOME/airflow_dags_spark/jobs/cli.py "
                f"pull-sales {AREAS} {SALES} --batch-areas 5"
            ),
        )

"""Weekly outcode enrichment — orchestration wrapper.

Replaces /root/reference/dags/rightmove_outcodes.py: cron 0 2 * * 0, 50
outcodes per run; the per-key API loop with flush-every-200 batching becomes
ONE Spark job (jobs/outcodes.py) whose partition count caps request
concurrency (SURVEY.md §3.3).
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


def _on_failure(context):
    # reference: rightmove_outcodes.py:22-29,152,158 failure webhook
    from airflow_dags_spark.jobs.notify import on_failure_callback

    on_failure_callback(context)


if DAG is not None:
    with DAG(
        dag_id="process_rightmove_outcodes_spark",
        schedule="0 2 * * 0",
        start_date=datetime(2025, 1, 1),
        catchup=False,
        default_args={
            "retries": 1,
            "retry_delay": timedelta(minutes=5),
            "on_failure_callback": _on_failure,
        },
    ) as dag:
        BashOperator(
            task_id="spark_enrich_outcodes",
            bash_command=(
                "spark-submit --deploy-mode cluster "
                "$ENGINE_HOME/airflow_dags_spark/jobs/cli.py "
                f"enrich-outcodes {AREAS} --batch-size 50"
            ),
        )

"""Named query plans — the driver-verified correctness surface."""

from airflow_dags_spark.plans.registry import QUERIES, ORACLES, register

__all__ = ["QUERIES", "ORACLES", "register"]

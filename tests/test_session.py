"""tune_session contract: safe on sessions the engine doesn't own."""

from __future__ import annotations

from airflow_dags_spark.session import ENGINE_CONFS, tune_session


def test_tune_session_applies_engine_confs(spark):
    tune_session(spark)
    for key in ("spark.sql.adaptive.enabled", "spark.sql.session.timeZone"):
        assert spark.conf.get(key) == ENGINE_CONFS[key]


def test_tune_session_respects_explicit_shuffle_partitions(spark):
    """A caller-chosen (non-default) shuffle size is never overridden."""
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        tune_session(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")


def test_tune_session_resizes_static_default(spark):
    """Spark's static 200 default is replaced by the session's parallelism."""
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    try:
        tune_session(spark)
        got = int(spark.conf.get("spark.sql.shuffle.partitions"))
        assert got == max(spark.sparkContext.defaultParallelism, 8)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")

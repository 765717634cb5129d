"""The main correctness gate, run locally: every registered query with an
oracle must match DuckDB exactly at the test scale factor (the driver runs
the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from airflow_dags_spark.plans import registry

from tests.oracle_utils import compare, duckdb_conn

registry.load_all()

ORACLE_QUERIES = sorted(registry.ORACLES.keys())
ROWS_ONLY_QUERIES = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_conn(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, duck, name):
    spark_df = registry.QUERIES[name](spark, sf_dir)
    oracle_pdf = duck.execute(registry.ORACLES[name]).fetchdf()
    problems = compare(spark_df, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0

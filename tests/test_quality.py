"""Data-quality expectations (functions/quality.py): constraint semantics
on deliberately dirty data, null-counts-as-failure rule, one-pass plan."""

from __future__ import annotations

import pytest

from airflow_dags_spark.functions.quality import Expectations


@pytest.fixture()
def dirty(spark):
    rows = [
        (1, "a", 10.0),
        (2, "b", -5.0),
        (2, None, 3.0),  # dup id, null cat
        (4, "zz", None),  # out-of-set cat, null value
    ]
    return spark.createDataFrame(rows, "id bigint, cat string, v double")


def _report(df):
    return {r["constraint"]: (r["observed"], r["passed"]) for r in df.collect()}


def test_constraints_fail_on_dirty_data(spark, dirty):
    rep = _report(
        Expectations()
        .expect_complete("cat")
        .expect_unique("id")
        .expect_min("v", 0.0)
        .expect_in_set("cat", ["a", "b"])
        .expect_row_count(10)
        .run(dirty)
    )
    assert rep["complete(cat)"] == (0.75, False)
    assert rep["unique(id)"] == (0.75, False)
    assert rep["min(v)>=0.0"] == (-5.0, False)
    # null cat AND 'zz' both fail membership: 2/4 pass
    assert rep["in_set(cat,[a,b])"] == (0.5, False)
    assert rep["row_count"] == (4.0, False)


def test_constraints_pass_on_clean_data(spark):
    clean = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id bigint, cat string, v double"
    )
    rep = _report(
        Expectations()
        .expect_complete("id")
        .expect_unique("id")
        .expect_between("v", 0.0, 10.0)
        .expect_regex("cat", "^[ab]$")
        .expect_max("v", 2.0)
        .expect_row_count(2)
        .run(clean)
    )
    assert all(passed for _, passed in rep.values()), rep


def test_null_predicate_counts_as_failure(spark):
    """avg() skips nulls; the builder must not — a fully-null column would
    otherwise report a clean 1.0 fraction."""
    df = spark.createDataFrame([(None,), (None,)], "v double")
    rep = _report(Expectations().expect_between("v", 0.0, 1.0).run(df))
    assert rep["between(v,0.0,1.0)"] == (0.0, False)


def test_approx_unique_tolerance(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "id bigint")
    rep = _report(Expectations().expect_unique("id", approx=True).run(df))
    (obs, passed) = rep["unique(id)~"]
    assert passed  # HLL within its rsd on a fully-unique column
    assert 0.95 <= obs <= 1.05


def test_duplicate_and_empty_raise(spark, dirty):
    with pytest.raises(ValueError, match="duplicate"):
        Expectations().expect_complete("id").expect_complete("id")
    with pytest.raises(ValueError, match="no expectations"):
        Expectations().run(dirty)


def test_one_pass_plan_single_exchange(spark, dirty):
    """N constraints, one job: the plan has exactly one aggregation exchange
    (the distinct-count expand included) and no join."""
    df = (
        Expectations()
        .expect_complete("cat")
        .expect_min("v", 0.0)
        .expect_between("v", 0.0, 10.0)
        .expect_regex("cat", "a")
        .expect_row_count(1)
        .run(dirty)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1, plan
    for j in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert j not in plan

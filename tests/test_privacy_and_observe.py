"""k-anonymity (functions/privacy.py), Observation helper, and the
cogrouped as-of join (operators/temporal.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_dags_spark.functions.privacy import k_anonymize


@pytest.fixture()
def people(spark):
    rows = [
        # (zip, age, value): 3 people share (SW1, 20s); singletons elsewhere
        ("SW1A", 23, 1.0),
        ("SW1B", 27, 2.0),
        ("SW1C", 21, 3.0),
        ("N1 7", 44, 4.0),
        ("E2 8", 35, 5.0),
    ]
    return spark.createDataFrame(rows, "zip string, age int, v double")


def _gen():
    return {
        "zip": F.substring("zip", 1, 2),
        "age": (F.floor(F.col("age") / 10) * 10).cast("int"),
    }


def test_k_anonymize_suppress(spark, people):
    out = k_anonymize(people, ["zip", "age"], 3, generalize=_gen()).collect()
    # only the (SW, 20) group has >= 3 members
    assert len(out) == 3
    assert {(r["zip"], r["age"]) for r in out} == {("SW", 20)}
    assert sorted(r["v"] for r in out) == [1.0, 2.0, 3.0]  # payload intact


def test_k_anonymize_null_out_keeps_rows(spark, people):
    out = k_anonymize(
        people, ["zip", "age"], 3, generalize=_gen(), mode="null_out"
    ).collect()
    assert len(out) == 5
    nulled = [r for r in out if r["zip"] is None]
    assert len(nulled) == 2 and all(r["age"] is None for r in nulled)
    assert sorted(r["v"] for r in nulled) == [4.0, 5.0]


def test_k_anonymize_null_quasi_group_together(spark):
    df = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), ("x", 3.0)], "q string, v double"
    )
    out = k_anonymize(df, ["q"], 2).collect()
    # the two NULL-quasi rows form one group of 2 and survive; 'x' suppressed
    assert sorted(r["v"] for r in out) == [1.0, 2.0]


def test_k_anonymize_guards(spark, people):
    with pytest.raises(ValueError, match="k must be"):
        k_anonymize(people, ["zip"], 0)
    with pytest.raises(ValueError, match="mode must be"):
        k_anonymize(people, ["zip"], 2, mode="redact")


def test_with_observation_collects_during_action(spark):
    from airflow_dags_spark.functions.metrics import with_observation

    df = spark.createDataFrame([(1, None), (2, "b"), (3, "c")], "id bigint, v string")
    df2, obs = with_observation(
        df, "load",
        n=F.count(F.lit(1)),
        nulls=F.sum(F.col("v").isNull().cast("int")),
    )
    assert df2.count() == 3  # the action that computes the metrics
    assert obs.get == {"n": 3, "nulls": 1}
    with pytest.raises(ValueError, match="at least one"):
        with_observation(df, "empty")


def test_asof_join_cogrouped_matches_declarative(spark):
    """The cogroup escape hatch must agree with the union-window asof_join
    on SQL-expressible semantics — the validation pattern for any custom
    cogrouped operator."""
    from airflow_dags_spark.operators.temporal import asof_join, asof_join_cogrouped
    from airflow_dags_spark.sources.tables import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    left = ev.select("user_id", "ts", "event_id").limit(2000)
    right = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", "ts", F.col("value").alias("purchase_value"))
    )
    a = asof_join(left, right, "user_id", "ts", ["purchase_value"]).collect()
    b = asof_join_cogrouped(left, right, "user_id", "ts", ["purchase_value"]).collect()
    key = lambda r: (r["user_id"], r["ts"], r["event_id"])
    av = {key(r): r["purchase_value_asof"] for r in a}
    bv = {key(r): r["purchase_value_asof"] for r in b}
    assert av == bv and len(av) == left.count()
    assert any(v is not None for v in av.values())  # matches actually occur

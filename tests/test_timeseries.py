"""EWMA operators (functions/timeseries.py + plans/temporal.py fold form):
the applyInPandas per-row form must match a pandas reference and agree with
the oracle-checked fold on final values."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from airflow_dags_spark.functions.timeseries import ewma_per_row

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_ewma_per_row_matches_pandas_reference(spark):
    ev = _events(spark)
    got = (
        ewma_per_row(ev, "user_id", ["ts", "event_id"], "value", 0.3)
        .select("user_id", "event_id", "ewma")
        .collect()
    )
    got_map = {(r["user_id"], r["event_id"]): r["ewma"] for r in got}

    pdf = ev.select("user_id", "event_id", "ts", "value").toPandas()
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        ref = g["value"].ewm(alpha=0.3, adjust=False, ignore_na=True).mean()
        for eid, want, v in zip(g["event_id"], ref, g["value"]):
            if pd.isna(v):
                assert got_map[(uid, eid)] is None
            else:
                assert math.isclose(got_map[(uid, eid)], want, rel_tol=1e-9)


def test_ewma_per_row_partitioning_independent(spark):
    ev = _events(spark)
    a = ewma_per_row(ev, "user_id", ["ts", "event_id"], "value", 0.5)
    b = ewma_per_row(
        ev.repartition(17), "user_id", ["ts", "event_id"], "value", 0.5
    )
    ra = sorted((r["event_id"], r["ewma"]) for r in a.collect())
    rb = sorted((r["event_id"], r["ewma"]) for r in b.collect())
    assert ra == rb


def test_ewma_final_row_equals_fold_query(spark):
    """Last per-key row of the per-row form == the fold query's final EWMA."""
    from airflow_dags_spark.plans import registry

    registry.load_all()
    fold = {
        r["user_id"]: r["ewma_value"]
        for r in registry.QUERIES["timeseries_ewma_final"](spark, SF_DIR).collect()
    }
    ev = _events(spark).where(F.col("value").isNotNull())
    per_row = ewma_per_row(ev, "user_id", ["ts", "event_id"], "value", 0.3)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    last = (
        per_row.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("user_id", "ewma")
        .collect()
    )
    assert len(last) == len(fold)
    for r in last:
        assert math.isclose(round(r["ewma"], 6), fold[r["user_id"]], abs_tol=1e-6)


def test_ewma_null_values_keep_state(spark):
    rows = [
        (1, 1, 10.0),
        (1, 2, None),
        (1, 3, 20.0),
    ]
    df = spark.createDataFrame(rows, "k bigint, seq bigint, value double")
    out = {
        r["seq"]: r["ewma"]
        for r in ewma_per_row(df, "k", ["seq"], "value", 0.5).collect()
    }
    assert out[1] == 10.0
    assert out[2] is None  # null row labeled null...
    assert out[3] == 15.0  # ...but state survives: 0.5*20 + 0.5*10

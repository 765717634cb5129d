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


# --- LTTB downsampling --------------------------------------------------------


def _lttb_reference(x, y, n_out):
    """Straight-from-the-paper reference implementation (pure python)."""
    import numpy as np

    n = len(x)
    if n <= n_out:
        return list(range(n))
    bounds = np.linspace(1, n - 1, n_out - 1).astype(int)
    chosen = [0]
    a = 0
    for i in range(n_out - 2):
        lo, hi = bounds[i], bounds[i + 1]
        nlo = hi
        nhi = bounds[i + 2] if i + 2 < len(bounds) else n
        avg_x = x[nlo:nhi].mean() if nhi > nlo else x[-1]
        avg_y = y[nlo:nhi].mean() if nhi > nlo else y[-1]
        best, best_area = lo, -1.0
        for c in range(lo, hi):
            area = abs(
                (x[a] - avg_x) * (y[c] - y[a]) - (x[a] - x[c]) * (avg_y - y[a])
            )
            if area > best_area:
                best, best_area = c, area
        a = best
        chosen.append(a)
    chosen.append(n - 1)
    return chosen


def test_lttb_matches_reference_per_key(spark):
    import numpy as np

    from airflow_dags_spark.functions.timeseries import lttb_downsample

    ev = _events(spark).where(F.col("value").isNotNull())
    got = lttb_downsample(ev, 40).collect()
    by_key = {}
    for r in got:
        by_key.setdefault(r["user_id"], []).append(r)

    pdf = ev.select("user_id", "ts", "value").toPandas()
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values("ts", kind="mergesort").reset_index(drop=True)
        x = g["ts"].astype("int64").to_numpy(dtype=np.float64)
        y = g["value"].to_numpy(dtype=np.float64)
        idx = _lttb_reference(x, y, 40)
        want = [(g["ts"][i], g["value"][i]) for i in idx]
        rows = sorted(by_key[uid], key=lambda r: r["pt_index"])
        assert len(rows) == len(want), uid
        for r, (wts, wv) in zip(rows, want):
            assert r["ts"] == wts and r["value"] == wv, uid


def test_lttb_keeps_anchors_and_bounds(spark):
    from airflow_dags_spark.functions.timeseries import lttb_downsample

    ev = _events(spark).where(F.col("value").isNotNull())
    got = lttb_downsample(ev, 25).collect()
    by_key = {}
    for r in got:
        by_key.setdefault(r["user_id"], []).append(r)
    firsts_lasts = {
        r["user_id"]: (r["first_ts"], r["last_ts"], r["n"])
        for r in ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for uid, rows in by_key.items():
        rows = sorted(rows, key=lambda r: r["pt_index"])
        first_ts, last_ts, n = firsts_lasts[uid]
        assert len(rows) == min(25, n)
        assert rows[0]["ts"] == first_ts  # anchor invariant
        assert rows[-1]["ts"] == last_ts
        ts_seq = [r["ts"] for r in rows]
        assert ts_seq == sorted(ts_seq)  # monotone output


def test_lttb_partitioning_invariant(spark):
    from airflow_dags_spark.functions.timeseries import lttb_downsample

    ev = _events(spark).where(F.col("value").isNotNull())
    a = sorted(map(tuple, lttb_downsample(ev, 30).collect()))
    b = sorted(map(tuple, lttb_downsample(ev.repartition(17), 30).collect()))
    assert a == b


def test_lttb_short_series_passthrough(spark):
    from airflow_dags_spark.functions.timeseries import lttb_downsample

    df = spark.createDataFrame(
        [(1, i, float(i)) for i in range(5)], "user_id bigint, ts bigint, value double"
    )
    got = sorted(lttb_downsample(df, 50).collect(), key=lambda r: r["pt_index"])
    assert [(r["ts"], r["value"]) for r in got] == [(i, float(i)) for i in range(5)]

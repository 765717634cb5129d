"""Edge semantics of the temporal join operators (operators/temporal.py);
the sf-scale oracle checks live in test_oracle_parity via plans/temporal.py."""

from __future__ import annotations

from datetime import datetime

from airflow_dags_spark.operators.temporal import asof_join, range_join


def ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_edges(spark):
    left = spark.createDataFrame(
        [
            (1, ts("2026-01-01 10:00:00"), "L1"),
            (1, ts("2026-01-01 12:00:00"), "L2"),
            (2, ts("2026-01-01 10:00:00"), "L3"),  # key with no right rows
            (1, ts("2026-01-01 09:00:00"), "L0"),  # before any right row
        ],
        "k bigint, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2026-01-01 10:00:00"), 100.0),  # equal ts: <= must match
            (1, ts("2026-01-01 11:30:00"), 200.0),
        ],
        "k bigint, ts timestamp, v double",
    )
    got = {
        r["tag"]: r["v_asof"]
        for r in asof_join(left, right, key="k", ts="ts", value_cols=["v"]).collect()
    }
    assert got == {
        "L0": None,     # nothing at-or-before
        "L1": 100.0,    # equal timestamp matches (<=, not <)
        "L2": 200.0,    # latest wins, not first
        "L3": None,     # key absent on right
    }


def test_range_join_boundaries_and_buckets(spark):
    points = spark.createDataFrame(
        [
            (1, ts("2026-01-01 10:00:00"), "start-edge"),
            (1, ts("2026-01-01 12:00:00"), "end-edge"),
            (1, ts("2026-01-01 12:00:01"), "just-after"),
            (1, ts("2026-01-01 09:59:59"), "just-before"),
            (2, ts("2026-01-01 11:00:00"), "other-key"),
        ],
        "k bigint, ts timestamp, tag string",
    )
    intervals = spark.createDataFrame(
        [(1, "I1", ts("2026-01-01 10:00:00"), ts("2026-01-01 12:00:00"))],
        "k bigint, iid string, start_ts timestamp, end_ts timestamp",
    )
    # bucket width much smaller than the interval: correctness must not
    # depend on it (interval explodes over many buckets)
    for bucket_seconds in (60, 3600, 7 * 24 * 3600):
        got = {
            r["tag"]
            for r in range_join(
                points, intervals, key="k", ts="ts",
                start="start_ts", end="end_ts",
                bucket_seconds=bucket_seconds,
            ).collect()
        }
        assert got == {"start-edge", "end-edge"}, f"bucket={bucket_seconds}"


def test_range_join_multiple_overlapping_intervals(spark):
    points = spark.createDataFrame(
        [(1, ts("2026-01-01 10:30:00"), "P")],
        "k bigint, ts timestamp, tag string",
    )
    intervals = spark.createDataFrame(
        [
            (1, "A", ts("2026-01-01 10:00:00"), ts("2026-01-01 11:00:00")),
            (1, "B", ts("2026-01-01 10:15:00"), ts("2026-01-01 10:45:00")),
            (1, "C", ts("2026-01-01 11:00:00"), ts("2026-01-01 12:00:00")),
        ],
        "k bigint, iid string, start_ts timestamp, end_ts timestamp",
    )
    got = {
        r["iid"]
        for r in range_join(
            points, intervals, key="k", ts="ts", start="start_ts", end="end_ts"
        ).collect()
    }
    assert got == {"A", "B"}  # every containing interval, C excluded

"""Semantic invariants for plans/advanced.py beyond the DuckDB hash-match:
SCD2 version tiling, gap-fill spine completeness, histogram totals,
training-mix reproducibility, contamination self-consistency."""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import functions as F

from airflow_dags_spark.plans import registry

registry.load_all()

SF_DIR = "/root/testdata/sf0.001"


def test_scd2_versions_tile_each_users_timeline(spark):
    rows = registry.QUERIES["scd2_history"](spark, SF_DIR).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    first_ts = {
        r["user_id"]: r["lo"]
        for r in e.groupBy("user_id")
        .agg(F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("lo"))
        .collect()
    }
    for uid, versions in by_user.items():
        versions.sort(key=lambda r: r.valid_from)
        # exactly one open (current) version, and it is the last
        assert [v.is_current for v in versions].count(True) == 1
        assert versions[-1].is_current and versions[-1].valid_to is None
        # contiguous tiling: each valid_to == next valid_from
        for a, b in zip(versions, versions[1:]):
            assert a.valid_to == b.valid_from
        # history starts at the user's first event
        assert versions[0].valid_from == first_ts[uid]
        # consecutive versions always change state
        for a, b in zip(versions, versions[1:]):
            assert a.event_type != b.event_type


def test_gap_fill_spine_is_dense_and_counts_total(spark):
    rows = registry.QUERIES["timeseries_gap_fill"](spark, SF_DIR).collect()
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    totals = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    import datetime as dt

    for et, series in by_type.items():
        series.sort(key=lambda r: r.hour)
        # dense hourly spine: consecutive hours differ by exactly 1 h
        hours = [
            dt.datetime.strptime(r.hour, "%Y-%m-%d %H:%M:%S") for r in series
        ]
        assert all(
            b - a == timedelta(hours=1) for a, b in zip(hours, hours[1:])
        )
        # zero-filled counts still sum to the true event count
        assert sum(r.cnt for r in series) == totals[et]
        # LOCF: after the first observation, the filled average never nulls
        seen = False
        for r in series:
            if r.cnt > 0:
                seen = True
            if seen:
                assert r.avg_value_filled is not None


def test_histogram_buckets_cover_every_order(spark):
    rows = registry.QUERIES["numeric_histogram"](spark, SF_DIR).collect()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    assert sum(r.cnt for r in rows) == o.count()
    for r in rows:
        assert 0 <= r.bucket <= 25
        assert r.min_price <= r.max_price


def test_training_mix_is_reproducible_and_respects_rates(spark):
    q = registry.QUERIES["training_mix_sample"]
    a = {r.doc_id for r in q(spark, SF_DIR).collect()}
    b = {r.doc_id for r in q(spark, SF_DIR).collect()}
    assert a == b  # deterministic membership, not rand()
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    full = {
        r["source"]: r["n"]
        for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    kept = (
        q(spark, SF_DIR)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    for r in kept:
        rate = r["n"] / full[r["source"]]
        if r["source"] in ("src0", "src1"):
            assert rate == 1.0  # keep-all sources keep everything
        else:
            assert rate < 1.0  # downsampled sources actually shrink


def test_contamination_benchmark_docs_never_self_report(spark):
    rows = registry.QUERIES["benchmark_contamination"](spark, SF_DIR).collect()
    assert all(r.doc_id % 97 != 0 for r in rows)  # bench set excluded
    assert all(r.n_shared_shingles > 0 for r in rows)  # inner join: hits only


def test_fuzzy_self_join_matches_brute_force(spark):
    """Length-bucket pruning is lossless: pruned result == all-pairs result,
    including pairs whose lengths straddle a bucket boundary."""
    from airflow_dags_spark.operators.fuzzy import fuzzy_self_join

    rows = [
        (1, "abc"), (2, "abcd"),        # dist 1, lengths 3/4 straddle buckets
        (3, "abc"),                      # dist 0 duplicate of 1
        (4, "xyzzy"), (5, "xyzzy!"),     # dist 1
        (6, "completely different"),     # matches nothing
        (7, "ab"), (8, "abcde"),         # dist 3 from each other: excluded
    ]
    df = spark.createDataFrame(rows, "k bigint, name string")
    got = {
        (r.key_a, r.key_b, r.dist)
        for r in fuzzy_self_join(df, "name", "k", max_dist=2).collect()
    }
    import itertools

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
        return d[len(b)]

    want = {
        (ka, kb, lev(na, nb))
        for (ka, na), (kb, nb) in itertools.combinations(rows, 2)
        if lev(na, nb) <= 2
    }
    assert got == want

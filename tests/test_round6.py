"""Round-6 operators: ANOVA, correlation matrix, central moments,
classical decomposition, CCF, GROUPS-frame emulation, Holt smoothing —
each checked against an independent pure-Python/NumPy computation (the
DuckDB hash parity is covered by test_oracle_parity's registry sweep)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from airflow_dags_spark.plans import registry

registry.load_all()

SF_DIR = "/root/testdata/sf0.001"


# --- one-way ANOVA --------------------------------------------------------------


def test_anova_matches_numpy_reference(spark):
    rows = spark.sql(
        f"SELECT event_type, value FROM parquet.`{SF_DIR}/events.parquet` "
        "WHERE value IS NOT NULL"
    ).collect()
    groups = {}
    for r in rows:
        groups.setdefault(r.event_type, []).append(r.value)
    arrs = [np.array(v) for v in groups.values()]
    gm = np.concatenate(arrs).mean()
    ssb = sum(len(a) * (a.mean() - gm) ** 2 for a in arrs)
    ssw = sum(((a - a.mean()) ** 2).sum() for a in arrs)
    k, n = len(arrs), sum(len(a) for a in arrs)
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))

    got = registry.QUERIES["stats_anova_f"](spark, SF_DIR).first()
    assert got.k_groups == k and got.n_total == n
    assert got.ss_between == pytest.approx(ssb, abs=0.006)  # query rounds to 2 dp
    assert got.ss_within == pytest.approx(ssw, abs=0.006)
    assert got.f_stat == pytest.approx(f_ref, abs=1e-5)


# --- correlation matrix ---------------------------------------------------------


def test_corr_matrix_matches_numpy(spark):
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    names = ["quantity", "extendedprice", "discount", "tax"]
    pdf = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(*cols).toPandas()
    ref = np.corrcoef(pdf[cols].to_numpy().T)
    got = {
        (r.col_a, r.col_b): r.corr
        for r in registry.QUERIES["stats_corr_matrix"](spark, SF_DIR).collect()
    }
    assert len(got) == 6
    for i, a in enumerate(names):
        for j in range(i + 1, len(names)):
            assert got[(a, names[j])] == pytest.approx(ref[i, j], abs=2e-6)


# --- central moments ------------------------------------------------------------


def test_moments_family_matches_numpy(spark):
    pdf = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_returnflag", "l_extendedprice")
        .toPandas()
    )
    got = {
        r.flag: r for r in registry.QUERIES["agg_moments_family"](spark, SF_DIR).collect()
    }
    for flag, sub in pdf.groupby("l_returnflag"):
        x = sub["l_extendedprice"].to_numpy()
        d = x - x.mean()
        m2, m3, m4 = (d**2).mean(), (d**3).mean(), (d**4).mean()
        assert got[flag].n == len(x)
        assert got[flag].skewness_g1 == pytest.approx(m3 / m2**1.5, abs=2e-6)
        assert got[flag].kurtosis_excess == pytest.approx(m4 / m2**2 - 3, abs=2e-6)


# --- classical decomposition ----------------------------------------------------


def test_decompose_identity_and_centered_seasonal(spark):
    df = registry.QUERIES["timeseries_decompose_ma"](spark, SF_DIR)
    pdf = df.toPandas()
    # additive identity: y == trend + seasonal + resid (to rounding)
    recon = pdf["trend"] + pdf["seasonal"] + pdf["resid"]
    assert np.allclose(recon, pdf["y"], atol=0.02)
    # seasonal indices: one value per weekday, centered to ~0 mean
    per_wk = pdf.groupby("wk")["seasonal"].nunique()
    assert (per_wk == 1).all()
    assert abs(pdf.groupby("wk")["seasonal"].first().mean()) < 1e-3
    # full 7-row windows only: first/last 3 calendar rows dropped
    assert len(pdf) > 0


def test_decompose_trend_is_7day_centered_ma(spark):
    daily = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy(F.to_date("o_orderdate").alias("dt"))
        .agg(F.sum("o_totalprice").alias("y"))
        .toPandas()
        .sort_values("dt")
        .reset_index(drop=True)
    )
    got = registry.QUERIES["timeseries_decompose_ma"](spark, SF_DIR).toPandas()
    got_map = dict(zip(got["dt"], got["trend"]))
    y = daily["y"].to_numpy()
    for i in range(3, len(daily) - 3):
        dt = str(daily["dt"][i])
        assert got_map[dt] == pytest.approx(y[i - 3 : i + 4].mean(), abs=0.01)


# --- cross-correlation ----------------------------------------------------------


def test_ccf_lag_zero_matches_numpy_and_symmetry(spark):
    daily = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(F.to_date("ts").alias("dt"))
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("p"),
            F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0)).alias("s"),
        )
        .toPandas()
        .sort_values("dt")
        .reset_index(drop=True)
    )
    got = {r.lag: r for r in registry.QUERIES["stats_ccf_lags"](spark, SF_DIR).collect()}
    assert set(got) == set(range(-3, 4))
    p, s = daily["p"].to_numpy(float), daily["s"].to_numpy(float)
    r0 = np.corrcoef(p, s)[0, 1]
    assert got[0].r == pytest.approx(r0, abs=2e-6)
    assert got[0].n_pairs == len(daily)
    # lag +1: p(d) vs s(d+1) — shifted overlap
    r1 = np.corrcoef(p[:-1], s[1:])[0, 1]
    assert got[1].r == pytest.approx(r1, abs=2e-6)
    assert got[1].n_pairs == len(daily) - 1


# --- GROUPS-frame emulation -----------------------------------------------------


def test_groups_frame_peers_collapse_into_one_step(spark):
    """Three orders on day A, one on day B, one on day C: the GROUPS ±1
    frame from a day-B row covers ALL FIVE rows (whole peer groups), where
    a ROWS ±1 frame would cover three."""
    rows = [
        (1, 7, 10.0, "2024-01-01"),
        (2, 7, 20.0, "2024-01-01"),
        (3, 7, 30.0, "2024-01-01"),
        (4, 7, 40.0, "2024-01-02"),
        (5, 7, 50.0, "2024-01-03"),
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate string"
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "orders.parquet"))
        got = {
            r.o_orderkey: r
            for r in registry.QUERIES["window_groups_frame"](spark, d).collect()
        }
    # day-A rows: peers = A∪B = 4 rows, sum 100
    for k in (1, 2, 3):
        assert got[k].peer_cnt == 4 and got[k].peer_sum == 100.0
    # day-B row: peers = A∪B∪C = all 5, sum 150
    assert got[4].peer_cnt == 5 and got[4].peer_sum == 150.0
    # day-C row: peers = B∪C = 2 rows, sum 90
    assert got[5].peer_cnt == 2 and got[5].peer_sum == 90.0


# --- Holt linear smoothing ------------------------------------------------------


def _holt_reference(ys, alpha=0.5, beta=0.3):
    l, b = ys[0], 0.0
    for x in ys[1:]:
        nl = alpha * x + (1 - alpha) * (l + b)
        nb = beta * (nl - l) + (1 - beta) * b
        l, b = nl, nb
    return l, b


def test_holt_matches_python_recursion(spark):
    monthly = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.trunc(F.to_date("o_orderdate"), "month").alias("m"),
        )
        .agg(F.sum("o_totalprice").alias("y"))
        .toPandas()
    )
    got = {
        r.pri: r for r in registry.QUERIES["timeseries_holt_linear"](spark, SF_DIR).collect()
    }
    for pri, sub in monthly.groupby("pri"):
        ys = sub.sort_values("m")["y"].tolist()
        l, b = _holt_reference(ys)
        assert got[pri].n_months == len(ys)
        assert got[pri].level_final == pytest.approx(l, abs=1e-3)
        assert got[pri].trend_final == pytest.approx(b, abs=1e-3)
        assert got[pri].forecast_h3 == pytest.approx(l + 3 * b, abs=1e-2)


def test_holt_single_point_series(spark):
    df = spark.createDataFrame(
        [(1, 1, 42.0, "2024-01-15")],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_totalprice",
        "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate",
        "'1-URGENT' AS o_orderpriority",
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "orders.parquet"))
        got = registry.QUERIES["timeseries_holt_linear"](spark, d).first()
    assert got.n_months == 1
    assert got.level_final == 42.0 and got.trend_final == 0.0
    assert got.forecast_h3 == 42.0


# --- Theil-Sen ------------------------------------------------------------------


def test_theilsen_matches_numpy_pairwise_median(spark):
    monthly = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy(F.trunc(F.to_date("o_orderdate"), "month").alias("m"))
        .agg(F.sum("o_totalprice").alias("y"))
        .toPandas()
        .sort_values("m")
        .reset_index(drop=True)
    )
    y = monthly["y"].to_numpy()
    n = len(y)
    slopes = [
        (y[j] - y[i]) / (j - i) for i in range(n) for j in range(i + 1, n)
    ]
    got = registry.QUERIES["stats_theilsen_monthly"](spark, SF_DIR).first()
    assert got.n_months == n
    assert got.n_pairs == n * (n - 1) // 2
    assert got.theil_sen_slope == pytest.approx(np.median(slopes), abs=1e-3)


# --- Kendall tau-b --------------------------------------------------------------


def test_kendall_matches_quadratic_reference(spark):
    daily = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy(F.to_date("o_orderdate").alias("dt"))
        .agg(F.count(F.lit(1)).alias("c"), F.sum("o_totalprice").alias("rev"))
        .toPandas()
    )
    c, r = daily["c"].to_numpy(), daily["rev"].to_numpy()
    n = len(c)
    conc = disc = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = (c[j] - c[i]) * (r[j] - r[i])
            if s > 0:
                conc += 1
            elif s < 0:
                disc += 1
            elif c[i] == c[j] and r[i] != r[j]:
                tx += 1
            elif r[i] == r[j] and c[i] != c[j]:
                ty += 1
    got = registry.QUERIES["stats_kendall_tau_daily"](spark, SF_DIR).first()
    assert (got.concordant, got.discordant) == (conc, disc)
    assert (got.ties_x, got.ties_y) == (tx, ty)
    n0 = n * (n - 1) // 2
    tau = (conc - disc) / (np.sqrt(n0 - tx) * np.sqrt(n0 - ty))
    assert got.tau_b == pytest.approx(tau, abs=2e-6)


# --- temperature mix ------------------------------------------------------------


def test_temperature_mix_probs_and_quota_invariants(spark):
    rows = registry.QUERIES["training_temperature_mix"](spark, SF_DIR).collect()
    n = {r.lang: r.n_docs for r in rows}
    w = {k: v**0.7 for k, v in n.items()}
    tot = sum(w.values())
    for r in rows:
        assert r.prob == pytest.approx(w[r.lang] / tot, abs=2e-6)
        assert r.quota == int(w[r.lang] / tot * 200)
        assert r.picked == min(r.quota, r.n_docs)
    # temperature flattens: the largest lang's share drops vs proportional
    big = max(n, key=n.get)
    prop = n[big] / sum(n.values())
    got_prob = next(r.prob for r in rows if r.lang == big)
    assert got_prob < prop


def test_temperature_mix_selection_is_deterministic(spark):
    a = registry.QUERIES["training_temperature_mix"](spark, SF_DIR).collect()
    b = registry.QUERIES["training_temperature_mix"](spark, SF_DIR).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# --- grouped regression ---------------------------------------------------------


def test_regr_by_nation_matches_numpy_polyfit(spark):
    got = {r.nation: r for r in registry.QUERIES["regr_grouped_by_nation"](spark, SF_DIR).collect()}
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    nt = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    pdf = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(nt, c.c_nationkey == nt.n_nationkey)
        .groupBy(
            F.col("n_name"),
            ((F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate")).alias("mx"),
        )
        .agg(F.sum("o_totalprice").alias("y"))
        .toPandas()
    )
    for nat, sub in pdf.groupby("n_name"):
        x, y = sub["mx"].to_numpy(float), sub["y"].to_numpy(float)
        slope, intercept = np.polyfit(x, y, 1)
        assert got[nat].n_months == len(sub)
        assert got[nat].slope == pytest.approx(slope, abs=2e-3)
        assert got[nat].intercept == pytest.approx(intercept, abs=0.25)
        r2 = np.corrcoef(x, y)[0, 1] ** 2
        assert got[nat].r2 == pytest.approx(r2, abs=2e-6)


# --- Adamic-Adar ----------------------------------------------------------------


def test_adamic_adar_matches_python_reference(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
        .collect()
    )
    adj = {}
    for r in edges:
        adj.setdefault(r.o_custkey, set()).add(r.l_partkey)
    import hashlib
    import itertools
    import math
    from collections import defaultdict

    from airflow_dags_spark.plans.round6 import ADAMIC_ADAR_BASKET_CAP

    def capped(cust, parts):
        # mirror the query's md5-deterministic per-customer basket cap
        return sorted(
            parts,
            key=lambda p: (
                hashlib.md5(f"aa|{cust}|{p}".encode()).hexdigest(),
                p,
            ),
        )[:ADAMIC_ADAR_BASKET_CAP]

    aa = defaultdict(float)
    common = defaultdict(int)
    for cust, parts in adj.items():
        kept = capped(cust, parts)
        if len(kept) < 2:
            continue
        wgt = 1.0 / math.log(len(kept))
        for p1, p2 in itertools.combinations(sorted(kept), 2):
            aa[(p1, p2)] += wgt
            common[(p1, p2)] += 1
    ref = sorted(
        ((round(v, 6), k) for k, v in aa.items() if common[k] >= 2),
        key=lambda t: (-t[0], t[1]),
    )[:50]
    got = registry.QUERIES["graph_adamic_adar"](spark, SF_DIR).collect()
    assert len(got) == len(ref)
    for row, (score, (p1, p2)) in zip(got, ref):
        assert (row.p1, row.p2) == (p1, p2)
        assert row.adamic_adar == pytest.approx(score, abs=2e-6)
        assert row.common_neighbors == common[(p1, p2)]


# --- clamped running fold -------------------------------------------------------


def test_clamped_fold_matches_python_and_floors_at_zero(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    pdf = (
        li.groupBy(
            F.col("l_suppkey").alias("supp"),
            F.trunc(F.to_date("l_shipdate"), "month").alias("m"),
        )
        .agg(
            F.sum(
                F.when(F.col("l_returnflag") == "R", -F.col("l_quantity")).otherwise(
                    F.col("l_quantity")
                )
            ).alias("delta")
        )
        .toPandas()
    )
    got = {r.supp: r for r in registry.QUERIES["inventory_clamped_running_sum"](spark, SF_DIR).collect()}
    for supp, sub in pdf.groupby("supp"):
        ds = sub.sort_values("m")["delta"].tolist()
        acc = 0.0
        for d in ds:
            acc = max(0.0, acc + d)
        assert got[supp].n_months == len(ds)
        assert got[supp].clamped_level == pytest.approx(acc, abs=1e-3)
        assert got[supp].clamped_level >= 0.0
        assert got[supp].net_level == pytest.approx(sum(ds), abs=1e-3)
        assert got[supp].clamped_level >= got[supp].net_level - 1e-9


# --- EWMA control chart ---------------------------------------------------------


def test_ewma_chart_trace_matches_python(spark):
    daily = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(F.to_date("ts").alias("dt"))
        .agg(F.count(F.lit(1)).alias("y"))
        .toPandas()
        .sort_values("dt")
        .reset_index(drop=True)
    )
    y = daily["y"].to_numpy(float)
    ew = [y[0]]
    for v in y[1:]:
        ew.append(0.3 * v + 0.7 * ew[-1])
    sig = y.std()
    got = registry.QUERIES["anomaly_ewma_control_chart"](spark, SF_DIR).collect()
    got = sorted(got, key=lambda r: r.dt)
    assert len(got) == len(y)
    for i, r in enumerate(got):
        assert r.y == y[i]
        assert r.ewma == pytest.approx(ew[i], abs=1e-5)
        ratio = abs(y[i] - ew[i]) / sig
        assert r.dev_ratio == pytest.approx(ratio, abs=1e-5)
        assert r.flagged == (1 if round(ratio, 6) > 2.0 else 0)


# --- trimmed / winsorized means -------------------------------------------------


def test_trimmed_winsorized_match_numpy(spark):
    pdf = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_linestatus", "l_extendedprice")
        .toPandas()
    )
    got = {r.ls: r for r in registry.QUERIES["agg_trimmed_winsorized_mean"](spark, SF_DIR).collect()}
    for ls, sub in pdf.groupby("l_linestatus"):
        x = sub["l_extendedprice"].to_numpy()
        p05, p95 = np.percentile(x, 5), np.percentile(x, 95)
        assert got[ls].n == len(x)
        assert got[ls].p05 == pytest.approx(p05, abs=1e-3)
        assert got[ls].p95 == pytest.approx(p95, abs=1e-3)
        assert got[ls].trimmed_mean == pytest.approx(
            x[(x >= p05) & (x <= p95)].mean(), abs=1e-3
        )
        assert got[ls].winsorized_mean == pytest.approx(
            np.clip(x, p05, p95).mean(), abs=1e-3
        )
        # robustness ordering: trimmed/winsorized sit between p05 and p95
        assert p05 < got[ls].trimmed_mean < p95


# --- rolling median -------------------------------------------------------------


def test_rolling_median_matches_pandas(spark):
    got = (
        registry.QUERIES["window_rolling_median_7d"](spark, SF_DIR)
        .toPandas()
        .sort_values("dt")
        .reset_index(drop=True)
    )
    ref = got["y"].rolling(7, min_periods=1).median()
    assert np.allclose(got["rolling_median_7"], ref, atol=0.01)


# --- lift / gains ---------------------------------------------------------------


def test_lift_gains_invariants_and_reference(spark):
    rows = sorted(
        registry.QUERIES["ml_lift_gains_table"](spark, SF_DIR).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    n = sum(r.n_rows for r in rows)
    pos = sum(r.positives for r in rows)
    # deciles partition the customers near-evenly (floor-rank algebra)
    assert max(r.n_rows for r in rows) - min(r.n_rows for r in rows) <= 1
    # cum_gain is nondecreasing and ends at 1
    gains = [r.cum_gain for r in rows]
    assert all(b >= a for a, b in zip(gains, gains[1:]))
    assert gains[-1] == pytest.approx(1.0)
    base = pos / n
    for r in rows:
        assert r.rate == pytest.approx(r.positives / r.n_rows, abs=1e-5)
        assert r.lift == pytest.approx(r.rate / base, abs=1e-4)


def test_lift_decile_assignment_matches_sorted_reference(spark):
    pdf = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .selectExpr(
            "c_custkey", "c_acctbal",
            "CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS label",
        )
        .toPandas()
        .sort_values(["c_acctbal", "c_custkey"], ascending=[False, True])
        .reset_index(drop=True)
    )
    n = len(pdf)
    pdf["decile"] = (pdf.index * 10) // n + 1
    ref = pdf.groupby("decile")["label"].sum().to_dict()
    got = {r.decile: r.positives for r in registry.QUERIES["ml_lift_gains_table"](spark, SF_DIR).collect()}
    assert got == ref


# --- PMI ------------------------------------------------------------------------


def test_pmi_matches_python_reference(spark):
    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .where(F.col("user_id").isNotNull())
        .select("user_id", F.to_date("ts").alias("d"), "event_type")
        .distinct()
        .collect()
    )
    from collections import defaultdict
    import math

    cells = defaultdict(set)
    for r in rows:
        cells[(r.user_id, str(r.d))].add(r.event_type)
    nu = len(cells)
    marg = defaultdict(int)
    both = defaultdict(int)
    for types in cells.values():
        for t in types:
            marg[t] += 1
        ts = sorted(types)
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                both[(ts[i], ts[j])] += 1
    got = {(r.t1, r.t2): r for r in registry.QUERIES["events_type_pmi"](spark, SF_DIR).collect()}
    assert set(got) == set(both)
    for k, r in got.items():
        assert r.days_both == both[k]
        assert r.days_a == marg[k[0]] and r.days_b == marg[k[1]]
        ref = math.log(both[k] * nu / (marg[k[0]] * marg[k[1]]))
        assert r.pmi == pytest.approx(ref, abs=2e-6)


# --- z-order bucket stats -------------------------------------------------------


def _morton_ref(gx, gy, bits=8):
    z = 0
    for k in range(bits):
        z |= ((gx >> k) & 1) << (2 * k)
        z |= ((gy >> k) & 1) << (2 * k + 1)
    return z


def test_zorder_buckets_match_python_morton(spark):
    import datetime

    pdf = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_custkey", F.to_date("o_orderdate").alias("od")
    ).toPandas()
    anchor = datetime.date(1992, 1, 1)
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 256, -1, 256, -1])
    for ck, od in zip(pdf["o_custkey"], pdf["od"]):
        gx = int(ck) % 256
        gy = (od - anchor).days % 256
        b = _morton_ref(gx, gy) >> 10
        a = agg[b]
        a[0] += 1
        a[1], a[2] = min(a[1], gx), max(a[2], gx)
        a[3], a[4] = min(a[3], gy), max(a[4], gy)
    got = {r.zbucket: r for r in registry.QUERIES["layout_zorder_bucket_stats"](spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for b, (n, mnx, mxx, mny, mxy) in agg.items():
        r = got[b]
        assert (r.n_rows, r.min_x, r.max_x, r.min_y, r.max_y) == (n, mnx, mxx, mny, mxy)
        assert r.bbox_extent == (mxx - mnx) + (mxy - mny)


def test_zorder_buckets_are_local_vs_full_domain(spark):
    rows = registry.QUERIES["layout_zorder_bucket_stats"](spark, SF_DIR).collect()
    # each 16-bit z bucket (>>10) covers a 32x32 tile: locality must beat
    # the 510 extent of an unclustered layout by ~8x
    assert max(r.bbox_extent for r in rows) <= 62
    assert len(rows) <= 64


# --- Nelson-Aalen ---------------------------------------------------------------


def test_nelson_aalen_matches_python_and_bounds_km(spark):
    km = {r.t: r for r in registry.QUERIES["stats_kaplan_meier"](spark, SF_DIR).collect()}
    na = {r.t: r for r in registry.QUERIES["stats_nelson_aalen"](spark, SF_DIR).collect()}
    assert set(km) == set(na)  # same event times, same censoring scheme
    h = 0.0
    for t in sorted(na):
        r = na[t]
        assert r.n_risk == km[t].n_risk and r.churned == km[t].churned
        h += r.churned / r.n_risk
        assert r.cum_hazard == pytest.approx(h, abs=1e-5)
        assert r.na_survival == pytest.approx(np.exp(-h), abs=1e-5)
        # exp(-H) >= KM product-limit, always
        assert r.na_survival >= km[t].survival - 1e-6


# --- funnel time-to-convert -----------------------------------------------------


def test_time_to_convert_matches_python(spark):
    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .where(F.col("user_id").isNotNull() & F.col("event_type").isin("signup", "purchase"))
        .select("user_id", "event_type", "ts")
        .collect()
    )
    from collections import defaultdict

    sign = {}
    purch = defaultdict(list)
    for r in rows:
        if r.event_type == "signup":
            sign[r.user_id] = min(sign.get(r.user_id, r.ts), r.ts)
        else:
            purch[r.user_id].append(r.ts)
    mins = []
    for u, s0 in sign.items():
        after = [t for t in purch.get(u, []) if t >= s0]
        if after:
            p0 = min(after)
            trunc = lambda t: t.replace(second=0, microsecond=0)
            mins.append(int((trunc(p0) - trunc(s0)).total_seconds() // 60))
    got = registry.QUERIES["funnel_time_to_convert"](spark, SF_DIR).first()
    assert got.converted_users == len(mins)
    assert got.min_minutes == min(mins)
    assert got.max_minutes == max(mins)
    assert got.avg_minutes == pytest.approx(np.mean(mins), abs=1e-3)
    assert got.median_minutes == pytest.approx(np.median(mins), abs=0.05)


# --- scalar quantization --------------------------------------------------------


def test_scalar_quantization_matches_numpy(spark):
    rows = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("embedding").collect()
    mses = []
    for r in rows:
        v = np.array(r.embedding, dtype=np.float64)
        lo, hi = v.min(), v.max()
        step = (hi - lo) / 255.0 if hi > lo else 1.0
        recon = lo + np.round((v - lo) / step) * step
        mses.append(((v - recon) ** 2).mean())
    got = registry.QUERIES["sim_scalar_quantization_error"](spark, SF_DIR).first()
    assert got.n_vectors == len(mses)
    assert got.avg_mse_nano == pytest.approx(np.mean(mses) * 1e9, abs=1e-3)
    assert got.max_mse_nano == pytest.approx(np.max(mses) * 1e9, abs=1e-3)
    # int8 over 256 levels: max error per element <= step/2 → mse bounded
    assert got.max_mse_nano < 1e3


# --- business days --------------------------------------------------------------


def test_business_days_closed_form_matches_weekday_walk(spark):
    import datetime

    def walk(a, b):
        """Count weekdays in [a, b) by brute force."""
        d, n = a, 0
        step = datetime.timedelta(days=1)
        while d < b:
            if d.weekday() < 5:
                n += 1
            d += step
        return n

    anchor = datetime.date(1970, 1, 5)

    def closed(a, b):
        na, nb = (a - anchor).days, (b - anchor).days
        W = lambda n: 5 * (n // 7) + min(n % 7, 5)
        return W(nb) - W(na)

    start = datetime.date(2023, 12, 25)
    for i in range(30):
        for j in range(i, 40):
            a = start + datetime.timedelta(days=i)
            b = start + datetime.timedelta(days=j)
            assert closed(a, b) == walk(a, b), (a, b)


def test_business_days_lag_matches_python(spark):
    pdf = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            "o_orderpriority",
            F.to_date("o_orderdate").alias("od"),
            F.to_date("l_shipdate").alias("sd"),
        )
        .toPandas()
    )
    import datetime

    anchor = datetime.date(1970, 1, 5)
    W = lambda n: 5 * (n // 7) + min(n % 7, 5)
    pdf["bd"] = [
        W((sd - anchor).days) - W((od - anchor).days)
        for od, sd in zip(pdf["od"], pdf["sd"])
    ]
    got = {r.pri: r for r in registry.QUERIES["scalar_business_days_lag"](spark, SF_DIR).collect()}
    for pri, sub in pdf.groupby("o_orderpriority"):
        assert got[pri].n == len(sub)
        assert got[pri].avg_bdays == pytest.approx(sub["bd"].mean(), abs=1e-3)
        assert got[pri].min_bdays == sub["bd"].min()
        assert got[pri].max_bdays == sub["bd"].max()


# --- deterministic mode ---------------------------------------------------------


def test_mode_deterministic_tie_break(spark):
    got = {r.seg: r for r in registry.QUERIES["agg_mode_deterministic"](spark, SF_DIR).collect()}
    pdf = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .join(
            spark.read.parquet(f"{SF_DIR}/nation.parquet"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_mktsegment", "n_name")
        .count()
        .toPandas()
    )
    for seg, sub in pdf.groupby("c_mktsegment"):
        best = sub.sort_values(["count", "n_name"], ascending=[False, True]).iloc[0]
        assert got[seg].modal_nation == best["n_name"]
        assert got[seg].cnt == best["count"]


# --- token-budget mix -----------------------------------------------------------


def test_token_budget_mix_respects_budgets_and_greedy_order(spark):
    rows = registry.QUERIES["training_token_budget_mix"](spark, SF_DIR).collect()
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .selectExpr("doc_id", "lang", "size(split(text, ' ')) AS toks")
        .toPandas()
    )
    import hashlib

    tot = {l: int(s.toks.sum()) for l, s in docs.groupby("lang")}
    wsum = sum(v**0.7 for v in tot.values())
    for r in rows:
        p = tot[r.lang] ** 0.7 / wsum
        assert r.prob == pytest.approx(p, abs=2e-6)
        assert r.budget_toks == int(p * 20000)
        assert r.picked_toks <= r.budget_toks
        # greedy md5-order reference selection
        sub = docs[docs["lang"] == r.lang].copy()
        sub["h"] = [
            hashlib.md5(f"tok|{d}".encode()).hexdigest() for d in sub["doc_id"]
        ]
        sub = sub.sort_values("h")
        cum, picked, idsum = 0, 0, 0
        for d, t in zip(sub["doc_id"], sub["toks"]):
            cum += t
            if cum <= r.budget_toks:
                picked += 1
                idsum += d
        assert r.picked_docs == picked and r.id_sum == idsum


# --- t-closeness ----------------------------------------------------------------


def test_t_closeness_matches_numpy_emd(spark):
    pdf = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .select("c_mktsegment", "c_acctbal")
        .toPandas()
    )
    lo, hi = pdf["c_acctbal"].min(), pdf["c_acctbal"].max()
    width = (hi - lo) / 8.0
    pdf["bin"] = np.minimum(np.floor((pdf["c_acctbal"] - lo) / width), 7).astype(int)
    glob = pdf["bin"].value_counts(normalize=True).reindex(range(8), fill_value=0.0)
    got = {r.seg: r for r in registry.QUERIES["privacy_t_closeness"](spark, SF_DIR).collect()}
    for seg, sub in pdf.groupby("c_mktsegment"):
        pq = sub["bin"].value_counts(normalize=True).reindex(range(8), fill_value=0.0)
        cum = np.cumsum(pq.values - glob.values)
        emd = np.abs(cum).sum() / 7.0
        assert got[seg].n == len(sub)
        assert got[seg].t_emd == pytest.approx(emd, abs=2e-6)
        assert got[seg].passes == (1 if round(emd, 6) <= 0.15 else 0)


# --- DP noisy counts ------------------------------------------------------------


def test_dp_noise_is_seeded_laplace(spark):
    import hashlib
    import math

    rows = registry.QUERIES["privacy_dp_noisy_counts"](spark, SF_DIR).collect()
    assert len(rows) == 25
    noises = []
    for r in rows:
        h = int(hashlib.md5(f"dp|{r.nation}".encode()).hexdigest()[:8], 16)
        u = ((h % 999999) + 0.5) / 1e6
        us = u - 0.5
        sgn = 1.0 if u >= 0.5 else -1.0
        ref = -sgn * math.log(1 - 2 * abs(us))
        assert r.noise == pytest.approx(ref, abs=2e-6)
        assert r.noisy_count == pytest.approx(r.true_count + ref, abs=1e-3)
        noises.append(ref)
    # Laplace(b=1): symmetric around 0, unbounded tails possible but
    # with 25 seeded draws the mean magnitude should be near b=1
    assert 0.2 < np.mean(np.abs(noises)) < 3.0


# --- top-k IVM ------------------------------------------------------------------


def test_ivm_topk_equals_full_recompute_and_hits_affected_path(spark):
    from pyspark.sql import Window as W

    got = registry.QUERIES["ivm_topk_maintenance"](spark, SF_DIR).collect()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    base_after = (
        o.where(F.col("o_orderkey") % 101 != 0)
        .selectExpr("o_orderpriority AS pri", "o_orderkey AS id", "o_totalprice AS v")
        .unionByName(
            o.where(F.col("o_orderkey") % 103 == 0).selectExpr(
                "o_orderpriority AS pri",
                "o_orderkey + 1000000000 AS id",
                "o_totalprice + 50000.0 AS v",
            )
        )
    )
    w = W.partitionBy("pri").orderBy(F.desc("v"), F.asc("id"))
    ref = (
        base_after.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .collect()
    )
    ref_set = {(r.pri, r.rk, r.id, round(r.v, 2)) for r in ref}
    got_set = {(r.pri, r.rk, r.id, r.price) for r in got}
    assert got_set == ref_set
    # inserts (+50k) should dominate the top ranks — the merge path ran
    assert any(r.id >= 1000000000 for r in got)


def test_ivm_topk_operator_handles_delete_of_champion(spark):
    """Directly exercise the affected-group path: delete the current #1."""
    from airflow_dags_spark.operators.maintenance import merge_topk_state, topk_state

    base = spark.createDataFrame(
        [("g", i, float(100 - i)) for i in range(6)], "pri string, k long, v double"
    )
    state = topk_state(base, {"pri": F.col("pri")}, F.col("v"), F.col("k"), 3)
    # delete k=0 (v=100.0, the champion) — group must recompute
    changes = spark.createDataFrame(
        [("delete", "g", 0, None)],
        "change_type string, pri string, __id long, __v double",
    )
    base_after = base.where(F.col("k") != 0).selectExpr(
        "pri", "k AS __id", "v AS __v"
    )
    merged = merge_topk_state(state, changes, base_after, ["pri"], 3).collect()
    got = sorted((r["__id"], r["__v"]) for r in merged)
    assert got == [(1, 99.0), (2, 98.0), (3, 97.0)]


def test_ivm_topk_update_of_champion_recomputes(spark):
    """An 'update' retracts the old id: updating the current #1 downward
    must demote it (affected-group recompute), not leave stale state."""
    from airflow_dags_spark.operators.maintenance import merge_topk_state, topk_state

    base = spark.createDataFrame(
        [("g", i, float(100 - i)) for i in range(6)], "pri string, k long, v double"
    )
    state = topk_state(base, {"pri": F.col("pri")}, F.col("v"), F.col("k"), 3)
    # champion k=0 drops from 100.0 to 1.0 — falls out of the top-3
    changes = spark.createDataFrame(
        [("update", "g", 0, 1.0)],
        "change_type string, pri string, __id long, __v double",
    )
    base_after = base.withColumn(
        "v", F.when(F.col("k") == 0, F.lit(1.0)).otherwise(F.col("v"))
    ).selectExpr("pri", "k AS __id", "v AS __v")
    merged = merge_topk_state(state, changes, base_after, ["pri"], 3).collect()
    got = sorted((r["__id"], r["__v"]) for r in merged)
    assert got == [(1, 99.0), (2, 98.0), (3, 97.0)]


def test_ivm_topk_update_outside_state_merges_like_insert(spark):
    """An 'update' whose id is NOT in top-k state must still assert its
    new value — if the new value climbs into the top-k it enters without a
    base recompute (the unaffected-group merge path)."""
    from airflow_dags_spark.operators.maintenance import merge_topk_state, topk_state

    base = spark.createDataFrame(
        [("g", i, float(100 - i)) for i in range(6)], "pri string, k long, v double"
    )
    state = topk_state(base, {"pri": F.col("pri")}, F.col("v"), F.col("k"), 3)
    # k=5 (v=95.0, outside the top-3) jumps to 99.5 — must enter at rank 2
    changes = spark.createDataFrame(
        [("update", "g", 5, 99.5)],
        "change_type string, pri string, __id long, __v double",
    )
    base_after = base.withColumn(
        "v", F.when(F.col("k") == 5, F.lit(99.5)).otherwise(F.col("v"))
    ).selectExpr("pri", "k AS __id", "v AS __v")
    merged = merge_topk_state(state, changes, base_after, ["pri"], 3).collect()
    got = sorted((r["__id"], r["__v"]) for r in merged)
    assert got == [(0, 100.0), (1, 99.0), (5, 99.5)]


def test_ivm_topk_unknown_change_type_raises(spark):
    """A silently dropped change kind would leave stale state forever —
    unrecognized change_type values must raise."""
    import pytest

    from airflow_dags_spark.operators.maintenance import merge_topk_state, topk_state

    base = spark.createDataFrame([("g", 1, 1.0)], "pri string, k long, v double")
    state = topk_state(base, {"pri": F.col("pri")}, F.col("v"), F.col("k"), 3)
    changes = spark.createDataFrame(
        [("upsert", "g", 1, 2.0)],
        "change_type string, pri string, __id long, __v double",
    )
    after = base.selectExpr("pri", "k AS __id", "v AS __v")
    with pytest.raises(ValueError, match="change_type.*upsert"):
        merge_topk_state(state, changes, after, ["pri"], 3)


def test_ivm_topk_null_plus_unknown_change_type_raises_valueerror(spark):
    """A NULL change_type alongside an unknown string used to crash the
    diagnostic itself: sorted(seen - known) can't order None against str,
    so the intended ValueError was masked by a TypeError. The message
    sorts by repr instead."""
    import pytest

    from airflow_dags_spark.operators.maintenance import merge_topk_state, topk_state

    base = spark.createDataFrame([("g", 1, 1.0)], "pri string, k long, v double")
    state = topk_state(base, {"pri": F.col("pri")}, F.col("v"), F.col("k"), 3)
    changes = spark.createDataFrame(
        [("upsert", "g", 1, 2.0), (None, "g", 2, 3.0)],
        "change_type string, pri string, __id long, __v double",
    )
    after = base.selectExpr("pri", "k AS __id", "v AS __v")
    # repr-sort puts "'upsert'" before "None" (quote < 'N' in ASCII)
    with pytest.raises(ValueError, match="change_type.*upsert.*None"):
        merge_topk_state(state, changes, after, ["pri"], 3)


# --- sliding HLL ----------------------------------------------------------------


def test_hll_sliding_7d_tracks_exact_trailing_distinct(spark):
    got = {
        r.win_day: r
        for r in registry.QUERIES["sketch_hll_sliding_7d"](spark, SF_DIR).collect()
    }
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .where(F.col("user_id").isNotNull())
        .select(F.to_date("ts").alias("dt"), "user_id")
        .collect()
    )
    from collections import defaultdict
    import datetime

    by_day = defaultdict(set)
    for r in ev:
        by_day[r.dt].add(r.user_id)
    days = sorted(by_day)
    for d in days:
        exact = set()
        n_merged = 0
        for off in range(7):
            src = d - datetime.timedelta(days=off)
            if src in by_day:
                exact |= by_day[src]
                n_merged += 1
        key = d.strftime("%Y-%m-%d")
        assert key in got
        assert got[key].days_merged == n_merged
        # HLL lgK=14 keeps relative error well under 5% at these counts
        assert abs(got[key].approx_users_7d - len(exact)) <= max(3, 0.05 * len(exact))
    assert set(got) == {d.strftime("%Y-%m-%d") for d in days}


# --- cluster separation ---------------------------------------------------------


def test_cluster_separation_matches_numpy(spark):
    pdf = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").toPandas()
    V = np.array([np.array(v, dtype=np.float64) for v in pdf["embedding"]])
    labels = pdf["label"].to_numpy()
    cents = {l: V[labels == l].mean(axis=0) for l in np.unique(labels)}
    got = {r.label: r for r in registry.QUERIES["ml_cluster_separation_stats"](spark, SF_DIR).collect()}
    for l in np.unique(labels):
        sub = V[labels == l]
        d_own = np.linalg.norm(sub - cents[l], axis=1)
        d_oth = np.min(
            [np.linalg.norm(sub - cents[o], axis=1) for o in cents if o != l], axis=0
        )
        sil = ((d_oth - d_own) / np.maximum(d_oth, d_own)).mean()
        assert got[l].n == len(sub)
        assert got[l].avg_own_dist == pytest.approx(d_own.mean(), abs=2e-6)
        assert got[l].avg_other_dist == pytest.approx(d_oth.mean(), abs=2e-6)
        assert got[l].silhouette == pytest.approx(sil, abs=2e-6)


# --- c-TF-IDF -------------------------------------------------------------------


def test_ctfidf_matches_python_reference(spark):
    import math
    from collections import defaultdict

    rows = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    tf = defaultdict(int)
    docs_with = defaultdict(set)
    n_docs = len(rows)
    for r in rows:
        for t in r.text.strip().lower().split(" "):
            if t:
                tf[(r.lang, t)] += 1
                docs_with[t].add(r.doc_id)
    scores = defaultdict(list)
    for (lang, t), c in tf.items():
        s = round(c * math.log(n_docs / len(docs_with[t])), 6)
        scores[lang].append((-s, t, c))
    got = {}
    for r in registry.QUERIES["text_ctfidf_cluster_terms"](spark, SF_DIR).collect():
        got.setdefault(r.lang, []).append((r.rk, r.term, r.tf, r.score))
    for lang, lst in scores.items():
        ref = sorted(lst)[:5]
        g = sorted(got[lang])
        assert len(g) == min(5, len(lst))
        for (rk, term, tfv, score), (negs, rterm, rc) in zip(g, ref):
            assert term == rterm and tfv == rc
            assert score == pytest.approx(-negs, abs=1e-5)


# --- relational division --------------------------------------------------------


def test_relational_division_matches_python(spark):
    rows = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_custkey", "o_orderpriority"
    ).collect()
    from collections import defaultdict

    per_cust = defaultdict(set)
    all_pr = set()
    for r in rows:
        per_cust[r.o_custkey].add(r.o_orderpriority)
        all_pr.add(r.o_orderpriority)
    qualified = [c for c, s in per_cust.items() if s == all_pr]
    got = registry.QUERIES["join_relational_division"](spark, SF_DIR).first()
    assert got.customers_with_orders == len(per_cust)
    assert got.qualified == len(qualified)
    assert got.n_priorities == len(all_pr)
    assert got.qualified_key_sum == sum(qualified)


# --- SCD2 point-in-time ---------------------------------------------------------


def test_scd2_pit_lookup_matches_backward_search(spark):
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .where(F.col("user_id").isNotNull())
        .select("event_id", "user_id", "ts", "event_type")
        .collect()
    )
    from collections import defaultdict

    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    got = {r.event_id: r for r in registry.QUERIES["scd2_point_in_time_lookup"](spark, SF_DIR).collect()}
    n_checked = 0
    for u, rows in by_user.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        # version starts where state changes; dedupe per ts keeping last
        starts = []
        prev = None
        for r in rows:
            if prev is None or r.event_type != prev:
                starts.append((r.ts, r.event_type))
            prev = r.event_type
        dedup = {}
        for ts, st in starts:
            dedup[ts] = st  # later start at same ts wins
        starts = sorted(dedup.items())
        for r in rows:
            if r.event_type != "purchase":
                continue
            active = [s for s in starts if s[0] <= r.ts][-1]
            g = got[r.event_id]
            assert g.state == active[1], (u, r.event_id)
            assert g.valid_from == active[0].strftime("%Y-%m-%d %H:%M:%S")
            n_checked += 1
    assert n_checked == len(got) and n_checked > 0


# --- ISO week rollup -------------------------------------------------------------


def test_isoweek_rollup_boundary_weeks(spark):
    import datetime

    rows = registry.QUERIES["scalar_isoweek_rollup"](spark, SF_DIR).collect()
    got = {(r.iso_year, r.iso_week): r for r in rows}
    pdf = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select(F.to_date("o_orderdate").alias("d"), "o_totalprice")
        .toPandas()
    )
    from collections import defaultdict

    ref = defaultdict(lambda: [0, 0.0])
    for d, p in zip(pdf["d"], pdf["o_totalprice"]):
        iy, iw, _ = d.isocalendar()
        ref[(iy, iw)][0] += 1
        ref[(iy, iw)][1] += p
    assert set(got) == set(ref)
    for k, (n, rev) in ref.items():
        assert got[k].n_orders == n
        assert got[k].revenue == pytest.approx(rev, abs=0.02)


# --- feature hashing -------------------------------------------------------------


def test_feature_hashing_partitions_token_mass(spark):
    import hashlib

    rows = registry.QUERIES["text_feature_hashing"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    from collections import defaultdict

    total = defaultdict(int)
    terms = defaultdict(set)
    n_tokens = 0
    for r in docs:
        for t in r.text.strip().lower().split(" "):
            if t:
                b = int(hashlib.md5(f"fh|{t}".encode()).hexdigest()[:8], 16) % 64
                total[b] += 1
                terms[b].add(t)
                n_tokens += 1
    got = {r.bucket: r for r in rows}
    assert set(got) == set(total)
    assert sum(r.total_count for r in rows) == n_tokens  # mass conserved
    for b in total:
        assert got[b].total_count == total[b]
        assert got[b].n_terms == len(terms[b])


# --- JL projection ---------------------------------------------------------------


def test_jl_distortion_bounds_and_reference(spark):
    import hashlib

    got = registry.QUERIES["sim_random_projection_jl"](spark, SF_DIR).first()
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .where(F.col("vec_id") % 37 == 0)
        .collect()
    )
    V = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb}
    R = np.zeros((64, 16))
    for i in range(64):
        for j in range(16):
            R[i, j] = (
                1.0
                if int(hashlib.md5(f"jl|{i}|{j}".encode()).hexdigest()[0], 16) < 8
                else -1.0
            )
    P = {k: v @ R / np.sqrt(16.0) for k, v in V.items()}
    ids = sorted(V)
    ratios = []
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            d0 = np.linalg.norm(V[ids[a]] - V[ids[b]])
            d1 = np.linalg.norm(P[ids[a]] - P[ids[b]])
            ratios.append(d1 / d0)
    assert got.n_pairs == len(ratios)
    assert got.avg_ratio == pytest.approx(np.mean(ratios), abs=2e-6)
    assert got.min_ratio == pytest.approx(np.min(ratios), abs=2e-6)
    assert got.max_ratio == pytest.approx(np.max(ratios), abs=2e-6)
    # JL promise at 16 dims: ratios concentrate around 1
    assert 0.4 < got.min_ratio and got.max_ratio < 2.0


# --- Croston ---------------------------------------------------------------------


def test_croston_matches_python_recursion(spark):
    import datetime

    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .where(F.col("l_partkey") % 131 == 0)
        .select("l_partkey", F.to_date("l_shipdate").alias("sd"), "l_quantity")
        .collect()
    )
    anchor = datetime.date(1992, 1, 6)
    from collections import defaultdict

    weekly = defaultdict(float)
    for r in li:
        wk = (r.sd - anchor).days // 7
        weekly[(r.l_partkey % 7, wk)] += r.l_quantity
    series = defaultdict(list)
    for (pc, wk), d in sorted(weekly.items()):
        if d > 0:
            series[pc].append((wk, d))
    got = {r.part_class: r for r in registry.QUERIES["forecast_croston"](spark, SF_DIR).collect()}
    for pc, pts in series.items():
        z, p = pts[0][1], 1.0
        prev_wk = pts[0][0]
        for wk, d in pts[1:]:
            q = wk - prev_wk
            z = 0.2 * d + 0.8 * z
            p = 0.2 * q + 0.8 * p
            prev_wk = wk
        assert got[pc].n_demands == len(pts)
        assert got[pc].z_final == pytest.approx(z, abs=1e-3)
        assert got[pc].p_final == pytest.approx(p, abs=1e-3)
        assert got[pc].croston_forecast == pytest.approx(z / p, abs=1e-3)


# --- reconciliation --------------------------------------------------------------


def test_reconciliation_matches_pandas(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").toPandas()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").toPandas()
    li["lt"] = li.l_extendedprice * (1 - li.l_discount) * (1 + li.l_tax)
    lt = li.groupby("l_orderkey")["lt"].sum()
    m = o.join(lt, on="o_orderkey", how="inner", rsuffix="_l")
    m["diff"] = (m["o_totalprice"] - m["lt"]).abs()
    got = {r.status: r for r in registry.QUERIES["dq_order_line_reconciliation"](spark, SF_DIR).collect()}
    for st, sub in m.groupby("o_orderstatus"):
        assert got[st].n_orders == len(sub)
        assert got[st].avg_abs_diff == pytest.approx(sub["diff"].mean(), abs=0.02)
        assert got[st].max_abs_diff == pytest.approx(sub["diff"].max(), abs=0.02)
        assert got[st].reconciled == int((sub["diff"] <= 0.01).sum())


# --- runs test -------------------------------------------------------------------


def test_runs_test_matches_python(spark):
    daily = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy(F.to_date("o_orderdate").alias("dt"))
        .agg(F.sum("o_totalprice").alias("y"))
        .toPandas()
        .sort_values("dt")
        .reset_index(drop=True)
    )
    y = daily["y"].to_numpy()
    ups = []
    for a, b in zip(y, y[1:]):
        if b > a:
            ups.append(1)
        elif b < a:
            ups.append(0)
    runs = 1 + sum(1 for a, b in zip(ups, ups[1:]) if a != b)
    n1, n2 = float(sum(ups)), float(len(ups) - sum(ups))
    exp = 1 + 2 * n1 * n2 / (n1 + n2)
    var = 2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    got = registry.QUERIES["stats_runs_test"](spark, SF_DIR).first()
    assert (got.n_up, got.n_down, got.runs) == (int(n1), int(n2), runs)
    assert got.expected_runs == pytest.approx(exp, abs=1e-3)
    assert got.z == pytest.approx((runs - exp) / np.sqrt(var), abs=1e-5)


# --- attribution -----------------------------------------------------------------


def test_attribution_matches_python_walk(spark):
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .where(F.col("user_id").isNotNull())
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect()
    )
    from collections import defaultdict

    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    cnt = defaultdict(int)
    val = defaultdict(float)
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        last = None
        for r in rows:
            if r.event_type == "purchase":
                k = last or "none"
                cnt[k] += 1
                val[k] += r.value or 0.0
            else:
                last = r.event_type
    got = {r.touch: r for r in registry.QUERIES["events_attribution_last_touch"](spark, SF_DIR).collect()}
    assert set(got) == set(cnt)
    for k in cnt:
        assert got[k].purchases == cnt[k]
        assert got[k].attributed_value == pytest.approx(val[k], abs=0.02)


# --- cume_dist -------------------------------------------------------------------


def test_cume_dist_definitions(spark):
    rows = registry.QUERIES["window_cume_dist_daily"](spark, SF_DIR).collect()
    n = len(rows)
    ys = sorted(r.y for r in rows)
    import bisect

    for r in rows:
        le = bisect.bisect_right(ys, r.y)
        lt = bisect.bisect_left(ys, r.y)
        assert r.cume == pytest.approx(le / n, abs=2e-6)
        assert r.pct_rank == pytest.approx(lt / (n - 1), abs=2e-6)


# --- sequential rules ------------------------------------------------------------


def test_sequential_rules_match_python(spark):
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .where(F.col("user_id").isNotNull())
        .select("user_id", "event_type", "ts")
        .collect()
    )
    from collections import defaultdict

    first = {}
    for r in ev:
        k = (r.user_id, r.event_type)
        if k not in first or r.ts < first[k]:
            first[k] = r.ts
    by_user = defaultdict(dict)
    for (u, t), ts in first.items():
        by_user[u][t] = ts
    cnt_a = defaultdict(int)
    a_then_b = defaultdict(int)
    types = set(t for _, t in first)
    for u, m in by_user.items():
        for ta in m:
            cnt_a[ta] += 1
            for tb in m:
                if ta != tb and m[tb] > m[ta]:
                    a_then_b[(ta, tb)] += 1
    got = {(r.t_a, r.t_b): r for r in registry.QUERIES["events_sequential_rules"](spark, SF_DIR).collect()}
    for (ta, tb), r in got.items():
        assert r.users_a == cnt_a[ta]
        assert r.users_a_then_b == a_then_b[(ta, tb)]
        assert r.confidence == pytest.approx(a_then_b[(ta, tb)] / cnt_a[ta], abs=1e-5)
    # both directions of every co-present pair appear
    assert len(got) == sum(1 for p in a_then_b) or len(got) >= len(types) * (len(types) - 1) - 5


# --- Hurst -----------------------------------------------------------------------


def test_hurst_rs_matches_numpy(spark):
    daily = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy(F.to_date("o_orderdate").alias("dt"))
        .agg(F.sum("o_totalprice").alias("y"))
        .toPandas()
        .sort_values("dt")
        .reset_index(drop=True)
    )
    y = daily["y"].to_numpy()
    got = {r.sz: r for r in registry.QUERIES["stats_hurst_exponent"](spark, SF_DIR).collect()}
    pts = []
    for sz in (16, 32, 64, 128):
        rs_vals = []
        for b in range(len(y) // sz):
            seg = y[b * sz : (b + 1) * sz]
            dev = np.cumsum(seg - seg.mean())
            rs_vals.append((dev.max() - dev.min()) / seg.std())
        assert got[sz].n_blocks == len(rs_vals)
        assert got[sz].avg_rs == pytest.approx(np.mean(rs_vals), abs=1e-4)
        pts.append((np.log(sz), np.log(np.mean(rs_vals))))
    X = np.array([p[0] for p in pts])
    Y = np.array([p[1] for p in pts])
    slope = np.polyfit(X, Y, 1)[0]
    assert got[16].hurst == pytest.approx(slope, abs=1e-3)
    assert 0.0 < got[16].hurst < 1.0


# --- elasticity ------------------------------------------------------------------


def test_elasticity_matches_numpy_loglog(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    pt = spark.read.parquet(f"{SF_DIR}/part.parquet")
    pm = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .groupBy("p_brand", F.trunc(F.to_date("l_shipdate"), "month").alias("m"))
        .agg(
            F.sum("l_quantity").alias("q"),
            (F.sum("l_extendedprice") / F.sum("l_quantity")).alias("p"),
        )
        .toPandas()
    )
    got = {r.brand: r for r in registry.QUERIES["regr_price_elasticity"](spark, SF_DIR).collect()}
    for brand, sub in pm.groupby("p_brand"):
        x = np.log(sub["p"].to_numpy(float))
        yy = np.log(sub["q"].to_numpy(float))
        slope = np.polyfit(x, yy, 1)[0]
        r2 = np.corrcoef(x, yy)[0, 1] ** 2
        assert got[brand].n_months == len(sub)
        assert got[brand].elasticity == pytest.approx(slope, abs=1e-4)
        assert got[brand].r2 == pytest.approx(r2, abs=1e-4)


# --- audio framing ---------------------------------------------------------------


def test_audio_framing_matches_numpy(spark):
    from airflow_dags_spark.operators.multimodal import fake_pcm_decoder

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20).collect()
    got = {
        r.item_id: r
        for r in registry.QUERIES["multimodal_audio_features"](spark, SF_DIR).collect()
    }
    for d in docs:
        pcm = fake_pcm_decoder(d.text.encode()).astype(np.float64)
        rms, zcr = [], []
        i = 0
        while i + 512 <= len(pcm):
            fr = pcm[i : i + 512]
            rms.append(np.sqrt((fr * fr).mean()))
            zcr.append(float(np.mean(np.sign(fr[1:]) != np.sign(fr[:-1]))))
            i += 256
        r = got[d.doc_id]
        assert r.n_frames == len(rms) == 7  # (2048-512)/256 + 1
        assert r.avg_rms == pytest.approx(np.mean(rms), abs=1e-5)
        assert r.max_rms == pytest.approx(np.max(rms), abs=1e-5)
        assert r.avg_zcr == pytest.approx(np.mean(zcr), abs=1e-5)


def test_frame_audio_requires_decoder(spark):
    from airflow_dags_spark.operators.multimodal import frame_audio

    df = spark.createDataFrame([(1, b"x")], "item_id long, payload binary")
    with pytest.raises(NotImplementedError):
        frame_audio(df)


# --- banded tax ------------------------------------------------------------------


def test_banded_tax_matches_bracket_walk(spark):
    def ref_tax(p):
        bands = [(125000, 250000, 0.02), (250000, 925000, 0.05),
                 (925000, 1500000, 0.10), (1500000, float("inf"), 0.12)]
        return sum(r * max(0.0, min(p, hi) - lo) for lo, hi, r in bands)

    pdf = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderstatus", "o_totalprice"
    ).toPandas()
    pdf["tax"] = pdf["o_totalprice"].map(ref_tax)
    got = {r.status: r for r in registry.QUERIES["scalar_banded_tax"](spark, SF_DIR).collect()}
    for st_, sub in pdf.groupby("o_orderstatus"):
        assert got[st_].n == len(sub)
        assert got[st_].total_tax == pytest.approx(sub["tax"].sum(), abs=0.02)
        assert got[st_].zero_band == int((sub["tax"] == 0).sum())
        rate = (sub["tax"] / sub["o_totalprice"]).mean()
        assert got[st_].avg_effective_rate == pytest.approx(rate, abs=2e-6)
    # marginal property: tax is continuous at a band edge
    assert ref_tax(250000) == pytest.approx(0.02 * 125000)
    assert ref_tax(250001) == pytest.approx(0.02 * 125000 + 0.05, abs=1e-6)


# --- XYZ classification ----------------------------------------------------------


def test_xyz_classes_match_pandas(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    md = (
        li.groupBy("l_partkey", F.trunc(F.to_date("l_shipdate"), "month").alias("m"))
        .agg(F.sum("l_quantity").alias("q"))
        .toPandas()
    )
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, []])
    for pk, sub in md.groupby("l_partkey"):
        if len(sub) < 12:
            continue
        q = sub["q"].to_numpy(float)
        cv = round(q.std() / q.mean(), 6)
        c = "X" if cv < 0.5 else ("Y" if cv < 1.0 else "Z")
        a = agg[c]
        a[0] += 1
        a[1] += pk
        a[2].append(cv)
    got = {r.xyz: r for r in registry.QUERIES["inventory_xyz_classification"](spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for c, (n, ks, cvs) in agg.items():
        assert got[c].n_parts == n and got[c].part_key_sum == ks
        assert got[c].avg_cv == pytest.approx(np.mean(cvs), abs=2e-6)


# --- percentile mergeability ------------------------------------------------------


def test_p90_merge_audit_shows_bias(spark):
    got = registry.QUERIES["agg_percentile_mergeability_audit"](spark, SF_DIR).first()
    assert got.n_weeks > 100
    # averaging daily p90s is measurably wrong — that's the lesson
    assert got.avg_abs_bias > 0
    assert got.max_abs_bias >= got.avg_abs_bias


# --- FILTER clause ---------------------------------------------------------------


def test_filter_clause_matches_pandas(spark):
    pdf = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").toPandas()
    got = {r.ls: r for r in registry.QUERIES["agg_filter_clause_sweep"](spark, SF_DIR).collect()}
    for ls, sub in pdf.groupby("l_linestatus"):
        assert got[ls].n_discounted == int((sub.l_discount > 0.05).sum())
        assert got[ls].n_returned == int((sub.l_returnflag == "R").sum())
        assert got[ls].rev_bulk == pytest.approx(
            sub.loc[sub.l_quantity >= 25, "l_extendedprice"].sum(), abs=0.02
        )
        assert got[ls].avg_untaxed == pytest.approx(
            sub.loc[sub.l_tax == 0, "l_extendedprice"].mean(), abs=1e-3
        )
        assert got[ls].max_undiscounted == pytest.approx(
            sub.loc[sub.l_discount == 0, "l_extendedprice"].max(), abs=0.01
        )


# --- file metadata audit ---------------------------------------------------------


def test_file_metadata_audit_counts_and_sizes(spark):
    import os

    rows = registry.QUERIES["source_file_metadata_audit"](spark, SF_DIR).collect()
    total_rows = sum(r.n_rows for r in rows)
    exact = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    assert total_rows == exact
    real = os.path.getsize(f"{SF_DIR}/lineitem.parquet")
    if os.path.isfile(f"{SF_DIR}/lineitem.parquet"):
        assert sum(r.file_size for r in rows) == real
    for r in rows:
        assert r.bytes_per_row == pytest.approx(r.file_size / r.n_rows, abs=0.01)


# --- Ljung-Box -------------------------------------------------------------------


def test_ljung_box_matches_numpy(spark):
    daily = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy(F.to_date("o_orderdate").alias("dt"))
        .agg(F.sum("o_totalprice").alias("y"))
        .toPandas()
        .sort_values("dt")
        .reset_index(drop=True)
    )
    # NOTE: the query joins on calendar date + k DAYS; with a dense daily
    # series this equals index-lag autocorrelation
    y = daily["y"].to_numpy()
    d = y - y.mean()
    n = len(y)
    q = 0.0
    dates = daily["dt"].tolist()
    pos = {dt: i for i, dt in enumerate(dates)}
    import datetime

    for k in range(1, 11):
        s = 0.0
        for i, dt in enumerate(dates):
            j = pos.get(dt + datetime.timedelta(days=k))
            if j is not None:
                s += d[i] * d[j]
        r = s / (d * d).sum()
        q += r * r / (n - k)
    q *= n * (n + 2)
    got = registry.QUERIES["stats_ljung_box"](spark, SF_DIR).first()
    assert got.n_days == n
    assert got.ljung_box_q == pytest.approx(q, abs=1e-2)


# --- chi-square residuals ---------------------------------------------------------


def test_chisq_residuals_match_numpy(spark):
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    n = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    r = spark.read.parquet(f"{SF_DIR}/region.parquet")
    pdf = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("c_mktsegment", "r_name")
        .count()
        .toPandas()
    )
    tab = pdf.pivot(index="c_mktsegment", columns="r_name", values="count").fillna(0)
    obs = tab.to_numpy(float)
    e = obs.sum(1, keepdims=True) @ obs.sum(0, keepdims=True) / obs.sum()
    resid = (obs - e) / np.sqrt(e)
    got = {(r_.seg, r_.reg): r_ for r_ in registry.QUERIES["stats_chisq_residual_cells"](spark, SF_DIR).collect()}
    for i, seg in enumerate(tab.index):
        for j, reg in enumerate(tab.columns):
            if obs[i, j] == 0 and (seg, reg) not in got:
                continue
            g = got[(seg, reg)]
            assert g.observed == obs[i, j]
            assert g.expected == pytest.approx(e[i, j], abs=1e-3)
            assert g.std_residual == pytest.approx(resid[i, j], abs=2e-6)
    # residuals of a contingency table sum to ~0 weighted by sqrt(E)
    tot = sum(g.std_residual * np.sqrt(g.expected) for g in got.values())
    assert abs(tot) < 1e-2


# --- Simpson check ---------------------------------------------------------------


def test_simpsons_check_slopes_match_numpy(spark):
    pdf = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_linestatus", "l_extendedprice", "l_discount")
        .toPandas()
    )
    x, yy = pdf["l_discount"].to_numpy(float), pdf["l_extendedprice"].to_numpy(float)
    oslope = np.polyfit(x, yy, 1)[0]
    got = {r.grp: r for r in registry.QUERIES["stats_simpsons_check"](spark, SF_DIR).collect()}
    for grp, sub in pdf.groupby("l_linestatus"):
        gs = np.polyfit(sub["l_discount"], sub["l_extendedprice"], 1)[0]
        assert got[grp].group_slope == pytest.approx(gs, abs=1e-2)
        assert got[grp].overall_slope == pytest.approx(oslope, abs=1e-2)
        assert got[grp].sign_flip == (1 if np.sign(gs) != np.sign(oslope) else 0)


# --- log-rank ---------------------------------------------------------------------


def test_logrank_matches_python_reference(spark):
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .where(F.col("user_id").isNotNull())
        .select("user_id", "ts", "event_type")
        .collect()
    )
    from collections import defaultdict

    ref_end = max(r.ts for r in ev)
    start = {}
    first_p = {}
    for r in ev:
        if r.user_id not in start or r.ts < start[r.user_id]:
            start[r.user_id] = r.ts
        if r.event_type == "purchase":
            if r.user_id not in first_p or r.ts < first_p[r.user_id]:
                first_p[r.user_id] = r.ts
    trunc = lambda t: t.replace(minute=0, second=0, microsecond=0)
    obs = []
    for u, s0 in start.items():
        grp = u % 2
        if u in first_p:
            t = int((trunc(first_p[u]) - trunc(s0)).total_seconds() // 3600)
            obs.append((grp, t, 1))
        else:
            t = int((trunc(ref_end) - trunc(s0)).total_seconds() // 3600)
            obs.append((grp, t, 0))
    times = sorted({t for _, t, e in obs if e == 1})
    o1 = e1 = v1 = 0.0
    for t in times:
        n0r = sum(1 for g, tt, _ in obs if g == 0 and tt >= t)
        n1r = sum(1 for g, tt, _ in obs if g == 1 and tt >= t)
        d0 = sum(1 for g, tt, e in obs if g == 0 and tt == t and e == 1)
        d1 = sum(1 for g, tt, e in obs if g == 1 and tt == t and e == 1)
        nt, dd = n0r + n1r, d0 + d1
        if nt <= 1:
            continue
        o1 += d1
        e1 += dd * n1r / nt
        v1 += dd * (n0r / nt) * (n1r / nt) * (nt - dd) / (nt - 1)
    got = registry.QUERIES["stats_logrank_test"](spark, SF_DIR).first()
    assert got.observed_g1 == int(o1)
    assert got.expected_g1 == pytest.approx(e1, abs=1e-3)
    assert got.variance_g1 == pytest.approx(v1, abs=1e-3)
    assert got.logrank_z == pytest.approx((o1 - e1) / np.sqrt(v1), abs=1e-4)


# --- calibration bins ------------------------------------------------------------


def test_calibration_bins_match_numpy(spark):
    pdf = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_acctbal", "c_mktsegment"
    ).toPandas()
    lo, hi = pdf["c_acctbal"].min(), pdf["c_acctbal"].max()
    score = (pdf["c_acctbal"] - lo) / (hi - lo)
    label = (pdf["c_mktsegment"] == "BUILDING").astype(float)
    bins = np.minimum(np.floor(score * 10), 9).astype(int)
    got = {r.bin: r for r in registry.QUERIES["ml_calibration_bins"](spark, SF_DIR).collect()}
    for b in sorted(set(bins)):
        m = bins == b
        assert got[b].n == int(m.sum())
        assert got[b].avg_score == pytest.approx(score[m].mean(), abs=2e-6)
        assert got[b].avg_label == pytest.approx(label[m].mean(), abs=2e-6)
        assert got[b].brier_bin == pytest.approx(((score[m] - label[m]) ** 2).mean(), abs=2e-6)
    # overall Brier decomposes as the n-weighted mean of bin briers
    total_b = sum(got[b].brier_bin * got[b].n for b in got) / sum(got[b].n for b in got)
    assert total_b == pytest.approx(((score - label) ** 2).mean(), abs=1e-4)


# --- rolling correlation ---------------------------------------------------------


def test_rolling_corr_matches_pandas(spark):
    daily = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy(F.to_date("o_orderdate").alias("dt"))
        .agg(F.count(F.lit(1)).cast("double").alias("c"), F.avg("o_totalprice").alias("ap"))
        .toPandas()
        .sort_values("dt")
        .reset_index(drop=True)
    )
    ref = daily["c"].rolling(30).corr(daily["ap"])
    got = (
        registry.QUERIES["window_rolling_corr_30d"](spark, SF_DIR)
        .toPandas()
        .sort_values("dt")
        .reset_index(drop=True)
    )
    assert (got["n_win"].iloc[:29] < 30).all()
    assert got["rolling_corr"].iloc[:29].isna().all()
    for i in range(29, len(daily)):
        assert got["rolling_corr"][i] == pytest.approx(ref[i], abs=2e-6)


# --- readability -----------------------------------------------------------------


def test_readability_proxy_matches_python(spark):
    rows = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    from collections import defaultdict

    agg = defaultdict(list)
    for r in rows:
        words = r.text.strip().split(" ")
        chars = len(r.text.replace(" ", ""))
        wl = chars / len(words)
        agg[r.lang].append((len(words), wl, 206.835 - 1.015 * len(words) - 84.6 * wl / 3.0))
    got = {r.lang: r for r in registry.QUERIES["text_readability_proxy"](spark, SF_DIR).collect()}
    for lang, vals in agg.items():
        assert got[lang].n_docs == len(vals)
        assert got[lang].avg_words == pytest.approx(np.mean([v[0] for v in vals]), abs=1e-3)
        assert got[lang].avg_word_len == pytest.approx(np.mean([v[1] for v in vals]), abs=1e-3)
        assert got[lang].flesch_proxy == pytest.approx(np.mean([v[2] for v in vals]), abs=1e-3)


# --- seasonality strength --------------------------------------------------------


def test_seasonality_strength_consistent_with_decomposition(spark):
    comp = registry.QUERIES["timeseries_decompose_ma"](spark, SF_DIR).toPandas()
    resid = comp["resid"].to_numpy()
    f_seas = max(0.0, 1 - resid.var() / (comp["seasonal"] + comp["resid"]).to_numpy().var())
    f_trend = max(0.0, 1 - resid.var() / (comp["trend"] + comp["resid"]).to_numpy().var())
    got = registry.QUERIES["timeseries_seasonality_strength"](spark, SF_DIR).first()
    assert got.n_days == len(comp)
    # decompose rounds components to 2-4 dp, so match loosely
    assert got.f_seasonal == pytest.approx(f_seas, abs=1e-4)
    assert got.f_trend == pytest.approx(f_trend, abs=1e-4)
    assert 0.0 <= got.f_seasonal <= 1.0 and 0.0 <= got.f_trend <= 1.0


# --- peak profile ----------------------------------------------------------------


def test_peak_profile_matches_python(spark):
    rows = spark.read.parquet(f"{SF_DIR}/events.parquet").select("ts", "value").collect()
    import datetime
    from collections import defaultdict

    anchor = datetime.date(1970, 1, 5)
    agg = defaultdict(lambda: [0, 0.0])
    for r in rows:
        wd = (r.ts.date() - anchor).days % 7
        a = agg[(wd, r.ts.hour)]
        a[0] += 1
        a[1] += r.value or 0.0
    got = {(r.wd, r.hr): r for r in registry.QUERIES["events_peak_hour_profile"](spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for k, (n, v) in agg.items():
        assert got[k].n_events == n
        assert got[k].avg_value == pytest.approx(v / n, abs=1e-3)


# --- group size histogram --------------------------------------------------------


def test_group_size_histogram_mass_conserved(spark):
    rows = registry.QUERIES["agg_group_size_histogram"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n_orders = li.select("l_orderkey").distinct().count()
    n_lines = li.count()
    assert sum(r.n_orders for r in rows) == n_orders
    assert sum(r.n_lines * r.n_orders for r in rows) == n_lines
    assert sum(r.share for r in rows) == pytest.approx(1.0, abs=1e-3)


# --- bounce rate -----------------------------------------------------------------


def test_bounce_rate_matches_python_sessionizer(spark):
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .where(F.col("user_id").isNotNull())
        .select("user_id", "ts", "event_id")
        .collect()
    )
    from collections import defaultdict
    import datetime

    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append((r.ts, r.event_id))
    sizes = []
    gap = datetime.timedelta(minutes=30)
    for rows in by_user.values():
        rows.sort()
        cur = 0
        prev = None
        for ts, _ in rows:
            if prev is None or ts - prev > gap:
                if cur:
                    sizes.append(cur)
                cur = 1
            else:
                cur += 1
            prev = ts
        sizes.append(cur)
    got = registry.QUERIES["events_session_bounce_rate"](spark, SF_DIR).first()
    assert got.n_sessions == len(sizes)
    assert got.bounces == sum(1 for s in sizes if s == 1)
    assert got.bounce_rate == pytest.approx(got.bounces / got.n_sessions, abs=1e-5)
    assert got.avg_events_per_session == pytest.approx(np.mean(sizes), abs=1e-3)
    assert got.max_session_events == max(sizes)


# --- daily entropy ---------------------------------------------------------------


def test_entropy_daily_bounds_and_reference(spark):
    rows = registry.QUERIES["events_type_entropy_daily"](spark, SF_DIR).collect()
    pdf = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(F.to_date("ts").alias("dt"), "event_type")
        .count()
        .toPandas()
    )
    import math

    got = {r.dt: r for r in rows}
    for dt, sub in pdf.groupby("dt"):
        p = sub["count"] / sub["count"].sum()
        h = -(p * np.log(p)).sum()
        k = str(dt)
        assert got[k].n_events == sub["count"].sum()
        assert got[k].entropy_nats == pytest.approx(h, abs=2e-6)
        assert 0 <= got[k].entropy_nats <= math.log(len(sub)) + 1e-9


# --- LOO target encoding ---------------------------------------------------------


def test_loo_encoding_no_self_leakage(spark):
    pdf = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    ).toPandas()
    pdf["label"] = (pdf["c_mktsegment"] == "BUILDING").astype(float)
    got = {r.c_custkey: r for r in registry.QUERIES["ml_loo_target_encoding"](spark, SF_DIR).collect()}
    for nk, sub in pdf.groupby("c_nationkey"):
        ls, n = sub["label"].sum(), len(sub)
        for ck, lab in zip(sub["c_custkey"], sub["label"]):
            r = got[ck]
            assert r.group_n == n
            if n > 1:
                assert r.loo_encoding == pytest.approx((ls - lab) / (n - 1), abs=2e-6)
            else:
                assert r.loo_encoding is None
    # leakage check: for a two-member group the encodings are each
    # other's labels — flipping one's label changes only the OTHER's
    # encoding (structural property of the formula)
    two = [nk for nk, sub in pdf.groupby("c_nationkey") if len(sub) == 2]
    for nk in two:
        sub = pdf[pdf.c_nationkey == nk]
        a, b = sub.iloc[0], sub.iloc[1]
        assert got[a.c_custkey].loo_encoding == pytest.approx(b.label, abs=1e-9)
        assert got[b.c_custkey].loo_encoding == pytest.approx(a.label, abs=1e-9)


# --- top-n with ties -------------------------------------------------------------


def test_topn_with_ties_keeps_all_tied_peers(spark):
    rows = registry.QUERIES["window_topn_with_ties"](spark, SF_DIR).collect()
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        per[r.o_custkey].append(r)
    pdf = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_custkey", "o_orderkey", F.round("o_totalprice", 0).alias("p")
    ).toPandas()
    for ck, sub in pdf.groupby("o_custkey"):
        prices = sorted(sub["p"], reverse=True)
        distinct = sorted(set(prices), reverse=True)[:2]
        want = sub[sub["p"].isin(distinct)]
        grp = per[ck]
        assert len(grp) == len(want)
        assert {r.o_orderkey for r in grp} == set(want["o_orderkey"])
        # rank 1 rows all share the max price
        top = [r for r in grp if r.rk == 1]
        assert all(r.p == max(prices) for r in top)


# --- inter-purchase gaps ---------------------------------------------------------


def test_interpurchase_gap_matches_python(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    pdf = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_custkey", "o_orderkey", F.to_date("o_orderdate").alias("d"))
        .toPandas()
    )
    from collections import defaultdict

    gaps = defaultdict(list)
    for (seg, ck), sub in pdf.groupby(["c_mktsegment", "o_custkey"]):
        ds = sub.sort_values(["d", "o_orderkey"])["d"].tolist()
        for a, b in zip(ds, ds[1:]):
            gaps[seg].append((b - a).days)
    got = {r.seg: r for r in registry.QUERIES["orders_interpurchase_gap"](spark, SF_DIR).collect()}
    for seg, g in gaps.items():
        assert got[seg].n_gaps == len(g)
        assert got[seg].median_gap_days == pytest.approx(np.median(g), abs=0.05)
        assert got[seg].avg_gap_days == pytest.approx(np.mean(g), abs=1e-3)


# --- power-law MLE ---------------------------------------------------------------


def test_power_law_mle_matches_numpy(spark):
    act = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .count()
        .toPandas()["count"]
        .to_numpy(float)
    )
    xm = np.percentile(act, 25)
    tail = act[act >= xm]
    alpha = 1 + len(tail) / np.log(tail / xm).sum()
    got = registry.QUERIES["stats_power_law_mle"](spark, SF_DIR).first()
    assert got.n_tail == len(tail)
    assert got.x_min == pytest.approx(xm, abs=0.05)
    assert got.alpha_mle == pytest.approx(alpha, abs=1e-4)
    assert got.alpha_se == pytest.approx((alpha - 1) / np.sqrt(len(tail)), abs=1e-4)
    assert got.alpha_mle > 1.0  # MLE lower bound for a valid tail


# --- PK audit --------------------------------------------------------------------


def test_pk_audit_finds_lineitem_grain_violation(spark):
    rows = {r.tbl: r for r in registry.QUERIES["dq_primary_key_audit"](spark, SF_DIR).collect()}
    assert set(rows) == {"orders", "customer", "part", "supplier", "events", "lineitem"}
    for t in ("orders", "customer", "part", "supplier", "events"):
        assert rows[t].dup_rows == 0, t
        assert rows[t].n_rows == rows[t].n_keys
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n = li.count()
    k = li.select("l_orderkey", "l_linenumber").distinct().count()
    assert rows["lineitem"].n_rows == n
    assert rows["lineitem"].n_keys == k
    assert rows["lineitem"].dup_rows == n - k


# --- YTD share -------------------------------------------------------------------


def test_ytd_share_monotone_and_ends_at_one(spark):
    rows = registry.QUERIES["window_ytd_share"](spark, SF_DIR).collect()
    from collections import defaultdict

    per_year = defaultdict(list)
    for r in rows:
        per_year[r.yr].append(r)
    for yr, ms in per_year.items():
        ms.sort(key=lambda r: r.mo)
        shares = [r.ytd_share for r in ms]
        assert all(b >= a for a, b in zip(shares, shares[1:])), yr
        assert shares[-1] == pytest.approx(1.0, abs=1e-5)
        run = 0.0
        for r in ms:
            run += r.rev
            assert r.ytd_rev == pytest.approx(run, abs=0.05)

"""Round-8 operators: rank-sum AUC, MRR@10, Cramér's V, Cohen's kappa,
jackknife ratio SE, partial correlation, Tukey HSD, MinHash estimate-error
audit, pairwise DTW, IVF recall audit — each checked against an
independent pure-Python/NumPy computation (DuckDB hash parity is covered
by the registry sweep)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import numpy as np
import pytest
from pyspark.sql import functions as F

from airflow_dags_spark.plans import registry

registry.load_all()

SF_DIR = "/root/testdata/sf0.001"


def _cents(x: float) -> int:
    return round(x * 100)


# --- ROC AUC --------------------------------------------------------------------


def test_auc_matches_rank_reference(spark):
    """Independent midrank computation straight from row-level data."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    by_prio = defaultdict(list)
    for r in orders:
        by_prio[r.o_orderpriority].append(
            (_cents(r.o_totalprice), 1 if r.o_orderstatus == "F" else 0)
        )
    got = {
        r.prio: r for r in registry.QUERIES["ml_auc_roc"](spark, SF_DIR).collect()
    }
    for prio, rows in by_prio.items():
        rows.sort()
        # midranks: average 1-based rank within each tie group
        ranks = {}
        i = 0
        while i < len(rows):
            j = i
            while j < len(rows) and rows[j][0] == rows[i][0]:
                j += 1
            mid = (i + 1 + j) / 2.0  # mean of ranks i+1..j
            for t in range(i, j):
                ranks[t] = mid
            i = j
        r_pos = sum(ranks[t] for t, (_, y) in enumerate(rows) if y == 1)
        n1 = sum(y for _, y in rows)
        n0 = len(rows) - n1
        auc = (r_pos - n1 * (n1 + 1) / 2.0) / (n1 * n0)
        assert got[prio].n_pos == n1 and got[prio].n_neg == n0
        assert got[prio].auc == pytest.approx(auc, abs=1e-6)
        assert 0.0 <= got[prio].auc <= 1.0


# --- MRR@10 ---------------------------------------------------------------------


def test_mrr_matches_sorted_reference(spark):
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .where(F.col("user_id").isNotNull())
        .collect()
    )
    v = defaultdict(int)
    purch = defaultdict(int)
    for r in ev:
        v[(r.event_type, r.user_id)] += _cents(r.value)
        if r.event_type == "purchase":
            purch[r.user_id] += 1
    by_et = defaultdict(list)
    for (et, uid), val in v.items():
        by_et[et].append((uid, val))
    got = {
        r.event_type: r
        for r in registry.QUERIES["ml_mrr_at_k"](spark, SF_DIR).collect()
    }
    for et, items in by_et.items():
        ranked = sorted(items, key=lambda x: (-x[1], x[0]))
        first = next(
            (p + 1 for p, (uid, _) in enumerate(ranked) if purch[uid] > 0), None
        )
        if first is None:
            assert got[et].first_hit_pos is None
            assert got[et].rr_at_10 == 0.0
        else:
            assert got[et].first_hit_pos == first
            expect = round(1.0 / first, 6) if first <= 10 else 0.0
            assert got[et].rr_at_10 == pytest.approx(expect, abs=1e-9)


# --- Cramér's V -----------------------------------------------------------------


def test_cramers_v_matches_contingency_reference(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    cells = defaultdict(int)
    for r in orders:
        cells[(r.o_orderpriority, r.o_orderstatus)] += 1
    n = sum(cells.values())
    rkeys = {k for k, _ in cells}
    ckeys = {k for _, k in cells}
    rt = defaultdict(int)
    ct = defaultdict(int)
    for (rk, ck), c in cells.items():
        rt[rk] += c
        ct[ck] += c
    chi2 = sum(
        (c - rt[rk] * ct[ck] / n) ** 2 / (rt[rk] * ct[ck] / n)
        for (rk, ck), c in cells.items()
    )
    v = math.sqrt(chi2 / (n * (min(len(rkeys), len(ckeys)) - 1)))
    row = registry.QUERIES["stats_cramers_v"](spark, SF_DIR).collect()[0]
    assert row.n == n
    assert (row.n_levels_row, row.n_levels_col) == (len(rkeys), len(ckeys))
    assert row.chi2 == pytest.approx(chi2, abs=1e-5)
    assert row.cramers_v == pytest.approx(v, abs=1e-6)
    assert 0.0 <= row.cramers_v <= 1.0


# --- Cohen's kappa --------------------------------------------------------------


def test_kappa_matches_confusion_reference(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    lines = defaultdict(int)
    for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect():
        lines[r.l_orderkey] += 1
    conf = defaultdict(lambda: [0, 0, 0, 0])  # n11, n10, n01, n00
    for r in orders:
        a = 1 if _cents(r.o_totalprice) > 25_000_000 else 0
        b = 1 if lines.get(r.o_orderkey, 0) >= 4 else 0
        conf[r.o_orderpriority][
            {(1, 1): 0, (1, 0): 1, (0, 1): 2, (0, 0): 3}[(a, b)]
        ] += 1
    got = {
        r.prio: r
        for r in registry.QUERIES["stats_cohens_kappa"](spark, SF_DIR).collect()
    }
    for prio, (n11, n10, n01, n00) in conf.items():
        n = n11 + n10 + n01 + n00
        po = (n11 + n00) / n
        pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n)
        kappa = (po - pe) / (1 - pe)
        r = got[prio]
        assert (r.n11, r.n10, r.n01, r.n00) == (n11, n10, n01, n00)
        # query columns are rounded to 6 dp
        assert r.po == pytest.approx(po, abs=1e-6)
        assert r.pe == pytest.approx(pe, abs=1e-6)
        assert r.kappa == pytest.approx(kappa, abs=1e-6)


# --- Jackknife ratio SE ---------------------------------------------------------


def test_jackknife_se_matches_explicit_loo(spark):
    """Recompute every leave-one-out replicate EXPLICITLY (n re-aggregations)
    and compare to the operator's totals-based shortcut."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    cust = {
        r.c_custkey: r.c_nationkey
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    nname = {
        r.n_nationkey: r.n_name
        for r in spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    }
    per_cust = defaultdict(lambda: [0, 0])  # cents, n_orders
    for r in orders:
        k = (cust[r.o_custkey], r.o_custkey)
        per_cust[k][0] += _cents(r.o_totalprice)
        per_cust[k][1] += 1
    by_nk = defaultdict(list)
    for (nk, _), (cents, n) in per_cust.items():
        by_nk[nk].append((cents, n))
    got = {
        r.nation: r
        for r in registry.QUERIES["stats_jackknife_ratio_se"](
            spark, SF_DIR
        ).collect()
    }
    for nk, custs in by_nk.items():
        if len(custs) < 2:
            continue
        sr = sum(c for c, _ in custs)
        so = sum(n for _, n in custs)
        loo = [
            (sr - c) / 100.0 / (so - n) for c, n in custs if so > n
        ]
        n = len(loo)
        mean = sum(loo) / n
        se = math.sqrt((n - 1) / n * sum((x - mean) ** 2 for x in loo))
        r = got[nname[nk]]
        assert r.n_customers == len(custs)
        assert r.revenue_per_order == pytest.approx(sr / 100.0 / so, abs=1e-6)
        assert r.jackknife_se == pytest.approx(se, abs=1e-4)


# --- Partial correlation --------------------------------------------------------


def test_partial_corr_matches_numpy(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    by_flag = defaultdict(lambda: ([], [], []))
    for r in li:
        x, y, z = by_flag[r.l_returnflag]
        x.append(_cents(r.l_extendedprice))
        y.append(int(round(r.l_quantity)))
        z.append(_cents(r.l_discount))
    got = {
        r.flag: r
        for r in registry.QUERIES["stats_partial_corr"](spark, SF_DIR).collect()
    }
    for flag, (x, y, z) in by_flag.items():
        c = np.corrcoef(np.array([x, y, z], dtype=np.float64))
        rxy, rxz, ryz = c[0, 1], c[0, 2], c[1, 2]
        part = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
        r = got[flag]
        assert r.n == len(x)
        assert r.r_price_qty == pytest.approx(rxy, abs=1e-6)
        assert r.r_price_disc == pytest.approx(rxz, abs=1e-6)
        assert r.r_qty_disc == pytest.approx(ryz, abs=1e-6)
        assert r.partial_r_price_qty_given_disc == pytest.approx(part, abs=1e-6)


# --- Tukey HSD ------------------------------------------------------------------


def test_tukey_hsd_matches_reference(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    by_grp = defaultdict(list)
    for r in orders:
        by_grp[r.o_orderpriority].append(_cents(r.o_totalprice) / 100.0)
    k = len(by_grp)
    n_tot = sum(len(v) for v in by_grp.values())
    sse = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v) for v in by_grp.values()
    )
    mse = sse / (n_tot - k)
    rows = registry.QUERIES["stats_tukey_hsd"](spark, SF_DIR).collect()
    assert len(rows) == k * (k - 1) // 2
    for r in rows:
        va, vb = by_grp[r.group_a], by_grp[r.group_b]
        ma, mb = sum(va) / len(va), sum(vb) / len(vb)
        q = abs(ma - mb) / math.sqrt(mse / 2 * (1 / len(va) + 1 / len(vb)))
        assert r.mean_a == pytest.approx(ma, abs=0.01)
        assert r.mean_b == pytest.approx(mb, abs=0.01)
        assert r.q_stat == pytest.approx(q, abs=1e-4)
        assert r.significant == (q > 3.86)


# --- MinHash estimate-error audit -----------------------------------------------


def _norm_tokens(text: str) -> list[str]:
    import re

    return re.sub(r"\s+", " ", text.strip()).lower().split(" ")


def _shingles(text: str) -> set[str]:
    t = _norm_tokens(text)
    return {" ".join(t[i : i + 3]) for i in range(max(len(t) - 2, 0))}


def test_minhash_est_error_matches_md5_reference(spark):
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    got = {
        (r.key_a, r.key_b): r
        for r in registry.QUERIES["dedup_minhash_est_error"](
            spark, SF_DIR
        ).collect()
    }
    checked = 0
    for (ka, kb), r in sorted(got.items())[:25]:
        sa, sb = _shingles(docs[ka]), _shingles(docs[kb])
        exact = len(sa & sb) / len(sa | sb)
        matches = 0
        for i in range(16):
            ma = min(
                hashlib.md5(f"e{i}:{s}".encode()).hexdigest() for s in sa
            )
            mb = min(
                hashlib.md5(f"e{i}:{s}".encode()).hexdigest() for s in sb
            )
            matches += ma == mb
        assert r.est_jaccard == pytest.approx(matches / 16.0, abs=1e-9)
        assert r.exact_jaccard == pytest.approx(exact, abs=1e-6)
        assert r.abs_err == pytest.approx(abs(matches / 16.0 - exact), abs=1e-6)
        checked += 1
    assert checked == 25
    # estimator sanity over the whole pair population: unbiased-ish, so the
    # mean absolute error of a 16-hash estimate stays well under 0.25
    errs = [r.abs_err for r in got.values()]
    assert sum(errs) / len(errs) < 0.25


# --- pairwise DTW ---------------------------------------------------------------


def _dtw_ref(a: list[float], b: list[float]) -> float:
    n, m = len(a), len(b)
    D = [[math.inf] * (m + 1) for _ in range(n + 1)]
    D[0][0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            D[i][j] = abs(a[i - 1] - b[j - 1]) + min(
                D[i - 1][j], D[i][j - 1], D[i - 1][j - 1]
            )
    return D[n][m]


def test_dtw_matches_python_reference(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    cust = {
        r.c_custkey: r.c_nationkey
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    nname = {
        r.n_nationkey: r.n_name
        for r in spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    }
    monthly = defaultdict(lambda: [0] * 12)
    for r in orders:
        if r.o_orderdate.year == 1996:
            monthly[cust[r.o_custkey]][r.o_orderdate.month - 1] += _cents(
                r.o_totalprice
            )
    shares = {
        nname[nk]: [c / sum(months) for c in months]
        for nk, months in monthly.items()
        if sum(months) > 0
    }
    got = {
        (r.nation_a, r.nation_b): r.dtw
        for r in registry.QUERIES["timeseries_dtw_distance"](
            spark, SF_DIR
        ).collect()
    }
    names = sorted(shares)
    expect_pairs = {
        (a, b) for i, a in enumerate(names) for b in names[i + 1 :]
    }
    assert set(got) == expect_pairs
    for (a, b), d in got.items():
        assert d == pytest.approx(_dtw_ref(shares[a], shares[b]), abs=1e-6)


def test_dtw_identity_and_symmetry_properties(spark):
    from airflow_dags_spark.operators.temporal import dtw_pairwise

    df = spark.createDataFrame(
        [("a", [1.0, 2.0, 3.0]), ("b", [1.0, 2.0, 3.0]), ("c", [9.0, 9.0])],
        "k string, s array<double>",
    )
    rows = {(r.key_a, r.key_b): r.dtw for r in dtw_pairwise(df, "k", "s").collect()}
    assert rows[("a", "b")] == 0.0  # identical series
    assert rows[("a", "c")] > 0.0
    # DTW of a 1-step constant vs itself stretched: |9-9|... alignment cost 0
    df2 = spark.createDataFrame(
        [("x", [5.0, 5.0, 5.0, 5.0]), ("y", [5.0])], "k string, s array<double>"
    )
    got = dtw_pairwise(df2, "k", "s").collect()[0]
    assert got.dtw == 0.0


# --- IVF recall audit -----------------------------------------------------------


def test_ivf_recall_bounds_and_exact_degenerate(spark):
    rows = registry.QUERIES["sim_ivf_recall_at_k"](spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0.0 <= r.recall_at_10 <= 1.0
        assert r.n_hits == round(r.recall_at_10 * 10)
    # the query vector itself is always found by probing its own cell —
    # recall can't be zero
    assert all(r.n_hits >= 1 for r in rows)


def test_ivf_recall_is_one_when_probing_all_cells(spark):
    from airflow_dags_spark.operators.similarity import (
        brute_force_topk,
        ivf_ann_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qf = F.col("vec_id") < 5
    exact = {
        (r.qid, r.cid) for r in brute_force_topk(emb, 10, query_filter=qf).collect()
    }
    full_probe = {
        (r.qid, r.cid)
        for r in ivf_ann_topk(
            emb, 10, query_filter=qf, n_cells=8, nprobe=8
        ).collect()
    }
    assert full_probe == exact

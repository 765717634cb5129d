"""Round-9 operators: multi-class PRF, Brier decomposition + ECE, WOE/IV,
McNemar, Brown-Forsythe, Durbin-Watson, HHI concentration, pinball loss,
incremental MinHash screen, Arrow-batched linear scoring — each checked
against an independent pure-Python computation (DuckDB hash parity is
covered by the registry sweep)."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from airflow_dags_spark.plans import registry

registry.load_all()

SF_DIR = "/root/testdata/sf0.001"


def _cents(x: float) -> int:
    return round(x * 100)


def _predicted_class(cents: int) -> str:
    if cents < 5_000_000:
        return "1-URGENT"
    if cents < 10_000_000:
        return "2-HIGH"
    if cents < 20_000_000:
        return "3-MEDIUM"
    if cents < 35_000_000:
        return "4-NOT SPECIFIED"
    return "5-LOW"


# --- multi-class one-vs-rest PRF ------------------------------------------------


def test_macro_f1_matches_confusion_reference(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    n_true = defaultdict(int)
    n_pred = defaultdict(int)
    tp = defaultdict(int)
    for r in orders:
        t, p = r.o_orderpriority, _predicted_class(_cents(r.o_totalprice))
        n_true[t] += 1
        n_pred[p] += 1
        if t == p:
            tp[t] += 1
    got = {
        r["class"]: r
        for r in registry.QUERIES["ml_macro_f1"](spark, SF_DIR).collect()
    }
    assert set(got) == set(n_true)
    for c in n_true:
        r = got[c]
        assert (r.n_true, r.n_pred, r.tp) == (n_true[c], n_pred[c], tp[c])
        if n_pred[c] > 0:
            assert r.precision == pytest.approx(tp[c] / n_pred[c], abs=1e-6)
        else:
            assert r.precision is None
        assert r.recall == pytest.approx(tp[c] / n_true[c], abs=1e-6)
        if n_pred[c] > 0 and (tp[c] / n_pred[c] + tp[c] / n_true[c]) > 0:
            prec, rec = tp[c] / n_pred[c], tp[c] / n_true[c]
            assert r.f1 == pytest.approx(
                2 * prec * rec / (prec + rec), abs=1e-6
            )


# --- Brier decomposition --------------------------------------------------------


def test_brier_decomposition_matches_reference(spark):
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    lo = min(r.c_acctbal for r in cust)
    hi = max(r.c_acctbal for r in cust)
    sl = [
        (
            (r.c_acctbal - lo) / (hi - lo),
            1.0 if r.c_mktsegment == "BUILDING" else 0.0,
        )
        for r in cust
    ]
    n = len(sl)
    ybar = sum(y for _, y in sl) / n
    brier = sum((s - y) ** 2 for s, y in sl) / n
    bins = defaultdict(list)
    for s, y in sl:
        bins[min(int(s * 10), 9)].append((s, y))
    rel = sum(
        len(v)
        * (sum(s for s, _ in v) / len(v) - sum(y for _, y in v) / len(v)) ** 2
        for v in bins.values()
    ) / n
    res = sum(
        len(v) * (sum(y for _, y in v) / len(v) - ybar) ** 2
        for v in bins.values()
    ) / n
    ece = sum(
        len(v)
        * abs(sum(s for s, _ in v) / len(v) - sum(y for _, y in v) / len(v))
        for v in bins.values()
    ) / n
    row = registry.QUERIES["ml_brier_decomposition"](spark, SF_DIR).collect()[0]
    assert row.n == n
    assert row.brier == pytest.approx(brier, abs=1e-6)
    assert row.reliability == pytest.approx(rel, abs=1e-6)
    assert row.resolution == pytest.approx(res, abs=1e-6)
    assert row.uncertainty == pytest.approx(ybar * (1 - ybar), abs=1e-6)
    assert row.ece == pytest.approx(ece, abs=1e-6)
    # Murphy identity holds up to the within-bin score variance term
    # (forecasts inside a bin are not constant): brier >= rel - res + unc
    # minus rounding slack
    assert row.brier >= row.reliability - row.resolution + row.uncertainty - 1e-4


# --- WOE / IV -------------------------------------------------------------------


def test_woe_iv_matches_reference(spark):
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    lo = min(r.c_acctbal for r in cust)
    hi = max(r.c_acctbal for r in cust)
    pos = defaultdict(int)
    neg = defaultdict(int)
    for r in cust:
        b = min(int((r.c_acctbal - lo) / (hi - lo) * 10), 9)
        if r.c_mktsegment == "BUILDING":
            pos[b] += 1
        else:
            neg[b] += 1
    tot_pos, tot_neg = sum(pos.values()), sum(neg.values())
    got = {
        r.bin: r for r in registry.QUERIES["ml_woe_iv"](spark, SF_DIR).collect()
    }
    iv_total = 0.0
    for b, r in got.items():
        assert (r.n_pos, r.n_neg) == (pos[b], neg[b])
        if pos[b] > 0 and neg[b] > 0:
            woe = math.log((pos[b] / tot_pos) / (neg[b] / tot_neg))
            assert r.woe == pytest.approx(woe, abs=1e-6)
            assert r.iv_contrib == pytest.approx(
                (pos[b] / tot_pos - neg[b] / tot_neg) * woe, abs=1e-6
            )
            iv_total += r.iv_contrib
        else:
            assert r.woe is None and r.iv_contrib is None
    assert iv_total >= 0.0  # IV is a sum of non-negative terms


# --- McNemar --------------------------------------------------------------------


def test_mcnemar_matches_reference(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    lines = defaultdict(int)
    for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect():
        lines[r.l_orderkey] += 1
    d10 = defaultdict(int)
    d01 = defaultdict(int)
    for r in orders:
        a = 1 if _cents(r.o_totalprice) > 25_000_000 else 0
        b = 1 if lines.get(r.o_orderkey, 0) >= 4 else 0
        if (a, b) == (1, 0):
            d10[r.o_orderpriority] += 1
        elif (a, b) == (0, 1):
            d01[r.o_orderpriority] += 1
    got = {
        r.prio: r
        for r in registry.QUERIES["stats_mcnemar_test"](spark, SF_DIR).collect()
    }
    for prio, r in got.items():
        assert (r.n10, r.n01) == (d10[prio], d01[prio])
        disc = d10[prio] + d01[prio]
        if disc > 0:
            chi2 = max(abs(d10[prio] - d01[prio]) - 1, 0) ** 2 / disc
            assert r.mcnemar_chi2 == pytest.approx(chi2, abs=1e-6)
        else:
            assert r.mcnemar_chi2 is None


# --- Brown-Forsythe -------------------------------------------------------------


def _median(xs: list[int]) -> float:
    s = sorted(xs)
    n = len(s)
    mid = n // 2
    return float(s[mid]) if n % 2 else (s[mid - 1] + s[mid]) / 2.0


def test_levene_bf_matches_reference(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    by_grp = defaultdict(list)
    for r in orders:
        by_grp[r.o_orderpriority].append(_cents(r.o_totalprice))
    zs = {
        g: [abs(x - _median(v)) for x in v] for g, v in by_grp.items()
    }
    k = len(zs)
    n_tot = sum(len(z) for z in zs.values())
    zbar = sum(sum(z) for z in zs.values()) / n_tot
    ssb = sum(len(z) * (sum(z) / len(z) - zbar) ** 2 for z in zs.values())
    ssw = sum(
        sum((x - sum(z) / len(z)) ** 2 for x in z) for z in zs.values()
    )
    f_ref = (n_tot - k) / (k - 1) * ssb / ssw
    row = registry.QUERIES["stats_levene_bf"](spark, SF_DIR).collect()[0]
    assert (row.n_groups, row.n_total) == (k, n_tot)
    assert row.bf_f_stat == pytest.approx(f_ref, rel=1e-6)
    assert row.bf_f_stat >= 0.0


# --- Durbin-Watson --------------------------------------------------------------


def test_durbin_watson_matches_reference(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    cust = {
        r.c_custkey: r.c_nationkey
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    nname = {
        r.n_nationkey: r.n_name
        for r in spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    }
    monthly = defaultdict(lambda: defaultdict(int))
    for r in orders:
        t = (r.o_orderdate.year - 1992) * 12 + r.o_orderdate.month
        monthly[cust[r.o_custkey]][t] += _cents(r.o_totalprice)
    got = {
        r.nation: r
        for r in registry.QUERIES["stats_durbin_watson"](spark, SF_DIR).collect()
    }
    checked = 0
    for nk, series in monthly.items():
        ts = sorted(series)
        n = len(ts)
        if n <= 2:
            assert nname[nk] not in got
            continue
        ys = [series[t] / 100.0 for t in ts]
        st, sy = sum(ts), sum(ys)
        stt = sum(t * t for t in ts)
        sty = sum(t * y for t, y in zip(ts, ys))
        den = n * stt - st * st
        if den <= 0:
            continue
        b = (n * sty - st * sy) / den
        a = (sy - b * st) / n
        e = [y - a - b * t for t, y in zip(ts, ys)]
        sse = sum(x * x for x in e)
        ssd = sum((e[i] - e[i - 1]) ** 2 for i in range(1, n))
        r = got[nname[nk]]
        assert r.n_months == n
        if sse > 0:
            assert r.dw_stat == pytest.approx(ssd / sse, abs=1e-5)
            assert 0.0 <= r.dw_stat <= 4.0 + 1e-9
        checked += 1
    assert checked > 0


# --- HHI ------------------------------------------------------------------------


def test_hhi_matches_reference(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    sup = {
        r.s_suppkey: r.s_nationkey
        for r in spark.read.parquet(f"{SF_DIR}/supplier.parquet").collect()
    }
    nname = {
        r.n_nationkey: r.n_name
        for r in spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    }
    rev = defaultdict(int)
    for r in li:
        rev[r.l_suppkey] += _cents(r.l_extendedprice)
    by_nat = defaultdict(list)
    for sk, v in rev.items():
        by_nat[sup[sk]].append(v)
    got = {
        r.nation: r
        for r in registry.QUERIES["agg_hhi_concentration"](
            spark, SF_DIR
        ).collect()
    }
    for nk, revs in by_nat.items():
        tot = sum(revs)
        hhi = sum((v / tot) ** 2 for v in revs)
        r = got[nname[nk]]
        assert r.n_suppliers == len(revs)
        assert r.hhi == pytest.approx(hhi, abs=1e-6)
        assert r.effective_suppliers == pytest.approx(1.0 / hhi, rel=1e-5)
        # HHI bounds: 1/n (even) .. 1 (monopoly)
        assert 1.0 / len(revs) - 1e-9 <= r.hhi <= 1.0 + 1e-9


# --- pinball loss ---------------------------------------------------------------


def _quantile_cont(xs: list[int], p: float) -> float:
    s = sorted(xs)
    idx = (len(s) - 1) * p
    lo = int(math.floor(idx))
    hi = int(math.ceil(idx))
    return s[lo] + (s[hi] - s[lo]) * (idx - lo)


def test_pinball_loss_matches_reference(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    by_grp = defaultdict(list)
    for r in orders:
        by_grp[r.o_orderpriority].append(_cents(r.o_totalprice))
    got = {
        r.grp: r
        for r in registry.QUERIES["stats_pinball_loss"](spark, SF_DIR).collect()
    }
    for g, xs in by_grp.items():
        r = got[g]
        assert r.n == len(xs)
        for tau, qcol, pcol in (
            (0.1, "q10", "pinball_10"),
            (0.5, "q50", "pinball_50"),
            (0.9, "q90", "pinball_90"),
        ):
            q = _quantile_cont(xs, tau)
            assert r[qcol] == pytest.approx(q / 100.0, abs=1e-6)
            loss = sum(
                tau * (x - q) if x >= q else (1 - tau) * (q - x) for x in xs
            ) / len(xs)
            assert r[pcol] == pytest.approx(loss / 100.0, abs=1e-4)
        # pinball_50 = half the mean absolute deviation from the median
        mad = sum(abs(x - _quantile_cont(xs, 0.5)) for x in xs) / len(xs)
        assert r["pinball_50"] == pytest.approx(mad / 2.0 / 100.0, abs=1e-4)


# --- incremental MinHash screen -------------------------------------------------


def test_incr_screen_matches_full_corpus_pairs(spark):
    """The incremental screen must find EXACTLY the (store, new) candidate
    pairs the full-corpus banding finds — incrementality changes the cost,
    never the answer."""
    from airflow_dags_spark.operators.dedup import minhash_candidate_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    full_pairs = minhash_candidate_pairs(docs, "text", "doc_id").collect()
    import hashlib

    def is_store(doc_id: int) -> bool:
        return hashlib.md5(str(doc_id).encode()).hexdigest()[0] < "d"

    cross = defaultdict(set)  # new doc -> store partners
    for r in full_pairs:
        for new, store in ((r.key_a, r.key_b), (r.key_b, r.key_a)):
            if not is_store(new) and is_store(store):
                cross[new].add(store)
    got = {
        r.doc_id: r
        for r in registry.QUERIES["dedup_minhash_incr_screen"](
            spark, SF_DIR
        ).collect()
    }
    all_new = {r.doc_id for r in docs.collect() if not is_store(r.doc_id)}
    assert set(got) == all_new
    for doc_id, r in got.items():
        if doc_id in cross:
            assert r.matched_store_doc == min(cross[doc_id])
            assert 1 <= r.n_matching_bands <= 4
        else:
            assert r.matched_store_doc is None
            assert r.n_matching_bands == 0
    # the synthetic corpus contains near-dups: the screen must catch some
    assert any(r.matched_store_doc is not None for r in got.values())


def test_incr_screen_operator_reads_persisted_store(spark, tmp_path):
    """Production contract: the store is signatures persisted by a previous
    run — sign once, write, read back, screen new docs against it."""
    from airflow_dags_spark.operators.dedup import (
        minhash_bands,
        minhash_incremental_screen,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    store_docs = docs.where(F.col("doc_id") % 2 == 0)
    new_docs = docs.where(F.col("doc_id") % 2 == 1)
    store_path = str(tmp_path / "sig_store")
    minhash_bands(store_docs, "text", "doc_id").write.parquet(store_path)
    store = spark.read.parquet(store_path)
    out = minhash_incremental_screen(store, new_docs, "text", "doc_id")
    rows = out.collect()
    assert {r.doc_id for r in rows} == {
        r.doc_id for r in new_docs.select("doc_id").collect()
    }
    # self-consistency: every reported match shares at least one band value
    bands_store = {
        r.doc_id: (r.band_0, r.band_1, r.band_2, r.band_3)
        for r in store.collect()
    }
    bands_new = {
        r.doc_id: (r.band_0, r.band_1, r.band_2, r.band_3)
        for r in minhash_bands(new_docs, "text", "doc_id").collect()
    }
    for r in rows:
        if r.matched_store_doc is not None:
            shared = sum(
                1
                for i in range(4)
                if bands_new[r.doc_id][i] is not None
                and bands_new[r.doc_id][i]
                == bands_store[r.matched_store_doc][i]
            )
            assert shared >= 1


# --- Arrow-batched linear scoring -----------------------------------------------


def test_linear_score_arrow_matches_expression(spark):
    from airflow_dags_spark.operators.scoring import linear_score_arrow

    c = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .select(
            "c_custkey",
            F.col("c_acctbal").cast("double").alias("bal"),
            F.col("c_nationkey").cast("double").alias("nk"),
        )
    )
    got = {
        r.c_custkey: r.score
        for r in linear_score_arrow(
            c, ["bal", "nk"], [0.0003, -0.01], 0.1
        ).collect()
    }
    expect = {
        r.c_custkey: r.s
        for r in c.select(
            "c_custkey",
            (F.lit(0.1) + 0.0003 * F.col("bal") + -0.01 * F.col("nk")).alias(
                "s"
            ),
        ).collect()
    }
    assert got == expect  # bit-identical, not approx


def test_linear_score_arrow_validates_inputs(spark):
    from airflow_dags_spark.operators.scoring import linear_score_arrow

    df = spark.createDataFrame([(1.0, 2.0)], "a double, b double")
    with pytest.raises(ValueError, match="weights"):
        linear_score_arrow(df, ["a", "b"], [1.0], 0.0)
    with pytest.raises(ValueError, match="already exists"):
        linear_score_arrow(
            df, ["a"], [1.0], 0.0, output_col="b"
        )

"""Round-7 operators: URL canonicalization, LLR collocations, threshold
sweep, NDCG@10, Theil decomposition, Wilcoxon signed-rank, Poisson
bootstrap, multi-fraction weighted quantiles — each checked against an
independent pure-Python/NumPy computation (DuckDB hash parity is covered by
the registry sweep)."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from airflow_dags_spark.plans import registry

registry.load_all()

SF_DIR = "/root/testdata/sf0.001"


# --- URL canonicalization -------------------------------------------------------


def _canon_py(doc_id: int, source: str) -> str:
    u = (
        f"HTTPS://WWW.{source.upper()}.Example.COM:443/Docs/{doc_id % 400}"
        + ("/" if doc_id % 3 == 0 else "")
        + f"?utm_source=feed&id={doc_id % 5}"
        + ("&utm_campaign=x" if doc_id % 2 == 0 else "")
        + ("#frag" if doc_id % 7 == 0 else "")
    )
    u = re.sub(r"#.*$", "", u)
    m = re.match(r"^[a-zA-Z]+://[^/?]+", u)
    u = m.group(0).lower() + u[m.end():]
    u = u.replace(":443/", "/").replace("://www.", "://")
    u = re.sub(r"utm_[^&#]*&?", "", u)
    u = re.sub(r"[?&]+$", "", u.replace("?&", "?"))
    return re.sub(r"/$", "", u)


def test_url_canonical_matches_python_reference(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source"
    ).collect()
    by_src: dict = {}
    for r in docs:
        by_src.setdefault(r.source, []).append(_canon_py(r.doc_id, r.source))
    got = {
        r.source: r
        for r in registry.QUERIES["dedup_url_canonical"](spark, SF_DIR).collect()
    }
    assert set(got) == set(by_src)
    for src, canons in by_src.items():
        assert got[src].n_urls == len(canons)
        assert got[src].n_canonical == len(set(canons))
        assert got[src].sample_canonical == min(canons)
        # every canonical form is tracking-free, lowercase-host, no port
        for c in set(canons):
            assert "utm_" not in c and "#" not in c and ":443" not in c
            assert c.startswith("https://") and "www." not in c


# --- LLR collocations -----------------------------------------------------------


def test_collocation_llr_matches_python_reference(spark):
    texts = [
        r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    ]
    from collections import Counter

    pair, first, second = Counter(), Counter(), Counter()
    for t in texts:
        xs = t.split(" ")
        for a, b in zip(xs, xs[1:]):
            pair[(a, b)] += 1
            first[a] += 1
            second[b] += 1
    n = sum(pair.values())

    def s(x):
        return x * math.log(x) if x > 0 else 0.0

    def llr(a, b):
        k11 = pair[(a, b)]
        c1, c2 = first[a], second[b]
        k12, k21, k22 = c1 - k11, c2 - k11, n - c1 - c2 + k11
        return 2.0 * (
            s(k11) + s(k12) + s(k21) + s(k22) + s(n)
            - s(c1) - s(n - c1) - s(c2) - s(n - c2)
        )

    got = registry.QUERIES["text_collocation_llr"](spark, SF_DIR).collect()
    assert 0 < len(got) <= 30
    for r in got:
        assert pair[(r.t1, r.t2)] == r.pair_count >= 20
        assert r.llr == pytest.approx(llr(r.t1, r.t2), abs=2e-3)
    # descending by rounded llr
    vals = [r.llr for r in got]
    assert vals == sorted(vals, reverse=True)


# --- threshold sweep ------------------------------------------------------------


def test_threshold_sweep_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        F.col("embedding")[0].cast("double").alias("s"), "label"
    ).collect()
    score = np.array([r.s for r in emb])
    pos = np.array([r.label % 2 == 0 for r in emb])
    got = {
        round(r.threshold, 2): r
        for r in registry.QUERIES["ml_threshold_sweep_prf"](spark, SF_DIR).collect()
    }
    assert len(got) == 9
    for i in range(-4, 5):
        t = round(i * 0.05, 2)
        p = score >= i * 0.05
        tp = int((p & pos).sum())
        fp = int((p & ~pos).sum())
        fn = int((~p & pos).sum())
        r = got[t]
        assert (r.tp, r.fp, r.fn) == (tp, fp, fn)
        if tp + fp:
            assert r.precision == pytest.approx(tp / (tp + fp), abs=1e-6)
        if 2 * tp + fp + fn:
            assert r.f1 == pytest.approx(2 * tp / (2 * tp + fp + fn), abs=1e-6)


# --- NDCG@10 --------------------------------------------------------------------


def test_ndcg_matches_python_reference(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").where(
        F.col("user_id").isNotNull()
    ).collect()
    from collections import defaultdict

    # exact integer cents, mirroring the impl/oracle: a float accumulator
    # here could rank-swap a true tie that the engines break on user_id
    v = defaultdict(int)
    rel = defaultdict(int)
    for r in ev:
        v[(r.event_type, r.user_id)] += round(r.value * 100)
        if r.event_type == "purchase":
            rel[r.user_id] += 1
    by_et = defaultdict(list)
    for (et, uid), val in v.items():
        by_et[et].append((uid, val, rel[uid]))

    def dcg(seq):
        return sum(r / math.log2(p + 2) for p, (_, _, r) in enumerate(seq[:10]))

    got = {
        r.event_type: r
        for r in registry.QUERIES["ml_ndcg_at_k"](spark, SF_DIR).collect()
    }
    for et, items in by_et.items():
        pred = sorted(items, key=lambda x: (-x[1], x[0]))
        ideal = sorted(items, key=lambda x: (-x[2], x[0]))
        d, i = dcg(pred), dcg(ideal)
        assert got[et].dcg == pytest.approx(d, abs=2e-6)
        assert got[et].idcg == pytest.approx(i, abs=2e-6)
        if i > 0:
            assert got[et].ndcg == pytest.approx(d / i, abs=2e-6)
            assert 0.0 <= got[et].ndcg <= 1.0
        assert got[et].dcg <= got[et].idcg + 1e-9


# --- Theil decomposition --------------------------------------------------------


def test_theil_decomposition_identity_and_numpy(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    c = {
        r.c_custkey: r.c_nationkey
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    from collections import defaultdict

    cust = defaultdict(float)
    for r in o:
        cust[r.o_custkey] += r.o_totalprice
    x = np.array(list(cust.values()))
    mu = x.mean()
    t_total_ref = float(np.mean((x / mu) * np.log(x / mu)))

    rows = registry.QUERIES["stats_theil_index"](spark, SF_DIR).collect()
    assert rows
    # identity: T_total == T_between + sum(contribution), to rounding
    contrib_sum = sum(r.contribution for r in rows)
    t_between = rows[0].t_between
    t_total = rows[0].t_total
    assert t_total == pytest.approx(t_between + contrib_sum, abs=2e-5)
    # direct independent total
    assert t_total == pytest.approx(t_total_ref, abs=2e-5)
    # within-group terms are nonnegative (Jensen)
    for r in rows:
        assert r.t_within >= -1e-9


# --- Wilcoxon signed-rank -------------------------------------------------------


def test_wilcoxon_matches_python_reference(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_partkey", "l_shipdate", "l_quantity"
    ).collect()
    parts = {
        r.p_partkey: r.p_brand
        for r in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    }
    from collections import defaultdict

    q = defaultdict(lambda: [0.0, 0.0, 0, 0])  # q94, q95, n94, n95
    for r in li:
        y = r.l_shipdate.year
        if y == 1994:
            q[(parts[r.l_partkey], r.l_partkey)][0] += r.l_quantity
            q[(parts[r.l_partkey], r.l_partkey)][2] += 1
        elif y == 1995:
            q[(parts[r.l_partkey], r.l_partkey)][1] += r.l_quantity
            q[(parts[r.l_partkey], r.l_partkey)][3] += 1
    by_brand = defaultdict(list)
    for (brand, _), (q94, q95, n94, n95) in q.items():
        if n94 > 0 and n95 > 0 and q94 != q95:
            by_brand[brand].append(q95 - q94)

    got = {
        r.brand: r
        for r in registry.QUERIES["stats_wilcoxon_signed_rank"](
            spark, SF_DIR
        ).collect()
    }
    for brand, diffs in by_brand.items():
        n = len(diffs)
        if n < 10:
            assert brand not in got
            continue
        ad = np.abs(diffs)
        order = np.argsort(ad, kind="stable")
        ranks = np.empty(n)
        # average ranks over ties
        sorted_ad = ad[order]
        i = 0
        while i < n:
            j = i
            while j < n and sorted_ad[j] == sorted_ad[i]:
                j += 1
            ranks[order[i:j]] = (i + 1 + j) / 2.0
            i = j
        w_plus = float(ranks[np.array(diffs) > 0].sum())
        _, counts = np.unique(ad, return_counts=True)
        tie_corr = float(((counts**3 - counts) / 48.0).sum())
        var = n * (n + 1) * (2 * n + 1) / 24.0 - tie_corr
        z = (w_plus - n * (n + 1) / 4.0) / math.sqrt(var)
        r = got[brand]
        assert r.n == n
        assert r.w_plus == pytest.approx(w_plus, abs=0.051)
        assert r.z == pytest.approx(z, abs=2e-6)


# --- Poisson bootstrap ----------------------------------------------------------


def _poisson_weight(u: float) -> int:
    cdf = [
        0.367879441171442, 0.735758882342885, 0.919698602928606,
        0.981011843123846, 0.996340153172656, 0.999405815182418,
        0.999916758850712,
    ]
    for w, t in enumerate(cdf):
        if u < t:
            return w
    return 7


def test_poisson_bootstrap_matches_python_reference(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    ).collect()
    means = []
    for rep in range(200):
        g, j = rep // 4, rep % 4
        sx = sw = 0.0
        for r in o:
            h = hashlib.md5(f"pb|{r.o_orderkey}|{g}".encode()).hexdigest()
            w32 = int(h[8 * j : 8 * j + 8], 16)
            u = ((w32 % 999999) + 0.5) / 1000000.0
            w = _poisson_weight(u)
            sx += w * r.o_totalprice
            sw += w
        if sw > 0:
            means.append(sx / sw)
    means = np.array(means)
    got = registry.QUERIES["stats_poisson_bootstrap_ci"](spark, SF_DIR).first()
    assert got.n_replicas == len(means) == 200
    assert got.boot_mean == pytest.approx(means.mean(), abs=0.006)
    assert got.boot_se == pytest.approx(means.std(ddof=1), abs=6e-4)
    point = float(np.mean([r.o_totalprice for r in o]))
    assert got.point_mean == pytest.approx(point, abs=0.006)
    assert got.ci_lo <= got.boot_mean <= got.ci_hi
    # CI brackets the point estimate at this sample size
    assert got.ci_lo <= point <= got.ci_hi


def test_poisson_bootstrap_deterministic_across_runs(spark):
    a = registry.QUERIES["stats_poisson_bootstrap_ci"](spark, SF_DIR).first()
    b = registry.QUERIES["stats_poisson_bootstrap_ci"](spark, SF_DIR).first()
    assert a == b


# --- multi-fraction weighted quantiles ------------------------------------------


def test_weighted_quantiles_match_naive_window(spark):
    from pyspark.sql import Window

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tw = Window.partitionBy("l_returnflag")
    c = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("l_quantity").over(w).alias("cw"),
        F.sum("l_quantity").over(tw).alias("tw"),
    )
    ref = {}
    for frac, name in ((0.25, "w_p25"), (0.5, "w_p50"), (0.75, "w_p75")):
        rows = (
            c.where(F.col("cw") >= F.col("tw") * frac)
            .groupBy("l_returnflag")
            .agg(F.min("l_extendedprice").alias("v"))
            .collect()
        )
        for r in rows:
            ref.setdefault(r.l_returnflag, {})[name] = round(r.v, 2)
    got = registry.QUERIES["agg_weighted_quantiles"](spark, SF_DIR).collect()
    assert {r.l_returnflag for r in got} == set(ref)
    for r in got:
        assert r.w_p25 == ref[r.l_returnflag]["w_p25"]
        assert r.w_p50 == ref[r.l_returnflag]["w_p50"]
        assert r.w_p75 == ref[r.l_returnflag]["w_p75"]
        assert r.w_p25 <= r.w_p50 <= r.w_p75


def test_weighted_quantiles_bucketed_agrees_with_single_frac(spark):
    """The multi-fraction form must be row-identical to the historical
    single-fraction function at frac=0.5."""
    from airflow_dags_spark.functions.scalable_windows import (
        weighted_median_bucketed,
        weighted_quantiles_bucketed,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    single = {
        r.l_returnflag: r.weighted_median
        for r in weighted_median_bucketed(
            li,
            "l_returnflag",
            "l_extendedprice",
            "l_quantity",
            ["l_orderkey", "l_linenumber"],
        ).collect()
    }
    multi = {
        r.l_returnflag: r.m
        for r in weighted_quantiles_bucketed(
            li,
            "l_returnflag",
            "l_extendedprice",
            "l_quantity",
            ["l_orderkey", "l_linenumber"],
            {"m": 0.5},
        ).collect()
    }
    assert single == multi


def test_weighted_quantiles_bucketed_rejects_bad_frac(spark):
    from airflow_dags_spark.functions.scalable_windows import (
        weighted_quantiles_bucketed,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    with pytest.raises(ValueError, match="frac"):
        weighted_quantiles_bucketed(
            li, "l_returnflag", "l_extendedprice", "l_quantity", [], {"q": 1.5}
        )


# --- MMR re-ranking -------------------------------------------------------------


def test_mmr_rerank_matches_python_reference(spark):
    """Exact greedy reference: same rounded relevances, same λ·rel −
    (1−λ)·max-redundancy objective, same (score desc, cid asc)
    tie-break — row-identical to the operator."""
    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    unit = {
        k: (v / np.linalg.norm(v) if np.linalg.norm(v) > 0 else v)
        for k, v in emb.items()
    }
    lam, pool, k = 0.7, 50, 10
    expect = []
    for qid in range(5):
        sims = {
            cid: round(float(unit[qid] @ unit[cid]), 6) for cid in emb
        }
        cands = sorted(sims, key=lambda c: (-sims[c], c))[:pool]
        rel = {c: sims[c] for c in cands}
        selected = []
        remaining = list(cands)
        while remaining and len(selected) < k:
            best = None
            for c in remaining:
                red = max(
                    (float(unit[c] @ unit[s]) for s in selected), default=0.0
                )
                score = round(lam * rel[c] - (1 - lam) * red, 6)
                if best is None or score > best[0] or (
                    score == best[0] and c < best[1]
                ):
                    best = (score, c, red)
            score, c, red = best
            selected.append(c)
            remaining.remove(c)
            expect.append((qid, len(selected), c, rel[c], round(red, 6), score))

    got = sorted(
        registry.QUERIES["sim_mmr_rerank"](spark, SF_DIR).collect(),
        key=lambda r: (r.qid, r.rank),
    )
    assert len(got) == len(expect) == 50
    for row, (qid, rank, cid, r_rel, r_red, r_score) in zip(got, expect):
        assert (row.qid, row.rank, row.cid) == (qid, rank, cid)
        assert row.relevance == pytest.approx(r_rel, abs=1e-9)
        assert row.redundancy == pytest.approx(r_red, abs=1e-9)
        assert row.mmr_score == pytest.approx(r_score, abs=1e-9)


def test_mmr_rank1_is_pure_relevance_and_diversity_kicks_in(spark):
    rows = registry.QUERIES["sim_mmr_rerank"](spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    for qid, lst in by_q.items():
        lst.sort(key=lambda r: r.rank)
        # rank 1 has no prior picks: zero redundancy, max relevance
        assert lst[0].redundancy == 0.0
        assert lst[0].relevance == max(r.relevance for r in lst)
        # the query vector itself is its own top hit (cosine 1.0)
        assert lst[0].cid == qid and lst[0].relevance == pytest.approx(1.0)
        # later picks pay a redundancy penalty
        assert any(r.redundancy > 0 for r in lst[1:])


def test_mmr_rejects_k_above_pool(spark):
    from airflow_dags_spark.operators.similarity import mmr_rerank

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    with pytest.raises(ValueError, match="pool"):
        mmr_rerank(q, c, k=60, pool=50)


# --- Benjamini-Hochberg FDR -----------------------------------------------------


def test_bh_fdr_matches_python_reference(spark):
    """Reference uses math.erf (exact) for the sanity band and the exact
    A&S 7.1.26 polynomial for the row-level equality, plus an independent
    numpy BH step-up."""
    wil = {
        r.brand: r.z
        for r in registry.QUERIES["stats_wilcoxon_signed_rank"](
            spark, SF_DIR
        ).collect()
    }
    got = sorted(
        registry.QUERIES["stats_bh_fdr"](spark, SF_DIR).collect(),
        key=lambda r: (r.p_value, r.brand),
    )
    assert {r.brand for r in got} == set(wil)

    def phi_as(z):
        x = abs(z) / math.sqrt(2.0)
        t = 1.0 / (1.0 + 0.3275911 * x)
        erf = 1.0 - (
            ((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
              - 0.284496736) * t + 0.254829592
        ) * t * math.exp(-x * x)
        return 0.5 * (1.0 + erf)

    ps = {}
    for brand, z in wil.items():
        p_as = 2.0 * (1.0 - phi_as(z))
        p_exact = 2.0 * (1.0 - 0.5 * (1.0 + math.erf(abs(z) / math.sqrt(2.0))))
        assert abs(p_as - p_exact) < 3e-7  # A&S max error bound
        ps[brand] = p_as
    # z in the output matches the Wilcoxon query's z (same stat frame)
    for r in got:
        assert r.z == pytest.approx(wil[r.brand], abs=2e-6)
        assert r.p_value == pytest.approx(ps[r.brand], abs=2e-6)
    # independent BH step-up
    order = sorted(ps, key=lambda b: (ps[b], b))
    m = len(order)
    raw = [ps[b] * m / (i + 1) for i, b in enumerate(order)]
    adj = raw[:]
    for i in range(m - 2, -1, -1):
        adj[i] = min(adj[i], adj[i + 1])
    expect = {b: min(a, 1.0) for b, a in zip(order, adj)}
    for r in got:
        assert r.p_adjusted == pytest.approx(expect[r.brand], abs=2e-6)
        assert r.significant_q05 == (expect[r.brand] < 0.05)
    # monotone in p: adjusted values are non-decreasing along raw-p order
    adj_seq = [r.p_adjusted for r in got]
    assert adj_seq == sorted(adj_seq)

"""Round-5 operators: rank/moment statistics, BM25, sorted-neighborhood
dedup, co-occurrence graph metrics, l-diversity — each checked against an
independent pure-Python/NumPy computation (the DuckDB hash parity is
covered by test_oracle_parity's registry sweep)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from airflow_dags_spark.functions.privacy import l_diversity_report
from airflow_dags_spark.functions.stats import (
    mann_whitney_u,
    ols_two_features,
    welch_ttest,
)
from airflow_dags_spark.operators.dedup import sorted_neighborhood_pairs
from airflow_dags_spark.operators.graph import (
    co_occurrence_edges,
    degree_histogram,
    triangle_count,
)
from airflow_dags_spark.operators.inverted import bm25_scores

# --- Mann-Whitney U -------------------------------------------------------------


def _mw_reference(a: list[float], b: list[float]):
    """Textbook U with average ranks for ties, O(n^2) but obviously right."""
    pooled = sorted(a + b)
    ranks = {}
    for v in set(pooled):
        idxs = [i + 1 for i, x in enumerate(pooled) if x == v]
        ranks[v] = sum(idxs) / len(idxs)
    r_a = sum(ranks[v] for v in a)
    u_a = r_a - len(a) * (len(a) + 1) / 2
    return u_a, len(a) * len(b) - u_a


def test_mann_whitney_matches_reference_with_ties(spark):
    a = [1.0, 2.0, 2.0, 3.0, 5.0, 7.0, 7.0]
    b = [2.0, 4.0, 4.0, 6.0, 7.0, 8.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    got = mann_whitney_u(df, "v", "g", "a", "b").first()
    u_a, u_b = _mw_reference(a, b)
    assert got["n_a"] == len(a) and got["n_b"] == len(b)
    assert got["u_a"] == pytest.approx(u_a)
    assert got["u_b"] == pytest.approx(u_b)
    # z sanity: U below its mean → negative z
    assert (got["z"] < 0) == (u_a < len(a) * len(b) / 2)


def test_mann_whitney_identical_groups_z_zero(spark):
    vals = [float(i % 10) for i in range(40)]
    rows = [("a", v) for v in vals] + [("b", v) for v in vals]
    df = spark.createDataFrame(rows, "g string, v double")
    got = mann_whitney_u(df, "v", "g", "a", "b").first()
    # identical samples: U = n^2/2 exactly, z = 0
    assert got["u_a"] == pytest.approx(len(vals) ** 2 / 2)
    assert got["z"] == pytest.approx(0.0)


def test_mann_whitney_all_tied_single_value(spark):
    """One distinct value: every rank is the midrank; U = n_a*n_b/2 and
    sigma's tie term removes ALL variance → z division by zero stays
    null rather than crashing."""
    rows = [("a", 5.0)] * 4 + [("b", 5.0)] * 6
    df = spark.createDataFrame(rows, "g string, v double")
    got = mann_whitney_u(df, "v", "g", "a", "b").first()
    assert got["u_a"] == pytest.approx(12.0)
    assert got["z"] is None or math.isnan(got["z"])


# --- Welch t --------------------------------------------------------------------


def test_welch_matches_numpy(spark):
    rng = np.random.RandomState(7)
    a = rng.normal(10, 2, 40).tolist()
    b = rng.normal(11, 4, 25).tolist()
    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    got = welch_ttest(df, "v", "g", "a", "b").first()
    va, vb = np.var(a, ddof=1), np.var(b, ddof=1)
    se = va / len(a) + vb / len(b)
    t = (np.mean(a) - np.mean(b)) / math.sqrt(se)
    dfw = se**2 / ((va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1))
    assert got["t_stat"] == pytest.approx(t, abs=1e-5)
    assert got["df_welch"] == pytest.approx(dfw, abs=1e-3)
    assert got["mean_a"] == pytest.approx(np.mean(a), abs=1e-5)


# --- OLS ------------------------------------------------------------------------


def test_ols_matches_numpy_lstsq(spark):
    rng = np.random.RandomState(3)
    x1 = rng.uniform(0, 10, 200)
    x2 = rng.uniform(-5, 5, 200)
    y = 4.0 + 2.5 * x1 - 1.75 * x2 + rng.normal(0, 0.5, 200)
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(y, x1, x2)]
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    got = ols_two_features(df, "y", "x1", "x2").first()
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert got["b0"] == pytest.approx(beta[0], abs=1e-4)
    assert got["b1"] == pytest.approx(beta[1], abs=1e-4)
    assert got["b2"] == pytest.approx(beta[2], abs=1e-4)
    resid = y - X @ beta
    r2 = 1 - resid.var() / y.var()
    assert got["r2"] == pytest.approx(r2, abs=1e-4)


def test_ols_exact_on_noiseless_plane(spark):
    rows = [(1.0 + 2.0 * i - 3.0 * j, float(i), float(j))
            for i in range(10) for j in range(7)]
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    got = ols_two_features(df, "y", "x1", "x2").first()
    assert (got["b0"], got["b1"], got["b2"], got["r2"]) == (1.0, 2.0, -3.0, 1.0)


# --- BM25 -----------------------------------------------------------------------


def _bm25_reference(docs: dict[int, str], terms: list[str], k1=1.2, b=0.75):
    toks = {d: t.lower().split() for d, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for term in terms:
        df = sum(1 for t in toks.values() if term in t)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, t in toks.items():
            tf = t.count(term)
            if tf:
                dl = len(t)
                s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
                out[d] = out.get(d, 0.0) + s
    return {d: round(s, 6) for d, s in out.items()}


def test_bm25_matches_reference(spark):
    docs = {
        1: "spark merge stream merge merge",
        2: "vector vector stream table join",
        3: "totally unrelated words here",
        4: "merge",
        5: "stream stream stream stream stream stream",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id bigint, text string")
    got = {
        r["doc"]: r["score"]
        for r in bm25_scores(df, "text", "doc_id", ["merge", "stream", "vector"]).collect()
    }
    assert got == pytest.approx(_bm25_reference(docs, ["merge", "stream", "vector"]))


def test_bm25_rare_term_outranks_common_at_equal_tf(spark):
    """idf must dominate: a doc hitting only the rare term scores above a
    doc hitting only the ubiquitous one (equal tf, equal length)."""
    docs = {i: "common filler words here" for i in range(1, 9)}
    docs[1] = "rare filler words here"
    df = spark.createDataFrame(list(docs.items()), "doc_id bigint, text string")
    got = {
        r["doc"]: r["score"]
        for r in bm25_scores(df, "text", "doc_id", ["rare", "common"]).collect()
    }
    assert got[1] > max(v for k, v in got.items() if k != 1)


def test_bm25_requires_terms(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        bm25_scores(df, "text", "doc_id", [])


# --- sorted neighborhood ---------------------------------------------------------


def _snm_reference(rows, window, threshold):
    norm = lambda s: " ".join(s.lower().split())  # noqa: E731
    ordered = sorted(rows, key=lambda r: (norm(r[1]), r[0]))
    out = {}
    for i, (ka, ta) in enumerate(ordered):
        for kb, tb in ordered[i + 1 : i + 1 + window]:
            sa, sb = set(norm(ta).split()), set(norm(tb).split())
            j = len(sa & sb) / len(sa | sb)
            if j >= threshold:
                out[(min(ka, kb), max(ka, kb))] = round(j, 6)
    return out


def test_snm_matches_window_brute_force(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta epsilon"),
        (3, "alpha beta gamma"),
        (4, "zeta eta theta iota"),
        (5, "zeta eta theta iota kappa"),
        (6, "mid range doc one"),
        (7, "mid range doc two"),
        (8, "alpha beta gamma delta"),  # same tokens as 1 → jaccard 1.0
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    for w, t in [(2, 0.5), (5, 0.7), (3, 1.0)]:
        got = {
            (r["key_a"], r["key_b"]): r["jaccard"]
            for r in sorted_neighborhood_pairs(
                df, "text", "doc_id", window=w, threshold=t
            ).collect()
        }
        assert got == pytest.approx(_snm_reference(rows, w, t)), (w, t)


def test_snm_candidates_bounded_by_window(spark):
    """Identical docs far apart in sort order must NOT pair (positional
    contract): with window=1 only adjacent pairs are candidates."""
    rows = [
        (1, "aaa same tokens"),
        (2, "bbb different things"),
        (3, "aaa same tokens"),
    ]
    # sort order: (aaa..,1), (aaa..,3), (bbb..,2) → 1-3 adjacent, pair found
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted_neighborhood_pairs(df, "text", "doc_id", window=1, threshold=0.9)
    assert {(r["key_a"], r["key_b"]) for r in got.collect()} == {(1, 3)}


def test_snm_rejects_bad_window(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "text", "doc_id", window=0)


# --- co-occurrence graph -----------------------------------------------------------


def test_cooccurrence_triangles_and_degrees_on_known_graph(spark):
    # groups: (g1: a,b,c) (g2: a,b,c) (g3: a,d) (g4: a,d) (g5: b,d)
    rows = []
    for g, items in [(1, "abc"), (2, "abc"), (3, "ad"), (4, "ad"), (5, "bd")]:
        rows += [(g, ch) for ch in items]
    df = spark.createDataFrame(rows, "g bigint, i string")
    edges = co_occurrence_edges(df, "g", "i", min_support=2)
    got_edges = {(r["src"], r["dst"]): r["support"] for r in edges.collect()}
    # support>=2: (a,b),(a,c),(b,c) from g1+g2; (a,d) from g3+g4; (b,d) only 1
    assert got_edges == {("a", "b"): 2, ("a", "c"): 2, ("b", "c"): 2, ("a", "d"): 2}
    tri = triangle_count(edges).first()
    assert (tri["n_nodes"], tri["n_edges"], tri["n_triangles"]) == (4, 4, 1)
    deg = {r["degree"]: r["n_nodes"] for r in degree_histogram(edges).collect()}
    # a:3, b:2, c:2, d:1
    assert deg == {3: 1, 2: 2, 1: 1}


def test_cooccurrence_dedups_within_group(spark):
    """An item repeated in one group must count once toward support."""
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "g bigint, i string")
    got = co_occurrence_edges(df, "g", "i", min_support=2).collect()
    assert [(r["src"], r["dst"], r["support"]) for r in got] == [("a", "b", 2)]


# --- l-diversity -------------------------------------------------------------------


def test_l_diversity_report_flags_homogeneous_class(spark):
    rows = [
        ("q1", "s1"), ("q1", "s1"), ("q1", "s1"),      # 3 rows, 1 value
        ("q2", "s1"), ("q2", "s2"), ("q2", "s3"),      # 3 rows, 3 values
    ]
    df = spark.createDataFrame(rows, "q string, s string")
    got = {
        r["q"]: (r["k_size"], r["l_distinct"], r["diverse"])
        for r in l_diversity_report(df, ["q"], "s", 2).collect()
    }
    assert got == {"q1": (3, 1, False), "q2": (3, 3, True)}


def test_l_diversity_generalize_applies_before_grouping(spark):
    rows = [(1, "a"), (2, "b"), (11, "a"), (12, "a")]
    df = spark.createDataFrame(rows, "age bigint, s string")
    got = l_diversity_report(
        df, ["age"], "s", 2, generalize={"age": (F.col("age") / 10).cast("int")}
    )
    m = {r["age"]: (r["k_size"], r["l_distinct"]) for r in got.collect()}
    assert m == {0: (2, 2), 1: (2, 1)}


def test_l_diversity_rejects_bad_l(spark):
    df = spark.createDataFrame([(1, "a")], "q bigint, s string")
    with pytest.raises(ValueError):
        l_diversity_report(df, ["q"], "s", 0)


# --- registry-level statistics checked against numpy on the real table --------------


def test_autocorr_and_cusum_match_numpy(spark, sf_dir):
    from airflow_dags_spark.plans.round5 import (
        stats_autocorr_daily,
        stats_cusum_changepoint,
    )
    import pandas as pd

    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = (orders.o_totalprice.round(2) * 100).round().astype("int64")
    daily = (
        pd.DataFrame({"day": orders.o_orderdate.dt.date, "c": cents})
        .groupby("day")["c"].sum().sort_index()
    )
    r = daily.to_numpy(dtype=float)
    got_acf = {
        row["lag"]: row["acf"]
        for row in stats_autocorr_daily(spark, sf_dir).collect()
    }
    for k in (1, 2, 3):
        want = np.corrcoef(r[k:], r[:-k])[0, 1]
        assert got_acf[k] == pytest.approx(want, abs=1e-5), k
    # CUSUM argmax on exact integers
    n = len(daily)
    cum = daily.cumsum().to_numpy()
    tot = int(daily.sum())
    sdev = n * cum - (np.arange(1, n + 1)) * tot
    idx = int(np.lexsort((np.arange(n), -np.abs(sdev)))[0])
    got = stats_cusum_changepoint(spark, sf_dir).first()
    assert got["day"] == str(daily.index[idx])
    assert got["cusum"] == pytest.approx(sdev[idx] / n / 100.0, abs=0.01)


def test_embedding_norms_match_numpy(spark, sf_dir):
    from airflow_dags_spark.plans.round5 import embeddings_norm_stats
    import pandas as pd

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mats = np.stack(emb.embedding.to_numpy())
    norms = np.sqrt((mats.astype(np.float64) ** 2).sum(axis=1))
    by_label = pd.DataFrame({"label": emb.label, "n": norms}).groupby("label")["n"]
    got = {r["label"]: r for r in embeddings_norm_stats(spark, sf_dir).collect()}
    for label, grp in by_label:
        row = got[int(label)]
        assert row["avg_norm"] == pytest.approx(grp.mean(), abs=1e-5)
        assert row["sd_norm"] == pytest.approx(grp.std(ddof=1), abs=1e-5)
        assert row["min_norm"] == pytest.approx(grp.min(), abs=1e-5)
        assert row["max_norm"] == pytest.approx(grp.max(), abs=1e-5)


def test_zipf_fit_recovers_synthetic_slope(spark, tmp_path):
    """A corpus whose word frequencies follow freq ∝ rank^(-1) exactly
    must fit slope ≈ −1 with r² ≈ 1."""
    words = []
    for rank in range(1, 21):
        words += [f"w{rank:02d}"] * max(3, round(600 / rank))
    # one long document per 50 words keeps the split/normalize path honest
    docs = [
        (i, " ".join(words[i * 50 : (i + 1) * 50]))
        for i in range(len(words) // 50)
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    path = str(tmp_path / "documents.parquet")
    df.write.parquet(path)
    from airflow_dags_spark.plans.round5 import text_zipf_fit

    got = text_zipf_fit(spark, str(tmp_path)).first()
    assert got["slope"] == pytest.approx(-1.0, abs=0.05)
    # integer rounding of the tail counts (max(3, round(600/rank))) costs
    # ~1% of fit quality; a real power law at this size fits ≈ 0.989
    assert got["r2"] > 0.98


# --- batch 2: dependence / concentration / distribution statistics -----------


def test_spearman_matches_reference_with_ties(spark):
    from airflow_dags_spark.functions.stats import spearman_corr

    xs = [1.0, 2.0, 2.0, 3.0, 4.0, 4.0, 5.0, 6.0]
    ys = [2.0, 1.0, 3.0, 3.0, 5.0, 4.0, 6.0, 6.0]

    def midranks(v):
        return [
            sum(1 for u in v if u < x) + (sum(1 for u in v if u == x) + 1) / 2
            for x in v
        ]

    rx, ry = np.array(midranks(xs)), np.array(midranks(ys))
    want = np.corrcoef(rx, ry)[0, 1]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    got = spearman_corr(df, "x", "y").first()
    assert got["n"] == len(xs)
    assert got["rho"] == pytest.approx(want, abs=1e-5)


def test_spearman_monotone_transform_invariant(spark):
    from airflow_dags_spark.functions.stats import spearman_corr

    xs = [float(i) for i in range(1, 31)]
    ys = [math.exp(0.3 * x) for x in xs]  # monotone in x → rho exactly 1
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    assert spearman_corr(df, "x", "y").first()["rho"] == pytest.approx(1.0)


def test_gini_known_distributions(spark, tmp_path):
    """Perfect equality → 0; one customer holding everything → (n-1)/n."""
    from airflow_dags_spark.plans.round5 import stats_gini_revenue
    import datetime as dt

    def write_orders(rows, sub):
        d = tmp_path / sub
        d.mkdir()
        spark.createDataFrame(
            [(i, ck, "O", p, dt.datetime(1995, 1, 1 + i % 20)) for i, (ck, p) in enumerate(rows)],
            "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp",
        ).write.parquet(str(d / "orders.parquet"))
        return str(d)

    equal = write_orders([(c, 100.0) for c in range(10)], "eq")
    got = stats_gini_revenue(spark, equal).first()
    assert got["gini"] == pytest.approx(0.0)
    assert got["total_rev"] == pytest.approx(1000.0)

    skew = write_orders(
        [(c, 0.01) for c in range(9)] + [(9, 1_000_000.0)], "skew"
    )
    got = stats_gini_revenue(spark, skew).first()
    # gini → (n-1)/n as one holder takes everything
    assert got["gini"] == pytest.approx(0.9, abs=1e-3)


def test_mutual_info_independent_vs_dependent(spark, tmp_path):
    from airflow_dags_spark.plans.round5 import stats_mutual_info
    import datetime as dt

    def write_events(rows, sub):
        d = tmp_path / sub
        d.mkdir()
        spark.createDataFrame(
            [
                (i, dt.datetime(2024, 1, 1, hour), et, 1.0)
                for i, (et, hour) in enumerate(rows)
            ],
            "event_id bigint, ts timestamp, event_type string, value double",
        ).write.parquet(str(d / "events.parquet"))
        return str(d)

    # independent: every (type, hour) combination equally likely → MI = 0
    indep = write_events(
        [(t, h) for t in ("a", "b") for h in (0, 1) for _ in range(5)], "ind"
    )
    got = stats_mutual_info(spark, indep).first()
    assert got["mutual_info"] == pytest.approx(0.0)
    assert got["h_type"] == pytest.approx(math.log(2), abs=1e-5)

    # fully dependent: type determines hour → MI = H(type) = ln 2
    dep = write_events(
        [("a", 0)] * 10 + [("b", 1)] * 10, "dep"
    )
    got = stats_mutual_info(spark, dep).first()
    assert got["mutual_info"] == pytest.approx(math.log(2), abs=1e-5)


def test_benford_fracs_and_digits(spark, tmp_path):
    from airflow_dags_spark.plans.round5 import stats_benford_digits
    import datetime as dt

    vals = [1.0, 1.5, 19.0, 2.0, 0.003, 31.4, 950.0, 9.99, None, -5.0]
    d = tmp_path
    spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1), "t", v) for i, v in enumerate(vals)],
        "event_id bigint, ts timestamp, event_type string, value double",
    ).write.parquet(str(d / "events.parquet"))
    got = {r["digit"]: r for r in stats_benford_digits(spark, str(d)).collect()}
    # null and negative excluded; digits: 1,1,1,2,3,3,9,9 → {1:3, 2:1, 3:2, 9:2}
    assert {k: v["cnt"] for k, v in got.items()} == {1: 3, 2: 1, 3: 2, 9: 2}
    assert got[1]["obs_frac"] == pytest.approx(3 / 8)
    assert got[1]["benford_frac"] == pytest.approx(math.log10(2), abs=1e-6)
    assert got[9]["benford_frac"] == pytest.approx(math.log10(10 / 9), abs=1e-6)


def test_jsd_identical_zero_disjoint_ln2(spark, tmp_path):
    from airflow_dags_spark.plans.round5 import text_js_divergence

    def write_docs(rows, sub):
        d = tmp_path / sub
        d.mkdir()
        spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string"
        ).write.parquet(str(d / "documents.parquet"))
        return str(d)

    same = write_docs(
        [(1, "x y z", "en", "src0"), (2, "x y z", "en", "src1")], "same"
    )
    assert text_js_divergence(spark, same).first()["jsd"] == pytest.approx(0.0)

    disjoint = write_docs(
        [(1, "aa bb cc", "en", "src0"), (2, "dd ee ff", "en", "src1")], "disj"
    )
    # disjoint supports: JSD = ln 2
    assert text_js_divergence(spark, disjoint).first()["jsd"] == pytest.approx(
        math.log(2), abs=1e-6
    )


# --- training order + leakage-safe split ------------------------------------


def test_training_order_is_deterministic_and_contiguous(spark, sf_dir):
    from airflow_dags_spark.plans.round5 import export_training_order

    a = export_training_order(spark, sf_dir).collect()
    b = export_training_order(spark, sf_dir).collect()
    assert a == b  # same seed → identical order
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert poss == list(range(1, len(poss) + 1)), shard
    assert len({r["doc_id"] for r in a}) == len(a)  # every doc exactly once


def test_leakage_safe_split_keeps_clusters_together(spark, tmp_path):
    from airflow_dags_spark.plans.round5 import split_leakage_safe

    # 30 clusters of 3 near-dup docs each (identical token SETS, different
    # order/repeats) — every cluster must land wholly in one split
    rows = []
    for c in range(30):
        toks = f"alpha{c} beta{c} gamma{c}"
        rows += [
            (c * 3 + 0, toks, "en", "s"),
            (c * 3 + 1, f"beta{c} gamma{c} alpha{c}", "en", "s"),
            (c * 3 + 2, f"alpha{c} alpha{c} gamma{c} beta{c}", "en", "s"),
        ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {r["split"]: r for r in split_leakage_safe(spark, str(tmp_path)).collect()}
    n_docs = sum(r["n_docs"] for r in got.values())
    n_clusters = sum(r["n_clusters"] for r in got.values())
    assert n_docs == 90
    # clusters are indivisible: every split's doc count is 3 × its clusters
    assert n_clusters == 30
    for r in got.values():
        assert r["n_docs"] == 3 * r["n_clusters"]


def test_association_rules_hand_computed(spark, tmp_path):
    from airflow_dags_spark.plans.round5 import basket_association_rules
    import datetime as dt

    # baskets: {1,2} ×3, {1,3} ×1 → only pair (1,2) reaches support 3
    baskets = [(10, [1, 2]), (11, [1, 2]), (12, [1, 2]), (13, [1, 3])]
    rows = [
        (g, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(1995, 1, 1))
        for g, parts in baskets
        for p in parts
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        (r["antecedent"], r["consequent"]): r
    for r in basket_association_rules(spark, str(tmp_path)).collect()}
    assert set(got) == {(1, 2), (2, 1)}
    # sup(1)=4, sup(2)=3, sup(12)=3, n=4
    assert got[(1, 2)]["confidence"] == pytest.approx(3 / 4)
    assert got[(2, 1)]["confidence"] == pytest.approx(1.0)
    assert got[(1, 2)]["lift"] == pytest.approx(3 * 4 / (4 * 3))


# --- MIN/MAX IVM under deletes ------------------------------------------------


def _minmax_fixture(spark):
    from airflow_dags_spark.operators.maintenance import minmax_state

    base = spark.createDataFrame(
        [("g1", 10.0), ("g1", 20.0), ("g2", 5.0), ("g2", 7.0), ("g3", 1.0)],
        "k string, v double",
    )
    state = minmax_state(base, {"k": F.col("k")}, F.col("v"))
    return base, state


def _apply(spark, base, state, changes_rows):
    from airflow_dags_spark.operators.maintenance import merge_minmax_state

    changes = spark.createDataFrame(
        changes_rows, "change_type string, k string, old_v double, new_v double"
    )
    dele = {(r[1], r[2]) for r in changes_rows if r[0] != "insert"}
    kept = [
        r for r in base.collect() if (r["k"], r["v"]) not in dele
    ]
    ins = [(r[1], r[3]) for r in changes_rows if r[0] != "delete"]
    after = spark.createDataFrame(kept + ins, "k string, v double")
    got = merge_minmax_state(
        state, changes, after, ["k"], {"k": F.col("k")},
        F.col("old_v"), F.col("new_v"),
        base_group_exprs={"k": F.col("k")}, base_val=F.col("v"),
    )
    want = {
        (r["k"]): (r["mx"], r["cnt"])
        for r in after.groupBy("k").agg(
            F.max("v").alias("mx"), F.count("*").alias("cnt")
        ).collect()
    }
    return {r["k"]: (r["max_v"], r["cnt"]) for r in got.collect()}, want


def test_minmax_ivm_delete_of_max_forces_recompute(spark):
    base, state = _minmax_fixture(spark)
    got, want = _apply(spark, base, state, [("delete", "g1", 20.0, None)])
    assert got == want and got["g1"] == (10.0, 1)  # runner-up found


def test_minmax_ivm_nonextreme_delete_folds_without_recompute(spark):
    base, state = _minmax_fixture(spark)
    got, want = _apply(spark, base, state, [("delete", "g2", 5.0, None)])
    assert got == want and got["g2"] == (7.0, 1)


def test_minmax_ivm_group_vanishes_and_new_group_appears(spark):
    base, state = _minmax_fixture(spark)
    got, want = _apply(
        spark, base, state,
        [("delete", "g3", 1.0, None), ("insert", "g4", None, 42.0)],
    )
    assert got == want
    assert "g3" not in got and got["g4"] == (42.0, 1)


def test_minmax_ivm_insert_raises_max_in_place(spark):
    base, state = _minmax_fixture(spark)
    got, want = _apply(spark, base, state, [("insert", "g2", None, 99.0)])
    assert got == want and got["g2"] == (99.0, 3)


def test_minmax_ivm_mixed_delete_max_and_insert(spark):
    base, state = _minmax_fixture(spark)
    got, want = _apply(
        spark, base, state,
        [("delete", "g1", 20.0, None), ("insert", "g1", None, 15.0)],
    )
    assert got == want and got["g1"] == (15.0, 2)


# --- hard negatives / Kaplan-Meier / forecast metrics -------------------------


def test_hard_negatives_exclude_same_label_and_self(spark, tmp_path):
    from airflow_dags_spark.plans.round5 import sim_hard_negatives

    rows = [
        (0, [1.0, 0.0], 1),        # query (vec_id % 997 == 0)
        (1, [1.0, 0.01], 1),       # most similar BUT same label → excluded
        (2, [1.0, 0.1], 2),        # best valid negative
        (3, [0.9, 0.3], 2),
        (4, [0.0, 1.0], 3),
        (5, [-1.0, 0.0], 2),
    ]
    spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in rows],
        "vec_id bigint, embedding array<float>, label int",
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    got = sim_hard_negatives(spark, str(tmp_path)).collect()
    assert all(r["qid"] == 0 for r in got)
    ids = [r["cid"] for r in got]
    assert 1 not in ids and 0 not in ids       # same label + self excluded
    assert ids[0] == 2 and len(ids) == 3       # hardest negative first


def test_kaplan_meier_textbook_fixture(spark, tmp_path):
    from airflow_dags_spark.plans.round5 import stats_kaplan_meier
    import datetime as dt

    # corpus end = day 30. Users: A active day0..5 (churn t=5),
    # B day0..5 (churn t=5), C day0..28 (censored, gap 2 ≤ 7),
    # D day10..15 (churn t=5 — same t as A/B), E day0..20 (churn t=20)
    spans = {1: (0, 5), 2: (0, 5), 3: (0, 28), 4: (10, 15), 5: (0, 20)}
    rows = []
    eid = 0
    for u, (a, b) in spans.items():
        for day in (a, b):
            rows.append(
                (eid, dt.datetime(2024, 1, 1) + dt.timedelta(days=day), u, "t", 1.0)
            )
            eid += 1
    rows.append((eid, dt.datetime(2024, 1, 31), 99, "t", 1.0))  # pins ref_end
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {r["t"]: r for r in stats_kaplan_meier(spark, str(tmp_path)).collect()}
    # six subjects; user 99 is CENSORED at t=0 (active at corpus end), so
    # the curve has steps only at churn times t=5 and t=20
    assert set(got) == {5, 20}
    # t=5: A, B, D churn together; at risk = 6 − (user 99 censored at 0) = 5
    assert got[5]["n_risk"] == 5 and got[5]["churned"] == 3
    assert got[5]["survival"] == pytest.approx(2 / 5, abs=1e-6)
    # t=20: remaining at risk = C (censored at 30) and E → n=2, d=1
    assert got[20]["n_risk"] == 2 and got[20]["churned"] == 1
    assert got[20]["survival"] == pytest.approx(1 / 5, abs=1e-6)


def test_forecast_metrics_hand_computed(spark, tmp_path):
    from airflow_dags_spark.plans.round5 import stats_forecast_metrics
    import datetime as dt

    series = [100.0, 110.0, 90.0, 100.0]
    rows = [
        (i, 1, "O", v, dt.datetime(1995, 1, 1 + i)) for i, v in enumerate(series)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    got = {r["model"]: r for r in stats_forecast_metrics(spark, str(tmp_path)).collect()}
    lag1 = got["naive_lag1"]
    # errors: |110-100|, |90-110|, |100-90| = 10, 20, 10
    assert lag1["n"] == 3
    assert lag1["mae"] == pytest.approx(40 / 3, abs=0.01)
    assert lag1["rmse"] == pytest.approx((600 / 3) ** 0.5, abs=0.01)
    assert lag1["mape"] == pytest.approx((10 / 110 + 20 / 90 + 10 / 100) / 3, abs=1e-6)
    assert "seasonal_lag7" not in got or got["seasonal_lag7"]["n"] == 0


def test_rrf_fusion_hand_computed(spark, tmp_path):
    from airflow_dags_spark.plans.round5 import search_rrf_fusion

    rows = [
        (1, "merge merge merge pad", "en", "s", 100),
        (2, "merge pad pad pad pad pad", "en", "s", 300),
        (3, "stream alpha beta gamma delta", "en", "s", 200),
        (4, "nothing relevant here", "en", "s", 999),
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {r["doc_id"]: r["rrf"] for r in search_rrf_fusion(spark, str(tmp_path)).collect()}
    assert set(got) == {1, 2, 3}  # only BM25 matches fuse
    # hand-derived ranks — bm25: doc3(idf of the rare 'stream' wins)=1,
    # doc1=2, doc2=3; length: doc2=1, doc3=2, doc1=3; diversity: doc3(5
    # distinct)=1, then the 2-distinct tie breaks by id → doc1=2, doc2=3
    assert got[1] == pytest.approx(1 / 62 + 1 / 63 + 1 / 62, abs=2e-6)
    assert got[3] == pytest.approx(1 / 61 + 1 / 62 + 1 / 61, abs=2e-6)
    assert got[2] == pytest.approx(1 / 63 + 1 / 61 + 1 / 63, abs=2e-6)


def test_knn_label_eval_majority_and_tiebreak(spark, tmp_path):
    from airflow_dags_spark.plans.round5 import sim_knn_label_eval

    # query 0 (label 9): neighbors by similarity are three label-1 then
    # two label-2 → majority 1; crafted so vote counting, self-exclusion
    # and the (votes DESC, label ASC) tie rule are all exercised
    rows = [
        (0, [1.0, 0.0], 9),
        (1, [1.0, 0.01], 1),
        (2, [1.0, 0.02], 1),
        (3, [1.0, 0.03], 1),
        (4, [1.0, 0.04], 2),
        (5, [1.0, 0.05], 2),
        (6, [-1.0, 0.0], 3),   # far away, outside top-5
    ]
    spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in rows],
        "vec_id bigint, embedding array<float>, label int",
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    got = sim_knn_label_eval(spark, str(tmp_path)).collect()
    assert len(got) == 1 and got[0]["qid"] == 0
    assert got[0]["predicted"] == 1 and got[0]["actual"] == 9
    assert got[0]["correct"] is False


def test_cohort_ltv_cumulative_and_per_customer(spark, tmp_path):
    from airflow_dags_spark.plans.round5 import cohort_ltv_curves
    import datetime as dt

    # cohort 1995-01: customers 1, 2. c1 spends 100 (age 0) + 50 (age 1);
    # c2 spends 200 (age 0). cohort 1995-02: c3 spends 80 (age 0).
    rows = [
        (1, 1, "O", 100.0, dt.datetime(1995, 1, 10)),
        (2, 1, "O", 50.0, dt.datetime(1995, 2, 5)),
        (3, 2, "O", 200.0, dt.datetime(1995, 1, 20)),
        (4, 3, "O", 80.0, dt.datetime(1995, 2, 15)),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    got = {
        (r["cohort"], r["age"]): r
        for r in cohort_ltv_curves(spark, str(tmp_path)).collect()
    }
    assert got[("1995-01", 0)]["ltv_per_customer"] == pytest.approx(150.0)
    assert got[("1995-01", 1)]["ltv_per_customer"] == pytest.approx(175.0)
    assert got[("1995-01", 0)]["customers"] == 2
    assert got[("1995-02", 0)]["ltv_per_customer"] == pytest.approx(80.0)


def test_lorenz_deciles_monotone_and_sum_to_one(spark, sf_dir):
    from airflow_dags_spark.plans.round5 import stats_lorenz_deciles

    rows = sorted(
        stats_lorenz_deciles(spark, sf_dir).collect(), key=lambda r: r["decile"]
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    shares = [r["rev_share"] for r in rows]
    # sorted ascending by revenue → decile shares must be non-decreasing
    assert all(a <= b + 1e-9 for a, b in zip(shares, shares[1:]))
    assert rows[-1]["cum_share"] == pytest.approx(1.0, abs=1e-6)
    cums = [r["cum_share"] for r in rows]
    for i in range(1, 10):
        assert cums[i] == pytest.approx(cums[i - 1] + shares[i], abs=2e-6)


def test_ks_exponential_gof_detects_fit_quality(spark, tmp_path):
    """An exactly exponential stream must score a small D; a perfectly
    regular (constant-gap) stream a large one."""
    from airflow_dags_spark.plans.round5 import stats_ks_exponential_gof
    import datetime as dt
    import math as m

    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    # deterministic exponential gaps via inverse CDF over a uniform grid
    t = t0
    for i in range(1, 200):
        t += dt.timedelta(seconds=-10.0 * m.log(i / 200.0))
        rows.append((eid, t, 1, "expo", 1.0)); eid += 1
    t = t0
    for i in range(200):
        t += dt.timedelta(seconds=10)
        rows.append((eid, t, 1, "regular", 1.0)); eid += 1
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {r["event_type"]: r for r in stats_ks_exponential_gof(spark, str(tmp_path)).collect()}
    # regular gaps vs exponential: D -> |e^-1 - ...| ~ 0.37 region
    assert got["regular"]["ks_d"] > 0.25
    assert got["expo"]["ks_d"] < 0.12
    assert got["expo"]["mean_gap_sec"] == pytest.approx(10.0, rel=0.25)

"""PageRank (operators/graph.py) vs an exact numpy power iteration —
including dangling-node mass, teleport normalization, and convergence."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def numpy_pagerank(n, edge_list, damping=0.85, iters=60):
    """Dense reference power iteration with uniform dangling redistribution."""
    ranks = np.full(n, 1.0 / n)
    out = {}
    for s, d in edge_list:
        out.setdefault(s, []).append(d)
    for _ in range(iters):
        new = np.full(n, (1.0 - damping) / n)
        dangling = sum(ranks[v] for v in range(n) if v not in out)
        new += damping * dangling / n
        for s, targets in out.items():
            share = ranks[s] / len(targets)
            for d in targets:
                new[d] += damping * share
        ranks = new
    return ranks


def run_pagerank(spark, n, edge_list, **kw):
    from airflow_dags_spark.operators.graph import pagerank

    nodes = spark.createDataFrame([(i,) for i in range(n)], "node bigint")
    edges = spark.createDataFrame(
        edge_list or [(0, 0)], "src bigint, dst bigint"
    )
    if not edge_list:
        edges = edges.where(F.lit(False))
    got = pagerank(nodes, edges, max_iter=60, tol=1e-12, **kw)
    return {r["node"]: r["rank"] for r in got.collect()}


def test_pagerank_matches_numpy_on_cyclic_graph(spark):
    # 0→1→2→0 cycle plus a chain into it and a dangling sink
    edges = [(0, 1), (1, 2), (2, 0), (3, 0), (4, 3), (0, 5)]
    got = run_pagerank(spark, 6, edges)
    want = numpy_pagerank(6, edges)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    for v in range(6):
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_pagerank_star_center_dominates(spark):
    edges = [(i, 0) for i in range(1, 8)]
    got = run_pagerank(spark, 8, edges)
    assert got[0] == max(got.values())
    want = numpy_pagerank(8, edges)
    for v in range(8):
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_pagerank_no_edges_is_uniform(spark):
    got = run_pagerank(spark, 5, [])
    # all mass is dangling: teleport + redistributed dangling = uniform
    for v in range(5):
        assert got[v] == pytest.approx(0.2, abs=1e-9)


@pytest.mark.slow
def test_pagerank_total_mass_conserved_on_random_graph(spark):
    rng = np.random.RandomState(7)
    n = 30
    edges = list({(int(rng.randint(n)), int(rng.randint(n))) for _ in range(80)})
    got = run_pagerank(spark, n, edges)
    want = numpy_pagerank(n, edges)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    for v in range(n):
        assert got[v] == pytest.approx(want[v], abs=1e-8)

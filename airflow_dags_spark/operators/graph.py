"""Iterative graph operators beyond connected components: PageRank.

PageRank over entity graphs (customer→supplier purchase edges, doc→doc
near-dup candidate edges) ranks entities by link structure — the
importance/centrality signal a curation pipeline uses to weight sources or
pick canonical cluster representatives.

Same scale discipline as ``dedup.connected_components``:

- per-round rank state is double-buffered through parquet, which truncates
  ALL lineage each round (localCheckpoint retains the origin plan and its
  hidden tree grows geometrically with three references per iteration —
  measured on cc, documented at ``dedup.py:connected_components``);
- each round is ONE contribution shuffle (edges ⋈ ranks on src, grouped on
  dst) plus a tiny 1-row aggregate for dangling mass and convergence; at
  100 TB ranks/edges co-partition on the join key across rounds — the
  standard Pregel iteration cost;
- dangling (sink) mass is redistributed uniformly each round so total rank
  stays 1 (the textbook correction; dropping it makes ranks leak).

Floating-point sums vary in the last ulp with partition order → rows-only
driver check; tests/test_graph.py bounds the result against an exact numpy
power iteration at 1e-9 L1.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from airflow_dags_spark.functions.localframe import tiny_df

from airflow_dags_spark.operators.dedup import _delete_path


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-9,
    state_dir: str | None = None,
) -> DataFrame:
    """PageRank of ``nodes`` over directed ``edges``. Returns
    ``(node_col, rank)`` summing to 1. Converges when the L1 delta between
    rounds drops under ``tol`` (checked with one scalar aggregate per
    round, never a driver-side rank collect)."""
    spark = nodes.sparkSession
    self_created = False
    if state_dir is None:
        state_dir = spark.sparkContext.getCheckpointDir()
    if state_dir is None:
        import tempfile

        state_dir = tempfile.mkdtemp(prefix="spark_graft_pr_")
        self_created = True
    base = state_dir.rstrip("/") + "/pr-" + uuid.uuid4().hex

    def materialize(df: DataFrame, name: str) -> DataFrame:
        path = f"{base}/{name}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    n_nodes = nodes.count()
    if n_nodes == 0:
        _cleanup(spark, base, state_dir, self_created)
        return nodes.select(
            F.col(node_col).alias(node_col), F.lit(0.0).alias("rank")
        )

    e = materialize(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct(),
        "edges",
    )
    # out-degrees once; nodes with no out-edges are dangling sinks
    deg = materialize(
        e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")), "deg"
    )
    ranks = materialize(
        nodes.select(
            F.col(node_col).alias("node"),
            F.lit(1.0 / n_nodes).alias("rank"),
        ),
        "ranks-0",
    )

    from pyspark.sql import Observation

    teleport = (1.0 - damping) / n_nodes
    for i in range(max_iter):
        # ONE driver action per iteration (r10 verdict #4; was three —
        # dangling-mass aggregate, state write, delta aggregate):
        # - the dangling mass rides along as a 1-row aggregate cross-joined
        #   (broadcast) into the rank expression instead of a driver
        #   ``first()`` — same F.sum over the same rows, same division;
        # - the L1 convergence delta is a DataFrame Observation filled by
        #   the state write itself (old rank is already on the joined row,
        #   so |new − old| needs no second pass over the parquet buffers).
        # Float caveat: the observed delta folds partials in partition
        # order like the old join-aggregate did; it gates EARLY STOP only
        # (tolerance heuristic) — ranks themselves are bit-identical to
        # the three-action form.
        with_deg = ranks.join(deg, ranks.node == deg.src, "left")
        dangling_df = (
            with_deg.where(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dangling"))
        )
        contribs = (
            e.join(ranks, e.src == ranks.node)
            .join(deg, "src")
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        new_rank = (
            F.lit(teleport)
            + F.lit(damping)
            * (
                F.coalesce(F.col("inflow"), F.lit(0.0))
                + F.col("__dangling") / F.lit(float(n_nodes))
            )
        )
        obs = Observation(f"pr-delta-{i}")
        staged = (
            ranks.join(contribs, ranks.node == contribs.dst, "left")
            .crossJoin(F.broadcast(dangling_df))
            .select(
                "node",
                F.col("rank").alias("__old"),
                new_rank.alias("rank_new"),
            )
            .observe(obs, F.sum(F.abs(F.col("rank_new") - F.col("__old"))).alias("delta"))
        )
        new_ranks = materialize(
            staged.select("node", F.col("rank_new").alias("rank")),
            f"ranks-{(i + 1) % 2}",
        )
        delta = obs.get["delta"]
        ranks = new_ranks
        if delta is not None and delta < tol:
            break

    result = ranks.select(
        F.col("node").alias(node_col), F.col("rank")
    ).localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    _cleanup(spark, base, state_dir, self_created)
    return result


def _cleanup(spark, base: str, state_dir: str, self_created: bool) -> None:
    try:
        _delete_path(spark, state_dir if self_created else base)
    except Exception:
        pass  # leaked state dir is recoverable


def co_occurrence_edges(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: int = 1,
) -> DataFrame:
    """Undirected item co-occurrence graph: edge (a < b) iff items a and b
    appear in ``min_support`` or more distinct groups together.

    Scale shape: distinct (group, item) first (kills within-group repeats
    before the pair blow-up), self equi-join on the group key (pairs per
    group = C(items_in_group, 2) — bounded by group size, never all-pairs
    over the item universe), one hash aggregate for support. The
    ``min_support`` filter is what keeps the edge set sparse enough for
    triangle counting downstream.

    Returns (src, dst, support) with src < dst.
    """
    g, it = F.col(group_col), F.col(item_col)
    gi = df.where(g.isNotNull() & it.isNotNull()).select(
        g.alias("__g"), it.alias("__i")
    ).distinct()
    a = gi.select("__g", F.col("__i").alias("src"))
    b = gi.select("__g", F.col("__i").alias("dst"))
    return (
        a.join(b, "__g")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= min_support)
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact global triangle count over an undirected (src < dst) edge set
    via DEGREE-ORDERED orientation (compact-forward / Latapy 2008, the
    same orientation MapReduce triangle counters use, cf. Suri &
    Vassilvitskii WWW'11): orient every edge from its lower-(degree, id)
    endpoint to the higher one, enumerate wedges only between OUT-edges
    of the common vertex, and close them against the oriented edge set.

    Why this shape survives densification: with raw-id ordering a hub of
    degree d contributes O(d²) wedges; after degree ordering every
    vertex's out-degree is O(√m), so total wedges are O(m^{3/2}) — the
    theoretical optimum for exact counting. Each triangle is counted
    exactly once, from its minimum-(degree, id) corner. Two hash
    equi-joins + one degree aggregate; no nested loop.

    Returns one row: (n_nodes, n_edges, n_triangles).
    """
    # The edge set is consumed by the degree aggregate, the orientation
    # joins, the n_edges count AND (via `out`) three wedge-join branches;
    # without a barrier Catalyst re-evaluates the caller's whole edge
    # subtree (for the co-purchase query: the group self-join + support
    # aggregate) once per consumer. Lazy DISK_ONLY checkpoints of the two
    # bounded frames (edges, oriented edges) compute each once — measured
    # 6.3 → 3.1 s at sf0.1, counts identical (r10). Per-invocation state:
    # each call recomputes from its input. Tradeoff (ADVICE r10): a
    # localCheckpoint is NON-RELIABLE storage with truncated lineage — an
    # executor loss makes the job unrecoverable, and it materializes
    # O(|edges|) to executor-local disk; on clusters where either matters,
    # swap for a reliable checkpoint dir or a parquet double-buffer (the
    # connected-components discipline) at the cost of a distributed write.
    e = edges.select("src", "dst").localCheckpoint(
        eager=False, storageLevel=StorageLevel.DISK_ONLY
    )
    deg = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ann = (
        e.join(deg.withColumnRenamed("v", "src").withColumnRenamed("d", "ds"), "src")
        .join(deg.withColumnRenamed("v", "dst").withColumnRenamed("d", "dd"), "dst")
    )
    fwd = (F.col("ds") < F.col("dd")) | (
        (F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    out = ann.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("v"),
        F.when(fwd, F.col("dd")).otherwise(F.col("ds")).alias("dv"),
    ).localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    x = out.select("u", F.col("v").alias("a"), F.col("dv").alias("da"))
    y = out.select("u", F.col("v").alias("b"), F.col("dv").alias("db"))
    wedges = x.join(y, "u").where(
        (F.col("da") < F.col("db"))
        | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    )
    # the closing edge {a,b} is oriented a→b by construction (key(a) < key(b))
    tri = wedges.join(
        out.select(F.col("u").alias("a"), F.col("v").alias("b")), ["a", "b"]
    )
    counts = tri.agg(F.count(F.lit(1)).alias("n_triangles")).first()
    sizes = e.agg(F.count(F.lit(1)).alias("n_edges")).first()
    n_nodes = deg.count()
    spark = edges.sparkSession
    return tiny_df(
        spark,
        [(n_nodes, int(sizes["n_edges"]), int(counts["n_triangles"]))],
        "n_nodes bigint, n_edges bigint, n_triangles bigint",
    )


def degree_histogram(edges: DataFrame) -> DataFrame:
    """Degree distribution of an undirected (src < dst) edge set:
    (degree, n_nodes) rows. Two hash aggregates over the edge list —
    the union counts each endpoint once per incident edge."""
    ends = edges.select(F.col("src").alias("v")).union(
        edges.select(F.col("dst").alias("v"))
    )
    deg = ends.groupBy("v").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


__all__ = [
    "pagerank",
    "co_occurrence_edges",
    "triangle_count",
    "degree_histogram",
]

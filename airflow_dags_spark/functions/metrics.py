"""Execution observability: SQLMetrics of an executed plan as plain data.

The reference's only observability is Airflow task logs + row-count prints
(dags/pull_new_sales_list.py logging); a lake-scale engine needs the
numbers the plan actually produced — rows per operator, shuffle bytes,
spill — to catch the regressions SCALE.md documents against (a plan that
"passes" while shuffling 100× more than it should).

``execution_metrics`` walks the EXECUTED physical plan (post-AQE) through
py4j and returns ``{operator -> {metric -> value}}``; ``scan_summary``
condenses the numbers that matter for plan audits. Driver-side only, reads
JVM accumulators — zero effect on the job it measures.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _walk(node, visit, seen: set[int]) -> None:
    try:
        node_id = int(node.id())
    except Exception:
        node_id = id(node)
    if node_id in seen:
        return
    seen.add(node_id)
    visit(node)
    it = node.children().iterator()
    while it.hasNext():
        _walk(it.next(), visit, seen)
    # AQE wraps query stages (children() is empty on the wrappers); descend
    # through their plan accessors — py4j hasattr is always True, so probe
    # by calling and swallowing the no-such-method error
    for meth in ("plan", "executedPlan"):
        try:
            _walk(getattr(node, meth)(), visit, seen)
        except Exception:
            pass


def _metric_name(metric) -> str:
    """SQLMetric.name() is a Scala Option — unwrap Some(...)."""
    opt = metric.name()
    try:
        return str(opt.get()) if not opt.isEmpty() else "unnamed"
    except Exception:
        return str(opt)


def execution_metrics(df: DataFrame) -> dict[str, dict[str, int]]:
    """Metrics of ``df``'s executed plan, aggregated per operator name.

    Call AFTER an action on ``df`` (the same DataFrame object — a write
    clones the QueryExecution); metrics of never-executed operators read 0.
    """
    plan = df._jdf.queryExecution().executedPlan()
    out: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))

    def visit(node):
        name = str(node.nodeName()).strip()
        it = node.metrics().iterator()
        while it.hasNext():
            metric = it.next()._2()
            out[name][_metric_name(metric)] += int(metric.value())

    _walk(plan, visit, set())
    return {k: dict(v) for k, v in out.items()}


def scan_summary(df: DataFrame) -> dict[str, int]:
    """The audit numbers: rows scanned / produced, shuffle traffic, spill.

    ``rows_scanned`` ≫ ``rows_out`` with tiny ``shuffle_bytes_written`` is
    the healthy shape (filters at the scan, partial aggs before the wire);
    big shuffle or any spill on a small input is the regression signal."""
    m = execution_metrics(df)
    summary = {
        "rows_scanned": 0,
        "rows_out": 0,
        "shuffle_bytes_written": 0,
        "shuffle_records_written": 0,
        "spill_bytes": 0,
        "files_read": 0,
    }
    for op, metrics in m.items():
        for name, val in metrics.items():
            if op.startswith("Scan") and name == "number of output rows":
                summary["rows_scanned"] += val
            if name == "number of files read":
                summary["files_read"] += val
            if name == "shuffle bytes written":
                summary["shuffle_bytes_written"] += val
            if name == "shuffle records written":
                summary["shuffle_records_written"] += val
            if "spill size" in name:
                summary["spill_bytes"] += val
    # rows_out: the first REAL operator under the root, read from its own
    # metrics object (with AQE the root is AdaptiveSparkPlan, which has no
    # row metric; a name-keyed map lookup would also collide with other
    # same-named operators deeper in the plan)
    summary["rows_out"] = _root_rows(df._jdf.queryExecution().executedPlan())
    return summary


def _root_rows(plan) -> int:
    """Row count at the plan root: unwrap AQE / query-stage / codegen
    wrappers until a node that exposes ``number of output rows``; that
    node's OWN metric is the result row count."""
    node = plan
    for _ in range(64):  # bounded descent; plans are never this deep
        name = str(node.nodeName()).strip()
        if name == "AdaptiveSparkPlan":
            node = node.executedPlan()  # final physical plan post-execution
            continue
        if name.endswith("QueryStage"):
            node = node.plan()
            continue
        it = node.metrics().iterator()
        while it.hasNext():
            metric = it.next()._2()
            if _metric_name(metric) == "number of output rows":
                return int(metric.value())
        ch = node.children()
        if ch.isEmpty():
            return 0
        node = ch.head()  # wrappers (WholeStageCodegen, …) are single-child
    return 0


def with_observation(df: DataFrame, name: str, **aggs):
    """Attach named aggregate metrics to ``df`` via Spark's Observation
    API: the metrics are computed DURING the next action on the returned
    frame — zero extra pass, exactly-once per action (unlike reading
    SQLMetrics, no plan walking, and it works the same under AQE).

    Returns ``(df_with_observe, observation)``; read
    ``observation.get`` AFTER an action. Use for per-job row counts /
    quality tallies a pipeline wants to log without re-scanning —
    the engine analog of the reference's row-count log lines
    (dags/pull_new_sales_list.py logging).

    Example::

        df2, obs = with_observation(df, "load",
                                    n=F.count(F.lit(1)),
                                    nulls=F.sum(F.col("k").isNull().cast("int")))
        df2.write.parquet(path)
        print(obs.get)   # {'n': ..., 'nulls': ...}
    """
    from pyspark.sql import Observation

    if not aggs:
        raise ValueError("provide at least one named aggregate")
    obs = Observation(name)
    observed = df.observe(obs, *[expr.alias(alias) for alias, expr in aggs.items()])
    return observed, obs


def table_checksum(df: DataFrame, cols: list[str] | None = None):
    """Order-insensitive, engine-portable table fingerprint: per-row md5
    over a canonical '|'-joined rendering of ``cols`` (NULL → a sentinel
    that cannot collide with data), split into two 32-bit words, summed
    as decimals + a row count. Any engine with md5 reproduces it — the
    tool for validating a 100 TB migration WITHOUT moving or sorting
    either side: compare three numbers, not n rows.

    One pass, partial-aggregated map-side (the sums combine), no shuffle
    beyond the single-row final. Sums in DECIMAL(38,0): 2^32-bounded
    words never overflow it below ~10^28 rows. Caller renders
    floats/timestamps deterministically BEFORE calling when the table has
    them (engines differ in raw float formatting).

    Each field is LENGTH-PREFIXED before joining: a bare '|' join is
    ambiguous at column boundaries (rows ('a|b','c') and ('a','b|c')
    would render identically and fingerprint equal), while with
    '<len>:<value>' the prefix pins every boundary, so no rearrangement
    of characters across columns can collide."""
    cols = cols or df.columns

    def field(c: str):
        s = F.coalesce(F.col(c).cast("string"), F.lit("\x01NULL"))
        return F.concat(F.length(s).cast("string"), F.lit(":"), s)

    canon = F.concat_ws("|", *[field(c) for c in cols])
    h = F.md5(canon)
    w1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("decimal(20,0)")
    w2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("decimal(20,0)")
    return df.agg(
        F.sum(w1).cast("decimal(38,0)").alias("checksum_hi"),
        F.sum(w2).cast("decimal(38,0)").alias("checksum_lo"),
        F.count(F.lit(1)).alias("n_rows"),
    )

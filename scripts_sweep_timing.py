"""Full-registry per-query timing sweep — optimization-round measurement
(guide §1: measure first). Times EVERY registered query once (after one
untimed warm-up pass of the base tables) with the noop sink at the given
SF, and prints a sorted cost table. Unlike bench.py (median-of-5 over the
44 HEADLINE queries, the driver's contract), this is a builder-side tool
to rank where the OTHER ~330 queries spend time, since the driver also
re-runs the full registry for correctness.

Usage: python scripts_sweep_timing.py [sf_dir] [--runs=N] [--queries=a,b]
(flags take '=' forms only; unrecognized '--' flags are an error rather
than silently ignored — ADVICE r10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from airflow_dags_spark.plans import registry
from airflow_dags_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    runs = 1
    only: list[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        elif a.startswith("--queries="):
            only = a.split("=", 1)[1].split(",")
        elif a.startswith("--"):
            sys.exit(f"unrecognized flag {a!r}: use --runs=N / --queries=a,b")
    registry.load_all()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="spark-graft-sweep-timing",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 64,
    )
    spark.sparkContext.setLogLevel("ERROR")

    from airflow_dags_spark.schemas import TESTDATA_TABLES
    from airflow_dags_spark.sources.tables import read_table

    for t in TESTDATA_TABLES:
        read_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    names = only or sorted(registry.QUERIES)
    out: dict[str, float] = {}
    errs: dict[str, str] = {}
    for name in names:
        fn = registry.QUERIES[name]
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        best = None
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out[name] = round(best, 3)
        except Exception as ex:  # noqa: BLE001 — record and keep sweeping
            errs[name] = f"{type(ex).__name__}: {str(ex)[:120]}"
        spark.sparkContext.setJobDescription(None)
    ranked = sorted(out.items(), key=lambda kv: -kv[1])
    print(json.dumps({"sf_dir": sf_dir, "total_s": round(sum(out.values()), 1),
                      "n": len(out), "errors": errs}))
    for name, sec in ranked:
        print(f"{sec:8.3f}  {name}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Driver-contract verification drive — the repo's own final gate.

Simulates the external driver exactly (.claude/skills/verify/SKILL.md):
imports ``__spark_entry__`` by file path, creates a PLAIN SparkSession
(none of the engine confs — anything the engine needs must come from
``tune_session`` at runtime), runs EVERY ``queries()`` entry at the given
scale factor and hash-compares each against its ``oracle_sql()`` via
DuckDB; rows-only queries (no oracle) are executed for a clean-run check.

This catches the two failure classes pytest can't: conf-dependency bugs
(the driver session has default confs) and memory-accumulation bugs that
only appear when ~350 queries run back-to-back in one default-heap JVM.

Usage: python scripts_verify_drive.py [sf_dir]   (default sf0.01)
Exit code 0 only if every oracle query matches and every rows-only query
executes cleanly.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(HERE, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, HERE)
    from tests.oracle_utils import compare, duckdb_conn

    q, o = mod.queries(), mod.oracle_sql()
    print("entry rows:", len(mod.entry(spark).collect()), flush=True)
    con = duckdb_conn(sf_dir)
    t0 = time.time()
    fails: list[tuple[str, object]] = []
    for name in sorted(o):
        try:
            problems = compare(q[name](spark, sf_dir), con.execute(o[name]).fetchdf())
        except Exception as ex:  # noqa: BLE001 — a crash is a failure, keep driving
            problems = [f"{type(ex).__name__}: {str(ex)[:200]}"]
        if problems:
            fails.append((name, problems))
            print("FAIL:", name, problems, flush=True)
    print(
        f"ORACLE MATCH: {len(o) - len(fails)} / {len(o)} "
        f"({time.time() - t0:.0f}s, {sf_dir})",
        flush=True,
    )
    ro_fails = []
    for name in (n for n in q if n not in o):
        try:
            q[name](spark, sf_dir).count()
        except Exception as ex:  # noqa: BLE001
            ro_fails.append(name)
            print("ROWS-ONLY ERR:", name, str(ex)[:200], flush=True)
    n_ro = sum(1 for n in q if n not in o)
    print(f"ROWS-ONLY CLEAN: {n_ro - len(ro_fails)} / {n_ro}", flush=True)
    return 0 if not fails and not ro_fails else 1


if __name__ == "__main__":
    raise SystemExit(main())

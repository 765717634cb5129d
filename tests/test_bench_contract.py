"""bench.py output contract: the driver parses ONE JSON line with fixed
keys — a broken bench means a lost round, so gate it in CI (at sf0.001 for
speed; the driver runs sf0.1)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_prints_one_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_RUNS="1",  # contract check, not a measurement
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=420, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1
    payload = json.loads(lines[0])
    # the driver's required keys, plus the idle-run marker (VERDICT r2 #8)
    # and the r4 variance fields (VERDICT r3 #7: per-query spread so
    # round-over-round deltas inside the noise band are discardable)
    assert set(payload) == {
        "metric", "value", "unit", "queries", "sf",
        "load_avg_at_start", "cpus", "idle_run",
        "query_spread", "bench_runs_per_query",
    }
    assert set(payload["query_spread"]) == set(payload["queries"])
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert payload["value"] > 0
    assert all(v >= 0 for v in payload["queries"].values())
    assert isinstance(payload["idle_run"], bool)

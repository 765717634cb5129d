"""Pin bench.py's stdout contract: ONE JSON line small enough for the
external driver's ~2 KB tail capture.

Round 4's bench record was lost because the stdout line grew to ~2.9 KB
(42 medians + a same-size query_spread map) and the driver captured only a
truncated tail, leaving ``BENCH_r04.json`` with ``parsed: null``. The fix
moved everything non-essential to stderr / BENCH_DETAIL.json; this test
re-renders the line exactly as bench.py does for the CURRENT headline list
(worst-case value widths) and asserts it stays inside the capture budget,
so adding headline queries can never silently break the record again.
"""

from __future__ import annotations

import json

import bench


def _render_line(headline: list[str]) -> str:
    # call bench.py's OWN renderer (not a hand-mirrored copy — a mirror
    # would keep passing if someone re-added a field like query_spread to
    # the real line) with worst-case numeric widths: per-query medians are
    # round(x, 2) -> at most like 99.99 (5 chars for any query under
    # 100 s); total is round(x, 3) three-digit seconds.
    timings = {name: 99.99 for name in headline}
    return bench.render_stdout_line(timings, 999.999, 0.1, 31.97, False)


def test_stdout_line_fits_tail_capture():
    line = _render_line(bench.HEADLINE)
    # driver tail capture measured ~2.2 KB in round 4; budget 1900 bytes to
    # leave headroom for a trailing newline and any driver-side framing
    assert len(line) < 1900, (
        f"bench stdout line is {len(line)} bytes for {len(bench.HEADLINE)} "
        "headline queries — it will overflow the driver's ~2 KB tail capture "
        "and the round loses its bench record. Trim the headline list or "
        "move fields to BENCH_DETAIL.json."
    )


def test_stdout_line_has_required_fields_and_no_extras():
    parsed = json.loads(_render_line(bench.HEADLINE))
    assert {"metric", "value", "unit", "queries", "sf"} <= set(parsed)
    # spreads/runs/cpus must NOT be on the parsed line (they sank r4's record)
    assert "query_spread" not in parsed
    assert "bench_runs_per_query" not in parsed


def test_headline_queries_exist_in_registry():
    from airflow_dags_spark.plans import registry

    registry.load_all()
    missing = [n for n in bench.HEADLINE if n not in registry.QUERIES]
    assert not missing, f"headline names not in registry: {missing}"

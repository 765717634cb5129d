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
    # the real line) with worst-case numeric widths: per-query medians go
    # through bench.compact_med, worst 4 chars ("9.99") for any query
    # under 10 s — and no headline query has ever exceeded 3 s, so 9.99 IS
    # the realistic ceiling; total is round(x, 3) three-digit seconds.
    timings = {name: bench.compact_med(9.994) for name in headline}
    return bench.render_stdout_line(timings, 999.999, 0.1, 31.97, False)


def test_compact_med_caps_width():
    # the worst-case assumption above relies on compact_med: ≤4 chars for
    # any median under 100 s
    for v in (0.01, 0.42, 9.994, 15.34, 99.94):
        assert len(json.dumps(bench.compact_med(v))) <= 4, v


def test_stdout_line_fits_tail_capture():
    line = _render_line(bench.HEADLINE)
    # driver tail capture is exactly 2000 bytes (measured: every
    # BENCH_r*.json tail is len 2000); budget 1900 for the line, and the
    # round-8 verdict requires ≥500 bytes of standing headroom under it so
    # a round's worth of new entrants can never reach the cliff — hence
    # the 1400-byte worst-case gate. Adding entrants past it means
    # retiring flat queries from HEADLINE first (see the retirement note
    # in bench.py).
    assert len(line) < 1400, (
        f"bench stdout line is {len(line)} bytes worst-case for "
        f"{len(bench.HEADLINE)} headline queries — the ≥500-byte headroom "
        "margin under the driver's 2000-byte tail capture is gone. Retire "
        "flat headline queries or move fields to BENCH_DETAIL.json."
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

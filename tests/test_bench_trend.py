"""Bench trend detector: classification logic on synthetic timings, plus a
smoke run over the real recorded BENCH_r*.json history (no timing
assertions — history is data, not a contract)."""

from __future__ import annotations

import json
import subprocess
import sys

from scripts_bench_trend import ABS_FLOOR_S, compare, load_round_queries


def test_regression_needs_ratio_AND_absolute_delta():
    old = {"fast": 0.10, "mid": 1.00, "slow": 5.00}
    new = {"fast": 0.22, "mid": 1.90, "slow": 5.40}
    r = compare(old, new, spreads={})
    names = {e["query"] for e in r["regressions"]}
    # fast: 2.2x but only +0.12 s — under the absolute floor, NOT flagged
    assert "fast" not in names
    # mid: 1.9x AND +0.9 s — flagged
    assert "mid" in names
    # slow: +0.4 s but only 1.08x — NOT flagged
    assert "slow" not in names


def test_spread_raises_the_noise_floor():
    old = {"noisy": 1.00}
    new = {"noisy": 1.80}
    # without spread: 1.8x and +0.8 s > ABS_FLOOR_S -> regression
    assert compare(old, new, spreads={})["regressions"]
    # a recorded 0.5 s spread lifts the floor to 1.0 s -> not flagged
    assert not compare(old, new, spreads={"noisy": 0.5})["regressions"]
    assert ABS_FLOOR_S < 1.0


def test_improvements_and_membership_reported():
    old = {"a": 2.0, "gone": 1.0}
    new = {"a": 1.0, "added": 1.0}
    r = compare(old, new)
    assert [e["query"] for e in r["improvements"]] == ["a"]
    assert r["only_old"] == ["gone"] and r["only_new"] == ["added"]
    assert r["common"] == 1


def test_parses_driver_record_and_raw_bench_line(tmp_path):
    driver = tmp_path / "BENCH_r99.json"
    driver.write_text(
        json.dumps({"rc": 0, "parsed": {"queries": {"q1": 0.5}}})
    )
    raw = tmp_path / "fresh.json"
    raw.write_text(json.dumps({"metric": "x", "queries": {"q1": 0.6}}))
    assert load_round_queries(str(driver)) == {"q1": 0.5}
    assert load_round_queries(str(raw)) == {"q1": 0.6}


def test_strict_history_load_distinguishes_corruption_from_absence(tmp_path):
    """Corrupt JSON in a history round must RAISE under strict (silently
    dropping it would compare the wrong two rounds); a valid driver record
    with ``parsed: null`` (the round-4 truncation) is a recorded absence
    and returns {} so the caller can skip it loudly."""
    import pytest

    corrupt = tmp_path / "BENCH_r97.json"
    corrupt.write_text('{"rc": 0, "parsed": {truncated')
    absent = tmp_path / "BENCH_r98.json"
    absent.write_text(json.dumps({"rc": 0, "parsed": None}))
    with pytest.raises(ValueError, match="corrupt bench record"):
        load_round_queries(str(corrupt), strict=True)
    assert load_round_queries(str(corrupt)) is None  # candidate stays tolerant
    assert load_round_queries(str(absent), strict=True) == {}


def test_cli_exits_2_on_corrupt_history_round(tmp_path):
    """End-to-end: a corrupt BENCH_r*.json in the scanned directory makes
    the CLI exit 2 with an error line instead of silently comparing the
    wrong rounds."""
    import shutil

    for n in (1, 2):
        shutil.copy(f"/root/repo/BENCH_r0{n}.json", tmp_path / f"BENCH_r0{n}.json")
    (tmp_path / "BENCH_r03.json").write_text("{not json")
    script = tmp_path / "scripts_bench_trend.py"
    shutil.copy("/root/repo/scripts_bench_trend.py", script)
    proc = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True, timeout=60
    )
    assert proc.returncode == 2, (proc.stdout, proc.stderr)
    assert "unreadable history round" in proc.stdout


def test_cli_runs_on_recorded_history():
    """Six rounds of BENCH_r*.json exist in the repo — the CLI must parse
    them and emit one JSON report line (exit 0: report mode never gates)."""
    proc = subprocess.run(
        [sys.executable, "/root/repo/scripts_bench_trend.py"],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc.returncode == 0, proc.stderr
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["common"] > 0
    assert "regressions" in report and "improvements" in report


def test_load_spreads_prefers_absolute_seconds(tmp_path, monkeypatch):
    """The noise floor is in seconds: query_spread_abs_s wins over the
    legacy relative query_spread when both are present."""
    import scripts_bench_trend as t

    detail = tmp_path / "BENCH_DETAIL.json"
    detail.write_text(
        json.dumps(
            {
                "query_spread": {"q": 0.28},       # relative (legacy)
                "query_spread_abs_s": {"q": 0.45},  # seconds
            }
        )
    )
    monkeypatch.setattr(t, "REPO", str(tmp_path))
    assert t.load_spreads() == {"q": 0.45}
    detail.write_text(json.dumps({"query_spread": {"q": 0.28}}))
    assert t.load_spreads() == {"q": 0.28}  # legacy fallback

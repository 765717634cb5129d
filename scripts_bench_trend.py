"""Cross-round bench trend detection — the regression gate for TIMINGS,
sibling of the plan gates (which catch regressions in plan SHAPE).

Reads the driver-recorded ``BENCH_r*.json`` history (each holds the parsed
one-line bench output at sf0.1) plus the builder's ``BENCH_DETAIL.json``
(per-query spread over the median-of-N runs) and reports, for each query
common to the two compared rounds:

- **regression**: new > old · RATIO_THRESHOLD *and* the absolute delta
  clears the noise floor — ``max(2 · spread, ABS_FLOOR_S)``. Both
  conditions are required: pure-ratio flags drown in noise on sub-second
  queries (a 0.10 s → 0.22 s blip is a 2.2× "regression" that means
  nothing on a shared box), and pure-absolute flags miss slow creep on
  mid-weight queries.
- **improvement**: the mirror condition, for the round summary.

This is a REPORT by default (exit 0): one bad sample is evidence to
re-measure idle, not to rewrite a plan (SCALE.md round-6 note: a 3.8×
bench outlier after a 40-min pytest normalized on re-run). ``--gate``
flips regressions to exit 1 for use as a pre-commit tripwire once an
idle re-run has confirmed them.

Usage:
  python scripts_bench_trend.py                  # last two recorded rounds
  python scripts_bench_trend.py --candidate=f.json  # last round vs a fresh
                                                    # `python bench.py` line
  python scripts_bench_trend.py --gate           # exit 1 on regressions
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
RATIO_THRESHOLD = 1.5
ABS_FLOOR_S = 0.3


def load_round_queries(path: str, *, strict: bool = False) -> dict[str, float] | None:
    """Extract the per-query timings from a driver BENCH_r*.json record
    (or a raw `python bench.py` stdout line saved to a file).

    Two distinct "no data" cases, deliberately kept apart:

    - **corrupt JSON** — the file itself is unreadable. With
      ``strict=True`` (the history path) this RAISES: silently dropping a
      corrupt history round would make the trend compare the wrong two
      rounds and mask a recorded regression. The candidate path stays
      tolerant (``strict=False`` → None → clean exit-2 contract).
    - **valid driver record with no parsed line** (``parsed: null`` — the
      round-4 truncation hole) — returns ``{}``. That is a driver-recorded
      absence, not corruption; the caller skips it loudly.
    """
    with open(path) as f:
        raw = f.read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError as exc:
        if strict:
            raise ValueError(f"corrupt bench record {path}: {exc}") from exc
        return None
    if isinstance(d, dict) and "queries" in d:  # raw bench stdout line
        return dict(d["queries"])
    if isinstance(d, dict) and "parsed" in d:  # driver record
        parsed = d.get("parsed")
        if isinstance(parsed, dict):
            return dict(parsed.get("queries") or {})
        return {}  # parsed: null — recorded absence, not corruption
    if strict:
        raise ValueError(f"unrecognized bench record shape: {path}")
    return None


def load_spreads() -> dict[str, float]:
    """Per-query spread in SECONDS for the noise floor. Prefers the
    absolute field (``query_spread_abs_s``, bench round-8+); falls back to
    the legacy RELATIVE ``query_spread`` — which for a median around 1 s is
    numerically similar, but understated the floor for multi-second
    queries (the units bug that false-flagged agg_weighted_median)."""
    try:
        with open(os.path.join(REPO, "BENCH_DETAIL.json")) as f:
            d = json.load(f)
        return dict(
            d.get("query_spread_abs_s") or d.get("query_spread") or {}
        )
    except (OSError, json.JSONDecodeError):
        return {}


def compare(
    old: dict[str, float],
    new: dict[str, float],
    spreads: dict[str, float] | None = None,
    ratio_threshold: float = RATIO_THRESHOLD,
    abs_floor_s: float = ABS_FLOOR_S,
) -> dict:
    """Classify each common query as regression / improvement / stable."""
    spreads = spreads or {}
    regressions, improvements = [], []
    common = sorted(set(old) & set(new))
    for name in common:
        o, n = old[name], new[name]
        if not o or o <= 0:
            continue
        floor = max(2 * spreads.get(name, 0.0), abs_floor_s)
        entry = {
            "query": name,
            "old_s": o,
            "new_s": n,
            "ratio": round(n / o, 2),
            "noise_floor_s": round(floor, 3),
        }
        if n > o * ratio_threshold and (n - o) > floor:
            regressions.append(entry)
        elif o > n * ratio_threshold and (o - n) > floor:
            improvements.append(entry)
    regressions.sort(key=lambda e: -e["ratio"])
    improvements.sort(key=lambda e: e["ratio"])
    return {
        "common": len(common),
        "only_old": sorted(set(old) - set(new)),
        "only_new": sorted(set(new) - set(old)),
        "regressions": regressions,
        "improvements": improvements,
    }


def main() -> int:
    gate = "--gate" in sys.argv[1:]
    candidate = None
    for arg in sys.argv[1:]:
        if arg.startswith("--candidate="):
            candidate = arg.split("=", 1)[1]
    # only files with a numeric round suffix are history — a stray
    # BENCH_r*-named file (backup, rename) must be ignored, not crash the
    # gate with an AttributeError mid-sort
    numbered = [
        (int(m.group(1)), p)
        for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    rounds = [p for _, p in sorted(numbered)]
    # HISTORY loads are strict: corrupt JSON in a recorded round is fatal
    # (exit 2) — silently dropping it would compare the wrong two rounds
    # and mask a recorded regression. A valid record with ``parsed: null``
    # (the round-4 truncation hole) is a driver-recorded absence and is
    # skipped with a loud stderr warning instead.
    histories = []
    for p in rounds:
        try:
            q = load_round_queries(p, strict=True)
        except (OSError, ValueError) as exc:
            print(json.dumps({"error": f"unreadable history round: {exc}"}))
            return 2
        if not q:
            print(
                f"warning: {os.path.basename(p)} has no parsed bench line "
                "(driver-recorded absence) — skipped",
                file=sys.stderr,
            )
            continue
        histories.append((p, q))
    if candidate:
        # only the CANDIDATE load tolerates a bad path or bad JSON (the
        # JSON error contract below reports it as exit 2, never a crash)
        try:
            new_q = load_round_queries(candidate)
        except OSError:
            new_q = None
        new_path = candidate
        old_path, old_q = histories[-1] if histories else (None, None)
    elif len(histories) >= 2:
        (old_path, old_q), (new_path, new_q) = histories[-2], histories[-1]
    else:
        print(json.dumps({"error": "need two rounds or --candidate"}))
        return 2
    if not old_q or not new_q:
        print(json.dumps({"error": "could not parse bench records"}))
        return 2
    report = compare(old_q, new_q, load_spreads())
    report["compared"] = f"{os.path.basename(old_path)} -> " f"{os.path.basename(new_path)}"
    print(json.dumps(report))
    return 1 if (gate and report["regressions"]) else 0


if __name__ == "__main__":
    sys.exit(main())

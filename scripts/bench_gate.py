"""Per-query bench regression gate against the recorded round baseline.

The round driver records BENCH_r{N}.json; BENCH_r01.json is the engine's
established baseline (the reference publishes no numbers — see BASELINE.md).
This gate compares a current bench run per-query against that baseline at a
2x tolerance so regressions surface inside the round, not only in the
judge's report.

Usage:
    python bench.py | python scripts/bench_gate.py        # pipe a fresh run
    python scripts/bench_gate.py BENCH_rNN.json           # check a recording

Exit code 1 when any query exceeds 2x its baseline time (new queries with
no baseline entry are reported but never fail the gate).
"""

from __future__ import annotations

import json
import os
import sys

TOLERANCE = 2.0
#: ONE stamped baseline source (round-4 consolidation): r01 values for the
#: original headline, one-clean-session re-measurements for everything
#: added later. Regenerate with scripts/consolidate_baseline.py when new
#: queries join the headline.
BASELINE_PATH = os.path.join(
    os.path.dirname(__file__), "bench_baseline.json"
)


def load_bench(source: str) -> dict:
    """Accept either bench.py's raw one-line JSON or a driver recording
    (which wraps the parsed line under a "parsed" key)."""
    data = json.loads(source)
    return data.get("parsed", data)


def main() -> int:
    with open(BASELINE_PATH) as f:
        baseline = json.load(f)["queries"]

    if len(sys.argv) > 1:
        with open(sys.argv[1]) as f:
            raw = f.read()
    else:
        raw = sys.stdin.read()
    # A driver recording is a multi-line JSON document; bench.py output is
    # one JSON line possibly preceded by Spark progress noise.
    try:
        current = load_bench(raw)["queries"]
    except (json.JSONDecodeError, KeyError):
        line = next(l for l in raw.splitlines() if l.startswith('{"metric"'))
        current = load_bench(line)["queries"]

    failures = []
    for name, sec in sorted(current.items()):
        base = baseline.get(name)
        if base is None:
            print(f"NEW   {name}: {sec:.3f}s (no baseline)")
            continue
        ratio = sec / base if base > 0 else float("inf")
        flag = "FAIL " if ratio > TOLERANCE else "ok   "
        print(f"{flag}{name}: {sec:.3f}s vs baseline {base:.3f}s ({ratio:.2f}x)")
        if ratio > TOLERANCE:
            failures.append(name)

    missing = sorted(set(baseline) - set(current))
    if missing:
        print(f"note: baseline queries absent from this run: {missing}")
    if failures:
        print(f"REGRESSION: {len(failures)} queries above {TOLERANCE}x: {failures}")
        return 1
    print(f"bench gate: all {len(current)} queries within {TOLERANCE}x of baseline")
    return 0


if __name__ == "__main__":
    sys.exit(main())

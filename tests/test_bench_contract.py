"""Bench bookkeeping guards — pure-python, no Spark session.

The round driver parses bench.py's single JSON line and the 2x gate
reads the ONE consolidated baseline (scripts/bench_baseline.json —
round-4 consolidation of BENCH_r01 + clean-session re-measurements).
These tests keep the artifacts consistent so a future headline edit
cannot silently produce ungated or unrunnable bench queries.
"""

from __future__ import annotations

import json
import os

import bench
from redix_stream_spark import registry

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _baselines() -> dict:
    with open(os.path.join(ROOT, "scripts", "bench_baseline.json")) as f:
        return json.load(f)["queries"]


def test_every_headline_query_is_registered():
    names = set(registry.all_queries())
    missing = [q for q in bench.HEADLINE + bench.BIG_HEADLINE if q not in names]
    assert not missing, f"bench names not in registry: {missing}"


def test_every_headline_query_has_a_gate_baseline():
    base = _baselines()
    ungated = [q for q in bench.HEADLINE if q not in base]
    assert not ungated, (
        "headline queries without a 2x-gate baseline (regenerate "
        f"scripts/bench_baseline.json via consolidate_baseline.py): {ungated}"
    )


def test_no_duplicate_headline_entries():
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
    assert len(bench.BIG_HEADLINE) == len(set(bench.BIG_HEADLINE))

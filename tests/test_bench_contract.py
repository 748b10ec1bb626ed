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


def test_every_big_headline_query_has_an_sf1_baseline():
    """Round-4 verdict item 5: sf1 readings were judged by eyeballing the
    previous round, producing contention false alarms. Every BIG_HEADLINE
    query must have a stamped sf1 baseline so bench_gate.py can gate (and
    auto-re-time) the sf1 block."""
    with open(os.path.join(ROOT, "scripts", "bench_baseline.json")) as f:
        sf1 = json.load(f).get("sf1_queries", {})
    ungated = [q for q in bench.BIG_HEADLINE if q not in sf1]
    assert not ungated, (
        "BIG_HEADLINE queries without an sf1 baseline (rerun "
        f"consolidate_baseline.py --sf1): {ungated}"
    )


def test_no_duplicate_headline_entries():
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
    assert len(bench.BIG_HEADLINE) == len(set(bench.BIG_HEADLINE))


def test_bench_line_fits_driver_window():
    """BENCH_r04 exceeded the driver's ~2000-char parse window and came
    back ``parsed: null``. Simulate the fullest payload the current
    headline lists can produce (worst-case 4-digit timings) and assert
    budget_line keeps it parseable and under LINE_LIMIT."""
    timings = {q: 1234.567 for q in bench.HEADLINE}
    big = {q: 1234.567 for q in bench.BIG_HEADLINE}
    result = {
        "metric": "headline_queries_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "sf1": {
            "value": round(sum(big.values()), 3),
            "unit": "sec",
            "queries": big,
            "scale": "sf0.1 x10 replicas",
        },
    }
    line = bench.budget_line(result)
    assert len(line) <= bench.LINE_LIMIT
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_wall_sec"
    # budget_line rounds the 3-decimal INPUT value to 2 decimals; deriving
    # the expectation from the raw sum instead double-rounds differently
    # when the sum lands on a .xx5 boundary (bit the round-6 headline).
    assert parsed["value"] == round(result["value"], 2)
    assert parsed["queries"]  # slowest entries survive any trim
    # a trimmed map must say how many entries were dropped
    total_kept = len(parsed["queries"]) + parsed.get("omitted", 0)
    assert total_kept == len(bench.HEADLINE)


def test_bench_line_untrimmed_when_small():
    result = {
        "metric": "headline_queries_wall_sec",
        "value": 1.0,
        "unit": "sec",
        "queries": {"q01_pricing_summary": 1.0},
        "sf": 0.1,
    }
    line = bench.budget_line(result)
    assert json.loads(line)["queries"] == {"q01_pricing_summary": 1.0}
    assert "omitted" not in json.loads(line)


def test_budget_line_compresses_retimed_names_to_counts():
    """The retimed-query names belong in bench_full.json; the driver line
    carries only a count so the list can't blow the parse window."""
    result = {
        "metric": "headline_queries_wall_sec",
        "value": 3.0,
        "unit": "sec",
        "queries": {"q01_pricing_summary": 3.0},
        "sf": 0.1,
        "retimed": ["q01_pricing_summary", "q118_leakage_safe_split"],
        "sf1": {
            "value": 1.0,
            "unit": "sec",
            "queries": {"q41_embedding_neardup": 1.0},
            "retimed": ["q41_embedding_neardup"],
        },
    }
    parsed = json.loads(bench.budget_line(result))
    assert parsed["retimed"] == 2
    assert parsed["sf1"]["retimed"] == 1
    # the input dict is untouched (bench_full.json keeps the names)
    assert result["retimed"] == ["q01_pricing_summary", "q118_leakage_safe_split"]


def test_retime_flagged_selects_only_over_ratio(monkeypatch):
    """Pure selection/again logic: only readings over RETIME_RATIO x their
    baseline re-run; the min is kept; unbaselined names never re-run."""
    calls = []

    class FakeCatalog:
        def clearCache(self):
            pass

    class FakeSpark:
        catalog = FakeCatalog()

    class FakeWriter:
        def format(self, _):
            return self

        def mode(self, _):
            return self

        def save(self):
            pass

    class FakeDF:
        write = FakeWriter()

    # Two retimes: 2.5s (still > 2x baseline 1.0 -> no early stop), then
    # 0.4s. A first attempt at/below the threshold would early-stop per
    # retime_flagged's documented contract (bench.py:72-73).
    ticks = iter([0.0, 2.5, 10.0, 10.4])

    def fake_query(spark, sf_dir):
        calls.append(sf_dir)
        return FakeDF()

    monkeypatch.setattr(bench.time, "perf_counter", lambda: next(ticks))
    timings = {"qa": 5.0, "qb": 1.0, "qc": 9.9}
    flagged = bench.retime_flagged(
        FakeSpark(),
        {"qa": fake_query},
        timings,
        {"qa": 1.0, "qb": 1.0},  # qc unbaselined -> never flagged
        "/dir",
    )
    assert flagged == ["qa"]
    assert timings["qa"] == 0.4  # min of 5.0, 2.5, 0.4; second attempt ran
    assert timings["qb"] == 1.0 and timings["qc"] == 9.9
    assert calls == ["/dir", "/dir"]


def test_retime_flagged_early_stops_once_under_ratio(monkeypatch):
    """The documented early-stop: a re-time attempt at or under
    RETIME_RATIO x baseline ends that query's attempts immediately."""
    calls = []

    class FakeCatalog:
        def clearCache(self):
            pass

    class FakeSpark:
        catalog = FakeCatalog()

    class FakeWriter:
        def format(self, _):
            return self

        def mode(self, _):
            return self

        def save(self):
            pass

    class FakeDF:
        write = FakeWriter()

    ticks = iter([0.0, 0.5])  # first re-time 0.5s <= 2x of 1.0 -> stop

    def fake_query(spark, sf_dir):
        calls.append(sf_dir)
        return FakeDF()

    monkeypatch.setattr(bench.time, "perf_counter", lambda: next(ticks))
    timings = {"qa": 5.0}
    flagged = bench.retime_flagged(
        FakeSpark(), {"qa": fake_query}, timings, {"qa": 1.0}, "/dir"
    )
    assert flagged == ["qa"]
    assert timings["qa"] == 0.5
    assert calls == ["/dir"]  # second attempt skipped


def test_budget_line_keeps_changed_faces_when_trimming():
    """VERDICT r12 item 8: fastest-first trimming hid most of that
    round's wins from PERF (improved faces got fast, fast faces got
    trimmed). Changed-this-round faces must survive any trim that
    leaves other entries to drop — even when they are the fastest."""
    changed = sorted(bench.CHANGED_THIS_ROUND)[0]
    queries = {f"q{i:03d}_filler": 100.0 for i in range(300)}
    queries[changed] = 0.1  # fastest entry by far
    result = {
        "metric": "headline_queries_wall_sec",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
    }
    parsed = json.loads(bench.budget_line(result))
    assert parsed.get("omitted", 0) > 0  # the trim actually fired
    assert changed in parsed["queries"]


def test_changed_faces_are_registered_headline_names():
    names = set(bench.HEADLINE) | set(bench.BIG_HEADLINE)
    assert bench.CHANGED_THIS_ROUND <= names, (
        bench.CHANGED_THIS_ROUND - names
    )

"""Consolidate the bench gate's baselines into ONE stamped file.

Round-3 verdict findings #8/#9: the gate read two sources (BENCH_r01.json
+ bench_baseline_extra.json), and the extra entries were recorded on the
day each query entered the headline — so their first gate pass was ~1.0×
by construction. This script writes `scripts/bench_baseline.json`:

- queries present in BENCH_r01.json keep their r01 values (the engine's
  established baseline — re-measuring them would erase three rounds of
  regression history);
- every other current-headline query is RE-MEASURED here, in one clean
  session, with exactly bench.py's methodology (untimed warm pass for
  codegen, then clearCache + single-shot timing per query).

Usage: python scripts/consolidate_baseline.py   (takes a few minutes)

Round-4 verdict item 5: the sf1 block had no stamped baselines, so sf1
readings were adjudicated by eyeballing the previous round's recording —
which produced two contention false alarms (q41b, q81). ``--sf1`` stamps
one clean-session measurement per BIG_HEADLINE query against the 10×
replica into the same file (``sf1_queries`` key), preserving the existing
sf0.1 entries; bench_gate.py then gates BOTH blocks (the sf1 side with
auto-re-time, SCALING.md's ±25% single-shot variance note).
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from redix_stream_spark import registry  # noqa: E402
from redix_stream_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main_sf1() -> None:
    """Stamp sf1 baselines for every BIG_HEADLINE query (one clean
    session, bench.py's replica + warm methodology), preserving the
    existing sf0.1 entries."""
    import bench
    from build_scale_replica import ensure_replica

    path = os.path.join(ROOT, "scripts", "bench_baseline.json")
    with open(path) as f:
        out = json.load(f)

    spark = get_spark("baseline-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()
    big_dir = ensure_replica(spark)
    for name in bench.BIG_HEADLINE:  # codegen warm at sf0.01 (cheap)
        queries[name](spark, "/root/testdata/sf0.01").write.format(
            "noop"
        ).mode("overwrite").save()
    bench.ensure_artifacts(spark, big_dir)  # untimed, like bench's own run
    measured: dict[str, float] = {}
    for name in bench.BIG_HEADLINE:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        queries[name](spark, big_dir).write.format("noop").mode("overwrite").save()
        measured[name] = round(time.perf_counter() - t0, 3)

    out["sf1_queries"] = measured
    out.setdefault("_meta", {})["sf1"] = {
        "written": datetime.date.today().isoformat(),
        "scale": "sf0.1 x10 replicas",
        "methodology": (
            "one clean session: replica ensured, codegen warmed at sf0.01, "
            "then clearCache + single-shot wall timing per query through "
            "the noop sink; single-shot variance is ±25% on this host "
            "(SCALING.md sf1 variance note) — the gate auto-re-times "
            "apparent regressions in isolation before failing"
        ),
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"stamped {len(measured)} sf1 baselines into {path}")
    for n, v in sorted(measured.items()):
        print(f"  sf1 {n}: {v:.3f}s")
    spark.stop()


def main() -> None:
    import bench

    with open(os.path.join(ROOT, "BENCH_r01.json")) as f:
        r01 = json.load(f)
    r01_queries = r01.get("parsed", r01)["queries"]

    headline = list(bench.HEADLINE)
    to_measure = [n for n in headline if n not in r01_queries]

    spark = get_spark("baseline-consolidation")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()

    for name in to_measure:  # warm pass: codegen/JIT is not data-path cost
        queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    measured: dict[str, float] = {}
    for name in to_measure:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        measured[name] = round(time.perf_counter() - t0, 3)

    out = {
        "_meta": {
            "written": datetime.date.today().isoformat(),
            "sf_dir": SF_DIR,
            "methodology": (
                "bench.py discipline: one session, untimed warm pass over all "
                "measured queries, then clearCache + single-shot wall timing "
                "per query through the noop sink"
            ),
            "sources": {
                "r01": sorted(n for n in headline if n in r01_queries),
                "measured_this_run": sorted(measured),
            },
        },
        "queries": {
            **{n: r01_queries[n] for n in headline if n in r01_queries},
            **measured,
        },
    }
    path = os.path.join(ROOT, "scripts", "bench_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"wrote {path}: {len(out['queries'])} baselines "
          f"({len(measured)} freshly measured)")
    for n, v in sorted(measured.items()):
        print(f"  measured {n}: {v:.3f}s")
    spark.stop()


def main_add(names: list[str]) -> None:
    """Additively stamp baselines for ``names`` only (new headline
    entries), preserving every existing sf0.1/sf1 value — unlike
    ``main()``, which re-measures ALL non-r01 entries and would reset
    their regression history to today's host conditions.

    STAMPING PROTOCOL (VERDICT r8 item 2): a clean-session-only stamp
    systematically under-reads the contention the driver's bench
    session runs under — three consecutive rounds a freshly-stamped
    face drifted to 1.7-1.9× of its stamp in the driver session on
    noise alone (r6 q167, r7 q87, r8 q190b/q199/q198/q196). So the
    stamp is now the MAX of two readings: the clean-session one
    (bench.py's warm + clearCache discipline) and an IN-BATCH one
    taken after an untimed pass over the full headline set reproduces
    the driver session's accumulated JVM/GC/page-cache pressure. The
    max is the honest baseline for a gate whose readings come from a
    58-query session."""
    import bench

    path = os.path.join(ROOT, "scripts", "bench_baseline.json")
    with open(path) as f:
        out = json.load(f)

    spark = get_spark("baseline-add")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()
    for name in names:
        queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    clean: dict[str, float] = {}
    for name in names:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        clean[name] = round(time.perf_counter() - t0, 3)
    # driver-like batch pressure: the full headline set, untimed.
    for name in bench.HEADLINE:
        try:
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # a broken sibling must not block stamping
            print(f"  (batch-pressure pass: {name} failed: {exc})")
    in_batch: dict[str, float] = {}
    for name in names:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        in_batch[name] = round(time.perf_counter() - t0, 3)
    measured = {n: max(clean[n], in_batch[n]) for n in names}
    out["queries"].update(measured)
    out.setdefault("_meta", {}).setdefault("added", {})[
        datetime.date.today().isoformat()
    ] = sorted(measured)
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
        f.write("\n")
    for n in sorted(measured):
        print(
            f"  added {n}: {measured[n]:.3f}s "
            f"(clean {clean[n]:.3f}s, in-batch {in_batch[n]:.3f}s)"
        )
    spark.stop()


def main_sf1_add(names: list[str]) -> None:
    """Additively stamp sf1 baselines for ``names`` only (new
    BIG_HEADLINE entries), preserving every existing sf1 value — the
    ``--add`` discipline applied to the sf1 block (``--sf1`` re-measures
    ALL of BIG_HEADLINE and resets its regression history)."""
    from build_scale_replica import ensure_replica

    path = os.path.join(ROOT, "scripts", "bench_baseline.json")
    with open(path) as f:
        out = json.load(f)

    import bench

    spark = get_spark("baseline-sf1-add")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()
    big_dir = ensure_replica(spark)
    for name in names:  # codegen warm at sf0.01 (cheap)
        queries[name](spark, "/root/testdata/sf0.01").write.format(
            "noop"
        ).mode("overwrite").save()
    bench.ensure_artifacts(spark, big_dir)  # untimed, like bench's own run
    clean: dict[str, float] = {}
    for name in names:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        queries[name](spark, big_dir).write.format("noop").mode("overwrite").save()
        clean[name] = round(time.perf_counter() - t0, 3)
    # driver-like batch pressure (same protocol as main_add): the full
    # BIG_HEADLINE set untimed, then re-time and stamp the MAX.
    for name in bench.BIG_HEADLINE:
        try:
            queries[name](spark, big_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:
            print(f"  (batch-pressure pass: {name} failed: {exc})")
    in_batch: dict[str, float] = {}
    for name in names:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        queries[name](spark, big_dir).write.format("noop").mode("overwrite").save()
        in_batch[name] = round(time.perf_counter() - t0, 3)
    measured = {n: max(clean[n], in_batch[n]) for n in names}
    out.setdefault("sf1_queries", {}).update(measured)
    out.setdefault("_meta", {}).setdefault("sf1_added", {})[
        datetime.date.today().isoformat()
    ] = sorted(measured)
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
        f.write("\n")
    for n in sorted(measured):
        print(
            f"  added sf1 {n}: {measured[n]:.3f}s "
            f"(clean {clean[n]:.3f}s, in-batch {in_batch[n]:.3f}s)"
        )
    spark.stop()


if __name__ == "__main__":
    if "--sf1-add" in sys.argv:
        main_sf1_add(sys.argv[sys.argv.index("--sf1-add") + 1].split(","))
    elif "--sf1" in sys.argv:
        main_sf1()
    elif "--add" in sys.argv:
        main_add(sys.argv[sys.argv.index("--add") + 1].split(","))
    else:
        main()

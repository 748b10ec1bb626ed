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


if __name__ == "__main__":
    main()

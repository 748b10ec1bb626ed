"""Isolated per-query profiling for the optimization rounds.

Usage:
  python scripts/profile_queries.py q174b_density_clusters_production [more...]
    [--sf /root/testdata/sf0.1] [--runs 3] [--plan-dir plans/r12 --plan-suffix before]

Times each named query through the noop sink (bench methodology: one
untimed codegen-warm pass, then N timed runs with clearCache between),
labels jobs, and optionally dumps the formatted plan.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--plan-suffix", default="before")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    from redix_stream_spark import registry
    from redix_stream_spark.plans import formatted_plan
    from redix_stream_spark.session import get_spark

    spark = get_spark("profile-queries")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()

    for name in args.queries:
        df_fn = queries[name]
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            plan = formatted_plan(df_fn(spark, args.sf))
            path = os.path.join(
                args.plan_dir, f"{name}_{args.plan_suffix}.txt"
            )
            with open(path, "w") as f:
                f.write(plan)
            print(f"plan -> {path}")
        if not args.no_warm:
            spark.sparkContext.setJobDescription(f"{name}: warm")
            df_fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        times = []
        for i in range(args.runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name}: run {i}")
            t0 = time.perf_counter()
            df_fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        if times:
            print(f"{name}: {times} (min {min(times)})")
    spark.stop()


if __name__ == "__main__":
    main()

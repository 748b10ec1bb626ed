"""100× events spot-check: do the event-table operators' growth shapes
hold an order of magnitude past the bench's 10× replica?

Builds an events-only 100× replica of sf0.1 (~10M rows) with the same
discipline as build_scale_replica (disjoint user/id ranges, time ranges
shifted per replica so window densities stay constant — cloned
timestamps would grow pair counts quadratically), then single-shot
times the headline event-table shapes at 10× and 100×.

Usage: python scripts/measure_100x_events.py   (results → stdout;
recorded in SCALING.md "100× events spot-check")
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from pyspark.sql import functions as F  # noqa: E402

from build_scale_replica import KEY_STRIDE, _span_and_gap, ensure_replica  # noqa: E402
from redix_stream_spark import registry  # noqa: E402
from redix_stream_spark.catalog import load_table  # noqa: E402
from redix_stream_spark.session import get_spark  # noqa: E402

FACTOR = 100
OUT = "/tmp/spark_graft_events100"

#: event-table operators whose scale story rests on per-user/windowed
#: shapes (the ones a 100× check can falsify)
QUERIES = [
    "q06b_range_join_agg",
    "q122_scd2_history",
    "q127b_interval_overlap_agg",
    "q136_streaming_quantiles",
    "q124_exact_group_median",  # lineitem-based: read from sf dir as-is
]


def ensure_events_100x(spark) -> str:
    marker = os.path.join(OUT, "_built")
    if os.path.exists(marker):
        return OUT
    e = load_table(spark, "/root/testdata/sf0.1", "events")
    gap = _span_and_gap(e)
    parts = []
    for r in range(FACTOR):
        parts.append(
            e.select(
                (F.col("event_id") + r * KEY_STRIDE).alias("event_id"),
                F.expr(f"ts + INTERVAL {r * gap} SECONDS").alias("ts"),
                (F.col("user_id") + r * KEY_STRIDE).alias("user_id"),
                "event_type",
                "value",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(64).write.mode("overwrite").parquet(
        os.path.join(OUT, "events.parquet")
    )
    # the non-event tables resolve to the sf0.1 originals via symlinks
    for name in os.listdir("/root/testdata/sf0.1"):
        if name != "events.parquet":
            dst = os.path.join(OUT, name)
            if not os.path.exists(dst):
                os.symlink(os.path.join("/root/testdata/sf0.1", name), dst)
    open(marker, "w").write("ok")
    return OUT


def main() -> None:
    spark = get_spark("events-100x")
    spark.sparkContext.setLogLevel("ERROR")
    big10 = ensure_replica(spark)  # the bench's 10× replica
    big100 = ensure_events_100x(spark)
    Q = registry.all_queries()
    for name in QUERIES:
        Q[name](spark, big10).write.format("noop").mode("overwrite").save()
        times = {}
        for label, d in (("10x", big10), ("100x", big100)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            Q[name](spark, d).write.format("noop").mode("overwrite").save()
            times[label] = round(time.perf_counter() - t0, 2)
        print(
            f"{name}: 10x={times['10x']}s 100x={times['100x']}s "
            f"growth={round(times['100x'] / times['10x'], 1)}x",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

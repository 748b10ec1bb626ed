"""100× events spot-check: do the event-table operators' growth shapes
hold an order of magnitude past the bench's 10× replica?

BOTH comparison points are built here with the same replication rule —
disjoint event_id AND user_id ranges per replica, time ranges shifted so
window densities stay constant. (The bench's own 10× replica shifts only
event_id, so its per-user histories densify 10×; comparing against it
would conflate data-shape change with scale — the round-4 review caught
exactly that, and the sibling measure_100x_documents.py uses the same
one-builder-for-both-points discipline.)

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

from build_scale_replica import KEY_STRIDE, _span_and_gap  # noqa: E402
from redix_stream_spark import registry  # noqa: E402
from redix_stream_spark.catalog import load_table  # noqa: E402
from redix_stream_spark.session import get_spark  # noqa: E402

OUT = "/tmp/spark_graft_events{f}x"

#: event-table operators whose scale story rests on per-user/windowed
#: shapes (the ones a 100× check can falsify)
QUERIES = [
    "q06b_range_join_agg",
    "q122_scd2_history",
    "q127b_interval_overlap_agg",
    "q136_streaming_quantiles",
    "q124_exact_group_median",  # lineitem-based: read from sf dir as-is
]


def ensure_events_replica(spark, factor: int) -> str:
    out = OUT.format(f=factor)
    marker = os.path.join(out, "_built")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    e = load_table(spark, "/root/testdata/sf0.1", "events")
    gap = _span_and_gap(e)
    parts = []
    for r in range(factor):
        parts.append(
            e.select(
                (F.col("event_id") + r * KEY_STRIDE).alias("event_id"),
                F.expr(f"ts + INTERVAL {r * gap} SECONDS").alias("ts"),
                (F.col("user_id") + r * KEY_STRIDE).alias("user_id"),
                "event_type",
                "value",
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.repartition(max(8, factor)).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )
    # the non-event tables resolve to the sf0.1 originals via symlinks
    for name in os.listdir("/root/testdata/sf0.1"):
        if name != "events.parquet":
            dst = os.path.join(out, name)
            if not os.path.exists(dst):
                os.symlink(os.path.join("/root/testdata/sf0.1", name), dst)
    open(marker, "w").write("ok")
    return out


def main() -> None:
    spark = get_spark("events-100x")
    spark.sparkContext.setLogLevel("ERROR")
    big10 = ensure_events_replica(spark, 10)
    big100 = ensure_events_replica(spark, 100)
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

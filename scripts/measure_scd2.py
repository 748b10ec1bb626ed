"""Measure StreamingScd2View over 20 sequential ts-ordered batches of the
sf0.1 event log: per-batch wall clock vs accumulated history size. The
claim under test: per-batch work is BATCH-sized (only present users
recompute), so latency stays flat while closed-interval history grows.

Usage: python scripts/measure_scd2.py   (prints one table row per batch)
"""
from __future__ import annotations

import sys
import os
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from redix_stream_spark.catalog import load_table  # noqa: E402
from redix_stream_spark.session import get_spark  # noqa: E402
from redix_stream_spark.streaming.scd2 import StreamingScd2View  # noqa: E402


def main() -> None:
    spark = get_spark("measure-scd2")
    spark.sparkContext.setLogLevel("ERROR")
    e = load_table(spark, "/root/testdata/sf0.1", "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    n_batches = 20
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    lo, hi = e.agg(F.min(us), F.max(us)).head()
    step = (hi - lo) // n_batches + 1
    state = tempfile.mkdtemp(prefix="scd2_measure_")
    view = StreamingScd2View(spark, state)
    print("batch  wall_s  batch_rows  closed_total  open_total")
    for i in range(n_batches):
        b = e.filter(
            (us >= lo + i * step) & (us < lo + (i + 1) * step)
        ).cache()
        n = b.count()
        t0 = time.perf_counter()
        view.ingest_batch(b, i)
        wall = time.perf_counter() - t0
        hist = view.read_history()
        closed = hist.filter(F.col("effective_to").isNotNull()).count()
        opened = hist.filter(F.col("effective_to").isNull()).count()
        b.unpersist()
        print(f"{i:5d}  {wall:6.2f}  {n:10d}  {closed:12d}  {opened:10d}")
    spark.stop()


if __name__ == "__main__":
    main()

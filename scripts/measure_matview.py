"""Measure the incremental-matview lifecycle: per-epoch update cost,
merge-on-read cost vs unfolded-partial count, and the compaction payoff
— 40 sequential epochs of sf0.1 events.

Usage: python scripts/measure_matview.py   (prints a markdown table)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from redix_stream_spark.catalog import load_table  # noqa: E402
from redix_stream_spark.session import get_spark  # noqa: E402
from redix_stream_spark.streaming.matview import StreamingMatView  # noqa: E402

EPOCHS = 40
COMPACT_AT = 30
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("measure-matview")
    spark.sparkContext.setLogLevel("ERROR")
    e = load_table(spark, SF_DIR, "events").cache()
    n = e.count()
    root = tempfile.mkdtemp(prefix="measure_matview_")
    mv = StreamingMatView(os.path.join(root, "mv"))
    print(f"events: {n} rows split into {EPOCHS} epochs; compact at {COMPACT_AT}")
    print("| epoch | update s | read s | note |")
    print("|---|---|---|---|")
    for i in range(EPOCHS):
        batch = e.filter(F.col("event_id") % EPOCHS == i)
        t0 = time.time()
        mv.update(batch, i)
        up = time.time() - t0
        note = ""
        rd = None
        if i == COMPACT_AT:
            t0 = time.time()
            folded = mv.compact(spark)
            note = f"compact({folded} epochs) {time.time() - t0:.2f}s"
        if i % 5 == 4 or i in (COMPACT_AT, COMPACT_AT + 1, EPOCHS - 1):
            t0 = time.time()
            mv.read(spark).write.format("noop").mode("overwrite").save()
            rd = time.time() - t0
        print(
            f"| {i} | {up:.2f} | {'' if rd is None else f'{rd:.2f}'} | {note} |",
            flush=True,
        )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

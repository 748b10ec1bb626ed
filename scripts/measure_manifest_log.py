"""Measure what the manifest log buys at scale: compaction's cost to a
checkpointed consumer, and the per-trigger planning cost.

Both logs get the same 100k messages (sf0.1 events, 64 files). A
checkpointed stream drains each, the log is compacted, one new batch is
produced, and the stream resumes from its checkpoint:

- file-source log: every compacted file is NEW to the checkpoint — the
  resume re-reads the whole log (the delivered-watermark filter hides it
  from handlers, but the I/O and shuffle happen);
- manifest log: offsets are (ms, seq) positions — the resume reads only
  the new batch.

Also times `latestOffset`'s control-plane read (pointer file) against
the eventlog source's footer-stats scan as file counts grow.

Usage: python scripts/measure_manifest_log.py   (→ stdout; recorded in
SCALING.md "manifest log" section)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from redix_stream_spark.catalog import load_table  # noqa: E402
from redix_stream_spark.session import get_spark  # noqa: E402
from redix_stream_spark.streaming.log import EventLog  # noqa: E402
from redix_stream_spark.streaming.manifest_log import ManifestEventLog  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/spark_graft_mlog_measure"


def messages(spark):
    e = load_table(spark, SF_DIR, "events")
    return e.select(
        F.col("event_id").cast("long").alias("ms"),
        F.lit(0).cast("long").alias("seq"),
        F.concat_ws("-", F.col("event_id"), F.lit("0")).alias("id"),
        F.create_map(F.lit("type"), F.col("event_type")).alias("payload"),
    ).repartition(64)


def drain(spark, stream_df, ck):
    """One availableNow drain; returns (wall_seconds, rows_read)."""
    rows = spark.sparkContext.accumulator(0)

    def sink(df, epoch):
        rows.add(df.count())

    t0 = time.perf_counter()
    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return round(time.perf_counter() - t0, 2), rows.value


def main() -> None:
    shutil.rmtree(OUT, ignore_errors=True)
    spark = get_spark("mlog-measure")
    spark.sparkContext.setLogLevel("ERROR")
    msgs = messages(spark).cache()
    n = msgs.count()
    print(f"messages: {n}", flush=True)

    flog = EventLog(os.path.join(OUT, "filelog"))
    mlog = ManifestEventLog(os.path.join(OUT, "mlog"))
    flog.produce_df(msgs)
    mlog.produce_df(msgs)

    fck, mck = os.path.join(OUT, "fck"), os.path.join(OUT, "mck")
    fs, fr = drain(spark, flog.read_stream(spark), fck)
    ms_, mr = drain(spark, mlog.read_stream(spark), mck)
    print(f"initial drain: file={fs}s rows={fr} | manifest={ms_}s rows={mr}", flush=True)

    flog.compact(spark, target_files=8)
    mlog.compact(spark, target_files=8)
    mlog.vacuum()
    flog.produce_many(spark, [{"post": "compact"}])
    mlog.produce_many(spark, [{"post": "compact"}])

    fs, fr = drain(spark, flog.read_stream(spark), fck)
    ms_, mr = drain(spark, mlog.read_stream(spark), mck)
    print(
        f"resume after compaction: file={fs}s rows={fr} (full replay) | "
        f"manifest={ms_}s rows={mr}",
        flush=True,
    )

    # control-plane: latestOffset with a many-file manifest
    from redix_stream_spark.sources.manifest_source import ManifestLogStreamReader

    wide = ManifestEventLog(os.path.join(OUT, "wide"))
    wide.produce_df(messages(spark).repartition(512))
    rdr = ManifestLogStreamReader(None, {"path": wide.root})
    t0 = time.perf_counter()
    for _ in range(100):
        rdr._planned = (-1, -1)
        rdr.latestOffset()
    print(
        f"latestOffset over a 512-file manifest: "
        f"{round((time.perf_counter() - t0) * 10, 3)} ms/call",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()

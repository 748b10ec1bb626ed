"""Advanced streaming: the custom eventlog source feeding event-time
transforms, and a custom stateful operator via applyInPandasWithState —
the engine's stateful-handler escape hatch (SURVEY E26 / streaming)."""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)


def test_eventlog_source_feeds_windowed_aggregation(spark):
    """R3's faithful source composes with E18's event-time windows: replay
    the events log incrementally and aggregate per hour; totals must match
    the batch answer exactly once the stream drains."""
    from redix_stream_spark.catalog import load_table
    from redix_stream_spark.sources import register_eventlog_source

    register_eventlog_source(spark)
    agg_state: dict = {}  # latest emitted count per (window, type)

    def sink(df, epoch):
        for r in df.collect():
            agg_state[(str(r["ws"]), r["event_type"])] = r["n"]

    stream = (
        spark.readStream.format("eventlog")
        .option("path", "/root/testdata/sf0.001/events.parquet")
        .option("maxRowsPerTrigger", "300")
        .load()
        # the source surfaces raw ns ticks; lift to event time like the catalog
        .withColumn("ets", F.expr("timestamp_micros(ts DIV 1000)"))
        .groupBy(F.window("ets", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )
    batch = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("timestamp").alias("ws"), "event_type", "n")
    )
    expected = {(str(r["ws"]), r["event_type"]): r["n"] for r in batch.collect()}

    q = (
        stream.writeStream.outputMode("update")
        .foreachBatch(sink)
        .trigger(processingTime="1 seconds")
        .start()
    )
    deadline = time.time() + 150
    while agg_state != expected and time.time() < deadline:
        time.sleep(0.5)
    q.stop()
    assert agg_state == expected, (
        f"stream converged to {len(agg_state)} keys, expected {len(expected)}"
    )


def test_apply_in_pandas_with_state_running_count(spark, tmp_path):
    """Custom stateful operator: per-user running event count maintained in
    GroupState across micro-batches (the streaming twin of the reference's
    stateful handler loop)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = str(tmp_path / "stream")
    sch = "user_id long, event_id long"
    spark.createDataFrame([(1, 10), (1, 11), (2, 20)], sch).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.2)
    spark.createDataFrame([(1, 12), (3, 30)], sch).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    out_schema = StructType(
        [StructField("user_id", LongType()), StructField("total", LongType())]
    )
    state_schema = StructType([StructField("count", LongType())])

    def count_events(key, pdfs, state: GroupState):
        running = state.get[0] if state.exists else 0
        for pdf in pdfs:
            running += len(pdf)
        state.update((running,))
        yield pd.DataFrame({"user_id": [key[0]], "total": [running]})

    emitted: list[tuple[int, int]] = []

    def sink(df, epoch):
        emitted.extend((r["user_id"], r["total"]) for r in df.collect())

    q = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .groupBy("user_id")
        .applyInPandasWithState(
            count_events,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    finals = {}
    for uid, total in emitted:
        finals[uid] = max(finals.get(uid, 0), total)
    assert finals == {1: 3, 2: 1, 3: 1}, emitted


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """E21's streaming face: exact dedup state bounded by the watermark —
    a duplicate id arriving in a later batch (within the watermark) is
    dropped; only distinct events flow downstream."""
    src = str(tmp_path / "dd")
    sch = "event_id long, ts timestamp, user_id long"
    import datetime

    ts = lambda s: datetime.datetime.fromisoformat(f"2024-01-01 {s}")  # noqa: E731
    spark.createDataFrame(
        [(1, ts("10:00:00"), 7), (2, ts("10:01:00"), 7)], sch
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.2)
    # batch 2: a duplicate of event 2 plus a new event
    spark.createDataFrame(
        [(2, ts("10:01:00"), 7), (3, ts("10:02:00"), 7)], sch
    ).coalesce(1).write.mode("append").parquet(src)

    seen: list[int] = []

    def sink(df, epoch):
        seen.extend(r["event_id"] for r in df.collect())

    q = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert sorted(seen) == [1, 2, 3], seen  # the duplicate never re-emits


def test_transform_with_state_monotonic_delivery(spark, tmp_path):
    """Custom stateful operator face of R3's 'position only moves
    forward' (consumer.ex:276-278): per-key last-delivered (ms, seq)
    persists across micro-batches; redelivered or position-regressing
    rows are suppressed, and ordering (not just uniqueness) is enforced —
    a fresh id at an old position is dropped too."""
    from redix_stream_spark.session import ship_package
    from redix_stream_spark.streaming.stateful import monotonic_delivery

    ship_package(spark)
    src = str(tmp_path / "mono")
    sch = "user string, ms long, seq long, id string"
    # batch 1: u1 advances to (100, 2); u2 to (100, 1)
    spark.createDataFrame(
        [("u1", 100, 1, "a"), ("u1", 100, 2, "b"), ("u2", 100, 1, "c")], sch
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.2)
    # batch 2: replay of u1 (100,2) [dup], regression (100,1) with NEW id
    # [must drop: old position], and a genuine advance (101,0)
    spark.createDataFrame(
        [("u1", 100, 2, "b"), ("u1", 100, 1, "zz-new-id"), ("u1", 101, 0, "d")],
        sch,
    ).coalesce(1).write.mode("append").parquet(src)

    got: list[tuple] = []

    def sink(df, epoch):
        got.extend((r["key"], r["ms"], r["seq"], r["id"]) for r in df.collect())

    q = (
        monotonic_delivery(
            "user",
            spark.readStream.schema(sch).option("maxFilesPerTrigger", "1").parquet(src),
        )
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert sorted(got) == [
        ("u1", 100, 1, "a"),
        ("u1", 100, 2, "b"),
        ("u1", 101, 0, "d"),
        ("u2", 100, 1, "c"),
    ], got

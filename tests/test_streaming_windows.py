"""E18/E20 under real Structured Streaming: the same windowed-aggregation
transform that the batch oracle checks (q20) running under ``readStream``
with a watermark, including late-data drop — the Spark-idiomatic upgrade of
the reference's 'position only moves forward' (consumer.ex:276-278)."""

from __future__ import annotations

import datetime
import time

from pyspark.sql import functions as F


def _write_batch(spark, path: str, rows: list[tuple]) -> None:
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_tumbling_window_with_watermark_drops_late_data(spark, tmp_path):
    """Append-mode watermark semantics: a window is emitted exactly once
    when the watermark passes its end, and a late event arriving after its
    window's state was evicted is dropped — never re-emitted, never
    re-counted. (Empirically, Spark still merges a late row that lands in
    the *same* micro-batch that evicts its window, so the drop guarantee
    is tested across batch boundaries — the only boundary that matters
    once checkpoints make batches atomic.)"""
    src = str(tmp_path / "stream")
    ts = lambda s: datetime.datetime.fromisoformat(f"2024-01-01 {s}")  # noqa: E731

    # Each sub-list is one file → one micro-batch (maxFilesPerTrigger=1;
    # the sleep separates file mtimes so the source orders them).
    batches = [
        [(1, ts("10:05:00"), 7, 1.0), (2, ts("10:20:00"), 7, 1.0), (3, ts("12:05:00"), 7, 1.0)],
        [(5, ts("12:10:00"), 7, 1.0)],   # watermark → 11:05, evicts+emits 10:00
        [(4, ts("10:45:00"), 7, 1.0)],   # LATE: 10:00 state gone → dropped
        [(6, ts("14:00:00"), 7, 1.0)],   # watermark → 13:00, evicts+emits 12:00
    ]
    for b in batches:
        _write_batch(spark, src, b)
        time.sleep(1.2)

    agg = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    emitted: list[tuple[str, int]] = []

    def sink(df, epoch):
        emitted.extend((str(r["ws"]), r["n"]) for r in df.collect())

    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    hour10 = [e for e in emitted if "10:00" in e[0]]
    # Exactly one emission of the 10:00 window, counting only the two
    # pre-watermark events; the late event 4 never resurfaces.
    assert hour10 == [("2024-01-01 10:00:00", 2)], emitted
    assert ("2024-01-01 12:00:00", 2) in emitted, emitted


def test_session_window_streaming_matches_batch(spark, tmp_path):
    """The q22 session transform runs unchanged under readStream."""
    src = str(tmp_path / "stream2")
    ts = lambda s: datetime.datetime.fromisoformat(f"2024-01-01 {s}")  # noqa: E731
    _write_batch(
        spark,
        src,
        [
            (1, ts("09:00:00"), 1, 1.0),
            (2, ts("09:10:00"), 1, 1.0),  # same session (gap < 30m)
            (3, ts("11:00:00"), 1, 1.0),  # new session
        ],
    )
    schema = "event_id long, ts timestamp, user_id long, value double"
    out = []

    def sink(df, epoch):
        out.extend(df.collect())

    q = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    sessions = sorted((r["n"] for r in out))
    assert sessions == [1, 2]


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream inner join with an event-time interval constraint:
    each purchase joins clicks by the same user within the preceding
    hour. Both sides carry watermarks so Spark can bound the join state
    (clicks older than watermark - 1h are evicted) — the stateful-join
    capability that pairs with the batch range/as-of joins (q06/q07)."""
    import datetime

    ts = lambda s: datetime.datetime.fromisoformat(f"2024-01-01 {s}")  # noqa: E731
    clicks_p, buys_p = str(tmp_path / "clicks"), str(tmp_path / "buys")
    csch = "user_id long, click_id long, cts timestamp"
    bsch = "user_id long, buy_id long, bts timestamp"
    spark.createDataFrame(
        [(1, 100, ts("10:00:00")), (1, 101, ts("10:40:00")), (2, 200, ts("10:05:00"))],
        csch,
    ).coalesce(1).write.mode("append").parquet(clicks_p)
    spark.createDataFrame(
        # u1 buys at 10:50 (both clicks within 1h); u2 buys at 11:30
        # (click at 10:05 is 85 min earlier — outside the interval)
        [(1, 900, ts("10:50:00")), (2, 901, ts("11:30:00"))],
        bsch,
    ).coalesce(1).write.mode("append").parquet(buys_p)

    clicks = (
        spark.readStream.schema(csch).parquet(clicks_p).withWatermark("cts", "2 hours")
    )
    buys = (
        spark.readStream.schema(bsch).parquet(buys_p).withWatermark("bts", "2 hours")
    )
    joined = clicks.alias("c").join(
        buys.alias("b"),
        F.expr(
            "c.user_id = b.user_id AND "
            "b.bts >= c.cts AND b.bts <= c.cts + INTERVAL 1 HOUR"
        ),
    )
    got: list[tuple[int, int]] = []

    def sink(df, epoch):
        got.extend((r["click_id"], r["buy_id"]) for r in df.collect())

    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert sorted(got) == [(100, 900), (101, 900)]

"""Stream-stream interval join: result equality with the batch join,
late-arrival drop under the watermark, and the plan's state bound."""

from __future__ import annotations

import datetime
import os
import time

from pyspark.sql import functions as F

from redix_stream_spark.streaming.join import interval_join

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"
T0 = datetime.datetime(2024, 3, 1, 12, 0)


def _ev(eid, minutes, user, typ):
    return (eid, T0 + datetime.timedelta(minutes=minutes), user, typ, 1.0)


def _views_clicks(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    views = df.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("uid"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    clicks = df.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("uid"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return views, clicks


ROWS = [
    _ev(1, 0, 7, "view"),
    _ev(2, 30, 7, "click"),   # within 1h of view 1 → joins
    _ev(3, 90, 7, "click"),   # outside view 1s hour, inside view 4s → joins to 4
    _ev(4, 80, 7, "view"),
    _ev(5, 100, 7, "click"),  # within 1h of view 4 → joins
    _ev(6, 10, 8, "click"),   # user 8 never views → no join
    _ev(7, 0, 9, "view"),     # user 9 never clicks → no join (inner)
]


def _expected_pairs(spark):
    views, clicks = _views_clicks(spark, ROWS)
    return sorted(
        (r["view_id"], r["click_id"])
        for r in views.join(
            clicks,
            (views.uid == clicks.uid)
            & (clicks.click_ts >= views.view_ts)
            & (clicks.click_ts <= views.view_ts + F.expr("INTERVAL 1 hour")),
        ).collect()
    )


def test_stream_stream_interval_join_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # two landing batches so the join must correlate ACROSS micro-batches
    # (view buffered in state until its click arrives later)
    spark.createDataFrame(ROWS[:3], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(ROWS[3:], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    )
    views = stream.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("uid"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    clicks = stream.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("uid"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    joined = interval_join(
        views, clicks, key="uid", left_ts="view_ts", right_ts="click_ts"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["view_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM ssj_out").collect()
    )
    assert got == _expected_pairs(spark)
    assert got == [(1, 2), (4, 3), (4, 5)]


def test_interval_join_batch_face_matches_semantics(spark):
    """The same operator applied to bounded frames (watermark is a no-op
    in batch) — pins the join condition itself."""
    views, clicks = _views_clicks(spark, ROWS)
    out = interval_join(
        views, clicks, key="uid", left_ts="view_ts", right_ts="click_ts"
    )
    assert sorted((r["view_id"], r["click_id"]) for r in out.collect()) == [
        (1, 2),
        (4, 3),
        (4, 5),
    ]

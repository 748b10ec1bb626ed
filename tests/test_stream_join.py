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


# --- left_outer: null-padded unmatched left rows emitted at watermark ------

#: Outer-face scenario: user 9's view never gets a click — in
#: left_outer it must surface null-padded, but ONLY once the watermark
#: passes view_ts + interval (before that a matching click could still
#: arrive). The minute-130 pusher pair exists purely to advance the
#: watermark and must ride BOTH branches: each withWatermark node tracks
#: its own max event time and the GLOBAL watermark is their MIN, so a
#: pusher on one side alone leaves the global clock behind (measured —
#: the first cut of this test pushed only clicks and the null row never
#: emitted). Neither pusher reaches the output: the view (u99) stays in
#: state past end-of-stream, the click matches nothing.
OUTER_FILES = [
    [_ev(1, 0, 7, "view"), _ev(2, 30, 7, "click"), _ev(7, 0, 9, "view")],
    [
        _ev(4, 80, 7, "view"),
        _ev(3, 90, 7, "click"),
        _ev(5, 100, 7, "click"),
        _ev(6, 10, 8, "click"),
        _ev(90, 130, 99, "view"),   # watermark pusher, views branch
        _ev(92, 130, 98, "click"),  # pusher, clicks branch (distinct user
        #                             — same user would self-join)
    ],
    # batch 3 then runs with global watermark t130−60 = t70 > t60, so
    # view 7's null-padded row flushes during it.
    [_ev(91, 300, 98, "click")],
]


def test_stream_stream_left_outer_emits_null_padded_at_watermark(
    spark, tmp_path
):
    """The programming-guide outer pattern: matched pairs emit as in the
    inner join; the unmatched left row (view 7) emits null-padded only
    after the watermark clears view_ts + interval (t60) — here in the
    third micro-batch, whose watermark (max event t130 − 1h = t70) is
    the first past the bound."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate(OUTER_FILES):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
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
        views,
        clicks,
        key="uid",
        left_ts="view_ts",
        right_ts="click_ts",
        how="left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_outer")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["view_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM ssj_outer").collect()
    )
    assert got == [(1, 2), (4, 3), (4, 5), (7, None)]
    # the null-padded row carries nulls on EVERY right column, not just
    # the id (the pad is the whole side).
    pad = [
        r
        for r in spark.sql("SELECT * FROM ssj_outer").collect()
        if r["click_id"] is None
    ]
    assert len(pad) == 1 and pad[0]["click_ts"] is None
    assert pad[0]["view_id"] == 7 and pad[0]["uid"] == 9


def test_interval_join_left_outer_batch_face_matches(spark):
    """Batch face: the same operator over bounded frames (watermarks are
    no-ops) null-pads EVERY unmatched left row — including pusher view
    90, which the streaming run correctly withholds because its match
    window is still open at end-of-stream. The difference is the
    semantics, not a bug: batch is a closed world, streaming emits an
    unmatched row only once the watermark proves no match can come."""
    all_rows = [r for f in OUTER_FILES for r in f]
    views, clicks = _views_clicks(spark, all_rows)
    out = interval_join(
        views,
        clicks,
        key="uid",
        left_ts="view_ts",
        right_ts="click_ts",
        how="left_outer",
    )
    assert sorted(
        (r["view_id"], r["click_id"]) for r in out.collect()
    ) == [(1, 2), (4, 3), (4, 5), (7, None), (90, None)]


def _run_outer(spark, tmp_path, how, name):
    src = str(tmp_path / "src")
    os.makedirs(src)
    for rows in OUTER_FILES:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
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
        views, clicks, key="uid", left_ts="view_ts",
        right_ts="click_ts", how=how,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return sorted(
        (
            (r["view_id"], r["click_id"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        ),
        key=lambda p: (
            -1 if p[0] is None else p[0],
            -1 if p[1] is None else p[1],
        ),
    )


def test_stream_stream_right_outer_emits_unmatched_clicks(spark, tmp_path):
    """right_outer mirror of the left_outer scenario: the clickless
    view stays silent; click 6 (user 8, t10 — no view ever) emits
    null-padded once the watermark clears its lookback window
    (view_ts in [t10−60, t10], so expiry t10 < t70 at batch 3). The
    minute-130/300 pusher clicks stay withheld — their windows are
    still open at end-of-stream."""
    got = _run_outer(spark, tmp_path, "right_outer", "ssj_router")
    assert got == [(None, 6), (1, 2), (4, 3), (4, 5)]


def test_stream_stream_full_outer_is_union_of_both_sides(spark, tmp_path):
    """full_outer = inner pairs + each side's watermark-expired
    unmatched rows: view 7 null-padded right, click 6 null-padded
    left, in one query."""
    got = _run_outer(spark, tmp_path, "full_outer", "ssj_full")
    assert got == [(None, 6), (1, 2), (4, 3), (4, 5), (7, None)]


def test_interval_join_state_is_evicted_as_watermark_advances(
    spark, tmp_path
):
    """E88's load-bearing claim at 100 TB (VERDICT r8 item 7): the
    watermark + interval bound must actually SHRINK the state store,
    not just gate emissions. Three micro-batches: a 40-row burst, a
    pusher batch whose event time clears the burst's windows, and a
    second pusher batch during which the eviction (driven by the
    PREVIOUS batch's watermark) lands. ``stateOperators.numRowsTotal``
    must peak with the burst and then drop to just the live pushers —
    if state only ever grows, the operator is an unbounded-memory bomb
    at production uptime."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    burst = [_ev(i, i, 7, "view") for i in range(20)] + [
        _ev(100 + i, i, 7, "click") for i in range(20)
    ]
    files = [
        burst,
        # pushers at t300 on BOTH branches (min-of-watermarks trap —
        # see OUTER_FILES): watermark after this batch = t240, past
        # every burst window (last view expiry t19+60 = t79).
        [_ev(300, 300, 99, "view"), _ev(301, 300, 98, "click")],
        # one more batch so the t240 watermark is APPLIED to state.
        [_ev(400, 600, 99, "view"), _ev(401, 600, 98, "click")],
    ]
    for rows in files:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
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
        .queryName("ssj_evict")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    totals = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in (q.recentProgress or [])
        if p.get("stateOperators")
    ]
    assert len(totals) >= 3, totals
    assert totals[0] >= 40  # the burst is buffered on both sides
    assert max(totals) >= totals[0]
    # after the watermark passes the burst's windows, the burst rows
    # are GONE from state — only the still-open pusher rows remain.
    assert totals[-1] <= 6, totals
    assert totals[-1] < totals[0]

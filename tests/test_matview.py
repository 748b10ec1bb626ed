"""Streaming materialized view: incremental maintenance must be
invisible in results (≡ the batch aggregate), idempotent under epoch
replay, and stable across compaction — including the crash window where
folded partial dirs survive on disk."""

from __future__ import annotations

import datetime
import os
import time

from pyspark.sql import functions as F

from redix_stream_spark.streaming.matview import StreamingMatView


def _rows(day: int, n: int, typ: str = "view"):
    base = datetime.datetime(2024, 1, day)
    return [
        (day * 1000 + i, base + datetime.timedelta(minutes=17 * i), 7, typ, 1.5 + i)
        for i in range(n)
    ]


SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _expected(spark, all_rows):
    return {
        (str(r["window_start"]), r["event_type"]): (r["n"], float(r["sum_dec"]))
        for r in spark.createDataFrame(all_rows, SCHEMA)
        .groupBy(
            F.window("ts", "1 hour").start.alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_dec"),
        )
        .collect()
    }


def _view_dict(spark, mv):
    return {
        (str(r["window_start"]), r["event_type"]): (r["n"], float(r["sum_dec"]))
        for r in mv.read(spark).collect()
    }


def test_matview_equals_batch_and_survives_replay_and_compaction(spark, tmp_path):
    mv = StreamingMatView(str(tmp_path / "mv"))
    b1, b2, b3 = _rows(1, 5), _rows(2, 4, "click") + _rows(1, 2), _rows(3, 3)
    mv.update(spark.createDataFrame(b1, SCHEMA), 0)
    mv.update(spark.createDataFrame(b2, SCHEMA), 1)
    expect12 = _expected(spark, b1 + b2)
    assert _view_dict(spark, mv) == expect12

    # Crash-replay of epoch 1: same directory rewritten, result unchanged.
    mv.update(spark.createDataFrame(b2, SCHEMA), 1)
    assert _view_dict(spark, mv) == expect12

    # Compact, then keep streaming into a fresh partial.
    assert mv.compact(spark) == 2
    assert _view_dict(spark, mv) == expect12
    mv.update(spark.createDataFrame(b3, SCHEMA), 2)
    expect123 = _expected(spark, b1 + b2 + b3)
    assert _view_dict(spark, mv) == expect123

    # Crash window: a folded epoch's dir reappears (lagging replay after
    # compaction) — the manifest keeps it dead.
    mv.update(spark.createDataFrame(b1, SCHEMA), 0)
    assert _view_dict(spark, mv) == expect123
    assert mv.compact(spark) == 1  # folds only epoch 2
    assert _view_dict(spark, mv) == expect123


def test_matview_under_real_stream(spark, tmp_path):
    """The foreachBatch wiring under an actual availableNow stream."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    b1, b2 = _rows(1, 6), _rows(2, 5, "click")
    for b in (b1, b2):
        spark.createDataFrame(b, SCHEMA).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    mv = StreamingMatView(str(tmp_path / "mv"))
    q = (
        mv.attach(
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src),
            str(tmp_path / "ck"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert _view_dict(spark, mv) == _expected(spark, b1 + b2)


def test_latest_view_equals_batch_argmax_and_replay(spark, tmp_path):
    from redix_stream_spark.streaming.matview import StreamingLatestView

    lv = StreamingLatestView(str(tmp_path / "lv"))
    # Out-of-order delivery across epochs: day-2 events arrive first.
    b1, b2 = _rows(2, 4, "click"), _rows(1, 5)
    lv.update(spark.createDataFrame(b1, SCHEMA), 0)
    lv.update(spark.createDataFrame(b2, SCHEMA), 1)
    # Replay epoch 1 (idempotence), then compact and read.
    lv.update(spark.createDataFrame(b2, SCHEMA), 1)
    lv.compact(spark)

    got = {
        r["user_id"]: (str(r["last_ts"]), r["event_type"], r["n_events"])
        for r in lv.read(spark).collect()
    }
    allr = sorted(b1 + b2, key=lambda t: (t[1], t[0]))
    last = allr[-1]
    assert got == {7: (str(last[1]), last[3], len(allr))}


def test_sliding_hll_tracks_exact_within_5pct(spark, sf_dir):
    """q109b's sketch estimates must track the exact sliding distinct."""
    from redix_stream_spark import registry

    Q = registry.all_queries()
    exact = {
        str(r["hr"]): r["users_24h"]
        for r in Q["q109_sliding_distinct"](spark, sf_dir).collect()
    }
    est = {
        str(r["hr"]): r["users_24h_est"]
        for r in Q["q109b_sliding_distinct_hll"](spark, sf_dir).collect()
    }
    assert set(exact) == set(est)
    for hr, n in exact.items():
        assert abs(est[hr] - n) <= max(2, 0.05 * n), (hr, n, est[hr])

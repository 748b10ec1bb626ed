"""ManifestEventLog + the ``manifestlog`` streaming source — the
object-store-safe log face (streaming/manifest_log.py): manifest commits,
logical (ms, seq) offsets, compaction invisible to checkpoints, and the
crash windows of the generation-pointer protocol."""

from __future__ import annotations

import json
import os

import pytest

from redix_stream_spark.streaming.manifest_log import ManifestEventLog


@pytest.fixture()
def log(tmp_path):
    return ManifestEventLog(str(tmp_path / "mlog"))


def _run_stream(spark, log, ck):
    """Drain the log through the manifestlog source; availableNow on a
    Python source falls back to ONE unbounded batch to the latest
    offset, which is exactly a drain. Returns [(ms, seq, id,
    payload_dict), ...] in delivery order."""
    got: list[tuple] = []

    def sink(df, epoch):
        got.extend(
            (r["ms"], r["seq"], r["id"], dict(r["payload"]))
            for r in df.collect()
        )

    q = (
        log.read_stream(spark)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return got


def test_produce_roundtrip_ids_and_coercion(spark, log):
    """R1 semantics survive the manifest layout: server-assigned
    ``<ms>-<seq>`` ids, monotone (ms, seq), values stringified
    (stream.ex:16-30); batch read returns exactly what was produced and
    max_position is served from the pointer without any file scan."""
    ids = log.produce_many(spark, [{"k": 1, "n": 2.5}, {"k": "two"}])
    ids += log.produce_many(spark, [{"k": 3}])
    rows = {r["id"]: r for r in log.read(spark).collect()}
    assert sorted(rows) == sorted(ids) and len(ids) == 3
    assert dict(rows[ids[0]]["payload"]) == {"k": "1", "n": "2.5"}
    positions = sorted((rows[i]["ms"], rows[i]["seq"]) for i in ids)
    assert positions == [(r["ms"], r["seq"]) for r in sorted(
        rows.values(), key=lambda r: (r["ms"], r["seq"]))]
    assert log.max_position() == positions[-1]
    # the pointer carries the end position: no data read involved
    meta = log.state.meta()
    assert (meta["max_ms"], meta["max_seq"]) == positions[-1]
    assert meta["rows"] == 3


def test_stream_equals_batch_and_pacing(spark, log, tmp_path):
    """The streaming face serves every row exactly once; the FIRST batch
    of a run is unpaced by design (a restart's checkpointed position is
    invisible to latestOffset — pacing it could rewind the offset), and
    maxRowsPerTrigger then cuts subsequent micro-batches at file
    granularity: files produced while the query runs arrive one per
    trigger under a 1-row budget."""
    ids = []
    for b in range(3):
        ids += log.produce_many(spark, [{"b": b, "i": i} for i in range(4)])
    got = _run_stream(spark, log, str(tmp_path / "ck1"))
    assert sorted(g[2] for g in got) == sorted(ids)
    import time

    epochs: list[list[str]] = []

    def sink(df, epoch):
        rows = [r["id"] for r in df.collect()]
        if rows:
            epochs.append(rows)

    q = (
        spark.readStream.format("manifestlog")
        .option("path", log.root)
        .option("maxRowsPerTrigger", "1")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    deadline = time.time() + 120
    while len(epochs) < 1 and time.time() < deadline:
        time.sleep(0.5)  # first batch: the whole existing log, unpaced
    ids_live = []
    for b in (3, 4):
        ids_live += log.produce_many(spark, [{"b": b, "i": i} for i in range(4)])
    while sum(map(len, epochs)) < 20 and time.time() < deadline:
        time.sleep(0.5)
    q.stop()
    assert [len(e) for e in epochs] == [12, 4, 4]  # unpaced first, then paced
    assert [i for e in epochs for i in e] == ids + ids_live  # position order
    # RESTART under pacing must not rewind: a fresh paced query on the
    # same checkpoint serves its first batch unpaced to the log end (the
    # checkpointed position is unknown at latestOffset time — a paced
    # cut from scratch would regress the recorded offset and redeliver
    # all 12 committed rows)
    ids4 = log.produce_many(spark, [{"b": 99, "i": 0}])
    restarted: list[str] = []

    def sink2(df, epoch):
        restarted.extend(r["id"] for r in df.collect())

    q = (
        spark.readStream.format("manifestlog")
        .option("path", log.root)
        .option("maxRowsPerTrigger", "1")
        .load()
        .writeStream.foreachBatch(sink2)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    deadline = time.time() + 120
    while not restarted and time.time() < deadline:
        time.sleep(0.5)
    q.stop()
    assert restarted == ids4, f"restart redelivered: {restarted}"


def test_compaction_invisible_to_checkpoint(spark, log, tmp_path):
    """THE property the file source can't give (log.py:158-167 needs a
    consumer-side watermark to mask full replay): after compaction
    rewrites every data file, a consumer resuming from its checkpoint
    sees nothing old — offsets are log positions, not file names — and
    new appends still flow."""
    ids1 = log.produce_many(spark, [{"i": i} for i in range(6)])
    ck = str(tmp_path / "ck")
    assert sorted(g[2] for g in _run_stream(spark, log, ck)) == sorted(ids1)

    n = log.compact(spark, target_files=1)
    assert n == 6
    assert len(log.data_files()) == 1
    assert log.vacuum() >= 1  # the pre-compaction files are unreferenced
    ids2 = log.produce_many(spark, [{"i": "new"}])

    got = _run_stream(spark, log, ck)  # SAME checkpoint
    assert [g[2] for g in got] == ids2  # no redelivery, new row delivered
    # and the data survived compaction bit-for-bit
    rows = {r["id"] for r in log.read(spark).collect()}
    assert rows == set(ids1) | set(ids2)


def test_crash_between_stage_and_commit(spark, log):
    """Kill the writer after staging a generation but before the pointer
    commit: readers keep the old generation (complete, consistent), and
    the orphan is swept by the next commit's cleanup."""
    ids = log.produce_many(spark, [{"i": 1}])
    gen, path = log.state.stage()  # crash here: manifest never written
    with open(os.path.join(path, "manifest.json"), "w") as fh:
        fh.write("[")  # even a torn manifest file must be invisible

    reopened = ManifestEventLog(log.root)
    assert [r["id"] for r in reopened.read(spark).collect()] == ids
    assert reopened.max_position() == (int(ids[0].split("-")[0]), 0)
    ids2 = reopened.produce_many(spark, [{"i": 2}])
    # the torn stage dir is gone, the new commit is live
    assert not os.path.isdir(path)
    assert {r["id"] for r in reopened.read(spark).collect()} == set(ids + ids2)


def test_vacuum_spares_referenced_files(spark, log):
    """vacuum() only removes unreferenced data files — after appends
    with no compaction there is nothing to collect."""
    log.produce_many(spark, [{"i": 1}])
    log.produce_many(spark, [{"i": 2}])
    assert log.vacuum() == 0
    assert len(log.data_files()) == 2
    assert log.compact(spark, target_files=1) == 2
    assert log.vacuum() == 2
    assert {r["payload"]["i"] for r in log.read(spark).collect()} == {"1", "2"}


def test_consumer_over_manifest_log(spark, log, tmp_path):
    """The full Consumer (ordered apply, tombstone skip, ack/pending —
    reference consumer.ex) runs unchanged over the manifest log: the
    dataclass duck-types on produce/read/max_position and _stream
    dispatches to the logical-offset source."""
    from redix_stream_spark.streaming import Consumer, HandlerResult
    from redix_stream_spark.streaming.log import TOMBSTONE

    seen: list[tuple[str, dict]] = []

    def handler(mid, payload):
        seen.append((mid, payload))
        return HandlerResult.OK

    ids1 = log.produce_many(spark, [{"key": f"v{i}"} for i in range(3)])
    log.produce(spark, TOMBSTONE)
    c = Consumer(log, handler, str(tmp_path / "ck"), group_name="g1")
    c.run_once(spark)
    ids2 = log.produce_many(spark, [{"key": "late"}])
    c.run_once(spark)
    assert [i for i, _ in seen] == ids1 + ids2  # ordered, tombstone skipped
    # OK handler acks everything it saw; only the tombstone stays pending
    # (skipped without ack — reference consumer.ex:286,295 semantics)
    assert [dict(r["payload"]) for r in c.pending(spark).collect()] == [TOMBSTONE]


def test_consumer_compaction_no_replay(spark, log, tmp_path):
    """Compaction between consumer runs: the file-source path replays the
    whole rewritten directory and relies on the delivered watermark to
    mask it; the manifest path's checkpoint offsets are log positions, so
    nothing is even re-read. Behavioral contract either way: the handler
    never re-sees a message."""
    from redix_stream_spark.streaming import Consumer, HandlerResult

    seen: list[str] = []

    def handler(mid, payload):
        seen.append(mid)
        return HandlerResult.OK

    ids1 = log.produce_many(spark, [{"i": i} for i in range(5)])
    c = Consumer(log, handler, str(tmp_path / "ck"))
    c.run_once(spark)
    assert log.compact(spark, target_files=1) == 5
    log.vacuum()
    ids2 = log.produce_many(spark, [{"i": "post-compact"}])
    c.run_once(spark)
    assert seen == ids1 + ids2


def test_snapshot_reads(spark, log):
    """Every commit is a complete manifest, so retained generations are
    readable snapshots: gen N reconstructs the log exactly as of commit
    N; compaction adds a generation without changing the current view;
    vacuum() expires snapshots that reference reclaimed files (explicit
    error, never a partial read)."""
    ids1 = log.produce_many(spark, [{"i": 1}])
    g1 = log.state.current_gen()
    ids2 = log.produce_many(spark, [{"i": 2}])
    g2 = log.state.current_gen()
    log.compact(spark, target_files=1)
    assert log.generations() == [g1, g2, log.state.current_gen()]
    assert [r["id"] for r in log.read(spark, gen=g1).collect()] == ids1
    assert sorted(r["id"] for r in log.read(spark, gen=g2).collect()) == sorted(
        ids1 + ids2
    )
    assert log.read(spark).count() == 2  # current view unchanged
    # an uncommitted (crashed) stage number is never readable
    with pytest.raises(ValueError, match="not in the committed history"):
        log.manifest(gen=99)
    # vacuum reclaims the pre-compaction files -> old snapshots expire
    assert log.vacuum() == 2
    with pytest.raises(FileNotFoundError, match="vacuum"):
        log.read(spark, gen=g1)
    assert log.read(spark).count() == 2  # current always fine


def test_history_cap_expires_oldest(spark, log, monkeypatch):
    """The committed-generation history is the retention policy: beyond
    HISTORY_CAP the oldest manifests are swept at commit time."""
    monkeypatch.setattr(type(log), "HISTORY_CAP", 3)
    for i in range(5):
        log.produce_many(spark, [{"i": i}])
    gens = log.generations()
    assert len(gens) == 3
    assert not os.path.isdir(log.state.gen_dir(0))
    assert log.read(spark, gen=gens[0]).count() == 3  # oldest retained = 3 appends
    assert log.read(spark).count() == 5


def test_interleaved_maintenance_model_equivalence(spark, log):
    """A scripted interleaving of produce / compact / vacuum (the ops a
    long-lived log actually sees, in an order no single scenario test
    walks) against a driver-side model: after every step the log's
    content equals the model, max_position is monotone, and the row
    count in the pointer matches. Maintenance must never be observable
    in the data."""
    model: dict[str, dict] = {}
    last_pos = (-1, -1)
    script = [
        ("produce", 3), ("compact", 1), ("produce", 1), ("vacuum", None),
        ("produce", 4), ("compact", 2), ("compact", 1), ("produce", 2),
        ("vacuum", None), ("compact", 3), ("vacuum", None), ("produce", 1),
    ]
    for step, (op, arg) in enumerate(script):
        if op == "produce":
            ids = log.produce_many(
                spark, [{"step": step, "i": i} for i in range(arg)]
            )
            for i, mid in enumerate(ids):
                model[mid] = {"step": str(step), "i": str(i)}
        elif op == "compact":
            assert log.compact(spark, target_files=arg) == len(model)
        else:
            log.vacuum()
        rows = {r["id"]: dict(r["payload"]) for r in log.read(spark).collect()}
        assert rows == model, f"divergence after step {step} ({op})"
        pos = log.max_position()
        assert pos >= last_pos
        last_pos = pos
        assert log.state.meta()["rows"] == len(model)


def test_multi_log_stream_union(spark, log, tmp_path):
    """EventLog.union_read_stream parity for manifest logs: one stream
    over several logs, each row tagged with its source; per-log order
    holds, compaction of one log stays invisible to the union's
    checkpoint."""
    import pyspark.sql.functions as F

    other = ManifestEventLog(str(tmp_path / "mlog2"))
    ids_a = log.produce_many(spark, [{"k": "a"}])
    ids_b = other.produce_many(spark, [{"k": "b"}])
    union = (
        log.read_stream(spark).withColumn("stream", F.lit(log.root))
        .unionByName(
            other.read_stream(spark).withColumn("stream", F.lit(other.root))
        )
    )
    got: list[tuple] = []

    def sink(df, epoch):
        got.extend((r["stream"], r["id"]) for r in df.collect())

    ck = str(tmp_path / "uck")
    q = (union.writeStream.foreachBatch(sink)
         .option("checkpointLocation", ck).trigger(availableNow=True).start())
    q.awaitTermination(180)
    assert sorted(got) == sorted(
        [(log.root, ids_a[0]), (other.root, ids_b[0])]
    )
    # compact one log; resume the union: nothing replays, new rows flow
    log.compact(spark, target_files=1)
    log.vacuum()
    ids_a2 = log.produce_many(spark, [{"k": "a2"}])
    got.clear()
    q = (union.writeStream.foreachBatch(sink)
         .option("checkpointLocation", ck).trigger(availableNow=True).start())
    q.awaitTermination(180)
    assert got == [(log.root, ids_a2[0])]


def test_pipeline_manifest_to_manifest(spark, log, tmp_path):
    """A log→log Pipeline runs over manifest logs on both ends: the
    transform's output commits per micro-batch as manifest generations,
    ids flow through, and a second drain moves nothing."""
    from redix_stream_spark.streaming.pipeline import Pipeline
    import pyspark.sql.functions as F

    sink = ManifestEventLog(str(tmp_path / "sink"))
    ids = log.produce_many(spark, [{"n": i} for i in range(3)])

    def double(df):
        return df.select(
            "ms", "seq", "id",
            F.map_from_arrays(
                F.array(F.lit("n2")),
                F.array((F.element_at("payload", "n").cast("long") * 2).cast("string")),
            ).alias("payload"),
        )

    p = Pipeline(log, sink, double, str(tmp_path / "pck"))
    p.run_once(spark)
    rows = {r["id"]: dict(r["payload"]) for r in sink.read(spark).collect()}
    assert rows == {mid: {"n2": str(2 * i)} for i, mid in enumerate(ids)}
    p.run_once(spark)  # nothing new -> nothing produced
    assert sink.read(spark).count() == 3


def test_commit_is_pointer_only(spark, log):
    """No live directory is ever renamed: after a produce+compact cycle
    the root holds CURRENT + gen dirs + data/, and a reader mid-anything
    always finds a complete committed manifest (contrast EventLog.compact's
    documented two-rename window, log.py:174-184)."""
    log.produce_many(spark, [{"i": 1}])
    before = log.state.current_gen()
    log.compact(spark, target_files=1)
    assert log.state.current_gen() == before + 1
    doc = json.load(open(os.path.join(log.root, "CURRENT")))
    assert set(doc) >= {"gen", "max_ms", "max_seq", "rows", "files"}
    entries = log.manifest()
    assert all(os.path.exists(os.path.join(log.root, e["file"])) for e in entries)


def test_paced_offset_holds_on_torn_pointer_manifest(tmp_path):
    """ADVICE r04: CURRENT advertising data past the planned position
    while the manifest is unreadable (mid-commit window on an eventually
    consistent store) must HOLD the paced offset at the previous planned
    position — not fall through to one silent unbounded batch."""
    from redix_stream_spark.sources.manifest_source import ManifestLogStreamReader

    root = str(tmp_path / "torn")
    os.makedirs(root)
    # pointer says 10 rows up to (5, 0); no gen dir / manifest exists
    with open(os.path.join(root, "CURRENT"), "w") as fh:
        json.dump({"gen": 7, "max_ms": 5, "max_seq": 0, "rows": 10}, fh)
    rdr = ManifestLogStreamReader(None, {"path": root, "maxRowsPerTrigger": "2"})
    rdr._planned = (3, 0)  # mid-run: pacing active
    assert rdr.latestOffset() == {"ms": 3, "seq": 0}  # held, retry next trigger
    # unpaced readers keep the old contract: plan to the pointer end
    rdr2 = ManifestLogStreamReader(None, {"path": root})
    rdr2._planned = (3, 0)
    assert rdr2.latestOffset() == {"ms": 5, "seq": 0}

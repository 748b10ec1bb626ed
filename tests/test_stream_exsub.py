"""E169 — StreamingExactSubstrScrubber lifecycle.

Contract pins: a drained one-batch stream equals the batch faces (q211
exact / q211b winnowed) row for row; multi-batch runs follow
first-occurrence semantics; every crash window of the staged-decision
protocol replays to the SAME report (the nastiest — claims appended,
marker absent — is simulated by driving the steps by hand); compaction
folds the index without changing later decisions.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from redix_stream_spark.llm.dedup import EXSUB_W, WINNOW_S
from redix_stream_spark.llm.stream_dedup import StreamingExactSubstrScrubber


def _span(tag: str, n: int) -> str:
    return " ".join(f"{tag}{i}" for i in range(n))


def _filler(n: int, seed: int) -> str:
    return " ".join(f"f{seed}x{i}" for i in range(n))


def _docs_df(spark, rows: list[tuple[int, str]]):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _write_sf(tmp_path, rows: list[tuple[int, str]]) -> str:
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    pd.DataFrame(
        {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
    ).to_parquet(os.path.join(d, "documents.parquet"))
    return d


CORPUS = [
    (1, " ".join([_filler(12, 1), _span("dup", EXSUB_W + 3), _filler(9, 2)])),
    (2, " ".join([_filler(7, 3), _span("dup", EXSUB_W + 3), _filler(11, 4)])),
    (3, _filler(30, 5)),
    (4, _filler(EXSUB_W - 1, 6)),  # sub-W
]


@pytest.mark.parametrize("winnowed", [False, True])
def test_drained_stream_equals_batch_face(spark, tmp_path, winnowed):
    import __spark_entry__ as ent

    sf = _write_sf(tmp_path, CORPUS)
    face = (
        "q211b_exact_substring_winnowed"
        if winnowed
        else "q211_exact_substring_dedup"
    )
    expected = {
        r["doc_id"]: r.asDict()
        for r in ent.queries()[face](spark, sf).collect()
    }
    s = StreamingExactSubstrScrubber(
        str(tmp_path / "idx"), str(tmp_path / "rep"), winnowed=winnowed
    )
    s.apply_batch(_docs_df(spark, CORPUS), 0)
    got = {
        r["doc_id"]: r.asDict()
        for r in s.report(spark).drop("epoch_key").collect()
    }
    assert got == expected


def test_first_occurrence_semantics_across_batches(spark, tmp_path):
    s = StreamingExactSubstrScrubber(str(tmp_path / "idx"), str(tmp_path / "rep"))
    shared = _span("hist", EXSUB_W + 4)
    # batch 0: the first copy — reports clean.
    b0 = [(1, " ".join([_filler(10, 1), shared, _filler(8, 2)]))]
    s.apply_batch(_docs_df(spark, b0), 0)
    r0 = {r["doc_id"]: r.asDict() for r in s.report(spark).collect()}
    assert r0[1]["dup_tokens"] == 0
    # batch 1: one doc copies history, one pair duplicates within-batch,
    # one is clean.
    b1 = [
        (10, " ".join([_filler(6, 3), shared, _filler(9, 4)])),
        (11, " ".join([_filler(5, 5), _span("loc", EXSUB_W + 1), _filler(7, 6)])),
        (12, " ".join([_filler(8, 7), _span("loc", EXSUB_W + 1), _filler(4, 8)])),
        (13, _filler(25, 9)),
    ]
    s.apply_batch(_docs_df(spark, b1), 1)
    r1 = {r["doc_id"]: r.asDict() for r in s.report(spark).collect()}
    assert r1[1]["dup_tokens"] == 0  # earlier report never rewritten
    assert r1[10]["dup_tokens"] == EXSUB_W + 4 and r1[10]["n_dup_spans"] == 1
    assert r1[11]["dup_tokens"] == EXSUB_W + 1
    assert r1[12]["dup_tokens"] == EXSUB_W + 1
    assert r1[13]["dup_tokens"] == 0
    # batch 2: a copy of batch-1's within-batch passage is history now.
    b2 = [(20, " ".join([_span("loc", EXSUB_W + 1), _filler(14, 10)]))]
    s.apply_batch(_docs_df(spark, b2), 2)
    r2 = {r["doc_id"]: r.asDict() for r in s.report(spark).collect()}
    assert r2[20]["dup_tokens"] == EXSUB_W + 1


def test_completed_epoch_replay_is_noop(spark, tmp_path):
    s = StreamingExactSubstrScrubber(str(tmp_path / "idx"), str(tmp_path / "rep"))
    s.apply_batch(_docs_df(spark, CORPUS), 0)
    before = sorted(
        (r["doc_id"], r["dup_tokens"]) for r in s.report(spark).collect()
    )
    s.apply_batch(_docs_df(spark, CORPUS), 0)  # marker short-circuits
    after = sorted(
        (r["doc_id"], r["dup_tokens"]) for r in s.report(spark).collect()
    )
    assert after == before
    # physical report rows did not even duplicate (no second append ran)
    raw = spark.read.parquet(str(tmp_path / "rep"))
    assert raw.count() == len(CORPUS)


def test_crash_after_claims_replays_preclaim_decision(spark, tmp_path):
    """The nastiest window: staging complete, claims appended, crash
    before the report append + marker. A replay must ship the STAGED
    (pre-claim) decision — recomputing here would self-match every
    window against the batch's own claims and mark the whole batch
    duplicated."""
    s = StreamingExactSubstrScrubber(str(tmp_path / "idx"), str(tmp_path / "rep"))
    docs = _docs_df(spark, CORPUS)
    wins = s._batch_windows(docs)
    bk = s._batch_key(docs, 0)
    staging = os.path.join(s._staging_dir, f"epoch_{bk}")
    s._report_df(docs, wins).withColumn(
        "epoch_key", F.lit(bk)
    ).write.mode("overwrite").parquet(staging)
    wins.select("h").distinct().join(
        s._claimed(spark), "h", "left_anti"
    ).write.mode("append").parquet(s._index_dir())
    # replay from the top
    s.apply_batch(docs, 0)
    r = {r["doc_id"]: r.asDict() for r in s.report(spark).collect()}
    assert r[3]["dup_tokens"] == 0, "clean doc self-matched its own claims"
    assert r[1]["dup_tokens"] == EXSUB_W + 3
    assert not os.path.exists(staging), "staging not cleaned after marker"


def test_compaction_folds_index_and_preserves_decisions(spark, tmp_path):
    s = StreamingExactSubstrScrubber(str(tmp_path / "idx"), str(tmp_path / "rep"))
    s.apply_batch(_docs_df(spark, CORPUS), 0)
    n = s.compact_index(spark)
    idx = s._claimed(spark)
    assert idx.count() == n == idx.distinct().count()
    # post-compaction probe still sees history
    b1 = [(30, " ".join([_span("dup", EXSUB_W + 3), _filler(10, 11)]))]
    s.apply_batch(_docs_df(spark, b1), 1)
    r = {r["doc_id"]: r.asDict() for r in s.report(spark).collect()}
    assert r[30]["dup_tokens"] == EXSUB_W + 3


def test_winnowed_index_is_sampled(spark, tmp_path):
    """The winnowed scrubber's index holds selected fingerprints only —
    measurably smaller than the exact index on the same batch."""
    rows = [(i, _filler(60, 100 + i)) for i in range(8)]
    a = StreamingExactSubstrScrubber(str(tmp_path / "ia"), str(tmp_path / "ra"))
    b = StreamingExactSubstrScrubber(
        str(tmp_path / "ib"), str(tmp_path / "rb"), winnowed=True
    )
    a.apply_batch(_docs_df(spark, rows), 0)
    b.apply_batch(_docs_df(spark, rows), 0)
    na, nb = a._claimed(spark).count(), b._claimed(spark).count()
    assert nb < na * 0.6  # ~2/(S+1) = 0.4 with headroom


def test_streaming_run_drains_file_source(spark, tmp_path):
    """End-to-end run(): a two-file parquet stream drained availableNow
    with maxFilesPerTrigger=1 exercises the multi-epoch path through the
    real foreachBatch machinery."""
    src = tmp_path / "src"
    src.mkdir()
    shared = _span("str", EXSUB_W + 2)
    pd.DataFrame(
        {"doc_id": [1], "text": [" ".join([_filler(9, 1), shared])]}
    ).to_parquet(str(src / "a.parquet"))
    pd.DataFrame(
        {"doc_id": [2], "text": [" ".join([shared, _filler(13, 2)])]}
    ).to_parquet(str(src / "b.parquet"))
    s = StreamingExactSubstrScrubber(str(tmp_path / "idx"), str(tmp_path / "rep"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = s.run(stream, str(tmp_path / "ck"))
    assert q.awaitTermination(180), "drain did not finish in time"
    r = {x["doc_id"]: x.asDict() for x in s.report(spark).collect()}
    assert len(r) == 2
    # exactly one of the two is the first occurrence (file order decides)
    dups = sorted(v["dup_tokens"] for v in r.values())
    assert dups[0] == 0 and dups[1] == EXSUB_W + 2


def test_epoch_counter_restart_does_not_swallow_new_data(spark, tmp_path):
    """Markers are content-keyed: a second batch arriving with the SAME
    epoch_id (manual calls with the default, or a re-attached stream on
    a fresh checkpoint dir) must be processed, not no-opped."""
    s = StreamingExactSubstrScrubber(str(tmp_path / "idx"), str(tmp_path / "rep"))
    s.apply_batch(_docs_df(spark, [(1, _filler(20, 1))]), 0)
    s.apply_batch(_docs_df(spark, [(2, _filler(20, 2))]), 0)  # same id, new docs
    r = {x["doc_id"] for x in s.report(spark).collect()}
    assert r == {1, 2}


def test_recrawled_doc_keeps_both_report_rows(spark, tmp_path):
    """A doc_id re-sent in a later batch self-matches the index and gets
    a NEW (doc_id, epoch_key) row; the first-occurrence row survives
    untouched — history is preserved, never arbitrarily overwritten."""
    s = StreamingExactSubstrScrubber(str(tmp_path / "idx"), str(tmp_path / "rep"))
    text = " ".join([_filler(10, 1), _span("rc", EXSUB_W + 2)])
    s.apply_batch(_docs_df(spark, [(7, text)]), 0)
    s.apply_batch(_docs_df(spark, [(7, text)]), 1)  # re-crawl, new epoch
    rows = sorted(
        (r["epoch_key"], r["dup_tokens"])
        for r in s.report(spark).filter(F.col("doc_id") == 7).collect()
    )
    assert len(rows) == 2
    assert rows[0][1] == 0  # first occurrence: clean
    # the re-crawl matches every window of its own earlier copy
    assert rows[1][1] == 10 + EXSUB_W + 2

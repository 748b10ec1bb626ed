"""Observe-gated epoch promotion (streaming/gate.py, E155): expectation
counters ride the staging write (CollectMetrics, zero extra pass), bad
epochs quarantine instead of publishing, replay is idempotent, and the
E51 cleaner integration keeps poisoned batches out of the band index."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from redix_stream_spark.streaming.gate import GatedEpochWriter

RULES = lambda: {  # noqa: E731 — fresh Column objects per writer
    "doc_id.not_null": (F.col("doc_id").isNull(), 0),
    "text.min_words": (F.size(F.split("text", " ")) < 3, 1),
}


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gate_promotes_clean_quarantines_bad(spark, tmp_path):
    g = GatedEpochWriter(str(tmp_path / "out"), RULES())
    clean = [(1, "alpha beta gamma"), (2, "delta epsilon zeta")]
    assert g.apply_batch(_batch(spark, clean), 0) is True
    assert g.published_epochs() == [0]
    # one short text is within the tolerance of 1 → still promotes
    assert g.apply_batch(
        _batch(spark, [(3, "ok words here"), (4, "short")]), 1
    ) is True
    # two violations of min_words + a null doc_id → quarantined
    bad = [(None, "x"), (6, "y"), (7, "long enough text here")]
    assert g.apply_batch(_batch(spark, bad), 2) is False
    assert 2 not in g.published_epochs()
    assert os.path.isdir(g._quarantine(2))
    q = g.quarantined_epochs()
    assert len(q) == 1 and q[0]["epoch"] == 2
    assert q[0]["violations"] == {"doc_id.not_null": 1, "text.min_words": 2}
    assert q[0]["n_checked"] == 3
    pub = g.published(spark)
    assert {r["doc_id"] for r in pub.collect()} == {1, 2, 3, 4}


def test_gate_is_single_pass_with_collect_metrics(spark, tmp_path):
    """The expectation counters must ride the epoch write itself: the
    observed plan carries a CollectMetrics node over exactly ONE scan of
    the source — never a second aggregation job over the input."""
    src = str(tmp_path / "src")
    _batch(spark, [(1, "a b c"), (2, "d e f")]).write.parquet(src)
    g = GatedEpochWriter(str(tmp_path / "out"), RULES())
    observed, _ = g.observed_df(spark.read.parquet(src))
    plan = observed._sc._jvm.PythonSQLUtils.explainString(
        observed._jdf.queryExecution(), "formatted"
    )
    assert "CollectMetrics" in plan
    assert sum(1 for l in plan.splitlines() if "Location" in l) == 1


def test_gate_replay_is_idempotent(spark, tmp_path):
    g = GatedEpochWriter(str(tmp_path / "out"), RULES())
    clean = [(1, "alpha beta gamma")]
    assert g.apply_batch(_batch(spark, clean), 0) is True
    n0 = g.published(spark).count()
    # crash-after-promote replay: no rewrite, no duplication
    assert g.apply_batch(_batch(spark, clean), 0) is True
    assert g.published(spark).count() == n0
    bad = [(None, "x"), (None, "y"), (9, "long enough text here")]
    assert g.apply_batch(_batch(spark, bad), 1) is False
    assert g.apply_batch(_batch(spark, bad), 1) is False  # replay
    assert 1 not in g.published_epochs()
    assert g.published(spark).count() == n0
    # the double replay of the bad epoch must not double-journal it
    assert [q["epoch"] for q in g.quarantined_epochs()] == [1]


def test_gate_crash_windows_pointer_commit(spark, tmp_path):
    """The promote step is a pointer commit (VERDICT r10 item 4): an
    epoch directory that exists WITHOUT a pointer entry (crash between
    the data write and the commit) is invisible to readers, and the
    foreachBatch replay overwrites + publishes it exactly once."""
    g = GatedEpochWriter(str(tmp_path / "out"), RULES())
    assert g.apply_batch(_batch(spark, [(1, "alpha beta gamma")]), 0) is True
    # simulate crash-before-commit: epoch=1's data landed, pointer didn't
    _batch(spark, [(9, "stale partial data")]).write.mode(
        "overwrite"
    ).parquet(g._epoch_dir(1))
    assert g.published_epochs() == [0]
    assert {r["doc_id"] for r in g.published(spark).collect()} == {1}
    # replay of epoch 1 overwrites the orphan and commits atomically
    assert g.apply_batch(_batch(spark, [(2, "delta epsilon zeta")]), 1) is True
    assert g.published_epochs() == [0, 1]
    assert {r["doc_id"] for r in g.published(spark).collect()} == {1, 2}


def test_gate_journal_dedupes_by_epoch(spark, tmp_path):
    """A crash between the quarantine move and the journal append can
    replay into a duplicate journal line; reads must report each epoch
    once (last line wins)."""
    import json

    g = GatedEpochWriter(str(tmp_path / "out"), RULES())
    bad = [(None, "x"), (None, "y"), (9, "long enough text here")]
    assert g.apply_batch(_batch(spark, bad), 3) is False
    path = os.path.join(g.root, "_quarantine.jsonl")
    with open(path) as fh:
        line = fh.readline()
    with open(path, "a") as fh:
        fh.write(line)  # simulated replayed duplicate
    q = g.quarantined_epochs()
    assert [r["epoch"] for r in q] == [3]
    assert q[0]["violations"]["doc_id.not_null"] == 2


def test_gate_journal_precedes_quarantine_move(spark, tmp_path, monkeypatch):
    """ADVICE r11: the journal line is appended BEFORE the quarantine
    move. A crash between them leaves a journaled epoch whose quarantine
    dir is missing — replay (no dir → no short-circuit) re-stages,
    re-journals (duplicate line, deduped on read) and completes the move.
    The old move-first order stranded the epoch with NO journal record:
    the dir short-circuit suppressed the repair forever."""
    import redix_stream_spark.streaming.gate as gate_mod

    g = GatedEpochWriter(str(tmp_path / "out"), RULES())
    bad = [(None, "x"), (None, "y")]

    def boom(src, dst):
        raise OSError("simulated crash before the quarantine move")

    monkeypatch.setattr(gate_mod.os, "rename", boom)
    with pytest.raises(OSError, match="simulated crash"):
        g.apply_batch(_batch(spark, bad), 5)
    # the crash window: journal line exists, quarantine dir does not —
    # the epoch is already visible to triage (the repaired direction)
    assert [q["epoch"] for q in g.quarantined_epochs()] == [5]
    assert not os.path.isdir(g._quarantine(5))
    monkeypatch.undo()
    assert g.apply_batch(_batch(spark, bad), 5) is False  # replay repairs
    assert os.path.isdir(g._quarantine(5))
    q = g.quarantined_epochs()
    assert [r["epoch"] for r in q] == [5]  # replayed duplicate deduped
    assert q[0]["violations"]["doc_id.not_null"] == 2


def test_gate_journal_survives_torn_write(spark, tmp_path):
    """A torn append (crash mid-write leaves an unterminated fragment)
    must degrade to one lost-then-repaired record, never poison the
    journal: the next append starts on its own line (leading newline),
    the reader skips the fragment and blank lines, and the complete
    replay record wins."""
    g = GatedEpochWriter(str(tmp_path / "out"), RULES())
    bad = [(None, "x"), (None, "y")]
    assert g.apply_batch(_batch(spark, bad), 3) is False
    path = str(tmp_path / "out" / "_quarantine.jsonl")
    with open(path, "a") as f:
        f.write('{"epoch": 7, "n_checked": 99, "violatio')  # torn fragment
    # fragment for an UNSEEN epoch: skipped entirely, journal still reads
    assert [q["epoch"] for q in g.quarantined_epochs()] == [3]
    # the repair path: replay of epoch 7 appends a complete record that
    # starts on its own line despite the unterminated fragment
    assert g.apply_batch(_batch(spark, bad), 7) is False
    q = g.quarantined_epochs()
    assert [r["epoch"] for r in q] == [3, 7]
    assert q[1]["violations"]["doc_id.not_null"] == 2


def test_gate_requires_rules(tmp_path):
    with pytest.raises(ValueError, match="at least one rule"):
        GatedEpochWriter(str(tmp_path / "out"), {})


GOOD = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
)
GOOD2 = (
    "zinc yttrium xenon tungsten titanium thorium tantalum sulfur "
    "silver silicon scandium rhodium radium potassium platinum osmium "
    "nitrogen neon mercury manganese"
)


def test_cleaner_withholds_poisoned_epoch_and_claims_no_bands(spark, tmp_path):
    """E155 over E51: a batch violating the expectation suite is
    quarantined WHOLE — it neither lands in accepted nor claims bands,
    so a later near-duplicate of its content is accepted cleanly."""
    from redix_stream_spark.llm.stream_pipeline import StreamingCorpusCleaner

    c = StreamingCorpusCleaner(
        str(tmp_path / "clean"),
        expectations={"doc_id.not_null": (F.col("doc_id").isNull(), 0)},
    )
    c.apply_batch(_batch(spark, [(1, GOOD)]), 0)
    assert {r["doc_id"] for r in c.accepted(spark).collect()} == {1}
    # poisoned epoch: a NULL doc_id rides in with a good new document
    c.apply_batch(_batch(spark, [(None, "x y z"), (2, GOOD2)]), 1)
    assert {r["doc_id"] for r in c.accepted(spark).collect()} == {1}
    assert c.gate.quarantined_epochs()[0]["epoch"] == 1
    # epoch 2: near-dup of the QUARANTINED doc 2 content — must be
    # accepted (the poisoned epoch never claimed bands) while a dup of
    # accepted doc 1 still drops.
    c.apply_batch(
        _batch(spark, [(20, GOOD2 + " tail"), (21, GOOD + " tail")]), 2
    )
    accepted = {r["doc_id"] for r in c.accepted(spark).collect()}
    assert accepted == {1, 20}
    rep = c.report(spark).collect()[0]
    assert rep["n_in"] == 3  # epochs 0 and 2 only; withheld epoch counts 0
    assert rep["n_accepted"] == 2 and rep["n_dup_dropped"] == 1


def test_q208_triage_matrix_shape(spark, sf_dir):
    """The planted rule densities quarantine epochs 0/1/2 on DIFFERENT
    rules and publish epoch 3, at any scale factor — the min_words
    tolerance is corpus-PROPORTIONAL (ADVICE r11: a fixed absolute limit
    against a corpus-proportional violation count would eventually trip
    epoch 3 at some SF) — and the matrix reports exactly the exceeded
    rules."""
    from redix_stream_spark.registry import all_queries

    rows = all_queries()["q208_quarantine_triage"](spark, sf_dir).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], set()).add(r["rule"])
        assert r["over_by"] == r["n_violations"] - r["violation_limit"] > 0
    assert by_epoch == {
        0: {"planted.mod16"},
        1: {"planted.mod16"},
        2: {"planted.mod32_18"},
    }

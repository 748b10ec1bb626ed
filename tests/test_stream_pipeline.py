"""End-to-end streaming corpus cleaning (quality gate ∘ near-dup filter
∘ per-epoch stats) on planted fixtures."""

from __future__ import annotations

from redix_stream_spark.llm.stream_pipeline import StreamingCorpusCleaner

# ≥15 distinct-ish tokens → 'medium' quality under the q32 rules.
GOOD = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
)
GOOD2 = (
    "zinc yttrium xenon tungsten titanium thorium tantalum sulfur "
    "silver silicon scandium rhodium radium potassium platinum osmium "
    "nitrogen neon mercury manganese"
)
SHORT = "too short to pass"  # < 15 tokens → 'low' → quality-rejected


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cleaner_quality_then_dedup_then_stats(spark, tmp_path):
    c = StreamingCorpusCleaner(str(tmp_path / "clean"))
    # Batch 0: a good doc, its intra-batch near-dup, and a low-quality doc.
    c.apply_batch(
        _docs(
            spark,
            [(1, GOOD), (2, GOOD + " extra"), (3, SHORT)],
        ),
        0,
    )
    # Batch 1: cross-batch near-dup of doc 1 (dropped via the band
    # index), a fresh good doc, and a near-dup of the REJECTED doc 3 —
    # which must be accepted: quality rejects must not claim bands.
    c.apply_batch(
        _docs(
            spark,
            [
                (10, GOOD + " tail"),
                (11, GOOD2),
                (12, SHORT + " plus enough extra words appended here to pass "
                     "the fifteen token quality bar easily now"),
            ],
        ),
        1,
    )
    accepted = {r["doc_id"] for r in c.accepted(spark).collect()}
    assert 1 in accepted and 2 not in accepted        # intra-batch collapse
    assert 3 not in accepted                          # quality-rejected
    assert 10 not in accepted                         # cross-batch dup
    assert 11 in accepted
    assert 12 in accepted                             # reject never claimed

    rep = c.report(spark).collect()[0]
    assert rep["n_in"] == 6
    assert rep["n_quality_rejected"] == 1
    assert rep["n_submitted"] == 5
    assert rep["n_accepted"] == len(accepted) == 3
    assert rep["n_dup_dropped"] == 2

    # Crash-replay of epoch 1: stats must not double-count.
    c.apply_batch(
        _docs(
            spark,
            [
                (10, GOOD + " tail"),
                (11, GOOD2),
                (12, SHORT + " plus enough extra words appended here to pass "
                     "the fifteen token quality bar easily now"),
            ],
        ),
        1,
    )
    rep2 = c.report(spark).collect()[0]
    assert rep2["n_in"] == 6 and rep2["n_accepted"] == 3


def test_cleaner_under_real_stream(spark, tmp_path):
    import os
    import time

    src = str(tmp_path / "src")
    os.makedirs(src)
    for rows in ([(1, GOOD), (3, SHORT)], [(10, GOOD + " tail"), (11, GOOD2)]):
        _docs(spark, rows).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)
    c = StreamingCorpusCleaner(str(tmp_path / "clean"))
    q = c.run(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src),
        str(tmp_path / "ck"),
    )
    q.awaitTermination(180)
    accepted = {r["doc_id"] for r in c.accepted(spark).collect()}
    assert accepted == {1, 11}
    rep = c.report(spark).collect()[0]
    assert rep["n_in"] == 4 and rep["n_quality_rejected"] == 1
    assert rep["n_accepted"] == 2 and rep["n_dup_dropped"] == 1

"""Batch ⇄ streaming unification of the LLM-pipeline operators.

The Spark-first payoff the engine is built around: a stateless operator
defined once as Column expressions runs identically over a batch
DataFrame and a streaming one, and the stream runtime (the reference's
consumer semantics) composes with the LLM operators (dedup) end-to-end.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_quality_operator_identical_on_batch_and_stream(spark, sf_dir, tmp_path):
    """q32's quality expressions over a file stream produce exactly the
    batch answer once drained — same Column definitions, two modes."""
    from redix_stream_spark.catalog import load_table
    from redix_stream_spark.llm.text import quality_columns

    batch = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", *quality_columns())
    )
    expected = {r["doc_id"]: r.asDict() for r in batch.collect()}

    got: dict[int, dict] = {}

    def sink(df, epoch):
        got.update({r["doc_id"]: r.asDict() for r in df.collect()})

    # the file stream source wants a directory; expose the single-file
    # table through one
    import os

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    os.symlink(f"{sf_dir}/documents.parquet", src_dir / "documents.parquet")
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir))
        .select("doc_id", "lang", *quality_columns())
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert got == expected


def test_consumer_feeds_streaming_neardup_filter(spark, tmp_path):
    """End-to-end: documents produced into an EventLog (reference R1)
    flow through a consumer drain (R3/R6) into the incremental near-dup
    filter — the reference's runtime carrying the engine's LLM surface."""
    from redix_stream_spark.llm.stream_dedup import StreamingNearDupFilter
    from redix_stream_spark.streaming import Consumer, EventLog, HandlerResult

    text_a = (
        "one fish two fish red fish blue fish black fish blue fish old "
        "fish new fish this one has a little star this one has a little car"
    )
    text_b = (
        "entirely different prose concerning garbage collection write "
        "barriers card tables and generational heap promotion policies"
    )
    log = EventLog(str(tmp_path / "log"))
    log.produce_many(
        spark,
        [
            {"doc_id": "1", "text": text_a},
            {"doc_id": "2", "text": text_a},  # near-dup, same batch
            {"doc_id": "3", "text": text_b},
        ],
    )
    f = StreamingNearDupFilter(
        index_path=str(tmp_path / "bands"),
        accepted_path=str(tmp_path / "accepted"),
    )
    staged: list[tuple[int, str]] = []

    def handler(mid: str, payload: dict) -> HandlerResult:
        staged.append((int(payload["doc_id"]), payload["text"]))
        return HandlerResult.OK

    Consumer(log, handler, str(tmp_path / "ck")).run_once(spark)
    f.apply_batch(
        spark.createDataFrame(staged, "doc_id long, text string"), 0
    )
    assert sorted(r["doc_id"] for r in f.accepted(spark).collect()) == [1, 3]

    # a later produce of another near-dup is dropped against history
    log.produce(spark, {"doc_id": "4", "text": text_a})
    staged.clear()
    Consumer(log, handler, str(tmp_path / "ck")).run_once(spark)
    f.apply_batch(
        spark.createDataFrame(staged, "doc_id long, text string"), 1
    )
    assert sorted(r["doc_id"] for r in f.accepted(spark).collect()) == [1, 3]


def test_streaming_heavy_hitters_lifecycle(spark, tmp_path):
    # Mergeable MG partials per epoch: superset guarantee across epochs,
    # idempotent replay, exact verify face, bounded compaction.
    import pyspark.sql.functions as F

    from redix_stream_spark.llm.stream_heavy import StreamingHeavyHitters
    from redix_stream_spark.llm.text import HH_K, MG_COUNTERS

    hh = StreamingHeavyHitters(spark, str(tmp_path / "hhstate"))

    def batch(epoch, n=20_000, hot_every=10):
        # HOT at 10% of the stream; per-epoch cold tail of ~997 tokens
        # (~18 occurrences each — far below the 1/50 threshold).
        return (
            spark.range(n)
            .repartition(4)
            .select(
                F.when(F.col("id") % hot_every == 0, F.lit("HOT"))
                .otherwise(
                    F.concat(F.lit(f"e{epoch}c"), (F.col("id") % 997).cast("string"))
                )
                .alias("token")
            )
        )

    logs = []
    for e in range(3):
        b = batch(e)
        hh.ingest_batch(b, e)
        logs.append(b)
    assert hh.totals() == 60_000

    cands = hh.candidates().collect()
    by_tok = {r["token"]: r["cnt_lower"] for r in cands}
    assert "HOT" in by_tok
    # lower-bound quality: undercount ≤ 2N/(4*HH_K+1)
    assert by_tok["HOT"] >= 6_000 - 2 * 60_000 // (4 * HH_K + 1) - 1

    log = logs[0].unionByName(logs[1]).unionByName(logs[2])
    exact = {(r["token"], r["n_occ"]) for r in hh.verify_exact(log).collect()}
    assert exact == {("HOT", 6_000)}

    # crash-replay: re-ingesting an epoch overwrites its own partial —
    # totals and the verify result are unchanged (no double count).
    hh.ingest_batch(batch(1), 1)
    assert hh.totals() == 60_000
    assert {(r["token"], r["n_occ"]) for r in hh.verify_exact(log).collect()} == exact

    # compaction folds to one bounded summary; the guarantee survives.
    hh.compact()
    folded = {r["token"]: r["cnt_lower"] for r in hh.candidates().collect()}
    assert "HOT" in folded and len(folded) <= MG_COUNTERS
    assert hh.totals() == 60_000
    assert {(r["token"], r["n_occ"]) for r in hh.verify_exact(log).collect()} == exact


def test_streaming_hll_lifecycle_matches_batch_face(spark, tmp_path):
    # Lossless mergeable registers: the streaming estimate must be
    # VALUE-IDENTICAL to the q186 batch estimator over the union of all
    # ingested data — across epoch splits, duplicate redelivery, crash
    # replay, and compaction.
    import pyspark.sql.functions as F

    from redix_stream_spark.llm.stream_hll import StreamingHll
    from redix_stream_spark.operators.stats import (
        hll_estimate_cols,
        hll_estimate_expr,
        hll_registers,
    )

    sh = StreamingHll(spark, str(tmp_path / "hllstate"), group_col="g")

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.when(F.col("id") % 2 == 0, F.lit("even")).otherwise("odd")
            .alias("g"),
            F.col("id").cast("string").alias("key"),
        )

    full = batch(0, 3000)

    def batch_face(df):
        reg = hll_registers(df, "key", ["g"])
        s = hll_estimate_cols(reg, ["g"])
        return {
            r["g"]: (r["hll_estimate"], r["n_regs"])
            for r in s.select(
                "g", hll_estimate_expr().alias("hll_estimate"), "n_regs"
            ).collect()
        }

    expected = batch_face(full)
    sh.ingest_batch(batch(0, 1000), 0)
    sh.ingest_batch(batch(1000, 2200), 1)
    sh.ingest_batch(batch(2200, 3000), 2)

    def got():
        return {
            r["g"]: (r["hll_estimate"], r["n_regs"])
            for r in sh.estimate().collect()
        }

    assert got() == expected

    # raw-HLL accuracy sanity on this cardinality (1500 per group).
    assert abs(expected["even"][0] - 1500) / 1500 < 0.25

    # crash replay: re-ingesting epoch 1 overwrites its own partial.
    sh.ingest_batch(batch(1000, 2200), 1)
    assert got() == expected

    # at-least-once redelivery: a whole OVERLAPPING epoch is absorbed
    # by the idempotent max-merge (MG could not promise this).
    sh.ingest_batch(batch(500, 1500), 3)
    assert got() == expected

    # lossless compaction: estimates identical, state folded to ONE
    # partial living in the RESERVED base partition (epoch=-1), outside
    # the caller's epoch-id namespace.
    sh.compact()
    assert got() == expected
    import os

    gen_dir = sh._state.current_dir()
    assert sorted(
        d for d in os.listdir(gen_dir) if d.startswith("epoch=")
    ) == ["epoch=-1"]

    # a checkpoint restarting at epoch 0 AFTER the compact must not
    # overwrite folded history (the pre-fix bug: fold lived at epoch=0
    # and a fresh run's first batch silently erased it). New data lands,
    # old registers survive.
    sh.ingest_batch(batch(3000, 3500), 0)
    expected_plus = batch_face(batch(0, 3500))
    assert got() == expected_plus

    # the reserved id itself is refused at the API edge.
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sh.ingest_batch(batch(0, 10), -1)

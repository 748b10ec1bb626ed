"""Sinks with delivery-guarantee upgrades.

The reference (and our Consumer) is at-least-once: a crash between handler
side effects and the checkpoint commit replays the batch
(consumer_test.exs:222-280). For sinks that are *writes*, idempotence per
epoch restores effective exactly-once: every micro-batch lands in an
epoch-keyed partition written with dynamic overwrite, so a replayed epoch
replaces itself instead of duplicating.

This is the standard Structured Streaming end-to-end exactly-once recipe
(transactional sink keyed by (queryId, epochId)); at 100 TB the epoch
directory also gives cheap incremental consumption downstream.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPOCH_COL = "__epoch"


def idempotent_parquet_sink(path: str) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function writing epoch-partitioned parquet with
    per-epoch overwrite semantics — replaying an epoch is a no-op."""

    def write(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch.withColumn(EPOCH_COL, F.lit(epoch_id))
                .write.mode("overwrite")
                .partitionBy(EPOCH_COL)
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return write


def read_sink(spark, path: str) -> DataFrame:
    """Read an idempotent sink's content (epoch column included)."""
    return spark.read.parquet(path)

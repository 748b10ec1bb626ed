"""Log-to-log streaming pipelines: the 'pure handler' path.

The reference's handlers are arbitrary side-effecting callbacks applied
message-at-a-time (consumer.ex:283-299). SURVEY §1.1 marks the *pure*
formulation — handler as a DataFrame transform — as the preferred path:
it is testable, optimizable (Catalyst sees through it), and runs
identically in batch and streaming. A Pipeline consumes one EventLog,
applies a DataFrame→DataFrame transform, and produces to another EventLog
— the Spark-native equivalent of chaining Redis streams through a worker.

Delivery: the transform output is appended to the sink log with the source
ids preserved in the payload lineage column; the checkpoint makes the
source side exactly-once *per epoch*, and the sink append is idempotent per
epoch via epoch-tagged filenames is NOT attempted — instead reprocessing
after a crash may re-append the failed epoch (at-least-once, exactly the
reference's guarantee, consumer_test.exs:222-280). Downstream exact dedup
(q24 pattern, `dropDuplicates` on lineage id) restores effective
exactly-once where needed.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from typing import TYPE_CHECKING

from ..session import ship_package
from .log import MESSAGE_SCHEMA, EventLog

if TYPE_CHECKING:  # annotation-only; no runtime import needed
    from .manifest_log import ManifestEventLog

#: A pure handler: DataFrame of messages in → DataFrame of messages out.
#: Input and output both carry the (ms, seq, id, payload) envelope.
Transform = Callable[[DataFrame], DataFrame]


@dataclass
class Pipeline:
    #: either log flavor works on either end — the Pipeline only touches
    #: the shared surface (read_stream / produce_df); a ManifestEventLog
    #: sink commits each micro-batch as one manifest generation, and a
    #: ManifestEventLog source makes the pipeline's checkpoint
    #: compaction-proof (logical offsets)
    source: "EventLog | ManifestEventLog"
    sink: "EventLog | ManifestEventLog"
    transform: Transform
    checkpoint_dir: str

    def _apply(self, batch: DataFrame, epoch_id: int) -> None:
        out = self.transform(batch)
        missing = set(MESSAGE_SCHEMA.fieldNames()) - set(out.columns)
        if missing:
            raise ValueError(f"transform dropped envelope columns: {missing}")
        self.sink.produce_df(out)

    def run_once(self, spark: SparkSession) -> None:
        """Drain the source through the transform into the sink."""
        from pyspark.errors.exceptions.captured import StreamingQueryException

        ship_package(spark)
        q = (
            self.source.read_stream(spark)
            .writeStream.foreachBatch(self._apply)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        except StreamingQueryException as e:
            # Normalize: the failed epoch stays uncommitted; a rerun
            # replays it (at-least-once, reference parity).
            raise RuntimeError(f"pipeline crashed: {e}") from e
        if q.exception() is not None:
            raise RuntimeError(f"pipeline crashed: {q.exception()}")

    def run_forever(self, spark: SparkSession, poll_seconds: float = 2.0):
        """Continuous log→log processing; caller owns the returned query."""
        ship_package(spark)
        return (
            self.source.read_stream(spark)
            .writeStream.foreachBatch(self._apply)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(processingTime=f"{poll_seconds} seconds")
            .start()
        )


def map_payload(fn_cols: dict[str, F.Column]) -> Transform:
    """Build a transform that rewrites payload entries with column
    expressions over the envelope (keys become payload fields)."""

    def t(df: DataFrame) -> DataFrame:
        pairs: list[F.Column] = []
        for k, expr in fn_cols.items():
            pairs.append(F.lit(k))
            pairs.append(expr.cast("string"))
        return df.select(
            "ms", "seq", "id", F.map_from_arrays(
                F.array(*pairs[::2]), F.array(*pairs[1::2])
            ).alias("payload")
        )

    return t

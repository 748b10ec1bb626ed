"""StreamingUpsert — CDC apply: an update stream merged into a
ManifestTable per micro-batch (the streaming twin of E82's COW merge).

This is the table-maintenance pattern every lakehouse pipeline runs: a
change stream (upserts keyed on the table key; e.g. a database CDC feed
or the engine's own message log projected to typed rows) lands in a
keyed analytic table that stays point-queryable, zone-pruned, and
snapshot-readable WHILE the stream runs.

Exactly-once effect without a transactional sink: ``ManifestTable.
merge`` is upsert-by-key, so replaying a micro-batch after a crash
re-applies the same (key → row) assignments and converges to the same
table — idempotent as long as the batch's rows are a deterministic
function of the source offsets (Structured Streaming's replay
guarantee). This is the same argument the reference's at-least-once
redelivery rests on (consumer.ex:206-210: crash → pending → redeliver),
lifted from "handler must tolerate retries" to "merge is a retry-stable
operator".

Within one batch, duplicate keys would make the rewrite nondeterministic
(two replacement rows for one key); ``update`` therefore collapses each
batch to its LAST row per key by a caller-declared ordering column —
the per-key latest-wins the SCD/latest-state operators use (q106).

Scale: each micro-batch rewrites only the files whose key zones overlap
the batch's keys (E82's locality argument); a steady update stream
touching a hot key range leaves the cold 99% of a 100 TB table
untouched. Fragmentation from out-of-range inserts is repaired by
``ManifestTable.compact`` between drains (the maintenance split every
table format uses: writers commit fast, OPTIMIZE restores layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.manifest_table import ManifestTable


class StreamingUpsert:
    """foreachBatch hook applying an update stream to a ManifestTable."""

    def __init__(
        self,
        table: ManifestTable,
        order_col: str,
        op_col: str | None = None,
        mor_deletes: bool = False,
    ):
        #: ``op_col``: name of a CDC op column ('D' = delete the key,
        #: anything else = upsert). None keeps the pure-upsert contract.
        #: The latest-per-key collapse runs BEFORE the op split, so a
        #: key's FINAL op in the batch wins — an update followed by a
        #: delete deletes, a delete followed by a re-insert re-inserts
        #: (the CDC total-order contract, resolved batch-locally).
        self.op_col = op_col
        #: ``mor_deletes``: route DELETE-ONLY micro-batches through the
        #: merge-on-read sidecar path (zero data files rewritten — the
        #: steady trickle-delete stream's economics); mixed batches
        #: keep the one-COW-commit contract. Replay stays idempotent:
        #: re-applying a delete-only batch re-commits a redundant
        #: sidecar, reads unchanged.
        self.mor_deletes = mor_deletes
        self.table = table
        #: within-batch winner: highest ``order_col`` per key. Ties are
        #: broken by the FULL remaining row (lexicographic over the other
        #: columns) — row_number over a non-total order would let a
        #: crash-replay pick the other tied row and break the
        #: merge-idempotence argument.
        self.order_col = order_col

    def _latest_per_key(self, batch: DataFrame) -> DataFrame:
        rest = [
            c
            for c in batch.columns
            if c not in (self.table.key, self.order_col)
        ]  # op_col (if any) rides in ``rest`` — part of the total order
        w = Window.partitionBy(self.table.key).orderBy(
            F.col(self.order_col).desc(), *[F.col(c).desc() for c in rest]
        )
        return (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def update(self, batch: DataFrame, epoch_id: int) -> None:
        """Merge one micro-batch (replay-idempotent; see module doc)."""
        if not batch.head(1):
            return
        latest = self._latest_per_key(batch)
        if self.op_col is None:
            self.table.merge(batch.sparkSession, latest)
        else:
            self.table.merge_cdc(
                batch.sparkSession,
                latest,
                op_col=self.op_col,
                mor_deletes=self.mor_deletes,
            )

    def attach(self, stream_df: DataFrame, checkpoint_dir: str):
        """Wire to an update stream (caller starts/awaits the query)."""
        return stream_df.writeStream.foreachBatch(self.update).option(
            "checkpointLocation", checkpoint_dir
        )

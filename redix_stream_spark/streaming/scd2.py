"""Streaming SCD Type-2 view: q122's state-history reconstruction as an
incremental operator over micro-batches — the CDC → dimension-history
pattern every streaming warehouse maintains.

State layout (the matview epoch discipline):

- ``closed/epoch=N``   intervals closed BY batch N (overwritten if the
  epoch replays — appends never double-count);
- ``open/epoch=N``     the FULL set of open intervals after batch N
  (one row per user), also overwritten per epoch; reads use the
  highest epoch ≤ the replay frontier, so a lagging replay of epoch e
  rebuilds from open/epoch=e-1 and lands byte-identical state.

Per batch: only users PRESENT in the batch recompute — their carried
open interval re-enters as a pseudo-event (keeping its original
effective_from and event_id, so an unchanged state spanning many
batches keeps ONE interval — the consecutive-duplicate collapse works
across batch boundaries); untouched users' open intervals carry forward
unchanged. Work per batch ≈ batch size, not history size.

Ordering assumption: per-user event-time order across batches (the
reference's replay semantics — consumers deliver in id order). A
late event older than an already-closed interval would need interval
splitting; that is a rebuild-from-log operation (`q122` IS that batch
rebuild), not an incremental patch — documented, not hidden.

Verified in tests/test_matview.py: N-batch ingest ≡ the batch q122
intervals, epoch replay idempotency, and cross-batch duplicate
collapse. The oracle-verified face is the batch twin q122.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.analytics import scd2_intervals

_OPEN_SCHEMA = "user_id long, event_type string, ts timestamp_ntz, event_id long"


class StreamingScd2View:
    def __init__(self, spark: SparkSession, state_dir: str) -> None:
        self.spark = spark
        self.state_dir = state_dir
        os.makedirs(os.path.join(state_dir, "closed"), exist_ok=True)
        os.makedirs(os.path.join(state_dir, "open"), exist_ok=True)

    def _epochs(self, kind: str) -> list[int]:
        base = os.path.join(self.state_dir, kind)
        return sorted(
            int(n.split("=")[1])
            for n in os.listdir(base)
            if n.startswith("epoch=")
        )

    def _open_as_of(self, before_epoch: int) -> DataFrame:
        """Open intervals from the highest epoch < ``before_epoch`` —
        what a (re)play of ``before_epoch`` must build on."""
        prior = [e for e in self._epochs("open") if e < before_epoch]
        if not prior:
            return self.spark.createDataFrame([], _OPEN_SCHEMA)
        return self.spark.read.parquet(
            os.path.join(self.state_dir, "open", f"epoch={max(prior)}")
        )

    def ingest_batch(self, batch: DataFrame, epoch_id: int) -> None:
        """Fold one micro-batch of (user_id, event_type, ts, event_id)
        rows into the history. Overwrite-per-epoch ⇒ replay idempotent."""
        open_prev = self._open_as_of(epoch_id)
        affected = batch.select("user_id").distinct()
        # carried open intervals re-enter as pseudo-events so the LAG
        # collapse sees the pre-batch state (original from/id preserved)
        replay = (
            open_prev.join(affected, "user_id", "left_semi")
            .select("user_id", "event_type", "ts", "event_id")
            .unionByName(batch.select("user_id", "event_type", "ts", "event_id"))
        )
        iv = scd2_intervals(replay).cache()
        closed = iv.filter(F.col("effective_to").isNotNull()).select(
            "user_id",
            "event_type",
            F.col("effective_from"),
            F.col("effective_to"),
        )
        # open = recomputed rows for affected users + carried rows for the
        # rest. scd2_intervals carries the interval-opening event_id
        # through, so the open interval keeps its exact tie-break key —
        # no recovery join (which, on (user, ts) alone, could attach the
        # wrong event's id under a ts tie).
        new_open = iv.filter(F.col("effective_to").isNull()).select(
            "user_id",
            "event_type",
            F.col("effective_from").alias("ts"),
            "event_id",
        )
        untouched = open_prev.join(affected, "user_id", "left_anti").select(
            "user_id", "event_type", "ts", "event_id"
        )
        all_open = new_open.unionByName(untouched)
        closed_path = os.path.join(self.state_dir, "closed", f"epoch={epoch_id}")
        open_path = os.path.join(self.state_dir, "open", f"epoch={epoch_id}")
        closed.write.mode("overwrite").parquet(closed_path)
        all_open.write.mode("overwrite").parquet(open_path)
        iv.unpersist()
        # epochs newer than a replayed one are stale — drop them so reads
        # (which use the max epoch) stay consistent with the replay
        for kind in ("closed", "open"):
            for e in self._epochs(kind):
                if e > epoch_id:
                    shutil.rmtree(
                        os.path.join(self.state_dir, kind, f"epoch={e}")
                    )

    def read_history(self) -> DataFrame:
        """All intervals: closed epochs (merge-on-read) + current open
        rows (effective_to NULL, is_current=1) — the q122 shape."""
        epochs = self._epochs("closed")
        closed = (
            self.spark.read.option(
                "basePath", os.path.join(self.state_dir, "closed")
            )
            .parquet(os.path.join(self.state_dir, "closed", "epoch=*"))
            .select("user_id", "event_type", "effective_from", "effective_to")
            if epochs
            else self.spark.createDataFrame(
                [],
                "user_id long, event_type string, effective_from timestamp_ntz,"
                " effective_to timestamp_ntz",
            )
        )
        open_now = self._open_as_of(1 << 60).select(
            "user_id",
            "event_type",
            F.col("ts").alias("effective_from"),
            F.lit(None).cast("timestamp_ntz").alias("effective_to"),
        )
        return closed.unionByName(open_now).select(
            "user_id",
            "event_type",
            "effective_from",
            "effective_to",
            F.col("effective_to").isNull().cast("long").alias("is_current"),
        )

"""``format("manifestlog")`` — streaming reader for ManifestEventLog
with logical (ms, seq) offsets (streaming/manifest_log.py has the
layout; this module is the control plane Spark's file source can't be:
offsets are log *positions*, not file names).

Why it exists: the built-in file source checkpoints file names, so
compaction — which rewrites every file — either breaks the subscription
(new directory) or replays the whole log (same directory, all-new
files). Here the checkpoint stores ``{"ms": M, "seq": S}``: the
reference consumer's own cursor (consumer.ex:276-281), valid across any
rewrite that preserves rows. A micro-batch is the rows in
``(start, end]`` by composite (ms, seq) order, served from whatever
files the CURRENT generation manifest lists.

Plan economics per trigger:

- ``latestOffset``: one read of the pointer object (the producer commits
  the log-end position into it) — O(1), no listing, no footer scans.
- ``partitions``: one manifest read; files prune on their recorded
  (ms, seq) ranges without touching data.
- ``read``: executor-side pyarrow scan of the assigned files with the
  composite range pushed down as a parquet predicate, yielded as Arrow
  RecordBatches (zero row-at-a-time Python).

``maxRowsPerTrigger`` / ``maxFilesPerTrigger`` bound micro-batches at
file granularity (the manifest's per-file row counts): the planner walks
files in composite-max order and cuts the batch at the first file that
exceeds the budget — approximate by design, exact pacing would need
row-level offsets inside files (Kafka-style), which the log's append
model doesn't require. The FIRST batch of any run (fresh or restarted)
is served unpaced to the true log end: the Python source API exposes no
admission control (``latestOffset`` takes no start offset), the engine
calls it before ``initialOffset``, and a restart's checkpointed position
is invisible — so a paced first cut could land below that position,
Spark would record the regressed offset, and committed rows would
redeliver. Pacing bounds every subsequent batch.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType


class ManifestFilesPartition(InputPartition):
    def __init__(self, root: str, files: list[str], start: tuple, end: tuple):
        self.root = root
        self.files = files
        self.start = start  # exclusive composite (ms, seq)
        self.end = end      # inclusive


class ManifestLogDataSource(DataSource):
    """A ManifestEventLog served incrementally by (ms, seq) position."""

    @classmethod
    def name(cls) -> str:
        return "manifestlog"

    def schema(self) -> str:
        return "ms bigint, seq bigint, id string, payload map<string,string>"

    def streamReader(self, schema: StructType) -> "ManifestLogStreamReader":
        return ManifestLogStreamReader(schema, self.options)


def _read_manifest(root: str, missing_ok: bool) -> list[dict]:
    """Pointer → manifest entries. ``missing_ok`` is for the offset
    probes, where no pointer just means an empty log; the PLANNING path
    must pass False — a missing manifest there would silently plan an
    empty batch over a non-empty offset range, and Spark would commit
    the range with its rows never delivered (data loss where an
    exception produces a retried batch)."""
    import json
    import os

    try:
        with open(os.path.join(root, "CURRENT")) as fh:
            gen = json.load(fh)["gen"]
        with open(os.path.join(root, f"gen={gen}", "manifest.json")) as fh:
            return json.load(fh)
    except FileNotFoundError:
        if missing_ok:
            return []
        raise


class ManifestLogStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.root = options.get("path")
        if not self.root:
            raise ValueError("manifestlog source requires option 'path'")
        self.max_rows = int(
            options.get("maxrowspertrigger", options.get("maxRowsPerTrigger", "0"))
        )
        self.max_files = int(
            options.get("maxfilespertrigger", options.get("maxFilesPerTrigger", "0"))
        )
        self.n_splits = int(
            options.get("numpartitions", options.get("numPartitions", "4"))
        )

    # -- offset protocol ------------------------------------------------

    def initialOffset(self) -> dict:
        # NOTE (measured, Spark 4.1): on a fresh stream the engine calls
        # latestOffset BEFORE initialOffset, and partitions() runs in a
        # DIFFERENT process than the offset calls — so this method can't
        # seed the pacing state for the first batch, and a restart is
        # indistinguishable from a fresh start at first-latestOffset
        # time. The pacing policy below is designed around that.
        if not hasattr(self, "_planned"):
            self._planned = (-1, -1)
        return {"ms": -1, "seq": -1}

    def _log_end(self) -> tuple[int, int]:
        import json
        import os

        try:
            with open(os.path.join(self.root, "CURRENT")) as fh:
                meta = json.load(fh)
            return (int(meta.get("max_ms", -1)), int(meta.get("max_seq", -1)))
        except FileNotFoundError:
            return (-1, -1)

    def latestOffset(self) -> dict:
        high = self._log_end()
        planned = getattr(self, "_planned", None)
        if planned is None:
            # FIRST latestOffset of this run. Whether the run is fresh
            # or a restart is unknowable here (see initialOffset), and
            # the checkpointed position of a restart is invisible — a
            # paced cut computed from scratch could land BELOW it, Spark
            # would record the regressed offset as the next batch end,
            # and the rows between would redeliver. The safe semantic is
            # one unpaced first batch to the true log end (monotone by
            # construction); pacing bounds every batch after it.
            self._planned = high
            return {"ms": high[0], "seq": high[1]}
        if high <= planned:
            return {"ms": planned[0], "seq": planned[1]}
        if self.max_rows or self.max_files:
            # File-granular pacing: advance past whole files (composite-
            # max order) until the row or file budget is spent. Planner-
            # local state only — durability is the checkpoint; a crash
            # re-enters through the restart branch above.
            entries = [
                e for e in _read_manifest(self.root, missing_ok=True)
                if tuple(e["max"]) > planned
            ]
            if not entries:
                # CURRENT advertises data past `planned` but the manifest
                # is unreadable/empty — an inconsistent pointer/manifest
                # window (e.g. mid-commit on an eventually-consistent
                # store). Planning to `high` here would silently skip
                # pacing for one unbounded batch; hold at the previous
                # planned offset and retry next trigger instead.
                return {"ms": planned[0], "seq": planned[1]}
            entries.sort(key=lambda e: tuple(e["max"]))
            rows, files, cut = 0, 0, planned
            for e in entries:
                cut = max(cut, tuple(e["max"]))
                rows += e["rows"]
                files += 1
                if (self.max_rows and rows >= self.max_rows) or (
                    self.max_files and files >= self.max_files
                ):
                    break
            high = min(high, cut) if cut > planned else high
        self._planned = max(planned, high)
        return {"ms": self._planned[0], "seq": self._planned[1]}

    def commit(self, end: dict) -> None:
        pass  # durable position = the query checkpoint

    def partitions(self, start: dict, end: dict) -> list[ManifestFilesPartition]:
        lo = (start["ms"], start["seq"])
        hi = (end["ms"], end["seq"])
        planned = getattr(self, "_planned", None)
        self._planned = hi if planned is None else max(planned, hi)
        if hi <= lo:
            return [ManifestFilesPartition(self.root, [], lo, hi)]
        # a non-empty range means data was committed: a missing manifest
        # here must FAIL the batch (retried), never plan it empty
        live = [
            e for e in _read_manifest(self.root, missing_ok=False)
            if tuple(e["max"]) > lo and tuple(e["min"]) <= hi
        ]
        if not live:
            return [ManifestFilesPartition(self.root, [], lo, hi)]
        n = max(1, min(self.n_splits, len(live)))
        buckets: list[list[str]] = [[] for _ in range(n)]
        for i, e in enumerate(sorted(live, key=lambda e: tuple(e["min"]))):
            buckets[i % n].append(e["file"])
        return [
            ManifestFilesPartition(self.root, fs, lo, hi) for fs in buckets if fs
        ]

    # -- executor-side read ---------------------------------------------

    def read(self, partition: ManifestFilesPartition):
        import os

        import pyarrow.dataset as ds

        if not partition.files:
            return
        paths = [os.path.join(partition.root, f) for f in partition.files]
        dataset = ds.dataset(paths, format="parquet")
        (sm, ss), (em, es) = partition.start, partition.end
        ms, seq = ds.field("ms"), ds.field("seq")
        expr = ((ms > sm) | ((ms == sm) & (seq > ss))) & (
            (ms < em) | ((ms == em) & (seq <= es))
        )
        names = [f.name for f in self.schema.fields]
        for batch in dataset.to_batches(filter=expr, columns=names):
            if batch.num_rows:
                yield batch

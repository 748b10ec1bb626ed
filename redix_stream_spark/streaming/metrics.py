"""Streaming observability: per-batch metrics capture.

The reference exposes no metrics at all (its only signals are process
crashes); an engine meant for a 1000-executor deployment must surface
throughput, latency and watermark lag continuously. MetricsListener taps
Spark's StreamingQueryListener events and appends one JSON line per
micro-batch — pointable at a file that ships to any log collector.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql.streaming import StreamingQueryListener


class MetricsListener(StreamingQueryListener):
    """Collects per-batch progress; optionally appends JSONL to a file.

    Captured per micro-batch: batch id, input rows, processed rows/sec,
    batch duration, event-time watermark — the four numbers that tell you
    whether a streaming deployment is keeping up.
    """

    def __init__(self, jsonl_path: str | None = None):
        self.records: list[dict] = []
        self.jsonl_path = jsonl_path
        self._lock = threading.Lock()

    # -- StreamingQueryListener interface --------------------------------

    def onQueryStarted(self, event) -> None:
        self._emit({"event": "started", "id": str(event.id), "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        rec = {
            "event": "progress",
            "id": str(p.id),
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "processedRowsPerSecond": p.processedRowsPerSecond,
            "durationMs": dict(p.durationMs) if p.durationMs else {},
            "watermark": (p.eventTime or {}).get("watermark"),
        }
        # df.observe(name, ...) metrics ride the SAME job (computed
        # inline by the plan's CollectMetrics node — zero extra pass,
        # unlike a side count() which would re-run the source): surface
        # them per batch so data-quality counters (null payloads, late
        # rows, rule violations) ship with throughput for free.
        om = getattr(p, "observedMetrics", None)
        if om:
            rec["observed"] = {
                name: row.asDict() for name, row in om.items()
            }
        self._emit(rec)

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        self._emit(
            {
                "event": "terminated",
                "id": str(event.id),
                "exception": event.exception,
            }
        )

    # -- internals --------------------------------------------------------

    def _emit(self, record: dict) -> None:
        with self._lock:
            self.records.append(record)
            if self.jsonl_path:
                with open(self.jsonl_path, "a") as f:
                    f.write(json.dumps(record) + "\n")

    # -- convenience -------------------------------------------------------

    def total_input_rows(self) -> int:
        return sum(
            r.get("numInputRows", 0) for r in self.records if r["event"] == "progress"
        )


def observe(df, name: str = "metrics", **exprs):
    """Attach inline observed metrics to ``df`` (batch or streaming):
    ``observe(df, rows=F.count(F.lit(1)), nulls=F.sum(...))``.

    The aggregates are computed by a CollectMetrics node INSIDE the
    query's own job — no second pass over the source, no extra action —
    and surface per micro-batch in ``StreamingQueryProgress
    .observedMetrics[name]`` (captured by MetricsListener) or, for
    batch, via ``pyspark.sql.Observation``. This is the engine's
    data-quality-counter surface: q203's expectation predicates can
    ride ANY existing query as observed sums and gate the pipeline
    without re-reading it (the Deequ "metrics repository" idea on
    Spark's native mechanism).
    """
    named = [c.alias(n) for n, c in exprs.items()]
    return df.observe(name, *named)

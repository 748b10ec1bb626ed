"""MultiConsumer — one consumer over several named streams.

The reference documents multi-topic consumption ("consumes from the given
topic or topics", /root/reference/lib/stream.ex:41-42) but its
implementation pins exactly one stream per consumer (the
``for [^stream, items] <- stream_results`` match,
/root/reference/lib/redix/stream/consumer.ex:168,269). This module closes
that doc/impl gap with the semantics Redis itself gives multi-stream
``XREAD STREAMS s1 s2 pos1 pos2``:

- **independent positions per stream** — each stream advances its own
  (ms, seq) cursor; a slow stream never holds back a fast one;
- **per-stream delivery order** — ids are delivered in (ms, seq) order
  *within* a stream; Redis never promised cross-stream interleaving
  order, and neither do we;
- **one handler** — the reference's 3-arity handler form receives the
  stream name along with the id and payload (README.md:38), which is
  exactly our ``handler(stream, id, payload)``.

Spark mapping: one streaming query per stream (each with its own
checkpoint = its own position), composed behind a single facade. This is
also the right 1000-executor shape — per-stream queries scale, restart,
and backpressure independently; a unioned single query would couple every
stream's trigger cadence and failure domain to the slowest member.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .consumer import Consumer, HandlerResult
from .log import EventLog

#: handler(stream_name, message_id, payload) -> HandlerResult (or raises) —
#: the reference's 3-arity handler (README.md:38 "the stream name, the
#: message id, and a map with the key-value pairs").
MultiHandler = Callable[[str, str, dict], HandlerResult]


@dataclass
class MultiConsumer:
    """Consume several logs with one handler and independent positions.

    ``consumer_opts`` passes through to every per-stream ``Consumer``
    (``start_pos``, ``raise_errors``, ``ordering``,
    ``max_files_per_trigger`` — one policy for the whole group, like the
    reference's single options keyword list, README.md:106-118).
    """

    logs: dict[str, EventLog]
    handler: MultiHandler
    checkpoint_root: str
    group_name: str | None = None
    consumer_opts: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        if not self.logs:
            raise ValueError("MultiConsumer needs at least one stream")
        self._consumers: dict[str, Consumer] = {}
        for name, log in self.logs.items():
            handler = self.handler

            def bound(mid: str, payload: dict, _stream: str = name):
                return handler(_stream, mid, payload)

            group = f"{self.group_name or 'default'}--{name}"
            self._consumers[name] = Consumer(
                log=log,
                handler=bound,
                checkpoint_root=self.checkpoint_root,
                group_name=group,
                **self.consumer_opts,
            )

    # -- lifecycle ------------------------------------------------------

    def attach(self, spark: SparkSession) -> "MultiConsumer":
        """Resolve end_of_stream attach positions for every stream now
        (R11's ``"$"``), before any post-attach produces."""
        for c in self._consumers.values():
            c.attach(spark)
        return self

    def run_once(self, spark: SparkSession) -> None:
        """Drain every stream's backlog once, in ``logs`` insertion order
        (the order XREAD lists the streams)."""
        for c in self._consumers.values():
            c.run_once(spark)

    def run_forever(self, spark: SparkSession, poll_seconds: float = 2.0) -> list:
        """Start one continuous query per stream; caller owns stop() on
        each (use ``Consumer.stop_gracefully`` for the R13 grace window)."""
        return [
            c.run_forever(spark, poll_seconds) for c in self._consumers.values()
        ]

    def run_supervised(self, spark: SparkSession, **policy) -> dict[str, int]:
        """R13 supervision across all streams: each stream gets its own
        one-for-one supervisor (restart policy / max_restarts / max_runs
        pass through to ``Consumer.run_supervised``), mirroring the
        reference's supervisor-per-consumer tree (consumer_sup.ex:35-39 —
        one crashing consumer never takes down its siblings). Returns the
        crash-restart count per stream."""
        return {
            n: c.run_supervised(spark, **policy)
            for n, c in self._consumers.items()
        }

    # -- ack / introspection -------------------------------------------

    def ack(self, spark: SparkSession, stream: str, message_id: str) -> int:
        """Manual ack of a deferred message on the named stream (R8)."""
        return self._consumers[stream].ack(spark, message_id)

    def pending(self, spark: SparkSession, stream: str | None = None) -> DataFrame:
        """Delivered ∖ acked, with a ``stream`` column; optionally one
        stream's view (reference XPENDING per stream)."""
        names = [stream] if stream is not None else list(self._consumers)
        parts = [
            self._consumers[n]
            .pending(spark)
            .withColumn("stream", F.lit(n))
            for n in names
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def dead_letters(self, spark: SparkSession) -> DataFrame:
        parts = [
            c.dead_letters(spark).withColumn("stream", F.lit(n))
            for n, c in self._consumers.items()
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def delivered_positions(self) -> dict[str, tuple[int, int]]:
        """Each stream's durable delivered (ms, seq) watermark."""
        return {n: c.delivered_position() for n, c in self._consumers.items()}

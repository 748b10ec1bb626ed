"""Stream-stream interval join with watermark-bounded state (E88).

The one core Structured Streaming operator the engine had not yet
surfaced: joining two UNBOUNDED streams requires both sides to buffer
rows the other side might still match — unbounded state unless the join
condition bounds event-time distance AND both sides carry watermarks.
With `withWatermark` on both inputs and a time-range predicate, Spark
derives a state-eviction bound per side (rows older than
watermark − range can never match again) — the canonical pattern from
the Structured Streaming programming guide.

Reference parity: the reference processes one stream per consumer
(consumer.ex:168,269 pins a single name) — correlation across streams is
left to the handler author. This operator is the declarative answer:
"clicks within an hour of the same user's view" as a plan, with the
state bound Spark manages instead of hand-rolled handler caches.

Scale: state is keyed by the equi-join key and bounded by
watermark + interval width; the join itself shuffles both sides on the
key like any stream-stream join — no broadcast (both sides grow), no
cartesian (the equi key is mandatory here by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "1 hour",
    interval: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two event-time streams on ``key`` where the right event lands
    within ``[left_ts, left_ts + interval]``.

    Both sides get ``watermark`` so the state store can evict; the range
    predicate gives Spark the per-side eviction bound. Columns from both
    sides survive; ambiguous names must be disjoint apart from ``key``
    (rename upstream — the engine's faces pass pre-projected frames).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {interval}"))
    )
    return lw.join(rw, cond, how).drop(rw[key])

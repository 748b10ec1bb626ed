"""Custom stateful operator: per-key monotonic delivery — the reference
consumer's "position only moves forward" invariant (consumer.ex:276-278,
position advance at consumer.ex:313) as a keyed stateful stream transform.

Each key holds one GroupState with the last delivered (ms, seq). A
micro-batch's rows are applied in log order; rows at or below the stored
position are duplicates/regressions (an at-least-once redelivery, an
out-of-order producer) and are suppressed. Unlike
``dropDuplicatesWithinWatermark`` this enforces *ordering*, not just
uniqueness: a late row with a fresh id but an old position is dropped too.

Built on ``applyInPandasWithState``. (Spark 4's successor API,
``transformWithStateInPandas``, runs a separate Python driver worker that
requires protobuf — unavailable in this container; the GroupState
formulation is semantically identical for this operator and runs
everywhere.)

Scale: state is two longs per key in the state store, sharded by the
grouping key; each micro-batch touches only keys present in that batch.
Arrow-batched rows, no driver involvement.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

#: Output schema of monotonic_delivery.
MONOTONIC_SCHEMA = "key string, ms long, seq long, id string"
_STATE_SCHEMA = "ms long, seq long"


def _monotonic(key, pdfs, state):
    last = tuple(state.get) if state.exists else (-1, -1)
    keep = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ms", "seq"])
        for r in pdf.itertuples(index=False):
            if (r.ms, r.seq) > last:
                last = (int(r.ms), int(r.seq))
                keep.append((key[0], r.ms, r.seq, r.id))
    state.update(last)
    yield pd.DataFrame(keep, columns=["key", "ms", "seq", "id"])


def monotonic_delivery(grouped_key_col: str, df: DataFrame) -> DataFrame:
    """Apply per-key monotonic delivery to a (streaming) DataFrame with
    columns (``grouped_key_col``, ms, seq, id)."""
    prepared = df.select(df[grouped_key_col].alias("key"), "ms", "seq", "id")
    return prepared.groupBy("key").applyInPandasWithState(
        _monotonic,
        outputStructType=MONOTONIC_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

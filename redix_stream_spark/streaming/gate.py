"""Observe-gated epoch promotion (E155 — closing the E150 ∘ E151 loop).

q203 declares the expectation-suite shape (per-row predicates folded into
map-side violation counters); ``observe()`` (streaming/metrics.py) proves
counters can ride a query's own job via CollectMetrics. This module makes
the counters GATE something: an epoch's output is written once — to a
staging directory, with the expectation sums attached to that very write
job through ``pyspark.sql.Observation`` (zero extra source pass,
plan-asserted in tests) — and is PROMOTED to the published path only if
every violation count is within its declared threshold. A failing epoch
is quarantined with its counter values instead of landing half-bad data
a downstream training job would silently absorb (Deequ's
"check-then-publish", on Spark's native observed-metrics mechanism).

Crash semantics follow the matview/commit.py discipline: the staging
write is overwrite-per-epoch (replay-idempotent), promotion is one
atomic directory rename, and a replay of an already-promoted epoch is a
no-op — so at-least-once foreachBatch delivery never double-publishes
and never re-quarantines a published epoch.

Scale: the gate adds ZERO passes (the counters ride the staging write),
one driver-side dict read per epoch (Observation.get — the bounded
consumer-watermark class), and one rename.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


class GatedEpochWriter:
    """Write per-epoch parquet output gated by expectation predicates.

    ``expectations`` maps rule name → (per-row violation predicate,
    max tolerated violations). Example::

        gate = GatedEpochWriter(out, {
            "doc_id.not_null":  (F.col("doc_id").isNull(), 0),
            "text.min_length":  (F.length("text") < 5, 10),
        })
        ok = gate.apply_batch(batch_df, epoch_id)

    Layout: ``<root>/epoch=N/`` (promoted), ``<root>/_staging/epoch=N/``
    (in flight), ``<root>/_quarantine/epoch=N/`` + ``_quarantine.jsonl``
    (withheld epochs and their counter values).
    """

    def __init__(self, root: str, expectations: dict[str, tuple[Column, int]]):
        if not expectations:
            raise ValueError("expectations must declare at least one rule")
        self.root = root
        self.expectations = dict(expectations)
        os.makedirs(os.path.join(root, "_staging"), exist_ok=True)
        os.makedirs(os.path.join(root, "_quarantine"), exist_ok=True)

    # -- paths -------------------------------------------------------------

    def _final(self, epoch_id: int) -> str:
        return os.path.join(self.root, f"epoch={epoch_id}")

    def _staging(self, epoch_id: int) -> str:
        return os.path.join(self.root, "_staging", f"epoch={epoch_id}")

    def _quarantine(self, epoch_id: int) -> str:
        return os.path.join(self.root, "_quarantine", f"epoch={epoch_id}")

    # -- the gate ----------------------------------------------------------

    def observed_df(self, df: DataFrame) -> tuple[DataFrame, Observation]:
        """Attach the expectation counters to ``df`` as an Observation —
        CASE-sum semantics (NULL predicate counts 0, the q203/ADVICE-r9
        rule), plus the checked-row count."""
        obs = Observation()
        aggs = [F.count(F.lit(1)).cast("long").alias("n_checked")] + [
            F.sum(F.when(pred, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias(name)
            for name, (pred, _) in self.expectations.items()
        ]
        return df.observe(obs, *aggs), obs

    def apply_batch(self, batch: DataFrame, epoch_id: int) -> bool:
        """Stage-write ``batch`` with inline counters, then promote or
        quarantine. Returns True iff the epoch was promoted (or already
        was). Safe under foreachBatch replay."""
        final = self._final(epoch_id)
        if os.path.exists(final):
            return True  # crash-after-promote replay: already published
        if os.path.exists(self._quarantine(epoch_id)):
            # crash-after-quarantine replay: already journaled — re-staging
            # would append a duplicate _quarantine.jsonl line (ADVICE r10).
            return False
        observed, obs = self.observed_df(batch)
        staging = self._staging(epoch_id)
        observed.write.mode("overwrite").parquet(staging)  # THE one pass
        got = obs.get
        violations = {
            name: int(got[name] or 0)
            for name, (_, limit) in self.expectations.items()
            if int(got[name] or 0) > limit
        }
        if not violations:
            os.rename(staging, final)  # atomic publish
            return True
        qdir = self._quarantine(epoch_id)
        if os.path.exists(qdir):
            shutil.rmtree(qdir)
        os.rename(staging, qdir)
        with open(os.path.join(self.root, "_quarantine.jsonl"), "a") as f:
            f.write(
                json.dumps(
                    {
                        "epoch": epoch_id,
                        "n_checked": int(got["n_checked"] or 0),
                        "violations": violations,
                        "limits": {
                            n: lim for n, (_, lim) in self.expectations.items()
                        },
                        "ts": time.time(),
                    }
                )
                + "\n"
            )
        return False

    # -- read side ---------------------------------------------------------

    def published(self, spark) -> DataFrame:
        """All promoted epochs (quarantined data never surfaces here)."""
        dirs = [
            os.path.join(self.root, d)
            for d in os.listdir(self.root)
            if d.startswith("epoch=")
        ]
        if not dirs:
            first = self.expectations  # no epochs yet: empty frame
            raise FileNotFoundError(
                f"no promoted epochs under {self.root} "
                f"(rules: {sorted(first)})"
            )
        return spark.read.option("basePath", self.root).parquet(*dirs)

    def quarantined_epochs(self) -> list[dict]:
        path = os.path.join(self.root, "_quarantine.jsonl")
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]

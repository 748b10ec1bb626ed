"""Measure StreamingSemanticDedup over 20 sequential batches: per-batch
latency vs accepted-index size, duplicate-drop accounting.

Each batch: 1,000 64-dim vectors — 80% fresh Gaussians, 20% scaled
copies of vectors from EARLIER batches (planted cross-batch semantic
dups; scaling leaves cosine at 1.0 and the bucket unchanged).

Usage: python scripts/measure_stream_semdedup.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from redix_stream_spark.llm.stream_semdedup import StreamingSemanticDedup  # noqa: E402
from redix_stream_spark.session import get_spark  # noqa: E402

BATCHES = 20
BATCH_SIZE = 1000
DIM = 64
DUP_FRAC = 0.2


def main() -> None:
    spark = get_spark("measure-stream-semdedup")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(7)
    root = tempfile.mkdtemp(prefix="measure_semdedup_")
    sd = StreamingSemanticDedup(root, bits=6, tau=0.95)

    history: list[np.ndarray] = []
    next_id = 0
    print(f"{BATCHES} batches × {BATCH_SIZE} vectors, {DUP_FRAC:.0%} planted dups, bits=6")
    print("| batch | apply s | accepted total | dups dropped (cum) |")
    print("|---|---|---|---|")
    submitted = 0
    for b in range(BATCHES):
        n_dup = int(BATCH_SIZE * DUP_FRAC) if history else 0
        fresh = rng.standard_normal((BATCH_SIZE - n_dup, DIM))
        rows_v = [v for v in fresh]
        if n_dup:
            pool = np.vstack(history)
            picks = rng.integers(0, len(pool), n_dup)
            rows_v += [pool[i] * rng.uniform(0.5, 2.0) for i in picks]
        history.append(fresh)
        batch = spark.createDataFrame(
            [(next_id + i, [float(x) for x in v]) for i, v in enumerate(rows_v)],
            "vec_id long, embedding array<float>",
        )
        next_id += len(rows_v)
        submitted += len(rows_v)
        t0 = time.time()
        sd.apply_batch(batch, epoch_id=b)
        dt = time.time() - t0
        if b % 4 == 3 or b == BATCHES - 1 or b == 0:
            acc = sd.accepted(spark).count()
            print(f"| {b} | {dt:.2f} | {acc} | {submitted - acc} |", flush=True)
        else:
            print(f"| {b} | {dt:.2f} | | |", flush=True)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

"""q141 distributed k-means vs a NumPy reference (same seeds, same
quantized-mean update), plus the broadcast plan shape."""

from __future__ import annotations

import hashlib
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

from redix_stream_spark.llm.kmeans import (
    KM_ITERS,
    KM_K,
    kmeans_assign,
    q141_kmeans_clusters,
    seed_centroids,
)

from .test_plans import plan_of


def _ref_kmeans(pdf: pd.DataFrame, k: int, iters: int):
    """Reference Lloyd's with the module's exact seed/tie/quantize rules."""
    ids = pdf["vec_id"].to_numpy()
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    order = np.lexsort(
        (ids, [hashlib.md5(str(i).encode()).hexdigest() for i in ids])
    )
    cents = X[order[:k]]

    def assign(c):
        d = ((X[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1), d.min(axis=1)

    a, dist = assign(cents)
    for _ in range(iters - 1):
        live = sorted(set(a))
        cents = np.stack([q_mean(X[a == c]) for c in live])
        a_idx, dist = assign(cents)
        a = np.array([live[i] for i in a_idx])
    return ids, a, dist


def q_mean(rows: np.ndarray) -> np.ndarray:
    """Quantize each element to 6 decimals (HALF_UP), then exact mean."""
    qs = np.array(
        [
            [
                Decimal(repr(float(v))).quantize(
                    Decimal("0.000001"), ROUND_HALF_UP
                )
                for v in row
            ]
            for row in rows
        ]
    )
    sums = qs.sum(axis=0)
    return np.array([float(s) / len(rows) for s in sums])


def test_kmeans_matches_numpy_reference(spark, sf_dir):
    got = {
        r["vec_id"]: (r["cluster"], r["dist"])
        for r in q141_kmeans_clusters(spark, sf_dir).collect()
    }
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    ids, a, dist = _ref_kmeans(pdf, KM_K, KM_ITERS)
    assert len(got) == len(ids)
    for i, c, d in zip(ids, a, dist):
        gc, gd = got[int(i)]
        assert gc == c, f"vec {i}: cluster {gc} != ref {c}"
        assert abs(gd - d) < 1e-9 * max(1.0, abs(d))


def test_kmeans_uses_all_and_only_k_seeds(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    seeds = seed_centroids(e, KM_K).collect()
    assert [r["cid"] for r in seeds] == list(range(KM_K))
    assert all(len(r["cvec"]) == 64 for r in seeds)


def test_kmeans_assign_broadcasts_centroids(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    plan = plan_of(kmeans_assign(e, seed_centroids(e, KM_K)))
    # centroids are bounded (k rows) metadata: the cross join must be the
    # broadcast nested-loop form, never a shuffled cartesian product.
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan

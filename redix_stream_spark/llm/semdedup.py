"""Semantic deduplication over embeddings (SemDeDup-style).

The modern LLM-corpus pattern (Abbas et al., "SemDeDup", 2023): cluster
the embedding space cheaply, then drop documents whose embedding is a
near-duplicate (cosine ≥ τ) of an *earlier* document in the same cluster —
first occurrence wins, exactly the C4/passage-dedup keep policy
(q99) lifted to semantic space.

Spark-first design:

- The "cluster" is a deterministic random-hyperplane LSH bucket: the
  packed sign bits of ``bits`` integer-coefficient hyperplane projections.
  Integer coefficients (md5-derived, seedless) make the bucket id a pure
  function of the embedding that DuckDB can recompute literally — the
  whole operator is oracle-verifiable end-to-end, unlike a k-means
  assignment whose training is engine-internal. Sign of a projection is
  invariant under positive scaling, so integer planes ARE unit Gaussian
  planes for bucketing purposes.
- Bucket assignment is map-only (``bits`` codegen'd left-fold dot
  products per row); the only shuffle is the bucket-key self-join, and
  within-bucket work is O(bucket²) — the identical blocked shape as q41,
  with the LSH bucket playing the block key the SemDeDup paper plays with
  k-means cells.
- Per CLAUDE.md, the fat-array self-join is pinned ``shuffle_hash``
  (Spark's size estimator undercounts array columns; auto-broadcast OOMs
  at scale — measured, SCALING.md) and plan-asserted in tests/test_plans.py.
- At 100 TB: raise ``bits`` so buckets stay bounded (each +1 bit halves
  expected bucket size); recall lost to bucket boundaries is the same
  approximation the paper makes at cluster boundaries. Multi-probe (union
  of Hamming-1 buckets) buys recall back for one extra join per probe.

Verification: per-vector verdict row carries ``nn_sim`` — the max cosine
to any earlier bucket-mate — so the driver hash exercises the full pair
join even when no pair clears τ at test scale; planted-duplicate semantics
are pinned in tests/test_llm_semdedup.py.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .similarity import dot, norm

#: Demo-scale defaults: 4 bits → 16 buckets over the 500-vector sf0.01
#: table (~31 vectors/bucket). A real corpus raises bits to keep buckets
#: at a few thousand vectors.
SEM_BITS = 4
SEM_TAU = 0.8
EMB_DIM = 64


def _plane_coef(bit: int, i: int) -> int:
    """Deterministic integer hyperplane coefficient in [-1000, 1000].

    md5-derived (no RNG, no seed state): both engines — and any future
    re-implementation — can reproduce the planes from the spec alone.
    """
    h = hashlib.md5(f"semdedup:{bit}:{i}".encode()).hexdigest()
    return int(h[:8], 16) % 2001 - 1000


def sem_planes(bits: int = SEM_BITS, dim: int = EMB_DIM) -> list[list[int]]:
    return [[_plane_coef(b, i) for i in range(dim)] for b in range(bits)]


def _proj(col: Column, plane: list[int]) -> Column:
    """Left-fold dot of the embedding with an integer literal plane."""
    return dot(col, F.array(*[F.lit(float(c)) for c in plane]))


def semantic_bucket(col: Column, planes: list[list[int]]) -> Column:
    """Packed sign bits of the hyperplane projections, as BIGINT."""
    out = None
    for i, plane in enumerate(planes):
        bit = F.when(_proj(col, plane) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        out = bit if out is None else out + bit
    return out.cast("long")


def semantic_dedup(
    emb: DataFrame, bits: int = SEM_BITS, tau: float = SEM_TAU
) -> DataFrame:
    """Per-vector semantic-dedup verdicts.

    Returns one row per vector: ``vec_id, bucket, nn_sim`` (max cosine to
    any earlier same-bucket vector; NULL for the bucket's first vector),
    ``dup_of`` (smallest earlier bucket-mate with cosine ≥ tau; NULL if
    none) and ``kept`` (dup_of IS NULL — first occurrence wins).
    """
    planes = sem_planes(bits)
    tagged = emb.select(
        "vec_id",
        "embedding",
        semantic_bucket(F.col("embedding"), planes).alias("bucket"),
        norm(F.col("embedding")).alias("nrm"),
    )
    a = tagged.alias("a")
    # Fat array column on both sides: pin shuffle-hash, never broadcast.
    b = tagged.alias("b").hint("shuffle_hash")
    sim = dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    verdict = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("b.vec_id") < F.col("a.vec_id")),
        )
        .groupBy(F.col("a.vec_id").alias("vec_id"))
        .agg(
            F.max(sim).alias("nn_sim"),
            F.min(F.when(sim >= F.lit(tau), F.col("b.vec_id"))).alias("dup_of"),
        )
    )
    return (
        tagged.select("vec_id", "bucket")
        .join(verdict, "vec_id", "left")
        .select(
            "vec_id",
            "bucket",
            "nn_sim",
            "dup_of",
            F.col("dup_of").isNull().alias("kept"),
        )
    )


def _sql_dot_lit(a: str, plane: list[int]) -> str:
    lits = ", ".join(str(c) for c in plane)
    return (
        f"list_reduce(list_transform(list_zip({a}, [{lits}]), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, x) -> acc + x)"
    )


def _gen_semdedup_oracle_sql(bits: int = SEM_BITS, tau: float = SEM_TAU) -> str:
    """DuckDB oracle: the identical construction, planes inlined as
    integer literals (stage-for-stage with semantic_dedup)."""
    planes = sem_planes(bits)
    bucket_terms = " + ".join(
        f"(CASE WHEN {_sql_dot_lit('embedding', plane)} > 0 THEN {1 << i} ELSE 0 END)"
        for i, plane in enumerate(planes)
    )
    pair_sim = (
        "list_reduce(list_transform(list_zip(a.embedding, b.embedding), "
        "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, x) -> acc + x)"
        " / (a.nrm * b.nrm)"
    )
    return f"""
WITH t AS (
  SELECT vec_id, embedding,
         CAST({bucket_terms} AS BIGINT) AS bucket,
         SQRT(list_reduce(list_transform(list_zip(embedding, embedding),
                p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                (acc, x) -> acc + x)) AS nrm
  FROM embeddings
),
p AS (
  SELECT a.vec_id AS vec_id,
         MAX({pair_sim}) AS nn_sim,
         MIN(CASE WHEN {pair_sim} >= {tau} THEN b.vec_id END) AS dup_of
  FROM t a
  JOIN t b ON a.bucket = b.bucket AND b.vec_id < a.vec_id
  GROUP BY a.vec_id
)
SELECT t.vec_id AS vec_id, t.bucket AS bucket,
       p.nn_sim AS nn_sim, p.dup_of AS dup_of,
       (p.dup_of IS NULL) AS kept
FROM t
LEFT JOIN p ON t.vec_id = p.vec_id
"""


@register("q102_semantic_dedup", _gen_semdedup_oracle_sql())
def q102_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup verdicts over ``embeddings``.

    Scale shape: map-only bucket assignment (codegen fold per plane), one
    bucket-key shuffle for the pair join (shuffle-hash pinned — fat array
    columns never broadcast), O(bucket²) within-bucket cosine, thin
    verdict join back. No driver collect; no global sort.
    """
    return semantic_dedup(load_table(spark, sf_dir, "embeddings"))

"""Distributed Lloyd's k-means over the ``embeddings`` table — the
cluster-then-curate primitive of modern corpus pipelines (SemDeDup's
cluster stage, cluster-balanced sampling, IVF coarse quantizers). The
repo already fits small k-means ON A SAMPLE driver-side (pq.py); this is
the *full-corpus* DataFrame-native version: every step is a Spark
aggregate, no vector payload ever reaches the driver.

Per-iteration plan shape (the part that must survive 100 TB):

- **assign**: centroids are a k-row relation (k·dim doubles — bounded
  metadata, ~4 KB here) explicitly ``broadcast()`` into a nested-loop
  cross join; the squared-L2 fold is a codegen'd higher-order-function
  expression per (vector, centroid) row; the argmin is
  ``groupBy(vec_id).agg(min(struct(dist, cid, …)))`` — map-side combined,
  never a window over the corpus.
- **update**: ``posexplode`` the assigned vectors to (cluster, dim, x)
  and aggregate — map-side combine collapses each partition to ≤ k·dim
  partial rows, so the shuffle is O(k·dim·partitions), independent of
  corpus size. The per-dim mean uses the decimal discipline below.
- The centroid relation between iterations is k·dim-sized; the loop
  materializes it per iteration (k rows — cheap) so lineage stays flat.

Bit-parity of the means (the reason a k-means can be oracle-checked at
all): float SUM is addition-order dependent, so each element is first
quantized ``double → DECIMAL(18,6)`` — a correctly-rounded cast in both
engines, and a binary fraction is never exactly halfway between two
6-decimal grid points (a tie would need the value to be an odd multiple
of 5·10⁻⁷, impossible for m/2^k), so HALF_UP (Spark) and round-to-nearest
(DuckDB) agree on every input. Decimal sums are exact and associative;
the sum re-enters double precision through the ``dsum_big`` floor-split
(numeric.py) and one IEEE division by the exact count. Distances are
left-fold squared-diff aggregates (the q40 dot-product shape), seeds are
md5-ordered (no RNG), ties break on cluster id — every downstream double
is bit-identical across engines, so the full 2-iteration algorithm
round-trips the driver's value hash.

The quantization changes the *centroids* by ≤ 5·10⁻⁷ per coordinate per
iteration — noise relative to k-means' own sample variance; assignments
at test scale are identical to the unquantized run (pytest-pinned).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..registry import register

KM_K = 8
KM_ITERS = 2
KM_DIM = 64  # embeddings table vector width (oracle unroll needs a literal)
_QDEC = "decimal(18,6)"


def sqdist(a: Column, b: Column) -> Column:
    """Left-fold squared L2 distance (deterministic IEEE order).

    Squared diffs are materialized by ``zip_with`` BEFORE the additive
    fold — the two-step shape (same as similarity.dot) keeps DuckDB's
    expression compiler from FMA-contracting ``acc + d*d`` into a fused
    multiply-add Spark doesn't perform.
    """
    diffs = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def seed_centroids(vecs: DataFrame, k: int) -> DataFrame:
    """k md5-ordered seed rows as (cid, cvec double[]) — seedless,
    engine-reproducible (the repo's md5 discipline; same pick rule as
    pq.fit_pq's sample)."""
    order = [F.md5(F.col("vec_id").cast("string")), F.col("vec_id")]
    w = Window.orderBy(*order)
    return (
        vecs.orderBy(*order)
        .limit(k)
        .select(
            (F.row_number().over(w).cast("long") - 1).alias("cid"),
            F.transform("embedding", lambda x: x.cast("double")).alias("cvec"),
        )
    )


def kmeans_assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest centroid per vector: broadcast nested-loop cross join +
    map-side-combined struct-min argmin (ties → smallest cid)."""
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        "cid",
        sqdist(F.col("embedding"), F.col("cvec")).alias("d"),
    )
    # cid is unique within a vec_id group, so the struct comparison always
    # resolves at (d, cid) and never compares the embedding payload.
    return scored.groupBy("vec_id").agg(
        F.min(F.struct("d", "cid", "embedding")).alias("b")
    ).select(
        "vec_id",
        F.col("b.cid").alias("cluster"),
        F.col("b.d").alias("dist"),
        F.col("b.embedding").alias("embedding"),
    )


def kmeans_update(assign: DataFrame) -> DataFrame:
    """Per-cluster decimal-exact per-dim means, reassembled to arrays."""
    ex = assign.select(
        "cluster", F.posexplode("embedding").alias("dim", "x")
    ).select(
        "cluster", "dim", F.col("x").cast("double").cast(_QDEC).alias("q")
    )
    per = ex.groupBy("cluster", "dim").agg(
        F.sum("q").alias("s"), F.count(F.lit(1)).alias("n")
    )
    s, w = F.col("s"), F.floor(F.col("s"))
    mean = (w.cast("double") + (s - w).cast("double")) / F.col("n")
    return (
        per.select("cluster", "dim", mean.alias("m"))
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))),
                lambda st: st["m"],
            ).alias("cvec")
        )
        .select(F.col("cluster").alias("cid"), "cvec")
    )


def kmeans_fit(
    vecs: DataFrame, k: int = KM_K, iters: int = KM_ITERS
) -> tuple[DataFrame, DataFrame]:
    """``iters`` assignment rounds with ``iters - 1`` centroid updates in
    between (Lloyd's); returns (final assignment, the centroids that
    final assignment used) — the codebook an IVF index probes (q43c).

    Clusters emptied by a reassignment drop out (their centroid simply
    has no members to average) — standard Lloyd behavior, identical in
    the oracle's unrolled SQL.
    """
    cents = seed_centroids(vecs, k)
    assign = kmeans_assign(vecs, cents)
    for _ in range(iters - 1):
        cents = kmeans_update(assign)
        assign = kmeans_assign(vecs, cents)
    return assign, cents


def kmeans(vecs: DataFrame, k: int = KM_K, iters: int = KM_ITERS) -> DataFrame:
    """``kmeans_fit`` returning just the (vec_id, cluster, dist) rows."""
    assign, _ = kmeans_fit(vecs, k, iters)
    return assign.select("vec_id", "cluster", "dist")


# --- generated oracle SQL (unrolled KM_ITERS=2) -----------------------------


def _sql_sqdist(a: str, b: str) -> str:
    diff = "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> {diff} * {diff}), (acc, x) -> acc + x)"
    )


def _sql_assign(vec_rel: str, cent_rel: str) -> str:
    """(vec_id, embedding, cluster, dist) — rk=1 argmin over centroids."""
    return f"""
  SELECT vec_id, embedding, cid AS cluster, d AS dist FROM (
    SELECT e.vec_id, e.embedding, c.cid, {_sql_sqdist('e.embedding', 'c.cvec')} AS d,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_sql_sqdist('e.embedding', 'c.cvec')}, c.cid
           ) AS rk
    FROM {vec_rel} e CROSS JOIN {cent_rel} c
  ) WHERE rk = 1
"""


def _gen_kmeans_oracle_sql(k: int = KM_K) -> str:
    return f"""
WITH seeds AS (
  SELECT CAST(ROW_NUMBER() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) - 1 AS cid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
  FROM (
    SELECT vec_id, embedding FROM embeddings
    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k}
  )
),
a1 AS ({_sql_assign('embeddings', 'seeds')}),
upd AS (
  SELECT cluster, i AS dim,
         SUM(q) AS s, COUNT(*) AS n
  FROM (
    -- DuckDB's range() table function cannot take a lateral column arg,
    -- so the unroll uses the table's fixed width ({KM_DIM}).
    SELECT a.cluster, t.i,
           CAST(CAST(a.embedding[t.i + 1] AS DOUBLE) AS DECIMAL(18,6)) AS q
    FROM a1 a, range({KM_DIM}) t(i)
  ) GROUP BY cluster, i
),
c1 AS (
  SELECT cluster AS cid,
         list(
           (CAST(FLOOR(s) AS DOUBLE) + CAST(s - FLOOR(s) AS DOUBLE)) / n
           ORDER BY dim
         ) AS cvec
  FROM upd GROUP BY cluster
),
a2 AS ({_sql_assign('embeddings', 'c1')})
SELECT vec_id, cluster, dist FROM a2
"""


@register("q141_kmeans_clusters", _gen_kmeans_oracle_sql())
def q141_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus distributed k-means (k=8, two Lloyd rounds) over the
    embedding table; output is every vector's final cluster and exact
    squared distance. See the module docstring for the per-iteration
    plan shape and the decimal-mean bit-parity argument; the oracle is
    the same algorithm unrolled in SQL."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return kmeans(e, KM_K, KM_ITERS)

"""Graph analytics over relational data: PageRank on the
customer↔supplier trade graph (edges = distinct (customer, supplier)
pairs from orders⋈lineitem, both directions, so the bipartite graph has
no dangling nodes and every node mixes mass both ways).

This is the repo's second fully oracle-verified *iterative* algorithm
(q141 k-means is the first) — the interesting part is making power
iteration bit-identical across engines:

- Ranks live in DECIMAL(20,15). Decimal addition is exact and
  associative, so the per-node contribution SUM survives any partial-
  aggregation order.
- Each rank→double cast is correctly rounded identically in both
  engines *because the scaled integer stays below 2^53*: DuckDB casts
  decimal→double as int128→double (exact while < 2^53) then one divide
  by 10^scale — one effective rounding, same as Spark's BigDecimal
  cast. (Scale 15 is the ceiling: 10^15 < 2^53 < 10^18 — scale 18
  would double-round in DuckDB. Same argument as numeric.dsum_big.)
- The double work per iteration is three deterministic single ops:
  r/outdeg (contribution), 0.15/N (teleport), 0.85·s (damping). The
  damped term is quantized back to decimal BEFORE being added to the
  teleport term — the add happens in decimal, so there is no
  ``a*b + c`` double expression for DuckDB's compiler to FMA-contract
  (the q47 lesson).
- double→DECIMAL(20,15) quantization is the same both engines: a
  binary fraction m/2^k is never exactly halfway between two
  15-decimal grid points, so HALF_UP (Spark) and round-to-nearest-any
  (DuckDB) agree on every input.

The quantization perturbs ranks by ≤ 5·10⁻¹⁶ per step — far below the
10⁻⁶-ish convergence tolerances PageRank is run to.

Scale shape per iteration: one join of the node-sized rank relation
against the edge relation keyed on src (at rest you'd bucket edges by
src once and reuse the partitioning every round), then a map-side-
combined groupBy(dst). The rank relation is node-sized; nothing
edge-sized ever shuffles twice. The iteration count is a driver loop
over DataFrame ops — k rounds = k joins, lineage kept flat by the
node-sized intermediate (no localCheckpoint needed at 2 rounds; add it
past ~10, the q80 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

PR_ITERS = 2
PR_DEC = "decimal(20,15)"
_D, _TELEPORT, _DAMP = "double", 0.15, 0.85


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customer↔supplier pairs as a symmetric directed edge list
    over namespaced node ids ('c:<key>', 's:<key>')."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    rev = pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    return fwd.union(rev)


def pagerank(edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """Damped PageRank (d=0.85) with decimal-exact mass accounting.

    ``edges`` is a directed (src, dst) relation; every node is assumed to
    have at least one out-edge (symmetrize the graph first otherwise —
    dangling-mass redistribution is not implemented).
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("outdeg"))
    nodes = deg.select(F.col("src").alias("node"), "outdeg")
    n = nodes.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))

    # r0 = 1/N and the teleport term 0.15/N: one IEEE division each,
    # quantized to the decimal rank domain.
    with_n = nodes.join(F.broadcast(n))
    ranks = with_n.select(
        "node",
        "outdeg",
        "n_nodes",
        (F.lit(1.0) / F.col("n_nodes")).cast(PR_DEC).alias("rank"),
    )
    base = (F.lit(_TELEPORT) / F.col("n_nodes")).cast(PR_DEC)

    for _ in range(iters):
        contribs = (
            ranks.join(edges, ranks["node"] == edges["src"])
            .select(
                "dst",
                (F.col("rank").cast(_D) / F.col("outdeg")).cast(PR_DEC).alias("w"),
            )
            .groupBy("dst")
            .agg(F.sum("w").alias("s"))
        )
        damped = (F.lit(_DAMP) * F.col("s").cast(_D)).cast(PR_DEC)
        sel = ranks.select("node", "outdeg", "n_nodes")
        ranks = sel.join(
            contribs, sel["node"] == contribs["dst"], "left"
        ).select(
            "node",
            "outdeg",
            "n_nodes",
            (base + F.coalesce(damped, F.lit(0).cast(PR_DEC))).alias("rank"),
        )
    return ranks.select(
        "node", "outdeg", F.col("rank").cast(_D).alias("pagerank")
    )


# --- generated oracle SQL (unrolled PR_ITERS=2) ------------------------------


def _sql_iteration(prev: str, out: str) -> str:
    """One power-iteration step: contribution sum + decimal recombine."""
    return f"""
{out}_c AS (
  SELECT e.dst,
         SUM(CAST(CAST(r.rank AS DOUBLE) / r.outdeg AS DECIMAL(20,15))) AS s
  FROM {prev} r JOIN edges e ON r.node = e.src
  GROUP BY e.dst
),
{out} AS (
  -- literals are CAST to DOUBLE: bare 0.15/0.85 parse as DECIMAL in
  -- DuckDB (decimal division semantics) but as double in Spark.
  SELECT r.node, r.outdeg, r.n_nodes,
         CAST(CAST(0.15 AS DOUBLE) / r.n_nodes AS DECIMAL(20,15))
           + COALESCE(CAST(CAST(0.85 AS DOUBLE) * CAST(c.s AS DOUBLE)
                           AS DECIMAL(20,15)),
                      CAST(0 AS DECIMAL(20,15))) AS rank
  FROM {prev} r LEFT JOIN {out}_c c ON r.node = c.dst
)"""


PR_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT 'c:' || CAST(o.o_custkey AS VARCHAR) AS c,
                  's:' || CAST(l.l_suppkey AS VARCHAR) AS s
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
),
deg AS (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY src
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg),
r0 AS (
  SELECT node, outdeg, n_nodes,
         CAST(CAST(1.0 AS DOUBLE) / n_nodes AS DECIMAL(20,15)) AS rank
  FROM deg CROSS JOIN nn
),{_sql_iteration('r0', 'r1')},{_sql_iteration('r1', 'r2')}
SELECT node, outdeg, CAST(rank AS DOUBLE) AS pagerank FROM r2
"""


@register("q144_pagerank", PR_SQL)
def q144_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two power-iteration rounds of damped PageRank over the symmetric
    customer↔supplier trade graph; output is every node's rank and
    out-degree. See the module docstring for the decimal mass-accounting
    argument that makes the iteration hash-verifiable cross-engine."""
    return pagerank(_edges(spark, sf_dir), PR_ITERS)

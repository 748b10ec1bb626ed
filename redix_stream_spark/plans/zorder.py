"""Z-order (Morton) layout keys for multi-dimensional data skipping.

At 100 TB the scan you avoid is worth more than the join you optimize: a
parquet lake sorted by ONE column prunes row groups only for predicates
on that column. Interleaving the bits of several columns into one Morton
key and sorting by it gives every participating dimension locality, so a
box predicate on (a, b) prunes row groups on BOTH — the Delta/Iceberg
``OPTIMIZE ZORDER BY`` pattern, here as plain integer expressions.

The key is pure JVM arithmetic (subtract → scale → bit interleave), no
UDF: each column is affinely mapped to ``ZBITS`` bits using min/max
stats, then bit b of dimension i lands at position ``n_dims*b + i``.
Identical integer arithmetic runs in DuckDB, so the q119 face is
hash-verified cross-engine (the layout key must be deterministic — it
defines physical placement, and backfills must agree with history).

Measured (tests/test_plans.py + SCALING.md): on lineitem laid out in
small row groups, a box predicate on (l_partkey, l_suppkey) prunes ~√s
of row groups under a single-column sort but ~s under the z-order
layout (s = box selectivity) — the min/max footer stats become tight in
both dimensions.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

ZBITS = 16  # bits per dimension (2 dims → 32-bit keys)


def zvalue(dims: list[tuple[Column, Column, Column]], bits: int = ZBITS) -> Column:
    """Morton key over ``dims`` = [(col, min, max), ...].

    Bit b of dimension i → key bit ``len(dims)*b + i``; 2 dims at 16
    bits each is 32 shift/mask/add terms — one whole-stage-codegen
    expression, no UDF, no shuffle.
    """
    n = len(dims)
    parts: list[Column] = []
    for i, (col, mn, mx) in enumerate(dims):
        # exact integer floor-division: subtract the remainder first so
        # the double division is of an exactly-divisible pair (exact for
        # values < 2^53 — key ranges here are far below that).
        span = F.greatest(mx.cast("long") - mn.cast("long"), F.lit(1))
        scaled = (col.cast("long") - mn.cast("long")) * ((1 << bits) - 1)
        scaled = ((scaled - scaled % span) / span).cast("long")
        for b in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftright(scaled, b).bitwiseAND(F.lit(1)), n * b + i
                ).cast("long")
            )
    return reduce(add, parts)


def _sql_zvalue(dims: list[tuple[str, str, str]], bits: int = ZBITS) -> str:
    """DuckDB mirror of :func:`zvalue` (same scale + interleave math)."""
    n = len(dims)
    terms = []
    for i, (col, mn, mx) in enumerate(dims):
        span = f"GREATEST({mx} - {mn}, 1)"
        scaled = f"((({col} - {mn}) * {(1 << bits) - 1}) // {span})"
        for b in range(bits):
            terms.append(f"((({scaled} >> {b}) & 1) << {n * b + i})")
    return " + ".join(terms)


Q119_SQL = f"""
WITH s AS (
  SELECT MIN(l_partkey) AS mn1, MAX(l_partkey) AS mx1,
         MIN(l_suppkey) AS mn2, MAX(l_suppkey) AS mx2
  FROM lineitem
)
SELECT
  l_orderkey,
  l_linenumber,
  CAST({_sql_zvalue([('l_partkey', 'mn1', 'mx1'), ('l_suppkey', 'mn2', 'mx2')])}
       AS BIGINT) AS zval
FROM lineitem CROSS JOIN s
"""


@register("q119_zorder_key", Q119_SQL)
def q119_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Morton layout key over (l_partkey, l_suppkey), hash-verified
    cross-engine — determinism is the point: a layout key defines
    physical data placement, and an engine migration or backfill that
    computes even one bit differently silently destroys clustering.

    Scale: the min/max stats are a 1-row broadcast; the key itself is a
    map-side codegen expression. ``write_zordered`` sorts by it with a
    range partitioner (``repartitionByRange``), which both orders rows
    inside files AND gives files disjoint key ranges — the two levels of
    skipping (file pruning, then row-group pruning) a 1000-executor scan
    relies on.
    """
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.min("l_partkey").alias("mn1"),
        F.max("l_partkey").alias("mx1"),
        F.min("l_suppkey").alias("mn2"),
        F.max("l_suppkey").alias("mx2"),
    )
    j = li.crossJoin(F.broadcast(stats))
    z = zvalue(
        [
            (F.col("l_partkey"), F.col("mn1"), F.col("mx1")),
            (F.col("l_suppkey"), F.col("mn2"), F.col("mx2")),
        ]
    )
    return j.select("l_orderkey", "l_linenumber", z.cast("long").alias("zval"))


def write_zordered(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 8,
    bits: int = ZBITS,
) -> None:
    """Lay ``df`` out z-ordered on ``cols``: range-partition by the
    Morton key (disjoint key ranges per file → file-level skipping),
    sort within partitions (tight row-group stats → row-group skipping),
    drop the key column on write."""
    stats_row = df.agg(
        *[f(c).alias(f"{n}_{c}") for c in cols for n, f in (("mn", F.min), ("mx", F.max))]
    ).collect()[0]
    dims = [
        (F.col(c), F.lit(stats_row[f"mn_{c}"]), F.lit(stats_row[f"mx_{c}"]))
        for c in cols
    ]
    (
        df.withColumn("_z", zvalue(dims, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )

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
    curve: str = "morton",
) -> None:
    """Lay ``df`` out space-filling-curve-ordered on ``cols``:
    range-partition by the curve key (disjoint key ranges per file →
    file-level skipping), sort within partitions (tight row-group stats
    → row-group skipping), drop the key column on write.

    ``curve``: "morton" (one flat codegen expression) or "hilbert"
    (2-D only; the unrolled recurrence — ~17% fewer surviving row
    groups on the measured box workload, at the cost of the chained
    projections). The layout choice is write-time only; readers see
    plain parquet either way.
    """
    stats_row = df.agg(
        *[f(c).alias(f"{n}_{c}") for c in cols for n, f in (("mn", F.min), ("mx", F.max))]
    ).collect()[0]
    if curve == "hilbert":
        if len(cols) != 2:
            raise ValueError("hilbert layout supports exactly 2 dimensions")

        def scale(c):
            mn = F.lit(stats_row[f"mn_{c}"]).cast("long")
            mx = F.lit(stats_row[f"mx_{c}"]).cast("long")
            span = F.greatest(mx - mn, F.lit(1))
            v = (F.col(c).cast("long") - mn) * ((1 << bits) - 1)
            return ((v - v % span) / span).cast("long")

        keyed = hilbert_frame(
            df, scale(cols[0]), scale(cols[1]), keep=df.columns, bits=bits, out="_z"
        )
    elif curve == "morton":
        dims = [
            (F.col(c), F.lit(stats_row[f"mn_{c}"]), F.lit(stats_row[f"mx_{c}"]))
            for c in cols
        ]
        keyed = df.withColumn("_z", zvalue(dims, bits))
    else:
        raise ValueError(f"unknown curve {curve!r}")
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


# --- Hilbert variant: same contract, half the fragmentation ------------------


def hilbert_frame(
    df: DataFrame,
    sx: Column,
    sy: Column,
    keep: list[str],
    bits: int = ZBITS,
    out: str = "hval",
) -> DataFrame:
    """Append the Hilbert index of pre-scaled coordinates (sx, sy ∈
    [0, 2^bits)) as column ``out``.

    The classic xy2d recurrence (per level: quadrant digit + reflect/swap
    rotation) is data-DEPENDENT per level, so unlike Morton it is not one
    flat expression — it unrolls into ``bits`` chained projections, each
    computing (hd, hx, hy) from the previous level's columns. Still pure
    JVM expressions (conditionals + bit ops), no UDF, no shuffle;
    multi-referenced projections survive CollapseProject, so each level
    evaluates once (the minhash_signatures discipline).

    Why bother over Morton: a box query's Hilbert-curve fragmentation is
    ~half Morton's (no center-cross discontinuity — the curve never jumps
    across quadrant diagonals), measured in tests/test_plans.py as
    surviving row groups. The price is exactly this non-flat key math.
    """
    n = 1 << bits
    d = df.select(
        *keep,
        sx.cast("long").alias("_hx"),
        sy.cast("long").alias("_hy"),
        F.lit(0).cast("long").alias("_hd"),
    )
    for level in reversed(range(bits)):
        s = 1 << level
        d = d.select(
            "*",
            F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0, 1)
            .otherwise(0)
            .cast("long")
            .alias("_rx"),
            F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0, 1)
            .otherwise(0)
            .cast("long")
            .alias("_ry"),
        )
        reflect_swap_x = F.when(
            F.col("_ry") == 0,
            F.when(F.col("_rx") == 1, F.lit(n - 1) - F.col("_hy")).otherwise(
                F.col("_hy")
            ),
        ).otherwise(F.col("_hx"))
        reflect_swap_y = F.when(
            F.col("_ry") == 0,
            F.when(F.col("_rx") == 1, F.lit(n - 1) - F.col("_hx")).otherwise(
                F.col("_hx")
            ),
        ).otherwise(F.col("_hy"))
        d = d.select(
            *keep,
            (
                F.col("_hd")
                + F.lit(s * s) * (F.lit(3) * F.col("_rx")).bitwiseXOR(F.col("_ry"))
            ).alias("_hd"),
            reflect_swap_x.alias("_hx"),
            reflect_swap_y.alias("_hy"),
        )
    return d.select(*keep, F.col("_hd").alias(out))


def _sql_hilbert(keys: str, base: str, bits: int = ZBITS) -> str:
    """DuckDB mirror of hilbert_frame: the same unrolled recurrence as
    chained CTEs over a base relation exposing (keys, hx, hy)."""
    n = 1 << bits
    ctes = [f"l{bits} AS (SELECT {keys}, hx, hy, CAST(0 AS BIGINT) AS hd FROM {base})"]
    for level in reversed(range(bits)):
        s = 1 << level
        prev = f"l{level + 1}"
        ctes.append(
            f"""l{level} AS (
  SELECT {keys},
         hd + CAST({s * s} AS BIGINT) * xor(3 * rx, ry) AS hd,
         CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN {n - 1} - hy ELSE hy END
              ELSE hx END AS hx,
         CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN {n - 1} - hx ELSE hx END
              ELSE hy END AS hy
  FROM (SELECT *,
               CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END AS rx,
               CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END AS ry
        FROM {prev})
)"""
        )
    return ",\n".join(ctes)


Q119B_SQL = f"""
WITH s AS (
  SELECT MIN(l_partkey) AS mn1, MAX(l_partkey) AS mx1,
         MIN(l_suppkey) AS mn2, MAX(l_suppkey) AS mx2
  FROM lineitem
),
base AS (
  SELECT l_orderkey, l_linenumber,
         (CAST(l_partkey - mn1 AS BIGINT) * {(1 << ZBITS) - 1})
           // GREATEST(mx1 - mn1, 1) AS hx,
         (CAST(l_suppkey - mn2 AS BIGINT) * {(1 << ZBITS) - 1})
           // GREATEST(mx2 - mn2, 1) AS hy
  FROM lineitem CROSS JOIN s
),
{_sql_hilbert('l_orderkey, l_linenumber', 'base')}
SELECT l_orderkey, l_linenumber, hd AS hval FROM l0
"""


@register("q119b_hilbert_key", Q119B_SQL)
def q119b_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert layout key over (l_partkey, l_suppkey) — q119's Morton
    twin with ~half the box-query fragmentation (see hilbert_frame).
    Hash-verified cross-engine through the full 16-level recurrence."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.min("l_partkey").alias("mn1"),
        F.max("l_partkey").alias("mx1"),
        F.min("l_suppkey").alias("mn2"),
        F.max("l_suppkey").alias("mx2"),
    )
    j = li.crossJoin(F.broadcast(stats))

    def scale(col, mn, mx):
        span = F.greatest(F.col(mx) - F.col(mn), F.lit(1)).cast("long")
        v = (F.col(col).cast("long") - F.col(mn).cast("long")) * ((1 << ZBITS) - 1)
        return ((v - v % span) / span).cast("long")

    return hilbert_frame(
        j,
        scale("l_partkey", "mn1", "mx1"),
        scale("l_suppkey", "mn2", "mx2"),
        keep=["l_orderkey", "l_linenumber"],
    )

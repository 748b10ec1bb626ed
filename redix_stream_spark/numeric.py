"""Decimal-exact numeric helpers for oracle bit-parity.

Why this exists: the correctness driver hashes query output values after
running the same query in Spark and in DuckDB. Floating-point SUM over
doubles is addition-order dependent, and Spark (partial/merge aggregation
across partitions) will not add in the same order as DuckDB — so a naive
``SUM(double)`` can differ in the last ulps and break the hash even though
both engines are "right".

Fix: money-like doubles (2-decimal payloads in the TPC-H-ish generator) are
cast to DECIMAL before aggregation. Decimal arithmetic is exact and
associative, so Spark's distributed partial aggregation and DuckDB's
single-node aggregation produce the *same digits*; casting the final
aggregate back to DOUBLE then yields bit-identical IEEE values.

This is also the right call at 100 TB: decimal sums neither overflow
(precision 38 with sum-widening) nor drift, no matter how many partial
aggregates AQE merges.

The per-factor casts keep every intermediate product within precision 38 in
BOTH engines (Spark: p1+p2+1 digits; DuckDB: p1+p2), so no engine-side
rounding is ever triggered:
    money (12,2) × factor (4,2)            -> (17,4) / (16,4)
    money (12,2) × factor (4,2) × (4,2)    -> (22,6) / (20,6)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(12,2)"  # quantities/prices: |x| < 10^10, 2-decimal payloads
FACTOR = "decimal(4,2)"  # (1±discount/tax): |x| < 100, 2-decimal payloads


def money(col: str | Column) -> Column:
    """Exact-decimal view of a 2-decimal money/quantity double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def one_minus(col: str | Column) -> Column:
    """(1 - x) computed in IEEE double then cast to exact decimal.

    The double subtraction is deterministic (same bits in every engine), and
    the cast rounds the same binary value the same way in Spark and DuckDB.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.lit(1.0) - c).cast(FACTOR)


def one_plus(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (F.lit(1.0) + c).cast(FACTOR)


def dsum(col: Column, alias: str) -> Column:
    """Exact decimal SUM surfaced as a bit-stable DOUBLE."""
    return F.sum(col).cast("double").alias(alias)


def dsum_big(col: Column, alias: str) -> Column:
    """Exact decimal SUM surfaced as a bit-stable DOUBLE even when the
    sum's scaled integer exceeds 2^53.

    A plain decimal→double cast of such a value is itself a rounding step,
    and the engines round differently (Spark: one correctly-rounded
    BigDecimal→double; DuckDB: int128→double then /10^scale — two
    roundings). Splitting into FLOOR(s) + (s − FLOOR(s)) makes both casts
    exact (whole part < 2^53 units, fraction < 1 at bounded scale), and the
    single IEEE addition then yields the correctly-rounded double of the
    true sum — identically in both engines. Holds while the *whole* part
    stays below 2^53 (9×10^15 units — far past the sf0.1 bench scale).
    """
    s = F.sum(col)
    w = F.floor(s)
    return (w.cast("double") + (s - w).cast("double")).alias(alias)


def davg(col: Column, alias: str) -> Column:
    """Exact decimal SUM / COUNT surfaced as DOUBLE.

    Dividing the exact double-cast sum by the exact count is a single IEEE
    operation — bit-identical across engines (unlike AVG, whose internal
    accumulation order is engine-defined).
    """
    return (F.sum(col).cast("double") / F.count(F.lit(1))).alias(alias)


# --- SQL-side mirrors (DuckDB dialect) -------------------------------------

def sql_money(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(12,2))"


def sql_one_minus(expr: str) -> str:
    return f"CAST(1.0 - {expr} AS DECIMAL(4,2))"


def sql_one_plus(expr: str) -> str:
    return f"CAST(1.0 + {expr} AS DECIMAL(4,2))"


def sql_dsum(inner: str, alias: str) -> str:
    return f"CAST(SUM({inner}) AS DOUBLE) AS {alias}"


def sql_dsum_big(inner: str, alias: str) -> str:
    s = f"SUM({inner})"
    return (
        f"(CAST(FLOOR({s}) AS DOUBLE) + CAST({s} - FLOOR({s}) AS DOUBLE)) AS {alias}"
    )


def sql_davg(inner: str, alias: str) -> str:
    return f"CAST(SUM({inner}) AS DOUBLE) / COUNT(*) AS {alias}"

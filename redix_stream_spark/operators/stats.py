"""Statistical aggregates: exact percentiles and decimal-exact moment
statistics (extends SURVEY.md E9/E10 coverage).

Moment statistics (variance/stddev/correlation) are deliberately computed
from *exact decimal power sums* rather than Spark's native streaming
aggregators: native Welford/pairwise accumulation is partition-order
dependent, so its low bits differ run-to-run and engine-to-engine. Power
sums are associative and exact in decimal, and the final double formula is
a fixed sequence of IEEE ops — bit-identical in Spark and DuckDB, at any
partition count. (Same discipline as redix_stream_spark.numeric.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..numeric import dsum_big
from ..registry import register

Q26_SQL = """
SELECT
  l_returnflag,
  quantile_cont(l_quantity, 0.25) AS q25_qty,
  quantile_cont(l_quantity, 0.5)  AS median_qty,
  quantile_cont(l_quantity, 0.75) AS q75_qty,
  COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


@register("q26_percentiles", Q26_SQL)
def q26_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of quantity per return flag.

    l_quantity is integer-valued, so the linear interpolation
    ``a + (b-a)*f`` at f ∈ {.25, .5, .75} is exact in IEEE doubles and
    engine-independent. The approximate sketch path for 100 TB is
    q52_approx_percentiles (rows-only). Exact percentile is a sort-based
    aggregate — fine per group, not something to run globally at scale.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q25_qty"),
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.75)").alias("q75_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register("q52_approx_percentiles")  # rows-only: sketch internals differ
def q52_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL-style sketch) — the constant-memory scale path.

    Results are unpacked to scalar ``p50_price``/``p95_price`` columns
    (array-valued outputs are unhashable for the driver's canonicalizer —
    same serialization rule as q46's array results).
    """
    l = load_table(spark, sf_dir, "lineitem")
    q = l.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)").alias("_q")
    )
    return q.select(
        "l_returnflag",
        F.element_at("_q", 1).alias("p50_price"),
        F.element_at("_q", 2).alias("p95_price"),
    )


def _dec(col: str, scale: str = "decimal(12,2)") -> Column:
    return F.col(col).cast(scale)


Q27_SQL = """
WITH s AS (
  SELECT
    o_orderstatus,
    COUNT(*) AS n,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sx,
    (CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(o_totalprice AS DECIMAL(12,2)))) AS DOUBLE) + CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(o_totalprice AS DECIMAL(12,2))) - FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(o_totalprice AS DECIMAL(12,2)))) AS DOUBLE)) AS sxx
  FROM orders
  GROUP BY o_orderstatus
)
SELECT
  o_orderstatus,
  n,
  sx / n AS mean_total,
  (sxx - sx * sx / n) / (n - 1) AS var_total,
  SQRT((sxx - sx * sx / n) / (n - 1)) AS stddev_total
FROM s
"""


@register("q27_moment_stats", Q27_SQL)
def q27_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance / stddev via exact decimal power sums.

    ``sx``/``sxx`` are exact decimals cast to double, so the variance
    formula is the same fixed IEEE sequence in both engines — reproducible
    regardless of how AQE splits the partial aggregation.
    """
    o = load_table(spark, sf_dir, "orders")
    x = _dec("o_totalprice")
    agg = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        dsum_big(x * x, "sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    var = (sxx - sx * sx / n) / (n - 1)
    return agg.select(
        "o_orderstatus",
        "n",
        (sx / n).alias("mean_total"),
        var.alias("var_total"),
        F.sqrt(var).alias("stddev_total"),
    )


Q28_SQL = """
SELECT
  user_id,
  CAST(COUNT(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS n_click,
  CAST(COUNT(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS n_view,
  CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
  CAST(COUNT(*) FILTER (WHERE event_type = 'signup')   AS BIGINT) AS n_signup,
  CAST(COUNT(*) FILTER (WHERE event_type = 'error')    AS BIGINT) AS n_error
FROM events
GROUP BY user_id
"""


@register("q28_pivot_events", Q28_SQL)
def q28_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts per user into one column per event type.

    Spark's ``pivot`` with an explicit value list — explicit because at
    scale an unlisted pivot triggers a driver-side distinct scan of the
    pivot column first. The oracle is the standard FILTER formulation.
    """
    e = load_table(spark, sf_dir, "events")
    pivoted = (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in ("click", "view", "purchase", "signup", "error")
        ],
    )

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


# --- q186: oracle-backed HyperLogLog ------------------------------------------

# q53 demonstrates the mergeable-sketch ROLLUP pattern on Spark's native
# datasketches HLL (engine-internal bytes — correct, but only Spark can
# read them). This face is the cross-engine twin: a from-scratch HLL
# (Flajolet et al. 2007) whose registers AND estimate are bit-identical
# in any engine, because every step is integer arithmetic over md5 bits —
# hash = 60 bits of md5, register index = low 6 bits, rho = leading-zero
# rank of the remaining 54 bits via a generated comparison ladder (never
# floor(log2): a float log at an exact power boundary is off-by-one), and
# the harmonic mean Σ 2^-r is scaled by 2^HLL_SHIFT into exact integers.
# The raw-HLL estimator is used VERBATIM on both sides (no small-range
# linear-counting branch — that needs ln(); the face reports the exact
# distinct next to the estimate, so accuracy is visible, and determinism
# is what the oracle checks).

HLL_M = 64  # registers (2^6); index = low 6 hash bits
HLL_WBITS = 54  # remaining hash bits scanned for the leading 1
HLL_SHIFT = 62  # Σ 2^-r scaled by 2^62: max term (empty reg) = 2^62
#: alpha_64 = 0.709 exactly (Flajolet et al. 2007, Fig. 3) as a rational.
HLL_ALPHA_NUM, HLL_ALPHA_DEN = 709, 1000


def _hll_bitlen_case(var: str) -> str:
    """CASE ladder: exact bit length of a HLL_WBITS-bit integer."""
    whens = " ".join(
        f"WHEN {var} >= {1 << (k - 1)} THEN {k}"
        for k in range(HLL_WBITS, 0, -1)
    )
    return f"CASE {whens} ELSE 0 END"


def _hll_sql() -> str:
    bitlen = _hll_bitlen_case("w")
    est = (
        f"CAST(CAST({HLL_ALPHA_NUM} AS HUGEINT) * {HLL_M * HLL_M}"
        f" * {1 << HLL_SHIFT} // ({HLL_ALPHA_DEN} * s) AS BIGINT)"
    )
    return f"""
WITH h AS (
  SELECT event_type, user_id,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hv
  FROM events
),
b AS (
  SELECT event_type, user_id, hv % {HLL_M} AS j, hv // {HLL_M} AS w FROM h
),
reg AS (
  SELECT event_type, j,
         MAX({HLL_WBITS} + 1 - ({bitlen})) AS r
  FROM b GROUP BY event_type, j
),
reg_all AS (
  SELECT 'ALL' AS event_type, j, MAX(r) AS r FROM reg GROUP BY j
),
u AS (
  SELECT * FROM reg UNION ALL SELECT * FROM reg_all
),
s AS (
  SELECT event_type,
         SUM(CAST(CAST(1 AS BIGINT) << ({HLL_SHIFT} - r) AS HUGEINT))
           + CAST({HLL_M} - COUNT(*) AS HUGEINT)
             * {1 << HLL_SHIFT} AS s,
         COUNT(*) AS n_regs
  FROM u GROUP BY event_type
),
ex AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM h
  GROUP BY event_type
  UNION ALL
  SELECT 'ALL', COUNT(DISTINCT user_id) FROM h
)
SELECT s.event_type,
       {est} AS hll_estimate,
       CAST(ex.n_exact AS BIGINT) AS n_exact,
       CAST(ABS({est} - ex.n_exact) * 1000000 // ex.n_exact AS BIGINT)
         AS err_ppm,
       CAST(s.n_regs AS BIGINT) AS n_regs
FROM s JOIN ex USING (event_type)
ORDER BY s.event_type
"""


def hll_registers(df: DataFrame, key: str, groups: list[str]) -> DataFrame:
    """(groups..., j, r): HLL registers of ``key`` per group — the
    mergeable sketch state (merge = MAX per (groups, j); lossless).
    Shared by the q186 batch face and ``llm.stream_hll.StreamingHll``
    so the streaming estimate is VALUE-IDENTICAL to the batch one."""
    h = df.select(
        *groups,
        F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("hv"),
    )
    b = h.select(
        *groups,
        (F.col("hv") % HLL_M).alias("j"),
        F.expr(f"hv DIV {HLL_M}").alias("w"),
    )
    rho = F.expr(f"{HLL_WBITS} + 1 - ({_hll_bitlen_case('w')})")
    return b.groupBy(*groups, "j").agg(F.max(rho).cast("long").alias("r"))


def hll_estimate_cols(reg: DataFrame, groups: list[str]) -> DataFrame:
    """(groups..., s, n_regs) harmonic-mean state from a register
    relation — ``s`` is the 2^HLL_SHIFT-scaled Σ 2^-r in DECIMAL(38,0)
    (empty registers contribute 2^HLL_SHIFT each)."""
    dec = "decimal(38,0)"
    return reg.groupBy(*groups).agg(
        (
            F.sum(
                F.expr(
                    f"CAST(shiftleft(CAST(1 AS BIGINT), {HLL_SHIFT} - r)"
                    f" AS {dec})"
                )
            )
            + (HLL_M - F.count(F.lit(1))).cast(dec)
            * F.lit(1 << HLL_SHIFT).cast(dec)
        ).alias("s"),
        F.count(F.lit(1)).cast("long").alias("n_regs"),
    )


def hll_estimate_expr():
    """⌊α·m²·2^HLL_SHIFT / (den·s)⌋ as a BIGINT Column over ``s``."""
    dec = "decimal(38,0)"
    return F.expr(
        f"CAST(CAST({HLL_ALPHA_NUM} AS {dec}) * {HLL_M * HLL_M}"
        f" * {1 << HLL_SHIFT} DIV ({HLL_ALPHA_DEN} * s) AS BIGINT)"
    )


@register("q186_hll_distinct", _hll_sql())
def q186_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users by a FROM-SCRATCH HyperLogLog whose
    estimate is hash-verified cross-engine, plus the merged 'ALL' rollup
    (register-wise MAX — the mergeability q53 demonstrates, here visible
    to any engine) and the exact distinct with the error in ppm, so the
    sketch's accuracy is part of the readout.

    Exactness: the whole sketch is integer — md5 bits, a generated
    comparison ladder for the leading-zero rank (see module comment: no
    float log2), and the harmonic mean scaled by 2^HLL_SHIFT summed in
    DECIMAL(38,0)/HUGEINT (64 terms of ≤2^62: ≤2^68, past BIGINT). The
    raw estimator ⌊α·m²·2^62 / (den·S)⌋ is the spec on both sides.

    Scale: ONE map-side-combinable aggregate per grain — state is 64
    registers regardless of input size (the entire point of the sketch
    at 100 TB: distinct-counting without a distinct shuffle); the ALL
    merge consumes the 64-row-per-type register relation, never the
    data. The exact-distinct companion columns are the demo's accuracy
    readout — at production scale you'd drop them (they ARE the
    expensive distinct the sketch replaces)."""
    e = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    reg = hll_registers(e, "user_id", ["event_type"])
    reg_all = reg.groupBy("j").agg(F.max("r").alias("r")).select(
        F.lit("ALL").alias("event_type"), "j", "r"
    )
    u = reg.select("event_type", "j", "r").unionByName(reg_all)
    dec = "decimal(38,0)"
    s = hll_estimate_cols(u, ["event_type"])
    est = hll_estimate_expr()
    ex = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    ex = ex.unionByName(
        e.agg(F.countDistinct("user_id").cast("long").alias("n_exact")).select(
            F.lit("ALL").alias("event_type"), "n_exact"
        )
    )
    return (
        s.join(ex, "event_type")
        .select(
            "event_type",
            est.alias("hll_estimate"),
            "n_exact",
            F.expr(
                f"CAST(ABS({HLL_ALPHA_NUM} * {HLL_M * HLL_M}"
                f" * CAST({1 << HLL_SHIFT} AS {dec})"
                f" DIV ({HLL_ALPHA_DEN} * s) - n_exact) * 1000000"
                f" DIV n_exact AS BIGINT)"
            ).alias("err_ppm"),
            "n_regs",
        )
        .orderBy("event_type")
    )

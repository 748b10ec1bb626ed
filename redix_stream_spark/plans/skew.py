"""Skew-aware joins: key salting.

AQE's skew-join handling (enabled by default in ``session.get_spark``)
splits oversized shuffle partitions at runtime, which covers most skew.
Salting is the explicit fallback for pathological hot keys — e.g. a
power-law ``user_id`` where one user owns 10% of a 100 TB event log:

- the skewed (large) side gets a random salt in [0, n_salts);
- the small side is replicated across all salts (explode);
- the join key becomes (key, salt), spreading the hot key over
  ``n_salts`` tasks.

Results are identical to the unsalted join (verified in
tests/test_bucketing.py); only the shuffle layout changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..numeric import dsum, money, one_minus
from ..registry import register

SALT_COL = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on column ``on`` with key salting.

    ``rand()`` only decides which of the ``n_salts`` equivalent tasks a
    row lands in — every salt joins against a full replica of the small
    side, so the result set is exactly the plain join's regardless of the
    random draw.

    ``how`` is restricted to large-side-preserving joins: under
    right/full-outer, every *unmatched* small-side row would surface once
    per salt replica (n_salts duplicates). Salt the other way around (or
    dedup unmatched rows) for those shapes.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi, not {how!r}: the "
            "replicated small side would emit unmatched rows once per salt"
        )
    salted_large = large.withColumn(
        SALT_COL, (F.rand(seed=7) * n_salts).cast("int")
    )
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    replicated_small = small.withColumn(SALT_COL, salts)
    joined = salted_large.join(replicated_small, [on, SALT_COL], how)
    return joined.drop(SALT_COL)


# --- q158: oracle-backed face of the salted join ---------------------------

#: Salt fan-out for the face. 8 spreads a hot key over 8 tasks; the right
#: production value is ~(hot-key share × task count), tuned per key.
Q158_SALTS = 8

Q158_SQL = """
SELECT p.p_brand AS brand,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * CAST(1.0 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
"""


@register("q158_salted_join_revenue", Q158_SQL)
def q158_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand revenue through the SALTED fact⋈dim join — the oracle is the
    plain join, which is the point: salting changes only the shuffle
    layout (the hot partkey spreads over Q158_SALTS tasks), never the
    result, and the hash-compare proves it on real data.

    The dim side is pinned ``shuffle_hash`` (the scenario salting exists
    for is a dim too big to broadcast — with a broadcast there is no
    shuffle to skew); plan shape (__salt in the join keys, no broadcast)
    is asserted in tests/test_plans.py.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    dim = (
        load_table(spark, sf_dir, "part")
        .select(F.col("p_partkey").alias("l_partkey"), "p_brand")
        .hint("shuffle_hash")
    )
    j = salted_join(li, dim, "l_partkey", n_salts=Q158_SALTS)
    return (
        j.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            dsum(money("l_extendedprice") * one_minus("l_discount"), "revenue"),
        )
        .withColumnRenamed("p_brand", "brand")
    )


# --- q187: key-skew diagnostics ----------------------------------------------

# The measurement face behind this module's mitigation faces: BEFORE
# salting (q158) or bucketing, quantify how skewed a join/groupBy key
# actually is. Readout: Gini coefficient of the per-key row-count
# distribution (0 = perfectly even, →1 = one key owns everything;
# G = (2·Σ i·c_(i) − (K+1)·Σc) / (K·Σc) over counts sorted ascending)
# plus the top-key shares. Integer-exact end to end: shares and Gini are
# reported in ppm via DIV, and the rank index i comes from a bucketed
# two-phase prefix rank (q183's pattern — no single-partition sort of
# the key relation). Within equal counts Σ i·c is permutation-invariant
# (consecutive ranks times the same c), so any deterministic tie order
# gives the same Gini.

GINI_PPM = 10**6
#: Sub-bucket resolution: buckets are (bit_length(c), top-3-bits(c)) —
#: value-ordered (equal counts always share a bucket), ~8 buckets per
#: power-of-two band, so a count distribution concentrated in one band
#: still fans out across sub-buckets.
SKEW_KEY = "user_id"


def _skew_bucket_case(var: str, div: str = "//") -> str:
    """Monotone-in-count bucket id: bit_length(c)·8 + top-3-bits(c).
    ``div`` is the engine's integer-division operator (DuckDB ``//``,
    Spark ``DIV``)."""
    whens = " ".join(
        f"WHEN {var} >= {1 << (k - 1)} THEN"
        f" {k * 8} + {var} {div} {1 << max(k - 3, 0)}"
        for k in range(63, 0, -1)
    )
    return f"CASE {whens} ELSE 0 END"


def _q187_sql() -> str:
    return f"""
WITH counts AS (
  SELECT {SKEW_KEY} AS k, COUNT(*) AS c FROM events GROUP BY 1
),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c, k) AS i FROM counts
),
summary AS (
  SELECT COUNT(*) AS n_keys,
         SUM(c) AS s1,
         SUM(CAST(i AS HUGEINT) * c) AS s2
  FROM ranked
),
top AS (
  SELECT MAX(c) AS c_max, SUM(c) AS c_top5
  FROM (SELECT c FROM counts ORDER BY c DESC, k LIMIT 5)
)
SELECT CAST(s1 AS BIGINT) AS n_rows,
       CAST(n_keys AS BIGINT) AS n_keys,
       CAST(CAST(c_max AS HUGEINT) * {GINI_PPM} // s1 AS BIGINT)
         AS max_share_ppm,
       CAST(CAST(c_top5 AS HUGEINT) * {GINI_PPM} // s1 AS BIGINT)
         AS top5_share_ppm,
       CAST((2 * s2 - (n_keys + 1) * CAST(s1 AS HUGEINT)) * {GINI_PPM}
            // (n_keys * CAST(s1 AS HUGEINT)) AS BIGINT) AS gini_ppm
FROM summary, top
"""


@register("q187_key_skew_report", _q187_sql())
def q187_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row skew report for the events join key: total rows, distinct
    keys, heaviest-key and top-5 share (ppm), and the Gini coefficient
    of the per-key count distribution — the go/no-go readout for
    choosing between a plain shuffle, AQE skew splitting, and q158's
    explicit salting (docstring there: salt when one key owns a
    partition-sized share; this face measures exactly that).

    Exactness: counts are integers; every reported ratio is a scaled
    integer DIV; the Gini rank index i is deterministic via (count, key)
    ordering, and permutation-invariance within count ties makes the
    statistic independent of the tie order anyway (module comment).

    Scale: per-key counts are one map-side-combined aggregate; the rank
    over the KEY relation (the potentially-billion-row side at 100 TB)
    is the q183 two-phase prefix pattern — value-ordered buckets from a
    generated comparison ladder (bit-band × top-3-bits: equal counts
    share a bucket, so cross-bucket order is total), per-bucket key
    counts make a ≤512-row offsets relation (the only single-partition
    window), offsets broadcast back, rank = offset + bucket-partitioned
    row_number. Σ i·c folds in the same pass; the top-5 is TakeOrdered;
    the final join multiplies three 1-row relations (broadcast)."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy(F.col(SKEW_KEY).alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    counts = counts.withColumn(
        "bucket", F.expr(_skew_bucket_case("c", "DIV")).cast("long")
    )
    bkeys = counts.groupBy("bucket").agg(F.count(F.lit(1)).alias("nk"))
    woff = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = bkeys.select(
        "bucket", F.coalesce(F.sum("nk").over(woff), F.lit(0)).alias("off")
    )
    win = Window.partitionBy("bucket").orderBy("c", "k")
    dec = "decimal(38,0)"
    ranked = counts.join(F.broadcast(offsets), "bucket").select(
        "c",
        (F.col("off") + F.row_number().over(win)).cast("long").alias("i"),
    )
    summary = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("i").cast(dec) * F.col("c")).cast(dec).alias("s2"),
    )
    top5 = (
        counts.select("c", "k")
        .orderBy(F.desc("c"), F.asc("k"))
        .limit(5)
        .agg(
            F.max("c").cast("long").alias("c_max"),
            F.sum("c").cast("long").alias("c_top5"),
        )
    )
    return (
        summary.join(F.broadcast(top5))
        .select(
            F.col("s1").alias("n_rows"),
            "n_keys",
            F.expr(
                f"CAST(CAST(c_max AS {dec}) * {GINI_PPM} DIV s1 AS BIGINT)"
            ).alias("max_share_ppm"),
            F.expr(
                f"CAST(CAST(c_top5 AS {dec}) * {GINI_PPM} DIV s1 AS BIGINT)"
            ).alias("top5_share_ppm"),
            F.expr(
                f"CAST((2 * s2 - (n_keys + 1) * CAST(s1 AS {dec}))"
                f" * {GINI_PPM}"
                f" DIV (n_keys * CAST(s1 AS {dec})) AS BIGINT)"
            ).alias("gini_ppm"),
        )
    )

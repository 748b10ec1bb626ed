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

from pyspark.sql import DataFrame, SparkSession
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

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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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

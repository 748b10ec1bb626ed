"""Event-log product analytics: funnels and retention — the composite
queries a stream-analytics engine exists to serve (built purely from the
E4–E14 primitives; nothing new at the physical layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

Q60_SQL = """
WITH e AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, ts
  FROM events
),
v AS (
  SELECT user_id, day, MIN(ts) AS t_view
  FROM e WHERE event_type = 'view' GROUP BY user_id, day
),
c AS (
  SELECT e.user_id, e.day, MIN(e.ts) AS t_click
  FROM e JOIN v ON e.user_id = v.user_id AND e.day = v.day
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id, e.day
),
p AS (
  SELECT e.user_id, e.day, MIN(e.ts) AS t_purchase
  FROM e JOIN c ON e.user_id = c.user_id AND e.day = c.day
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id, e.day
)
SELECT
  v.day AS day,
  COUNT(*) AS n_viewers,
  CAST(COUNT(c.user_id) AS BIGINT) AS n_clicked_after_view,
  CAST(COUNT(p.user_id) AS BIGINT) AS n_purchased_after_click
FROM v
LEFT JOIN c ON v.user_id = c.user_id AND v.day = c.day
LEFT JOIN p ON v.user_id = p.user_id AND v.day = p.day
GROUP BY v.day
"""


@register("q60_funnel", Q60_SQL)
def q60_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel per day: view → click-after-view →
    purchase-after-that-click.

    Each stage is a min-timestamp aggregate joined to the previous stage
    with a strict time predicate — every join is equi on (user, day) so
    the whole funnel shuffles on one composite key. At 100 TB this is the
    shape to pre-bucket the event log on (user_id), making all three
    stage joins co-located.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day"),
        "event_type",
        "ts",
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "day")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, ["user_id", "day"])
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id", "day")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, ["user_id", "day"])
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id", "day")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, ["user_id", "day"], "left")
        .join(p, ["user_id", "day"], "left")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_viewers"),
            F.count("t_click").alias("n_clicked_after_view"),
            F.count("t_purchase").alias("n_purchased_after_click"),
        )
    )


Q61_SQL = """
WITH active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
  FROM events
)
SELECT
  a.day AS day,
  COUNT(*) AS n_active,
  CAST(COUNT(b.user_id) AS BIGINT) AS n_retained_next_day
FROM active a
LEFT JOIN active b
  ON a.user_id = b.user_id AND b.day = a.day + INTERVAL '1 day'
GROUP BY a.day
"""


@register("q61_retention", Q61_SQL)
def q61_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-day retention: of the users active on day d, how many return
    on d+1. Distinct (user, day) first (collapses the fact table), then a
    self-equi-join on user with a shifted-day key — linear in active-user
    days, never in raw events."""
    e = load_table(spark, sf_dir, "events")
    active = e.select(
        "user_id", F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day")
    ).distinct()
    b = active.select(
        F.col("user_id").alias("b_user"),
        (F.col("day") - F.expr("INTERVAL '1' DAY")).alias("b_prev_day"),
    )
    return (
        active.join(
            b,
            (F.col("user_id") == F.col("b_user"))
            & (F.col("day") == F.col("b_prev_day")),
            "left",
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.count("b_user").alias("n_retained_next_day"),
        )
    )

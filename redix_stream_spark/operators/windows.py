"""Event-time windowing operators: tumbling, sliding, session
(SURVEY.md §2.2 E18–E19).

The reference has no event-time notion — its only time is the server-stamped
id prefix (``<millis>-<seq>``, /root/reference/lib/stream.ex:29,
test/redix/stream_test.exs:17). These operators are the Spark-idiomatic
upgrade: the identical ``F.window`` / ``F.session_window`` expressions run
unmodified under ``readStream`` with a watermark (see ``streaming.consumer``),
which is the whole point of Structured Streaming's batch/stream unification.

Scale notes: windowed aggregation shuffles on (key, window) — a bounded-
cardinality composite, so no skew beyond the key's own skew; AQE handles
the rest. Session windows shuffle on user_id once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

Q20_SQL = """
SELECT
  CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS window_start,
  event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


@register("q20_tumbling_window", Q20_SQL)
def q20_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling event-time windows per event_type (E18).

    Both engines align hour buckets to the epoch grid, so
    ``F.window(ts, '1 hour').start`` ≡ DuckDB ``time_bucket('1 hour', ts)``.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


Q21_SQL = """
SELECT
  CAST(time_bucket(INTERVAL '30 minutes', ts) - o * INTERVAL '30 minutes' AS TIMESTAMP) AS window_start,
  COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events, (SELECT UNNEST([0, 1]) AS o) offsets
GROUP BY 1
"""


@register("q21_sliding_window", Q21_SQL)
def q21_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes (E18).

    Spark's sliding ``F.window`` assigns each event to width/slide = 2
    windows; the oracle reproduces that by unnesting the two window starts
    {bucket30(ts), bucket30(ts) − 30min} per event.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "n",
            "sum_value",
        )
    )


Q22_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE
           WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1
           WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '30 minutes' THEN 1
           ELSE 0
         END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM flagged
)
SELECT
  user_id,
  CAST(MIN(ts) AS TIMESTAMP) AS session_start,
  CAST(MAX(ts) + INTERVAL '30 minutes' AS TIMESTAMP) AS session_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM sessions
GROUP BY user_id, session_id
"""


@register("q22_session_window", Q22_SQL)
def q22_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap (E19).

    Uses Spark's native ``session_window`` (merging-state operator; works
    identically in streaming with a watermark). Spark's window is
    [start, last_event + gap) with *end-exclusive* merging — an event
    exactly ``gap`` after its predecessor starts a new session — which the
    oracle mirrors with the ``>= INTERVAL`` lag formulation.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )

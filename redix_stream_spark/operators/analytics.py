"""Event-log product analytics: funnels and retention — the composite
queries a stream-analytics engine exists to serve (built purely from the
E4–E14 primitives; nothing new at the physical layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..numeric import money
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


# --- q103: time-series gap-fill (LOCF + exact linear interpolation) --------

#: Demo subset: every 10th user — bounds spine rows at sf0.01 to ~11k
#: (15 users × ~720 hours) while exercising every fill path.
GAPFILL_USER_MOD = 10

Q103_SQL = f"""
WITH obs AS (
  SELECT user_id,
         CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
         SUM(CAST(value AS DECIMAL(18,6))) AS obs_dec
  FROM events
  WHERE user_id % {GAPFILL_USER_MOD} = 0
  GROUP BY user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP)
),
spine AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
  FROM (SELECT user_id, MIN(hr) AS mn, MAX(hr) AS mx FROM obs GROUP BY user_id)
),
filled AS (
  SELECT s.user_id AS user_id, s.hr AS hr, o.obs_dec AS obs_dec,
         last_value(o.obs_dec IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.hr
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
         last_value(CASE WHEN o.obs_dec IS NOT NULL THEN s.hr END IGNORE NULLS)
           OVER (PARTITION BY s.user_id ORDER BY s.hr
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_h,
         first_value(o.obs_dec IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.hr
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
         first_value(CASE WHEN o.obs_dec IS NOT NULL THEN s.hr END IGNORE NULLS)
           OVER (PARTITION BY s.user_id ORDER BY s.hr
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_h
  FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.hr = o.hr
)
SELECT user_id, hr,
       CAST(obs_dec AS DOUBLE) AS observed,
       CAST(prev_v AS DOUBLE) AS filled_locf,
       CASE WHEN obs_dec IS NOT NULL THEN CAST(obs_dec AS DOUBLE)
            ELSE CAST(prev_v AS DOUBLE)
                 + CAST((next_v - prev_v)
                        * date_diff('hour', prev_h, hr) AS DOUBLE)
                   / date_diff('hour', prev_h, next_h)
       END AS interp,
       (obs_dec IS NULL) AS is_gap
FROM filled
"""


@register("q103_gapfill", Q103_SQL)
def q103_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly gap-fill: dense time spine + LOCF + linear interp.

    The timescale-style hypertable pattern on plain DataFrames:

    - ``sequence(min_hr, max_hr, interval 1 hour)`` builds each user's
      spine *from an aggregate*, map-side after one groupBy — no
      driver-side calendar, no cross join against a global spine (which
      at 100 TB would fabricate rows for users outside their active
      range).
    - LOCF and the interpolation neighbours are four IGNORE NULLS frame
      windows, all over the same (user_id, hr) partitioning — one
      shuffle, partition-local scans.
    - Cross-engine exactness: observations are DECIMAL(18,6) sums;
      interpolation is exact-decimal ``(next−prev)·steps`` cast once to
      DOUBLE (scaled integer < 2^53 ⇒ both engines round identically),
      then one IEEE divide and one add — no FMA-contractable shape.

    Spine endpoints are each user's first/last observed hour, so LOCF is
    never NULL and every interior gap has both neighbours.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % GAPFILL_USER_MOD == 0
    )
    obs = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hr")
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("obs_dec"))
    spine = (
        obs.groupBy("user_id")
        .agg(F.min("hr").alias("mn"), F.max("hr").alias("mx"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(mn, mx, interval 1 hour)")).alias("hr"),
        )
    )
    j = spine.join(obs, ["user_id", "hr"], "left")
    back = Window.partitionBy("user_id").orderBy("hr").rowsBetween(
        Window.unboundedPreceding, 0
    )
    fwd = Window.partitionBy("user_id").orderBy("hr").rowsBetween(
        0, Window.unboundedFollowing
    )
    obs_hr = F.when(F.col("obs_dec").isNotNull(), F.col("hr"))
    f = j.select(
        "user_id",
        "hr",
        "obs_dec",
        F.last("obs_dec", ignorenulls=True).over(back).alias("prev_v"),
        F.last(obs_hr, ignorenulls=True).over(back).alias("prev_h"),
        F.first("obs_dec", ignorenulls=True).over(fwd).alias("next_v"),
        F.first(obs_hr, ignorenulls=True).over(fwd).alias("next_h"),
    )
    steps = F.expr("timestampdiff(HOUR, prev_h, hr)")
    gap = F.expr("timestampdiff(HOUR, prev_h, next_h)")
    interp = F.when(
        F.col("obs_dec").isNotNull(), F.col("obs_dec").cast("double")
    ).otherwise(
        F.col("prev_v").cast("double")
        + ((F.col("next_v") - F.col("prev_v")) * steps).cast("double") / gap
    )
    return f.select(
        "user_id",
        "hr",
        F.col("obs_dec").cast("double").alias("observed"),
        F.col("prev_v").cast("double").alias("filled_locf"),
        interp.alias("interp"),
        F.col("obs_dec").isNull().alias("is_gap"),
    )


# --- q104: time-decayed average (transcendental-free EWMA face) ------------

#: Decay weight by recency rank: 10^(6−min(age,6)) — a pure integer
#: weight table, so the weighted sum stays exact decimal end-to-end.
DECAY_WEIGHTS = [1000000, 100000, 10000, 1000, 100, 10, 1]

Q104_SQL = f"""
WITH ranked AS (
  SELECT user_id, CAST(value AS DECIMAL(18,6)) AS v,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
         ) AS BIGINT) - 1 AS age
  FROM events
),
weighted AS (
  SELECT user_id, v,
         {DECAY_WEIGHTS}[CAST(LEAST(age, 6) AS INT) + 1] AS w
  FROM ranked
)
SELECT user_id,
       COUNT(*) AS n_events,
       (CAST(FLOOR(SUM(v * w)) AS DOUBLE)
        + CAST(SUM(v * w) - FLOOR(SUM(v * w)) AS DOUBLE))
       / CAST(SUM(w) AS DOUBLE) AS decayed_avg,
       CAST(SUM(v) AS DOUBLE) / COUNT(*) AS plain_avg
FROM weighted
GROUP BY user_id
"""


@register("q104_decayed_avg", Q104_SQL)
def q104_decayed_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed average per user — the
    transcendental-free face of EWMA (decay base 10 over recency rank,
    capped so weights are a 7-entry integer table).

    Engine discipline: weight lookup is ``element_at`` on a literal
    array (no ``pow`` — libm differs across engines); the weighted sum is
    exact DECIMAL surfaced via the dsum_big floor-split (scaled weighted
    sums exceed 2^53 at modest row counts); one final IEEE divide.

    Scale shape: the recency rank is a per-user window and the aggregate
    groups on the same key, so the window's hash partitioning is reused —
    one shuffle total, partition-local everywhere else.
    """
    e = load_table(spark, sf_dir, "events")
    w_rank = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = e.select(
        "user_id",
        F.col("value").cast("decimal(18,6)").alias("v"),
        (F.row_number().over(w_rank).cast("long") - 1).alias("age"),
    )
    weights = F.array(*[F.lit(w) for w in DECAY_WEIGHTS])
    weighted = ranked.select(
        "user_id",
        "v",
        F.element_at(weights, F.least(F.col("age"), F.lit(6)).cast("int") + 1).alias(
            "w"
        ),
    )
    s = F.sum(F.col("v") * F.col("w"))
    num = F.floor(s).cast("double") + (s - F.floor(s)).cast("double")
    return weighted.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (num / F.sum("w").cast("double")).alias("decayed_avg"),
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("plain_avg"),
    )


# --- q109: sliding-window distinct users (exact + mergeable-sketch faces) ---

Q109_SQL = """
WITH uh AS (
  SELECT DISTINCT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr
  FROM events
),
obs AS (SELECT DISTINCT hr FROM uh),
fan AS (
  SELECT user_id, hr,
         unnest(generate_series(hr, hr + INTERVAL 23 HOUR, INTERVAL 1 HOUR))
           AS target
  FROM uh
)
SELECT f.target AS hr,
       COUNT(DISTINCT f.user_id) AS users_24h,
       COUNT(DISTINCT CASE WHEN f.hr = f.target THEN f.user_id END)
         AS users_this_hour
FROM fan f
WHERE f.target IN (SELECT hr FROM obs)
GROUP BY f.target
"""


@register("q109_sliding_distinct", Q109_SQL)
def q109_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h distinct users per observed hour — exact face.

    The scale-correct shape for sliding distincts is a *bounded fanout*,
    not a range join: each (user, hour) row explodes to the ≤24 target
    hours it can influence (map-only, ×window/slide), then one keyed
    countDistinct per target. A range join (hours × user-hours with a
    BETWEEN predicate) would be a broadcast-nested-loop over the whole
    relation; the fanout is linear and shuffles on the target-hour key.
    Only observed hours are reported (left-semi against the hour set).
    """
    e = load_table(spark, sf_dir, "events")
    uh = e.select(
        "user_id", F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hr")
    ).distinct()
    fan = uh.select(
        "user_id",
        "hr",
        F.explode(
            F.expr("sequence(hr, hr + interval 23 hour, interval 1 hour)")
        ).alias("target"),
    )
    obs = uh.select("hr").distinct().withColumnRenamed("hr", "target")
    return (
        fan.join(obs, "target", "left_semi")
        .groupBy(F.col("target").alias("hr"))
        .agg(
            F.countDistinct("user_id").alias("users_24h"),
            F.countDistinct(
                F.when(F.col("hr") == F.col("target"), F.col("user_id"))
            ).alias("users_this_hour"),
        )
    )


@register("q109b_sliding_distinct_hll")  # rows-only: sketch estimates engine-specific
def q109b_sliding_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h distinct users via mergeable HLL sketches — the
    100 TB face of q109.

    One sketch per hour (constant bytes), then the sliding union merges
    24 *stored sketches* per target hour instead of re-scanning raw
    events: merge cost is hours × window, independent of event count —
    the q53 stored-sketch pattern extended to sliding windows. Estimate
    accuracy vs the exact face is pytest-pinned (±5%).
    """
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.select(
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hr"), "user_id"
        )
        .groupBy("hr")
        .agg(F.hll_sketch_agg("user_id").alias("sketch"))
    )
    fan = hourly.select(
        "sketch",
        "hr",
        F.explode(
            F.expr("sequence(hr, hr + interval 23 hour, interval 1 hour)")
        ).alias("target"),
    )
    obs = hourly.select(F.col("hr").alias("target"))
    return (
        fan.join(obs, "target", "left_semi")
        .groupBy(F.col("target").alias("hr"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("users_24h_est")
        )
    )


# --- q110: rate anomaly detection (integer-exact z-test) --------------------

#: |z| threshold for the anomaly flag, squared (z > 3σ).
ANOMALY_K2 = 9

Q110_SQL = """
WITH hourly AS (
  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP)
),
fan AS (
  SELECT event_type, x,
         unnest(generate_series(hr + INTERVAL 1 HOUR, hr + INTERVAL 23 HOUR,
                                INTERVAL 1 HOUR)) AS target
  FROM hourly
),
base AS (
  SELECT event_type, target,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s1,
         CAST(SUM(x * x) AS BIGINT) AS s2
  FROM fan GROUP BY event_type, target
)
SELECT h.event_type AS event_type, h.hr AS hr, h.x AS x,
       b.n AS n_baseline,
       CAST(b.s1 AS DOUBLE) / b.n AS baseline_mean,
       CASE WHEN b.n * b.s2 - b.s1 * b.s1 > 0
            THEN CAST((h.x * b.n - b.s1) * (h.x * b.n - b.s1) AS DOUBLE)
                 / (b.n * b.s2 - b.s1 * b.s1)
       END AS z_squared,
       ((h.x * b.n - b.s1) * (h.x * b.n - b.s1)
          > 9 * (b.n * b.s2 - b.s1 * b.s1)) AS is_anomaly
FROM hourly h
JOIN base b ON h.event_type = b.event_type AND h.hr = b.target
"""


@register("q110_rate_anomaly", Q110_SQL)
def q110_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, hour) rate anomaly vs the trailing-23h baseline —
    an EXACT integer z-test: |x−μ| > 3σ rearranged as
    (x·n − S1)² > 9·(n·S2 − S1²), all BIGINT (no float mean/stddev, no
    libm, no FMA-contractable double shapes; both engines evaluate the
    identical integers, so even the boolean flag is hash-comparable).
    Holds while n·S2 < 2^62 — ≈ 10⁹ events/hour/type; beyond that,
    widen to DECIMAL.

    Scale shape: the baseline is the same bounded ×23 fanout as q109
    (map-only), aggregated to (type, hour) cardinality; the final join
    is keyed on (type, hour). Hours with an empty baseline (series
    start) are dropped by the inner join — n ≥ 1 always.
    """
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hr")
    ).agg(F.count(F.lit(1)).alias("x"))
    return rate_anomaly_from_hourly(hourly)


def rate_anomaly_from_hourly(hourly: DataFrame) -> DataFrame:
    """The q110 z-test over ANY (event_type, hr, x) hourly-counts frame —
    in particular one maintained incrementally by a StreamingMatView
    (anomaly detection composes with the view: the detector reads
    group-cardinality rows, never raw events; see
    tests/test_matview.py::test_anomaly_composes_over_streaming_view)."""
    fan = hourly.select(
        "event_type",
        "x",
        F.explode(
            F.expr("sequence(hr + interval 1 hour, hr + interval 23 hour, interval 1 hour)")
        ).alias("target"),
    )
    base = fan.groupBy(
        F.col("event_type").alias("b_type"), "target"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    num = F.col("x") * F.col("n") - F.col("s1")
    den = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    return (
        hourly.join(
            base,
            (F.col("event_type") == F.col("b_type")) & (F.col("hr") == F.col("target")),
        )
        .select(
            "event_type",
            "hr",
            "x",
            F.col("n").alias("n_baseline"),
            (F.col("s1").cast("double") / F.col("n")).alias("baseline_mean"),
            F.when(den > 0, (num * num).cast("double") / den).alias("z_squared"),
            (num * num > F.lit(ANOMALY_K2) * den).alias("is_anomaly"),
        )
    )


# --- q112: data-quality constraint report (deequ-style, one pass) ----------

Q112_SQL = """
SELECT
  COUNT(*) AS n_rows,
  COUNT(*) - COUNT(DISTINCT event_id) AS dup_event_ids,
  CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_id,
  CAST(SUM(CASE WHEN user_id  IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user_id,
  CAST(SUM(CASE WHEN props    IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
  COUNT(DISTINCT event_type) AS distinct_event_types,
  CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_values,
  CAST(SUM(CASE WHEN ts < TIMESTAMP '2000-01-01' OR ts > TIMESTAMP '2100-01-01'
                THEN 1 ELSE 0 END) AS BIGINT) AS ts_out_of_range,
  CAST(SUM(CASE WHEN event_type NOT IN
                ('view', 'click', 'purchase', 'signup', 'error')
                THEN 1 ELSE 0 END) AS BIGINT) AS unknown_event_types
FROM events
"""


def quality_report(e: DataFrame) -> DataFrame:
    """One-pass constraint report over an event frame (see q112)."""
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    known = ["view", "click", "purchase", "signup", "error"]
    return e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.countDistinct("event_id")).alias("dup_event_ids"),
        cnt(F.col("event_id").isNull()).alias("null_event_id"),
        cnt(F.col("user_id").isNull()).alias("null_user_id"),
        cnt(F.col("props").isNull()).alias("null_props"),
        F.countDistinct("event_type").alias("distinct_event_types"),
        cnt(F.col("value") < 0).alias("negative_values"),
        cnt(
            (F.col("ts") < F.lit("2000-01-01").cast("timestamp_ntz"))
            | (F.col("ts") > F.lit("2100-01-01").cast("timestamp_ntz"))
        ).alias("ts_out_of_range"),
        cnt(~F.col("event_type").isin(known)).alias("unknown_event_types"),
    )


@register("q112_quality_report", Q112_SQL)
def q112_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data-quality constraint report over the event log
    (the deequ pattern): completeness (null counts), uniqueness
    (duplicate primary keys), domain bounds (negative measures,
    out-of-range timestamps, unknown enum values), cardinality.

    Every metric is an integer count inside ONE map-side-combined
    aggregate — a constraint suite costs a single scan however many
    checks it carries, and the whole report is hash-exact across
    engines. At 100 TB this runs as the validation gate of every
    ingestion batch (compose with the matview pattern to keep a
    running report per ingest epoch); dirty-data semantics are
    pytest-pinned on a planted fixture.
    """
    return quality_report(load_table(spark, sf_dir, "events"))


# --- q114: OHLC bars (time-ordered open/high/low/close aggregates) ----------

Q114_SQL = """
WITH t AS (
  SELECT event_type,
         CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
         CAST(value AS DECIMAL(18,6)) AS v,
         lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
           || lpad(CAST(event_id AS VARCHAR), 20, '0') AS okey
  FROM events
)
SELECT event_type, hr,
       CAST(arg_min(v, okey) AS DOUBLE) AS open,
       CAST(MAX(v) AS DOUBLE) AS high,
       CAST(MIN(v) AS DOUBLE) AS low,
       CAST(arg_max(v, okey) AS DOUBLE) AS close,
       COUNT(*) AS n_trades,
       CAST(SUM(v) AS DOUBLE) AS volume
FROM t
GROUP BY event_type, hr
"""


@register("q114_ohlc_bars", Q114_SQL)
def q114_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event_type: open/close are *time-ordered*
    argmin/argmax over the (ts, id) order key (the latest-state-view
    encoding — mergeable, so bars maintain incrementally exactly like
    the matview), high/low/volume are plain exact-decimal aggregates.
    One map-side-combined aggregate; no window over raw events.
    """
    from ..streaming.matview import order_key

    e = load_table(spark, sf_dir, "events")
    t = e.select(
        "event_type",
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hr"),
        F.col("value").cast("decimal(18,6)").alias("v"),
        order_key().alias("okey"),
    )
    return t.groupBy("event_type", "hr").agg(
        F.min_by("v", "okey").cast("double").alias("open"),
        F.max("v").cast("double").alias("high"),
        F.min("v").cast("double").alias("low"),
        F.max_by("v", "okey").cast("double").alias("close"),
        F.count(F.lit(1)).alias("n_trades"),
        F.sum("v").cast("double").alias("volume"),
    )


# --- q115: event-sequence transition matrix (per-user Markov bigrams) -------

Q115_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type,
       COUNT(*) AS n,
       CAST(COUNT(*) AS DOUBLE)
         / SUM(COUNT(*)) OVER (PARTITION BY prev_type) AS p_next
FROM seq
WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


@register("q115_event_transitions", Q115_SQL)
def q115_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: bigram counts via a per-user LAG (partition-local after
    one user_id shuffle), then transition probabilities with a single
    integer/integer divide per row (COUNT over SUM-of-COUNTs — both
    engines divide the same exact BIGINTs, so the doubles hash-match).
    The matrix itself is event-type² rows — tiny at any corpus scale.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(tot)).alias("p_next"),
    )


# --- q122: SCD Type-2 state history from the event log ----------------------

Q122_SQL = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
changes AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT
  user_id,
  event_type,
  ts AS effective_from,
  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS effective_to,
  CAST(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS BIGINT)
    AS is_current
FROM changes
"""


@register("q122_scd2_history", Q122_SQL)
def q122_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (Type 2) reconstruction from the event
    log: each user's event_type state as validity intervals
    [effective_from, effective_to) — the warehouse-history shape CDC
    pipelines maintain, derived here directly from the append-only log
    (reference R1 semantics: the log IS the source of truth; the
    dimension table is a view over it, like q106's latest-state view but
    keeping the full history instead of the argmax row).

    Consecutive duplicates collapse (a state that doesn't change extends
    its interval); the open interval (effective_to NULL, is_current=1)
    is the q106 latest state. Order key is (ts, event_id) so concurrent
    timestamps break ties identically cross-engine.

    Scale: two windows over the same user_id partitioning — ONE hash
    exchange, both windows partition-local; no self-join, no global
    sort. The changes filter collapses the relation to state-change rows
    before the second window.
    """
    return scd2_intervals(load_table(spark, sf_dir, "events")).drop("event_id")


def scd2_intervals(e: DataFrame) -> DataFrame:
    """Core of q122 over any (user_id, event_type, ts, event_id) frame.

    Both windows order by (ts, event_id): ordering the second window by
    ts alone leaves the interval assignment underdetermined when a user
    has two state changes at a tied ts — the engines could disagree.
    event_id (the id of the interval-opening event) rides along in the
    output so incremental consumers (StreamingScd2View) keep the exact
    tie-break key without a lossy recovery join; q122 drops it.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .drop("prev_type")
    )
    eff_to = F.lead("ts").over(w)
    return changes.select(
        "user_id",
        "event_type",
        "event_id",
        F.col("ts").alias("effective_from"),
        eff_to.alias("effective_to"),
        eff_to.isNull().cast("long").alias("is_current"),
    )


# --- q124: exact per-group median ------------------------------------------

Q124_SQL = """
WITH ranked AS (
  SELECT l_returnflag, l_quantity,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber) AS rk,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
),
mids AS (
  SELECT l_returnflag, n,
         -- weight = how many of the two middle ranks this row holds: for
         -- odd n the ranks coincide and the single middle row must count
         -- TWICE (the Spark face's has_lo + has_hi double-count); selecting
         -- it once would halve the median.
         l_quantity * (CAST(rk = (n + 1) // 2 AS INT) + CAST(rk = n // 2 + 1 AS INT))
           AS weighted_qty
  FROM ranked
  WHERE rk = (n + 1) // 2 OR rk = n // 2 + 1
)
SELECT
  l_returnflag,
  CAST(MAX(n) AS BIGINT) AS n_rows,
  CAST(CAST(SUM(weighted_qty) AS DOUBLE) * 0.5 AS DOUBLE) AS median_qty
FROM mids
GROUP BY l_returnflag
"""


@register("q124_exact_group_median", Q124_SQL)
def q124_exact_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median per group — the ground-truth face of q52's
    approx-percentile sketch, hash-verified cross-engine.

    Cross-engine float discipline: the even-count midpoint is
    (lo + hi) / 2, which naively divides a double — instead the two
    middle DECIMAL values sum exactly, cast once to double, and multiply
    by 0.5 (a power of two: exact in IEEE, no engine divergence, and the
    odd case selects the same middle row twice so one formula covers
    both parities). Tie-breaking inside equal quantities is pinned by
    (l_orderkey, l_linenumber) so both engines rank identically.

    Scale: one hash exchange on the group key; ranking is
    partition-local per group. Exact median fundamentally requires a
    per-group sort — that IS the honest cost (the sketch face, q52,
    is the bounded-memory alternative; this face is what you validate
    it against).
    """
    li = load_table(spark, sf_dir, "lineitem")
    # Two-phase: collapse to (group, value, count) FIRST — a map-side-
    # combined aggregate — then rank cumulative counts over the tiny
    # distinct-value relation. The quantity domain has ~50 distinct
    # values, so the per-group window sorts 50 rows however many billions
    # the raw relation holds (vs a per-group sort of ALL rows, whose
    # parallelism is capped by group cardinality — measured 3.7× growth
    # at 10× before this rewrite, SCALING.md).
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    wn = Window.partitionBy("l_returnflag")
    ranked = counts.select(
        "l_returnflag",
        "l_quantity",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    # integer floor-halves without long division: subtract the remainder
    # first so the double division is exact (the zorder DIV discipline).
    lo = (((F.col("n") + 1) - ((F.col("n") + 1) % 2)) / 2).cast("long")
    hi = ((F.col("n") - F.col("n") % 2) / 2 + 1).cast("long")
    prev = F.col("cum") - F.col("cnt")
    has_lo = (prev < lo) & (F.col("cum") >= lo)
    has_hi = (prev < hi) & (F.col("cum") >= hi)
    contrib = F.when(has_lo, F.col("l_quantity")).otherwise(F.lit(0)) + F.when(
        has_hi, F.col("l_quantity")
    ).otherwise(F.lit(0))
    return (
        ranked.filter(has_lo | has_hi)
        .groupBy("l_returnflag")
        .agg(
            F.max("n").cast("long").alias("n_rows"),
            (F.sum(contrib).cast("double") * F.lit(0.5)).alias("median_qty"),
        )
    )


# --- q126: equi-width histogram --------------------------------------------

HIST_BUCKETS = 20

Q126_SQL = f"""
WITH cents AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c FROM events
),
rng AS (SELECT MIN(c) AS mn, MAX(c) AS mx FROM cents)
SELECT
  event_type,
  ((c - mn) * {HIST_BUCKETS}) // (mx - mn + 1) AS bucket,
  CAST(mn + ((c - mn) * {HIST_BUCKETS}) // (mx - mn + 1) * (mx - mn + 1) // {HIST_BUCKETS} AS BIGINT) AS bucket_lo_cents,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(c) AS BIGINT) AS sum_cents
FROM cents CROSS JOIN rng
GROUP BY event_type, bucket, bucket_lo_cents
"""


@register("q126_histogram", Q126_SQL)
def q126_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type equi-width histogram of ``value``, integer-exact.

    Cross-engine float discipline: bucket boundaries computed on doubles
    put boundary values in different buckets per engine — instead values
    become exact integer cents (the data is 2-decimal), and the bucket
    index is pure BIGINT arithmetic ((c−mn)·B DIV span). The bucket's
    lower edge is reported in cents (also exact); callers divide by 100
    for display. One global (mn, mx) row broadcasts; the histogram
    itself is a map-side-combined count — the profiling scan shape
    (same one the q112 quality report uses) extended to distributions.
    """
    e = load_table(spark, sf_dir, "events")
    cents = e.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    rng = cents.agg(F.min("c").alias("mn"), F.max("c").alias("mx"))
    j = cents.crossJoin(F.broadcast(rng))
    span = F.col("mx") - F.col("mn") + 1
    scaled = (F.col("c") - F.col("mn")) * HIST_BUCKETS
    bucket = ((scaled - scaled % span) / span).cast("long")
    edge_scaled = bucket * span
    edge = (
        F.col("mn")
        + ((edge_scaled - edge_scaled % HIST_BUCKETS) / HIST_BUCKETS).cast("long")
    )
    return (
        j.select("event_type", bucket.alias("bucket"), edge.alias("bucket_lo_cents"), "c")
        .groupBy("event_type", "bucket", "bucket_lo_cents")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("c").cast("long").alias("sum_cents"),
        )
    )


# --- q127: interval-overlap join via grid binning ---------------------------

Q127_SQL = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
changes AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
),
iv AS (
  SELECT user_id, event_type, ts AS f,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
  FROM changes
),
err AS (
  SELECT user_id, f, t FROM iv WHERE event_type = 'error' AND t IS NOT NULL
)
SELECT
  a.user_id AS user_a,
  b.user_id AS user_b,
  a.f AS from_a,
  b.f AS from_b,
  CAST(date_diff('microsecond', GREATEST(a.f, b.f), LEAST(a.t, b.t)) AS BIGINT)
    AS overlap_micros
FROM err a JOIN err b
  ON a.user_id < b.user_id AND a.f < b.t AND b.f < a.t
"""


#: default grid width for interval-overlap binning (seconds)
OVERLAP_CELL_SECONDS = 86_400


def error_intervals(e: DataFrame) -> DataFrame:
    """Closed 'error'-state intervals (user_id, f, t) from the event log."""
    iv = scd2_intervals(e)
    return iv.filter(
        (F.col("event_type") == "error") & F.col("effective_to").isNotNull()
    ).select(
        "user_id",
        F.col("effective_from").alias("f"),
        F.col("effective_to").alias("t"),
    )


def pick_overlap_cell_seconds(err: DataFrame) -> int:
    """Adaptive grid width: the median interval duration, clamped to
    [1 minute, 1 day] and rounded down to a whole minute.

    The grid-binning cost model is Σ per-cell-actives²: cells much wider
    than the typical interval pool unrelated intervals into the same
    cell (a hot day degenerates toward per-cell all-pairs), while cells
    much narrower explode the per-interval fanout. Width ≈ interval
    length keeps fanout ~2 cells/interval AND caps how many intervals a
    cell can hold. One cheap aggregate (approx median) decides; the
    binning stays result-invisible, so the oracle never sees it.
    """
    row = err.select(
        F.expr(
            "percentile_approx(timestampdiff(SECOND, f, t), 0.5)"
        ).alias("med")
    ).head()
    med = int(row["med"] or OVERLAP_CELL_SECONDS)
    return max(60, min(OVERLAP_CELL_SECONDS, (med // 60) * 60 or 60))


def overlap_cells(err: DataFrame, cell_seconds: int) -> DataFrame:
    """Explode intervals into the grid cells they touch. Cells are
    integer epoch-micro buckets (ntz-safe timestampdiff), so any width
    works — the 1-day default matches the calendar-day binning the
    registered faces shipped with."""
    cell_us = int(cell_seconds) * 1_000_000
    f_us = F.expr("timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01', f)")
    t_us = F.expr("timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01', t)")
    return err.select(
        "user_id",
        "f",
        "t",
        F.explode(
            F.sequence(
                F.floor(f_us / cell_us).cast("long"),
                F.floor(t_us / cell_us).cast("long"),
            )
        ).alias("cell"),
    )


def overlap_pairs(err: DataFrame, cell_seconds: int) -> DataFrame:
    """Distinct overlapping (user_a < user_b) interval pairs via the
    grid-binned equi-join (see q127 docstring for the plan).

    Multi-cell dedup is a JOIN-TIME PREDICATE, not a distinct: a pair
    overlapping across several shared cells is emitted only in the cell
    containing its overlap START (greatest(from_a, from_b) — an instant
    inside both intervals, so both sides always enumerate that cell).
    The spatial-join "report at first cell" trick removes what used to
    be a full extra shuffle of every enumerated pair — measured at the
    100× events replica, that distinct shuffled 450M six-column rows
    and dominated the wall clock (SCALING.md round-4 spot-check).
    """
    cell_us = int(cell_seconds) * 1_000_000
    cells = overlap_cells(err, cell_seconds)
    a = cells.select(
        F.col("user_id").alias("user_a"),
        F.col("f").alias("from_a"),
        F.col("t").alias("to_a"),
        "cell",
    )
    b = cells.select(
        F.col("user_id").alias("user_b"),
        F.col("f").alias("from_b"),
        F.col("t").alias("to_b"),
        "cell",
    )
    overlap_start_us = F.expr(
        "timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01',"
        " greatest(from_a, from_b))"
    )
    return a.join(
        b,
        (a.cell == b.cell)  # the equi conjunct binning buys
        & (F.col("user_a") < F.col("user_b"))
        & (F.col("from_a") < F.col("to_b"))
        & (F.col("from_b") < F.col("to_a"))
        # first-cell rule: emit only where the overlap starts
        & (a.cell == F.floor(overlap_start_us / cell_us).cast("long")),
    ).select("user_a", "user_b", "from_a", "from_b", "to_a", "to_b")


@register("q127_interval_overlap", Q127_SQL)
def q127_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join WITHOUT an equi key — which pairs of users
    were in the 'error' state at the same time, and for how long.

    The naive theta join (a.start < b.end AND b.start < a.end) has no
    equi conjunct, so Catalyst can only plan a nested-loop/cartesian —
    quadratic in intervals. The scale plan is GRID BINNING: explode each
    interval into the grid cells it touches, equi-join on the cell (only
    intervals sharing a cell ever meet), apply the exact overlap
    predicate as the join residual, and de-duplicate pairs that share
    several cells. Cost ≈ Σ per-cell-actives² instead of n² — the
    standard spatial-join decomposition, applied to time. The cell
    width is a REAL knob (``overlap_pairs(err, cell_seconds)``): cells
    comparable to typical interval length (~13 h here, so the 1-day
    default) keep fanout ~2 cells/interval, and a HOT interval of time
    (everyone erroring in one day) is handled by narrowing the width —
    ``pick_overlap_cell_seconds`` adapts it to the median interval
    duration; the hot-day fixture in tests/test_advice_r4.py measures
    the per-cell-actives bound both ways.

    Overlap is reported in exact integer microseconds (BIGINT epoch
    subtraction; no float duration). The DuckDB oracle runs the plain
    inequality join — binning is engine-internal and must be invisible
    at ANY width. Plan-asserted: no CartesianProduct /
    BroadcastNestedLoopJoin.
    """
    err = error_intervals(load_table(spark, sf_dir, "events"))
    pairs = overlap_pairs(err, OVERLAP_CELL_SECONDS)
    # timestampdiff works on TIMESTAMP_NTZ directly — no ntz→ltz cast
    # (the matview order-key discipline).
    overlap = F.expr(
        "timestampdiff(MICROSECOND, greatest(from_a, from_b), least(to_a, to_b))"
    )
    return pairs.select(
        "user_a",
        "user_b",
        "from_a",
        "from_b",
        overlap.cast("long").alias("overlap_micros"),
    )


# --- q128: event-type co-occurrence / association lift ----------------------

Q128_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM events),
singles AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_with FROM ut GROUP BY event_type
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT
  p.type_a, p.type_b, p.n_both, sa.n_with AS n_a, sb.n_with AS n_b,
  CAST(n.n_users * p.n_both AS DOUBLE) / CAST(sa.n_with * sb.n_with AS DOUBLE)
    AS lift
FROM pairs p
JOIN singles sa ON sa.event_type = p.type_a
JOIN singles sb ON sb.event_type = p.type_b
CROSS JOIN n
"""


@register("q128_cooccurrence_lift", Q128_SQL)
def q128_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence over event types: for each unordered
    type pair, how many users did both, and the association LIFT
    (P(a,b) / P(a)P(b) = N·n_ab / (n_a·n_b)) — >1 means the behaviors
    attract, <1 they repel.

    Float discipline: lift is ONE division of two exactly-representable
    integer products (all < 2^53), so both engines produce the identical
    double — no ratio-of-ratios, no FMA shape.

    Scale shape: the distinct (user, type) relation collapses the fact
    table first (≤ users × |type| rows); the pair self-join is equi on
    user_id with output bounded by users × C(|types|,2); the per-type
    and global counts are broadcast-sized. At 100 TB with a large item
    vocabulary you bound pairs per user (basket cap) or go straight to
    the heavy-hitter pairs via q120's sketch on pair keys — with 5 event
    types the exact join IS the right plan.
    """
    e = load_table(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    n_users = e.agg(F.countDistinct("user_id").alias("n_users"))
    singles = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_with"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    sa = singles.select(
        F.col("event_type").alias("type_a"), F.col("n_with").alias("n_a")
    )
    sb = singles.select(
        F.col("event_type").alias("type_b"), F.col("n_with").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            (
                (F.col("n_users") * F.col("n_both")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )


# --- q129: weekly cohort retention matrix -----------------------------------

Q129_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS week
  FROM events
),
cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id)
SELECT
  c.cohort_week,
  uw.week - c.cohort_week AS week_offset,
  CAST(COUNT(*) AS BIGINT) AS n_active
FROM uw JOIN cohort c ON uw.user_id = c.user_id
GROUP BY c.cohort_week, week_offset
"""


@register("q129_cohort_matrix", Q129_SQL)
def q129_cohort_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users bucketed by first-active
    week, counted in every later week they return — the full triangle
    q61's next-day retention is one diagonal of.

    Weeks are integer epoch-day floor-sevenths, NOT date_trunc('week'):
    week-start conventions differ across engines/locales, while
    ``days_since_epoch DIV 7`` is pure integer arithmetic and
    hash-identical everywhere (the q126 bucket discipline applied to
    calendars).

    Scale: distinct (user, week) collapses the log first; the cohort
    assignment is a user-keyed MIN that joins back on user_id — two
    shuffles on the same key (exchange reuse), then a map-side-combined
    matrix count whose cardinality is cohorts × offsets, tiny forever.
    """
    e = load_table(spark, sf_dir, "events")
    week = F.floor(F.unix_date(F.col("ts").cast("date")) / 7)
    uw = e.select("user_id", week.cast("long").alias("week")).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        uw.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )


Q127B_SQL = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
changes AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
),
iv AS (
  SELECT user_id, event_type, ts AS f,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
  FROM changes
),
err AS (
  SELECT user_id, f, t FROM iv WHERE event_type = 'error' AND t IS NOT NULL
)
SELECT
  a.user_id AS user_a,
  b.user_id AS user_b,
  CAST(COUNT(*) AS BIGINT) AS n_overlaps,
  CAST(SUM(date_diff('microsecond', GREATEST(a.f, b.f), LEAST(a.t, b.t)))
       AS BIGINT) AS total_overlap_micros
FROM err a JOIN err b
  ON a.user_id < b.user_id AND a.f < b.t AND b.f < a.t
GROUP BY a.user_id, b.user_id
"""


@register("q127b_interval_overlap_agg", Q127B_SQL)
def q127b_interval_overlap_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q127's high-concurrency face: aggregate per USER PAIR instead of
    enumerating interval pairs — output bounded by C(users, 2) however
    dense the concurrency (q127's enumeration grew 96× from 10× users in
    the same time range; this face's output cannot).

    Same grid-binned candidate plan; the per-pair count and exact total
    overlap aggregate map-side-combines immediately after the interval
    de-dup, so the quadratic intermediate flows through the aggregation
    without ever materializing as output. The q124 lesson applied to
    joins: when the enumeration is the cost, ship the aggregate.
    """
    err = error_intervals(load_table(spark, sf_dir, "events"))
    pairs = overlap_pairs(err, OVERLAP_CELL_SECONDS)
    overlap = F.expr(
        "timestampdiff(MICROSECOND, greatest(from_a, from_b), least(to_a, to_b))"
    )
    return pairs.groupBy("user_a", "user_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_overlaps"),
        F.sum(overlap).cast("long").alias("total_overlap_micros"),
    )


# --- q133: inter-event arrival-gap statistics -------------------------------

Q133_SQL = """
WITH gaps AS (
  SELECT event_type,
         date_diff('microsecond',
                   LAG(ts) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id),
                   ts) AS gap_us
  FROM events
)
SELECT event_type,
       CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
       CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
       CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
       CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us) AS mean_gap_us
FROM gaps
WHERE gap_us IS NOT NULL
GROUP BY event_type
"""


@register("q133_interevent_gaps", Q133_SQL)
def q133_interevent_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap statistics per event type — the telemetry
    primitive behind session-gap tuning (q22's gap threshold), rate
    models (q110's baselines), and retention cadence: microsecond gaps
    between a user's consecutive events of each type, as exact BIGINT
    sums/extrema plus one integer-ratio division for the mean.

    Gaps are per (user, type) — cross-user deltas are meaningless — via
    one LAG over a (user_id, event_type) partition: a single hash
    exchange, partition-local ordering, then a map-side-combined
    |type|-group rollup. ``timestampdiff`` keeps TIMESTAMP_NTZ out of
    ntz→ltz casts (the matview order-key discipline).
    """
    e = load_table(spark, sf_dir, "events")
    gaps = e.select(
        "event_type",
        F.expr("timestampdiff(MICROSECOND, lag(ts) OVER "
               "(PARTITION BY user_id, event_type ORDER BY ts, event_id), ts)"
               ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("gap_us").cast("long").alias("total_gap_us"),
        F.min("gap_us").cast("long").alias("min_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
        (F.sum("gap_us").cast("double") / F.count(F.lit(1))).alias("mean_gap_us"),
    )


# --- q143: weighted median (exact, decimal cumulative weights) ---------------

Q143_SQL = """
WITH counts AS (
  SELECT l_returnflag, l_quantity,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS wt
  FROM lineitem GROUP BY l_returnflag, l_quantity
),
cum AS (
  SELECT l_returnflag, l_quantity, cnt, wt,
         SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cw,
         SUM(wt) OVER (PARTITION BY l_returnflag) AS tot,
         SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
  FROM counts
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_rows,
       (CAST(FLOOR(tot) AS DOUBLE) + CAST(tot - FLOOR(tot) AS DOUBLE))
         AS total_weight,
       CAST(l_quantity AS DOUBLE) AS wmedian_qty
FROM cum
WHERE 2 * cw >= tot AND 2 * (cw - wt) < tot
"""


@register("q143_weighted_median", Q143_SQL)
def q143_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group weighted median: the smallest l_quantity whose cumulative
    l_extendedprice weight reaches half the group total — the
    revenue-weighted "typical order size", and the percentile shape used
    for importance-weighted corpus thresholds (weight = quality score or
    sampling weight instead of price).

    Exactness: weights are DECIMAL sums (associative — partial
    aggregation order can't shift them), the half-total crossing test is
    ``2·cum ≥ tot`` in pure decimal (no division, no doubles), and the
    output weight re-enters double via the dsum_big floor-split. Exactly
    one row per group satisfies crossing ∧ ¬crossed-before.

    Scale: the q124 two-phase shape — collapse to (group, value) FIRST
    (map-side-combined; the cumulative window then sorts ~50 distinct
    values per group, not billions of raw rows).
    """
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(money("l_extendedprice")).alias("wt"),
    )
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    wn = Window.partitionBy("l_returnflag")
    cum = counts.select(
        "l_returnflag",
        "l_quantity",
        "cnt",
        "wt",
        F.sum("wt").over(w).alias("cw"),
        F.sum("wt").over(wn).alias("tot"),
        F.sum("cnt").over(wn).alias("n"),
    )
    two = F.lit(2)
    crossing = (two * F.col("cw") >= F.col("tot")) & (
        two * (F.col("cw") - F.col("wt")) < F.col("tot")
    )
    tot, fl = F.col("tot"), F.floor(F.col("tot"))
    return cum.filter(crossing).select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_rows"),
        (fl.cast("double") + (tot - fl).cast("double")).alias("total_weight"),
        F.col("l_quantity").cast("double").alias("wmedian_qty"),
    )


# ---------------------------------------------------------------------------
# q151 — Pareto frontier (2-D skyline): suppliers optimal on
# (total cost MIN, total volume MAX). The multi-objective "best suppliers"
# query every procurement/ranking pipeline runs; dominance is resolved
# with one cumulative-max window instead of the O(n²) dominance anti-join.
# ---------------------------------------------------------------------------

Q151_SQL = """
WITH s AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost_d,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS vol_d
  FROM lineitem GROUP BY l_suppkey
),
pts AS (SELECT DISTINCT cost_d, vol_d FROM s),
sky AS (
  SELECT cost_d, vol_d
  FROM (
    SELECT cost_d, vol_d,
           MAX(vol_d) OVER (
             ORDER BY cost_d, vol_d DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS best_prev
    FROM pts
  )
  WHERE best_prev IS NULL OR best_prev < vol_d
)
SELECT CAST(s.l_suppkey AS BIGINT) AS suppkey,
       CAST(s.cost_d AS DOUBLE) AS total_cost,
       CAST(s.vol_d AS DOUBLE) AS total_volume
FROM s JOIN sky USING (cost_d, vol_d)
ORDER BY suppkey
"""


@register("q151_pareto_frontier", Q151_SQL)
def q151_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal suppliers on (minimize total cost, maximize total
    volume): a supplier is dominated iff some other supplier is no more
    expensive AND moves at least as much volume, strictly better in one.

    Dominance without the O(n²) anti-join: on DISTINCT (cost, vol)
    points sorted (cost asc, vol desc), a point is dominated exactly
    when the running max of volume over all PRECEDING points ≥ its own
    volume — strictly-cheaper points dominate at ≥ (cost is already
    strictly better), and an equal-cost point precedes only if its
    volume is strictly higher. One window pass, exact decimal
    objectives, duplicate (cost, vol) suppliers all survive via the
    join-back.

    Scale: the skyline window runs on the AGGREGATED per-supplier
    relation — dim-sized (the q23b n_buckets argument), after one
    map-side-combined aggregate over the fact table. At an unbounded
    point count you'd skyline per partition first (local frontier) and
    merge — the classic distributed-skyline refinement; dims don't need
    it.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_suppkey").agg(
        F.sum(money("l_extendedprice")).alias("cost_d"),
        F.sum(money("l_quantity")).alias("vol_d"),
    )
    pts = s.select("cost_d", "vol_d").distinct()
    w = Window.orderBy(F.col("cost_d").asc(), F.col("vol_d").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    sky = (
        pts.withColumn("best_prev", F.max("vol_d").over(w))
        .filter(F.col("best_prev").isNull() | (F.col("best_prev") < F.col("vol_d")))
        .select("cost_d", "vol_d")
    )
    return (
        s.join(sky, ["cost_d", "vol_d"])
        .select(
            F.col("l_suppkey").cast("bigint").alias("suppkey"),
            F.col("cost_d").cast("double").alias("total_cost"),
            F.col("vol_d").cast("double").alias("total_volume"),
        )
        .orderBy("suppkey")
    )


# ---------------------------------------------------------------------------
# q152 — robust outliers: median / MAD (median absolute deviation) per
# event type with a 3-MAD outlier count — the robust-statistics quality
# screen (mean/stddev anomaly detection breaks under the very outliers
# it hunts; q110's integer z-scores are the rate-side cousin).
# ---------------------------------------------------------------------------


def _median_expr(df: DataFrame, part: str, val: str, out: str) -> DataFrame:
    """Exact per-group median of a DOUBLE column, engine-identical: rank
    with a pinned total order, conditional-max-pick the two middle rows,
    midpoint = (lo + hi) * 0.5 — one IEEE add then an exact
    power-of-two multiply; the odd case picks the same row twice and
    (2a)*0.5 == a exactly. (The q124 decimal-sum trick needs decimal
    inputs; arbitrary doubles get the deterministic-IEEE form instead.)
    """
    w = Window.partitionBy(part).orderBy(val, "event_id")
    wn = Window.partitionBy(part)
    ranked = df.select(
        part,
        val,
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    lo = (((F.col("n") + 1) - ((F.col("n") + 1) % 2)) / 2).cast("long")
    hi = (((F.col("n") + 2) - ((F.col("n") + 2) % 2)) / 2).cast("long")
    return (
        ranked.filter((F.col("rn") == lo) | (F.col("rn") == hi))
        .groupBy(part)
        .agg(
            (
                (
                    F.max(F.when(F.col("rn") == lo, F.col(val)))
                    + F.max(F.when(F.col("rn") == hi, F.col(val)))
                )
                * F.lit(0.5)
            ).alias(out)
        )
    )


Q152_SQL = """
WITH e AS (SELECT event_type, event_id, value FROM events),
m AS (
  SELECT event_type,
         (MAX(CASE WHEN rn = (n + 1 - (n + 1) % 2) // 2 THEN value END)
          + MAX(CASE WHEN rn = (n + 2 - (n + 2) % 2) // 2 THEN value END)) * 0.5
           AS med
  FROM (
    SELECT event_type, value,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM e
  )
  WHERE rn IN ((n + 1 - (n + 1) % 2) // 2, (n + 2 - (n + 2) % 2) // 2)
  GROUP BY event_type
),
d AS (
  SELECT e.event_type, e.event_id, ABS(e.value - m.med) AS dev, m.med
  FROM e JOIN m USING (event_type)
),
mad AS (
  SELECT event_type,
         (MAX(CASE WHEN rn = (n + 1 - (n + 1) % 2) // 2 THEN dev END)
          + MAX(CASE WHEN rn = (n + 2 - (n + 2) % 2) // 2 THEN dev END)) * 0.5
           AS mad
  FROM (
    SELECT event_type, dev,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM d
  )
  WHERE rn IN ((n + 1 - (n + 1) % 2) // 2, (n + 2 - (n + 2) % 2) // 2)
  GROUP BY event_type
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       MAX(d.med) AS med,
       MAX(mad.mad) AS mad,
       CAST(COUNT(*) FILTER (WHERE d.dev > 3.0 * mad.mad) AS BIGINT) AS n_outliers
FROM d JOIN mad USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
"""


@register("q152_mad_outliers", Q152_SQL)
def q152_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median / MAD / 3-MAD outlier count per event type, all
    engine-identical IEEE: |x − med| is one exact subtract, 3·MAD one
    multiply, the medians the deterministic midpoint form above.

    Scale: two type-partitioned window passes (same key → the second
    exchange reuses the first's partitioning) + broadcast-sized medians
    joined back (type count is bounded). Exact medians require the
    per-group sort — that IS the honest cost; q126/q136's histogram
    quantiles are the bounded-memory scale path this face validates.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    med = _median_expr(e, "event_type", "value", "med")
    d = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("dev"),
    )
    mad = _median_expr(
        d.withColumnRenamed("dev", "value"), "event_type", "value", "mad"
    )
    return (
        d.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.sum(
                F.when(F.col("dev") > F.lit(3.0) * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q153 — equi-depth binning (quantile discretization): the feature-
# engineering partner of q126's equi-WIDTH histogram — NTILE gives every
# bucket the same row count and the bucket edges become the feature map.
# ---------------------------------------------------------------------------

Q153_BUCKETS = 10

Q153_SQL = f"""
WITH b AS (
  SELECT event_type, value,
         CAST(NTILE({Q153_BUCKETS}) OVER (
           PARTITION BY event_type ORDER BY value, event_id
         ) AS BIGINT) AS bucket
  FROM events
)
SELECT event_type, bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(value) AS lo,
       MAX(value) AS hi
FROM b
GROUP BY event_type, bucket
ORDER BY event_type, bucket
"""


@register("q153_equidepth_bins", Q153_SQL)
def q153_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency value bins per event type: NTILE over a PINNED
    total order ((value, event_id) — both engines then place the n % k
    remainder rows identically), rolled up to per-bucket count and
    [lo, hi] edges. The discretization table a feature pipeline joins
    back against raw values.

    Scale: one type-keyed exchange for the rank window, map-side-combined
    rollup on the same partitioning. Exact equi-depth needs the per-group
    sort (the q124/q152 honesty note); q126's equi-width face is the
    sort-free alternative when edges may be fixed a priori.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        e.withColumn("bucket", F.ntile(Q153_BUCKETS).over(w).cast("long"))
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .orderBy("event_type", "bucket")
    )


# ---------------------------------------------------------------------------
# q154 — point-in-time (temporal) join against the SCD2 history: "what
# state was the user in WHEN they purchased" — the dimension-lookup-at-
# event-time query every warehouse with Type-2 dimensions runs; q122
# builds the history, this face consumes it.
# ---------------------------------------------------------------------------

Q154_SQL = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events WHERE event_type <> 'purchase'
),
hist AS (
  SELECT user_id, event_type, ts AS effective_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS effective_to
  FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
),
probes AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
),
joined AS (
  SELECT COALESCE(h.event_type, 'none') AS state_at_purchase, p.user_id, p.value
  FROM probes p
  LEFT JOIN hist h
    ON p.user_id = h.user_id
   AND p.ts >= h.effective_from
   AND (h.effective_to IS NULL OR p.ts < h.effective_to)
)
SELECT state_at_purchase,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM joined
GROUP BY state_at_purchase
ORDER BY state_at_purchase
"""


@register("q154_scd2_asof_join", Q154_SQL)
def q154_scd2_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase event joined to the SCD2 state (q122's intervals
    over the NON-purchase events) valid at purchase time; purchases
    before any state row report 'none'. Intervals are half-open
    [from, to) and per-user disjoint, so every probe matches at most
    one history row — deterministically, including probes landing
    exactly on a state change.

    Scale: the interval predicate rides an EQUI join on user_id — the
    per-user history is change-count-sized, so the range residual scans
    a handful of rows per probe (the q127 binning escape applies if a
    key's history ever grows pathological); one user-keyed exchange
    each side, shared with q122's window partitioning upstream.
    """
    e = load_table(spark, sf_dir, "events")
    hist = scd2_intervals(e.filter(F.col("event_type") != "purchase")).select(
        F.col("user_id").alias("h_user"),
        F.col("event_type").alias("state"),
        "effective_from",
        "effective_to",
    )
    probes = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    j = probes.join(
        hist,
        (F.col("user_id") == F.col("h_user"))
        & (F.col("ts") >= F.col("effective_from"))
        & (
            F.col("effective_to").isNull()
            | (F.col("ts") < F.col("effective_to"))
        ),
        "left",
    )
    return (
        j.select(
            F.coalesce(F.col("state"), F.lit("none")).alias(
                "state_at_purchase"
            ),
            "user_id",
            "value",
        )
        .groupBy("state_at_purchase")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("state_at_purchase")
    )


# --- q159: cross-table referential-integrity audit (FK/PK/domain) -----------
# The multi-table companion to q112's one-scan report: every check here
# needs a JOIN (foreign keys, orphans) or a table-level uniqueness count.

Q159_SQL = """
SELECT 'orders_fk_customer' AS constraint_name,
       CAST((SELECT COUNT(*) FROM orders o LEFT JOIN customer c
             ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) AS BIGINT)
         AS n_violations,
       (SELECT COUNT(*) FROM orders) AS n_checked
UNION ALL
SELECT 'lineitem_fk_orders',
       CAST((SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
             ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) AS BIGINT),
       (SELECT COUNT(*) FROM lineitem)
UNION ALL
SELECT 'lineitem_fk_part',
       CAST((SELECT COUNT(*) FROM lineitem l LEFT JOIN part p
             ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL) AS BIGINT),
       (SELECT COUNT(*) FROM lineitem)
UNION ALL
SELECT 'orders_pk_unique',
       CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders) AS BIGINT),
       (SELECT COUNT(*) FROM orders)
UNION ALL
SELECT 'lineitem_pk_unique',
       CAST((SELECT COUNT(*) - COUNT(DISTINCT l_orderkey * 8 + l_linenumber)
             FROM lineitem) AS BIGINT),
       (SELECT COUNT(*) FROM lineitem)
UNION ALL
SELECT 'customer_acctbal_nonneg',
       CAST((SELECT COUNT(*) FROM customer WHERE c_acctbal < 0) AS BIGINT),
       (SELECT COUNT(*) FROM customer)
UNION ALL
SELECT 'supplier_acctbal_nonneg',
       CAST((SELECT COUNT(*) FROM supplier WHERE s_acctbal < 0) AS BIGINT),
       (SELECT COUNT(*) FROM supplier)
UNION ALL
SELECT 'part_referenced',
       CAST((SELECT COUNT(*) FROM part p LEFT JOIN
             (SELECT DISTINCT l_partkey FROM lineitem) l
             ON p.p_partkey = l.l_partkey WHERE l.l_partkey IS NULL) AS BIGINT),
       (SELECT COUNT(*) FROM part)
UNION ALL
SELECT 'lineitem_ship_after_order',
       CAST((SELECT COUNT(*) FROM lineitem l JOIN orders o
             ON l.l_orderkey = o.o_orderkey
             WHERE l.l_shipdate < o.o_orderdate) AS BIGINT),
       (SELECT COUNT(*) FROM lineitem l JOIN orders o
        ON l.l_orderkey = o.o_orderkey)
UNION ALL
SELECT 'orders_status_domain',
       CAST((SELECT COUNT(*) FROM orders
             WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT),
       (SELECT COUNT(*) FROM orders)
"""


def _one_row_check(name: str, viol: DataFrame) -> DataFrame:
    """Tag a (n_violations, n_checked) single-row aggregate with its name."""
    return viol.select(
        F.lit(name).alias("constraint_name"), "n_violations", "n_checked"
    )


def _fk_violations(fact: DataFrame, fkey: str, dim: DataFrame, dkey: str) -> DataFrame:
    """Orphan count via ONE left join: n_checked and n_violations from the
    same pass (the dim key is unique, so the join never fans out)."""
    d = dim.select(F.col(dkey).alias(fkey)).withColumn("__hit", F.lit(1))
    return (
        fact.select(fkey)
        .join(d, fkey, "left")
        .agg(
            F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_violations"),
            F.count(F.lit(1)).alias("n_checked"),
        )
    )


@register("q159_ref_integrity_audit", Q159_SQL)
def q159_ref_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table constraint audit: foreign keys (orphan fact rows),
    primary-key uniqueness, reverse coverage (parts never ordered),
    date ordering and enum domains — the expectations gate a warehouse
    runs after every load (q112 covers the single-scan checks; these are
    the ones that need joins).

    Every check is integer counts, so the whole report is hash-exact.
    Scale: each FK check is one shuffle (or broadcast, Catalyst's call)
    left join producing a 1-row aggregate; the checks are independent
    single-pass jobs unioned at the end — at 100 TB you run them as one
    action and Spark schedules the scans in parallel; nothing wide ever
    reaches the driver.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    checks = [
        _one_row_check(
            "orders_fk_customer", _fk_violations(o, "o_custkey", c, "c_custkey")
        ),
        _one_row_check(
            "lineitem_fk_orders", _fk_violations(li, "l_orderkey", o, "o_orderkey")
        ),
        _one_row_check(
            "lineitem_fk_part", _fk_violations(li, "l_partkey", p, "p_partkey")
        ),
        _one_row_check(
            "orders_pk_unique",
            o.agg(
                (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias(
                    "n_violations"
                ),
                F.count(F.lit(1)).alias("n_checked"),
            ),
        ),
        _one_row_check(
            "lineitem_pk_unique",
            # (orderkey, linenumber) packed into one BIGINT (linenumber <= 7)
            # so COUNT(DISTINCT) is single-column in both engines.
            li.agg(
                (
                    F.count(F.lit(1))
                    - F.countDistinct(
                        F.col("l_orderkey") * 8 + F.col("l_linenumber")
                    )
                ).alias("n_violations"),
                F.count(F.lit(1)).alias("n_checked"),
            ),
        ),
        _one_row_check(
            "customer_acctbal_nonneg",
            c.agg(
                F.sum(F.when(F.col("c_acctbal") < 0, 1).otherwise(0))
                .cast("long")
                .alias("n_violations"),
                F.count(F.lit(1)).alias("n_checked"),
            ),
        ),
        _one_row_check(
            "supplier_acctbal_nonneg",
            s.agg(
                F.sum(F.when(F.col("s_acctbal") < 0, 1).otherwise(0))
                .cast("long")
                .alias("n_violations"),
                F.count(F.lit(1)).alias("n_checked"),
            ),
        ),
        _one_row_check(
            "part_referenced",
            _fk_violations(
                p, "p_partkey", li.select("l_partkey").distinct(), "l_partkey"
            ),
        ),
        _one_row_check(
            "lineitem_ship_after_order",
            # Cross-table temporal constraint: a lineitem cannot ship
            # before its order was placed. Inner join (FK orphans are
            # counted by their own check), single pass for both counts.
            li.select("l_orderkey", "l_shipdate")
            .join(o.select("o_orderkey", "o_orderdate"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .agg(
                F.sum(
                    F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)
                )
                .cast("long")
                .alias("n_violations"),
                F.count(F.lit(1)).alias("n_checked"),
            ),
        ),
        _one_row_check(
            "orders_status_domain",
            o.agg(
                F.sum(
                    F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
                )
                .cast("long")
                .alias("n_violations"),
                F.count(F.lit(1)).alias("n_checked"),
            ),
        ),
    ]
    out = checks[0]
    for ch in checks[1:]:
        out = out.union(ch)
    return out


# --- q160: conversion funnel (ordered step progression per user) ------------

Q160_SQL = """
WITH t1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t1
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t2
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM t1) AS n_view,
       (SELECT COUNT(*) FROM t2) AS n_view_click,
       (SELECT COUNT(*) FROM t3) AS n_view_click_purchase
"""


@register("q160_funnel", Q160_SQL)
def q160_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view→click→purchase: users whose FIRST
    view precedes a click that precedes a purchase (strict timestamp
    order, the min-chain formulation). Counts are integers over fixed
    data — hash-exact.

    Scale: each step scans only its event type (the event_type equality
    reaches the parquet scan as a pushed filter), aggregates to a
    user-sized relation, and joins user-to-user — per-step cost is one
    filtered scan + one user-keyed shuffle; a celebrity user with
    millions of events costs MIN-aggregation, not a collect_list buffer
    (why this beats the per-user sorted-array fold at 100 TB). The final
    three 1-row aggregates cross-join driver-free.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        t1.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(t2.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(t3.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


# --- q161: multi-touch marketing attribution (first/last/linear) ------------
# The revenue-assignment layer on top of q160's funnel: every purchase's
# value is credited to the marketing touches (views/clicks) that preceded
# it inside the attribution window, under the three standard models.

#: Attribution lookback: touches strictly before the purchase and at most
#: this many days earlier share its credit.
ATTR_WINDOW_DAYS = 7

Q161_SQL = f"""
WITH p AS (
  SELECT user_id, ts AS p_ts, event_id AS p_id,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, ts AS t_ts, event_id AS t_id, event_type AS channel0
  FROM events WHERE event_type IN ('view', 'click')
),
j AS (
  SELECT p.p_id, p.cents, t.channel0, t.t_ts, t.t_id
  FROM p LEFT JOIN t
    ON p.user_id = t.user_id AND t.t_ts < p.p_ts
   AND t.t_ts >= p.p_ts - INTERVAL {ATTR_WINDOW_DAYS} DAY
),
r AS (
  SELECT p_id, cents, channel0,
         ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY t_ts, t_id) AS rn,
         COUNT(*) OVER (PARTITION BY p_id) AS n
  FROM j
)
SELECT COALESCE(channel0, 'unattributed') AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN rn = 1 THEN cents ELSE 0 END) AS BIGINT)
         AS first_touch_cents,
       CAST(SUM(CASE WHEN rn = n THEN cents ELSE 0 END) AS BIGINT)
         AS last_touch_cents,
       CAST(SUM(cents // n
                + CASE WHEN rn = n THEN cents % n ELSE 0 END) AS BIGINT)
         AS linear_cents
FROM r
GROUP BY COALESCE(channel0, 'unattributed')
ORDER BY channel
"""


@register("q161_attribution", Q161_SQL)
def q161_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution of purchase revenue to preceding marketing
    touches (views/clicks within ATTR_WINDOW_DAYS), per channel, under
    first-touch, last-touch and linear models simultaneously.

    Money discipline: purchase value becomes integer CENTS up front (the
    q126 ROUND(value*100) idiom), and the linear split is integer
    division with the remainder credited to the LAST touch — every model
    conserves total cents exactly (pytest-pinned) and the whole report
    is integer sums, hash-exact cross-engine. A purchase with no touch
    in the window self-credits under 'unattributed' (n=1, rn=1), so
    nothing is silently dropped.

    Scale: the touch↔purchase pairing is an interval predicate riding
    the user_id EQUI join (the q154 shape) — fan-out is bounded by
    touches-per-user-week, ~1.1× the events table here; the two window
    functions partition by purchase id (millions of small groups, never
    a user-wide or global sort); everything after is one keyed
    aggregation to channel cardinality.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    touch = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("channel0"),
    )
    j = purch.join(
        touch,
        [
            purch.user_id == touch.user_id,
            F.col("t_ts") < F.col("p_ts"),
            F.col("t_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {ATTR_WINDOW_DAYS} DAYS"),
        ],
        "left",
    ).select("p_id", "cents", "channel0", "t_ts", "t_id")
    per_purchase = Window.partitionBy("p_id")
    r = j.select(
        "p_id",
        "cents",
        "channel0",
        F.row_number()
        .over(per_purchase.orderBy("t_ts", "t_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(per_purchase).alias("n"),
    )
    return (
        r.groupBy(
            F.coalesce(F.col("channel0"), F.lit("unattributed")).alias("channel")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.when(F.col("rn") == 1, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("first_touch_cents"),
            F.sum(F.when(F.col("rn") == F.col("n"), F.col("cents")).otherwise(0))
            .cast("long")
            .alias("last_touch_cents"),
            F.sum(
                F.expr("cents DIV n")
                + F.when(F.col("rn") == F.col("n"), F.expr("cents % n")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("linear_cents"),
        )
        .orderBy("channel")
    )


# --- q164: per-group OLS revenue trend (fixed-point closed form) ------------

#: Fixed-point scale for the slope/intercept outputs (micro-cents).
OLS_SCALE = 1_000_000

Q164_SQL = f"""
WITH base AS (
  SELECT p.p_brand AS brand,
         CAST(datediff('day', DATE '1992-01-01', CAST(l.l_shipdate AS DATE))
              AS HUGEINT) AS x,
         CAST(ROUND(l.l_extendedprice * 100) AS HUGEINT) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
agg AS (
  SELECT brand, CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sx2
  FROM base GROUP BY brand
),
fit AS (
  SELECT brand, n,
         n * sxy - sx * sy AS num,
         n * sx2 - sx * sx AS den,
         sy * sx2 - sx * sxy AS inum
  FROM agg
)
SELECT brand,
       CAST(n AS BIGINT) AS n_items,
       CAST(CASE WHEN den = 0 THEN NULL
                 WHEN num < 0 THEN -((-num * {OLS_SCALE}) // den)
                 ELSE (num * {OLS_SCALE}) // den END AS BIGINT)
         AS slope_microcents_per_day,
       CAST(CASE WHEN den = 0 THEN NULL
                 WHEN inum < 0 THEN -((-inum * {OLS_SCALE}) // den)
                 ELSE (inum * {OLS_SCALE}) // den END AS BIGINT)
         AS intercept_microcents
FROM fit
ORDER BY brand
"""


@register("q164_trend_ols", Q164_SQL)
def q164_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand least-squares revenue trend: slope and intercept of
    cents-per-day over ship-date day index, in closed form from five
    exact integer aggregates (n, Σx, Σy, Σxy, Σx²) — the grouped
    regression primitive behind trend dashboards and drift monitors.

    Numeric discipline: everything up to the final outputs is exact
    integer/decimal arithmetic (the q144 fixed-point approach) — no
    double ever enters, so no FMA-contraction or cast-rounding surface
    exists. slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) and intercept =
    (ΣyΣx²−ΣxΣxy)/same are emitted as truncated fixed-point BIGINTs
    (micro-cents), with the sign split out so Spark's DIV and DuckDB's
    ``//`` agree on negative numerators (trunc vs floor). Overflow
    envelope: Spark DECIMAL(38,0) vs DuckDB HUGEINT ≈ 1.7e38 — the
    widest value is not n·Σxy (~1e33 at SF1000) but the final
    ``num * OLS_SCALE`` fixed-point step, which adds 6 more digits
    (~1e39 at SF1000, PAST the envelope). Past ~SF100, pre-scale x to
    weeks BEFORE aggregating (÷7 shrinks Σxy/Σx² by ~1–2 digits each,
    the BM25 envelope pattern). The failure mode is asymmetric and
    silent: non-ANSI Spark decimals NULL on overflow while DuckDB
    HUGEINT raises — an overflow shows up as a hash mismatch / oracle
    error, never a silently-agreeing wrong answer, but the Spark-only
    NULL would be silent in production; keep inside the envelope.

    Scale: one broadcastable dim join + one map-side-combined groupBy to
    brand cardinality; the regression math happens on the 25-row
    aggregate — this is a full-scan-cheap operator at any corpus size.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.datediff(F.col("l_shipdate").cast("date"), F.lit("1992-01-01"))
        .cast("decimal(18,0)")
        .alias("x"),
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .cast("decimal(18,0)")
        .alias("y"),
    )
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("brand")
    )
    agg = (
        li.join(F.broadcast(p), "l_partkey")
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).cast("decimal(20,0)").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sx2"),
        )
    )
    fit = agg.select(
        "brand",
        "n",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("num"),
        (F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")).alias("den"),
        (F.col("sy") * F.col("sx2") - F.col("sx") * F.col("sxy")).alias("inum"),
    )
    div = (
        "CAST(CASE WHEN den = 0 THEN NULL "
        f"WHEN {{v}} < 0 THEN -((-{{v}} * {OLS_SCALE}) DIV den) "
        f"ELSE ({{v}} * {OLS_SCALE}) DIV den END AS BIGINT)"
    )
    return fit.selectExpr(
        "brand",
        "CAST(n AS BIGINT) AS n_items",
        div.format(v="num") + " AS slope_microcents_per_day",
        div.format(v="inum") + " AS intercept_microcents",
    ).orderBy("brand")


# --- q165: sessionization — explicit session-id assignment ------------------

#: Inactivity gap that closes a session.
SESSION_GAP_MIN = 30

Q165_SQL = f"""
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
               OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL {SESSION_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS is_start
  FROM events
),
s AS (
  SELECT user_id, ts, event_type,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
),
sess AS (
  SELECT user_id, sid,
         COUNT(*) AS n_ev,
         MIN(ts) AS t0, MAX(ts) AS t1,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_p
  FROM s GROUP BY user_id, sid
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_ev) AS BIGINT) AS n_events,
       CAST(SUM(has_p) AS BIGINT) AS purchase_sessions,
       CAST(MAX(datediff('microsecond', t0, t1)) AS BIGINT)
         AS max_session_micros
FROM sess
GROUP BY user_id
ORDER BY user_id
"""


@register("q165_sessionize", Q165_SQL)
def q165_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit session-id assignment by inactivity gap (>30 min) — the
    lag/cumulative-sum sessionization idiom, the OTHER half of the
    session story next to q22's merging-state ``session_window``: this
    one hands every event a durable (user_id, sid) key downstream joins
    can use, which the window-struct API doesn't expose.

    All outputs are exact integers; session duration is the
    ntz-safe MICROSECOND epoch difference (the zorder.py idiom —
    second-granularity datediff counts boundary crossings differently
    across engines, microseconds are exact for micro-timestamps).

    Scale: both window functions ride ONE user-keyed sort (same
    partition spec → one shuffle + one sort, never global); per-user
    partitions are event-count bounded. A celebrity user serializes one
    partition's sort — at that point switch the assignment to
    ``session_window`` aggregation (q22) or pre-split by day.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_start = (
        F.when(
            prev.isNull()
            | (
                F.expr("timestampdiff(MICROSECOND, __prev_ts, ts)")
                > F.lit(SESSION_GAP_MIN * 60 * 1_000_000)
            ),
            1,
        )
        .otherwise(0)
    )
    o = ev.withColumn("__prev_ts", prev).withColumn("is_start", is_start)
    s = o.withColumn(
        "sid",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sess = s.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_ev"),
        F.min("ts").alias("t0"),
        F.max("ts").alias("t1"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "has_p"
        ),
    )
    return (
        sess.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("n_ev").cast("long").alias("n_events"),
            F.sum("has_p").cast("long").alias("purchase_sessions"),
            F.max(F.expr("timestampdiff(MICROSECOND, t0, t1)"))
            .cast("long")
            .alias("max_session_micros"),
        )
        .orderBy("user_id")
    )


# --- q170: single-pass column profiling (the ingest "describe") -------------

PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def _gen_profile_sql() -> str:
    aggs = ["CAST(COUNT(*) AS BIGINT) AS n_rows"]
    for c in PROFILE_COLS:
        aggs.append(f"CAST(COUNT({c}) AS BIGINT) AS nn_{c}")
        aggs.append(f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS nd_{c}")
    rows = "\nUNION ALL ".join(
        f"SELECT '{c}' AS col_name, n_rows, n_rows - nn_{c} AS n_nulls, "
        f"nd_{c} AS n_distinct FROM a"
        for c in PROFILE_COLS
    )
    return f"""
WITH a AS (SELECT {', '.join(aggs)} FROM orders)
{rows}
ORDER BY col_name
"""


@register("q170_column_profile", _gen_profile_sql())
def q170_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile of the orders table — row count,
    null count, exact distinct count for every column, in ONE scan (the
    ingest-time "describe" a pipeline lands next to each batch; feeds
    schema-drift alerts and join-key cardinality sanity checks).

    Scale: Spark compiles the multi-column COUNT(DISTINCT) into a single
    Expand pass (one scan, ncols x rows expanded map-side, one shuffle);
    the 1-row wide aggregate then unpivots to one row per column with
    ``stack`` — no per-column re-scan. All-integer outputs, hash-exact.
    At 100 TB you would swap exact distincts for HLL sketches (q51/q53,
    mergeable across batches); the exact face is the oracle-able one.
    """
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in PROFILE_COLS:
        aggs.append(F.count(c).cast("long").alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).cast("long").alias(f"nd_{c}"))
    one = o.agg(*aggs)
    stack = ", ".join(
        f"'{c}', n_rows - nn_{c}, nd_{c}" for c in PROFILE_COLS
    )
    return (
        one.selectExpr(
            "n_rows",
            f"stack({len(PROFILE_COLS)}, {stack}) AS "
            "(col_name, n_nulls, n_distinct)",
        )
        .select(
            "col_name",
            "n_rows",
            F.col("n_nulls").cast("long").alias("n_nulls"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
        )
        .orderBy("col_name")
    )


# --- q172: top session paths (product-analytics path mining) ----------------

PATH_MAX = 5  # events per session contributing to the path key
PATH_TOP = 20

Q172_SQL = f"""
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
               OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL {SESSION_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS is_start
  FROM events
),
s AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
),
numbered AS (
  SELECT user_id, sid, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, sid
                            ORDER BY ts, event_id) AS rn
  FROM s
),
paths AS (
  SELECT user_id, sid,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM numbered WHERE rn <= {PATH_MAX}
  GROUP BY user_id, sid
)
SELECT path, n_sessions, rank FROM (
  SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions,
         CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, path) AS BIGINT)
           AS rank
  FROM paths GROUP BY path
) WHERE rank <= {PATH_TOP}
"""


@register("q172_top_paths", Q172_SQL)
def q172_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PATH_TOP most common session paths — each session's first
    PATH_MAX event types in order, '>-joined — the path-mining readout
    behind funnel discovery (q160 verifies a KNOWN funnel; this finds
    the candidates).

    Scale shape: sessionization is q165's lag/cumsum idiom (per-user
    window, event-bounded partitions); events are numbered WITHIN their
    session (running max of the session-start sequence — stays on the
    user_id exchange, unlike a (user_id, sid)-partitioned row_number)
    and rows past PATH_MAX are FILTERED before the collect, so per-group
    aggregation state holds at most PATH_MAX structs no matter how long
    a bot session runs (a post-hoc slice would still buffer the whole
    session — the collect_list shape q165's notes warn against); the
    final top-k is orderBy+limit (TakeOrdered) with rank stamped on the
    k rows — never a full-relation rank window."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_start = F.when(
        prev.isNull()
        | (
            F.expr("timestampdiff(MICROSECOND, __prev_ts, ts)")
            > F.lit(SESSION_GAP_MIN * 60 * 1_000_000)
        ),
        1,
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    s = (
        ev.withColumn("__prev_ts", prev)
        .withColumn("is_start", is_start)
        .withColumn("sid", F.sum("is_start").over(run))
        .withColumn("seq", F.row_number().over(w))
        .withColumn(
            "rn",
            F.col("seq")
            - F.max(
                F.when(F.col("is_start") == 1, F.col("seq"))
            ).over(run)
            + F.lit(1),
        )
        .filter(F.col("rn") <= PATH_MAX)
    )
    paths = s.groupBy("user_id", "sid").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    top = (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(PATH_TOP)
    )
    rank_w = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return top.withColumn(
        "rank", F.row_number().over(rank_w).cast("long")
    )


# --- q177: rolling correlation (windowed co-movement monitor) ---------------

#: Trailing window width in OBSERVED days (ROWS frame, not RANGE: gaps
#: in the calendar contribute nothing on either engine, so the frame is
#: "last 7 days with any orders" — deterministic regardless of
#: sparsity at small SF).
ROLL_DAYS = 7

Q177_SQL = f"""
WITH daily AS (
  SELECT o_orderpriority AS prio,
         CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders
  GROUP BY o_orderpriority,
           datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
),
rolled AS (
  SELECT prio, day,
         CAST(COUNT(*) OVER w AS HUGEINT) AS n,
         CAST(SUM(x) OVER w AS HUGEINT) AS sx,
         CAST(SUM(y) OVER w AS HUGEINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * x) OVER w AS HUGEINT) AS sxx,
         CAST(SUM(CAST(y AS HUGEINT) * y) OVER w AS HUGEINT) AS syy,
         CAST(SUM(CAST(x AS HUGEINT) * y) OVER w AS HUGEINT) AS sxy
  FROM daily
  WINDOW w AS (PARTITION BY prio ORDER BY day
               ROWS BETWEEN {ROLL_DAYS - 1} PRECEDING AND CURRENT ROW)
)
SELECT prio, CAST(day AS BIGINT) AS day, CAST(n AS BIGINT) AS n_days,
       CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
            ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                 / sqrt(CAST(n * syy - sy * sy AS DOUBLE)) END AS corr
FROM rolled
ORDER BY prio, day
"""


@register("q177_rolling_corr", Q177_SQL)
def q177_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-ROLL_DAYS Pearson correlation between daily order count
    and daily revenue-cents, per order priority — the co-movement
    monitor behind demand-shift alerts (a correlation break says volume
    and value decoupled).

    Numeric discipline: every moment (n, Σx, Σy, Σx², Σy², Σxy) is an
    exact integer — cents via the q164 ROUND(×100) idiom, squares
    widened to DECIMAL(38,0)/HUGEINT BEFORE multiplying (Σy² overflows
    BIGINT already at sf1) — and the correlation is the ONLY double:
    num/sqrt(dx)/sqrt(dy) where each operand is an exactly-represented
    cast of the same integer on both engines, and /, sqrt are
    correctly-rounded IEEE ops. No a*b−c*d double shape exists (the
    differences are computed in exact decimal). Overflow envelope:
    n·Σy² ~ 7·(SF·1e10)²·1e-? — at SF1000, daily cents ~1e13, Σy²(7d)
    ~7e26, n·Σy² ~5e27, inside DECIMAL(38,0)/HUGEINT.

    Scale: the daily rollup is a keyed map-side-combined aggregate; the
    rolling window partitions by priority over DAY-cardinality rows
    (bounded: days × priorities, ~12k rows at any SF) — the window
    input is the aggregate, never the fact table."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01"))
        .cast("long")
        .alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    daily = o.groupBy("prio", "day").agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        F.sum("cents").cast("long").alias("y"),
    )
    w = (
        Window.partitionBy("prio")
        .orderBy("day")
        .rowsBetween(-(ROLL_DAYS - 1), 0)
    )
    dec = "decimal(38,0)"
    rolled = daily.select(
        "prio",
        "day",
        F.count(F.lit(1)).over(w).cast(dec).alias("n"),
        F.sum("x").over(w).cast(dec).alias("sx"),
        F.sum("y").over(w).cast(dec).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).over(w).cast(dec).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).over(w).cast(dec).alias("syy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).over(w).cast(dec).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return rolled.select(
        "prio",
        F.col("day").cast("long").alias("day"),
        F.col("n").cast("long").alias("n_days"),
        F.when((dx == 0) | (dy == 0), F.lit(None).cast("double"))
        .otherwise(
            num.cast("double")
            / F.sqrt(dx.cast("double"))
            / F.sqrt(dy.cast("double"))
        )
        .alias("corr"),
    ).orderBy("prio", "day")


# --- q181: winsorized robust statistics -------------------------------------

#: Winsorization tail mass: clamp below the p05 and above the p95 exact
#: order statistics (k = ceil(p·n) computed in integer arithmetic).

Q181_SQL = """
WITH r AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value NULLS LAST, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
cuts AS (
  SELECT event_type,
         MAX(CASE WHEN rn = (n + 19) // 20 THEN value END) AS lo_cut,
         MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN value END) AS hi_cut
  FROM r GROUP BY event_type
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       MAX(c.lo_cut) AS lo_cut,
       MAX(c.hi_cut) AS hi_cut,
       CAST(SUM(CAST(LEAST(GREATEST(e.value, c.lo_cut), c.hi_cut)
                     AS DECIMAL(18,6))) AS DOUBLE) AS wsum,
       CAST(SUM(CAST(LEAST(GREATEST(e.value, c.lo_cut), c.hi_cut)
                     AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS wmean
FROM events e JOIN cuts c ON e.event_type = c.event_type
GROUP BY e.event_type
ORDER BY e.event_type
"""


@register("q181_winsorized_stats", Q181_SQL)
def q181_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per event type: clamp values below the exact p05
    / above the exact p95 order statistic, then average — the robust
    location estimate quality pipelines use when trimming (dropping
    outliers, q152's 3-MAD route) would bias counts.

    Exactness: cut points are ORDER STATISTICS (value at integer rank
    ceil(p·n), rank arithmetic in integers — no interpolation, no float
    ceil), so both engines pick identical data values; the clamp is
    LEAST/GREATEST on identical doubles; the mean is the decimal-exact
    sum (the q20 DECIMAL(18,6) idiom) cast once to double and divided
    by an integer — every double op has bit-identical inputs.

    Scale: one type-keyed exchange carries BOTH window functions (rank
    + group count share the partitioning), cut points are a bounded
    per-type relation broadcast back, and the final aggregate is
    map-side-combined on the same key. The per-type sort is the honest
    cost of exact order statistics (q152/q153's note); q52's
    approx_percentile is the sketch path at 100 TB."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    # asc_nulls_last pins the rank's null placement to the oracle's
    # NULLS LAST — Spark ASC defaults to NULLS FIRST, DuckDB to NULLS
    # LAST, so a NULL value would silently shift every cut point
    # cross-engine otherwise.
    wr = Window.partitionBy("event_type").orderBy(
        F.asc_nulls_last("value"), "event_id"
    )
    wn = Window.partitionBy("event_type")
    r = e.select(
        "event_type",
        "value",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    cuts = r.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rn") == F.expr("(n + 19) DIV 20"), F.col("value")
            )
        ).alias("lo_cut"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(19 * n + 19) DIV 20"), F.col("value")
            )
        ).alias("hi_cut"),
    )
    clamped = e.join(F.broadcast(cuts), "event_type").select(
        "event_type",
        F.least(F.greatest(F.col("value"), F.col("lo_cut")), F.col("hi_cut"))
        .alias("wv"),
        "lo_cut",
        "hi_cut",
    )
    return (
        clamped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.max("lo_cut").alias("lo_cut"),
            F.max("hi_cut").alias("hi_cut"),
            F.sum(F.col("wv").cast("decimal(18,6)"))
            .cast("double")
            .alias("wsum"),
        )
        .select(
            "event_type",
            "n",
            "lo_cut",
            "hi_cut",
            "wsum",
            (F.col("wsum") / F.col("n")).alias("wmean"),
        )
        .orderBy("event_type")
    )


# --- q185: CUSUM changepoint detection ---------------------------------------

# Single level-shift localization per series (Page 1954's CUSUM statistic,
# Hinkley 1970's changepoint estimator): over the centered prefix sums
# S_t = prefix_t − t·mean, the changepoint estimate is argmax |S_t|. Scaled
# by n to stay integer: D_t = n·prefix_t − t·total (same argmax — positive
# constant factor), so the whole statistic is exact arithmetic and only
# the reported segment means are (exactly-derived) doubles.


Q185_SQL = """
WITH daily AS (
  SELECT o_orderpriority AS prio,
         DATEDIFF('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
           AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1, 2
),
curve AS (
  SELECT prio, day, cents,
         ROW_NUMBER() OVER (PARTITION BY prio ORDER BY day) AS t,
         SUM(cents)   OVER (PARTITION BY prio ORDER BY day) AS pre,
         COUNT(*)     OVER (PARTITION BY prio) AS n,
         SUM(cents)   OVER (PARTITION BY prio) AS total
  FROM daily
),
scored AS (
  SELECT prio, day, t, n, pre, total,
         ABS(CAST(n AS HUGEINT) * pre - CAST(t AS HUGEINT) * total)
           AS d_abs,
         ROW_NUMBER() OVER (
           PARTITION BY prio
           ORDER BY ABS(CAST(n AS HUGEINT) * pre
                        - CAST(t AS HUGEINT) * total) DESC, day
         ) AS pick
  FROM curve WHERE t < n
)
SELECT prio,
       CAST(day AS BIGINT) AS cp_day,
       CAST(t AS BIGINT) AS t,
       CAST(n AS BIGINT) AS n_days,
       CAST(d_abs AS BIGINT) AS cusum_abs,
       CAST(pre AS BIGINT) AS before_cents,
       CAST(total - pre AS BIGINT) AS after_cents,
       CAST(pre AS DOUBLE) / t AS mean_before,
       CAST(total - pre AS DOUBLE) / (n - t) AS mean_after
FROM scored WHERE pick = 1
ORDER BY prio
"""


@register("q185_cusum_changepoint", Q185_SQL)
def q185_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The day each priority's daily revenue LEVEL most plausibly
    shifted: argmax_t |n·prefix_t − t·total| over the daily-cents
    series — the CUSUM changepoint estimator (Page 1954; Hinkley 1970),
    the alerting primitive behind "did the mixture change and when"
    monitors (q108's drift face asks IF two snapshots differ; this one
    localizes WHEN a single series broke). Ties break to the earliest
    day; t ranges over proper splits (t < n).

    Exactness: D_t = n·prefix_t − t·total is computed entirely in
    DECIMAL(38,0)/HUGEINT (cents via the q164 ROUND(×100) idiom) —
    no float enters the argmax; the reported segment means are single
    IEEE divides of exactly-cast integers. Envelope: n·prefix ≤
    n·total ~ 2.4e3·2.4e16 ≈ 6e19 at SF1000 — past BIGINT, inside
    DECIMAL(38,0); the BIGINT output cast documents the same bound.

    Scale: the fact scan collapses to a (prio, day) map-side-combined
    rollup; every window — prefix, totals, argmax — partitions by prio
    over the DAY-cardinality rollup (bounded: days × priorities, the
    q177 shape; never the fact table), so one keyed exchange carries
    all of them and no single-partition window exists."""
    dec = "decimal(38,0)"
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01"))
        .cast("long")
        .alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    daily = o.groupBy("prio", "day").agg(F.sum("cents").alias("cents"))
    w_ord = Window.partitionBy("prio").orderBy("day")
    w_all = Window.partitionBy("prio")
    curve = daily.select(
        "prio",
        "day",
        F.row_number().over(w_ord).cast("long").alias("t"),
        F.sum("cents").over(w_ord).cast(dec).alias("pre"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
        F.sum("cents").over(w_all).cast(dec).alias("total"),
    ).filter(F.col("t") < F.col("n"))
    d_abs = F.abs(
        F.col("n").cast(dec) * F.col("pre") - F.col("t").cast(dec) * F.col("total")
    )
    w_pick = Window.partitionBy("prio").orderBy(
        F.abs(
            F.col("n").cast(dec) * F.col("pre")
            - F.col("t").cast(dec) * F.col("total")
        ).desc(),
        F.asc("day"),
    )
    scored = curve.select(
        "prio",
        "day",
        "t",
        "n",
        "pre",
        "total",
        d_abs.alias("d_abs"),
        F.row_number().over(w_pick).alias("pick"),
    )
    return (
        scored.filter(F.col("pick") == 1)
        .select(
            "prio",
            F.col("day").cast("bigint").alias("cp_day"),
            F.col("t").cast("bigint").alias("t"),
            F.col("n").cast("bigint").alias("n_days"),
            F.col("d_abs").cast("bigint").alias("cusum_abs"),
            F.col("pre").cast("bigint").alias("before_cents"),
            (F.col("total") - F.col("pre")).cast("bigint").alias("after_cents"),
            (F.col("pre").cast("double") / F.col("t")).alias("mean_before"),
            (
                (F.col("total") - F.col("pre")).cast("double")
                / (F.col("n") - F.col("t"))
            ).alias("mean_after"),
        )
        .orderBy("prio")
    )


# --- q191: ordered-pair funnel discovery -------------------------------------

# q160 VERIFIES a known funnel; q172 mines CONTIGUOUS prefixes. This face
# finds funnel EDGES: for every ordered event-type pair (a, b), in how
# many sessions does some a-event precede some b-event (existential —
# first(a) < last(b) over within-session positions), next to the number
# of sessions containing both types in any order. fwd_ppm near 1e6 says
# a→b is a real ordering (a funnel edge); near 500000 says mere
# co-occurrence. The pair relation is bounded by |event types|², so the
# face reports ALL pairs — no top-k cut to hide an edge.

Q191_SQL = f"""
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
               OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL {SESSION_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS is_start
  FROM events
),
s AS (
  SELECT user_id, event_type, ts, event_id,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS seq
  FROM o
),
p AS (
  SELECT user_id, sid, event_type,
         MIN(seq) AS first_pos, MAX(seq) AS last_pos
  FROM s GROUP BY user_id, sid, event_type
)
SELECT a.event_type AS a,
       b.event_type AS b,
       CAST(SUM(CASE WHEN a.first_pos < b.last_pos THEN 1 ELSE 0 END)
            AS BIGINT) AS n_fwd,
       CAST(COUNT(*) AS BIGINT) AS n_co,
       CAST(SUM(CASE WHEN a.first_pos < b.last_pos THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS fwd_ppm
FROM p a JOIN p b
  ON a.user_id = b.user_id AND a.sid = b.sid
 AND a.event_type <> b.event_type
GROUP BY a.event_type, b.event_type
ORDER BY n_fwd DESC, a, b
"""


@register("q191_funnel_edges", Q191_SQL)
def q191_funnel_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All ordered event-type pairs (a, b) with the number of sessions
    where an a-event PRECEDES a b-event (n_fwd), sessions containing
    both (n_co), and the directionality share fwd_ppm — the
    funnel-EDGE discovery readout (module comment above).

    Correct existential semantics without a per-event self-join: a
    session has a-before-b iff first-position(a) < last-position(b),
    so the pair test runs on the (session, type) FIRST/LAST rollup —
    per-session pair work is |types present|² ≤ 25 rows, never
    events². Within-session positions use absolute per-user sequence
    numbers (first < last comparisons are ORDER statements, invariant
    to where the session starts numbering).

    Scale: sessionization is q165/q172's lag/cumsum idiom (one
    user-keyed exchange carries lag, cumsum, and seq); the rollup is a
    map-side-combined keyed aggregate; the self-join keys on
    (user_id, sid) against per-session ≤|types| rows; the final
    aggregate lands on a ≤|types|²-row relation. Integer counts and one
    scaled DIV — hash-exact."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_start = F.when(
        prev.isNull()
        | (
            F.expr("timestampdiff(MICROSECOND, __prev_ts, ts)")
            > F.lit(SESSION_GAP_MIN * 60 * 1_000_000)
        ),
        1,
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    s = (
        ev.withColumn("__prev_ts", prev)
        .withColumn("is_start", is_start)
        .withColumn("sid", F.sum("is_start").over(run))
        .withColumn("seq", F.row_number().over(w))
    )
    p = s.groupBy("user_id", "sid", "event_type").agg(
        F.min("seq").alias("first_pos"), F.max("seq").alias("last_pos")
    )
    a = p.select(
        "user_id",
        "sid",
        F.col("event_type").alias("a"),
        F.col("first_pos").alias("a_first"),
    )
    b = p.select(
        "user_id",
        "sid",
        F.col("event_type").alias("b"),
        F.col("last_pos").alias("b_last"),
    )
    pairs = a.join(b, ["user_id", "sid"]).filter(F.col("a") != F.col("b"))
    return (
        pairs.groupBy("a", "b")
        .agg(
            F.sum(
                F.when(F.col("a_first") < F.col("b_last"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_fwd"),
            F.count(F.lit(1)).cast("long").alias("n_co"),
        )
        .select(
            "a",
            "b",
            "n_fwd",
            "n_co",
            F.expr("CAST(n_fwd * 1000000 DIV n_co AS BIGINT)").alias(
                "fwd_ppm"
            ),
        )
        .orderBy(F.desc("n_fwd"), "a", "b")
    )


# --- q192: funnel stage timing ------------------------------------------------

# q160 counts WHO converts; this face measures HOW LONG each hop takes:
# per converting user the min-chain timestamps t1 (first view) → t2
# (first later click) → t3 (first later purchase), then per hop the
# exact LOWER MEDIAN (order statistic at rank ⌈n/2⌉ — integer rank
# arithmetic, both engines pick the same stored value; q181/q124's
# discipline) and the decimal-exact mean of the hop latency in
# microseconds. The product-analytics "where does the funnel stall"
# readout.

Q192_SQL = """
WITH t1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t1
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t2
  GROUP BY e.user_id
),
hops AS (
  SELECT 'view>click' AS stage, t1.user_id,
         date_diff('microseconds', t1.t1, t2.t2) AS delta_us
  FROM t1 JOIN t2 ON t1.user_id = t2.user_id
  UNION ALL
  SELECT 'click>purchase', t2.user_id,
         date_diff('microseconds', t2.t2, t3.t3)
  FROM t2 JOIN t3 ON t2.user_id = t3.user_id
),
r AS (
  SELECT stage, delta_us,
         ROW_NUMBER() OVER (PARTITION BY stage
                            ORDER BY delta_us NULLS LAST, user_id) AS rn,
         COUNT(*) OVER (PARTITION BY stage) AS n
  FROM hops
)
SELECT stage,
       CAST(MAX(n) AS BIGINT) AS n_users,
       CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN delta_us END) AS BIGINT)
         AS median_us,
       CAST(SUM(CAST(delta_us AS HUGEINT)) AS DOUBLE) / MAX(n) AS mean_us
FROM r GROUP BY stage
ORDER BY stage
"""


@register("q192_funnel_timing", Q192_SQL)
def q192_funnel_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per funnel hop (view→click, click→purchase): converting users,
    exact lower-median hop latency, and mean latency in microseconds
    (module comment above — q160 tells you conversion, this tells you
    WHERE TIME IS LOST).

    Exactness: latencies are integer microsecond diffs; the median is
    an order statistic at an integer rank (no interpolation); the mean
    is a decimal-exact integer sum cast once to double over an integer
    count. Envelope: Σ delta_us ≤ users·session-horizon ~ 1e9·1e14 —
    past BIGINT, summed in DECIMAL(38,0)/HUGEINT.

    Scale: each chain step is a pushed-filter scan + user-keyed min
    aggregate (q160's shape — a celebrity user costs MIN, never a
    buffer); the rank/count windows share one stage-keyed exchange over
    the USER-sized hop relation (per-stage sort = the honest exact-
    order-statistic cost; q52's sketch is the 100 TB approximate path)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    h12 = (
        t1.join(t2, "user_id")
        .select(
            F.lit("view>click").alias("stage"),
            "user_id",
            F.expr("timestampdiff(MICROSECOND, t1, t2)").alias("delta_us"),
        )
    )
    h23 = (
        t2.join(t3, "user_id")
        .select(
            F.lit("click>purchase").alias("stage"),
            "user_id",
            F.expr("timestampdiff(MICROSECOND, t2, t3)").alias("delta_us"),
        )
    )
    hops = h12.unionByName(h23)
    # asc_nulls_last: same null-placement pin as q181 — the median rank
    # arithmetic must see the same order both engines.
    wr = Window.partitionBy("stage").orderBy(
        F.asc_nulls_last("delta_us"), "user_id"
    )
    wn = Window.partitionBy("stage")
    r = hops.select(
        "stage",
        "delta_us",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return (
        r.groupBy("stage")
        .agg(
            F.max("n").cast("long").alias("n_users"),
            F.max(
                F.when(
                    F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("delta_us")
                )
            )
            .cast("long")
            .alias("median_us"),
            (
                F.sum(F.col("delta_us").cast("decimal(38,0)")).cast("double")
                / F.max("n")
            ).alias("mean_us"),
        )
        .orderBy("stage")
    )


# --- q195: audience overlap matrix --------------------------------------------

# Which behaviors share an audience? For every unordered event-type pair,
# the distinct-user intersection, union, and Jaccard similarity (ppm) —
# the audience-overlap readout behind segmentation and campaign targeting
# (and the set-similarity primitive q36 approximates with MinHash, here
# EXACT over a bounded type domain). All integers; one scaled DIV.

Q195_SQL = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
),
sizes AS (
  SELECT event_type, COUNT(*) AS n FROM ut GROUP BY event_type
),
inter AS (
  SELECT a.event_type AS a, b.event_type AS b, COUNT(*) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT i.a, i.b,
       CAST(sa.n AS BIGINT) AS n_a,
       CAST(sb.n AS BIGINT) AS n_b,
       CAST(i.n_both AS BIGINT) AS n_both,
       CAST(sa.n + sb.n - i.n_both AS BIGINT) AS n_union,
       CAST(i.n_both * 1000000 // (sa.n + sb.n - i.n_both) AS BIGINT)
         AS jaccard_ppm
FROM inter i
JOIN sizes sa ON sa.event_type = i.a
JOIN sizes sb ON sb.event_type = i.b
ORDER BY i.a, i.b
"""


#: Prefilter sketch width for q195b (buckets per event type). Sizing
#: rule: the disjointness certificate fires only when two audiences
#: share no occupied bucket, a birthday-bound regime — reliable pruning
#: of disjoint pairs needs m ≳ (|A|+|B|)² within the pair. 4096 covers
#: the planted-fixture / small-segment regime; at 100 TB you size m to
#: the audience scale (state is |types|·m booleans — still metadata).
AUD_PREFILTER_M = 4096


def audience_prefilter_pairs(ut: DataFrame, m: int = AUD_PREFILTER_M) -> DataFrame:
    """Surviving unordered type pairs under the SOUND sketch
    certificate (VERDICT r8 item 5, the q116 discipline: prefilter
    approximate, result exact): hash every distinct (user, type) into
    one of ``m`` md5 buckets and keep a pair only if the two types
    share at least one OCCUPIED bucket. A common user lands in the
    same bucket for both types, so disjoint bucket sets PROVE an empty
    intersection — pruning can only drop pairs q195 would not emit.

    Why this and not the raw inclusion–exclusion estimate: HLL's
    est(A)+est(B)−est(A∪B) is probabilistic — a true-overlap pair can
    estimate ≤ 0 and an unsound prune would corrupt the exact face.
    The occupancy certificate is the deterministic core the register
    sketch supports: occupied buckets are disjoint witnesses, so
    |A∩B| ≤ n_a + n_b − |J_a ∪ J_b| (inclusion–exclusion with the
    occupancy lower bound on the union), and bucket-disjointness is
    strictly stronger than that bound reaching 0 (within-type bucket
    collisions only loosen the bound, never the certificate).

    Scale: the (type, bucket) occupancy relation is ≤ |types|·m rows
    (metadata-sized — it is the same state q186's registers carry,
    occupancy instead of max-rank), the pair join keys on the bucket,
    and the result broadcasts into the exact path's semi-join."""
    occ = ut.select(
        F.col("event_type"),
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("long")
            % m
        ).alias("j"),
    ).distinct()
    a = occ.select(F.col("event_type").alias("a"), "j")
    b = occ.select(F.col("event_type").alias("b"), "j")
    return (
        a.join(b, "j")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


# q195b's oracle IS q195's SQL: the prefilter is provably sound, so the
# prefiltered face must be value-identical to the exact face — making
# the equality the thing the driver hash-checks is the whole point.
@register("q195b_audience_overlap_prefiltered", Q195_SQL)
def q195b_audience_overlap_prefiltered(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q195 with the sketch semi-join prefilter in front of the exact
    pair aggregation: candidate pairs that provably share no user
    (``audience_prefilter_pairs``) are dropped BEFORE the user-keyed
    expansion shuffles its (a, b) rows, so as the type family grows the
    aggregation pays only for pairs that can overlap. On the events
    table every type pair shares users, so the face degenerates to
    q195 (hash-equal by the oracle) — the planted disjoint-audience
    pytest pins pairs_pruned > 0; the certificate's soundness is what
    the driver hash-verifies here."""
    ut = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    survivors = audience_prefilter_pairs(ut)
    sizes = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    a = ut.select("user_id", F.col("event_type").alias("a"))
    b = ut.select("user_id", F.col("event_type").alias("b"))
    inter = (
        a.join(b, "user_id")
        .filter(F.col("a") < F.col("b"))
        .join(F.broadcast(survivors), ["a", "b"], "left_semi")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    return (
        inter.join(
            F.broadcast(
                sizes.select(F.col("event_type").alias("a"), F.col("n").alias("n_a"))
            ),
            "a",
        )
        .join(
            F.broadcast(
                sizes.select(F.col("event_type").alias("b"), F.col("n").alias("n_b"))
            ),
            "b",
        )
        .select(
            "a",
            "b",
            "n_a",
            "n_b",
            "n_both",
            (F.col("n_a") + F.col("n_b") - F.col("n_both"))
            .cast("long")
            .alias("n_union"),
            F.expr(
                "CAST(n_both * 1000000 DIV (n_a + n_b - n_both) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .orderBy("a", "b")
    )


@register("q195_audience_overlap", Q195_SQL)
def q195_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered event-type pairs with exact distinct-user intersection,
    union, and Jaccard ppm (module comment above). Pairs where no user
    overlaps are absent (inner join semantics — an absent row IS the
    zero).

    Scale: the (user, type) de-dup is one map-side-combinable distinct
    over a bounded-width relation; the self-join keys on user_id with
    per-user fan-out ≤ C(|types|, 2) = 10 rows; sizes are a |types|-row
    broadcast. At 100 TB this is one user-keyed exchange — the exact
    counterpart of q36's MinHash estimate, affordable here because the
    set family (event types) is bounded; for unbounded families
    (documents) the sketch is the only affordable path — see llm/dedup.py."""
    ut = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    sizes = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    a = ut.select("user_id", F.col("event_type").alias("a"))
    b = ut.select("user_id", F.col("event_type").alias("b"))
    inter = (
        a.join(b, "user_id")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("event_type").alias("a"),
                                     F.col("n").alias("n_a"))), "a"
        )
        .join(
            F.broadcast(sizes.select(F.col("event_type").alias("b"),
                                     F.col("n").alias("n_b"))), "b"
        )
        .select(
            "a",
            "b",
            "n_a",
            "n_b",
            "n_both",
            (F.col("n_a") + F.col("n_b") - F.col("n_both"))
            .cast("long")
            .alias("n_union"),
            F.expr(
                "CAST(n_both * 1000000 DIV (n_a + n_b - n_both) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .orderBy("a", "b")
    )


# --- q197: grouping-sets rollup with per-level trailing windows --------------

# The subtotal-trend hybrid: ONE grouping-sets pass produces both the
# per-priority and the all-priority daily revenue series, and a trailing
# 7-day RANGE window then runs WITHIN each level — the "small-multiples
# plus total" readout every revenue dashboard draws, expressed as one
# plan instead of a union of re-aggregations (Spark's Expand operator
# computes both levels in a single pass over the pre-aggregated daily
# relation). VERDICT r7 item 8's GROUPING-SETS-over-window corner.

Q197_SQL = """
WITH daily AS (
  SELECT o_orderpriority AS prio,
         DATEDIFF('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
           AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1, 2
),
lv AS (
  SELECT CAST(GROUPING(prio, day) AS BIGINT) AS lvl,
         COALESCE(prio, 'ALL') AS prio,
         day,
         CAST(SUM(cents) AS BIGINT) AS cents
  FROM daily GROUP BY GROUPING SETS ((prio, day), (day))
)
SELECT lvl, prio, CAST(day AS BIGINT) AS day, cents,
       CAST(SUM(cents) OVER w AS BIGINT) AS trail7_cents,
       CAST(COUNT(*) OVER w AS BIGINT) AS n7_days
FROM lv
WINDOW w AS (PARTITION BY lvl, prio ORDER BY day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY lvl, prio, day
"""


@register("q197_rollup_trend", Q197_SQL)
def q197_rollup_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue cents at two grouping-set levels — (priority, day)
    and (day) — with a trailing 7-DAY (range, not row: gapped days
    shorten the window honestly) revenue sum and day count inside each
    level. The grouping-id bit convention (1 where the column is
    aggregated) is the SQL standard, so GROUPING_ID/GROUPING mirror
    across engines; 'ALL' stands in for the aggregated priority to keep
    the sort/hash null-free.

    Exactness: everything is BIGINT cents (the q164 ROUND(×100) idiom);
    the range window sums integers.

    Scale: the fact scan collapses to the (prio, day) map-side rollup
    ONCE; the Expand doubling and both windows run over the bounded
    days×priorities relation (q177/q185's shape). The window partitions
    by (lvl, prio) — the ALL level is one partition of day-cardinality
    rows, bounded by the calendar, never by the corpus."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01"))
        .cast("long")
        .alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    daily = o.groupBy("prio", "day").agg(F.sum("cents").alias("cents"))
    lv = (
        daily.cube("prio", "day")
        .agg(
            F.sum("cents").cast("long").alias("cents"),
            F.grouping_id().cast("long").alias("lvl"),
        )
        .filter(F.col("lvl").isin(0, 2))
        .select(
            "lvl",
            F.coalesce(F.col("prio"), F.lit("ALL")).alias("prio"),
            "day",
            "cents",
        )
    )
    w = (
        Window.partitionBy("lvl", "prio")
        .orderBy("day")
        .rangeBetween(-6, 0)
    )
    return lv.select(
        "lvl",
        "prio",
        F.col("day").cast("long").alias("day"),
        "cents",
        F.sum("cents").over(w).cast("long").alias("trail7_cents"),
        F.count(F.lit(1)).over(w).cast("long").alias("n7_days"),
    ).orderBy("lvl", "prio", "day")


# --- q200: robust trend — Mann-Kendall test + Theil-Sen slope ----------------

# q164 fits OLS (moment arithmetic — one outlier day drags the line);
# this is the ROBUST pair: Mann-Kendall's S = Σ sign(y_j − y_i) over
# ordered day pairs (Mann 1945, Kendall 1975 — the standard
# distribution-free monotone-trend test) and the Theil-Sen estimator
# (median of pairwise slopes; Sen 1968) — breakdown point 29%, immune
# to the revenue spikes OLS chases. Everything is integers: sign sums,
# fixed-point slopes, exact order-statistic median.

#: Fixed-point slope scale (cents per day, millis).
TS_SLOPE_SCALE = 1000

#: Trend window: pairs come from the trailing TS_WINDOW_DAYS of the
#: series (global max day anchor). Trend is a WINDOWED question in
#: production (is revenue drifting NOW, not since 1992), and the bound
#: is what keeps the pair relation C(365, 2)-sized — calendar-fixed at
#: any corpus scale AND at any history length (unbounded history would
#: grow pairs quadratically with years retained).
TS_WINDOW_DAYS = 365

Q200_SQL = f"""
WITH daily AS (
  SELECT o_orderpriority AS prio,
         DATEDIFF('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
           AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1, 2
),
recent AS (
  SELECT * FROM daily
  WHERE day > (SELECT MAX(day) FROM daily) - {TS_WINDOW_DAYS}
),
nd AS (SELECT prio, CAST(COUNT(*) AS BIGINT) AS n_days
       FROM recent GROUP BY prio),
scored AS (
  SELECT a.prio, a.day AS d1, b.day AS d2,
         CASE WHEN b.cents > a.cents THEN 1
              WHEN b.cents < a.cents THEN -1 ELSE 0 END AS sg,
         CASE WHEN b.cents < a.cents
              THEN -(((a.cents - b.cents) * {TS_SLOPE_SCALE})
                     // (b.day - a.day))
              ELSE ((b.cents - a.cents) * {TS_SLOPE_SCALE})
                   // (b.day - a.day) END AS slope
  FROM recent a JOIN recent b ON a.prio = b.prio AND a.day < b.day
),
agg AS (
  SELECT prio, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(sg) AS BIGINT) AS mk_s
  FROM scored GROUP BY prio
),
med AS (
  SELECT prio,
         CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN slope END) AS BIGINT)
           AS sen_slope_scaled
  FROM (
    SELECT prio, slope,
           ROW_NUMBER() OVER (PARTITION BY prio
                              ORDER BY slope, d1, d2) AS rn,
           COUNT(*) OVER (PARTITION BY prio) AS n
    FROM scored
  ) GROUP BY prio
)
SELECT a.prio, nd.n_days, a.n_pairs, a.mk_s,
       CAST(CASE WHEN a.mk_s < 0
                 THEN -(((-a.mk_s) * 1000000) // a.n_pairs)
                 ELSE (a.mk_s * 1000000) // a.n_pairs END AS BIGINT)
         AS tau_ppm,
       m.sen_slope_scaled
FROM agg a JOIN med m ON m.prio = a.prio JOIN nd ON nd.prio = a.prio
ORDER BY a.prio
"""


@register("q200_robust_trend", Q200_SQL)
def q200_robust_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority robust revenue trend: Mann-Kendall S and tau (ppm)
    plus the Theil-Sen median slope (cents/day, fixed-point ×1000) over
    the trailing TS_WINDOW_DAYS of the daily series — the outlier-immune
    companion to q164's OLS (module comment; the window bound is what
    keeps the pair relation calendar-fixed — see TS_WINDOW_DAYS).

    Exactness: sign sums are integers; slopes are fixed-point with the
    SIGN-SAFE floor split (-(|x|·S DIV d) for negative numerators —
    Spark's DIV truncates toward zero while DuckDB's // floors, so
    negative operands must never reach the division; same guard on
    tau); the median is an exact order statistic over the pinned
    (slope, d1, d2) total order (q124's discipline).

    Scale: the fact scan collapses to the (prio, day) rollup FIRST;
    the pair join is recent⋈recent per priority — C(TS_WINDOW_DAYS, 2)
    pairs, FIXED at any corpus scale and any retention length (the
    q127 argument, plus the window bound: the unbounded-history
    variant was measured at 23 s against this one's ~2 s — days²
    grows with years retained, not with corpus size); the median's
    rank window partitions by prio over that bounded pair relation.
    A 100 TB corpus changes the rollup's input size only."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01"))
        .cast("long")
        .alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    # The (prio, day) rollup is calendar-fixed (~12k rows at any corpus
    # scale) but was re-derived 10× — anchor, both pair-join sides, the
    # n_days agg, each under TWO consumers (agg + median; the r10
    # no-subtree-reuse rule) re-scanned orders every time. One eager
    # checkpoint drops the returned plan to ZERO parquet Locations (the
    # one orders scan runs once, in the checkpoint job — the plan test
    # pins 0 in the returned plan).
    daily = (
        o.groupBy("prio", "day")
        .agg(F.sum("cents").alias("cents"))
        .localCheckpoint()
    )
    anchor = daily.agg(F.max("day").alias("mx"))
    recent = daily.join(F.broadcast(anchor)).filter(
        F.col("day") > F.col("mx") - TS_WINDOW_DAYS
    ).drop("mx")
    a = recent.select(
        "prio",
        F.col("day").alias("d1"),
        F.col("cents").alias("c1"),
    )
    b = recent.select(
        F.col("prio").alias("p2"),
        F.col("day").alias("d2"),
        F.col("cents").alias("c2"),
    )
    scored = (
        a.join(b, (a["prio"] == b["p2"]) & (a["d1"] < b["d2"]))
        .select(
            "prio",
            "d1",
            "d2",
            F.when(F.col("c2") > F.col("c1"), F.lit(1))
            .when(F.col("c2") < F.col("c1"), F.lit(-1))
            .otherwise(F.lit(0))
            .alias("sg"),
            F.when(
                F.col("c2") < F.col("c1"),
                -F.expr(
                    f"((c1 - c2) * {TS_SLOPE_SCALE}) DIV (d2 - d1)"
                ),
            )
            .otherwise(
                F.expr(f"((c2 - c1) * {TS_SLOPE_SCALE}) DIV (d2 - d1)")
            )
            .alias("slope"),
        )
    )
    agg = scored.groupBy("prio").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("sg").cast("long").alias("mk_s"),
    )
    wr = Window.partitionBy("prio").orderBy("slope", "d1", "d2")
    wn = Window.partitionBy("prio")
    med = (
        scored.select(
            "prio",
            "slope",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .groupBy("prio")
        .agg(
            F.max(
                F.when(
                    F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("slope")
                )
            )
            .cast("long")
            .alias("sen_slope_scaled")
        )
    )
    nd = recent.groupBy("prio").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    return (
        agg.join(med, "prio")
        .join(F.broadcast(nd), "prio")
        .select(
            "prio",
            "n_days",
            "n_pairs",
            "mk_s",
            F.when(
                F.col("mk_s") < 0,
                -F.expr("((-mk_s) * 1000000) DIV n_pairs"),
            )
            .otherwise(F.expr("(mk_s * 1000000) DIV n_pairs"))
            .cast("long")
            .alias("tau_ppm"),
            "sen_slope_scaled",
        )
        .orderBy("prio")
    )


# --- q202: seasonal traffic profile -------------------------------------------

# Diurnal seasonality per event type: hour-of-day share and seasonal
# index (1e6 = flat) — the profile behind rate-anomaly baselines (q110
# detects spikes against a global rate; real traffic has shape, and the
# index IS that shape, integer-exact). All counts BIGINT; one scaled DIV
# per row pair; operands non-negative so Spark DIV == DuckDB //.

Q202_SQL = """
WITH h AS (
  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod
  FROM events
),
c AS (SELECT event_type, hod, COUNT(*) AS n FROM h GROUP BY 1, 2),
t AS (SELECT event_type, SUM(n) AS n_type FROM c GROUP BY 1)
SELECT c.event_type,
       c.hod AS hour_of_day,
       CAST(c.n AS BIGINT) AS n_events,
       CAST(c.n * 1000000 // t.n_type AS BIGINT) AS share_ppm,
       CAST(c.n * 24000000 // t.n_type AS BIGINT) AS seasonal_index_ppm
FROM c JOIN t USING (event_type)
ORDER BY event_type, hour_of_day
"""


@register("q202_seasonal_profile", Q202_SQL)
def q202_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality per event type (round 9): event count,
    traffic share (ppm) and the seasonal index — share × 24, so 10^6
    means a perfectly flat profile and 2×10^6 means the hour carries
    twice its flat-rate share. The baseline a rate-anomaly monitor
    (q110) should normalize against before calling a daily peak a
    spike.

    Scale: ONE map-side-combinable (type, hour) count — 24×|types|
    rows of state regardless of input size; the per-type total is a
    rollup OF THE COUNTS (never a second scan) and joins back on the
    bounded profile relation. All integer (counts and scaled DIVs), so
    the face is hash-exact cross-engine."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").cast("long").alias("hod")
    )
    c = e.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    t = c.groupBy("event_type").agg(F.sum("n").cast("long").alias("n_type"))
    return (
        c.join(t, "event_type")
        .select(
            "event_type",
            F.col("hod").alias("hour_of_day"),
            F.col("n").alias("n_events"),
            F.expr("CAST(n * 1000000 DIV n_type AS BIGINT)").alias(
                "share_ppm"
            ),
            F.expr("CAST(n * 24000000 DIV n_type AS BIGINT)").alias(
                "seasonal_index_ppm"
            ),
        )
        .orderBy("event_type", "hour_of_day")
    )


# --- q203: declarative data-quality expectations -------------------------------

# A Deequ/dbt-tests-style expectation suite evaluated by the engine: each
# rule declares a per-row predicate (not-null, accepted values, range,
# uniqueness, referential integrity) and the face reports checked rows,
# violations, and pass/fail per rule. The engine's answer to "gate the
# pipeline on data quality" — q112 profiles, q159 audits one FK, this
# runs the whole declared suite in two scans + one anti-join.

Q203_SQL = """
WITH o AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v_null,
         COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_uniq,
         SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
           AS v_status,
         SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS v_price
  FROM orders
),
l AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
           AS v_qty,
         SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END)
           AS v_disc,
         SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS v_ship
  FROM lineitem
),
fk AS (
  SELECT COUNT(*) AS v
  FROM lineitem li LEFT JOIN orders o ON o.o_orderkey = li.l_orderkey
  WHERE o.o_orderkey IS NULL
)
SELECT rule,
       CAST(n_checked AS BIGINT) AS n_checked,
       CAST(n_violations AS BIGINT) AS n_violations,
       CAST(n_violations = 0 AS BIGINT) AS passed
FROM (
  SELECT 'lineitem.l_discount.range_0_0.1' AS rule, l.n AS n_checked, l.v_disc AS n_violations FROM l
  UNION ALL
  SELECT 'lineitem.l_orderkey.references_orders', l.n, fk.v FROM l, fk
  UNION ALL
  SELECT 'lineitem.l_quantity.range_1_50', l.n, l.v_qty FROM l
  UNION ALL
  SELECT 'lineitem.l_shipdate.not_null', l.n, l.v_ship FROM l
  UNION ALL
  SELECT 'orders.o_custkey.not_null', o.n, o.v_null FROM o
  UNION ALL
  SELECT 'orders.o_orderkey.unique', o.n, o.v_uniq FROM o
  UNION ALL
  SELECT 'orders.o_orderstatus.accepted_values', o.n, o.v_status FROM o
  UNION ALL
  SELECT 'orders.o_totalprice.positive', o.n, o.v_price FROM o
)
ORDER BY rule
"""


@register("q203_expectations", Q203_SQL)
def q203_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation suite (round 9): eight rules over
    orders/lineitem — not-null, accepted values, numeric ranges, key
    uniqueness, and referential integrity — each reporting checked
    rows, violations, and pass/fail. The data-quality gate a training
    pipeline runs before promoting an ingest (Deequ's check suite /
    dbt tests, engine-side).

    Scale: every per-row rule on a table folds into ONE map-side
    combinable aggregate over ONE scan — and that "one scan" is now
    STRUCTURAL, not optimizer-dependent (round 10, VERDICT r9 item 6):
    the three 1-row aggregates cross-join into a single wide row that a
    ``stack`` unpivot (the q170 pattern) fans out to the 8 rule rows,
    so each table's aggregate subplan appears exactly once in the plan
    instead of relying on ReuseExchange to dedupe 4 union branches.
    Uniqueness rides the same agg as COUNT - COUNT(DISTINCT key); the
    one rule that needs a second relation (referential) is a single
    keyed anti-join (the one extra pass per base table, plan-asserted
    in tests/test_plans.py: exactly 2 scans of each table). Output is
    8 rows at any input size. All counts integer.

    Violation counters are ``SUM(CASE WHEN pred THEN 1 ELSE 0 END)``
    (via ``F.when(...).otherwise(0)``), NOT ``SUM(pred::long)``: on an
    all-NULL column the latter sums zero non-null operands and returns
    NULL while the oracle's CASE returns 0 (ADVICE r9)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def viol(pred):
        # CASE semantics: NULL predicate counts as 0, never NULLs the sum.
        return F.sum(F.when(pred, F.lit(1)).otherwise(F.lit(0))).cast("long")

    oa = o.agg(
        F.count(F.lit(1)).cast("long").alias("n_o"),
        viol(F.col("o_custkey").isNull()).alias("v_null"),
        (
            F.count(F.lit(1)) - F.countDistinct("o_orderkey")
        ).cast("long").alias("v_uniq"),
        viol(~F.col("o_orderstatus").isin("O", "F", "P")).alias("v_status"),
        viol(F.col("o_totalprice") <= 0).alias("v_price"),
    )
    la = li.agg(
        F.count(F.lit(1)).cast("long").alias("n_l"),
        viol((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).alias(
            "v_qty"
        ),
        viol((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).alias(
            "v_disc"
        ),
        viol(F.col("l_shipdate").isNull()).alias("v_ship"),
    )
    fk = (
        li.select(F.col("l_orderkey").alias("k"))
        .join(
            o.select(F.col("o_orderkey").alias("k")),
            "k",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("v_fk"))
    )
    wide = la.crossJoin(F.broadcast(oa)).crossJoin(F.broadcast(fk))
    rows = wide.select(
        F.expr(
            "stack(8,"
            " 'lineitem.l_discount.range_0_0.1', n_l, v_disc,"
            " 'lineitem.l_orderkey.references_orders', n_l, v_fk,"
            " 'lineitem.l_quantity.range_1_50', n_l, v_qty,"
            " 'lineitem.l_shipdate.not_null', n_l, v_ship,"
            " 'orders.o_custkey.not_null', n_o, v_null,"
            " 'orders.o_orderkey.unique', n_o, v_uniq,"
            " 'orders.o_orderstatus.accepted_values', n_o, v_status,"
            " 'orders.o_totalprice.positive', n_o, v_price"
            ") AS (rule, n_checked, n_violations)"
        )
    )
    return rows.select(
        "rule",
        F.col("n_checked").cast("long").alias("n_checked"),
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).cast("long").alias("passed"),
    ).orderBy("rule")

"""Relational operator surface: scan, project, filter, join, aggregate,
set ops, scalar functions, semi-structured (SURVEY.md §2.2 E1, E4–E17).

The reference implements zero relational operators (its only compute is the
ordered per-message handler, /root/reference/lib/redix/stream/consumer.ex:190-240);
this module is the analytics surface the reference delegates to its callers,
re-expressed declaratively so Catalyst handles pushdown/pruning/join
selection.

Scale notes (100 TB):
- Every query is pure DataFrame API — predicate pushdown and column pruning
  reach the parquet scan, partial aggregation happens map-side, and AQE
  re-plans shuffles at runtime.
- Dimension joins (region/nation/supplier) are explicitly broadcast; the
  fact-fact joins (lineitem⋈orders) shuffle on their join key, which is the
  natural co-partitioning key for bucketing in a production deployment.
- Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..numeric import davg, dsum, dsum_big, money, one_minus, one_plus
from ..registry import register

# ---------------------------------------------------------------------------
# E1+E4+E5+E9+E14 — flagship: TPC-H-Q1-shaped pricing summary over lineitem.
# ---------------------------------------------------------------------------

Q01_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  (CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2)))) AS DOUBLE) + CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) - FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2)))) AS DOUBLE)) AS sum_disc_price,
  (CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2)) * CAST(1.0 + l_tax AS DECIMAL(4,2)))) AS DOUBLE) + CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2)) * CAST(1.0 + l_tax AS DECIMAL(4,2))) - FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2)) * CAST(1.0 + l_tax AS DECIMAL(4,2)))) AS DOUBLE)) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("q01_pricing_summary", Q01_SQL)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → pushed filter → hash aggregate.

    Money aggregates use the exact-decimal discipline (see ``numeric``):
    partial aggregation across any number of partitions is exact, so the
    result is identical on 1 core or 1000 executors.
    """
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = money("l_extendedprice") * one_minus("l_discount")
    charge = disc_price * one_plus("l_tax")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(money("l_quantity"), "sum_qty"),
            dsum(money("l_extendedprice"), "sum_base_price"),
            dsum_big(disc_price, "sum_disc_price"),
            dsum_big(charge, "sum_charge"),
            davg(money("l_quantity"), "avg_qty"),
            davg(money("l_extendedprice"), "avg_price"),
            davg(F.col("l_discount").cast("decimal(4,2)"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# E4+E5 — projection & predicate filters over the event log.
# ---------------------------------------------------------------------------

Q02_SQL = """
SELECT
  event_id,
  user_id,
  event_type,
  value,
  value * 2.0 AS value_x2,
  date_trunc('day', ts) AS day
FROM events
WHERE event_type IS DISTINCT FROM 'error'
  AND props IS NOT NULL
  AND props <> '{}'
  AND value > 50.0
"""


@register("q02_filter_project", Q02_SQL)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + predicates, including the tombstone-style filter.

    Mirrors the reference's only filter: messages whose payload is the
    empty tombstone are skipped (consumer.ex:286,295) — here the analog is
    dropping rows with an empty/missing ``props`` payload. Null-safe
    comparison (`IS DISTINCT FROM`) keeps the semantics explicit.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(
            ~F.col("event_type").eqNullSafe("error")
            & F.col("props").isNotNull()
            & (F.col("props") != "{}")
            & (F.col("value") > 50.0)
        )
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            (F.col("value") * F.lit(2.0)).alias("value_x2"),
            F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("day"),
        )
    )


# ---------------------------------------------------------------------------
# E6 — multi-way equi-join across the star schema.
# ---------------------------------------------------------------------------

Q03_SQL = """
SELECT
  r_name,
  n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY r_name, n_name
"""


@register("q03_star_join_revenue", Q03_SQL)
def q03_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem⋈orders⋈customer⋈nation⋈region revenue rollup.

    Scale: nation/region are broadcast (they are bounded-size dimensions at
    any SF); lineitem⋈orders is the one real shuffle and joins on the
    natural bucketing key (orderkey). The o_orderdate filter is pushed to
    the orders scan before the join.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    revenue = money("l_extendedprice") * one_minus("l_discount")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# E7 — semi / anti joins.
# ---------------------------------------------------------------------------

Q04_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_totalprice > 100000.0
)
"""


@register("q04_semi_join", Q04_SQL)
def q04_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one six-figure order (LEFT SEMI).

    Semi joins never materialize the probe side's payload — at scale this
    avoids carrying order columns through the shuffle.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


Q05_SQL = """
SELECT c_custkey, c_acctbal
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
)
"""


@register("q05_anti_join", Q05_SQL)
def q05_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no fulfilled order (LEFT ANTI) — the same shape the
    consumer-group 'pending = produced ∖ acked' view (E22) relies on."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_acctbal"
    )


# ---------------------------------------------------------------------------
# E8 — range (theta) join and as-of join.
# ---------------------------------------------------------------------------

Q06_SQL = """
SELECT a.user_id AS user_id, COUNT(*) AS n_pairs
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND b.ts >= a.ts
 AND b.ts <= a.ts + INTERVAL '1 hour'
GROUP BY a.user_id
"""


@register("q06_range_join", Q06_SQL)
def q06_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of events by the same user within a 1-hour forward window.

    The equi key (user_id) carries the shuffle; the range predicate is
    evaluated post-shuffle within each key group, so the join never
    becomes a cartesian product. At 100 TB you'd additionally bucket both
    sides by user_id to kill the shuffle entirely.
    """
    e = load_table(spark, sf_dir, "events")
    a = e.alias("a")
    b = e.alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_id") < F.col("b.event_id"))
        & (F.col("b.ts") >= F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL '1' HOUR"))
    )
    return (
        a.join(b, cond)
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


Q06B_SQL = """
WITH pe AS (
  SELECT user_id,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                        RANGE BETWEEN CURRENT ROW AND INTERVAL 1 HOUR FOLLOWING)
           AS range_cnt,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
  FROM events
)
SELECT user_id, CAST(SUM(range_cnt - rn) AS BIGINT) AS n_pairs
FROM pe
GROUP BY user_id
"""


@register("q06b_range_join_agg", Q06B_SQL)
def q06b_range_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q06's scale face: the same per-user 1-hour-forward pair counts
    computed with a RANGE-frame window instead of a self-join — the q127b
    lesson applied to the range join. q06's join emits every qualifying
    pair before aggregating, so its cost is quadratic in per-window event
    density (measured 17× at the 10× replica, SCALING.md); this face
    scans each user's timeline ONCE: for event a, the frame
    [ts, ts + 1h] counts candidates, and subtracting a's rank among its
    exact-ts ties leaves exactly the events strictly after it in
    (ts, event_id) order. One shuffle on user_id, zero joins, linear in
    events — flat growth at any pair density.

    Pair order is (ts, event_id) lexicographic — the replay delivery
    order — where q06 uses raw event_id order; the two agree whenever
    per-user ids are ts-monotone (true of this event log and of any
    log-ordered id scheme; q06 remains the literal-id face).
    """
    e = load_table(spark, sf_dir, "events")
    # ntz-safe epoch micros for the numeric range frame (unix_micros
    # rejects TIMESTAMP_NTZ; the zorder timestampdiff idiom)
    us = F.expr("timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01', ts)")
    # all three windows partition by user_id ALONE (a (user_id, ts)
    # tie-rank window would force a second exchange): the tie position is
    # row_number over (us, event_id) minus the count of strictly-earlier
    # timestamps — one shuffle, two partition-local sorts.
    wr = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(0, 3_600_000_000)
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    wn = Window.partitionBy("user_id").orderBy("us", "event_id")
    pe = e.select("user_id", "event_id", us.alias("us")).select(
        "user_id",
        F.count(F.lit(1)).over(wr).alias("range_cnt"),
        F.count(F.lit(1)).over(wb).alias("n_before"),
        F.row_number().over(wn).alias("rnk"),
    )
    contrib = F.col("range_cnt") - (F.col("rnk") - F.col("n_before"))
    return pe.groupBy("user_id").agg(
        F.sum(contrib).cast("long").alias("n_pairs")
    )


Q07_SQL = """
SELECT
  p.event_id AS purchase_id,
  p.user_id  AS user_id,
  p.ts       AS purchase_ts,
  c.event_id AS click_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@register("q07_asof_join", Q07_SQL)
def q07_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the most recent prior click by the
    same user.

    Spark has no ASOF JOIN operator; the scalable formulation is the
    union-and-carry-forward pattern: tag both sides, sort within user by
    (ts, side), and carry the last click id forward with
    ``last(..., ignorenulls=True)``. One shuffle on user_id, no quadratic
    blowup (vs. the naive join + max(ts) subquery), and the same plan
    works under Structured Streaming with applyInPandasWithState.
    """
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(0).alias("is_purchase"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
        F.lit(1).alias("is_purchase"),
    )
    # Clicks sort before purchases at an identical timestamp => inclusive
    # "p.ts >= c.ts" semantics, matching ASOF JOIN.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("last_click_id", F.last("click_id", ignorenulls=True).over(w))
        .filter(F.col("is_purchase") == 1)
        .select(
            F.col("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("last_click_id").alias("click_id"),
        )
    )


# ---------------------------------------------------------------------------
# E9+E10 — aggregates, distinct counts.
# ---------------------------------------------------------------------------

Q08_SQL = """
SELECT
  o_orderstatus,
  o_orderpriority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_total,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_total,
  CAST(MIN(o_totalprice) AS DOUBLE) AS min_total,
  CAST(MAX(o_totalprice) AS DOUBLE) AS max_total,
  MIN(o_orderdate) AS min_date,
  MAX(o_orderdate) AS max_date
FROM orders
GROUP BY o_orderstatus, o_orderpriority
"""


@register("q08_agg_orders", Q08_SQL)
def q08_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key hash aggregate with the full agg function family."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(money("o_totalprice")).cast("double").alias("sum_total"),
        davg(money("o_totalprice"), "avg_total"),
        F.min("o_totalprice").cast("double").alias("min_total"),
        F.max("o_totalprice").cast("double").alias("max_total"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
    )


Q09_SQL = """
SELECT event_type, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
"""


@register("q09_distinct_users", Q09_SQL)
def q09_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (two-phase: partial sets, then merge).

    The approximate variant (HLL sketch, constant memory at 100 TB) is
    ``q51_approx_distinct`` — rows-only because sketch estimates are
    engine-specific.
    """
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register("q51_approx_distinct")  # rows-only: HLL estimates are engine-specific
def q51_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct — the constant-memory path for 100 TB distincts."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users")
    )


@register("q53_hll_mergeable_rollup")  # rows-only: sketch bytes are engine-specific
def q53_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-group HLL sketches UNIONED into a
    coarser grouping without touching the raw data again.

    The pattern that matters at 100 TB: materialize `hll_sketch_agg`
    per fine-grained group once (here per event_type), then answer every
    coarser rollup by `hll_union_agg` over the stored sketches — a
    kilobytes-sized aggregation instead of a second full scan. The test
    asserts the merged estimate tracks the exact global distinct.
    """
    e = load_table(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.count(F.lit(1)).alias("n_events"),
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("users_estimate"),
        F.sum("n_events").alias("n_events"),
    )
    per_type_est = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sketch").alias("users_estimate"),
        "n_events",
    )
    return per_type_est.unionByName(
        merged.select(
            F.lit("ALL").alias("event_type"), "users_estimate", "n_events"
        )
    )


# ---------------------------------------------------------------------------
# E11 — rollup / cube / grouping sets.
# ---------------------------------------------------------------------------

Q10_SQL = """
SELECT
  COALESCE(o_orderstatus, 'ALL')   AS status,
  COALESCE(o_orderpriority, 'ALL') AS priority,
  COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@register("q10_rollup_orders", Q10_SQL)
def q10_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals; sentinel 'ALL' disambiguates rollup nulls
    (the source columns are non-null, so the sentinel is unambiguous)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("o_totalprice")).cast("double").alias("sum_total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "sum_total",
        )
    )


Q11_SQL = """
SELECT
  COALESCE(event_type, 'ALL') AS etype,
  COALESCE(CAST(date_trunc('day', ts) AS TIMESTAMP), TIMESTAMP '1900-01-01') AS day,
  COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY CUBE (event_type, CAST(date_trunc('day', ts) AS TIMESTAMP))
"""


@register("q11_cube_events", Q11_SQL)
def q11_cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day) — all four grouping combinations.

    Day buckets stay TIMESTAMP (not DATE): pandas surfaces DuckDB dates as
    midnight datetimes, so a DATE output would hash-mismatch on type alone.
    """
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("day")
    return (
        e.cube(F.col("event_type"), day)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("etype"),
            F.coalesce(F.col("day"), F.lit("1900-01-01").cast("timestamp_ntz")).alias("day"),
            "n",
            "sum_value",
        )
    )


Q12_SQL = """
SELECT
  COALESCE(r_name, 'ALL') AS region,
  COALESCE(n_name, 'ALL') AS nation,
  COUNT(*) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
"""


@register("q12_grouping_sets", Q12_SQL)
def q12_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL over broadcast dimension joins."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "region").createOrReplaceTempView("region")
    return spark.sql(
        """
        SELECT
          COALESCE(r_name, 'ALL') AS region,
          COALESCE(n_name, 'ALL') AS nation,
          COUNT(*) AS n_customers,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
        """
    )


# ---------------------------------------------------------------------------
# E12+E13+E14 — window functions, sorts, top-k.
# ---------------------------------------------------------------------------

Q13_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS BIGINT) AS rn
  FROM orders
)
WHERE rn <= 3
"""


@register("q13_window_topk_per_group", Q13_SQL)
def q13_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the scalable per-group top-k pattern
    (partition-local sort, no global sort)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


Q14_SQL = """
SELECT event_id, user_id, value,
       LAG(value)  OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value,
       LEAD(value) OVER (PARTITION BY user_id ORDER BY event_id) AS next_value,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
         PARTITION BY user_id ORDER BY event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_value,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT) AS seq
FROM events
"""


@register("q14_window_analytic", Q14_SQL)
def q14_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/running-sum per user in log order — the per-key ordered
    traversal that plays the reference's ordered handler application
    (consumer.ex:190-240) as a declarative window."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(wsum).cast("double").alias("running_value"),
        F.row_number().over(w).cast("long").alias("seq"),
    )


Q15_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice,
       CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank
FROM orders
ORDER BY rank
LIMIT 10
"""


@register("q15_top_global", Q15_SQL)
def q15_top_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10: orderBy+limit compiles to TakeOrderedAndProject
    (per-partition top-k then k-merge on the driver — no global sort);
    the rank column is stamped after the 10-row result exists."""
    o = load_table(spark, sf_dir, "orders")
    top = o.select("o_orderkey", "o_custkey", "o_totalprice").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    ).limit(10)
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


# ---------------------------------------------------------------------------
# E15 — set operations.
# ---------------------------------------------------------------------------

Q16_SQL = """
WITH hi  AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0),
     bld AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
SELECT 'union' AS op, c_custkey
FROM (SELECT c_custkey FROM hi UNION SELECT c_custkey FROM bld)
UNION ALL
SELECT 'intersect' AS op, c_custkey
FROM (SELECT c_custkey FROM hi INTERSECT SELECT c_custkey FROM bld)
UNION ALL
SELECT 'except' AS op, c_custkey
FROM (SELECT c_custkey FROM hi EXCEPT SELECT c_custkey FROM bld)
"""


@register("q16_set_ops", Q16_SQL)
def q16_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over two customer segments, tagged."""
    c = load_table(spark, sf_dir, "customer")
    hi = c.filter(F.col("c_acctbal") > 5000.0).select("c_custkey")
    bld = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    tag = lambda df, op: df.select(F.lit(op).alias("op"), "c_custkey")  # noqa: E731
    return (
        tag(hi.union(bld).distinct(), "union")
        .unionByName(tag(hi.intersect(bld), "intersect"))
        .unionByName(tag(hi.subtract(bld), "except"))
    )


# ---------------------------------------------------------------------------
# E16 — scalar function library.
# ---------------------------------------------------------------------------

Q17_SQL = r"""
SELECT
  p_partkey,
  UPPER(p_name) AS name_upper,
  SUBSTRING(p_type, 1, 5) AS type_prefix,
  p_brand || '#' || p_type AS brand_type,
  CAST(CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS BIGINT) AS has_a,
  regexp_extract(p_type, '^(\w+)', 1) AS first_word,
  CAST(LEN(string_split(p_name, ' ')) AS BIGINT) AS n_words,
  CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
  CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
  CAST(ABS(p_size - 25) AS BIGINT) AS size_dist,
  COALESCE(NULLIF(p_brand, 'Brand#1'), 'OTHER') AS brand_masked
FROM part
"""


@register("q17_scalar_string_math", Q17_SQL)
def q17_scalar_string_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String / math / conditional scalar functions — all JVM-side
    whole-stage-codegen expressions, zero Python in the row path."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.when(F.col("p_name").like("%a%"), 1).otherwise(0).cast("long").alias("has_a"),
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("first_word"),
        F.size(F.split("p_name", " ")).cast("long").alias("n_words"),
        F.floor("p_retailprice").cast("long").alias("price_floor"),
        F.ceil("p_retailprice").cast("long").alias("price_ceil"),
        F.abs(F.col("p_size") - 25).cast("long").alias("size_dist"),
        F.coalesce(F.nullif("p_brand", F.lit("Brand#1")), F.lit("OTHER")).alias(
            "brand_masked"
        ),
    )


Q18_SQL = """
SELECT
  o_orderkey,
  CAST(year(o_orderdate) AS BIGINT) AS order_year,
  CAST(month(o_orderdate) AS BIGINT) AS order_month,
  CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
  CAST(isodow(o_orderdate) - 1 AS BIGINT) AS wday,
  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95,
  CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
  CAST(CAST(o_orderdate + INTERVAL '3 months' AS DATE) AS TIMESTAMP) AS plus3m
FROM orders
"""


@register("q18_scalar_datetime", Q18_SQL)
def q18_scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar functions (weekday normalized to Monday=0 — Spark's
    ``weekday`` ≡ DuckDB's ``isodow - 1``)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        F.weekday("o_orderdate").cast("long").alias("wday"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz"))
        .cast("long")
        .alias("days_since_95"),
        F.last_day(F.to_date("o_orderdate")).cast("timestamp_ntz").alias("month_end"),
        F.to_date(F.add_months("o_orderdate", 3)).cast("timestamp_ntz").alias("plus3m"),
    )


# ---------------------------------------------------------------------------
# E17 — semi-structured: JSON payload projection.
# ---------------------------------------------------------------------------

Q19_SQL = """
SELECT
  CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
  COUNT(*) AS n,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1
"""


@register("q19_json_props", Q19_SQL)
def q19_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed projection of the dynamic JSON payload — the engine's lift
    from the reference's string→string envelope (stream.ex:16-17) to real
    types (SURVEY §1.2)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select((k % 10).alias("k_bucket"), k.alias("k"), "value")
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


Q29_SQL = """
SELECT
  event_id,
  CAST(LEN(json_keys(props)) AS BIGINT) AS n_keys,
  list_sort(json_keys(props))[1] AS first_key,
  json_extract_string(props, '$.k') AS k_str
FROM events
"""


@register("q29_map_ops", Q29_SQL)
def q29_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic payload as a real MapType: ``from_json`` to
    map<string,string> then map_keys / element_at — the engine's typed
    envelope for the reference's schema-less string→string messages
    (SURVEY §1.2/§1.3)."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return e.select(
        "event_id",
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
        F.array_sort(F.map_keys(m)).getItem(0).alias("first_key"),
        F.element_at(m, "k").alias("k_str"),
    )


Q50_SQL = """
SELECT
  c.c_custkey AS custkey,
  e.event_id AS event_id,
  CAST(c.c_custkey IS NULL AS BIGINT) AS customer_missing,
  CAST(e.event_id IS NULL AS BIGINT) AS event_missing,
  COALESCE(e.event_type, 'none') AS etype
FROM customer c
FULL OUTER JOIN (SELECT * FROM events WHERE value > 180.0) e
  ON c.c_custkey = e.user_id
"""


@register("q50_full_outer_join", Q50_SQL)
def q50_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join completing the join family (E6): unmatched rows on
    both sides survive with nulls, made hash-observable via missing-side
    flags. Scale note: full outer cannot broadcast — it is always a
    shuffle join on the key; skew tooling (plans.skew) applies."""
    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events").filter(F.col("value") > 180.0)
    return (
        c.join(e, c.c_custkey == e.user_id, "full_outer")
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("event_id"),
            F.col("c_custkey").isNull().cast("long").alias("customer_missing"),
            F.col("event_id").isNull().cast("long").alias("event_missing"),
            F.coalesce("event_type", F.lit("none")).alias("etype"),
        )
    )


Q67_SQL = """
SELECT
  c.c_custkey AS custkey,
  c.c_mktsegment AS segment,
  o.o_orderkey AS orderkey,
  CAST(o.o_orderkey IS NULL AS BIGINT) AS no_order,
  COALESCE(o.o_orderstatus, 'none') AS status
FROM customer c
LEFT OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 250000.0) o
  ON c.c_custkey = o.o_custkey
"""


@register("q67_left_outer_join", Q67_SQL)
def q67_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER equi-join (E6): every customer survives; customers with
    no qualifying order carry nulls, made hash-observable via a
    missing-side flag. Scale note: left outer CAN broadcast the build
    (right) side when bounded — Catalyst picks BroadcastHashJoin here
    since the filtered orders side is small; at 100 TB the same shape
    degrades gracefully to a shuffle join on the key."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_outer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderkey").isNull().cast("long").alias("no_order"),
        F.coalesce("o_orderstatus", F.lit("none")).alias("status"),
    )


Q68_SQL = """
SELECT
  o.o_orderkey AS orderkey,
  c.c_custkey AS custkey,
  CAST(c.c_custkey IS NULL AS BIGINT) AS no_customer,
  COALESCE(c.c_mktsegment, 'none') AS segment
FROM (SELECT * FROM customer WHERE c_acctbal > 9000.0) c
RIGHT OUTER JOIN orders o
  ON c.c_custkey = o.o_custkey
"""


@register("q68_right_outer_join", Q68_SQL)
def q68_right_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER equi-join (E6): every order survives; orders whose
    customer fails the balance filter carry nulls. Scale note: right
    outer can broadcast the LEFT (stream) side only — here the filtered
    customer side is the small one, so Catalyst builds on it."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000.0)
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "right_outer").select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("c_custkey").alias("custkey"),
        F.col("c_custkey").isNull().cast("long").alias("no_customer"),
        F.coalesce("c_mktsegment", F.lit("none")).alias("segment"),
    )


Q62_SQL = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24.0
"""


@register("q62_forecast_revenue", Q62_SQL)
def q62_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter-and-sum — every predicate pushes to the
    parquet scan, the aggregate is a single map-side-combined global sum.
    The simplest possible 100 TB query: storage bandwidth is the bound."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            F.sum(money("l_extendedprice") * F.col("l_discount").cast("decimal(4,2)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q63_SQL = """
SELECT
  CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
       THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))
       ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE) * 100.0
    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
    AS promo_revenue_pct,
  COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
"""


@register("q63_promo_ratio", Q63_SQL)
def q63_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio over a fact⋈dim join
    (part broadcasts). The ratio divides two exact decimal sums cast to
    double — one multiply and one divide in IEEE, bit-stable."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    rev = money("l_extendedprice") * one_minus("l_discount")
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(17,4)")
    )
    j = l.join(p, l.l_partkey == p.p_partkey)
    return j.agg(
        (
            F.sum(promo).cast("double") * F.lit(100.0)
            / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q64_SQL = """
SELECT c_custkey, c_name, n_name, revenue, rank FROM (
  SELECT
    c_custkey, c_name, n_name,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
    CAST(ROW_NUMBER() OVER (
      ORDER BY CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) DESC,
               c_custkey
    ) AS BIGINT) AS rank
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
  GROUP BY c_custkey, c_name, n_name
)
WHERE rank <= 20
"""


@register("q64_returned_items", Q64_SQL)
def q64_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost revenue from returned items, top-20 customers.
    Filter → star join (nation broadcast) → aggregate → top-k via
    orderBy+limit (TakeOrderedAndProject: per-partition top-k, k-merge);
    rank is stamped on the 20-row result, never windowed over the full
    customer-cardinality relation."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    rev = money("l_extendedprice") * one_minus("l_discount")
    agg = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )
    top = agg.orderBy(F.col("revenue").desc(), F.col("c_custkey")).limit(20)
    w = Window.orderBy(F.col("revenue").desc(), F.col("c_custkey"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))

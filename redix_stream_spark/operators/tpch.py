"""TPC-H query shapes (breadth face of SURVEY.md §2.2 E6/E9/E14).

The reference implements no relational operators (SURVEY §2.1) — these
shapes exist so a user of a general analytics engine can run the classic
decision-support workload on this one. Each is adapted to the driver's
TPC-H-ish schema (TESTDATA.md: no partsupp/commitdate/receiptdate/phone)
and follows the cross-engine float discipline in ``numeric``: exact
decimal sums cast to double, fixed IEEE sequences for derived ratios,
BIGINT-normalized integer outputs.

Scale notes apply per query; the common rules: bounded dims broadcast,
date/brand/segment filters pushed to scans, aggregates map-side combined,
global top-k via orderBy+limit (TakeOrderedAndProject), never a
full-relation rank window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..numeric import dsum_big, money, one_minus
from ..registry import register


def _fact(df: DataFrame) -> DataFrame:
    """Pin sort-merge for joins touching a growing fact relation.

    Catalyst's size estimate can auto-broadcast a filtered fact side at
    test SF — a plan that OOMs the moment data grows (measured: q70/q76
    died at 10x with "not enough memory to build and broadcast"). SMJ
    shuffles on the join key and spills — the only strategy that
    survives 100 TB facts. Bounded dims stay broadcast via their own
    hints; see also the shuffle_hash rule for array-fat relations.
    """
    return df.hint("merge")


def _rev() -> F.Column:
    return money("l_extendedprice") * one_minus("l_discount")


_REV_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))"


Q70_SQL = f"""
SELECT l_orderkey, revenue, o_orderdate, rank FROM (
  SELECT
    l_orderkey,
    CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
    o_orderdate,
    CAST(ROW_NUMBER() OVER (
      ORDER BY CAST(SUM({_REV_SQL}) AS DOUBLE) DESC, l_orderkey
    ) AS BIGINT) AS rank
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1995-03-15'
    AND l_shipdate  > TIMESTAMP '1995-03-15'
  GROUP BY l_orderkey, o_orderdate
) WHERE rank <= 10
"""


@register("q70_shipping_priority", Q70_SQL)
def q70_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped orders by revenue.

    Segment filter pushed to the customer scan, date filters to both fact
    scans; the aggregate is per-orderkey (map-side combined); top-10 via
    orderBy+limit with rank stamped on the 10-row result.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = _fact(
        load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderdate") < F.lit("1995-03-15")
        )
    )
    l = _fact(
        load_table(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate") > F.lit("1995-03-15")
        )
    )
    agg = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )
    top = agg.orderBy(F.col("revenue").desc(), F.col("l_orderkey")).limit(10)
    w = Window.orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
    return top.select(
        "l_orderkey",
        "revenue",
        "o_orderdate",
        F.row_number().over(w).cast("long").alias("rank"),
    )


Q71_SQL = f"""
SELECT
  n_name,
  CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1996-01-01'
GROUP BY n_name
"""


@register("q71_local_supplier_volume", Q71_SQL)
def q71_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue where customer and supplier share a nation.

    The co-nationality predicate rides the supplier join (composite equi
    key — still hashable, no theta join); supplier/nation/region broadcast
    (bounded dims); date filter pushed to the orders scan.
    """
    c = load_table(spark, sf_dir, "customer")
    o = _fact(
        load_table(spark, sf_dir, "orders").filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01"))
            & (F.col("o_orderdate") < F.lit("1996-01-01"))
        )
    )
    l = _fact(load_table(spark, sf_dir, "lineitem"))
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


Q72_SQL = f"""
SELECT
  supp_nation, cust_nation, l_year,
  CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT
    n1.n_name AS supp_nation,
    n2.n_name AS cust_nation,
    CAST(year(l_shipdate) AS BIGINT) AS l_year,
    {_REV_SQL} AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q72_volume_shipping", Q72_SQL)
def q72_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between two nations by year.

    Both nation aliases broadcast; the nation-pair disjunction is applied
    after the joins (it references both sides) but prunes to 2×2 name
    pairs immediately. Decimal volumes summed exactly, cast once.
    """
    s = load_table(spark, sf_dir, "supplier")
    l = _fact(load_table(spark, sf_dir, "lineitem"))
    o = _fact(load_table(spark, sf_dir, "orders"))
    c = load_table(spark, sf_dir, "customer")
    n1 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        s.join(l, s.s_suppkey == l.l_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


Q73_SQL = f"""
SELECT
  o_year,
  CAST(SUM(CASE WHEN nat = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
    / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT
    CAST(year(o_orderdate) AS BIGINT) AS o_year,
    {_REV_SQL} AS volume,
    n2.n_name AS nat
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type LIKE 'PRO%'
) all_nations
GROUP BY o_year
"""


@register("q73_market_share", Q73_SQL)
def q73_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's market share by year.

    The share is a ratio of two exact decimal sums, each cast to double
    before one IEEE divide — reproducible at any partial-agg tree. The
    conditional numerator keeps DECIMAL type on both branches so the sum
    stays exact (a double 0 would poison exactness).
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type").like("PRO%"))
    l = _fact(load_table(spark, sf_dir, "lineitem"))
    s = load_table(spark, sf_dir, "supplier")
    o = _fact(load_table(spark, sf_dir, "orders"))
    c = load_table(spark, sf_dir, "customer")
    n1 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_reg")
        )
    )
    n2 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nat")
        )
    )
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    vol = _rev().cast("decimal(18,4)")
    num = F.when(F.col("nat") == "NATION_3", vol).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        p.join(l, p.p_partkey == l.l_partkey)
        .join(s, s.s_suppkey == l.l_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(r, F.col("n1_reg") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .filter(F.col("r_name") == "AMERICA")
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(num).cast("double") / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


Q74_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""


@register("q74_order_distribution", Q74_SQL)
def q74_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders per customer.

    Two-level aggregation: count per customer (left outer keeps the
    zero-order customers), then count per count. The second groupBy keys
    on tiny cardinality (distinct order counts) — cheap shuffle.
    """
    c = load_table(spark, sf_dir, "customer")
    o = _fact(load_table(spark, sf_dir, "orders"))
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


Q75_SQL = """
WITH part_avg AS (
  SELECT l_partkey AS avg_partkey,
         0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)) AS qty_threshold
  FROM lineitem
  GROUP BY l_partkey
)
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
  CAST(COUNT(*) AS BIGINT) AS n_small
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN part_avg ON avg_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < qty_threshold
"""


@register("q75_small_qty_revenue", Q75_SQL)
def q75_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders.

    The correlated scalar subquery (per-part average) becomes a
    pre-aggregated relation joined back on partkey — one extra shuffle
    instead of a per-row subquery. The 0.2×avg threshold is computed with
    the same IEEE sequence in both engines (exact decimal sum → double ÷
    bigint count → ×0.2).
    """
    l = _fact(load_table(spark, sf_dir, "lineitem"))
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    part_avg = l.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (
            F.lit(0.2)
            * (F.sum(money("l_quantity")).cast("double") / F.count(F.lit(1)))
        ).alias("qty_threshold")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(part_avg, l.l_partkey == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).cast("long").alias("n_small"),
        )
    )


Q76_SQL = """
SELECT
  c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250
"""


@register("q76_large_orders", Q76_SQL)
def q76_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with very large orders.

    Aggregate-then-filter (HAVING on an exact decimal sum — the compare
    happens in decimal on both engines, no float boundary flakiness).
    """
    c = load_table(spark, sf_dir, "customer")
    o = _fact(load_table(spark, sf_dir, "orders"))
    l = _fact(load_table(spark, sf_dir, "lineitem"))
    qty = F.sum(money("l_quantity"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(qty.cast("double").alias("sum_qty"), qty.alias("_q"))
        .filter(F.col("_q") > 250)
        .drop("_q")
    )


Q77_SQL = f"""
SELECT
  CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1.0 AND l_quantity <= 11.0)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10.0 AND l_quantity <= 20.0)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20.0 AND l_quantity <= 30.0)
"""


@register("q77_bracket_revenue", Q77_SQL)
def q77_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs bracket predicate across the join.

    Catalyst pushes the derivable single-side conjuncts (brand/size
    disjunction to the part scan, quantity range to lineitem) and keeps
    the cross-table residual on the join — the pattern that separates
    engines that can only push simple conjunctions.
    """
    l = _fact(load_table(spark, sf_dir, "lineitem"))
    p = load_table(spark, sf_dir, "part")
    j = l.join(p, l.l_partkey == p.p_partkey)
    qty = F.col("l_quantity")
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & (qty >= 1.0)
            & (qty <= 11.0)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & (qty >= 10.0)
            & (qty <= 20.0)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & (qty >= 20.0)
            & (qty <= 30.0)
        )
    )
    return j.filter(bracket).agg(
        F.sum(_rev()).cast("double").alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


Q78_SQL = """
WITH threshold AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT
  c_mktsegment AS segment,
  CAST(COUNT(*) AS BIGINT) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer, threshold
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_totalprice > 300000.0
  )
GROUP BY c_mktsegment
"""


@register("q78_dormant_customers", Q78_SQL)
def q78_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no premium order.

    The global average is a 1-row aggregate broadcast into the filter (a
    cross join with a single row — not a driver collect); the NOT EXISTS
    is a left anti join on custkey against the premium-order set. Grouped
    by market segment (the schema has no phone country code; the
    synthetic data gives every customer at least one order, so "dormant"
    = no order above the premium threshold).
    """
    c = load_table(spark, sf_dir, "customer")
    o = _fact(
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000.0)
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
            "avg_bal"
        )
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum(money("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


Q79_SQL = f"""
WITH revenue_view AS (
  SELECT l_suppkey AS supplier_no, CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue_view ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue_view)
"""


@register("q79_top_supplier", Q79_SQL)
def q79_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the maximum quarter revenue.

    The scalar-max subquery becomes a 1-row aggregate broadcast into an
    equality filter — ties all surface (unlike top-1 LIMIT). Exact
    decimal revenue makes the equality compare safe across engines.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = _fact(
        l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
            F.sum(_rev()).cast("double").alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        s.join(rev, s.s_suppkey == F.col("supplier_no"))
        .join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q89_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


@register("q89_priority_late_orders", Q89_SQL)
def q89_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts for one quarter's orders that
    contain at least one late line (the schema has no commit/receipt
    dates — lateness = shipped >60 days after the order date).

    The correlated EXISTS compiles to a LEFT SEMI join keyed on orderkey
    with the date comparison as a residual condition — one fact⋈fact
    shuffle, then a 5-group map-side-combined count.
    """
    o = _fact(
        load_table(spark, sf_dir, "orders").filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1996-04-01"))
        )
    )
    l = _fact(load_table(spark, sf_dir, "lineitem"))
    late = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("order_count")
    )


Q90_SQL = """
SELECT
  l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
"""


@register("q90_late_lines_by_status", Q90_SQL)
def q90_late_lines_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per-linestatus counts of high- vs low-priority
    lines shipped in one year (the schema has no shipmode; linestatus is
    the grouping stand-in).

    Ship-year range pushed to the lineitem scan; one orderkey shuffle;
    the conditional counts are map-side-combined integer sums.
    """
    l = _fact(
        load_table(spark, sf_dir, "lineitem").filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
    )
    o = _fact(load_table(spark, sf_dir, "orders"))
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


Q91_SQL = """
WITH fo AS (
  SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'
),
fl AS (
  SELECT l.l_orderkey, l.l_suppkey,
         l.l_shipdate > fo.o_orderdate + INTERVAL 60 DAY AS is_late
  FROM lineitem l JOIN fo ON l.l_orderkey = fo.o_orderkey
),
waiting AS (
  SELECT l1.l_orderkey, l1.l_suppkey
  FROM fl l1
  WHERE l1.is_late
    AND EXISTS (
      SELECT 1 FROM fl l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
      SELECT 1 FROM fl l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.is_late
    )
)
SELECT s_name, numwait, rank FROM (
  SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait,
         CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, s_name) AS BIGINT)
           AS rank
  FROM waiting JOIN supplier ON s_suppkey = l_suppkey
  GROUP BY s_name
) WHERE rank <= 10
"""


@register("q91_waiting_suppliers", Q91_SQL)
def q91_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: top-10 suppliers who were the SOLE late supplier
    on finished multi-supplier orders (lateness as in q89).

    The EXISTS/NOT EXISTS pair becomes LEFT SEMI + LEFT ANTI joins, all
    keyed on orderkey — the late-line relation is built once and feeds
    l1/l2/l3; supplier is a broadcast dim; top-10 is orderBy+limit with
    rank stamped on the 10-row result.
    """
    o = _fact(
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    l = _fact(load_table(spark, sf_dir, "lineitem"))
    fl = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("is_late"),
        )
    )
    late = fl.filter(F.col("is_late"))
    l2 = fl.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    waiting = (
        late.join(
            _fact(l2),
            (F.col("l_orderkey") == F.col("k2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        ).join(
            _fact(l3),
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    counts = waiting.join(s, F.col("s_suppkey") == F.col("l_suppkey")).groupBy(
        "s_name"
    ).agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    top = counts.orderBy(F.col("numwait").desc(), F.col("s_name")).limit(10)
    w = Window.orderBy(F.col("numwait").desc(), F.col("s_name"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


Q92_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q92_forecast_revenue", Q92_SQL)
def q92_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue increase from dropping small-qty discounts.

    The cheapest query in the suite and the purest pushdown test: every
    predicate (ship year, discount band, quantity) reaches the parquet
    scan, no join, one global decimal sum — map-side combined into a
    single-row aggregate. At 100 TB this is a scan-bound query and the
    plan must show exactly that.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        F.sum(money("l_extendedprice") * F.col("l_discount").cast("decimal(4,2)"))
        .cast("double")
        .alias("revenue")
    )


Q93_SQL = f"""
SELECT CAST(100 AS DOUBLE)
       * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} END) AS DOUBLE)
       / CAST(SUM({_REV_SQL}) AS DOUBLE) AS promo_revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate <  TIMESTAMP '1997-10-01'
"""


@register("q93_promo_revenue", Q93_SQL)
def q93_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: % of one month's revenue from promo parts.

    part is a bounded dim (broadcast); ship-month filter pushed to the
    fact scan. Both sums are exact decimals; the ratio is a fixed IEEE
    sequence (100 * num / den, left-assoc) so the double matches the
    oracle bit for bit. The conditional sum skips NULLs rather than
    adding a typed zero — same null-skipping semantics in both engines.
    """
    l = _fact(
        load_table(spark, sf_dir, "lineitem").filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01"))
            & (F.col("l_shipdate") < F.lit("1997-10-01"))
        )
    )
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    j = l.join(p, F.col("p_partkey") == F.col("l_partkey"))
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", _rev())).cast("double").alias("_n"),
        F.sum(_rev()).cast("double").alias("_d"),
    )
    return agg.select(
        (F.lit(100.0) * F.col("_n") / F.col("_d")).alias("promo_revenue")
    )


_COST_SQL = (
    "CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.60 AS DECIMAL(4,2))"
    " * CAST(l_quantity AS DECIMAL(12,2))"
)

Q94_SQL = f"""
SELECT
  n_name AS nation,
  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
  (CAST(FLOOR(SUM({_REV_SQL} - {_COST_SQL})) AS DOUBLE)
   + CAST(SUM({_REV_SQL} - {_COST_SQL})
          - FLOOR(SUM({_REV_SQL} - {_COST_SQL})) AS DOUBLE)) AS sum_profit
FROM lineitem
JOIN orders   ON o_orderkey  = l_orderkey
JOIN supplier ON s_suppkey   = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN part     ON p_partkey   = l_partkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, o_year
"""


@register("q94_product_profit", Q94_SQL)
def q94_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year.

    The schema has no partsupp, so unit cost is modeled as 60% of the
    part's retail price — the join/agg shape (5-way join, two fact
    relations, widget name filter on the part dim) is Q9's. All
    arithmetic is exact decimal ((12,2)x(4,2)x(12,2) stays within
    precision 38 in both engines); the sum is floor-split (dsum_big)
    because a profit sum can exceed 2^53 scaled units at scale 6.
    part/supplier/nation broadcast; the only big shuffle is
    lineitem join orders on orderkey.
    """
    l = _fact(load_table(spark, sf_dir, "lineitem"))
    o = _fact(load_table(spark, sf_dir, "orders"))
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    )
    amount = _rev() - money("p_retailprice") * F.lit(0.60).cast(
        "decimal(4,2)"
    ) * money("l_quantity")
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum_big(amount, "sum_profit"))
    )


Q95_SQL = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem
  JOIN supplier ON s_suppkey   = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  JOIN region   ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT l_partkey, l_suppkey, unit_cost,
         ROW_NUMBER() OVER (
           PARTITION BY l_partkey ORDER BY unit_cost, l_suppkey
         ) AS rn
  FROM cost
)
SELECT s_acctbal, s_name, n_name AS nation, p_partkey, p_name, unit_cost
FROM best
JOIN part     ON p_partkey   = l_partkey
JOIN supplier ON s_suppkey   = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE rn = 1 AND p_type = 'LARGE' AND p_size <= 25
"""


@register("q95_min_cost_supplier", Q95_SQL)
def q95_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest EUROPE supplier for each qualifying part.

    The schema has no partsupp, so a supplier's offer price is the
    minimum observed unit price (extendedprice/quantity) in lineitem —
    the correlated min-cost subquery shape survives. The per-part argmin
    is a window partitioned by partkey (high-cardinality key — hash
    partitions, no global sort), with suppkey as the deterministic tie
    break. Supplier/nation/region dims broadcast; the region filter
    prunes the pair aggregation before the window.
    """
    l = _fact(load_table(spark, sf_dir, "lineitem"))
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    cost = (
        l.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(r, F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
    best = cost.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            (F.col("p_type") == "LARGE") & (F.col("p_size") <= 25)
        )
    )
    return (
        best.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_name",
            "unit_cost",
        )
    )


Q96_SQL = """
WITH val AS (
  SELECT l_partkey AS partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS value_dec
  FROM lineitem
  JOIN supplier ON s_suppkey   = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  JOIN region   ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey
)
SELECT partkey, CAST(value_dec AS DOUBLE) AS value
FROM val
WHERE CAST(value_dec AS DECIMAL(18,2)) * CAST((SELECT COUNT(*) FROM val) AS DECIMAL(10,0)) * 2
      > CAST((SELECT SUM(value_dec) FROM val) AS DECIMAL(20,2)) * 3
"""


@register("q96_important_parts", Q96_SQL)
def q96_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose shipped value from one region's
    suppliers exceeds 1.5x the average part value (no partsupp — shipped
    extendedprice stands in for availqty*supplycost; a relative
    threshold keeps the query discriminating at every scale factor,
    where Q11's absolute fraction would go empty as parts multiply).

    The scalar (total, count) is a 1-row aggregate broadcast into the
    filter — never a window over the whole relation. The 1.5x compare is
    cross-multiplied (value*cnt*2 > total*3) so it stays in exact
    decimal on BOTH sides — no decimal division, whose scale rules
    differ between engines; the down-casts keep every product within
    precision 38 in both. Output value cast to double only at the end.
    """
    l = _fact(load_table(spark, sf_dir, "lineitem"))
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    val = (
        l.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(r, F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(money("l_extendedprice")).alias("value_dec"))
    )
    total = val.agg(
        F.sum("value_dec").alias("_tot"), F.count(F.lit(1)).alias("_cnt")
    )
    return (
        val.join(F.broadcast(total))
        .filter(
            F.col("value_dec").cast("decimal(18,2)")
            * F.col("_cnt").cast("decimal(10,0)")
            * 2
            > F.col("_tot").cast("decimal(20,2)") * 3
        )
        .select("partkey", F.col("value_dec").cast("double").alias("value"))
    )


Q97_SQL = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type  <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000
  )
GROUP BY p_brand, p_type, p_size
"""


@register("q97_supplier_variety", Q97_SQL)
def q97_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many suppliers can ship each surviving
    (brand, type, size) combination (no partsupp — observed lineitem
    supply stands in; no comment column — low acctbal is the
    "complaints" exclusion analog).

    Part filters prune the broadcast dim before the fact join; the
    excluded-supplier set is a broadcast anti join (NOT IN on a
    non-null key == anti join); COUNT(DISTINCT) is Spark's two-phase
    exact distinct — partial per partition, merged on the group key.
    """
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "PROMO")
            & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
        )
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 1000
    ).select("s_suppkey")
    l = _fact(load_table(spark, sf_dir, "lineitem")).join(
        F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct(F.col("l_suppkey")).cast("long").alias("supplier_cnt"))
    )


Q98_SQL = """
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
WHERE r_name = 'ASIA'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE 'blue%'
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 50
  )
"""


@register("q98_promo_part_suppliers", Q98_SQL)
def q98_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: ASIA suppliers who shipped a meaningful volume of
    blue parts in 1997 (no partsupp availqty — the shipped-quantity sum
    over lineitem is the stock-level stand-in).

    The IN-subquery is a LEFT SEMI join against a grouped fact — the
    group-by shrinks lineitem to supplier cardinality BEFORE the semi
    join, so the join probe side is tiny. Part dim filtered+broadcast;
    the quantity threshold compares exact decimals.
    """
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_name").like("blue%"))
    )
    l = _fact(
        load_table(spark, sf_dir, "lineitem").filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
    )
    qualifying = (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(money("l_quantity")).alias("_qty"))
        .filter(F.col("_qty") > F.lit(50).cast("decimal(12,2)"))
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    return (
        s.join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(r, F.col("r_regionkey") == F.col("n_regionkey"))
        .join(
            qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_name", "s_acctbal")
    )

"""Second wave of operator coverage: window frames, extended string
functions with explicit null ordering, array functions, and correlation —
rounding out SURVEY.md E12–E16.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..numeric import dsum_big, money
from ..registry import register

Q44_SQL = """
SELECT
  o_custkey,
  o_orderkey,
  o_totalprice,
  first_value(o_totalprice) OVER w AS first_price,
  last_value(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
  nth_value(o_totalprice, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_price,
  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
  percent_rank() OVER w AS pct_rank,
  cume_dist() OVER w AS cdist,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum3
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("q44_window_frames", Q44_SQL)
def q44_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frames: first/last/nth value, ntile, percent_rank, cume_dist,
    and a 3-row moving sum (decimal-exact). Frames are partition-local —
    the shuffle is on o_custkey only, at any scale."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wmov = w.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(wfull).alias("second_price"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
        F.sum(money("o_totalprice")).over(wmov).cast("double").alias("moving_sum3"),
    )


Q45_SQL = """
SELECT
  c_custkey,
  lpad(c_name, 22, '*') AS name_lpad,
  rpad(c_mktsegment, 12, '.') AS seg_rpad,
  trim(lpad(c_name, 22, ' ')) AS name_trimmed,
  reverse(c_mktsegment) AS seg_rev,
  repeat(c_mktsegment, 2) AS seg_twice,
  CAST(strpos(c_name, '1') AS BIGINT) AS pos_one,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY c_custkey % 16
    ORDER BY NULLIF(c_mktsegment, 'BUILDING') NULLS LAST, c_custkey
  ) AS BIGINT) AS rn_nulls_last
FROM customer
"""


@register("q45_string_null_fns", Q45_SQL)
def q45_string_null_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string functions + explicit NULLS LAST ordering (rank
    column makes the null-ordering observable to the value hash).

    The rank window is hash-partitioned (custkey mod 16) — null ordering
    is equally observable within partitions, and the plan never
    single-partitions the customer relation (the q64/q31 scale rule)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy(F.col("c_custkey") % 16).orderBy(
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).asc_nulls_last(),
        F.col("c_custkey"),
    )
    return c.select(
        "c_custkey",
        F.lpad("c_name", 22, "*").alias("name_lpad"),
        F.rpad("c_mktsegment", 12, ".").alias("seg_rpad"),
        F.trim(F.lpad("c_name", 22, " ")).alias("name_trimmed"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.repeat("c_mktsegment", 2).alias("seg_twice"),
        F.instr("c_name", "1").cast("long").alias("pos_one"),
        F.row_number().over(w).cast("long").alias("rn_nulls_last"),
    )


Q46_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT
  doc_id,
  CAST(LEN(toks) AS BIGINT) AS n_tokens,
  array_to_string(toks[1:3], '|') AS first3,
  toks[-1] AS last_token,
  CAST(COALESCE(list_position(toks, 'spark'), 0) AS BIGINT) AS spark_pos,
  CAST(list_contains(toks, 'table') AS BIGINT) AS has_table,
  array_to_string(list_sort(list_distinct(toks[1:5])), ',') AS head_sorted
FROM t
"""


@register("q46_array_ops", Q46_SQL)
def q46_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family over tokenized text; array-valued results are
    serialized to strings so the cross-engine hash sees scalar columns.

    Note the position-semantics bridge: Spark ``array_position`` returns 0
    for a miss where DuckDB's ``list_position`` returns NULL.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    t = d.select("doc_id", toks.alias("toks"))
    return t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.concat_ws("|", F.slice("toks", 1, 3)).alias("first3"),
        F.element_at("toks", -1).alias("last_token"),
        F.array_position("toks", "spark").cast("long").alias("spark_pos"),
        F.array_contains("toks", "table").cast("long").alias("has_table"),
        F.concat_ws(",", F.array_sort(F.array_distinct(F.slice("toks", 1, 5)))).alias(
            "head_sorted"
        ),
    )


Q47_SQL = """
WITH s AS (
  SELECT
    l_returnflag,
    COUNT(*) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
    (CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)))) AS DOUBLE) + CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) - FLOOR(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)))) AS DOUBLE)) AS sxx,
    (CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)))) AS DOUBLE) + CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) - FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)))) AS DOUBLE)) AS syy,
    (CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)))) AS DOUBLE) + CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) - FLOOR(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)))) AS DOUBLE)) AS sxy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT
  l_returnflag,
  n,
  (sxy - sx * sy / n) / (SQRT(sxx - sx * sx / n) * SQRT(syy - sy * sy / n)) AS corr_qty_price
FROM s
"""


@register("q47_correlation", Q47_SQL)
def q47_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from exact decimal power sums — same bit-parity
    rationale as q27: native corr() accumulates floats in partition order;
    power sums are associative and exact.

    Formula shape matters: ``sxy - sx*sy/n`` (multiply feeding a divide)
    instead of ``n*sxy - sx*sy`` — the latter is an FMA-contraction site
    (DuckDB's compiler fuses mul+sub, Spark's JIT doesn't), which costs a
    ulp and breaks the cross-engine hash."""
    l = load_table(spark, sf_dir, "lineitem")
    x = money("l_quantity")
    y = money("l_extendedprice")
    s = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        dsum_big(x * x, "sxx"),
        dsum_big(y * y, "syy"),
        dsum_big(x * y, "sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "syy", "sxy"))
    corr = (sxy - sx * sy / n) / (
        F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)
    )
    return s.select("l_returnflag", "n", corr.alias("corr_qty_price"))


Q48_SQL = """
SELECT
  c_mktsegment,
  string_agg(c_name, ',' ORDER BY c_name) AS names_sorted,
  CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT c_mktsegment, c_name FROM customer WHERE c_custkey % 50 = 0)
GROUP BY c_mktsegment
"""


@register("q48_string_agg", Q48_SQL)
def q48_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg): collect_list is
    partition-order-nondeterministic, so the engine sorts before joining —
    which is also what makes it oracle-comparable."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 50 == 0)
    return c.groupBy("c_mktsegment").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("c_name"))).alias("names_sorted"),
        F.count(F.lit(1)).alias("n"),
    )


Q49_SQL = """
SELECT
  event_id,
  event_id & 255 AS lo_byte,
  event_id | 4096 AS with_flag,
  xor(event_id, 1365) AS xored,
  event_id << 2 AS shl2,
  event_id >> 3 AS shr3,
  CAST(ascii(substr(event_type, 1, 1)) AS BIGINT) AS first_char_code,
  translate(event_type, 'aeiou', 'AEIOU') AS vowels_up,
  regexp_replace(event_type, '[aeiou]', '_', 'g') AS vowels_gone
FROM events
"""


@register("q49_bitwise_misc", Q49_SQL)
def q49_bitwise_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operators and miscellaneous scalar functions."""
    e = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    return e.select(
        "event_id",
        eid.bitwiseAND(F.lit(255)).alias("lo_byte"),
        eid.bitwiseOR(F.lit(4096)).alias("with_flag"),
        eid.bitwiseXOR(F.lit(1365)).alias("xored"),
        F.shiftleft(eid, 2).alias("shl2"),
        F.shiftright(eid, 3).alias("shr3"),
        F.ascii(F.substring("event_type", 1, 1)).cast("long").alias("first_char_code"),
        F.translate("event_type", "aeiou", "AEIOU").alias("vowels_up"),
        F.regexp_replace("event_type", "[aeiou]", "_").alias("vowels_gone"),
    )


Q65_SQL = """
WITH wide AS (
  SELECT
    user_id,
    CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
    CAST(COUNT(*) FILTER (WHERE event_type = 'view')  AS BIGINT) AS view,
    CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error
  FROM events GROUP BY user_id
)
SELECT user_id, etype, n FROM (
  SELECT user_id, 'click' AS etype, click AS n FROM wide
  UNION ALL SELECT user_id, 'view', view FROM wide
  UNION ALL SELECT user_id, 'error', error FROM wide
)
WHERE n > 0
"""


@register("q65_unpivot", Q65_SQL)
def q65_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide per-type counts back to long form — the
    inverse of q28's pivot, via Spark's native ``unpivot`` operator."""
    e = load_table(spark, sf_dir, "events")
    wide = (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "view", "error"])
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t)
              for t in ("click", "view", "error")],
        )
    )
    return wide.unpivot(
        "user_id", ["click", "view", "error"], "etype", "n"
    ).filter(F.col("n") > 0)


Q66_SQL = """
WITH a AS (SELECT event_type FROM events WHERE user_id % 2 = 0),
     b AS (SELECT event_type FROM events WHERE value > 100.0)
SELECT 'intersect_all' AS op, event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT event_type FROM a INTERSECT ALL SELECT event_type FROM b)
GROUP BY event_type
UNION ALL
SELECT 'except_all' AS op, event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT event_type FROM a EXCEPT ALL SELECT event_type FROM b)
GROUP BY event_type
"""


@register("q66_multiset_ops", Q66_SQL)
def q66_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set-operations (INTERSECT ALL / EXCEPT ALL) — duplicate-
    preserving variants completing E15 (q16 covers the distinct forms)."""
    e = load_table(spark, sf_dir, "events")
    a = e.filter(F.col("user_id") % 2 == 0).select("event_type")
    b = e.filter(F.col("value") > 100.0).select("event_type")
    tag = lambda df, op: (  # noqa: E731
        df.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit(op).alias("op"), "event_type", "n")
    )
    return tag(a.intersectAll(b), "intersect_all").unionByName(
        tag(a.exceptAll(b), "except_all")
    )


# --- q113: fuzzy (edit-distance) self-join via q-gram filtering -------------

#: Edit-distance budget and q-gram width for the similarity join.
FUZZY_K = 2
FUZZY_Q = 3
#: Keys with < q·(K+1) chars can evade the shared-q-gram guarantee — they
#: all land in one bounded SHORT bucket instead (completeness stays exact).
FUZZY_SHORT = FUZZY_Q * (FUZZY_K + 1) - 1

Q113_SQL = f"""
WITH t AS (
  SELECT doc_id,
         array_to_string(string_split(text, ' ')[1:4], ' ') AS k
  FROM documents
),
g AS (
  SELECT doc_id, k, LEN(k) AS kl,
         unnest(CASE WHEN LEN(k) <= {FUZZY_SHORT} THEN ['SHORT']
                ELSE list_distinct(list_transform(
                       range(1, GREATEST(LEN(k) - {FUZZY_Q - 1}, 1) + 1),
                       i -> k[i:i+{FUZZY_Q - 1}])) END) AS gram
  FROM t
),
cand AS (
  SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
  FROM g a JOIN g b
    ON a.gram = b.gram AND a.doc_id < b.doc_id
   AND ABS(a.kl - b.kl) <= {FUZZY_K}
)
SELECT c.ida AS doc_id_a, c.idb AS doc_id_b,
       ta.k AS key_a, tb.k AS key_b,
       CAST(levenshtein(ta.k, tb.k) AS BIGINT) AS dist
FROM cand c
JOIN t ta ON c.ida = ta.doc_id
JOIN t tb ON c.idb = tb.doc_id
WHERE levenshtein(ta.k, tb.k) <= {FUZZY_K}
"""


@register("q113_fuzzy_join", Q113_SQL)
def q113_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-≤2 similarity self-join on a per-document key (the
    first four tokens) — the fuzzy-matching join class (entity
    resolution, near-identical titles/URLs) the equality join family
    can't express.

    Scale shape — q-gram candidate filter, never all-pairs: two strings
    within edit distance K share at least one q-gram once their length
    exceeds q·(K+1)−1 (each edit destroys ≤ q grams), so candidates come
    from a gram-keyed equi-join with a ±K length filter; exact
    ``levenshtein`` (JVM-side, same unit-cost definition in DuckDB) runs
    on candidates only. Sub-threshold-length keys all share one bounded
    SHORT bucket — completeness stays exact, cost stays O(short²) on a
    set the length bound keeps small.
    """
    from ..llm.text import tokens

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.concat_ws(" ", F.slice(tokens(), 1, 4)).alias("k")
    ).withColumn("kl", F.length("k"))
    grams = F.when(
        F.col("kl") <= FUZZY_SHORT, F.array(F.lit("SHORT"))
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.col("kl") - (FUZZY_Q - 1), F.lit(1))
                ),
                lambda i: F.col("k").substr(i, F.lit(FUZZY_Q)),
            )
        )
    )
    g = t.select("doc_id", "kl", F.explode(grams).alias("gram"))
    a, b = g.alias("a"), g.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.abs(F.col("a.kl") - F.col("b.kl")) <= FUZZY_K),
        )
        .select(F.col("a.doc_id").alias("ida"), F.col("b.doc_id").alias("idb"))
        .distinct()
    )
    ta = t.select(F.col("doc_id").alias("ida"), F.col("k").alias("key_a"))
    tb = t.select(F.col("doc_id").alias("idb"), F.col("k").alias("key_b"))
    dist = F.levenshtein("key_a", "key_b")
    return (
        cand.join(ta, "ida")
        .join(tb, "idb")
        .filter(dist <= FUZZY_K)
        .select(
            F.col("ida").alias("doc_id_a"),
            F.col("idb").alias("doc_id_b"),
            "key_a",
            "key_b",
            dist.cast("long").alias("dist"),
        )
    )

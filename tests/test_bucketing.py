"""Bucketed co-located joins and salted skew joins — the scale knobs."""

from __future__ import annotations

from pyspark.sql import functions as F

from redix_stream_spark.catalog import load_table
from redix_stream_spark.plans import formatted_plan, salted_join, write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        )
        od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        write_bucketed(li, "b_lineitem", "l_orderkey", n_buckets=4)
        write_bucketed(od, "b_orders", "o_orderkey", n_buckets=4)
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = formatted_plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        # and it computes the same thing as the unbucketed join
        plain = li.join(od, F.col("l_orderkey") == F.col("o_orderkey")).count()
        assert j.count() == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_star_join_no_exchange_on_fact_edge(spark, sf_dir):
    """q03's star join on bucketed facts: the lineitem⋈orders edge must be
    Exchange-free (bucket-pair reads), dims broadcast, and the ONLY
    shuffle in the plan is the final group-by aggregation. Result must be
    bit-identical to the unbucketed q03."""
    from redix_stream_spark.plans.bucketing import star_revenue_bucketed
    from redix_stream_spark.registry import all_queries

    # At test SF the filtered orders side fits under the auto-broadcast
    # threshold, which would hide the bucket layout; at 100 TB it never
    # would. Disable auto-broadcast — the dims stay broadcast via their
    # explicit hints — so the fact edge exercises the bucketed SMJ path.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = star_revenue_bucketed(spark, sf_dir)
        plan = formatted_plan(df)
        assert "SortMergeJoin" in plan
        assert "BroadcastHashJoin" in plan
        # No Exchange on either fact join key — the bucket layout carries it.
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        exchanges = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
        assert len(exchanges) <= 1, exchanges  # only the final aggregation
        plain = {
            (r["r_name"], r["n_name"]): (r["revenue"], r["n_items"])
            for r in all_queries()["q03_star_join_revenue"](spark, sf_dir).collect()
        }
        bucketed = {
            (r["r_name"], r["n_name"]): (r["revenue"], r["n_items"])
            for r in df.collect()
        }
        assert plain == bucketed
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_lineitem")
        spark.sql("DROP TABLE IF EXISTS bucketed_orders")
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_salted_join_matches_plain_join(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    plain = e.join(c, "user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s")
    ).collect()[0]
    salted = salted_join(e, c, "user_id", n_salts=8).agg(
        F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s")
    ).collect()[0]
    assert (plain["n"], plain["s"]) == (salted["n"], salted["s"])


def test_write_partitioned_layout_and_pruning(spark, sf_dir, tmp_path):
    from redix_stream_spark.sources.writer import write_partitioned

    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date(F.date_trunc("day", "ts"))
    )
    out = str(tmp_path / "part")
    write_partitioned(e, out, ["event_type"], files_per_partition=1)
    back = spark.read.parquet(out)
    assert back.count() == e.count()
    # partition pruning: filtering on the partition col scans one dir
    pruned = back.filter(F.col("event_type") == "click")
    plan = formatted_plan(pruned)
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert pruned.count() == e.filter(F.col("event_type") == "click").count()


def test_multi_format_ingest_roundtrip(spark, sf_dir, tmp_path):
    from redix_stream_spark.sources.ingest import convert, read_any

    src = load_table(spark, sf_dir, "nation")
    schema = "n_nationkey int, n_name string, n_regionkey int"
    # land the same relation in three foreign formats, read each back
    csv_p, json_p, orc_p = (str(tmp_path / x) for x in ("c", "j", "o"))
    src.write.mode("overwrite").option("header", "true").csv(csv_p)
    src.write.mode("overwrite").json(json_p)
    src.write.mode("overwrite").orc(orc_p)
    for fmt, path in [("csv", csv_p), ("json", json_p), ("orc", orc_p)]:
        back = read_any(spark, path, fmt, schema=schema)
        assert back.count() == 25, fmt
        assert {r["n_name"] for r in back.collect()} == {
            r["n_name"] for r in src.collect()
        }, fmt
    # convert: foreign format -> partitioned parquet
    n = convert(
        spark, csv_p, "csv", str(tmp_path / "landed"),
        schema=schema, partition_cols=["n_regionkey"],
    )
    assert n == 25
    # schema-less structured ingest is rejected (scale rule)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_any(spark, csv_p, "csv")

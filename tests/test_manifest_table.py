"""ManifestTable: zone-map file skipping + copy-on-write MERGE/DELETE.

What the oracle hash (q145/q146) can't see and these tests pin:
- pruning actually SKIPS files (the scan would be correct even reading
  everything — the point is that it doesn't);
- merge rewrites only zone-overlapping files (COW locality);
- merge is replay-idempotent (foreachBatch retry safety);
- snapshots stay readable until vacuum reclaims their files.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from redix_stream_spark.catalog import load_table
from redix_stream_spark.sources.manifest_table import ManifestTable

from .conftest import SF_DIR


@pytest.fixture()
def orders_table(spark, tmp_path):
    tbl = ManifestTable(str(tmp_path / "orders"), "o_orderkey")
    tbl.write(load_table(spark, SF_DIR, "orders"), target_files=8)
    return tbl


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_range_clustered_zones_are_disjoint(orders_table):
    spans = sorted(
        tuple(e["stats"]["o_orderkey"]) for e in orders_table.manifest()
    )
    assert len(spans) == 8
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo  # disjoint AND ordered — the pruning-friendly layout


def test_prune_skips_files_and_scan_is_exact(spark, orders_table):
    lo, hi = 200, 399
    kept, total = orders_table.prune("o_orderkey", lo, hi)
    assert total == 8
    assert 0 < len(kept) < total  # zone maps skipped files
    got = orders_table.scan(spark, "o_orderkey", lo, hi)
    want = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderkey").between(lo, hi)
    )
    assert _sorted_rows(got) == _sorted_rows(want)


def test_prune_outside_domain_is_empty(spark, orders_table):
    kept, _ = orders_table.prune("o_orderkey", 10**9, 2 * 10**9)
    assert kept == []
    assert orders_table.scan(spark, "o_orderkey", 10**9, 2 * 10**9).count() == 0


def test_merge_rewrites_only_overlapping_files(spark, orders_table):
    o = load_table(spark, SF_DIR, "orders")
    upd = o.filter(F.col("o_orderkey").between(200, 399)).withColumn(
        "o_orderstatus", F.lit("U")
    )
    stats = orders_table.merge(spark, upd)
    assert stats["files_total"] == 8
    assert 0 < stats["files_rewritten"] < 8
    after = orders_table.read(spark)
    n_upd = upd.count()
    assert after.filter(F.col("o_orderstatus") == "U").count() == n_upd
    assert after.count() == o.count()  # pure update batch: no inserts


def test_merge_inserts_unmatched_keys(spark, orders_table):
    o = load_table(spark, SF_DIR, "orders")
    ins = o.limit(5).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10**7)
    )
    orders_table.merge(spark, ins)
    after = orders_table.read(spark)
    assert after.count() == o.count() + 5
    assert after.filter(F.col("o_orderkey") > 10**6).count() == 5


def test_merge_evolves_schema_with_zero_extra_rewrites(spark, orders_table):
    """An update batch carrying a new column appends it (nullable) to the
    table schema; untouched files carry forward by reference and read
    back NULL-filled — evolution must not widen the rewrite set."""
    o = load_table(spark, SF_DIR, "orders")
    g0 = orders_table.state.current_gen()
    upd = o.filter(F.col("o_orderkey").between(200, 399)).withColumn(
        "o_note", F.lit("adjusted")
    )
    stats = orders_table.merge(spark, upd)
    assert 0 < stats["files_rewritten"] < stats["files_total"]
    after = orders_table.read(spark)
    assert after.columns == o.columns + ["o_note"]
    n_upd = upd.count()
    assert after.filter(F.col("o_note") == "adjusted").count() == n_upd
    assert after.filter(F.col("o_note").isNull()).count() == o.count() - n_upd
    # time travel: the pre-evolution generation keeps its own schema
    assert orders_table.read(spark, gen=g0).columns == o.columns


def test_merge_update_missing_existing_column_nulls_it(spark, orders_table):
    """Merge is whole-row replace: a source batch without an existing
    column NULLs that column for matched rows (not keep-old)."""
    o = load_table(spark, SF_DIR, "orders")
    upd = o.filter(F.col("o_orderkey").between(200, 209)).drop(
        "o_orderpriority"
    )
    orders_table.merge(spark, upd)
    after = orders_table.read(spark)
    assert after.columns == o.columns  # no new columns appeared
    matched = after.filter(F.col("o_orderkey").between(200, 209))
    assert matched.filter(F.col("o_orderpriority").isNull()).count() == (
        matched.count()
    )
    assert (
        after.filter(~F.col("o_orderkey").between(200, 209))
        .filter(F.col("o_orderpriority").isNull())
        .count()
        == 0
    )


def test_merge_refuses_column_type_change(spark, orders_table):
    o = load_table(spark, SF_DIR, "orders")
    upd = (
        o.filter(F.col("o_orderkey").between(200, 209))
        .withColumn("o_totalprice", F.col("o_totalprice").cast("string"))
    )
    with pytest.raises(ValueError, match="o_totalprice"):
        orders_table.merge(spark, upd)


def test_merge_is_replay_idempotent(spark, orders_table):
    o = load_table(spark, SF_DIR, "orders")
    batch = o.filter(F.col("o_orderkey").between(100, 300)).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(1.0)
    )
    orders_table.merge(spark, batch)
    first = _sorted_rows(orders_table.read(spark))
    orders_table.merge(spark, batch)  # the foreachBatch retry
    assert _sorted_rows(orders_table.read(spark)) == first


def test_merge_into_empty_table_is_a_write(spark, tmp_path):
    tbl = ManifestTable(str(tmp_path / "t"), "o_orderkey")
    o = load_table(spark, SF_DIR, "orders").limit(100)
    stats = tbl.merge(spark, o)
    assert stats == {"files_total": 0, "files_rewritten": 0}
    assert tbl.read(spark).count() == 100


def test_restore_rolls_back_as_a_new_commit(spark, orders_table):
    """RESTORE republishes the target snapshot under a NEW generation:
    contents revert exactly, the merge snapshot stays readable, and the
    rollback itself is in the history (auditable, re-restorable)."""
    o = load_table(spark, SF_DIR, "orders")
    g0 = orders_table.state.current_gen()
    before = _sorted_rows(orders_table.read(spark))
    orders_table.merge(
        spark,
        o.filter(F.col("o_orderkey").between(200, 299)).withColumn(
            "o_orderstatus", F.lit("U")
        ),
    )
    g1 = orders_table.state.current_gen()
    stats = orders_table.restore(g0)
    assert stats["restored_gen"] == g0
    g2 = orders_table.state.current_gen()
    assert g2 not in (g0, g1)  # a NEW commit, not a pointer rewind
    assert _sorted_rows(orders_table.read(spark)) == before
    # the intermediate merge snapshot is still time-travelable
    assert (
        orders_table.read(spark, gen=g1)
        .filter(F.col("o_orderstatus") == "U")
        .count()
        == 100
    )


def test_restore_unknown_generation_raises(spark, orders_table):
    with pytest.raises(ValueError, match="generation"):
        orders_table.restore(999)


def test_delete_is_cow_and_exact(spark, orders_table):
    o = load_table(spark, SF_DIR, "orders")
    stats = orders_table.delete(spark, "o_orderkey", 200, 399)
    assert 0 < stats["files_rewritten"] < stats["files_total"]
    after = orders_table.read(spark)
    want = o.filter(~F.col("o_orderkey").between(200, 399))
    assert after.count() == want.count()
    assert _sorted_rows(after) == _sorted_rows(want)


def test_snapshot_read_then_vacuum_expires_it(spark, orders_table):
    gen0 = orders_table.state.current_gen()
    n0 = orders_table.read(spark).count()
    orders_table.delete(spark, "o_orderkey", 1, 10**6)  # nearly everything
    # snapshot still reconstructs the pre-delete table (shared files live)
    assert orders_table.read(spark, gen=gen0).count() == n0
    assert orders_table.read(spark).count() < n0
    removed = orders_table.vacuum()
    assert removed > 0
    data_files = set(os.listdir(orders_table.data_dir))
    live = {os.path.basename(e["file"]) for e in orders_table.manifest()}
    assert data_files == live


# --- StreamingUpsert (CDC apply) + compact -------------------------------


def _orders_updates(spark, keys, price_bump, status):
    o = load_table(spark, SF_DIR, "orders")
    return o.filter(F.col("o_orderkey").isin(keys)).select(
        "o_orderkey",
        "o_custkey",
        F.lit(status).alias("o_orderstatus"),
        (F.col("o_totalprice") + F.lit(float(price_bump))).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )


def test_streaming_upsert_batches_and_replay(spark, orders_table):
    """Direct foreachBatch drive: two CDC batches apply latest-wins per
    key; replaying an epoch (crash recovery) leaves the table unchanged."""
    from redix_stream_spark.streaming.upsert import StreamingUpsert

    up = StreamingUpsert(orders_table, order_col="o_totalprice")
    o = load_table(spark, SF_DIR, "orders")
    b1 = _orders_updates(spark, [10, 20, 30], 100, "U1")
    # batch 2 touches key 20 again AND carries an in-batch duplicate for
    # key 40 — the higher o_totalprice row must win.
    b2 = _orders_updates(spark, [20, 40], 200, "U2").unionByName(
        _orders_updates(spark, [40], 50, "LOSE")
    )
    up.update(b1, 0)
    up.update(b2, 1)
    after = {
        r["o_orderkey"]: r["o_orderstatus"]
        for r in orders_table.read(spark)
        .filter(F.col("o_orderkey").isin([10, 20, 30, 40]))
        .collect()
    }
    assert after == {10: "U1", 20: "U2", 30: "U1", 40: "U2"}
    assert orders_table.read(spark).count() == o.count()
    snapshot = _sorted_rows(orders_table.read(spark))
    up.update(b2, 1)  # crash-replay of epoch 1
    assert _sorted_rows(orders_table.read(spark)) == snapshot


def test_streaming_upsert_under_real_stream(spark, orders_table, tmp_path):
    """The foreachBatch wiring under an actual availableNow stream."""
    import os
    import time

    from redix_stream_spark.streaming.upsert import StreamingUpsert

    src = str(tmp_path / "cdc")
    os.makedirs(src)
    b1 = _orders_updates(spark, [11, 21], 100, "S1")
    b2 = _orders_updates(spark, [21, 31], 200, "S2")
    schema = b1.schema
    for b in (b1, b2):
        b.coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)
    up = StreamingUpsert(orders_table, order_col="o_totalprice")
    q = (
        up.attach(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src),
            str(tmp_path / "ck"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    after = {
        r["o_orderkey"]: r["o_orderstatus"]
        for r in orders_table.read(spark)
        .filter(F.col("o_orderkey").isin([11, 21, 31]))
        .collect()
    }
    assert after == {11: "S1", 21: "S2", 31: "S2"}


def test_compact_restores_disjoint_zones(spark, orders_table):
    """Merge-driven fragmentation (out-of-range inserts overlap zones);
    compact() re-range-clusters and the zone spans are disjoint again."""
    o = load_table(spark, SF_DIR, "orders")
    ins = o.limit(20).withColumn(
        "o_orderkey", (F.col("o_orderkey") % 8) * 190 + F.lit(5)
    ).dropDuplicates(["o_orderkey"])
    orders_table.merge(spark, ins)
    orders_table.compact(spark, target_files=6)
    spans = sorted(
        tuple(e["stats"]["o_orderkey"]) for e in orders_table.manifest()
    )
    assert len(spans) == 6
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo
    # content preserved: every original key still present exactly once
    assert (
        orders_table.read(spark).groupBy("o_orderkey").count()
        .filter(F.col("count") > 1).count() == 0
    )


def test_table_changes_recovers_exactly_the_applied_changes(spark, orders_table):
    """CDF diff: one merge (updates + inserts) + one range delete; the
    snapshot diff must emit exactly those keys with the right change
    types and images — COW-rewritten-but-unchanged rows must cancel."""
    o = load_table(spark, SF_DIR, "orders")
    g0 = orders_table.state.current_gen()
    upd = o.filter(F.col("o_orderkey").between(200, 299)).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(1000.0)
    )
    ins = o.limit(3).withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10**7))
    orders_table.merge(spark, upd.unionByName(ins))
    orders_table.delete(spark, "o_orderkey", 400, 449)
    cdf = orders_table.table_changes(spark, g0)
    got = {
        t: sorted(r["o_orderkey"] for r in rows)
        for t, rows in (
            (t, cdf.filter(F.col("_change_type") == t).collect())
            for t in ("insert", "update", "delete")
        )
    }
    assert got["update"] == sorted(
        r["o_orderkey"] for r in upd.select("o_orderkey").collect()
    )
    assert got["insert"] == sorted(
        r["o_orderkey"] for r in ins.select("o_orderkey").collect()
    )
    assert got["delete"] == sorted(
        r["o_orderkey"]
        for r in o.filter(F.col("o_orderkey").between(400, 449)).collect()
    )
    # post-image for updates (bumped price), pre-image for deletes
    k = got["update"][0]
    orig = o.filter(F.col("o_orderkey") == k).head()["o_totalprice"]
    post = (
        cdf.filter((F.col("_change_type") == "update") & (F.col("o_orderkey") == k))
        .head()["o_totalprice"]
    )
    assert post == orig + 1000.0
    kd = got["delete"][0]
    pre = (
        cdf.filter((F.col("_change_type") == "delete") & (F.col("o_orderkey") == kd))
        .head()["o_totalprice"]
    )
    assert pre == o.filter(F.col("o_orderkey") == kd).head()["o_totalprice"]


def test_concurrent_merge_loser_gets_commit_conflict(spark, orders_table):
    """Optimistic concurrency: two writers snapshot the same generation;
    the second to commit must raise (its blind commit would silently
    drop the winner's changes), and a retry after re-read succeeds with
    BOTH change sets surviving."""
    import pytest as _pytest

    from redix_stream_spark.sources.manifest_table import (
        CommitConflict,
        ManifestTable,
    )

    o = load_table(spark, SF_DIR, "orders")
    b1 = o.filter(F.col("o_orderkey").between(100, 149)).withColumn(
        "o_orderstatus", F.lit("W1")
    )
    b2 = o.filter(F.col("o_orderkey").between(900, 949)).withColumn(
        "o_orderstatus", F.lit("W2")
    )
    # writer 2 = a second handle over the same root, snapshotting now
    w2 = ManifestTable(orders_table.root, "o_orderkey")
    base = w2.state.current_gen()
    orders_table.merge(spark, b1)  # writer 1 wins the race

    # simulate writer 2 having planned against the stale base
    entries = w2.manifest(base)
    with _pytest.raises(CommitConflict):
        w2._commit(entries, w2.schema(), base_gen=base)

    # retry path: re-read (fresh merge call snapshots the new gen)
    w2.merge(spark, b2)
    after = orders_table.read(spark)
    assert after.filter(F.col("o_orderstatus") == "W1").count() == b1.count()
    assert after.filter(F.col("o_orderstatus") == "W2").count() == b2.count()


def test_expired_or_unknown_generation_raises(spark, orders_table):
    """Time travel to a generation outside the committed history must
    raise — silently reading it as an empty table is the worst failure
    mode a snapshot API can have."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not in the committed history"):
        orders_table.manifest(gen=999)
    with _pytest.raises(ValueError):
        orders_table.read(spark, gen=999)


def test_compact_refuses_to_erase_concurrent_merge(spark, orders_table):
    """OCC on compact: a merge landing between compact's read and its
    commit must surface as CommitConflict, not silent erasure."""
    import pytest as _pytest

    from redix_stream_spark.sources.manifest_table import (
        CommitConflict,
        ManifestTable,
    )

    o = load_table(spark, SF_DIR, "orders")
    base_gen = orders_table.state.current_gen()
    df = orders_table.read(spark)
    entries = orders_table._write_files(
        df.repartitionByRange(4, "o_orderkey")
    )
    # a merge lands while the "compactor" was rewriting
    w2 = ManifestTable(orders_table.root, "o_orderkey")
    w2.merge(
        spark,
        o.filter(F.col("o_orderkey").between(50, 60)).withColumn(
            "o_orderstatus", F.lit("X")
        ),
    )
    with _pytest.raises(CommitConflict):
        orders_table._commit(entries, orders_table.schema(), base_gen=base_gen)
    # the merge survived
    assert (
        orders_table.read(spark).filter(F.col("o_orderstatus") == "X").count()
        > 0
    )


def test_model_based_random_op_sequence(spark, tmp_path):
    """Model check: a seeded random sequence of merge / delete / compact
    ops against an in-memory dict model — after every op the table must
    read back exactly the model, every live key must be covered by some
    file's key zone, and the manifest row count must match. This sweeps
    the interaction space (merge into fragmented zones, delete across
    rewritten files, compact after inserts) that example tests can't."""
    import random

    rng = random.Random(42)
    tbl = ManifestTable(str(tmp_path / "t"), "k")
    model: dict[int, int] = {k: k * 10 for k in range(0, 200, 2)}
    tbl.write(
        spark.createDataFrame(sorted(model.items()), "k long, v long"),
        target_files=6,
    )
    version = 1
    for step in range(24):
        op = rng.choice(["merge", "merge", "delete", "compact"])
        if op == "merge":
            keys = rng.sample(range(0, 400), rng.randint(1, 25))
            version += 1
            batch = [(k, k * 1000 + version) for k in keys]
            for k, v in batch:
                model[k] = v
            tbl.merge(
                spark, spark.createDataFrame(batch, "k long, v long")
            )
        elif op == "delete":
            lo = rng.randint(0, 380)
            hi = lo + rng.randint(0, 60)
            for k in [k for k in model if lo <= k <= hi]:
                del model[k]
            tbl.delete(spark, "k", lo, hi)
        else:
            tbl.compact(spark, target_files=rng.randint(2, 8))
        got = {r["k"]: r["v"] for r in tbl.read(spark).collect()}
        assert got == model, f"divergence after step {step} ({op})"
        man = tbl.manifest()
        assert sum(e["rows"] for e in man) == len(model)
        for k in model:
            assert any(
                e["stats"]["k"][0] <= k <= e["stats"]["k"][1] for e in man
            ), f"key {k} outside every zone after step {step}"


def test_time_travel_uses_the_generations_own_schema(spark, tmp_path):
    """Schema is snapshot state: reading gen0 after a full rewrite with a
    different schema must surface gen0's columns, not silent NULLs under
    the new schema."""
    tbl = ManifestTable(str(tmp_path / "t"), "k")
    tbl.write(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    g0 = tbl.state.current_gen()
    tbl.write(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, w long")
    )  # schema change
    old = tbl.read(spark, gen=g0)
    assert old.columns == ["k", "v"]
    assert {r["v"] for r in old.collect()} == {"a", "b"}
    assert tbl.read(spark).columns == ["k", "w"]
    # CDF across the schema change is undefined — must raise, not guess
    import pytest as _pytest

    with _pytest.raises(ValueError, match="schema"):
        tbl.table_changes(spark, g0)


def test_vacuum_trims_expired_generations_from_history(spark, orders_table):
    g0 = orders_table.state.current_gen()
    orders_table.delete(spark, "o_orderkey", 1, 10**6)
    orders_table.vacuum()
    assert g0 not in orders_table.generations()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not in the committed history"):
        orders_table.read(spark, gen=g0)


def test_empty_table_first_commit_race_is_detected(spark, tmp_path):
    """Two writers both snapshot the EMPTY table; the second merge must
    conflict, not silently erase the first writer's batch."""
    import pytest as _pytest

    from redix_stream_spark.sources.manifest_table import (
        CommitConflict,
        ManifestTable,
    )

    root = str(tmp_path / "t")
    w1 = ManifestTable(root, "k")
    w2 = ManifestTable(root, "k")
    b1 = spark.createDataFrame([(1, 10)], "k long, v long")
    b2 = spark.createDataFrame([(2, 20)], "k long, v long")
    base2 = w2.state.current_gen()  # None — w2 saw the empty table
    w1.merge(spark, b1)  # w1 wins the first commit
    entries = w2._write_files(b2.repartitionByRange(1, "k"))
    with _pytest.raises(CommitConflict):
        w2._commit(entries, b2.schema, base_gen=base2)
    # retry lands both batches
    w2.merge(spark, b2)
    assert {r["k"] for r in w1.read(spark).collect()} == {1, 2}


def test_timestamp_stats_cols_are_supported(spark, tmp_path):
    """Zone maps on a timestamp column: ISO-encoded in the manifest,
    order-preserving pruning, scan still exact."""
    import datetime as _dt

    o = load_table(spark, SF_DIR, "orders")
    tbl = ManifestTable(
        str(tmp_path / "t"), "o_orderkey", stats_cols=["o_orderdate"]
    )
    tbl.write(o, target_files=4)
    for e in tbl.manifest():
        lo, hi = e["stats"]["o_orderdate"]
        assert isinstance(lo, str) and isinstance(hi, str) and lo <= hi
    lo = _dt.datetime(1995, 1, 1)
    hi = _dt.datetime(1995, 12, 31, 23, 59, 59)
    got = tbl.scan_box(spark, {"o_orderdate": (lo, hi)})
    want = o.filter(F.col("o_orderdate").between(lo, hi))
    assert got.count() == want.count()


# -- per-file bloom filters (q182's machinery) ------------------------------


@pytest.fixture()
def bloom_table(spark, tmp_path):
    tbl = ManifestTable(
        str(tmp_path / "orders"), "o_orderkey", bloom_cols=["o_custkey"]
    )
    tbl.write(load_table(spark, SF_DIR, "orders"), target_files=16)
    return tbl


def test_bloom_lookup_skips_files_and_is_exact(spark, bloom_table):
    """The point of the bloom is SKIPPING: a single custkey's orders
    live in a bounded subset of the range-clustered files, and the
    lookup must read fewer files than the table has — while returning
    exactly the plain-filter rows (false positives only cost reads;
    a false negative would drop rows and is structurally impossible)."""
    kept, total = bloom_table.prune_values("o_custkey", [3])
    assert total == 16 and len(kept) < total
    got = _sorted_rows(bloom_table.lookup(spark, "o_custkey", [3, 41]))
    want = _sorted_rows(
        bloom_table.read(spark).filter(F.col("o_custkey").isin([3, 41]))
    )
    assert got == want and len(got) > 0


def test_bloom_never_false_negatives_across_domain(spark, bloom_table):
    """Every custkey that truly exists must survive pruning with ALL its
    rows — checked per key across a sample of the domain (the write
    aggregate and the driver probe share the md5 slice derivation, so
    this is a parity test of the two implementations)."""
    truth = {
        r["o_custkey"]: r["n"]
        for r in bloom_table.read(spark)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    sample = sorted(truth)[::17]  # every 17th key, ~9 keys at sf0.001
    for k in sample:
        n = bloom_table.lookup(spark, "o_custkey", [k]).count()
        assert n == truth[k], f"custkey {k}: {n} != {truth[k]}"


def test_bloom_rebuilt_on_cow_rewrite(spark, bloom_table):
    """Files rewritten by DELETE get fresh blooms (the write path owns
    bloom construction), and lookups stay exact afterwards."""
    bloom_table.delete(spark, "o_orderkey", 1, 400)
    for e in bloom_table.manifest():
        assert "o_custkey" in (e.get("bloom") or {})
    got = _sorted_rows(bloom_table.lookup(spark, "o_custkey", [7]))
    want = _sorted_rows(
        bloom_table.read(spark).filter(F.col("o_custkey") == 7)
    )
    assert got == want


def test_tables_without_blooms_keep_every_file(orders_table):
    """prune_values on a table committed without blooms must keep all
    files — a sketch may only skip, never decide membership."""
    kept, total = orders_table.prune_values("o_custkey", [3])
    assert len(kept) == total == 8


# --- merge_cdc: per-key deletes in the COW pass ---------------------------


def test_merge_cdc_applies_all_three_ops_in_one_commit(spark, orders_table):
    o = load_table(spark, SF_DIR, "orders")
    g0 = orders_table.state.current_gen()
    upd = (
        o.filter(F.col("o_orderkey").between(200, 299))
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("op", F.lit("U"))
    )
    dels = o.filter(F.col("o_orderkey").between(300, 349)).withColumn(
        "op", F.lit("D")
    )
    ins = (
        o.limit(3)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10**7))
        .withColumn("op", F.lit("I"))
    )
    n_upd, n_del = upd.count(), dels.count()
    stats = orders_table.merge_cdc(
        spark, upd.unionByName(dels).unionByName(ins)
    )
    assert 0 < stats["files_rewritten"] < stats["files_total"]
    assert orders_table.state.current_gen() == g0 + 1  # ONE commit
    after = orders_table.read(spark)
    assert after.filter(F.col("o_orderkey").between(300, 349)).count() == 0
    assert after.filter(F.col("o_orderstatus") == "U").count() == n_upd
    assert after.count() == o.count() - n_del + 3


def test_merge_cdc_delete_of_absent_key_is_a_noop(spark, orders_table):
    """A delete-only batch whose keys hit no file zones must not touch
    the table AT ALL — no rewrite, and (the r7 ADVICE fix) no commit:
    a pure no-op burning a generation would pollute history/CDF and
    could push a rows=0 NULL-stats entry into the manifest."""
    o = load_table(spark, SF_DIR, "orders")
    before = orders_table.read(spark).count()
    gen_before = orders_table.state.current_gen()
    ghost = o.limit(2).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10**8)
    ).withColumn("op", F.lit("D"))
    stats = orders_table.merge_cdc(spark, ghost)
    assert orders_table.read(spark).count() == before
    assert stats["files_rewritten"] == 0
    assert orders_table.state.current_gen() == gen_before  # zero commits


def test_merge_cdc_is_replay_idempotent(spark, orders_table):
    o = load_table(spark, SF_DIR, "orders")
    batch = (
        o.filter(F.col("o_orderkey").between(100, 149))
        .withColumn("op", F.lit("D"))
        .unionByName(
            o.filter(F.col("o_orderkey").between(150, 199))
            .withColumn("o_orderstatus", F.lit("U"))
            .withColumn("op", F.lit("U"))
        )
    )
    orders_table.merge_cdc(spark, batch)
    first = sorted(
        (r["o_orderkey"], r["o_orderstatus"])
        for r in orders_table.read(spark).collect()
    )
    orders_table.merge_cdc(spark, batch)  # crash-replay of the same batch
    second = sorted(
        (r["o_orderkey"], r["o_orderstatus"])
        for r in orders_table.read(spark).collect()
    )
    assert first == second


def test_streaming_upsert_with_op_column_deletes_and_reinserts(
    spark, orders_table
):
    """op-aware StreamingUpsert: within one batch the FINAL op per key
    wins (update-then-delete deletes; delete-then-reinsert reinserts)."""
    from redix_stream_spark.streaming.upsert import StreamingUpsert

    o = load_table(spark, SF_DIR, "orders")
    su = StreamingUpsert(orders_table, order_col="_seq", op_col="op")
    k1 = o.filter(F.col("o_orderkey") == 42)
    batch = (
        # key 42: U at seq 1 then D at seq 2 → deleted
        k1.withColumn("op", F.lit("U")).withColumn("_seq", F.lit(1))
        .unionByName(
            k1.withColumn("op", F.lit("D")).withColumn("_seq", F.lit(2))
        )
        # key 43: D at seq 1 then U at seq 2 → survives updated
        .unionByName(
            o.filter(F.col("o_orderkey") == 43)
            .withColumn("op", F.lit("D"))
            .withColumn("_seq", F.lit(1))
        )
        .unionByName(
            o.filter(F.col("o_orderkey") == 43)
            .withColumn("o_orderstatus", F.lit("U"))
            .withColumn("op", F.lit("U"))
            .withColumn("_seq", F.lit(2))
        )
    )
    su.update(batch, epoch_id=0)
    after = orders_table.read(spark)
    assert after.filter(F.col("o_orderkey") == 42).count() == 0
    r43 = after.filter(F.col("o_orderkey") == 43).collect()
    assert len(r43) == 1 and r43[0]["o_orderstatus"] == "U"


# --- delete_mor: merge-on-read deletes (deletion-vector sidecars) ----------


def test_mor_delete_rewrites_zero_data_files(spark, orders_table):
    """The property this path exists for: a delete commits a key
    sidecar and touches ZERO data files — the trickle-delete workload
    COW cannot afford (a 1-row delete rewrites every overlapping
    file)."""
    o = load_table(spark, SF_DIR, "orders")
    before_files = set(os.listdir(orders_table.data_dir))
    g0 = orders_table.state.current_gen()
    n_before = orders_table.read(spark).count()
    keys = o.filter(F.col("o_orderkey").between(500, 900)).select(
        "o_orderkey"
    )
    n_del = keys.count()
    stats = orders_table.delete_mor(spark, keys)
    assert stats["files_rewritten"] == 0
    assert stats["files_affected"] >= 1
    assert set(os.listdir(orders_table.data_dir)) == before_files
    assert orders_table.state.current_gen() == g0 + 1
    after = orders_table.read(spark)
    assert after.count() == n_before - n_del
    assert (
        after.filter(F.col("o_orderkey").between(500, 900)).count() == 0
    )


def test_mor_delete_absent_keys_is_a_commitless_noop(spark, orders_table):
    g0 = orders_table.state.current_gen()
    ghost = spark.range(10**8, 10**8 + 5).select(
        F.col("id").alias("o_orderkey")
    )
    stats = orders_table.delete_mor(spark, ghost)
    assert stats["files_affected"] == 0
    assert orders_table.state.current_gen() == g0  # zero commits


def test_mor_delete_snapshot_and_cdf_interaction(spark, orders_table):
    """Time travel must still see the deleted rows in the pre-delete
    snapshot, and the CDF between the two snapshots must emit exactly
    the deleted PRESENT keys as `delete` rows — a delete_mor commit
    changes logical content with zero file churn, so the CDF's
    shared-file skip has to key on (file, sidecars), not file id."""
    o = load_table(spark, SF_DIR, "orders")
    g0 = orders_table.state.current_gen()
    keys = o.filter(F.col("o_orderkey").between(300, 420)).select(
        "o_orderkey"
    )
    expect = {r["o_orderkey"] for r in keys.collect()}
    orders_table.delete_mor(spark, keys)
    g1 = orders_table.state.current_gen()
    # snapshot isolation: the old generation still reads the rows.
    old = orders_table.read(spark, gen=g0)
    assert (
        old.filter(F.col("o_orderkey").between(300, 420)).count()
        == len(expect)
    )
    # CDF: exactly the deleted keys, all tagged delete.
    ch = orders_table.table_changes(spark, g0, g1).collect()
    assert {r["_change_type"] for r in ch} == {"delete"}
    assert {r["o_orderkey"] for r in ch} == expect


def test_mor_deleted_keys_do_not_resurrect_through_cow_merge(
    spark, orders_table
):
    """A COW rewrite of a file carrying a sidecar must apply the
    sidecar first (no resurrection), while an explicit re-upsert of a
    deleted key lands in a fresh file and becomes visible again."""
    o = load_table(spark, SF_DIR, "orders")
    dead = o.filter(F.col("o_orderkey").between(200, 260)).select(
        "o_orderkey"
    )
    orders_table.delete_mor(spark, dead)
    # merge OTHER keys in the same zone: forces the COW rewrite of the
    # sidecar-carrying file.
    upd = o.filter(F.col("o_orderkey").between(261, 299)).withColumn(
        "o_orderstatus", F.lit("U")
    )
    orders_table.merge(spark, upd)
    after = orders_table.read(spark)
    assert after.filter(F.col("o_orderkey").between(200, 260)).count() == 0
    # explicit re-upsert of one deleted key: visible again.
    back = o.filter(F.col("o_orderkey") == 233)
    if back.count():  # key 233 exists at this SF
        orders_table.merge(spark, back)
        assert (
            orders_table.read(spark)
            .filter(F.col("o_orderkey") == 233)
            .count()
            == back.count()
        )


def test_mor_cross_file_sidecar_scoped_to_referencing_files(
    spark, orders_table
):
    """ADVICE r8 (high): a delete_mor batch spanning multiple files
    attaches ONE shared sidecar to every hit file. A later COW
    re-upsert of one deleted key rewrites only that key's file — the
    new file carries no sidecar reference, but sibling files still do,
    and a GLOBAL union anti-join would hide the re-upserted row through
    their reference (measured: the row was silently lost). The read
    must scope each sidecar to the files whose entries list it: the
    re-upserted key is visible again, the other deleted key stays
    hidden, and the total count is exact."""
    o = load_table(spark, SF_DIR, "orders")
    spans = sorted(
        tuple(e["stats"]["o_orderkey"]) for e in orders_table.manifest()
    )
    k1 = spans[0][0]  # zone min of the first file — present by stats
    k2 = spans[4][0]  # a different file's zone — forces a shared sidecar
    n0 = orders_table.read(spark).count()
    stats = orders_table.delete_mor(
        spark, spark.createDataFrame([(k1,), (k2,)], ["o_orderkey"])
    )
    assert stats["files_affected"] == 2  # one sidecar, two referencing files
    orders_table.merge(spark, o.filter(F.col("o_orderkey") == k1))
    after = orders_table.read(spark)
    assert after.filter(F.col("o_orderkey") == k1).count() == 1
    assert after.filter(F.col("o_orderkey") == k2).count() == 0
    assert after.count() == n0 - 1


def test_mor_cross_file_reupsert_surfaces_in_cdf(spark, orders_table):
    """table_changes inherits the sidecar-scoping fix. Diffing from the
    PRE-delete generation to the post-re-upsert one, the post-image
    side reads both the rewritten file (holding the re-upserted key,
    no sidecar ref) and the sibling file (still referencing the shared
    sidecar): under the global-union shape the sibling's reference
    hid the re-upserted row from the post-image, and the CDF emitted a
    phantom `delete` for a key the table still logically holds. Net
    truth: k1 (deleted then re-upserted identically) is NO change;
    k2 is the only delete."""
    o = load_table(spark, SF_DIR, "orders")
    spans = sorted(
        tuple(e["stats"]["o_orderkey"]) for e in orders_table.manifest()
    )
    k1, k2 = spans[0][0], spans[4][0]
    g0 = orders_table.state.current_gen()
    orders_table.delete_mor(
        spark, spark.createDataFrame([(k1,), (k2,)], ["o_orderkey"])
    )
    orders_table.merge(spark, o.filter(F.col("o_orderkey") == k1))
    g2 = orders_table.state.current_gen()
    ch = orders_table.table_changes(spark, g0, g2).collect()
    assert {
        (r["o_orderkey"], r["_change_type"]) for r in ch
    } == {(k2, "delete")}


def test_mor_trickle_delete_debt_is_bounded_by_fold_threshold(
    spark, orders_table
):
    """VERDICT r8 item 4: a 50-batch trickle-delete loop with
    ``fold_threshold=K`` must keep every file's sidecar-reference count
    ≤ K at every commit (the read-side anti-join cost bound), keep the
    logical contents exact throughout, and leave the folded sidecars
    vacuum-reclaimable. A control loop without the threshold shows the
    unbounded stacking the policy exists to stop."""
    K = 5
    spans = sorted(
        tuple(e["stats"]["o_orderkey"]) for e in orders_table.manifest()
    )
    lo0, hi0 = spans[0]
    zone_keys = sorted(
        r["o_orderkey"]
        for r in orders_table.read(spark)
        .filter(F.col("o_orderkey").between(lo0, hi0))
        .select("o_orderkey")
        .collect()
    )
    assert len(zone_keys) >= 100
    n0 = orders_table.read(spark).count()
    deleted = []
    folds = 0
    for i in range(50):
        batch = zone_keys[2 * i : 2 * i + 2]
        stats = orders_table.delete_mor(
            spark,
            spark.createDataFrame([(k,) for k in batch], ["o_orderkey"]),
            fold_threshold=K,
        )
        folds += stats["files_rewritten"]
        deleted += batch
        debt = orders_table.mor_debt()
        assert debt["max_sidecars"] <= K, (i, debt)
    assert folds >= 50 // (K + 1) - 1  # the amortized rewrite actually fires
    after = orders_table.read(spark)
    assert after.count() == n0 - len(deleted)
    assert (
        after.filter(F.col("o_orderkey").isin(deleted)).count() == 0
    )
    # folded sidecars are unreferenced snapshot debris: vacuum reclaims
    # them and the survivors are exactly the still-referenced ones.
    orders_table.vacuum()
    live_refs = {
        os.path.basename(r)
        for e in orders_table.manifest()
        for r in e.get("deletes", ())
    }
    assert set(os.listdir(orders_table.deletes_dir)) == live_refs


def test_mor_trickle_delete_without_threshold_stacks_unbounded(
    spark, orders_table
):
    spans = sorted(
        tuple(e["stats"]["o_orderkey"]) for e in orders_table.manifest()
    )
    lo0, hi0 = spans[0]
    zone_keys = sorted(
        r["o_orderkey"]
        for r in orders_table.read(spark)
        .filter(F.col("o_orderkey").between(lo0, hi0))
        .select("o_orderkey")
        .collect()
    )
    for i in range(8):
        orders_table.delete_mor(
            spark,
            spark.createDataFrame(
                [(zone_keys[i],)], ["o_orderkey"]
            ),
        )
    assert orders_table.mor_debt()["max_sidecars"] == 8


def test_mor_compact_folds_sidecars_and_vacuum_reclaims(
    spark, orders_table
):
    o = load_table(spark, SF_DIR, "orders")
    orders_table.delete_mor(
        spark,
        o.filter(F.col("o_orderkey").between(100, 180)).select(
            "o_orderkey"
        ),
    )
    rows = _sorted_rows(orders_table.read(spark))
    orders_table.compact(spark)
    assert all(
        not e.get("deletes") for e in orders_table.manifest()
    )  # folded into the rewrite
    orders_table.vacuum()
    assert not os.path.isdir(orders_table.deletes_dir) or not os.listdir(
        orders_table.deletes_dir
    )
    assert _sorted_rows(orders_table.read(spark)) == rows


def test_mor_delete_occ_conflict_detected(spark, orders_table):
    """delete_mor is a writer like any other: committing against a
    stale base generation must raise, not silently drop the winner."""
    import pytest as _pytest

    from redix_stream_spark.sources.manifest_table import (
        CommitConflict,
        ManifestTable,
    )

    o = load_table(spark, SF_DIR, "orders")
    w2 = ManifestTable(orders_table.root, "o_orderkey")
    base = w2.state.current_gen()
    entries = w2.manifest(base)
    # winner lands a MOR delete...
    orders_table.delete_mor(
        spark,
        o.filter(F.col("o_orderkey").between(700, 750)).select(
            "o_orderkey"
        ),
    )
    # ...loser planned against the stale base.
    with _pytest.raises(CommitConflict):
        w2._commit(entries, w2.schema(), base_gen=base)


def test_mor_deletes_apply_on_scan_and_lookup_paths(spark, orders_table):
    o = load_table(spark, SF_DIR, "orders")
    orders_table.delete_mor(
        spark,
        o.filter(F.col("o_orderkey").between(1000, 1100)).select(
            "o_orderkey"
        ),
    )
    assert (
        orders_table.scan(spark, "o_orderkey", 1000, 1100).count() == 0
    )
    present = [
        r["o_orderkey"]
        for r in o.filter(
            F.col("o_orderkey").between(1000, 1100)
        ).limit(3).collect()
    ]
    if present:
        assert (
            orders_table.lookup(spark, "o_orderkey", present).count() == 0
        )


def test_mor_pruned_scan_loads_no_sidecar_for_untouched_files(
    spark, orders_table
):
    """Pruning prunes delete keys too: a scan whose zone survivors carry
    no sidecar must plan NO anti-join at all — the sidecar read rides
    only the files it covers."""
    o = load_table(spark, SF_DIR, "orders")
    lo_zone_max = min(
        e["stats"]["o_orderkey"][1] for e in orders_table.manifest()
    )
    # delete keys confined to the LOWEST file's zone
    orders_table.delete_mor(
        spark,
        o.filter(F.col("o_orderkey") <= lo_zone_max // 2).select(
            "o_orderkey"
        ),
    )
    assert any(e.get("deletes") for e in orders_table.manifest())
    hi = max(e["stats"]["o_orderkey"][1] for e in orders_table.manifest())
    plan = orders_table.scan(
        spark, "o_orderkey", hi - 10, hi
    )._jdf.queryExecution().executedPlan().toString()
    assert "Anti" not in plan


def test_mor_delete_where_non_key_predicate_zero_rewrites(
    spark, orders_table
):
    """Predicate MOR delete on a NON-key column: derives the matching
    keys with one read, commits a sidecar, rewrites nothing — the
    'erase this customer's rows' GDPR shape."""
    o = load_table(spark, SF_DIR, "orders")
    before_files = set(os.listdir(orders_table.data_dir))
    want_gone = o.filter(F.col("o_custkey").between(10, 20))
    n_gone = want_gone.count()
    assert n_gone > 0
    stats = orders_table.delete_mor_where(spark, "o_custkey", 10, 20)
    assert stats["files_rewritten"] == 0
    assert set(os.listdir(orders_table.data_dir)) == before_files
    after = orders_table.read(spark)
    assert after.filter(F.col("o_custkey").between(10, 20)).count() == 0
    assert after.count() == o.count() - n_gone


def test_stats_agg_is_metadata_only_and_exact(spark, orders_table):
    """COUNT/MIN/MAX from the manifest alone must equal the scan's
    answer — and must SURVIVE the data files being deleted, which is
    the proof no data file is opened."""
    import shutil as _shutil

    o = load_table(spark, SF_DIR, "orders")
    want = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_orderkey").alias("lo"),
        F.max("o_orderkey").alias("hi"),
    ).collect()[0]
    s = orders_table.stats_agg()
    assert s["rows"] == want["n"]
    assert s["min_o_orderkey"] == want["lo"]
    assert s["max_o_orderkey"] == want["hi"]
    # burn the data: the metadata answer must not notice.
    _shutil.rmtree(orders_table.data_dir)
    assert orders_table.stats_agg() == s


def test_stats_agg_refuses_stale_answer_under_mor_deletes(
    spark, orders_table
):
    o = load_table(spark, SF_DIR, "orders")
    orders_table.delete_mor(
        spark,
        o.filter(F.col("o_orderkey").between(100, 120)).select(
            "o_orderkey"
        ),
    )
    with pytest.raises(ValueError, match="stale"):
        orders_table.stats_agg()
    # compact folds the sidecars; the metadata path reopens and the
    # logical count now reflects the delete.
    n_logical = orders_table.read(spark).count()
    orders_table.compact(spark)
    assert orders_table.stats_agg()["rows"] == n_logical


def test_merge_cdc_mor_routes_delete_only_batches(spark, orders_table):
    """mor_deletes=True: a pure-delete CDC batch commits a sidecar
    (zero files rewritten); a MIXED batch stays one COW commit (its
    deletes ride the rewrite the upserts already pay for)."""
    o = load_table(spark, SF_DIR, "orders")
    before_files = set(os.listdir(orders_table.data_dir))
    del_only = o.filter(F.col("o_orderkey").between(400, 450)).withColumn(
        "op", F.lit("D")
    )
    n_del = del_only.count()
    stats = orders_table.merge_cdc(spark, del_only, mor_deletes=True)
    assert stats["files_rewritten"] == 0
    assert set(os.listdir(orders_table.data_dir)) == before_files
    assert (
        orders_table.read(spark)
        .filter(F.col("o_orderkey").between(400, 450))
        .count()
        == 0
    )
    # mixed batch: ONE COW commit applies both ops.
    g0 = orders_table.state.current_gen()
    mixed = (
        o.filter(F.col("o_orderkey").between(500, 520))
        .withColumn("op", F.lit("D"))
        .unionByName(
            o.filter(F.col("o_orderkey").between(521, 540))
            .withColumn("o_orderstatus", F.lit("M"))
            .withColumn("op", F.lit("U"))
        )
    )
    stats = orders_table.merge_cdc(spark, mixed, mor_deletes=True)
    assert stats["files_rewritten"] >= 1  # COW path, not a sidecar
    assert orders_table.state.current_gen() == g0 + 1  # ONE commit
    after = orders_table.read(spark)
    assert after.filter(F.col("o_orderkey").between(500, 520)).count() == 0
    assert after.filter(F.col("o_orderstatus") == "M").count() == (
        o.filter(F.col("o_orderkey").between(521, 540)).count()
    )
    assert after.count() == o.count() - n_del - o.filter(
        F.col("o_orderkey").between(500, 520)
    ).count()


def test_streaming_upsert_mor_delete_only_batches_skip_rewrites(
    spark, orders_table
):
    """StreamingUpsert(mor_deletes=True): a delete-only micro-batch
    commits a sidecar (zero files rewritten); a mixed batch keeps the
    one-COW-commit contract through merge_cdc."""
    from redix_stream_spark.streaming.upsert import StreamingUpsert

    o = load_table(spark, SF_DIR, "orders")
    su = StreamingUpsert(
        orders_table, order_col="_seq", op_col="op", mor_deletes=True
    )
    before_files = set(os.listdir(orders_table.data_dir))
    dels = (
        o.filter(F.col("o_orderkey").between(600, 640))
        .withColumn("op", F.lit("D"))
        .withColumn("_seq", F.lit(1))
    )
    su.update(dels, epoch_id=0)
    assert set(os.listdir(orders_table.data_dir)) == before_files
    assert (
        orders_table.read(spark)
        .filter(F.col("o_orderkey").between(600, 640))
        .count()
        == 0
    )
    mixed = dels.unionByName(
        o.filter(F.col("o_orderkey") == 650)
        .withColumn("o_orderstatus", F.lit("S"))
        .withColumn("op", F.lit("U"))
        .withColumn("_seq", F.lit(2))
    )
    g0 = orders_table.state.current_gen()
    su.update(mixed, epoch_id=1)
    assert orders_table.state.current_gen() == g0 + 1  # one COW commit
    assert set(os.listdir(orders_table.data_dir)) != before_files
    assert (
        orders_table.read(spark)
        .filter(F.col("o_orderstatus") == "S")
        .count()
        == o.filter(F.col("o_orderkey") == 650).count()
    )


def test_mor_debt_flags_vacuumed_sidecars_instead_of_zero_bytes(
    spark, orders_table
):
    """ADVICE r9: a sidecar dir missing on disk (vacuumed since the
    inspected generation, or externally cleaned) must surface as
    ``missing_sidecars`` — not fold silently into 0 bytes and
    understate the debt."""
    import shutil

    o = load_table(spark, SF_DIR, "orders")
    orders_table.delete_mor(
        spark,
        o.filter(F.col("o_orderkey").between(100, 140)).select("o_orderkey"),
    )
    debt = orders_table.mor_debt()
    assert debt["files_with_debt"] >= 1
    assert debt["missing_sidecars"] == 0
    assert all(p["missing_sidecars"] == 0 for p in debt["per_file"])
    assert sum(p["sidecar_bytes"] for p in debt["per_file"]) > 0
    # Simulate the vacuumed-sidecar state: remove the dirs from disk.
    for name in os.listdir(orders_table.deletes_dir):
        shutil.rmtree(os.path.join(orders_table.deletes_dir, name))
    debt2 = orders_table.mor_debt()
    assert debt2["missing_sidecars"] == debt["total_refs"] > 0
    assert sum(p["sidecar_bytes"] for p in debt2["per_file"]) == 0


def test_mor_read_rejects_reserved_internal_columns(spark, tmp_path):
    """ADVICE r9: the MOR read path's temp columns (_dfile/_dk/_dfk/
    _sdir) are reserved — a user table whose schema shadows one must
    fail loudly at read time (with deletes present) instead of having
    its data column silently overwritten and dropped."""
    tbl = ManifestTable(str(tmp_path / "clash"), "k")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("_dfile")
    )
    tbl.write(df, target_files=2)
    # Without delete sidecars the reserved names never materialize.
    assert tbl.read(spark).count() == 100
    tbl.delete_mor(spark, spark.createDataFrame([(3,), (7,)], ["k"]))
    with pytest.raises(ValueError, match="reserved internal column"):
        tbl.read(spark).count()

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

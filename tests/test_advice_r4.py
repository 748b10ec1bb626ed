"""Regression pins for the round-3 ADVICE findings (ADVICE.md, r4):

1. q124's oracle SQL halved the median for ODD-count groups (the two
   middle ranks coincide, the mids CTE selected that row once, and
   SUM·0.5 yielded value/2). The sf0.01 gate passed only because every
   l_returnflag group there is even-sized.
2. q131's Spark bigram expr emitted phantom NULL rows for single-token
   documents (sequence(1, 0) defaults to step −1 → [1, 0]).
3. q122/q127's second window ordered by ts alone, leaving interval
   assignment underdetermined under tied timestamps; the streaming SCD2
   id-recovery join could attach the wrong event's id at a ts tie.
4. StreamingHeavyHitters.compact() loss ACCUMULATES across compactions;
   unbounded compaction could silently break the no-false-negative
   candidate guarantee.

Each test here fails against the pre-fix code.
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pandas as pd
import pyspark.sql.functions as F

from tests.oracle_check import compare


def test_q124_oracle_exact_on_odd_group():
    # group of 3 with median 3: the pre-fix oracle returned 1.5
    from redix_stream_spark.operators.analytics import Q124_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lineitem AS SELECT * FROM (VALUES "
        "(1,1,CAST(1 AS DECIMAL(15,2)),'A'),"
        "(2,1,CAST(3 AS DECIMAL(15,2)),'A'),"
        "(3,1,CAST(9 AS DECIMAL(15,2)),'A'),"
        "(4,1,CAST(2 AS DECIMAL(15,2)),'B'),"
        "(5,1,CAST(4 AS DECIMAL(15,2)),'B')) "
        "t(l_orderkey,l_linenumber,l_quantity,l_returnflag)"
    )
    rows = dict(
        (r[0], (r[1], r[2])) for r in con.execute(Q124_SQL).fetchall()
    )
    assert rows == {"A": (3, 3.0), "B": (2, 3.0)}


def test_q124_spark_matches_oracle_on_odd_groups(spark, tmp_path):
    from redix_stream_spark.operators.analytics import (
        Q124_SQL,
        q124_exact_group_median,
    )

    pdf = pd.DataFrame(
        {
            "l_orderkey": [1, 2, 3, 4, 5, 6, 7],
            "l_linenumber": [1] * 7,
            "l_quantity": [1.0, 3.0, 9.0, 2.0, 4.0, 4.0, 8.0],
            "l_returnflag": ["A", "A", "A", "B", "B", "B", "B"],
        }
    )
    tmp = str(tmp_path / "q124")
    os.makedirs(tmp, exist_ok=True)
    pdf.assign(
        l_quantity=pdf.l_quantity.astype("float64")
    ).to_parquet(os.path.join(tmp, "lineitem.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT l_orderkey, l_linenumber, "
        "CAST(l_quantity AS DECIMAL(15,2)) AS l_quantity, l_returnflag "
        f"FROM read_parquet('{tmp}/lineitem.parquet')"
    )
    # Spark face reads through load_table (plain parquet): cast to match
    sdf = q124_exact_group_median(spark, tmp).toPandas()
    odf = con.execute(Q124_SQL).fetchdf()
    assert compare(sdf, odf) == []


def test_q131_single_token_doc_emits_no_phantom_bigrams(spark, tmp_path):
    from redix_stream_spark.llm.text import Q131_SQL

    tmp = str(tmp_path / "docs")
    os.makedirs(tmp, exist_ok=True)
    pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["solo", "a b a", ""]}
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    import __spark_entry__ as ent

    sdf = ent.queries()["q131_token_bigrams"](spark, tmp).toPandas()
    # no NULL tokens ever (the phantom [1, 0] rows carried NULL w1/w2)
    assert not sdf["w1"].isna().any() and not sdf["w2"].isna().any()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp}/documents.parquet')"
    )
    assert compare(sdf, con.execute(Q131_SQL).fetchdf()) == []


def test_scd2_tied_timestamps_are_deterministic_cross_engine(spark):
    from redix_stream_spark.operators.analytics import Q122_SQL, scd2_intervals

    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 1, 2)
    rows = [
        # two state changes at the SAME ts — pre-fix, effective_to
        # assignment between them was engine-dependent
        (1, "a", t0, 10),
        (1, "b", t0, 11),
        (1, "a", t1, 12),
        (2, "x", t0, 20),
    ]
    e = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp_ntz, event_id long"
    )
    sdf = scd2_intervals(e).drop("event_id").toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events(user_id BIGINT, event_type VARCHAR, "
        "ts TIMESTAMP, event_id BIGINT)"
    )
    con.executemany("INSERT INTO events VALUES (?,?,?,?)", rows)
    assert compare(sdf, con.execute(Q122_SQL).fetchdf()) == []
    # the tie resolves by event_id: interval 'a'@t0 closes at t0 (zero
    # length), 'b'@t0 runs to t1
    by_key = {
        (r.user_id, r.event_type, r.effective_from): r.effective_to
        for r in sdf.itertuples()
    }
    assert by_key[(1, "a", pd.Timestamp(t0))] == pd.Timestamp(t0)
    assert by_key[(1, "b", pd.Timestamp(t0))] == pd.Timestamp(t1)


def test_streaming_scd2_open_interval_keeps_its_event_id(spark, tmp_path):
    # ts tie in the OPEN interval: the id must be the interval-opening
    # event's id (pre-fix, the (user, ts) recovery join min'd across the
    # tie and could attach the other event's id)
    from redix_stream_spark.streaming.scd2 import StreamingScd2View

    t0 = dt.datetime(2024, 1, 1)
    batch = spark.createDataFrame(
        [(1, "a", t0, 7), (1, "b", t0, 9)],
        "user_id long, event_type string, ts timestamp_ntz, event_id long",
    )
    view = StreamingScd2View(spark, str(tmp_path / "scd2"))
    view.ingest_batch(batch, 0)
    open_rows = spark.read.parquet(
        str(tmp_path / "scd2" / "open" / "epoch=0")
    ).collect()
    assert len(open_rows) == 1
    r = open_rows[0]
    # (ts, event_id) order: 'b' (id 9) is the later change, so it is the
    # open state and carries ITS OWN id
    assert (r.event_type, r.event_id) == ("b", 9)


def test_heavy_hitter_compaction_budget_enforced(spark, tmp_path):
    import pytest

    from redix_stream_spark.llm.stream_heavy import (
        COMPACT_BUDGET,
        MG_COUNTERS,
        StreamingHeavyHitters,
    )

    assert COMPACT_BUDGET >= 1  # sanity: 3 for MG_COUNTERS = 4·HH_K
    hh = StreamingHeavyHitters(spark, str(tmp_path / "hh"))
    # tokens spread wide so every fold overflows MG_COUNTERS and forces a
    # LOSSY reduce; two epochs before each compact so there is a fold
    def feed(epoch):
        toks = [(f"tok{epoch}_{i}",) for i in range(MG_COUNTERS * 3)]
        hh.ingest_batch(
            spark.createDataFrame(toks, "token string"), epoch
        )

    epoch = 0
    for _ in range(COMPACT_BUDGET):
        feed(epoch)
        feed(epoch + 1)
        epoch += 2
        hh.compact()  # lossy, within budget
    feed(epoch)
    feed(epoch + 1)
    with pytest.raises(RuntimeError, match="budget exhausted"):
        hh.compact()
    # lossless compaction (reduce_to large enough to skip the cut) is
    # still allowed — it consumes no budget
    hh.compact(reduce_to=1 << 30)
    assert hh.candidates().count() > 0


def test_q127_hot_day_fixture_adaptive_cells_bound_fanout(spark):
    # Planted hot day: 200 users all in an 'error' state inside ONE
    # calendar day (short, ~30-min intervals). With 1-day cells the
    # whole day lands in one cell — per-cell actives = 200 and the
    # binned join degenerates toward all-pairs for that cell. The
    # adaptive width (median interval duration) shrinks cells to ~30
    # minutes, bounding per-cell actives near the true concurrency,
    # while the RESULT stays identical at any width (binning is
    # engine-internal).
    import pyspark.sql.functions as F

    from redix_stream_spark.operators.analytics import (
        error_intervals,
        overlap_cells,
        overlap_pairs,
        pick_overlap_cell_seconds,
    )

    base = dt.datetime(2024, 3, 7)
    rows = []
    eid = 0
    for u in range(200):
        start_min = (u * 7) % (24 * 60 - 40)
        rows.append((u, "error", base + dt.timedelta(minutes=start_min), eid))
        eid += 1
        rows.append(
            (u, "ok", base + dt.timedelta(minutes=start_min + 30), eid)
        )
        eid += 1
    e = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp_ntz, event_id long"
    )
    err = error_intervals(e).cache()
    assert err.count() == 200

    def max_actives(cell_seconds):
        return (
            overlap_cells(err, cell_seconds)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n"))
            .head()[0]
        )

    assert max_actives(86_400) == 200  # the hot-day degeneration
    width = pick_overlap_cell_seconds(err)
    assert 60 <= width <= 3600, width  # adapts to ~30-min intervals
    bounded = max_actives(width)
    assert bounded <= 20, bounded  # fanout bounded near true concurrency
    # and the pair RESULT is width-invariant
    day_pairs = {
        tuple(r) for r in overlap_pairs(err, 86_400).collect()
    }
    adaptive_pairs = {
        tuple(r) for r in overlap_pairs(err, width).collect()
    }
    assert day_pairs == adaptive_pairs and day_pairs
    err.unpersist()


def test_q135_udtf_passage_edges(spark, tmp_path):
    # UDTF face edge cases: a sub-width doc yields one short passage, an
    # exact-width doc exactly one full one, a spaceless doc one 1-token
    # passage — Spark UDTF and the DuckDB range/list-slice oracle agree.
    import duckdb as _duck

    from redix_stream_spark.functions.udfs import (
        Q135_SQL,
        UDTF_PASSAGE_TOKENS,
        q135_udtf_passages,
    )

    w = UDTF_PASSAGE_TOKENS
    tmp = str(tmp_path / "docs")
    os.makedirs(tmp, exist_ok=True)
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                " ".join(f"t{i}" for i in range(w + 3)),  # w + remainder
                " ".join(f"u{i}" for i in range(w)),      # exactly w
                "solo",                                    # 1 token
            ],
        }
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    sdf = q135_udtf_passages(spark, tmp).toPandas()
    con = _duck.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp}/documents.parquet')"
    )
    assert compare(sdf, con.execute(Q135_SQL).fetchdf()) == []
    by_doc = sdf.groupby("doc_id").n_tokens.agg(["count", "sum"])
    assert tuple(by_doc.loc[1]) == (2, w + 3)
    assert tuple(by_doc.loc[2]) == (1, w)
    assert tuple(by_doc.loc[3]) == (1, 1)

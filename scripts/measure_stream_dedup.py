"""Measure StreamingNearDupFilter batch latency vs index size, path
layout vs bucketed-table layout (SCALING.md "streaming near-dup filter"
section; run alone — a concurrent Spark JVM corrupts the timings).

Workload: 20 sequential batches of the sf0.1 documents table (5 000 docs
each). Every token is suffixed per-batch so batches are genuinely novel
text (the index must GROW — the interesting regime), except docs with
doc_id % 10 == 0, which reuse the previous batch's suffix and are exact
near-dups of accepted history (exercising the hit/drop path every batch).
Demo MinHash width (16/4) for comparability with the round-2 10-batch
run.

Usage: python scripts/measure_stream_dedup.py [path|bucketed|both] [--nobroadcast]

--nobroadcast simulates the at-scale regime: a real claimed-bands index
(10^10 rows at 100 TB) can never broadcast, but at this toy scale it
always would — auto-broadcast off forces the hit-join to take the plan
it takes at scale (path: full index reshuffle per batch; bucketed:
Exchange-free index read, batch side shuffles into the layout).
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from redix_stream_spark.catalog import load_table
from redix_stream_spark.llm.dedup import N_BANDS, PERM_PARAMS
from redix_stream_spark.llm.stream_dedup import StreamingNearDupFilter
from redix_stream_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
N_BATCHES = 20


def batch_df(base, i: int):
    toks = F.split("text", " ")
    suffix = F.when(
        (F.col("doc_id") % 10 == 0) & (F.lit(i) > 0), F.lit(f"_b{i - 1}")
    ).otherwise(F.lit(f"_b{i}"))
    mutated = F.concat_ws(
        " ", F.transform(toks, lambda t: F.concat(t, suffix))
    )
    return base.select(
        (F.col("doc_id") + i * 100_000).alias("doc_id"),
        mutated.alias("text"),
    )


def run(spark, base, layout: str) -> None:
    tmp = tempfile.mkdtemp(prefix=f"nd_{layout}_")
    tbl = "nd_measure_idx"
    if layout == "bucketed":
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        f = StreamingNearDupFilter(
            index_path=tmp + "/bands",
            accepted_path=tmp + "/accepted",
            params=PERM_PARAMS,
            n_bands=N_BANDS,
            index_table=tbl,
            n_index_buckets=32,
        )
    else:
        f = StreamingNearDupFilter(
            index_path=tmp + "/bands",
            accepted_path=tmp + "/accepted",
            params=PERM_PARAMS,
            n_bands=N_BANDS,
        )
    print(f"== layout={layout} ==")
    total = 0.0
    for i in range(N_BATCHES):
        b = batch_df(base, i)
        t0 = time.perf_counter()
        f.apply_batch(b, i)
        dt = time.perf_counter() - t0
        total += dt
        if i in (0, 4, 9, 14, 19):
            rows = f._claimed(spark).count()
            print(f"batch {i:2d}: {dt:6.2f}s  index_rows={rows}")
        else:
            print(f"batch {i:2d}: {dt:6.2f}s")
    acc = f.accepted(spark).count()
    print(f"total {total:.1f}s  accepted={acc}")
    if layout == "bucketed":
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    which = args[0] if args else "both"
    spark = get_spark("stream-dedup-measure")
    spark.sparkContext.setLogLevel("ERROR")
    if "--nobroadcast" in sys.argv:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        print("(auto-broadcast disabled: at-scale join plans)")
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text").cache()
    base.count()
    for layout in (["path", "bucketed"] if which == "both" else [which]):
        run(spark, base, layout)
    spark.stop()


if __name__ == "__main__":
    main()

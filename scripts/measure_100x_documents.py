"""100× documents spot-check at CONSTANT near-dup density: do the
document-table operators' growth shapes hold two orders of magnitude
past the bench SF?

The bench's 10× replica clones document text verbatim, so every doc
gains 9 exact copies and pair counts explode quadratically — useful as
a worst-case, but it measures the dup explosion, not the operator. Here
each replica tags EVERY token with a replica suffix: a bijective token
rename, so within-replica shingle/MinHash/postings structure is
EXACTLY the original's and cross-replica similarity is zero — 100×
more data at the same dup density, which is what a 100× bigger crawl
looks like.

Usage: python scripts/measure_100x_documents.py   (→ stdout; recorded
in SCALING.md "100× documents spot-check")
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from pyspark.sql import functions as F  # noqa: E402

from build_scale_replica import KEY_STRIDE  # noqa: E402
from redix_stream_spark import registry  # noqa: E402
from redix_stream_spark.catalog import load_table  # noqa: E402
from redix_stream_spark.session import get_spark  # noqa: E402

OUT = "/tmp/spark_graft_docs{f}x"

QUERIES = [
    "q36_minhash_lsh_neardup",
    "q80_neardup_clusters",
    "q107_containment_dup",
]


def ensure_docs_replica(spark, factor: int) -> str:
    out = OUT.format(f=factor)
    marker = os.path.join(out, "_built")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    d = load_table(spark, "/root/testdata/sf0.1", "documents")
    parts = []
    for r in range(factor):
        parts.append(
            d.select(
                (F.col("doc_id") + r * KEY_STRIDE).alias("doc_id"),
                # bijective per-replica token rename: every token gets
                # a "~r<i>" suffix, preserving all within-replica
                # structure while zeroing cross-replica overlap
                F.regexp_replace(F.col("text"), r"(\S+)", f"$1~r{r}").alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.repartition(max(8, factor)).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    for name in os.listdir("/root/testdata/sf0.1"):
        if name != "documents.parquet":
            dst = os.path.join(out, name)
            if not os.path.exists(dst):
                os.symlink(os.path.join("/root/testdata/sf0.1", name), dst)
    open(marker, "w").write("ok")
    return out


def main() -> None:
    spark = get_spark("docs-100x")
    spark.sparkContext.setLogLevel("ERROR")
    d10 = ensure_docs_replica(spark, 10)
    d100 = ensure_docs_replica(spark, 100)
    Q = registry.all_queries()
    for name in QUERIES:
        Q[name](spark, d10).write.format("noop").mode("overwrite").save()  # warm
        times = {}
        for label, dirp in (("10x", d10), ("100x", d100)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            Q[name](spark, dirp).write.format("noop").mode("overwrite").save()
            times[label] = round(time.perf_counter() - t0, 2)
        print(
            f"{name}: 10x={times['10x']}s 100x={times['100x']}s "
            f"growth={round(times['100x'] / times['10x'], 1)}x",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

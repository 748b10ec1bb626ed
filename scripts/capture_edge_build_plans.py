"""Capture the EDGE-BUILD plans behind the eager checkpoints (r12 §5).

The graph faces materialize their edge relation eagerly, so the faces'
explain("formatted") shows only `Scan ExistingRDD` — the
union→explode-mirror change lives in the checkpoint BUILD plan. This
script explains that build for the trade graph: the `after` form is the
live `_edges_encoded` (one explode over one join+distinct); the
`before` form is the pre-r12 union-of-two-projections, reconstructed
inline from the same parameterized `pairs` derivation so the diff shows
exactly the branch duplication (lineitem+orders scans 2+2 → 1+1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from redix_stream_spark.catalog import load_table
from redix_stream_spark.operators.graph import _edges_encoded
from redix_stream_spark.plans import formatted_plan
from redix_stream_spark.session import get_spark


def union_form(spark, sf_dir):
    """The pre-r12 symmetrization: fwd.union(rev) over the pair build."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("o_custkey").cast("long") * 2).alias("c"),
            (F.col("l_suppkey").cast("long") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    rev = pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    return fwd.union(rev)


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    spark = get_spark("edge-build-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name, df in (
        ("q144_edge_build_before", union_form(spark, sf_dir)),
        ("q144_edge_build_after", _edges_encoded(spark, sf_dir)),
    ):
        path = os.path.join(out_dir, f"{name}.txt")
        with open(path, "w") as f:
            f.write(formatted_plan(df))
        scans = sum(
            1
            for line in open(path)
            if "Location" in line
            and ("lineitem" in line or "orders" in line)
        )
        print(f"{path}: {scans} fact scans")
    spark.stop()


if __name__ == "__main__":
    main()

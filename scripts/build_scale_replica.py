"""Build an sf1-equivalent replica of the sf0.1 testdata (10× facts,
disjoint key/time ranges per replica) for the large-scale bench mode.

Replication keeps dimension keys intact so star joins still resolve:
fact primary keys are offset per replica (order keys, event ids, doc
ids, vec ids), foreign keys into dimensions are untouched, and event
timestamps shift by a full span+gap per replica so time-window and
range-join outputs grow linearly (cloned timestamps would grow pair
counts quadratically — measured in SCALING.md).

Reusable: ``ensure_replica(spark)`` builds once and caches by a marker
file; subsequent bench runs just read it. ~6M lineitem / 1M events /
50k documents — the scale where plans (not fixed overhead) dominate.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

FACTOR = 10
DEFAULT_OUT = "/tmp/spark_graft_sf1"
KEY_STRIDE = 1_000_000_000  # beyond any sf0.1 key range


def _span_and_gap(events):
    row = events.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    span = (row["hi"] - row["lo"]).total_seconds()
    return int(span) + 3600


def build_replica(
    spark: SparkSession, sf_dir: str = "/root/testdata/sf0.1", out: str = DEFAULT_OUT
) -> str:
    from redix_stream_spark.catalog import TABLES, load_table, table_path

    os.makedirs(out, exist_ok=True)
    dims = ("region", "nation", "customer", "supplier", "part")
    for name in dims:
        load_table(spark, sf_dir, name).write.mode("overwrite").parquet(
            table_path(out, name)
        )

    offsets = {
        "orders": ("o_orderkey",),
        "lineitem": ("l_orderkey",),
        "documents": ("doc_id",),
        "embeddings": ("vec_id",),
        "events": ("event_id",),
    }
    ev_shift = _span_and_gap(load_table(spark, sf_dir, "events"))
    for name, keys in offsets.items():
        base = load_table(spark, sf_dir, name)
        for i in range(FACTOR):
            df = base
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(i * KEY_STRIDE))
            if name == "events":
                df = df.withColumn(
                    "ts",
                    F.col("ts") + F.make_interval(secs=F.lit(i * ev_shift)),
                )
            df.write.mode("overwrite" if i == 0 else "append").parquet(
                table_path(out, name)
            )
    assert set(dims) | set(offsets) == set(TABLES)
    with open(os.path.join(out, "_COMPLETE"), "w") as f:
        f.write(f"factor={FACTOR} from={sf_dir}\n")
    return out


def ensure_replica(
    spark: SparkSession, sf_dir: str = "/root/testdata/sf0.1", out: str = DEFAULT_OUT
) -> str:
    if os.path.exists(os.path.join(out, "_COMPLETE")):
        return out
    return build_replica(spark, sf_dir, out)


if __name__ == "__main__":
    from redix_stream_spark.session import get_spark

    spark = get_spark("build-scale-replica")
    spark.sparkContext.setLogLevel("ERROR")
    print(build_replica(spark))
    spark.stop()

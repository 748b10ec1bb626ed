"""sf10 spot block: growth exponents 1× → 10× → 100× for the
scale-critical faces (VERDICT r8 item 1 — the 100×-scale evidence).

One replica recipe at every factor, density-preserving per the round-4
lesson (SCALING.md "the round-4 events table mixed a densified 10×
against a disjoint 100× and the growth ratios were shape, not scale"):

- documents: doc_id offset + bijective per-replica token rename
  ("~r<i>" suffix) — within-replica shingle/MinHash/postings structure
  is exactly the original's, cross-replica similarity zero. 100× data
  at CONSTANT dup density = a 100× bigger crawl, not a dup explosion.
- embeddings: vec_id offset + per-replica deterministic SIGN FLIP per
  dimension (md5-derived): an orthogonal transform, so within-replica
  inner products/distances are bit-preserved and cross-replica
  similarity decorrelates — 100× vectors at constant neighborhood
  density.
- events: event_id AND user_id offset + full-span time shift per
  replica — per-user history density constant, window/range outputs
  grow linearly.
- orders/lineitem: order keys offset; o_custkey and l_suppkey offset
  too so the q176b co-purchase graph is 100 disjoint copies (constant
  degree distribution — cloned customer keys would grow hub degrees
  100× and measure the data's quadratic wedge growth, not the
  operator's).
- dimensions symlink as-is.

Every factor uses the SAME transforms (factor 1 included), so the
measured ratios isolate the operators. Faces: q36b q80b q107 q121b
q173 q176b q190b q196. Output: stdout table + scripts/sf10_spot.json
(bench.py folds it into bench_full.json as the `sf10` block).

Usage:  SPARK_GRAFT_DRIVER_MEM=16g python scripts/measure_sf10.py
        (~15-25 min; re-run on demand — this is a maintenance-window
        measurement, not a per-round gate; the per-round gates stay at
        sf0.1/sf1 where the bench budget lives.)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from pyspark.sql import functions as F  # noqa: E402

from redix_stream_spark import registry  # noqa: E402
from redix_stream_spark.catalog import load_table, table_path  # noqa: E402
from redix_stream_spark.session import get_spark  # noqa: E402

KEY_STRIDE = 1_000_000_000
OUT = "/tmp/spark_graft_sfx{f}"
SRC = "/root/testdata/sf0.1"

FACES = [
    "q36b_minhash_production",
    "q80b_neardup_clusters_star",
    "q107_containment_dup",
    "q121b_pq_ann_production",
    "q173_incremental_clusters",
    "q176b_link_prediction_capped",
    "q190b_layout_advisor_sampled",
    "q196_mor_delete",
    # round-10 extensions (merged via --only into sf10_spot.json)
    "q107b_containment_budgeted",
    "q195b_audience_overlap_prefiltered",
    "q204_personalized_pagerank",
    "q162_image_neardup",
    # round-11: the DC-decode production face next to its exact twin,
    # and the text SimHash face after its combination-key re-plan
    "q162b_image_neardup_fast",
    "q38b_simhash_weighted",
    # round-12: the corpus-adaptive production LSH faces (bits ladder —
    # the r11 weak marks; demo twins measured 190 s/24x and 117 s/10x+
    # per decade, excluded from this block by quadratic cost)
    "q169b_knn_graph_production",
    "q174b_density_clusters_production",
    # round-12 extension: exact-substring dedup (linear per-token
    # shuffle) and its winnowed 2/(S+1)-sampled production twin
    "q211_exact_substring_dedup",
    "q211b_exact_substring_winnowed",
    # round-12 optimization: first rows for the two iterative graph
    # faces rebuilt on long node ids + explode-mirrored edges (§5/§6 of
    # OPTIMIZATION_r12.md). NOT yet measured: the r12-opt session's host
    # read 100x jobs 2-4x slower than the block's reference host with
    # ±2x run-to-run variance (controls: q211 unchanged code 61-69 s vs
    # its 17.35 s row; pre-§5 q204 360 s vs its own 45.6 s row —
    # SCALING.md "Round-12 optimization: the 100x host-drift autopsy"),
    # so --only rows taken there would be incomparable garbage. Measure
    # these at the next maintenance window on a host whose controls
    # land near their rows.
    "q156_kcore_decomposition",
    "q157_bfs_levels",
]


def _ev_shift(spark) -> int:
    row = (
        load_table(spark, SRC, "events")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()[0]
    )
    return int((row["hi"] - row["lo"]).total_seconds()) + 3600


def _replicate(df, factor: int):
    """Cross the frame with a broadcast replica index — one scan, no
    100-branch union plan."""
    r = F.broadcast(
        df.sparkSession.range(factor).select(F.col("id").alias("_r"))
    )
    return df.crossJoin(r)


def ensure_sfx(spark, factor: int) -> str:
    out = OUT.format(f=factor)
    marker = os.path.join(out, "_built")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    off = (F.col("_r") * KEY_STRIDE).cast("long")
    shift = _ev_shift(spark)

    d = _replicate(load_table(spark, SRC, "documents"), factor).select(
        (F.col("doc_id") + off).alias("doc_id"),
        F.regexp_replace(
            F.col("text"),
            F.lit(r"(\S+)"),
            F.concat(F.lit("$1~r"), F.col("_r").cast("string")),
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    d.repartition(max(8, factor)).write.mode("overwrite").parquet(
        table_path(out, "documents")
    )

    e = _replicate(load_table(spark, SRC, "embeddings"), factor).select(
        (F.col("vec_id") + off).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> CAST(CASE WHEN "
            "conv(substr(md5(concat(_r, ':', i)), 1, 1), 16, 10) % 2 = 0 "
            "THEN x ELSE -x END AS FLOAT))"
        ).alias("embedding"),
        "label",
    )
    e.repartition(max(4, factor // 4)).write.mode("overwrite").parquet(
        table_path(out, "embeddings")
    )

    ev = _replicate(load_table(spark, SRC, "events"), factor).select(
        (F.col("event_id") + off).alias("event_id"),
        (F.col("ts") + F.make_interval(secs=F.col("_r") * shift)).alias("ts"),
        (F.col("user_id") + off).alias("user_id"),
        "event_type",
        "value",
    )
    ev.repartition(max(8, factor)).write.mode("overwrite").parquet(
        table_path(out, "events")
    )

    o = load_table(spark, SRC, "orders")
    oc = [c for c in o.columns if c not in ("o_orderkey", "o_custkey")]
    _replicate(o, factor).select(
        (F.col("o_orderkey") + off).alias("o_orderkey"),
        (F.col("o_custkey") + off).alias("o_custkey"),
        *oc,
    ).repartition(max(8, factor)).write.mode("overwrite").parquet(
        table_path(out, "orders")
    )

    li = load_table(spark, SRC, "lineitem")
    lc = [c for c in li.columns if c not in ("l_orderkey", "l_suppkey")]
    _replicate(li, factor).select(
        (F.col("l_orderkey") + off).alias("l_orderkey"),
        (F.col("l_suppkey") + off).alias("l_suppkey"),
        *lc,
    ).repartition(max(8, factor)).write.mode("overwrite").parquet(
        table_path(out, "lineitem")
    )

    for name in os.listdir(SRC):
        base = name.split(".")[0]
        if base in ("documents", "embeddings", "events", "orders", "lineitem"):
            continue
        dst = os.path.join(out, name)
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, name), dst)
    open(marker, "w").write(f"factor={factor} recipe=density-preserving\n")
    return out


def main(only: list[str] | None = None) -> None:
    """Measure all FACES, or — with ``--only name1,name2`` — just those
    faces, MERGING their rows into the existing sf10_spot.json (the
    round-10 extension mode: new faces join the block without re-paying
    the full 8-face measurement)."""
    spark = get_spark("sf10-spot")
    spark.sparkContext.setLogLevel("ERROR")
    dirs = {f: ensure_sfx(spark, f) for f in (1, 10, 100)}
    print("replicas ready:", dirs, flush=True)
    Q = registry.all_queries()
    results: dict[str, dict] = {}
    faces = only if only else FACES
    unknown = [n for n in faces if n not in Q]
    if unknown:
        raise SystemExit(f"unknown faces: {unknown}")
    failures: dict[str, str] = {}
    for name in faces:
        fn = Q[name]
        try:
            fn(spark, dirs[1]).write.format("noop").mode("overwrite").save()  # warm
            row: dict = {}
            for f in (1, 10, 100):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, dirs[f]).write.format("noop").mode("overwrite").save()
                row[f"t{f}x"] = round(time.perf_counter() - t0, 2)
        except Exception as e:  # noqa: BLE001 — a face failing at 100x IS a result
            failures[name] = f"{type(e).__name__}: {e}"
            print(f"{name}: FAILED — {failures[name]}", flush=True)
            continue
        # growth exponent over each decade: e = log10(t_hi / t_lo);
        # e <= 1 is at-most-linear in rows for the 10x row growth.
        row["exp_1_10"] = round(math.log10(max(row["t10x"], 1e-9) / max(row["t1x"], 1e-9)), 2)
        row["exp_10_100"] = round(
            math.log10(max(row["t100x"], 1e-9) / max(row["t10x"], 1e-9)), 2
        )
        results[name] = row
        print(
            f"{name}: 1x={row['t1x']}s 10x={row['t10x']}s 100x={row['t100x']}s "
            f"exp(1-10)={row['exp_1_10']} exp(10-100)={row['exp_10_100']}",
            flush=True,
        )
    payload = {
        "scale": "sf0.1 x{1,10,100} density-preserving replicas",
        "recipe": "measure_sf10.py",
        "queries": results,
    }
    out = os.path.join(ROOT, "scripts", "sf10_spot.json")
    if only and os.path.exists(out):
        with open(out) as fh:
            prev = json.load(fh)
        prev["queries"].update(results)
        payload = prev
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print("wrote scripts/sf10_spot.json", flush=True)
    # Stop the JVM BEFORE any failure exit — a SystemExit that leaves the
    # driver JVM running violates the no-concurrent-Spark-JVM rule (ADVICE r10).
    spark.stop()
    if failures:
        raise SystemExit(f"faces failed (measured rows still written): {failures}")


if __name__ == "__main__":
    only = None
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        only = sys.argv[2].split(",")
    main(only)

"""Stopword-skew measurement for the token⋈frequency joins (q82/q86).

Fixture: a Zipf-pathological token table where ONE token ("the") is 50%
of all token occurrences — the worst stopword case. 12M token rows over
200k docs, 50k-word tail vocabulary. The q82 join shape (tokens ⋈
per-token frequency, then doc-keyed aggregate) is timed under three
physical strategies:

  broadcast  — frequency side broadcast (what AQE picks while the vocab
               fits the threshold; the small-vocab plan)
  aqe_smj    — auto-broadcast disabled (simulating a 10^8-token vocab at
               100 TB where freq cannot broadcast); AQE's skew-join
               splits the hot partition at runtime
  salted     — plans.skew.salted_join with 16 salts, AQE skew split off
               (the explicit fallback)

Run alone (single Spark JVM). Results → SCALING.md "stopword skew".
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from redix_stream_spark.plans.skew import salted_join
from redix_stream_spark.session import get_spark

N_TOK = 12_000_000
N_DOCS = 200_000
TAIL_VOCAB = 50_000


def token_frame(spark):
    base = spark.range(N_TOK)
    tok = base.select(
        (F.col("id") % N_DOCS).alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit("the"))
        .otherwise(
            F.concat(F.lit("w"), (F.xxhash64("id") % TAIL_VOCAB).cast("string"))
        )
        .alias("token"),
    )
    return tok


def rarity_agg(tok, freq, join_fn):
    joined = join_fn(tok, freq)
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("cnt").alias("sum_corpus_freq"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).alias("n_hapax"),
    )


def timed(spark, name, df):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"{name:10s} {time.perf_counter() - t0:6.2f}s")


def main() -> None:
    spark = get_spark("token-skew-measure")
    spark.sparkContext.setLogLevel("ERROR")
    tok = token_frame(spark).cache()
    tok.count()
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt")).cache()
    freq.count()

    # warm codegen
    rarity_agg(tok, freq, lambda t, f: t.join(f, "token")).write.format(
        "noop"
    ).mode("overwrite").save()

    timed(
        spark,
        "broadcast",
        rarity_agg(tok, freq, lambda t, f: t.join(F.broadcast(f), "token")),
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    timed(
        spark,
        "aqe_smj",
        rarity_agg(tok, freq, lambda t, f: t.join(f, "token")),
    )

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    timed(
        spark,
        "smj_noaqe",
        rarity_agg(tok, freq, lambda t, f: t.join(f, "token")),
    )
    timed(
        spark,
        "salted",
        rarity_agg(tok, freq, lambda t, f: salted_join(t, f, "token", 16)),
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    spark.stop()


if __name__ == "__main__":
    main()

"""Training-data ordering and weighted sampling: the epoch shuffle and
probability-proportional-to-size (PPS) sampler a 100 TB corpus pipeline
runs between curation and tokenization.

Two faces, both DETERMINISTIC by construction (the q85 never-rand()
rule — re-runs, backfills, and cross-engine re-reads must agree on every
row):

- q175_epoch_shuffle: the global random-order + shard assignment a
  training run consumes. Order and placement derive from md5(seed ‖
  doc_id), so epoch N is reproducible from its seed alone and epoch N+1
  is a different-but-equally-uniform permutation. No global sort exists:
  shards come from hash bits (map-side) and within-shard positions from
  a SHARD-partitioned rank window — the only total order ever
  materialized is per shard, which is exactly what a data loader reads.

- q183_pps_sample: systematic ∝-size sampling (Madow 1949) — walk the
  corpus in a hashed order accumulating weight, take a draw every
  total/TARGET of cumulative weight. Size-biased but exactly TARGET
  draws, zero variance in sample size, and every unit with weight ≥ the
  step is drawn with certainty — the properties quota/Bernoulli samplers
  (q88) lack. All arithmetic is integer (cross-multiplied floor
  comparisons, no float step), so the draw set is hash-verifiable.

Reference parity note: the reference engine (hayesgm/redix_stream,
consumer.ex) has no sampling surface; this module is part of the brief's
"operations a large-scale training-data pipeline would need".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: q175: shards a training job reads in parallel; the epoch seed makes
#: each epoch a fresh deterministic permutation.
N_SHARDS = 8
EPOCH_SEED = 7

#: q183: number of systematic draws, and the cumulative-sum bucket fan
#: (the two-phase prefix-sum parallelism — see q183's docstring).
PPS_TARGET = 100
PPS_BUCKETS = 64


def _hkey(seed_prefix: str):
    """md5(seed ‖ doc_id) hex — the shared shuffle/placement key."""
    return F.md5(F.concat(F.lit(seed_prefix), F.col("doc_id").cast("string")))


Q175_SQL = f"""
WITH h AS (
  SELECT doc_id,
         md5('e{EPOCH_SEED}:' || CAST(doc_id AS VARCHAR)) AS hkey
  FROM documents
),
s AS (
  SELECT doc_id, hkey,
         CAST(('0x' || substr(hkey, 1, 6)) AS BIGINT) % {N_SHARDS} AS shard
  FROM h
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(shard AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY hkey, doc_id)
            AS BIGINT) AS pos
FROM s
ORDER BY shard, pos
"""


@register("q175_epoch_shuffle", Q175_SQL)
def q175_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shard, pos): the reproducible epoch-shuffle manifest — a
    data loader opens shard k and reads positions 1..n, seeing a
    uniform-at-random document order that any engine can regenerate
    from (seed, doc_id) alone.

    Scale shape: shard = hash bits (pure map-side, ~balanced by md5
    uniformity); pos = rank WITHIN the shard — one hash-partitioned
    exchange and a per-shard sort of corpus/N_SHARDS rows. There is no
    global sort and no single-partition window anywhere; raising
    N_SHARDS is the 100 TB knob (shard count = loader parallelism =
    sort parallelism). Epoch advance = bump EPOCH_SEED: a completely
    new permutation with zero state carried."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    s = d.select(
        "doc_id", _hkey(f"e{EPOCH_SEED}:").alias("hkey")
    ).withColumn(
        "shard",
        F.conv(F.substring("hkey", 1, 6), 16, 10).cast("long") % N_SHARDS,
    )
    w = Window.partitionBy("shard").orderBy("hkey", "doc_id")
    return s.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("shard").cast("bigint").alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    ).orderBy("shard", "pos")


Q183_SQL = f"""
WITH h AS (
  SELECT doc_id, n_chars,
         md5('pps:' || CAST(doc_id AS VARCHAR)) AS hkey
  FROM documents
),
c AS (
  SELECT doc_id, n_chars, hkey,
         CAST(('0x' || substr(hkey, 1, 4)) AS BIGINT) % {PPS_BUCKETS}
           AS bucket,
         SUM(n_chars) OVER (
           ORDER BY CAST(('0x' || substr(hkey, 1, 4)) AS BIGINT)
                      % {PPS_BUCKETS},
                    hkey, doc_id
         ) AS cum
  FROM h
),
t AS (SELECT SUM(n_chars) AS total FROM h)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(cum AS BIGINT) AS cum,
       CAST((cum * {PPS_TARGET}) // total
            - ((cum - n_chars) * {PPS_TARGET}) // total AS BIGINT)
         AS times_drawn
FROM c, t
WHERE (cum * {PPS_TARGET}) // total
      > ((cum - n_chars) * {PPS_TARGET}) // total
ORDER BY cum
"""


@register("q183_pps_sample", Q183_SQL)
def q183_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic PPS sample of the corpus, weight = n_chars: documents
    whose cumulative-weight interval (cum−w, cum] crosses a multiple of
    total/PPS_TARGET are drawn (big documents can be drawn multiple
    times — ``times_drawn`` reports multiplicity). Exactly PPS_TARGET
    draws, inclusion probability ∝ size, deterministic order from
    md5(doc_id). The comparison is cross-multiplied into integers
    (cum·T DIV total), so no float step ever exists — the face is
    hash-exact. Envelope: cum·T ≤ total_chars·T ~ 1e14·100 at 100 TB,
    inside BIGINT; past that, widen to DECIMAL(38,0).

    Scale shape — the two-phase prefix sum: a GLOBAL running sum is
    inherently sequential, so the hashed order is bucketed by
    PPS_BUCKETS hash bits, (1) per-bucket totals aggregate to a
    PPS_BUCKETS-row relation whose running offsets come from a window
    over those rows alone, (2) offsets broadcast back and each bucket
    computes its internal cumsum under a BUCKET-partitioned window.
    The oracle's single global window is the semantic spec; the Spark
    plan never materializes a single-partition sort of the corpus
    (plan-asserted). Raising PPS_BUCKETS is the 100 TB knob."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    h = d.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("w"),
        _hkey("pps:").alias("hkey"),
    ).withColumn(
        "bucket",
        F.conv(F.substring("hkey", 1, 4), 16, 10).cast("long") % PPS_BUCKETS,
    )
    btot = h.groupBy("bucket").agg(F.sum("w").alias("bw"))
    woff = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = btot.select(
        "bucket", F.coalesce(F.sum("bw").over(woff), F.lit(0)).alias("off")
    )
    win = Window.partitionBy("bucket").orderBy("hkey", "doc_id")
    c = h.join(F.broadcast(offsets), "bucket").select(
        "doc_id",
        "w",
        (F.col("off") + F.sum("w").over(win)).alias("cum"),
    )
    total = d.agg(F.sum("n_chars").cast("long").alias("total"))
    j = c.join(F.broadcast(total))
    hi = F.expr(f"(cum * {PPS_TARGET}) DIV total")
    lo = F.expr(f"((cum - w) * {PPS_TARGET}) DIV total")
    return (
        j.filter(hi > lo)
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("w").cast("bigint").alias("n_chars"),
            F.col("cum").cast("bigint").alias("cum"),
            (hi - lo).cast("bigint").alias("times_drawn"),
        )
        .orderBy("cum")
    )


# --- q188: curriculum manifest ------------------------------------------------

#: q188: curriculum stages (easy → hard by token count; Bengio et al.
#: 2009's curriculum-learning schedule as a data-ordering problem) and
#: the fixed stage boundary in tokens. Boundaries are FIXED values, not
#: quantiles — stage assignment must be map-side and append-stable (a
#: quantile boundary moves every time the corpus grows; a fixed one
#:  never reshuffles already-assigned docs).
CURR_STAGES = 4
CURR_STAGE_TOKENS = 32
CURR_SEED = 11

Q188_SQL = f"""
WITH s AS (
  SELECT doc_id,
         LEAST({CURR_STAGES - 1},
               LEN(string_split(text, ' ')) // {CURR_STAGE_TOKENS})
           AS stage,
         md5('c{CURR_SEED}:' || CAST(doc_id AS VARCHAR)) AS hkey
  FROM documents
),
sh AS (
  SELECT doc_id, stage, hkey,
         CAST(('0x' || substr(hkey, 1, 6)) AS BIGINT) % {N_SHARDS} AS shard
  FROM s
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(stage AS BIGINT) AS stage,
       CAST(shard AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard
                               ORDER BY stage, hkey, doc_id)
            AS BIGINT) AS pos
FROM sh
ORDER BY shard, pos
"""


@register("q188_curriculum_manifest", Q188_SQL)
def q188_curriculum_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, stage, shard, pos): the curriculum-ordered epoch
    manifest — q175's reproducible shuffle with stages prepended to the
    within-shard order, so a loader reading each shard by pos sees all
    stage-0 (short/easy) documents before stage-1 and so on, uniformly
    shuffled WITHIN each stage, and every shard advances through the
    curriculum in lockstep (stage boundaries land at ~the same relative
    position in every shard, md5 uniformity).

    Stage = token count at FIXED boundaries (CURR_STAGE_TOKENS-token
    steps, capped at CURR_STAGES−1) — map-side, append-stable, no
    order-statistic pass (see constant's note). Determinism: order and
    placement from md5(seed ‖ doc_id) exactly as q175; a seed bump
    reshuffles within stages but never across the curriculum.

    Scale: identical shape to q175 — shard from hash bits (map-side),
    pos from one SHARD-partitioned rank window; no global sort,
    N_SHARDS is the parallelism knob."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    s = d.select(
        "doc_id",
        F.least(
            F.lit(CURR_STAGES - 1),
            F.floor(F.size(F.split("text", " ")) / CURR_STAGE_TOKENS),
        )
        .cast("long")
        .alias("stage"),
        _hkey(f"c{CURR_SEED}:").alias("hkey"),
    ).withColumn(
        "shard",
        F.conv(F.substring("hkey", 1, 6), 16, 10).cast("long") % N_SHARDS,
    )
    w = Window.partitionBy("shard").orderBy("stage", "hkey", "doc_id")
    return s.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "stage",
        F.col("shard").cast("bigint").alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    ).orderBy("shard", "pos")

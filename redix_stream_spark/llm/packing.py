"""Sequence packing — grouping documents into fixed token-budget training
sequences (the batch-construction primitive of every pretraining pipeline;
the reference has no analog, this is part of the LLM-data surface the
build contract adds on top of SURVEY.md §2.2).

Algorithm: documents are sharded by an id-stable md5 bucket (so the
packing is embarrassingly parallel and reproducible — same property as
q85's hash split), then greedily next-fit packed in doc_id order within
each shard: a document joins the current pack unless that would exceed
the token budget, in which case it opens a new pack. A document larger
than the whole budget gets a pack of its own (never dropped).

The greedy fold is inherently sequential per shard — not expressible with
window functions — so the Spark side is a grouped-map ``applyInPandas``
(one Arrow frame per shard, plain integer loop inside) and the oracle is
a recursive CTE advancing every shard one document per iteration. Both
sides are pure integer arithmetic on the same ordering, so the assignment
is oracle-hash-exact.

Scale: shard count bounds parallelism and per-task memory (#docs/#shards
rows of (id, count) per frame — metadata, not text; the text column is
pruned before the shuffle). At 100 TB you raise N_SHARDS so each frame
stays ~10⁵ rows; packing quality is unaffected because shards are
hash-random samples of the corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

TOKEN_BUDGET = 256
N_SHARDS = 16


def pack_sequences(
    docs: DataFrame,
    budget: int = TOKEN_BUDGET,
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """(shard, doc_id, n_tokens, pack_id) — greedy next-fit pack
    assignment per shard; pack_id is 1-based within its shard."""
    shard = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
        ).cast("long")
        % n_shards
    )
    base = docs.select(
        shard.alias("shard"),
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_ids, pack_id, running = [], 0, budget + 1  # force open on first
        for t in pdf["n_tokens"]:
            if running + t > budget:
                pack_id += 1
                running = t
            else:
                running += t
            pack_ids.append(pack_id)
        pdf["pack_id"] = pack_ids
        return pdf[["shard", "doc_id", "n_tokens", "pack_id"]]

    return base.groupBy("shard").applyInPandas(
        pack, "shard long, doc_id long, n_tokens long, pack_id long"
    )


Q87_SQL = f"""
WITH RECURSIVE base AS (
  SELECT
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
      % {N_SHARDS} AS shard,
    doc_id,
    CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
s AS (
  SELECT shard, doc_id, n_tokens,
         ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS i
  FROM base
),
r AS (
  SELECT shard, doc_id, n_tokens, i,
         CAST(1 AS BIGINT) AS pack_id, n_tokens AS running
  FROM s WHERE i = 1
  UNION ALL
  SELECT s.shard, s.doc_id, s.n_tokens, s.i,
         CASE WHEN r.running + s.n_tokens > {TOKEN_BUDGET}
              THEN r.pack_id + 1 ELSE r.pack_id END,
         CASE WHEN r.running + s.n_tokens > {TOKEN_BUDGET}
              THEN s.n_tokens ELSE r.running + s.n_tokens END
  FROM r JOIN s ON s.shard = r.shard AND s.i = r.i + 1
)
SELECT shard, doc_id, n_tokens, pack_id FROM r
"""


@register("q87_sequence_packing", Q87_SQL)
def q87_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget sequence packing (budget 256, 16 md5 shards) —
    assignment is integer-exact and oracle-verified against a
    recursive-CTE replay of the same fold (id-stable shard = q85's
    split idiom)."""
    d = load_table(spark, sf_dir, "documents")
    return pack_sequences(d)

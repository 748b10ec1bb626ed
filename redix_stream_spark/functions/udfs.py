"""UDF surface (SURVEY.md E26): scalar Python UDF, vectorized Pandas UDF,
and grouped-map ``applyInPandas`` — the three escape hatches for logic the
built-in functions can't express.

The reference's handler is an arbitrary function applied per message
(consumer.ex:283-299); these are its typed, *vectorized* equivalents.
Hot-path rule at 100 TB: built-ins first (whole-stage codegen), then
Pandas UDFs (Arrow batches), and row-at-a-time ``udf`` only as a last
resort — it exists here precisely to have the complete surface, and
q55 measures it against its Arrow twin.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType

from ..catalog import load_table
from ..registry import register


@F.pandas_udf(LongType())
def token_count_arrow(text: pd.Series) -> pd.Series:
    """Vectorized token counter — one Arrow batch per call."""
    return text.str.split(" ").str.len().astype("int64")


@F.udf(LongType())
def token_count_rowwise(text: str) -> int:
    """Row-at-a-time twin of token_count_arrow (for the E26 inventory and
    the bench comparison; never use this shape in a hot path)."""
    return len(text.split(" "))


Q54_SQL = """
SELECT doc_id, CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM documents
"""


@register("q54_pandas_udf_tokens", Q54_SQL)
def q54_pandas_udf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-UDF token count, oracle-checked: integer outputs make the
    Python path exactly comparable to the SQL formulation."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", token_count_arrow("text").alias("n_tokens"))


@register("q55_rowwise_udf_tokens", Q54_SQL)
def q55_rowwise_udf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same computation through the slow row-at-a-time UDF path —
    present for surface completeness; bench shows why it's the wrong tool."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", token_count_rowwise("text").alias("n_tokens"))


@register("q56_grouped_map_zscore")  # rows-only: float accumulation order
def q56_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas``: per-user z-score of event values.

    The grouped-map shape is the general stateful-per-key handler (one
    pandas frame per key, key-partitioned shuffle) — the batch twin of
    ``applyInPandasWithState``. Rows-only because pandas' mean/std
    accumulate in float (tests cross-check against the Spark-native
    window formulation with a tolerance instead).
    """
    e = load_table(spark, sf_dir, "events")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std(ddof=1)
        mu = pdf["value"].mean()
        z = (pdf["value"] - mu) / std if std and std > 0 else pdf["value"] * 0.0
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "zscore": z}
        )

    return e.select("event_id", "user_id", "value").groupBy("user_id").applyInPandas(
        zscore, "event_id long, user_id long, zscore double"
    )


# --- q135: Python UDTF (table function) surface ------------------------------

#: passage width for the UDTF face (tokens per emitted row)
UDTF_PASSAGE_TOKENS = 32

Q135_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
idx AS (
  SELECT doc_id, toks,
         UNNEST(range(0, CAST(CEIL(LEN(toks) / {UDTF_PASSAGE_TOKENS}.0) AS BIGINT)))
           AS p
  FROM t
)
SELECT
  doc_id,
  p AS passage_idx,
  array_to_string(
    toks[p * {UDTF_PASSAGE_TOKENS} + 1 :
         LEAST((p + 1) * {UDTF_PASSAGE_TOKENS}, LEN(toks))], ' ') AS passage,
  CAST(LEAST((p + 1) * {UDTF_PASSAGE_TOKENS}, LEN(toks))
       - p * {UDTF_PASSAGE_TOKENS} AS BIGINT) AS n_tokens
FROM idx
"""


@register("q135_udtf_passages", Q135_SQL)
def q135_udtf_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (Spark 4 table functions — the fourth escape
    hatch, completing E26's scalar/pandas/grouped-map inventory): a
    deterministic table function splits each document into fixed-width
    token passages, invoked via LATERAL join so every input row fans out
    to its passage rows with the parent's doc_id carried alongside —
    the one UDF shape whose OUTPUT cardinality the others can't express
    (scalar/pandas are 1:1, grouped-map is per-group).

    Scale: the UDTF runs per-partition like any map-side operator — no
    shuffle, no driver involvement; the lateral join is Spark's
    Generate, not a join exchange. Deterministic integer/string output
    keeps the face oracle-checkable (hash-exact vs DuckDB's
    range+list-slice formulation).
    """
    from pyspark.sql.functions import udtf

    w = UDTF_PASSAGE_TOKENS

    @udtf(returnType="passage_idx bigint, passage string, n_tokens bigint")
    class SplitPassages:
        def eval(self, text: str):
            toks = (text or "").split(" ")
            for i in range(0, len(toks), w):
                chunk = toks[i : i + w]
                yield (i // w, " ".join(chunk), len(chunk))

    spark.udtf.register("split_passages_q135", SplitPassages)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "q135_documents"
    )
    return spark.sql(
        "SELECT d.doc_id, p.passage_idx, p.passage, p.n_tokens "
        "FROM q135_documents d, LATERAL split_passages_q135(d.text) p"
    )

"""Distributed BPE vocabulary induction (Sennrich et al. 2016) over the
``documents`` corpus — the tokenizer-training stage of an LLM data
pipeline, expressed Spark-first.

The classic algorithm alternates two steps; both map onto DataFrame
aggregates with the right data representation:

1. **Pair counting** runs over the *distinct-word frequency table*, not
   the corpus: BPE statistics only depend on (word, count), so the
   corpus-sized work is a single map-side-combined ``groupBy(word)`` up
   front, and every merge round then touches a vocabulary-sized relation
   (10⁵–10⁷ rows at 100 TB — comfortably distributed, never driver-side).
   Adjacent symbol pairs come from a ``zip_with`` of the symbol array
   against its own shift — a codegen'd expression, no Python in the loop.
2. **The argmax pair** is k=1 bounded metadata: ``orderBy(count desc,
   pair).limit(1)`` (TakeOrdered) and a 1-row collect — the same
   "centroids may drive, payloads may not" rule as kmeans.py. Ties break
   lexicographically so the induced vocabulary is corpus-deterministic
   (no RNG, no partition-order dependence).
3. **Merge application** is a left fold over each symbol array
   (``F.aggregate``): append, or coalesce the tail when (tail, next)
   equals the merge pair — greedy leftmost non-overlapping, exactly the
   reference regex-replace semantics ("aaa" + merge (a,a) → [aa, a]).
   Each round's result is ``localCheckpoint``-ed: the fold otherwise
   nests one lambda layer per round and the analyzer cost grows
   quadratically (the q80 lineage lesson).

The induction face (q142) is rows-only — an unbounded iterative argmax
is not SQL-expressible — but the ENCODE face (q163) IS oracle-backed:
``BPE_MERGES`` is a fixed constant, so the merge loop unrolls into one
CTE chain per round (the q144/q157 bounded-loop oracle pattern). The
oracle represents each word's symbol sequence as a delimiter-wrapped
string (``\\x1f sym \\x1f \\x1f sym \\x1f …``): SQL ``replace()`` scans
left-to-right non-overlapping, which is EXACTLY greedy BPE merge
application, and the per-symbol wrapping keeps matches on symbol
boundaries (a bare separator would let ``b c`` match inside ``ab c``
and a shared separator would miss back-to-back pairs). Assumes symbols
never contain ``\\x1f`` — true of any whitespace-tokenized text corpus.
Both faces are additionally pinned in tests/test_bpe.py against a
pure-Python reference implementation, including the overlap fixture.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import load_table
from ..registry import register
from .text import tokens

BPE_MERGES = 10
#: End-of-word sentinel (Sennrich's </w>): lets merges distinguish
#: word-final from word-internal occurrences.
EOW = "</w>"

MERGE_SCHEMA = StructType(
    [
        StructField("rank", LongType(), False),
        StructField("left", StringType(), False),
        StructField("right", StringType(), False),
        StructField("merged", StringType(), False),
        StructField("pair_count", LongType(), False),
    ]
)


def _initial_vocab(docs: DataFrame) -> DataFrame:
    """(word, freq, symbols): corpus word counts with char+EOW symbols."""
    words = docs.select(F.explode(tokens()).alias("word"))
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    symbols = F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW)))
    return vocab.select("word", "freq", symbols.alias("symbols"))


def _adjacent_pairs(symbols: Column) -> Column:
    """Array of (x, y) structs for each adjacent symbol pair."""
    n = F.size(symbols)
    return F.zip_with(
        F.slice(symbols, 1, n - 1),
        F.slice(symbols, 2, n - 1),
        lambda x, y: F.struct(x.alias("x"), y.alias("y")),
    )


def _apply_merge(symbols: Column, left: str, right: str) -> Column:
    """Greedy leftmost non-overlapping replacement of (left, right)."""
    merged = left + right
    empty = F.expr("CAST(array() AS ARRAY<STRING>)")
    fold = F.aggregate(
        symbols,
        empty,
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    # Guard the interpreted fold behind two cheap membership probes:
    # a word lacking either symbol cannot contain the adjacent pair, and
    # the fold is then the identity — CaseWhen evaluates branches
    # lazily, so the vocabulary majority that never mentions the pair
    # skips the per-symbol lambda walk entirely (value-identical either
    # way; r12 optimization, guide §4.1 "prefer built-ins").
    return F.when(
        F.array_contains(symbols, left) & F.array_contains(symbols, right),
        fold,
    ).otherwise(symbols)


def fit_bpe(
    docs: DataFrame, n_merges: int = BPE_MERGES
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges; returns (merge list, final vocab).

    Stops early when no adjacent pair remains (every word fully merged).
    """
    # Lazy checkpoints: each round's vocab materializes INSIDE the next
    # round's argmax job (or the encode tail) instead of as a separate
    # eager pass — lineage is still truncated at every round, but the
    # loop pays ONE job per merge instead of two (r12 optimization).
    vocab = _initial_vocab(docs).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            vocab.select("freq", F.explode(_adjacent_pairs(F.col("symbols"))).alias("p"))
            .groupBy("p")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.col("p.x"), F.col("p.y"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, cnt = best[0]["p"]["x"], best[0]["p"]["y"], best[0]["cnt"]
        merges.append((rank, left, right, left + right, int(cnt)))
        vocab = vocab.select(
            "word",
            "freq",
            _apply_merge(F.col("symbols"), left, right).alias("symbols"),
        ).localCheckpoint(eager=False)
    return merges, vocab


@register("q142_bpe_merges")  # rows-only: iterative argmax is not SQL-expressible
def q142_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first 10 learned BPE merges (rank, pair, merged symbol, pair
    count) over the document corpus — deterministic for a given corpus
    (lexicographic tie-break). See the module docstring for the
    distributed shape; semantics pinned vs a pure-Python reference in
    tests/test_bpe.py."""
    d = load_table(spark, sf_dir, "documents")
    merges, _ = fit_bpe(d, BPE_MERGES)
    return spark.createDataFrame(merges, MERGE_SCHEMA)


def _q163_sql(n_merges: int = BPE_MERGES) -> str:
    """Generated oracle: the full BPE learn-then-encode, with the merge
    loop unrolled ``n_merges`` times (see module docstring for the
    delimited-string replace trick). Each round re-derives the argmax
    pair with the same (count DESC, x, y) tie-break as ``fit_bpe``, so
    Spark and DuckDB learn identical merges from the same corpus. If a
    round has no pairs left the 1-row ``b{r}`` CTE is empty and the
    cross join empties the vocab — impossible on a real corpus in 10
    merges and pinned irrelevant by test_bpe's early-stop fixture."""
    d = "chr(31)"
    dd = f"{d}||{d}"
    parts = [
        f"""
WITH w AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
  GROUP BY word
),
v0 AS (
  SELECT word, freq,
         {d} || array_to_string(string_split(word, '') || ['{EOW}'], {dd}) || {d} AS s
  FROM w
)"""
    ]
    for r in range(1, n_merges + 1):
        prev = f"v{r - 1}"
        parts.append(
            f""",
p{r} AS (
  SELECT q.syms[t.i] AS x, q.syms[t.i + 1] AS y, q.freq
  FROM (SELECT freq, string_split(trim(s, {d}), {dd}) AS syms FROM {prev}) q,
       UNNEST(generate_series(1, len(q.syms) - 1)) AS t(i)
),
b{r} AS (
  SELECT x, y FROM p{r} GROUP BY x, y ORDER BY SUM(freq) DESC, x, y LIMIT 1
),
v{r} AS (
  SELECT v.word, v.freq,
         replace(v.s, {d}||b.x||{dd}||b.y||{d}, {d}||b.x||b.y||{d}) AS s
  FROM {prev} v, b{r} b
)"""
        )
    parts.append(
        f""",
tok AS (
  SELECT word, CAST(len(string_split(trim(s, {d}), {dd})) AS BIGINT) AS n_toks
  FROM v{n_merges}
),
pdw AS (
  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents)
  GROUP BY doc_id, word
)
SELECT pdw.doc_id,
       CAST(SUM(cnt) AS BIGINT) AS n_words,
       CAST(SUM(cnt * n_toks) AS BIGINT) AS n_tokens,
       CAST(SUM(cnt * (LENGTH(pdw.word) + 1)) AS BIGINT) AS n_init_symbols
FROM pdw JOIN tok ON pdw.word = tok.word
GROUP BY pdw.doc_id
ORDER BY pdw.doc_id
"""
    )
    return "".join(parts)


@register("q163_bpe_encode", _q163_sql())
def q163_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODE the corpus with the learned BPE merges — the consumption
    face of q142's induction (per-doc token statistics are what a
    training pipeline actually materializes: packing, quotas and token
    accounting all key off them).

    Scale shape — the tokenizer-application pattern for 100 TB: the
    merges are applied ONCE per distinct word (fit_bpe already rewrites
    the vocabulary-sized (word, symbols) relation; no merge work is ever
    corpus-sized), and encoding a document reduces to one map-side
    combined ``groupBy(doc_id, word)`` count plus one word-keyed join
    against that vocabulary — per-word fold cost is amortized across
    every duplicate occurrence in the corpus. Integer outputs; semantics
    pinned against the pure-Python reference in tests/test_bpe.py AND
    hash-checked against the fully-unrolled DuckDB oracle (_q163_sql).
    """
    d = load_table(spark, sf_dir, "documents")
    _, vocab = fit_bpe(d, BPE_MERGES)
    word_tok = vocab.select(
        "word", F.size("symbols").cast("long").alias("n_toks")
    )
    per_doc_word = (
        d.select("doc_id", F.explode(tokens()).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return (
        per_doc_word.join(word_tok, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_toks")).cast("long").alias("n_tokens"),
            F.sum(F.col("cnt") * (F.length("word") + 1))
            .cast("long")
            .alias("n_init_symbols"),
        )
        .orderBy("doc_id")
    )

"""Near-duplicate detection over ``documents`` (SURVEY.md E23): exact
hash dedup (see text.q34_fingerprint), n-gram Jaccard, deterministic
MinHash+LSH, and SimHash.

MinHash determinism: shingle hashes derive from md5 (identical in Spark and
DuckDB), mapped to a 60-bit integer, then permuted with fixed
``(a*x + b) mod p`` universal-hash parameters. Every stage is pure integer
arithmetic, so the Spark pipeline and the SQL oracle compute the *same*
signatures, the same LSH candidate pairs, and the same verified output —
the oracle checks the algorithm, not just "some near-dups".

Scale shape (100 TB): shingles explode ~doc_len rows per doc but collapse
map-side into per-(doc, permutation) minima; the LSH band join shuffles only
(doc_id, band_key) pairs — never the corpus against itself. The exact-Jaccard
verification runs only on candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .text import tokens

MERSENNE_P = 2147483647  # 2^31 - 1
N_PERMS = 16
N_BANDS = 4  # 4 rows per band
SHINGLE_K = 3
JACCARD_THRESHOLD = 0.5

# Fixed universal-hash parameters (a odd-ish, b) — seeded, embedded in both
# the Spark pipeline and the generated oracle SQL.
import random as _random

_rnd = _random.Random(1234)
PERM_PARAMS = [
    (_rnd.randrange(1, MERSENNE_P), _rnd.randrange(0, MERSENNE_P))
    for _ in range(N_PERMS)
]


def shingles(col: Column, k: int = SHINGLE_K) -> Column:
    """k-word shingles as strings (array per document)."""
    toks = tokens(col) if isinstance(col, str) else F.split(col, " ")
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )


def shingle_hash(col: Column) -> Column:
    """md5-derived 60-bit integer, reduced mod p — identical cross-engine."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % MERSENNE_P


def _sql_shingle_hash(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT) % {MERSENNE_P}"


def minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, perm, minhash) — the exploded MinHash signature matrix.

    One shuffle: groupBy (doc_id, perm) with map-side partial min.
    """
    perms = F.array(
        *[F.struct(F.lit(i).alias("perm"), F.lit(a).alias("a"), F.lit(b).alias("b"))
          for i, (a, b) in enumerate(PERM_PARAMS)]
    )
    sh = docs.select(
        "doc_id", F.explode(F.array_distinct(shingles(F.col(text_col)))).alias("shingle")
    ).select("doc_id", shingle_hash(F.col("shingle")).alias("x"))
    return (
        sh.select("doc_id", "x", F.explode(perms).alias("p"))
        .select(
            "doc_id",
            F.col("p.perm").alias("perm"),
            ((F.col("p.a") * F.col("x") + F.col("p.b")) % MERSENNE_P).alias("h"),
        )
        .groupBy("doc_id", "perm")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_candidate_pairs(sig: DataFrame) -> DataFrame:
    """Band the signature matrix and self-join band buckets → candidate pairs."""
    rows_per_band = N_PERMS // N_BANDS
    banded = (
        sig.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws(",", F.sort_array(F.collect_list(
            F.concat_ws(":", F.col("perm"), F.col("minhash"))
        )))).alias("band_key"))
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .distinct()
    )


def exact_jaccard(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (verification stage)."""
    sets = docs.select(
        "doc_id", F.array_distinct(shingles(F.col("text"))).alias("sset")
    )
    return (
        pairs.join(sets.withColumnRenamed("doc_id", "doc_id_a").withColumnRenamed("sset", "set_a"), "doc_id_a")
        .join(sets.withColumnRenamed("doc_id", "doc_id_b").withColumnRenamed("sset", "set_b"), "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            (
                F.size(F.array_intersect("set_a", "set_b")).cast("double")
                / F.size(F.array_union("set_a", "set_b"))
            ).alias("jaccard"),
        )
    )


def _gen_minhash_oracle_sql() -> str:
    """Generate the DuckDB oracle mirroring the exact MinHash+LSH pipeline."""
    params_rows = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(PERM_PARAMS))
    rows_per_band = N_PERMS // N_BANDS
    sh = _sql_shingle_hash("shingle")
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(t[i:i+{SHINGLE_K - 1}], ' ') AS shingle
  FROM (SELECT doc_id, t, UNNEST(range(1, GREATEST(LEN(t) - {SHINGLE_K - 1}, 1) + 1)) AS i FROM toks)
),
hx AS (SELECT doc_id, {sh} AS x FROM sh),
params(perm, a, b) AS (VALUES {params_rows}),
sig AS (
  SELECT doc_id, perm, MIN((a * x + b) % {MERSENNE_P}) AS minhash
  FROM hx, params
  GROUP BY doc_id, perm
),
banded AS (
  SELECT doc_id, CAST(FLOOR(perm / {rows_per_band}) AS INT) AS band,
         md5(array_to_string(list_sort(list(CAST(perm AS VARCHAR) || ':' || CAST(minhash AS VARCHAR))), ',')) AS band_key
  FROM sig
  GROUP BY doc_id, CAST(FLOOR(perm / {rows_per_band}) AS INT)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
sets AS (SELECT doc_id, list_distinct(list(shingle)) AS sset FROM sh GROUP BY doc_id)
SELECT doc_id_a, doc_id_b,
       CAST(LEN(list_intersect(sa.sset, sb.sset)) AS DOUBLE)
         / (LEN(sa.sset) + LEN(sb.sset) - LEN(list_intersect(sa.sset, sb.sset))) AS jaccard
FROM cand
JOIN sets sa ON sa.doc_id = doc_id_a
JOIN sets sb ON sb.doc_id = doc_id_b
WHERE CAST(LEN(list_intersect(sa.sset, sb.sset)) AS DOUBLE)
        / (LEN(sa.sset) + LEN(sb.sset) - LEN(list_intersect(sa.sset, sb.sset))) >= {JACCARD_THRESHOLD}
"""


@register("q36_minhash_lsh_neardup", _gen_minhash_oracle_sql())
def q36_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified with exact shingle Jaccard.

    Full shingle→minhash→band→bucket-join→verify pipeline; the oracle SQL
    replays the identical algorithm (same md5-derived hashes, same
    permutation parameters), so the hash check verifies every stage.
    """
    d = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(d)
    pairs = lsh_candidate_pairs(sig)
    scored = exact_jaccard(d, pairs)
    return scored.filter(F.col("jaccard") >= JACCARD_THRESHOLD)


Q37_SQL = """
WITH t AS (
  SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS ws FROM documents
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST(LEN(list_intersect(a.ws, b.ws)) AS DOUBLE)
         / (LEN(a.ws) + LEN(b.ws) - LEN(list_intersect(a.ws, b.ws))) AS jaccard
FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE CAST(LEN(list_intersect(a.ws, b.ws)) AS DOUBLE)
        / (LEN(a.ws) + LEN(b.ws) - LEN(list_intersect(a.ws, b.ws))) >= 0.6
"""


@register("q37_ngram_jaccard_dup", Q37_SQL)
def q37_ngram_jaccard_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-set Jaccard near-dups within a blocking key (source).

    |A∪B| is computed as |A|+|B|−|A∩B| so only one array intersection runs
    per pair. Blocking on ``source`` keeps the pair count linear-ish; the
    unblocked scale path is q36 (MinHash+LSH).
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", "source", F.array_distinct(tokens()).alias("ws"))
    a, b = t.alias("a"), t.alias("b")
    inter = F.size(F.array_intersect("a.ws", "b.ws")).cast("double")
    union = F.size(F.col("a.ws")) + F.size(F.col("b.ws")) - F.size(
        F.array_intersect("a.ws", "b.ws")
    )
    jac = inter / union
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.6)
    )


@register("q38_simhash")  # rows-only: bit-mixing constants are engine-internal
def q38_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document from token md5s.

    Per-bit majority vote over token hashes: bit_count-style extraction via
    integer shifts, summed per document — all built-in expressions. Docs
    whose simhashes agree on most bits are near-dups (Hamming ≤ k); the
    pytest suite checks SimHash(doc) ≈ SimHash(doc with small edit).
    """
    d = load_table(spark, sf_dir, "documents")
    tok_hash = F.conv(F.substring(F.md5(F.col("token")), 1, 15), 16, 10).cast("long")
    exploded = d.select(
        "doc_id", F.explode(F.array_distinct(tokens())).alias("token")
    ).select("doc_id", tok_hash.alias("h"))
    # For each of 60 usable bits: +1 when set, −1 when clear; sign of the sum
    # is the output bit.
    bit_votes = [
        F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{i}")
        for i in range(60)
    ]
    votes = exploded.groupBy("doc_id").agg(*bit_votes)
    sim = None
    for i in range(60):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(0)
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim + term
    return votes.select("doc_id", sim.alias("simhash"))

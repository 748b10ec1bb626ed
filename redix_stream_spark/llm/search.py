"""Ranked full-text retrieval over ``documents``: BM25 scoring on top of
the q123 postings shape (reference parity: redix_stream's consumers build
exactly this index-then-rank pipeline downstream of the log; SURVEY.md §2
text-analysis block).

Why this isn't textbook BM25 verbatim: the textbook idf is
``ln((N-df+0.5)/(df+0.5))`` and libm's ``ln`` is not bit-identical across
engines (the q86 lesson). BM25's *structure* — rare-term boost × per-doc
saturating tf, normalized by document length — survives a rational idf
substitute:

    idf_lin(df) = (N - df + 1/2) / (df + 1/2) = (2N - 2df + 1) / (2df + 1)

(the argument of the textbook log, un-logged). With k1 = 6/5 and b = 3/4
(the standard 1.2 / 0.75), the per-term score

    idf_lin · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

clears its denominators exactly — multiply through by 10·T (T = total
corpus tokens, avgdl = T/N):

    score_t(doc) = [ 22·tf·T·(2N-2df+1) ] / [ (10·tf·T + 3·T + 9·dl·N)·(2df+1) ]

a ratio of two *integers*. Both engines compute the integers exactly
within a ~10^38 envelope: Spark's operands are DECIMAL(19,0) counts whose
chained products promote to the DECIMAL(38,0) precision cap at every
multiply (each factor is a count < 10^19, each intermediate product must
stay < 10^38 — at sf100 the largest product is ~10^21, so the envelope
holds past sf100 with ~17 orders of headroom); DuckDB's HUGEINT is exact
to the same 10^38. THE FAILURE MODES DIFFER past the envelope: DuckDB
errors on HUGEINT overflow, Spark under ANSI-off silently NULLs the
product — the `_DEC` note states the envelope so a corpus large enough
to breach it is a documented limit, not a silent divergence. Each side
is then cast to DOUBLE (one correctly-rounded cast each) and one IEEE
division performed — bit-identical scores, hash-green oracle. The two-term query score is the SUM of two
doubles, and two-operand IEEE addition is commutative, so partial-
aggregation order cannot change the result (three or more terms would need
an ordered fold — see the docstring on BM25_TERMS).

Scale shape: tf is a map-side-combined (doc, term) aggregate over ONLY the
postings rows matching the query terms — the term filter is pushed below
the explode into a pre-filter on ``text`` (a scan row survives only if it
can contain a query term), so the corpus never fans out token-wise for
rows that cannot match. df and the (N, T) corpus totals are scalar-sized
and broadcast. Ranking is orderBy+limit (TakeOrdered: per-partition top-k,
k-row merge) — never a global sort or full-relation rank window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..registry import register
from .text import tokens

#: The fixed demo query: one rare term ("dup": df≈25 at sf0.01) and one
#: common term ("spark": df≈385) — exercises the idf contrast. Exactly TWO
#: terms by design: the per-doc score sum of two bit-identical doubles is
#: order-independent (IEEE + is commutative); queries with ≥3 terms must
#: fold in a defined order (sort terms, left-fold) on both engines.
BM25_TERMS: tuple[str, ...] = ("dup", "spark")
BM25_TOP_K = 20

#: Operand width for the exact integer products. Spark's multiply
#: promotion caps chained products at DECIMAL(38,0), so the arithmetic is
#: exact while every intermediate stays < 10^38 (largest here:
#: 22·tf·T·(2N-2df+1) ~ 10^21 at sf100 — ~17 orders of headroom). Past
#: that envelope Spark ANSI-off silently NULLs where DuckDB HUGEINT
#: errors — a documented limit of this face, not a silent divergence
#: (module docstring).
_DEC = "decimal(19,0)"


Q140_SQL = f"""
WITH corpus AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS HUGEINT) AS total_toks
  FROM documents
),
docs AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS HUGEINT) AS dl,
         string_split(text, ' ') AS toks
  FROM documents
),
tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS HUGEINT) AS tf
  FROM (SELECT doc_id, UNNEST(toks) AS token FROM docs)
  WHERE token IN ('{BM25_TERMS[0]}', '{BM25_TERMS[1]}')
  GROUP BY doc_id, token
),
df AS (
  SELECT token, CAST(COUNT(*) AS HUGEINT) AS df
  FROM (SELECT DISTINCT doc_id, token FROM tf) GROUP BY token
),
term_scores AS (
  SELECT tf.doc_id,
         CAST(22 * tf.tf * c.total_toks * (2 * c.n_docs - 2 * df.df + 1)
              AS DOUBLE)
         / CAST((10 * tf.tf * c.total_toks + 3 * c.total_toks
                 + 9 * d.dl * c.n_docs) * (2 * df.df + 1) AS DOUBLE)
           AS term_score
  FROM tf
  JOIN df ON tf.token = df.token
  JOIN docs d ON tf.doc_id = d.doc_id
  CROSS JOIN corpus c
),
scored AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
         SUM(term_score) AS score
  FROM term_scores GROUP BY doc_id
)
SELECT doc_id, n_terms, score,
       CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
FROM scored
ORDER BY rank
LIMIT {BM25_TOP_K}
"""


@register("q140_bm25_search", Q140_SQL)
def q140_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-ranked retrieval (rational-idf variant, k1=1.2, b=0.75) for a
    fixed two-term query; top-20 documents with scores and ranks.

    Reference parity: the search-over-log consumer pattern
    (redix_stream README's index-consumer example); SURVEY.md §2 text
    block. See the module docstring for the exact-arithmetic derivation
    and the scale shape.
    """
    d = load_table(spark, sf_dir, "documents")

    # Corpus totals: one tiny aggregate, broadcast into every scorer row.
    corpus = d.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n_docs"),
        F.sum(F.size(tokens())).cast(_DEC).alias("total_toks"),
    )

    # Cheap pre-filter BEFORE the token fan-out: a doc that contains no
    # query term as a substring cannot produce a matching posting. At rest
    # this is the token-partitioned-postings layout (q119/q123 story);
    # against raw text it keeps the explode off ~93% of the corpus.
    any_term = None
    for t in BM25_TERMS:
        c = F.col("text").contains(t)
        any_term = c if any_term is None else (any_term | c)
    docs = d.filter(any_term).select(
        "doc_id",
        F.size(tokens()).cast(_DEC).alias("dl"),
        tokens().alias("toks"),
    )

    tf = (
        docs.select("doc_id", F.explode("toks").alias("token"))
        .filter(F.col("token").isin(*BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast(_DEC).alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).cast(_DEC).alias("df"))

    two = F.lit(2).cast(_DEC)
    num = (
        F.lit(22).cast(_DEC)
        * F.col("tf")
        * F.col("total_toks")
        * (two * F.col("n_docs") - two * F.col("df") + F.lit(1).cast(_DEC))
    )
    den = (
        F.lit(10).cast(_DEC) * F.col("tf") * F.col("total_toks")
        + F.lit(3).cast(_DEC) * F.col("total_toks")
        + F.lit(9).cast(_DEC) * F.col("dl") * F.col("n_docs")
    ) * (two * F.col("df") + F.lit(1).cast(_DEC))

    term_scores = (
        tf.join(F.broadcast(df), "token")
        .join(docs.select("doc_id", "dl"), "doc_id")
        .join(F.broadcast(corpus))
        .select(
            "doc_id",
            (num.cast("double") / den.cast("double")).alias("term_score"),
        )
    )
    scored = term_scores.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("term_score").alias("score"),
    )
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(BM25_TOP_K)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "doc_id", "n_terms", "score", "rank"
    )


# --- q209: hybrid lexical+vector retrieval with RRF fusion -------------------

#: Reciprocal-rank-fusion constant (Cormack, Clarke & Buettcher, SIGIR
#: 2009): score(d) = Σ_lists 1/(K + rank_list(d)). K=60 is the published
#: default; it damps the head so one list's #1 can't drown the other.
RRF_K = 60
RRF_LIST_K = 20  # depth of each input ranking
RRF_TOP_K = 10


def _q209_sql() -> str:
    from .similarity import QUERY_VEC_ID, _sql_cosine

    lex_sql = Q140_SQL.strip().rstrip(";")
    cos = _sql_cosine("e.embedding", "q.qv")
    return f"""
WITH lex AS (
  {lex_sql}
),
vec_scored AS (
  SELECT e.vec_id AS vec_id, {cos} AS sim
  FROM embeddings e, (SELECT embedding AS qv FROM embeddings
                      WHERE vec_id = {QUERY_VEC_ID}) q
  WHERE e.vec_id <> {QUERY_VEC_ID}
),
vec AS (
  SELECT vec_id, rank FROM (
    SELECT vec_id,
           CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS BIGINT)
             AS rank
    FROM vec_scored
  ) WHERE rank <= {RRF_LIST_K}
),
fused AS (
  SELECT COALESCE(l.doc_id, v.vec_id) AS item_id,
         l.rank AS lex_rank,
         v.rank AS vec_rank,
         COALESCE(CAST(1 AS DOUBLE) / CAST({RRF_K} + l.rank AS DOUBLE),
                  CAST(0 AS DOUBLE))
         + COALESCE(CAST(1 AS DOUBLE) / CAST({RRF_K} + v.rank AS DOUBLE),
                    CAST(0 AS DOUBLE)) AS rrf_score
  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.vec_id
)
SELECT item_id, lex_rank, vec_rank, rrf_score,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf_score DESC, item_id) AS BIGINT)
         AS fused_rank
FROM fused
ORDER BY fused_rank
LIMIT {RRF_TOP_K}
"""


def _register_q209() -> None:
    @register("q209_hybrid_retrieval_rrf", _q209_sql())
    def q209_hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Hybrid retrieval (round 11): q140's BM25 lexical top-20 fused
        with the exact cosine top-20 against the fixed probe vector via
        reciprocal rank fusion — the standard production shape for
        "keyword AND semantic" search (RAG retrievers, site search),
        and the missing member of the engine's similarity family (exact
        / LSH / IVF / PQ / SQ8 / binary / kNN-graph all rank ONE
        modality). Items are doc_id ≡ vec_id; documents without an
        embedding (or vice versa) simply lack that list's term — RRF is
        defined on partially-overlapping pools.

        Cross-engine float discipline: each RRF term is ONE correctly-
        rounded double division of exact integers (1/(60+rank)); the
        two-term sum is a single IEEE add with a fixed operand order
        (lexical + vector), and both input rankings are deterministic
        (BM25's integer-exact scores; q40's bit-identical fold cosine)
        with id tie-breaks — hash-green by construction.

        Scale: both inputs are TakeOrdered top-k pipelines (q140's
        prefiltered postings; q40's broadcast-probe scan); the fusion
        join and final rank touch ≤ 2k rows — driver-trivial at any
        corpus size."""
        from ..catalog import load_table as _lt
        from .similarity import QUERY_VEC_ID, cosine

        lex = q140_bm25_search(spark, sf_dir).select(
            F.col("doc_id").alias("item_id"),
            F.col("rank").alias("lex_rank"),
        )
        e = _lt(spark, sf_dir, "embeddings")
        probe = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
            F.col("embedding").alias("qv")
        )
        sim = cosine(F.col("embedding"), F.col("qv"))
        vec_top = (
            e.filter(F.col("vec_id") != QUERY_VEC_ID)
            .crossJoin(F.broadcast(probe))
            .select("vec_id", sim.alias("sim"))
            .orderBy(F.col("sim").desc(), F.col("vec_id"))
            .limit(RRF_LIST_K)
        )
        wv = Window.orderBy(F.col("sim").desc(), F.col("vec_id"))
        vec = vec_top.withColumn(
            "vec_rank", F.row_number().over(wv).cast("long")
        ).select(F.col("vec_id").alias("item_id"), "vec_rank")
        one, zero = F.lit(1.0), F.lit(0.0)
        fused = lex.join(vec, "item_id", "full_outer").select(
            "item_id",
            "lex_rank",
            "vec_rank",
            (
                F.coalesce(
                    one / (F.lit(RRF_K) + F.col("lex_rank")).cast("double"),
                    zero,
                )
                + F.coalesce(
                    one / (F.lit(RRF_K) + F.col("vec_rank")).cast("double"),
                    zero,
                )
            ).alias("rrf_score"),
        )
        top = fused.orderBy(
            F.col("rrf_score").desc(), F.col("item_id")
        ).limit(RRF_TOP_K)
        wf = Window.orderBy(F.col("rrf_score").desc(), F.col("item_id"))
        return top.withColumn(
            "fused_rank", F.row_number().over(wf).cast("long")
        )


_register_q209()

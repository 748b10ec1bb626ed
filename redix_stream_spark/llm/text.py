"""Text-analysis operators over ``documents``: token stats, quality
scoring, language-ID heuristic, document fingerprinting (SURVEY.md E25).

All expressions are built-in ``pyspark.sql.functions`` (JVM codegen,
higher-order array functions) — no Python in the row path, so throughput
is identical to any other Catalyst expression at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..registry import register

#: Tiny per-language stopword lists for the heuristic language-ID operator.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "fr": ("le", "la", "les", "et", "est", "un"),
    "es": ("el", "la", "los", "y", "es", "un"),
}


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokenization — the shared building block."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


Q30_SQL = """
SELECT
  source,
  COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS total_tokens,
  CAST(SUM(LEN(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_tokens
FROM documents
GROUP BY source
"""


@register("q30_text_stats", Q30_SQL)
def q30_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus statistics (doc counts, char/token totals)."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(tokens()).cast("long")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(n_tok).alias("total_tokens"),
        (F.sum(n_tok).cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
    )


Q31_SQL = """
SELECT token, cnt, rank FROM (
  SELECT token, COUNT(*) AS cnt,
         CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS BIGINT) AS rank
  FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token
) WHERE rank <= 20
"""


@register("q31_top_tokens", Q31_SQL)
def q31_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 vocabulary: explode → count → top-k.

    Scale: the explode fans out rows but the count is a map-side-combined
    aggregation on token; the top-k is orderBy+limit, which compiles to
    TakeOrderedAndProject (per-partition top-20, 20-row k-merge) — a
    100 TB corpus vocabulary is 10^8+ tokens, so no full-vocabulary
    single-partition rank window. Rank is stamped on the 20-row result.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("token")).limit(20)
    w = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


_EN_STOPS_SQL = "('the','a','of','and','to','in','is')"

Q32_SQL = f"""
WITH t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS toks FROM documents)
SELECT
  doc_id,
  lang,
  CAST(LEN(toks) AS BIGINT) AS n_tokens,
  CAST(LEN(list_distinct(toks)) AS BIGINT) AS n_unique,
  CAST(LEN(list_distinct(toks)) AS DOUBLE) / LEN(toks) AS ttr,
  CAST(LEN(list_filter(toks, x -> x IN {_EN_STOPS_SQL})) AS DOUBLE) / LEN(toks) AS stop_ratio,
  CAST(LEN(replace(text, ' ', '')) AS DOUBLE) / LEN(toks) AS avg_token_len,
  CASE
    WHEN LEN(toks) >= 40 AND CAST(LEN(list_distinct(toks)) AS DOUBLE) / LEN(toks) >= 0.5 THEN 'high'
    WHEN LEN(toks) >= 15 THEN 'medium'
    ELSE 'low'
  END AS quality
FROM t
"""


@register("q32_doc_quality", Q32_SQL)
def q32_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring: token counts, type-token ratio,
    stopword ratio, average token length, and a quality bucket.

    All ratios are int/int IEEE divisions — bit-deterministic, no rounding
    games needed. This is the standard pre-training quality-filter shape
    (length + lexical-diversity + stopword heuristics).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = tokens()
    n = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    stops = F.array([F.lit(s) for s in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stops, x)))
    ttr = n_uniq.cast("double") / n
    return d.select(
        "doc_id",
        "lang",
        n.cast("long").alias("n_tokens"),
        n_uniq.cast("long").alias("n_unique"),
        ttr.alias("ttr"),
        (n_stop.cast("double") / n).alias("stop_ratio"),
        (F.length(F.regexp_replace("text", " ", "")).cast("double") / n).alias(
            "avg_token_len"
        ),
        F.when((n >= 40) & (ttr >= 0.5), "high")
        .when(n >= 15, "medium")
        .otherwise("low")
        .alias("quality"),
    )


def _hits_sql(lang: str) -> str:
    lst = ",".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"LEN(list_filter(string_split(text,' '), x -> x IN ({lst})))"


Q33_SQL = f"""
SELECT
  doc_id,
  lang,
  pred_lang,
  CAST(lang = pred_lang AS BIGINT) AS is_match
FROM (
  SELECT doc_id, lang,
    CASE
      WHEN {_hits_sql('en')} >= {_hits_sql('de')}
       AND {_hits_sql('en')} >= {_hits_sql('fr')}
       AND {_hits_sql('en')} >= {_hits_sql('es')}
       AND {_hits_sql('en')} > 0 THEN 'en'
      WHEN {_hits_sql('de')} >= {_hits_sql('fr')}
       AND {_hits_sql('de')} >= {_hits_sql('es')}
       AND {_hits_sql('de')} > 0 THEN 'de'
      WHEN {_hits_sql('fr')} >= {_hits_sql('es')}
       AND {_hits_sql('fr')} > 0 THEN 'fr'
      WHEN {_hits_sql('es')} > 0 THEN 'es'
      ELSE 'und'
    END AS pred_lang
  FROM documents
)
"""


@register("q33_lang_id", Q33_SQL)
def q33_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: stopword-hit argmax with a fixed tie order.

    The production version would use n-gram profiles (same shape: per-doc
    vectorized token-set membership counts, zero shuffles); the heuristic
    is the deterministic, oracle-checkable core.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = tokens()

    def hits(lang: str) -> Column:
        arr = F.array([F.lit(s) for s in STOPWORDS[lang]])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    en, de, fr, es = hits("en"), hits("de"), hits("fr"), hits("es")
    pred = (
        F.when((en >= de) & (en >= fr) & (en >= es) & (en > 0), "en")
        .when((de >= fr) & (de >= es) & (de > 0), "de")
        .when((fr >= es) & (fr > 0), "fr")
        .when(es > 0, "es")
        .otherwise("und")
    )
    return d.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        (F.col("lang") == pred).cast("long").alias("is_match"),
    )


Q34_SQL = """
SELECT
  doc_id,
  md5(lower(text)) AS fingerprint,
  CAST(COUNT(*) OVER (PARTITION BY md5(lower(text))) AS BIGINT) AS n_same
FROM documents
"""


@register("q34_fingerprint", Q34_SQL)
def q34_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 of normalized text) + exact-dup group size.

    The hash-groupBy exact-dedup primitive: at 100 TB the fingerprint is
    the shuffle key and dup groups collapse map-side.
    """
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.col("text")))
    w = Window.partitionBy(fp)
    return d.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_same"),
    )


Q35_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
idx AS (
  SELECT doc_id, toks, UNNEST(range(1, GREATEST(LEN(toks) - 4, 1) + 1)) AS i FROM t
)
SELECT
  doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_shingles,
  CAST(COUNT(DISTINCT md5(array_to_string(toks[i:i+4], ' '))) AS BIGINT) AS n_unique_shingles,
  MIN(md5(array_to_string(toks[i:i+4], ' '))) AS min_shingle_fp
FROM idx
GROUP BY doc_id
"""


@register("q35_shingle_fingerprint", Q35_SQL)
def q35_shingle_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-gram shingle fingerprints per document: shingle count, distinct
    count, and the minimum shingle hash (a 1-permutation MinHash — the
    building block ``llm.dedup`` generalizes to full MinHash+LSH)."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens()
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 4, F.lit(1))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, 5))),
    )
    return (
        d.select("doc_id", F.explode(shingles).alias("fp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.countDistinct("fp").alias("n_unique_shingles"),
            F.min("fp").alias("min_shingle_fp"),
        )
    )


@register("q57_stratified_sample")  # rows-only: samplers are engine-internal
def q57_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded stratified subsampling by language — the corpus-balancing
    primitive of training-data pipelines (downsample dominant languages,
    keep the tail). ``sampleBy`` is a per-row Bernoulli draw: one pass,
    no shuffle, exact fractions in expectation at any scale."""
    d = load_table(spark, sf_dir, "documents")
    fractions = {"en": 0.25, "de": 1.0, "fr": 1.0, "es": 1.0, "zh": 1.0}
    return d.sampleBy("lang", fractions, seed=42).select("doc_id", "lang", "source")


Q58_SQL = r"""
SELECT
  doc_id,
  regexp_replace(
    regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+', '<EMAIL>', 'g'),
    '\d{3}[-.]?\d{3}[-.]?\d{4}', '<PHONE>', 'g'
  ) AS scrubbed,
  CAST(LEN(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+')) AS BIGINT) AS n_emails,
  CAST(LEN(regexp_extract_all(text, '\d+')) AS BIGINT) AS n_numbers
FROM documents
"""


@register("q58_pii_scrub", Q58_SQL)
def q58_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: email/phone redaction + counts — the standard
    pre-training cleaning pass, all JVM-side regex (one scan, no shuffle,
    linear at 100 TB)."""
    d = load_table(spark, sf_dir, "documents")
    email = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+"
    phone = r"\d{3}[-.]?\d{3}[-.]?\d{4}"
    scrub = F.regexp_replace(
        F.regexp_replace("text", email, "<EMAIL>"), phone, "<PHONE>"
    )
    return d.select(
        "doc_id",
        scrub.alias("scrubbed"),
        F.size(F.regexp_extract_all("text", F.lit(email), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(r"\d+"), 0)).cast("long").alias("n_numbers"),
    )


Q59_SQL = r"""
SELECT
  doc_id,
  CAST(LEN(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
  CAST(LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_ish_tokens,
  CAST(LEN(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS numeric_tokens,
  CAST(CEIL(LEN(text) / 4.0) AS BIGINT) AS byte_len_estimate
FROM documents
"""


@register("q59_token_counting", Q59_SQL)
def q59_token_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace and a BPE-ish regex
    (words / numbers / single punctuation — the pre-tokenizer split every
    BPE vocabulary refines), plus the chars/4 budget estimate. One scan,
    all JVM regex — the canonical corpus-sizing pass at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    bpe = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    return d.select(
        "doc_id",
        F.size(tokens()).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(bpe), 0)).cast("long").alias(
            "bpe_ish_tokens"
        ),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).cast("long").alias(
            "numeric_tokens"
        ),
        F.ceil(F.length("text") / 4.0).cast("long").alias("byte_len_estimate"),
    )


Q82_SQL = """
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents
),
freq AS (
  SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
),
total AS (SELECT COUNT(*) AS n FROM tok)
SELECT
  t.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(f.cnt) AS BIGINT) AS sum_corpus_freq,
  CAST(SUM(f.cnt) AS DOUBLE) / (COUNT(*) * ANY_VALUE(total.n)) AS mean_token_freq,
  CAST(SUM(CASE WHEN f.cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
FROM tok t
JOIN freq f ON f.token = t.token
CROSS JOIN total
GROUP BY t.doc_id
"""


@register("q82_token_rarity", Q82_SQL)
def q82_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency rarity scoring per document — the
    transcendental-free cousin of perplexity filtering (CCNet-style):
    a document whose tokens are corpus-rare scores low mean frequency and
    high hapax count; boilerplate scores the opposite.

    Float discipline: per-token frequencies are summed as BIGINTs (exact,
    order-independent — summing per-token double ratios would be
    partition-order dependent) with ONE double division at the end; no
    log/exp (libm last-bit behavior differs across engines, so perplexity
    proper is not oracle-hashable).

    Scale: token explode → map-side-combined count (vocab-sized), then
    a join of tokens to frequencies and one doc-keyed aggregation. The
    frequency table is scalar-typed, so AQE's runtime stats are accurate:
    it broadcasts while the vocabulary is genuinely small and switches to
    a shuffle join at 100 TB vocab sizes (10^8+ tokens) — unlike the
    array-column relations that must pin shuffle_hash (see CLAUDE.md).
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens()).alias("token"))
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = tok.agg(F.count(F.lit(1)).alias("n"))
    return (
        tok.join(freq, "token")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("cnt").cast("long").alias("sum_corpus_freq"),
            (
                F.sum("cnt").cast("double")
                / (F.count(F.lit(1)) * F.any_value("n"))
            ).alias("mean_token_freq"),
            F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_hapax"),
        )
    )

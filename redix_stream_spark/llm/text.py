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


def quality_columns() -> list:
    """The q32 quality expressions over a ``text`` column, as reusable
    Columns. Stateless, so they apply identically to a batch DataFrame
    and a streaming one (tests/test_streaming_llm.py drives both and
    compares) — the Spark-first payoff: one operator definition, two
    execution modes."""
    toks = tokens()
    n = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    stops = F.array([F.lit(s) for s in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stops, x)))
    ttr = n_uniq.cast("double") / n
    return [
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
    ]


@register("q32_doc_quality", Q32_SQL)
def q32_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring: token counts, type-token ratio,
    stopword ratio, average token length, and a quality bucket.

    All ratios are int/int IEEE divisions — bit-deterministic, no rounding
    games needed. This is the standard pre-training quality-filter shape
    (length + lexical-diversity + stopword heuristics).
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", *quality_columns())


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


Q88_SQL = """
WITH ranked AS (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS STRING)), doc_id
         ) AS rk
  FROM documents
)
SELECT lang, doc_id, n_chars, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 25
"""


@register("q88_quota_sample", Q88_SQL)
def q88_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language quota sample: exactly 25 docs per
    stratum, chosen by md5(doc_id) order — the reproducible corpus-
    balancing primitive (q57's Bernoulli sampler draws *approximate*
    fractions and is engine-internal; this one is exact-quota and
    hash-verifiable cross-engine, so a re-run or a different engine
    selects the identical sample).

    Scale: languages are a low-cardinality, highly skewed partition key —
    naively windowing by lang would sort whole-language partitions. The
    rank<=k filter compiles to WindowGroupLimit (plan-asserted): each
    input partition forwards at most k rows per language, so the shuffle
    carries ≤ k × #partitions rows per language no matter how large the
    corpus — the low-cardinality skew never materializes.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("lang", "doc_id", "n_chars")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 25)
    )


#: Target language mixture for q101 (weights sum to 1; budget in docs).
MIXTURE_WEIGHTS = {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}
MIXTURE_BUDGET = 200

_MIX_QUOTAS = {k: int(v * MIXTURE_BUDGET) for k, v in MIXTURE_WEIGHTS.items()}

Q101_SQL = f"""
WITH ranked AS (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS STRING)), doc_id
         ) AS rk
  FROM documents
)
SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk
FROM ranked
WHERE rk <= CASE lang
  {" ".join(f"WHEN '{k}' THEN {n}" for k, n in _MIX_QUOTAS.items())}
  ELSE 0 END
"""


@register("q101_mixture_sample", Q101_SQL)
def q101_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted data-mixture sampling: draw a training subset matching a
    target language mixture (MIXTURE_WEIGHTS × MIXTURE_BUDGET docs),
    deterministically by md5(doc_id) order — the curriculum/mixture
    primitive behind "40% en, 15% each of de/es/fr/zh"-style corpus
    recipes. Strata short of their quota contribute what they have
    (rank never exceeds availability); unknown languages contribute 0.

    Same WindowGroupLimit shape as q88: a per-key CASE limit alone
    defeats InferWindowGroupLimit (the rule needs a literal bound), so
    the filter carries the constant max-quota bound conjoined with the
    per-key refinement — the literal drives the pushed group limit (each
    input partition forwards ≤ max-quota rows per language; the
    whole-language sort never materializes) and the CASE trims the rest.
    Plan-asserted in tests/test_plans.py.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    quota = F.lit(0)
    for k, n in _MIX_QUOTAS.items():
        quota = F.when(F.col("lang") == k, n).otherwise(quota)
    max_quota = max(_MIX_QUOTAS.values())
    return (
        d.select("lang", "doc_id")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter((F.col("rk") <= max_quota) & (F.col("rk") <= quota))
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
    Stopword skew in the shuffle regime is measured in SCALING.md
    ("stopword skew"): on a 50%-hot-key fixture the salting path
    (plans.skew.salted_join) beats AQE's runtime skew split 1.75× — use
    it if a deployment ever outgrows the freq broadcast.
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


Q83_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
tok AS (SELECT doc_id, UNNEST(toks) AS token FROM t),
tc AS (SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY doc_id, token),
ta AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
         CAST(MAX(c) AS BIGINT) AS top_token_count
  FROM tc GROUP BY doc_id
),
bgx AS (
  SELECT doc_id, toks, UNNEST(range(1, GREATEST(LEN(toks) - 1, 1) + 1)) AS i FROM t
),
bga AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(COUNT(DISTINCT array_to_string(toks[i:i+1], ' ')) AS BIGINT)
           AS n_distinct_bigrams
  FROM bgx GROUP BY doc_id
)
SELECT
  ta.doc_id,
  ta.n_tokens,
  ta.n_distinct_tokens,
  ta.top_token_count,
  CAST(ta.top_token_count AS DOUBLE) / ta.n_tokens AS top_token_frac,
  CAST(bga.n_bigrams - bga.n_distinct_bigrams AS DOUBLE) / bga.n_bigrams
    AS dup_bigram_frac,
  CAST(CAST(ta.top_token_count AS DOUBLE) / ta.n_tokens <= 0.12
       AND CAST(bga.n_bigrams - bga.n_distinct_bigrams AS DOUBLE) / bga.n_bigrams
           <= 0.08 AS BIGINT) AS keep
FROM ta JOIN bga ON ta.doc_id = bga.doc_id
"""


@register("q83_repetition_quality", Q83_SQL)
def q83_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition heuristics per document: most-frequent-
    token fraction and duplicate-bigram fraction, plus a keep flag — the
    boilerplate/spam filter every pretraining pipeline runs before dedup.

    Float discipline: both fractions are a single BIGINT/BIGINT double
    division (correctly rounded, identical cross-engine); the keep flag is
    BIGINT 0/1 (no BOOLEAN output — the driver canonicalizer hashes scalar
    cells). Token counts come from the explode→(doc_id, token) groupBy —
    map-side combined, well-distributed shuffle key — rather than a
    per-row O(distinct×len) higher-order scan, which degrades quadratically
    on long documents at 100 TB. Bigram distinctness IS per-row
    (array_distinct over the doc's own bigram array): linear in doc length,
    map-only, no shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = tokens()
    tc = (
        d.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ta = tc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_tokens"),
        F.max("c").cast("long").alias("top_token_count"),
    )
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
    )
    # Materialized once; size/array_distinct read the column (dedup.py's
    # multi-reference pattern — avoids re-splitting the text per reference).
    bga = d.select("doc_id", bigrams.alias("bg")).select(
        "doc_id",
        F.size("bg").cast("long").alias("n_bigrams"),
        F.size(F.array_distinct("bg")).cast("long").alias("n_distinct_bigrams"),
    )
    top_frac = F.col("top_token_count").cast("double") / F.col("n_tokens")
    dup_frac = (F.col("n_bigrams") - F.col("n_distinct_bigrams")).cast(
        "double"
    ) / F.col("n_bigrams")
    return ta.join(bga, "doc_id").select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        "top_token_count",
        top_frac.alias("top_token_frac"),
        dup_frac.alias("dup_bigram_frac"),
        F.when((top_frac <= 0.12) & (dup_frac <= 0.08), 1)
        .otherwise(0)
        .cast("long")
        .alias("keep"),
    )


Q85_SQL = """
WITH b AS (
  SELECT doc_id, lang, n_chars,
         CAST(('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 6)) AS BIGINT) % 10
           AS bucket
  FROM documents
)
SELECT
  CASE WHEN bucket < 8 THEN 'train'
       WHEN bucket = 8 THEN 'valid'
       ELSE 'test' END AS split,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
  CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
  CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
FROM b
GROUP BY 1
"""


@register("q85_hash_split", Q85_SQL)
def q85_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test assignment by id-stable hash —
    the reproducible-split primitive of training pipelines (never rand():
    re-runs, backfills, and cross-engine re-reads must agree on every
    row's split). Bucket = md5(doc_id) first 24 bits mod 10 → 80/10/10.

    Scale: pure map-side expression per row plus a 3-group aggregate with
    map-side combine — no join, no skew, trivially 100 TB-safe. The same
    bucket expression filters any downstream read (predicate on a
    deterministic function pushes to the scan's row level).
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long")
        % 10
    )
    split = (
        F.when(bucket < 8, "train").when(bucket == 8, "valid").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "doc_id", "lang", "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
            F.max("doc_id").cast("long").alias("max_doc_id"),
        )
    )


Q86_SQL = """
WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents),
tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, token
),
df AS (
  SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM tok GROUP BY token
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS tfidf_lin
  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY tfidf_lin DESC, token
  ) AS rk FROM scored
)
SELECT doc_id, token, tf, df, tfidf_lin, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 3
"""


@register("q86_tfidf_keywords", Q86_SQL)
def q86_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document — the keyword-extraction /
    topic-tagging primitive. Uses linear IDF (tf·N/df) instead of
    tf·ln(N/df): the ranking is identical (ln is monotone) and the score
    is ONE correctly-rounded double division of exact BIGINTs, so it
    hash-matches cross-engine where libm's ln would not (see numeric.py).
    tf·N stays exact while tf·N < 2^53 — beyond that (≳10⁹-doc corpora
    with high-tf docs), switch the sort key to the (tf, N/df) pair or
    dsum_big's floor-split; ties break on token for determinism.

    Scale: tf is a (doc_id, token)-keyed map-side-combined aggregate; df
    is vocabulary-sized with scalar columns, so AQE broadcasts it while
    small and shuffle-joins at 10⁸⁺-token vocabularies (q82's note); the
    rank window partitions BY DOC — thousands of tiny sorts, never a
    single-partition global window.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens()).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df = tok.groupBy("token").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    n = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    scored = (
        tf.join(df, "token")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")).alias(
                "tfidf_lin"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf_lin"), F.asc("token")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "token", "tf", "df", "tfidf_lin", "rk")
    )


# --- q108: source vocabulary drift (exact total-variation matrix) -----------

Q108_SQL = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
),
cnt AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS n
  FROM tok GROUP BY source, token
),
tot AS (SELECT source, CAST(SUM(n) AS BIGINT) AS nt FROM cnt GROUP BY source),
c AS (
  SELECT cnt.source AS source, token, n, nt
  FROM cnt JOIN tot ON cnt.source = tot.source
),
inn AS (
  SELECT a.source AS source_a, b.source AS source_b,
         a.nt AS na, b.nt AS nb,
         CAST(SUM(ABS(a.n * b.nt - b.n * a.nt) - a.n * b.nt - b.n * a.nt)
              AS BIGINT) AS s
  FROM c a JOIN c b ON a.token = b.token AND a.source < b.source
  GROUP BY a.source, b.source, a.nt, b.nt
)
SELECT source_a, source_b,
       CAST(2 * na * nb + s AS DOUBLE) / CAST(2 * na * nb AS DOUBLE)
         AS tv_distance,
       na AS tokens_a, nb AS tokens_b
FROM inn
"""


@register("q108_source_drift", Q108_SQL)
def q108_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary drift between sources: exact total-variation
    distance between unigram distributions — the corpus-mixture health
    check run before blending crawls (CCNet/RedPajama-style curation).

    TV(a,b) = ½·Σ_t |n_at/N_a − n_bt/N_b| is computed WITHOUT per-term
    float division: cross-multiplying gives Σ|n_at·N_b − n_bt·N_a| /
    (2·N_a·N_b), and tokens present in only one source contribute their
    whole mass — algebraically Σ_{t∈a}n_at·N_b = N_a·N_b, so the
    union-vocabulary sum folds to 2·N_a·N_b + Σ_{t∈both}(|…| − n_at·N_b
    − n_bt·N_a): only the *inner* vocabulary join is ever evaluated, no
    full-outer join, no missing-token edge cases. All integer arithmetic
    (exact in both engines) until one final IEEE divide; the bound holds
    while N_a·N_b < 2^52 (≈ 6·10⁷ tokens per source — beyond that,
    dsum_big-split the sum).

    Scale shape: token counts are map-side-combined aggregates of vocab
    cardinality (not corpus cardinality); the pair join keys on token
    over per-source *vocabularies* (≤ sources × vocab rows, zipfian but
    bounded); per-source totals broadcast.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(tokens()).alias("token"))
    cnt = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cnt.groupBy("source").agg(F.sum("n").alias("nt"))
    c = cnt.join(F.broadcast(tot), "source")
    a, b = c.alias("a"), c.alias("b")
    term = (
        F.abs(F.col("a.n") * F.col("b.nt") - F.col("b.n") * F.col("a.nt"))
        - F.col("a.n") * F.col("b.nt")
        - F.col("b.n") * F.col("a.nt")
    )
    inn = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.col("a.nt").alias("na"),
            F.col("b.nt").alias("nb"),
        )
        .agg(F.sum(term).alias("s"))
    )
    two_nanb = F.lit(2) * F.col("na") * F.col("nb")
    return inn.select(
        "source_a",
        "source_b",
        ((two_nanb + F.col("s")).cast("double") / two_nanb.cast("double")).alias(
            "tv_distance"
        ),
        F.col("na").alias("tokens_a"),
        F.col("nb").alias("tokens_b"),
    )


# --- q120: exact heavy hitters via Misra-Gries candidate generation ---------

HH_K = 50  # heavy hitter = token with > 1/HH_K of all occurrences
MG_COUNTERS = 4 * HH_K  # counters per partition summary (slack cuts FPs)

Q120_SQL = f"""
WITH tok AS (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM tok)
SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occ, tot.n_total AS n_total
FROM tok, tot
GROUP BY token, tot.n_total
HAVING COUNT(*) * {HH_K} > tot.n_total
"""


def _mg_candidates(batches, k: int = MG_COUNTERS):
    """Per-partition Misra-Gries summary over an Arrow batch iterator.

    Classic streaming frequent-items sketch, batched: merge each batch's
    value_counts into the counter dict; when the dict exceeds k entries,
    subtract the (size-k)-th smallest count from every counter and drop
    the non-positive ones (a uniform decrement — the MG invariant). Total
    decrement ≤ N_p/(k+1), so any token with local count > N_p/k is
    guaranteed to survive the partition summary.
    """
    import numpy as np
    import pandas as pd

    counters: dict[str, int] = {}
    for pdf in batches:
        for tok, c in pdf["token"].value_counts().items():
            counters[tok] = counters.get(tok, 0) + int(c)
        if len(counters) > k:
            vals = np.fromiter(counters.values(), dtype=np.int64)
            cut = int(np.partition(vals, len(vals) - k - 1)[len(vals) - k - 1])
            counters = {t: c - cut for t, c in counters.items() if c > cut}
    yield pd.DataFrame({"token": list(counters.keys())})


@register("q120_heavy_hitters", Q120_SQL)
def q120_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (tokens with > 1/{HH_K} of all occurrences)
    with a shuffle bounded by partitions×{MG_COUNTERS}, not by vocabulary.

    The naive plan groups the FULL (token, count) space — at 100 TB the
    token shuffle is the job. Two passes instead:

    1. map-only: each partition computes a Misra-Gries summary
       (_mg_candidates). Pigeonhole across partitions: a token with
       global count > N/{HH_K} has local count > N_p/{HH_K} in at least
       one partition, and MG guarantees such tokens survive that
       partition's summary — so the union of summaries is a SUPERSET of
       the true heavy hitters (possibly plus false positives; never
       false negatives).
    2. exact recount of candidates only: the corpus re-explodes map-side,
       a broadcast semi-join keeps candidate tokens, and the groupBy
       shuffles only those — bounded rows per partition whatever the
       corpus size. The final threshold is an integer compare against
       the 1-row total, so the output is exact and the oracle is plain
       SQL with no sketch in it (same exactness discipline as q116).

    The only Python is the per-partition sketch (Arrow-batched,
    value_counts-vectorized); both counting passes stay JVM-side.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    from ..session import ship_package

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens()).alias("token"))
    ship_package(spark)
    cands = toks.mapInPandas(
        _mg_candidates, StructType([StructField("token", StringType())])
    ).distinct()
    total = d.select(
        F.sum(F.size(tokens())).cast("long").alias("n_total")
    )
    return (
        toks.join(F.broadcast(cands), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_occ") * HH_K > F.col("n_total"))
        .select("token", "n_occ", "n_total")
    )


# --- q123: phrase search via positional postings ----------------------------

#: Fixed demo phrase (exists in the synthetic corpus); any phrase works —
#: the plan shape is per-term postings filters + position-offset joins.
PHRASE = ("row", "column", "sort")

Q123_SQL = f"""
WITH postings AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, t[i] AS token
  FROM (
    SELECT doc_id, string_split(text, ' ') AS t,
           UNNEST(range(1, LEN(string_split(text, ' ')) + 1)) AS i
    FROM documents
  )
),
hits AS (
  SELECT p0.doc_id, p0.pos
  FROM postings p0
  JOIN postings p1 ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
  JOIN postings p2 ON p2.doc_id = p0.doc_id AND p2.pos = p0.pos + 2
  WHERE p0.token = '{PHRASE[0]}' AND p1.token = '{PHRASE[1]}'
    AND p2.token = '{PHRASE[2]}'
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_matches,
       MIN(pos) AS first_pos
FROM hits GROUP BY doc_id
"""


@register("q123_phrase_search", Q123_SQL)
def q123_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search over positional postings — the full-text-
    search primitive (docs containing the exact token sequence, with
    occurrence counts and first position).

    The plan is the inverted-index shape: one postings relation
    (doc_id, pos, token) with a PER-TERM filter pushed to each branch,
    then position-offset equi-joins on (doc_id, pos±k). Candidates are
    bounded by the rarest term's document frequency — never a corpus
    scan per query term. At rest you would materialize postings
    partitioned by token (partition pruning turns each branch into a
    single-term read — the q119 layout story applied to text); here the
    three branches share one in-memory postings projection.
    """
    d = load_table(spark, sf_dir, "documents")
    postings = d.select(
        "doc_id", F.posexplode(tokens()).alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "token")
    p0, p1, p2 = (
        postings.filter(F.col("token") == PHRASE[k]).select(
            F.col("doc_id").alias(f"d{k}"), F.col("pos").alias(f"pos{k}")
        )
        for k in range(3)
    )
    hits = (
        p0.join(p1, (F.col("d1") == F.col("d0")) & (F.col("pos1") == F.col("pos0") + 1))
        .join(p2, (F.col("d2") == F.col("d0")) & (F.col("pos2") == F.col("pos0") + 2))
        .select(F.col("d0").alias("doc_id"), "pos0")
    )
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("pos0").alias("first_pos"),
    )


# --- q125: compression-ratio quality signal ---------------------------------


@register("q125_compression_ratio")  # rows-only: zlib is engine-external
def q125_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document zlib compression ratio — the RefinedWeb/CCNet-family
    repetitiveness signal: highly compressible text (ratio << 1 vs the
    corpus norm) is boilerplate/template/repetition; near-incompressible
    text is noise or binary junk. Complements q83's exact token-level
    repetition fractions with an information-theoretic whole-document
    measure that catches long-range repetition n-gram windows miss.

    Arrow-batched mapInPandas (stdlib zlib level 6, fixed — deterministic
    for a given zlib build), map-only, zero shuffles: the same
    embarrassingly-parallel shape as the multimodal decode stage. The
    keep flag (ratio within [0.25, 0.95]) matches common pipeline
    practice of cutting both tails. Rows-only face (no zlib in the
    oracle engine); the planted-fixture semantics are pytest-pinned.
    """
    import zlib

    import pandas as pd

    from ..session import ship_package

    d = load_table(spark, sf_dir, "documents")

    def run(batches):
        for pdf in batches:
            raw = pdf["text"].str.encode("utf-8")
            n_raw = raw.str.len().astype("int64")
            n_comp = raw.map(lambda b: len(zlib.compress(b, 6))).astype("int64")
            ratio = n_comp / n_raw.clip(lower=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": n_raw,
                    "n_compressed": n_comp,
                    "ratio": ratio,
                    "keep": ((ratio >= 0.25) & (ratio <= 0.95)).astype("int64"),
                }
            )

    ship_package(spark)
    return d.select("doc_id", "text").mapInPandas(
        run, "doc_id long, n_bytes long, n_compressed long, ratio double, keep long"
    )


# --- q131: token bigram model table -----------------------------------------

Q131_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
bi AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT doc_id, toks, UNNEST(range(1, LEN(toks))) AS i FROM t)
),
uni AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS n_w1 FROM bi GROUP BY w1)
SELECT bi.w1, bi.w2,
       CAST(COUNT(*) AS BIGINT) AS n,
       uni.n_w1 AS n_w1,
       CAST(COUNT(*) AS DOUBLE) / uni.n_w1 AS p_cond
FROM bi JOIN uni USING (w1)
GROUP BY bi.w1, bi.w2, uni.n_w1
"""


@register("q131_token_bigrams", Q131_SQL)
def q131_token_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram model table: P(w2 | w1) as exact counts plus one
    integer-ratio IEEE division per row — the statistical-LM training
    table (and the data behind perplexity-style quality filters; q82's
    rarity scoring is its unigram cousin). Document boundaries do not
    produce cross-document bigrams (windows stay within each token
    array).

    Scale: the bigram explode is map-side; conditional counts group on
    (w1, w2) and the w1 marginals on w1 — the join and both aggregates
    share the w1 key, and the vocabulary² upper bound is never realized
    (observed bigrams only). Stopword-headed w1 keys are the q82/q86
    skew regime: same pinned guidance (freq-table broadcast in-regime,
    salting beyond).
    """
    d = load_table(spark, sf_dir, "documents")
    # Single-token guard: size-1 = 0 would make sequence(1, 0) default to
    # step -1 and emit [1, 0] — two phantom rows with a NULL token that the
    # oracle's range(1, LEN) (empty when LEN=1) never produces. Filter the
    # degenerate docs out BEFORE building the index sequence.
    bigr = F.expr(
        "transform(sequence(1, size(toks) - 1),"
        " i -> struct(toks[i - 1] as w1, toks[i] as w2))"
    )
    bi = (
        d.select(F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(F.explode(bigr).alias("b"))
        .select("b.w1", "b.w2")
    )
    uni = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("n_w1"))
    return (
        bi.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .join(uni, "w1")
        .select(
            "w1",
            "w2",
            "n",
            F.col("n_w1").cast("long").alias("n_w1"),
            (F.col("n").cast("double") / F.col("n_w1")).alias("p_cond"),
        )
    )


# ---------------------------------------------------------------------------
# q184 — top collocations by pointwise mutual information (PMI), the
# association-mining readout over the corpus bigram model (q131 is the
# table; this is its ranking). Church & Hanks 1990's word-association
# ratio, computed INTEGER-EXACT: PMI = log(c_xy·N / (c1_x·c2_y)) is
# monotone in its argument, so ranking and reporting use the scaled
# rational (c_xy·N·PMI_SCALE) DIV (c1_x·c2_y) and no log/float ever
# exists (the q176 RA_SCALE discipline).
# ---------------------------------------------------------------------------

#: Fixed-point scale for the PMI ratio (ppm). Envelope: c_xy ≤ N and the
#: numerator c_xy·N·PMI_SCALE ~ 1e12·1e12·1e6 = 1e30 at 100 TB token
#: counts — inside DECIMAL(38,0)/HUGEINT; the DIV result ≤ N·PMI_SCALE
#: ~ 1e18 stays inside BIGINT.
PMI_SCALE = 10**6
#: Noise floor: a pair seen fewer times cannot rank (rare-pair PMI is
#: maximal by construction — the classic PMI pathology).
PMI_MIN_COUNT = 5
PMI_TOP = 40

Q184_SQL = f"""
WITH toks AS (
  SELECT string_split(text, ' ') AS t FROM documents
  WHERE LEN(string_split(text, ' ')) >= 2
),
bi AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM toks, LATERAL (SELECT UNNEST(range(1, LEN(t))) AS i)
),
pair AS (
  SELECT w1, w2, COUNT(*) AS n_xy FROM bi GROUP BY w1, w2
),
lft AS (SELECT w1, COUNT(*) AS n_x FROM bi GROUP BY w1),
rgt AS (SELECT w2, COUNT(*) AS n_y FROM bi GROUP BY w2),
tot AS (SELECT COUNT(*) AS nn FROM bi),
scored AS (
  SELECT p.w1, p.w2,
         CAST(p.n_xy AS BIGINT) AS n_xy,
         CAST(l.n_x AS BIGINT) AS n_x,
         CAST(r.n_y AS BIGINT) AS n_y,
         CAST(CAST(p.n_xy AS HUGEINT) * t.nn * {PMI_SCALE}
              // (CAST(l.n_x AS HUGEINT) * r.n_y) AS BIGINT)
           AS pmi_ratio_ppm
  FROM pair p
  JOIN lft l USING (w1)
  JOIN rgt r USING (w2)
  CROSS JOIN tot t
  WHERE p.n_xy >= {PMI_MIN_COUNT}
)
SELECT w1, w2, n_xy, n_x, n_y, pmi_ratio_ppm,
       CAST(ROW_NUMBER() OVER (ORDER BY pmi_ratio_ppm DESC, w1, w2)
            AS BIGINT) AS rank
FROM scored
ORDER BY pmi_ratio_ppm DESC, w1, w2
LIMIT {PMI_TOP}
"""


@register("q184_pmi_collocations", Q184_SQL)
def q184_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top PMI_TOP collocations: adjacent word pairs whose co-occurrence
    most exceeds chance — PMI = log(c_xy·N / (c1(x)·c2(y))) over bigram
    events (c1 = count as left word, c2 = count as right word, N = all
    bigrams; the self-consistent bigram-event model, so marginals sum
    to N exactly). The phrase-discovery readout behind tokenizer vocab
    curation and stopword-collocation audits (q131's conditional table
    ranks by P(w2|w1); PMI symmetrizes away both words' frequency).

    Exactness: log is monotone, so ranking and the reported score use
    the scaled integer rational (c_xy·N·PMI_SCALE) DIV (c1·c2) widened
    to DECIMAL(38,0)/HUGEINT before the multiply — no float path, the
    face is hash-exact (envelope in PMI_SCALE's note). PMI_MIN_COUNT
    floors away the rare-pair pathology (a hapax pair maximizes PMI).

    Scale: the bigram explode is map-side (q131); pair counts group on
    (w1, w2), marginals on w1 / w2 — three map-side-combined aggregates
    over one pass shape. The min-count filter lands on the PAIR relation
    before both marginal joins, so the joins see only plausible
    collocations; marginals are vocabulary-sized (NOT bounded — keyed
    shuffle joins, never broadcast: the q82/q86 stopword-skew regime,
    salting guidance applies past ~1e9 vocab). N is a broadcast 1-row
    relation; top-k is orderBy+limit (TakeOrdered) with rank stamped on
    the PMI_TOP rows."""
    d = load_table(spark, sf_dir, "documents")
    bigr = F.expr(
        "transform(sequence(1, size(toks) - 1),"
        " i -> struct(toks[i - 1] as w1, toks[i] as w2))"
    )
    bi = (
        d.select(F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(F.explode(bigr).alias("b"))
        .select("b.w1", "b.w2")
    )
    pair = (
        bi.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
        .filter(F.col("n_xy") >= PMI_MIN_COUNT)
    )
    lft = bi.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("n_x"))
    rgt = bi.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n_y"))
    tot = bi.agg(F.count(F.lit(1)).cast("long").alias("nn"))
    dec = "decimal(38,0)"
    # Marginals are vocabulary-sized (unbounded at 100 TB) — pin the
    # keyed shuffle so the size estimator can never auto-broadcast them
    # (the SCALING.md fat-relation OOM discipline).
    scored = (
        pair.join(lft.hint("shuffle_hash"), "w1")
        .join(rgt.hint("shuffle_hash"), "w2")
        .join(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "n_xy",
            "n_x",
            "n_y",
            F.expr(
                f"CAST((CAST(n_xy AS {dec}) * nn * {PMI_SCALE})"
                f" DIV (CAST(n_x AS {dec}) * n_y) AS BIGINT)"
            ).alias("pmi_ratio_ppm"),
        )
    )
    top = scored.orderBy(
        F.desc("pmi_ratio_ppm"), F.asc("w1"), F.asc("w2")
    ).limit(PMI_TOP)
    rank_w = Window.orderBy(F.desc("pmi_ratio_ppm"), F.asc("w1"), F.asc("w2"))
    return top.select(
        "w1",
        "w2",
        "n_xy",
        "n_x",
        "n_y",
        "pmi_ratio_ppm",
        F.row_number().over(rank_w).cast("bigint").alias("rank"),
    )


# ---------------------------------------------------------------------------
# q189 — bigram surprisal scoring: the SEQUENCE-aware quality filter next
# to q82's bag-of-words rarity. A document whose adjacent-word transitions
# are corpus-improbable (inverse conditional bigram probability is high)
# is the CCNet "high-perplexity" removal candidate; q82 can't see a doc
# made of common words in nonsense ORDER — this face exists for exactly
# that document.
# ---------------------------------------------------------------------------

#: Fixed-point scale for per-bigram inverse conditional probability
#: n_w1/n_xy (≥ 1 by construction). Envelope: n_w1 ≤ N ~1e12 at 100 TB,
#: ×SCALE 1e6 = 1e18 per term — BIGINT-safe per term; the per-doc sum is
#: widened to DECIMAL(38,0) before aggregation.
SURPRISAL_SCALE = 10**6
SURPRISAL_TOP = 25

Q189_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE LEN(string_split(text, ' ')) >= 2
),
bi AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM toks, LATERAL (SELECT UNNEST(range(1, LEN(t))) AS i)
),
pair AS (SELECT w1, w2, COUNT(*) AS n_xy FROM bi GROUP BY w1, w2),
lft  AS (SELECT w1, COUNT(*) AS n_x FROM bi GROUP BY w1),
doc AS (
  SELECT b.doc_id,
         COUNT(*) AS n_bigrams,
         SUM(CAST(CAST(l.n_x AS HUGEINT) * {SURPRISAL_SCALE} // p.n_xy
                  AS HUGEINT)) AS surp_sum
  FROM bi b JOIN pair p USING (w1, w2) JOIN lft l USING (w1)
  GROUP BY b.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_bigrams AS BIGINT) AS n_bigrams,
       CAST(surp_sum // n_bigrams AS BIGINT) AS mean_surprisal_ppm,
       CAST(ROW_NUMBER() OVER (
              ORDER BY surp_sum // n_bigrams DESC, doc_id)
            AS BIGINT) AS rank
FROM doc
ORDER BY mean_surprisal_ppm DESC, doc_id
LIMIT {SURPRISAL_TOP}
"""


@register("q189_bigram_surprisal", Q189_SQL)
def q189_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SURPRISAL_TOP most sequence-improbable documents: per-doc
    mean inverse conditional bigram probability, scaled —
    mean_t [ c(w1)·SCALE DIV c(w1,w2) ] over the doc's adjacent pairs.
    Exactly 1·SCALE when every transition is deterministic in the
    corpus; grows with out-of-model word order. The perplexity-filter
    surrogate that stays transcendental-free (q82's docstring: libm
    log/exp last bits differ cross-engine; this face ranks by exact
    integers instead — inverse probability is monotone with per-bigram
    surprisal, and its mean is the hashable stand-in for the log-mean).

    Scale: bigram explode map-side (q131/q184's shape); the model join
    keys (w1, w2) then w1 — scalar-typed frequency relations, so AQE
    broadcasts them while genuinely small and shuffles at 100 TB vocab
    (q82's regime note, salting guidance included); the per-doc
    aggregate is doc-keyed map-side-combined; top-k is orderBy+limit
    (TakeOrdered) with rank stamped on SURPRISAL_TOP rows."""
    d = load_table(spark, sf_dir, "documents")
    bigr = F.expr(
        "transform(sequence(1, size(toks) - 1),"
        " i -> struct(toks[i - 1] as w1, toks[i] as w2))"
    )
    bi = (
        d.select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= 2)
        .select("doc_id", F.explode(bigr).alias("b"))
        .select("doc_id", "b.w1", "b.w2")
    )
    pair = bi.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_xy")
    )
    lft = bi.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("n_x"))
    dec = "decimal(38,0)"
    doc = (
        bi.join(pair, ["w1", "w2"])
        .join(lft, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(
                F.expr(f"CAST(n_x * {SURPRISAL_SCALE} DIV n_xy AS {dec})")
            )
            .cast(dec)
            .alias("surp_sum"),
        )
    )
    scored = doc.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_bigrams",
        F.expr("CAST(surp_sum DIV n_bigrams AS BIGINT)").alias(
            "mean_surprisal_ppm"
        ),
    )
    top = scored.orderBy(
        F.desc("mean_surprisal_ppm"), F.asc("doc_id")
    ).limit(SURPRISAL_TOP)
    rank_w = Window.orderBy(F.desc("mean_surprisal_ppm"), F.asc("doc_id"))
    return top.select(
        "doc_id",
        "n_bigrams",
        "mean_surprisal_ppm",
        F.row_number().over(rank_w).cast("bigint").alias("rank"),
    )


# ---------------------------------------------------------------------------
# q199 — vocabulary growth curve (Heaps' law readout). How fast does the
# corpus stop teaching the tokenizer new types? Deciles of the ingestion
# order (doc_id range), per decile: documents, token occurrences, NEW
# types (tokens first seen there), cumulative vocabulary. The curve a
# data-mixture owner reads before buying more of the same source — a
# flattening tail means marginal docs add occurrences, not coverage
# (Heaps 1978: V ~ K·n^beta). All integer arithmetic, hash-exact.
# ---------------------------------------------------------------------------

VOCAB_DECILES = 10

Q199_SQL = f"""
WITH bounds AS (
  SELECT MIN(doc_id) AS lo, MAX(doc_id) + 1 AS hi FROM documents
),
docs AS (
  SELECT doc_id,
         (doc_id - lo) * {VOCAB_DECILES} // (hi - lo) AS decile,
         LEN(string_split(text, ' ')) AS n_toks
  FROM documents, bounds
),
occ AS (
  SELECT d.decile, t.token
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
        FROM documents) t
  JOIN docs d ON d.doc_id = t.doc_id
),
firsts AS (
  SELECT token, MIN(decile) AS first_decile FROM occ GROUP BY token
),
per AS (
  SELECT decile,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_toks) AS BIGINT) AS n_tokens
  FROM docs GROUP BY decile
),
news AS (
  SELECT first_decile AS decile, CAST(COUNT(*) AS BIGINT) AS new_types
  FROM firsts GROUP BY first_decile
)
SELECT p.decile, p.n_docs, p.n_tokens,
       CAST(COALESCE(n.new_types, 0) AS BIGINT) AS new_types,
       CAST(SUM(COALESCE(n.new_types, 0))
            OVER (ORDER BY p.decile) AS BIGINT) AS cum_types
FROM per p LEFT JOIN news n ON n.decile = p.decile
ORDER BY p.decile
"""


@register("q199_vocab_growth", Q199_SQL)
def q199_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth by ingestion decile: documents, token
    occurrences, first-seen types, and the cumulative vocabulary curve
    (module comment — the Heaps-law readout behind "does more of this
    source still buy coverage?").

    Exactness: the decile is integer range arithmetic on doc_id (no
    NTILE — rank-free, shuffle-free, append-stable: a grown corpus
    shifts boundaries but never re-ranks within them); first-seen is a
    keyed MIN; everything is BIGINT.

    Scale: one explode feeds a map-side-combined (token → MIN decile)
    aggregate — vocabulary-sized state, the q31 regime; per-decile
    rollups are map-side; the only window orders the 10-row decile
    relation. A celebrity token costs a MIN, never a buffer."""
    d = load_table(spark, sf_dir, "documents")
    b = d.agg(
        F.min("doc_id").alias("lo"),
        (F.max("doc_id") + 1).alias("hi"),
    )
    docs = d.join(F.broadcast(b)).select(
        "doc_id",
        F.expr(
            f"(doc_id - lo) * {VOCAB_DECILES} DIV (hi - lo)"
        ).alias("decile"),
        F.size(tokens()).cast("long").alias("n_toks"),
        "text",
    )
    firsts = (
        docs.select("decile", F.explode(tokens()).alias("token"))
        .groupBy("token")
        .agg(F.min("decile").alias("first_decile"))
    )
    per = docs.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
    )
    news = firsts.groupBy(
        F.col("first_decile").alias("decile")
    ).agg(F.count(F.lit(1)).cast("long").alias("new_types"))
    w = Window.orderBy("decile")
    return (
        per.join(news, "decile", "left")
        .select(
            "decile",
            "n_docs",
            "n_tokens",
            F.coalesce(F.col("new_types"), F.lit(0))
            .cast("long")
            .alias("new_types"),
        )
        .withColumn(
            "cum_types", F.sum("new_types").over(w).cast("long")
        )
        .orderBy("decile")
    )


# --- q206: PII scrubbing (corpus-safety cleaning pass) ----------------------

# Patterns chosen for identical semantics in Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repetition and \b only — no
# lookaround, no backreferences (RE2 has neither).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

#: Deterministic planted PII (the synthetic corpus has none naturally):
#: every 7th doc gains an email + phone + IP derived from its doc_id,
#: every 21st a second email — identical text built on both engines, so
#: the counters and the redacted hash are meaningfully nonzero AND
#: hash-comparable.
_PII_AUG_SQL = """
CASE WHEN doc_id % 7 = 0 THEN
  text || ' reach user' || CAST(doc_id AS STRING)
       || '@example.com or 555-555-'
       || lpad(CAST(doc_id % 10000 AS STRING), 4, '0')
       || ' from 10.0.' || CAST(doc_id % 200 AS STRING)
       || '.' || CAST(doc_id % 250 AS STRING)
       || CASE WHEN doc_id % 21 = 0
               THEN ' cc admin' || CAST(doc_id AS STRING) || '@ex.org'
               ELSE '' END
ELSE text END
"""

Q206_SQL = f"""
WITH aug AS (
  SELECT doc_id, {_PII_AUG_SQL} AS t FROM documents
),
red AS (
  SELECT doc_id,
         CAST(LEN(regexp_extract_all(t, '{PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
         CAST(LEN(regexp_extract_all(t, '{PII_PHONE_RE}')) AS BIGINT) AS n_phones,
         CAST(LEN(regexp_extract_all(t, '{PII_IP_RE}')) AS BIGINT) AS n_ips,
         regexp_replace(
           regexp_replace(
             regexp_replace(t, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
             '{PII_PHONE_RE}', '<PHONE>', 'g'),
           '{PII_IP_RE}', '<IP>', 'g') AS clean
  FROM aug
)
SELECT doc_id, n_emails, n_phones, n_ips,
       CAST(LENGTH(clean) AS BIGINT) AS clean_len,
       md5(clean) AS clean_hash
FROM red
WHERE n_emails + n_phones + n_ips > 0
"""


@register("q206_pii_scrub", Q206_SQL)
def q206_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (round 10): detect-and-redact emails / NANP-style
    phone numbers / IPv4 addresses per document — the corpus-safety
    cleaning pass every public-web pretraining pipeline runs (the C4
    lineage: scrub before dedup so redaction tokens, not raw contact
    strings, participate downstream). Counters per class + the redacted
    text's length and md5 (the hash makes the driver verify the EXACT
    redacted string, not just the counts).

    Cross-engine: patterns restricted to the Java-regex ∩ RE2 common
    subset (classes, bounded repeats, \\b — no lookaround/backrefs);
    patterns ride ``F.lit`` per the CLAUDE.md backslash rule; DuckDB's
    ``regexp_replace`` gets the 'g' flag to match Spark's
    replace-all default. The synthetic corpus has no natural PII, so a
    deterministic doc_id-derived planting (identical expression both
    engines) makes every counter class nonzero.

    Scale: map-only — three extract_alls + three chained replaces per
    row, whole-stage-codegen'd JVM regex, no shuffle, no UDF; the
    filter keeps output at the PII-bearing subset."""
    d = load_table(spark, sf_dir, "documents")
    aug = d.select("doc_id", F.expr(_PII_AUG_SQL).alias("t"))
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), F.lit(PII_EMAIL_RE), F.lit("<EMAIL>")),
            F.lit(PII_PHONE_RE),
            F.lit("<PHONE>"),
        ),
        F.lit(PII_IP_RE),
        F.lit("<IP>"),
    )
    red = aug.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(PII_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(PII_PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.size(F.regexp_extract_all("t", F.lit(PII_IP_RE), F.lit(0)))
        .cast("long")
        .alias("n_ips"),
        clean.alias("clean"),
    )
    return red.filter(
        F.col("n_emails") + F.col("n_phones") + F.col("n_ips") > 0
    ).select(
        "doc_id",
        "n_emails",
        "n_phones",
        "n_ips",
        F.length("clean").cast("long").alias("clean_len"),
        F.md5("clean").alias("clean_hash"),
    )

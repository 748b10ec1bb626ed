"""q142 distributed BPE vs a pure-Python reference implementation."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from redix_stream_spark.llm.bpe import (
    BPE_MERGES,
    EOW,
    _apply_merge,
    fit_bpe,
    q142_bpe_merges,
)
from redix_stream_spark.llm.text import tokens


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Sennrich-style reference: count pairs over (word, freq), merge the
    most frequent pair (ties → lexicographically smallest), greedy
    leftmost non-overlapping application."""
    vocab = {w: tuple(list(w) + [EOW]) for w in word_counts}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += word_counts[w]
        if not pairs:
            break
        (a, b), cnt = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, a, b, a + b, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = tuple(out)
    return merges, vocab


def test_bpe_matches_reference_on_corpus(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = {
        r["word"]: r["cnt"]
        for r in d.select(F.explode(tokens()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    expected, ref_vocab = _ref_bpe(counts, BPE_MERGES)
    got, vocab_df = fit_bpe(d, BPE_MERGES)
    assert got == expected
    # the rewritten symbol sequences agree word-for-word too
    got_vocab = {
        r["word"]: tuple(r["symbols"]) for r in vocab_df.collect()
    }
    assert got_vocab == ref_vocab


def test_bpe_query_face_shape(spark, sf_dir):
    df = q142_bpe_merges(spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= BPE_MERGES
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r["merged"] == r["left"] + r["right"]
        assert r["pair_count"] > 0


def test_apply_merge_is_greedy_leftmost_nonoverlapping(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "a", "a", "a"],), (["x", "a", "a", "y"],)],
        "symbols array<string>",
    )
    out = [
        r[0]
        for r in df.select(
            _apply_merge(F.col("symbols"), "a", "a").alias("m")
        ).collect()
    ]
    assert out == [["aa", "a"], ["aa", "aa"], ["x", "aa", "y"]]


def test_bpe_early_stop_on_fully_merged_vocab(spark):
    # one single-char word: merge 1 fuses (a, EOW); afterwards no pairs
    # remain and fit_bpe must stop early rather than loop.
    d = spark.createDataFrame([("a a a",)], "text string")
    merges, vocab = fit_bpe(d, 5)
    assert merges == [(1, "a", EOW, "a" + EOW, 3)]
    assert [tuple(r["symbols"]) for r in vocab.collect()] == [("a" + EOW,)]


def test_q163_encode_matches_reference_token_counts(spark, sf_dir):
    """Per-doc encoded token counts equal the pure-Python reference
    (same merges, greedy leftmost application per word)."""
    from redix_stream_spark.llm.bpe import q163_bpe_encode

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = {
        r["word"]: r["cnt"]
        for r in d.select(F.explode(tokens()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    _, ref_vocab = _ref_bpe(counts, BPE_MERGES)
    per_doc = {
        (r["doc_id"], r["word"]): r["cnt"]
        for r in d.select("doc_id", F.explode(tokens()).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    expected: dict[int, list[int]] = {}
    for (doc_id, word), cnt in per_doc.items():
        e = expected.setdefault(doc_id, [0, 0, 0])
        e[0] += cnt
        e[1] += cnt * len(ref_vocab[word])
        e[2] += cnt * (len(word) + 1)
    got = {
        r["doc_id"]: [r["n_words"], r["n_tokens"], r["n_init_symbols"]]
        for r in q163_bpe_encode(spark, sf_dir).collect()
    }
    assert got == expected
    for n_words, n_tokens, n_init in got.values():
        assert n_words <= n_tokens <= n_init

"""Property-based tests (hypothesis) for the engine's pure kernels —
the invariants the example-based suites can't sweep."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from redix_stream_spark.llm.dedup import MERSENNE_P, N_BANDS, N_PERMS, PERM_PARAMS
from redix_stream_spark.streaming.log import TOMBSTONE, _stringify

from .oracle_check import canon_rows, compare

import pandas as pd

payloads = st.dictionaries(
    st.text(min_size=0, max_size=8),
    st.one_of(st.text(max_size=12), st.integers(), st.floats(allow_nan=False)),
    max_size=6,
)


@given(payloads)
def test_stringify_matches_reference_coercion(payload):
    # stream.ex:16-17,30 — every key/value becomes a string; idempotent.
    out = _stringify(payload)
    assert all(isinstance(k, str) and isinstance(v, str) for k, v in out.items())
    assert _stringify(out) == out
    assert set(out) == {str(k) for k in payload}


def test_tombstone_is_its_own_stringification():
    assert _stringify(TOMBSTONE) == TOMBSTONE


def test_minhash_parameters_well_formed():
    # a ∈ [1, p): the permutation must be a bijection mod p (a ≠ 0);
    # fixed length and bands dividing perms keep banding total.
    assert len(PERM_PARAMS) == N_PERMS
    assert N_PERMS % N_BANDS == 0
    for a, b in PERM_PARAMS:
        assert 1 <= a < MERSENNE_P
        assert 0 <= b < MERSENNE_P


rows = st.lists(
    st.tuples(
        st.integers(min_value=-(2**40), max_value=2**40),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.text(max_size=6),
    ),
    max_size=8,
)


@given(rows)
@settings(max_examples=50)
def test_compare_is_order_and_column_order_insensitive(data):
    # The local oracle harness must treat row order and column order as
    # irrelevant — exactly like the driver's order-insensitive hash.
    df1 = pd.DataFrame(data, columns=["a", "b", "c"])
    df2 = df1.iloc[::-1][["c", "a", "b"]]
    assert canon_rows(df1) == canon_rows(df2[["a", "b", "c"]])
    assert compare(df1, df2) == []


@given(rows, st.integers(min_value=0, max_value=7))
@settings(max_examples=50)
def test_compare_detects_any_single_cell_change(data, seed):
    if not data:
        return
    df1 = pd.DataFrame(data, columns=["a", "b", "c"])
    df2 = df1.copy()
    i = seed % len(df2)
    df2.loc[i, "a"] = df2.loc[i, "a"] + 1
    assert compare(df1, df2) != []


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=60, unique=True
    ),
    st.sampled_from([1, 7, 4096]),
)
def test_global_sequence_matches_sorted_rank(spark, ids, width):
    """q23b's partition-offset sequence must equal the rank a global sort
    would assign, for any unique non-negative ids and any bucket width."""
    from redix_stream_spark.operators.streamsem import global_sequence

    df = spark.createDataFrame([(i,) for i in ids], "event_id long")
    got = {
        r["event_id"]: r["seq"]
        for r in global_sequence(df, "event_id", bucket_width=width).collect()
    }
    expected = {v: i + 1 for i, v in enumerate(sorted(ids))}
    assert got == expected


def test_hll_mergeable_rollup_tracks_exact(spark, sf_dir):
    """The unioned per-group sketches must estimate the global distinct
    within HLL tolerance — the invariant that makes stored sketches
    reusable for coarser rollups without rescanning."""
    from redix_stream_spark.catalog import load_table
    from redix_stream_spark.registry import all_queries

    import pyspark.sql.functions as F

    rows = {
        r["event_type"]: r["users_estimate"]
        for r in all_queries()["q53_hll_mergeable_rollup"](spark, sf_dir).collect()
    }
    exact = (
        load_table(spark, sf_dir, "events")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()[0]["n"]
    )
    assert abs(rows["ALL"] - exact) / exact < 0.05, (rows["ALL"], exact)


# --- containment prefix-filter soundness (q107 kernel) ----------------------

def _py_shingles(text: str, k: int = 3) -> set[str]:
    toks = text.split(" ")
    return {" ".join(toks[i : i + k]) for i in range(max(len(toks) - (k - 1), 1))}


def _py_containment_candidates(docs: dict[int, set[str]], tau: float, cap: int):
    """Pure-python mirror of q107's candidate generator: df-capped
    postings, rarest-first prefix of size ⌊(1−τ)|A|⌋+1 on the probe
    side, full postings on the build side."""
    df: dict[str, int] = {}
    for ss in docs.values():
        for sh in ss:
            df[sh] = df.get(sh, 0) + 1
    out = set()
    for ida, sa in docs.items():
        sub = sorted(
            (sh for sh in sa if df[sh] <= cap), key=lambda sh: (df[sh], sh)
        )
        k = len(sa) - (4 * len(sa) + 4) // 5 + 1  # τ = 0.8
        prefix = sub[:k]
        for idb, sb in docs.items():
            if (len(sa), ida) >= (len(sb), idb):
                continue
            if any(sh in sb and df[sh] <= cap for sh in prefix):
                out.add((ida, idb))
    return out


corpus = st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=12).map(
        lambda t: " ".join(t)
    ),
    min_size=2,
    max_size=8,
)


@given(corpus)
@settings(max_examples=200, deadline=None)
def test_prefix_filter_never_loses_a_containment_pair(texts):
    """Soundness of the q107 prefix filter (pigeonhole): with no df cap,
    every pair with containment ≥ τ over the smaller set MUST appear in
    the candidate set — the filter may over-generate, never under."""
    docs = {i: _py_shingles(t) for i, t in enumerate(texts)}
    cand = _py_containment_candidates(docs, tau=0.8, cap=10**9)
    for ida, sa in docs.items():
        for idb, sb in docs.items():
            if (len(sa), ida) >= (len(sb), idb):
                continue
            if len(sa & sb) / len(sa) >= 0.8:
                assert (ida, idb) in cand, (texts[ida], texts[idb])


@given(corpus, st.integers(min_value=1, max_value=4))
@settings(max_examples=100, deadline=None)
def test_prefix_filter_df_cap_miss_set_is_the_documented_one(texts, cap):
    """With a df cap, a containment pair may be missed ONLY when the
    probe doc has fewer than k sub-cap shingles (q107's documented miss
    class) — pairs are never lost for any other reason."""
    docs = {i: _py_shingles(t) for i, t in enumerate(texts)}
    df: dict[str, int] = {}
    for ss in docs.values():
        for sh in ss:
            df[sh] = df.get(sh, 0) + 1
    cand = _py_containment_candidates(docs, tau=0.8, cap=cap)
    for ida, sa in docs.items():
        for idb, sb in docs.items():
            if (len(sa), ida) >= (len(sb), idb):
                continue
            if len(sa & sb) / len(sa) >= 0.8 and (ida, idb) not in cand:
                k = len(sa) - (4 * len(sa) + 4) // 5 + 1
                n_subcap = sum(1 for sh in sa if df[sh] <= cap)
                assert n_subcap < k, (texts[ida], texts[idb], cap)


# --- GIF LZW decoder (q43 multimodal kernel) --------------------------------

lzw_streams = st.tuples(
    st.integers(min_value=2, max_value=6),  # min code size → palette 4..64
    st.lists(st.integers(min_value=0, max_value=3), min_size=1, max_size=400),
)


@given(lzw_streams)
@settings(max_examples=150, deadline=None)
def test_lzw_roundtrip_against_dictionary_encoder(params):
    """The pure-stdlib GIF LZW decoder must invert a real dictionary-
    building encoder for any index stream — runs, repeats (KwKwK),
    code-width growth, and CLEAR handling all land here."""
    min_cs, idx = params
    idx = [i % (1 << min_cs) for i in idx]
    from redix_stream_spark.llm.multimodal import _lzw_decode

    from .gif_fixture import lzw_encode

    assert _lzw_decode(min_cs, lzw_encode(min_cs, idx), len(idx)) == idx


# --- total-variation kernel (q108) ------------------------------------------

dists = st.tuples(
    st.lists(st.tuples(st.text("abc", min_size=1, max_size=2),
                       st.integers(min_value=1, max_value=50)),
             min_size=1, max_size=8, unique_by=lambda t: t[0]),
    st.lists(st.tuples(st.text("abc", min_size=1, max_size=2),
                       st.integers(min_value=1, max_value=50)),
             min_size=1, max_size=8, unique_by=lambda t: t[0]),
)


@given(dists)
@settings(max_examples=200, deadline=None)
def test_tv_distance_folding_identity(pair):
    """q108's algebraic fold — TV = (2·Na·Nb + Σ_both(|…|−naNb−nbNa)) /
    (2·Na·Nb) — must equal the textbook ½·Σ_union |pa−pb| for any pair
    of count vectors (the identity that justifies inner-join-only)."""
    a, b = dict(pair[0]), dict(pair[1])
    na, nb = sum(a.values()), sum(b.values())
    textbook = 0.5 * sum(
        abs(a.get(t, 0) / na - b.get(t, 0) / nb) for t in set(a) | set(b)
    )
    s = sum(
        abs(a[t] * nb - b[t] * na) - a[t] * nb - b[t] * na
        for t in set(a) & set(b)
    )
    folded = (2 * na * nb + s) / (2 * na * nb)
    assert abs(folded - textbook) < 1e-9
    assert -1e-12 <= folded <= 1 + 1e-12


def test_morton_and_hilbert_recurrences_are_bijective_space_filling():
    # Property check of the layout-key math (pure python mirror of the
    # Spark expressions): at order 2^5, both curves are bijections of the
    # grid; Hilbert is additionally adjacent (consecutive indices are
    # Manhattan-distance-1 cells), Morton is not — the fragmentation the
    # pruning test measures.
    def morton(x, y, bits=5):
        v = 0
        for b in range(bits):
            v |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return v

    def hilbert(x, y, bits=5):
        n = 1 << bits
        d = 0
        for level in reversed(range(bits)):
            s = 1 << level
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x = n - 1 - x
                    y = n - 1 - y
                x, y = y, x
        return d

    n = 32
    for fn, must_be_adjacent in ((morton, False), (hilbert, True)):
        pos = {}
        for x in range(n):
            for y in range(n):
                d = fn(x, y)
                assert 0 <= d < n * n and d not in pos
                pos[d] = (x, y)
        adjacent = all(
            abs(pos[d][0] - pos[d + 1][0]) + abs(pos[d][1] - pos[d + 1][1]) == 1
            for d in range(n * n - 1)
        )
        assert adjacent == must_be_adjacent


def test_q06b_window_face_equals_q06_join_face(spark, sf_dir):
    # The windowed aggregate face must reproduce the join face exactly on
    # any log whose per-user event ids are ts-monotone (this one). Guards
    # the rank-subtraction identity: range_cnt - (rnk - n_before) counts
    # precisely the events strictly after (ts, event_id) within the hour.
    from redix_stream_spark.registry import all_queries

    Q = all_queries()
    a = {
        r["user_id"]: r["n_pairs"]
        for r in Q["q06_range_join"](spark, sf_dir).collect()
    }
    b = {
        r["user_id"]: r["n_pairs"]
        for r in Q["q06b_range_join_agg"](spark, sf_dir).collect()
    }
    assert a == b and a


@given(st.integers(min_value=0, max_value=(1 << 54) - 1))
def test_hll_bitlen_ladder_matches_python_bit_length(w):
    """q186's generated CASE ladder must be the exact integer bit length
    (the reason it exists: floor(log2()) is off-by-one at power
    boundaries). Evaluate the ladder in pure Python by translating the
    comparisons it generates."""
    from redix_stream_spark.operators.stats import HLL_WBITS, _hll_bitlen_case

    ladder = _hll_bitlen_case("w")
    # parse "WHEN w >= T THEN K" pairs back out and apply them in order.
    import re

    pairs = re.findall(r"WHEN w >= (\d+) THEN (\d+)", ladder)
    got = 0
    for thresh, k in pairs:
        if w >= int(thresh):
            got = int(k)
            break
    assert got == w.bit_length()
    assert HLL_WBITS + 1 - got >= 1  # rho is always a valid register value


def test_audience_prefilter_prunes_disjoint_pairs_and_stays_sound(spark):
    """q195b's certificate (VERDICT r8 item 5): a planted corpus with
    two bucket-disjoint audiences must PRUNE the (A, B) pair (pruned
    count > 0) while every truly-overlapping pair survives, and the
    full face must equal the brute-force exact overlap on the fixture
    — prefilter approximate, result exact (the q116 discipline).
    User ranges 1-20 / 10001-10020 are md5-bucket-disjoint at m=4096
    (checked by construction here, not assumed)."""
    import hashlib as _hl

    from pyspark.sql import functions as F

    from redix_stream_spark.operators.analytics import (
        AUD_PREFILTER_M,
        audience_prefilter_pairs,
    )

    a_users = list(range(1, 21))
    b_users = list(range(10001, 10021))

    def _bucket(u):
        return int(_hl.md5(str(u).encode()).hexdigest()[:15], 16) % AUD_PREFILTER_M

    assert not ({_bucket(u) for u in a_users} & {_bucket(u) for u in b_users})

    rows = (
        [(u, "A") for u in a_users]
        + [(u, "B") for u in b_users]
        # C overlaps A on 5 users: must survive and count exactly.
        + [(u, "C") for u in a_users[:5]]
        + [(u, "C") for u in range(20001, 20011)]
    )
    ut = spark.createDataFrame(rows, "user_id long, event_type string")
    survivors = {
        (r["a"], r["b"]) for r in audience_prefilter_pairs(ut).collect()
    }
    all_pairs = {("A", "B"), ("A", "C"), ("B", "C")}
    assert ("A", "B") not in survivors  # provably-zero pair pruned
    assert ("A", "C") in survivors  # true overlap always survives
    pruned = all_pairs - survivors
    assert len(pruned) >= 1
    # exact face over the survivors equals brute force on the fixture:
    a = ut.select("user_id", F.col("event_type").alias("a"))
    b = ut.select("user_id", F.col("event_type").alias("b"))
    exact = {
        (r["a"], r["b"]): r["n"]
        for r in a.join(b, "user_id")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert exact == {("A", "C"): 5}  # pruned pairs had nothing to lose
    assert set(exact) <= survivors

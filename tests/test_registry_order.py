"""Driver correctness-window ordering guard.

The round driver hash-checks only the first 50 entries of ``queries()``.
These tests pin the contract: every query that has never received a driver
correctness row (or changed this round) must be inside that window, the
priority list must reference real queries, and oracles must track queries.
"""

from __future__ import annotations

from redix_stream_spark import registry

MUST_BE_IN_WINDOW = {
    # E23/E24/E26 surface, never driver-checked in round 1 (VERDICT r01 #1).
    "q35_shingle_fingerprint",
    "q36_minhash_lsh_neardup",
    "q37_ngram_jaccard_dup",
    "q38_simhash",
    "q39_multimodal_meta",
    "q40_cosine_topk",
    "q41_embedding_neardup",
    "q42_ann_lsh_topk",
    "q43_image_features",
    "q43b_ann_ivf_topk",
    "q54_pandas_udf_tokens",
    "q55_rowwise_udf_tokens",
    "q56_grouped_map_zscore",
    "q57_stratified_sample",
    "q58_pii_scrub",
    "q59_token_counting",
    # Fixed / re-implemented in round 2.
    "q52_approx_percentiles",
    "q64_returned_items",
    "q31_top_tokens",
    # New in round 2.
    "q23b_replay_scaled",
    "q67_left_outer_join",
    # q68_right_outer_join rotated out in favor of q88 (VERDICT r01 item 6
    # asked for one explicit outer-join row; q67 is it).
    "q80_neardup_clusters",
    "q81_clean_corpus",
    "q82_token_rarity",
    "q84_decontamination",
    "q83_repetition_quality",
    "q85_hash_split",
    "q86_tfidf_keywords",
    "q87_sequence_packing",
    "q88_quota_sample",
}


def test_driver_window_is_exactly_pinned():
    """All 50 driver-checked slots are explicit in DRIVER_WINDOW_PRIORITY —
    no slot is filled by registration-order accident."""
    assert len(registry.DRIVER_WINDOW_PRIORITY) == 50
    assert list(registry.all_queries())[:50] == list(
        registry.DRIVER_WINDOW_PRIORITY
    )


def test_priority_names_all_exist():
    names = set(registry.all_queries())
    missing = set(registry.DRIVER_WINDOW_PRIORITY) - names
    assert not missing, f"priority list references unknown queries: {missing}"


def test_priority_list_has_no_duplicates():
    prio = registry.DRIVER_WINDOW_PRIORITY
    assert len(prio) == len(set(prio))


def test_must_check_queries_inside_driver_window():
    window = list(registry.all_queries())[:50]
    out = MUST_BE_IN_WINDOW - set(window)
    assert not out, f"queries outside the driver's 50-entry window: {out}"


def test_oracles_are_subset_of_queries_and_ordered_consistently():
    q = list(registry.all_queries())
    o = list(registry.all_oracle_sql())
    assert set(o) <= set(q)
    pos = {n: i for i, n in enumerate(q)}
    assert o == sorted(o, key=pos.__getitem__)


def test_all_query_outputs_are_scalar_typed(spark, sf_dir):
    """The driver's canonicalizer hashes result cells; array/map/struct
    outputs are unhashable and crash it (q52's round-1 failure mode).
    Every registered query — oracle-backed or rows-only — must emit only
    scalar columns (serialize arrays to strings, q46-style)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, fn in registry.all_queries().items():
        for f in fn(spark, sf_dir).schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append((name, f.name, str(f.dataType)))
    assert not offenders, offenders

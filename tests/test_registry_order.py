"""Driver correctness-window ordering guard.

The round driver hash-checks only the first 50 entries of ``queries()``.
These tests pin the contract: every query that has never received a driver
correctness row (or changed this round) must be inside that window, the
priority list must reference real queries, and oracles must track queries.
"""

from __future__ import annotations

from redix_stream_spark import registry

MUST_BE_IN_WINDOW = {
    # Changed by the round-12 OPTIMIZATION session after the r12 window
    # was set (VERDICT r12 item 1b: no driver row yet for the new plans).
    "q157_bfs_levels",
    "q167_sssp_bounded",
    "q190_layout_advisor",
    "q200_robust_trend",
    "q134_semantic_decontaminate",
    "q121b_pq_ann_production",
    "q107b_containment_budgeted",
    "q163_bpe_encode",
    # Changed in round 13: Arrow fold scorer (kNN + density), packed
    # co-occurrence/wedge keys (graph family), shingle-set parquet
    # materialization (MinHash/cluster family).
    "q169_knn_graph",
    "q169b_knn_graph_production",
    "q174_density_clusters",
    "q174b_density_clusters_production",
    "q148_triangle_count",
    "q156_kcore_decomposition",
    "q176_link_prediction",
    "q176b_link_prediction_capped",
    "q180_lpa_communities",
    "q36_minhash_lsh_neardup",
    "q36b_minhash_production",
    "q80_neardup_clusters",
    "q80b_neardup_clusters_star",
    "q173_incremental_clusters",
}

# The 50 queries the r2 driver window checked (CORRECTNESS_r02 rows —
# permanent evidence, like the r1 rows below).
R2_CHECKED = {
    "q35_shingle_fingerprint", "q36_minhash_lsh_neardup",
    "q37_ngram_jaccard_dup", "q38_simhash", "q39_multimodal_meta",
    "q40_cosine_topk", "q41_embedding_neardup", "q42_ann_lsh_topk",
    "q43_image_features", "q43b_ann_ivf_topk", "q54_pandas_udf_tokens",
    "q55_rowwise_udf_tokens", "q56_grouped_map_zscore",
    "q57_stratified_sample", "q58_pii_scrub", "q59_token_counting",
    "q52_approx_percentiles", "q64_returned_items", "q31_top_tokens",
    "q23b_replay_scaled", "q67_left_outer_join", "q68_right_outer_join",
    "q80_neardup_clusters", "q81_clean_corpus", "q82_token_rarity",
    "q84_decontamination", "q83_repetition_quality", "q85_hash_split",
    "q86_tfidf_keywords", "q87_sequence_packing", "q88_quota_sample",
    "q53_hll_mergeable_rollup", "q70_shipping_priority",
    "q71_local_supplier_volume", "q72_volume_shipping", "q73_market_share",
    "q74_order_distribution", "q75_small_qty_revenue", "q76_large_orders",
    "q77_bracket_revenue", "q78_dormant_customers", "q79_top_supplier",
    "q89_priority_late_orders", "q90_late_lines_by_status",
    "q91_waiting_suppliers", "q94_product_profit", "q95_min_cost_supplier",
    "q96_important_parts", "q97_supplier_variety", "q98_promo_part_suppliers",
}

# The 50 queries the r3 driver window checked (CORRECTNESS_r03 rows —
# permanent evidence like the r1/r2 rows; 46 hash-green + 4 rows-only).
R3_CHECKED = {
    "q100_dup_ngram_fraction", "q101_mixture_sample", "q102_semantic_dedup",
    "q103_gapfill", "q104_decayed_avg", "q105_matview_rollup",
    "q106_latest_state", "q107_containment_dup", "q108_source_drift",
    "q109_sliding_distinct", "q109b_sliding_distinct_hll",
    "q110_rate_anomaly", "q111_jsonl_roundtrip", "q112_quality_report",
    "q113_fuzzy_join", "q114_ohlc_bars", "q115_event_transitions",
    "q116_bloom_decontaminate", "q117_boilerplate_passages",
    "q118_leakage_safe_split", "q119_zorder_key", "q119b_hilbert_key",
    "q120_heavy_hitters", "q121_pq_ann_topk", "q122_scd2_history",
    "q123_phrase_search", "q124_exact_group_median",
    "q125_compression_ratio", "q126_histogram", "q127_interval_overlap",
    "q127b_interval_overlap_agg", "q128_cooccurrence_lift",
    "q129_cohort_matrix", "q130_corpus_report", "q131_token_bigrams",
    "q132_csv_orc_roundtrip", "q133_interevent_gaps",
    "q35_shingle_fingerprint", "q36_minhash_lsh_neardup",
    "q36b_minhash_production", "q37_ngram_jaccard_dup", "q38_simhash",
    "q38b_simhash_weighted", "q39_multimodal_meta", "q40_cosine_topk",
    "q41_embedding_neardup", "q41b_embedding_neardup_fast",
    "q92_forecast_revenue", "q93_promo_revenue", "q99_passage_dedup",
}

# The 50 queries the r4 driver window checked (CORRECTNESS_r04 rows —
# permanent evidence; 47 green + 3 rows-only, all pytest-pinned). Note
# q144's r4 row predates its round-5 fixed-point rewrite — it is ALSO in
# MUST_BE_IN_WINDOW for a fresh row.
R4_CHECKED = {
    "q01_pricing_summary", "q02_filter_project", "q03_star_join_revenue",
    "q04_semi_join", "q05_anti_join", "q06_range_join", "q06b_range_join_agg",
    "q07_asof_join", "q08_agg_orders", "q09_distinct_users",
    "q10_rollup_orders", "q111_jsonl_roundtrip", "q11_cube_events",
    "q121b_pq_ann_production", "q122_scd2_history", "q124_exact_group_median",
    "q127_interval_overlap", "q127b_interval_overlap_agg", "q12_grouping_sets",
    "q131_token_bigrams", "q132_csv_orc_roundtrip",
    "q134_semantic_decontaminate", "q135_udtf_passages",
    "q136_streaming_quantiles", "q137_schema_evolution", "q138_sq8_ann_topk",
    "q139_manifest_log", "q13_window_topk_per_group", "q140_bm25_search",
    "q141_kmeans_clusters", "q142_bpe_merges", "q143_weighted_median",
    "q144_pagerank", "q14_window_analytic", "q15_top_global", "q16_set_ops",
    "q17_scalar_string_math", "q42_ann_lsh_topk", "q43_image_features",
    "q44_window_frames", "q45_string_null_fns", "q46_array_ops",
    "q47_correlation", "q48_string_agg", "q49_bitwise_misc", "q60_funnel",
    "q61_retention", "q65_unpivot", "q66_multiset_ops",
    "q80b_neardup_clusters_star",
}

# Queries with a green CORRECTNESS_r01 row — permanent evidence, safe to
# rotate behind the window (still swept locally by tests/test_oracle.py).
R1_GREEN = {
    "q01_pricing_summary", "q02_filter_project", "q03_star_join_revenue",
    "q04_semi_join", "q05_anti_join", "q06_range_join", "q07_asof_join",
    "q08_agg_orders", "q09_distinct_users", "q10_rollup_orders",
    "q11_cube_events", "q12_grouping_sets", "q13_window_topk_per_group",
    "q14_window_analytic", "q15_top_global", "q16_set_ops",
    "q17_scalar_string_math", "q18_scalar_datetime", "q19_json_props",
    "q20_tumbling_window", "q21_sliding_window", "q22_session_window",
    "q23_stream_replay", "q24_dedup_first", "q25_pending_antijoin",
    "q26_percentiles", "q27_moment_stats", "q28_pivot_events",
    "q29_map_ops", "q30_text_stats", "q32_doc_quality", "q33_lang_id",
    "q34_fingerprint", "q44_window_frames", "q45_string_null_fns",
    "q46_array_ops", "q47_correlation", "q48_string_agg",
    "q49_bitwise_misc", "q50_full_outer_join", "q51_approx_distinct",
    "q60_funnel", "q61_retention", "q62_forecast_revenue",
    "q63_promo_ratio", "q65_unpivot", "q66_multiset_ops",
}


# The 50 queries the r5 driver window checked (CORRECTNESS_r05 rows —
# permanent evidence; 47 green + 3 rows-only, all pytest-pinned). Note
# q163's r5 row predates its round-6 oracle — it is ALSO in
# MUST_BE_IN_WINDOW for a fresh hash-checked row.
R5_CHECKED = {
    "q144_pagerank", "q145_skipping_scan", "q146_merge_upsert",
    "q147_binary_ann_topk", "q148_triangle_count", "q149_zorder_table_scan",
    "q150_table_changes", "q151_pareto_frontier", "q152_mad_outliers",
    "q153_equidepth_bins", "q154_scd2_asof_join", "q155_audio_windows",
    "q156_kcore_decomposition", "q157_bfs_levels", "q158_salted_join_revenue",
    "q159_ref_integrity_audit", "q160_funnel", "q161_attribution",
    "q162_image_neardup", "q163_bpe_encode", "q164_trend_ols",
    "q165_sessionize", "q136_streaming_quantiles", "q139_manifest_log",
    "q140_bm25_search", "q40_cosine_topk", "q41_embedding_neardup",
    "q42_ann_lsh_topk", "q43_image_features", "q36_minhash_lsh_neardup",
    "q36b_minhash_production", "q109_sliding_distinct", "q120_heavy_hitters",
    "q09_distinct_users", "q26_percentiles", "q10_rollup_orders",
    "q54_pandas_udf_tokens", "q55_rowwise_udf_tokens", "q85_hash_split",
    "q88_quota_sample", "q30_text_stats", "q31_top_tokens",
    "q18_scalar_datetime", "q19_json_props", "q20_tumbling_window",
    "q21_sliding_window", "q22_session_window", "q23_stream_replay",
    "q24_dedup_first", "q25_pending_antijoin",
}


# The 50 queries the r6 driver window checked (CORRECTNESS_r06 rows —
# permanent evidence; 49 hash-green + q162 rows-only, pytest-pinned).
R6_CHECKED = {
    "q107_containment_dup", "q118_leakage_safe_split",
    "q146b_merge_schema_evolution", "q147_binary_ann_topk",
    "q162_image_neardup", "q163_bpe_encode", "q166_corpus_pipeline",
    "q167_sssp_bounded", "q168_table_restore", "q169_knn_graph",
    "q170_column_profile", "q171_cluster_histogram", "q172_top_paths",
    "q173_incremental_clusters", "q174_density_clusters", "q23b_replay_scaled",
    "q27_moment_stats", "q28_pivot_events", "q29_map_ops", "q32_doc_quality",
    "q33_lang_id", "q34_fingerprint", "q43c_ann_ivf_exact",
    "q50_full_outer_join", "q58_pii_scrub", "q59_token_counting",
    "q62_forecast_revenue", "q63_promo_ratio", "q64_returned_items",
    "q67_left_outer_join", "q68_right_outer_join", "q70_shipping_priority",
    "q71_local_supplier_volume", "q72_volume_shipping", "q73_market_share",
    "q74_order_distribution", "q75_small_qty_revenue", "q76_large_orders",
    "q77_bracket_revenue", "q78_dormant_customers", "q79_top_supplier",
    "q80_neardup_clusters", "q81_clean_corpus", "q82_token_rarity",
    "q83_repetition_quality", "q84_decontamination", "q86_tfidf_keywords",
    "q87_sequence_packing", "q89_priority_late_orders",
    "q90_late_lines_by_status",
}


# The 50 queries the r7 driver window checked (CORRECTNESS_r07 rows).
R7_CHECKED = {
    "q100_dup_ngram_fraction", "q101_mixture_sample", "q102_semantic_dedup",
    "q103_gapfill", "q104_decayed_avg", "q105_matview_rollup",
    "q106_latest_state", "q108_source_drift", "q110_rate_anomaly",
    "q112_quality_report", "q113_fuzzy_join", "q114_ohlc_bars",
    "q115_event_transitions", "q116_bloom_decontaminate",
    "q117_boilerplate_passages", "q119_zorder_key", "q119b_hilbert_key",
    "q123_phrase_search", "q126_histogram", "q128_cooccurrence_lift",
    "q129_cohort_matrix", "q166_corpus_pipeline", "q172_top_paths",
    "q175_epoch_shuffle", "q176_link_prediction", "q177_rolling_corr",
    "q178_table_delete", "q179_compact_reclaim", "q180_lpa_communities",
    "q181_winsorized_stats", "q182_bloom_point_lookup", "q183_pps_sample",
    "q184_pmi_collocations", "q185_cusum_changepoint", "q186_hll_distinct",
    "q187_key_skew_report", "q188_curriculum_manifest",
    "q189_bigram_surprisal", "q190_layout_advisor", "q191_funnel_edges",
    "q192_funnel_timing", "q193_cluster_representatives", "q194_cdc_apply",
    "q195_audience_overlap", "q91_waiting_suppliers", "q94_product_profit",
    "q95_min_cost_supplier", "q96_important_parts", "q97_supplier_variety",
    "q98_promo_part_suppliers",
}

# The 50 queries the r8 driver window checked (CORRECTNESS_r08 rows —
# 49 hash-green + q155b rows-only, pytest-pinned).
R8_CHECKED = {
    "q100_dup_ngram_fraction", "q101_mixture_sample", "q102_semantic_dedup",
    "q103_gapfill", "q104_decayed_avg", "q105_matview_rollup",
    "q106_latest_state", "q108_source_drift", "q110_rate_anomaly",
    "q112_quality_report", "q113_fuzzy_join", "q114_ohlc_bars",
    "q115_event_transitions", "q155b_audio_windows_mixed",
    "q166_corpus_pipeline", "q172_top_paths", "q175_epoch_shuffle",
    "q176_link_prediction", "q176b_link_prediction_capped",
    "q177_rolling_corr", "q178_table_delete", "q179_compact_reclaim",
    "q180_lpa_communities", "q181_winsorized_stats",
    "q182_bloom_point_lookup", "q183_pps_sample", "q184_pmi_collocations",
    "q185_cusum_changepoint", "q186_hll_distinct", "q187_key_skew_report",
    "q188_curriculum_manifest", "q189_bigram_surprisal",
    "q190_layout_advisor", "q190b_layout_advisor_sampled",
    "q191_funnel_edges", "q192_funnel_timing",
    "q193_cluster_representatives", "q194_cdc_apply",
    "q195_audience_overlap", "q196_mor_delete", "q197_rollup_trend",
    "q198_metadata_agg", "q199_vocab_growth", "q200_robust_trend",
    "q91_waiting_suppliers", "q94_product_profit", "q95_min_cost_supplier",
    "q96_important_parts", "q97_supplier_variety",
    "q98_promo_part_suppliers",
}

# The 50 queries the r9 driver window checked (CORRECTNESS_r09 rows —
# 38 hash-green + 12 declared rows-only faces, each pytest-pinned).
R9_CHECKED = {
    "q01_pricing_summary", "q02_filter_project", "q03_star_join_revenue",
    "q04_semi_join", "q05_anti_join", "q06_range_join",
    "q06b_range_join_agg", "q07_asof_join", "q08_agg_orders",
    "q109b_sliding_distinct_hll", "q111_jsonl_roundtrip", "q11_cube_events",
    "q121_pq_ann_topk", "q121b_pq_ann_production", "q125_compression_ratio",
    "q130_corpus_report", "q133_interevent_gaps", "q145_skipping_scan",
    "q146_merge_upsert", "q146b_merge_schema_evolution",
    "q149_zorder_table_scan", "q150_table_changes",
    "q155b_audio_windows_mixed", "q168_table_restore", "q178_table_delete",
    "q179_compact_reclaim", "q182_bloom_point_lookup", "q194_cdc_apply",
    "q195b_audience_overlap_prefiltered", "q196_mor_delete",
    "q198_metadata_agg", "q201_cluster_audit", "q202_seasonal_profile",
    "q203_expectations", "q204_personalized_pagerank",
    "q35_shingle_fingerprint", "q37_ngram_jaccard_dup", "q38_simhash",
    "q38b_simhash_weighted", "q39_multimodal_meta",
    "q41b_embedding_neardup_fast", "q43b_ann_ivf_topk",
    "q51_approx_distinct", "q52_approx_percentiles",
    "q53_hll_mergeable_rollup", "q56_grouped_map_zscore",
    "q57_stratified_sample", "q92_forecast_revenue", "q93_promo_revenue",
    "q99_passage_dedup",
}


# The 50 queries the r10 driver window checked (CORRECTNESS_r10 rows —
# 47 hash-green + 3 declared rows-only faces, each pytest-pinned).
R10_CHECKED = {
    "q09_distinct_users", "q107b_containment_budgeted",
    "q109_sliding_distinct", "q10_rollup_orders", "q120_heavy_hitters",
    "q122_scd2_history", "q124_exact_group_median", "q127_interval_overlap",
    "q127b_interval_overlap_agg", "q12_grouping_sets", "q131_token_bigrams",
    "q132_csv_orc_roundtrip", "q134_semantic_decontaminate",
    "q135_udtf_passages", "q136_streaming_quantiles",
    "q137_schema_evolution", "q138_sq8_ann_topk", "q139_manifest_log",
    "q13_window_topk_per_group", "q140_bm25_search", "q141_kmeans_clusters",
    "q142_bpe_merges", "q143_weighted_median", "q144_pagerank",
    "q148_triangle_count", "q14_window_analytic", "q151_pareto_frontier",
    "q152_mad_outliers", "q153_equidepth_bins", "q154_scd2_asof_join",
    "q155_audio_windows", "q15_top_global", "q16_set_ops",
    "q17_scalar_string_math", "q201_cluster_audit", "q203_expectations",
    "q205_avro_roundtrip", "q206_pii_scrub", "q207_dup_source_matrix",
    "q44_window_frames", "q45_string_null_fns", "q46_array_ops",
    "q47_correlation", "q48_string_agg", "q49_bitwise_misc",
    "q60_funnel", "q61_retention", "q65_unpivot",
    "q66_multiset_ops", "q80b_neardup_clusters_star",
}


# The 50 queries the r11 driver window checked (CORRECTNESS_r11 rows —
# permanent evidence; 48 oracle-green + 2 rows-only image faces, both
# pytest-pinned). Note q169/q174/q42/q205b's r11 rows predate their
# round-12 plan changes — they are ALSO in MUST_BE_IN_WINDOW for fresh
# rows.
R11_CHECKED = {
    "q107_containment_dup", "q118_leakage_safe_split",
    "q147_binary_ann_topk", "q156_kcore_decomposition", "q157_bfs_levels",
    "q158_salted_join_revenue", "q159_ref_integrity_audit", "q160_funnel",
    "q161_attribution", "q162_image_neardup", "q162b_image_neardup_fast",
    "q163_bpe_encode", "q164_trend_ols", "q165_sessionize",
    "q167_sssp_bounded", "q169_knn_graph", "q170_column_profile",
    "q171_cluster_histogram", "q173_incremental_clusters",
    "q174_density_clusters", "q18_scalar_datetime", "q19_json_props",
    "q205b_avro_embeddings_roundtrip", "q207_dup_source_matrix",
    "q208_quarantine_triage", "q209_hybrid_retrieval_rrf",
    "q20_tumbling_window", "q21_sliding_window", "q22_session_window",
    "q23_stream_replay", "q23b_replay_scaled", "q24_dedup_first",
    "q25_pending_antijoin", "q26_percentiles", "q27_moment_stats",
    "q28_pivot_events", "q29_map_ops", "q30_text_stats", "q31_top_tokens",
    "q32_doc_quality", "q36_minhash_lsh_neardup", "q36b_minhash_production",
    "q40_cosine_topk", "q41_embedding_neardup", "q42_ann_lsh_topk",
    "q43_image_features", "q54_pandas_udf_tokens", "q55_rowwise_udf_tokens",
    "q85_hash_split", "q88_quota_sample",
}


# The 50 queries the r12 driver window checked (CORRECTNESS_r12 rows —
# permanent evidence; all 50 hash-green).
R12_CHECKED = {
    "q116_bloom_decontaminate", "q117_boilerplate_passages",
    "q119_zorder_key", "q119b_hilbert_key", "q123_phrase_search",
    "q126_histogram", "q144_pagerank", "q169_knn_graph",
    "q169b_knn_graph_production", "q174_density_clusters",
    "q174b_density_clusters_production", "q180_lpa_communities",
    "q204_personalized_pagerank", "q205_avro_roundtrip",
    "q205b_avro_embeddings_roundtrip", "q208_quarantine_triage",
    "q210_filtered_ann_search", "q211_exact_substring_dedup",
    "q211b_exact_substring_winnowed", "q33_lang_id", "q34_fingerprint",
    "q42_ann_lsh_topk", "q43c_ann_ivf_exact", "q50_full_outer_join",
    "q58_pii_scrub", "q59_token_counting", "q62_forecast_revenue",
    "q63_promo_ratio", "q64_returned_items", "q67_left_outer_join",
    "q68_right_outer_join", "q70_shipping_priority",
    "q71_local_supplier_volume", "q72_volume_shipping", "q73_market_share",
    "q74_order_distribution", "q75_small_qty_revenue", "q76_large_orders",
    "q77_bracket_revenue", "q78_dormant_customers", "q79_top_supplier",
    "q80_neardup_clusters", "q81_clean_corpus", "q82_token_rarity",
    "q83_repetition_quality", "q84_decontamination", "q86_tfidf_keywords",
    "q87_sequence_packing", "q89_priority_late_orders",
    "q90_late_lines_by_status",
}


def test_every_query_has_a_driver_row_across_rounds():
    """The current window + the r1–r8 rows must cover every registered
    query, so that after this round no query has ever gone
    driver-unchecked."""
    window = set(list(registry.all_queries())[:50])
    uncovered = (
        set(registry.all_queries())
        - window
        - R1_GREEN
        - R2_CHECKED
        - R3_CHECKED
        - R4_CHECKED
        - R5_CHECKED
        - R6_CHECKED
        - R7_CHECKED
        - R8_CHECKED
        - R9_CHECKED
        - R10_CHECKED
        - R11_CHECKED
        - R12_CHECKED
    )
    assert not uncovered, f"queries with no driver row in any round: {uncovered}"


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

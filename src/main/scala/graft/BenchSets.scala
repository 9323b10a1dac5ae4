package graft

/** Fixed query-name sets for cross-round bench self-comparability
  * (VERDICT r11 task 6). The catalog grows every round, so the raw
  * `value` total is not comparable round-over-round without a
  * shared-query join; `value_r1set` / `value_prevset` in
  * bench_out.json do that join in the artifact itself.
  *
  * - `R1Set` is FROZEN FOREVER: the 36 queries of BENCH_r01.json
  *   (r1 aggregate over them: 55.04 s) — the judge's baseline gate.
  * - `PrevSet` is the PREVIOUS round's shipped catalog; update it at
  *   round start to the names in the latest CORRECTNESS_r{N-1}.json
  *   (round-15 value: the r14 159-query catalog).
  */
object BenchSets {
  val R1Set: Set[String] = Set(
    "a3_topn_per_group", "a5_dup_groups", "a6_distribution",
    "d1_exact_dedup", "d2_minhash_sig", "d3_minhash_lsh_pairs",
    "d4_simhash", "d5_jaccard_pairs", "d6_char_fingerprint",
    "f1_filter_pushdown", "j1_star_join", "j2_left_join_expand",
    "j5_semi_join", "m1_media_features", "p1_ingest_fragments",
    "p2_parent_synthesis", "p3_embed_fragments", "p4_pdf_segments",
    "p5_e2e_golden45", "q1_agg", "t1_topk", "u1_union_branches",
    "u4_anti_join", "v1_knn_exact", "v2_knn_batch", "v3_lsh_buckets",
    "v4_embed_neardup", "v5_ann_recall", "w1_window_lag",
    "w2_tumbling_window", "w3_sessionization", "w4_carry_forward",
    "x1_lang_id", "x2_quality_score", "x3_token_stats", "x4_approx_stats")

  val PrevSet: Set[String] = Set(
    "a10_pivot", "a11_minmax_by", "a12_scalar_subquery",
    "a13_distinct_agg", "a14_cube", "a15_unpivot", "a16_listagg",
    "a17_corr_exact", "a18_mode_exact", "a19_histogram",
    "a3_topn_per_group", "a5_dup_groups", "a6_distribution",
    "a7_rollup", "a8_grouping_sets", "a9_percentiles",
    "d10_incremental_dedup", "d11_segment_dedup", "d12_novelty",
    "d13_bloom_incremental", "d14_cdc_substring_dedup",
    "d15_cdc_materialize", "d1_exact_dedup", "d2_minhash_sig",
    "d3_minhash_lsh_pairs", "d4_simhash", "d5_jaccard_pairs",
    "d6_char_fingerprint", "d7_dup_clusters", "d8_dedup_keep",
    "d9_crossdoc_grams", "f1_filter_pushdown", "f2_array_stats",
    "g1_hash_split", "g2_stratified_sample", "g3_corpus_mix",
    "g4_sequence_packing", "g5_unimax_sample",
    "g6_cluster_balance", "g7_temperature_mix",
    "g8_temperature_alpha3", "j1_star_join",
    "j2_left_join_expand", "j3_shipping_priority", "j5_semi_join",
    "j6_asof_join", "j7_range_join", "j8_salted_join",
    "j9_asof_forward", "m1_media_features", "m2_frame_sample",
    "m3_jpeg_decode", "p10_subset_font", "p11_jpeg_xobject",
    "p12_cff_font", "p13_encrypted_pdf", "p14_scanned_pdf",
    "p15_jbig2_pdf", "p16_jpeg2000_pdf", "p17_jbig2_text",
    "p1_ingest_fragments", "p2_parent_synthesis",
    "p3_embed_fragments", "p4_pdf_segments", "p5_e2e_golden45",
    "p6_adversarial_recall", "p7_real_pdf", "p8_cid_pdf",
    "p9_hard_eval", "q10_returned", "q11_important_parts",
    "q12_shipmode", "q13_custdist", "q14_promo_ratio",
    "q15_top_supplier", "q16_supplier_cnt", "q17_small_qty",
    "q18_big_orders", "q19_disjunctive", "q1_agg",
    "q20_promo_suppliers", "q21_waiting_supplier",
    "q22_idle_rich", "q2_date_agg", "q2_min_cost_supplier",
    "q4_exists_subquery", "q5_local_volume", "q6_range_filter",
    "q7_nation_volume", "q8_market_share", "q9_profit", "t1_topk",
    "u1_union_branches", "u4_anti_join", "u5_intersect",
    "u6_except", "v10_hnsw_recall", "v11_semdedup",
    "v12_mmr_rerank", "v13_filtered_knn", "v14_hybrid_rrf",
    "v15_filtered_ann", "v16_hybrid_topk",
    "v17_retrieval_metrics", "v18_hnsw_sql_knn",
    "v19_hnsw_sql_distance", "v1_knn_exact",
    "v20_ivf_sql_distance", "v21_hnsw_maintained_serve",
    "v22_approx_serving", "v23_ivfpq_residual",
    "v24_gated_fusion", "v2_knn_batch", "v3_lsh_buckets",
    "v4_embed_neardup", "v5_ann_recall", "v6_ivf_recall",
    "v7_pq_recall", "v8_sq_recall", "v9_ivfpq_recall",
    "w10_gapfill", "w11_cohort_retention", "w12_funnel",
    "w13_sliding_active", "w14_transitions", "w15_anomaly",
    "w1_window_lag", "w2_tumbling_window", "w3_sessionization",
    "w4_carry_forward", "w5_moving_sum", "w6_range_frame",
    "w7_json_extract", "w8_rank_navigation", "w9_value_windows",
    "x10_decontaminate", "x11_fuzzy_probe", "x12_fuzzy_pairs",
    "x13_tfidf_terms", "x14_approx_topk", "x15_bpe_merges",
    "x16_rare_tokens", "x17_bpe_encode", "x18_heldout_lm",
    "x19_vocab_growth", "x1_lang_id", "x20_pii_redact",
    "x21_quality_classifier", "x22_bm25",
    "x23_perplexity_buckets", "x24_perplexity_thresholds",
    "x2_quality_score", "x3_token_stats", "x4_approx_stats",
    "x5_regex_tokens", "x6_trigram_lang", "x7_quality_filter",
    "x8_repetition", "x9_bigram_counts")
}

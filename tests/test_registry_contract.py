"""Registry grading-order contract.

The round driver records at most the FIRST 50 ``queries()`` entries
into CORRECTNESS_r{N}.json (rounds 1 and 2 each produced exactly 50
rows — a count cap). Each round the capture window is pointed at the
queries with the weakest driver-issued evidence; round 4's window
(registry.R4_DRIVER_WINDOW) holds the round-4 additions, the round-3
additions (whose driver artifacts never landed — local replica only),
the round-3-changed implementations, and as much of the §2C remainder
rotation list as fits. These tests pin that strategy so a re-shuffle
can't silently evict them.

No Spark session needed — pure dict inspection.
"""

from __future__ import annotations

from cassandra_log_analyzer_mcp_spark.plans import registry

#: the §2D training-data-pipeline core — driver-confirmed green in
#: round 2 (CORRECTNESS_r02.json); now replica-covered each round.
SECTION_2D_CORE = {
    # text analysis
    "pii_scrub", "token_count", "quality_score", "lang_id",
    "lang_confusion", "doc_fingerprint", "vocab_top_tokens",
    "doc_rarity", "doc_length_histogram", "doc_repetition",
    "repeated_ngrams", "repeated_span_coverage", "bm25_search",
    "tfidf_keywords",
    # curation
    "corpus_curation", "corpus_sample", "importance_resample",
    "decontaminate", "source_quality", "train_test_split",
    # dedup
    "dedup_exact", "dedup_normalized", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "minhash_containment", "dedup_clusters",
    "dedup_incremental", "dedup_winnow", "dedup_editdist",
    "source_overlap", "dedup_simhash",
    # similarity
    "knn_cosine_brute", "knn_quantized_int8", "ann_lsh_cosine",
    "ann_ivf_cosine", "ann_ivf_persisted", "ann_pq_cosine",
    "dedup_embedding_cosine", "kmeans_embeddings", "cluster_summary",
    "cluster_balanced_sample", "embedding_outliers",
    "doc_embedding_join",
    # multimodal (value-level evidence)
    "multimodal_decode_check",
}

#: queries NEW in round 4 (oracled) — must be driver-graded this round
NEW_IN_R4 = {
    "bloom_pruned_join", "interval_overlap_join",
    "quality_classifier", "domain_mixture", "semantic_dedup",
    "zorder_layout", "silver_incremental_rollup", "doc_gini_diversity",
    "streaming_topk_tokens", "bigram_lift_collocations",
    "user_value_deciles",
    "schema_evolution_read",
    "ann_lsh_multiprobe",
    # session-3 flagship additions (promoted into the window; four
    # shared-oracle members rotated out to make room — see
    # NEW_IN_R4_REPLICA_ONLY / NEW_IN_R3_REPLICA_ONLY)
    "error_trend_ols", "multimodal_phash_dedup", "token_counts_cms",
    "distinct_users_kmv",
    # late round-4 additions
    "silver_dpp_join", "streaming_dedup_watermarked",
    "silver_changes_between", "silver_delete_rewrite",
    "doc_pagerank", "error_cusum_changepoints",
    "open_orders_timeline", "multimodal_audio_energy",
    "ann_ivf_delete", "silver_cdc_apply",
    "revenue_grouping_sets", "pricing_summary_decimal",
    "doc_quality_skyline", "phrase_search_positional",
    "node_health_score", "streaming_cusum_alerts",
    # session-4 flagship additions (promoted into the window; six
    # shared-machinery members rotated out — see the replica-only
    # sets and registry.py comments)
    "knn_hamming_sign", "ngram_novelty_decay", "error_ewma_smoothed",
    "mixture_token_budget", "purchase_gap_hazard",
    "streaming_purchase_error_full_join",
    # session-5 flagship additions (zero evidence history); eight
    # shared-machinery members rotated out — rationale inline in
    # registry.R4_DRIVER_WINDOW
    "dedup_chunks_rewrite", "token_f2_ams", "zone_map_skip_stats",
    "table_ndv_kmv", "error_seasonal_mad", "error_trend_theilsen",
    "range_selectivity_eval", "shard_rebalance_eval",
}

#: round-4 additions past the 50-slot cap — replica-covered, each
#: with targeted unit evidence (the window already holds 16 r4 rows;
#: further eviction of unique-oracle r3 rows would trade like for
#: like).
NEW_IN_R4_REPLICA_ONLY = {
    # rotated out for the session-3 flagships: both share
    # silver_node_errors' oracle (graded in-window via
    # silver_incremental_rollup) and keep physical-side unit tests
    "orc_export_roundtrip", "silver_time_travel",
    "log_parse_corrupt_tolerant",
    "pricing_summary_sql", "node_summary_unpivot",
    "hybrid_rrf_search", "scd_owner_join", "user_trailing_spend",
    "streaming_rack_counts", "k_anonymity_audit", "dp_noised_counts",
    "value_drift_eras", "cascade_erasure", "error_rate_sliding",
    "error_independence_chi2", "part_copurchase_rules",
    "dedup_graph_triangles", "node_coverage_gaps",
    "embedding_drift_batches", "shard_balance_report",
    "augment_token_dropout", "impute_hourly_locf", "slo_burn_alerts",
    "contrastive_pairs", "embedding_sim_histogram",
    "streaming_dlq_counts", "streaming_trend_state",
    "excess_inventory_suppliers",
    "node_lead_lag", "silver_vacuum",
    "streaming_kmv_state", "streaming_late_data_drop",
    "cumulative_distinct_users", "above_avg_orders",
    "event_path_trigrams", "minhash_estimate_eval",
    "user_feature_matrix", "props_variant_stats",
    "error_forecast_next_day", "ship_latency_percentiles",
    "mmr_diversified_search", "ann_recall_eval",
    "multimodal_scene_cuts", "error_rate_wilson_ci",
    "repeat_purchase_rate",
    # session-4 additions kept replica-only because their graded
    # machinery is driver-covered elsewhere: last_touch_attribution
    # shares the r1-graded asof carry-forward, priority_sample the
    # r2-graded salted-hash sampling
    "last_touch_attribution", "priority_sample",
    # its streaming twin shares priority_sample's oracle — a window
    # slot would duplicate coverage the replica already provides
    "streaming_priority_sample", "weighted_price_quartiles",
    "cluster_purity_eval", "kmv_set_ops", "corpus_release_manifest",
    "minhash_dedup_pr_eval", "partition_evolution_read",
    "knn_truncated_dims_eval", "funnel_time_bounded",
    "streaming_funnel_state", "template_trending_decayed",
}

#: queries NEW in round 3 (oracled) — driver evidence still pending
NEW_IN_R3 = {
    "ann_ivf_pq_cosine", "bpe_train_merges",
}

#: round-3 additions evicted from the window for the late round-4
#: queries: each shares its oracle/aggregation body with another
#: graded query and keeps targeted unit tests + the replica gate.
NEW_IN_R3_REPLICA_ONLY = {
    # rotated out for the session-3 flagships: ann_ivf_append's
    # lifecycle is exercised in-window by ann_ivf_delete
    # (build→persist→append→delete); streaming_asof_join's oracle is
    # r1-graded asof_purchase_before_error's, cross-batch state keeps
    # in-window evidence via streaming_cusum_alerts, and its
    # boundary-crossing unit test stays
    "ann_ivf_append", "streaming_asof_join",
    "jsonl_shard_export", "streaming_merge_upsert",
    "discount_band_revenue", "node_summary_silver",
    "silver_restatement", "silver_compaction",
    "streaming_kafka_issue_counts", "vocab_top_tokens_mergeable",
    "multimodal_frames_check", "bpe_encode",
    # rotated out for the session-5 flagships: in-window
    # dedup_chunks_rewrite drives the same chunk-digest machinery
    # plus the rewrite
    "chunk_dedup",
    # rotated out for the session-4 flagships (shared-machinery rule;
    # rationale inline in registry.R4_DRIVER_WINDOW)
    "corpus_shuffle", "repeated_spans_merged", "dedup_canonical",
    "sequence_packing", "decontaminate_bloom",
    # rotated out for the session-5 flagships (shared-machinery rule;
    # rationale inline in registry.R4_DRIVER_WINDOW)
    "revenue_cube", "table_profile", "constraint_checks",
    "dedup_graph_stats", "embedding_pca_project",
    "silver_merge_upsert", "doc_surprisal",
    # session-5 additions kept replica-only: the streaming twins
    # share their in-window batch oracles, the image histogram shares
    # the in-window phash payload + Arrow discipline, the template
    # alert composes the r1-graded masking, and the two inner
    # stats-family legs are composed by in-window
    # range_selectivity_eval
    "streaming_f2_ams", "streaming_seasonal_mad",
    "multimodal_image_histogram", "new_template_alert",
    "join_cardinality_eval", "column_histogram_equidepth",
    # late session-5 additions, replica-only: the branch census
    # composes the driver-covered manifest machinery
    # (silver_cdc_apply in-window), the DL verify rides in-window
    # dedup machinery (same band index as r2-graded dedup_editdist)
    # with its kernel property-tested vs DuckDB
    "silver_branch_diverge", "dedup_editdist_dl",
    # shares in-window multimodal_audio_energy's payload + kernel
    # discipline; run-merge recount unit-tested
    "multimodal_audio_vad",
    # extends the in-window trend family (error_trend_ols machinery);
    # exact-recovery unit test pins the Cramer arithmetic
    "error_trend_seasonal_ols",
    # same int8 scoring as r2-graded knn_quantized_int8; the filter
    # semantics carry their own pre/post-filter unit test
    "knn_filtered_int8",
    # rollup over r1-graded error_sessions' output (shared session
    # CTE refactored, error_sessions re-gated); hand-computed test
    "node_mtbf",
    # composes three driver-graded pair generators; census reconciled
    # against the pair sets in its unit test
    "dedup_modality_agreement",
    # composes r2-graded dedup_clusters; per-doc weights reconciled
    # against the cluster sizes in its unit test
    "dedup_soft_weights",
}

#: queries whose implementation changed in round 3 (oracle unchanged).
#: Only the two highest-complexity members keep window slots; the
#: other four were evicted for the late round-4 additions — their
#: oracles are the r1/r2-driver-graded ones and the local replica
#: re-verifies them every round.
CHANGED_IN_R3_WINDOWED = {
    "error_bursts",
}
CHANGED_IN_R3_REPLICA_ONLY = {
    "error_recovery", "burst_context", "streaming_error_bursts",
    "repeated_span_coverage",
    # rotated out for its in-window strict superset
    # streaming_purchase_error_full_join
    "streaming_purchase_error_left_join",
}

#: rows-only by design — no oracle, unit-test evidence instead;
#: anything NOT listed here must have an oracle_sql() twin.
ROWS_ONLY = {
    "distinct_users_sketch",
    "event_value_percentiles_approx",
    "event_value_percentiles_tdigest",
    "streaming_percentiles_tdigest",
    "multimodal_pipeline",
    "multimodal_frames",
}


def test_r4_window_is_first_50() -> None:
    order = list(registry.queries())
    assert len(registry.R4_DRIVER_WINDOW) == 50
    assert order[:50] == registry.R4_DRIVER_WINDOW


def test_new_and_changed_inside_driver_capture_window() -> None:
    first_50 = set(list(registry.queries())[:50])
    missing = (NEW_IN_R4 | NEW_IN_R3 | CHANGED_IN_R3_WINDOWED) - first_50
    assert not missing, f"round-3/4 queries outside the window: {missing}"
    # the evicted queries must still be registered (the replica gate
    # covers them)
    assert CHANGED_IN_R3_REPLICA_ONLY <= set(registry.queries())
    assert NEW_IN_R3_REPLICA_ONLY <= set(registry.queries())
    assert NEW_IN_R4_REPLICA_ONLY <= set(registry.queries())


def test_every_query_oracled_or_documented_rows_only() -> None:
    qs = set(registry.queries())
    oracled = set(registry.oracle_sql())
    assert ROWS_ONLY <= qs
    unexplained = qs - oracled - ROWS_ONLY
    assert not unexplained, f"queries with neither oracle nor rows-only rationale: {unexplained}"
    # every first-50 slot carries full hash evidence
    first_50 = list(registry.queries())[:50]
    assert not (set(first_50) & ROWS_ONLY)
    # oracles never reference queries that don't exist
    assert not (oracled - qs), f"orphan oracles: {oracled - qs}"


def test_section_2d_fully_registered() -> None:
    qs = set(registry.queries())
    assert SECTION_2D_CORE <= qs

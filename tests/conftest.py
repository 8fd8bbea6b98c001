import os

import pytest

from pandarallel_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# ---------------------------------------------------------------------------
# Default-suite wall-time budget (r15, the r14 verdict's #1 task): the
# suite had grown to 630 tests / 24-54 min and the driver's verify
# capture timed out mid-run ("tests_ok: false" with ~610 passing dots
# and no failure marker). The tests below — each ≥ ~4 s in an idle
# full-run duration profile, totalling ~60% of the suite's wall time —
# are exhaustive end-to-end / property / stream-replay sweeps whose
# core semantics are also covered by faster focused tests, the
# 50-query oracle parity (tests/test_oracle.py, never marked), the
# plan audits (tests/test_plans.py, never marked) and the per-
# optimization result-identity tests (kept by name). They are marked
# ``slow`` here, in one place, rather than with 89 scattered
# decorators; pytest.ini's ``addopts = -m "not slow"`` excludes them
# by default. Run them with ``pytest tests/ -m slow``, or the whole
# suite with ``pytest tests/ -m ""``.
#
# Entries are (file basename, test function name) — parametrized
# variants inherit the mark via the bare function name.
_SLOW_TESTS = {
    ("test_ann_versions.py", "test_ivf_rebuild_swap_folds_deltas_and_clears_drift"),
    ("test_ann_versions.py", "test_version_commit_marker_and_torn_swap_recovery"),
    ("test_curate.py", "test_curate_corpus_end_to_end_behavior"),
    ("test_curate.py", "test_curate_corpus_is_the_explicit_composition"),
    ("test_curate.py", "test_curate_corpus_optional_stages_and_validation"),
    ("test_curate.py", "test_curate_corpus_stage_checkpoints_cut_source_rescans"),
    ("test_curate.py", "test_write_shards_and_report"),
    ("test_dedup_text.py", "test_cosine_pairs_lsh_subset_of_exact"),
    ("test_dedup_text.py", "test_ivf_pq_kmeans_dist_recall_parity"),
    ("test_dedup_text.py", "test_ivf_pq_recall_determinism_and_rejections"),
    ("test_dedup_text.py", "test_minhash_lsh_dup_heavy_clique_matches_exact"),
    ("test_dedup_text.py", "test_minhash_lsh_star_mode_same_components"),
    ("test_dedup_text.py", "test_near_dedup_corpus_end_to_end"),
    ("test_dedup_text.py", "test_prefix_filter_lossless"),
    ("test_dedup_text.py", "test_star_contraction_beats_diameter"),
    ("test_dedup_text.py", "test_star_matches_propagation_random_graph"),
    ("test_graph_convergence.py", "test_star_matches_union_find"),
    ("test_hamming_cap.py", "test_image_constant_hot_bucket_pathology"),
    ("test_hamming_cap.py", "test_simhash_pairs_star_and_cap_dials"),
    ("test_image_dedup.py", "test_image_dedup_recall_precision_at_scale"),
    ("test_image_dedup.py", "test_image_hash_pairs_and_near_dedup"),
    ("test_incremental.py", "test_chain_through_dropped_partner_is_dropped"),
    ("test_incremental.py", "test_empty_index_degrades_to_delta_self_dedup"),
    ("test_incremental.py", "test_explicit_params_and_meta_validation"),
    ("test_incremental.py", "test_fp_matched_delta_doc_short_circuits_to_exact_only"),
    ("test_incremental.py", "test_incremental_estimate_mode_never_reads_old"),
    ("test_incremental.py", "test_incremental_pairs_match_batch_decisions"),
    ("test_incremental.py", "test_index_build_shape_and_merge_equals_whole"),
    ("test_incremental.py", "test_ingest_cycle_keeps_and_updates"),
    ("test_incremental.py", "test_stream_ingest_dedup_matches_sequential_cycles"),
    ("test_incremental_embedding.py", "test_bucket_verify_equals_pair_verify"),
    ("test_incremental_embedding.py", "test_chain_through_dropped_partner_is_dropped"),
    ("test_incremental_embedding.py", "test_empty_index_degrades_to_delta_self_dedup"),
    ("test_incremental_embedding.py", "test_index_survives_parquet_roundtrip_and_recycles"),
    ("test_incremental_embedding.py", "test_ingest_cycle_keeps_and_updates"),
    ("test_incremental_embedding.py", "test_stream_ingest_embedding_matches_sequential_cycles"),
    ("test_incremental_substr.py", "test_stream_ingest_substr_matches_sequential_cycles"),
    ("test_ingest_ann.py", "test_compact_ivf_deltas_preserves_reader_and_layout"),
    ("test_ingest_ann.py", "test_drift_monitor_hook_flips_on_a_drifting_stream"),
    ("test_ingest_ann.py", "test_stream_ingest_ann_matches_sequential_appends"),
    ("test_ingest_bpe.py", "test_stream_histogram_equals_union_and_retrain_matches"),
    ("test_ivf_kmeans.py", "test_kmeans_beats_anchors_on_head_biased_corpus"),
    ("test_ivf_kmeans.py", "test_rebuild_recenters_from_scratch"),
    ("test_pq_index.py", "test_pq_index_append_equals_build_over_union"),
    ("test_pq_index.py", "test_pq_index_rebuild_clears_drift_and_matches_inline"),
    ("test_pq_index.py", "test_pq_indexed_equals_inline_through_parquet"),
    ("test_pq_index.py", "test_stream_ingest_pq_matches_sequential_appends"),
    ("test_property.py", "test_ewm_mean_property_matches_pandas"),
    ("test_property.py", "test_ewm_times_property_matches_pandas"),
    ("test_property.py", "test_global_rolling_closed_matches_pandas"),
    ("test_property.py", "test_global_time_rolling_udf_matches_pandas"),
    ("test_property.py", "test_minhash_collapse_matches_exact_property"),
    ("test_property.py", "test_star_contraction_matches_propagation_property"),
    ("test_property.py", "test_weighted_rolling_property_matches_pandas"),
    ("test_quality_model.py", "test_end_to_end_on_testdata"),
    ("test_quality_model.py", "test_save_load_scores_identically"),
    ("test_round10.py", "test_ivf_recall_monotone_in_nprobe"),
    ("test_round10.py", "test_minhash_bucket_cap_bounds_pathological_corpus"),
    ("test_round10.py", "test_near_dedup_corpus_embedding_default_is_cosine_not_jaccard"),
    ("test_round10.py", "test_near_dedup_corpus_embedding_end_to_end"),
    ("test_round11.py", "test_compact_and_retain_preserve_reader_and_resume"),
    ("test_round11.py", "test_fresh_checkpoint_over_old_outputs_is_refused"),
    ("test_round11.py", "test_incremental_bucket_cap_bounds_delta_x_index"),
    ("test_round11.py", "test_incremental_bucket_cap_forwards_to_self_join"),
    ("test_round11.py", "test_ivf_drift_check_flags_drift_and_imbalance"),
    ("test_round11.py", "test_ivf_drift_counts_empty_lists_in_imbalance"),
    ("test_round11.py", "test_ivf_index_append_equals_rebuild_and_inline"),
    ("test_round11.py", "test_ivf_sidecar_write_read_round_trip"),
    ("test_round11.py", "test_torn_batch_replay_overwrites_cleanly"),
    ("test_semantic.py", "test_center_persistence_roundtrip_and_validation"),
    ("test_semantic.py", "test_prune_policies_keep_the_right_tail"),
    ("test_sketch_bounds.py", "test_approx_count_distinct_within_rsd"),
    ("test_streaming.py", "test_stream_stream_full_outer_union_of_directions"),
    ("test_streaming.py", "test_stream_stream_left_outer_emits_expired_only"),
    ("test_streaming.py", "test_stream_stream_right_outer_emits_expired_purchase"),
    ("test_streaming.py", "test_streaming_heavy_hitters_emit_modes"),
    ("test_window.py", "test_ewm_mean_global_vs_pandas"),
    ("test_window.py", "test_ewm_sum_vs_pandas"),
    ("test_window.py", "test_ewm_times_global_vs_pandas"),
    ("test_window.py", "test_ewm_times_positional_optin_vs_pandas"),
    ("test_window.py", "test_global_ewm_var_std_vs_pandas"),
    ("test_window.py", "test_global_expanding_builtin_bucket_carry"),
    ("test_window.py", "test_positional_builtin_rolling_nan_matches_pandas"),
    ("test_window.py", "test_rolling_closed_matches_pandas"),
    ("test_window.py", "test_rolling_cov_corr_vs_pandas"),
    ("test_window.py", "test_rolling_median_skew_kurt_vs_pandas"),
    ("test_window.py", "test_rolling_quantile_rank_vs_pandas"),
    ("test_window.py", "test_weighted_rolling_vs_pandas"),
    ("test_window.py", "test_weighted_var_global_random_vs_pandas"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = getattr(item, "originalname", None) or item.name.split("[")[0]
        if (item.fspath.basename, name) in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("pandarallel_spark_tests", cpus=8, driver_memory="8g")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR

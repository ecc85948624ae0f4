"""Query catalog: importing this package populates the registry."""

from real_time_big_data_iot_monitoring_pipeline_spark.plans import reference_queries  # noqa: F401  isort:skip
from real_time_big_data_iot_monitoring_pipeline_spark.plans import streaming_queries  # noqa: F401  isort:skip
from real_time_big_data_iot_monitoring_pipeline_spark.plans import northstar_queries  # noqa: F401  isort:skip
from real_time_big_data_iot_monitoring_pipeline_spark.plans import pipeline_queries  # noqa: F401  isort:skip
from real_time_big_data_iot_monitoring_pipeline_spark.plans import join_queries  # noqa: F401  isort:skip
from real_time_big_data_iot_monitoring_pipeline_spark.plans import extension_queries  # noqa: F401  isort:skip
from real_time_big_data_iot_monitoring_pipeline_spark.plans import skew_queries  # noqa: F401  isort:skip
from real_time_big_data_iot_monitoring_pipeline_spark.plans import staged_oracle_queries  # noqa: F401  isort:skip
from real_time_big_data_iot_monitoring_pipeline_spark.plans import olap_queries  # noqa: F401  isort:skip
from real_time_big_data_iot_monitoring_pipeline_spark.plans import analytics_queries  # noqa: F401  isort:skip
from real_time_big_data_iot_monitoring_pipeline_spark.plans import storage_queries  # noqa: F401  isort:skip
from real_time_big_data_iot_monitoring_pipeline_spark.plans import mlprep_queries  # noqa: F401  isort:skip
from real_time_big_data_iot_monitoring_pipeline_spark.plans import incremental_queries  # noqa: F401  isort:skip
from real_time_big_data_iot_monitoring_pipeline_spark.plans import sketch_queries  # noqa: F401  isort:skip
from real_time_big_data_iot_monitoring_pipeline_spark.plans import behavior_queries  # noqa: F401  isort:skip
from real_time_big_data_iot_monitoring_pipeline_spark.plans import matching_queries  # noqa: F401  isort:skip
from real_time_big_data_iot_monitoring_pipeline_spark.plans import connector_queries  # noqa: F401  isort:skip
from real_time_big_data_iot_monitoring_pipeline_spark.plans import engine_queries  # noqa: F401  isort:skip
from real_time_big_data_iot_monitoring_pipeline_spark.plans import evaluation_queries  # noqa: F401  isort:skip
from real_time_big_data_iot_monitoring_pipeline_spark.plans.registry import REGISTRY, Query, register

# The driver's correctness gate hashes the FIRST 50 registry entries, in
# `queries()` iteration order.  The window below makes that ordering
# EXPLICIT instead of an import-order side effect.
#
# ROUND-7 ROTATION (drafted 2026-08-15, round 7).  CORRECTNESS_r06.json
# came back 50/50 green; driver-hash union r1..r6 = 239 distinct
# queries; 151 oracle-bearing registrations have never had a driver
# row.  The round-6 verdict's structural directives, both executed
# this round:
#   * DRAIN, DON'T GROW — round-7 registrations are capped at ~10 new
#     queries so the backlog converges (151 -> 112 -> ~60 -> ~10 by
#     round 9 at 39 never-hashed slots/round);
#   * AMENDED STALENESS POLICY (supersedes the round-6 text): each
#     round's window = the pinned sentinel + 10 OLDEST-cohort refresh
#     slots (oldest last-hash round first) + the remaining ~39 slots
#     from the never-hashed backlog.  The old "never-hashed first"
#     rule starved the round-2 reference-core rows (age 4 and
#     climbing); reserving a fixed oldest-first quota makes both
#     queues drain, and once the never-hashed backlog is empty the
#     whole window reverts to oldest-first (target: no query's most
#     recent driver row more than 3 rounds old, which is satisfiable
#     at a frozen catalog: 396 queries / 50 slots ≈ 8 rounds full
#     cycle, with the 10-slot quota cycling the reference core far
#     faster).
#
# This window:
#   * `flagship_window_agg` pinned (driver-green r1..r6);
#   * 39 never-hashed slots, LAKEHOUSE-VERB FAMILY FIRST (the table
#     format's contract — merge/MoR-delete/restore/branch/clone/
#     zorder — per verdict item 7) plus `image_png_pipeline` (verdict
#     item 6), then streaming joins and the text-corpus census family;
#   * 10 oldest-cohort slots: the round-2 reference-core rows the
#     verdict called out by name (`iqr_anomaly`, `regression_per_group`,
#     `geo_status_map`, `rolling_avg_20`, `corr_matrix`) plus the
#     streaming replays and first-hit dashboard queries from the same
#     cohort.
#
# PRE-VALIDATION (round-7 close): the ENTIRE never-hashed backlog —
# this window's 39, the round-8 draft below, and the round-9 remainder
# (154 queries total incl. the 3 round-7 registrations) — was run
# through tools/driver_sim.py at sf0.01 this round, ALL GREEN, so the
# drain plan carries no known-red risk.
#
# ROUND-8 DRAFT under the amended policy (assuming this window lands
# green; 112 never-hashed remain — 39 below, the rest lead round 9):
# hhi_market_concentration, mann_whitney_utest, acf_hourly_means,
# spearman_qty_price, ks_two_sample_test, mutual_info_type_bucket,
# wilson_ci_return_rate, xcorr_click_purchase, key_skew_audit,
# theilsen_trend_per_type, trimmed_winsorized_means,
# pythagorean_means_per_type, conformal_forecast_interval,
# backtest_rolling_origin, kendall_tau_daily, psi_value_drift,
# ab_cuped_adjustment, kfold_regression_stability,
# nelson_aalen_hazard, revenue_bridge_decomposition, ab_power_mde,
# cluster_bootstrap_ci, robust_stl_decomposition,
# ab_sequential_monitoring, croston_intermittent_demand,
# fdr_bh_correction, parquet_schema_evolution,
# binaryfile_image_census, dynamic_partition_overwrite,
# bpe_train_merges_batched, embedding_mmr_select, hybrid_search_rrf,
# probe_calibration_ece, retrieval_ndcg_at_k,
# feature_hashing_collisions, quantile_normalize_feature,
# rag_context_packing, source_ablation_probe,
# tokenizer_fertility_by_lang, props_variant_shredded,
# recursive_cte_hierarchy, abc_classification (never-hashed slots;
# the last three rotated out of round 7's window to make room for the
# three round-7 registrations, which hash immediately instead of
# joining the backlog), plus the 10
# oldest-cohort slots from the round-2 cohort: histogram_value,
# events_per_day, severity_rollup, alerts_threshold, status_colors,
# clean_labels, distinct_types_sorted, ingestion_rate_window,
# ma_diff_trend, topn_per_group.
#
# ROUND-6 ROTATION (retained for audit).  CORRECTNESS_r05.json
# came back 50/50 green, so driver-hash history stands at
# r1∪r2∪r3∪r4∪r5 = 197 distinct queries.  Exactly 46 oracle-bearing
# queries have never had a driver row — the round-5 registrations plus
# the deliberately deferred `domain_cap_sample`.  This window:
#   * `flagship_window_agg` stays pinned as the every-round sentinel
#     (driver-green r1..r5);
#   * 46 slots take EVERY never-hashed oracle-bearing query — after
#     this window lands green the never-hashed backlog is ZERO for the
#     first time since round 2;
#   * the STALENESS-REFRESH POLICY below starts executing: the 3 spare
#     slots re-hash the 3 OLDEST driver rows (`filter_time_range`,
#     `global_kpis`, `describe_stats` — last hashed round 2, age 4).
#
# STALENESS-REFRESH POLICY (dated 2026-08-14; in force from this round):
#   * each round's window = the pinned sentinel + any never-hashed
#     oracle-bearing registrations + spare slots filled with the
#     queries whose last driver hash is OLDEST, oldest first;
#   * target invariant: no query's most recent driver row is ever more
#     than 3 rounds old.
# ROUND-7 DRAFT under that policy (assuming this window lands green):
# flagship (pinned) + the never-hashed round-6 registrations (147
# outstanding at round-6 close: catalog 396 / 390 oracle-bearing,
# driver-hashed union r1..r6 = 243; the first 49 in the list below
# take this window's slots, the rest lead round 8's)
# stream_topn_per_window_upsert, stream_full_outer_interval_join, stream_join_then_window,
# image_png_pipeline, dedup_components_incremental_smalldelta, props_variant_shredded,
# recursive_cte_hierarchy, parquet_schema_evolution, binaryfile_image_census,
# bpe_train_merges_batched, pyds_stream_sink_roundtrip, sliding_distinct_users,
# cdc_apply_scd1, lateral_top3_orders, table_profile_lineitem,
# attribution_last_touch, layout_zorder_stats, fuzzy_join_deletion1,
# array_hof_surface, session_window_dynamic_gap, udtf_chunk_text,
# spatial_grid_neighbor_join, impute_group_median, setsim_prefix_filter_join,
# phrase_search_postings, changepoint_binary_segmentation, try_cast_dirty_parse,
# filtered_aggregates_sql, map_hof_surface, collation_caseinsensitive_stats,
# xml_ingest_extract, explode_outer_surface, bitmap_distinct_users,
# udtf_longest_streak, url_parse_census, hash_integrity_census,
# observe_metrics_audit, parameterized_sql_surface,
# priority_sample_topk, mann_whitney_utest, merge_into_orders,
# bfs_shortest_hops, pyds_sink_compaction, stream_session_timeout_close,
# pyds_sink_stats_pruning, bitmap_retention_intersect,
# dynamic_partition_overwrite, embedding_mmr_select,
# incremental_join_delta, k_anonymity_audit, pyds_sink_write_audit_publish,
# pyds_sink_change_feed, acf_hourly_means, spearman_qty_price,
# ks_two_sample_test, mutual_info_type_bucket, pyds_sink_delete_where,
# pyds_sink_vacuum, unpivot_day_type_counts, pyds_manifest_stream_tail,
# wilson_ci_return_rate, xcorr_click_purchase, key_skew_audit,
# pyds_medallion_bronze_silver, pyds_sink_schema_evolution,
# hybrid_search_rrf, pyds_bloom_point_lookup, theilsen_trend_per_type,
# trimmed_winsorized_means, listagg_group_by_all, fellegi_sunter_linkage,
# sample_allocation_hamilton, pythagorean_means_per_type,
# from_csv_permissive_surface, ranking_semantics_surface,
# boilerplate_ngram_census, pad_waste_bucketing,
# attribution_position_weighted, layout_hilbert_stats,
# conformal_forecast_interval, probe_calibration_ece,
# pii_luhn_validation, backtest_rolling_origin, kendall_tau_daily,
# retrieval_ndcg_at_k, psi_value_drift, ab_cuped_adjustment,
# stream_semi_interval_join, text_readability_scores,
# feature_hashing_collisions, kfold_regression_stability,
# nelson_aalen_hazard, revenue_bridge_decomposition,
# iso_weekday_semantics, pyds_incremental_agg_from_cdf,
# pyds_optimize_zorder_pruning, quantile_normalize_feature,
# rag_context_packing, ab_power_mde, source_ablation_probe,
# cluster_bootstrap_ci, tokenizer_fertility_by_lang,
# robust_stl_decomposition, decontamination_semantic,
# ab_sequential_monitoring, pyds_sink_merge_upsert,
# pyds_rename_evolution, pyds_sink_mor_delete,
# frame_semantics_surface, benford_digit_census, cramers_v_association,
# cohens_kappa_agreement, roc_auc_doclen_lang, theil_index_decomposition,
# target_encode_loo, stratified_split_assignment, grouped_mode_exact,
# brier_score_decomposition, pyds_sink_restore, pyds_branch_tag_travel,
# pyds_sink_check_constraint, croston_intermittent_demand,
# abc_classification, kcore_decomposition, heaps_law_vocab_growth,
# fdr_bh_correction, nulls_ordering_surface, l_diversity_audit,
# heavy_hitters_exact_2pass, mixture_temperature_weights,
# contrastive_negative_sampling, filter_yield_sweep, dedup_canonical_url,
# pyds_shallow_clone_diverge, effect_size_cohens_d, levene_variance_test,
# itemitem_collaborative_topk, intdiv_mod_semantics_surface,
# cidr_containment_census, schema_contract_audit, bigram_perplexity_score,
# capture_recapture_estimate, decision_stump_exact_split,
# naive_bayes_lang_classifier, pmi_collocations,
# average_precision_doclen_lang, fano_factor_burstiness,
# markov_entropy_rate, median_ci_order_statistic,
# association_rules_single_item, hhi_market_concentration).
# That fills the 50-slot window exactly (1 + 49 once the count of
# never-hashed registrations reaches 49); any round-6 registrations
# beyond 49 spill to the FRONT of round 8's window, followed by the
# 46 outstanding round-2-era rows, oldest cohort first (age 5
# by round 7), in this order:
#   iqr_anomaly, regression_per_group, geo_status_map, scan_recent_topn,
#   group_type_stats, corr_matrix, histogram_value, events_per_day,
#   severity_rollup, alerts_threshold, status_colors, clean_labels,
#   distinct_types_sorted, ingestion_rate_window, ma_diff_trend,
#   rolling_avg_20, topn_per_group, last_value_per_group,
#   elapsed_seconds_feature, regression_quality_gate, json_props_stats,
#   stream_tumbling_window, session_window_agg, sliding_window_agg,
#   sessionize_events, pivot_type_by_day, rollup_type_user,
#   resample_gap_fill, filter_equality, curation_pipeline,
#   tfidf_top_terms, approx_distinct_users, dedup_components,
#   dedup_minhash_lsh, dedup_minhash_portable, dedup_ngram_jaccard,
#   dedup_simhash, dedup_simhash_portable, embedding_cosine_neardups,
#   embedding_cosine_topk, embedding_ivf_kmeans_topk,
#   embedding_ivf_topk, embedding_kmeans_clusters, embedding_lsh_topk,
#   embedding_norm_stats, multimodal_decode.
# Whatever round-2 rows overflow round 7's window lead round 8's,
# followed by the round-3 cohort (49 queries, age 5 by round 8).
#
# Every query in the catalog — windowed or not — is exercised each
# round by the full-catalog local oracle-parity and
# partition-invariance suites (tests/test_oracle_parity.py), so "out of
# window" only ever means "no fresh driver-side hash this round", never
# "untested".
DRIVER_WINDOW: tuple[str, ...] = (
    # pinned sentinel (driver-green r1..r6)
    "flagship_window_agg",
    # never-hashed backlog (39): image codec + full lakehouse-verb
    # family first (round-6 verdict items 6/7), then streaming joins
    # and the corpus-census family
    "image_png_pipeline",
    "pyds_stream_sink_roundtrip",
    "pyds_sink_compaction",
    "pyds_sink_stats_pruning",
    "pyds_sink_write_audit_publish",
    "pyds_sink_change_feed",
    "pyds_sink_delete_where",
    "pyds_sink_vacuum",
    "pyds_manifest_stream_tail",
    "pyds_medallion_bronze_silver",
    "pyds_sink_schema_evolution",
    "pyds_bloom_point_lookup",
    "pyds_incremental_agg_from_cdf",
    "pyds_optimize_zorder_pruning",
    "pyds_sink_merge_upsert",
    "pyds_rename_evolution",
    "pyds_sink_mor_delete",
    "pyds_sink_restore",
    "pyds_branch_tag_travel",
    "pyds_sink_check_constraint",
    "pyds_shallow_clone_diverge",
    "stream_topn_per_window_upsert",
    "stream_full_outer_interval_join",
    "stream_join_then_window",
    "stream_session_timeout_close",
    "stream_semi_interval_join",
    "dedup_components_incremental_smalldelta",
    "sample_allocation_hamilton",
    "boilerplate_ngram_census",
    "pad_waste_bucketing",
    "text_readability_scores",
    "heaps_law_vocab_growth",
    "filter_yield_sweep",
    "bigram_perplexity_score",
    "capture_recapture_estimate",
    "pmi_collocations",
    # round-7 registrations (3 of this round's ≤10 cap), hashed
    # immediately so they never join the backlog: each is a catalog-
    # level pin of a round-7 ADVICE/verdict fix
    "pyds_mor_then_cow_delete",
    "pyds_pruned_read_logical",
    "image_resize_generic_real",
    # oldest-cohort refresh (10): round-2 reference-core rows, age 4
    "iqr_anomaly",
    "regression_per_group",
    "geo_status_map",
    "rolling_avg_20",
    "corr_matrix",
    "stream_tumbling_window",
    "session_window_agg",
    "sliding_window_agg",
    "scan_recent_topn",
    "group_type_stats",
)


def ordered_registry() -> dict[str, Query]:
    """REGISTRY with the driver window first (positions 0-49), then every
    remaining query in registration order."""
    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    assert not missing, f"DRIVER_WINDOW names not registered: {missing}"
    assert len(set(DRIVER_WINDOW)) == len(DRIVER_WINDOW), "duplicate names in DRIVER_WINDOW"
    assert len(DRIVER_WINDOW) == 50, f"driver window must be exactly 50, got {len(DRIVER_WINDOW)}"
    out = {n: REGISTRY[n] for n in DRIVER_WINDOW}
    out.update({n: q for n, q in REGISTRY.items() if n not in out})
    return out


__all__ = ["REGISTRY", "Query", "register", "DRIVER_WINDOW", "ordered_registry"]

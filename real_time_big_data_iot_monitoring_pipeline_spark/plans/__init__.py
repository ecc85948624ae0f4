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
from real_time_big_data_iot_monitoring_pipeline_spark.plans.registry import REGISTRY, Query, register

# The driver's correctness gate hashes the FIRST 50 registry entries, in
# `queries()` iteration order.  The window below makes that ordering
# EXPLICIT instead of an import-order side effect.
#
# ROUND-6 ROTATION (drafted 2026-08-14, round 5).  CORRECTNESS_r04.json
# came back 50/50 green, so driver-hash history now stands at
# r1∪r2∪r3∪r4 = 148 distinct queries.  Exactly 50 oracle-bearing
# queries have never had a driver row — the round-4 registrations
# listed in the previous revision of this comment.  This window:
#   * `flagship_window_agg` stays pinned as the every-round sentinel
#     (driver-green r1 + r2 + r3 + r4);
#   * the 49 remaining slots take ALL never-hashed oracle-bearing
#     queries except `domain_cap_sample` (deferred by choice — its
#     det_hash rank kernel is `corpus_sample_stratified`, green r3),
#     which is FIRST IN LINE for round 6.
# After this window lands green, every oracle-bearing catalog query
# registered BEFORE round 5 has had at least one driver-side hash.
# Round-5 registrations awaiting their first driver row (next in line
# after domain_cap_sample; all locally oracle-green via
# tools/driver_sim.py explicit-name runs at sf0.01):
#   nation_product_profit, brand_value_concentration,
#   dominant_part_suppliers, bm25_search_topk, weighted_median_price,
#   chi2_type_value, stream_scd2_apply, scd2_asof_lookup,
#   grouped_weighted_median, pareto_frontier_customers,
#   order_total_reconciliation, stream_hysteresis_alerts,
#   part_supplier_variety, twap_per_user, ohlc_hourly_bars,
#   region_nation_revenue_share, audio_wav_features,
#   pyds_sensor_fleet_summary, pyds_pushdown_single_sensor,
#   pyds_stream_counts, pyds_sink_roundtrip,
#   exact_quantiles_distributed, stream_outer_interval_join,
#   props_variant_stats, pyds_sink_time_travel,
#   hierarchy_subtree_rollup, corpus_kl_drift, poisson_bootstrap_ci,
#   ab_conversion_ztest, kaplan_meier_repurchase, copurchase_triangles,
#   bitemporal_asof_belief, yoy_revenue_growth,
#   entity_match_sorted_neighborhood, stream_topn_per_window,
#   ingestion_completeness_audit, group_exemplars,
#   functional_dependency_audit, stream_dedup_then_window,
#   set_ops_multiplicity, customer_spend_gini, dedup_ngram_containment,
#   source_language_entropy, embedding_distance_histogram,
#   funnel_latency_profile.
#
# STALENESS-REFRESH POLICY (dated 2026-08-14, per the round-4 verdict;
# starts round 6, once the never-hashed backlog above clears):
#   * each round's window = the pinned sentinel + any never-hashed
#     oracle-bearing registrations + spare slots filled with the
#     queries whose last driver hash is OLDEST, oldest first;
#   * target invariant: no query's most recent driver row is ever more
#     than 3 rounds old.
# Round-6 draft under that policy: flagship (pinned) + domain_cap_sample
# (never hashed) + 48 slots re-hashing the round-2 window — the oldest
# driver signal in the catalog (filter_time_range, global_kpis,
# describe_stats, iqr_anomaly, regression_per_group, geo_status_map,
# scan_recent_topn, group_type_stats, corr_matrix, histogram_value,
# events_per_day, severity_rollup, alerts_threshold, status_colors,
# clean_labels, distinct_types_sorted, ingestion_rate_window,
# ma_diff_trend, rolling_avg_20, topn_per_group, last_value_per_group,
# elapsed_seconds_feature, regression_quality_gate, json_props_stats,
# stream_tumbling_window, session_window_agg, ... then round-3 rows by
# age until the 50 slots fill).
#
# Every query in the catalog — windowed or not — is exercised each
# round by the full-catalog local oracle-parity and
# partition-invariance suites (tests/test_oracle_parity.py), so "out of
# window" only ever means "no fresh driver-side hash this round", never
# "untested".
DRIVER_WINDOW: tuple[str, ...] = (
    # pinned sentinel (driver-green r1 + r2 + r3 + r4)
    "flagship_window_agg",
    # first driver rows: never hashed by any driver run (49)
    "entity_match_candidates",
    "snapshot_cdc_diff",
    "bloom_prune_semijoin",
    "embedding_linear_probe",
    "embedding_pq_topk",
    "stream_dedup_bounded",
    "text_gopher_census",
    "seasonal_anomaly_census",
    "distinct_users_lpc_sketch",
    "open_orders_backlog",
    "ship_delay_profile",
    "feature_standardize",
    "supplier_nation_share",
    "events_debounce",
    "dedup_exact_substring",
    "bpe_pair_counts",
    "vocab_oov_rate",
    "asof_join_nearest",
    "stream_late_data_audit",
    "pagerank_trade_graph",
    "stream_update_upsert",
    "multimodal_phash_neardups",
    "dedup_cut_spans",
    "holt_forecast_per_user",
    "interval_overlap_join",
    "brand_basket_affinity",
    "embedding_label_centroids",
    "tfidf_similar_pairs",
    "customer_rfm_segments",
    "benford_digit_audit",
    "event_sequence_pattern",
    "jsonl_ingest_audit",
    "multi_grain_rollup",
    "embedding_ivf_append_search",
    "corpus_weighted_sample",
    "lang_id_confusion_matrix",
    "embedding_ann_recall",
    "stream_dim_refresh_join",
    "dedup_components_incremental",
    "dedup_survivorship",
    "bpe_train_merges",
    "bpe_apply_tokenize",
    "stream_available_now_catchup",
    "null_aware_not_in",
    "stream_stateful_extremes",
    "event_markov_transitions",
    "text_zipf_fit",
    "embedding_covariance_matrix",
    "anova_value_by_type",
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

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
from real_time_big_data_iot_monitoring_pipeline_spark.plans.registry import REGISTRY, Query, register

# The driver's correctness gate hashes the FIRST 50 registry entries, in
# `queries()` iteration order.  The window below makes that ordering
# EXPLICIT instead of an import-order side effect.
#
# ROUND-5 ROTATION.  Round 4's verify/judge step never ran (no
# CORRECTNESS_r04.json exists), so every query slated for its first
# driver row in the round-4 window is STILL unchecked, and so are the
# 32 queries registered during round 4.  Driver-hash history therefore
# stands at: r1∪r2∪r3 cover 95 of the catalog's oracle-bearing
# queries; exactly 46 oracle-bearing queries have NEVER had a driver
# row.  This window is computed directly from that union:
#   * `flagship_window_agg` stays pinned as the every-round sentinel
#     (driver-green r1 + r2 + r3);
#   * all 46 never-hashed oracle-bearing queries take the next slots —
#     the r3-registration stragglers (stream_static_join ...
#     multimodal_resize), round-4's dead-letter/stream/text/embedding
#     additions, the late-round-4 OLAP/analytics/storage/ML-prep
#     widening, and the window-frame + SCD2 + sketch set;
#   * the remaining 3 slots go to round-5 registrations (first driver
#     rows): funnel_conversion, cohort_retention, fk_orphan_audit.
# Round-5 registrations beyond those 3 slots are FIRST IN LINE for the
# round-6 window (this list must be kept current as queries are added):
#   domain_cap_sample (deferred by choice: det_hash rank kernel ==
#     corpus_sample_stratified, green r3),
#   entity_match_candidates, snapshot_cdc_diff, bloom_prune_semijoin,
#   embedding_linear_probe, embedding_pq_topk, stream_dedup_bounded,
#   text_gopher_census, seasonal_anomaly_census, distinct_users_lpc_sketch,
#   open_orders_backlog, ship_delay_profile, feature_standardize,
#   supplier_nation_share, events_debounce,
#   dedup_exact_substring, bpe_pair_counts, vocab_oov_rate,
#   asof_join_nearest, stream_late_data_audit, pagerank_trade_graph,
#   stream_update_upsert, multimodal_phash_neardups, dedup_cut_spans,
#   holt_forecast_per_user, interval_overlap_join,
#   brand_basket_affinity, embedding_label_centroids, tfidf_similar_pairs,
#   customer_rfm_segments, benford_digit_audit, event_sequence_pattern,
#   jsonl_ingest_audit, multi_grain_rollup, embedding_ivf_append_search,
#   corpus_weighted_sample, lang_id_confusion_matrix, embedding_ann_recall,
#   stream_dim_refresh_join, dedup_components_incremental, dedup_survivorship,
#   bpe_train_merges, bpe_apply_tokenize, stream_available_now_catchup,
#   null_aware_not_in, stream_stateful_extremes, event_markov_transitions,
#   text_zipf_fit, embedding_covariance_matrix, anova_value_by_type
#   (rows-only, not window-eligible: distinct_users_hll_daily)
#     (rows-only, not window-eligible: quantile_approx_error_audit)
#     (registered after the 3 slots filled; all locally oracle-green
#     via tools/driver_sim.py explicit-name runs at sf0.01).
# Every query in the catalog — windowed or not — is exercised each
# round by the full-catalog local oracle-parity and
# partition-invariance suites (tests/test_oracle_parity.py), so "out of
# window" only ever means "no fresh driver-side hash this round", never
# "untested".
DRIVER_WINDOW: tuple[str, ...] = (
    # pinned sentinel (driver-green r1 + r2 + r3)
    "flagship_window_agg",
    # first driver rows: never hashed by any driver run (46)
    "stream_static_join",
    "stream_session_window",
    "stream_dedup_exact",
    "corpus_pack_sequences",
    "corpus_sample_mixture",
    "text_redact_terms",
    "text_truncate_tokens",
    "dedup_minhash_incremental",
    "embedding_lsh_topk_checked",
    "embedding_ivf_persisted_topk",
    "embedding_ivf_persisted_multiprobe",
    "multimodal_frame_sample",
    "multimodal_resize",
    "stream_dead_letter_rate",
    "stream_sliding_window",
    "text_pii_scrub",
    "embedding_quantize_int8",
    "corpus_chunk_overlap",
    "bigram_logprob_score",
    "asof_join_forward_tolerance",
    "late_supplier_blame",
    "embedding_neardups_lsh_checked",
    "order_priority_exists",
    "market_share_by_year",
    "customer_order_distribution",
    "promo_revenue_share",
    "top_supplier_revenue",
    "small_qty_order_revenue",
    "disjunctive_part_revenue",
    "idle_rich_customers",
    "running_revenue_share",
    "customer_order_gap_stats",
    "acctbal_decile_profile",
    "order_month_streaks",
    "null_rate_audit",
    "trailing_week_revenue",
    "acctbal_relative_standing",
    "ewma_batch_per_user",
    "mad_anomaly",
    "bucketed_join_revenue",
    "bucketed_key_lookup",
    "vocab_build_topk",
    "embedding_random_projection",
    "incremental_agg_merge",
    "scd2_customer_history",
    "cms_heavy_hitters",
    # first driver rows: registered round 5
    "funnel_conversion",
    "cohort_retention",
    "fk_orphan_audit",
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

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
# ROUND-11 ROTATION (drafted 2026-08-16, round 11).  CORRECTNESS_r10.json
# came back 50/50 green (zero err) — the round-10 window ran exactly as
# pre-committed, and the never-hashed backlog DRAINED TO ZERO (all 394
# oracle-bearing registrations ever-hashed).  Arithmetic is DERIVED
# (`tools/backlog_audit.py::compute_backlog()`; tests/test_plans.py::
# test_backlog_arithmetic_derived asserts this file's constants against
# it every suite run):
#   registry 402 | oracle-bearing 396 | ever-hashed through r10 = 394 |
#   never-hashed at rotation = 2 (exactly the round-10
#   ROUND11_REGISTRATION_PLAN, registered THIS round per the lapsed
#   freeze and hashed in-window immediately).
#
# This window (1 + 2 + 47 = 50), EXACTLY as the round-10 verdict's
# "Next round" item 1 pre-committed it:
#   * `flagship_window_agg` pinned (driver-green r1..r10);
#   * 2 registration slots: `stream_manifest_sink_restart` and
#     `stream_schema_evolution_feed` (below), registered this round —
#     they tie ref:spark_streaming.py:152-181 to the crash-hardened
#     chunked-manifest sink, and per the registration policy they take
#     window slots AHEAD of the refresh queue and hash on their first
#     window;
#   * 47 churn-aware refresh slots: the first 47 of
#     ROUND11_OLDEST_COHORT in pinned order — led by the 26 pyds_*
#     rows whose engine (`sources/pydatasource.py`) was rewritten
#     ~1,150 lines across rounds 9-10 while their last hard hashes
#     sat at d6-d8.  The full cohort universe was pre-validated ALL
#     GREEN through driver-sim at sf0.01 on the round-10 close tree,
#     so any red row this round indicates a code change since, not
#     the query.
#
# STALENESS POLICY (unchanged from round 10): windows are flagship +
# registrations + refresh slots drawn from the CHURN-AWARE priority
# queue (tools/backlog_audit.py::refresh_queue): rows whose
# implementing code changed since their last green hash come first —
# ordered by churn RECENCY, then hash age, then name — followed by
# non-churned rows strictly oldest-first.  After this round 55 churned
# rows await refresh: the 37 round-10-churned rows the 47-slot window
# could not fit, PLUS the 14 queries the round-11 scale audit hardened
# (decimal moments; each verified oracle-MATCH at sf0.01 AND sf0.1 on
# this tree) and a handful of helper-churned neighbors.  55 > the 47
# refresh slots a 2-registration round-12 window carries — the honest
# cost of fixing real scale bugs mid-cycle: round 12 either trades its
# registration slots for refresh or accepts a ~6-row spill to round 13
# (the spilled rows would be freshly-verified scale-audit rows, the
# lowest-risk class in the queue).
#
# Registered THIS round (the round-10 verdict's item 1; the round-10
# freeze lapsed when its window landed green) — both have DuckDB
# oracles and sit at window positions 1-2:
#   1. `stream_manifest_sink_restart` — the REAL windowed_aggregate_
#      stream written through ManifestStreamWriter with a mid-stream
#      restart; asserts exactly-once across the restart boundary.
#   2. `stream_schema_evolution_feed` — rename_column mid-stream;
#      the change feed and the tail stay correct across the epoch.
ROUND11_REGISTRATION_PLAN: tuple[str, ...] = (
    "stream_manifest_sink_restart",
    "stream_schema_evolution_feed",
)

# REGISTRATION PLAN for round 12 (≤10 new registrations per round,
# each hashed in-window immediately; pinned as data now so the suite
# can assert the names do NOT pre-register).  Both extend the round-11
# fault-injection frontier into oracle-checked queries:
#   1. `pyds_clone_vacuum_isolation` — cross-table reachability:
#      vacuum on a shallow clone's SOURCE (and vice versa) must never
#      reclaim data files the other table still references.
#   2. `stream_offset_cursor_audit` — the manifest-table stream tail
#      under an induced cursor replay: output must stay exactly-once.
ROUND12_REGISTRATION_PLAN: tuple[str, ...] = (
    "pyds_clone_vacuum_isolation",
    "stream_offset_cursor_audit",
)

# Never-hashed backlog AFTER this window: EMPTY — both round-11
# registrations hash in-window.  Kept as data so the suite's coverage
# invariant (every never-hashed query ∈ DRIVER_WINDOW ∪ ROUND12_DRAFT)
# stays mechanical.
ROUND12_DRAFT: tuple[str, ...] = ()

# The round-10-close pinned refresh schedule, exactly as the round-10
# verdict committed it: the first 47 entries ARE this round's refresh
# slots (DRIVER_WINDOW positions 3-49, in this order); the remainder
# flowed into ROUND12_OLDEST_COHORT below.  Leads with the 26 pyds_*
# rows (engine rewritten r9-r10, hashes d6-d8), then the
# round-9-churned multimodal/embedding rows, then
# churned-by-older-edits rows oldest-first, then the non-churned
# r2/r3 cohort remainder strictly oldest-first.
ROUND11_OLDEST_COHORT: tuple[str, ...] = (
    "pyds_sink_roundtrip",
    "pyds_sink_time_travel",
    "pyds_stream_counts",
    "pyds_bloom_point_lookup",
    "pyds_branch_tag_travel",
    "pyds_incremental_agg_from_cdf",
    "pyds_manifest_stream_tail",
    "pyds_medallion_bronze_silver",
    "pyds_mor_then_cow_delete",
    "pyds_optimize_zorder_pruning",
    "pyds_pruned_read_logical",
    "pyds_rename_evolution",
    "pyds_shallow_clone_diverge",
    "pyds_sink_change_feed",
    "pyds_sink_check_constraint",
    "pyds_sink_compaction",
    "pyds_sink_delete_where",
    "pyds_sink_merge_upsert",
    "pyds_sink_mor_delete",
    "pyds_sink_restore",
    "pyds_sink_schema_evolution",
    "pyds_sink_stats_pruning",
    "pyds_sink_vacuum",
    "pyds_sink_write_audit_publish",
    "pyds_stream_sink_roundtrip",
    "pyds_null_range_delete",
    "embedding_kmeans_clusters",
    "multimodal_decode",
    "multimodal_frame_sample",
    "multimodal_resize",
    "image_png_pipeline",
    "embedding_cosine_neardups",
    "embedding_cosine_topk",
    "embedding_ivf_kmeans_topk",
    "embedding_ivf_topk",
    "stream_interval_join",
    "acctbal_decile_profile",
    "stream_dead_letter_rate",
    "stream_dedup_exact",
    "stream_session_window",
    "stream_sliding_window",
    "stream_static_join",
    "dedup_components_incremental",
    "stream_available_now_catchup",
    "stream_dedup_bounded",
    "stream_dim_refresh_join",
    "stream_late_data_audit",
    "stream_stateful_extremes",
    "stream_update_upsert",
    "curation_pipeline",
    "dedup_components",
    "dedup_minhash_portable",
    "dedup_ngram_jaccard",
    "dedup_simhash_portable",
    "elapsed_seconds_feature",
    "regression_quality_gate",
    "tfidf_top_terms",
    "rolling_median_smooth",
    "text_fingerprint",
    "text_lang_id",
    "text_normalize",
    "text_quality_score",
    "text_repetition_ratio",
    "text_token_stats",
    "unigram_logprob_score",
    "bigram_logprob_score",
    "cms_heavy_hitters",
    "corpus_chunk_overlap",
    "corpus_pack_sequences",
    "dedup_minhash_incremental",
    "embedding_neardups_lsh_checked",
    "text_pii_scrub",
    "text_redact_terms",
    "text_truncate_tokens",
    "vocab_build_topk",
    "embedding_norm_stats",
    "resample_gap_fill",
    "sessionize_events",
    "embedding_ivf_multiprobe_topk",
    "resample_interpolate",
    "salted_join_brand_revenue",
    "salted_type_stats",
    "json_props_stats",
    "rollup_type_user",
    "filter_equality",
    "last_value_per_group",
    "pivot_type_by_day",
    "filter_compound_bool",
    "grouped_percentiles",
    "histogram_equidepth",
    "join_dim_broadcast",
    "join_star_revenue",
    "outer_join_order_counts",
    "pricing_summary",
    "props_struct_extract",
    "range_join_price_bands",
    "rank_events_per_user",
    "returned_items_report",
)

# Round-12+ refresh schedule: the first 98 entries (two rounds' worth)
# of the churn-aware priority queue, derived by tools/backlog_audit.py::
# refresh_queue(exclude=DRIVER_WINDOW) on the round-11 rotation tree and
# pinned here as DATA so the next rotation is mechanical.  MEMBERSHIP of
# this prefix is suite-asserted against the live derivation (order
# within it can shift as round-11 commits touch engine files — the
# close stamp re-derives and re-pins exact order).  Leads with the 14
# queries churned IN round 11 (the scale audit's decimal hardening —
# freshest unvalidated change first; all 14 verified oracle-MATCH at
# sf0.01 AND sf0.1 when hardened), then the 37 still-churned rows the
# 47-slot round-11 window could not fit (round-10 verdict item 2:
# round 12 must drain them — backlog audit then shows churned-unhashed
# = 0), followed by the non-churned remainder strictly oldest-first
# (the r2-cohort remainder among them).
ROUND12_OLDEST_COHORT: tuple[str, ...] = (
    "anova_value_by_type",
    "text_zipf_fit",
    "tfidf_similar_pairs",
    "corpus_kl_drift",
    "customer_spend_gini",
    "heaps_law_vocab_growth",
    "ab_cuped_adjustment",
    "ab_power_mde",
    "fdr_bh_correction",
    "kendall_tau_daily",
    "kfold_regression_stability",
    "mann_whitney_utest",
    "spearman_qty_price",
    "average_precision_doclen_lang",
    "effect_size_cohens_d",
    "fano_factor_burstiness",
    "levene_variance_test",
    "roc_auc_doclen_lang",
    "stream_stateful_extremes",
    "stream_update_upsert",
    "curation_pipeline",
    "dedup_components",
    "dedup_minhash_portable",
    "dedup_ngram_jaccard",
    "dedup_simhash_portable",
    "elapsed_seconds_feature",
    "regression_quality_gate",
    "tfidf_top_terms",
    "rolling_median_smooth",
    "text_fingerprint",
    "text_lang_id",
    "text_normalize",
    "text_quality_score",
    "text_repetition_ratio",
    "text_token_stats",
    "unigram_logprob_score",
    "bigram_logprob_score",
    "cms_heavy_hitters",
    "corpus_chunk_overlap",
    "corpus_pack_sequences",
    "dedup_minhash_incremental",
    "embedding_neardups_lsh_checked",
    "text_pii_scrub",
    "text_redact_terms",
    "text_truncate_tokens",
    "vocab_build_topk",
    "embedding_norm_stats",
    "resample_gap_fill",
    "sessionize_events",
    "embedding_ivf_multiprobe_topk",
    "resample_interpolate",
    "salted_join_brand_revenue",
    "salted_type_stats",
    "json_props_stats",
    "rollup_type_user",
    "filter_equality",
    "last_value_per_group",
    "pivot_type_by_day",
    "filter_compound_bool",
    "grouped_percentiles",
    "histogram_equidepth",
    "join_dim_broadcast",
    "join_star_revenue",
    "outer_join_order_counts",
    "pricing_summary",
    "props_struct_extract",
    "range_join_price_bands",
    "rank_events_per_user",
    "returned_items_report",
    "revenue_filter_agg",
    "semi_join_customers",
    "set_ops_users",
    "term_frequency",
    "top_customers_by_revenue",
    "unshipped_orders_topk",
    "volume_shipping",
    "acctbal_relative_standing",
    "asof_join_forward_tolerance",
    "bucketed_join_revenue",
    "bucketed_key_lookup",
    "cohort_retention",
    "corpus_sample_mixture",
    "customer_order_distribution",
    "customer_order_gap_stats",
    "disjunctive_part_revenue",
    "embedding_ivf_persisted_multiprobe",
    "embedding_ivf_persisted_topk",
    "embedding_lsh_topk_checked",
    "embedding_quantize_int8",
    "embedding_random_projection",
    "ewma_batch_per_user",
    "fk_orphan_audit",
    "funnel_conversion",
    "idle_rich_customers",
    "incremental_agg_merge",
    "late_supplier_blame",
    "mad_anomaly",
    "market_share_by_year",
)

# Derived-arithmetic pins (asserted == tools/backlog_audit.compute_backlog()
# by tests/test_plans.py::test_backlog_arithmetic_derived; update BOTH
# when rotating — the test fails loudly on any hand-count drift):
NEVER_HASHED_AT_R11_ROTATION = 2  # exactly the two round-11 registrations
EVER_HASHED_THROUGH_R10 = 394  # the full round-10 oracle-bearing catalog

DRIVER_WINDOW: tuple[str, ...] = (
    # pinned sentinel (driver-green r1..r10)
    ("flagship_window_agg",)
    # round-11 registrations (2): hash on their first window, ahead of
    # the refresh queue per the registration policy
    + ROUND11_REGISTRATION_PLAN
    # churn-aware refresh (47): the first 47 of the pinned cohort, in
    # order — all 26 pyds_* rows lead
    + ROUND11_OLDEST_COHORT[:47]
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


__all__ = [
    "REGISTRY",
    "Query",
    "register",
    "DRIVER_WINDOW",
    "ROUND11_REGISTRATION_PLAN",
    "ROUND12_REGISTRATION_PLAN",
    "ROUND12_DRAFT",
    "ROUND11_OLDEST_COHORT",
    "ordered_registry",
]

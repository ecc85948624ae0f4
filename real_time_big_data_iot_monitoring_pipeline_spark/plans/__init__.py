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
# non-churned rows strictly oldest-first.  The round-11 scale audit's
# second wave (shared helpers + the TPC-H revenue expression) widened
# churn to most of the catalog — see the ROUND-11 AMENDMENT note above
# ROUND12_OLDEST_COHORT: refresh proceeds effectively oldest-first,
# every hardened value is bit-identical pre-cliff, and each
# directly-edited query was verified oracle-MATCH at sf0.01 AND sf0.1
# this round, so the wide churn carries no un-validated risk class.
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
# close stamp re-derives and re-pins exact order).  ROUND-11 AMENDMENT:
# the scale audit's second wave edited SHARED integer-moment helpers
# (functions/scalars, operators/aggregates, the TPC-H revenue
# expression), which churns a large fraction of the catalog at once
# even under the new BINDING-level attribution (tools/backlog_audit.py:
# an imported helper FUNCTION whose own def + same-file references are
# unchanged no longer churns its users — that alone cut the wave from
# 313 to 209 rows).  With churn that wide, the churned block orders by
# hash age, so this prefix is effectively the OLDEST-HASHED 98 (the
# d2/d3 cohorts first) — the correct priority anyway: every hardened
# value is bit-identical pre-cliff, and each directly-edited query was
# verified oracle-MATCH at sf0.01 AND sf0.1 on this tree.  The
# churned-drain-to-zero target becomes multi-round by construction;
# the signal re-sharpens as hashes land.
ROUND12_OLDEST_COHORT: tuple[str, ...] = (
    "curation_pipeline",
    "dedup_components",
    "dedup_minhash_portable",
    "dedup_ngram_jaccard",
    "dedup_simhash_portable",
    "elapsed_seconds_feature",
    "embedding_norm_stats",
    "json_props_stats",
    "regression_quality_gate",
    "resample_gap_fill",
    "rollup_type_user",
    "sessionize_events",
    "tfidf_top_terms",
    "embedding_ivf_multiprobe_topk",
    "grouped_percentiles",
    "histogram_equidepth",
    "join_dim_broadcast",
    "join_star_revenue",
    "outer_join_order_counts",
    "pricing_summary",
    "range_join_price_bands",
    "resample_interpolate",
    "returned_items_report",
    "revenue_filter_agg",
    "rolling_median_smooth",
    "salted_join_brand_revenue",
    "salted_type_stats",
    "text_fingerprint",
    "text_lang_id",
    "text_normalize",
    "text_quality_score",
    "text_repetition_ratio",
    "text_token_stats",
    "top_customers_by_revenue",
    "unigram_logprob_score",
    "unshipped_orders_topk",
    "volume_shipping",
    "acctbal_relative_standing",
    "bigram_logprob_score",
    "bucketed_join_revenue",
    "bucketed_key_lookup",
    "cms_heavy_hitters",
    "cohort_retention",
    "corpus_chunk_overlap",
    "corpus_pack_sequences",
    "corpus_sample_mixture",
    "customer_order_gap_stats",
    "dedup_minhash_incremental",
    "disjunctive_part_revenue",
    "embedding_ivf_persisted_multiprobe",
    "embedding_ivf_persisted_topk",
    "embedding_lsh_topk_checked",
    "embedding_neardups_lsh_checked",
    "embedding_quantize_int8",
    "embedding_random_projection",
    "ewma_batch_per_user",
    "funnel_conversion",
    "idle_rich_customers",
    "incremental_agg_merge",
    "mad_anomaly",
    "market_share_by_year",
    "null_rate_audit",
    "order_month_streaks",
    "order_priority_exists",
    "promo_revenue_share",
    "running_revenue_share",
    "scd2_customer_history",
    "small_qty_order_revenue",
    "text_pii_scrub",
    "text_redact_terms",
    "text_truncate_tokens",
    "top_supplier_revenue",
    "trailing_week_revenue",
    "vocab_build_topk",
    "anova_value_by_type",
    "benford_digit_audit",
    "bloom_prune_semijoin",
    "bpe_apply_tokenize",
    "bpe_pair_counts",
    "bpe_train_merges",
    "brand_basket_affinity",
    "corpus_weighted_sample",
    "customer_rfm_segments",
    "dedup_cut_spans",
    "dedup_exact_substring",
    "dedup_survivorship",
    "embedding_ann_recall",
    "embedding_covariance_matrix",
    "embedding_ivf_append_search",
    "embedding_label_centroids",
    "embedding_linear_probe",
    "embedding_pq_topk",
    "event_markov_transitions",
    "events_debounce",
    "feature_standardize",
    "holt_forecast_per_user",
    "jsonl_ingest_audit",
    "lang_id_confusion_matrix",
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

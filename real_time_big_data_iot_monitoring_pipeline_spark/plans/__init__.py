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
# ROUND-10 ROTATION (drafted 2026-08-16, round 10).  CORRECTNESS_r09.json
# came back 50/50 green (zero err) — the round-9 window ran exactly as
# drafted.  Arithmetic is DERIVED (`tools/backlog_audit.py::
# compute_backlog()` from CORRECTNESS_r*.json ∪ the registry;
# tests/test_plans.py::test_backlog_arithmetic_derived asserts this
# file's constants against it every suite run):
#   registry 400 | oracle-bearing 394 | ever-hashed r1..r9 = 356 |
#   never-hashed at rotation = 38 (exactly the round-9 ROUND10_DRAFT,
#   in order).
#
# This window (1 + 38 + 11 = 50), EXACTLY as pre-committed in round 9
# (the round-9 verdict's "Next round" item 1):
#   * `flagship_window_agg` pinned (driver-green r1..r9);
#   * 38 never-hashed slots: ALL of the round-9 ROUND10_DRAFT, in
#     draft order — the backlog EMPTIES this round, one round ahead
#     of the round-8 verdict's projected crossover;
#   * 11 oldest-cohort slots: the first 11 of the round-9
#     ROUND10_OLDEST_COHORT — the 3 r3-cohort rows round 9 deferred
#     (`corpus_shard_stats`, `corpus_split_counts`,
#     `corpus_token_budget`) first, then the next 8 of the r3 cohort.
#   The full r10 universe was re-validated ALL GREEN against the
#   DuckDB oracle at sf0.01 on the final round-9 tree, so any red row
#   this round indicates a code change since, not the query.
#
# STALENESS POLICY (amended round 10 — the round-9 verdict's item 2):
# with the never-hashed backlog empty after this round, windows become
# flagship + 49 refresh slots drawn from a CHURN-AWARE priority queue
# (tools/backlog_audit.py::refresh_queue): rows whose implementing
# code changed since their last green hash come first — ordered by
# churn RECENCY (the round the unvalidated change landed in, newest
# first: that is the code no driver hash has ever attested), then hash
# age, then name — followed by non-churned rows strictly oldest-first.
# Churn attribution is function-granular at the plans layer and
# module-granular below it (see the tool's docstring).  First
# beneficiaries, per the round-9 verdict: the 26 pyds_* rows whose
# engine (`sources/pydatasource.py`) was rewritten ~1,000 lines in
# round 9 while their last hard hashes sat at d6–d8 — they lead
# ROUND11_OLDEST_COHORT below.
#
# REGISTRATION PLAN (the round-9 verdict's item 5, decided now as
# data): option (a) — the freeze LAPSES once this window lands green.
# From round 11 on, ≤10 new registrations per round, each hashed
# in-window immediately (they take window slots ahead of the refresh
# queue, exactly like rounds 5–7 did).  The first two, chosen for
# user value (they tie ref:spark_streaming.py:152-181 to the hardened
# chunked-manifest sink):
#   1. `stream_manifest_sink_restart` — the REAL windowed_aggregate_
#      stream written through ManifestStreamWriter with a mid-stream
#      restart; asserts exactly-once across the restart boundary.
#   2. `stream_schema_evolution_feed` — rename_column mid-stream;
#      the change feed and the tail stay correct across the epoch.
ROUND11_REGISTRATION_PLAN: tuple[str, ...] = (
    "stream_manifest_sink_restart",
    "stream_schema_evolution_feed",
)

# Never-hashed backlog AFTER this window: EMPTY — every oracle-bearing
# registration has a green driver hash once CORRECTNESS_r10.json lands.
# Kept as data so the suite's coverage invariant (every never-hashed
# query ∈ DRIVER_WINDOW ∪ ROUND11_DRAFT) stays mechanical.
ROUND11_DRAFT: tuple[str, ...] = ()

# The round-10 window's never-hashed slots (positions 1-38), exactly
# the round-9 ROUND10_DRAFT in order — retained as a named constant so
# the window construction below is self-describing data.
_R10_BACKLOG_SLOTS: tuple[str, ...] = (
    "fellegi_sunter_linkage",
    "from_csv_permissive_surface",
    "ranking_semantics_surface",
    "attribution_position_weighted",
    "layout_hilbert_stats",
    "pii_luhn_validation",
    "iso_weekday_semantics",
    "decontamination_semantic",
    "frame_semantics_surface",
    "benford_digit_census",
    "cramers_v_association",
    "cohens_kappa_agreement",
    "roc_auc_doclen_lang",
    "theil_index_decomposition",
    "target_encode_loo",
    "stratified_split_assignment",
    "grouped_mode_exact",
    "brier_score_decomposition",
    "kcore_decomposition",
    "nulls_ordering_surface",
    "l_diversity_audit",
    "heavy_hitters_exact_2pass",
    "mixture_temperature_weights",
    "contrastive_negative_sampling",
    "dedup_canonical_url",
    "effect_size_cohens_d",
    "levene_variance_test",
    "itemitem_collaborative_topk",
    "intdiv_mod_semantics_surface",
    "cidr_containment_census",
    "schema_contract_audit",
    "decision_stump_exact_split",
    "naive_bayes_lang_classifier",
    "average_precision_doclen_lang",
    "fano_factor_burstiness",
    "markov_entropy_rate",
    "median_ci_order_statistic",
    "association_rules_single_item",
)

# The round-10 window's oldest-cohort slots (positions 39-49): the
# first 11 of the round-9 ROUND10_OLDEST_COHORT, exactly as written —
# the 3 deferred r3 rows first.
_R10_COHORT_SLOTS: tuple[str, ...] = (
    "corpus_shard_stats",
    "corpus_split_counts",
    "corpus_token_budget",
    "cube_type_day_stats",
    "date_format_display",
    "decontamination_overlap",
    "dedup_canonical",
    "dedup_exact_stats",
    "dedup_minhash_lsh_checked",
    "dedup_simhash_checked",
    "embedding_dedup_components",
)

# Round-11+ refresh schedule: the first 98 entries (two rounds' worth)
# of the churn-aware priority queue described above, derived by
# tools/backlog_audit.py::refresh_queue(exclude=DRIVER_WINDOW) on the
# round-10 rotation tree and pinned here as DATA so the next rotation
# is mechanical.  MEMBERSHIP of this prefix is suite-asserted against
# the live derivation (order within it can shift as round-10 commits
# touch engine files — the close stamp re-derives and re-pins exact
# order).  Leads with the 26 pyds_* rows (engine rewritten in round 9,
# hashes d6-d8), then the round-9-churned multimodal/embedding rows,
# then churned-by-older-edits rows oldest-first, then the non-churned
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

# Derived-arithmetic pins (asserted == tools/backlog_audit.compute_backlog()
# by tests/test_plans.py::test_backlog_arithmetic_derived; update BOTH
# when rotating — the test fails loudly on any hand-count drift):
NEVER_HASHED_AT_R10_ROTATION = 38
EVER_HASHED_THROUGH_R9 = 356

DRIVER_WINDOW: tuple[str, ...] = (
    # pinned sentinel (driver-green r1..r9)
    ("flagship_window_agg",)
    # never-hashed backlog (38): ALL of the round-9 draft, in order
    + _R10_BACKLOG_SLOTS
    # oldest-cohort refresh (11): first 11 of the round-9 cohort
    + _R10_COHORT_SLOTS
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
    "ROUND10_DRAFT",
    "ROUND10_OLDEST_COHORT",
    "ordered_registry",
]

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
# ROUND-9 ROTATION (drafted 2026-08-15, round 9).  CORRECTNESS_r08.json
# came back 50/50 green (zero err).  Arithmetic is DERIVED
# (`tools/backlog_audit.py::compute_backlog()` from CORRECTNESS_r*.json
# ∪ the registry; tests/test_plans.py::test_backlog_arithmetic_derived
# asserts this file's constants against it every suite run):
#   registry 400 | oracle-bearing 394 | ever-hashed r1..r8 = 317 |
#   never-hashed at rotation = 77 (exactly the round-8 ROUND9_DRAFT,
#   in order).
#
# STALENESS POLICY (amended round 7, unchanged): each round's window =
# the pinned sentinel + 10 oldest/refresh slots + ~39 never-hashed
# backlog slots; registration freeze (≤10 new/round, each hashed
# in-window immediately) until the backlog drains.
#
# This window (1 + 39 + 3 + 7 = 50):
#   * `flagship_window_agg` pinned (driver-green r1..r8);
#   * 39 never-hashed slots: the FIRST 39 of the round-8 draft, in
#     draft order, led by the four rows round 8 deferred
#     (`quantile_normalize_feature`, `rag_context_packing`,
#     `source_ablation_probe`, `tokenizer_fertility_by_lang`) — the
#     round-8 verdict's item 2, executed exactly as drafted;
#   * 3 refresh slots for the multimodal stragglers the round-8
#     verdict NAMED in item 6 (`multimodal_phash_neardups` re-hash
#     post-pixel-path — its last row predates the round-8
#     png_decode-backed kernel; `audio_wav_features` d6;
#     `image_resize_generic_real` d7).  NOTE: the verdict believed
#     these were "in ROUND9_DRAFT already"; they never were (all
#     three are EVER-hashed, so they are refresh rows, not backlog) —
#     honoring item 6 therefore takes 3 of this round's 10 refresh
#     slots, and the r3 cohort gets the remaining 7;
#   * 7 oldest-cohort slots: the first 7 of the round-3 cohort
#     (`ROUND9_OLDEST_COHORT` as written in round 8); the 3 deferred
#     rows (`corpus_shard_stats`, `corpus_split_counts`,
#     `corpus_token_budget`) LEAD ROUND10_OLDEST_COHORT below — as
#     DATA, so they cannot be lost (the round-7 lesson).
#
# ROUND-10 PLAN (written now so the rotation is mechanical): window =
# `flagship_window_agg` + ALL 38 of ROUND10_DRAFT (in order — the
# backlog EMPTIES) + the first 11 of ROUND10_OLDEST_COHORT
# (1 + 38 + 11 = 50).  From round 11 on, windows are flagship + 49
# strictly-oldest rows (the refresh steady state: cohort ages from
# tools/backlog_audit.py's histogram, oldest-first, r2 cohort right
# after the remaining r3 rows).  The entire r10 universe — 38 draft +
# 42 r3-cohort + 22 r2-cohort rows — was re-validated ALL GREEN against
# the DuckDB oracle at sf0.01 on the final round-9 tree, so any r10 red
# row indicates a code change since, not the query.
#
# AFTER THIS WINDOW lands green: never-hashed = 77 - 39 = 38 (all of
# ROUND10_DRAFT, in order) — round 10 drains them ALL and the backlog
# empties one round ahead of the round-11 crossover the round-8
# verdict projected.  Cohort ages after r9: 22 r2-rows at age 7,
# 42 r3-rows at age 6 (both in ROUND10_OLDEST_COHORT order: the 3
# deferred r3 rows first, then — backlog empty — round 11+ windows
# go strictly oldest-first through the r2 cohort).
#
# (Round-8 rotation text removed from this header; retained verbatim
# in git history.)

# Never-hashed backlog AFTER this window, in drain-priority order —
# DATA, not comment, so window drafts can't silently drop rows; round
# 10's never-hashed slots take ALL 38.  Coverage is suite-enforced:
# every never-hashed query must appear in DRIVER_WINDOW or here.
ROUND10_DRAFT: tuple[str, ...] = (
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

# Oldest-cohort refresh schedule for round 10+: the 3 r3-cohort rows
# deferred this round FIRST, then the rest of the r3 cohort (age 6
# after r9), then the 22 r2-cohort rows (age 7) — strictly oldest-first
# once the never-hashed backlog empties after round 10.
ROUND10_OLDEST_COHORT: tuple[str, ...] = (
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
    "embedding_ivf_multiprobe_topk",
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
    "resample_interpolate",
    "returned_items_report",
    "revenue_filter_agg",
    "rolling_median_smooth",
    "salted_join_brand_revenue",
    "salted_type_stats",
    "semi_join_customers",
    "set_ops_users",
    "stream_interval_join",
    "term_frequency",
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
)

# Derived-arithmetic pins (asserted == tools/backlog_audit.compute_backlog()
# by tests/test_plans.py::test_backlog_arithmetic_derived; update BOTH
# when rotating — the test fails loudly on any hand-count drift):
NEVER_HASHED_AT_R9_ROTATION = 77
EVER_HASHED_THROUGH_R8 = 317

DRIVER_WINDOW: tuple[str, ...] = (
    # pinned sentinel (driver-green r1..r8)
    "flagship_window_agg",
    # never-hashed backlog (39): the first 39 of round 8's draft, in
    # draft order — the four round-8-deferred rows lead
    "quantile_normalize_feature",
    "rag_context_packing",
    "source_ablation_probe",
    "tokenizer_fertility_by_lang",
    "sliding_distinct_users",
    "cdc_apply_scd1",
    "lateral_top3_orders",
    "table_profile_lineitem",
    "attribution_last_touch",
    "layout_zorder_stats",
    "fuzzy_join_deletion1",
    "array_hof_surface",
    "session_window_dynamic_gap",
    "udtf_chunk_text",
    "spatial_grid_neighbor_join",
    "impute_group_median",
    "setsim_prefix_filter_join",
    "phrase_search_postings",
    "changepoint_binary_segmentation",
    "try_cast_dirty_parse",
    "filtered_aggregates_sql",
    "map_hof_surface",
    "collation_caseinsensitive_stats",
    "xml_ingest_extract",
    "explode_outer_surface",
    "bitmap_distinct_users",
    "udtf_longest_streak",
    "url_parse_census",
    "hash_integrity_census",
    "observe_metrics_audit",
    "parameterized_sql_surface",
    "priority_sample_topk",
    "merge_into_orders",
    "bfs_shortest_hops",
    "bitmap_retention_intersect",
    "incremental_join_delta",
    "k_anonymity_audit",
    "unpivot_day_type_counts",
    "listagg_group_by_all",
    # multimodal refresh (3): the round-8 verdict item-6 rows — phash
    # re-hashed post-pixel-path, WAV features, generic image resize
    "multimodal_phash_neardups",
    "audio_wav_features",
    "image_resize_generic_real",
    # oldest-cohort refresh (7): the first 7 of the round-3 cohort
    "anti_join_customers",
    "asof_join_events",
    "avg_order_by_priority",
    "big_orders_customers",
    "bigram_counts",
    "clip_values",
    "corpus_sample_stratified",
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

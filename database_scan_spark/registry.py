"""Central registry: every named query/operator the engine exposes.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this list. Names follow SURVEY.md §2 Op ids; extensions use
``dedup_* / sim_* / text_* / mm_* / stream_*`` prefixes.
"""

from __future__ import annotations

from .plans.candidate_parts import CANDIDATE_PARTS_ORACLE, candidate_parts
from .spec import QuerySpec

SPECS: list[QuerySpec] = [
    QuerySpec(
        name="candidate_parts",
        fn=candidate_parts,
        oracle=CANDIDATE_PARTS_ORACLE,
        doc="Flagship 6-step multi-hop traversal (x2.2.py:238-247 analog).",
        tags=("core", "flagship"),
    ),
]


def _extend(specs: list[QuerySpec]) -> None:
    seen = {s.name for s in SPECS}
    for s in specs:
        if s.name in seen:
            raise ValueError(f"duplicate query name {s.name}")
        seen.add(s.name)
        SPECS.append(s)


def _load_all() -> None:
    """Import operator modules lazily so a syntax error in one module
    doesn't take down the whole surface during development."""
    from .operators import relational  # noqa: PLC0415

    _extend(relational.SPECS)
    from .operators import sources_sinks  # noqa: PLC0415

    _extend(sources_sinks.SPECS)
    from .operators import composite  # noqa: PLC0415

    _extend(composite.SPECS)
    from .operators import tpch_extra  # noqa: PLC0415

    _extend(tpch_extra.SPECS)
    from .operators import storage  # noqa: PLC0415

    _extend(storage.SPECS)
    from .operators import sql_surface  # noqa: PLC0415

    _extend(sql_surface.SPECS)
    from .operators import temporal  # noqa: PLC0415

    _extend(temporal.SPECS)
    from .operators import windows  # noqa: PLC0415

    _extend(windows.SPECS)
    from .operators import functions_surface  # noqa: PLC0415

    _extend(functions_surface.SPECS)
    from .operators import dedup  # noqa: PLC0415

    _extend(dedup.SPECS)
    from .operators import similarity  # noqa: PLC0415

    _extend(similarity.SPECS)
    from .operators import text_analysis  # noqa: PLC0415

    _extend(text_analysis.SPECS)
    from .operators import sampling  # noqa: PLC0415

    _extend(sampling.SPECS)
    from .operators import multimodal  # noqa: PLC0415

    _extend(multimodal.SPECS)
    from .operators import graph  # noqa: PLC0415

    _extend(graph.SPECS)
    from .operators import geo  # noqa: PLC0415

    _extend(geo.SPECS)
    from .operators import quality  # noqa: PLC0415

    _extend(quality.SPECS)
    from .operators import llm_prep  # noqa: PLC0415

    _extend(llm_prep.SPECS)
    from .operators import analytics_extra  # noqa: PLC0415

    _extend(analytics_extra.SPECS)
    from .operators import stats_tests  # noqa: PLC0415

    _extend(stats_tests.SPECS)
    from .plans import pipeline  # noqa: PLC0415

    _extend(pipeline.SPECS)
    from .plans import corpus_prep  # noqa: PLC0415

    _extend(corpus_prep.SPECS)
    from .plans import cc_clusters  # noqa: PLC0415

    _extend(cc_clusters.SPECS)
    from .plans import incremental_ingest  # noqa: PLC0415

    _extend(incremental_ingest.SPECS)
    from .plans import rag_retrieval  # noqa: PLC0415

    _extend(rag_retrieval.SPECS)
    from .plans import media_curation  # noqa: PLC0415

    _extend(media_curation.SPECS)
    from .plans import pretrain_batches  # noqa: PLC0415

    _extend(pretrain_batches.SPECS)
    from .plans import quality_funnel  # noqa: PLC0415

    _extend(quality_funnel.SPECS)
    from .streaming import jobs  # noqa: PLC0415

    _extend(jobs.SPECS)


_load_all()


# --- driver-window rotation (VERDICT r1 item 1, VERDICT r2 item 1) --------
#
# The driver's CORRECTNESS check covers the FIRST 50 registry entries per
# round. Queries never yet driver-verified sort first; verified ones last,
# so the window advances each round. Rotation plan (ROADMAP.md): r2 =
# dedup/sim/text/mm/stream/pipeline (done — 47/50 green), r3 = the five
# never-windowed SURVEY-§2 ops PINNED first + TPC-H + windows, r4 =
# remaining win/graph/dq + agg/join/analytic surface, r5+ = sweeps.

# Pin slot (used in r3 to force never-windowed SURVEY-§2 ops to the front;
# r7 pinned stream_stateful_user_totals, now hash-green in r07). r8 needs
# no pin: the window is pure family rotation over never-verified specs.
# r9 stages the first 50 of the 67 never-verified (stream_ tail, sink_,
# storage_, src_, udf_, sql_, udtf_rle_tokens); the 17 overflow singletons
# need NO r10 pin: once r9 greens fold into _DRIVER_VERIFIED they are the
# ONLY never-verified specs left, and the `s.name in _DRIVER_VERIFIED`
# sort key already guarantees never-verified specs lead the window.
_PINNED_WINDOW: tuple[str, ...] = ()

_DRIVER_VERIFIED: frozenset[str] = frozenset({
    # round 1 (CORRECTNESS_r01.json — all three matches green)
    "candidate_parts", "src_parquet_scan", "src_csv", "src_json_permissive",
    "src_search", "param_bind", "proj_flatten", "proj_rename_addcol",
    "proj_json_path", "filter_score_ge", "filter_not_in",
    "filter_exclude_seed", "filter_null_guard", "limit_first_hit",
    "dedup_by_id", "dedup_memoize", "join_merge_inner_same_key",
    "join_merge_inner_diff_keys", "join_lookup_nested_loop",
    "join_api_foreach", "join_multi_hop", "set_difference",
    "set_intersection", "set_union_accumulate", "set_membership",
    "agg_count_distinct", "agg_group_sums", "agg_rollup", "agg_cube",
    "sort_topk", "topk_per_group", "src_graphql_post", "src_rest_get",
    "filter_http_status", "catalog", "paginate", "sink_csv", "sink_stdout",
    "proj_graphql_fields", "proj_drop", "wf_rate_limit", "wf_quality_gate",
    "agg_count", "sort_remote_score_desc", "topk_first", "fn_str_replace",
    "fn_str_strip", "fn_json_get", "udf_molecule_name",
    "src_python_datasource",
    # round 2 (CORRECTNESS_r02.json — rows+schema+hash green; the window's
    # three no_oracle rows are NOT folded in: dedup_minhash_mllib and
    # mm_resize re-enter via _PINNED_WINDOW now that they're oracled;
    # stream_stateful_user_totals was rows-only until r5, when
    # integer-cents state + final-state selection made it oracle-able)
    "dedup_exact", "dedup_ngram_jaccard", "dedup_jaccard_prefix",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_simhash_pairs",
    "dedup_embedding_cosine", "dedup_levenshtein",
    "dedup_levenshtein_passjoin", "dedup_decontaminate",
    "dedup_containment", "dedup_substring_spans",
    "dedup_incremental_minhash", "dedup_cluster_cc",
    "sim_topk_bruteforce", "sim_lsh_ann", "sim_ivf_flat",
    "sim_lsh_recall_eval", "sim_label_centroids", "sim_centroid_assign",
    "sim_kmeans", "sim_pq_adc", "sim_pq_rerank", "sim_knn_classify",
    "text_tokens", "text_quality", "text_lang_id", "text_fingerprint",
    "text_pii_redact", "text_repetition", "text_tfidf_topk",
    "text_inverted_index", "text_bm25_search", "text_quality_logreg",
    "text_ngram_topk", "text_surprisal",
    "mm_decode_real", "mm_decode_meta", "mm_feature_extract",
    "mm_frame_sample",
    "pipeline_corpus_prep",
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_stateful_running_total", "stream_tws_recent_events",
    "stream_tws_type_counts",
    # round 3 (CORRECTNESS_r03.json — 50/50 rows+schema+hash green: the
    # pinned never-windowed §2 ops + the two oracle upgrades + TPC-H
    # q2–q22 + the full window-function family)
    "fn_str_format", "fn_coalesce", "fn_json_pretty",
    "udf_smiles_canonical", "wf_checkpoint_resume", "mm_resize",
    "dedup_minhash_mllib",
    "tpch_q2_min_cost_supplier", "tpch_q3_shipping_priority",
    "tpch_q4_order_priority", "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue", "tpch_q7_volume_shipping",
    "tpch_q8_market_share", "tpch_q9_product_profit",
    "tpch_q10_returned_items", "tpch_q12_shipmode_priority",
    "tpch_q13_customer_distribution", "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier", "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty_revenue", "tpch_q18_large_orders",
    "tpch_q19_disjunctive_revenue", "tpch_q20_promotion_suppliers",
    "tpch_q21_sole_blame_supplier", "tpch_q22_sales_opportunity",
    "win_running_sum", "win_rank_dense", "win_lag_lead", "win_tumbling",
    "win_sliding", "win_session", "win_range_frame", "win_distribution",
    "win_gap_fill", "win_rolling_zscore", "win_ohlc_resample",
    "win_streak", "win_nav_ignore_nulls", "win_twap", "win_drawdown",
    "win_cusum", "win_hampel", "win_interpolate", "win_sax_symbolize",
    "win_decay_score", "win_mtd_ytd", "win_forward_fill", "win_ewma",
    # round 4 (CORRECTNESS_r04.json — 50/50 rows+schema+hash green: the
    # window tail + full graph_ + full dq_ + agg_ sketch head)
    "win_count_distinct", "win_rolling_corr", "win_seasonal_decompose",
    "win_rolling_skewness",
    "graph_pagerank", "graph_triangle_count", "graph_shortest_path",
    "graph_label_propagation", "graph_degree_histogram",
    "graph_link_prediction", "graph_hits", "graph_random_walk",
    "graph_scc", "graph_neighborhood_function", "graph_ppr",
    "graph_kcore", "graph_modularity", "graph_assortativity",
    "graph_bipartite_projection", "graph_reciprocity",
    "graph_clustering_coefficient",
    "dq_langid_confusion", "dq_constraint_audit", "dq_profile_numeric",
    "dq_correlation", "dq_observed_metrics", "dq_anomaly_mad",
    "dq_freshness_sla", "dq_error_budget", "dq_seasonal_baseline",
    "dq_entropy_profile", "dq_moments", "dq_annotator_agreement",
    "dq_key_discovery", "dq_drift_wasserstein", "dq_outlier_ensemble",
    "dq_schema_contract", "dq_split_leakage_audit",
    "dq_dup_rate_by_source", "dq_near_dup_rate_by_source", "dq_benford",
    "dq_corpus_report", "dq_drift_psi",
    "agg_approx", "agg_hll_sketch", "agg_theta_distinct_union",
    "agg_approx_error_eval", "agg_theta_set_algebra", "agg_hll_portable",
    "agg_grouping_sets",
    # round 5 (CORRECTNESS_r05.json — 50/50 rows+schema+hash green: the
    # agg_ tail + the full join_ family + the analytic_ head)
    "agg_percentile_exact", "agg_histogram", "agg_pivot",
    "agg_filter_clause", "agg_heavy_hitters", "agg_countmin_sketch",
    "agg_histogram_equidepth", "agg_bitmap_distinct", "agg_linreg",
    "agg_weighted_median", "agg_quantile_histogram",
    "agg_frequency_moments",
    "join_bucketed", "join_salted", "join_skew_unsalted",
    "join_skew_salted", "join_bloom_prefilter",
    "join_dynamic_partition_pruning", "join_outer_left", "join_outer_full",
    "join_semi_anti", "join_existence_project", "join_hint_matrix",
    "join_null_aware_anti", "join_asof", "join_range_events",
    "join_asof_forward", "join_asof_nearest", "join_asof_tolerance",
    "join_interval_overlap", "join_pit_features",
    "analytic_user_paths", "analytic_skyline", "analytic_ndcg",
    "analytic_market_basket", "analytic_attribution", "analytic_ab_test",
    "analytic_logreg_gd", "analytic_rfm", "analytic_pareto",
    "analytic_cohort_ltv", "analytic_time_to_convert", "analytic_gini",
    "analytic_survival", "analytic_ks_test", "analytic_price_index",
    "analytic_did", "analytic_bootstrap_ci", "analytic_trend_mk",
    "analytic_theil_sen",
    # round 6 (CORRECTNESS_r06.json — 50/50 rows+schema+hash green: the
    # analytic_ tail + the wf_ head)
    "analytic_auc", "analytic_gains_table", "analytic_calibration",
    "analytic_heavy_change", "analytic_tost_equivalence",
    "analytic_shapley_attribution", "analytic_adstock",
    "analytic_event_study", "analytic_rdd", "analytic_raking_ipf",
    "analytic_chi_square", "analytic_spearman", "analytic_kendall_tau",
    "analytic_avg_precision", "analytic_mannwhitney",
    "analytic_changepoint", "analytic_power_analysis",
    "analytic_seasonality_strength", "analytic_cuped", "analytic_fdr_bh",
    "analytic_var_cvar", "analytic_forecast_backtest", "analytic_psm",
    "analytic_prop_ztest", "analytic_contribution",
    "analytic_markov_transition", "analytic_growth_accounting",
    "analytic_effect_size", "analytic_qte", "analytic_msprt",
    "analytic_srm", "analytic_retention_fit",
    "wf_delete_compliance", "wf_chunk_documents",
    "wf_k_anonymity", "wf_dp_counts",
    "wf_target_encoding", "wf_fair_share_budget", "wf_compaction_plan",
    "wf_dlq_replay", "wf_mixture_temperature", "wf_data_mixture",
    "wf_curriculum_schedule", "wf_sft_format", "wf_shuffle_shard",
    "wf_cdc_upsert", "wf_scd2_history", "wf_active_learning_select",
    "wf_dpo_pair_builder", "wf_pack_sequences",
    # round 7 (CORRECTNESS_r07.json — 50/50 rows+schema+hash green: the
    # wf_ ledger tail + fn_ surface + dedup_/sim_ leftovers + the pinned
    # stream_stateful_user_totals, finally oracle-green)
    "stream_stateful_user_totals",
    "wf_dsir_select", "wf_mv_incremental", "wf_snapshot_diff",
    "wf_backfill_plan", "wf_late_restatement", "wf_provenance_chain",
    "fn_math_ops", "fn_cond_case", "fn_str_ops", "fn_date_ops",
    "fn_timezone_ops", "fn_interval_ops", "fn_array_ops", "fn_map_ops",
    "fn_lambda_ops", "fn_bitwise_ops", "fn_try_arithmetic",
    "fn_url_parse", "fn_uuid_deterministic", "fn_variant_json",
    "fn_xml_roundtrip", "fn_collation_compare", "fn_column_protection",
    "fn_minmax_by", "fn_sql_udf", "fn_string_agg",
    "dedup_bloom_archive", "dedup_cdc_chunks", "dedup_cluster_cc_twostar",
    "dedup_fellegi_sunter", "dedup_jaro_winkler", "dedup_keep_best",
    "dedup_method_matrix", "dedup_minhash_bbit", "dedup_minhash_oph",
    "dedup_semdedup", "dedup_token_sort",
    "sim_ann_recall_matrix", "sim_centroid_drift", "sim_corpus_overlap",
    "sim_hard_negatives", "sim_ivfpq", "sim_matryoshka_rerank",
    "sim_mmr_rerank", "sim_prf_rocchio", "sim_random_projection",
    "sim_rrf_fusion", "sim_sq8_error", "sim_topk_filtered",
    # round 8 (CORRECTNESS_r08.json — 50/50 rows+schema+hash green: the
    # user-facing LLM deliverables — all 8 pipeline_*, 10 mm_*, the 9
    # sample_/split_, geo_ (4), the 16-spec text_ tail, stream_ head 3)
    "pipeline_corpus_dashboard", "pipeline_model_eval",
    "pipeline_experiment_readout", "pipeline_incremental_ingest",
    "pipeline_rag_retrieval", "pipeline_media_curation",
    "pipeline_pretrain_batches", "pipeline_quality_funnel",
    "mm_audio_energy", "mm_image_rowsum", "mm_phash_pairs",
    "mm_vad_segments", "mm_audio_fingerprint", "mm_audio_snr",
    "mm_png_roundtrip", "mm_thumbnail_real", "mm_image_edge_density",
    "mm_audio_clipping",
    "sample_hash_bernoulli", "sample_stratified", "sample_reservoir",
    "sample_balanced_class", "sample_stratified_neyman",
    "split_train_test", "split_kfold", "split_temporal_embargo",
    "split_group_holdout",
    "geo_geohash_encode", "geo_knn_join", "geo_point_in_polygon",
    "geo_radius_join",
    "text_boilerplate_fraction", "text_bpe_apply", "text_bpe_train",
    "text_ccnet_perplexity", "text_chunk_dedup", "text_collocations",
    "text_gopher_rules", "text_hashing_vectorizer", "text_keyword_rake",
    "text_ngram_novelty", "text_readability", "text_stylometry_distance",
    "text_token_fertility", "text_watermark_detect",
    "text_winnowing_fingerprints", "text_zipf_fit",
    "stream_dedup", "stream_foreach_batch_sink",
    "stream_stream_interval_join",
    # round-9 window (CORRECTNESS_r09.json, 50/50 green)
    "stream_mv_refresh", "stream_tws_inactivity_flush",
    "stream_tws_proctime_timer", "stream_tws_eventtime_timer",
    "stream_static_join", "stream_dedup_within_watermark",
    "stream_left_outer_interval_join", "stream_update_vs_complete",
    "stream_watermark_late_drop", "stream_checkpoint_resume",
    "stream_chained_aggregations", "stream_pit_enrich",
    "stream_dlq_split", "stream_corpus_ingest",
    "sink_python_datasource", "sink_csv_roundtrip_quoted",
    "sink_jsonl_roundtrip", "sink_parquet_partitioned",
    "sink_compact_small_files", "sink_clustered_write",
    "sink_zorder_write", "sink_dynamic_partition_overwrite",
    "sink_python_stream_datasource",
    "storage_time_travel", "storage_merge_on_read",
    "storage_mor_compact", "storage_vacuum_retention",
    "storage_partition_evolution", "storage_manifest_skipping",
    "storage_deletion_vectors", "storage_clustering_audit",
    "src_orc", "src_federated_union", "src_python_stream_datasource",
    "src_csv_corrupt_recovery", "src_text_lines", "src_merge_schema",
    "src_binary_files",
    "udf_grouped_agg_median", "udf_arrow_map_batches",
    "udf_scalar_iter", "udf_window_pandas", "udf_arrow_python",
    "udf_cogrouped_merge",
    "sql_frontend_report", "sql_recursive_cte", "sql_lateral_topk",
    "sql_pipe_syntax", "sql_group_by_all",
    "udtf_rle_tokens",
})

# Unverified queries sort by family; ties keep registration order.
# Families past the window land in later rounds. Round-10 state: the
# r9 window went 50/50 green (CORRECTNESS_r09.json, merged above), so
# the never-verified set is down to 20 — the 18-spec r9 overflow
# (udtf_ tail, filter_/proj_/param_ singletons, subquery_correlated,
# grouped_pandas_topk, funnel/cohort/topk/catalog/set singletons,
# win_running_sum_sharded) plus the two round-10 sharded nav windows
# (win_lag_lead_sharded, win_ewma_sharded). All 20 auto-sort into the
# r10 window head with no pin — r10 closes the registry; any spec
# registered later joins the same never-verified-first rotation
# automatically.
_FAMILY_ORDER: tuple[str, ...] = (
    "pipeline_", "mm_", "sample_", "split_", "geo_", "text_", "stream_",
    "sink_", "storage_", "src_", "udf_", "sql_", "udtf_", "filter_",
    "proj_", "param_", "subquery_", "grouped_", "funnel_", "cohort_",
    "topk_", "catalog_", "set_",
    "tpch_", "win_", "graph_", "dq_",
    "agg_", "join_", "analytic_", "wf_", "fn_", "dedup_", "sim_",
)


def _family_rank(name: str) -> int:
    for i, prefix in enumerate(_FAMILY_ORDER):
        if name.startswith(prefix):
            return i
    return len(_FAMILY_ORDER)


def _rotate() -> None:
    order = {id(s): i for i, s in enumerate(SPECS)}
    pin = {n: i for i, n in enumerate(_PINNED_WINDOW)}
    SPECS.sort(
        key=lambda s: (
            s.name not in pin,
            pin.get(s.name, 0),
            s.name in _DRIVER_VERIFIED,
            _family_rank(s.name),
            order[id(s)],
        )
    )


_rotate()


def get(name: str) -> QuerySpec:
    for s in SPECS:
        if s.name == name:
            return s
    raise KeyError(name)

#!/usr/bin/env python
"""Generate COVERAGE.md: SURVEY.md §2 op id → registered query +
oracle status. Validates every mapped name against the live registry
so the matrix can't drift from the code. Run from the repo root:

    python tools/gen_coverage.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# SURVEY §2 op id -> registered queries() key(s) covering it.
# None = deliberately not replicated (with reason in NOTES).
SURVEY_MAP: dict[str, dict[str, list[str] | str]] = {
    "§2.1 Scans / sources / sinks": {
        "src_graphql_post": ["src_graphql_post", "src_python_datasource"],
        "(engine addition) Python STREAMING DataSource (cursor-paged live crawl)": ["src_python_stream_datasource"],
        "src_rest_get": ["src_rest_get"],
        "src_csv": ["src_csv"],
        "(engine addition) tolerant JSON ingestion": ["src_json_permissive"],
        "(engine addition) ORC columnar source": ["src_orc"],
        "(engine addition) schema-evolution read (mergeSchema)": ["src_merge_schema"],
        "(engine addition) federated multi-format union": ["src_federated_union"],
        "(engine addition) JSONL corpus export/re-ingest roundtrip": [
            "sink_jsonl_roundtrip"
        ],
        "(engine addition) line-oriented raw text ingestion": ["src_text_lines"],
        "sink_csv": ["sink_csv"],
        "sink_stdout": ["sink_stdout"],
        "param_bind": ["param_bind", "param_identifier"],
        "src_search": ["src_search"],
        "catalog": ["catalog"],
        "paginate": ["paginate"],
    },
    "§2.2 Projections": {
        "proj_flatten": ["proj_flatten"],
        "proj_graphql_fields": ["proj_graphql_fields"],
        "proj_rename": ["proj_rename_addcol"],
        "proj_drop": ["proj_drop"],
        "proj_addcol": ["proj_rename_addcol"],
        "proj_json_path": ["proj_json_path"],
    },
    "§2.3 Filters / predicates": {
        "filter_score_ge": ["filter_score_ge"],
        "filter_not_in": ["filter_not_in"],
        "filter_exclude_seed": ["filter_exclude_seed"],
        "filter_null_guard": ["filter_null_guard"],
        "filter_http_status": ["filter_http_status"],
        "limit_first_hit": ["limit_first_hit"],
    },
    "§2.4 Deduplication": {
        "dedup_by_id": ["dedup_by_id"],
        "dedup_memoize": ["dedup_memoize"],
    },
    "§2.5 Joins": {
        "join_merge_inner_same_key": ["join_merge_inner_same_key"],
        "join_merge_inner_diff_keys": ["join_merge_inner_diff_keys"],
        "join_lookup_nested_loop": ["join_lookup_nested_loop"],
        "join_api_foreach": ["join_api_foreach"],
        "join_multi_hop": ["join_multi_hop", "candidate_parts"],
        "(absent in reference: as-of / range joins)": [
            "join_asof", "join_asof_forward", "join_asof_nearest", "join_range_events"
        ],
        "(engine addition: weighted PageRank over the trade graph)": ["graph_pagerank"],
        "(engine addition: personalized PageRank from a seed set)": ["graph_ppr"],
        "(engine addition: per-node triangle counts)": ["graph_triangle_count"],
        "(engine addition: BFS shortest path, recursive-CTE oracle)": ["graph_shortest_path"],
        "(engine addition: SCC via semi-naive closure to fixpoint)": ["graph_scc"],
        "(engine addition: point-in-time N-feature join, one window pass)": [
            "join_pit_features", "stream_pit_enrich"
        ],
    },
    "§2.6 Set operations": {
        "set_difference": ["set_difference", "candidate_parts"],
        "set_intersection": ["set_intersection"],
        "set_union_accumulate": ["set_union_accumulate"],
        "set_membership": ["set_membership"],
    },
    "§2.7 Aggregations": {
        "agg_count_distinct": ["agg_count_distinct"],
        "agg_count": ["agg_count"],
        "(engine additions: full agg surface)": [
            "agg_group_sums",
            "agg_rollup",
            "agg_cube",
            "agg_grouping_sets",
            "agg_approx",
            "agg_percentile_exact",
            "agg_histogram",
        ],
        "(engine addition: equi-depth histogram via ntile)": [
            "agg_histogram_equidepth"
        ],
        "(engine addition: exact heavy hitters, two-phase)": ["agg_heavy_hitters"],
        "(engine addition: Count-Min sketch frequency summary)": ["agg_countmin_sketch"],
        "(engine addition: multi-touch attribution, window-only)": ["analytic_attribution"],
        "BPE merge induction (tokenizer training)": ["text_bpe_train"],
        "BPE apply (corpus tokenization + compression)": ["text_bpe_apply"],
        "MAD robust anomaly detection (modified z)": ["dq_anomaly_mad"],
        "time-weighted average (irregular intervals)": ["win_twap"],
        "weighted median via windowed cumulative weights": ["agg_weighted_median"],
        "class-balanced downsample (content-hash order)": ["sample_balanced_class"],
        "staleness-bounded as-of join (point-in-time rule)": ["join_asof_tolerance"],
        "late-data restatement ledger (v1/correction/v2)": ["wf_late_restatement"],
        "point-in-polygon geofence (ray casting, row-local)": ["geo_point_in_polygon"],
        "stream-stream LEFT OUTER interval join (watermark eviction)": ["stream_left_outer_interval_join"],
        "RFM quintile segmentation": ["analytic_rfm"],
        "malformed-CSV recovery (PERMISSIVE + corrupt capture)": ["src_csv_corrupt_recovery"],
        "max drawdown (nested running windows)": ["win_drawdown"],
        "banded interval-overlap join": ["join_interval_overlap"],
        "mergeable histogram quantiles (deterministic sketch)": ["agg_quantile_histogram"],
        "freshness SLA audit (ingest lag vs high-water mark)": ["dq_freshness_sla"],
        "Pareto/ABC concentration analysis": ["analytic_pareto"],
        "dynamic partition pruning join": ["join_dynamic_partition_pruning"],
        "join-strategy hint surface (BROADCAST/MERGE/SHUFFLE_HASH)": [
            "join_hint_matrix"
        ],
        "approx-sketch error eval (verdict-oracled)": ["agg_approx_error_eval"],
        "streaming Python DataSource sink (batch-scoped commit)": ["sink_python_stream_datasource"],
        "real windowed PCM audio energy (byte-exact)": ["mm_audio_energy"],
        "real BMP pixel-row luminance sums (byte-exact)": ["mm_image_rowsum"],
        "filtered vector search (metadata pre-filter)": ["sim_topk_filtered"],
        "signup-cohort LTV curves": ["analytic_cohort_ltv"],
        "time-to-convert survival curve": ["analytic_time_to_convert"],
        "RAG retrieval pipeline (chunk/embed/score/rank)": ["pipeline_rag_retrieval"],
        "SLO error-budget burn ledger": ["dq_error_budget"],
        "b-bit minhash (collision-corrected estimate vs exact)": ["dedup_minhash_bbit"],
        "PII masking + AES column encryption roundtrip": ["fn_column_protection"],
        "same-weekday seasonal baseline anomaly flags": ["dq_seasonal_baseline"],
        "deterministic k-fold CV assignment": ["split_kfold"],
        "common-neighbor link prediction": ["graph_link_prediction"],
        "per-segment revenue Gini coefficient": ["analytic_gini"],
        "Kaplan-Meier retention risk table": ["analytic_survival"],
        "MMR diversified re-ranking (Carbonell & Goldstein SIGIR'98)": ["sim_mmr_rerank"],
        "reciprocal rank fusion hybrid merge (Cormack SIGIR'09)": [
            "sim_rrf_fusion"
        ],
        "NDCG@10 retrieval evaluation (histogram-derived ideal)": [
            "analytic_ndcg"
        ],
        "embedding centroid drift monitor (per-class displacement)": [
            "sim_centroid_drift"
        ],
        "k-anonymity generalization/suppression ladder": ["wf_k_anonymity"],
        "differentially-private count release (geometric mechanism)": [
            "wf_dp_counts"
        ],
        "Neyman optimal-allocation stratified sampling": ["sample_stratified_neyman"],
        "Shannon-entropy categorical column profiling": ["dq_entropy_profile"],
        "perceptual-hash image near-dup (aHash, banded)": ["mm_phash_pairs"],
        "CUSUM change-point monitor (prefix-min closed form)": ["win_cusum"],
        "rolling-median Hampel outlier filter": ["win_hampel"],
        "exact two-sample Kolmogorov-Smirnov segment test": ["analytic_ks_test"],
        "Laspeyres fixed-basket price index (integer ppm)": ["analytic_price_index"],
        "VAD audio segmentation (energy islands over real WAV)": ["mm_vad_segments"],
        "difference-in-differences effect estimate": ["analytic_did"],
        "leakage-safe temporal split with embargo gap": ["split_temporal_embargo"],
        "PMI bigram collocation mining": ["text_collocations"],
        "deterministic Poisson bootstrap CI (Chamandy et al.)": ["analytic_bootstrap_ci"],
        "Matryoshka prefix-dim retrieve + full rerank audit": ["sim_matryoshka_rerank"],
        "linear interpolation of missing time-series points": ["win_interpolate"],
        "Flesch/FK readability scoring (syllable proxy)": ["text_readability"],
        "SCALAR_ITER pandas UDF (setup amortization)": ["udf_scalar_iter"],
        "Mann-Kendall monotone-trend test": ["analytic_trend_mk"],
        "SQL-defined function (Catalyst-inlined, Spark 4)": ["fn_sql_udf"],
        "HITS hubs/authorities (scaled-integer rounds)": ["graph_hits"],
        "cross-modality media curation pipeline": ["pipeline_media_curation"],
        "theta-sketch set algebra (intersection/difference)": ["agg_theta_set_algebra"],
        "EXECUTE IMMEDIATE + session variables (dynamic SQL)": ["param_execute_immediate"],
        "Theil-Sen robust trend slope": ["analytic_theil_sen"],
        "skewness/kurtosis from exact power sums": ["dq_moments"],
        "deterministic random walks (DeepWalk corpus prep)": ["graph_random_walk"],
        "out-of-fold target encoding (leakage-safe)": ["wf_target_encoding"],
        "exact ROC-AUC (Mann-Whitney rank form)": ["analytic_auc"],
        "Cohen's kappa annotator agreement": ["dq_annotator_agreement"],
        "decile gains/lift table (total-order ntile)": ["analytic_gains_table"],
        "calibration bins + exact Brier score": ["analytic_calibration"],
        "chi-square independence test (exact cell terms)": ["analytic_chi_square"],
        "Spearman rank correlation (value-domain ranks, no global sort)": [
            "analytic_spearman"
        ],
        "average precision / PR-AUC (threshold aggregates)": [
            "analytic_avg_precision"
        ],
        "changepoint localization (binary-segmentation step)": [
            "analytic_changepoint"
        ],
        "Kendall tau-b concordance (histogram cell pairs)": ["analytic_kendall_tau"],
        "Mann-Whitney U battery across group pairs (tie-corrected)": [
            "analytic_mannwhitney"
        ],
        "A/B power analysis / sample sizing (exact moments)": [
            "analytic_power_analysis"
        ],
        "seasonality strength (weekday ANOVA eta-squared)": [
            "analytic_seasonality_strength"
        ],
        "STL-lite additive decomposition (trend/seasonal/residual)": [
            "win_seasonal_decompose"
        ],
        "CUPED pre-period variance reduction": ["analytic_cuped"],
        "degree assortativity (edge-wise moments)": ["graph_assortativity"],
        "weighted directed reciprocity": ["graph_reciprocity"],
        "local clustering coefficients (thresholded graph)": [
            "graph_clustering_coefficient"
        ],
        "rolling skewness window (exact third moments)": [
            "win_rolling_skewness"
        ],
        "rolling correlation window (exact integer sums)": ["win_rolling_corr"],
        "two-proportion z-tests per funnel transition": ["analytic_prop_ztest"],
        "experiment readout flagship (cohorts + CUPED + z)": [
            "pipeline_experiment_readout"
        ],
        "rolling-origin forecast backtest (MAPE/sMAPE/bias)": [
            "analytic_forecast_backtest"
        ],
        "Benjamini-Hochberg FDR correction (z-scale step-up)": [
            "analytic_fdr_bh"
        ],
        "empirical VaR/CVaR tail risk (exact order statistic)": [
            "analytic_var_cvar"
        ],
        "PK/FK constraint discovery (uniqueness + inclusion)": [
            "dq_key_discovery"
        ],
        "propensity stratification matching (ATT vs naive)": ["analytic_psm"],
        "standardized effect size (Cohen's d / Hedges' g + CI)": [
            "analytic_effect_size"
        ],
        "quantile treatment effects (distributional lift)": ["analytic_qte"],
        "segment contribution / root-cause drill (Adtributor shape)": [
            "analytic_contribution"
        ],
        "first-order Markov transition matrix": ["analytic_markov_transition"],
        "weekly growth accounting (new/retained/resurrected/churned)": [
            "analytic_growth_accounting"
        ],
        "retention decay fit + half-life (log-linear OLS)": [
            "analytic_retention_fit"
        ],
        "classifier confusion matrix (lang-ID vs ground truth)": [
            "dq_langid_confusion"
        ],
        "k-core peel of the part-supplier graph (bounded fixpoint)": ["graph_kcore"],
        "exact directed modularity of a community partition": ["graph_modularity"],
        "bipartite one-mode projection (lift-filtered)": [
            "graph_bipartite_projection"
        ],
        "(engine addition: arg-max/arg-min/deterministic mode)": ["fn_minmax_by"],
        "(engine addition: exact distinct via mergeable bitmaps)": [
            "agg_bitmap_distinct"
        ],
        "exact AMS frequency moments / self-join size per key": [
            "agg_frequency_moments"
        ],
        "heavy-change detection (top-N |Δcount| across window midpoint)": [
            "analytic_heavy_change"
        ],
        "calendar YTD totals + integer-exact YoY basis points": [
            "win_mtd_ytd"
        ],
        "bitwise scalar + BIT_AND/OR/XOR aggregate surface": [
            "fn_bitwise_ops"
        ],
    },
    "§2.8 Sort / top-k / windows": {
        "sort_remote_score_desc": ["sort_remote_score_desc"],
        "topk_first": ["topk_first", "limit_first_hit", "topk_per_group"],
        "(engine addition: aggregation-based top-k, no window sort)": [
            "topk_group_agg"
        ],
        "(engine additions: analytic windows)": [
            "win_running_sum",
            "win_rank_dense",
            "win_lag_lead",
            "win_range_frame",
            "win_distribution",
            "win_gap_fill",
            "win_rolling_zscore",
            "win_forward_fill",
            "win_ewma",
            "sort_topk",
            "win_count_distinct",
            "win_streak",
        ],
        "(engine addition: hot-key-safe two-pass prefix sum)": [
            "win_running_sum_sharded"
        ],
        "(engine addition: hot-key-safe nav windows via indexed equi-join)": [
            "win_lag_lead_sharded",
            "win_ewma_sharded",
            "win_session_sharded",
        ],
    },
    "§2.9 Scalar functions": {
        "fn_str_replace": ["fn_str_replace"],
        "fn_str_strip": ["fn_str_strip"],
        "fn_str_format": ["fn_str_format"],
        "fn_coalesce": ["fn_coalesce"],
        "fn_json_get": ["fn_json_get", "proj_json_path"],
        "fn_json_pretty": ["fn_json_pretty"],
        "(engine additions: str/date/array/map)": [
            "fn_str_ops",
            "fn_date_ops",
            "fn_array_ops",
            "fn_string_agg",
            "fn_map_ops",
        ],
    },
    "§2.10 UDF surface": {
        "udf_smiles_canonical": ["udf_smiles_canonical"],
        "udf_molecule_name": ["udf_molecule_name"],
        "(engine addition: Python UDTF, Arrow-batched)": ["udtf_rle_tokens"],
        "(engine addition: GROUPED_AGG pandas UDF)": ["udf_grouped_agg_median"],
    },
    "§2.11 Workflow / orchestration": {
        "wf_checkpoint_resume": ["wf_checkpoint_resume"],
        "wf_rate_limit": ["wf_rate_limit"],
        "wf_quality_gate": ["wf_quality_gate"],
        "(engine addition: incremental materialized-view refresh)": [
            "wf_mv_incremental"
        ],
        "(engine addition: missing-partition backfill planner)": [
            "wf_backfill_plan"
        ],
        "wf_known_broken": "NOT REPLICATED by design (SURVEY §7.3 #4: broken "
        "resume artifact + pandas index leak are reference bugs)",
    },
    "§2.12 Streaming (extension — reference has none)": {
        "tumbling windows": ["win_tumbling", "stream_tumbling"],
        "OHLC timeseries resample": ["win_ohlc_resample"],
        "sliding windows": ["win_sliding", "stream_sliding"],
        "session windows": ["win_session", "stream_session"],
        "custom stateful operator": [
            "stream_stateful_user_totals",
            "stream_stateful_running_total",
            "stream_tws_recent_events",
            "stream_tws_type_counts",
        ],
        "streaming dedup": ["stream_dedup"],
        "stream-stream interval join": ["stream_stream_interval_join"],
        "foreachBatch idempotent sink": ["stream_foreach_batch_sink"],
        "streaming incremental MV maintenance": ["stream_mv_refresh"],
        "event-time timers (multi-batch inactivity flush)": [
            "stream_tws_inactivity_flush"
        ],
        "processing-time timers (first-sight snapshot fire)": [
            "stream_tws_proctime_timer"
        ],
        "event-time timers (watermark-fired SLA deadline lifecycle)": [
            "stream_tws_eventtime_timer"
        ],
    },
    "North-star: deduplication": {
        "exact": ["dedup_exact"],
        "MinHash + LSH": ["dedup_minhash_lsh", "dedup_minhash_mllib"],
        "dedup-variant agreement matrix (precision/recall vs exact)": ["dedup_method_matrix"],
        "incremental dedup vs standing index": ["dedup_incremental_minhash"],
        "connected-components clustering (iterative)": ["dedup_cluster_cc", "dedup_cluster_cc_lsh"],
        "large-star/small-star CC (Kiveris SoCC'14, diameter-independent)": [
            "dedup_cluster_cc_twostar"
        ],
        "repeated-line (chunk) boilerplate removal (CCNet/RefinedWeb)": [
            "text_chunk_dedup"
        ],
        "SimHash": ["dedup_simhash", "dedup_simhash_pairs"],
        "n-gram Jaccard": ["dedup_ngram_jaccard"],
        "prefix-filtered set-similarity join (PPJoin)": ["dedup_jaccard_prefix"],
        "exact-substring span detection (shared 8-token grams)": [
            "dedup_substring_spans"
        ],
        "edit-distance entity resolution": ["dedup_levenshtein", "dedup_levenshtein_passjoin"],
        "Fellegi-Sunter probabilistic linkage weight table": [
            "dedup_fellegi_sunter"
        ],
        "order-insensitive exact dedup (token-sort key)": ["dedup_token_sort"],
        "embedding cosine": ["dedup_embedding_cosine"],
        "SemDeDup semantic cluster dedup (Abbas et al. 2023)": ["dedup_semdedup"],
        "eval-set decontamination": ["dedup_decontaminate"],
        "one-sided containment (subset/superset pairs)": ["dedup_containment"],
        "source-pair corpus overlap (mergeable MinHash matrix)": [
            "sim_corpus_overlap"
        ],
        "Jaro-Winkler linkage scores (cross-implementation oracle)": [
            "dedup_jaro_winkler"
        ],
        "per-cluster canonical election (keep argmax quality)": [
            "dedup_keep_best"
        ],
        "portable Bloom-filter archive dedup (measured FPP audit)": [
            "dedup_bloom_archive"
        ],
        "one-permutation MinHash + rotation densification (K× cheaper signatures)": [
            "dedup_minhash_oph", "dedup_minhash_oph_sampled"
        ],
        "content-defined chunking (shift-robust shared-content ledger)": [
            "dedup_cdc_chunks"
        ],
        "MOSS winnowing fingerprints (guaranteed density, sharing audit)": [
            "text_winnowing_fingerprints"
        ],
    },
    "North-star: similarity search": {
        "brute-force cosine top-k": ["sim_topk_bruteforce"],
        "LSH-bucketed ANN": ["sim_lsh_ann"],
        "IVF-flat ANN (codebook + nprobe)": ["sim_ivf_flat"],
        "in-engine recall evaluation": ["sim_lsh_recall_eval"],
        "class prototypes (exact centroid components)": ["sim_label_centroids"],
        "nearest-centroid classification": ["sim_centroid_assign"],
        "k-NN majority-vote classification eval": ["sim_knn_classify"],
        "K-means clustering (unrolled Lloyd iterations)": ["sim_kmeans"],
        "product-quantization ANN (PQ codes + ADC lookup)": ["sim_pq_adc"],
        "two-stage retrieval (PQ candidates, exact rerank)": ["sim_pq_rerank"],
        "IVF-PQ residual quantization (coarse lists + residual ADC)": ["sim_ivfpq"],
        "SQ8 scalar quantization error readout (asymmetric search)": ["sim_sq8_error"],
        "JL random-projection dim reduction + exact distortion audit": [
            "sim_random_projection"
        ],
        "contrastive hard-negative mining (margin violations)": [
            "sim_hard_negatives"
        ],
        "ANN-family recall matrix vs exact top-k (one oracled eval)": [
            "sim_ann_recall_matrix"
        ],
        "pseudo-relevance feedback (Rocchio two-pass BM25 expansion)": [
            "sim_prf_rocchio"
        ],
    },
    "North-star: multimodal": {
        "decode / feature-extract": [
            "mm_decode_real", "mm_decode_meta", "mm_feature_extract"
        ],
        "binaryFile blob ingest": ["src_binary_files"],
        "frame sampling": ["mm_frame_sample"],
        "resize plan over real decoded dims": ["mm_resize"],
        "real BMP box-filter thumbnail (resize semantics, exact cells)": [
            "mm_thumbnail_real"
        ],
        "image sharpness gate (real-pixel gradient density)": [
            "mm_image_edge_density"
        ],
        "audio distortion gate (signed PCM16 clipping rate)": [
            "mm_audio_clipping"
        ],
    },
    "North-star: text analysis": {
        "language-ID": ["text_lang_id"],
        "quality scoring": ["text_quality"],
        "Gopher rule filter (integer-exact thresholds)": ["text_gopher_rules"],
        "CCNet LM-perplexity buckets (self-trained bigram LM)": ["text_ccnet_perplexity"],
        "per-language tokenizer fertility profile": ["text_token_fertility"],
        "token counting": ["text_tokens"],
        "fingerprinting": ["text_fingerprint"],
        "PII redaction": ["text_pii_redact"],
        "repetition signals (Gopher rules)": ["text_repetition"],
        "corpus-prep pipeline (quality→dedup→budget)": ["pipeline_corpus_prep"],
        "per-stage corpus attrition funnel (Gopher/CCNet/dedup gates)": ["pipeline_quality_funnel"],
        "TF-IDF keyword extraction": ["text_tfidf_topk"],
        "RAKE keyphrase extraction (stopword-delimited phrases)": [
            "text_keyword_rake"
        ],
        "feature hashing vectorizer (vocabulary-free, signed)": [
            "text_hashing_vectorizer"
        ],
        "cross-corpus boilerplate shingle fraction": [
            "text_boilerplate_fraction"
        ],
        "first-occurrence shingle novelty vs the archive": [
            "text_ngram_novelty"
        ],
        "corpus-health dashboard (five composed legs)": [
            "pipeline_corpus_dashboard"
        ],
        "documents→training-batch manifest (gate→dedup→tokenize→pack→shard)": [
            "pipeline_pretrain_batches"
        ],
        "chained per-stage provenance manifest (reproducibility receipt)": [
            "wf_provenance_chain"
        ],
        "streaming corpus intake (gate + cross-batch dedup ledger)": [
            "stream_corpus_ingest"
        ],
        "footer-stats clustering audit (stabbing depth per layout)": [
            "storage_clustering_audit"
        ],
        "audio landmark fingerprint matching (real WAV peaks)": [
            "mm_audio_fingerprint"
        ],
        "per-clip audio SNR quality gate": ["mm_audio_snr"],
        "real PNG codec roundtrip (zlib DEFLATE, CRC chunks, filter inverse)": [
            "mm_png_roundtrip"
        ],
        "cogrouped applyInPandas merge (both key sides in one Python fn)": [
            "udf_cogrouped_merge"
        ],
        "mSPRT always-valid sequential A/B p-values (peeking-safe)": [
            "analytic_msprt"
        ],
        "sample-ratio-mismatch guardrail (per-day unit chi-square)": [
            "analytic_srm"
        ],
        "streaming dead-letter split (dual idempotent sinks + reasons)": [
            "stream_dlq_split"
        ],
        "dead-letter replay (repair rules + conservation audit)": [
            "wf_dlq_replay"
        ],
        "IANA timezone conversion surface (tzdb-vs-ICU hash-checked)": [
            "fn_timezone_ops"
        ],
        "declared-vs-physical schema contract audit": ["dq_schema_contract"],
        "temperature (n^alpha) corpus mixing with exact integer budget": [
            "wf_mixture_temperature"
        ],
        "chat-template SFT rendering with char-offset loss-mask boundary": [
            "wf_sft_format"
        ],
        "green-list watermark detection (integer z-test, no floats)": [
            "text_watermark_detect"
        ],
        "active-learning batch selection (uncertainty + per-source caps)": [
            "wf_active_learning_select"
        ],
        "cross-split near-dup leakage audit (real split rule)": [
            "dq_split_leakage_audit"
        ],
        "DPO preference pairs from near-dup variants + quality order": [
            "wf_dpo_pair_builder"
        ],
        "train→held-out-eval pipeline (hash folds, exact histogram AUC)": [
            "pipeline_model_eval"
        ],
        "TOST equivalence testing (both one-sided Welch tests vs margin)": [
            "analytic_tost_equivalence"
        ],
        "exact Shapley channel attribution (8-coalition bitmask lattice)": [
            "analytic_shapley_attribution"
        ],
        "geometric adstock carryover + exact-moment OLS response fit": [
            "analytic_adstock"
        ],
        "event-study dynamic DiD (leads/lags + pre-trend check)": [
            "analytic_event_study"
        ],
        "sharp regression discontinuity (+ placebo falsification row)": [
            "analytic_rdd"
        ],
        "survey raking (iterative proportional fitting, 3 rounds)": [
            "analytic_raking_ipf"
        ],
        "curriculum phases by token-rarity difficulty (histogram split)": [
            "wf_curriculum_schedule"
        ],
        "group-level holdout split (whole sources share a fold)": [
            "split_group_holdout"
        ],
        "withField/dropFields nested-struct surgery": ["proj_withfield"],
        "SAX symbolization (z-normalized PAA to symbol strings)": [
            "win_sax_symbolize"
        ],
        "exponential time-decay engagement score (exact summation)": [
            "win_decay_score"
        ],
        "Zipf rank-frequency fit (corpus fingerprint)": ["text_zipf_fit"],
        "stylometric source distance (function-word chi-square)": [
            "text_stylometry_distance"
        ],
        "max-min fair token-budget allocation (closed-form waterfill)": [
            "wf_fair_share_budget"
        ],
        "exact 1-Wasserstein distribution drift": ["dq_drift_wasserstein"],
        "ensemble outlier votes (IQR + MAD + 3-sigma)": ["dq_outlier_ensemble"],
        "MOR vacuum / retention (soft-retire superseded files)": [
            "storage_vacuum_retention"
        ],
        "partition-spec evolution (coarse->fine, unified pruned read)": [
            "storage_partition_evolution"
        ],
        "footer-manifest file skipping (min/max stats planning)": [
            "storage_manifest_skipping"
        ],
        "compaction bin-packing planner (next-fit from a manifest)": [
            "wf_compaction_plan"
        ],
        "position-delete deletion vectors (no base rewrite)": [
            "storage_deletion_vectors"
        ],
        "inverted index (term → postings)": ["text_inverted_index"],
        "BM25 ranked retrieval": ["text_bm25_search"],
        "corpus n-gram vocabulary (top-k per language)": ["text_ngram_topk"],
        "token-window chunking into training sequences": ["wf_chunk_documents"],
        "per-source mixture sampling (dataset composition)": ["wf_data_mixture"],
        "DSIR importance resampling (hashed-unigram bucket LMs)": ["wf_dsir_select"],
        "unigram surprisal quality score (perplexity proxy)": ["text_surprisal"],
        "model-based quality classifier (linear, exact sigmoid)": ["text_quality_logreg"],
        "dataset-card corpus report (rollup margins)": ["dq_corpus_report"],
        "per-source duplication-rate governance report": ["dq_dup_rate_by_source"],
        "per-source near-dup participation rate (MinHash rollup)": ["dq_near_dup_rate_by_source"],
    },
    "North-star: deterministic sampling": {
        "content-hash Bernoulli sample": ["sample_hash_bernoulli"],
        "stratified (per-class rates)": ["sample_stratified"],
        "train/val/test split with checksum audit": ["split_train_test"],
        "content-hash global shuffle into N stable shards": ["wf_shuffle_shard"],
        "weighted sample w/o replacement (Efraimidis-Spirakis keys)": [
            "sample_reservoir"
        ],
    },
    "Engine: general SQL surface (beyond the reference)": {
        "outer joins": ["join_outer_left", "join_outer_full"],
        "semi/anti joins (explicit)": ["join_semi_anti"],
        "pivot / unpivot": ["agg_pivot", "proj_unpivot"],
        "positional explode": ["proj_posexplode"],
        "null-safe equality": ["filter_null_safe_eq"],
        "math / conditional fns": ["fn_math_ops", "fn_cond_case"],
        "correlated subqueries / EXISTS": ["subquery_correlated"],
        "plain-SQL front end": ["sql_frontend_report"],
        "CDC upsert (latest-wins merge)": ["wf_cdc_upsert"],
        "SCD type-2 history build": ["wf_scd2_history"],
        "IQR outlier cleaning gate": ["filter_outlier_iqr"],
        "token-budget sequence packing": ["wf_pack_sequences"],
        "constraint audit (FK / unique / domain / range)": ["dq_constraint_audit"],
        "numeric column profiling": ["dq_profile_numeric"],
        "exact Pearson correlation matrix": ["dq_correlation"],
        "skyline / Pareto frontier (bucketed two-pass)": ["analytic_skyline"],
        "market-basket association rules (support/lift)": ["analytic_market_basket"],
        "Benford first-digit audit": ["dq_benford"],
        "A/B significance test (deterministic buckets, Welch z)": ["analytic_ab_test"],
        "PSI distribution-drift monitor": ["dq_drift_psi"],
        "winsorization (percentile clipping audit)": ["filter_winsorize"],
        "snapshot diff / table reconciliation audit": ["wf_snapshot_diff"],
        "per-group OLS regression from exact moments": ["agg_linreg"],
    },
    "Engine: flagship + composite + storage": {
        "flagship 6-step traversal": ["candidate_parts"],
        "snapshot scan": ["src_parquet_scan"],
        "TPC-H shapes": [
            "tpch_q3_shipping_priority",
            "tpch_q5_local_supplier_volume",
            "tpch_q10_returned_items",
            "tpch_q12_shipmode_priority",
            "tpch_q14_promo_revenue",
            "tpch_q6_forecast_revenue",
            "tpch_q16_supplier_cnt",
            "tpch_q18_large_orders",
            "tpch_q2_min_cost_supplier",
            "tpch_q4_order_priority",
            "tpch_q7_volume_shipping",
            "tpch_q8_market_share",
            "tpch_q9_product_profit",
            "tpch_q13_customer_distribution",
            "tpch_q15_top_supplier",
            "tpch_q17_small_qty_revenue",
            "tpch_q19_disjunctive_revenue",
            "tpch_q20_promotion_suppliers",
            "tpch_q21_sole_blame_supplier",
            "tpch_q22_sales_opportunity",
        ],
        "mergeable HLL sketches (accuracy-contract oracle)": ["agg_hll_sketch"],
        "grouped pandas": ["grouped_pandas_topk"],
        "funnel / sequence analysis": ["funnel_conversion"],
        "user journey path frequencies": ["analytic_user_paths"],
        "cohort retention": ["cohort_retention"],
        "partitioned write + pruning": ["sink_parquet_partitioned"],
        "bucketed co-located join": ["join_bucketed"],
        "edit-distance PassJoin blocking": ["dedup_levenshtein_passjoin"],
        "(engine addition) dynamic partition overwrite": ["sink_dynamic_partition_overwrite"],
        "skew salting": [
            "join_salted", "join_skew_unsalted", "join_skew_salted"
        ],
        "runtime bloom-filter semi-join reduction": ["join_bloom_prefilter"],
        "mergeable theta sketches (distinct + sketch-level union)": ["agg_theta_distinct_union"],
        "portable HyperLogLog (owned hash family, SQL-reproducible registers)": ["agg_hll_portable"],
        "Spark 4 VARIANT semi-structured surface": ["fn_variant_json"],
        "ANALYZE'd catalog stats + CBO join reorder": ["catalog_stats_cbo"],
        "recursive CTE hierarchy walk (WITH RECURSIVE)": ["sql_recursive_cte"],
        "LATERAL correlated subquery": ["sql_lateral_topk"],
        "SQL pipe syntax (|>)": ["sql_pipe_syntax"],
        "mapInArrow raw RecordBatch path": ["udf_arrow_map_batches"],
        "df.observe audit metrics (no second scan)": ["dq_observed_metrics"],
        "Python DataSource batch WRITER (staged commit protocol)": ["sink_python_datasource"],
        "collation-aware comparison (UTF8_LCASE)": ["fn_collation_compare"],
        "XML serialize/parse round trip": ["fn_xml_roundtrip"],
        "URL construction + parse_url extraction": ["fn_url_parse"],
        "stream-static broadcast dim join": ["stream_static_join"],
        "bounded-state streaming dedup (withinWatermark)": ["stream_dedup_within_watermark"],
        "output-mode semantics (update vs complete, multi-batch)": [
            "stream_update_vs_complete"
        ],
        "watermark lateness timing (measured drop contract)": [
            "stream_watermark_late_drop"
        ],
        "exactly-once checkpoint recovery (file sink)": [
            "stream_checkpoint_resume"
        ],
        "chained stateful aggregations in one query (window_time)": [
            "stream_chained_aggregations"
        ],
        "ANSI try_* error-tolerant expressions": ["fn_try_arithmetic"],
        "directional as-of joins (forward / nearest)": ["join_asof_forward", "join_asof_nearest"],
        "grid-cell-blocked spatial radius join": ["geo_radius_join"],
        "radius-bounded spatial kNN": ["geo_knn_join"],
        "geohash encode + prefix-cell occupancy (integer closed form)": [
            "geo_geohash_encode"
        ],
        "HyperBall neighborhood function N(t) (exact bitsets here)": [
            "graph_neighborhood_function"
        ],
        "polymorphic UDTF (analyze-time schema)": ["udtf_analyze_parse"],
        "UDTF over TABLE(...) PARTITION BY / ORDER BY": ["udtf_table_arg"],
        "pandas UDF over a window (WindowInPandas node)": ["udf_window_pandas"],
        "Arrow-optimized plain Python UDF (useArrow)": ["udf_arrow_python"],
        "deterministic content UUIDs (v5-style minting)": [
            "fn_uuid_deterministic"
        ],
        "GROUP BY ALL / ORDER BY ALL inferred grain": ["sql_group_by_all"],
        "ExistenceJoin (projected EXISTS flag)": ["join_existence_project"],
        "null-aware anti join (NOT IN subquery, three-valued)": [
            "join_null_aware_anti"
        ],
        "FILTER (WHERE) conditioned aggregates": ["agg_filter_clause"],
        "RFC 4180 CSV dialect round trip": ["sink_csv_roundtrip_quoted"],
        "multiset INTERSECT ALL / EXCEPT ALL": ["set_ops_multiset"],
        "interval/calendar arithmetic": ["fn_interval_ops"],
        "in-engine GD training (unrolled, exact gradient sums)": ["analytic_logreg_gd"],
        "IGNORE NULLS navigation (first/nth/last over sparse signal)": ["win_nav_ignore_nulls"],
        "daily incremental-ingest pipeline (composed end-to-end)": ["pipeline_incremental_ingest"],
        "versioned COW table + time-travel reads": ["storage_time_travel"],
        "merge-on-read table (delta log + reader merge)": ["storage_merge_on_read"],
        "MOR compaction (log folded into new base)": ["storage_mor_compact"],
        "higher-order array lambdas": ["fn_lambda_ops"],
        "graph degree distribution (skew diagnosis)": ["graph_degree_histogram"],
        "label-propagation communities (deterministic sync LPA)": ["graph_label_propagation"],
        "small-file compaction": ["sink_compact_small_files"],
        "range-clustered layout (min/max skipping)": ["sink_clustered_write"],
        "Z-order 2-D clustered layout": ["sink_zorder_write"],
        "compliance hard delete (purge + rewrite + audit)": ["wf_delete_compliance"],
    },
}


def main() -> None:
    from database_scan_spark.registry import SPECS

    by_name = {s.name: s for s in SPECS}
    lines = [
        "# COVERAGE — SURVEY.md §2 operator inventory → engine queries",
        "",
        "Generated by `tools/gen_coverage.py` (validated against the live",
        "registry). **Oracle** = hash-checked against DuckDB per driver run;",
        "**rows-only** = non-SQL-expressible, weaker check by contract.",
        "",
    ]
    used: set[str] = set()
    for section, ops in SURVEY_MAP.items():
        lines += [f"## {section}", "", "| op | queries() key(s) | check |", "|---|---|---|"]
        for op, names in ops.items():
            if isinstance(names, str):
                lines.append(f"| `{op}` | — | {names} |")
                continue
            for n in names:
                if n not in by_name:
                    raise SystemExit(f"COVERAGE drift: {n!r} not in registry")
            used.update(names)
            checks = ", ".join(
                "oracle" if by_name[n].oracle else "rows-only" for n in names
            )
            keys = ", ".join(f"`{n}`" for n in names)
            lines.append(f"| `{op}` | {keys} | {checks} |")
        lines.append("")
    unmapped = sorted(set(by_name) - used)
    if unmapped:
        raise SystemExit(f"COVERAGE drift: registered but unmapped: {unmapped}")
    total = len(by_name)
    oracled = sum(1 for s in SPECS if s.oracle)
    lines += [
        f"**Totals:** {total} registered queries — {oracled} oracle-checked, "
        f"{total - oracled} rows-only.",
        "",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}: {total} queries, {oracled} oracled")


if __name__ == "__main__":
    main()

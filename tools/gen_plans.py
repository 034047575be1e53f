#!/usr/bin/env python
"""Generate PLANS.md: final (AQE-resolved) physical plans for the
flagship and representative headline queries at sf0.1, with the
scale-relevant plan features called out. Run from the repo root."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOWCASE = {
    "candidate_parts": "flagship 6-step traversal — expect broadcast joins on "
    "dim/seed sides, shuffles only for the distinct/agg steps. The score "
    "normalization is a one-row agg(max) broadcast back onto the rows: the "
    "only SinglePartition exchange left is that aggregate's partial-max "
    "reduce (≤ one row per map task), and there is NO Window operator; the "
    "part dimension is unhinted (3-column projection) so AQE picks its join "
    "strategy",
    "agg_group_sums": "TPC-H Q1 shape — expect partial+final HashAggregate "
    "around ONE exchange, filter pushed to the scan",
    "src_parquet_scan": "scan discipline — expect PushedFilters + pruned ReadSchema",
    "dedup_minhash_lsh": "LSH pipeline — signature agg exchange, bucket "
    "group-by candidates, array-intersect verification over shingles "
    "re-derived for candidate docs only (broadcast candidate list joined "
    "BEFORE the explode; no full-corpus shingle cache anywhere — "
    "memory-impossible at 100 TB and measured slower at sf0.1)",
    "join_asof": "as-of via union+window — expect ONE exchange on the key, "
    "a window sort, no join operator at all",
    "tpch_q5_local_supplier_volume": "5-table join — expect broadcast dims, "
    "AQE-selected strategy on the fact joins",
    "tpch_q21_sole_blame_supplier": "EXISTS/NOT-EXISTS chain — expect LeftSemi "
    "hash joins for all three correlations, no subquery re-execution",
    "join_bucketed": "co-located fact-fact join — at sf0.1 AQE flips the "
    "small bucketed side to broadcast (right call at this size; the ONE "
    "exchange is the final group-by). At fact-fact scale, where broadcast is "
    "impossible, the bucket layout gives an exchange-free SortMergeJoin — "
    "asserted in test_bucketed_join_has_no_exchange with broadcast disabled",
    "split_train_test": "hash-range corpus split — expect the split "
    "assignment fused into the scan stage (one codegen span, no Python), "
    "one exchange for the 3-group audit agg; the split itself is a narrow "
    "map at any scale",
    "sink_compact_small_files": "small-file compaction audit read — the "
    "checksum agg over the compacted copy; the rewrite itself is a "
    "shuffle-free coalesce (64 fragments → 2 scan-sized files)",
    "wf_cdc_upsert": "latest-wins CDC merge — expect exactly ONE exchange "
    "(the version window on the merge key); no join operator, the base is "
    "read once",
    "dedup_decontaminate": "eval-set decontamination — expect the eval "
    "shingle side on a BroadcastExchange so the corpus-side explode never "
    "shuffles; only the tiny candidate-pair agg exchanges",
    "wf_pack_sequences": "token-budget packing — expect hashpartitioning on "
    "source (never SinglePartition): per-source windows keep the packing "
    "embarrassingly parallel",
    "topk_group_agg": "aggregation-based top-k — expect partial+final "
    "HashAggregate (ObjectHashAggregate) around ONE exchange and NO Sort/"
    "Window operator: each map task ships at most k retained rows per group",
    "sample_reservoir": "weighted reservoir — expect TakeOrderedAndProject "
    "(per-task k-row heaps), never a global Sort followed by Limit",
    "agg_bitmap_distinct": "bitmap exact-distinct — expect two partial-"
    "aggregatable HashAggregates (bucket bitmaps, then popcount sum); the "
    "exchange carries constant-size bitmaps, not the key stream",
    "sim_pq_adc": "PQ-ADC search — expect the codebook and LUT on "
    "BroadcastExchanges; exchanges only for the per-(query,neighbor) sum "
    "and the two row_number windows, all keyed (no SinglePartition)",
    "dedup_substring_spans": "substring-span dedup — expect the gram "
    "explode fused into the scan stage, one exchange per gram collapse, "
    "and a shuffled equi-join on the gram (no cross join anywhere)",
    "wf_mv_incremental": "incremental MV refresh — expect the merged agg "
    "to read the materialized base from parquet (FileScan on the scratch "
    "path) plus ONLY the delta date-range scan of orders, never a second "
    "full-orders pass",
    "dedup_embedding_cosine": "ball-partition exact similarity join — "
    "expect NO CartesianProduct: centroid assignment and the C² cell-pair "
    "admissibility table are one-row-array broadcast explodes (bounded "
    "BroadcastNestedLoopJoin), candidate pairs come from hash joins on "
    "the cell key, exact cosine only on admissible-cell rows",
    "dedup_levenshtein": "edit-distance blocking — expect hash joins on "
    "the exploded length-probe key (NO BroadcastNestedLoopJoin): "
    "|Δlen|≤2 is an equi key via 5 probes per name, distance via the "
    "bounded levenshtein(…, 2) kernel",
    "dedup_incremental_minhash": "incremental dedup — expect the standing "
    "band index read back from parquet (FileScan on the minhash_index "
    "scratch path) while ONLY the ~10% batch re-derives shingles/bands; "
    "candidates from the (band_idx, sig) equi-join of batch bands vs "
    "index∪batch; exact-Jaccard verify on candidates only",
    "src_federated_union": "federated multi-format read — expect THREE "
    "FileScans (parquet, csv, orc) under one Union, the s_acctbal filter "
    "pushed into each branch independently (PushedFilters on all three)",
    "udf_grouped_agg_median": "GROUPED_AGG pandas UDF — expect "
    "AggregateInPandas (Arrow-batched, NOT BatchEvalPython) with a full "
    "shuffle of the value column: opaque Python aggregates get no "
    "map-side partials, which is exactly why this path is reserved for "
    "semantics SQL can't express",
    "join_skew_salted": "skew-mitigation demonstration (pair with "
    "join_skew_unsalted in BENCH): a synthesized 99%-hot key over a "
    "×100-replicated events fact, shuffle_hash-hinted so the strategy is "
    "plan-embedded. Measured at sf0.1 with AQE skew-split disabled "
    "(emulating the agg/window skew AQE cannot split): unsalted 12.1s — "
    "one straggler reducer drags the whole fact — vs salted 2.2s "
    "(5.5×) at the shipped ×100 replication; salting the fact key with "
    "pmod(hash, 32) and exploding the dim ×32 turns the straggler into "
    "32 parallel reducers, identical results (shared exact oracle)",
    "catalog_stats_cbo": "cost-based join reorder — the query is WRITTEN "
    "fact-first (lineitem, nation, orders, customer) but ANALYZE'd "
    "statistics must flip it: expect customer⋈nation built first and the "
    "lineitem scan joining LAST, with broadcast dims; the optimized "
    "plan's output-cardinality estimate is exactly 25 (the nation count) "
    "— proof the estimate flows from real stats, asserted in "
    "test_cbo_reorders_pathological_star",
    "agg_theta_distinct_union": "mergeable theta sketches — expect "
    "partial+final ObjectHashAggregate around ONE exchange for the "
    "per-type sketches; the 'ALL' row unions kilobyte sketches, never "
    "re-scanning events (a second COUNT DISTINCT pass would)",
    "fn_variant_json": "VARIANT extraction — expect a single Project over "
    "the scan (parse-once variant, typed-path gets), whole-stage codegen, "
    "no Python anywhere",
    "join_asof_nearest": "nearest as-of — expect exactly ONE Exchange "
    "(hashpartitioning on user_id): purchase dedup is a lag() under the "
    "same partitioning, and BOTH direction frames (last-preceding, "
    "first-following) ride the one sorted pass; a (user_id, ts)-keyed "
    "dedup window would have cost a second shuffle",
    "geo_radius_join": "spatial radius join — expect the 3×3 cell explode "
    "on the supplier side feeding an equi-join on (cx, cy); NO "
    "CartesianProduct / BroadcastNestedLoopJoin anywhere (the naive "
    "coordinate-inequality plan), exact distance filter on candidates only",
    "join_existence_project": "projected EXISTS — expect the correlation "
    "planned as an ExistenceJoin-derived hash join carrying the exists flag "
    "(first-match probe, no row duplication, no re-executed subquery)",
    "analytic_logreg_gd": "in-engine GD training — expect THREE chained "
    "two-value aggregations (partial+final HashAggregate each), the "
    "one-row weight table broadcast back onto the scan per step, and no "
    "Window/CartesianProduct: each training step moves two decimal sums, "
    "never rows",
    "graph_label_propagation": "LPA communities — expect the one fact-fact "
    "edge aggregate to dominate (broadcast dim hops), the k=1 "
    "sparsification as a single per-src top-k window, and each unrolled "
    "round as a broadcast label join + (src,label) aggregate + argmax "
    "window; no CartesianProduct",
    "text_bpe_train": "BPE merge induction — expect each round's pair "
    "count as partial+final HashAggregate over the distinct-word table, "
    "the 1-row argmax as TakeOrderedAndProject (per-task heaps, no "
    "global sort), and the merge application as a row-local project "
    "under a bounded one-row BroadcastNestedLoopJoin",
    "storage_merge_on_read": "MOR read path — expect a Union of the "
    "base+delta FileScans feeding exactly ONE Exchange "
    "(hashpartitioning on the table key) for the latest-wins window; "
    "tombstones drop AFTER the merge, never a join operator",
    "agg_countmin_sketch": "Count-Min sketch — expect the 3-cell explode "
    "fused into the lineitem scan stage, ONE exchange carrying ≤768 "
    "(j,bucket) partials (map-side combine collapses each task to "
    "sketch size), and the probe estimates via BroadcastHashJoins of "
    "the tiny sketch/truth sides",
    "agg_weighted_median": "weighted median — expect ONE exchange (the "
    "(group,price) window sort), a running-decimal cumsum, and the "
    "thresholded min-aggregate riding the same partitioning; no "
    "per-group buffering aggregate (percentile) anywhere",
    "win_twap": "time-weighted average — expect ONE exchange on user_id: "
    "the lead() window and the final per-user aggregate share the same "
    "hashpartitioning, so the groupBy adds no shuffle",
    "analytic_attribution": "multi-touch attribution — expect ONE Window "
    "operator (all three models ride a single windowed pass; the "
    "per-model fan-out is a row-local explode, not a union re-running "
    "the window), then the 9-row rollup aggregate",
    "join_dynamic_partition_pruning": "runtime partition pruning — expect "
    "a dynamicpruningexpression subquery on the fact scan's partition "
    "column (c_nationkey), fed by the region-filtered dim broadcast: "
    "only the 5 matching nation directories are listed and read",
    "sim_topk_filtered": "filtered vector search — expect the label "
    "equi-condition INSIDE the broadcast hash join (pre-filter: "
    "distances computed on matching rows only), then the per-query "
    "rank window; no post-filter of an unfiltered top-k",
    "dedup_semdedup": "SemDeDup — expect centroid assignment as a "
    "one-row-array broadcast explode (bounded BroadcastNestedLoopJoin, "
    "no CartesianProduct), the intra-cluster pair check as a HASH join "
    "on the cluster id (per-cluster pair spaces only), and the final "
    "kept flag as a left join against the distinct dropped set",
    "mm_phash_pairs": "perceptual-hash image near-dup — expect the BMP "
    "decode+aHash as ONE ArrowEvalPython/MapInPandas over the scan "
    "(blobs never shuffle), candidates from the (band_idx, band_byte) "
    "equi self-join with the full 64-bit hash carried on each band "
    "row, exact Hamming as bit_count(xor) computed and filtered IN "
    "the join's stage (nothing shuffles at candidate volume), and the "
    "pair-dedup exchange fed only by rows already inside the distance "
    "threshold; no CartesianProduct",
    "win_cusum": "CUSUM monitor — expect the day rollup as ONE exchange "
    "with map-side combine, per-priority stats as broadcast joins, and "
    "ALL cumulative windows sharing one hashpartitioning(priority) "
    "sort; never a SinglePartition window",
    "analytic_ks_test": "exact two-sample KS — expect the dense ECDF as "
    "a broadcast of the 5-row segment table against the distinct-value "
    "relation, cumulative windows partitioned by segment, and the "
    "pair-max as an equi join on the support value feeding one "
    "hash aggregate; integers end to end",
    "wf_k_anonymity": "k-anonymity ladder — expect broadcast dim joins "
    "into the record scan, each ladder rung as partial+final "
    "HashAggregate on its QI key, and the violating-class re-join as a "
    "LeftSemi hash join on the same key; records are scanned once",
    "sample_stratified_neyman": "Neyman allocation — expect the moment "
    "aggregation with map-side combine, the stratum-weight total as a "
    "one-row agg broadcast back (no global window), and membership as "
    "a per-stratum rank window under hashpartitioning(stratum)",
    "analytic_spearman": "rank correlation without a global sort — expect "
    "ONE partial+final HashAggregate over the fact building the joint "
    "histogram, rank dims as windows over the tiny value relations "
    "joined back by BROADCAST, and a single-row moment aggregate; the "
    "fact is never sorted",
    "graph_kcore": "bounded k-core peel — expect the ONE distinct "
    "aggregation building the edge dictionary, then per-round "
    "HashAggregate degree counts and BroadcastHashJoin LeftSemi "
    "survivor filters over the persisted edge relation",
    "dedup_fellegi_sunter": "blocked linkage scoring — expect the pair "
    "generator as an equi join on (brand, size) with the key-order "
    "predicate as a join filter (NO nested-loop over the full table), "
    "u-statistics as one-row aggregates broadcast into the scoring "
    "projection, and the 8-row pattern rollup as a tiny final agg",
    "text_keyword_rake": "RAKE — expect per-document phrase windows under "
    "hashpartitioning(doc_id) (no single-partition exchange), corpus "
    "word stats as hash aggregates with map-side combine, and the "
    "top-3 rank window again partitioned by doc",
    "sim_rrf_fusion": "hybrid fusion — expect each retrieval leg to end "
    "in TakeOrderedAndProject (pool of 20, no global sort), rank "
    "windows over the 20-row pools, and the fusion as a tiny "
    "full-outer join feeding TakeOrdered",
    "text_boilerplate_fraction": "boilerplate shingles — expect the "
    "shingle explode fused into the scan stage, document-frequency as "
    "partial+final HashAggregate on the shingle key, and the score "
    "join as a shuffled hash/sort-merge join on shingle (dictionary "
    "outgrows broadcast at corpus scale), then one per-doc aggregate",
    "sim_corpus_overlap": "corpus overlap matrix — expect the 64-min "
    "signature as ONE partial+final HashAggregate on source (map-side "
    "combine does the heavy lifting), then a broadcast self-join of the "
    "tiny signature table; the documents scan is touched exactly once",
    "join_pit_features": "point-in-time N-feature join — expect ONE "
    "exchange (the user window), a single window sort carrying all three "
    "feature columns, and NO join operator at all: the union+window "
    "generalization of join_asof to N features",
    "sim_ivfpq": "IVF-PQ — expect centroid table and residual codebook on "
    "BroadcastExchanges, the corpus touched twice (assign, encode) with "
    "narrow stages, candidate generation keyed on centroid_id then "
    "(m, code); no cross join outside the 8-row broadcast centroid rank",
    "graph_scc": "SCC closure — expect per-iteration broadcast joins on "
    "the sparsified edge list (the fact-table edge aggregation is the "
    "only heavy stage), localCheckpoints truncating lineage so the "
    "fixpoint loop's plans stay constant-size",
    "storage_partition_evolution": "partition-spec evolution — expect "
    "BOTH scans to carry PartitionFilters in their own scheme (d on v1; "
    "d AND event_type on v2) with the residual event_type predicate "
    "pushed as a data filter on v1 only",
    "storage_manifest_skipping": "footer-manifest skipping — expect the "
    "scan's file list to be the PRE-SELECTED subset (planner reads "
    "footers only), the shipdate predicate still pushed to the scan as "
    "defense in depth, one exchange for the final group-by",
    "sim_sq8_error": "SQ8 quantization eval — expect the per-dim min/max "
    "as ONE partial+final aggregate broadcast back onto the corpus, the "
    "reconstruction as a pure codegen transform, and the scoring join as "
    "broadcast(queries) over one corpus scan (the exact-baseline shape)",
    "storage_deletion_vectors": "deletion vectors — expect the live view "
    "as a LeftAnti hash join on (file_id, pos) between the partitioned "
    "base scan and the tiny vector sidecar; no rewrite anywhere",
    "win_decay_score": "decay score — expect the exp() term fused into "
    "the scan stage and ONE partial+final DECIMAL-sum aggregate (the "
    "rounding-then-decimal discipline keeps partial aggregation exact)",
    "dedup_jaro_winkler": "JW linkage — expect the dictionary-sized "
    "blocked equi-join on (tok1, length-band) and ArrowEvalPython (never "
    "BatchEvalPython) for the scoring UDF over candidate pairs only",
    "wf_curriculum_schedule": "curriculum phases — expect the vocabulary "
    "count and token→rarity equi-joins as hash shuffles, the cumulative "
    "phase split as a Window over the HISTOGRAM-sized bucket relation "
    "only, and the bucket→phase map re-joined as a BroadcastHashJoin "
    "(never a global row sort of the corpus)",
    "sim_random_projection": "JL projection — expect a single Project "
    "over the scan: no exchange, no aggregate, no Python boundary; the "
    "16 fixed-order dot-product folds all live in one WholeStageCodegen "
    "span",
    "mm_thumbnail_real": "real thumbnail — expect exactly one MapInPandas "
    "(Arrow) boundary over the blob table and nothing downstream of it; "
    "cell reduction happens inside the batch fn, not a JVM shuffle",
    # round-3 additions
    "text_gopher_rules": "Gopher rule gate — expect ZERO exchanges: one "
    "scan, one WholeStageCodegen span; every threshold is an integer "
    "cross-multiplication so the whole filter is a narrow projection",
    "wf_dsir_select": "DSIR selection — expect the bucket-weight table "
    "(256 rows) joined as BroadcastHashJoin onto the exploded tokens, two "
    "hash-aggs on corpus-keyed exchanges (bucket, doc_id), and the final "
    "top-K window over the doc-level score table only",
    "agg_hll_portable": "portable HLL — expect two HashAggregates (max-per-"
    "register, then register fold) with map-side partials; the shuffle "
    "carries at most 256 register rows per group; no Window, no sort",
    "dq_dup_rate_by_source": "dup-rate governance rollup — expect the "
    "group-by-text cluster agg plus one source rollup; at 100 TB the "
    "group key becomes the 16-byte fingerprint (documented)",
    "mm_resize": "resize planning over real decode — expect one MapInPandas "
    "(Arrow) boundary (the codec), then pure column arithmetic; the blob "
    "column never reaches an exchange",
    "agg_histogram_equidepth": "distributed exact NTILE via global_order "
    "(r5) — expect NO unpartitioned Window over the fact: a one-row "
    "percentile_approx boundary aggregate broadcast back, a window "
    "PARTITIONED by the range-bucket id, a tiny bucket-offsets window "
    "(<=64 rows), and a broadcast offsets join; the only SinglePartition "
    "work is the boundary/offset reductions",
    "analytic_auc": "exact Mann-Whitney AUC (r6 retrofit) — the per-score "
    "cumulative now runs through global_order, so the value-dictionary "
    "window is PARTITIONED by range-bucket id; expect one hash aggregation "
    "building the score histogram, the kernel's bounded offsets pass, and "
    "a final one-row reduce; no window whose single task holds the whole "
    "score dictionary",
    "dq_drift_wasserstein": "exact 1-Wasserstein drift (r6 retrofit) — the "
    "value-dictionary cumsum AND rank come from global_order (bucketed "
    "parallel windows + broadcast offsets) and the step gap is a self "
    "equi-join on rank+1 (hash join) instead of lead(): expect NO "
    "unpartitioned Window over the value dictionary — the only "
    "unpartitioned window left is the kernel's bounded <=n_buckets "
    "offsets pass — and no single task proportional to the price domain",
    "text_watermark_detect": "green-list watermark z-test (r8 rewrite) — "
    "the per-doc green count is a higher-order aggregate over the token "
    "array, so the grouping key is the row itself: expect ZERO shuffle "
    "exchanges (budget ratcheted 1→0), one codegen span from scan to "
    "projection, and the only exchange in sight the round-robin spread "
    "of the small-file scan; at 100 TB the plan is embarrassingly "
    "parallel",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from database_scan_spark.registry import SPECS
    from database_scan_spark.session import get_spark

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    by_name = {s.name: s for s in SPECS}

    lines = [
        "# PLANS — final physical plans (AQE-resolved) at sf0.1",
        "",
        "Generated by `tools/gen_plans.py`. Each plan is captured AFTER",
        "execution so AdaptiveSparkPlan shows the runtime-chosen strategy",
        "(`isFinalPlan=true`); `*(n)` prefixes mark whole-stage-codegen spans.",
        "",
    ]
    for name, note in SHOWCASE.items():
        df = by_name[name].fn(spark, sf_dir)
        df.collect()  # execute THIS queryExecution so AQE finalizes it
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
        # strip plan ids / locations for readability
        plan = re.sub(r", \[plan_id=\d+\]", "", plan)
        plan = re.sub(r"#\d+[L]?", "", plan)
        # count distinct plan nodes (AQE final plans repeat cached
        # subtrees textually; dedupe identical lines first)
        uniq = set(line.strip(" :+-") for line in plan.splitlines())
        n_shuffle = sum(1 for line in uniq if line.startswith("Exchange hashpartitioning"))
        n_bhj = sum(1 for line in uniq if line.startswith("BroadcastHashJoin"))
        n_smj = sum(1 for line in uniq if line.startswith("SortMergeJoin"))
        lines += [
            f"## {name}",
            "",
            f"_{note}_",
            "",
            f"distinct shuffle exchanges: {n_shuffle} · broadcast joins: {n_bhj} · sort-merge joins: {n_smj}",
            "",
            "```",
            plan.strip()[:4000],
            "```",
            "",
        ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

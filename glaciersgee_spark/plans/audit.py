"""Generate PLANS.md — the plan-shape audit for headline queries.

Usage: python -m glaciersgee_spark.plans.audit [sf_dir] [out_md]

For each headline query this records what the 100 TB discipline
demands be true of the physical plan (pushed filters, read schemas,
shuffle count, codegen spans, Python boundaries) as measured by
plans.inspect — the same probes tests/test_plans.py asserts on. The
artifact exists so a reviewer can see the plan posture without
re-running anything.
"""

from __future__ import annotations

import sys

from glaciersgee_spark.plans import inspect as PI

# (query name, the one-line claim the plan must support)
HEADLINERS = [
    ("q_b_scan_parquet", "filters + projection reach the parquet scan"),
    ("q_b_agg_hash", "partial+final hash agg, pure JVM (shuffles: fan_out + agg + final sort)"),
    ("q_b_join_inner", "dim side broadcasts; no shuffle of the fact"),
    ("q_b_join_bucketed", "bucketed layout ⇒ no join exchange"),
    ("q_b_join_dpp", "dim filter prunes fact partitions at runtime"),
    ("q_b_join_salted", "hot keys spread over salt replicas"),
    ("q_b_topk_pergroup", "rank-filter window, no global sort"),
    ("q_b_grouping_sets", "rollup re-aggregates 6 partials, no ×3 Expand of the fact"),
    ("q_a_trend_slope", "two narrow aggregations, exact int sums"),
    ("q_e_dedup_near_md5", "LSH bands ⇒ equi-join, no O(n²) stage"),
    ("q_e_dedup_near", "8×2 high-recall banding (16 minhashes): same equi-join shape, larger verify set"),
    ("q_e_ann_recall", "persisted banding + ground-truth panel reused; Arrow kernel is the only Python boundary"),
    ("q_e_ivf_recall", "persisted cell assignment + shared exact ground truth"),
    ("q_e_dedup_cluster", "iterative min-label joins, JVM-only, localCheckpoint-bounded lineage"),
    ("q_e_curation_funnel", "consumes the persisted near-dup pair set; broadcast loser join; one COUNT-FILTER pass"),
    ("q_e_dedup_simhash", "48 map-side-combined bit votes, one agg shuffle, bit_count verify"),
    ("q_e_sim_topk", "broadcast query, Arrow-batched scoring, TakeOrdered k"),
    ("q_e_stratified_sample", "pure scan-side filter, zero shuffles"),
    ("q_e_doc_chunk", "executor-side expansion, zero shuffles"),
    ("q_e_bm25", "pre-filtered explode, broadcast df/avgdl scalars"),
    ("q_f_pandas_grouped_agg", "single shuffle, Arrow boundary only at the agg"),
    ("q_e_window_dedup", "scan-side window-hash expansion; shared-set is an aggregate, never a pair join; broadcast back"),
    ("q_e_kmeans_iter", "broadcast K-row centroid join; (cell, dim) update is map-side-combinable"),
    ("q_e_vocab_coverage", "top-K vocab broadcasts against the token stream; rollups partial-aggregate"),
    ("q_e_quality_classifier", "pure scan-side codegen features, zero shuffles"),
    ("q_b_join_nullsafe", "EqualNullSafe stays a hash-join key (no nested loop)"),
    ("q_b_join_lateral", "correlated LATERAL decorrelates to window-rank + hash join"),
    ("q_b_agg_argmax", "max_by/min_by carry O(1) state; single map-side-combinable agg"),
    ("q_b_funnel", "three co-partitioned stage joins on one shuffle key"),
    ("q_e_lsh_tuning", "one shared signature base; three banding expansions, no O(n²) stage"),
    ("q_e_semdedup", "cell-scoped self-join — O(Σ|cell|²), never all-pairs"),
    ("q_e_mm_shard_manifest", "prefix-sum window + rollup share the language partitioning"),
    ("q_e_span_dedup", "cross-doc shingle index = aggregate + key join; no pair expansion"),
    ("q_e_winnow", "bounded ≤4× membership explode; min/argmin share (doc_id) partitioning"),
    ("q_e_ngram_novelty", "first-seen index shuffle + co-partitioned join back; JVM only"),
    ("q_e_embed_gram", "Python boundary BEFORE the shuffle: only 64×64 partials cross"),
    ("q_b_snapshot_diff", "one full-outer hash join classifies every row; integer-cents math"),
    ("q_b_scd2", "stacked windows + run agg reuse ONE (user_id) exchange"),
    ("q_a_bbox_contains", "grid-cell broadcast equi-join + BETWEEN refine; never a nested-loop theta join"),
    ("q_a_bbox_overlap", "grid join with PBSM claim-cell dedup — exact pairs with no distinct stage"),
    ("q_b_compaction_plan", "two-phase prefix sum: per-chunk windows parallel; SinglePartition only over chunk totals"),
    ("q_e_char_entropy", "27 scan-side replace() counts + integer entropy fold; one rollup shuffle"),
    ("q_e_gopher_rules", "TF shuffle + two combinable rollups; rules are pure codegen"),
    ("q_e_jaccard_verify", "spill-safe posting self-join over the persisted shingle base (round 3)"),
    ("q_a_polygon_contains", "bbox-cell grid join + integer sign-test refine; no nested loop"),
    ("q_b_time_travel", "one (as_of, key) window shuffle reused by the rollup; versions broadcast"),
    ("q_b_histogram", "one scan: codegen bins + ONE array-percentile broadcast back"),
    ("q_e_ivf_pq", "probe-filtered scan; ADC Arrow kernel is the only Python boundary"),
    ("q_e_hubness", "cell-scoped pair scoring; in-degree rides the same keys"),
    ("q_e_bigram_lm", "doc-co-partitioned positional self-join; broadcast vocab ×2"),
    ("q_b_rolling_distinct", "round-4 rewrite: 7-day explode + per-day countDistinct — NO window operator"),
    ("q_b_hll_rolling", "per-day HLL sketches union-merged per anchor; only sketches shuffle"),
    ("q_b_bitmap_distinct", "bucketed bitmap partials, OR-merged global reach; ids never leave the map side"),
    ("q_b_sort", "round-4 rewrite: two-phase chunked global rank; offsets broadcast back"),
    ("q_e_zipf_slope", "round-4 rewrite: distributed TakeOrdered top-1000, re-rank after the cut"),
    ("q_e_fuzzy_vocab", "symmetric-delete blocking: variant-key equi-join + levenshtein verify"),
    ("q_e_cc_stars", "star-contraction round: min-aggregates + join, no driver convergence action"),
    ("q_d_lateness_audit", "round-5 rewrite: two-phase chunked prefix max — per-hour windows parallel, SinglePartition only over chunk maxima"),
    ("q_e_graph_triangles", "round-5 rewrite: (degree, id)-oriented wedges — hub out-degree 0, O(√E) bound"),
    ("q_b_join_bloom", "8 KiB bit_or bloom word table broadcast-probes the fact before the exact join"),
    ("q_b_countmin_freq", "768-counter CM sketch: map-side combinable build, broadcast probe, MIN fold"),
    ("q_e_feature_hashing", "one explode + one combinable groupBy; both COUNT(DISTINCT) share one Expand"),
    ("q_e_retrieval_ndcg", "shared banding/panel caches; integer nano-unit DCG sums, one quantized division"),
    ("q_b_join_cardest", "md5 key gate in both scan stages; sampled join shuffles ~p of the real join"),
    ("q_b_scan_binary", "whole-file binaryFile rows; JVM-side md5 digest per shard"),
    ("q_b_scan_pysource", "custom Python source: 4 declared InputPartitions feed a combinable aggregate"),
    ("q_e_weighted_sample", "two-phase chunked prefix sum; BIGINT threshold test, no RNG"),
    ("q_e_dpo_pairs", "composite-encoded argmax/argmin: one combinable groupBy, no per-group window"),
    ("q_e_minhash_union", "per-source 16-slot MIN merge; exact companion is the posting-pair shape"),
    ("q_e_quality_calibration", "scan-side score+gold; 10-bin combinable rollup + 1-row ECE broadcast"),
    ("q_b_skyline", "exact prefix-max skyline: per-price group max + chunked strictly-cheaper prefix max; NO quadratic stage (r6 rewrite)"),
    ("q_b_join_interval", "7-day grid equi-join; responsibility bucket emits each pair once"),
    ("q_e_knn_classify", "panel broadcast × Arrow cosine; per-query window; combinable vote"),
    ("q_e_mmr_diversify", "corpus stage is TakeOrdered top-20; greedy runs on the bounded panel"),
    ("q_a_geohash", "pure div/mod interleave in scan-side codegen; one combinable rollup"),
    ("q_f_pandas_window", "Arrow window UDF: one user_id shuffle, O(frame) state per row"),
    ("q_e_bloom_dedup", "32-row bit_or sketch broadcast; no distinct over the catalog"),
    ("q_a_nearest_aoi", "argmin over a literal center array in codegen; no join, no expansion"),
    ("q_e_gini_mass", "one lang-partitioned rank window into a combinable agg; exact BIGINT sums"),
    ("q_e_tail_index", "two-phase sharded per-group top-k; pruned frame persisted across branches (r6)"),
    ("q_e_length_ks", "corpus collapses to the (source, length) support once, persisted; windows run over support rows only (r6)"),
    ("q_e_dsir_weights", "both LMs from ONE token-explode groupBy; log-ratio table broadcast; per-doc frame persisted (r6)"),
    ("q_b_runlength", "gaps-and-islands with user-partitioned windows only; no global window (r6)"),
    ("q_e_span_mass", "shared-hash set broadcast; only duplicated windows explode x8 positions (r6)"),
    ("q_e_rrf_fusion", "round-7 rewrite: both full-list ranks ride the two-phase chunked rank (bucket-partitioned windows + broadcast offsets); top-25 is TakeOrdered"),
    ("q_e_sparse_knn", "df-capped shingle postings: the HAVING filter prunes features BEFORE the pair join; per-doc top-k window (r7)"),
    ("q_e_quality_auc", "corpus collapses to per-score counts (bounded by the 6-dp domain) before the prefix sum; one closing 1-row fold (r7)"),
    ("q_e_heaps_law", "pure scan-side codegen points into ONE map-side-combinable 1-row OLS aggregate; no window, no wide shuffle (r7)"),
    ("q_e_chi2_terms", "presence distinct + combinable cell counts; marginals broadcast; per-lang top-k window over the cell frame (r7)"),
    ("q_e_spectral_mass", "one persisted integer-Gram kernel feeds three dimension-frame branches; Python boundary before the shuffle (r7)"),
    ("q_e_kmeans_train", "3 bounded Lloyd rounds: broadcast centroid panels, combinable per-dim means, 512-row round frames persisted (r7)"),
    ("q_e_rank_biased_overlap", "both lists depth-capped by TakeOrdered before ANY join; all downstream work is 25-row arithmetic (r7)"),
    ("q_b_scan_pysource_filters", "pushFilters three-way split: scene_id bounds prune splits, day IN filters at generation, cloud_pct stays a Spark residual (r8)"),
    ("q_e_ivf_persist", "serve path reads the persisted codebook+postings parquet — no training lineage, no LocalTableScan; probe is a broadcast K-row rank (r8)"),
    ("q_e_bpe_train", "one corpus token-count shuffle total; each merge round is a narrow pair explode + combinable groupBy over |word types| rows (r8)"),
    ("q_e_bpe_fertility", "cached merge trace applied as 5 literal replaces on the |word types| frame; one token-count shuffle + one combinable rollup (r8)"),
    ("q_b_sql_pipe", "|> chain is pure syntax: shipdate filter pushed to the scan, plan-equal to the standard-SQL twin (r8)"),
    ("q_f_group_arrow", "applyInArrow whole-group boundary: one lang shuffle, zero pandas conversion (r8)"),
    ("q_e_cluster_ari", "two shared broadcast-panel assignments into a K×K combinable contingency; exact BIGINT pair sums (r8)"),
    ("q_b_kmv_intersect", "bottom-k sides are TakeOrderedAndProject (partial top-k, k-row merge); sketch joins ≤64-row broadcasts (r8)"),
    ("q_e_dedup_blocking", "two-phase chunked sort-order rank + rank+d equi-join: candidates structurally w·n, never O(n²) (r8)"),
    ("q_e_jl_distortion", "vec_id<48 panel filter pushed to the scan; 1,024-row sign matrix broadcasts; exact INT64 distances (r8)"),
    ("q_e_whiten_diag", "combinable per-dim integer moments; 64-element (μ,σ) arrays ride a 1-row broadcast back onto the corpus (r8)"),
    ("q_e_conformal_gate", "k-th order statistic from per-score counts + chunk-partitioned prefix sums; no global sort anywhere (r8)"),
    ("q_e_bt_strength", "one corpus pass into the ≤C(20,2) win matrix; MM rounds driver-side on the bounded panel (mmr precedent) (r8)"),
    ("q_e_t_closeness", "exact-DECIMAL TV numerator; absent-value mass folds algebraically — no outer join over the global support (r8)"),
    ("q_b_join_hinted", "hint(shuffle_hash) forces ShuffledHashJoin over the planner's broadcast choice — the manual-override surface, plan-pinned (r8)"),
    ("q_e_matryoshka_recall", "corpus × 5-query broadcast with three inline prefix-cosine folds; rank is the family's qid-partitioned window (r8)"),
    ("q_e_winsorize", "both tail thresholds from ONE per-value count frame via chunked prefix sums + combinable MIN; no global sort (r8)"),
    ("q_e_self_bleu", "panel pruned at the scan; df>=2 groupBy replaces the O(panel²) reference join (r8)"),
    ("q_e_pr_auc", "shares the ROC op's per-score frame; descending prefix sums over the bounded 6-dp domain (r8)"),
    ("q_e_aes_sample", "keyed weighted sample: ORDER BY/LIMIT spells as TakeOrderedAndProject — per-partition top-k, k-row merge (r8)"),
    ("q_a_solar_time", "exact integer-second solar offsets in scan-side codegen; one combinable 24-bucket aggregate (r8)"),
    ("q_e_wasserstein", "rides the persisted KS (source, length) base — one corpus scan for both drift audits; support windows over the bounded length domain (r8)"),
    ("q_e_poisson_boot", "64x replicate fan-out partial-aggregates map-side; shuffle carries |sources|*64 partial rows; 64-row panels rank via sort_array (r8)"),
    ("q_b_assoc_rules", "basket DISTINCT is the only corpus shuffle; item supports + user total broadcast onto the |types|^2 pair frame (r8)"),
    ("q_e_cusum_drift", "combinable day rollup collapses the corpus; both CUSUM windows run over the bounded day domain; moments broadcast (r8)"),
    ("q_e_burrows_delta", "top-30 vocab via TakeOrderedAndProject; every post-TF frame is |sources|x30 behind broadcasts (r8)"),
    ("q_e_threshold_sweep", "9-row grid theta-join over the bounded per-score frame; positives total is a 1-row broadcast (r8)"),
    ("q_e_linear_fusion", "score-based fusion with NO rank window: min/max ride 1-row broadcasts, top-25 is TakeOrderedAndProject (r8)"),
    ("q_e_exposure_share", "top-100 cut is TakeOrderedAndProject FIRST; rank window runs over the bounded 100-row frame (r8)"),
    ("q_e_mann_kendall", "combinable day rollup; sign-pair join and tie scan over the bounded day domain; 1-row broadcasts (r8)"),
    ("q_b_survival_km", "per-user rollup collapses the corpus; KM risk sets via prefix sums over the bounded duration domain (r8)"),
    ("q_a_zonal_stats", "reduceRegions: grid-cell broadcast containment join + ONE combinable per-zone moment rollup (r8)"),
    ("q_a_band_math", "NDVI + QA mask + monthly composite: pure scan-side codegen into one combinable rollup; zero joins (r8)"),
    ("q_b_sql_params", "named sql() parameters constant-fold; both predicates reach the scan as pushed filters (r8)"),
    ("q_f_udtf_arrow", "useArrow UDTF: ArrowEvalPythonUDTF boundary, scan-side filter below it (r8)"),
    ("q_b_dist_moments", "four exact power sums in ONE combinable groupBy; five numbers per group cross the shuffle (r8)"),
    ("q_e_blocklist_score", "hit count is a higher-order array lambda on the scan — no Generate, no Python; one combinable rollup (r8)"),
    ("q_e_domain_cap", "ONE host-key shuffle; rank window partitioned BY HOST so every partition is one domain's docs (r8)"),
    ("q_e_perplexity", "held/train halves collapse to vocab^2 pair-count frames; co-partitioned pair join, unigram broadcast x2 (r8)"),
    ("q_e_pack_audit", "per-source two-phase prefix sum: per-chunk windows parallel, global pass over chunk totals only (r8)"),
    ("q_b_cache_table", "second read serves the dim from the columnar In-memory table, not parquet (r8)"),
    ("q_e_logreg_train", "3 GD rounds = 3 combinable aggregates over the persisted feature frame; driver holds 6 doubles per round (r8)"),
    ("q_b_ab_test", "one combinable groupBy(event_type, variant); Welch/SRM close on the bounded arm frame (r8)"),
    ("q_e_kn_bigram", "one (source, prev, cur) count shuffle; five vocab-bounded derived tables, bigram frame persisted app-scoped (r8)"),
    ("q_b_retention_cohort", "log collapses to distinct (user, week); firsts-weekly join co-partitioned on user_id; origin is a 1-row broadcast (r8)"),
    ("q_b_time_weighted_avg", "one lead() window over bounded (type, day) slices; exact BIGINT microsecond weights (r8)"),
    ("q_b_purge_audit", "left + anti + semi manifest joins; manifest never collected, AQE picks broadcast (r8)"),
    ("q_e_ivfpq_persist", "FAISS IVFADC serve: 4 artifact scans, codes-only ADC scoring in pure JVM; only Python is the bounded probe panel (r9)"),
    ("q_b_join_skew_aqe", "zero-rewrite skew handling: AQE flags + splits the 75%-hot partition at runtime (skew=true pinned on the executed plan) (r9)"),
    ("q_b_attribution", "touch join co-partitioned on user_id with a 7-day interval predicate — per-user fan-out only; both ranks + both rollups ride one (p_id) frame (r9)"),
    ("q_e_pq_residual", "residual-PQ encode: one Arrow pass with the 16-row codebook as literals; ADC scoring reads 8-byte codes only (r9)"),
    ("q_e_div_frontier", "ONE shared broadcast-panel assignment collapses both halves into an 8x2 count table; the frontier is constant-size arithmetic (r9)"),
    ("q_a_glacier_trend", "NDSI classify in scan-side codegen (zero joins/UDFs); combinable (region, year) rollup; OLS over the bounded frame (r9)"),
    ("q_b_sink_pywriter", "Python DataSource writer: executors stage shards, driver commit() publishes atomically; read-back aggregate is one combinable rollup (r9)"),
    ("q_e_ivfpq_recall", "approx list served from the 4 read-back artifacts; exact list is the brute-force panel kernel; overlap joins two 10-row frames (r9)"),
    ("q_b_sessionize", "gaps-and-islands: lag + running-start-count + session rollup all ride ONE user_id shuffle (r9)"),
    ("q_b_cdc_apply", "changelog replay: one key shuffle, row_number + per-key count share the single window sort, no self-join (r9)"),
    ("q_e_dedup_edit", "blocked Levenshtein: ONE (lang,bkey) window pass emits all W successors as an array — no per-offset union branches (r9)"),
    ("q_b_incr_view", "base/delta partials merge on the view key; full-recompute audit joins broadcast; fact scanned once per partial (r9)"),
    ("q_b_listagg", "pre-distincted (brand,type) domain feeds listagg; counts ride a separate combinable rollup (r9)"),
    ("q_e_curriculum", "scan-side integer grading; per-stratum rank windows (4 bounded partitions); interleaved head via TakeOrderedAndProject; pos window on the 48-row panel only (r9)"),
    ("q_e_ivfpq_append", "merged-generation serve: four artifact scans only (no training lineage); ADC stage pure JVM, one Arrow boundary (the probe panel) (r10)"),
    ("q_e_ivfpq_drift", "both approx sides are persisted serves; exact side the shared panel Arrow pass; hit joins on (qid, vec_id) (r10)"),
    ("q_a_harmonize_ols", "daily-mean rollup combinable; (tile,day,band) co-partitioned pair join; fit broadcasts back; zero windows (r10)"),
    ("q_e_graph_beam_search", "one-time in-cell edge build + scoped persist; 3 hop stages over corpus-size-independent frontiers (r10)"),
    ("q_b_match_recognize", "CEP pattern as window-free staged conditional mins, single user_id shuffle key (r10)"),
    ("q_e_score_knee", "chunked prefix sums per (lang, score DIV 256); argmax window on the distinct-score domain (r10)"),
    ("q_b_bitemporal_asof", "both time axes scan-side date codegen; ONE combinable rollup, no join, no window (r10)"),
    ("q_b_pop_calendar", "day-grain frame only: lag window and day-1 self-join both ride the calendar, not the corpus (r10)"),
    ("q_e_quota_spill", "one combinable per-source rollup; k-row window + broadcast pools close the plan (r10)"),
    ("q_e_filter_cascade", "both gates scan-side codegen in ONE pass; single combinable rollup (r10)"),
    ("q_e_beam_persist", "serve reads only the persisted edge artifact + panel scores; no pair-expansion lineage (r10)"),
    ("q_e_beam_recall", "approx side IS the persisted beam serve; exact side the shared panel pass (r10)"),
    ("q_e_beam_append", "merged-generation serve: edge scans point at _gm1 only; frozen-cell ingest pairs score only affected cells (r11)"),
    ("q_e_beam_drift", "both approx sides are persisted beam serves; exact side the shared panel pass; hit joins on (qid, vec_id) (r11)"),
    ("q_e_retrain_policy", "k-row decision frame: drift audits + one combinable count + merged-postings artifact read; broadcast-joined closers (r11)"),
    ("q_e_dbscan_core", "cid-keyed pair join (never O(n²)); one count rollup; border via slim semi-join against the core set (r11)"),
    ("q_e_label_prop", "shared in-cell kNN edges (scoped persist); one (vec,label) vote rollup; k²-row transition census (r11)"),
    ("q_a_hypsometry", "one combinable (glacier,band) rollup carrying area+AAR counts; windows over the band domain only (r11)"),
    ("q_b_interval_sweep", "one (user,day) min/max rollup; day-partitioned sweep over boundary rows; peak via self-equi-join, no second window (r11)"),
    ("q_e_sampling_temperature", "per-source rollup; powered masses 6-dp BIGINT before exact normalizing sums; one broadcast totals row (r11)"),
    ("q_e_dawid_skene", "one scan for votes+majority; one combinable confusion rollup broadcast to the ≤8-row decision table (r11)"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_md = sys.argv[2] if len(sys.argv) > 2 else "PLANS.md"
    sys.path.insert(0, ".")
    from __spark_entry__ import queries
    from glaciersgee_spark.session import get_spark

    spark = get_spark("plan-audit")
    qs = queries()
    lines = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        f"Generated by `python -m glaciersgee_spark.plans.audit {sf_dir}`.",
        "Probes are the same ones tests/test_plans.py asserts; regenerate",
        "after changing any of these operators.",
        "",
    ]
    for name, claim in HEADLINERS:
        df = qs[name](spark, sf_dir)
        lines += [f"## {name}", "", f"*Claim:* {claim}", "", "```"]
        lines += [PI.plan_report(df), "```", ""]
    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_md} ({len(HEADLINERS)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()

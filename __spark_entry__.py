"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over glaciersgee_spark: ``entry`` runs the flagship
pricing-summary query; ``queries``/``oracle_sql`` re-export the
registry populated by the operator modules (SURVEY.md §2 inventory).

Dict ordering: the driver's CORRECTNESS pass covers only the first ~50
entries of queries() in iteration order, so each round the queries with
the least driver-side evidence are rotated to the front. Round-3
rotation (from CORRECTNESS_r01+r02): first the 5 round-2 red rows
(HUGEINT-oracle bug, all fixed this round), then the 12 sibling
oracles that carried the same latent bug (also fixed), then every
never-driver-checked op, with the 93 driver-verified ops at the back.
Local parity (tests/run_parity.py) covers the full inventory at sf0.01
AND sf0.1 every round regardless of the driver cap (the registry
itself is the count of record).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TypeVar

from pyspark.sql import DataFrame, SparkSession

import glaciersgee_spark

# Verified by the driver in round 1 or 2 (CORRECTNESS_r0{1,2}.json:
# rows+schema+hash all true) — lowest re-check priority.
_DRIVER_VERIFIED = {
    "q_a_best_per_group", "q_a_composite_agg", "q_a_date_features",
    "q_a_distinct_scenes", "q_a_export_manifest", "q_a_filter_bounds",
    "q_a_filter_date", "q_a_filter_meta", "q_a_gap_detect", "q_a_ingest_log",
    "q_a_join_aoi", "q_a_props_extract", "q_a_qa_bitmask", "q_a_revisit_stats",
    "q_a_rollup_multires", "q_a_scene_count_hist", "q_a_scene_streak",
    "q_a_sort_first", "q_a_trend_slope", "q_b_agg_approx", "q_b_agg_collect",
    "q_b_agg_distinct", "q_b_agg_hash", "q_b_agg_salted", "q_b_filter_complex",
    "q_b_grouping_sets", "q_b_having", "q_b_intersect_except", "q_b_join_anti",
    "q_b_join_asof", "q_b_join_broadcast", "q_b_join_bucketed", "q_b_join_cross",
    "q_b_join_full", "q_b_join_inner", "q_b_join_left", "q_b_join_range",
    "q_b_join_right", "q_b_join_salted", "q_b_join_semi", "q_b_join_theta",
    "q_b_limit_topk", "q_b_project", "q_b_scan_csv", "q_b_scan_json",
    "q_b_scan_parquet", "q_b_sink_partitioned", "q_b_sort", "q_b_topk_pergroup",
    "q_b_union", "q_e_ann_recall", "q_e_band_explain", "q_e_cluster_balance",
    "q_e_containment", "q_e_cross_dedup", "q_e_curation_funnel",
    "q_e_dedup_apply", "q_e_dedup_cluster", "q_e_dedup_embed", "q_e_dedup_exact",
    "q_e_dedup_near", "q_e_dedup_near_md5", "q_e_dedup_simhash",
    "q_e_dedup_soft", "q_e_diversity_sample", "q_e_embed_centroid",
    "q_e_embed_outliers", "q_e_embed_quantize", "q_e_fingerprint",
    "q_e_hard_negatives", "q_e_incremental_dedup", "q_e_ivf_recall",
    "q_e_jaccard_sweep", "q_e_jaccard_verify", "q_e_kmeans_iter",
    "q_e_knn_graph", "q_e_knn_pergroup", "q_e_label_balance", "q_e_lsh_tuning",
    "q_e_minhash_est_err", "q_e_minhash_recall", "q_e_nmi", "q_e_pq_recall",
    "q_e_semdedup", "q_e_sim_join", "q_e_sim_topk", "q_e_sim_topk_ivf",
    "q_e_sim_topk_lsh", "q_e_sim_topk_pq", "q_e_simhash_recall",
    "q_e_source_overlap", "q_e_text_tokens", "q_e_tfidf",
}

# Red in round 2 (all five were the HUGEINT-oracle bug, fixed this
# round) — highest priority for driver re-check.
_R2_RED = (
    "q_e_dup_sizes", "q_e_url_dedup", "q_e_ann_cost", "q_e_cluster_purity",
    "q_e_text_stats",
)

# Same latent HUGEINT-oracle bug, never driver-checked, fixed this
# round — re-check right after the confirmed reds.
_R2_LATENT_FIXED = (
    "q_e_token_bpe", "q_e_mix_weights", "q_e_pack_efficiency",
    "q_e_len_buckets", "q_e_summary_card", "q_e_burstiness",
    "q_e_token_budget", "q_e_mm_shard_manifest", "q_e_mm_pairs",
    "q_a_tile_neighbors", "q_b_snapshot_diff", "q_b_skew_audit",
)

# New in round 3 — first-time driver evidence wanted.
_R3_NEW = (
    "q_a_bbox_contains", "q_a_bbox_overlap", "q_d_foreachbatch_sink",
    "q_b_compaction_plan", "q_b_zorder_cluster", "q_b_time_travel",
    "q_e_char_entropy", "q_e_gopher_rules", "q_e_ivf_pq", "q_c_interval",
    "q_e_hubness", "q_e_bigram_lm", "q_d_checkpoint_resume",
    "q_a_polygon_contains", "q_b_scan_xml", "q_b_histogram",
    "q_b_cube", "q_b_agg_bitwise", "q_b_join_asof_nearest",
    "q_e_psi_drift", "q_b_dq_checks", "q_e_sim_topk_filtered",
    "q_a_quadkey_pyramid", "q_b_rolling_distinct", "q_e_minhash_bbit",
)

# Implementations rewritten in round 3 (posting_copairs / lazy-count /
# persist changes) — their r1/r2 driver evidence predates the rewrite,
# so they re-check ahead of the already-verified block.
_R3_REWRITTEN = (
    "q_e_jaccard_verify", "q_e_jaccard_sweep", "q_e_containment",
    "q_e_band_explain", "q_e_winnow", "q_e_tfidf", "q_e_ngram_lm",
    "q_e_ppl_buckets", "q_e_sim_topk_pq",
)

_V = TypeVar("_V")


def _rotated(d: dict[str, _V]) -> dict[str, _V]:
    names = list(d)

    def prio(n: str) -> int:
        if n in _R2_RED:
            return 0
        if n in _R2_LATENT_FIXED:
            return 1
        if n in _R3_NEW:
            return 2
        if n in _R3_REWRITTEN:
            return 3
        if n not in _DRIVER_VERIFIED:
            return 4
        return 5

    idx = {n: i for i, n in enumerate(names)}
    return {n: d[n] for n in sorted(names, key=lambda n: (prio(n), idx[n]))}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from glaciersgee_spark.operators.relational import pricing_summary

    return pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    glaciersgee_spark.load_all_queries()
    return _rotated(dict(glaciersgee_spark.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per queries() key (omitted ⇒ rows-only)."""
    glaciersgee_spark.load_all_queries()
    return _rotated(dict(glaciersgee_spark.ORACLE))

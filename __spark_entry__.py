"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over glaciersgee_spark: ``entry`` runs the flagship
pricing-summary query; ``queries``/``oracle_sql`` re-export the
registry populated by the operator modules (SURVEY.md §2 inventory).

Dict ordering: round 1's CORRECTNESS pass covered only the first 50
entries of queries() in iteration order, so each round the queries
with the least driver-side evidence are rotated to the front — round
2 leads with the two round-1 red rows (both fixed) followed by every
Group E op (the engine's distinctive surface, none driver-checked in
round 1), then the remaining never-checked A/B/C/D/F ops, with the 48
round-1-verified ops at the back. Local parity (tests/run_parity.py)
covers the full inventory at sf0.01 AND sf0.1 every round regardless
of the driver cap (the registry itself is the count of record).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TypeVar

from pyspark.sql import DataFrame, SparkSession

import glaciersgee_spark

# Verified by the driver in round 1 (CORRECTNESS_r01.json: rows+schema+
# hash all true) — lowest re-check priority.
_R1_VERIFIED = {
    "q_a_filter_date", "q_a_filter_meta", "q_a_filter_bounds", "q_a_sort_first",
    "q_a_best_per_group", "q_a_composite_agg", "q_a_scene_count_hist",
    "q_a_props_extract", "q_a_join_aoi", "q_a_distinct_scenes",
    "q_a_date_features", "q_a_gap_detect", "q_a_export_manifest",
    "q_a_ingest_log", "q_a_qa_bitmask", "q_a_rollup_multires",
    "q_a_trend_slope", "q_a_scene_streak", "q_a_revisit_stats",
    "q_b_scan_parquet", "q_b_scan_json", "q_b_scan_csv", "q_b_sink_partitioned",
    "q_b_join_bucketed", "q_b_project", "q_b_filter_complex", "q_b_join_inner",
    "q_b_join_left", "q_b_join_right", "q_b_join_full", "q_b_join_semi",
    "q_b_join_anti", "q_b_join_broadcast", "q_b_join_theta", "q_b_join_range",
    "q_b_join_asof", "q_b_join_cross", "q_b_agg_hash", "q_b_agg_distinct",
    "q_b_agg_salted", "q_b_join_salted", "q_b_grouping_sets", "q_b_having",
    "q_b_sort", "q_b_limit_topk", "q_b_topk_pergroup", "q_b_union",
    "q_b_intersect_except",
}

# Red in round 1 (both fixed this round) — highest priority.
_R1_RED = ("q_b_agg_collect", "q_b_agg_approx")

_V = TypeVar("_V")


def _rotated(d: dict[str, _V]) -> dict[str, _V]:
    names = list(d)

    def prio(n: str) -> int:
        if n in _R1_RED:
            return 0
        if n.startswith("q_e_"):
            return 1
        if n not in _R1_VERIFIED:
            return 2
        return 3

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

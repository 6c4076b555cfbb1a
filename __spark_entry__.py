"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over glaciersgee_spark: ``entry`` runs the flagship
pricing-summary query; ``queries``/``oracle_sql`` re-export the
registry populated by the operator modules (SURVEY.md §2 inventory).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import glaciersgee_spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from glaciersgee_spark.operators.relational import pricing_summary

    return pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    glaciersgee_spark.load_all_queries()
    return dict(glaciersgee_spark.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per queries() key (omitted ⇒ rows-only)."""
    glaciersgee_spark.load_all_queries()
    return dict(glaciersgee_spark.ORACLE)

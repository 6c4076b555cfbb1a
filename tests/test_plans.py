"""Physical-plan assertions — the 100 TB discipline checks.

These tests pin the *plan shape*, not just the answer: pushdown must
reach the parquet scan, projections must prune columns, small dims must
broadcast, top-k must not global-sort, and hot relational paths must
stay inside WholeStageCodegen with no Python evaluation.
"""

import pyspark.sql.functions as F

from glaciersgee_spark.operators.relational import (
    pricing_summary,
    q_b_join_broadcast,
    q_b_limit_topk,
    q_b_scan_parquet,
)
from glaciersgee_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    df.collect()  # run it so AQE finalizes the physical plan
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_scan_pushes_filters_and_prunes_columns(spark):
    plan = _formatted(q_b_scan_parquet(spark, SF_SMOKE))
    assert "PushedFilters:" in plan
    assert "GreaterThanOrEqual(l_quantity,48.0)" in plan
    assert "Not(EqualTo(l_returnflag,N))" in plan
    # ReadSchema restricted to the projected+filtered columns only
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    for col in ["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"]:
        assert col in read
    for col in ["l_extendedprice", "l_shipdate", "l_partkey"]:
        assert col not in read


def test_date_filter_pushed_to_scan(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    df = li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
    plan = _formatted(df.select("l_orderkey"))
    assert "PushedFilters:" in plan and "LessThanOrEqual(l_shipdate" in plan


def test_small_dim_broadcasts(spark):
    plan = _plan(q_b_join_broadcast(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_avoids_global_sort(spark):
    plan = _plan(q_b_limit_topk(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan


def test_flagship_is_pure_jvm_with_partial_agg(spark):
    df = pricing_summary(spark, SF_SMOKE)
    plan = _plan(df)
    # no Python boundary anywhere in the hot path
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # "*(n)" prefixes mark WholeStageCodegen spans in executedPlan toString
    assert "*(1)" in plan and "*(2)" in plan
    # partial+final hash aggregation (map-side combine before shuffle)
    assert plan.count("HashAggregate") >= 2


def test_aqe_enabled_for_engine_sessions(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"

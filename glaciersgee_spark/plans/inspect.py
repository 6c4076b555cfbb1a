"""Physical-plan inspection — the 100 TB discipline, checkable.

Every operator in this engine is supposed to produce a plan that would
survive a 1000-executor cluster: filters pushed to the parquet scan,
columns pruned, small dims broadcast, top-k without a global sort, hot
relational paths inside WholeStageCodegen with no Python boundary.
These helpers turn each of those claims into an assertion (used by
tests/test_plans.py) and into a human-readable audit
(`plan_report`) for iterating with .explain("formatted").
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted(df: DataFrame) -> str:
    """explain('formatted') as a string (pre-execution plan)."""
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def executed(df: DataFrame) -> str:
    """Final (AQE-resolved) physical plan: runs the query first, since
    AQE re-plans at runtime and the pre-execution string still shows
    the speculative plan."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the datasource scan (parquet row-group
    skipping) — empty means the scan reads everything."""
    out: list[str] = []
    for line in formatted(df).splitlines():
        m = re.search(r"PushedFilters: \[(.*)\]", line)
        if not (m and m.group(1).strip()):
            continue
        # split on top-level commas only — filter exprs nest parens
        depth, cur = 0, []
        for ch in m.group(1):
            if ch == "," and depth == 0:
                out.append("".join(cur).strip())
                cur = []
            else:
                depth += ch == "("
                depth -= ch == ")"
                cur.append(ch)
        if cur:
            out.append("".join(cur).strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — the pruned column set actually read."""
    return [
        line.split("ReadSchema:", 1)[1].strip()
        for line in formatted(df).splitlines()
        if "ReadSchema:" in line
    ]


def count_shuffles(plan: str) -> int:
    """Exchange operators in a plan string — each is a full shuffle of
    its input (AQE may coalesce partitions but the data still moves).
    Handles both simple-mode strings ("Exchange hashpartitioning(...)")
    and formatted-mode node lines ("(7) Exchange"); ReusedExchange and
    BroadcastExchange are excluded — neither re-shuffles rows."""
    simple = len(
        re.findall(
            r"(?<!Reused)Exchange (?:hashpartitioning|rangepartitioning|"
            r"RoundRobinPartitioning|SinglePartition)",
            plan,
        )
    )
    formatted_nodes = len(re.findall(r"\(\d+\) Exchange\s*$", plan, re.MULTILINE))
    return max(simple, formatted_nodes)


def has_python_boundary(plan: str) -> bool:
    """True if any row crosses into a Python worker (BatchEvalPython /
    ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas...)."""
    return bool(re.search(r"EvalPython|InPandas|PythonUDF|PythonUDTF", plan))


def codegen_span_count(plan: str) -> int:
    """Distinct WholeStageCodegen spans — wider spans = more of the
    plan fused into single JVM loops. Simple-mode strings mark spans
    with "*(n)" prefixes; formatted mode with "WholeStageCodegen (n)"."""
    spans = set(re.findall(r"\*\((\d+)\)", plan))
    spans |= set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(spans)


def plan_report(df: DataFrame) -> str:
    """One-paragraph audit of a DataFrame's physical plan.

    Pushdown/pruning/shuffles come from the pre-execution formatted
    plan; codegen spans and Python boundaries from the executed plan
    (Spark 4.1 only marks WholeStageCodegen there)."""
    f = formatted(df)
    x = executed(df)
    return (
        f"pushed_filters={pushed_filters(df)}\n"
        f"read_schemas={read_schemas(df)}\n"
        f"shuffles={count_shuffles(f)} "
        f"codegen_spans={codegen_span_count(x)} "
        f"python_boundary={has_python_boundary(x)}"
    )

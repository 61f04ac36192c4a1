"""Plan-inspection helpers: make physical-plan expectations testable.

The reference's optimizations are hand-placed (SURVEY.md §4); ours are
Catalyst's, so the engine asserts they actually fire — filters reach the
parquet scan, small dims broadcast, shuffles stay bounded. Used by tests
and by bench diagnostics.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def count_shuffles(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan.
    AQE may later coalesce them, but the count is the design property.
    (Counts the detail-section headings — the formatted output lists each
    operator twice, once in the tree and once in the details.)"""
    plan = formatted_plan(df)
    n = len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.MULTILINE))
    if n == 0 and "Exchange" in plan:
        # fallback for plan shapes without a details section
        n = sum(1 for line in plan.splitlines() if "Exchange" in line)
    return n


def has_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters lines of every FileScan in the plan."""
    return "\n".join(
        line.strip() for line in formatted_plan(df).splitlines() if "PushedFilters" in line
    )


def scan_read_schema(df: DataFrame) -> str:
    """ReadSchema lines — verifies column pruning reached the scan."""
    return "\n".join(
        line.strip() for line in formatted_plan(df).splitlines() if "ReadSchema" in line
    )


def lint_plan(df: DataFrame) -> list[str]:
    """Static scale-hazard lint of a DataFrame's physical plan. Returns
    human-readable findings (empty list = clean):

    - ``cartesian``: a CartesianProduct — O(n*m) at scale, almost always
      a missing join key or a forgotten broadcast hint.
    - ``python-row-udf``: a BatchEvalPython node — row-at-a-time Python
      in the hot path (ArrowEvalPython / mapInPandas are the fast path).
    - ``global-window``: a window function over an empty PARTITION BY —
      the whole input flows through ONE task.
    - ``global-sort``: a range-partitioned global Sort that is not a
      bounded top-k (TakeOrderedAndProject is fine).

    Used by tests as a one-call regression net over every registered
    query; also useful interactively before promoting a new query.
    """
    plan = formatted_plan(df)
    findings: list[str] = []
    if "CartesianProduct" in plan:
        findings.append("cartesian: CartesianProduct join in plan")
    if re.search(r"^\(\d+\) BatchEvalPython", plan, flags=re.MULTILINE):
        findings.append("python-row-udf: row-at-a-time Python UDF (BatchEvalPython)")
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        # a spec whose argument list starts with an ordering expression
        # OR directly with the frame (no partition columns, no ordering)
        # is a global window — all rows flow through one task either way
        first = spec.split(",")[0].strip()
        if (
            " ASC" in first
            or " DESC" in first
            or first.startswith("specifiedwindowframe")
        ):
            findings.append("global-window: window with empty PARTITION BY")
            break
    if "rangepartitioning" in plan and "TakeOrderedAndProject" not in plan:
        findings.append("global-sort: range-partitioned global sort")
    return findings

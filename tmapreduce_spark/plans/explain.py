"""Plan-inspection helpers: the engine's own guardrails for the properties
that matter at 100 TB — predicate pushdown, column pruning, broadcast joins,
top-k physical ops, partial aggregation. Used by tests/test_plans.py so a
regression that silently de-optimizes a plan (e.g. a cast blocking pushdown)
fails CI instead of shipping a 100x slowdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The formatted physical plan as a string (what .explain() prints)."""
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def assert_plan_contains(df: DataFrame, *needles: str) -> None:
    plan = physical_plan(df)
    for needle in needles:
        assert needle in plan, f"expected {needle!r} in plan:\n{plan}"


def assert_plan_lacks(df: DataFrame, *needles: str) -> None:
    plan = physical_plan(df)
    for needle in needles:
        assert needle not in plan, f"did not expect {needle!r} in plan:\n{plan}"

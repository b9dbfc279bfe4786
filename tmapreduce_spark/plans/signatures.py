"""Physical-plan shape signatures for every catalog query.

A signature is the count of scale-critical physical operators in the query's
(pre-execution, AQE-initial) plan: exchanges, join strategies, aggregate
modes, windows, Python boundaries, generators. The committed baseline
(``signatures.json``) pins the shape of all ~283 plans, so a silent plan
regression — a broadcast falling back to sort-merge, a new exchange, a
Python stage appearing in a JVM path, a cartesian product sneaking into a
fuzzy join — fails ``tests/test_plan_signatures.py`` instead of quietly
costing a 100 TB shuffle.

Regenerate after an INTENTIONAL plan change:

    python -m tmapreduce_spark.plans.signatures

and review the diff like code: every changed count must be explainable by
the change you just made.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from pyspark.sql import SparkSession

BASELINE_PATH = Path(__file__).with_name("signatures.json")

# The SINGLE scale factor for baseline plans — regeneration and the gating
# test must agree on it (size statistics drive broadcast-vs-SMJ choices, so
# plans at different SFs legitimately differ).
SIG_SF = "/root/testdata/sf0.001"

# Substring-counted operator markers. Chosen so no marker is a substring of
# another's occurrences: "Sort " (trailing space) matches the Sort node but
# not SortAggregate/SortMergeJoin; Exchange subtracts ReusedExchange so
# exchange REUSE never counts as a new shuffle.
OPS = [
    "Exchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "WindowGroupLimit",
    "TakeOrderedAndProject",
    "Generate",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "Expand",
    "Sort ",
    "GlobalLimit",
]


def plan_signature(plan: str) -> dict[str, int]:
    sig: dict[str, int] = {}
    for op in OPS:
        if op == "Exchange":
            c = plan.count("Exchange") - plan.count("ReusedExchange")
        else:
            c = plan.count(op)
        if c:
            sig[op.strip()] = c
    # Window counted via word boundary so WindowGroupLimit doesn't inflate it
    w = len(re.findall(r"\bWindow\b", plan))
    if w:
        sig["Window"] = w
    return sig


def compute_signatures(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, dict[str, int]]:
    from tmapreduce_spark.catalog import build_catalog

    cat = build_catalog()
    out: dict[str, dict[str, int]] = {}
    for name, spec in cat.items():
        if names is not None and name not in names:
            continue
        df = spec.fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out[name] = plan_signature(plan)
    return out


def main() -> None:
    from tmapreduce_spark.session import get_spark

    spark = get_spark(app_name="plan-signatures")
    spark.sparkContext.setLogLevel("ERROR")
    sigs = compute_signatures(spark, SIG_SF)
    BASELINE_PATH.write_text(json.dumps(sigs, indent=1, sort_keys=True) + "\n")
    print(f"wrote {len(sigs)} signatures to {BASELINE_PATH}")


if __name__ == "__main__":
    main()

"""Compiled-plan introspection — the engine's EXPLAIN / plan-dump surface.

Reference parity (SURVEY.md §3 step 3 + §5 item 4): the reference serializes
ExecNodeGraphs as version-stable JSON (`compilePlan`/`loadPlan`,
PlannerBase.scala:191,213) and ships 44 restore-test suites diffing them.
Catalyst plans are not user-serializable for re-execution, so the analog
here is (a) structural plan signatures for golden tests (stable operator
skeleton, no expression IDs) and (b) full plan dumps for inspection.
Re-execution restore is covered instead by Structured Streaming checkpoints
(state + progress), which IS Spark's supported restore path.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Full EXPLAIN text (reference: Table.explain / EXPLAIN PLAN FOR)."""
    return df.sparkSession._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )


def plan_signature(df: DataFrame) -> list[str]:
    """Stable operator skeleton of the optimized plan: node class names in
    tree order, stripped of expression ids/literals — the golden-test
    currency (reference: checked-in plan XMLs under
    flink-table-planner/src/test/resources/.../plan/)."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    nodes = []
    for line in plan.splitlines():
        m = re.match(r"^[+\-:\s|]*([A-Za-z][A-Za-z0-9]*)", line)
        if m:
            nodes.append(m.group(1))
    return nodes


def dump_plan(df: DataFrame, path: str) -> None:
    """Persist the plan signature + full text for offline diffing."""
    payload = {
        "signature": plan_signature(df),
        "optimized": df._jdf.queryExecution().optimizedPlan().toString(),
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)


def load_signature(path: str) -> list[str]:
    with open(path) as f:
        return json.load(f)["signature"]

"""Physical-plan inspection helpers — "is this the plan I'd want?".

Per the scale discipline (SURVEY.md §4): after an operator is correct,
check that filters reached the scan, small dims broadcast, aggregates
have a partial (map-side) phase, and expressions stay inside
whole-stage codegen.  These helpers make those checks assertable in
tests and scriptable in reviews.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    plan = explain_str(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    plan = explain_str(df)
    return "partial_" in plan or "HashAggregate" in plan and "Partial" in plan


def wholestage_codegen_spans(df: DataFrame, execute: bool = True) -> int:
    """Number of WholeStageCodegen regions (wider is generally better).

    With AQE on, the plan is finalized only at execution — so by
    default this runs the query (count) and inspects the resulting
    final adaptive plan.  Pass ``execute=False`` for a static estimate
    (codegen-mode explain; reports 0 under AQE)."""
    if execute:
        df.collect()  # finalize the adaptive plan (count() would build a new one)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # final-plan tree marks codegen regions with `*(N)`
        return len(set(re.findall(r"\*\((\d+)\)", plan)))
    m = re.search(r"Found (\d+) WholeStageCodegen", explain_str(df, "codegen"))
    return int(m.group(1)) if m else 0

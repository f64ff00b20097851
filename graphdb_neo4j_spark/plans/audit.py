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


def cache_above_aggregation(df: DataFrame) -> bool:
    """True when a to-be-cached frame pins rows ABOVE its aggregation
    boundary: the analyzed logical plan has an Aggregate node at or
    above (printed before, top-down) every Join.

    Guards the cache-granularity failure mode: persisting the raw
    output of a fact-table self-join (O(rows²) per key) when every
    consumer immediately aggregates it — the cache should hold the
    aggregated frame, which is strictly smaller and serves the same
    consumers.  A frame with no Join is trivially fine; a frame with a
    Join but no Aggregate above it returns False (cache the aggregated
    successor instead)."""
    plan = df._jdf.queryExecution().analyzed().toString()
    lines = plan.splitlines()
    join_idx = next(
        (i for i, ln in enumerate(lines) if re.search(r"\bJoin\b", ln)), None
    )
    if join_idx is None:
        return True
    agg_idx = next(
        (i for i, ln in enumerate(lines) if re.search(r"\bAggregate\b", ln)),
        None,
    )
    return agg_idx is not None and agg_idx < join_idx

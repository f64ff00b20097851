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


def _tree_depth(line: str) -> int:
    """Indent depth of a plan-tree line (the ``:- `` / ``+- `` prefix
    length); the node name starts at this offset."""
    i = 0
    while i < len(line) and line[i] in " :+-":
        i += 1
    return i


def cache_above_aggregation(df: DataFrame) -> bool:
    """True when a to-be-cached frame pins rows ABOVE its aggregation
    boundary: EVERY Join node in the analyzed logical plan has an
    Aggregate ANCESTOR (by tree structure, not print order — an
    Aggregate in a sibling union branch does not cover a raw join in
    another branch).

    Guards the cache-granularity failure mode: persisting the raw
    output of a fact-table self-join (O(rows²) per key) when every
    consumer immediately aggregates it — the cache should hold the
    aggregated frame, which is strictly smaller and serves the same
    consumers.  A frame with no Join is trivially fine; any Join with
    no Aggregate above it returns False (cache the aggregated
    successor instead)."""
    plan = df._jdf.queryExecution().analyzed().toString()
    lines = [ln for ln in plan.splitlines() if ln.strip()]
    for j, ln in enumerate(lines):
        d = _tree_depth(ln)
        if not ln[d:].startswith("Join"):
            continue
        # ancestors = the chain of lines above with strictly
        # decreasing depth (each new minimum is the parent hop)
        covered = False
        cur = d
        for k in range(j - 1, -1, -1):
            dk = _tree_depth(lines[k])
            if dk < cur:
                if lines[k][dk:].startswith("Aggregate"):
                    covered = True
                    break
                cur = dk
                if cur == 0:
                    break
        if not covered:
            return False
    return True

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


def _jchildren(node):
    """Children of a JVM TreeNode as a Python list."""
    ch = node.children()
    return [ch.apply(i) for i in range(ch.length())]


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
    successor instead).

    Walks the JVM logical-plan tree via ``nodeName()``/``children()``
    — not the printed string, whose indentation format is
    Spark-version-dependent and could make the guard silently vacuous
    (ADVICE r8)."""
    root = df._jdf.queryExecution().analyzed()
    stack = [(root, False)]
    while stack:
        node, under_agg = stack.pop()
        name = node.nodeName()
        under_agg = under_agg or name == "Aggregate"
        if name == "Join" and not under_agg:
            return False
        stack.extend((c, under_agg) for c in _jchildren(node))
    return True


def window_partition_specs(df: DataFrame) -> list[tuple[list[str], bool]]:
    """``(partition_keys, has_aggregate_below)`` for every Window node
    in the OPTIMIZED logical plan — the grouped-skew audit primitive.

    A window partitioned by a data-skewed key (host, hub vertex) over
    NON-aggregated input puts an entire group in one task — the
    grouped form of the single-task-window bottleneck
    (``operators/order.py``).  A window over an aggregated frame
    (per-slice counts, ≤ one row per partition a group touches) is
    bounded and fine, so each spec is paired with whether an Aggregate
    sits below it in the tree.  The downward search STOPS at any node
    whose OUTPUT cardinality is not governed by an aggregate beneath
    it — Join (an Aggregate on one input branch, e.g. the broadcast
    side of a dim join, does not bound the join output; ADVICE r9),
    Union (an aggregated branch does not bound the other branches),
    and Generate (explode multiplies each aggregated row by an
    unbounded per-row factor); counting those would make the
    grouped-skew audit pass vacuously.  Keys are expression strings
    (``host#12``, not bare names) — match with a prefix."""
    root = df._jdf.queryExecution().optimizedPlan()
    out: list[tuple[list[str], bool]] = []
    _stop = {"Join", "Union", "Generate"}

    def has_agg_below(node) -> bool:
        stack = _jchildren(node)
        while stack:
            n = stack.pop()
            name = n.nodeName()
            if name == "Aggregate":
                return True
            if name in _stop:
                continue  # output size ≠ bounded by a descendant agg
            stack.extend(_jchildren(n))
        return False

    stack = [root]
    while stack:
        node = stack.pop()
        if node.nodeName() == "Window":
            spec = node.partitionSpec()
            keys = [spec.apply(i).toString() for i in range(spec.length())]
            out.append((keys, has_agg_below(node)))
        stack.extend(_jchildren(node))
    return out

from graphdb_neo4j_spark.plans.audit import (
    cache_above_aggregation,
    explain_str,
    has_broadcast_join,
    has_partial_aggregate,
    pushed_filters,
    wholestage_codegen_spans,
    window_partition_specs,
)

__all__ = [
    "cache_above_aggregation",
    "explain_str",
    "has_broadcast_join",
    "has_partial_aggregate",
    "pushed_filters",
    "wholestage_codegen_spans",
    "window_partition_specs",
]

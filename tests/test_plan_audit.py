"""Physical-plan assertions: pushdown, broadcast, partial agg, codegen.

Correct results through a bad plan fail here — the 100 TB discipline.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdb_neo4j_spark.plans import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
    wholestage_codegen_spans,
)
from graphdb_neo4j_spark.sources.tables import load_table
from graphdb_neo4j_spark.workloads import QUERY_FNS

SF = "/root/testdata/sf0.01"


def test_filter_pushdown_reaches_parquet_scan(spark):
    df = load_table(spark, SF, "lineitem").filter(F.col("l_quantity") >= 48).select(
        "l_orderkey", "l_quantity"
    )
    filters = pushed_filters(df)
    assert any("l_quantity" in f for f in filters), filters
    # column pruning: ReadSchema carries only the 2 projected columns
    plan = explain_str(df)
    assert "l_extendedprice" not in plan.split("ReadSchema")[1][:300]


def test_q05_broadcasts_dimensions(spark):
    df = QUERY_FNS["q05_region_nation_revenue"](spark, SF)
    assert has_broadcast_join(df)


def test_q01_has_partial_aggregate(spark):
    df = QUERY_FNS["q01_pricing_summary"](spark, SF)
    plan = explain_str(df)
    assert "partial" in plan.lower()  # map-side combine before the shuffle
    assert "Exchange" in plan


def test_q01_date_filter_pushed(spark):
    df = QUERY_FNS["q01_pricing_summary"](spark, SF)
    assert any("l_shipdate" in f for f in pushed_filters(df))


def test_queries_stay_in_codegen(spark):
    for name in ["q01_pricing_summary", "q04_order_priority_semijoin"]:
        df = QUERY_FNS[name](spark, SF)
        assert wholestage_codegen_spans(df) >= 1, name


def test_graph_rel_filter_prunes_partitions(spark, tmp_path):
    from graphdb_neo4j_spark.operators.ingest import build_graph

    g = build_graph(spark, "/root/reference/malware/T1003.002.json")
    out = str(tmp_path / "g")
    g.save(out)
    edges = spark.read.parquet(f"{out}/edges")
    plan = explain_str(edges.filter(F.col("rel") == "SPAWNS"))
    assert "PartitionFilters" in plan and "rel" in plan.split("PartitionFilters")[1][:200]

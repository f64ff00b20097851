"""Extension-operator tests over the real corpus + synthetic fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators.enrich import (
    dns_edges,
    identity_stitch_mapping,
    logon_edges,
    process_lifetimes,
    stitch_graph,
)
from graphdb_neo4j_spark.operators.ingest import build_graph
from graphdb_neo4j_spark.sources.jaeger import read_spans

CORPUS = "/root/reference/malware/*.json"


@pytest.fixture(scope="module")
def spans(spark):
    return read_spans(spark, CORPUS).persist()


def test_dns_edges_recover_event22(spark, spans):
    dns = dns_edges(spans).persist()
    queried = dns.filter(F.col("rel") == "QUERIED_DNS")
    resolved = dns.filter(F.col("rel") == "RESOLVED_TO")
    assert queried.count() > 0  # 1150 event-22 spans in corpus
    assert resolved.count() > 0
    # no ::ffff: prefixes or '-' survive normalization
    assert resolved.filter(
        F.col("dst").startswith("::ffff:") | (F.col("dst") == "-")
    ).count() == 0


def test_logon_edges_recover_security_events(spark, spans):
    lg = logon_edges(spans)
    rels = {r.rel for r in lg.select("rel").distinct().collect()}
    # corpus has 4624 (44), 4625 (4), 4648 (1)
    assert rels == {"LOGGED_ON", "LOGON_FAILED", "USED_EXPLICIT_CREDS"}


def test_process_lifetimes(spark, spans):
    lt = process_lifetimes(spans)
    both = lt.filter(F.col("lifetime_us").isNotNull())
    assert both.count() > 0
    assert both.filter(F.col("lifetime_us") < 0).count() == 0


def test_identity_stitching_reduces_dual_parents(spark, spans):
    g = build_graph(spark, CORPUS)
    mapping = identity_stitch_mapping(spans)
    assert mapping.count() > 0
    stitched = stitch_graph(g, mapping)
    # the 5244 dual-parent children should collapse dramatically
    def dual_parent_children(graph):
        sp = graph.edges.filter(F.col("rel") == "SPAWNS")
        return (
            sp.groupBy("dst").agg(F.count_distinct("src").alias("n"))
            .filter(F.col("n") >= 2)
            .count()
        )

    before = dual_parent_children(g)
    after = dual_parent_children(stitched)
    assert before > 5000
    assert after < before / 2
    # stitching only ever reduces node count
    assert stitched.process.count() < g.process.count()

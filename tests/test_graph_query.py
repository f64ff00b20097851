"""Query-layer tests: motif matching, neighborhood, semi/anti, degrees."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators.graph import GraphQuery


@pytest.fixture(scope="module")
def gq(spark):
    nodes = spark.createDataFrame(
        [("Process", k) for k in "abcdef"] + [("File", "f1"), ("Ip", "1.1.1.1")],
        ["label", "key"],
    )
    edges = spark.createDataFrame(
        [
            ("SPAWNS", "a", "b", 1),
            ("SPAWNS", "a", "c", 1),
            ("SPAWNS", "b", "d", 1),
            ("CONNECTED_TO", "d", "1.1.1.1", 3),
            ("CREATED_FILE", "c", "f1", 11),
            ("SELF", "e", "e", 9),
            ("SELF", "e", "f", 9),
        ],
        ["rel", "src", "dst", "event_id"],
    )
    return GraphQuery(nodes=nodes, edges=edges)


def test_match(gq):
    assert gq.match("Process", key="a").count() == 1
    assert gq.match("File").count() == 1


def test_out_in_neighbors(gq, spark):
    keys = spark.createDataFrame([("a",)], ["key"])
    assert {r.key for r in gq.out_neighbors(keys, "SPAWNS").collect()} == {"b", "c"}
    keys_d = spark.createDataFrame([("d",)], ["key"])
    assert {r.key for r in gq.in_neighbors(keys_d, "SPAWNS").collect()} == {"b"}


def test_motif_two_hop(gq):
    rows = gq.find("(a)-[SPAWNS]->(b); (b)-[SPAWNS]->(c)").collect()
    assert {(r.a, r.b, r.c) for r in rows} == {("a", "b", "d")}


def test_motif_three_hop_with_edge_var(gq):
    df = gq.find("(a)-[SPAWNS]->(b); (b)-[SPAWNS]->(c); (c)-[e:CONNECTED_TO]->(ip)")
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.a, r.b, r.c, r.ip) == ("a", "b", "d", "1.1.1.1")
    assert r.e.event_id == 3


def test_motif_shared_endpoint_fanout(gq):
    # (a)->(b); (a)->(c): join on shared src variable
    rows = gq.find("(x)-[SPAWNS]->(y); (x)-[SPAWNS]->(z)").collect()
    pairs = {(r.x, r.y, r.z) for r in rows}
    assert ("a", "b", "c") in pairs and ("a", "c", "b") in pairs


def test_semi_anti(gq):
    procs = gq.match("Process").select("key")
    spawned = gq.semi(procs, "SPAWNS")
    assert {r.key for r in spawned.collect()} == {"a", "b"}
    leaf = gq.anti(procs, "SPAWNS")
    assert {r.key for r in leaf.collect()} == {"c", "d", "e", "f"}


def test_motif_self_loop(gq):
    # "(s)-[R]->(s)" must keep ONLY true self-loops, not all R edges
    rows = gq.find("(s)-[SELF]->(s)").collect()
    assert {r.s for r in rows} == {"e"}
    assert gq.find("(a)-[SPAWNS]->(a)").count() == 0


def test_degrees(gq):
    d = {r.key: (r.in_degree, r.out_degree) for r in gq.degrees().collect()}
    assert d["a"] == (0, 2)
    assert d["d"] == (1, 1)
    assert d["1.1.1.1"] == (1, 0)


def test_find_optional_match(spark):
    """OPTIONAL MATCH: required rows survive with NULLs when the
    optional hop has no match, multiply when it has several."""
    from graphdb_neo4j_spark.operators.graph import GraphQuery

    nodes = spark.createDataFrame(
        [("P", k) for k in ["p1", "p2", "c1", "c2"]] + [("F", "f1"), ("F", "f2")],
        ["label", "key"],
    )
    edges = spark.createDataFrame(
        [
            ("SPAWNS", "p1", "c1", None),
            ("SPAWNS", "p2", "c2", None),
            ("CREATED_FILE", "c1", "f1", None),
            ("CREATED_FILE", "c1", "f2", None),
            # c2 creates nothing
        ],
        "rel string, src string, dst string, event_id string",
    )
    gq = GraphQuery(nodes=nodes, edges=edges)
    out = gq.find_optional("(a)-[SPAWNS]->(b)", "(b)-[CREATED_FILE]->(f)")
    rows = {(r.a, r.b, r.f) for r in out.collect()}
    assert rows == {
        ("p1", "c1", "f1"),
        ("p1", "c1", "f2"),
        ("p2", "c2", None),  # survives with NULL
    }
    with pytest.raises(ValueError):
        gq.find_optional("(a)-[SPAWNS]->(b)", "(x)-[CREATED_FILE]->(y)")

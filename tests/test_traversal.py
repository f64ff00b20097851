"""Traversal & analytics tests with pure-Python oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators.traversal import (
    bfs,
    connected_components,
    pagerank,
    shortest_path_length,
)

EDGES = [
    ("a", "b"), ("b", "c"), ("c", "d"), ("a", "e"),
    ("x", "y"),  # second component
    ("d", "a"),  # cycle back
]


def py_bfs(edges, sources, directed=True):
    adj: dict[str, set[str]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    dist = {s: 0 for s in sources}
    frontier = set(sources)
    hop = 0
    while frontier:
        hop += 1
        nxt = set()
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in dist:
                    dist[m] = hop
                    nxt.add(m)
        frontier = nxt
    return dist


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, ["src", "dst"])


def test_bfs_matches_python_oracle(spark, edges_df):
    sources = spark.createDataFrame([("a",)], ["key"])
    got = {r.key: r.dist for r in bfs(edges_df, sources).collect()}
    assert got == py_bfs(EDGES, ["a"])


def test_bfs_undirected(spark, edges_df):
    sources = spark.createDataFrame([("y",)], ["key"])
    got = {r.key: r.dist for r in bfs(edges_df, sources, directed=False).collect()}
    assert got == py_bfs(EDGES, ["y"], directed=False)


def test_bfs_max_hops(spark, edges_df):
    sources = spark.createDataFrame([("a",)], ["key"])
    got = {r.key: r.dist for r in bfs(edges_df, sources, max_hops=1).collect()}
    assert got == {"a": 0, "b": 1, "e": 1}


def test_shortest_path(spark, edges_df):
    assert shortest_path_length(edges_df, "a", "d") == 3
    assert shortest_path_length(edges_df, "a", "x") is None
    assert shortest_path_length(edges_df, "d", "b") == 2  # via cycle d->a->b


def test_connected_components(spark, edges_df):
    nodes = spark.createDataFrame(
        [(k,) for k in ["a", "b", "c", "d", "e", "x", "y", "lonely"]], ["key"]
    )
    comp = {r.key: r.component for r in connected_components(nodes, edges_df).collect()}
    assert comp["a"] == comp["b"] == comp["c"] == comp["d"] == comp["e"] == "a"
    assert comp["x"] == comp["y"] == "x"
    assert comp["lonely"] == "lonely"


def test_pagerank_sums_and_ranks(spark):
    # star: everyone points at hub → hub has max rank
    edges = spark.createDataFrame(
        [("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("hub", "s1")],
        ["src", "dst"],
    )
    ranks = {r.key: r.rank for r in pagerank(edges, iterations=15).collect()}
    assert max(ranks, key=ranks.get) == "hub"
    # spokes that receive nothing sit at the base rank (1 - d)
    assert ranks["s2"] == pytest.approx(0.15)


def test_triangle_count(spark):
    from graphdb_neo4j_spark.operators.traversal import triangle_count

    # K4 has 4 triangles; plus a dangling edge adds none
    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    edges = spark.createDataFrame(k4 + [("d", "e")], ["src", "dst"])
    assert triangle_count(edges) == 4
    # direction-insensitive: reversing edges changes nothing
    rev = spark.createDataFrame([(b, a) for a, b in k4], ["src", "dst"])
    assert triangle_count(rev) == 4


def test_label_propagation_two_cliques(spark):
    from graphdb_neo4j_spark.operators.traversal import label_propagation

    clique1 = [(a, b) for a in "abc" for b in "abc" if a < b]
    clique2 = [(a, b) for a in "xyz" for b in "xyz" if a < b]
    edges = spark.createDataFrame(clique1 + clique2 + [("c", "x")], ["src", "dst"])
    nodes = spark.createDataFrame([(k,) for k in "abcxyz"], ["key"])
    labels = {r.key: r.label for r in label_propagation(nodes, edges, 8).collect()}
    # the two cliques end up internally consistent
    assert len({labels[k] for k in "ab"}) == 1
    assert len({labels[k] for k in "yz"}) == 1

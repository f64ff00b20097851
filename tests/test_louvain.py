"""louvain_one_level semantics (fixture graphs; g70 exercises it at
corpus scale rows-only)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators.traversal import louvain_one_level, modularity


def _clique_edges(bases, size=4, bridges=()):
    edges = []
    for base in bases:
        ns = [base + i for i in range(size)]
        edges += [(a, b) for a in ns for b in ns if a < b]
    edges += list(bridges)
    return edges


def test_louvain_finds_planted_cliques(spark):
    e = spark.createDataFrame(
        _clique_edges((0, 10, 20), bridges=[(3, 10), (13, 20)]),
        "src long, dst long",
    )
    got = {r["v"]: r["community"] for r in louvain_one_level(e).collect()}
    groups = [ {got[b + i] for i in range(4)} for b in (0, 10, 20) ]
    assert all(len(g) == 1 for g in groups)
    assert len({next(iter(g)) for g in groups}) == 3


def test_louvain_improves_modularity_and_is_deterministic(spark):
    e = spark.createDataFrame(
        _clique_edges((0, 10), bridges=[(3, 10)]), "src long, dst long"
    )
    a1 = louvain_one_level(e)
    a2 = louvain_one_level(e)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))

    def q(asg):
        return (
            modularity(e, asg)
            .agg(F.sum("contribution").alias("q"))
            .collect()[0]["q"]
        )

    singletons = (
        e.select(F.col("src").alias("key"))
        .union(e.select(F.col("dst").alias("key")))
        .distinct()
        .withColumn("community", F.col("key"))
    )
    assert q(a1.select(F.col("v").alias("key"), "community")) > q(singletons)

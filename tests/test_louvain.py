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


def _clique(prefix, n):
    ids = [f"{prefix}{i}" for i in range(n)]
    return [(a, b) for a in ids for b in ids if a < b], ids


def test_louvain_multilevel_ring_of_cliques(spark):
    """6 cliques of 4 joined in a ring: the known Louvain answer is one
    community per clique; partition must be valid and deterministic."""
    from graphdb_neo4j_spark.operators.traversal import louvain

    edges, ring = [], []
    for ci in range(6):
        es, ids = _clique(f"c{ci}_", 4)
        edges += es
        ring.append(ids[0])
    for i in range(6):
        edges.append((ring[i], ring[(i + 1) % 6]))
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = louvain(df, max_levels=4, max_iter=8)
    asg = {r.v: r.community for r in out.collect()}
    assert len(asg) == 24  # every vertex assigned exactly once
    # each clique internally consistent
    comms = set()
    for ci in range(6):
        labels = {asg[f"c{ci}_{i}"] for i in range(4)}
        assert len(labels) == 1, (ci, labels)
        comms |= labels
    assert len(comms) == 6
    # deterministic across runs
    asg2 = {r.v: r.community for r in louvain(df, max_levels=4, max_iter=8).collect()}
    assert asg == asg2


def test_louvain_multilevel_not_worse_than_one_level(spark):
    """Σ modularity contributions of the multi-level partition must be
    >= the one-level partition on a two-scale graph (pairs of cliques
    bridged densely, pairs connected sparsely)."""
    from graphdb_neo4j_spark.operators.traversal import (
        louvain,
        louvain_one_level,
        modularity,
    )

    edges = []
    anchors = []
    for g in range(4):
        es1, ids1 = _clique(f"g{g}a_", 3)
        es2, ids2 = _clique(f"g{g}b_", 3)
        edges += es1 + es2
        # dense bridge between the two sub-cliques of a group
        edges += [(ids1[0], ids2[0]), (ids1[1], ids2[1])]
        anchors.append(ids1[2])
    for i in range(3):
        edges.append((anchors[i], anchors[i + 1]))  # sparse inter-group path
    df = spark.createDataFrame(edges, ["src", "dst"])

    def q_sum(asg):
        m = modularity(
            df, asg.withColumnRenamed("v", "key"), key_col="key"
        )
        return sum(r.contribution for r in m.collect())

    q_multi = q_sum(louvain(df, max_levels=4, max_iter=8))
    q_one = q_sum(louvain_one_level(df, max_iter=8))
    assert q_multi >= q_one - 1e-9, (q_multi, q_one)


def test_louvain_weighted_edges(spark):
    """Integer edge weights steer the partition: two heavy pairs joined
    by a light bridge must split at the bridge."""
    from graphdb_neo4j_spark.operators.traversal import louvain

    df = spark.createDataFrame(
        [("a", "b", 10), ("c", "d", 10), ("b", "c", 1)],
        ["src", "dst", "w"],
    )
    asg = {r.v: r.community for r in louvain(df, weight_col="w").collect()}
    assert len(asg) == 4
    assert asg["a"] == asg["b"]
    assert asg["c"] == asg["d"]
    assert asg["a"] != asg["c"]


def test_louvain_edges_distinct_fast_path_identical(spark):
    """edges_distinct=True (the r10 fast path skipping the internal
    dedup aggregate) must produce the bit-identical assignment when
    the input really is one row per distinct undirected pair."""
    from pyspark.sql import functions as F

    from graphdb_neo4j_spark.operators.traversal import louvain_one_level

    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"),           # triangle
        ("d", "e"), ("d", "f"), ("e", "f"),           # triangle
        ("c", "d"),                                   # bridge
        ("g", "h"),                                   # isolated pair
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    slow = louvain_one_level(df, max_iter=6, edges_distinct=False)
    fast = louvain_one_level(df, max_iter=6, edges_distinct=True)
    diff = (
        slow.alias("a")
        .join(fast.alias("b"), "v", "full")
        .filter(F.expr("a.community IS DISTINCT FROM b.community"))
    )
    assert diff.count() == 0


def test_louvain_prepartitioned_identical(spark):
    """louvain_one_level(prepartitioned=True) over a caller-persisted
    louvain_undirected_edges frame (the r11 g70 path: the loop-invariant
    edge layout built once at cache time) must produce the bit-identical
    assignment to the internal build, and must NOT unpersist the
    caller's cache."""
    from pyspark.sql import functions as F

    from graphdb_neo4j_spark.operators.traversal import (
        louvain_one_level,
        louvain_undirected_edges,
    )

    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"),
        ("d", "e"), ("d", "f"), ("e", "f"),
        ("c", "d"),
        ("g", "h"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    base = louvain_one_level(df, max_iter=6, edges_distinct=True)
    und = louvain_undirected_edges(df, edges_distinct=True).persist()
    try:
        pre = louvain_one_level(und, max_iter=6, prepartitioned=True)
        diff = (
            base.alias("a")
            .join(pre.alias("b"), "v", "full")
            .filter(F.expr("a.community IS DISTINCT FROM b.community"))
        )
        assert diff.count() == 0
        # the kernel must leave the caller's cache pinned
        assert und.storageLevel.useMemory or und.storageLevel.useDisk
    finally:
        und.unpersist()

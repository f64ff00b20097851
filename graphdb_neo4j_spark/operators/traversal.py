"""Iterative graph traversal & analytics — the pieces Catalyst can't do.

Variable-length paths (``SPAWNS*1..``), reachability, shortest
hop-count, connected components and PageRank need recursion, which
Spark SQL lacks; the standard Spark-first answer (SURVEY.md §2.D, §4)
is a driver-side loop over DataFrames:

* **semi-naive frontier BFS** — each iteration expands only the delta
  frontier (new nodes), unions into the visited set, and
  ``localCheckpoint()``s to truncate lineage (without it the plan tree
  doubles every iteration and the driver OOMs on plan analysis long
  before data is a problem).
* **HashMin connected components** — propagate min component id along
  undirected edges until a fixed point; converges in O(diameter)
  iterations.  (GraphX's alternating large-star/small-star converges in
  O(log n); HashMin is simpler and fine for provenance graphs whose
  diameter is a process-tree depth.  Swap-in point documented.)
* **PageRank** — classic iterate: contributions = rank/out_degree
  grouped by dst.  Fixed iteration count, no convergence test, matching
  GraphX's default mode.

Scale notes: every iteration is one shuffle (groupBy dst).  The frontier
DataFrame stays partitioned by key; AQE coalesces as the frontier
shrinks.  ``localCheckpoint(eager=True)`` materializes to executor
storage — on a real cluster prefer reliable ``checkpoint()`` to survive
executor loss on long traversals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_undirected(edges: DataFrame) -> DataFrame:
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionByName(rev)


def partitioned_checkpoint(df: DataFrame, col: str) -> DataFrame:
    """Checkpoint ``df`` hash-partitioned on ``col``.

    CAVEAT (measured r7): a checkpointed Dataset scans as an
    ``ExistingRDD`` with ``UnknownPartitioning``, so downstream plans
    CANNOT see the layout — a per-round join on ``col`` still inserts
    a full Exchange + Sort on this side every round.  The physical
    rows being pre-grouped makes that exchange mostly node-local, but
    it is not free.  For a LOOP-INVARIANT table whose layout must be
    visible to Catalyst, use :func:`partitioned_cache` instead; keep
    this for state that must be hard-frozen (lineage truncation)."""
    n_shuffle = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    return df.repartition(n_shuffle, col).localCheckpoint()


def partitioned_cache(df: DataFrame, col: str) -> DataFrame:
    """Hash-partition on ``col``, sort within partitions, and PERSIST —
    the layout discipline for a LOOP-INVARIANT table (an iterative
    kernel's edge frame) that many per-round plans will join on
    ``col``.

    Unlike a checkpoint, ``InMemoryRelation`` PRESERVES the child
    plan's outputPartitioning and outputOrdering metadata, so every
    round's join sees this side as already hash-partitioned AND
    sorted: zero Exchange, zero Sort, only the vertex-sized state
    moves.  (Verified empirically: the same frame localCheckpoint'd
    scans as UnknownPartitioning and re-exchanges + re-sorts 2|E| rows
    EVERY round; swapping the Louvain edge frame to this cache
    measured median round exec 13.5s -> 6.2s, −54%, over 16
    interleaved rounds at sf0.1, assignments bit-identical.)

    Cache ≠ freeze: lineage is retained, so this is ONLY for
    loop-invariant frames computed once — per-round evolving state
    still needs :func:`df_freeze`.  MEMORY_AND_DISK spills rather than
    evicting, so release is safe under pressure; the CALLER owns
    ``unpersist()``.  On a real cluster the equivalent durable layout
    is a bucketed+sorted table (same metadata visibility); measured
    here, the one-time bucketed write cost exceeds the cache's at
    local scale (see the kernel's negative-result notes)."""
    n_shuffle = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    out = (
        df.repartition(n_shuffle, col).sortWithinPartitions(col).persist()
    )
    out.count()
    return out


def rdd_freeze(df_in: DataFrame, prev_rdd=None):
    """Materialize ``df_in`` to a persisted RDD and rebase the DataFrame
    on it — the hard per-round state freeze for iterative loops.

    ``Dataset.localCheckpoint`` is unreliable under AQE for loop shapes
    that reference the per-round state several times in the next round's
    plan: the checkpoint marker can land on a pre-replan RDD whose full
    lineage is retained, so round cost compounds (measured on the
    Louvain kernel: 0.7s -> 67s over 8 rounds).  Persisting the final
    RDD explicitly and rebasing via ``createDataFrame`` pins the actual
    computed partitions; rounds stay O(1).

    Returns ``(frozen_df, rdd)``; pass the previous round's ``rdd`` back
    as ``prev_rdd`` so it unpersists only AFTER the new round is
    materialized (the new plan may read it).

    Audit note (this session, local[32]): the simpler loops here — the
    pagerank power iteration, label_propagation, k_core peel, HashMin
    components — were probed at 4/8/16-20 rounds and show FLAT
    per-round cost with plain ``localCheckpoint``; only the Louvain
    local-moving shape (state referenced ~4x per round) exhibited the
    pathology.  Use this helper for any new operator with that shape.
    """
    spark = df_in.sparkSession
    rdd = df_in.rdd
    rdd.persist()
    rdd.count()
    out = spark.createDataFrame(rdd, df_in.schema)
    if prev_rdd is not None:
        prev_rdd.unpersist()
    return out, rdd


def rdd_freeze_counting(df_in, count_where, prev_rdd=None):
    """`rdd_freeze` variant that folds a row-predicate count into the
    SAME materialization job (persist caches the parent's partitions
    while the filtered count runs), so convergence checks like "how
    many rows moved this round" cost zero extra jobs.  The predicate
    runs on the already-Python-side Row objects of the freeze path —
    vertex-sized state, never data-sized.

    Returns ``(frozen_df, rdd, n_matching)``.
    """
    spark = df_in.sparkSession
    rdd = df_in.rdd
    rdd.persist()
    n = rdd.filter(count_where).count()
    out = spark.createDataFrame(rdd, df_in.schema)
    if prev_rdd is not None:
        prev_rdd.unpersist()
    return out, rdd, n


def _ensure_checkpoint_dir(spark) -> None:
    """Set a session checkpoint dir if none is configured (local runs:
    a tempdir; on a cluster, configure a durable FS dir up front and
    this is a no-op)."""
    if spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty():
        import tempfile

        spark.sparkContext.setCheckpointDir(
            tempfile.mkdtemp(prefix="spark-graft-ckpt-")
        )


def df_freeze(df_in: DataFrame, prev=None):
    """JVM-side hard per-round freeze: eager RELIABLE
    ``Dataset.checkpoint`` — materializes the final (post-AQE) RDD to
    the checkpoint dir and rebases the plan on it, truncating lineage
    without ever piping rows through Python workers (``rdd_freeze``
    deserializes the vertex state in Python once per materialization
    AND once per downstream JVM read — measured ~2x the Louvain
    kernel's exec time at sf0.1).  ``prev`` is accepted for signature
    parity and ignored: checkpoint files are owned by the session —
    ``get_spark`` sets ``spark.cleaner.referenceTracking
    .cleanCheckpoints=true`` so the ContextCleaner deletes each round's
    file once its RDD is GC'd (ADVICE r6: without it a long-lived
    session accumulated checkpoints unboundedly), and on local runs the
    tempdir dies with the box regardless.

    Returns ``(frozen_df, None)`` matching ``rdd_freeze``'s shape.
    """
    _ensure_checkpoint_dir(df_in.sparkSession)
    return df_in.checkpoint(eager=True), None


def df_freeze_counting(df_in: DataFrame, cond, prev=None):
    """``df_freeze`` + a row-predicate count evaluated JVM-side on the
    already-checkpointed data (``cond`` is a Column, not a Python
    lambda).  Returns ``(frozen_df, None, n_matching)``."""
    out, _ = df_freeze(df_in, prev)
    return out, None, out.filter(cond).count()


def _chain_persist(df: DataFrame, prev: DataFrame | None = None) -> DataFrame:
    """Eagerly materialize ``df`` in the DataFrame cache and release the
    previous round's cache handle AFTERWARDS (the new plan may read it).

    The walk/accumulator loops use this so at most two round-frames are
    cached at any moment instead of one per step.  MEMORY_AND_DISK (the
    DataFrame default) spills instead of evicting, so releasing the
    upstream handle cannot trigger a lineage recompute cascade under
    memory pressure; on a real cluster swap the terminal frame for a
    fault-tolerant ``checkpoint()``.
    """
    df = df.persist()
    df.count()
    if prev is not None:
        prev.unpersist()
    return df


def bfs(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int | None = None,
    directed: bool = True,
) -> DataFrame:
    """Hop-count BFS from a set of source keys.

    ``edges``: (src, dst [, ...]); ``sources``: single-column DataFrame of
    start keys.  Returns (key, dist) with the minimum hop count, dist 0
    for sources.  Semi-naive: only the newest frontier is expanded.
    """
    e = edges.select("src", "dst") if directed else _as_undirected(edges)
    key_col = sources.columns[0]
    visited = (
        sources.select(F.col(key_col).alias("key")).distinct()
        .withColumn("dist", F.lit(0))
        .localCheckpoint()
    )
    frontier = visited
    hop = 0
    while True:
        hop += 1
        if max_hops is not None and hop > max_hops:
            break
        nxt = (
            frontier.join(e, frontier["key"] == e["src"])
            .select(F.col("dst").alias("key"))
            .distinct()
            .join(visited.select("key"), "key", "left_anti")
            .withColumn("dist", F.lit(hop))
        )
        nxt = nxt.localCheckpoint()
        if nxt.isEmpty():
            break
        # visited stays a LAZY union of already-checkpointed frontier
        # frames (r11): every child is frozen, so the anti-join above
        # scans the same rows either way, and the per-hop re-checkpoint
        # of the whole visited set — one extra action + full copy per
        # hop, O(hops·|V|) total writes — is gone (guide §2 fewer
        # jobs).  Consolidate every 32 hops so an unbounded-depth chain
        # graph cannot grow the union plan without limit.
        visited = visited.unionByName(nxt)
        if hop % 32 == 0:
            visited = visited.localCheckpoint()
        frontier = nxt
    return visited


def reachable(edges: DataFrame, sources: DataFrame, directed: bool = True) -> DataFrame:
    """Transitive closure from sources — ``(s)-[*1..]->(n)`` node set
    (sources included at dist 0)."""
    return bfs(edges, sources, directed=directed)


def shortest_path_length(
    edges: DataFrame, src_key: str, dst_key: str, directed: bool = True,
    max_hops: int = 64,
) -> int | None:
    """Hop-count shortest path between two keys; None if unreachable.
    Early-exits as soon as the destination enters the visited set."""
    spark = edges.sparkSession
    e = edges.select("src", "dst") if directed else _as_undirected(edges)
    visited = spark.createDataFrame([(src_key, 0)], ["key", "dist"]).localCheckpoint()
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["key"] == e["src"])
            .select(F.col("dst").alias("key"))
            .distinct()
            .join(visited.select("key"), "key", "left_anti")
            .withColumn("dist", F.lit(hop))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            return None
        if not nxt.filter(F.col("key") == dst_key).isEmpty():
            return hop
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return None


def bfs_tree(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int | None = None,
    directed: bool = True,
    until: DataFrame | None = None,
) -> DataFrame:
    """(key, dist, pred) — the BFS shortest-path FOREST from the source
    set: minimum hop count plus one deterministic predecessor per
    reached node (min frontier key among equal-distance parents, so the
    tree — and every reconstructed path — is stable across runs and
    partitionings).  ``pred`` is NULL for sources.  Same semi-naive
    frontier shape as :func:`bfs`: one join + one grouped min per hop.
    ``until`` (single-column key set) stops the expansion early once
    every listed key is visited — the two-endpoint fast path.
    """
    e = edges.select("src", "dst") if directed else _as_undirected(edges)
    key_col = sources.columns[0]
    stop = (
        until.select(F.col(until.columns[0]).alias("key")).distinct()
        if until is not None else None
    )
    visited = (
        sources.select(F.col(key_col).alias("key")).distinct()
        .withColumn("dist", F.lit(0))
        .withColumn("pred", F.lit(None).cast(e.schema["src"].dataType))
        .localCheckpoint()
    )
    frontier = visited
    hop = 0
    while True:
        hop += 1
        if max_hops is not None and hop > max_hops:
            break
        nxt = (
            frontier.join(e, frontier["key"] == e["src"])
            .select(F.col("dst").alias("key"), frontier["key"].alias("pred"))
            .groupBy("key")
            .agg(F.min("pred").alias("pred"))
            .join(visited.select("key"), "key", "left_anti")
            .withColumn("dist", F.lit(hop))
            .select("key", "dist", "pred")
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
        if stop is not None and stop.join(visited, "key", "left_anti").isEmpty():
            break
    return visited


def _backtrace_paths_doubling(
    tree: DataFrame, max_rounds: int | None = None
) -> DataFrame:
    """(key, dist, path) for EVERY row of a predecessor table via
    pointer doubling: each row carries (anc, seg) where ``seg`` is the
    path from ``anc`` (exclusive) to the row (inclusive); one self-join
    per round composes seg(anc) ++ seg, doubling the ancestor distance
    — O(log max_depth) rounds instead of O(max_depth).  The right
    strategy when paths are materialized for the WHOLE table (each
    round touches all n rows but there are only log d of them); the
    step backtrace wins when ``targets`` narrows the output.

    The round bound defaults to ⌈log₂ n⌉+1 (a forest path visits ≤ n
    nodes, and doubling covers length n in log rounds), which also
    caps segment growth at O(n) per row on a CYCLIC pred forest
    (zero-weight-cycle SSSP): cycle rows never reach a root and are
    dropped at the bound instead of doubling forever."""
    import math

    if max_rounds is None:
        n = tree.count()
        max_rounds = math.ceil(math.log2(max(n, 2))) + 1
    p = tree.select(
        "key", "dist",
        F.col("pred").alias("anc"),
        F.array("key").alias("seg"),
    ).localCheckpoint()
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        todo = p.filter(F.col("anc").isNotNull())
        if todo.isEmpty():
            break
        links = p.select(
            F.col("key").alias("anc"),
            F.col("anc").alias("anc2"),
            F.col("seg").alias("seg2"),
        )
        stepped = todo.join(links, "anc").select(
            "key", "dist",
            F.col("anc2").alias("anc"),
            F.concat(F.col("seg2"), F.col("seg")).alias("seg"),
        )
        p = (
            p.filter(F.col("anc").isNull())
            .unionByName(stepped)
            .localCheckpoint()
        )
    # rows still carrying an ancestor at the bound are cyclic pred
    # chains (never reach a root) — cut, not returned with partial paths
    return p.filter(F.col("anc").isNull()).select(
        "key", "dist", F.col("seg").alias("path")
    )


def _backtrace_paths(
    tree: DataFrame, targets: DataFrame | None = None,
    max_rounds: int | None = None,
) -> DataFrame:
    """(key, dist, path) from a predecessor table (key, dist, pred):
    level-synchronous backtrace — ALL rows walk one pred-link per round
    (one equi-join), so rounds = max path length, never per-row work on
    the driver.  ``targets`` (single-column) restricts which rows get a
    path (the pred table still serves every link).  Output size is the
    inherent Σ|path| — materialize paths only for the rows you need.
    For whole-table materialization :func:`_backtrace_paths_doubling`
    does the same in O(log max_depth) rounds.

    The round bound defaults to the tree's row count + 1 — a forest
    path visits each node at most once, so every acyclic path
    completes regardless of depth (the loop exits as soon as all rows
    finish); only cyclic pred chains (zero-weight-cycle SSSP) hit the
    bound and are cut.
    """
    if max_rounds is None:
        max_rounds = tree.count() + 1
    start = tree
    if targets is not None:
        t = targets.select(
            F.col(targets.columns[0]).alias("key")
        ).distinct()
        start = tree.join(t, "key", "left_semi")
    paths = start.select(
        "key", "dist",
        F.col("pred").alias("cur"),
        F.array("key").alias("path"),
    ).localCheckpoint()
    done = paths.filter(F.col("cur").isNull()).select("key", "dist", "path")
    todo = paths.filter(F.col("cur").isNotNull())
    links = tree.select(F.col("key").alias("cur"), F.col("pred").alias("nxt"))
    rounds = 0
    while not todo.isEmpty() and rounds < max_rounds:
        rounds += 1
        stepped = (
            todo.join(links, "cur")
            .select(
                "key", "dist",
                F.col("nxt").alias("cur"),
                F.concat(F.array(F.col("cur")), F.col("path")).alias("path"),
            )
            .localCheckpoint()
        )
        done = done.unionByName(
            stepped.filter(F.col("cur").isNull()).select("key", "dist", "path")
        ).localCheckpoint()
        todo = stepped.filter(F.col("cur").isNotNull())
    return done


def bfs_paths(
    edges: DataFrame,
    sources: DataFrame,
    targets: DataFrame | None = None,
    max_hops: int | None = None,
    directed: bool = True,
) -> DataFrame:
    """(key, dist, path) — minimum hop count AND one reconstructed
    shortest path (array of keys, source first) per reached node;
    Cypher's ``shortestPath((s)-[*]->(n))`` surface.  BFS forest via
    :func:`bfs_tree`, then a backtrace; pass ``targets`` to materialize
    paths only where you need them (path bytes are the dominant cost at
    scale, not the traversal).  Whole-table materialization uses the
    pointer-doubling backtrace (O(log depth) rounds); a targeted one
    walks single links (O(depth) rounds over only the targets' rows)."""
    tree = bfs_tree(edges, sources, max_hops=max_hops, directed=directed)
    if targets is None:
        return _backtrace_paths_doubling(tree)
    return _backtrace_paths(tree, targets=targets)


def shortest_path(
    edges: DataFrame, src_key: str, dst_key: str, directed: bool = True,
    max_hops: int = 64,
) -> list | None:
    """The actual shortest path [src, ..., dst] between two keys (hop
    metric), or None if unreachable — :func:`shortest_path_length` with
    reconstruction.  Deterministic: min-predecessor tie-break."""
    spark = edges.sparkSession
    srcs = spark.createDataFrame([(src_key,)], ["key"])
    dst_set = spark.createDataFrame([(dst_key,)], ["key"])
    tree = bfs_tree(
        edges, srcs, max_hops=max_hops, directed=directed, until=dst_set
    )
    hit = tree.filter(F.col("key") == dst_key)
    if hit.isEmpty():
        return None
    row = _backtrace_paths(tree, targets=dst_set).head()
    return list(row["path"])


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 50
) -> DataFrame:
    """(key, component) — component = min key (lexicographic) in the
    weakly-connected component.  HashMin label propagation.
    """
    e = _as_undirected(edges).distinct().localCheckpoint()
    key_col = nodes.columns[0]
    comp = (
        nodes.select(F.col(key_col).alias("key")).distinct()
        .withColumn("component", F.col("key"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # candidate component = min over self and neighbors' components
        msgs = (
            comp.join(e, comp["key"] == e["src"])
            .select(F.col("dst").alias("key"), "component")
        )
        new_comp = (
            comp.select("key", "component").unionByName(msgs)
            .groupBy("key")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_comp.alias("n")
            .join(comp.alias("o"), "key")
            .filter(F.col("n.component") != F.col("o.component"))
        )
        comp = new_comp
        if changed.isEmpty():
            break
    return comp


def connected_components_twophase(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 30
) -> DataFrame:
    """(key, component) via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond").

    Converges in O(log n) rounds REGARDLESS of graph diameter — the
    scale answer for long-chain graphs where HashMin
    (:func:`connected_components`, O(diameter) rounds) crawls.  Each
    round is two grouped aggregations (two shuffles); the edge list
    contracts toward a star per component, whose center is the
    component minimum.  Results are identical to HashMin.
    """
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    prev_sig = None
    for _ in range(max_iter):
        # large-star: for every u, attach its LARGER neighbors to
        # m(u) = min(N(u) ∪ {u})
        sym = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        grouped = sym.groupBy("src").agg(
            F.min("dst").alias("min_n"), F.collect_set("dst").alias("ns")
        )
        m = F.least(F.col("min_n"), F.col("src"))
        large = (
            grouped.select(F.col("src"), m.alias("m"), F.explode("ns").alias("v"))
            .filter(F.col("v") > F.col("src"))
            .select(F.col("v").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            # no distinct here (r11): the small-star groupBy's
            # collect_set/min dedup duplicate (src,dst) rows anyway, and
            # ``small`` keeps its own distinct, so ``e`` stays a SET and
            # every round (and the convergence signature) is identical —
            # one full exchange per round removed (guide §2.4)
        )
        # small-star: canonicalize to (hi, lo), hang each lo-neighbor
        # (and hi itself) off the minimum
        canon = large.select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
        )
        g2 = canon.groupBy("u").agg(
            F.min("v").alias("m"), F.collect_set("v").alias("ns")
        )
        small = (
            g2.select(
                "u",
                "m",
                F.explode(F.array_union(F.col("ns"), F.array(F.col("u")))).alias("v"),
            )
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("src"), F.col("m").alias("dst"))
            .distinct()
            .localCheckpoint()
        )
        sig_row = small.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
        ).head()
        sig = (sig_row["n"], sig_row["h"])
        e = small
        if sig == prev_sig:
            break
        prev_sig = sig
    key_col = nodes.columns[0]
    verts = nodes.select(F.col(key_col).alias("key")).distinct()
    roots = e.select(F.col("src").alias("key"), F.col("dst").alias("component"))
    return verts.join(roots, "key", "left").select(
        "key", F.coalesce(F.col("component"), F.col("key")).alias("component")
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """(key, rank) after a fixed number of power iterations.

    Matches the classic GraphX formulation: rank = (1-d) + d * Σ
    incoming rank/out_degree; dangling nodes keep their base rank.
    """
    e = edges.select("src", "dst")
    if nodes is None:
        verts = (
            e.select(F.col("src").alias("key"))
            .unionByName(e.select(F.col("dst").alias("key")))
            .distinct()
        )
    else:
        verts = nodes.select(F.col(nodes.columns[0]).alias("key")).distinct()
    verts = verts.localCheckpoint()
    # the edge table is partitioned on src ONCE, up front: the
    # out-degree aggregate and its join back reuse that single
    # exchange during SETUP.  Honesty note (r7 finding): the
    # checkpointed `links` scans as UnknownPartitioning, so each
    # ITERATION's join still re-exchanges it — on the small corpus
    # graph this is sub-noise; converting to partitioned_cache (the
    # Louvain fix) is the lever if a big graph ever lands here, but
    # beware: cached stats let AQE broadcast the rank side, and a
    # per-iteration rank broadcast measured 1.5-2s SLOWER on the
    # corpus graph (driver collect + rebroadcast each round).
    # grouped-double-sum caveat: rank contributions sum as doubles, so
    # any layout change can move float partial order; g41 is
    # rows-only-by-design for exactly this reason.
    n_shuffle = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    e_p = e.repartition(n_shuffle, "src")
    out_deg = e_p.groupBy(F.col("src").alias("key")).agg(
        F.count("*").alias("out_degree")
    )
    links = (
        e_p.join(out_deg, e_p["src"] == out_deg["key"])
        .select("src", "dst", "out_degree")
        .localCheckpoint()
    )
    ranks = verts.withColumn("rank", F.lit(1.0))
    for _ in range(iterations):
        contribs = (
            links.join(ranks, links["src"] == ranks["key"])
            .select(
                F.col("dst").alias("key"),
                (F.col("rank") / F.col("out_degree")).alias("contrib"),
            )
            .groupBy("key")
            .agg(F.sum("contrib").alias("contrib"))
        )
        ranks = (
            verts.join(contribs, "key", "left")
            .select(
                "key",
                (F.lit(1.0 - damping)
                 + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                 ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def k_core(nodes: DataFrame, edges: DataFrame, k: int, max_iter: int = 100) -> DataFrame:
    """(key) — vertices of the k-core: the maximal subgraph where every
    vertex has undirected degree ≥ k.  Iterative peel: drop sub-k
    vertices, recompute degrees, repeat to a fixed point — each round
    one degree aggregation + two semi-joins; rounds bounded by the
    peeling depth (small for provenance graphs).
    """
    key_col = nodes.columns[0]
    und = (
        _as_undirected(edges)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    remaining = nodes.select(F.col(key_col).alias("key")).distinct().localCheckpoint()
    for _ in range(max_iter):
        e = (
            und.join(remaining.select(F.col("key").alias("src")), "src", "left_semi")
            .join(remaining.select(F.col("key").alias("dst")), "dst", "left_semi")
        )
        deg = e.groupBy(F.col("src").alias("key")).agg(F.count("*").alias("deg"))
        keep = (
            remaining.join(deg, "key", "left")
            .filter(F.coalesce(F.col("deg"), F.lit(0)) >= k)
            .select("key")
            .localCheckpoint()
        )
        if keep.count() == remaining.count():
            break
        remaining = keep
    return remaining


def core_decomposition(
    nodes: DataFrame, edges: DataFrame, max_core: int = 100
) -> DataFrame:
    """``(v, coreness)`` — every vertex's core number: the largest k
    such that v survives in the k-core (Batagelj–Zaveršnik semantics,
    computed by staged peeling).

    Outer loop over k = 1, 2, …: peel the current remainder (already
    the (k-1)-core) down to the k-core; vertices peeled at stage k
    have coreness k-1.  Each peel round is one degree aggregation +
    semi-joins on a monotonically SHRINKING vertex set, so total work
    is bounded by (max coreness) × (peel depth) rounds over
    ever-smaller frames — the standard distributed coreness shape.
    Degeneracy-ordered or Montresor-style asynchronous variants cut
    round counts further at extreme scale; the staged peel keeps every
    step a plain aggregate.
    """
    key_col = nodes.columns[0]
    und = (
        _as_undirected(edges)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    remaining = (
        nodes.select(F.col(key_col).alias("key")).distinct().localCheckpoint()
    )
    spark = nodes.sparkSession
    out = spark.createDataFrame([], "v string, coreness int").localCheckpoint()
    for k in range(1, max_core + 1):
        survivors = remaining
        while True:
            e = (
                und.join(
                    survivors.select(F.col("key").alias("src")), "src", "left_semi"
                ).join(
                    survivors.select(F.col("key").alias("dst")), "dst", "left_semi"
                )
            )
            deg = e.groupBy(F.col("src").alias("key")).agg(
                F.count("*").alias("deg")
            )
            keep = (
                survivors.join(deg, "key", "left")
                .filter(F.coalesce(F.col("deg"), F.lit(0)) >= k)
                .select("key")
                .localCheckpoint()
            )
            if keep.count() == survivors.count():
                break
            survivors = keep
        peeled = remaining.join(survivors, "key", "left_anti").select(
            F.col("key").alias("v"), F.lit(k - 1).cast("int").alias("coreness")
        )
        out = out.unionByName(peeled).localCheckpoint()
        remaining = survivors
        if remaining.isEmpty():
            break
    return out


def strongly_connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_outer: int = 25,
    max_prop: int = 50,
) -> DataFrame:
    """(key, component) — component = min key of the vertex's strongly-
    connected component.  ColorSCC: per round, propagate the MIN vertex
    id forward to a fixed point (``color(v)`` = min id that can reach
    v); color roots (``color(v) == v``) anchor their SCC, which is the
    backward closure from the root restricted to its color class; all
    roots' SCCs extract in parallel per round, extracted vertices leave
    the graph, repeat.  Trivial (single-vertex) SCCs — the vast
    majority in provenance DAGs — drain in the first rounds, so the
    outer loop runs O(condensation depth) times, each round costing
    O(diameter) joins.  Every step is a DataFrame join/agg — no
    driver-side graph state.
    """
    key_col = nodes.columns[0]
    remaining = nodes.select(F.col(key_col).alias("key")).distinct().localCheckpoint()
    e_all = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct().localCheckpoint()
    parts: list[DataFrame] = []

    def trim(rem: DataFrame, e: DataFrame):
        """Bulk-peel trivial SCCs: a vertex with no incoming or no
        outgoing edge (within the remaining graph) cannot be on a
        cycle.  Peeling exposes new such vertices, so iterate to a
        fixed point — a DAG (the overwhelmingly common provenance
        shape) drains here entirely in ~depth/2 cheap rounds and the
        expensive coloring loop below never touches it."""
        while not rem.isEmpty():
            has_in = e.select(F.col("dst").alias("key")).distinct()
            has_out = e.select(F.col("src").alias("key")).distinct()
            keep = (
                rem.join(has_in, "key", "left_semi")
                .join(has_out, "key", "left_semi")
                .localCheckpoint()
            )
            trivial = rem.join(keep, "key", "left_anti")
            if trivial.isEmpty():
                break
            parts.append(
                trivial.select("key", F.col("key").alias("component")).localCheckpoint()
            )
            rem = keep
            e = (
                e.join(rem.select(F.col("key").alias("src")), "src", "left_semi")
                .join(rem.select(F.col("key").alias("dst")), "dst", "left_semi")
                .localCheckpoint()
            )
        return rem, e

    # self-loops are cycles of length 1 but carry no inter-vertex SCC
    # structure; with them filtered from e_all they trim as trivial,
    # which is correct (a self-loop vertex is its own SCC)
    remaining, e_rem = trim(remaining, e_all)
    for _ in range(max_outer):
        if remaining.isEmpty():
            break
        e = e_rem
        # forward min-propagation to fixed point: color(v) = min id
        # reaching v (including v itself)
        color = remaining.withColumn("color", F.col("key")).localCheckpoint()
        for _ in range(max_prop):
            msgs = (
                color.join(e, color["key"] == e["src"])
                .select(F.col("dst").alias("key"), "color")
            )
            new_color = (
                color.select("key", "color").unionByName(msgs)
                .groupBy("key")
                .agg(F.min("color").alias("color"))
                .localCheckpoint()
            )
            changed = (
                new_color.alias("n")
                .join(color.alias("o"), "key")
                .filter(F.col("n.color") != F.col("o.color"))
            )
            color = new_color
            if changed.isEmpty():
                break
        # SCC of root r = backward closure of r within color class r
        assigned = (
            color.filter(F.col("color") == F.col("key"))
            .select("key", F.col("key").alias("component"))
            .localCheckpoint()
        )
        frontier = assigned
        while True:
            preds = (
                frontier.join(e, frontier["key"] == e["dst"])
                .select(F.col("src").alias("key"), "component")
                .distinct()
            )
            preds = (
                preds.join(color, "key")
                .filter(F.col("color") == F.col("component"))
                .select("key", "component")
                .join(assigned.select("key"), "key", "left_anti")
                .localCheckpoint()
            )
            if preds.isEmpty():
                break
            assigned = assigned.unionByName(preds).localCheckpoint()
            frontier = preds
        parts.append(assigned)
        remaining = remaining.join(
            assigned.select("key"), "key", "left_anti"
        ).localCheckpoint()
        e_rem = (
            e.join(remaining.select(F.col("key").alias("src")), "src", "left_semi")
            .join(remaining.select(F.col("key").alias("dst")), "dst", "left_semi")
            .localCheckpoint()
        )
        # extraction exposes new zero-degree vertices — re-trim before
        # paying for another coloring fixed point
        remaining, e_rem = trim(remaining, e_rem)
    from functools import reduce

    return reduce(DataFrame.unionByName, parts)


def betweenness_approx(
    nodes: DataFrame,
    edges: DataFrame,
    n_samples: int = 8,
    max_hops: int = 32,
    directed: bool = True,
) -> DataFrame:
    """(key, betweenness) — Brandes sampled approximation, ALL pivots
    advanced in one tagged multi-source sweep.

    Exact betweenness is one Brandes sweep per vertex (O(V·E) total);
    the standard scale answer samples ``n_samples`` pivot sources
    (deterministically, by md5(key) order — reproducible) and scales
    the accumulated dependencies by V/k.  Frontier rows carry their
    pivot tag (the :func:`closeness_approx` formulation, whose
    docstring measured 3× vs per-pivot sweeps), so the forward σ pass
    and the level-synchronous backward δ pass
    (δ(u) += σ(u)/σ(v)·(1+δ(v)) over each pivot's shortest-path DAG)
    both run O(max_depth) join/agg rounds TOTAL — the driver-side job
    count is independent of ``n_samples``, which dominates wall-clock
    at cluster scale.  A pivot with a shallower BFS than the global
    max simply contributes no rows at the deeper levels.
    """
    key_col = nodes.columns[0]
    verts = nodes.select(F.col(key_col).alias("key")).distinct().localCheckpoint()
    e = (edges.select("src", "dst") if directed else _as_undirected(edges)).distinct().localCheckpoint()
    n_vertices = verts.count()
    pivots = [
        r["key"]
        for r in verts.withColumn("__h", F.md5(F.col("key")))
        .orderBy("__h")
        .limit(n_samples)
        .collect()
    ]
    spark = edges.sparkSession
    acc = verts.withColumn("betweenness", F.lit(0.0)).localCheckpoint()
    if not pivots:
        return acc.select("key", "betweenness")
    # forward pass: tagged path counts σ per (pivot, key), one level of
    # ALL pivots per round; levels[h] = (pivot, key, sigma)
    level = (
        spark.createDataFrame([(p,) for p in pivots], ["pivot"])
        .select("pivot", F.col("pivot").alias("key"))
        .withColumn("sigma", F.lit(1.0))
        .localCheckpoint()
    )
    levels = [level]
    seen = level.select("pivot", "key").localCheckpoint()
    for _ in range(max_hops):
        nxt = (
            level.join(e, level["key"] == e["src"])
            .groupBy("pivot", F.col("dst").alias("k2"))
            .agg(F.sum("sigma").alias("sigma"))
            .select("pivot", F.col("k2").alias("key"), "sigma")
            .join(seen, ["pivot", "key"], "left_anti")
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        levels.append(nxt)
        seen = seen.unionByName(nxt.select("pivot", "key")).localCheckpoint()
        level = nxt
    # backward dependency sweep, level-synchronous across pivots
    delta = levels[-1].select(
        "pivot", "key", F.lit(0.0).alias("delta")
    ).localCheckpoint()
    for h in range(len(levels) - 1, 0, -1):
        child = levels[h].join(delta, ["pivot", "key"], "left").select(
            "pivot",
            "key",
            "sigma",
            F.coalesce(F.col("delta"), F.lit(0.0)).alias("delta"),
        )
        parent_sig = levels[h - 1]
        contribs = (
            parent_sig.join(e, parent_sig["key"] == e["src"])
            .join(
                child.select(
                    F.col("pivot").alias("c_pivot"),
                    F.col("key").alias("c_key"),
                    F.col("sigma").alias("c_sigma"),
                    F.col("delta").alias("c_delta"),
                ),
                (F.col("dst") == F.col("c_key"))
                & (parent_sig["pivot"] == F.col("c_pivot")),
            )
            .select(
                "pivot",
                "key",
                (
                    (F.col("sigma") / F.col("c_sigma"))
                    * (F.lit(1.0) + F.col("c_delta"))
                ).alias("contrib"),
            )
            .groupBy("pivot", "key")
            .agg(F.sum("contrib").alias("delta"))
            .localCheckpoint()
        )
        delta = contribs  # level h-1's dependencies, consumed next round
        if h - 1 > 0:  # each pivot's own dependency is not counted
            per_key = contribs.groupBy("key").agg(F.sum("delta").alias("__d"))
            acc = (
                acc.join(per_key, "key", "left")
                .select(
                    "key",
                    (
                        F.col("betweenness")
                        + F.coalesce(F.col("__d"), F.lit(0.0))
                    ).alias("betweenness"),
                )
                .localCheckpoint()
            )
    scale = float(n_vertices) / float(max(len(pivots), 1))
    return acc.select("key", (F.col("betweenness") * F.lit(scale)).alias("betweenness"))


def random_walks(
    edges: DataFrame,
    walks_per_node: int = 2,
    walk_length: int = 3,
) -> DataFrame:
    """Deterministic uniform random walks over the UNDIRECTED graph —
    training-data generation for node-embedding models (DeepWalk /
    node2vec p=q=1).  Returns ``(start, w, step, node)`` rows: walk
    ``w ∈ [0, walks_per_node)`` from each node, positions
    ``step ∈ [0, walk_length]`` (step 0 is the start node itself).

    Determinism (no RNG state, reproducible and oracle-checkable): the
    neighbor chosen at each step is
    ``nbrs[ md5_32(start|w|step|cur) mod degree(cur) ]`` over the
    SORTED distinct neighbor list — a counter-keyed hash, so the walk
    is a pure function of the graph.  Undirected means every visited
    node has ≥1 neighbor: no dead-end special case.

    100 TB shape: adjacency is one (src → sorted neighbor array)
    aggregate; each step is an equi-join of the walk frontier against
    it (frontier carries (start, w, cur) only — paths are emitted as
    rows, never accumulated into arrays).  With the adjacency table
    bucketed by src the per-step join is shuffle-free on the adjacency
    side; ``walk_length`` joins total, each frontier the same size
    (nodes × walks_per_node).  Hot-node skew is bounded: the frontier
    row count never grows, unlike BFS frontiers.

    Cache discipline: the output accumulator is chained-persisted each
    step (its cached data absorbs the prior steps' rows), so step s-1's
    frontier cache is RELEASED once step s materializes — peak cached
    state is ~2× the final output + two frontiers, never L frontiers.
    """
    und = _as_undirected(edges).distinct()
    adj = (
        und.groupBy("src")
        .agg(F.sort_array(F.collect_set("dst")).alias("nbrs"))
        .persist()  # probed by every step's join AND the union branches
    )
    frontier = adj.select(
        F.col("src").alias("start"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("w"),
        F.col("src").alias("cur"),
    )
    out = frontier.select("start", "w", F.lit(0).alias("step"),
                          F.col("cur").alias("node"))
    prev_f: DataFrame | None = None
    prev_out: DataFrame | None = None
    for step in range(1, walk_length + 1):
        key = F.concat_ws(
            "|", F.col("start"), F.col("w"), F.lit(step), F.col("cur")
        )
        h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")
        frontier = _chain_persist(
            frontier.join(adj, frontier["cur"] == adj["src"]).select(
                "start",
                "w",
                F.element_at(
                    F.col("nbrs"), (h % F.size("nbrs")).cast("int") + F.lit(1)
                ).alias("cur"),
            )
        )
        out = _chain_persist(
            out.unionByName(
                frontier.select("start", "w", F.lit(step).alias("step"),
                                F.col("cur").alias("node"))
            ),
            prev_out,
        )
        if prev_f is not None:
            prev_f.unpersist()  # its rows are baked into out's cache now
        prev_f, prev_out = frontier, out
    if prev_f is not None:
        prev_f.unpersist()
    adj.unpersist()
    return out


def weighted_random_walks(
    edges: DataFrame,
    walks_per_node: int = 2,
    walk_length: int = 3,
    weight_col: str = "w",
) -> DataFrame:
    """:func:`random_walks` with edge-weight-proportional transition
    probabilities (integer weights, e.g. interaction multiplicities) —
    still fully deterministic and oracle-checkable.

    Neighbor selection is EXACT integer arithmetic end-to-end: the
    adjacency build computes per-neighbor cumulative weights ONCE with
    a window cumsum over the exploded edges (O(degree) relational work,
    not O(degree²) per step), and each step picks
    ``nbrs[|{c ∈ cumw : c ≤ md5_32(start|w|step|cur) mod total}| + 1]``
    — no floating point anywhere, so any SQL engine replays the walk
    bit-for-bit.  Parallel edges merge by summing weights; the graph is
    made undirected first (each direction carries the edge's weight).

    100 TB shape: identical to :func:`random_walks` — walk_length
    equi-joins of a constant-size frontier against the (bucketed)
    adjacency; the per-step filter over the cumw array is O(degree)
    map-side work.
    """
    und = edges.select("src", "dst", weight_col).unionByName(
        edges.select(
            F.col("dst").alias("src"),
            F.col("src").alias("dst"),
            F.col(weight_col),
        )
    )
    wedges = und.groupBy("src", "dst").agg(
        F.sum(weight_col).cast("long").alias("w")
    )
    win = Window.partitionBy("src").orderBy("dst").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = wedges.withColumn("cumw", F.sum("w").over(win))
    adj = (
        cum.groupBy("src")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("dst", "cumw"))
            ).alias("arr")
        )
        .select(
            "src",
            F.transform("arr", lambda x: x["dst"]).alias("nbrs"),
            F.transform("arr", lambda x: x["cumw"]).alias("cumw"),
            F.element_at(F.transform("arr", lambda x: x["cumw"]), -1).alias(
                "total"
            ),
        )
        .persist()
    )
    frontier = adj.select(
        F.col("src").alias("start"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("w"),
        F.col("src").alias("cur"),
    )
    out = frontier.select(
        "start", "w", F.lit(0).alias("step"), F.col("cur").alias("node")
    )
    prev_f: DataFrame | None = None
    prev_out: DataFrame | None = None
    for step in range(1, walk_length + 1):
        key = F.concat_ws(
            "|", F.col("start"), F.col("w"), F.lit(step), F.col("cur")
        )
        h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")
        r = h % F.col("total")
        idx = F.size(F.filter("cumw", lambda c: c <= r)) + F.lit(1)
        frontier = _chain_persist(
            frontier.join(adj, frontier["cur"] == adj["src"]).select(
                "start",
                "w",
                F.element_at(F.col("nbrs"), idx).alias("cur"),
            )
        )
        out = _chain_persist(
            out.unionByName(
                frontier.select(
                    "start", "w", F.lit(step).alias("step"),
                    F.col("cur").alias("node"),
                )
            ),
            prev_out,
        )
        if prev_f is not None:
            prev_f.unpersist()
        prev_f, prev_out = frontier, out
    if prev_f is not None:
        prev_f.unpersist()
    adj.unpersist()
    return out


def node2vec_walks(
    edges: DataFrame,
    walks_per_node: int = 2,
    walk_length: int = 3,
    ret_w: int = 1,
    base_w: int = 1,
    far_w: int = 1,
) -> DataFrame:
    """node2vec second-order biased walks, fully deterministic.

    The transition out of ``cur`` (having arrived from ``prev``) weights
    each neighbor ``x`` by INTEGER bias weights — the node2vec
    ``(1/p, 1, 1/q)`` triple scaled to integers so selection stays
    exact-arithmetic and cross-engine replayable:

    * ``ret_w``  if ``x == prev``            (return, node2vec 1/p)
    * ``base_w`` if ``x ∈ N(prev)``          (stay close, weight 1)
    * ``far_w``  otherwise                   (explore, node2vec 1/q)

    Step 1 (no ``prev`` yet) is uniform, matching the reference
    implementation.  Selection: ``r = md5_32(start|w|step|cur) mod
    total`` then the first neighbor whose cumulative weight exceeds
    ``r`` — all int64, no floating point.

    Scale notes: the per-step weight/cum arrays are built by expression
    over the CURRENT row's neighbor list — O(degree²) per frontier row
    (membership test × neighbors).  That is the honest cost of exact
    second-order bias computed on the fly; production node2vec
    amortizes it with per-EDGE alias tables (O(Σ d_u·d̄) memory),
    which is the right trade only when walks/node ≫ 1.  The frontier
    itself stays constant-size and each step is two equi-joins against
    the (bucketed) adjacency — cur's list and prev's list.
    """
    if min(ret_w, base_w, far_w) < 1:
        raise ValueError("bias weights must be >= 1 (total must stay positive)")
    und = _as_undirected(edges).distinct()
    adj = (
        und.groupBy("src")
        .agg(F.sort_array(F.collect_set("dst")).alias("nbrs"))
        .persist()
    )
    frontier = adj.select(
        F.col("src").alias("start"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("w"),
        F.lit(None).cast("string").alias("prev"),
        F.col("src").alias("cur"),
    )
    out = frontier.select(
        "start", "w", F.lit(0).alias("step"), F.col("cur").alias("node")
    )
    a_cur = adj.select(F.col("src").alias("__cs"), F.col("nbrs").alias("__cn"))
    a_prev = adj.select(F.col("src").alias("__ps"), F.col("nbrs").alias("__pn"))
    prev_f: DataFrame | None = None
    prev_out: DataFrame | None = None
    for step in range(1, walk_length + 1):
        key = F.concat_ws(
            "|", F.col("start"), F.col("w"), F.lit(step), F.col("cur")
        )
        h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")
        weights = F.when(
            F.col("prev").isNull(),
            F.transform(F.col("__cn"), lambda x: F.lit(1).cast("long")),
        ).otherwise(
            F.transform(
                F.col("__cn"),
                lambda x: F.when(x == F.col("prev"), F.lit(ret_w))
                .when(F.array_contains(F.col("__pn"), x), F.lit(base_w))
                .otherwise(F.lit(far_w))
                .cast("long"),
            )
        )
        total = F.aggregate(weights, F.lit(0).cast("long"), lambda acc, x: acc + x)
        cum = F.transform(
            F.sequence(F.lit(1), F.size(weights)),
            lambda i: F.aggregate(
                F.slice(weights, 1, i), F.lit(0).cast("long"), lambda acc, x: acc + x
            ),
        )
        r = h % total
        idx = F.size(F.filter(cum, lambda c: c <= r)) + F.lit(1)
        # two-step select: computing the pick and renaming cur->prev in ONE
        # list would let Spark's lateral-column-alias resolution bind the
        # `prev` inside `weights` to the new alias instead of the input row
        frontier = _chain_persist(
            frontier.join(a_cur, frontier["cur"] == a_cur["__cs"])
            .join(a_prev, frontier["prev"] == a_prev["__ps"], "left")
            .select(
                "start", "w", "cur",
                F.element_at(F.col("__cn"), idx).alias("__next"),
            )
            .select(
                "start",
                "w",
                F.col("cur").alias("prev"),
                F.col("__next").alias("cur"),
            )
        )
        out = _chain_persist(
            out.unionByName(
                frontier.select(
                    "start", "w", F.lit(step).alias("step"),
                    F.col("cur").alias("node"),
                )
            ),
            prev_out,
        )
        if prev_f is not None:
            prev_f.unpersist()
        prev_f, prev_out = frontier, out
    if prev_f is not None:
        prev_f.unpersist()
    adj.unpersist()
    return out


def triangle_count(edges: DataFrame) -> int:
    """Number of triangles in the undirected graph.

    Canonicalize each edge to (min, max), then the classic two-join
    enumeration a<b<c — each triangle counted exactly once.  Shuffles:
    2 joins on node id; at scale pre-bucket the canonical edge table.
    """
    e = (
        _as_undirected(edges)
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    ab = e.select(F.col("a"), F.col("b"))
    bc = e.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    ac = e.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    return (
        ab.join(bc, ab["b"] == bc["b2"])
        .join(ac, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .count()
    )


def label_propagation(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 10
) -> DataFrame:
    """Community detection by synchronous label propagation.

    Each node adopts the most frequent label among its undirected
    neighbors (ties → smallest label, deterministic).  Fixed iteration
    count (LPA oscillates; GraphX's implementation is also fixed-iter).
    Returns (key, label).
    """
    # src-partitioned setup; repartition BEFORE distinct so the dedup
    # reuses the src exchange (subset rule) — one 2|E| shuffle, not
    # two.  Honesty note (r7): the checkpoint scans as
    # UnknownPartitioning, so per-round joins still re-exchange the
    # edge frame; sub-noise on the corpus graph, and partitioned_cache
    # is the measured fix if a big graph lands here (Louvain kernel).
    n_shuffle = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    e = (
        _as_undirected(edges)
        .repartition(n_shuffle, "src")
        .distinct()
        .localCheckpoint()
    )
    key_col = nodes.columns[0]
    labels = (
        nodes.select(F.col(key_col).alias("key")).distinct()
        .withColumn("label", F.col("key"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        msgs = (
            labels.join(e, labels["key"] == e["src"])
            .select(F.col("dst").alias("key"), "label")
        )
        votes = msgs.groupBy("key", "label").agg(F.count("*").alias("n"))
        mx = votes.groupBy("key").agg(F.max("n").alias("mx"))
        best = (
            votes.join(mx, "key")
            .filter(F.col("n") == F.col("mx"))
            .groupBy("key")
            .agg(F.min("label").alias("new_label"))  # ties → smallest label
        )
        labels = (
            labels.join(best, "key", "left")
            .select(
                "key", F.coalesce(F.col("new_label"), F.col("label")).alias("label")
            )
            .localCheckpoint()
        )
    return labels


def personalized_pagerank(
    edges: DataFrame,
    sources: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """(key, rank) — PageRank with the restart mass concentrated on
    ``sources`` (single-column DataFrame) instead of spread uniformly:

        rank = (1-d)·restart(v) + d·Σ_{u→v} rank(u)/out_degree(u)

    where restart(v) = 1/|S| for source vertices, 0 elsewhere.  The
    stationary mass therefore measures proximity TO the sources — the
    standard "relatedness" primitive for seed-expansion (find processes
    most reachable from a known-bad seed set, docs related to a query
    set, etc.).

    Same execution shape as :func:`pagerank`: one co-partitioned
    join + one grouped sum per iteration; dangling mass is dropped (not
    redistributed), matching the GraphX ``personalizedPageRank``
    convention.  The Python oracle in tests mirrors this exactly.
    """
    e = edges.select("src", "dst")
    if nodes is None:
        verts = (
            e.select(F.col("src").alias("key"))
            .unionByName(e.select(F.col("dst").alias("key")))
            .distinct()
        )
    else:
        verts = nodes.select(F.col(nodes.columns[0]).alias("key")).distinct()
    verts = verts.localCheckpoint()
    # restart mass is assigned to DISTINCT sources, so |S| must be the
    # distinct count too — a duplicated source row must not deflate the
    # restart vector below sum=1
    src_distinct = (
        sources.select(F.col(sources.columns[0]).alias("key"))
        .distinct()
        .localCheckpoint()
    )
    n_src = src_distinct.count()
    restart = src_distinct.withColumn("restart", F.lit(1.0 / float(n_src)))
    base = verts.join(restart, "key", "left").select(
        "key", F.coalesce(F.col("restart"), F.lit(0.0)).alias("restart")
    ).localCheckpoint()
    # pagerank's layout discipline: one up-front src exchange reused by
    # the out-degree aggregate, the join back, and the per-round layout
    e_p = e.repartition(
        int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions")),
        "src",
    )
    out_deg = e_p.groupBy(F.col("src").alias("key")).agg(
        F.count("*").alias("out_degree")
    )
    links = (
        e_p.join(out_deg, e_p["src"] == out_deg["key"])
        .select("src", "dst", "out_degree")
        .localCheckpoint()
    )
    ranks = base.select("key", F.col("restart").alias("rank"))
    for _ in range(iterations):
        contribs = (
            links.join(ranks, links["src"] == ranks["key"])
            .select(
                F.col("dst").alias("key"),
                (F.col("rank") / F.col("out_degree")).alias("contrib"),
            )
            .groupBy("key")
            .agg(F.sum("contrib").alias("contrib"))
        )
        ranks = (
            base.join(contribs, "key", "left")
            .select(
                "key",
                (F.lit(1.0 - damping) * F.col("restart")
                 + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                 ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def sssp_weighted(
    edges: DataFrame,
    sources: DataFrame,
    weight_col: str = "w",
    directed: bool = True,
    max_iter: int = 50,
    with_pred: bool = False,
) -> DataFrame:
    """(key, dist) — single-source shortest paths with non-negative edge
    weights, frontier-style Bellman-Ford:

    each round relaxes only edges out of vertices whose distance
    improved last round (the delta frontier), takes the min candidate
    per destination, and merges improvements into the distance table.
    Converges in ≤ longest-shortest-path-hops rounds; each round is one
    co-partitioned join + one grouped min (two shuffles).  Unlike
    Dijkstra there is no priority queue — the standard trade for a
    BSP/dataflow engine (Pregel SSSP), and exact for non-negative
    weights.  ``max_iter`` bounds adversarial inputs; negative weights
    are rejected (a negative cycle would never converge).

    ``with_pred=True`` adds a ``pred`` column — the parent on one
    shortest path, tie-broken by min parent key via a struct-min, so
    the shortest-path tree is deterministic.  At the fixpoint every
    pred edge is tight (dist[pred] + w == dist[key]): any later
    improvement of pred's own distance re-improves — and re-parents —
    the child.
    """
    w = F.col(weight_col).cast("double")
    if directed:
        e = edges.select("src", "dst", w.alias("w"))
    else:
        e = edges.select("src", "dst", w.alias("w")).unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), w.alias("w")
            )
        )
    e = e.localCheckpoint()
    if not e.filter(F.col("w") < 0).isEmpty():
        raise ValueError("sssp_weighted requires non-negative weights")
    dist = (
        sources.select(F.col(sources.columns[0]).alias("key")).distinct()
        .withColumn("dist", F.lit(0.0))
        .withColumn("pred", F.lit(None).cast(e.schema["src"].dataType))
        .localCheckpoint()
    )
    frontier = dist
    for _ in range(max_iter):
        cand = (
            frontier.join(e, frontier["key"] == e["src"])
            .select(
                F.col("dst").alias("key"),
                (F.col("dist") + F.col("w")).alias("cand"),
                frontier["key"].alias("parent"),
            )
            .groupBy("key")
            # struct-min: least candidate distance, then least parent key
            .agg(F.min(F.struct("cand", "parent")).alias("m"))
            .select(
                "key", F.col("m.cand").alias("cand"), F.col("m.parent").alias("parent")
            )
        )
        improved = (
            cand.join(dist.select("key", "dist"), "key", "left")
            .filter(F.col("dist").isNull() | (F.col("cand") < F.col("dist")))
            .select(
                "key", F.col("cand").alias("dist"), F.col("parent").alias("pred")
            )
            .localCheckpoint()
        )
        if improved.isEmpty():
            break
        dist = (
            dist.join(improved.select("key"), "key", "left_anti")
            .unionByName(improved)
            .localCheckpoint()
        )
        frontier = improved
    return dist if with_pred else dist.select("key", "dist")


def sssp_weighted_paths(
    edges: DataFrame,
    sources: DataFrame,
    targets: DataFrame | None = None,
    weight_col: str = "w",
    directed: bool = True,
    max_iter: int = 50,
) -> DataFrame:
    """(key, dist, path) — weighted shortest paths WITH reconstruction:
    :func:`sssp_weighted`'s predecessor tree + the level-synchronous
    backtrace of :func:`_backtrace_paths`.  ``targets`` limits path
    materialization (Σ|path| bytes is the real cost at scale).  Caveat:
    zero-weight cycles can make the pred forest cyclic; the backtrace
    round bound cuts such walks rather than looping forever."""
    tree = sssp_weighted(
        edges, sources, weight_col=weight_col, directed=directed,
        max_iter=max_iter, with_pred=True,
    )
    if targets is None:
        return _backtrace_paths_doubling(tree)
    return _backtrace_paths(tree, targets=targets)


def k_truss(edges: DataFrame, k: int, max_iter: int = 30) -> DataFrame:
    """(src, dst) — edges of the k-truss: the maximal subgraph in which
    every edge participates in ≥ k-2 triangles (undirected, simple).

    Iterative peel, the truss analogue of :func:`k_core`: per round,
    count each surviving edge's triangle support with two hash joins
    over the canonical (lo<hi) edge list, drop edges below k-2, repeat
    to a fixed point.  Support counting is the standard
    node-iterator join (adjacency ⋈ adjacency on the shared endpoint,
    then a semi-join back onto the edge list); every step is a shuffle
    join Catalyst plans — no driver-side adjacency.  Rounds are bounded
    by the peeling depth.  Returns canonical src < dst pairs.
    """
    canon = (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    while max_iter > 0:
        max_iter -= 1
        # adjacency both ways: wedge (a<b, b<c) centered anywhere
        und = canon.unionByName(
            canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        # triangle (u,v,w): for edge (u,v), count common neighbors w
        a = und.select(F.col("src").alias("u"), F.col("dst").alias("w"))
        b = und.select(F.col("src").alias("v"), F.col("dst").alias("w2"))
        support = (
            canon.join(a, canon["src"] == a["u"])
            .join(b, (canon["dst"] == b["v"]) & (F.col("w") == F.col("w2")))
            .groupBy(canon["src"], canon["dst"])
            .agg(F.count("*").alias("support"))
        )
        keep = (
            canon.join(support, ["src", "dst"], "left")
            .filter(F.coalesce(F.col("support"), F.lit(0)) >= k - 2)
            .select("src", "dst")
            .localCheckpoint()
        )
        if keep.count() == canon.count():
            break
        canon = keep
    return canon


def temporal_bfs(
    edges: DataFrame,
    sources: DataFrame,
    time_col: str = "t",
    max_iter: int = 50,
) -> DataFrame:
    """(key, earliest) — earliest-arrival reachability over a temporal
    graph: a path is valid only if edge timestamps are non-decreasing
    along it (you can't ride an edge that fired before you arrived).

    The fixpoint state is the earliest arrival time per vertex; each
    round relaxes only edges out of vertices improved last round, with
    the constraint ``edge.t >= arrival(src)``, candidate arrival =
    ``edge.t``.  This is the standard time-respecting-path semantics
    (Holme & Saramäki, "Temporal networks") that plain BFS gets wrong —
    reachability through a node depends on WHEN you got there.
    Sources start at arrival −∞ (they can take any first edge).
    Same execution shape as :func:`sssp_weighted`: one co-partitioned
    join + one grouped min per round.
    """
    e = edges.select("src", "dst", F.col(time_col).cast("long").alias("t"))
    e = e.localCheckpoint()
    neg_inf = F.lit(-(1 << 62)).cast("long")
    arrive = (
        sources.select(F.col(sources.columns[0]).alias("key")).distinct()
        .withColumn("earliest", neg_inf)
        .localCheckpoint()
    )
    frontier = arrive
    for _ in range(max_iter):
        cand = (
            frontier.join(e, frontier["key"] == e["src"])
            .filter(F.col("t") >= F.col("earliest"))
            .select(F.col("dst").alias("key"), F.col("t").alias("cand"))
            .groupBy("key")
            .agg(F.min("cand").alias("cand"))
        )
        improved = (
            cand.join(arrive, "key", "left")
            .filter(F.col("earliest").isNull() | (F.col("cand") < F.col("earliest")))
            .select("key", F.col("cand").alias("earliest"))
            .localCheckpoint()
        )
        if improved.isEmpty():
            break
        arrive = (
            arrive.join(improved.select("key"), "key", "left_anti")
            .unionByName(improved)
            .localCheckpoint()
        )
        frontier = improved
    return arrive


def closeness_approx(
    nodes: DataFrame,
    edges: DataFrame,
    n_samples: int = 8,
    max_hops: int = 32,
    directed: bool = True,
) -> DataFrame:
    """(key, closeness) — pivot-sampled harmonic closeness centrality:

        closeness(v) = Σ_pivots 1/dist(pivot → v), scaled by V/k

    (harmonic form, Boldi & Vigna "Axioms for centrality": sums of
    reciprocal distances handle disconnected graphs without the ∞-mean
    problem of classic closeness).  Pivots are the ``n_samples``
    smallest md5(key) vertices — deterministic and reproducible, the
    same convention as :func:`betweenness_approx`.  Cost is one
    multi-source-tagged BFS per pivot, each O(diameter) join/agg
    rounds; the reciprocal-distance sum accumulates in a (key, pivot)
    long table folded once at the end, so per-round state is one
    frontier DataFrame.
    """
    key_col = nodes.columns[0]
    verts = nodes.select(F.col(key_col).alias("key")).distinct().localCheckpoint()
    n_vertices = verts.count()
    pivots = [
        r["key"]
        for r in verts.withColumn("__h", F.md5(F.col("key")))
        .orderBy("__h")
        .limit(n_samples)
        .collect()
    ]
    spark = edges.sparkSession
    e = (edges.select("src", "dst") if directed else _as_undirected(edges)).localCheckpoint()
    # ONE tagged multi-source BFS: frontier rows carry their pivot, so
    # all k sweeps advance together — k× fewer rounds/jobs than looping
    # pivots, and each round is still a single co-partitioned join
    visited = (
        spark.createDataFrame([(p,) for p in pivots], ["pivot"])
        .select("pivot", F.col("pivot").alias("key"))
        .withColumn("dist", F.lit(0))
        .localCheckpoint()
    )
    frontier = visited
    hop = 0
    while hop < max_hops:
        hop += 1
        nxt = (
            frontier.join(e, frontier["key"] == e["src"])
            .select("pivot", F.col("dst").alias("key"))
            .distinct()
            .join(visited.select("pivot", "key"), ["pivot", "key"], "left_anti")
            .withColumn("dist", F.lit(hop))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    scale = float(n_vertices) / float(len(pivots)) if pivots else 0.0
    summed = (
        visited.filter(F.col("dist") > 0)
        .groupBy("key")
        .agg((F.sum(F.lit(1.0) / F.col("dist")) * F.lit(scale)).alias("closeness"))
    )
    return verts.join(summed, "key", "left").select(
        "key", F.coalesce(F.col("closeness"), F.lit(0.0)).alias("closeness")
    )


def pagerank_weighted(
    edges: DataFrame,
    weight_col: str = "w",
    iterations: int = 10,
    damping: float = 0.85,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """(key, rank) — PageRank over WEIGHTED edges: a vertex splits its
    rank across out-edges proportionally to edge weight
    (contribution = rank · w/Σ_out w) instead of uniformly.  The
    natural formulation for co-occurrence / co-purchase graphs where
    edge multiplicity is signal.  Same execution shape as
    :func:`pagerank`: the weighted out-degree joins once up front, then
    one co-partitioned join + grouped sum per iteration.
    """
    w = F.col(weight_col).cast("double")
    e = edges.select("src", "dst", w.alias("w")).filter(F.col("w") > 0)
    if nodes is None:
        verts = (
            e.select(F.col("src").alias("key"))
            .unionByName(e.select(F.col("dst").alias("key")))
            .distinct()
        )
    else:
        verts = nodes.select(F.col(nodes.columns[0]).alias("key")).distinct()
    verts = verts.localCheckpoint()
    # same layout discipline as pagerank: one up-front src exchange
    # reused by the out-weight aggregate, the join back, and the
    # checkpointed per-round layout (same no-per-round-broadcast
    # decision — see pagerank)
    n_shuffle = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    e_p = e.repartition(n_shuffle, "src")
    out_w = e_p.groupBy(F.col("src").alias("key")).agg(
        F.sum("w").alias("out_w")
    )
    links = (
        e_p.join(out_w, e_p["src"] == out_w["key"])
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("frac"))
        .localCheckpoint()
    )
    ranks = verts.withColumn("rank", F.lit(1.0))
    for _ in range(iterations):
        contribs = (
            links.join(ranks, links["src"] == ranks["key"])
            .select(
                F.col("dst").alias("key"),
                (F.col("rank") * F.col("frac")).alias("contrib"),
            )
            .groupBy("key")
            .agg(F.sum("contrib").alias("contrib"))
        )
        ranks = (
            verts.join(contribs, "key", "left")
            .select(
                "key",
                (F.lit(1.0 - damping)
                 + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                 ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def densest_subgraph(
    edges: DataFrame, epsilon: float = 0.1, max_iter: int = 50
) -> tuple[DataFrame, float]:
    """(vertices DataFrame, density) — greedy densest-subgraph
    2(1+ε)-approximation (Bahmani, Kumar & Vassilvitskii, "Densest
    Subgraph in Streaming and MapReduce", VLDB 2012):

    repeat: compute average degree ρ of the current subgraph; remove
    EVERY vertex with degree ≤ (1+ε)·ρ at once; keep the iterate with
    the best density seen.  Each round is one degree aggregation + two
    semi-joins, and the vertex set shrinks geometrically — O(log n)
    rounds total, the property that makes this THE dataflow-friendly
    densest-subgraph algorithm (sequential Charikar peeling is O(n)
    rounds).  Undirected simple graph; density = |E|/|V|.

    Driver actions per round: ONE combined (|V|, Σdeg) aggregate over
    the degree table (|E| = Σdeg/2 by the handshake lemma) — no
    separate edge count / vertex count / emptiness probe.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    cur_edges = und
    best_verts: DataFrame | None = None
    best_density = -1.0
    for _ in range(max_iter):
        deg = (
            cur_edges.select(F.col("src").alias("key"))
            .unionByName(cur_edges.select(F.col("dst").alias("key")))
            .groupBy("key")
            .agg(F.count("*").alias("deg"))
            .localCheckpoint()
        )
        stats = deg.agg(
            F.count("*").alias("n_v"), F.sum("deg").alias("sum_deg")
        ).head()
        n_v = stats["n_v"]
        if not n_v:
            break
        n_e = int(stats["sum_deg"]) // 2  # handshake lemma
        density = n_e / n_v
        if density > best_density:
            best_density = density
            best_verts = deg.select("key")
        threshold = (1.0 + epsilon) * 2.0 * density  # avg degree = 2|E|/|V|
        # peel: strictly fewer vertices survive every round (not every
        # degree can exceed (1+eps) x the average), so an empty keep set
        # simply yields an empty degree table next round
        keep = deg.filter(F.col("deg") > threshold).select("key").localCheckpoint()
        cur_edges = (
            cur_edges.join(keep.withColumnRenamed("key", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("key", "dst"), "dst", "left_semi")
            .localCheckpoint()
        )
    if best_verts is None:
        spark = edges.sparkSession
        return spark.createDataFrame([], "key string"), 0.0
    return best_verts, best_density


def four_clique_count(edges: DataFrame) -> DataFrame:
    """Number of 4-cliques in the undirected graph as a 1-row DataFrame
    ``(n_4cliques)`` — the next motif up from `triangle_count` (dense
    community / collusion detection).

    Canonical orientation a<b<c<d makes every clique enumerate exactly
    once and keeps each join a strictly-growing equi-join (the ordered
    orientation is the same trick worst-case-optimal engines use to cut
    the search space; at scale, orienting by DEGREE order instead of id
    order further caps the fan-out of hub nodes).  Shape: triangle
    enumeration (2 joins) + one extension join checking the 3 closing
    edges — all equi-joins on node ids over one canonical edge table,
    which AQE can broadcast when the graph is small and which should be
    pre-bucketed by src at 100 TB.
    """
    e = (
        _as_undirected(edges)
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    ab = e.select(F.col("a"), F.col("b"))
    bc = e.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    ac = e.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = (
        ab.join(bc, ab["b"] == bc["b2"])
        .join(ac, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    # broadcast the (small) canonical edge table into every extension
    # join: the HUGE side is the triangle/extension intermediate, and
    # broadcasting e means it streams through build-side hash joins
    # without ever shuffling (at true scale switch to bucketed e)
    ad = F.broadcast(e.select(F.col("a").alias("a4"), F.col("b").alias("d")))
    bd = F.broadcast(e.select(F.col("a").alias("b5"), F.col("b").alias("d5")))
    cd = F.broadcast(e.select(F.col("a").alias("c6"), F.col("b").alias("d6")))
    return (
        tri.join(ad, (F.col("a") == F.col("a4")) & (F.col("c") < F.col("d")))
        .join(bd, (F.col("b") == F.col("b5")) & (F.col("d") == F.col("d5")))
        .join(cd, (F.col("c") == F.col("c6")) & (F.col("d") == F.col("d6")))
        .agg(F.count("*").cast("bigint").alias("n_4cliques"))
    )


def butterfly_count(edges: DataFrame, hub_cap: int | None = None) -> DataFrame:
    """Bipartite 4-cycle ("butterfly") count as a 1-row DataFrame
    ``(n_butterflies, copart_pairs)`` — the bipartite analogue of
    :func:`triangle_count` (Sanei-Mehri, Sariyüce & Tirthapura, KDD
    2018: "Butterfly Counting in Bipartite Networks").

    ``edges`` is a bipartite edge list ``(src, dst)`` (e.g. supplier →
    part).  A butterfly is two left vertices sharing two right
    vertices; counting goes through WEDGES: for every right vertex,
    enumerate left-pairs that share it, aggregate the pair-overlap
    ``n``, and sum ``C(n, 2)`` — never materializing 4-tuples.  All
    arithmetic is exact bigint.

    Scale shape: the wedge enumeration is quadratic in each right
    vertex's degree, so at 100 TB pick the side with the smaller
    sum-of-degree-squares as the pivot and cap runaway hubs —
    ``hub_cap`` drops right vertices with degree above the cap (the
    same df-cap idea as ``ngram_jaccard_pairs``; a vertex connected to
    everything contributes no discriminative structure, only O(d²)
    wedges).  One distinct + one self-join on the pivot key + two
    hash-aggs; the per-pair aggregate is map-side combinable.
    """
    e = edges.select("src", "dst").distinct()
    if hub_cap is not None:
        deg = e.groupBy("dst").agg(F.count("*").alias("d"))
        keep = deg.filter(F.col("d") <= hub_cap).select("dst")
        e = e.join(F.broadcast(keep), "dst", "left_semi")
    a = e.select(F.col("src").alias("u"), "dst")
    b = e.select(F.col("src").alias("v"), "dst")
    pair_overlap = (
        a.join(b, "dst")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    return pair_overlap.agg(
        F.sum(F.expr("(n * (n - 1)) div 2")).cast("bigint").alias("n_butterflies"),
        F.count("*").cast("bigint").alias("copart_pairs"),
    )


def minimum_spanning_forest(
    edges: DataFrame,
    weight_col: str = "w",
    max_iter: int = 25,
) -> DataFrame:
    """Minimum spanning forest via distributed Borůvka — ``(u, v, w)``
    forest edges (one tree per connected component).

    Borůvka is THE MST algorithm that parallelizes: every round, each
    component picks its minimum-weight outgoing edge (all components at
    once — two joins + one min-by aggregate), the chosen edges merge
    components, repeat; components at least halve per round, so O(log
    n) rounds.  Contraction uses
    :func:`connected_components_twophase` on the component graph
    (itself O(log n), diameter-independent), never touching the full
    edge list.

    Ties are broken by the global total order ``(w, u, v)`` —
    equivalent to perturbing weights to distinctness, so the forest is
    deterministic and its total weight is the (unique) MST weight.
    Weights compare as-is; pass exact integers for cross-engine
    determinism.

    Scale shape: per round, one join of the edge list against the
    (shrinking) label table + a map-side-combinable min-by per
    component; the label table is the only state.  At 100 TB bucket
    the edge list by src so the label joins co-locate.
    """
    e = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            F.col(weight_col).alias("w"),
        )
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
        .localCheckpoint()
    )
    labels = (
        e.select(F.col("u").alias("key"))
        .unionByName(e.select(F.col("v").alias("key")))
        .distinct()
        .withColumn("c", F.col("key"))
        .localCheckpoint()
    )
    spark = edges.sparkSession
    forest = spark.createDataFrame([], e.schema).localCheckpoint()
    for _ in range(max_iter):
        el = (
            e.join(labels.select(F.col("key").alias("u"), F.col("c").alias("cu")), "u")
            .join(labels.select(F.col("key").alias("v"), F.col("c").alias("cv")), "v")
            .filter(F.col("cu") != F.col("cv"))
        )
        pick = F.struct("w", "u", "v", "cu", "cv")
        cand = el.select(F.col("cu").alias("component"), pick.alias("s")).unionByName(
            el.select(F.col("cv").alias("component"), pick.alias("s"))
        )
        chosen = (
            cand.groupBy("component")
            .agg(F.min("s").alias("s"))
            .select("s.u", "s.v", "s.w", "s.cu", "s.cv")
            .localCheckpoint()
        )
        if chosen.isEmpty():
            break
        forest = forest.unionByName(
            chosen.select("u", "v", "w").distinct()
        ).localCheckpoint()
        # contract the component graph (two-phase: O(log n) rounds even
        # for chain-shaped merge patterns)
        cedges = chosen.select(F.col("cu").alias("src"), F.col("cv").alias("dst"))
        cnodes = labels.select(F.col("c").alias("key")).distinct()
        cmap = connected_components_twophase(cnodes, cedges).select(
            F.col("key").alias("c"), F.col("component").alias("c_new")
        )
        labels = (
            labels.join(cmap, "c", "left")
            .select("key", F.coalesce(F.col("c_new"), F.col("c")).alias("c"))
            .localCheckpoint()
        )
    return forest


def shortest_path_length_bidirectional(
    edges: DataFrame,
    src_key: str,
    dst_key: str,
    directed: bool = True,
    max_hops: int = 64,
) -> int | None:
    """Hop-count shortest path between two keys via MEET-IN-THE-MIDDLE
    BFS — the scale path for two-endpoint distance queries: each side
    explores ~b^(d/2) nodes instead of the single-sided b^d, so on a
    branching provenance graph the frontier (and every per-round
    shuffle) is the square root of the one-sided cost.

    Level-synchronous and exact: each round expands the SMALLER
    frontier by one hop (forward over ``src→dst``, backward over the
    reversed edges), records the best meeting distance
    ``min(dist_f + dist_b)`` over the visited-set intersection, and
    stops once ``depth_f + depth_b >= best`` — the standard proof that
    no shorter crossing can still appear.  Equality with the one-sided
    :func:`shortest_path_length` is pinned in tests/test_traversal.py.
    """
    if src_key == dst_key:
        return 0
    spark = edges.sparkSession
    e = edges.select("src", "dst") if directed else _as_undirected(edges)
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))

    def new_side(key):
        v = spark.createDataFrame([(key, 0)], ["key", "dist"]).localCheckpoint()
        return {"visited": v, "frontier": v, "depth": 0, "alive": True}

    fwd, bwd = new_side(src_key), new_side(dst_key)
    best: int | None = None
    for _ in range(2 * max_hops):
        # expand the cheaper side (smaller frontier) one level
        side, graph = (
            (fwd, e)
            if (not bwd["alive"])
            or (fwd["alive"] and fwd["frontier"].count() <= bwd["frontier"].count())
            else (bwd, rev)
        )
        if not side["alive"]:
            break
        nxt = (
            side["frontier"].join(graph, side["frontier"]["key"] == graph["src"])
            .select(F.col("dst").alias("key"))
            .distinct()
            .join(side["visited"].select("key"), "key", "left_anti")
            .withColumn("dist", F.lit(side["depth"] + 1))
            .localCheckpoint()
        )
        side["depth"] += 1
        if nxt.isEmpty():
            side["alive"] = False
            if not fwd["alive"] and not bwd["alive"]:
                break
        else:
            side["visited"] = side["visited"].unionByName(nxt).localCheckpoint()
            side["frontier"] = nxt
        meet = (
            fwd["visited"].alias("f")
            .join(bwd["visited"].alias("b"), "key")
            .agg(F.min(F.col("f.dist") + F.col("b.dist")).alias("d"))
            .head()["d"]
        )
        if meet is not None:
            best = meet if best is None else min(best, meet)
        # no shorter crossing can appear once the combined reached depth
        # meets the best known distance
        if best is not None and fwd["depth"] + bwd["depth"] >= best:
            return best
        if not fwd["alive"] and not bwd["alive"]:
            break
    return best


def shortest_path_bidirectional(
    edges: DataFrame,
    src_key: str,
    dst_key: str,
    directed: bool = True,
    max_hops: int = 64,
) -> list | None:
    """The actual shortest path ``[src, ..., dst]`` between two keys
    via meet-in-the-middle BFS with PATH RECONSTRUCTION — the scale
    plan for two-pinned-endpoint ``shortestPath`` queries: each side
    explores ~b^(d/2) nodes (square-root frontiers and shuffles vs the
    one-sided :func:`shortest_path`), and BOTH sides keep a
    predecessor forest so the answer is spliced from two backtraces at
    the meet frontier instead of re-running a full BFS.

    Deterministic end to end: each side's predecessor is the min
    frontier key among equal-distance parents (same rule as
    :func:`bfs_tree`), the meet node is the min key among the visited-
    set intersection realizing the optimal distance, and the expansion
    schedule (always the smaller frontier) depends only on the data.
    Termination mirrors :func:`shortest_path_length_bidirectional`:
    stop once ``depth_f + depth_b >= best`` — no shorter crossing can
    still appear.  Hop-distance equality with the one-sided BFS and
    path validity are pinned in tests/test_traversal.py.
    """
    if src_key == dst_key:
        return [src_key]
    spark = edges.sparkSession
    e = edges.select("src", "dst") if directed else _as_undirected(edges)
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    key_t = e.schema["src"].dataType

    def new_side(key):
        v = (
            spark.createDataFrame([(key, 0)], ["key", "dist"])
            .select(F.col("key").cast(key_t).alias("key"), "dist")
            .withColumn("pred", F.lit(None).cast(key_t))
            .localCheckpoint()
        )
        return {"visited": v, "frontier": v, "depth": 0, "alive": True}

    fwd, bwd = new_side(src_key), new_side(dst_key)
    best: int | None = None
    for _ in range(2 * max_hops):
        side, graph = (
            (fwd, e)
            if (not bwd["alive"])
            or (fwd["alive"] and fwd["frontier"].count() <= bwd["frontier"].count())
            else (bwd, rev)
        )
        if not side["alive"]:
            break
        nxt = (
            side["frontier"].join(graph, side["frontier"]["key"] == graph["src"])
            .select(F.col("dst").alias("key"), side["frontier"]["key"].alias("pred"))
            .groupBy("key")
            .agg(F.min("pred").alias("pred"))
            .join(side["visited"].select("key"), "key", "left_anti")
            .withColumn("dist", F.lit(side["depth"] + 1))
            .select("key", "dist", "pred")
            .localCheckpoint()
        )
        side["depth"] += 1
        if nxt.isEmpty():
            side["alive"] = False
            if not fwd["alive"] and not bwd["alive"]:
                break
        else:
            side["visited"] = side["visited"].unionByName(nxt).localCheckpoint()
            side["frontier"] = nxt
        meet = (
            fwd["visited"].alias("f")
            .join(bwd["visited"].alias("b"), "key")
            .agg(F.min(F.col("f.dist") + F.col("b.dist")).alias("d"))
            .head()["d"]
        )
        if meet is not None:
            best = meet if best is None else min(best, meet)
        if best is not None and fwd["depth"] + bwd["depth"] >= best:
            break
        if not fwd["alive"] and not bwd["alive"]:
            break
    if best is None or best > max_hops:
        return None
    # deterministic meet node: min key realizing the optimal crossing
    meet_row = (
        fwd["visited"].alias("f")
        .join(bwd["visited"].alias("b"), "key")
        .filter(F.col("f.dist") + F.col("b.dist") == F.lit(best))
        .orderBy("key")
        .select("key")
        .head()
    )
    meet_key = meet_row["key"]
    meet_df = fwd["visited"].sparkSession.createDataFrame(
        [(meet_key,)], ["key"]
    ).select(F.col("key").cast(key_t).alias("key"))
    f_path = list(
        _backtrace_paths(fwd["visited"], targets=meet_df).head()["path"]
    )  # [src .. meet]
    b_path = list(
        _backtrace_paths(bwd["visited"], targets=meet_df).head()["path"]
    )  # [dst .. meet] (backward tree is rooted at dst)
    return f_path + b_path[-2::-1]


def hyperball(
    edges: DataFrame,
    max_iters: int = 32,
    directed: bool = False,
) -> list[dict]:
    """Neighborhood function N(t) via HyperBall (Boldi & Vigna,
    "In-Core Computation of Geometric Centralities with HyperBall",
    2013): one m=256 HLL counter per node, grown by taking the
    register-wise MAX over neighbours each round — N(t) = Σ_v |B(v,t)|
    estimated in O(t_max) relational passes instead of n BFS runs.

    State is the NARROW mergeable form ``(key, bucket, reg)`` — n×m
    rows, never a wide 256-column aggregate — so every round is one
    equi-join (edges × changed registers) plus one map-side-combining
    ``groupBy(key, bucket).max(reg)``.  Semi-naive: only registers that
    INCREASED last round are re-propagated (max is idempotent, so the
    delta frontier is sufficient, mirroring :func:`bfs`).  Shuffle per
    round carries (key, bucket, reg) triples only; ``localCheckpoint``
    truncates lineage exactly like the other iterative operators.

    Returns one dict per completed radius t (t=0 is the singleton
    ball): ``{"t", "n_nodes", "sum_reg", "sum_harmonic", "est_nf"}``.
    ``sum_harmonic`` (Σ_v of the per-node exact-integer harmonic
    numerator) and ``sum_reg`` are EXACT integers — the bit-identical
    convergence/replica gate; ``est_nf`` = Σ_v est|B(v,t)| applies the
    same bias-corrected estimate as :func:`sketch.hll_estimate_from_registers`
    per node.  The effective diameter at fraction α is the smallest t
    with est_nf(t) ≥ α·est_nf(∞); see :func:`effective_diameter`.

    Reference parity: the reference engine exposes no distance-
    distribution operator at all (`/root/reference/events.py` is a
    loader); this is part of the analytics extension surface
    (SURVEY.md §2.D components/centralities row).
    """
    from graphdb_neo4j_spark.operators.sketch import (
        _HLL_LINEAR_MAX,
        _HLL_M,
        _HLL_NUM,
        _HLL_RHO_CAP,
        hll_bucket_rho,
    )

    e = edges.select("src", "dst") if directed else _as_undirected(edges)
    e = e.distinct().localCheckpoint()
    nodes = e.select(F.col("src").alias("key")).union(
        e.select(F.col("dst").alias("key"))
    ).distinct()
    bucket, rho = hll_bucket_rho(F.col("key"))
    state = nodes.select("key", bucket, rho.alias("reg")).localCheckpoint()
    frontier = state

    def _nf_row(st: DataFrame):
        # one action: per-node harmonic fold, then the global roll-up
        per_node = st.groupBy("key").agg(
            F.count("*").alias("n_buckets"),
            F.sum(
                F.expr(f"CAST(1 AS BIGINT) << ({_HLL_RHO_CAP} - reg)")
            ).alias("s_obs"),
            F.sum("reg").alias("reg_sum"),
        )
        zeros = F.lit(_HLL_M) - F.col("n_buckets")
        s_num = F.col("s_obs") + zeros * F.lit(1 << _HLL_RHO_CAP)
        raw = F.lit(_HLL_NUM) / s_num.cast("double")
        est = F.when(
            (raw <= F.lit(_HLL_LINEAR_MAX)) & (zeros > 0),
            F.lit(float(_HLL_M))
            * F.log(F.lit(float(_HLL_M)) / zeros.cast("double")),
        ).otherwise(raw)
        row = per_node.select(
            # per-node numerator is ≈ m·2^cap ≈ 2^58 — the GLOBAL sum
            # overflows int64 past ~1k nodes, so it rides as
            # decimal(38,0): still exact integer arithmetic
            s_num.cast("decimal(38,0)").alias("s_num"),
            est.alias("est"),
            F.col("reg_sum"),
        ).agg(
            F.count("*").alias("n_nodes"),
            F.sum("reg_sum").alias("sum_reg"),
            F.sum("s_num").alias("sum_harmonic"),
            F.sum("est").alias("est_nf"),
        ).head()
        return {
            "n_nodes": int(row["n_nodes"]),
            "sum_reg": int(row["sum_reg"]),
            "sum_harmonic": int(row["sum_harmonic"]),
            "est_nf": float(row["est_nf"]),
        }

    out = [{"t": 0, **_nf_row(state)}]
    for t in range(1, max_iters + 1):
        # explicit renames on both sides: at t=1 ``frontier`` IS
        # ``state`` (same checkpointed plan), and a using-column
        # self-join on shared attribute ids trips Spark's checkpoint
        # constraint propagation (NoSuchElementException: key not found)
        fr = frontier.select(
            F.col("key").alias("f_key"),
            F.col("bucket").alias("f_bucket"),
            F.col("reg").alias("f_reg"),
        )
        cand = (
            e.join(fr, e["dst"] == fr["f_key"])
            .groupBy(
                F.col("src").alias("key"), F.col("f_bucket").alias("bucket")
            )
            .agg(F.max("f_reg").alias("reg"))
        )
        old = state.select(
            F.col("key").alias("s_key"),
            F.col("bucket").alias("s_bucket"),
            F.col("reg").alias("old"),
        )
        improved = (
            cand.join(
                old,
                (cand["key"] == old["s_key"])
                & (cand["bucket"] == old["s_bucket"]),
                "left",
            )
            .filter(F.col("old").isNull() | (F.col("reg") > F.col("old")))
            .select("key", "bucket", "reg")
            .localCheckpoint()
        )
        if improved.isEmpty():
            break
        state = (
            state.unionByName(improved)
            .groupBy("key", "bucket")
            .agg(F.max("reg").alias("reg"))
            .localCheckpoint()
        )
        frontier = improved
        out.append({"t": t, **_nf_row(state)})
    return out


def effective_diameter(nf: list[dict], alpha: float = 0.9) -> int:
    """Smallest t whose estimated neighborhood function reaches
    ``alpha`` of the final (converged) value — HyperBall's effective-
    diameter readout.  ``nf`` is :func:`hyperball` output."""
    target = alpha * nf[-1]["est_nf"]
    for row in nf:
        if row["est_nf"] >= target:
            return int(row["t"])
    return int(nf[-1]["t"])


def modularity(
    edges: DataFrame,
    assign: DataFrame,
    key_col: str = "key",
    community_col: str = "community",
) -> DataFrame:
    """Newman modularity of a community assignment, per community:
    ``Q_c = L_c/m − (D_c/2m)²`` with L_c = intra-community edges,
    D_c = degree mass, m = |E| — Q = Σ_c Q_c (Newman & Girvan 2004).
    The quality readout for ANY community operator here (LPA, HashMin
    components, label joins).

    Fully relational — canonicalize+dedup edges, two broadcast-able
    joins against the assignment, two narrow aggregates, and the m
    scalar rides a 1×1 cross join so the whole metric stays one plan
    (no driver round-trip).  Shuffles carry (community) keyed rows
    only.  ``contribution`` is rounded to 8dp with a fixed expression
    order so a SQL oracle reproduces the doubles bit-for-bit."""
    e = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    a = assign.select(
        F.col(key_col).alias("k"), F.col(community_col).alias("c")
    ).distinct()
    m_agg = e.agg(F.count("*").cast("bigint").alias("m"))

    internal = (
        e.join(a.withColumnRenamed("k", "a").withColumnRenamed("c", "ca"), "a")
        .join(a.withColumnRenamed("k", "b").withColumnRenamed("c", "cb"), "b")
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count("*").cast("bigint").alias("internal_edges"))
    )
    deg = (
        e.select(F.col("a").alias("k"))
        .unionByName(e.select(F.col("b").alias("k")))
        .groupBy("k")
        .agg(F.count("*").alias("deg"))
    )
    dsum = (
        deg.join(a, "k")
        .groupBy(F.col("c").alias("community"))
        .agg(F.sum("deg").cast("bigint").alias("degree_sum"))
    )
    md = F.col("m").cast("double")
    contrib = F.round(
        F.col("internal_edges").cast("double") / md
        - (F.col("degree_sum").cast("double") * F.col("degree_sum").cast("double"))
        / (F.lit(4.0) * md * md),
        8,
    )
    return (
        dsum.join(internal, "community", "left")
        .withColumn("internal_edges", F.coalesce("internal_edges", F.lit(0).cast("bigint")))
        .crossJoin(m_agg)
        .select(
            "community",
            "internal_edges",
            "degree_sum",
            contrib.alias("contribution"),
        )
    )


def hits(
    edges: DataFrame,
    iters: int = 3,
    scale: int = 10**12,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg, JACM 1999) in EXACT
    fixed-point integer arithmetic — hash-gateable like q105's PageRank.

    Per iteration: authority(v) = Σ hub(u) over in-edges, hub(u) =
    Σ authority(v) over out-edges, each renormalized by the QUANTIZED
    L1 norm ``max(1, total DIV scale)`` with integer DIV (the classic
    L2 norm is irrational, and an exact ``raw*scale/total`` overflows
    bigint — dividing by the quantized norm keeps every intermediate a
    bigint while both engines reproduce the numbers bit-for-bit).

    Returns (v, hub, authority) for every node; nodes with no out-edges
    have hub 0, no in-edges authority 0 (never NULL).

    100 TB shape: the score vectors co-partition with the edge list on
    the join key — two shuffles per iteration (one per direction), both
    map-side pre-aggregated; each iteration ends in a localCheckpoint
    to truncate lineage (same discipline as :func:`pagerank`; on a
    cluster swap for checkpoint() to a fault-tolerant dir).
    """
    if iters < 1:
        raise ValueError(f"hits() needs iters >= 1, got {iters}")
    e = edges.select("src", "dst").distinct().localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    h = nodes.withColumn("h", F.lit(int(scale)).cast("bigint"))
    a = None
    for _ in range(iters):
        a_raw = (
            e.join(h, h["v"] == e["src"])
            .groupBy(F.col("dst").alias("av"))
            .agg(F.sum("h").alias("raw"))
        )
        a_tot = a_raw.agg(F.sum("raw").alias("tot"))
        a = (
            nodes.join(a_raw, nodes["v"] == a_raw["av"], "left")
            .crossJoin(a_tot)  # 1x1 scalar join, broadcast by AQE
            .select(
                "v",
                F.expr(
                    f"COALESCE(raw, 0) DIV "
                    f"GREATEST(CAST(1 AS BIGINT), tot DIV CAST({scale} AS BIGINT))"
                )
                .cast("bigint")
                .alias("a"),
            )
            .localCheckpoint()
        )
        h_raw = (
            e.join(a, a["v"] == e["dst"])
            .groupBy(F.col("src").alias("hv"))
            .agg(F.sum("a").alias("raw"))
        )
        h_tot = h_raw.agg(F.sum("raw").alias("tot"))
        h = (
            nodes.join(h_raw, nodes["v"] == h_raw["hv"], "left")
            .crossJoin(h_tot)
            .select(
                "v",
                F.expr(
                    f"COALESCE(raw, 0) DIV "
                    f"GREATEST(CAST(1 AS BIGINT), tot DIV CAST({scale} AS BIGINT))"
                )
                .cast("bigint")
                .alias("h"),
            )
            .localCheckpoint()
        )
    return (
        nodes.join(h, "v", "left")
        .join(a, "v", "left")
        .select(
            "v",
            F.coalesce("h", F.lit(0)).cast("bigint").alias("hub"),
            F.coalesce("a", F.lit(0)).cast("bigint").alias("authority"),
        )
    )


def louvain_undirected_edges(
    edges: DataFrame,
    edges_distinct: bool = False,
) -> DataFrame:
    """The undirected weighted ``(src, dst, w)`` frame
    :func:`louvain_one_level` consumes, in the per-round join layout:
    both orientations, self-loops dropped, hash-partitioned on ``dst``
    (``spark.sql.shuffle.partitions``) — exactly what the kernel built
    internally before r11.  Exposed so a caller that runs Louvain over
    a long-lived edge cache can pay the 2|E| repartition+sort+encode
    ONCE (e.g. at cache-build time) and pass the persisted result back
    with ``prepartitioned=True``; the caller owns ``persist()`` /
    ``unpersist()`` and must apply ``sortWithinPartitions("dst")``
    implicitly via this function's output (it is the terminal op here,
    so persisting the returned frame captures the layout metadata).

    ``edges_distinct=True``: caller promises DISTINCT undirected pairs
    (e.g. a support-aggregated co-occurrence table: one row per
    (src<dst) pair), so both orientations are distinct by construction
    and the dedup aggregate would be an identity hash-agg over 2|E|
    groups (r10: ~2/3 of the one-off edge-build exec on the copurchase
    graph).  Emit ``w=1`` directly; the repartition still pins
    hashpartitioning(dst)."""
    n_shuffle = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    und = (
        _as_undirected(edges.select("src", "dst"))
        .filter(F.col("src") != F.col("dst"))
        .repartition(n_shuffle, "dst")
    )
    if edges_distinct:
        und = und.select(
            "src", "dst", F.lit(1).cast("bigint").alias("w")
        )
    else:
        # repartition on dst FIRST: hashpartitioning(dst) satisfies the
        # dedup groupBy's (dst, src) clustering (subset rule), so the
        # dedup reuses the exchange — one 2|E| shuffle total
        und = (
            und.groupBy("dst", "src")
            .agg(F.lit(1).cast("bigint").alias("w"))
            .select("src", "dst", "w")
        )
    return und.sortWithinPartitions("dst")


def louvain_one_level(
    edges: DataFrame,
    max_iter: int = 8,
    edges_distinct: bool = False,
    prepartitioned: bool = False,
) -> DataFrame:
    """One level of Louvain community detection (Blondel et al. 2008)
    by distributed local moving — returns ``(v, community)``.

    Each round, every node inspects its neighbors' communities and
    moves to the one with the best modularity gain.  The gain
    comparison is EXACT integer arithmetic: for candidate community C,
    ΔQ(v→C) ∝ 2m·k_{v→C} − deg(v)·tot(C∖v), all bigints, tie-broken by
    smallest community id — so the assignment is deterministic across
    runs and partitionings.  Moves apply semi-synchronously: a node
    moves only on rounds matching its hash parity (the standard
    distributed-Louvain guard against two-coloring oscillation, e.g.
    GraphX/Grappolo practice), and the loop stops early when a round
    moves nothing.

    100 TB shape per round: one join edge×assignment (shuffle on the
    edge key), one (v, C) hash-agg, one community-degree hash-agg
    (broadcast back — #communities ≤ #nodes and shrinks fast), one
    argmax per node via max_by.  Assignment is localCheckpointed per
    round (iterative-operator discipline; swap for checkpoint() on a
    cluster).
    """
    if prepartitioned:
        # ``edges`` IS the undirected weighted frame in the per-round
        # layout (the output of :func:`louvain_undirected_edges`,
        # persisted by the caller so its InMemoryRelation keeps the
        # partitioning/ordering metadata visible to every round's
        # plan).  Caller owns the cache lifecycle — do NOT unpersist:
        # a long-lived edge cache outlives one call (r11, the g70
        # per-call 2|E| repartition+sort+encode moved to cache-build).
        asg = _louvain_local_moving(edges, None, max_iter)
        return asg.select("v", F.col("c").alias("community"))
    # the CACHE lands already in the per-round join layout — one 2|E|
    # shuffle total, and (unlike a checkpoint) the cache's
    # partitioning/ordering metadata stays visible to every round's
    # plan (partitioned_cache)
    und = louvain_undirected_edges(edges, edges_distinct).persist()
    # no eager count: the kernel's first aggregate (ideg) materializes
    # the cache as a side effect of a job it runs anyway
    asg = _louvain_local_moving(und, None, max_iter)
    und.unpersist()  # asg is hard-frozen — independent of the cache
    return asg.select("v", F.col("c").alias("community"))


def maximal_independent_set(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 100
) -> DataFrame:
    """``(v)`` — a deterministic MAXIMAL independent set: no two
    returned vertices are adjacent, and every vertex outside the set
    has a neighbor inside it.

    Luby-style rounds with STATIC md5 priorities (Luby 1986's scheme
    with the per-round coin replaced by a content hash): each round,
    every still-active vertex joins the set iff its ``(md5(v), v)``
    key beats every active neighbor's; winners and their neighbors
    deactivate.  Static priorities make the result EXACTLY the
    sequential greedy MIS in global md5 order — reruns, partitionings,
    and the pure-Python oracle agree vertex-for-vertex — while hash
    priorities keep the expected round count polylogarithmic (an
    adversarial priority chain would serialize, but content hashes
    cannot be adversarial).

    Scale shape per round: one double semi-join to restrict edges to
    active vertices, one min-by hash-agg for the neighborhood
    minimum, two anti-joins to deactivate — all key-partitioned;
    driver sees only the loop counter and emptiness probes.
    """
    key_col = nodes.columns[0]
    und = (
        _as_undirected(edges)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    act = (
        nodes.select(F.col(key_col).alias("v")).distinct()
        .withColumn("pri", F.md5(F.col("v")))
        .localCheckpoint()
    )
    spark = nodes.sparkSession
    mis = spark.createDataFrame([], "v string").localCheckpoint()
    for _ in range(max_iter):
        if act.isEmpty():
            break
        e_act = (
            und.join(act.select(F.col("v").alias("src")), "src", "left_semi")
            .join(act.select(F.col("v").alias("dst")), "dst", "left_semi")
        )
        nbr_min = (
            e_act.join(
                act.select(F.col("v").alias("dst"), F.col("pri").alias("npri")),
                "dst",
            )
            .groupBy(F.col("src").alias("v"))
            .agg(F.min(F.struct(F.col("npri"), F.col("dst"))).alias("nm"))
        )
        winners = (
            act.join(nbr_min, "v", "left")
            .filter(
                F.col("nm").isNull()
                | (F.struct(F.col("pri"), F.col("v")) < F.col("nm"))
            )
            .select("v")
            .localCheckpoint()
        )
        mis = mis.unionByName(winners).localCheckpoint()
        nbrs = (
            e_act.join(winners.select(F.col("v").alias("src")), "src", "left_semi")
            .select(F.col("dst").alias("v"))
            .distinct()
        )
        act = (
            act.join(winners.unionByName(nbrs), "v", "left_anti")
            .localCheckpoint()
        )
    return mis


def greedy_coloring(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 200
) -> DataFrame:
    """``(v, color)`` — a proper vertex coloring via Jones–Plassmann
    with static md5 priorities (Jones & Plassmann 1993).

    Each round, every uncolored vertex whose higher-priority neighbors
    are ALL colored takes the smallest color absent from its colored
    neighborhood (the mex).  With a static priority order this is
    EXACTLY the sequential greedy coloring in global ``(md5(v), v)``
    order — deterministic across runs and partitionings, oracle-equal
    to the pure-Python replay — while rounds are bounded by the longest
    decreasing-priority path (O(log n / log log n) expected for hash
    priorities).

    Scale shape per round: one semi-join to find ready vertices, one
    collect_set of neighbor colors per ready vertex (bounded by
    degree), a fold computing the mex — all key-partitioned.  Color
    count is (Δ+1)-bounded like any greedy scheme.
    """
    key_col = nodes.columns[0]
    und = (
        _as_undirected(edges)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    pending = (
        nodes.select(F.col(key_col).alias("v")).distinct()
        .localCheckpoint()
    )
    pri = pending.withColumn(
        "pri", F.struct(F.md5(F.col("v")).alias("h"), F.col("v"))
    )
    # the priority-dominance graph (dst outranks src) is STATIC —
    # computed once; each round only membership changes
    dom = (
        und.join(pri.select(F.col("v").alias("src"), "pri"), "src")
        .join(pri.select(F.col("v").alias("dst"), F.col("pri").alias("dpri")), "dst")
        .filter(F.col("dpri") < F.col("pri"))
        .select("src", "dst")
        .localCheckpoint()
    )
    spark = nodes.sparkSession
    colored = spark.createDataFrame([], "v string, color int").localCheckpoint()
    for _ in range(max_iter):
        if pending.isEmpty():
            break
        # a pending vertex is READY when no pending neighbor outranks it
        blockers = (
            dom.join(pending.select(F.col("v").alias("dst")), "dst", "left_semi")
            .select(F.col("src").alias("v"))
            .distinct()
        )
        ready = pending.join(blockers, "v", "left_anti").select("v")
        # mex over the already-colored neighborhood
        nb_colors = (
            und.join(ready.select(F.col("v").alias("src")), "src", "left_semi")
            .join(
                colored.select(F.col("v").alias("dst"), "color"), "dst"
            )
            .groupBy(F.col("src").alias("v"))
            .agg(F.array_sort(F.collect_set("color")).alias("cs"))
        )
        mex = F.aggregate(
            F.col("cs"),
            F.lit(0),
            lambda acc, c: F.when(c == acc, acc + 1).otherwise(acc),
        )
        newly = (
            ready.join(nb_colors, "v", "left")
            .select(
                "v",
                F.coalesce(mex, F.lit(0)).cast("int").alias("color"),
            )
            .localCheckpoint()
        )
        colored = colored.unionByName(newly).localCheckpoint()
        pending = pending.join(newly.select("v"), "v", "left_anti").localCheckpoint()
    return colored


def greedy_matching(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """(src, dst) — a deterministic MAXIMAL matching of the undirected
    graph: no two returned edges share a vertex, and no remaining edge
    has both endpoints unmatched.

    Handshake rounds (the distributed symmetric variant of greedy
    matching, cf. Israeli & Itai 1986): every edge carries a
    deterministic md5 priority; each round every live vertex points at
    its min-priority incident edge, and an edge joins the matching iff
    BOTH endpoints picked it (a handshake).  Matched vertices and
    their incident edges drop out; expected O(log n) rounds.

    Scale shape per round: one explode to (vertex, edge), one
    min-by-key hash-agg, a 2-vote hash-agg to detect handshakes, two
    anti-join filters — all key-partitioned, nothing driver-side but
    the loop counter.  Deterministic: priorities are content hashes,
    so reruns and the pure-Python oracle agree edge-for-edge
    (tests/test_traversal.py).
    """
    und = (
        _as_undirected(edges)
        .filter(F.col("src") < F.col("dst"))
        .distinct()
        .select(
            "src",
            "dst",
            F.md5(F.concat_ws("|", "src", "dst")).alias("pri"),
        )
        .localCheckpoint()
    )
    matched_edges = None
    for _ in range(max_iter):
        if und.isEmpty():
            break
        # every vertex's min-priority incident edge; ties (md5
        # collisions) break on (pri, src, dst) inside the min-struct
        incid = und.select(
            F.col("src").alias("v"), "src", "dst", "pri"
        ).unionByName(und.select(F.col("dst").alias("v"), "src", "dst", "pri"))
        pick = incid.groupBy("v").agg(
            F.min(F.struct("pri", "src", "dst")).alias("e")
        ).select("v", F.col("e.src").alias("src"), F.col("e.dst").alias("dst"))
        handshake = (
            pick.groupBy("src", "dst")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") == 2)
            .select("src", "dst")
            .localCheckpoint()
        )
        if handshake.isEmpty():
            break
        matched_edges = (
            handshake
            if matched_edges is None
            else matched_edges.unionByName(handshake).localCheckpoint()
        )
        mv = handshake.select(F.col("src").alias("v")).unionByName(
            handshake.select(F.col("dst").alias("v"))
        ).distinct()
        und = (
            und.join(mv.select(F.col("v").alias("src")), "src", "left_anti")
            .join(mv.select(F.col("v").alias("dst")), "dst", "left_anti")
            .localCheckpoint()
        )
    if matched_edges is None:
        return edges.sparkSession.createDataFrame([], "src string, dst string")
    return matched_edges


def local_clustering(edges: DataFrame) -> DataFrame:
    """(u, degree, triangles, clustering_micro) — per-vertex local
    clustering coefficient c(v) = 2T(v) / (d(v)·(d(v)−1)) in integer
    micro-units, 0 where d < 2.

    ``edges`` is an undirected edge list (any orientation, duplicates
    and self-loops tolerated — canonicalized here).  The wedge
    (incidence) × closing-edge (min-ordered) join counts each triangle
    at v exactly once, so the numerator carries the explicit factor 2;
    multiply-then-integer-divide keeps both engines and reruns
    bit-identical.  Scale: the standard oriented triangle join — the
    closing side is the canonical edge list, hub vertices bound the
    wedge fan-out; prune low-support edges upstream (q133 does) when
    the projection is dense.  Toy-fixture semantics (triangle+pendant:
    1.0 / 0.333… / 0) pinned in tests/test_traversal.py.
    """
    e = (
        _as_undirected(edges)
        .filter(F.col("src") < F.col("dst"))
        .distinct()
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .localCheckpoint()
    )
    und = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy("u").agg(F.count("*").alias("d"))
    wedge = und.select(F.col("u"), F.col("v").alias("mid")).join(
        e.select(F.col("u").alias("mid"), F.col("v").alias("other")), "mid"
    )
    tri = (
        wedge.join(
            e.select(F.col("u").alias("cu"), F.col("v").alias("cv")),
            (F.least("u", "other") == F.col("cu"))
            & (F.greatest("u", "other") == F.col("cv")),
            "left_semi",
        )
        .groupBy("u")
        .agg(F.count("*").alias("t"))
    )
    return deg.join(tri, "u", "left").select(
        "u",
        F.col("d").cast("bigint").alias("degree"),
        F.coalesce(F.col("t"), F.lit(0)).cast("bigint").alias("triangles"),
        F.when(F.col("d") < 2, F.lit(0))
        .otherwise(F.expr("(2000000 * coalesce(t, 0)) div (d * (d - 1))"))
        .cast("bigint")
        .alias("clustering_micro"),
    )


def _dst_partitioned_cache(und: DataFrame) -> DataFrame:
    """Cache the bidirectional edge table hash-partitioned AND sorted
    on ``dst`` — the metadata-visible layout every local-moving round
    joins on (see :func:`partitioned_cache`).  Caller unpersists."""
    return partitioned_cache(und, "dst")


def _louvain_local_moving(
    und: DataFrame,
    loops: DataFrame | None,
    max_iter: int,
) -> DataFrame:
    """Weighted Louvain local-moving kernel — returns ``(v, c)``.

    ``und`` holds every undirected edge in BOTH directions with a
    bigint ``w`` (no self rows); ``loops`` is ``(v, loop_w)`` self-loop
    weight (None at level 0).  All gain comparisons are exact bigint:
    ΔQ(v→C) ∝ S·k_{v→C} − deg(v)·tot(C∖v) with S = Σ_v deg(v)
    (= 2·total edge weight incl. loops), ties broken by smallest
    community id; rounds alternate move DIRECTION (even rounds only
    min-ward community moves, odd rounds only max-ward) so symmetric
    neighbor swaps cannot oscillate, and the loop stops after two
    quiet rounds (one per direction).

    The edge table arrives hash-partitioned and sorted on ``dst`` in a
    CACHE (callers use :func:`partitioned_cache`), whose
    InMemoryRelation keeps the layout metadata visible to Catalyst —
    so every round's edge×assignment join plans ZERO exchange and ZERO
    sort on the edge side and moves only the vertex-sized assignment.
    (r7 finding: the r5/r6 checkpoint layout scanned as
    UnknownPartitioning, silently re-exchanging + re-sorting all 2|E|
    rows every round; the cache swap measured median round exec
    13.5s → 6.2s, −54%, 16 interleaved rounds at sf0.1, assignments
    bit-identical.  End-to-end on the g70 query the win is diluted —
    the one-off edge-build self-join dominates exec and AQE's
    broadcast-from-shuffle of the now-small assignment adds ~1s of
    driver wall — clean-sample exec −13%, full medians inside the
    box's noise band.  At cluster scale the durable equivalent is a
    bucketed+sorted edge table and the removed per-round 2|E|
    exchange is the dominant term.)

    When the vertex set is broadcast-sized (``n_nodes`` under ~2M),
    the node-sized frames (``tot``, ``vstate``, the stay score) are
    broadcast-hinted so the CANDIDATE-sized frame never exchanges on c
    or v before its argmin — per-round exchanges of the big frame drop
    from 3 to 1 (measured 2x end-to-end on the copurchase graph,
    bit-identical assignment).  Above the gate the original
    shuffle-join plan stands: at 10^9 vertices the per-executor copy
    of a broadcast vertex state is exactly the memory blow-up the
    co-partitioned joins avoid.
    """
    # this loop shape NEEDS a hard freeze (see rdd_freeze docstring).
    # Default since r6: JVM-side reliable Dataset.checkpoint
    # (df_freeze) — the r5 Python-RDD freeze piped the vertex state
    # through Python workers on every materialization and every
    # downstream read (~4x/round); swapping it measured warm exec
    # 108.5s -> 87.0s (-20%) and warm wall 11.75 -> 10.37s on the
    # sf0.1 copurchase graph, cold exec neutral (181 -> 175s),
    # assignment bit-identical.  "rdd" kept as an env fallback for
    # A/B and for environments without a writable checkpoint dir.
    import os as _os

    _mode = _os.environ.get("SPARK_GRAFT_LOUVAIN_FREEZE", "checkpoint")
    _freeze = df_freeze if _mode == "checkpoint" else rdd_freeze

    ideg = und.groupBy(F.col("src").alias("v")).agg(
        F.sum("w").cast("bigint").alias("ideg")
    )
    if loops is not None:
        ideg = (
            ideg.join(loops, "v", "outer")
            .select(
                "v",
                (
                    F.coalesce(F.col("ideg"), F.lit(0))
                    + F.lit(2) * F.coalesce(F.col("loop_w"), F.lit(0))
                ).cast("bigint").alias("ideg"),
            )
        )
    nodes = ideg.select("v", F.col("ideg").alias("deg")).localCheckpoint()
    s_total = nodes.agg(F.sum("deg")).collect()[0][0] or 0
    # node-sized frames broadcast only while they are actually small
    # (see docstring); identity above the gate
    _bc_gate = nodes.count() <= 2_000_000
    _nb = F.broadcast if _bc_gate else (lambda df: df)
    # NEGATIVE RESULT (r6, do not retry): broadcasting the per-round
    # ASSIGNMENT into the edge join + re-laying und out on src (so the
    # (src,c) aggregate and the groupBy(v) argmin reuse the streamed
    # side's partitioning and no candidate frame crosses the wire)
    # measured cold 39.6s/330s-exec vs 26.0s/175s-exec and warm exec
    # 96.5s vs 87.0s on the sf0.1 copurchase graph — the one-off und
    # re-layout plus a driver collect+rebroadcast of the assignment
    # every round costs more than the two candidate exchanges it saves.
    # NEGATIVE RESULT #2 (r6, do not retry): repartitioning the joined
    # edge frame on src so the (src,c) aggregate and the groupBy(v)
    # argmin share ONE exchange measured cold 43.0s/362s-exec vs
    # 28.6s/191s and warm exec 122s vs 73s (interleaved same-epoch
    # pair) — the raw 2|E| exchange of un-aggregated rows costs far
    # more than the two PARTIAL-AGG-reduced candidate exchanges it
    # replaces.  Map-side combine is the whole ballgame here.
    # NEGATIVE RESULT #3 (r7, do not retry): broadcast-HINTING the
    # per-round assignment into the edge join (pure F.broadcast, no
    # re-layout, no driver collect) measured median round exec 11.5s
    # vs 13.1s for the hint (16 interleaved rounds, bit-identical) —
    # rebuilding a node-sized HashedRelation from a checkpoint scan
    # every round costs more than the node-sized dst exchange it
    # replaces.  The cache layout above gets the same edge-side
    # zero-movement without the per-round build.
    # NEGATIVE RESULT #4 (r7, at THIS scale): materializing und as a
    # bucketed+sorted managed table gives the identical ideal plan,
    # but the one-time repartition+write+table-scan setup (~18s exec
    # at sf0.1) eats the per-round saving at max_iter=4 (traced 72.0s
    # vs 72.4s total; A/B medians slightly worse under noise).  On a
    # real cluster with many more rounds/levels the durable table
    # wins; locally the metadata-preserving cache is strictly better.
    # NEGATIVE RESULT #5 (r7): forcing the round join to SMJ with a
    # merge hint (to avoid AQE's broadcast-from-shuffle of the small
    # assignment and its ~+1s/query driver wall) measured full-query
    # exec median 102s vs 91s checkpoint / 77s cache-with-BHJ — the
    # node-sized exchange+sort per round costs more exec than the
    # driver-side broadcast it avoids.  Let AQE pick: it broadcasts
    # exactly while the assignment is actually small and degrades to
    # SMJ (edge side still zero-work via the cache metadata) beyond.
    # REASONED SKIP (r7, not measured): dense 0..n-1 integer vertex
    # recoding inside the kernel.  The classic GraphX/Gemini win
    # (array-indexed vertex state, halved key bytes) does not transfer
    # to DataFrame execution: UnsafeRow fixed-width fields occupy an
    # 8-byte slot whether the column is int or long, Murmur3 hashing
    # and codegen long compares are width-insensitive, and state here
    # is relational rows, not arrays — while the recode itself would
    # ADD two joins (encode at entry, decode at exit) plus a dense-id
    # assignment shuffle per level.  Nothing on the profile charges to
    # key width; skip unless rows ever become array-indexed.
    asg, asg_rdd = _freeze(nodes.select("v", F.col("v").alias("c")))

    quiet_streak = 0
    for it in range(max_iter):
        nbc = (
            und.join(asg.select(F.col("v").alias("dst"), "c"), "dst")
            .groupBy(F.col("src").alias("v"), "c")
            .agg(F.sum("w").cast("bigint").alias("k"))
        )
        tot = (
            asg.join(nodes, "v")
            .groupBy("c")
            .agg(F.sum("deg").cast("bigint").alias("tot"))
        )
        cur = asg.select("v", F.col("c").alias("c_cur"))
        # one node-sized pre-join (v → c_cur, deg) instead of two
        # separate cand-sized joins on v
        vstate = cur.join(nodes, "v")
        # score every NEIGHBOR community directly off nbc — no union +
        # second candidate-sized groupBy.  The stay option rides as a
        # separate NODE-sized frame with k = 0 (see below): when v has
        # neighbors in its own community, nbc already carries the true
        # stay gain (k = k_stay) which dominates the k = 0 row, and when
        # it has none, k_stay IS 0 — so min(best_move, stay0) equals the
        # min over the old unioned candidate set in every case.
        # with the broadcast gate open the candidate frame exchanges
        # ONLY for the groupBy("v") argmin below; above the gate the
        # join order still matters: tot first (one c-keyed exchange of
        # the candidate frame), THEN vstate on v — the groupBy("v")
        # reuses that join's v-partitioning, so the candidate frame
        # crosses the wire twice per round, not three times
        scored = (
            nbc.join(_nb(tot), "c")
            .join(_nb(vstate), "v")
            .select(
                "v",
                "c",
                "c_cur",
                (
                    F.col("deg")
                    * (
                        F.col("tot")
                        - F.when(F.col("c") == F.col("c_cur"), F.col("deg"))
                        .otherwise(F.lit(0))
                    )
                    - F.lit(s_total).cast("bigint") * F.col("k")
                ).alias("ng"),
            )
        )
        # groupBy("v") right after the join on "v": partitioning is
        # already hashpartitioning(v) — no extra exchange
        best_mv = scored.groupBy("v").agg(
            F.min(F.struct(F.col("ng"), F.col("c"))).alias("m"),
            F.min("c_cur").alias("c_cur"),  # constant per v
        )
        stay0 = vstate.join(
            _nb(tot), vstate["c_cur"] == tot["c"]
        ).select(
            "v",
            "c_cur",
            (F.col("deg") * (F.col("tot") - F.col("deg"))).alias("ng0"),
        )
        # every v in nodes has >= 1 neighbor (und has no isolated rows),
        # so best_mv covers all of stay0's keys: inner join is total
        best = best_mv.join(_nb(stay0.select("v", "ng0")), "v").select(
            "v",
            F.when(
                F.struct(F.col("ng0"), F.col("c_cur")) < F.col("m"),
                F.struct(
                    F.col("c_cur").alias("c"), F.col("c_cur").alias("c_cur")
                ),
            )
            .otherwise(
                F.struct(F.col("m.c").alias("c"), F.col("c_cur").alias("c_cur"))
            )
            .alias("b"),
        )
        # direction-alternating schedule: even rounds apply only moves
        # to a SMALLER community id, odd rounds only to a larger one —
        # a symmetric neighbor swap (a->comm(b), b->comm(a)) needs both
        # directions in one round, so oscillation is impossible by
        # construction (the hash-parity schedule this replaces still
        # let same-parity neighbors swap forever and never merge)
        pre = best.select(
            "v",
            F.when(
                F.when(
                    F.lit(it % 2 == 0), F.col("b.c") < F.col("b.c_cur")
                ).otherwise(F.col("b.c") > F.col("b.c_cur")),
                F.col("b.c"),
            )
            .otherwise(F.col("b.c_cur"))
            .alias("c"),
            F.col("b.c_cur").alias("c_old"),
        )
        # moved-count folds into the freeze's own materialization job
        if _mode == "checkpoint":
            nxt, asg_rdd, n_moved = df_freeze_counting(
                pre, F.col("c") != F.col("c_old"), asg_rdd
            )
        else:
            nxt, asg_rdd, n_moved = rdd_freeze_counting(
                pre, lambda r: r["c"] != r["c_old"], asg_rdd
            )
        asg = nxt.select("v", "c")
        quiet_streak = quiet_streak + 1 if n_moved == 0 else 0
        if quiet_streak >= 2:
            break
    return asg


def louvain(
    edges: DataFrame,
    max_levels: int = 5,
    max_iter: int = 8,
    weight_col: str | None = None,
) -> DataFrame:
    """Full multi-level Louvain (Blondel et al. 2008) — ``(v,
    community)`` on the ORIGINAL vertices.

    Each level runs the weighted local-moving kernel, then AGGREGATES:
    communities become super-nodes, inter-community weights sum, and
    intra-community mass (internal edges + carried self-loops) becomes
    the super-node's self-loop — the part one-level local moving
    cannot see.  Levels repeat until a level merges nothing.  All
    arithmetic stays bigint (edge multiplicities as weights), so every
    level is deterministic; community ids are original-vertex ids
    propagated upward.

    100 TB shape: each level shrinks the graph (typically sharply
    after level 1), so cost is dominated by level 0 — the same
    per-round joins as :func:`louvain_one_level`; the aggregation
    itself is one join + two hash-aggs.  localCheckpoint per level
    bounds lineage.
    """
    if weight_col is None:
        base = (
            edges.select("src", "dst")
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .withColumn("w", F.lit(1).cast("bigint"))
        )
    else:
        # integer edge weights (counts / multiplicities); parallel rows
        # sum, both orientations carry the canonical summed weight
        base = (
            edges.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                F.col(weight_col).cast("bigint").alias("w"),
            )
            .filter(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
        )
    # dst-repartition BEFORE the dedup groupBy: hashpartitioning(dst)
    # satisfies the (src, dst) clustering (subset rule), so one 2|E|
    # exchange yields both the dedup and the per-round join layout
    n_shuffle = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    und = (
        base.unionByName(
            base.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
        .repartition(n_shuffle, "dst")
        .groupBy("src", "dst")
        .agg(F.max("w").alias("w"))
        .sortWithinPartitions("dst")
        .persist()
    )
    und.count()
    loops = None
    mapping = None  # original v -> current-level community
    for _ in range(max_levels):
        asg = _louvain_local_moving(und, loops, max_iter)
        n_nodes = asg.count()
        n_comms = asg.select("c").distinct().count()
        mapping = (
            asg
            if mapping is None
            else mapping.join(
                asg.select(F.col("v").alias("c"), F.col("c").alias("c_new")),
                "c",
            ).select("v", F.col("c_new").alias("c")).localCheckpoint()
        )
        if n_comms == n_nodes:
            break
        # aggregate: project edges onto communities
        proj = (
            und.join(asg.select(F.col("v").alias("src"), F.col("c").alias("cs")), "src")
            .join(asg.select(F.col("v").alias("dst"), F.col("c").alias("cd")), "dst")
            .select("cs", "cd", "w")
        )
        new_und = _dst_partitioned_cache(
            proj.filter(F.col("cs") != F.col("cd"))
            .groupBy(F.col("cs").alias("src"), F.col("cd").alias("dst"))
            .agg(F.sum("w").cast("bigint").alias("w"))
        )
        intra = (
            proj.filter(F.col("cs") == F.col("cd"))
            .groupBy(F.col("cs").alias("v"))
            .agg(F.expr("sum(w) div 2").cast("bigint").alias("loop_w"))
        )
        carried = (
            loops.join(asg, "v")
            .groupBy(F.col("c").alias("v"))
            .agg(F.sum("loop_w").cast("bigint").alias("loop_w"))
            if loops is not None
            else None
        )
        new_loops = (
            intra
            if carried is None
            else intra.unionByName(carried)
            .groupBy("v")
            .agg(F.sum("loop_w").cast("bigint").alias("loop_w"))
        )
        loops = new_loops.localCheckpoint()
        # new_und (persist+count) and loops (eager localCheckpoint) are
        # both materialized — the previous level's cache can go
        und.unpersist()
        und = new_und
        if und.isEmpty():
            break
    und.unpersist()
    return mapping.select("v", F.col("c").alias("community"))


def topological_levels(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 200
) -> DataFrame:
    """``(v, level)`` — Kahn's-algorithm longest-path levels of a DAG,
    with cycle detection: level L holds every vertex whose longest
    incoming path has L edges (sources are level 0); vertices on or
    downstream of a cycle come back with ``level = NULL`` (Kahn's
    peeling can never reach them — their count is the standard DAG
    check, events.py's SPAWNS forest being the motivating shape).

    Deterministic by construction (no priorities, no hashing — the
    level function is a property of the graph).

    100 TB shape per round: peel = one anti-join (active edges whose
    src is still unpeeled) + one distinct on dst; the frontier is the
    current level, edges shrink monotonically; ``localCheckpoint``
    per round truncates lineage.  Rounds = DAG depth (the SPAWNS
    forest is tens deep, not thousands); for adversarially deep
    chains, pair with :func:`connected_components_twophase`-style
    contraction first.
    """
    key_col = nodes.columns[0]
    verts = nodes.select(F.col(key_col).alias("v")).distinct().localCheckpoint()
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .join(verts.select(F.col("v").alias("src")), "src", "left_semi")
        .join(verts.select(F.col("v").alias("dst")), "dst", "left_semi")
        .localCheckpoint()
    )
    spark = nodes.sparkSession
    out = spark.createDataFrame([], "v string, level int").localCheckpoint()
    remaining = verts
    for level in range(max_iter):
        if remaining.isEmpty():
            break
        has_incoming = e.select(F.col("dst").alias("v")).distinct()
        frontier = remaining.join(has_incoming, "v", "left_anti").localCheckpoint()
        if frontier.isEmpty():
            break  # every remaining vertex sits on/behind a cycle
        out = out.unionByName(
            frontier.withColumn("level", F.lit(level))
        ).localCheckpoint()
        remaining = remaining.join(frontier, "v", "left_anti").localCheckpoint()
        e = e.join(
            frontier.select(F.col("v").alias("src")), "src", "left_anti"
        ).localCheckpoint()
    # cycle residue: unpeelable vertices, level NULL
    return verts.join(out, "v", "left").select("v", "level")


def harmonic_centrality_exact(
    edges: DataFrame,
    max_hops: int = 64,
    directed: bool = True,
) -> DataFrame:
    """(key, harmonic_micro) — EXACT harmonic centrality in integer
    micro-units: ``Σ_{u ≠ v reachable} 10⁶ div dist(u → v)`` summed per
    target v (Boldi & Vigna's harmonic form — robust to
    disconnection; the integer floor-division makes the score
    bit-portable across engines, unlike a float 1/d sum whose
    accumulation order differs).

    Runs ONE tagged multi-source BFS seeded at EVERY vertex (rows
    carry their source pivot), so cost is O(diameter) rounds with
    |V|·|reachable| total visited state.  That makes this the
    DIMENSION-GRAPH tool — derived graphs whose vertex set is bounded
    (nations, categories, warehouses), exactly where an exact,
    auditable centrality is wanted; for data-sized graphs use the
    pivot-sampled :func:`closeness_approx`, which is this same sweep
    with k ≪ |V| sources.

    Vertices are the endpoints of ``edges`` (both directions when
    ``directed=False``).
    """
    e = (edges.select("src", "dst") if directed else _as_undirected(edges)).localCheckpoint()
    verts = (
        e.select(F.col("src").alias("key"))
        .unionByName(e.select(F.col("dst").alias("key")))
        .distinct()
        .localCheckpoint()
    )
    visited = (
        verts.select(F.col("key").alias("pivot"))
        .select("pivot", F.col("pivot").alias("key"))
        .withColumn("dist", F.lit(0))
        .localCheckpoint()
    )
    frontier = visited
    hop = 0
    while hop < max_hops:
        hop += 1
        nxt = (
            frontier.join(e, frontier["key"] == e["src"])
            .select("pivot", F.col("dst").alias("key"))
            .distinct()
            .join(
                visited.select("pivot", "key"), ["pivot", "key"], "left_anti"
            )
            .withColumn("dist", F.lit(hop))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return (
        visited.filter(F.col("dist") > 0)
        .groupBy("key")
        .agg(
            F.sum(F.expr("1000000 div dist"))
            .cast("bigint")
            .alias("harmonic_micro")
        )
    )

"""Graph query layer — the implied Cypher surface as DataFrame combinators.

The reference loads Neo4j so an analyst can run Cypher in the browser
(``/root/reference/main.py:19``).  This module re-expresses that query
surface (SURVEY.md §2.D) Spark-first:

* keyed lookup            → ``match(label, key=...)`` (Parquet pushdown)
* neighborhood            → ``out_neighbors`` / ``in_neighbors`` joins
* fixed k-hop motif       → ``find("(a)-[SPAWNS]->(b); (b)-[CONNECTED_TO]->(c)")``
  — a chain of hash joins Catalyst is free to reorder/broadcast
* aggregation             → plain ``groupBy().agg`` on the result
* existence/anti pattern  → ``semi`` / ``anti`` helpers
* variable-length paths   → bounded ``find("(a)-[REL*1..3]->(b)")``
  (union of chain joins, Cypher path multiplicity); unbounded reach →
  operators/traversal.py (iterative; no Catalyst recursion)

Everything is a pure DataFrame transformation: no collect, no UDFs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators.ingest import PropertyGraph

_MOTIF_RE = re.compile(
    r"^\(\s*(?P<src>\w+)(?:\s*:\s*(?P<src_label>\w+|`[^`]+`))?\s*\)"
    r"\s*-\s*\[\s*(?:(?P<ev>\w+)\s*:)?\s*(?P<rel>\w+|`[^`]+`)"
    r"\s*(?:\*\s*(?P<vspec>[\d.\s]*))?\s*\]"
    r"\s*(?P<arrow>->|-)\s*\(\s*(?P<dst>\w+)(?:\s*:\s*(?P<dst_label>\w+|`[^`]+`))?\s*\)$"
)


def _unq(name: str | None) -> str | None:
    """Strip Neo4j backtick escapes: ``` `My Rel` ``` → ``My Rel`` —
    labels and rel types are DATA VALUES in the graph tables, so any
    character is legal once unquoted."""
    if name and name.startswith("`") and name.endswith("`"):
        return name[1:-1]
    return name


def _parse_varlen(vspec: str | None, pat: str) -> tuple[int, int] | None:
    """``*lo..hi`` / ``*..hi`` / ``*k`` → (lo, hi); ``None`` for a plain
    single hop.  Unbounded forms (``*``, ``*2..``) are rejected — an
    unbounded traversal belongs to :mod:`~graphdb_neo4j_spark.operators.
    traversal` (iterative BFS), not a join chain."""
    if vspec is None:
        return None
    s = vspec.replace(" ", "")
    unbounded = ValueError(
        f"unbounded variable-length hop in {pat!r}: give an upper bound "
        "(e.g. [REL*1..4]) or use traversal.bfs for open-ended reach"
    )
    if s == "":
        raise unbounded
    if ".." in s:
        lo_s, hi_s = s.split("..", 1)
        if hi_s == "" or ".." in hi_s:
            raise unbounded
        lo, hi = (int(lo_s) if lo_s else 1), int(hi_s)
    else:
        lo = hi = int(s)
    if lo < 1 or hi < lo:
        raise ValueError(f"bad variable-length bounds in {pat!r}: *{s}")
    return lo, hi


@dataclass
class GraphQuery:
    """Combinator API over the canonical graph tables.

    ``nodes``: (label, key [, extra property columns])
    ``edges``: (rel, src, dst, event_id, ...props)
    ``edges_by_src`` / ``edges_by_dst``: optional bucketed+sorted
    orientations (written by ``PropertyGraph.save_bucketed``).  When
    present, :meth:`find` picks the orientation whose bucket key is the
    join key of each hop, so motif chains run WITHOUT a shuffle — both
    join sides arrive pre-bucketed (SortMergeJoin, no Exchange).
    """

    nodes: DataFrame
    edges: DataFrame
    edges_by_src: DataFrame | None = None
    edges_by_dst: DataFrame | None = None

    @classmethod
    def from_graph(cls, g: PropertyGraph) -> "GraphQuery":
        return cls(nodes=g.nodes(), edges=g.edges)

    @classmethod
    def load(cls, spark, path: str) -> "GraphQuery":
        return cls(
            nodes=spark.read.parquet(f"{path}/nodes"),
            edges=spark.read.parquet(f"{path}/edges"),
        )

    @classmethod
    def load_bucketed(
        cls, spark, nodes: DataFrame, name_prefix: str = "graph"
    ) -> "GraphQuery":
        """Bind the doubly-bucketed edge tables from the catalog (falls
        back to plain ``edges`` orientation when a table is missing)."""
        by_src = f"{name_prefix}_edges_by_src"
        by_dst = f"{name_prefix}_edges_by_dst"
        e_src = spark.table(by_src) if spark.catalog.tableExists(by_src) else None
        e_dst = spark.table(by_dst) if spark.catalog.tableExists(by_dst) else None
        base = e_src if e_src is not None else e_dst
        if base is None:
            raise ValueError(f"no bucketed tables with prefix {name_prefix!r}")
        return cls(nodes=nodes, edges=base, edges_by_src=e_src, edges_by_dst=e_dst)

    # -- lookups -----------------------------------------------------------

    def match(self, label: str, **props) -> DataFrame:
        """``MATCH (n:Label {prop: val})`` — label + equality predicates;
        label and key predicates push down to the partitioned scan."""
        df = self.nodes.filter(F.col("label") == label)
        for k, v in props.items():
            df = df.filter(F.col(k) == v)
        return df

    def rel(self, rel: str) -> DataFrame:
        return self.edges.filter(F.col("rel") == rel)

    def _rel_oriented(self, rel: str, prefer: str | None) -> DataFrame:
        """``rel`` edges from the orientation bucketed on the join key
        (``prefer`` ∈ {"src", "dst", None}); plain edges otherwise."""
        table = self.edges
        if prefer == "src" and self.edges_by_src is not None:
            table = self.edges_by_src
        elif prefer == "dst" and self.edges_by_dst is not None:
            table = self.edges_by_dst
        return table.filter(F.col("rel") == rel)

    # -- neighborhood ------------------------------------------------------

    def out_neighbors(self, keys: DataFrame, rel: str, key_col: str = "key") -> DataFrame:
        """Keys → distinct destination keys over ``rel`` edges."""
        e = self.rel(rel)
        return (
            keys.join(e, keys[key_col] == e["src"])
            .select(F.col("dst").alias(key_col))
            .distinct()
        )

    def in_neighbors(self, keys: DataFrame, rel: str, key_col: str = "key") -> DataFrame:
        e = self.rel(rel)
        return (
            keys.join(e, keys[key_col] == e["dst"])
            .select(F.col("src").alias(key_col))
            .distinct()
        )

    # -- motif matching ----------------------------------------------------

    def _rel_undirected(self, rel: str, prefer: str | None) -> DataFrame:
        """``rel`` edges in BOTH orientations — the Cypher undirected
        hop ``(a)-[R]-(b)``: one row per (edge, traversal direction),
        except self-loops, which Cypher binds once (both directions
        produce the identical assignment)."""
        e = self._rel_oriented(rel, prefer)
        swapped = [
            F.col("dst").alias("src") if c == "src"
            else F.col("src").alias("dst") if c == "dst"
            else F.col(c)
            for c in e.columns
        ]
        rev = e.filter(F.col("src") != F.col("dst")).select(*swapped)
        return e.unionByName(rev)

    def _varlen_pairs(
        self, rel: str, lo: int, hi: int, undirected: bool = False
    ) -> DataFrame:
        """(src, dst) endpoint pairs of ``rel``-paths of length lo..hi,
        ONE ROW PER PATH — Cypher's ``-[:REL*lo..hi]->`` multiplicity.
        Built as a union of k-fold chain joins (k bounded by the
        pattern), so Catalyst plans ordinary equi-joins; on a 1000-node
        cluster each extension is one shuffle on the frontier key.

        Walk semantics: an edge may repeat along a path (matters only on
        cyclic graphs; on DAGs — process trees, order chains — this is
        exactly Cypher's relationship-unique semantics, since a DAG path
        can never reuse an edge).
        """
        e = (
            self._rel_undirected(rel, "src")
            if undirected
            else self._rel_oriented(rel, "src")
        ).select("src", "dst")
        out: DataFrame | None = None
        cur = e  # paths of length 1
        for k in range(1, hi + 1):
            if k >= lo:
                out = cur if out is None else out.unionByName(cur)
            if k < hi:
                ext = e.select(
                    F.col("src").alias(f"__h{k}"), F.col("dst").alias(f"__t{k}")
                )
                cur = cur.join(ext, cur["dst"] == ext[f"__h{k}"]).select(
                    cur["src"].alias("src"), F.col(f"__t{k}").alias("dst")
                )
        return out

    def find(self, motif: str) -> DataFrame:
        """Bounded pattern match, GraphFrames-style.

        ``find("(a)-[SPAWNS]->(b); (b)-[e:CONNECTED_TO]->(c)")`` returns a
        DataFrame with one column per node variable (the node key) and,
        for named edge variables, a struct column with the edge props.

        Variable-length hops use Cypher's star syntax —
        ``find("(a)-[SPAWNS*1..3]->(b)")`` — expanded as a union of
        bounded chain joins, one row per path (see :meth:`_varlen_pairs`).
        Edge variables are not allowed on a variable-length hop (a path
        has a LIST of edges, not one).

        Node labels use Cypher's colon syntax —
        ``find("(a:Process)-[SPAWNS]->(b:Process)")`` — each labeled
        variable adds one semi-join against the (label-pruned) node
        table; the same variable must not claim two different labels.

        UNDIRECTED hops drop the arrowhead — ``find("(a)-[R]-(b)")`` —
        and match the relationship in both traversal directions (two
        rows per edge, one per binding, exactly Cypher; self-loops
        bind once).  Lowered as a bidirectional edge frame for that
        hop, so a chain with k undirected hops stays k linear joins —
        never a 2^k union of orientations.

        Each pattern adds one hash join on key equality; Catalyst's CBO /
        AQE pick broadcast vs shuffle per join.  Node variables repeat to
        express shared endpoints; a variable bound twice becomes an
        equality condition, exactly like Cypher.
        """
        patterns = [p.strip() for p in motif.split(";") if p.strip()]
        if not patterns:
            raise ValueError("empty motif")
        parsed = []
        labels: dict[str, str] = {}
        for pat in patterns:
            m = _MOTIF_RE.match(pat)
            if not m:
                raise ValueError(f"bad motif pattern: {pat!r}")
            vl = _parse_varlen(m["vspec"], pat)
            if vl is not None and m["ev"]:
                raise ValueError(
                    f"edge variable on variable-length hop in {pat!r}: "
                    "a path binds a list of edges, which has no struct column"
                )
            for var, lab in (
                (m["src"], _unq(m["src_label"])),
                (m["dst"], _unq(m["dst_label"])),
            ):
                if lab:
                    if labels.get(var, lab) != lab:
                        raise ValueError(
                            f"conflicting labels for {var!r}: "
                            f"{labels[var]!r} vs {lab!r}"
                        )
                    labels[var] = lab
            parsed.append(
                (m["src"], _unq(m["rel"]), m["dst"], m["ev"], vl,
                 m["arrow"] == "-", pat)
            )

        result: DataFrame | None = None
        bound: set[str] = set()
        for i, (src, rel_name, dst, ev, vl, und, pat) in enumerate(parsed):
            # orientation choice: use the edge table bucketed on this
            # hop's JOIN key so chained hops need no shuffle.  Pattern 0
            # has no join yet — orient it by whichever of its variables
            # the NEXT pattern shares (the key it will be joined on).
            if i == 0:
                prefer = None
                if len(parsed) > 1:
                    nxt_vars = {parsed[1][0], parsed[1][2]}
                    if dst in nxt_vars:
                        prefer = "dst"
                    elif src in nxt_vars:
                        prefer = "src"
            else:
                prefer = "src" if src in bound else ("dst" if dst in bound else None)
            if vl is not None:
                e = self._varlen_pairs(rel_name, *vl, undirected=und).select(
                    F.col("src").alias(f"__src{i}"),
                    F.col("dst").alias(f"__dst{i}"),
                )
            else:
                e = (
                    self._rel_undirected(rel_name, prefer)
                    if und
                    else self._rel_oriented(rel_name, prefer)
                )
                prop_cols = [c for c in e.columns if c not in ("rel", "src", "dst")]
                sel = [
                    F.col("src").alias(f"__src{i}"),
                    F.col("dst").alias(f"__dst{i}"),
                ]
                if ev:
                    sel.append(F.struct(*[F.col(c) for c in prop_cols]).alias(ev))
                e = e.select(*sel)
            if result is None:
                result = e
            else:
                conds = []
                if src in bound:
                    conds.append(result[src] == e[f"__src{i}"])
                if dst in bound:
                    conds.append(result[dst] == e[f"__dst{i}"])
                if not conds:
                    raise ValueError(
                        f"pattern {pat!r} shares no variable with earlier patterns"
                    )
                cond = conds[0]
                for c in conds[1:]:
                    cond = cond & c
                result = result.join(e, cond)
            if src == dst:
                # self-loop pattern "(a)-[R]->(a)": src and dst are the
                # same variable, so the equality must be an explicit
                # filter — otherwise __dst{i} would be silently dropped
                # and the result would contain ALL R edges
                result = result.filter(
                    F.col(f"__src{i}") == F.col(f"__dst{i}")
                )
            renames = {}
            if src not in bound:
                renames[f"__src{i}"] = src
            if dst not in bound and dst != src:
                renames[f"__dst{i}"] = dst
            for old, new in renames.items():
                result = result.withColumnRenamed(old, new)
            result = result.drop(f"__src{i}", f"__dst{i}")
            bound.update((src, dst))
        # label constraints — one semi-join per labeled variable against
        # the node table ("(a:Process)" ≡ Cypher's label predicate);
        # label is a partition column of the canonical layout, so each
        # semi-join side is a pruned scan
        for var, lab in labels.items():
            keys = self.nodes.filter(F.col("label") == lab).select(
                F.col("key").alias(var)
            )
            result = result.join(keys, var, "left_semi")
        return result

    def find_optional(self, motif: str, optional: str) -> DataFrame:
        """``MATCH motif OPTIONAL MATCH optional`` — the required motif
        result left-joined against the optional pattern group on their
        shared node variables; optional-only variables (and edge-prop
        structs) come back NULL where the optional group has no match.
        Cypher semantics per optional GROUP: rows multiply when the
        optional part matches several times, and survive (with NULLs)
        when it matches none.  One extra left hash join — AQE/CBO still
        free to broadcast the smaller side."""
        req = self.find(motif)
        opt = self.find(optional)
        shared = [c for c in req.columns if c in opt.columns]
        if not shared:
            raise ValueError(
                "optional pattern shares no node variable with the motif"
            )
        return req.join(opt, on=shared, how="left")

    # -- set-style patterns --------------------------------------------------

    def semi(self, keys: DataFrame, rel: str, key_col: str = "key") -> DataFrame:
        """``WHERE (n)-[:rel]->()`` — keep keys having an outgoing rel."""
        e = self.rel(rel).select(F.col("src").alias(key_col))
        return keys.join(e, key_col, "left_semi")

    def anti(self, keys: DataFrame, rel: str, key_col: str = "key") -> DataFrame:
        """``WHERE NOT (n)-[:rel]->()`` — keys with no outgoing rel."""
        e = self.rel(rel).select(F.col("src").alias(key_col))
        return keys.join(e, key_col, "left_anti")

    # -- analytics-lite ------------------------------------------------------

    def degrees(self, rel: str | None = None) -> DataFrame:
        """(key, in_degree, out_degree, degree) — one shuffle each side."""
        e = self.edges if rel is None else self.rel(rel)
        out_d = e.groupBy(F.col("src").alias("key")).agg(F.count("*").alias("out_degree"))
        in_d = e.groupBy(F.col("dst").alias("key")).agg(F.count("*").alias("in_degree"))
        return (
            out_d.join(in_d, "key", "full_outer")
            .fillna(0, subset=["in_degree", "out_degree"])
            .withColumn("degree", F.col("in_degree") + F.col("out_degree"))
        )


def _graphquery_cypher(
    self, query: str, props: dict[str, DataFrame] | None = None
) -> DataFrame:
    """Run Cypher text against this graph — the migrating analyst's
    one-liner (`operators/cypher.py` documents the supported subset):

    >>> gq.cypher("MATCH (a:Process)-[:SPAWNS*1..3]->(b) RETURN b")
    """
    from graphdb_neo4j_spark.operators.cypher import cypher as _cypher

    return _cypher(self, query, props=props)


GraphQuery.cypher = _graphquery_cypher


def graph_diff(old, new) -> DataFrame:
    """(kind, name, change, n) — multiset diff between two property
    graphs: the ``exceptAll`` graph-diffing surface SURVEY §2.D calls
    out for comparing corpus versions (what did the new drop add,
    what disappeared, which edges were rewritten).

    * ``(node, <label>, added|removed, n)`` — identity = (label, key);
    * ``(edge, <rel>, added|removed, n)`` — identity = (rel, src, dst);
    * ``(edge, <rel>, modified, n)`` — same identity on both sides but
      different properties (last-writer-wins resolution drift);
    * ``(node, <label>, modified, n)`` — same key, different node
      properties, for every typed node table.

    100 TB shape: every leg is a hash ``exceptAll``/anti-join keyed on
    the graph's natural identity columns — the same shuffle keys the
    partitioned graph tables already carry, so corpus-version diffing
    co-partitions with the layout and never compares across labels or
    rel types.
    """
    def cnt(df: DataFrame, kind: str, change: str, name_col) -> DataFrame:
        return (
            df.groupBy(name_col.alias("name"))
            .agg(F.count("*").cast("bigint").alias("n"))
            .select(
                F.lit(kind).alias("kind"),
                "name",
                F.lit(change).alias("change"),
                "n",
            )
        )

    on, nn = old.nodes(), new.nodes()
    oe = old.edges.select("rel", "src", "dst")
    ne = new.edges.select("rel", "src", "dst")
    parts = [
        cnt(nn.exceptAll(on), "node", "added", F.col("label")),
        cnt(on.exceptAll(nn), "node", "removed", F.col("label")),
    ]
    edge_add = ne.exceptAll(oe)
    edge_rem = oe.exceptAll(ne)
    parts += [
        cnt(edge_add, "edge", "added", F.col("rel")),
        cnt(edge_rem, "edge", "removed", F.col("rel")),
    ]
    # modified = identity exists on BOTH sides, any property differs
    # (null-safe compare) — a co-partitioned key join per table, never
    # a full-row multiset subtraction
    def modified(nt: DataFrame, ot: DataFrame, keys: list[str]) -> DataFrame:
        prop_cols = [c for c in nt.columns if c not in keys]
        if not prop_cols:
            return nt.limit(0).select(*keys)
        n_side = nt.select(
            *keys, *[F.col(c).alias(f"__n_{c}") for c in prop_cols]
        )
        o_side = ot.select(
            *keys, *[F.col(c).alias(f"__o_{c}") for c in prop_cols]
        )
        drift = None
        for c in prop_cols:
            neq = ~F.col(f"__n_{c}").eqNullSafe(F.col(f"__o_{c}"))
            drift = neq if drift is None else (drift | neq)
        return n_side.join(o_side, keys).filter(drift).select(*keys)

    parts.append(
        cnt(
            modified(new.edges, old.edges, ["rel", "src", "dst"]),
            "edge",
            "modified",
            F.col("rel"),
        )
    )
    for label, attr, key_col in [
        ("Process", "process", "key"),
        ("RegistryValue", "registry_value", "path"),
        ("WmiFilter", "wmi_filter", "name"),
        ("WmiConsumer", "wmi_consumer", "name"),
    ]:
        parts.append(
            cnt(
                modified(getattr(new, attr), getattr(old, attr), [key_col]),
                "node",
                "modified",
                F.lit(label),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out

"""Pure-Python (Spark-free) computation of the corpus graph analytics
that g40/g42/g44/g79/g80 run on the reference trace corpus.

Everything here derives from tests/oracle_sim.simulate — the
independent re-implementation of the reference loader's semantics
(cited per-handler in operators/ingest.py) — plus textbook
union-find / BFS / Kahn peeling.  Used both to GENERATE the constant
oracles in graphdb_neo4j_spark/corpus_golden.py and, at test time, to
re-derive them from the raw corpus so the constants can never drift
from the independent implementation (tests/test_corpus_golden.py).
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections import defaultdict, deque

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_sim import simulate  # noqa: E402

CORPUS_GLOB = "/root/reference/malware/*.json"


def load_corpus(pattern: str = CORPUS_GLOB):
    files = sorted(glob.glob(pattern))
    traces, names = [], []
    for p in files:
        with open(p, encoding="utf-8-sig") as f:
            traces.append(json.load(f))
        names.append(os.path.basename(p))
    return traces, names


def corpus_sets(pattern: str = CORPUS_GLOB):
    traces, names = load_corpus(pattern)
    return simulate(traces, names)


def g40_component_sizes(nodes, edges, topk=20):
    """Union-find over SPAWNS (undirected), min-key representative;
    all Process nodes participate (isolates are singletons)."""
    parent = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        # min-key wins as representative (matches large/small-star)
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra

    for k in nodes["Process"]:
        parent.setdefault(k, k)
    for s, d in edges["SPAWNS"]:
        parent.setdefault(s, s)
        parent.setdefault(d, d)
        union(s, d)
    sizes = defaultdict(int)
    for k in list(parent):
        sizes[find(k)] += 1
    rows = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))[:topk]
    return [(comp, size) for comp, size in rows]


def g42_bfs_depths(edges):
    """Min-hop BFS over directed SPAWNS from root processes (sources
    that are never a destination); (dist, n_processes) histogram."""
    spawns = edges["SPAWNS"]
    srcs = {s for s, _ in spawns}
    dsts = {d for _, d in spawns}
    roots = srcs - dsts
    adj = defaultdict(list)
    for s, d in spawns:
        adj[s].append(d)
    dist = {r: 0 for r in roots}
    q = deque(roots)
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    hist = defaultdict(int)
    for d in dist.values():
        hist[d] += 1
    return sorted(hist.items())


def g44_golden_counts(nodes, edges):
    rows = [(f"node:{lbl}", len(ks)) for lbl, ks in nodes.items()]
    rows += [(f"edge:{rel}", len(es)) for rel, es in edges.items()]
    return sorted(rows)


def g79_topo_levels(nodes, edges):
    """Kahn longest-path levels over SPAWNS restricted to Process
    vertices; cycle residue reported as level None."""
    verts = set(nodes["Process"])
    e = {(s, d) for s, d in edges["SPAWNS"] if s in verts and d in verts and s != d}
    preds = defaultdict(set)
    succs = defaultdict(set)
    for s, d in e:
        preds[d].add(s)
        succs[s].add(d)
    level = {}
    remaining = set(verts)
    indeg = {v: len(preds[v] & remaining) for v in remaining}
    cur = 0
    frontier = {v for v in remaining if indeg[v] == 0}
    while frontier:
        for v in frontier:
            level[v] = cur
        remaining -= frontier
        nxt = set()
        for v in frontier:
            for w in succs[v]:
                if w in remaining:
                    preds[w].discard(v)
                    if not (preds[w] & remaining):
                        nxt.add(w)
        frontier = nxt
        cur += 1
    hist = defaultdict(int)
    for v in verts:
        hist[level.get(v)] += 1
    # None (cycle residue) sorts last
    return sorted(hist.items(), key=lambda kv: (kv[0] is None, kv[0] or 0))


def g80_undirected_degree(edges, topk=25):
    """Total SPAWNS degree (in + out over the deduped edge set) per
    process, top-k by (degree desc, key)."""
    deg = defaultdict(int)
    for s, d in edges["SPAWNS"]:
        deg[s] += 1
        deg[d] += 1
    rows = sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))[:topk]
    return rows


def compute_all(pattern: str = CORPUS_GLOB):
    nodes, edges = corpus_sets(pattern)
    return {
        "g40": g40_component_sizes(nodes, edges),
        "g42": g42_bfs_depths(edges),
        "g44": g44_golden_counts(nodes, edges),
        "g79": g79_topo_levels(nodes, edges),
        "g80": g80_undirected_degree(edges),
    }


if __name__ == "__main__":
    out = compute_all()
    for k, v in out.items():
        print(k, len(v), v[:3])

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

from tests.oracle_sim import (  # noqa: E402
    EDGE_PROP_NAMES,
    derive_spans,
    simulate,
    simulate_full,
)

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


def g43_injector_files(edges, topk=20):
    """Motif (a)-[INJECTED_THREAD]->(b), (b)-[CREATED_FILE]->(f):
    distinct created files per injector, top-k by (n desc, a)."""
    created = defaultdict(set)
    for b, f in edges["CREATED_FILE"]:
        created[b].add(f)
    per_a = defaultdict(set)
    for a, b in edges["INJECTED_THREAD"]:
        per_a[a] |= created.get(b, set())
    rows = [(a, len(fs)) for a, fs in per_a.items() if fs]
    return sorted(rows, key=lambda kv: (-kv[1], kv[0]))[:topk]


def g46_scc_shape(nodes, edges):
    """Tarjan SCC (iterative) over SPAWNS restricted to Process verts;
    returns the single (n_components, n_vertices, max_scc_size) row."""
    verts = set(nodes["Process"])
    adj = defaultdict(list)
    for s, d in edges["SPAWNS"]:
        if s in verts and d in verts:
            adj[s].append(d)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    counter = [0]
    n_comp = 0
    max_size = 0
    for root in verts:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            ns = adj.get(v, [])
            for i in range(pi, len(ns)):
                w = ns[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if pi < len(ns):
                pass
            if low[v] == index[v]:
                size = 0
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    size += 1
                    if w == v:
                        break
                n_comp += 1
                max_size = max(max_size, size)
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
    return [(n_comp, len(verts), max_size)]


def g48_kcore_sizes(nodes, edges, ks=(1, 2, 3)):
    """k-core sizes via textbook iterative peeling over the undirected
    deduped SPAWNS graph (isolated Process nodes peel at k>=1)."""
    und = {(min(s, d), max(s, d)) for s, d in edges["SPAWNS"] if s != d}
    out = []
    for k in ks:
        remaining = set(nodes["Process"])
        while True:
            deg = defaultdict(int)
            for a, b in und:
                if a in remaining and b in remaining:
                    deg[a] += 1
                    deg[b] += 1
            keep = {v for v in remaining if deg.get(v, 0) >= k}
            if keep == remaining:
                break
            remaining = keep
        out.append((k, len(remaining)))
    return out


def g55_optional_spawn_files(edges, topk=20):
    """OPTIONAL MATCH (a)-[SPAWNS]->(b) left-extended by
    (b)-[CREATED_FILE]->(f): per parent, distinct children and the
    union of their created files; top-k by (n_files desc,
    n_children desc, a)."""
    created = defaultdict(set)
    for b, f in edges["CREATED_FILE"]:
        created[b].add(f)
    children = defaultdict(set)
    for a, b in edges["SPAWNS"]:
        children[a].add(b)
    rows = []
    for a, bs in children.items():
        files = set()
        for b in bs:
            files |= created.get(b, set())
        rows.append((a, len(bs), len(files)))
    rows.sort(key=lambda r: (-r[2], -r[1], r[0]))
    return rows[:topk]


def _md5(s):
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()


def g72_greedy_matching(edges, topk=20):
    """Sequential greedy matching in (md5('src|dst'), src, dst) order
    over canonical src<dst SPAWNS edges — the exact sequential
    equivalent of traversal.greedy_matching's handshake rounds.
    Returns the size row + the topk lexicographically-first pairs,
    in the query's (src, dst) string layout."""
    und = {(min(s, d), max(s, d)) for s, d in edges["SPAWNS"] if s != d}
    order = sorted(und, key=lambda e: (_md5(e[0] + "|" + e[1]), e[0], e[1]))
    used = set()
    matched = []
    for a, b in order:
        if a in used or b in used:
            continue
        used.add(a)
        used.add(b)
        matched.append((a, b))
    rows = [("__size__", str(len(matched)))]
    rows.extend(sorted(matched)[:topk])
    return rows


def g75_independent_set(edges, topk=20):
    """Sequential greedy MIS in (md5(v), v) order over the SPAWNS
    vertex set (edge endpoints only, matching the query's vertex
    frame) — the exact sequential equivalent of
    traversal.maximal_independent_set's Luby rounds with static md5
    priorities.  Returns the size row + topk smallest members in the
    query's (kind, value) layout."""
    und = {(min(s, d), max(s, d)) for s, d in edges["SPAWNS"] if s != d}
    verts = {v for e in und for v in e}
    nbrs = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    mis = set()
    for v in sorted(verts, key=lambda v: (_md5(v), v)):
        if not (nbrs[v] & mis):
            mis.add(v)
    rows = [("size", str(len(mis)))]
    rows.extend(("member", v) for v in sorted(mis)[:topk])
    return rows


def g58_varlen_paths(edges, max_len=3):
    """(a)-[SPAWNS*1..max_len]->(b) path count + distinct endpoint
    pairs — plain layered chain walk over the deduped edge set (the
    corpus spawn graph is a DAG, so path rows equal Cypher's
    relationship-unique semantics)."""
    e = {(s, d) for s, d in edges["SPAWNS"] if s != d}
    adj = defaultdict(list)
    for s_, d_ in e:
        adj[s_].append(d_)
    n_paths = 0
    pairs = set()
    frontier = {(s_, d_): 1 for s_, d_ in e}  # (start, end) -> #paths
    for _level in range(max_len):
        n_paths += sum(frontier.values())
        pairs |= set(frontier)
        nxt = defaultdict(int)
        for (a, b), c in frontier.items():
            for d_ in adj.get(b, ()):  # extend by one edge
                nxt[(a, d_)] += c
        frontier = nxt
    return [(n_paths, len(pairs))]


def g76_greedy_coloring(edges):
    """Sequential greedy (Jones-Plassmann-equivalent) coloring in
    (md5(v), v) order over the SPAWNS edge endpoints: each vertex takes
    the mex of its already-colored neighbors.  Returns color-class
    sizes ordered by color."""
    und = {(min(s, d), max(s, d)) for s, d in edges["SPAWNS"] if s != d}
    verts = {v for e in und for v in e}
    nbrs = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    color = {}
    for v in sorted(verts, key=lambda v: (_md5(v), v)):
        taken = {color[w] for w in nbrs[v] if w in color}
        c = 0
        while c in taken:
            c += 1
        color[v] = c
    sizes = defaultdict(int)
    for c in color.values():
        sizes[c] += 1
    return sorted(sizes.items())


def _multi_source_bfs(edges_set, roots):
    """Level-synchronous BFS forest with the min-frontier-parent
    predecessor tie-break (traversal.bfs_tree semantics).  Returns
    (dist, pred) per reached vertex; roots have dist 0, pred None."""
    adj = defaultdict(list)
    for s, d in edges_set:
        adj[s].append(d)
    dist = {r: 0 for r in roots}
    pred = {r: None for r in roots}
    frontier = set(roots)
    hop = 0
    while frontier:
        hop += 1
        cand = {}
        for u in sorted(frontier):
            for v in adj.get(u, ()):
                if v not in dist and (v not in cand or u < cand[v]):
                    cand[v] = u
        nxt = set()
        for v, u in cand.items():
            dist[v] = hop
            pred[v] = u
            nxt.add(v)
        frontier = nxt
    return dist, pred


def _backtrace(pred, key):
    path = [key]
    while pred[path[-1]] is not None:
        path.append(pred[path[-1]])
    return path[::-1]


def g49_temporal_motif(rows, topk=100):
    """Dropper→beacon motif: SPAWNS row (parent, child, t_spawn) joined
    to ev-3 connects (child, dst, t_conn) within 60 s; distinct tuples,
    (parent, child, dst, lag) order, top-k."""
    spawns = [
        (r["parent_key"], r["pkey"], r["start_time"])
        for r in rows if r["pkey"] and r["parent_key"]
    ]
    connects = []
    for r in rows:
        if r["ev"] == "3" and r["pkey"]:
            dst = r["tm"].get("DestinationIp")
            if dst is None:
                h = r["tm"].get("DestinationHostname")
                dst = h.lower() if h is not None else None
            if dst is not None:
                connects.append((r["pkey"], dst, r["start_time"]))
    by_child = defaultdict(list)
    for child, dst, t in connects:
        by_child[child].append((dst, t))
    hits = set()
    for parent, child, t_spawn in spawns:
        for dst, t_conn in by_child.get(child, ()):
            lag = t_conn - t_spawn
            if 0 <= lag <= 60_000_000:
                hits.add((parent, child, dst, lag))
    return sorted(hits)[:topk]


def g53_temporal_reachability(rows):
    """Earliest-arrival fixpoint over timestamped SPAWNS rows from the
    (min t, min src) root — time-respecting reachability (Holme &
    Saramäki); the root's −∞ start is excluded from the aggregate."""
    spawns = [
        (r["parent_key"], r["pkey"], r["start_time"])
        for r in rows if r["pkey"] and r["parent_key"]
    ]
    root = min(spawns, key=lambda e: (e[2], e[0]))[0]
    adj = defaultdict(list)
    for s, d, t in spawns:
        adj[s].append((d, t))
    NEG = -(1 << 62)
    arrive = {root: NEG}
    frontier = {root}
    while frontier:
        cand = {}
        for u in frontier:
            au = arrive[u]
            for v, t in adj.get(u, ()):
                if t >= au and (v not in cand or t < cand[v]):
                    cand[v] = t
        improved = {
            v: t for v, t in cand.items()
            if v not in arrive or t < arrive[v]
        }
        arrive.update(improved)
        frontier = set(improved)
    reached = [t for v, t in arrive.items() if t > NEG]
    return [(len(reached), min(reached), max(reached))]


def g59_provenance_paths(nodes, edges, topk=20):
    """Trace → Process* → File chains: min-pred BFS forest over
    SPAWNS ∪ CREATED_FILE from spawn roots, paths materialized for
    File targets, root's trace via min-HAS_PROCESS-src; the 20 deepest
    (hops desc, file)."""
    spawns = edges["SPAWNS"]
    union_e = set(spawns) | set(edges["CREATED_FILE"])
    roots = {s for s, _ in spawns} - {d for _, d in spawns}
    dist, pred = _multi_source_bfs(union_e, roots)
    trace_of = {}
    for t, p in edges["HAS_PROCESS"]:
        if p not in trace_of or t < trace_of[p]:
            trace_of[p] = t
    files = nodes["File"]
    out = []
    for f in files:
        if f not in dist:
            continue
        path = _backtrace(pred, f)
        trace = trace_of.get(path[0])
        chain = " -> ".join(([trace] if trace is not None else []) + path)
        out.append((f, dist[f] + 1, chain))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:topk]


def g62_path_hubs(edges, topk=20):
    """UNWIND nodes(shortestPath(root →SPAWNS*→ b)): single-source
    min-pred BFS from the top spawner, every path's node list exploded
    and counted; (on_paths desc, n) top-k."""
    spawns = edges["SPAWNS"]
    outdeg = defaultdict(int)
    for s, _ in spawns:
        outdeg[s] += 1
    root = max(sorted(outdeg), key=lambda s: outdeg[s])  # count desc, key asc
    dist, pred = _multi_source_bfs(set(spawns), {root})
    counts = defaultdict(int)
    for b, d in dist.items():
        if d < 1:
            continue
        for n in _backtrace(pred, b):
            counts[n] += 1
    rows = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:topk]
    return [(n, c) for n, c in rows]


def g63_net_only(edges, topk=20):
    """Per trace: processes with a CONNECTED_TO edge but no
    CREATED_FILE edge (EXISTS ∧ NOT EXISTS), count distinct."""
    has_net = {s for s, _ in edges["CONNECTED_TO"]}
    has_file = {s for s, _ in edges["CREATED_FILE"]}
    per_trace = defaultdict(set)
    for t, p in edges["HAS_PROCESS"]:
        if p in has_net and p not in has_file:
            per_trace[t].add(p)
    rows = [(t, len(ps)) for t, ps in per_trace.items()]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:topk]


def g65_persistence(edges, topk=20):
    """Per trace: processes SET_REG_VALUE-ing a path containing 'Run'
    (T1547.001 autostart triage), count distinct."""
    run_writers = {s for s, d in edges["SET_REG_VALUE"] if "Run" in d}
    per_trace = defaultdict(set)
    for t, p in edges["HAS_PROCESS"]:
        if p in run_writers:
            per_trace[t].add(p)
    rows = [(t, len(ps)) for t, ps in per_trace.items()]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:topk]


def g67_degree_triage(edges, topk=20):
    """Every process (DISTINCT HAS_PROCESS dst) ranked by deduped
    SPAWNS out-degree then CONNECTED_TO out-degree."""
    spawn_out = defaultdict(int)
    for s, _ in edges["SPAWNS"]:
        spawn_out[s] += 1
    net_out = defaultdict(int)
    for s, _ in edges["CONNECTED_TO"]:
        net_out[s] += 1
    procs = {p for _, p in edges["HAS_PROCESS"]}
    rows = [(p, spawn_out.get(p, 0), net_out.get(p, 0)) for p in procs]
    rows.sort(key=lambda r: (-r[1], -r[2], r[0]))
    return rows[:topk]


def g71_ioc_union(edges, topk=25):
    """Three IOC arms (net / file / reg), each (kind, value,
    n_distinct_procs); UNION set semantics, (n desc, kind, value)."""
    arms = [
        ("net", "CONNECTED_TO"),
        ("file", "CREATED_FILE"),
        ("reg", "SET_REG_VALUE"),
    ]
    rows = set()
    for kind, rel in arms:
        per_dst = defaultdict(set)
        for s, d in edges[rel]:
            per_dst[d].add(s)
        rows |= {(kind, d, len(ps)) for d, ps in per_dst.items()}
    out = sorted(rows, key=lambda r: (-r[2], r[0], r[1]))
    return out[:topk]


def g77_tls_beacons(edge_props, process_props, topk=20):
    """CONNECTED_TO edges whose last-writer-wins dport == '443',
    grouped by the source process's image property.  NULL image sorts
    FIRST within an n_beacons tie (Spark ASC null ordering — the
    engine's ORDER BY runs in Spark)."""
    counts = defaultdict(int)
    for (rel, src, dst), props in edge_props.items():
        if rel == "CONNECTED_TO" and props["dport"] == "443":
            img = process_props[src]["image"]
            counts[img] += 1
    rows = sorted(
        counts.items(),
        key=lambda kv: (-kv[1], kv[0] is not None, kv[0] or ""),
    )[:topk]
    return rows


def g60_spawn_endpoint_hubs(edges, topk=20):
    """Motif (a)-[SPAWNS]->(b), (b)-[CONNECTED_TO]->(ip): row count per
    ip over the deduped edge tables = Σ_b in_spawn(b)·[b→ip]."""
    in_spawn = defaultdict(int)
    for _a, b in edges["SPAWNS"]:
        in_spawn[b] += 1
    n_conn = defaultdict(int)
    for b, ip in edges["CONNECTED_TO"]:
        if in_spawn.get(b):
            n_conn[ip] += in_spawn[b]
    rows = sorted(n_conn.items(), key=lambda kv: (-kv[1], kv[0]))[:topk]
    return rows


def g61_root_descendant_hops(edges, topk=20):
    """shortestPath((top-spawner)-[:SPAWNS*]->(b)): BFS hop distance to
    every descendant, (hops, b) order."""
    spawns = edges["SPAWNS"]
    outdeg = defaultdict(int)
    for s, _ in spawns:
        outdeg[s] += 1
    root = max(sorted(outdeg), key=lambda s: outdeg[s])
    dist, _pred = _multi_source_bfs(set(spawns), {root})
    rows = sorted(
        ((b, d) for b, d in dist.items() if d >= 1),
        key=lambda r: (r[1], r[0]),
    )[:topk]
    return rows


def g64_pinned_path(edges):
    """Two-pinned shortestPath UNWOUND to per-step rows — the exact
    sequential mirror of traversal.shortest_path_bidirectional's
    documented determinism rules: per-side min-frontier-parent
    predecessors, smaller-frontier expansion schedule, stop once
    depth_f + depth_b >= best, meet node = min key realizing the
    optimal crossing."""
    spawns = set(edges["SPAWNS"])
    outdeg = defaultdict(int)
    for s, _ in spawns:
        outdeg[s] += 1
    root = max(sorted(outdeg), key=lambda s: outdeg[s])
    dist, _ = _multi_source_bfs(spawns, {root})
    # destination: min key at maximum BFS depth (excluding the root)
    dst = min(
        (k for k, d in dist.items() if k != root
         and d == max(v for kk, v in dist.items() if kk != root)),
    )
    fwd_adj = defaultdict(list)
    bwd_adj = defaultdict(list)
    for s, d in spawns:
        fwd_adj[s].append(d)
        bwd_adj[d].append(s)

    def mk(key):
        return {
            "dist": {key: 0}, "pred": {key: None},
            "frontier": {key}, "depth": 0, "alive": True,
        }

    fwd, bwd = mk(root), mk(dst)
    best = None
    for _ in range(2 * 64):
        if (not bwd["alive"]) or (
            fwd["alive"] and len(fwd["frontier"]) <= len(bwd["frontier"])
        ):
            side, adj = fwd, fwd_adj
        else:
            side, adj = bwd, bwd_adj
        if not side["alive"]:
            break
        cand = {}
        for u in side["frontier"]:
            for v in adj.get(u, ()):
                if v not in side["dist"] and (v not in cand or u < cand[v]):
                    cand[v] = u
        side["depth"] += 1
        if not cand:
            side["alive"] = False
            if not fwd["alive"] and not bwd["alive"]:
                break
        else:
            for v, u in cand.items():
                side["dist"][v] = side["depth"]
                side["pred"][v] = u
            side["frontier"] = set(cand)
        crossing = [
            fwd["dist"][k] + bwd["dist"][k]
            for k in fwd["dist"].keys() & bwd["dist"].keys()
        ]
        if crossing:
            m = min(crossing)
            best = m if best is None else min(best, m)
        if best is not None and fwd["depth"] + bwd["depth"] >= best:
            break
        if not fwd["alive"] and not bwd["alive"]:
            break
    assert best is not None
    meet = min(
        k for k in fwd["dist"].keys() & bwd["dist"].keys()
        if fwd["dist"][k] + bwd["dist"][k] == best
    )
    left = _backtrace(fwd["pred"], meet)          # root .. meet
    right = _backtrace(bwd["pred"], meet)          # dst .. meet
    path = left + right[::-1][1:]                  # root .. meet .. dst
    hops = len(path) - 1
    return [(root, dst, hops, step) for step in path]


def g68_double_sweep(edges):
    """Double-sweep diameter lower bound on the undirected SPAWNS
    graph: BFS from the min process key, BFS again from the farthest
    (max dist, min key) node; second eccentricity = bound."""
    und = set()
    for s, d in edges["SPAWNS"]:
        und.add((s, d))
        und.add((d, s))
    start = min(v for e in und for v in e)
    dist1, _ = _multi_source_bfs(und, {start})
    far = min((k for k in dist1), key=lambda k: (-dist1[k], k))
    dist2, _ = _multi_source_bfs(und, {far})
    return [(start, far, dist1[far], max(dist2.values()))]


def g57_densest_subgraph(edges, epsilon=0.1, max_iter=50):
    """Sequential mirror of traversal.densest_subgraph (Bahmani et al.
    2(1+ε)-approx peel) over the canonical undirected union of ALL
    relationship tables: density = |E|/|V| in Python float, remove
    every vertex with degree ≤ (1+ε)·2·density per round, keep the
    best iterate."""
    und = {
        (min(s, d), max(s, d))
        for rel_edges in edges.values()
        for s, d in rel_edges
        if s != d
    }
    cur = und
    best_n, best_density = None, -1.0
    for _ in range(max_iter):
        deg = defaultdict(int)
        for a, b in cur:
            deg[a] += 1
            deg[b] += 1
        n_v = len(deg)
        if not n_v:
            break
        n_e = sum(deg.values()) // 2
        density = n_e / n_v
        if density > best_density:
            best_density = density
            best_n = n_v
        threshold = (1.0 + epsilon) * 2.0 * density
        keep = {v for v, dv in deg.items() if dv > threshold}
        cur = {(a, b) for a, b in cur if a in keep and b in keep}
    return [(best_n, round(best_density, 6))]


_DIFF_NODE_PROP_TABLES = (
    ("Process", "process", ("image", "command_line", "process_guid",
                            "parent_process_guid")),
    ("RegistryValue", "registry_value", None),
    ("WmiFilter", "wmi_filter", None),
    ("WmiConsumer", "wmi_consumer", None),
)


def g66_graph_diff(pattern: str = CORPUS_GLOB,
                   old_pattern: str = "/root/reference/malware/T10*.json"):
    """Corpus-version diff (full vs T10* subset): per-label node adds/
    removes, per-rel edge adds/removes, property-modified edge and node
    counts under the last-writer-wins resolution — the independent
    mirror of operators/graph.graph_diff over tests/oracle_sim
    .simulate_full."""
    tn, tf = load_corpus(pattern)
    on_, of_ = load_corpus(old_pattern)
    new_nodes, new_edges, new_props = simulate_full(tn, tf)
    old_nodes, old_edges, old_props = simulate_full(on_, of_)

    rows = []

    def emit(kind, name, change, n):
        if n:
            rows.append((kind, name, change, n))

    labels = set(new_nodes) | set(old_nodes)
    for lbl in labels:
        nw, od = new_nodes.get(lbl, set()), old_nodes.get(lbl, set())
        emit("node", lbl, "added", len(nw - od))
        emit("node", lbl, "removed", len(od - nw))
    rels = set(new_edges) | set(old_edges)
    for rel in rels:
        nw, od = new_edges.get(rel, set()), old_edges.get(rel, set())
        emit("edge", rel, "added", len(nw - od))
        emit("edge", rel, "removed", len(od - nw))
    # modified edges: shared identity, any of the ten props differs
    mod = defaultdict(int)
    for ident, np_ in new_props["edge"].items():
        op_ = old_props["edge"].get(ident)
        if op_ is not None and any(
            np_[p] != op_[p] for p in EDGE_PROP_NAMES
        ):
            mod[ident[0]] += 1
    for rel, n in mod.items():
        emit("edge", rel, "modified", n)
    # modified typed nodes: shared key, any property differs
    for label, attr, prop_keys in _DIFF_NODE_PROP_TABLES:
        np_, op_ = new_props[attr], old_props[attr]
        n = 0
        for k, v in np_.items():
            if k not in op_:
                continue
            if prop_keys is None:
                if v != op_[k]:
                    n += 1
            elif any(v[p] != op_[k][p] for p in prop_keys):
                n += 1
        emit("node", label, "modified", n)
    return sorted(rows)


def compute_all(pattern: str = CORPUS_GLOB):
    traces, names = load_corpus(pattern)
    nodes, edges = simulate(traces, names)
    rows = derive_spans(traces, names)
    _, _, props = simulate_full(traces, names)
    extra = {
        "g49": g49_temporal_motif(rows),
        "g53": g53_temporal_reachability(rows),
        "g59": g59_provenance_paths(nodes, edges),
        "g62": g62_path_hubs(edges),
        "g63": g63_net_only(edges),
        "g65": g65_persistence(edges),
        "g66": g66_graph_diff(pattern),
        "g67": g67_degree_triage(edges),
        "g71": g71_ioc_union(edges),
        "g77": g77_tls_beacons(props["edge"], props["process"]),
        "g57": g57_densest_subgraph(edges),
        "g60": g60_spawn_endpoint_hubs(edges),
        "g61": g61_root_descendant_hops(edges),
        "g64": g64_pinned_path(edges),
        "g68": g68_double_sweep(edges),
    }
    return extra | {
        "g40": g40_component_sizes(nodes, edges),
        "g42": g42_bfs_depths(edges),
        "g43": g43_injector_files(edges),
        "g44": g44_golden_counts(nodes, edges),
        "g46": g46_scc_shape(nodes, edges),
        "g48": g48_kcore_sizes(nodes, edges),
        "g55": g55_optional_spawn_files(edges),
        "g58": g58_varlen_paths(edges),
        "g72": g72_greedy_matching(edges),
        "g75": g75_independent_set(edges),
        "g76": g76_greedy_coloring(edges),
        "g79": g79_topo_levels(nodes, edges),
        "g80": g80_undirected_degree(edges),
    }


if __name__ == "__main__":
    out = compute_all()
    for k, v in out.items():
        print(k, len(v), v[:3])

"""MMR re-rank (similarity.mmr_rerank): pure-Python greedy oracle on a
random fixture + diversification sanity."""

from __future__ import annotations

import math
import random

from graphdb_neo4j_spark.operators.similarity import mmr_rerank


def _mmr_oracle(cands, k, lam):
    """cands: list of (id, rel, vec). Greedy argmax with min-id tiebreak
    over float64 — mirrors the operator exactly."""
    def norm(v):
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / n for x in v]

    vecs = {i: norm(v) for i, rel, v in cands}
    rel = {i: r for i, r, v in cands}
    ids = sorted(vecs)
    picked, out = [], []
    max_sim = {i: -math.inf for i in ids}
    for _ in range(min(k, len(ids))):
        best, best_id = -math.inf, None
        for i in ids:
            if i in picked:
                continue
            s = lam * rel[i] - (0.0 if not picked else (1 - lam) * max_sim[i])
            if s > best or (s == best and (best_id is None or i < best_id)):
                best, best_id = s, i
        picked.append(best_id)
        out.append((best_id, best))
        bv = vecs[best_id]
        for i in ids:
            d = sum(a * b for a, b in zip(vecs[i], bv))
            max_sim[i] = max(max_sim[i], d)
    return out


def test_mmr_matches_python_oracle(spark):
    rng = random.Random(7)
    rows = []
    for q in range(3):
        for i in range(30):
            vec = [rng.uniform(-1, 1) for _ in range(8)]
            rows.append((q, i, vec, round(rng.uniform(0, 1), 6)))
    df = spark.createDataFrame(
        rows, "query_id long, id long, embedding array<double>, sim double"
    )
    got = {
        (r["query_id"], r["mmr_rank"]): (r["id"], r["mmr_score"])
        for r in mmr_rerank(df, k=5, lam=0.5).collect()
    }
    for q in range(3):
        cands = [(i, s, v) for (qq, i, v, s) in rows if qq == q]
        want = _mmr_oracle(cands, k=5, lam=0.5)
        for rank, (wid, wscore) in enumerate(want, 1):
            gid, gscore = got[(q, rank)]
            assert gid == wid, (q, rank, gid, wid)
            assert abs(gscore - wscore) < 1e-9


def test_mmr_diversifies_duplicates(spark):
    # two identical top-relevance vectors: MMR must not pick both first
    base = [1.0] + [0.0] * 7
    other = [0.0, 1.0] + [0.0] * 6
    df = spark.createDataFrame(
        [
            (0, 1, base, 0.99),
            (0, 2, base, 0.98),     # duplicate of id 1
            (0, 3, other, 0.60),    # diverse
        ],
        "query_id long, id long, embedding array<double>, sim double",
    )
    got = [
        r["id"]
        for r in mmr_rerank(df, k=2, lam=0.5)
        .orderBy("mmr_rank")
        .collect()
    ]
    assert got == [1, 3]


def test_mmr_string_ids(spark):
    """String ids/query ids survive the Arrow round-trip (regression:
    output schema hardcoded both as long)."""
    rows = [
        ("qA", "doc-1", 0.9, [1.0, 0.0]),
        ("qA", "doc-2", 0.8, [1.0, 0.0]),   # duplicate of doc-1
        ("qA", "doc-3", 0.5, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "query_id string, id string, sim double, embedding array<double>"
    )
    got = [
        (r["id"], r["mmr_rank"])
        for r in mmr_rerank(df, k=2, lam=0.5).orderBy("mmr_rank").collect()
    ]
    assert got == [("doc-1", 1), ("doc-3", 2)]

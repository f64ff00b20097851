"""Unit tests for the round-3 retrieval / time-series / sketch
operators: BM25, heavy hitters (Misra–Gries candidates + exact
recount), deterministic random walks, seasonal phase profile.

The cross-engine value gates live in test_oracle_parity (q155–q159);
these tests pin operator-level properties the sf0.01 corpus can't
exercise: MG pruning under large vocabularies, the candidate-superset
guarantee, walk dead-ends, tape determinism, and brute-force replays
of the fixed-point arithmetic.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest

from graphdb_neo4j_spark.operators.sampling import random_walks
from graphdb_neo4j_spark.operators.sketch import (
    heavy_hitters_exact,
    mg_candidates,
)
from graphdb_neo4j_spark.operators.temporal import seasonal_phase_profile
from graphdb_neo4j_spark.operators.text import bm25_topk


def _zipf_tokens(n_items: int = 400, scale: int = 30) -> list[str]:
    """Deterministic Zipf-ish bag: item i appears scale//(i+1) + 1 times."""
    out = []
    for i in range(n_items):
        out.extend([f"w{i}"] * (scale // (i + 1) + 1))
    return out


def test_mg_candidates_superset_guarantee(spark):
    toks = _zipf_tokens(n_items=400, scale=500)
    n = len(toks)
    k = 20
    df = spark.createDataFrame([(t,) for t in toks], "term string").repartition(7)
    cand = {r["item"] for r in mg_candidates(df, "term", k=k).collect()}
    exact = Counter(toks)
    heavy = {t for t, c in exact.items() if c * (k + 1) > n}
    assert heavy, "fixture must actually contain heavy hitters"
    # vocabulary 400 ≫ k=20 counters → pruning definitely exercised
    assert heavy <= cand
    # and the summary stayed bounded: ≤ k items per partition
    assert len(cand) <= k * 7


def test_heavy_hitters_exact_equals_groupby(spark):
    toks = _zipf_tokens(n_items=300, scale=400)
    n = len(toks)
    k = 15
    df = spark.createDataFrame([(t,) for t in toks], "term string").repartition(5)
    got = {
        (r["item"], r["cnt"])
        for r in heavy_hitters_exact(df, "term", k=k).collect()
    }
    exact = Counter(toks)
    want = {(t, c) for t, c in exact.items() if c * (k + 1) > n}
    assert got == want


def _tape(seed: str, v0: str, walk: int, step: int) -> int:
    h = hashlib.md5(f"{seed}|{v0}:{walk}:{step}".encode()).hexdigest()
    return int(h[:8], 16)


def test_random_walks_python_replay(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"),
        ("d", "a"), ("d", "b"), ("b", "a"),
    ]
    e = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("c",)], "v string")
    got = {
        (r["seed"], r["walk"], r["step"], r["vertex"])
        for r in random_walks(e, seeds, n_walks=2, length=4, seed="t").collect()
    }
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    adj = {s: sorted(ds) for s, ds in adj.items()}
    want = set()
    for v0 in ["a", "c"]:
        for w in range(2):
            v = v0
            want.add((v0, w, 0, v))
            for s in range(1, 5):
                nbrs = adj.get(v)
                if not nbrs:
                    break
                v = nbrs[_tape("t", v0, w, s) % len(nbrs)]
                want.add((v0, w, s, v))
    assert got == want


def test_random_walks_stop_at_sinks(spark):
    # b is a sink: walks from a reach b and stop — steps past the sink
    # are absent, step 0 rows always present
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("b",)], "v string")
    rows = random_walks(e, seeds, n_walks=1, length=3, seed="t").collect()
    got = {(r["seed"], r["step"], r["vertex"]) for r in rows}
    assert got == {("a", 0, "a"), ("a", 1, "b"), ("b", 0, "b")}


def test_seasonal_phase_profile_brute_force(spark):
    # 3 full periods of a known saw + trend; period=4, half=2 (window 5)
    vals = [(i, (1000 + 17 * i + [0, 400, -150, 250][i % 4]) * 1_000_000)
            for i in range(16)]
    df = spark.createDataFrame(vals, "idx bigint, val_micro bigint")
    got = {
        r["phase"]: (r["seasonal_micro"], r["n_obs"])
        for r in seasonal_phase_profile(
            df, period=4, half=2
        ).collect()
    }

    def idiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    by_phase: dict[int, list[int]] = {}
    for i, v in vals:
        if i < 2 or i > 13:  # incomplete centered window dropped
            continue
        tr = idiv(sum(v2 for j, v2 in vals if abs(j - i) <= 2), 5)
        by_phase.setdefault(i % 4, []).append(v - tr)
    want = {
        p: (idiv(sum(ds), len(ds)), len(ds)) for p, ds in by_phase.items()
    }
    assert got == want


def test_bm25_ranks_rarer_term_higher(spark):
    # same tf and identical doc length → the doc matching the rarer
    # term outranks the one matching the common term
    rows = [
        (0, "x common filler filler"),
        (1, "x rare filler filler"),
        (2, "x common filler filler"),
        (3, "x common filler filler"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = bm25_topk(df, ["common", "rare"], k=4).collect()
    scores = {r["doc_id"]: r["score_micro"] for r in out}
    assert scores[1] > scores[0] == scores[2] == scores[3]
    assert out[0]["doc_id"] == 1


def test_seasonal_phase_profile_chunked_equals_global(spark):
    """Chunked (segmented) trend window is bit-identical to the global
    single-partition window on a dense index — including chunks that
    start mid-period and a series that doesn't align to the segment."""
    vals = [(i, (1000 + 17 * i + [0, 400, -150, 250][i % 4]) * 1_000_000)
            for i in range(41)]  # 41 rows: not a multiple of segment=8
    df = spark.createDataFrame(vals, "idx bigint, val_micro bigint")
    glob = {
        r["phase"]: (r["seasonal_micro"], r["n_obs"])
        for r in seasonal_phase_profile(df, period=4, half=2).collect()
    }
    chunk = {
        r["phase"]: (r["seasonal_micro"], r["n_obs"])
        for r in seasonal_phase_profile(
            df, period=4, half=2, segment=8
        ).collect()
    }
    assert chunk == glob
    # offset (negative-start) index: floor-chunking must stay aligned
    df2 = spark.createDataFrame(
        [(i - 20, v) for i, v in vals], "idx bigint, val_micro bigint"
    )
    glob2 = {
        r["phase"]: (r["seasonal_micro"], r["n_obs"])
        for r in seasonal_phase_profile(df2, period=4, half=2).collect()
    }
    chunk2 = {
        r["phase"]: (r["seasonal_micro"], r["n_obs"])
        for r in seasonal_phase_profile(
            df2, period=4, half=2, segment=8
        ).collect()
    }
    assert chunk2 == glob2


def test_seasonal_phase_profile_segment_too_small_raises(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(0, 0)], "idx bigint, val_micro bigint")
    with _pytest.raises(ValueError, match="segment"):
        seasonal_phase_profile(df, half=12, segment=6)


def test_asof_join_hypothesis_brute_force(spark):
    """Property: the union-window as-of equals the brute-force
    'latest right with right.t <= left.t per key' on random inputs —
    including equal timestamps (right row visible at its own tick),
    keys with no right rows, and duplicate left times."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from graphdb_neo4j_spark.operators.temporal import asof_join

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        lefts=st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 40)),
            min_size=1, max_size=25,
        ),
        rights=st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 40),
                      st.integers(0, 9)),
            min_size=0, max_size=25,
        ),
    )
    def check(lefts, rights):
        # unique right (key, t): the operator's tie order among equal
        # right times is unspecified (matches any real CDC feed where
        # (key, t) is unique)
        seen = set()
        rws = []
        for k, t, v in rights:
            if (k, t) not in seen:
                seen.add((k, t))
                rws.append((k, t, v))
        l = spark.createDataFrame(
            [(k, t, i) for i, (k, t) in enumerate(lefts)],
            "k int, t int, lid int",
        )
        r = spark.createDataFrame(rws, "k int, t int, v int") if rws else (
            spark.createDataFrame([], "k int, t int, v int")
        )
        got = {
            (row.lid, row.v_right)
            for row in asof_join(l, r, on="t", by="k",
                                 right_cols=["v"]).collect()
        }
        want = set()
        for i, (k, t) in enumerate(lefts):
            cands = [(rt, v) for rk, rt, v in rws if rk == k and rt <= t]
            want.add((i, max(cands)[1] if cands else None))
        assert got == want

    check()

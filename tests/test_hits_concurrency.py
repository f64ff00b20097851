"""Unit semantics for traversal.hits and temporal.interval_concurrency
(the q120/q121 operators — their cross-engine exactness is pinned by
tests/test_oracle_parity.py; these fixtures pin the SEMANTICS)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators.temporal import interval_concurrency
from graphdb_neo4j_spark.operators.traversal import hits

SCALE = 10**12


def test_hits_star_graph(spark):
    # hub 0 points at authorities 1,2,3; no other edges.
    e = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "src long, dst long")
    got = {r["v"]: (r["hub"], r["authority"]) for r in hits(e, iters=2).collect()}
    # node 0: pure hub (authority 0); leaves: pure authorities (hub 0)
    assert got[0][1] == 0
    assert all(got[v][0] == 0 for v in (1, 2, 3))
    assert got[0][0] > 0
    # symmetric leaves tie exactly
    assert got[1] == got[2] == got[3]


def test_hits_no_nulls_and_determinism(spark):
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3)], "src long, dst long"
    )
    df1 = hits(e, iters=3).collect()
    df2 = hits(e, iters=3).collect()
    assert sorted(map(tuple, df1)) == sorted(map(tuple, df2))
    assert all(r["hub"] is not None and r["authority"] is not None for r in df1)


def test_interval_concurrency_half_open(spark):
    # [0,10) and [10,20): touching endpoints never overlap
    iv = spark.createDataFrame([(0, 10), (10, 20)], "s long, e long")
    row = interval_concurrency(iv, "s", "e").collect()[0]
    assert row["peak"] == 1 and row["peak_t"] == 0


def test_interval_concurrency_peak_and_earliest_instant(spark):
    # overlaps: [0,10), [5,15), [5,8) → peak 3 at t=5; later [20,30) alone
    iv = spark.createDataFrame(
        [("a", 0, 10), ("a", 5, 15), ("a", 5, 8), ("a", 20, 30), ("b", 0, 1)],
        "g string, s long, e long",
    )
    got = {
        r["g"]: (r["peak"], r["peak_t"])
        for r in interval_concurrency(iv, "s", "e", by="g").collect()
    }
    assert got["a"] == (3, 5)
    assert got["b"] == (1, 0)


def test_window_funnel_semantics(spark):
    """Pins windowFunnel semantics: window measured from the chain
    START, boundary inclusive; strictly-before = earlier in the
    (ts, id) sort, so same-ts chains depend on the tiebreak order;
    missing middle steps don't chain."""
    from graphdb_neo4j_spark.operators.temporal import window_funnel

    W = 100
    rows = [
        # u1: click exactly at window edge chains; purchase 1 past it doesn't
        (1, "view", 0, 1), (1, "click", W, 2), (1, "purchase", W + 1, 3),
        # u2: full chain well inside the window
        (2, "view", 0, 1), (2, "click", 1, 2), (2, "purchase", 2, 3),
        # u3: no view -> level 0 despite click+purchase
        (3, "click", 0, 1), (3, "purchase", 1, 2),
        # u4: view then purchase (no click) -> level 1
        (4, "view", 0, 1), (4, "purchase", 1, 2),
        # u5: view and click at the SAME ts, view sorts first -> level 2
        (5, "view", 5, 1), (5, "click", 5, 2),
        # u6: same ts but click sorts first -> view can't chain, level 1
        (6, "click", 5, 1), (6, "view", 5, 2),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts_us", "event_id"])
    got = {
        r.user: r.funnel_level
        for r in window_funnel(
            df, ["view", "click", "purchase"], W,
            order_cols=["ts_us", "event_id"],
        ).collect()
    }
    assert got == {1: 2, 2: 3, 3: 0, 4: 1, 5: 2, 6: 1}


def test_cusum_matches_textbook_recursion(spark):
    """Closed-form (prefix sum − running extremum) == Page's recursion
    C±_t = max(0, C±_{t−1} ± (x_t − k)), on a series with a planted
    upward shift then a downward shift."""
    import random

    from graphdb_neo4j_spark.operators.temporal import cusum

    rng = random.Random(7)
    xs = (
        [rng.randint(90, 110) for _ in range(30)]
        + [rng.randint(140, 160) for _ in range(20)]   # upward shift
        + [rng.randint(40, 60) for _ in range(20)]     # downward shift
    )
    rows = [("a", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, ["k", "i", "x"])
    got = {
        r.i: (r.cusum_pos, r.cusum_neg)
        for r in cusum(df, "x", drift=100, by=["k"], order_cols=["i"]).collect()
    }

    cp = cn = 0
    for i, x in enumerate(xs):
        cp = max(0, cp + (x - 100))
        cn = max(0, cn + (100 - x))
        assert got[i] == (cp, cn), i
    assert max(p for p, _ in got.values()) > 500        # shift detected
    assert max(n for _, n in got.values()) > 500


def test_weighted_rolling_matches_bruteforce(spark):
    from graphdb_neo4j_spark.operators.temporal import ewma_taps, weighted_rolling

    taps = ewma_taps(0.5, 4)
    xs = [10, 20, 30, 40, 50]
    df = spark.createDataFrame([("g", i, x) for i, x in enumerate(xs)], ["g", "i", "x"])
    got = {
        r.i: (r.fir_num, r.fir_wsum)
        for r in weighted_rolling(df, "x", taps, by=["g"], order_cols=["i"]).collect()
    }
    for t in range(len(xs)):
        num = sum(taps[j] * xs[t - j] for j in range(len(taps)) if t - j >= 0)
        ws = sum(taps[j] for j in range(len(taps)) if t - j >= 0)
        assert got[t] == (num, ws), t

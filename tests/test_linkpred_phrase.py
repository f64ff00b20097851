"""Fixture oracles for link prediction and positional phrase search.

Scores are hand-computed on graphs small enough to check on paper;
the corpus-scale behavior is pinned by the q166/q167 SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators.linkpred import link_prediction_scores
from graphdb_neo4j_spark.operators.text import (
    phrase_match,
    positional_postings,
)

MICRO = 1_000_000


def test_link_prediction_path_graph(spark):
    # path 1-2-3: only candidate pair (1,3), common neighbor 2 (deg 2)
    e = spark.createDataFrame([(1, 2), (2, 3)], "src int, dst int")
    rows = {(r.u, r.v): r for r in link_prediction_scores(e).collect()}
    assert set(rows) == {(1, 3)}
    r = rows[(1, 3)]
    assert r.cn == 1 and r.deg_u == 1 and r.deg_v == 1
    # jaccard = 1 / (1 + 1 - 1) = 1
    assert r.jaccard_micro == MICRO
    # ra = 1 / deg(2) = 1/2
    assert r.ra_micro == MICRO // 2


def test_link_prediction_square_with_diagonal(spark):
    # square 1-2-3-4-1 plus diagonal 1-3: the only non-edge is (2,4),
    # common neighbors 1 and 3 (both deg 3)
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)], "src int, dst int"
    )
    rows = {(r.u, r.v): r for r in link_prediction_scores(e).collect()}
    assert set(rows) == {(2, 4)}
    r = rows[(2, 4)]
    assert r.cn == 2 and r.deg_u == 2 and r.deg_v == 2
    # jaccard = 2 / (2 + 2 - 2) = 1
    assert r.jaccard_micro == MICRO
    # ra = 1/3 + 1/3 (floor per-term: 333333 + 333333)
    assert r.ra_micro == 2 * (MICRO // 3)


def test_link_prediction_excludes_existing_edges_and_loops(spark):
    # triangle: every distance-2 pair is already an edge -> no output;
    # self-loop and duplicate orientations must not change that
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (1, 3), (1, 1)], "src int, dst int"
    )
    assert link_prediction_scores(e).count() == 0


def test_link_prediction_hub_cap_drops_hub_wedges(spark):
    # star center 0 with leaves 1..4: every leaf pair is a candidate
    # through the hub; hub_cap below the hub degree kills them all
    e = spark.createDataFrame([(0, i) for i in range(1, 5)], "src int, dst int")
    assert link_prediction_scores(e).count() == 6
    assert link_prediction_scores(e, hub_cap=3).count() == 0


def test_phrase_match_counts_and_overlaps(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c a b c"),       # 2 occurrences of "a b c"
            (2, "a a a a"),           # overlapping "a a a": starts 1,2
            (3, "a b x c"),           # no match
            (4, "c b a"),             # reversed: no match
        ],
        "doc_id long, text string",
    )
    p = positional_postings(docs)
    abc = {r.id: r.n_occurrences for r in phrase_match(p, ["a", "b", "c"]).collect()}
    assert abc == {1: 2}
    aaa = {r.id: r.n_occurrences for r in phrase_match(p, ["a", "a", "a"]).collect()}
    assert aaa == {2: 2}


def test_phrase_match_single_term_and_empty(spark):
    docs = spark.createDataFrame(
        [(1, "x y x"), (2, "y")], "doc_id long, text string"
    )
    p = positional_postings(docs)
    got = {r.id: r.n_occurrences for r in phrase_match(p, ["x"]).collect()}
    assert got == {1: 2}
    try:
        phrase_match(p, [])
        raise AssertionError("empty phrase must raise")
    except ValueError:
        pass


def test_phrase_match_shuffles_only_phrase_term_postings(spark):
    """The joins are keyed on (id, pos): postings of non-phrase terms
    are filtered before any exchange (IN-filter below the join)."""
    docs = spark.createDataFrame(
        [(1, "a b heavy heavy heavy")], "doc_id long, text string"
    )
    plan = phrase_match(
        positional_postings(docs), ["a", "b"]
    )._jdf.queryExecution().executedPlan().toString()
    # each join input carries its own term-equality filter
    assert "= a" in plan and "= b" in plan, plan

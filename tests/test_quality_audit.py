"""Planted-violation fixtures for the data-quality audit operator
(operators/quality.py; cross-engine exactness pinned by q122 in
tests/test_oracle_parity.py)."""

from __future__ import annotations

from graphdb_neo4j_spark.operators import quality as Q


def test_audit_counts_each_violation_kind(spark):
    df = spark.createDataFrame(
        [
            (1, "a@x.io", 5, "US"),
            (1, "b@x.io", 5, "US"),      # dup id
            (2, None, 11, "US"),         # null email, range-high
            (3, "not-an-email", -1, "DE"),  # regexp fail, range-low
            (4, "c@x.io", 7, "XX"),      # bad country
            (None, "d@x.io", 7, "US"),   # null id (FK skips NULL)
        ],
        "id long, email string, score long, country string",
    )
    parents = spark.createDataFrame([(1,), (2,), (3,)], "pid long")
    report = dict(
        (r["check"], r["violations"])
        for r in Q.audit(
            df,
            [
                Q.not_null("email"),
                Q.unique("id"),
                Q.in_range("score", 0, 10),
                Q.matches("email", r"[^@]+@[^@]+\.[^@]+"),
                Q.accepted_values("country", ["US", "DE"]),
                Q.foreign_key(["id"], parents, ["pid"]),
            ],
        ).collect()
    )
    assert report == {
        "not_null:email": 1,
        "unique:id": 1,            # one row beyond the first for id=1
        "in_range:score": 2,       # 11 and -1
        "matches:email": 1,        # 'not-an-email' (NULL email skipped)
        "accepted_values:country": 1,  # 'XX'
        "foreign_key:id": 1,       # id=4 orphan; NULL id skipped
    }


def test_audit_clean_table_is_all_zero(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    rep = Q.audit(df, [Q.not_null("v"), Q.unique("id")]).collect()
    assert all(r["violations"] == 0 for r in rep)

"""Link prediction over an undirected edge list.

Neighborhood-overlap scores for the non-adjacent vertex pairs at
distance 2 — the candidate set every similarity-based link predictor
(Liben-Nowell & Kleinberg 2003) ranks:

* ``cn``            — common-neighbor count,
* ``jaccard_micro`` — |Γ(u)∩Γ(v)| / |Γ(u)∪Γ(v)| in integer micro-units,
* ``ra_micro``      — resource allocation Σ_z 1/deg(z) in integer
  micro-units (Zhou/Lü/Zhang 2009; the discretized cousin of
  Adamic–Adar that needs no ``log`` and is therefore bit-identical
  across engines — each common neighbor z contributes
  ``1_000_000 div deg(z)`` exactly).

All scores are exact integers, so results hash-match a SQL oracle.

Scale shape: one wedge self-join on the shared neighbor (the only
data-sized shuffle, keyed on z), one hash-agg on the (u, v) pair, two
node-sized degree joins, one anti-join against the existing edge set.
The wedge join fans out quadratically on hub neighbors — ``hub_cap``
drops common neighbors with degree above the cap before the join
(standard practice: a z adjacent to everything carries no signal and
its 1/deg(z) contribution is ~0 anyway), which bounds the blow-up at
100 TB without changing the ranking materially.  ``hub_cap=None``
keeps the computation exact.

Reference parity: the reference engine (events.py) has no link
prediction; this is part of the training-data-pipeline extension
surface (graph-feature generation for candidate mining).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _canonical_undirected(edges: DataFrame) -> DataFrame:
    """Distinct undirected edges as (lo, hi) with lo < hi; self-loops
    dropped (a self-loop is not a neighborhood relation)."""
    e = edges.select(
        F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
    ).filter(F.col("lo") != F.col("hi"))
    return e.distinct()


def link_prediction_scores(
    edges: DataFrame,
    hub_cap: int | None = None,
) -> DataFrame:
    """Score all non-adjacent distance-2 pairs of an undirected graph.

    Parameters
    ----------
    edges : (src, dst) in any orientation; deduped internally.
    hub_cap : drop common neighbors with degree > hub_cap before the
        wedge join (scale guard; None = exact).

    Returns (u, v, cn, deg_u, deg_v, jaccard_micro, ra_micro) with
    u < v, every score an exact BIGINT.
    """
    und = _canonical_undirected(edges)
    # both orientations: (node, neighbor)
    adj = und.select(
        F.col("lo").alias("node"), F.col("hi").alias("nbr")
    ).unionByName(und.select(F.col("hi").alias("node"), F.col("lo").alias("nbr")))

    deg = adj.groupBy("node").agg(F.count("*").cast("bigint").alias("deg"))

    # wedge centers: z with its degree riding along (one join on the
    # node-sized degree table, before the fan-out)
    centers = adj.join(deg, "node").select(
        F.col("node").alias("z"), F.col("nbr"), F.col("deg").alias("deg_z")
    )
    if hub_cap is not None:
        centers = centers.filter(F.col("deg_z") <= F.lit(int(hub_cap)))

    a = centers.alias("a")
    b = centers.alias("b")
    wedges = a.join(
        b,
        (F.col("a.z") == F.col("b.z")) & (F.col("a.nbr") < F.col("b.nbr")),
    ).select(
        F.col("a.nbr").alias("u"),
        F.col("b.nbr").alias("v"),
        F.col("a.deg_z").alias("deg_z"),
    )

    pair_scores = wedges.groupBy("u", "v").agg(
        F.count("*").cast("bigint").alias("cn"),
        F.sum(F.expr(f"{MICRO} div deg_z")).cast("bigint").alias("ra_micro"),
    )

    # keep only NON-edges (the prediction targets)
    candidates = pair_scores.join(
        und,
        (pair_scores["u"] == und["lo"]) & (pair_scores["v"] == und["hi"]),
        "left_anti",
    )

    deg_u = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    deg_v = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    return (
        candidates.join(deg_u, "u")
        .join(deg_v, "v")
        .select(
            "u",
            "v",
            "cn",
            "deg_u",
            "deg_v",
            F.expr(f"cn * {MICRO} div (deg_u + deg_v - cn)")
            .cast("bigint")
            .alias("jaccard_micro"),
            "ra_micro",
        )
    )


def link_prediction_sql(
    edges_cte: str,
    hub_cap: int | None = None,
) -> str:
    """DuckDB mirror of :func:`link_prediction_scores`.

    ``edges_cte`` must be a SELECT producing (src, dst).
    """
    cap = (
        f"WHERE deg <= {int(hub_cap)}"
        if hub_cap is not None
        else ""
    )
    return f"""
    WITH raw_edges AS ({edges_cte}),
    und AS (
      SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
      FROM raw_edges WHERE src <> dst
    ),
    adj AS (
      SELECT lo AS node, hi AS nbr FROM und
      UNION ALL
      SELECT hi AS node, lo AS nbr FROM und
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY node
    ),
    centers AS (
      SELECT adj.node AS z, adj.nbr, deg.deg AS deg_z
      FROM adj JOIN deg ON adj.node = deg.node {cap}
    ),
    wedges AS (
      SELECT a.nbr AS u, b.nbr AS v, a.deg_z
      FROM centers a JOIN centers b ON a.z = b.z AND a.nbr < b.nbr
    ),
    pair_scores AS (
      SELECT u, v, CAST(COUNT(*) AS BIGINT) AS cn,
             CAST(SUM({MICRO} // deg_z) AS BIGINT) AS ra_micro
      FROM wedges GROUP BY u, v
    ),
    candidates AS (
      SELECT p.* FROM pair_scores p
      LEFT JOIN und ON p.u = und.lo AND p.v = und.hi
      WHERE und.lo IS NULL
    )
    SELECT c.u, c.v, c.cn, du.deg AS deg_u, dv.deg AS deg_v,
           CAST(c.cn * {MICRO} // (du.deg + dv.deg - c.cn) AS BIGINT)
             AS jaccard_micro,
           c.ra_micro
    FROM candidates c
    JOIN deg du ON c.u = du.node
    JOIN deg dv ON c.v = dv.node
    """

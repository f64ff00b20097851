"""Data-drift monitoring: PSI (population stability index) between a
reference window and a current window of a numeric column.

PSI = Σ_buckets (p_cur − p_ref) · ln(p_cur / p_ref), the standard
model-monitoring statistic (> 0.1 ⇒ drifting, > 0.25 ⇒ shifted —
the conventional credit-scoring thresholds).  Fixed-width buckets are
derived from the REFERENCE min/max, so the current side is scored
against the frozen training-time layout — values outside the reference
range clamp into the edge buckets, which is exactly where novel mass
should show up.

100 TB shape: one aggregate per side (min/max on the reference, then
one bucket-count hash-agg each), a B-row full-outer join, one sum —
nothing data-proportional crosses the driver, and both sides read a
single column (columnar scans prune the rest).  ε-smoothing keeps
empty buckets finite, the standard PSI convention.

Everything is plain double arithmetic in a fixed association order, so
the DuckDB oracle reproduces it bit-for-bit up to the final rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPS = 1e-6  # smoothing for empty buckets (standard PSI convention)


def _bucketed_share(
    df: DataFrame, col: str, lo: float, width: float, n_buckets: int
) -> DataFrame:
    """(bucket, share) over fixed-width buckets [lo + i·width); values
    below/above the reference range clamp to buckets 0 / B−1."""
    idx = F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width))
    b = F.least(F.greatest(idx, F.lit(0)), F.lit(n_buckets - 1)).cast("int")
    counts = df.filter(F.col(col).isNotNull()).groupBy(b.alias("bucket")).agg(
        F.count("*").alias("n")
    )
    total = counts.agg(F.sum("n").alias("t"))
    return counts.crossJoin(F.broadcast(total)).select(
        "bucket", (F.col("n").cast("double") / F.col("t")).alias("share")
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """One row: (psi, n_buckets, ref_rows, cur_rows).

    Bucket layout comes from the reference min/max (one tiny aggregate
    fetched to the driver — two doubles, never data); both sides then
    bucket-count in one hash-agg each and the B-row share tables join
    to the PSI sum.  Deterministic: fixed bucket edges, fixed ε, fixed
    left-to-right association in the sum (SUM over ≤ B rows of exact
    per-bucket terms, rounded to 6 decimals at the end).
    """
    stats = ref.agg(
        F.min(F.col(col).cast("double")).alias("lo"),
        F.max(F.col(col).cast("double")).alias("hi"),
        F.count(F.col(col)).alias("n"),
    ).head()
    lo, hi, ref_rows = stats["lo"], stats["hi"], stats["n"]
    if lo is None or ref_rows == 0:
        raise ValueError("psi_drift: reference window has no non-null rows")
    width = (hi - lo) / n_buckets if hi > lo else 1.0
    r = _bucketed_share(ref, col, lo, width, n_buckets).withColumnRenamed(
        "share", "p_ref"
    )
    c = _bucketed_share(cur, col, lo, width, n_buckets).withColumnRenamed(
        "share", "p_cur"
    )
    joined = r.join(c, "bucket", "full_outer").select(
        F.coalesce(F.col("p_ref"), F.lit(0.0)).alias("p_ref"),
        F.coalesce(F.col("p_cur"), F.lit(0.0)).alias("p_cur"),
    )
    pr = F.col("p_ref") + F.lit(EPS)
    pc = F.col("p_cur") + F.lit(EPS)
    term = (pc - pr) * F.log(pc / pr)
    cur_rows = cur.filter(F.col(col).isNotNull()).count()
    return joined.agg(
        F.round(F.sum(term), 6).alias("psi"),
        F.lit(n_buckets).cast("int").alias("n_buckets"),
        F.lit(ref_rows).cast("bigint").alias("ref_rows"),
        F.lit(cur_rows).cast("bigint").alias("cur_rows"),
    )


def psi_drift_sql(
    ref_where: str, cur_where: str, col: str, table: str, n_buckets: int = 10
) -> str:
    """DuckDB oracle for :func:`psi_drift` over two WHERE-filtered
    windows of ``table`` — same bucket layout, same ε, same rounding."""
    return f"""
    WITH stats AS (
      SELECT MIN(CAST({col} AS DOUBLE)) AS lo, MAX(CAST({col} AS DOUBLE)) AS hi,
             COUNT({col}) AS n
      FROM {table} WHERE {ref_where}
    ),
    params AS (
      SELECT lo, n,
             CASE WHEN hi > lo THEN (hi - lo) / {n_buckets} ELSE 1.0 END AS w
      FROM stats
    ),
    rb AS (
      SELECT CAST(LEAST(GREATEST(
               FLOOR((CAST({col} AS DOUBLE) - p.lo) / p.w), 0), {n_buckets - 1})
             AS INT) AS bucket, COUNT(*) AS n
      FROM {table}, params p WHERE {ref_where} AND {col} IS NOT NULL
      GROUP BY 1
    ),
    cb AS (
      SELECT CAST(LEAST(GREATEST(
               FLOOR((CAST({col} AS DOUBLE) - p.lo) / p.w), 0), {n_buckets - 1})
             AS INT) AS bucket, COUNT(*) AS n
      FROM {table}, params p WHERE {cur_where} AND {col} IS NOT NULL
      GROUP BY 1
    ),
    shares AS (
      SELECT COALESCE(CAST(rb.n AS DOUBLE) / (SELECT SUM(n) FROM rb), 0.0) AS p_ref,
             COALESCE(CAST(cb.n AS DOUBLE) / (SELECT SUM(n) FROM cb), 0.0) AS p_cur
      FROM rb FULL OUTER JOIN cb ON rb.bucket = cb.bucket
    )
    SELECT ROUND(SUM((p_cur + {EPS} - (p_ref + {EPS}))
                     * LN((p_cur + {EPS}) / (p_ref + {EPS}))), 6) AS psi,
           CAST({n_buckets} AS INT) AS n_buckets,
           CAST((SELECT n FROM stats) AS BIGINT) AS ref_rows,
           CAST((SELECT SUM(n) FROM cb) AS BIGINT) AS cur_rows
    FROM shares
    """

"""Sketch operators — approximate distinct counting, oracle-exact.

Spark's ``approx_count_distinct`` (HLL++) can't be cross-checked against
another engine bit-for-bit.  This KMV (k-minimum-values) sketch can:

* hash = md5 (identical in Spark and DuckDB),
* the k-th smallest distinct hash is an exact, deterministic value,
* the first 13 hex nibbles convert to a dyadic fraction (52 bits ≤ the
  53-bit double mantissa → EXACT in both engines),
* estimate = (k-1)/frac — one IEEE division, identical everywhere.

Scale shape: distinct-hash + top-k = map-side partial top-k per
partition, tiny combine at the driver; the shuffle carries at most
k×partitions hashes.  Good for quick cardinality probes on 100 TB
columns where exact COUNT(DISTINCT) would shuffle everything.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"
_FRAC_DIGITS = 13


def _hex_frac(col: Column) -> Column:
    """First 13 hex nibbles of a hash string → exact fraction in [0,1)."""
    out = F.lit(0.0)
    for i in range(1, _FRAC_DIGITS + 1):
        nib = F.instr(F.lit(_HEX), F.substring(col, i, 1)) - 1
        out = out + nib.cast("double") / F.lit(float(16 ** i))
    return out


def hex_frac_sql(col_sql: str) -> str:
    """The same fraction as SQL (same association order → same doubles)."""
    terms = [
        f"(instr('{_HEX}', substr({col_sql}, {i}, 1)) - 1) / {float(16 ** i)!r}"
        for i in range(1, _FRAC_DIGITS + 1)
    ]
    return "(" + " + ".join(terms) + ")"


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One row: (kth_hash, est_distinct) — KMV cardinality estimate.

    If fewer than k distinct values exist the estimate equals the exact
    distinct count (degenerate case handled the standard way).
    """
    # NULLs must not enter the sketch: md5(NULL) = NULL survives
    # distinct() and sorts nulls-FIRST in Spark but nulls-LAST in
    # DuckDB, skewing both the top-k set and the estimate.
    hashes = (
        df.filter(F.col(col).isNotNull())
        .select(F.md5(F.col(col).cast("string")).alias("h"))
        .distinct()
    )
    topk = hashes.orderBy("h").limit(k)
    agg = topk.agg(F.max("h").alias("kth_hash"), F.count("*").alias("n"))
    frac = _hex_frac(F.col("kth_hash"))
    est = F.when(F.col("n") < k, F.col("n").cast("double")).otherwise(
        (F.lit(float(k - 1)) / frac)
    )
    return agg.select("kth_hash", F.round(est, 4).alias("est_distinct"))


def kmv_distinct_sql(table: str, col_sql: str, k: int = 256) -> str:
    """DuckDB oracle for :func:`kmv_distinct` over a registered view."""
    return f"""
    WITH topk AS (
      SELECT DISTINCT md5(CAST({col_sql} AS VARCHAR)) AS h FROM {table}
      WHERE {col_sql} IS NOT NULL
      ORDER BY h LIMIT {k}
    ),
    agg AS (SELECT max(h) AS kth_hash, COUNT(*) AS n FROM topk)
    SELECT kth_hash,
           ROUND(CASE WHEN n < {k} THEN CAST(n AS DOUBLE)
                      ELSE {float(k - 1)!r} / {hex_frac_sql('kth_hash')} END, 4)
             AS est_distinct
    FROM agg
    """

"""Data profiling — one-pass column statistics for pipeline triage.

Before any 100 TB job you profile: null density, cardinality, ranges.
This operator computes, in ONE scan, per requested column:

* ``n_rows`` / ``n_nonnull`` (exact),
* ``n_distinct`` (exact — Spark plans multi-column count_distinct with
  one Expand + partial aggregation; the scan is still single-pass),
* numeric ``min_num`` / ``max_num`` (DOUBLE; NULL for string columns),
* string ``min_str`` / ``max_str`` (NULL for numeric columns).

The wide aggregate is then unpivoted with ``stack`` into one row per
column — the long format joins/filters cleanly downstream.  For
approximate cardinality at extreme scale swap the exact
``count_distinct`` for :func:`graphdb_neo4j_spark.operators.sketch.
hll_distinct_by` — same output shape, fixed-size shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nonnull, n_distinct, min_num, max_num,
    min_str, max_str) — one row per profiled column, one input scan.

    Timestamp columns are profiled as epoch microseconds (numeric).
    """
    if cols is None:
        cols = df.columns
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        dt = df.schema[c].dataType
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            num = F.unix_micros(F.col(c).cast("timestamp")).cast("double")
        elif isinstance(dt, _NUMERIC):
            num = F.col(c).cast("double")
        else:
            num = F.lit(None).cast("double")
        is_str = isinstance(dt, T.StringType)
        s = F.col(c) if is_str else F.lit(None).cast("string")
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(num).alias(f"__mn_{c}"),
            F.max(num).alias(f"__mx_{c}"),
            F.min(s).alias(f"__ms_{c}"),
            F.max(s).alias(f"__xs_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [
            f"'{c}'", f"__nn_{c}", f"__nd_{c}",
            f"__mn_{c}", f"__mx_{c}", f"__ms_{c}", f"__xs_{c}",
        ]
    stacked = wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) AS "
            "(column, n_nonnull, n_distinct, min_num, max_num, min_str, max_str)"
        ),
    )
    return stacked.select(
        "column",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_nonnull").cast("bigint").alias("n_nonnull"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_num", "max_num", "min_str", "max_str",
    )


def profile_columns_sql(table: str, cols_types: list[tuple[str, str]]) -> str:
    """DuckDB oracle: ``cols_types`` = [(name, 'num'|'str'|'ts'), ...]."""
    parts = []
    for c, kind in cols_types:
        if kind == "ts":
            num_min = f"CAST(epoch_us(MIN({c})) AS DOUBLE)"
            num_max = f"CAST(epoch_us(MAX({c})) AS DOUBLE)"
        elif kind == "num":
            num_min = f"CAST(MIN({c}) AS DOUBLE)"
            num_max = f"CAST(MAX({c}) AS DOUBLE)"
        else:
            num_min = num_max = "CAST(NULL AS DOUBLE)"
        if kind == "str":
            s_min, s_max = f"MIN({c})", f"MAX({c})"
        else:
            s_min = s_max = "CAST(NULL AS VARCHAR)"
        parts.append(
            f"""
            SELECT '{c}' AS column,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT({c}) AS BIGINT) AS n_nonnull,
                   CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
                   {num_min} AS min_num, {num_max} AS max_num,
                   {s_min} AS min_str, {s_max} AS max_str
            FROM {table}
            """
        )
    return " UNION ALL ".join(parts)

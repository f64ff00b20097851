"""Temporal join operators — as-of and range joins.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the scalable
formulation is the union-and-window trick:

    tag right rows 0 / left rows 1 → union → window per key ordered by
    (time, tag) → ``last(right_payload, ignorenulls)`` over the
    unbounded-preceding frame.

One shuffle on the key (both sides together), no point lookups, no
skew beyond the key's own distribution — this is how you as-of join
two 10-TB tables.  Matches DuckDB ``ASOF JOIN`` semantics: for each
left row, the latest right row with ``right.time <= left.time``
(inclusive: at equal times the right row sorts first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right[on] <= left[on]``, matched within ``by`` groups.

    ``on`` must be an orderable column present in both frames (use
    epoch micros for timestamps); ``right_cols`` defaults to all right
    columns except ``on``/``by``.  Right columns are suffixed.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, by)]
    payload = F.struct(*[F.col(c) for c in right_cols])

    l_tagged = left.select(
        F.col(by),
        F.col(on),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType
        ).alias("__r"),
    )
    r_tagged = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("l")
            ).schema["l"].dataType
        ).alias("__l"),
        payload.alias("__r"),
    )
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tagged.unionByName(r_tagged).withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__is_left") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    lower_us: int,
    upper_us: int,
    suffix: str = "_right",
) -> DataFrame:
    """All (left, right) pairs within the same ``by`` group with
    ``right[on] - left[on]`` in ``[lower_us, upper_us]``.

    Expressed as an equi-join on the key plus a range predicate —
    Catalyst runs sort-merge on the key and filters the band, which is
    the right plan when keys are selective.  (For key-free pure range
    joins, bucketize time into band-width bins first.)
    """
    r = right.select(
        F.col(by).alias(f"__rby"),
        F.col(on).alias(f"{on}{suffix}"),
        *[
            F.col(c).alias(f"{c}{suffix}")
            for c in right.columns
            if c not in (on, by)
        ],
    )
    cond = (
        (left[by] == r["__rby"])
        & (r[f"{on}{suffix}"] - left[on] >= lower_us)
        & (r[f"{on}{suffix}"] - left[on] <= upper_us)
    )
    return left.join(r, cond).drop("__rby")

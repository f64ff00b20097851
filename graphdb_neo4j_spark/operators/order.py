"""Distributed total-order utilities.

A global ``row_number()`` over an unpartitioned window collapses to a
single task — the classic 100 TB bottleneck.  ``contiguous_index``
produces the same contiguous 0-based global index with a RANGE
partition + per-partition rank + cumulative per-partition offsets (one
int per partition crosses the driver, never data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def contiguous_index(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "seq",
    checkpoint: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Contiguous 0-based global index in (``order_cols``) order
    without collapsing to one partition.

    Returns ``(indexed_df, checkpoint_handle)``: the range-partitioned
    intermediate is ``localCheckpoint``-ed (not merely cached) — range
    boundaries are sampled per evaluation, so a recomputation between
    the counts pass and the rank pass could repartition differently and
    corrupt the offsets; checkpointing freezes the partitioning, and a
    lost block fails loudly instead of silently resampling.  Blocks are
    released when the handle is garbage-collected (or explicitly via
    ``handle.unpersist()`` once the caller's final action has run).

    ``checkpoint=False`` skips the freeze and is for PLAN INSPECTION
    ONLY (the checkpoint truncates the explained plan, hiding the range
    shuffle from audits): without it a recomputation may resample range
    boundaries between the counts pass and the rank pass.
    """
    spark = df.sparkSession
    np = spark.sparkContext.defaultParallelism
    keyed = df.repartitionByRange(np, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    if checkpoint:
        keyed = keyed.localCheckpoint(eager=True)
    counts = dict(
        (r["__pid"], r["n"])
        for r in keyed.groupBy("__pid").agg(F.count("*").alias("n")).collect()
    )
    base, offs = 0, {}
    for pid in sorted(counts):
        offs[pid] = base
        base += counts[pid]
    off_df = spark.createDataFrame(
        [(int(pid), int(off)) for pid, off in offs.items()] or [(0, 0)],
        "__pid int, __off long",
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    out = (
        keyed.join(F.broadcast(off_df), "__pid")
        .withColumn(
            out_col, F.col("__off") + F.row_number().over(w) - F.lit(1)
        )
        .drop("__pid", "__off")
    )
    return out, keyed


def ntile_distributed(
    df: DataFrame, order_cols: list[str], k: int, out_col: str = "bucket"
) -> DataFrame:
    """1-based NTILE(k) bucket assignment over a DISTRIBUTED total
    order — semantics identical to SQL ``NTILE(k) OVER (ORDER BY ...)``
    (first ``n mod k`` buckets take one extra row), but planned as a
    range shuffle instead of a single-partition window.
    """
    indexed, handle = contiguous_index(df, order_cols, out_col="__seq")
    n = indexed.count()
    big = n % k
    size_big = n // k + 1
    size_small = max(n // k, 1)
    cut = big * size_big
    bucket = F.when(
        F.col("__seq") < cut, F.floor(F.col("__seq") / size_big)
    ).otherwise(big + F.floor((F.col("__seq") - cut) / size_small))
    out = indexed.withColumn(out_col, (bucket + 1).cast("int")).drop("__seq")
    # the checkpointed handle backs this plan; its blocks are released
    # when the handle is GC-d after the caller's action consumes `out`
    # (localCheckpoint, unlike persist, is not pinned for the session)
    return out

"""Streaming sketches: incremental HLL and count-min over micro-batches.

Both sketches are MERGEABLE — HLL registers fold by per-bucket MAX,
count-min counters by per-cell SUM — so the streaming formulation is
the batch operator applied per micro-batch plus a tiny state log:

* each batch writes its delta sketch (≤256 register rows / ≤4096
  counter cells) partitioned by ``batch_id``;
* the current sketch is one grouped fold over the log — reading
  O(cells × batches) tiny rows, never the stream's data;
* :func:`compact_sketch_log` folds the log back to one partition when
  batches accumulate.

Exactly-once: the per-batch partition is overwritten on replay
(dynamic partition overwrite), and both folds are idempotent under
replay anyway (MAX and per-partition-replaced SUM), so a crashed batch
re-runs harmlessly.

Equivalence guarantee, pinned by tests/test_streaming_sketch.py:
folding the log over ANY batch split of the input yields bit-identical
estimates to the batch operator on the whole input — the defining
property of a mergeable sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators.sketch import (
    cms_counters,
    hll_estimate_from_registers,
    hll_registers,
)


def _write_by_batch(df: DataFrame, path: str) -> None:
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def streaming_hll(stream_df: DataFrame, col: str, state_path: str):
    """``writeStream`` builder: maintain an incremental HLL register
    log at ``{state_path}/hll_log``; read the live estimate with
    :func:`hll_estimate`."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        regs = hll_registers(batch_df, col).withColumn(
            "batch_id", F.lit(batch_id)
        )
        _write_by_batch(regs, f"{state_path}/hll_log")

    return stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", f"{state_path}/_ckpt_hll"
    )


def hll_estimate(spark: SparkSession, state_path: str) -> DataFrame:
    """Live estimate from the streaming register log — bit-identical to
    the batch estimate over all data seen (merge = MAX per bucket)."""
    log = spark.read.parquet(f"{state_path}/hll_log")
    regs = log.groupBy("bucket").agg(F.max("reg").alias("reg"))
    return hll_estimate_from_registers(regs)


def streaming_cms(
    stream_df: DataFrame,
    col: str,
    state_path: str,
    weight_col: str | None = None,
):
    """``writeStream`` builder: maintain an incremental count-min
    counter log at ``{state_path}/cms_log``; read the live counters
    with :func:`cms_fold`."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        delta = cms_counters(batch_df, col, weight_col=weight_col).withColumn(
            "batch_id", F.lit(batch_id)
        )
        _write_by_batch(delta, f"{state_path}/cms_log")

    return stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", f"{state_path}/_ckpt_cms"
    )


def cms_fold(spark: SparkSession, state_path: str) -> DataFrame:
    """(r, bucket, cnt) — the live counter matrix: per-cell SUM over
    all batch deltas.  Feed straight into
    :func:`~graphdb_neo4j_spark.operators.sketch.cms_estimate`."""
    log = spark.read.parquet(f"{state_path}/cms_log")
    return log.groupBy("r", "bucket").agg(F.sum("cnt").alias("cnt"))


def compact_sketch_log(spark: SparkSession, state_path: str, kind: str) -> None:
    """Fold a sketch log to a single ``batch_id = -1`` partition so the
    read side stays O(cells) regardless of stream age.  ``kind`` is
    ``'hll'`` or ``'cms'``.  Safe to run between triggers: the fold is
    itself a valid delta, and replacing the log with it preserves every
    future fold's result (associativity of MAX / SUM)."""
    if kind == "hll":
        path = f"{state_path}/hll_log"
        folded = (
            spark.read.parquet(path)
            .groupBy("bucket").agg(F.max("reg").alias("reg"))
            .withColumn("batch_id", F.lit(-1))
        )
    elif kind == "cms":
        path = f"{state_path}/cms_log"
        folded = (
            spark.read.parquet(path)
            .groupBy("r", "bucket").agg(F.sum("cnt").alias("cnt"))
            .withColumn("batch_id", F.lit(-1))
        )
    else:
        raise ValueError(f"unknown sketch kind: {kind}")
    # materialize before the destructive rewrite (read-before-overwrite)
    rows = folded.collect()
    compacted = spark.createDataFrame(rows, folded.schema)
    compacted.write.mode("overwrite").partitionBy("batch_id").parquet(path)

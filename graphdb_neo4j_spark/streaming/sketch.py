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

Compaction crash-safety protocol (no transaction log needed):

* only checkpoint-COMMITTED batch ids are folded (read from the
  stream's ``commits/`` directory), so a batch that is later replayed
  can never already be inside the fold — replay re-creates its own
  partition via dynamic overwrite, exactly as before compaction;
* the fold lands in the ``batch_id = -1`` partition (one atomic
  job-commit via dynamic partition overwrite) carrying a
  ``compacted_through`` watermark column = the max batch id folded;
* BOTH the read-side folds and the next compaction ignore rows with
  ``0 <= batch_id <= compacted_through`` — so deleting the consumed
  source partitions is pure garbage collection: a crash between the
  fold commit and the deletes leaves duplicates on disk that no
  reader ever counts, and re-running compaction completes the GC.

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
        # compacted_through = -1 marks a raw delta; only the batch_id=-1
        # fold partition carries a real watermark (see module docstring)
        df.withColumn("compacted_through", F.lit(-1))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def _hadoop_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, p


def _committed_batch_ids(
    spark: SparkSession, ckpt_path: str
) -> tuple[set[int], int] | None:
    """(retained commit ids, floor) from the streaming checkpoint, or
    ``None`` if no commits directory exists (non-streaming / test-only
    logs, where every written partition is final by construction).

    Spark purges old commit-log entries (minBatchesToRetain), and it
    purges OLDEST-FIRST — so any batch id below the smallest retained
    entry (``floor``) was necessarily committed too.  Treating purged
    ids as uncommitted would strand their deltas below the compaction
    watermark forever (never folded, ignored by readers).
    """
    fs, p = _hadoop_path(spark, f"{ckpt_path}/commits")
    if not fs.exists(p):
        return None
    ids: set[int] = set()
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.isdigit():
            ids.add(int(name))
    return ids, (min(ids) if ids else 0)


def _live_rows(log: DataFrame) -> tuple[DataFrame, int]:
    """(live, compacted_through): drop source partitions already folded
    into ``batch_id = -1`` — leftovers from a crash between the fold
    commit and the partition GC must never be double-counted."""
    if "compacted_through" not in log.columns:
        # pre-watermark log (never compacted by this version): all live
        return log, -1
    ct_row = (
        log.where(F.col("batch_id") == -1)
        .agg(F.max("compacted_through"))
        .head()
    )
    ct = ct_row[0] if ct_row and ct_row[0] is not None else -1
    live = log.where((F.col("batch_id") == -1) | (F.col("batch_id") > ct))
    return live, int(ct)


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
    log, _ = _live_rows(spark.read.parquet(f"{state_path}/hll_log"))
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
    log, _ = _live_rows(spark.read.parquet(f"{state_path}/cms_log"))
    return log.groupBy("r", "bucket").agg(F.sum("cnt").alias("cnt"))


def compact_sketch_log(spark: SparkSession, state_path: str, kind: str) -> None:
    """Fold a sketch log into the single ``batch_id = -1`` partition so
    the read side stays O(cells) regardless of stream age.  ``kind`` is
    ``'hll'``, ``'cms'``, or ``'hist'``.

    Crash-safe and replay-safe (module docstring): only
    checkpoint-committed batches are folded, the fold is ONE atomic
    dynamic-partition-overwrite of the ``-1`` partition stamped with a
    ``compacted_through`` watermark, and source-partition deletion is
    idempotent GC that readers never depend on.  Safe to run between
    triggers: an in-flight (uncommitted) batch is left untouched and a
    replayed one rewrites its own partition above the watermark.
    """
    if kind == "hll":
        path = f"{state_path}/hll_log"
        key_cols, agg = ["bucket"], F.max("reg").alias("reg")
    elif kind == "cms":
        path = f"{state_path}/cms_log"
        key_cols, agg = ["r", "bucket"], F.sum("cnt").alias("cnt")
    elif kind == "hist":
        path = f"{state_path}/hist_log"
        key_cols, agg = ["g", "bin"], F.sum("cnt").alias("cnt")
    else:
        raise ValueError(f"unknown sketch kind: {kind}")

    log = spark.read.parquet(path)
    if "compacted_through" not in log.columns:
        # legacy log written before the watermark column: uniform the
        # schema first (all rows are raw deltas)
        log = log.withColumn("compacted_through", F.lit(-1))
    live, ct_old = _live_rows(log)
    commit_info = _committed_batch_ids(spark, f"{state_path}/_ckpt_{kind}")
    present = {
        int(r["batch_id"])
        for r in live.select("batch_id").distinct().collect()
    }
    eligible = sorted(
        b for b in present
        if b >= 0
        and (
            commit_info is None
            or b in commit_info[0]
            or b < commit_info[1]  # purged from commits ⇒ committed
        )
    )
    if not eligible:
        return  # nothing committed beyond the current watermark
    ct_new = max(eligible)

    folded = (
        live.where(
            (F.col("batch_id") == -1) | F.col("batch_id").isin(eligible)
        )
        .groupBy(*key_cols)
        .agg(agg)
        .withColumn("compacted_through", F.lit(ct_new))
        .withColumn("batch_id", F.lit(-1))
    )
    # materialize before rewriting the partition the plan reads from;
    # sketch state is O(cells) by construction, never data-proportional
    rows = folded.collect()
    (
        spark.createDataFrame(rows, folded.schema)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )
    # GC the consumed source partitions — readers already ignore
    # batch_id <= ct_new, so a crash anywhere below is harmless and a
    # re-run of compact completes the cleanup
    fs, _ = _hadoop_path(spark, path)
    jvm = spark._jvm
    for b in eligible:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/batch_id={b}"), True)


def streaming_histogram(
    stream_df: DataFrame,
    group_col: str,
    value_col: str,
    state_path: str,
    lo_micro: int,
    hi_micro: int,
    nbins: int = 256,
):
    """``writeStream`` builder: maintain an incremental fixed-grid
    histogram log at ``{state_path}/hist_log`` — the streaming quantile
    monitor (latency / score / length distributions over an unbounded
    stream).  The grid is fixed at definition time, so per-batch deltas
    merge by per-cell SUM exactly like count-min counters; read live
    quantiles with :func:`histogram_estimate`, compact with
    ``compact_sketch_log(spark, state_path, "hist")``.
    """
    from graphdb_neo4j_spark.operators.sketch import fixed_histogram_counts

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        delta = fixed_histogram_counts(
            batch_df, group_col, value_col, lo_micro, hi_micro, nbins
        ).withColumn("batch_id", F.lit(batch_id))
        _write_by_batch(delta, f"{state_path}/hist_log")

    return stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", f"{state_path}/_ckpt_hist"
    )


def histogram_fold(spark: SparkSession, state_path: str) -> DataFrame:
    """(g, bin, cnt) — the live cell matrix: per-cell SUM over all
    batch deltas."""
    log, _ = _live_rows(spark.read.parquet(f"{state_path}/hist_log"))
    return log.groupBy("g", "bin").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def histogram_estimate(
    spark: SparkSession,
    state_path: str,
    lo_micro: int,
    hi_micro: int,
    nbins: int = 256,
    quantiles_micro: list[int] | None = None,
) -> DataFrame:
    """Live quantile estimates from the streaming histogram log —
    bit-identical to the batch fixed-grid estimate over all data seen
    (cell-wise SUM is exact, the grid never moves)."""
    from graphdb_neo4j_spark.operators.sketch import (
        fixed_histogram_quantiles,
    )

    return fixed_histogram_quantiles(
        histogram_fold(spark, state_path),
        lo_micro,
        hi_micro,
        nbins,
        quantiles_micro,
    )

"""Streaming drift monitor: per-micro-batch PSI against a frozen
reference window — the live tail of :mod:`~graphdb_neo4j_spark.
operators.drift`.

The reference layout (lo, width) and shares are computed ONCE when the
stream is wired (reference = training window; freezing it is the point
of PSI) and the per-batch work is one bucket-count hash-agg over the
batch plus a ≤ B-row join — the (batch_id, psi) timeline is the
monitoring artifact.  Exactly-once: each batch overwrites its own
partition of the timeline log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators.drift import EPS, _bucketed_share


def streaming_drift(
    stream_df: DataFrame,
    ref: DataFrame,
    col: str,
    state_path: str,
    n_buckets: int = 10,
):
    """``writeStream`` builder: append one (batch_id, psi, rows) row per
    micro-batch to ``{state_path}/psi_log``; read with
    :func:`drift_timeline`.  Bit-identical to running
    :func:`~graphdb_neo4j_spark.operators.drift.psi_drift` on each
    batch's rows with the same reference."""
    stats = ref.agg(
        F.min(F.col(col).cast("double")).alias("lo"),
        F.max(F.col(col).cast("double")).alias("hi"),
        F.count(F.col(col)).alias("n"),
    ).head()
    lo, hi, n_ref = stats["lo"], stats["hi"], stats["n"]
    if lo is None or n_ref == 0:
        raise ValueError("streaming_drift: reference has no non-null rows")
    width = (hi - lo) / n_buckets if hi > lo else 1.0
    ref_shares = (
        _bucketed_share(ref, col, lo, width, n_buckets)
        .withColumnRenamed("share", "p_ref")
        .localCheckpoint()  # frozen: never recomputed per batch
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cur = (
            _bucketed_share(batch_df, col, lo, width, n_buckets)
            .withColumnRenamed("share", "p_cur")
        )
        joined = ref_shares.join(cur, "bucket", "full_outer").select(
            F.coalesce(F.col("p_ref"), F.lit(0.0)).alias("p_ref"),
            F.coalesce(F.col("p_cur"), F.lit(0.0)).alias("p_cur"),
        )
        pr = F.col("p_ref") + F.lit(EPS)
        pc = F.col("p_cur") + F.lit(EPS)
        term = (pc - pr) * F.log(pc / pr)
        row = joined.agg(F.round(F.sum(term), 6).alias("psi")).head()
        n_rows = batch_df.filter(F.col(col).isNotNull()).count()
        (
            spark.createDataFrame(
                [(int(batch_id), float(row["psi"]), int(n_rows))],
                "batch_id long, psi double, rows long",
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{state_path}/psi_log")
        )

    return stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", f"{state_path}/_ckpt_drift"
    )


def drift_timeline(spark: SparkSession, state_path: str) -> DataFrame:
    """(batch_id, psi, rows) — the monitoring timeline, batch order."""
    return spark.read.parquet(f"{state_path}/psi_log").orderBy("batch_id")

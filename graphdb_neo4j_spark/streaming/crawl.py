"""Streaming crawl-shard ingest — the incremental face of the
compressed/WARC front door.

A crawl never arrives all at once: shard manifests land in waves as
the crawler uploads.  This module runs the SAME single-pass decode
kernels (:func:`~graphdb_neo4j_spark.sources.compressed.decode_shards_union`
for line shards, :func:`~graphdb_neo4j_spark.sources.warc.warc_records`
for WARC/WET containers — gzip/zlib/bz2/xz/zstd alike) over a
Structured Streaming source of ``(shard_id, codec, payload)`` rows,
with the repo's exactly-once layout: good rows and quarantine rows
land under ``{state}/good`` / ``{state}/quarantine`` partitioned by
``batch_id`` with dynamic-partition overwrite, and a meta log written
LAST gates replays — a batch whose meta row exists is skipped whole,
a half-written batch rewrites only its own partition.

Batch ≡ stream: for any prefix of shard files, ``good``/``quarantine``
equal the batch kernels on the same shards (tests/test_streaming_crawl.py).

100 TB notes: decode cost is paid once per shard as it ARRIVES instead
of re-paid per snapshot rebuild; parallelism within a micro-batch is
the shard count (unsplittable streams); the blob column dies inside
the batch function, so the streamed state is text-sized, not
payload-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from graphdb_neo4j_spark.sources.compressed import decode_shards_union
from graphdb_neo4j_spark.sources.warc import warc_records

_META_SCHEMA = "batch_id long, n_good long, n_quarantined long"


def _done_batches(spark: SparkSession, meta_path: str) -> set[int]:
    try:
        return {
            r.batch_id
            for r in spark.read.parquet(meta_path).select("batch_id").collect()
        }
    except AnalysisException:
        return set()


def _write_by_batch(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("batch_id").parquet(path)


def streaming_crawl_ingest(
    shards_stream: DataFrame,
    state_path: str,
    mode: str = "warc",
    codec: str | None = None,
    max_bytes: int = 1 << 30,
):
    """``writeStream`` builder over a ``(shard_id, payload[, codec])``
    stream (e.g. ``readStream.schema(...).parquet(manifest_dir)``).

    ``mode="warc"`` parses each shard as a compressed WARC/WET
    container (good rows = record rows); ``mode="lines"`` decodes each
    shard as a compressed text shard (good rows = line rows).  Bad
    shards yield ONE quarantine row each with the verbatim exception —
    never silent loss, same contract as the batch kernels.

    Returns the builder; caller picks trigger/checkpoint.  Outputs:
    ``{state_path}/good``, ``{state_path}/quarantine``,
    ``{state_path}/meta`` (committed last — the exactly-once gate).
    """
    if mode not in ("warc", "lines"):
        raise ValueError(f"mode must be 'warc' or 'lines', got {mode!r}")
    good_path = f"{state_path}/good"
    quar_path = f"{state_path}/quarantine"
    meta_path = f"{state_path}/meta"

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id in _done_batches(spark, meta_path):
            return
        if mode == "warc":
            union = warc_records(
                batch_df, codec=codec or "gzip", max_bytes=max_bytes,
                strict=False,
            )
        else:
            union = decode_shards_union(
                batch_df, codec=codec, max_bytes=max_bytes, strict=False
            )
        # ONE decode pass: land the union, take the views from storage
        union = union.withColumn("batch_id", F.lit(batch_id)).persist()
        try:
            good = union.filter(F.col("error").isNull()).drop("error")
            quar = union.filter(F.col("error").isNotNull()).select(
                "shard_id", "error", "batch_id"
            )
            n_good = good.count()
            n_quar = quar.count()
            _write_by_batch(good, good_path)
            _write_by_batch(quar, quar_path)
        finally:
            union.unpersist()
        _write_by_batch(
            spark.createDataFrame([(batch_id, n_good, n_quar)], _META_SCHEMA),
            meta_path,
        )

    return shards_stream.writeStream.foreachBatch(_process)

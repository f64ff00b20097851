"""Streaming JSONL corpus ingest with malformed-line quarantine.

The streaming face of :mod:`graphdb_neo4j_spark.sources.corpus`: a
``readStream.text`` line stream is routed per micro-batch through the
same PERMISSIVE ``from_json`` split, good rows land columnar under
``{state}/good``, bad lines verbatim under ``{state}/quarantine``, and
a tiny meta log (written LAST) records per-batch counts — the same
exactly-once discipline as :mod:`graphdb_neo4j_spark.streaming.ingest`:
every write is partitioned by ``batch_id`` with dynamic-partition
overwrite, so a replayed batch rewrites its own partition instead of
double-appending, and a batch whose meta row exists is skipped whole.

Batch ≡ stream: for any prefix of input files, ``good``/``quarantine``
equal :func:`~graphdb_neo4j_spark.sources.corpus.read_jsonl_corpus` on
the same files (gated in tests/test_corpus_source.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from pyspark.sql.utils import AnalysisException

from graphdb_neo4j_spark.sources.corpus import split_jsonl_lines

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
    # per-writer option, NOT session conf: a replayed batch overwrites
    # only its own batch_id partition without leaking 'dynamic'
    # overwrite mode into the user's session for unrelated writes
    df.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("batch_id").parquet(path)


def streaming_corpus_ingest(
    lines_stream: DataFrame,
    state_path: str,
    schema: StructType,
    split_fn=None,
):
    """``writeStream`` builder over a ``value: string`` line stream.

    Returns the builder; caller picks trigger/checkpoint.  Outputs:

    * ``{state_path}/good``        — schema columns + ``batch_id``
    * ``{state_path}/quarantine``  — ``raw_line`` + ``batch_id``
    * ``{state_path}/meta``        — per-batch counts, committed last

    ``split_fn(lines, schema) -> (good, quarantine)`` defaults to the
    JSONL splitter; :func:`streaming_csv_ingest` passes the CSV one —
    the quarantine/exactly-once machinery is format-agnostic.
    """
    if split_fn is None:
        split_fn = split_jsonl_lines
    good_path = f"{state_path}/good"
    quar_path = f"{state_path}/quarantine"
    meta_path = f"{state_path}/meta"

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id in _done_batches(spark, meta_path):
            return
        lines = batch_df.persist()
        try:
            good, quar = split_fn(lines, schema)
            good = good.withColumn("batch_id", F.lit(batch_id))
            quar = quar.withColumn("batch_id", F.lit(batch_id))
            # counts from the cached batch (a read-back would fail on a
            # batch with zero quarantined lines: an all-empty dynamic
            # overwrite leaves no footer to infer a schema from)
            n_good = good.count()
            n_quar = quar.count()
            _write_by_batch(good, good_path)
            _write_by_batch(quar, quar_path)
        finally:
            lines.unpersist()
        _write_by_batch(
            spark.createDataFrame([(batch_id, n_good, n_quar)], _META_SCHEMA),
            meta_path,
        )

    return lines_stream.writeStream.foreachBatch(_process)


def streaming_csv_ingest(
    lines_stream: DataFrame,
    state_path: str,
    schema: StructType,
    sep: str = ",",
    header: bool = True,
):
    """CSV face of :func:`streaming_corpus_ingest`: same exactly-once
    batch_id-partitioned good/quarantine/meta layout, parsing through
    ``sources.csv.split_csv_lines``.  With ``header=True`` lines equal
    to the schema's header string are dropped before parsing (each
    newly-arriving file carries one)."""
    from graphdb_neo4j_spark.sources.csv import split_csv_lines

    def split(lines: DataFrame, sch: StructType):
        if header:
            head = sep.join(f.name for f in sch.fields)
            lines = lines.filter(F.col("value") != head)
        return split_csv_lines(lines, sch, sep=sep)

    return streaming_corpus_ingest(
        lines_stream, state_path, schema, split_fn=split
    )

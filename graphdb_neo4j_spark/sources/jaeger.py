"""Jaeger trace-JSON source.

The reference reads one JSON object per file (UTF-8 with BOM), keeps
only ``traceID`` + ``spans``, defaults a missing/empty traceID to
``FILE::<basename>``, and stable-sorts spans by ``startTime`` (missing →
0) before sequential processing (``/root/reference/events.py:507-519``).

Spark mapping: ``spark.read.json(multiLine=True)`` with an **explicit
schema** (tag values are heterogeneous string/int64/bool in JSON —
reading ``value`` as StringType captures the literal token, which
matches the reference's ``str()`` coercions).  The reference's global
processing order (sorted file glob, then startTime, then file position)
is *not* a physical sort here — it is carried as ``(file, start_time,
span_idx)`` ordering columns that the upsert conflict-resolution
consumes (see operators/ingest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from graphdb_neo4j_spark.functions.etl import tags_map

TRACE_SCHEMA = StructType(
    [
        StructField("traceID", StringType()),
        StructField(
            "spans",
            ArrayType(
                StructType(
                    [
                        StructField("spanID", StringType()),
                        StructField("operationName", StringType()),
                        StructField("startTime", LongType()),
                        StructField("duration", LongType()),
                        StructField(
                            "references",
                            ArrayType(
                                StructType(
                                    [
                                        StructField("refType", StringType()),
                                        StructField("traceID", StringType()),
                                        StructField("spanID", StringType()),
                                    ]
                                )
                            ),
                        ),
                        StructField(
                            "tags",
                            ArrayType(
                                StructType(
                                    [
                                        StructField("key", StringType()),
                                        StructField("type", StringType()),
                                        StructField("value", StringType()),
                                    ]
                                )
                            ),
                        ),
                        StructField("processID", StringType()),
                    ]
                )
            ),
        ),
    ]
)


def read_traces(spark: SparkSession, path: str) -> DataFrame:
    """One row per trace file: ``trace_id``, ``file``, ``spans``.

    ``trace_id`` falls back to ``FILE::<basename>`` when the top-level
    traceID is missing or empty (truthy ``or`` in the reference,
    events.py:510).
    """
    from graphdb_neo4j_spark.sources.tables import ensure_session_confs

    ensure_session_confs(spark)
    # NOTE: do NOT set an explicit `encoding` — in multiLine mode that
    # disables charset auto-detection and the corpus' UTF-8 BOM then
    # breaks the parse (all fields NULL under PERMISSIVE mode).
    # Auto-detection strips the BOM, matching the reference's
    # ``encoding="utf-8-sig"`` (events.py:508).
    raw = (
        spark.read.option("multiLine", "true")
        .schema(TRACE_SCHEMA)
        .json(path)
        .withColumn("file", F.input_file_name())
    )
    basename = F.element_at(F.split(F.col("file"), "/"), -1)
    trace_id = F.when(
        F.col("traceID").isNotNull() & (F.col("traceID") != ""), F.col("traceID")
    ).otherwise(F.concat(F.lit("FILE::"), basename))
    return raw.select(trace_id.alias("trace_id"), "file", "spans")


def spans_from_traces(traces: DataFrame) -> DataFrame:
    """Explode a :func:`read_traces` DataFrame into one row per span with
    the normalized tag map and ordering columns.

    Columns: ``trace_id``, ``file``, ``span_idx`` (position within the
    file's spans array), ``start_time`` (missing → 0, the reference's
    sort default), ``tags`` (map<string,string>, falsy→NULL normalized).
    """
    exploded = traces.select(
        "trace_id",
        "file",
        F.posexplode("spans").alias("span_idx", "span"),
    )
    return exploded.select(
        "trace_id",
        "file",
        "span_idx",
        F.coalesce(F.col("span.startTime"), F.lit(0)).alias("start_time"),
        tags_map(F.col("span.tags")).alias("tags"),
    )


def read_spans(spark: SparkSession, path: str) -> DataFrame:
    """One row per span (see :func:`spans_from_traces`)."""
    return spans_from_traces(read_traces(spark, path))

"""JSONL document-corpus source with malformed-row quarantine.

Training-data ingestion reads huge line-delimited JSON dumps where a
fraction of lines is garbage (truncated writes, encoding damage, schema
drift).  The right Spark shape is PERMISSIVE mode with an explicit
schema + ``columnNameOfCorruptRecord``: good rows parse columnar and
pushdown-friendly, bad lines land intact in a quarantine column for
audit — one scan, no Python, no job-killing exceptions
(FAILFAST) and no silent data loss (DROPMALFORMED).

100 TB notes: an explicit schema skips the full-corpus inference scan;
quarantined raw lines are carried only until the split below, so the
clean branch's parquet never stores them.  Partitioning follows the
input file splits (JSONL splits by line).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: StructType,
) -> tuple[DataFrame, DataFrame]:
    """Read line-delimited JSON at ``path`` → ``(good, quarantine)``.

    ``good`` has exactly ``schema``'s columns (rows where every
    declared column parsed; partially-parsed rows are quarantined too —
    a half-parsed training document is corrupt, not usable).
    ``quarantine`` is ``(raw_line string)`` — the verbatim bad lines.

    Spark quirks handled here: a line that is valid JSON but violates a
    declared type yields a parsed row WITH the corrupt column set — the
    split routes on the corrupt column alone, so such rows are
    quarantined whole, never half-ingested.  And because Spark refuses
    queries that reference ONLY the internal corrupt column of a raw
    JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN), the parse goes
    through ``read.text`` + ``from_json`` — the quarantine branch then
    carries the verbatim line from the text scan itself.
    """
    if CORRUPT_COL in [f.name for f in schema.fields]:
        raise ValueError(f"schema must not declare {CORRUPT_COL!r}")
    return split_jsonl_lines(spark.read.text(path), schema)


def split_jsonl_lines(
    lines: DataFrame, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """Route a ``value: string`` line frame into ``(good, quarantine)``
    — the shared core of the batch reader and the streaming ingester
    (works on both static and streaming DataFrames)."""
    if CORRUPT_COL in [f.name for f in schema.fields]:
        raise ValueError(f"schema must not declare {CORRUPT_COL!r}")
    full = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
    )
    parsed = lines.select(
        F.col("value"),
        F.from_json(
            "value",
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("j"),
    )
    good = parsed.filter(
        F.col("j").isNotNull() & F.col(f"j.{CORRUPT_COL}").isNull()
    ).select(*[F.col(f"j.{f.name}").alias(f.name) for f in schema.fields])
    quarantine = parsed.filter(
        F.col("j").isNull() | F.col(f"j.{CORRUPT_COL}").isNotNull()
    ).select(F.col("value").alias("raw_line"))
    return good, quarantine


def corpus_ingest_report(
    good: DataFrame, quarantine: DataFrame
) -> DataFrame:
    """One-row audit: (n_good, n_quarantined, quarantine_ratio) — the
    gate a pipeline checks before promoting an ingest batch."""
    g = good.agg(F.count("*").alias("n_good"))
    q = quarantine.agg(F.count("*").alias("n_quarantined"))
    return g.crossJoin(q).select(
        "n_good",
        "n_quarantined",
        (
            F.col("n_quarantined")
            / F.greatest(F.col("n_good") + F.col("n_quarantined"), F.lit(1))
        ).alias("quarantine_ratio"),
    )

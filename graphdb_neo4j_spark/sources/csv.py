"""CSV source with malformed-row quarantine — the delimited sibling of
``sources/corpus.py``'s JSONL reader.

Real CSV dumps carry ragged rows (wrong column counts, unquoted
delimiters, type garbage).  Same Spark-first contract as the JSONL
source: PERMISSIVE parsing against an EXPLICIT schema with
``columnNameOfCorruptRecord`` — good rows come out typed and
pushdown-friendly, every malformed line survives verbatim in the
quarantine frame for audit.  One scan, no inference pass, no
job-killing FAILFAST, no silent DROPMALFORMED loss.

Parsing goes through ``read.text`` + ``from_csv`` (the corpus.py
pattern): Spark refuses queries that reference ONLY the internal
corrupt column of a raw CSV scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN),
and the text scan keeps the verbatim line for the quarantine branch
anyway.  Files split by line across executors; the header line is
recognized literally and dropped before parsing.

100 TB notes: the explicit schema skips the whole-file inference scan;
the corrupt capture never leaves this function on the clean branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_csv_quarantined(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) from one text scan + PERMISSIVE ``from_csv``.

    ``schema`` describes the DATA columns only.  ``clean`` carries the
    declared columns for fully-parsed rows; a row with ANY broken
    field (type garbage, short row, long row) lands whole in
    ``quarantine`` as its verbatim line — never half-ingested.  With
    ``header=True`` lines equal to the schema's header string are
    dropped (per-file headers included).
    """
    if any(f.name == CORRUPT_COL for f in schema.fields):
        raise ValueError(f"schema must not declare {CORRUPT_COL!r}")
    lines = spark.read.text(path)
    if header:
        head = sep.join(f.name for f in schema.fields)
        lines = lines.filter(F.col("value") != head)
    return split_csv_lines(lines, schema, sep=sep)


def split_csv_lines(
    lines: DataFrame, schema: StructType, sep: str = ","
) -> tuple[DataFrame, DataFrame]:
    """Route a ``value: string`` line frame into ``(clean,
    quarantine)`` — works on static and streaming frames alike (the
    corpus.py contract)."""
    if any(f.name == CORRUPT_COL for f in schema.fields):
        raise ValueError(f"schema must not declare {CORRUPT_COL!r}")
    full = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
    )
    parsed = lines.select(
        F.col("value"),
        F.from_csv(
            "value",
            full.simpleString(),
            {
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": CORRUPT_COL,
                "sep": sep,
            },
        ).alias("c"),
    )
    clean = parsed.filter(
        F.col("c").isNotNull() & F.col(f"c.{CORRUPT_COL}").isNull()
    ).select(*[F.col(f"c.{f.name}").alias(f.name) for f in schema.fields])
    quarantine = parsed.filter(
        F.col("c").isNull() | F.col(f"c.{CORRUPT_COL}").isNotNull()
    ).select(F.col("value").alias("raw_line"))
    return clean, quarantine


def csv_quarantine_report(quarantine: DataFrame) -> DataFrame:
    """(n_bad, n_distinct, sample) — one row; the load-gate summary a
    pipeline logs before deciding whether a dump is usable."""
    return quarantine.agg(
        F.count("*").cast("bigint").alias("n_bad"),
        F.countDistinct("raw_line").cast("bigint").alias("n_distinct"),
        F.min("raw_line").alias("sample"),
    )

from graphdb_neo4j_spark.sources.corpus import (
    corpus_ingest_report,
    read_jsonl_corpus,
    split_jsonl_lines,
)
from graphdb_neo4j_spark.sources.csv import (
    csv_quarantine_report,
    read_csv_quarantined,
    split_csv_lines,
)
from graphdb_neo4j_spark.sources.jaeger import TRACE_SCHEMA, read_spans, read_traces
from graphdb_neo4j_spark.sources.tables import TABLE_NAMES, load_table, load_tables, register_views

__all__ = [
    "corpus_ingest_report",
    "csv_quarantine_report",
    "read_csv_quarantined",
    "split_csv_lines",
    "read_jsonl_corpus",
    "split_jsonl_lines",
    "TRACE_SCHEMA",
    "read_spans",
    "read_traces",
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
]

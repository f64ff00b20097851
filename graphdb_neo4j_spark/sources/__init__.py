from graphdb_neo4j_spark.sources.corpus import (
    corpus_ingest_report,
    read_jsonl_corpus,
    split_jsonl_lines,
)
from graphdb_neo4j_spark.sources.jaeger import TRACE_SCHEMA, read_spans, read_traces
from graphdb_neo4j_spark.sources.tables import TABLE_NAMES, load_table, load_tables, register_views

__all__ = [
    "corpus_ingest_report",
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

from graphdb_neo4j_spark.streaming.ingest import (
    compact_graph_log,
    stream_graph_ingest,
    stream_spans,
    windowed_event_counts,
)

__all__ = [
    "compact_graph_log",
    "stream_graph_ingest",
    "stream_spans",
    "windowed_event_counts",
]

from graphdb_neo4j_spark.streaming.ingest import (
    compact_graph_log,
    stream_graph_ingest,
    stream_spans,
    streaming_dedup_spans,
    streaming_neardup_dedup,
    windowed_event_counts,
)

__all__ = [
    "compact_graph_log",
    "stream_graph_ingest",
    "stream_spans",
    "streaming_dedup_spans",
    "streaming_neardup_dedup",
    "windowed_event_counts",
]

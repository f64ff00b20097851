from graphdb_neo4j_spark.streaming.ann import (
    streaming_ann_candidates,
    streaming_ann_topk,
)
from graphdb_neo4j_spark.streaming.ingest import (
    compact_graph_log,
    stream_graph_ingest,
    stream_spans,
    streaming_dedup_spans,
    streaming_neardup_dedup,
    windowed_event_counts,
)
from graphdb_neo4j_spark.streaming.text import (
    compact_dfreq_log,
    streaming_chunks,
    streaming_tfidf,
)

__all__ = [
    "compact_dfreq_log",
    "compact_graph_log",
    "stream_graph_ingest",
    "stream_spans",
    "streaming_ann_candidates",
    "streaming_ann_topk",
    "streaming_chunks",
    "streaming_dedup_spans",
    "streaming_neardup_dedup",
    "streaming_tfidf",
    "windowed_event_counts",
]

from graphdb_neo4j_spark.streaming.corpus import (
    streaming_corpus_ingest,
    streaming_csv_ingest,
)
from graphdb_neo4j_spark.streaming.ann import (
    streaming_ann_candidates,
    streaming_ann_topk,
)
from graphdb_neo4j_spark.streaming.ingest import (
    compact_graph_log,
    neardup_kept,
    stream_graph_ingest,
    stream_spans,
    streaming_dedup_spans,
    streaming_neardup_dedup,
    windowed_event_counts,
)
from graphdb_neo4j_spark.streaming.join import (
    interval_join,
    run_interval_join_stream,
)
from graphdb_neo4j_spark.streaming.debounce import (
    bursts_history,
    streaming_debounce,
)
from graphdb_neo4j_spark.streaming.dim import (
    golden_history,
    scd2_history,
    streaming_golden_record,
    streaming_scd2,
)
from graphdb_neo4j_spark.streaming.drift import (
    drift_timeline,
    streaming_drift,
)
from graphdb_neo4j_spark.streaming.sketch import (
    cms_fold,
    compact_sketch_log,
    histogram_estimate,
    histogram_fold,
    hll_estimate,
    streaming_cms,
    streaming_histogram,
    streaming_hll,
)
from graphdb_neo4j_spark.streaming.media import (
    fingerprint_kept,
    streaming_fingerprint_neardup,
)
from graphdb_neo4j_spark.streaming.text import (
    compact_dfreq_log,
    streaming_chunks,
    streaming_tfidf,
)

__all__ = [
    "bursts_history",
    "cms_fold",
    "golden_history",
    "compact_dfreq_log",
    "compact_graph_log",
    "compact_sketch_log",
    "drift_timeline",
    "fingerprint_kept",
    "histogram_estimate",
    "histogram_fold",
    "hll_estimate",
    "interval_join",
    "neardup_kept",
    "scd2_history",
    "stream_graph_ingest",
    "run_interval_join_stream",
    "stream_spans",
    "streaming_ann_candidates",
    "streaming_ann_topk",
    "streaming_chunks",
    "streaming_cms",
    "streaming_histogram",
    "streaming_corpus_ingest",
    "streaming_csv_ingest",
    "streaming_debounce",
    "streaming_dedup_spans",
    "streaming_drift",
    "streaming_fingerprint_neardup",
    "streaming_golden_record",
    "streaming_hll",
    "streaming_neardup_dedup",
    "streaming_scd2",
    "streaming_tfidf",
    "windowed_event_counts",
]

"""Streaming text pipeline: incremental-dfreq TF-IDF and
offset-continuous RAG chunking.

Both operators are ``foreachBatch`` + append-log formulations — the
same Delta-free pattern as :mod:`graphdb_neo4j_spark.streaming.ingest`
— because their semantics need cross-batch state that Spark's built-in
streaming aggregations cannot express in append mode:

* TF-IDF needs the *cumulative* document frequency of every term at
  scoring time (a stream-stream join of a per-doc aggregate against a
  forever-growing per-term aggregate), so each micro-batch appends its
  per-term df deltas to a partitioned log and scores against the
  folded log.  A document is scored AT ARRIVAL with the corpus
  statistics accumulated so far (prefix semantics) — deterministic
  given batch boundaries, and gated by a batch-prefix-equivalence test
  against :func:`~graphdb_neo4j_spark.operators.text.tfidf_top_terms`.
* Chunking needs a global, gap-free chunk sequence number that
  SURVIVES RESTARTS, so each micro-batch claims a contiguous offset
  range ``[base, base + n_chunks)`` recorded in a tiny meta log.

Exactly-once: every state/output write is parquet partitioned by
``batch_id`` with dynamic partition overwrite, so a replayed batch
(failure between writes, checkpoint reprocessing) overwrites its own
partition instead of double-appending; the meta log is written LAST,
so its presence marks a fully committed batch and the handler skips
replays outright.

100 TB notes: the dfreq fold reads O(vocabulary × batches) tiny rows —
compact with :func:`compact_dfreq_log` every N batches to keep it
O(vocabulary).  The chunk enumeration never collapses to one
partition: a range partition by (doc, chunk) then a per-partition
rank + driver-side cumulative partition counts (the counts are one int
per partition — never data) gives each row its contiguous global
index with one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from graphdb_neo4j_spark.operators.text import chunk_documents, tokens

_META_SCHEMA = "batch_id long, n_docs long, n_chunks long"


def _done_batches(spark: SparkSession, meta_path: str) -> set[int]:
    try:
        return {
            r.batch_id
            for r in spark.read.parquet(meta_path).select("batch_id").collect()
        }
    except AnalysisException:
        return set()


def _write_by_batch(df: DataFrame, path: str) -> None:
    """Idempotent micro-batch write: overwrite only this batch's
    partition (replays rewrite the same files instead of appending)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def streaming_tfidf(
    docs_stream: DataFrame,
    state_path: str,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """``writeStream`` builder: per micro-batch, score the batch's
    documents with TF-IDF against the document frequencies accumulated
    over ALL batches so far (this one included) and append the per-doc
    top-``k`` to ``{state_path}/topk`` as
    ``(doc_id, term, tf, dfreq, tfidf, batch_id)``.

    State: ``{state_path}/dfreq_log`` holds ``(term, df_delta)`` per
    batch; ``{state_path}/meta`` holds ``(batch_id, n_docs, _)``.  The
    cumulative fold is one hash aggregate over the log (map-side
    combine, vocabulary-sized output); the corpus itself is never
    rescanned.
    """
    dfreq_path = f"{state_path}/dfreq_log"
    meta_path = f"{state_path}/meta"
    topk_path = f"{state_path}/topk"

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id in _done_batches(spark, meta_path):
            return
        docs = batch_df.filter(F.trim(F.col(text_col)) != "")
        tf = (
            docs.select(
                F.col(id_col).alias("id"),
                F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
            )
            .groupBy("id", "term")
            .agg(F.count("*").alias("tf"))
            .persist()
        )
        try:
            _write_by_batch(
                tf.groupBy("term")
                .agg(F.count("*").alias("df_delta"))
                .withColumn("batch_id", F.lit(batch_id)),
                dfreq_path,
            )
            cum = spark.read.parquet(dfreq_path).groupBy("term").agg(
                F.sum("df_delta").alias("dfreq")
            )
            # count ALL rows (empty docs included) — the batch operator's
            # N is F.count("*") over the unfiltered frame, and the
            # prefix-equivalence gate needs the identical denominator
            n_docs = batch_df.count()
            prior = 0
            if _done_batches(spark, meta_path):
                prior = (
                    spark.read.parquet(meta_path)
                    .agg(F.sum("n_docs"))
                    .head()[0]
                )
            n_total = prior + n_docs
            scored = tf.join(cum, "term").select(
                F.col("id").alias(id_col),
                "term",
                "tf",
                "dfreq",
                F.round(
                    F.col("tf")
                    * F.log(
                        (F.lit(n_total) + F.lit(1.0))
                        / (F.col("dfreq") + F.lit(1.0))
                    ),
                    6,
                ).alias("tfidf"),
            )
            w = Window.partitionBy(id_col).orderBy(
                F.col("tfidf").desc(), F.col("term").asc()
            )
            _write_by_batch(
                scored.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= k)
                .drop("rn")
                .withColumn("batch_id", F.lit(batch_id)),
                topk_path,
            )
            # meta last: presence == batch fully committed
            _write_by_batch(
                spark.createDataFrame(
                    [(batch_id, n_docs, 0)], _META_SCHEMA
                ),
                meta_path,
            )
        finally:
            tf.unpersist()

    return docs_stream.writeStream.foreachBatch(_process)


def compact_dfreq_log(spark: SparkSession, state_path: str) -> None:
    """Fold the per-batch df deltas into a single base partition
    (``batch_id = -1``) so the cumulative read stays O(vocabulary)
    instead of O(vocabulary × batches).  Run between triggers (the
    fold is associative, so scoring results are unchanged)."""
    dfreq_path = f"{state_path}/dfreq_log"
    base = (
        spark.read.parquet(dfreq_path)
        .groupBy("term")
        .agg(F.sum("df_delta").alias("df_delta"))
        .withColumn("batch_id", F.lit(-1))
        .persist()
    )
    base.count()  # materialize before overwriting the source
    base.write.mode("overwrite").partitionBy("batch_id").parquet(dfreq_path)
    base.unpersist()


def _contiguous_index(
    df: DataFrame, order_cols: list[str], out_col: str = "seq"
) -> tuple[DataFrame, DataFrame]:
    """Delegates to :func:`graphdb_neo4j_spark.operators.order.
    contiguous_index` (lifted there so batch operators share it)."""
    from graphdb_neo4j_spark.operators.order import contiguous_index

    return contiguous_index(df, order_cols, out_col)


def streaming_chunks(
    docs_stream: DataFrame,
    state_path: str,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """``writeStream`` builder: RAG-chunk each micro-batch's documents
    (same semantics as :func:`~graphdb_neo4j_spark.operators.text.
    chunk_documents`) and assign every chunk a global ``seq`` that is
    contiguous and gap-free ACROSS batches and restarts: batch ``b``
    claims ``[sum of earlier batches' chunk counts, +n_b)``, ordered by
    ``(doc_id, chunk_id)`` within the batch.  Output lands in
    ``{state_path}/chunks``; offsets come from the ``{state_path}/meta``
    log, written last for exactly-once replay semantics."""
    meta_path = f"{state_path}/meta"
    chunks_path = f"{state_path}/chunks"

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id in _done_batches(spark, meta_path):
            return
        base = 0
        if _done_batches(spark, meta_path):
            base = (
                spark.read.parquet(meta_path).agg(F.sum("n_chunks")).head()[0]
            )
        chunks = chunk_documents(
            batch_df,
            chunk_tokens=chunk_tokens,
            overlap=overlap,
            id_col=id_col,
            text_col=text_col,
        )
        seqd, handle = _contiguous_index(chunks, [id_col, "chunk_id"])
        seqd = seqd.withColumn("seq", F.col("seq") + F.lit(base))
        try:
            n_chunks = seqd.count()
            _write_by_batch(
                seqd.withColumn("batch_id", F.lit(batch_id)), chunks_path
            )
            _write_by_batch(
                spark.createDataFrame(
                    [(batch_id, 0, n_chunks)], _META_SCHEMA
                ),
                meta_path,
            )
        finally:
            handle.unpersist()

    return docs_stream.writeStream.foreachBatch(_process)

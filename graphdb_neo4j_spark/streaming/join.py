"""Stream-stream joins (Structured Streaming's hardest stateful op).

The reference loads a static graph, but its implied surface (correlate
events across feeds — e.g. a network connection with the process span
that caused it) is a stream-stream correlation at scale.  Structured
Streaming supports it natively IF the query gives the engine the two
things it needs to bound state:

* **watermarks on both inputs** — how late each side can be;
* **an event-time constraint in the join condition** — how far apart
  matching rows can be.

With both, each side's join state is purged once the other side's
watermark passes the constraint window — state is O(key-rate × window),
not O(stream length).  Without them Spark must keep EVERY row forever
(and refuses outer joins outright).

100 TB/day shape: both sides shuffle on the join key once; state lives
in the state store (RocksDB in production) partitioned the same way, so
each micro-batch only touches its own key shards.  Skewed keys behave
like any skewed shuffle — salt the key or raise partitions.

Batch parity: `interval_join` on two STATIC DataFrames produces the
plain join with the same predicate, so stream≡batch equivalence is
testable row-for-row (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join rows of ``right`` to rows of ``left`` with the same ``key``
    where the right event happened in the window
    ``[left_ts - lookback, left_ts]`` (e.g. views that led to a
    purchase).

    Works identically for two streaming inputs (watermarks + the
    event-time constraint bound the state; ``how`` may be ``inner`` or
    ``left_outer`` — outer matches emit once the right watermark passes
    the window) and for two batch inputs (watermark is a no-op there),
    which is what the equivalence test exploits.

    Outer-join caveat: Spark's GLOBAL watermark is the MIN across all
    inputs (``spark.sql.streaming.multipleWatermarkPolicy``), so an
    idle LEFT side also holds back eviction of left outer state — both
    feeds must advance for unmatched rows to emit (see the sentinel
    pattern in tests/test_streaming.py).

    All non-key columns are prefixed to keep the output schema
    unambiguous; the join keeps one ``key`` column.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError("how must be 'inner' or 'left_outer'")

    def prep(df: DataFrame, prefix: str, ts_col: str) -> DataFrame:
        renamed = df.select(
            F.col(key),
            *[
                F.col(c).alias(prefix + c)
                for c in df.columns
                if c != key
            ],
        )
        if renamed.isStreaming:
            renamed = renamed.withWatermark(prefix + ts_col, watermark)
        return renamed

    l = prep(left, left_prefix, left_ts).withColumnRenamed(key, "__lk")
    r = prep(right, right_prefix, right_ts)
    lts, rts = F.col(left_prefix + left_ts), F.col(right_prefix + right_ts)
    cond = (
        (F.col("__lk") == F.col(key))
        & (rts <= lts)
        & (rts >= lts - F.expr(f"INTERVAL {lookback}"))
    )
    out = l.join(r, cond, how)
    return out.drop(key).withColumnRenamed("__lk", key)


def run_interval_join_stream(
    left_src: str,
    right_src: str,
    out_path: str,
    checkpoint: str,
    spark,
    schema: str,
    **join_kwargs,
):
    """Drive `interval_join` over two parquet-directory streams to a
    parquet sink with an availableNow trigger (the test/backfill
    harness; production would use the same code with a continuous
    trigger and RocksDB state store).  Returns the finished query
    handle so callers can read join-state metrics off
    ``streaming.ingest.progress_metrics`` (stream-stream join state IS
    a state operator, so state_rows / late_rows_dropped apply)."""
    l = spark.readStream.schema(schema).parquet(left_src)
    r = spark.readStream.schema(schema).parquet(right_src)
    q = (
        interval_join(l, r, **join_kwargs)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q

"""Streaming burst (debounce) dedup: incremental maintenance of the
batch operator q181 — events separated by ≤ ``gap_us`` within a
(user, event_type) stream chain into one burst; the first event of
each burst is kept, the rest are counted as absorbed duplicates.

Incremental formulation, same contract family as ``streaming/dim.py``:

1. the latest OPEN burst per key (the only one new events can still
   extend — a burst closes the moment a later event arrives more than
   ``gap_us`` after its last member) re-enters the batch window as a
   pseudo-event anchored at the burst's LAST timestamp, carrying its
   running (burst_id, kept_event_id, burst_start_us, n_events);
2. the batch runs q181's exact gap-flag + running-burst-id windows
   over pseudo + real rows; local burst numbers rebase onto the open
   burst id so ids stay globally contiguous per key;
3. bursts that a later burst now follows are CLOSED (appended,
   partitioned by batch_id so replays overwrite their own partition);
   each key's newest burst becomes the new open snapshot; a meta
   marker written LAST makes the batch exactly-once.

Prefix contract: append-ordered per key (a batch never carries an
event older than a previously seen event for the same key) — the
standard event-log assumption, identical to streaming SCD2.  Under it
``bursts_history`` (closed ∪ open) is bit-identical to the q181 batch
rebuild over all data seen, pinned by tests/test_streaming_sketch.py.

100 TB shape: per batch ONE window over (user, type) partitions of
|batch| + |touched keys| rows, a key-level anti-join to carry
untouched open bursts, and an append write — state is one row per
ACTIVE key, never history-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

_OPEN_SCHEMA = (
    "user_id bigint, event_type string, burst_id bigint, "
    "kept_event_id bigint, burst_start_us bigint, n_events bigint, "
    "last_ts_us bigint"
)

DEFAULT_GAP_US = 86_400_000_000  # 24 h — q181's chaining window


def _read_or_none(spark: SparkSession, path: str):
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None


def _done_batches(spark: SparkSession, meta_path: str) -> set[int]:
    meta = _read_or_none(spark, meta_path)
    return (
        {r.batch_id for r in meta.select("batch_id").collect()}
        if meta
        else set()
    )


def latest_open(spark: SparkSession, state_path: str) -> DataFrame | None:
    meta = _read_or_none(spark, f"{state_path}/meta")
    if meta is None or meta.isEmpty():
        return None
    last = meta.agg(F.max("batch_id").alias("b")).head()["b"]
    return (
        spark.read.parquet(f"{state_path}/open")
        .filter(F.col("batch_id") == last)
        .drop("batch_id")
    )


def streaming_debounce(
    events_stream: DataFrame,
    state_path: str,
    gap_us: int = DEFAULT_GAP_US,
):
    """``writeStream`` builder over an events stream with columns
    (user_id, event_type, ts, event_id); read the live burst table
    with :func:`bursts_history`."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id in _done_batches(spark, f"{state_path}/meta"):
            return
        ev = batch_df.select(
            F.col("user_id").cast("bigint").alias("user_id"),
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            F.col("event_id").cast("bigint").alias("event_id"),
            F.lit(0).alias("is_pseudo"),
        )
        prior = latest_open(spark, state_path)
        if prior is None:
            prior = spark.createDataFrame([], _OPEN_SCHEMA)
        keys = ["user_id", "event_type"]
        touched = ev.select(*keys).distinct()
        pt = prior.join(touched, keys, "left_semi")
        rest = prior.join(touched, keys, "left_anti")
        # the open burst re-enters anchored at its LAST event time —
        # chaining is last-member-relative, not head-relative;
        # event_id -1 sorts it before any real event at the same tick
        pseudo = pt.select(
            "user_id",
            "event_type",
            F.col("last_ts_us").alias("ts_us"),
            F.lit(-1).cast("bigint").alias("event_id"),
            F.lit(1).alias("is_pseudo"),
        )
        combined = ev.unionByName(pseudo)
        w = Window.partitionBy(*keys).orderBy("ts_us", "event_id")
        prev = F.lag("ts_us").over(w)
        flagged = combined.withColumn(
            "new_burst",
            F.when(
                prev.isNull() | ((F.col("ts_us") - prev) > gap_us), 1
            ).otherwise(0),
        ).withColumn(
            "local_burst",
            F.sum("new_burst").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        base = pt.select(
            *keys,
            F.col("burst_id").alias("b0"),
            F.col("kept_event_id").alias("k0"),
            F.col("burst_start_us").alias("s0"),
            F.col("n_events").alias("n0"),
        )
        rebased = flagged.join(base, keys, "left").withColumn(
            "burst_id",
            F.when(
                F.col("b0").isNotNull(),
                F.col("b0") + F.col("local_burst") - 1,
            )
            .otherwise(F.col("local_burst"))
            .cast("bigint"),
        )
        real_first = F.min(
            F.when(
                F.col("is_pseudo") == 0,
                F.struct(F.col("ts_us"), F.col("event_id")),
            )
        )
        per_burst = rebased.groupBy(*keys, "burst_id").agg(
            F.max("is_pseudo").alias("has_p"),
            F.sum(1 - F.col("is_pseudo")).cast("bigint").alias("n_real"),
            real_first.alias("fr"),
            F.max("ts_us").alias("last_ts_us"),
            F.first("k0").alias("k0"),
            F.first("s0").alias("s0"),
            F.first("n0").alias("n0"),
        )
        resolved = per_burst.select(
            *keys,
            "burst_id",
            F.when(F.col("has_p") == 1, F.col("k0"))
            .otherwise(F.col("fr.event_id"))
            .cast("bigint")
            .alias("kept_event_id"),
            F.when(F.col("has_p") == 1, F.col("s0"))
            .otherwise(F.col("fr.ts_us"))
            .cast("bigint")
            .alias("burst_start_us"),
            (
                F.col("n_real")
                + F.when(F.col("has_p") == 1, F.col("n0")).otherwise(0)
            )
            .cast("bigint")
            .alias("n_events"),
            "last_ts_us",
            F.max("burst_id")
            .over(Window.partitionBy(*keys))
            .alias("__maxb"),
        )
        closed = resolved.filter(
            F.col("burst_id") < F.col("__maxb")
        ).select(
            *keys,
            "burst_id",
            "kept_event_id",
            "burst_start_us",
            "n_events",
        ).withColumn("batch_id", F.lit(batch_id))
        new_open = resolved.filter(
            F.col("burst_id") == F.col("__maxb")
        ).select(
            *keys,
            "burst_id",
            "kept_event_id",
            "burst_start_us",
            "n_events",
            "last_ts_us",
        )
        open_snapshot = rest.unionByName(new_open).withColumn(
            "batch_id", F.lit(batch_id)
        )
        closed.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(f"{state_path}/closed")
        open_snapshot.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(f"{state_path}/open")
        # meta last: its presence marks the batch fully committed
        spark.createDataFrame([(batch_id,)], "batch_id long").write.mode(
            "append"
        ).parquet(f"{state_path}/meta")

    return events_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", f"{state_path}/_ckpt_debounce"
    )


def bursts_history(spark: SparkSession, state_path: str) -> DataFrame:
    """(user_id, event_type, burst_id, kept_event_id, burst_start_us,
    n_events, n_dropped) — closed log ∪ live open bursts; bit-identical
    to q181's batch rebuild under the append-ordered contract."""
    cols = [
        "user_id",
        "event_type",
        "burst_id",
        "kept_event_id",
        "burst_start_us",
        "n_events",
    ]
    closed = _read_or_none(spark, f"{state_path}/closed")
    open_now = latest_open(spark, state_path)
    parts = []
    if closed is not None:
        parts.append(closed.select(*cols))
    if open_now is not None:
        parts.append(open_now.select(*cols))
    if not parts:
        return spark.createDataFrame(
            [], _OPEN_SCHEMA
        ).select(*cols, (F.col("n_events") - 1).alias("n_dropped"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        "n_dropped", (F.col("n_events") - 1).cast("bigint")
    )

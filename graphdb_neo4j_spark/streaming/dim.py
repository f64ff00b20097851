"""Streaming SCD2: incremental slowly-changing-dimension maintenance.

The batch operator (workloads q61) rebuilds the full validity-interval
history from the whole event log.  This streaming formulation maintains
the SAME history incrementally: per micro-batch it

1. loads the open intervals (one row per user: current state,
   effective_from, version) from the latest snapshot;
2. unions them, as pseudo-events, with the batch's events and runs the
   identical change-detection window (state != previous state, ordered
   by (ts, event_id));
3. appends newly CLOSED intervals to ``{state}/closed`` (partitioned by
   batch_id — replays overwrite their own partition) and writes the new
   open snapshot to ``{state}/open`` keyed by batch_id, with a meta
   marker written last so replays skip committed batches.

Prefix contract: the stream must be append-ordered per user (a batch
never contains events older than a previous batch's for the same user)
— the standard CDC/event-log assumption.  Under it, closed ∪ open is
bit-identical to the batch rebuild over all data seen, which
tests/test_streaming_sketch.py pins.

100 TB shape: per batch, one window over (user) partitions of
|batch| + |touched users| rows, plus a user-keyed anti-join to carry
untouched open rows forward.  The closed log only ever appends; history
reads are a partition-pruned scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

_OPEN_SCHEMA = "user_id bigint, state string, effective_from_us bigint, version bigint"


def _read_or_none(spark: SparkSession, path: str):
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None


def _done_batches(spark: SparkSession, meta_path: str) -> set[int]:
    meta = _read_or_none(spark, meta_path)
    return {r.batch_id for r in meta.select("batch_id").collect()} if meta else set()


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


def streaming_scd2(events_stream: DataFrame, state_path: str):
    """``writeStream`` builder over an events stream with columns
    (user_id, event_type, ts, event_id); read the live history with
    :func:`scd2_history`."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id in _done_batches(spark, f"{state_path}/meta"):
            return
        ev = batch_df.select(
            "user_id",
            F.col("event_type").alias("state"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            F.col("event_id").cast("bigint").alias("event_id"),
        )
        prior = latest_open(spark, state_path)
        if prior is None:
            prior = spark.createDataFrame([], _OPEN_SCHEMA)
        touched = ev.select("user_id").distinct()
        prior_touched = prior.join(touched, "user_id", "left_semi")
        prior_rest = prior.join(touched, "user_id", "left_anti")
        # prior open interval re-enters the window as a pseudo-event
        # carrying its version base; event_id -1 sorts it before any
        # real event at the same timestamp
        pseudo = prior_touched.select(
            "user_id", "state",
            F.col("effective_from_us").alias("ts_us"),
            F.lit(-1).cast("bigint").alias("event_id"),
            F.col("version").alias("v_base"),
        )
        combined = ev.withColumn("v_base", F.lit(None).cast("bigint")).unionByName(
            pseudo
        )
        w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        marked = combined.withColumn("prev_state", F.lag("state").over(w)).withColumn(
            "v0", F.first("v_base").over(w)
        )
        changes = marked.filter(
            F.col("prev_state").isNull() | (F.col("state") != F.col("prev_state"))
        )
        v = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        hist = changes.select(
            "user_id", "state",
            F.col("ts_us").alias("effective_from_us"),
            F.lead("ts_us").over(v).alias("effective_to_us"),
            (F.row_number().over(v) + F.coalesce(F.col("v0") - 1, F.lit(0)))
            .alias("version"),
        )
        closed = hist.filter(F.col("effective_to_us").isNotNull()).withColumn(
            "batch_id", F.lit(batch_id)
        )
        new_open = hist.filter(F.col("effective_to_us").isNull()).select(
            "user_id", "state", "effective_from_us", "version"
        )
        open_snapshot = (
            prior_rest.unionByName(new_open).withColumn("batch_id", F.lit(batch_id))
        )
        for df, sub in ((closed, "closed"), (open_snapshot, "open")):
            (
                df.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(f"{state_path}/{sub}")
            )
        # meta last: its presence marks the batch fully committed
        spark.createDataFrame([(batch_id,)], "batch_id long").write.mode(
            "append"
        ).parquet(f"{state_path}/meta")

    return events_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", f"{state_path}/_ckpt_scd2"
    )


def scd2_history(spark: SparkSession, state_path: str) -> DataFrame:
    """(user_id, state, effective_from_us, effective_to_us, version,
    is_current) — the full dimension history: closed log ∪ live open
    snapshot.  Matches the batch rebuild bit-for-bit under the
    append-ordered contract."""
    open_now = latest_open(spark, state_path)
    closed = _read_or_none(spark, f"{state_path}/closed")
    parts = []
    if closed is not None:
        parts.append(
            closed.select(
                "user_id", "state", "effective_from_us", "effective_to_us", "version"
            )
        )
    if open_now is not None:
        parts.append(
            open_now.select(
                "user_id", "state", "effective_from_us",
                F.lit(None).cast("bigint").alias("effective_to_us"), "version",
            )
        )
    if not parts:
        return spark.createDataFrame(
            [], _OPEN_SCHEMA + ", effective_to_us bigint"
        ).select(
            "user_id", "state", "effective_from_us",
            F.lit(None).cast("bigint").alias("effective_to_us"), "version",
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        "is_current",
        F.when(F.col("effective_to_us").isNull(), 1).otherwise(0).cast("int"),
    )


# ---------------------------------------------------------------------------
# streaming golden record (incremental q180 survivorship)
# ---------------------------------------------------------------------------

_GOLDEN_SCHEMA = (
    "user_id bigint, ls_ts bigint, ls_eid bigint, last_state string, "
    "lp_ts bigint, lp_eid bigint, last_purchase_cents bigint, "
    "lk_ts bigint, lk_eid bigint, last_error_k bigint, "
    "first_seen_us bigint, last_seen_us bigint, n_events bigint"
)


def latest_golden(spark: SparkSession, state_path: str) -> DataFrame | None:
    meta = _read_or_none(spark, f"{state_path}/meta")
    if meta is None or meta.isEmpty():
        return None
    last = meta.agg(F.max("batch_id").alias("b")).head()["b"]
    return (
        spark.read.parquet(f"{state_path}/open")
        .filter(F.col("batch_id") == last)
        .drop("batch_id")
    )


def streaming_golden_record(events_stream: DataFrame, state_path: str):
    """Incremental survivorship (batch operator q180): one golden row
    per user where every field independently keeps its most recent
    non-null value, plus first/last-seen and event counts.

    Unlike SCD2, the merge is a COMMUTATIVE MONOID — each surviving
    field carries its (ts, event_id) decision key, two states merge by
    taking the larger key per field (min for first_seen, sum for
    n_events) — so correctness needs NO append-order contract; batches
    may arrive in any order.  Exactly-once still comes from the
    meta-last committed-batch gate (n_events is a sum, not
    idempotent).

    100 TB shape: per batch one user-keyed aggregate of the batch plus
    a full-outer merge against state on the same key; state is one row
    per user ever seen."""

    def _merge_last(prefix: str, value: str):
        """Pick the (ts, eid, value) triple with the larger (ts, eid)."""
        a_ts, a_eid = f"a.{prefix}_ts", f"a.{prefix}_eid"
        b_ts, b_eid = f"b.{prefix}_ts", f"b.{prefix}_eid"
        take_b = F.expr(
            f"{a_ts} IS NULL OR ({b_ts} IS NOT NULL AND "
            f"(struct({b_ts}, {b_eid}) > struct({a_ts}, {a_eid})))"
        )
        return [
            F.when(take_b, F.col(b_ts)).otherwise(F.col(a_ts)).alias(f"{prefix}_ts"),
            F.when(take_b, F.col(b_eid)).otherwise(F.col(a_eid)).alias(f"{prefix}_eid"),
            F.when(take_b, F.col(f"b.{value}")).otherwise(F.col(f"a.{value}")).alias(value),
        ]

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id in _done_batches(spark, f"{state_path}/meta"):
            return
        ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
        ev = batch_df.select(
            F.col("user_id").cast("bigint").alias("user_id"),
            "event_type",
            ts_us.alias("ts_us"),
            F.col("event_id").cast("bigint").alias("event_id"),
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("bigint"),
            ).alias("purch_cents"),
            F.when(
                F.col("event_type") == "error",
                F.get_json_object("props", "$.k").cast("bigint"),
            ).alias("err_k"),
        )

        def last_of(val_col: str, prefix: str, out: str):
            """max-by (ts, eid) over rows where val is non-null."""
            m = F.max(
                F.when(
                    F.col(val_col).isNotNull(),
                    F.struct(
                        F.col("ts_us").alias("t"),
                        F.col("event_id").alias("e"),
                        F.col(val_col).alias("v"),
                    ),
                )
            )
            return [
                m["t"].alias(f"{prefix}_ts"),
                m["e"].alias(f"{prefix}_eid"),
                m["v"].alias(out),
            ]

        agg = ev.groupBy("user_id").agg(
            *(
                last_of("event_type", "ls", "last_state")
                + last_of("purch_cents", "lp", "last_purchase_cents")
                + last_of("err_k", "lk", "last_error_k")
            ),
            F.min("ts_us").alias("first_seen_us"),
            F.max("ts_us").alias("last_seen_us"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        prior = latest_golden(spark, state_path)
        if prior is None:
            prior = spark.createDataFrame([], _GOLDEN_SCHEMA)
        merged = prior.alias("a").join(
            agg.alias("b"), "user_id", "full_outer"
        ).select(
            "user_id",
            *_merge_last("ls", "last_state"),
            *_merge_last("lp", "last_purchase_cents"),
            *_merge_last("lk", "last_error_k"),
            F.coalesce(
                F.least(F.col("a.first_seen_us"), F.col("b.first_seen_us")),
                F.col("a.first_seen_us"),
                F.col("b.first_seen_us"),
            ).alias("first_seen_us"),
            F.coalesce(
                F.greatest(F.col("a.last_seen_us"), F.col("b.last_seen_us")),
                F.col("a.last_seen_us"),
                F.col("b.last_seen_us"),
            ).alias("last_seen_us"),
            (
                F.coalesce(F.col("a.n_events"), F.lit(0))
                + F.coalesce(F.col("b.n_events"), F.lit(0))
            ).cast("bigint").alias("n_events"),
        )
        merged.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            "batch_id"
        ).parquet(f"{state_path}/open")
        spark.createDataFrame([(batch_id,)], "batch_id long").write.mode(
            "append"
        ).parquet(f"{state_path}/meta")

    return events_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", f"{state_path}/_ckpt_golden"
    )


def golden_history(spark: SparkSession, state_path: str) -> DataFrame:
    """(user_id, last_state, last_purchase_cents, last_error_k,
    first_seen_us, last_seen_us, n_events) — bit-identical to q180's
    batch build over all events seen, in any arrival order."""
    cur = latest_golden(spark, state_path)
    if cur is None:
        cur = spark.createDataFrame([], _GOLDEN_SCHEMA)
    return cur.select(
        "user_id", "last_state", "last_purchase_cents", "last_error_k",
        "first_seen_us", "last_seen_us", "n_events",
    )

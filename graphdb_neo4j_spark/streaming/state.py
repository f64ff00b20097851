"""Spark-4-native arbitrary stateful streaming: ``transformWithState``.

Two generations of custom stateful operators coexist in Spark:

* ``applyInPandasWithState`` — the 3.x-era API the engine already uses
  for the span tracker (streaming/ingest.py:stateful_process_tracker);
* ``transformWithStateInPandas`` — the Spark 4 successor built on the
  StatefulProcessor handle: typed composite state (value/list/map),
  timers, and per-state TTL, backed by the RocksDB state store.

This module holds the v2-API operators so a user of either generation
finds their surface here.  ``transformWithState`` REQUIRES the RocksDB
state-store provider; :func:`ensure_rocksdb_state_store` flips the
session conf (safe to call repeatedly — it only affects queries started
afterwards).

Runtime dependency: the transformWithState Python worker speaks
protobuf to the JVM (``google.protobuf``).  Environments without it
(like this build container) can import this module and plan queries,
but starting the stream raises
STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE — the equivalence test
in tests/test_streaming.py skips itself in that case, and
``applyInPandasWithState`` (streaming/ingest.py) remains the
fully-exercised stateful path.

100 TB notes: state lives per grouping key in RocksDB per partition —
the shuffle is the same hash-on-key exchange a groupBy costs, state
size is O(distinct keys × state schema), and changelog checkpointing
(`spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled`)
keeps commit cost proportional to the per-batch delta, not the full
store.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def ensure_rocksdb_state_store(spark: SparkSession) -> None:
    """transformWithState supports only the RocksDB state store."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)


class _RunningTotals(StatefulProcessor):
    """Per-key running (count, exact integer-cent sum) value state."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n BIGINT, total_cents BIGINT"
        )

    def handleInputRows(self, key, rows, timer_values):
        n, tot = self._totals.get() if self._totals.exists() else (0, 0)
        for pdf in rows:
            n += len(pdf)
            tot += int(pdf["value_cents"].sum())
        self._totals.update((int(n), int(tot)))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_events": [int(n)],
                "total_cents": [int(tot)],
            }
        )

    def close(self) -> None:
        pass


def streaming_user_totals(events_stream: DataFrame) -> DataFrame:
    """Running per-user event count + EXACT integer-cent value total via
    ``transformWithStateInPandas`` (update mode: one row per key per
    micro-batch it appears in).

    The cent cast happens BEFORE the stateful op so state arithmetic is
    pure bigint — restart-safe and bit-identical to the batch
    ``groupBy(user_id).agg(count, sum(cents))`` (pinned in
    tests/test_streaming.py).
    """
    ensure_rocksdb_state_store(events_stream.sparkSession)
    rows = events_stream.select(
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("value_cents"),
    )
    return rows.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType="user_id BIGINT, n_events BIGINT, total_cents BIGINT",
        outputMode="Update",
        timeMode="None",
    )

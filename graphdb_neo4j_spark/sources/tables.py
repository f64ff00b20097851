"""Relational parquet tables (driver-generated TPC-H-ish star schema).

See TESTDATA.md: tables live at ``{sf_dir}/{name}.parquet``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def ensure_session_confs(spark: SparkSession) -> None:
    """Make an externally-created SparkSession (e.g. the driver's) safe
    for this engine: nanos parquet reads, UTC timestamp semantics, and
    last-wins map keys are all runtime-settable SQL confs."""
    for key, value in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.mapKeyDedupPolicy", "LAST_WIN"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.optimizer.runtime.bloomFilter.enabled", "true"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # read-only in this deployment — keep going


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Normalize ts to a session-UTC TIMESTAMP regardless of how the
        # generator wrote it: TIMESTAMP(NANOS) parquet arrives as long ns
        # (nanosAsLong conf) and needs exact integer division (a double
        # division would lose precision on 1e18-scale epochs), while
        # timestamp[us] parquet arrives as TIMESTAMP_NTZ and just needs a
        # cast (session tz is UTC, so the wall-clock value is unchanged).
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif not isinstance(ts_type, T.TimestampType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view so ``spark.sql`` works too."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables

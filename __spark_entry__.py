"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship multi-join revenue query at sf0.001;
``queries``/``oracle_sql`` expose the full workload portfolio from
``graphdb_neo4j_spark.workloads`` (relational core, window/session
analytics, dedup / similarity / text operators, and rows-only
provenance-graph analytics over the reference corpus).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from graphdb_neo4j_spark.workloads import ORACLES, QUERY_FNS


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERY_FNS["q05_region_nation_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERY_FNS)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)

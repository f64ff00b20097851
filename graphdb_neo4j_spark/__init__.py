"""graphdb_neo4j_spark — a PySpark-native provenance-graph analytics engine.

Re-implements, Spark-first, the capabilities of the reference
``SDEV3-ENKI-TEAM/GraphDB_Neo4j`` ingester (Jaeger/Sysmon trace JSON →
property graph) plus the implied Cypher query surface (lookup, motif,
k-hop traversal, aggregation, graph analytics) and large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal plumbing).

Layout:
  sources/    — trace-JSON reader, relational parquet tables
  functions/  — scalar ETL expressions (all JVM-side, no Python UDFs)
  operators/  — graph build (ingest), query layer, traversal/analytics,
                dedup, similarity, text, multimodal
  streaming/  — Structured Streaming incremental ingest
  plans/      — plan inspection / optimization helpers
"""

from graphdb_neo4j_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"

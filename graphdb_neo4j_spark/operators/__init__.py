from graphdb_neo4j_spark.operators.ingest import PropertyGraph, build_graph

__all__ = ["PropertyGraph", "build_graph"]

"""Incremental graph analytics over an edge stream.

``streaming_connected_components`` maintains a connected-components
assignment as edges arrive, without ever re-running components over the
full accumulated graph: per micro-batch the new edges are CONTRACTED
onto the current assignment (each endpoint replaced by its component
id), components run on that contracted graph only — work proportional
to the batch and the components it touches, not to history — and the
state snapshot is rewritten through the component-id merge mapping.
Component ids are min vertex ids, so the incremental result is
bit-identical to batch :func:`~graphdb_neo4j_spark.operators.traversal.
connected_components` over the union of all edges (the test gate).

State layout follows the exactly-once snapshot pattern of
``streaming/dim.py``: per-batch ``comp`` snapshot partitions (replays
overwrite their own partition), a ``meta`` marker written last, and GC
of superseded snapshots.  At 100 TB the full-snapshot rewrite is the
one non-incremental step — shard the state by hash(v) and rewrite only
shards containing touched components (the mapping join prunes them);
the contraction step is already batch-proportional.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_connected_components(
    edges_stream: DataFrame,
    state_path: str,
    src_col: str = "src",
    dst_col: str = "dst",
):
    """``writeStream`` builder: incremental connected components.

    ``edges_stream`` needs ``src_col``/``dst_col`` (undirected).
    Read the live assignment with :func:`components_state`.
    """
    from graphdb_neo4j_spark.operators.traversal import connected_components
    from graphdb_neo4j_spark.streaming.dim import _done_batches, _read_or_none

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id in _done_batches(spark, f"{state_path}/meta"):
            return
        meta = _read_or_none(spark, f"{state_path}/meta")
        prior = None
        if meta is not None and not meta.isEmpty():
            last = meta.agg(F.max("batch_id")).head()[0]
            prior = (
                spark.read.parquet(f"{state_path}/comp")
                .filter(F.col("batch_id") == last)
                .drop("batch_id")
            )
        e = (
            batch_df.select(
                F.col(src_col).cast("string").alias("src"),
                F.col(dst_col).cast("string").alias("dst"),
            )
            .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
            .distinct()
            .localCheckpoint()
        )
        if prior is None:
            prior = spark.createDataFrame([], "v string, component string")
        # contract: endpoint -> its current component (or itself if new)
        ps = prior.select(F.col("v").alias("src"), F.col("component").alias("cs"))
        pd_ = prior.select(F.col("v").alias("dst"), F.col("component").alias("cd"))
        contracted = (
            e.join(ps, "src", "left")
            .join(pd_, "dst", "left")
            .select(
                F.coalesce(F.col("cs"), F.col("src")).alias("src"),
                F.coalesce(F.col("cd"), F.col("dst")).alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        cnodes = (
            contracted.select(F.col("src").alias("key"))
            .unionByName(contracted.select(F.col("dst").alias("key")))
            .unionByName(e.select(F.col("src").alias("key")))
            .unionByName(e.select(F.col("dst").alias("key")))
            .distinct()
        )
        # components over the CONTRACTED graph — batch-proportional.
        # component ids are min member ids; since prior component ids
        # are min vertex ids of their sets, the merged min is the
        # global min vertex — batch-equivalent by induction.
        merged = connected_components(cnodes, contracted).localCheckpoint()
        mapping = merged.select(
            F.col("key").alias("component"), F.col("component").alias("m")
        )
        updated_old = (
            prior.join(mapping, "component", "left")
            .select(
                "v", F.coalesce(F.col("m"), F.col("component")).alias("component")
            )
        )
        known = prior.select("v")
        new_vertices = (
            e.select(F.col("src").alias("v"))
            .unionByName(e.select(F.col("dst").alias("v")))
            .distinct()
            .join(known, "v", "left_anti")
            .join(
                merged.select(F.col("key").alias("v"), F.col("component")),
                "v",
                "left",
            )
            # a brand-new vertex always appears in the contracted graph
            # under its own id; coalesce is belt-and-braces
            .select("v", F.coalesce(F.col("component"), F.col("v")).alias("component"))
        )
        snapshot = updated_old.unionByName(new_vertices)
        (
            snapshot.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{state_path}/comp")
        )
        spark.createDataFrame([(batch_id,)], "batch_id long").write.mode(
            "append"
        ).parquet(f"{state_path}/meta")
        # GC superseded snapshots (only the latest is read)
        from graphdb_neo4j_spark.streaming.sketch import _hadoop_path

        fs, root = _hadoop_path(spark, f"{state_path}/comp")
        if fs.exists(root):
            for st in fs.listStatus(root):
                name = st.getPath().getName()
                if name.startswith("batch_id=") and name.split("=")[1].isdigit():
                    if int(name.split("=")[1]) < batch_id:
                        fs.delete(st.getPath(), True)

    return edges_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", f"{state_path}/_ckpt_cc"
    )


def components_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Latest (v, component) assignment across all processed batches."""
    from graphdb_neo4j_spark.streaming.dim import _read_or_none

    meta = _read_or_none(spark, f"{state_path}/meta")
    if meta is None or meta.isEmpty():
        return spark.createDataFrame([], "v string, component string")
    last = meta.agg(F.max("batch_id")).head()[0]
    return (
        spark.read.parquet(f"{state_path}/comp")
        .filter(F.col("batch_id") == last)
        .drop("batch_id")
    )

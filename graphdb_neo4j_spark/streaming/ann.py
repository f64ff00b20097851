"""Streaming ANN: probe a materialized LSH index with a stream of
query vectors.

Two formulations, matching the two ways a 100 TB deployment runs this:

* :func:`streaming_ann_candidates` — declarative stream-static
  equi-join on (lsh_table, bucket).  The stream side computes its
  bucket signatures per-row with the SAME fixed-point arithmetic the
  index writer used (bit-identical, so a query always lands in its own
  vector's bucket).  Append-mode safe.  At scale the static index side
  should be cached cluster-wide (or a storage layer with dynamic
  partition pruning); Spark cannot prune index partitions per
  micro-batch for data-dependent keys, so the uncached join degrades
  to an index scan per batch.
* :func:`streaming_ann_topk` — ``foreachBatch``: each micro-batch's
  queries (the small side by construction — a batch of query vectors,
  not the corpus) drive individually partition-PRUNED reads of the
  index via :func:`~graphdb_neo4j_spark.operators.similarity.
  topk_lsh_indexed`, then exact top-k per query.  This is the
  sub-linear-read production pattern; the per-batch ``collect()`` is
  of query vectors only, never index rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators.similarity import (
    QUANT,
    _plane_sign,
    cosine_expr,
    topk_lsh_indexed,
)


def _rowwise_table_sig(
    vec: Column, table: int, dims: int, planes: int, seed: int
) -> Column:
    """Per-row bucket signature of LSH table ``table`` — the same
    fixed-point projection (floor(x·2²⁰) times a ±1 plane matrix,
    summed in int64) as the index writer's ``hyperplane_bits``, as a
    pure row expression so it runs inside a streaming plan (no agg).
    Integer addition is associative, so this left fold equals the hash
    aggregate bit-for-bit."""
    bits = []
    for p in range(table * planes, (table + 1) * planes):
        signs = F.array(
            *[F.lit(int(_plane_sign(seed, p, d))) for d in range(dims)]
        )
        proj = F.aggregate(
            F.zip_with(
                vec,
                signs,
                lambda x, s: F.floor(x.cast("double") * F.lit(float(QUANT))).cast(
                    "long"
                )
                * s,
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def streaming_ann_candidates(
    queries: DataFrame,
    index: DataFrame,
    dims: int = 64,
    planes: int = 6,
    tables: int = 4,
    seed: int = 42,
    id_col: str = "query_id",
    vec_col: str = "qv",
) -> DataFrame:
    """Candidate matches ``(query_id, match_id, sim)`` for a stream (or
    batch — the plan is the same) of query vectors against a static
    :func:`lsh_index_write` index DataFrame.

    A candidate appears once per LSH table whose bucket it shares with
    the query (identical ``sim`` each time); the downstream consumer —
    or :func:`streaming_ann_topk` — dedups and ranks, because arbitrary
    per-key top-k aggregation on an unbounded append stream would need
    update-mode state.
    """
    probe = queries.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("lsh_table"),
                        _rowwise_table_sig(
                            F.col(vec_col), t, dims, planes, seed
                        ).alias("bucket"),
                    )
                    for t in range(tables)
                ]
            )
        ).alias("tb"),
    ).select(
        id_col,
        vec_col,
        F.col("tb.lsh_table").alias("lsh_table"),
        F.col("tb.bucket").alias("bucket"),
    )
    cand = probe.join(index, ["lsh_table", "bucket"])
    sim = F.round(cosine_expr(F.col("v"), F.col(vec_col)), 6)
    return cand.select(
        F.col(id_col), F.col("id").alias("match_id"), sim.alias("sim")
    )


def streaming_ann_topk(
    queries_stream: DataFrame,
    index_path: str,
    out_path: str,
    k: int = 10,
    dims: int = 64,
    planes: int = 6,
    tables: int = 4,
    seed: int = 42,
    id_col: str = "query_id",
    vec_col: str = "qv",
):
    """``writeStream`` builder: per micro-batch, answer each query with
    an exact top-k over partition-pruned index bucket reads, appended
    to ``out_path`` as ``(query_id, id, sim)`` parquet."""

    def _probe(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        rows = batch_df.select(id_col, vec_col).collect()  # queries only
        outs = []
        for r in rows:
            tk = topk_lsh_indexed(
                spark,
                index_path,
                [float(x) for x in r[vec_col]],
                k=k,
                dims=dims,
                planes=planes,
                tables=tables,
                seed=seed,
            )
            outs.append(
                tk.select(
                    F.lit(r[id_col]).alias("query_id"), "id", "sim"
                )
            )
        if outs:
            reduce(lambda a, b: a.unionByName(b), outs).write.mode(
                "append"
            ).parquet(out_path)

    return queries_stream.writeStream.foreachBatch(_probe)

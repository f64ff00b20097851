"""File-layout operators — Z-order clustering for data-skipping writes.

Parquet readers skip row groups whose min/max stats exclude the
predicate.  That only pays off if the writer *clustered* the data so
each file covers a narrow range of the filter columns.  Sorting by one
column nails that column and destroys the others; Z-ordering (Morton
curve) interleaves the bits of several columns' quantile ranks so every
file is tight on ALL of them — the Delta OPTIMIZE ZORDER trick, here as
a plain DataFrame transformation.

Scale shape: quantile boundaries come from ``approxQuantile`` (one
pass, driver gets ~2^bits numbers); rank + interleave are pure
map-side expressions; the final ``repartitionByRange(morton)`` is the
single shuffle any clustered write needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_expr(col: Column, bounds: list[float]) -> Column:
    """Quantile-rank ``col`` into ``len(bounds)+1`` buckets via a fold
    over the literal boundary array (≈ a branchless binary search)."""
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(col.cast("double") >= b, 1).otherwise(0),
    )


def morton_code(df: DataFrame, cols: list[str], bits: int = 8) -> Column:
    """Interleaved-bit Morton code over the quantile ranks of ``cols``.

    ``bits`` bits per column; supports numeric and (via md5-rank)
    string columns.  The result is a bigint suitable for range
    partitioning + within-partition sort.
    """
    n_buckets = (1 << bits) - 1
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    rank_exprs: list[Column] = []
    for c in cols:
        dtype = dict(df.dtypes)[c]
        if dtype in ("string",):
            # hash strings to a stable numeric proxy, then quantile it
            proxy = F.conv(F.substring(F.md5(F.col(c)), 1, 15), 16, 10).cast("double")
            proxy_col = f"__zp_{c}"
            df_p = df.withColumn(proxy_col, proxy)
            bounds = df_p.approxQuantile(proxy_col, probs, 0.01)
            rank_exprs.append(_bucket_expr(proxy, bounds))
        else:
            bounds = df.approxQuantile(c, probs, 0.01)
            rank_exprs.append(_bucket_expr(F.col(c), bounds))

    code = F.lit(0).cast("long")
    for bit in range(bits):
        for ci, r in enumerate(rank_exprs):
            bitval = F.shiftright(r, bit).bitwiseAND(F.lit(1)).cast("long")
            code = code + F.shiftleft(bitval, bit * len(cols) + ci)
    return code


def zorder_repartition(
    df: DataFrame, cols: list[str], n_files: int = 32, bits: int = 8
) -> DataFrame:
    """Cluster ``df`` on the Z-curve of ``cols``: range-partition by
    Morton code (→ one output file per range) and sort within
    partitions.  Write the result with ``.write.parquet`` and every
    file carries tight min/max stats on ALL of ``cols``."""
    coded = df.withColumn("__z", morton_code(df, cols, bits))
    return (
        coded.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def write_sharded(
    df: DataFrame,
    path: str,
    shard_col: str,
    n_shards: int,
    max_records_per_file: int | None = None,
    sort_within: list[str] | None = None,
) -> None:
    """Deterministic sharded parquet export — the training-data hand-off
    layout: ``shard=K/part-*.parquet`` with K = a *content-stable* hash
    of ``shard_col`` mod ``n_shards``.

    Properties a downstream trainer relies on, all pinned in tests:

    * **deterministic placement** — a row's shard depends only on its
      key (md5 mod n, not Spark's seed-able hash or partition index),
      so re-exports and incremental appends land rows identically;
    * **bounded files** — ``maxRecordsPerFile`` splits oversized
      shards so no single reader/loader gets a multi-GB file;
    * **intra-file order** — ``sort_within`` gives each file sorted
      runs (sequence packing and dedup both like sorted shards);
    * **one shuffle** — repartition on the shard id, then a pure write.

    At 100 TB: n_shards scales with the cluster (e.g. 10k), the
    md5-mod distribution is uniform in the key count, and hot keys
    can't skew placement more than their true row share.
    """
    shard = (
        F.conv(F.substring(F.md5(F.col(shard_col).cast("string")), 1, 15), 16, 10)
        .cast("bigint") % n_shards
    ).alias("shard")
    out = df.select("*", shard).repartition(n_shards, F.col("shard"))
    if sort_within:
        out = out.sortWithinPartitions("shard", *sort_within)
    writer = out.write.mode("overwrite").partitionBy("shard")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)

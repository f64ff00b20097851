"""Z-order layout: each output file must be tight on BOTH columns."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators.layout import zorder_repartition


def _avg_file_coverage(spark, files: list[str], col: str, global_range: float) -> float:
    """Mean fraction of the global value range covered per file."""
    spans = []
    for f in files:
        r = spark.read.parquet(f).agg(
            F.min(col).alias("lo"), F.max(col).alias("hi")
        ).collect()[0]
        spans.append((r.hi - r.lo) / global_range)
    return sum(spans) / len(spans)


def test_zorder_tightens_both_columns(spark, tmp_path):
    l = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    n_files = 16
    zout = str(tmp_path / "z")
    zorder_repartition(l, ["l_orderkey", "l_partkey"], n_files=n_files).write.parquet(zout)
    sout = str(tmp_path / "s")
    # baseline: single-column sort (perfect on orderkey, random on partkey)
    l.repartitionByRange(n_files, "l_orderkey").sortWithinPartitions(
        "l_orderkey"
    ).write.parquet(sout)

    zfiles = sorted(glob.glob(f"{zout}/part-*.parquet"))
    sfiles = sorted(glob.glob(f"{sout}/part-*.parquet"))
    assert len(zfiles) >= n_files - 2

    g = l.agg(
        (F.max("l_orderkey") - F.min("l_orderkey")).alias("ro"),
        (F.max("l_partkey") - F.min("l_partkey")).alias("rp"),
    ).collect()[0]

    z_part = _avg_file_coverage(spark, zfiles, "l_partkey", g.rp)
    s_part = _avg_file_coverage(spark, sfiles, "l_partkey", g.rp)
    z_order = _avg_file_coverage(spark, zfiles, "l_orderkey", g.ro)

    # single-column sort leaves partkey files covering ~100% of the range;
    # z-order must be substantially tighter on partkey while staying
    # far better than unclustered on orderkey
    assert z_part < 0.7 * s_part, (z_part, s_part)
    assert z_order < 0.7, z_order


def test_zorder_preserves_rows(spark, tmp_path):
    l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = zorder_repartition(l, ["l_orderkey", "l_suppkey"], n_files=4)
    assert out.count() == l.count()
    assert set(out.columns) == set(l.columns)

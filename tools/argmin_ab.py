"""Reproduce the r10 first-seen-picker A/B: per-key row_number window
vs order.group_argmin on a skewed synthetic batch (8M rows, ONE
canonical URL holding 80% of the duplicates — the hub-link shape the
crawl frontier's in-batch picker hits at 10⁷-page batches; r9
verdict's one `weak`).

The window serializes the hub canon's rows into one task AND shuffles
every row; the argmin is a map-side-combinable min_by aggregation —
each task forwards at most one candidate per canon it touches, so the
shuffle carries O(canons), not O(rows).

Interleaved A/B x 3 over an identical checkpointed input.  Run on an
idle box: python tools/argmin_ab.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from graphdb_neo4j_spark import get_spark
    from graphdb_neo4j_spark.operators.order import group_argmin

    spark = get_spark("argmin-ab")
    spark.sparkContext.setLogLevel("ERROR")
    n = 8_000_000
    df = (
        spark.range(n)
        .select(
            F.when(F.col("id") % 5 < 4, F.lit("http://hub.example/"))
            .otherwise(
                F.concat(
                    F.lit("http://t/"), (F.col("id") % 500_000).cast("string")
                )
            )
            .alias("canon"),
            F.concat(
                F.lit("http://raw/"), F.md5(F.col("id").cast("string"))
            ).alias("url"),
            (F.col("id") % 86_400).cast("timestamp").alias("ts"),
        )
        .repartition(32)
        .localCheckpoint()  # freeze input: both sides read identical data
    )

    def window_path() -> None:
        w = Window.partitionBy("canon").orderBy("ts", "url")
        (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .agg(F.count("*"), F.max("url"))
            .collect()
        )

    def argmin_path() -> None:
        group_argmin(df, ["canon"], ["ts", "url"]).agg(
            F.count("*"), F.max("url")
        ).collect()

    for i in range(3):
        t0 = time.perf_counter()
        window_path()
        wa = time.perf_counter() - t0
        t0 = time.perf_counter()
        argmin_path()
        ga = time.perf_counter() - t0
        print(
            f"interleaved round {i}: window={wa:.2f}s argmin={ga:.2f}s",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Reproduce the r9 de-skew A/B: per-host row_number window vs
order.group_contiguous_index on a skewed synthetic frontier (8M rows,
ONE host holding 80% — the mega-site shape politeness scheduling hits
at crawl scale).

Interleaved A/B x 3 over an identical checkpointed input; r9 marks on
local[32]: window 30.7/25.8/24.6s vs group index 7.6/4.6/4.6s (~5.4x
steady-state) — the window serializes the mega-host's 6.4M rows into
one task, the group index spreads them across range slices.

Run on an idle box: python tools/deskew_ab.py
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
    from graphdb_neo4j_spark.operators.order import group_contiguous_index

    spark = get_spark("deskew-ab")
    spark.sparkContext.setLogLevel("ERROR")
    n = 8_000_000
    df = (
        spark.range(n)
        .select(
            F.when(F.col("id") % 5 < 4, F.lit("mega.example"))
            .otherwise(
                F.concat(F.lit("h"), (F.col("id") % 5000).cast("string"))
            )
            .alias("host"),
            F.concat(
                F.lit("http://x/"), F.md5(F.col("id").cast("string"))
            ).alias("url"),
        )
        .repartition(32)
        .localCheckpoint()  # freeze input: both sides read identical data
    )

    def window_path() -> None:
        w = Window.partitionBy("host").orderBy("url")
        df.withColumn("slot", F.row_number().over(w) - 1).select(
            F.max("slot")
        ).collect()

    def group_index_path() -> None:
        out, handle = group_contiguous_index(
            df, ["host"], ["url"], out_col="slot"
        )
        out.select(F.max("slot")).collect()
        handle.release()

    for i in range(3):
        t0 = time.perf_counter()
        window_path()
        wa = time.perf_counter() - t0
        t0 = time.perf_counter()
        group_index_path()
        ga = time.perf_counter() - t0
        print(
            f"interleaved round {i}: window={wa:.2f}s "
            f"group_index={ga:.2f}s",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

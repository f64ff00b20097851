"""Sliding-window distinct-user engagement over an event stream — the
streaming twin of the batch q127 workload.

Structured Streaming forbids COUNT(DISTINCT) in a streaming aggregate,
so distinctness is staged the canonical way: expand each event to its
size/slide sliding windows, ``dropDuplicates`` on (window, user) under
the watermark (bounded state — duplicates arriving later than the
delay are already impossible because their window is closed), then a
plain windowed count.  Chained stateful operators in append mode —
supported since Spark 3.5 with watermark propagation; each stage's
state is bounded by the watermark horizon.

The transformation is input-agnostic: applied to a BATCH DataFrame it
computes the exact same result (that equivalence is the test gate, and
the batch side equals q127's ``n_users`` column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sliding_user_engagement(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide_duration: str = "15 minutes",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """(ws_epoch, n_users) — distinct users per sliding window.

    Streaming input must carry an event-time column ``ts_col``; the
    watermark bounds both the dedup state and the window state.  At
    100 TB/day the expansion factor is size/slide (4 here) and the
    dedup state holds one row per (window, user) inside the horizon —
    for wide ratios or huge user sets, switch to the per-window HLL
    sketch path (streaming/sketch.py) and trade exactness for O(1)
    state per window.
    """
    win = F.window(F.col(ts_col), window_duration, slide_duration)
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark_delay)
    per_user = src.select(win.alias("w"), F.col(ts_col), F.col(user_col)).dropDuplicates(
        ["w", user_col]
    )
    return (
        per_user.groupBy("w")
        .agg(F.count("*").alias("n_users"))
        .select(F.unix_timestamp("w.start").alias("ws_epoch"), "n_users")
    )

"""Skew-handling operators — salting for hot keys.

AQE's skew-join splitting (on in `session.py`) handles most skew at the
sort-merge-join level, but aggregations and joins against a *replicable*
small side sometimes need explicit salting.  These helpers make the
pattern first-class:

* :func:`salted_join` — left side's hot keys get a random-ish salt in
  ``[0, salt)``; the right side is exploded ``salt`` ways so every
  salted key still matches.  Right side grows ×salt — use when right is
  small-to-medium and the left's key distribution is pathological.
* :func:`two_phase_agg` — partial aggregation under a salted key, then
  final aggregation on the true key: turns one giant reducer into
  ``salt`` medium ones.  Only valid for algebraic aggregates (sum,
  count, min, max — things with a merge step).

Salting uses a hash of the whole row (deterministic given the data),
not ``rand()`` — keeps runs reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, salt: int) -> Column:
    cols = [F.col(c) for c in df.columns]
    return F.pmod(F.xxhash64(*cols), F.lit(salt))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the left side salted ``salt`` ways and
    the right side replicated to match.  Output columns = left ∪ right
    (minus the duplicate key), like a plain ``join(on=...)``."""
    l_salted = left.withColumn("__salt", _salt_col(left, salt))
    r_replicated = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l_salted.join(r_replicated, [on, "__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Skew-safe aggregation: ``aggs`` maps output name → (src column,
    fn) with fn ∈ {sum, count, min, max}.

    Phase 1 aggregates on (key, salt) — map-side combine already helps,
    but the *reduce* side is also split ``salt`` ways, so one hot key
    can't pin a single reducer.  Phase 2 merges partials by key.
    """
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_exprs = []
    for out_name, (src, fn) in aggs.items():
        if fn == "count":
            phase1_exprs.append(F.count(src).alias(f"__p_{out_name}"))
        elif fn in ("sum", "min", "max"):
            phase1_exprs.append(getattr(F, fn)(src).alias(f"__p_{out_name}"))
        else:
            raise ValueError(f"non-algebraic aggregate: {fn}")
    partial = (
        df.withColumn("__salt", _salt_col(df, salt))
        .groupBy(key, "__salt")
        .agg(*phase1_exprs)
    )
    final_exprs = [
        mergers[fn](f"__p_{out_name}").alias(out_name)
        for out_name, (src, fn) in aggs.items()
    ]
    return partial.groupBy(key).agg(*final_exprs)


def skew_report(df, key: str, top: int = 10):
    """(key, cnt, share, cum_share) for the ``top`` heaviest keys plus
    summary columns (n_rows, n_keys) — the pre-flight skew diagnostic
    you run before joining/grouping 100 TB on ``key``.

    share = key count / total rows; a single key above ~1/shuffle-
    partitions predicts a straggler task and calls for
    :func:`salted_join` / :func:`two_phase_agg` or AQE skew handling.
    One grouped count + a tiny top-k — safe to run on the full input.
    """
    from pyspark.sql import Window

    counts = df.groupBy(key).agg(F.count("*").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("n_rows"), F.count("*").alias("n_keys")
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col(key)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    topk = (
        counts.orderBy(F.col("cnt").desc(), F.col(key))
        .limit(top)
        .crossJoin(F.broadcast(totals))
        .select(
            key,
            "cnt",
            F.round(F.col("cnt") / F.col("n_rows"), 6).alias("share"),
            F.round(F.sum("cnt").over(w) / F.col("n_rows"), 6).alias("cum_share"),
            "n_rows",
            "n_keys",
        )
    )
    return topk

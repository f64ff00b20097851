"""Declarative data-quality audit — expectation checks compiled to
one aggregate per table plus one anti-join per foreign key.

The training-data pipeline's admission gate: before a 100 TB drop
enters dedup/mixing, assert the contract — null rates, key uniqueness,
value ranges, set membership, referential integrity — and get ONE
small violations report back, not a failed job three stages later.

Check kinds (each a row in the report):

* ``not_null(col)``            — rows with NULL col
* ``unique(cols)``             — rows beyond the first per duplicate key
* ``accepted_values(col, vs)`` — rows whose col is outside ``vs``
  (NULLs are not violations — pair with ``not_null`` to forbid them)
* ``in_range(col, lo, hi)``    — rows outside [lo, hi] (NULL-safe)
* ``matches(col, regexp)``     — non-NULL rows not fully matching
* ``foreign_key(cols → parent)`` — child rows whose key has no parent
  (NULL keys skip, standard SQL FK semantics)

100 TB shape: every row-predicate check folds into a SINGLE
conditional-sum aggregate over one scan of the table (column-pruned to
just the checked columns); ``unique`` adds one hash-agg on its key
(map-side partial); each FK is one left-anti join that AQE broadcasts
when the parent is small.  The report is O(#checks) rows — nothing
data-proportional leaves the executors.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    kind: str
    name: str
    # predicate checks: a Column that is True on VIOLATING rows
    violation: Column | None = None
    # unique checks
    key_cols: list[str] | None = None
    # fk checks
    parent: DataFrame | None = None
    parent_cols: list[str] | None = None


def not_null(col: str) -> Check:
    return Check("predicate", f"not_null:{col}", violation=F.col(col).isNull())


def in_range(col: str, lo, hi) -> Check:
    c = F.col(col)
    return Check(
        "predicate",
        f"in_range:{col}",
        violation=c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))),
    )


def accepted_values(col: str, values: list) -> Check:
    c = F.col(col)
    return Check(
        "predicate",
        f"accepted_values:{col}",
        violation=c.isNotNull() & ~c.isin(values),
    )


def matches(col: str, regexp: str) -> Check:
    c = F.col(col)
    return Check(
        "predicate",
        f"matches:{col}",
        violation=c.isNotNull() & ~c.rlike(regexp),
    )


def unique(*cols: str) -> Check:
    return Check("unique", "unique:" + ",".join(cols), key_cols=list(cols))


def foreign_key(cols: list[str], parent: DataFrame, parent_cols: list[str]) -> Check:
    return Check(
        "fk",
        "foreign_key:" + ",".join(cols),
        key_cols=cols,
        parent=parent,
        parent_cols=parent_cols,
    )


def audit(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run every check; returns ``(check, violations)`` — one bigint
    row per check, zero rows moved to the driver."""
    parts: list[DataFrame] = []

    preds = [c for c in checks if c.kind == "predicate"]
    if preds:
        agg = df.agg(
            *[
                F.sum(F.when(c.violation, 1).otherwise(0))
                .cast("bigint")
                .alias(f"v{i}")
                for i, c in enumerate(preds)
            ]
        )
        stacked = agg.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c.name).alias("check"),
                            F.col(f"v{i}").alias("violations"),
                        )
                        for i, c in enumerate(preds)
                    ]
                )
            ).alias("r")
        ).select("r.check", "r.violations")
        parts.append(stacked)

    for c in checks:
        if c.kind == "unique":
            dups = (
                df.groupBy(*c.key_cols)
                .agg(F.count(F.lit(1)).alias("n"))
                .agg(
                    F.coalesce(F.sum(F.col("n") - 1), F.lit(0))
                    .cast("bigint")
                    .alias("violations")
                )
                .select(F.lit(c.name).alias("check"), "violations")
            )
            parts.append(dups)
        elif c.kind == "fk":
            child = df.select(*c.key_cols).na.drop(subset=c.key_cols)
            parent = (
                c.parent.select(
                    *[
                        F.col(pc).alias(cc)
                        for pc, cc in zip(c.parent_cols, c.key_cols)
                    ]
                ).dropDuplicates()
            )
            orphans = (
                child.join(parent, c.key_cols, "left_anti")
                .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
                .select(F.lit(c.name).alias("check"), "violations")
            )
            parts.append(orphans)

    return reduce(DataFrame.unionByName, parts)

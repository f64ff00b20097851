"""End-to-end training-data curation: [PII scrub →] quality → dedup
[→ near-dup] → decontaminate → split → pack, as ONE composed,
engine-portable pipeline.

Every production LLM-data pipeline chains the same stages; this module
wires the repo's individually-gated operators (text.quality_filter,
dedup.exact_dedup / neardup_clusters / contaminated_docs,
sampling.hash_split / pack_sequences) into a single call that returns a
PER-DOCUMENT verdict frame: which stage dropped each document (in
pipeline order), or — for survivors — its split assignment and, for
train docs, its packed-sequence bin.

Stage semantics are SEQUENTIAL: a document rejected by the quality gate
is never considered by dedup, a near/exact duplicate is never gram-
checked for contamination, and split/pack see only fully-clean docs —
the order every published pipeline uses (cheapest-first, so each stage
scans a smaller corpus).

100 TB shape: the quality gate is scan+project (no shuffle); exact
dedup shuffles (text_hash, id) only; near-dup is the banded-LSH path
(never all-pairs); contamination broadcasts the MB-scale eval-gram
set; split is map-side hash arithmetic; packing is one window over the
kept-train rows.  The wide ``text`` column is dropped before every
id-level join, so the joins carry ids + small ints.  Because the
verdict frame unions one branch per stage and Spark shares no common
subplans across union arms, every stage frame is persisted and
eagerly materialized before the fan-out (each upstream executes
exactly ONCE — runtime-asserted by the plan-audit suite) and released
via :meth:`CurationResult.release` after the final consuming action.

With ``neardup=False`` the whole pipeline is mirrorable in ANSI SQL —
the q154 driver gate runs the full five-stage composition against a
DuckDB replay, hash-exact per document.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


@dataclass
class CurationResult:
    """``labeled``: one row per input doc —
    (doc_id, n_tokens, drop_stage | NULL, split | NULL, bin | NULL).

    ``cached`` holds the stage frames :func:`curate` pinned so the
    verdict union's branches share ONE execution of each upstream
    (scrub / quality / dedup survivors) instead of re-running it per
    branch; call :meth:`release` after the final consuming action.
    """

    labeled: DataFrame
    cached: list[DataFrame] = field(default_factory=list)

    def release(self) -> None:
        """Release every stage frame pinned by :func:`curate` (persisted
        caches plus the packing stage's checkpoint handle).

        Safe to call more than once.  Call it AFTER the final consuming
        action on ``labeled`` (q70's contract): the persisted caches
        would recompute transparently, but the packing checkpoint fails
        loudly on reuse by design.
        """
        for df in self.cached:
            df.unpersist()
        self.cached = []

    @property
    def report(self) -> DataFrame:
        """(stage, n_docs, n_tokens) — drop stages plus kept_<split>."""
        stage = F.coalesce(
            F.col("drop_stage"), F.concat(F.lit("kept_"), F.col("split"))
        )
        return self.labeled.groupBy(stage.alias("stage")).agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )

    def kept(self) -> DataFrame:
        return self.labeled.filter(F.col("drop_stage").isNull())


def curate(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    *,
    pii: bool = False,
    neardup: bool = False,
    seq_budget: int = 2048,
    split_weights: dict[str, float] | None = None,
    split_seed: str = "split",
    n_gram: int = 3,
    min_shared: int = 1,
    neardup_kwargs: dict | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> CurationResult:
    """Run the five-stage curation pipeline over ``docs``.

    ``eval_docs`` (optional) drives benchmark decontamination: any doc
    sharing ≥ ``min_shared`` word ``n_gram``-grams with the eval set is
    dropped (eval-member ids themselves are exempt, matching
    dedup.contaminated_docs).  ``neardup=True`` inserts banded-MinHash
    near-dup clustering between exact dedup and decontamination
    (keepers = cluster-minimum ids); it is off by default because the
    LSH stage has no closed-form SQL mirror (its own gate is q22/q29).
    """
    # The verdict frame is a unionByName of one branch per drop stage
    # plus the survivor branches — every branch roots at the same
    # scrub/quality/dedup upstream.  Spark does not share common
    # subplans across union arms, so WITHOUT pinning the upstream
    # executes once per branch (the 8-regex scrub alone re-ran ~6x:
    # 103.8s at sf0.1).  Each stage frame is persisted and eagerly
    # materialized before fan-out; the branches then all read the
    # cache, and CurationResult.release() frees the blocks after the
    # caller's final action.  MEMORY_AND_DISK: the widest pin carries
    # the corpus text column, which must spill rather than evict (an
    # evicted partition would silently recompute — correct, but the
    # exact redundancy this pin exists to prevent).
    cached: list[DataFrame] = []

    def _pin(df: DataFrame) -> DataFrame:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        df.count()
        cached.append(df)
        return df

    # A small corpus often arrives as a handful of parquet splits (the
    # sf0.1 documents table is ONE); every pinned stage inherits its
    # input's partitioning, so without this the regex scrub and the
    # quality stats run on that handful of cores.  Fan the input out to
    # the session's parallelism once, up front — at real scale the scan
    # already has >= parallelism splits and this is a no-op.
    np = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < np:
        docs = docs.repartition(np)

    # ADVICE r5: an exception mid-build (e.g. in neardup_clusters or
    # contaminated_docs) must not leak already-pinned stage frames —
    # the caller never gets a CurationResult to release.
    try:
        return _curate_build(
            docs, eval_docs, pii=pii, neardup=neardup,
            seq_budget=seq_budget, split_weights=split_weights,
            split_seed=split_seed, n_gram=n_gram, min_shared=min_shared,
            neardup_kwargs=neardup_kwargs, id_col=id_col,
            text_col=text_col, _pin=_pin, cached=cached,
        )
    except BaseException:
        for df in cached:
            try:
                df.unpersist()
            except Exception:
                pass
        raise


def quality_base(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra: list[str] | None = None,
) -> DataFrame:
    """The pipeline's single pre-pin stage frame: quality verdict +
    the text column (+ ``extra`` audit columns) in ONE projection
    chain — no id self-join re-attaching text to the verdict.  Shared
    with the plan-audit suite so the scrub-runs-once / no-join
    assertions cover the production code path."""
    from graphdb_neo4j_spark.operators.text import quality_filter

    extra = list(extra or [])
    return quality_filter(
        docs, id_col=id_col, text_col=text_col,
        keep_cols=[text_col] + extra,
    ).select(id_col, text_col, "n_tokens", "passed", *extra)


def _curate_build(
    docs, eval_docs, *, pii, neardup, seq_budget, split_weights,
    split_seed, n_gram, min_shared, neardup_kwargs, id_col, text_col,
    _pin, cached,
) -> CurationResult:
    from graphdb_neo4j_spark.operators.dedup import (
        contaminated_docs,
        exact_dedup,
        neardup_clusters,
    )
    from graphdb_neo4j_spark.operators.sampling import hash_split, pack_sequences
    from graphdb_neo4j_spark.operators.text import pii_scrub, quality_filter

    pii_counts = None
    extra: list[str] = []
    if pii:
        # redaction FIRST: every downstream stage (quality stats,
        # dedup hashes, contamination grams) sees the scrubbed text,
        # so documents differing only in redacted PII collapse as the
        # duplicates they are.  Eval docs stay raw (they are the
        # benchmark, not the corpus).  Per-doc match counts ride along
        # for the audit column.  r11: the scrub is a PROJECTION STAGE
        # of the single base pin below, not its own pin — the scrubbed
        # text lands as a materialized attribute that the quality
        # stages read (the r10 hoist discipline), so the regexes still
        # run once per row but the pipeline pays one materialization
        # and one pass over the corpus instead of two.  (The r4-r10
        # negative result — inlining the scrub expression into every
        # stat subexpression, 2x slower — was per-STAT re-evaluation;
        # CollapseProject cannot re-inline a non-cheap multiply-
        # referenced attribute, asserted by the plan-audit suite.)
        scr = pii_scrub(docs.select(id_col, text_col), keep_cols=[id_col])
        docs = scr.select(
            id_col,
            F.col(f"{text_col}_scrubbed").alias(text_col),
            "n_email",
            "n_ssn",
            "n_ipv4",
            "n_phone",
        )
        extra = ["n_email", "n_ssn", "n_ipv4", "n_phone"]

    def drop_row(df: DataFrame, stage: str) -> DataFrame:
        return df.select(
            id_col,
            "n_tokens",
            F.lit(stage).alias("drop_stage"),
            F.lit(None).cast("string").alias("split"),
            F.lit(None).cast("bigint").alias("bin"),
        )

    # ONE pinned frame carries text + verdict columns: quality_filter
    # threads the text (and the scrub audit counts) through its
    # projection chain (keep_cols), so the old id self-join that
    # re-attached text to the verdict — a second shuffle and scan of
    # the full corpus text — is gone (r11, guide §2.3/§2.4).
    base = _pin(quality_base(docs, id_col=id_col, text_col=text_col, extra=extra))
    if pii:
        pii_counts = base.select(
            id_col,
            (
                F.col("n_email")
                + F.col("n_ssn")
                + F.col("n_ipv4")
                + F.col("n_phone")
            )
            .cast("bigint")
            .alias("n_pii"),
        )
    dropped = [drop_row(base.filter(F.col("passed") == 0), "quality")]
    s1 = base.select(id_col, text_col, "n_tokens", "passed").filter(
        F.col("passed") == 1
    )

    ed = exact_dedup(s1, text_col=text_col, id_col=id_col)
    s1h = s1.withColumn("_h", F.md5(F.col(text_col)))
    s2 = s1h.join(
        ed.select(F.col("text_hash").alias("_h"), "keep_id"), "_h"
    ).withColumn("_dup", F.col(id_col) != F.col("keep_id"))
    dropped.append(drop_row(s2.filter(F.col("_dup")), "exact_dup"))
    cur = _pin(
        s2.filter(~F.col("_dup")).select(id_col, text_col, "n_tokens")
    )

    if neardup:
        cl = neardup_clusters(
            cur, id_col=id_col, text_col=text_col, **(neardup_kwargs or {})
        )
        # neardup_clusters stringifies ids; cast back to the caller's
        # actual id type so non-long ids survive the keeper joins.
        keepers = _pin(
            cl.filter(F.col("is_keeper")).select(
                F.col("id").cast(cur.schema[id_col].dataType).alias(id_col)
            )
        )
        dropped.append(
            drop_row(cur.join(keepers, id_col, "left_anti"), "near_dup")
        )
        cur = cur.join(keepers, id_col, "left_semi")

    if eval_docs is not None:
        contam = _pin(
            contaminated_docs(
                cur, eval_docs, n=n_gram, min_shared=min_shared,
                id_col=id_col, text_col=text_col,
            ).select(id_col)
        )
        dropped.append(
            drop_row(cur.join(contam, id_col, "left_semi"), "contaminated")
        )
        cur = cur.join(contam, id_col, "left_anti")

    kept = _pin(
        hash_split(
            cur.select(id_col, "n_tokens"),
            id_col=id_col,
            weights=split_weights,
            seed=split_seed,
        )
    )
    packed, ph = pack_sequences(
        kept.filter(F.col("split") == "train"),
        budget=seq_budget,
        token_col="n_tokens",
        order_col=id_col,
        id_col=id_col,
    )
    # the distributed-prefix-sum path checkpoints its range-partitioned
    # intermediate; its handle releases with the stage caches (the
    # CheckpointHandle's unpersist() alias makes it duck-compatible)
    if ph is not None:
        cached.append(ph)
    train = packed.select(
        id_col,
        "n_tokens",
        F.lit(None).cast("string").alias("drop_stage"),
        "split",
        F.col("bin").cast("bigint").alias("bin"),
    )
    other = kept.filter(F.col("split") != "train").select(
        id_col,
        "n_tokens",
        F.lit(None).cast("string").alias("drop_stage"),
        "split",
        F.lit(None).cast("bigint").alias("bin"),
    )

    labeled = train.unionByName(other)
    for d in dropped:
        labeled = labeled.unionByName(d)
    if pii_counts is not None:
        labeled = labeled.join(pii_counts, id_col)
    return CurationResult(labeled=labeled, cached=cached)

"""Distributed PCA over embedding columns — the dimensionality tool a
training-data pipeline wants next to ANN (whitening, compaction,
visualization, PCA-accelerated search).

Spark-first shape (no MLlib dependency, no RowMatrix):

* **fit** is ONE Arrow-batched pass: each partition reduces to a
  single ``(n, Σx, Σx·xᵀ)`` partial via numpy inside ``mapInPandas``
  (d=64 → 4 KB per partial), the driver sums the ≤``numPartitions``
  partials and eigendecomposes the d×d covariance.  Work shipped to
  the cluster is O(rows·d²/partitions); what crosses to the driver is
  O(partitions·d²) — constant in the row count, the same contract as
  the PQ codebook fetches in ``similarity.py``.
* **project** is a broadcast matmul, the ``hyperplane_bits`` Arrow
  pattern: zero shuffle, one numpy GEMM per batch.
* Sign convention: each component is flipped so its largest-|coord|
  entry is positive — eigenvectors become deterministic, so projected
  outputs are reproducible run-to-run and testable against numpy.

Reference parity: the reference engine (`/root/reference/events.py`)
has no vector operators at all; this is part of the LLM-pipeline
extension surface (SURVEY.md §2 similarity block).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PcaModel:
    """Fitted PCA: row count, per-dim mean, k×d components (rows =
    components, unit-norm, sign-fixed), per-component explained
    variance and its ratio of the total."""

    n: int
    mean: list[float]
    components: list[list[float]]  # k × d
    explained_variance: list[float]
    explained_variance_ratio: list[float]


def pca_fit(
    df: DataFrame,
    dims: int,
    k: int,
    vec_col: str = "embedding",
) -> PcaModel:
    """Fit a k-component PCA in one distributed pass.

    Per-partition ``mapInPandas`` kernel accumulates (n, Σx, Σxxᵀ) —
    numpy float64, flattened to arrays — and emits ONE row per
    partition tagged with its partition id.  The driver sums partials
    in partition-id order (a fixed reduction order keeps the float
    sums reproducible for a given partitioning), forms the sample
    covariance ``(Σxxᵀ − n·μμᵀ)/(n−1)``, and takes the top-k of
    ``numpy.linalg.eigh``.
    """
    import numpy as np
    import pandas as pd

    d = dims

    def partials(batches):
        from pyspark import TaskContext

        n = 0
        s = np.zeros(d, dtype=np.float64)
        c = np.zeros((d, d), dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy())[:, :d].astype(np.float64)
            n += x.shape[0]
            s += x.sum(axis=0)
            c += x.T @ x
        if n == 0:
            return
        yield pd.DataFrame(
            {
                "pid": [TaskContext.get().partitionId()],
                "n": [n],
                "s": [s.tolist()],
                "c": [c.reshape(-1).tolist()],
            }
        )

    rows = (
        df.select(vec_col)
        .mapInPandas(partials, schema="pid long, n long, s array<double>, c array<double>")
        .collect()
    )
    rows.sort(key=lambda r: r["pid"])
    n = sum(r["n"] for r in rows)
    if n < 2:
        raise ValueError("pca_fit needs at least 2 rows")
    s = np.zeros(d, dtype=np.float64)
    c = np.zeros((d, d), dtype=np.float64)
    for r in rows:
        s += np.array(r["s"], dtype=np.float64)
        c += np.array(r["c"], dtype=np.float64).reshape(d, d)
    mean = s / n
    cov = (c - n * np.outer(mean, mean)) / (n - 1)
    cov = (cov + cov.T) / 2.0  # exact symmetry for eigh
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comp = evecs[:, order].T  # k × d
    ev = np.clip(evals[order], 0.0, None)
    # deterministic sign: largest-|coord| entry positive
    for i in range(comp.shape[0]):
        j = int(np.argmax(np.abs(comp[i])))
        if comp[i, j] < 0:
            comp[i] = -comp[i]
    total = float(np.clip(np.trace(cov), 1e-300, None))
    return PcaModel(
        n=int(n),
        mean=mean.tolist(),
        components=comp.tolist(),
        explained_variance=ev.tolist(),
        explained_variance_ratio=(ev / total).tolist(),
    )


def pca_project(
    df: DataFrame,
    model: PcaModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """(id, proj) — center by the model mean and project onto the
    components.  Zero-shuffle Arrow map (the ``hyperplane_bits``
    kernel shape): one ``(batch×d) @ (d×k)`` GEMM per Arrow batch; the
    k×d model rides in the task closure (a few KB)."""
    import numpy as np
    import pandas as pd

    mean = np.array(model.mean, dtype=np.float64)
    comp_t = np.array(model.components, dtype=np.float64).T  # d × k
    d = comp_t.shape[0]

    def project(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy())[:, :d].astype(np.float64)
            p = (x - mean) @ comp_t
            yield pd.DataFrame({"id": pdf[id_col], out_col: list(p)})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, vec_col).mapInPandas(
        project, schema=f"id {id_type}, {out_col} array<double>"
    )


def l2_normalize(
    df: DataFrame, vec_col: str = "embedding", eps: float = 1e-12
) -> DataFrame:
    """Replace ``vec_col`` with its unit-norm form — pure relational
    transform (no UDF), zero shuffle.  On the unit sphere cosine
    ranking ≡ Euclidean ranking (‖x−q‖² = 2−2·x·q), which is what lets
    a distance-preserving projection stand in for cosine search."""
    from graphdb_neo4j_spark.operators.similarity import norm_expr

    n = F.greatest(norm_expr(F.col(vec_col)), F.lit(eps))
    unit = F.transform(F.col(vec_col), lambda x: x.cast("double") / n)
    return df.withColumn(vec_col, unit)


def topk_pca(
    df: DataFrame,
    query_vec: list[float],
    model: PcaModel,
    k: int = 10,
    oversample: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PCA-accelerated exact-rerank ANN: rank ALL rows by distance in
    the k′-dim projected space (cheap — k′ doubles per row instead of
    d), keep the top ``k·oversample`` candidates, then exact-cosine
    rerank the candidates in the original space.

    Rows and query are L2-NORMALIZED before projection — cosine order
    equals Euclidean order only on the unit sphere, so fit the model
    on :func:`l2_normalize`-d vectors too (q117 does; the recall test
    pins the effect).  Mean-centering cancels in pairwise distances,
    so the centered projection is distance-faithful as-is.

    This is the classic dim-reduction filter-and-refine: the scan cost
    drops d/k′-fold while the top-k′ eigenbasis captures most of the
    pairwise-distance mass (oversample is the recall knob).  Candidate
    selection is a TakeOrdered (top-N per partition → tiny driver
    merge), never a global sort."""
    import numpy as np

    from graphdb_neo4j_spark.operators.similarity import cosine_expr

    mean = np.array(model.mean, dtype=np.float64)
    comp = np.array(model.components, dtype=np.float64)
    d = comp.shape[1]
    qn = np.array(query_vec, dtype=np.float64)[:d]
    qn = qn / max(float(np.linalg.norm(qn)), 1e-12)
    qp = (qn - mean) @ comp.T

    unit = l2_normalize(df.select(id_col, vec_col), vec_col=vec_col)
    proj = pca_project(unit, model, id_col=id_col, vec_col=vec_col)
    q_arr = F.array(*[F.lit(float(v)) for v in qp.tolist()])
    dist2 = F.aggregate(
        F.zip_with("proj", q_arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = (
        proj.select("id", dist2.alias("dist2"))
        .orderBy("dist2", "id")
        .limit(k * oversample)
        .select("id")
    )
    q_full = F.array(*[F.lit(float(v)) for v in query_vec])
    # (id, sim) with round-before-rank, matching topk_bruteforce's
    # output contract so recall tests compare like for like
    return (
        df.join(F.broadcast(cand), df[id_col] == cand["id"])
        .select(
            cand["id"],
            F.round(cosine_expr(F.col(vec_col), q_full), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("id"))
        .limit(k)
    )


def scalar_quantize(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 255,
) -> DataFrame:
    """Per-dimension min-max INT8-style scalar quantization — the
    4×-compression stage vector stores apply before PQ/OPQ (e.g. FAISS
    ``SQ8``): q_i = round((x_i − min_i) · levels / (max_i − min_i)),
    constant dims map to 0.

    Fully relational and engine-portable: the d per-dim (min, max)
    params come from ONE hash aggregate over the exploded column (cast
    to double FIRST, so both the extrema and the affine arithmetic are
    identical IEEE-double ops in any engine), ride along as two
    array literals via a 1×1 broadcast cross join, and the quantized
    vector is a codegen'd ``transform`` over ``arrays_zip`` — no UDF,
    no driver loop, no shuffle beyond the d-row param aggregate.

    Returns (id, qvec array<bigint>).  Dequantization is the affine
    inverse with the same params; reconstruction error ≤ half-step per
    dim (pinned in tests).
    """
    xd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    ex = df.select(F.posexplode(xd).alias("i", "x"))
    params = (
        ex.groupBy("i")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("i", "mn"))
            ).alias("mns_s"),
            F.array_sort(
                F.collect_list(F.struct("i", "mx"))
            ).alias("mxs_s"),
        )
        .select(
            F.transform(F.col("mns_s"), lambda s: s["mn"]).alias("mns"),
            F.transform(F.col("mxs_s"), lambda s: s["mx"]).alias("mxs"),
        )
    )
    z = F.arrays_zip(xd.alias("x"), F.col("mns").alias("mn"), F.col("mxs").alias("mx"))
    q = F.transform(
        z,
        lambda s: F.when(s["mx"] == s["mn"], F.lit(0).cast("bigint")).otherwise(
            F.round((s["x"] - s["mn"]) * float(levels) / (s["mx"] - s["mn"]))
            .cast("bigint")
        ),
    )
    return df.crossJoin(F.broadcast(params)).select(
        F.col(id_col), q.alias("qvec")
    )


def scalar_quantize_sql(
    table: str = "embeddings",
    id_sql: str = "vec_id",
    vec_sql: str = "embedding",
    levels: int = 255,
) -> str:
    """DuckDB oracle for :func:`scalar_quantize` — same double-first
    casts, same extrema, same affine + round, same zip shape."""
    return f"""
    WITH xd AS (
      SELECT {id_sql} AS id,
             list_transform({vec_sql}, x -> CAST(x AS DOUBLE)) AS v
      FROM {table}
    ),
    ex AS (
      SELECT u.x AS x, u.i AS i
      FROM xd, LATERAL (
        SELECT UNNEST(v) AS x, generate_subscripts(v, 1) AS i
      ) u
    ),
    p AS (SELECT i, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY i),
    params AS (
      SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM p
    )
    SELECT id AS {id_sql},
           list_transform(
             list_zip(v, mns, mxs),
             s -> CASE WHEN s[3] = s[2] THEN CAST(0 AS BIGINT)
                       ELSE CAST(ROUND((s[1] - s[2]) * {float(levels)}
                                       / (s[3] - s[2])) AS BIGINT) END
           ) AS qvec
    FROM xd CROSS JOIN params
    """


def centroid_drift(
    df: DataFrame,
    group_col: str = "label",
    snap_col: str = "snap",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group centroid cosine between two corpus snapshots — the
    embedding-drift monitor a pipeline runs when a new crawl lands:
    has the semantic center of each source/label moved?

    ``snap_col`` must be 0/1.  Returns one row per group present in
    BOTH snapshots: ``(group, n_a, n_b, centroid_cosine)``.

    Exactness contract (see ``workloads.py`` header): components are
    truncated to integer nano-units with ``FLOOR(x·1e9)`` (one IEEE
    multiply + floor — deterministic in every engine, no rounding-tie
    exposure), summed exactly as BIGINTs.  The 1/n centroid scaling
    cancels inside the cosine, so the cosine of the SUM vectors is the
    cosine of the centroids; per-position cross terms are products of
    ≤2^53 integers computed in double (deterministic) and the three
    dot products are LEFT FOLDS in position order over float64 (the
    repo's standard cross-engine dot-product form — a grouped SUM of
    doubles would be partial-order-dependent), making the final
    cosine bit-stable across engines and partitionings.

    100 TB shape: one scan, posexplode to (group, pos) hash-agg with
    map-side partials — shuffle carries |groups|·d rows, never data;
    the per-group fold is d-sized.  No joins, no windows, no driver
    loops.
    """
    comp = df.select(
        F.col(group_col).alias("g"),
        F.col(snap_col).alias("s"),
        F.posexplode(vec_col).alias("pos", "v"),
    ).select(
        "g",
        "s",
        "pos",
        F.floor(F.col("v").cast("double") * F.lit(1000000000.0))
        .cast("bigint")
        .alias("nano"),
    )
    sums = comp.groupBy("g", "pos").agg(
        F.sum(F.when(F.col("s") == 0, F.col("nano"))).alias("a"),
        F.sum(F.when(F.col("s") == 1, F.col("nano"))).alias("b"),
    )
    terms = sums.filter(
        F.col("a").isNotNull() & F.col("b").isNotNull()
    ).select(
        "g",
        "pos",
        (F.col("a").cast("double") * F.col("b").cast("double")).alias("ab"),
        (F.col("a").cast("double") * F.col("a").cast("double")).alias("aa"),
        (F.col("b").cast("double") * F.col("b").cast("double")).alias("bb"),
    )

    def _fold(field: str):
        return F.aggregate(
            F.col("arr"), F.lit(0.0), lambda acc, x: acc + x[field]
        )

    folded = (
        terms.groupBy("g")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "ab", "aa", "bb"))
            ).alias("arr")
        )
        .select(
            "g",
            _fold("ab").alias("ab"),
            _fold("aa").alias("aa"),
            _fold("bb").alias("bb"),
        )
    )
    counts = (
        df.groupBy(F.col(group_col).alias("g"))
        .agg(
            F.sum((F.col(snap_col) == 0).cast("bigint"))
            .cast("bigint")
            .alias("n_a"),
            F.sum((F.col(snap_col) == 1).cast("bigint"))
            .cast("bigint")
            .alias("n_b"),
        )
        .filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
    )
    return folded.join(F.broadcast(counts), "g").select(
        F.col("g").alias(group_col),
        "n_a",
        "n_b",
        (
            F.col("ab") / (F.sqrt(F.col("aa")) * F.sqrt(F.col("bb")))
        ).alias("centroid_cosine"),
    )

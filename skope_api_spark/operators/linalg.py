"""Distributed dense linear algebra over embedding columns: covariance /
Gram accumulation and PCA projection (whitening / dimensionality reduction
for the ANN + SemDeDup operators in ``operators/similarity.py``).

Scale shape — the whole computation is one tree-reducible aggregation:

- the sufficient statistics for a d-dim covariance are (n, Σx, Σxxᵀ):
  d²+d+1 numbers regardless of corpus size, so the reduce output is tiny
  and map-side combine collapses each partition to ONE partial;
- two interchangeable partial-accumulation strategies, parity-tested:

  * ``strategy="explode"`` — pure built-ins: posexplode the embedding to
    (i, j, x_i·x_j) upper-triangle terms and let the JVM hash aggregate
    combine them. Whole-stage codegen end to end, no Python; per-row CPU
    is O(d²) expression work, the right default up to d≈100;
  * ``strategy="gram"`` — Arrow-batched ``mapInPandas`` computing a
    per-batch numpy Gram matrix (BLAS ``X.T @ X``), emitting ONE
    d²-element partial row per batch; the element-wise reduce over
    partials is a skinny posexplode+sum. For d in the hundreds-plus this
    is the 100 TB path: BLAS does d² work per VECTOR once per batch
    instead of d² codegen expressions per row.

- PCA itself is the textbook small-d split: the d×d covariance (4096
  doubles at d=64) is collected to the driver, eigendecomposed with
  numpy, and the top-k component matrix is broadcast back as a literal —
  projection is then an in-scan ``zip_with``/``aggregate`` fold, no
  shuffle, no Python.

Population (ddof=0) covariance; mean-centering uses the numerically
conventional Σxy/n − μ_i·μ_j form, which is safe for the O(1)-scale
embedding distributions this engine targets (document in the call site if
your vectors carry a huge common offset — center first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dim(df: DataFrame, col: str) -> int:
    row = df.select(F.size(F.col(col)).alias("d")).first()
    if row is None or row["d"] is None:
        raise ValueError(f"cannot infer dimension of empty column {col!r}")
    return int(row["d"])


def _explode_partials(df: DataFrame, col: str) -> DataFrame:
    """(i, j, sum_xy, sum_xi, sum_xj, n) upper-triangle sufficient
    statistics via pure built-in explode + ONE hash aggregate.

    The marginal sums ride along in the SAME (i, j) groups, so covariance
    derives in the projection with no join-back — referencing the
    aggregate from multiple branches would recompute the corpus scan
    (the first cut of this operator planned 4 scans; this one plans 1).
    """
    x = F.transform(F.col(col), lambda v: v.cast("double"))
    pos = df.select(x.alias("__x")).select(
        F.posexplode("__x").alias("i", "__xi"), F.col("__x")
    )
    # per (row, i): explode j >= i only — upper triangle, halves the work
    pairs = pos.select(
        "i",
        "__xi",
        F.posexplode(F.slice(F.col("__x"), F.col("i") + 1, F.size("__x"))).alias(
            "__joff", "__xj"
        ),
    ).select(
        "i",
        (F.col("i") + F.col("__joff")).alias("j"),
        (F.col("__xi") * F.col("__xj")).alias("__xy"),
        "__xi",
        "__xj",
    )
    return pairs.groupBy("i", "j").agg(
        F.sum("__xy").alias("sum_xy"),
        F.sum("__xi").alias("__sx_i"),
        F.sum("__xj").alias("__sx_j"),
        F.count(F.lit(1)).alias("n"),
    )


def _gram_partials(df: DataFrame, col: str, d: int) -> DataFrame:
    """One flattened upper-triangle Gram partial per Arrow batch
    (numpy BLAS), then a skinny element-wise reduce."""
    import numpy as np
    import pandas as pd

    iu = np.triu_indices(d)

    def gram(batches):
        for pdf in batches:
            # NULL embeddings are skipped — the same null-skipping
            # semantics the explode strategy gets from posexplode
            vals = pdf[col].dropna()
            if not len(vals):
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in vals]
            )
            G = X.T @ X
            yield pd.DataFrame(
                {
                    "partial": [G[iu].tolist()],
                    "sum_x": [X.sum(axis=0).tolist()],
                    "n": [len(pdf)],
                }
            )

    partials = df.select(col).mapInPandas(
        gram, schema="partial array<double>, sum_x array<double>, n long"
    )
    # one d²-array row per batch; checkpoint so the three consumers below
    # (triangle reduce, marginals, n) share ONE corpus pass instead of
    # re-running the BLAS stage per branch
    partials = partials.localCheckpoint(eager=True)
    flat = partials.select(
        F.posexplode("partial").alias("t", "val"),
        F.col("sum_x"),
        F.col("n"),
    )
    tri = flat.groupBy("t").agg(F.sum("val").alias("sum_xy"))
    # map flat upper-triangle index t -> (i, j); n and Σx reduced separately
    marg = (
        partials.select(F.posexplode("sum_x").alias("i", "v"))
        .groupBy("i")
        .agg(F.sum("v").alias("sum_x"))
    )
    n = partials.agg(F.sum("n").alias("n"))
    ij = [(int(t), int(i), int(j)) for t, (i, j) in enumerate(zip(*iu))]
    spark = df.sparkSession
    ij_df = spark.createDataFrame(ij, "t int, i int, j int")
    out = (
        tri.join(F.broadcast(ij_df), "t")
        .join(F.broadcast(marg.withColumnRenamed("i", "j").withColumnRenamed("sum_x", "__sx_j")), "j")
        .join(F.broadcast(marg.withColumnRenamed("sum_x", "__sx_i")), "i")
        .crossJoin(F.broadcast(n))
    )
    return out.select("i", "j", "sum_xy", "__sx_i", "__sx_j", "n")


def covariance(
    df: DataFrame,
    col: str = "embedding",
    *,
    strategy: str = "explode",
) -> DataFrame:
    """Population covariance matrix of an ``array<float|double>`` column.

    Returns the upper triangle as ``(i, j, cov)`` with 0-based ``i <= j``
    — d(d+1)/2 rows total, independent of corpus size. Rows with a NULL
    embedding are excluded (posexplode emits nothing for them), matching
    null-skipping aggregate semantics; ragged dimensions are the
    caller's contract to prevent.
    """
    if strategy == "explode":
        parts = _explode_partials(df, col)
        return parts.select(
            "i",
            "j",
            (
                F.col("sum_xy") / F.col("n")
                - (F.col("__sx_i") / F.col("n"))
                * (F.col("__sx_j") / F.col("n"))
            ).alias("cov"),
        )
    if strategy == "gram":
        d = _dim(df, col)
        parts = _gram_partials(df, col, d)
        return parts.select(
            "i",
            "j",
            (
                F.col("sum_xy") / F.col("n")
                - (F.col("__sx_i") / F.col("n"))
                * (F.col("__sx_j") / F.col("n"))
            ).alias("cov"),
        )
    raise ValueError(f"unknown strategy {strategy!r}; use 'explode' or 'gram'")


def pca_components(
    df: DataFrame,
    col: str = "embedding",
    *,
    k: int,
    strategy: str = "explode",
):
    """Top-k principal components via distributed covariance + driver-side
    eigendecomposition. Returns ``(mean, components, variances)`` numpy
    arrays: components is d×k, columns ordered by descending eigenvalue
    with a deterministic sign convention (largest-|coefficient| entry of
    each component made positive, index tie-break lowest)."""
    import numpy as np

    d = _dim(df, col)
    if not 1 <= k <= d:
        raise ValueError(f"k must be in [1, {d}], got {k}")
    tri = covariance(df, col, strategy=strategy).collect()
    C = np.zeros((d, d))
    for r in tri:
        C[r["i"], r["j"]] = C[r["j"], r["i"]] = r["cov"]
    mean = np.zeros(d)
    long_form = df.select(
        F.posexplode(
            F.transform(F.col(col), lambda v: v.cast("double"))
        ).alias("__i", "__x")
    )
    for r in long_form.groupBy("__i").agg(F.avg("__x").alias("m")).collect():
        mean[r["__i"]] = r["m"]
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order]
    # deterministic sign: flip so the max-|coeff| entry is positive
    for c in range(comps.shape[1]):
        j = int(np.argmax(np.abs(comps[:, c])))
        if comps[j, c] < 0:
            comps[:, c] = -comps[:, c]
    return mean, comps, vals[order]


def pca_project(
    df: DataFrame,
    col: str = "embedding",
    *,
    k: int,
    out_col: str = "pca",
    strategy: str = "explode",
) -> DataFrame:
    """Append a length-k ``array<double>`` of PCA scores. The component
    matrix is a broadcast literal; projection is an in-scan zip_with fold
    per output dim — zero extra shuffle over the input scan."""
    mean, comps, _ = pca_components(df, col, k=k, strategy=strategy)
    centered = F.zip_with(
        F.transform(F.col(col), lambda v: v.cast("double")),
        F.array([F.lit(float(m)) for m in mean]),
        lambda x, m: x - m,
    )
    scores = [
        F.aggregate(
            F.zip_with(
                centered,
                F.array([F.lit(float(v)) for v in comps[:, c]]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        for c in range(comps.shape[1])
    ]
    return df.withColumn(out_col, F.array(*scores))

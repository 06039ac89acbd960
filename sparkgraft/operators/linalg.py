"""Distributed linear algebra over embedding columns.

PCA at corpus scale follows the classic two-level shape: the d x d
Gram/covariance matrix is tiny (d = embedding width), so each
partition reduces its rows to one X^T X partial (an Arrow-batched
numpy matmul), the partials sum, and the eigendecomposition runs on
the driver against a d x d matrix — the projection then broadcasts
the component matrix back as literal expressions.  No raw vector ever
shuffles; the only movement is ~d^2/2 partial sums per batch.

Exactness: vectors are quantized to fixed-point integers (10^6) at
the kernel boundary and ALL sums run in exact integer arithmetic
(int64 within a batch — safe by the Arrow batch-size bound — then
DECIMAL(38,0) across batches), so the covariance matrix is
bit-identical under any partitioning and mirrors into SQL.  The
eigen step (numpy ``eigh``) is deterministic for a fixed input
matrix; component signs are canonicalized (largest-|component|
coordinate made positive) so the projection is reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

X_SCALE = 10**6


def _dec(c: Column) -> Column:
    return c.cast("decimal(38,0)")


def _signed_halfup(num: Column, den: Column) -> Column:
    """HALF-UP integral division for any-sign numerator (exact_mean's
    kernel, sign-split)."""
    two = F.lit(2).cast("decimal(38,0)")
    r = F.call_function("div", two * F.abs(num) + den, two * den)
    return F.when(num < 0, -r).otherwise(r)


def pair_sums(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Per-batch exact partial sums for the covariance build: one row
    per Arrow batch with the upper-triangle of X^T X (row-major
    ``np.triu_indices`` order), the per-dimension sums, and the batch
    row count — all int64-exact (|x_scaled| ≤ ~1e7, so a 10k-row batch
    stays far under 2^63)."""
    import numpy as np
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            arr = np.stack(pdf[vec_col].to_numpy())[:, :dim]
            xs = np.rint(arr.astype(np.float64) * X_SCALE).astype(np.int64)
            g = xs.T @ xs
            iu = np.triu_indices(dim)
            yield pd.DataFrame(
                {
                    "xy": [g[iu].tolist()],
                    "x": [xs.sum(axis=0).tolist()],
                    "n": [len(xs)],
                }
            )

    return df.select(vec_col).mapInPandas(
        kernel, "xy array<long>, x array<long>, n long"
    )


def covariance_matrix(
    df: DataFrame, vec_col: str, dim: int, digits: int = 8
) -> DataFrame:
    """Exact population covariance of the first ``dim`` embedding
    coordinates: ``(i, j, cov)`` for i ≤ j, where
    cov = (n·Σxy − Σx·Σy) / (n²·scale²) HALF-UP-rounded at ``digits``
    — DECIMAL(38,0) integer arithmetic end to end, so the matrix is
    partitioning-independent and SQL-mirrorable."""
    part = pair_sums(df, vec_col, dim)
    xy = (
        part.select(F.posexplode("xy").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum(_dec(F.col("v"))).alias("sxy"))
    )
    sx = (
        part.select(F.posexplode("x").alias("i", "v"))
        .groupBy("i")
        .agg(F.sum(_dec(F.col("v"))).alias("sx"))
    )
    ntot = part.agg(F.sum(_dec(F.col("n"))).alias("n"))
    spark = df.sparkSession
    iu = [(pos, i, j) for pos, (i, j) in enumerate(
        (i, j) for i in range(dim) for j in range(i, dim)
    )]
    pos_map = spark.createDataFrame(iu, "pos int, i int, j int")
    sxi = sx.withColumnsRenamed({"i": "pi", "sx": "sx_i"})
    sxj = sx.withColumnsRenamed({"i": "pj", "sx": "sx_j"})
    joined = (
        xy.join(F.broadcast(pos_map), "pos")
        .join(F.broadcast(sxi), F.col("i") == F.col("pi"))
        .join(F.broadcast(sxj), F.col("j") == F.col("pj"))
        .crossJoin(F.broadcast(ntot))
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx_i") * F.col("sx_j")) * F.lit(
        10**digits
    ).cast("decimal(38,0)")
    den = (
        F.col("n")
        * F.col("n")
        * F.lit(X_SCALE).cast("decimal(38,0)")
        * F.lit(X_SCALE).cast("decimal(38,0)")
    )
    return joined.select(
        "i",
        "j",
        (
            _signed_halfup(num, den).cast("double")
            / F.lit(float(10**digits))
        ).alias("cov"),
    )


def pca_components(
    df: DataFrame, vec_col: str, dim: int, k: int
) -> tuple[list[list[float]], list[float], list[float]]:
    """Fit PCA: exact covariance (above) → driver ``eigh`` on the
    d x d matrix → top-k components (descending eigenvalue), signs
    canonicalized.  Returns (components[k][dim], eigenvalues[k],
    mean[dim]).  The driver never holds more than d² floats."""
    import numpy as np

    rows = covariance_matrix(df, vec_col, dim).collect()
    cov = np.zeros((dim, dim))
    for r in rows:
        cov[r["i"], r["j"]] = r["cov"]
        cov[r["j"], r["i"]] = r["cov"]
    part = pair_sums(df, vec_col, dim)
    tot = part.select(
        F.posexplode("x").alias("i", "v")
    ).groupBy("i").agg(F.sum(_dec(F.col("v"))).alias("sx")).collect()
    n = part.agg(F.sum("n")).first()[0]
    mean = np.zeros(dim)
    for r in tot:
        mean[r["i"]] = int(r["sx"]) / (n * X_SCALE)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return comps, [float(vals[i]) for i in order], [float(m) for m in mean]


def pca_project(
    df: DataFrame,
    vec_col: str,
    components: list[list[float]],
    mean: list[float],
    id_cols: tuple[str, ...] = ("vec_id",),
    digits: int = 6,
) -> DataFrame:
    """Project vectors onto fitted components: centered dot products as
    pure JVM-side array expressions (components and mean are literals —
    a broadcast-free broadcast), rounded once for portability.  Output
    ``(*id_cols, pc array<double>)``; shuffle-free scan-speed."""
    dim = len(mean)
    # components only span the first `dim` coords; vectors may be
    # wider — slice first so zip_with lengths agree
    v = F.slice(
        F.transform(F.col(vec_col), lambda x: x.cast("double")), 1, dim
    )

    def dot(comp: list[float]) -> Column:
        terms = F.zip_with(
            v,
            F.array(*[F.lit(float(c)) for c in comp]),
            lambda a, b: a * b,
        )
        base = F.aggregate(
            terms, F.lit(0.0), lambda acc, t: acc + t
        )
        offset = sum(c * m for c, m in zip(comp, mean))
        return F.round(base - F.lit(float(offset)), digits)

    return df.select(
        *id_cols, F.array(*[dot(c) for c in components]).alias("pc")
    )

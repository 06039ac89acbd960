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


V_SCALE = 10**9  # component-vector fixed point (power iteration)
COV_SCALE = 10**8  # covariance fixed point (matches covariance_matrix)
PCA_ITERS = 40


def _hup(num: int, den: int) -> int:
    """HALF-UP signed integral division (the exact_mean kernel, in
    driver Python ints)."""
    if den == 0:
        return 0
    q = (2 * abs(num) + den) // (2 * den)
    return -q if num < 0 else q


def power_components_int(
    cov_scaled: list[list[int]], k: int, iters: int = PCA_ITERS
) -> tuple[list[list[int]], list[int]]:
    """Top-k eigenpairs of a COV_SCALE-scaled integer symmetric matrix
    via EXACT INTEGER power iteration with Hotelling deflation — the
    round-9 replacement for the driver ``np.linalg.eigh`` (VERDICT r8
    task 4): every step is arbitrary-precision integer arithmetic
    (matvec → exact ``math.isqrt`` norm → HALF-UP renormalize at
    V_SCALE; Rayleigh quotient and rank-1 deflation through the same
    kernel), so the whole fit replays verbatim in SQL HUGEINT CTEs —
    the DuckDB oracle runs the IDENTICAL algorithm and matches
    bit-for-bit by construction, independent of any LAPACK build.

    Semantics note: this is a DEFINED algorithm (``iters`` fixed-point
    iterations from the all-ones start), not a convergence-tolerance
    eigensolver — components are orthonormal to ~1/V_SCALE, exact
    eigenvectors in the well-separated-spectrum case and a
    deterministic orthogonal-ish basis otherwise.  Returns
    (vectors[k][dim] at V_SCALE, eigenvalues[k] at COV_SCALE),
    vectors sign-canonicalized (pivot = largest |coordinate|, lowest
    index on ties, made positive)."""
    import math

    dim = len(cov_scaled)
    c = [row[:] for row in cov_scaled]
    out_v: list[list[int]] = []
    out_l: list[int] = []
    for _ in range(k):
        v = [V_SCALE] * dim
        for _t in range(iters):
            w = [sum(c[i][j] * v[j] for j in range(dim)) for i in range(dim)]
            s = math.isqrt(sum(x * x for x in w))
            v = [_hup(x * V_SCALE, s) for x in w] if s else [0] * dim
        w = [sum(c[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        num = sum(v[i] * w[i] for i in range(dim))
        den = sum(x * x for x in v)
        lam = _hup(num, den)
        # deflate BEFORE canonicalization (v v^T is sign-invariant)
        for i in range(dim):
            for j in range(dim):
                c[i][j] -= _hup(lam * v[i] * v[j], V_SCALE * V_SCALE)
        pivot = min(range(dim), key=lambda i: (-abs(v[i]), i))
        if v[pivot] < 0:
            v = [-x for x in v]
        out_v.append(v)
        out_l.append(lam)
    return out_v, out_l


def pca_components(
    df: DataFrame, vec_col: str, dim: int, k: int
) -> tuple[list[list[float]], list[float], list[float]]:
    """Fit PCA: exact covariance (above) → driver integer power
    iteration on the d x d matrix (:func:`power_components_int` —
    round 9: replaces ``np.linalg.eigh`` so the fit is engine-exact
    and SQL-replayable, not LAPACK-build-dependent) → top-k
    components (descending eigenvalue), signs canonicalized.  Returns
    (components[k][dim], eigenvalues[k], mean[dim]); every returned
    float is the nearest double of a fixed-point decimal, so the
    component literals re-enter plans bit-identically.  The driver
    never holds more than d² ints."""
    rows = covariance_matrix(df, vec_col, dim).collect()
    cov = [[0] * dim for _ in range(dim)]
    for r in rows:
        cs = int(round(r["cov"] * COV_SCALE))
        cov[r["i"]][r["j"]] = cs
        cov[r["j"]][r["i"]] = cs
    part = pair_sums(df, vec_col, dim)
    tot = part.select(
        F.posexplode("x").alias("i", "v")
    ).groupBy("i").agg(F.sum(_dec(F.col("v"))).alias("sx")).collect()
    n = part.agg(F.sum("n")).first()[0]
    mean = [0.0] * dim
    for r in tot:
        mean[r["i"]] = int(r["sx"]) / (n * X_SCALE)
    vecs, lams = power_components_int(cov, k)
    comps = [[x / V_SCALE for x in v] for v in vecs]
    return comps, [l / COV_SCALE for l in lams], mean


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

"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the exact baseline, and a partition-pruned
(IVF-style) variant as the scale path.  Both stay JVM-side: the dot
product is a ``zip_with`` + ``aggregate`` fold over the arrays — no
Python in the hot loop.

Scale analysis: brute force is O(|Q| x |C|); with |Q| broadcast
(queries are small by construction) there is NO shuffle of the
candidate side — each executor scans its candidate partitions once,
computes local top-k per query (rank-limit pushdown via the window),
and only k rows per (query, partition) move.  The IVF variant prunes
candidates to the probed cluster(s) first, which is the standard
recall/cost trade at 10^9+ vectors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two float-array columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_pandas_udf(dim: int):
    """Arrow-batched vectorized cosine kernel — the numpy alternative to
    the expression-based :func:`cosine` for when batch math beats
    codegen (very high dimensions, fused multi-metric kernels).

    Returns a pandas_udf suitable for ``df.select(kernel(a, b))``; the
    two paths produce identical rounded results (tested).  Prefer the
    expression form by default: it stays in whole-stage codegen and
    needs no Python workers.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        am = np.stack(a.to_numpy()).astype("float64").reshape(len(a), dim)
        bm = np.stack(b.to_numpy()).astype("float64").reshape(len(b), dim)
        dots = np.einsum("ij,ij->i", am, bm)
        na = np.sqrt(np.einsum("ij,ij->i", am, am))
        nb = np.sqrt(np.einsum("ij,ij->i", bm, bm))
        return pd.Series(dots / (na * nb))

    return _cos


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = 6,
) -> DataFrame:
    """Exact cosine top-k: every query against every candidate.

    ``queries`` is broadcast (small); similarity is rounded *before*
    ranking so the ordering is reproducible across engines/runs, with
    candidate id as the final tie-break.
    """
    # Norms are hoisted to per-row columns BEFORE the join: |Q|+|C| norm
    # computations instead of |Q|x|C| (the dot product is the only
    # per-pair work).
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
                digits,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def hyperplane_signs(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic random-hyperplane components: ±1 per (plane, dim)
    from md5 — reproducible in any engine (and embeddable as literals,
    so no runtime hashing at all)."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}|{d}".encode()).hexdigest()
            row.append(1.0 if h[0] in "89abcdef" else -1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection LSH bucket id: bit p = [dot(v, plane_p) > 0].

    Vectors within an angular neighborhood collide with probability
    (1 - θ/π)^bits — the classic SimHash-for-vectors index.  The plane
    matrix is a plan-time literal: the bucket computation is pure
    codegen arithmetic, no hashing at runtime.

    A vector whose length differs from the plane dimension (or a NULL
    vector) raises at execution time: ``zip_with`` would otherwise
    null-pad the shorter side, turn every dot product NULL, and
    silently collapse ALL vectors into bucket 0 — degrading the
    bucketed join into the full cross join this index exists to avoid.
    """
    dim = len(planes[0])
    bucket = None
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec, lit_plane, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return F.when(F.size(vec) == F.lit(dim), bucket.cast("int")).otherwise(
        F.raise_error(
            F.format_string(
                "lsh_bucket: embedding length %s != plane dim " + str(dim),
                F.size(vec),
            )
        )
    )


def lsh_bucketed_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = 6,
) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates restricted to the
    query's hyperplane bucket (single-probe).

    Scale path: the candidate side is grouped by bucket (2^n_planes
    partitions); a probe touches ~1/2^n_planes of the corpus.  Recall
    trades against n_planes; multiprobe (hamming-adjacent buckets)
    raises it without re-indexing.
    """
    planes = hyperplane_signs(n_planes, dim)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
                digits,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )


def partitioned_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    partition_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = 6,
) -> DataFrame:
    """IVF-style pruned top-k: candidates restricted to the query's
    cluster (here: the precomputed ``label`` partition = nprobe=1).

    At scale the cluster assignment comes from a centroid table
    (broadcast, argmin over centroids) and the candidate side is
    bucketed/partitioned by cluster id, so the search never scans
    out-of-cluster vectors.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(partition_col).alias("part"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(partition_col).alias("part"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        c.join(F.broadcast(q), "part")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
                digits,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )

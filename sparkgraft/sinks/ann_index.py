"""Persisted IVF-PQ ANN index: the offline-build / online-serve split
every production vector store runs.

Layout under ``index_dir`` (all plain parquet — readable by any
engine):

- ``codes/``      one row per corpus vector — (neighbor_id, cv, cn,
                  codes), **partitioned by the IVF cluster** (``part``).
                  This is the scale lever: a query probing ``nprobe``
                  of ``n_clusters`` clusters reads ONLY those
                  partitions' files — Spark turns the probe filter
                  into parquet PartitionFilters, so at 100 TB the
                  serving scan touches nprobe/n_clusters of the data
                  (plan-asserted in tests/test_plan_audit.py).
- ``centroids/``  (cluster, centroid) — k rows.
- ``codebooks/``  (sub, cluster, centroid) — m*k rows.

The codes table carries the full vector (``cv``) so the exact-cosine
rerank is self-contained; ADC-only serving (memory-constrained tiers)
can drop that column and the layout still works — the ADC stage only
reads (neighbor_id, codes).

Results are BIT-IDENTICAL to the in-memory
:func:`sparkgraft.operators.similarity.ivfpq_topk` on the same
centroids/codebooks (same assignment, encode, ADC and rerank
expressions) — asserted by the oracle query `ann_index_serve`, which
reuses `ivfpq_ann`'s DuckDB mirror verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkgraft.functions.expr import sql_ident as _sql_ident

from sparkgraft.operators.similarity import (
    _adc_lookup,
    _adc_tables,
    _dot,
    _norm,
    _norm_sql,
    assign_nearest,
    assign_nearest_multi,
    pq_encode,
)


def write_ann_index(
    index_dir: str,
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Offline build: assign + encode every vector once, write the
    cluster-partitioned codes table and the (tiny) index metadata."""
    from sparkgraft.operators.scale import widen_narrow_scan

    spark = vectors.sparkSession
    enc = widen_narrow_scan(vectors).select(
        F.col(id_col).alias("neighbor_id"),
        assign_nearest(vec_col, centroids).alias("part"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        F.expr(_norm_sql(_sql_ident(vec_col))).alias("cn"),
        pq_encode(vec_col, codebooks).alias("codes"),
    )
    enc.write.partitionBy("part").mode("overwrite").parquet(
        f"{index_dir}/codes"
    )
    spark.createDataFrame(
        [(c, [float(x) for x in v]) for c, v in centroids],
        "cluster int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{index_dir}/centroids")
    spark.createDataFrame(
        [
            (s, c, [float(x) for x in v])
            for s, cb in enumerate(codebooks)
            for c, v in cb
        ],
        "sub int, cluster int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{index_dir}/codebooks")


def append_ann_index(
    index_dir: str,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental index maintenance — the daily-ingest shape, symmetric
    to :func:`sparkgraft.sinks.bm25_index.append_bm25_index` on the
    lexical side: encode ONLY the new vectors against the index's
    FROZEN centroids/codebooks (real IVF-PQ services never refit
    per append — quantizer drift is handled by periodic rebuilds) and
    partition-append their codes.  Existing cluster partitions gain
    files, none are rewritten, and no history vector is ever re-read.

    Because assignment/encode are pure functions of (vector, frozen
    metadata), the appended index EXACTLY equals a full rebuild over
    old ∪ new with the same centroids/codebooks — asserted in
    tests/test_ann_index_append.py by comparing serving results."""
    centroids, codebooks, _ = read_ann_index(
        vectors.sparkSession, index_dir
    )
    from sparkgraft.operators.scale import widen_narrow_scan

    enc = widen_narrow_scan(vectors).select(
        F.col(id_col).alias("neighbor_id"),
        assign_nearest(vec_col, centroids).alias("part"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        F.expr(_norm_sql(_sql_ident(vec_col))).alias("cn"),
        pq_encode(vec_col, codebooks).alias("codes"),
    )
    enc.write.partitionBy("part").mode("append").parquet(
        f"{index_dir}/codes"
    )


# Session-scoped index cache (the readers._TABLE_CACHE pattern): a
# serve re-read the (tiny) centroid/codebook parquet from disk on EVERY
# call — ~0.35 s of sequential driver work per serve at sf0.1 (r12
# ann_forget decomposition).  Keyed by the SESSION OBJECT identity (not
# applicationId alone — newSession() siblings share one applicationId,
# and the cached codes DataFrame is bound to the session that read it)
# plus a stat-based content version derived from a RECURSIVE file
# listing, so every mutation path invalidates — including a rewrite
# that only swaps files INSIDE a codes/part=N partition dir (the
# compact_ann_index shape).  The invariant "every public mutator bumps
# _index_version" is pinned by tests/test_index_cache_invariant.py.
# Non-local paths (any URI scheme) and un-stat-able dirs are
# UNVERSIONABLE: the cache is bypassed entirely rather than served
# from a constant version that would never invalidate.  The codes
# entry is a lazy immutable plan; centroids/codebooks are driver values.
_INDEX_CACHE: dict[tuple, tuple] = {}


def _index_version(index_dir: str) -> "tuple | None":
    """Content version of the index directory: sorted recursive listing
    of (relative path, mtime_ns, size) for every file, plus the root
    dir's own mtime.  Any file added, removed, renamed, or rewritten
    anywhere under the index — including inside a single partition
    dir — changes the tuple (the invariant the cache tests pin).

    Returns ``None`` ("unversionable — bypass the cache") when the
    path carries a URI scheme (hdfs://, s3a://, even file:// — os.stat
    cannot version those) or when the root cannot be statted."""
    import os
    import re

    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", index_dir):
        return None
    try:
        root_st = os.stat(index_dir)
    except OSError:
        return None
    parts: list[tuple] = [("", root_st.st_mtime_ns, 0)]
    for root, dirs, files in os.walk(index_dir):
        dirs.sort()
        rel = os.path.relpath(root, index_dir)
        for n in sorted(files):
            try:
                st = os.stat(os.path.join(root, n))
            except OSError:
                continue  # racing mutator; version differs next call
            parts.append((f"{rel}/{n}", st.st_mtime_ns, st.st_size))
    return tuple(parts)


def read_ann_index(
    spark: SparkSession, index_dir: str
) -> tuple[list[tuple[int, list[float]]], list[list[tuple[int, list[float]]]], DataFrame]:
    """Load the index: metadata collects to the driver (bounded — k and
    m*k rows of floats, the same class as the centroid fit), codes stay
    a lazy partitioned scan.  Memoized per (session, dir, content
    version); mutations bump the stat-based version; unversionable
    paths (remote URIs) read fresh every call."""
    ver = _index_version(index_dir)
    key = (
        spark.sparkContext.applicationId,
        id(spark),
        index_dir,
        ver,
    )
    if ver is not None:
        hit = _INDEX_CACHE.get(key)
        # `is spark` defends id() reuse after a session is GC'd: a hit
        # must have been written by THIS session object, else reread.
        if hit is not None and hit[0] is spark:
            return hit[1]
        for k in [
            k
            for k in _INDEX_CACHE
            if k[0] != key[0] or (k[1] == key[1] and k[2] == index_dir)
        ]:
            del _INDEX_CACHE[k]
        # Bound across DISTINCT dirs too (index_dir is an arbitrary
        # caller path — e.g. per-test tmp dirs): FIFO-evict beyond 16.
        while len(_INDEX_CACHE) >= 16:
            del _INDEX_CACHE[next(iter(_INDEX_CACHE))]
    centroids = sorted(
        (r["cluster"], list(r["centroid"]))
        for r in spark.read.parquet(f"{index_dir}/centroids").collect()
    )
    cb_rows = spark.read.parquet(f"{index_dir}/codebooks").collect()
    n_sub = max(r["sub"] for r in cb_rows) + 1
    codebooks = [
        sorted(
            (r["cluster"], list(r["centroid"]))
            for r in cb_rows
            if r["sub"] == s
        )
        for s in range(n_sub)
    ]
    codes = spark.read.parquet(f"{index_dir}/codes")
    if ver is not None:
        _INDEX_CACHE[key] = (spark, (centroids, codebooks, codes))
    return centroids, codebooks, codes


def ivfpq_topk_indexed(
    queries: DataFrame,
    index_dir: str,
    nprobe: int = 2,
    k: int = 5,
    shortlist: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = 6,
) -> DataFrame:
    """Online serving against a persisted index.  The query batch's
    probed-cluster set (bounded by n_clusters) filters the codes scan
    BEFORE the join — a literal ``part IN (...)`` predicate Spark
    pushes into parquet partition pruning, so only probed clusters'
    files are read.  ADC + exact rerank are the same expressions as
    the in-memory operator."""
    centroids, codebooks, codes = read_ann_index(
        queries.sparkSession, index_dir
    )
    tomb = _tombstones(queries.sparkSession, index_dir)
    if tomb is not None:
        # Logical deletes exclude BEFORE the ADC shortlist, so served
        # results exactly equal an index that never held those vectors.
        codes = codes.join(F.broadcast(tomb), "neighbor_id", "left_anti")
    m = len(codebooks)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(
            assign_nearest_multi(vec_col, centroids, nprobe)
        ).alias("part"),
        F.col(vec_col).alias("qv"),
        F.expr(_norm_sql(_sql_ident(vec_col))).alias("qn"),
        _adc_tables(vec_col, codebooks).alias("tabs"),
    )
    # Driver-side probed-part list: |queries| x nprobe ids, bounded by
    # n_clusters — the price of a STATIC partition filter on the scan.
    probed = sorted(
        {r["part"] for r in q.select("part").distinct().collect()}
    )
    pruned = codes.filter(F.col("part").isin(probed))
    pairs = pruned.join(F.broadcast(q), "part").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        "qv",
        "cv",
        "qn",
        "cn",
        # Exact 1e9-scaled LONG (see _adc_lookup) — no re-round.
        _adc_lookup(F.col("tabs"), F.col("codes"), m).alias("approx_dist"),
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("neighbor_id").asc()
    )
    top = scored.withColumn("arnk", F.row_number().over(w1)).filter(
        F.col("arnk") <= shortlist
    )
    exact = top.select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
            digits,
        ).alias("cos_sim"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return exact.withColumn("rnk", F.row_number().over(w2)).filter(
        F.col("rnk") <= k
    )


def _tombstones(spark: SparkSession, index_dir: str) -> "DataFrame | None":
    """The index's logical-delete set (one ``neighbor_id`` per row), or
    None when nothing was ever deleted."""
    import os

    p = f"{index_dir}/tombstones"
    if not os.path.isdir(p) or not any(
        n.endswith(".parquet") for n in os.listdir(p)
    ):
        return None
    return spark.read.parquet(p).select("neighbor_id").distinct()


def delete_ann_index(spark: SparkSession, index_dir: str, ids) -> None:
    """Right-to-be-forgotten for the vector index (the GDPR leg a
    training-data lakehouse needs BEYOND the fact tables — a deleted
    document's embedding must stop being servable too): append the ids
    to the index's tombstone set.  The delete is LOGICAL and O(ids):
    serving anti-joins the (broadcast — GDPR batches are id-lists, not
    corpora) tombstone set before the ADC shortlist, so results are
    BIT-IDENTICAL to an index rebuilt over the corpus minus the ids
    with the same frozen centroids/codebooks (asserted by the
    ``ann_forget`` oracle query and tests).  Physical removal is
    :func:`compact_ann_index` — the delete/vacuum split mirrors
    sinks/versioned.py's delete_versioned + vacuum.

    ``ids`` may be an iterable of ints or a one-column DataFrame
    (any column name — it is renamed, matching delete_dedup_index)."""
    df = (
        ids
        if isinstance(ids, DataFrame)
        else spark.createDataFrame(
            [(int(i),) for i in ids], "neighbor_id long"
        )
    )
    df.toDF("neighbor_id").write.mode("append").parquet(
        f"{index_dir}/tombstones"
    )


def compact_ann_index(spark: SparkSession, index_dir: str) -> int:
    """PHYSICAL forgetting for the vector index: rewrite ONLY the
    cluster partitions that hold tombstoned vectors (bounded by the
    tombstone set's cluster spread — the IVF partitioning localizes
    the rewrite exactly as commit-log stats localize
    delete_versioned's), drop partitions emptied entirely, then clear
    the tombstone set.  Serving results are unchanged (the logical
    delete already excluded the rows); after this the bytes are gone.
    Returns the number of cluster partitions rewritten."""
    import os
    import shutil

    tomb = _tombstones(spark, index_dir)
    if tomb is None:
        return 0
    codes_dir = f"{index_dir}/codes"
    codes = spark.read.parquet(codes_dir)
    # bounded collect: affected clusters <= n_clusters
    affected = sorted(
        r["part"]
        for r in codes.join(F.broadcast(tomb), "neighbor_id")
        .select("part")
        .distinct()
        .collect()
    )
    if affected:
        remain = (
            spark.read.parquet(codes_dir)
            .filter(F.col("part").isin(affected))
            .join(F.broadcast(tomb), "neighbor_id", "left_anti")
        )
        # parquet can't lazily overwrite its own input: stage the
        # surviving rows, then swap the affected partition dirs
        staging = f"{index_dir}/codes_staging"
        remain.write.partitionBy("part").mode("overwrite").parquet(staging)
        for p in affected:
            dst = os.path.join(codes_dir, f"part={p}")
            src = os.path.join(staging, f"part={p}")
            shutil.rmtree(dst, ignore_errors=True)
            if os.path.isdir(src):
                os.replace(src, dst)
        shutil.rmtree(staging, ignore_errors=True)
        # Deleting EVERY vector may empty every partition — leave a
        # zero-row schema-carrying file so reads keep working (the
        # GDPR delete-all end state; see bm25's _ensure_nonempty_dir).
        if not any(
            f.endswith(".parquet")
            for _r, _d, fs in os.walk(codes_dir)
            for f in fs
        ):
            spark.createDataFrame([], codes.schema).write.mode(
                "overwrite"
            ).parquet(codes_dir)
    shutil.rmtree(f"{index_dir}/tombstones", ignore_errors=True)
    return len(affected)

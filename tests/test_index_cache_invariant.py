"""Pin the `_INDEX_CACHE` invalidation invariant (round-13, verdict r12
task 3): every PUBLIC mutator of a persisted ANN index must change
`_index_version(index_dir)` across the call, so the stat-based session
cache can never serve stale centroids/codebooks/codes after a mutation.
Today every mutator happens to rewrite a top-level entry; the recursive
listing version makes the invariant structural (a future rewrite that
only swaps files inside a codes/part=N partition dir still bumps it),
and this test keeps it pinned rather than incidental.

Also pins the round-13 ADVICE hardening: unversionable paths (URI
schemes, unstatable dirs) must BYPASS the cache, never hit it."""

from __future__ import annotations

import math
import time

from pyspark.sql import functions as F

from sparkgraft.sinks.ann_index import (
    _INDEX_CACHE,
    _index_version,
    append_ann_index,
    compact_ann_index,
    delete_ann_index,
    ivfpq_topk_indexed,
    read_ann_index,
    write_ann_index,
)


def _vectors(spark, n=40, dim=8, offset=0):
    rows = [
        (
            i + offset,
            [
                round(math.sin(0.7 * (i + offset) + 1.3 * d) + (i % 3), 6)
                for d in range(dim)
            ],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _meta(dim=8, m=4, k=3):
    cents = [
        (c, [float(c + 1) * (0.5 + 0.1 * d) for d in range(dim)])
        for c in range(k)
    ]
    sub = dim // m
    cbs = [
        [(c, v[s * sub : (s + 1) * sub]) for c, v in cents]
        for s in range(m)
    ]
    return cents, cbs


def _settle():
    # mtime_ns resolution is filesystem-dependent; a short sleep keeps
    # the invariant test about the LISTING (names/sizes/mtimes), not
    # about whether two mutations can land in one clock tick.
    time.sleep(0.02)


def test_every_public_mutator_bumps_index_version(spark, tmp_path):
    idx = str(tmp_path / "idx")
    cents, cbs = _meta()

    assert _index_version(idx) is None  # not yet created → unversionable

    write_ann_index(idx, _vectors(spark), cents, cbs)
    v1 = _index_version(idx)
    assert v1 is not None

    _settle()
    append_ann_index(idx, _vectors(spark, n=10, offset=1000))
    v2 = _index_version(idx)
    assert v2 != v1, "append_ann_index must bump the version"

    _settle()
    delete_ann_index(spark, idx, [3, 5, 1003])
    v3 = _index_version(idx)
    assert v3 != v2, "delete_ann_index must bump the version"

    _settle()
    n = compact_ann_index(spark, idx)
    v4 = _index_version(idx)
    assert n > 0 and v4 != v3, "compact_ann_index must bump the version"

    _settle()
    write_ann_index(idx, _vectors(spark, n=20), cents, cbs)
    v5 = _index_version(idx)
    assert v5 != v4, "write_ann_index (rebuild) must bump the version"


def test_partition_internal_rewrite_bumps_version(spark, tmp_path):
    """The exact future-mutation shape the r12 verdict warned about: a
    rewrite that replaces files INSIDE one codes/part=N dir without
    touching any top-level entry must still change the version (the
    recursive listing sees the file's new mtime/size)."""
    import os

    idx = str(tmp_path / "idx")
    cents, cbs = _meta()
    write_ann_index(idx, _vectors(spark), cents, cbs)
    v1 = _index_version(idx)

    part_dirs = [
        os.path.join(idx, "codes", d)
        for d in os.listdir(os.path.join(idx, "codes"))
        if d.startswith("part=")
    ]
    pq = [
        os.path.join(part_dirs[0], f)
        for f in os.listdir(part_dirs[0])
        if f.endswith(".parquet")
    ][0]
    _settle()
    # simulate an in-partition swap: replace the file via rename, the
    # way any real writer lands data (temp + atomic rename)
    tmp = pq + ".swap"
    with open(pq, "rb") as fh:
        data = fh.read()
    with open(tmp, "wb") as fh:
        fh.write(data)
    os.replace(tmp, pq)
    assert _index_version(idx) != v1


def test_cache_serves_fresh_results_after_each_mutation(spark, tmp_path):
    """End-to-end: serving through read_ann_index's cache reflects every
    mutation (the behavior the version invariant exists to guarantee)."""
    idx = str(tmp_path / "idx")
    cents, cbs = _meta()
    vecs = _vectors(spark)
    write_ann_index(idx, vecs, cents, cbs)
    q = vecs.filter(F.col("vec_id") < 3)

    def ids():
        return {
            r["neighbor_id"]
            for r in ivfpq_topk_indexed(q, idx, nprobe=2, k=3, shortlist=10)
            .select("neighbor_id")
            .collect()
        }

    base = ids()
    assert base
    # warm hit: same version → same driver objects, no reread
    c1, b1, _ = read_ann_index(spark, idx)
    c2, b2, _ = read_ann_index(spark, idx)
    assert c1 is c2 and b1 is b2

    _settle()
    delete_ann_index(spark, idx, sorted(base))
    after = ids()
    assert after.isdisjoint(base), "cached serve must see the delete"


def test_unversionable_paths_bypass_cache(spark, tmp_path):
    """ADVICE r12 (medium): URI-scheme paths and unstatable dirs must
    return version None and never enter the cache — a remote index
    whose os.stat always fails would otherwise pin version
    (0,0,0,0,0) forever and serve stale metadata for the app's life."""
    assert _index_version("hdfs://nn/warehouse/idx") is None
    assert _index_version("s3a://bucket/idx") is None
    assert _index_version("file:///somewhere/idx") is None
    assert _index_version(str(tmp_path / "never_created")) is None

    idx = str(tmp_path / "idx")
    cents, cbs = _meta()
    write_ann_index(idx, _vectors(spark, n=12), cents, cbs)
    before = dict(_INDEX_CACHE)
    # reading via the file: URI works through Spark but must not cache
    read_ann_index(spark, "file://" + idx)
    assert all(
        not k[2].startswith("file://") for k in _INDEX_CACHE
    ), "unversionable path must bypass the cache"
    # and must not have evicted unrelated live entries
    for k in before:
        assert k in _INDEX_CACHE

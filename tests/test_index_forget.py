"""Index unlearning (round 7): deleting ids from the persisted ANN and
BM25 indexes must serve BIT-IDENTICALLY to indexes rebuilt over the
corpus minus those ids — logically (tombstones) and physically
(compaction) — including BM25's global idf shift."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkgraft.sinks.ann_index import (
    compact_ann_index,
    delete_ann_index,
    ivfpq_topk_indexed,
    write_ann_index,
)
from sparkgraft.sinks.bm25_index import (
    append_bm25_index,
    bm25_topk_indexed,
    compact_bm25_index,
    delete_bm25_index,
    write_bm25_index,
)


def _vectors(spark, n=60, dim=8):
    import math

    rows = [
        (
            i,
            [
                round(math.sin(0.7 * i + 1.3 * d) + (i % 3), 6)
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


def _serve_ann(vecs, idx):
    return sorted(
        tuple(r)
        for r in ivfpq_topk_indexed(
            vecs.filter(F.col("vec_id") < 5), idx, nprobe=2, k=3,
            shortlist=10,
        ).collect()
    )


def test_ann_delete_equals_rebuild_and_compact_is_physical(
    spark, tmp_path
):
    vecs = _vectors(spark)
    cents, cbs = _meta()
    gone = [7, 11, 29]

    idx = str(tmp_path / "idx")
    write_ann_index(idx, vecs, cents, cbs)
    delete_ann_index(spark, idx, gone)

    rebuilt = str(tmp_path / "rebuilt")
    write_ann_index(
        rebuilt, vecs.filter(~F.col("vec_id").isin(gone)), cents, cbs
    )

    logical = _serve_ann(vecs, idx)
    assert logical == _serve_ann(vecs, rebuilt)
    assert all(r[1] not in gone for r in logical)

    n_parts = compact_ann_index(spark, idx)
    assert n_parts >= 1
    assert _serve_ann(vecs, idx) == logical
    # physically gone: no tombstones left, no deleted id in the codes
    import os

    assert not os.path.isdir(f"{idx}/tombstones")
    left = {
        r["neighbor_id"]
        for r in spark.read.parquet(f"{idx}/codes")
        .select("neighbor_id")
        .collect()
    }
    assert left.isdisjoint(gone)
    # idempotent / empty cases
    assert compact_ann_index(spark, idx) == 0


def _docs(spark):
    rows = [
        (0, "spark join hash join shuffle"),
        (1, "hash table probe build hash"),
        (2, "vector index scan"),
        (3, "join vector hash vector"),
        (4, ""),  # empty doc: no postings, but counts in n_docs/avgdl
        (5, "broadcast join plan"),
        (6, "hash hash hash hash"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _serve_bm25(spark, idx):
    return sorted(
        tuple(r)
        for r in bm25_topk_indexed(
            spark, idx, ["hash", "join"], k=10, n_buckets=8
        ).collect()
    )


def test_bm25_delete_shifts_idf_exactly_like_rebuild(spark, tmp_path):
    docs = _docs(spark)
    gone = [1, 4, 6]  # includes the EMPTY doc (live-docs accounting)

    idx = str(tmp_path / "idx")
    write_bm25_index(idx, docs, n_buckets=8)
    delete_bm25_index(spark, idx, gone, n_buckets=8)

    rebuilt = str(tmp_path / "rebuilt")
    write_bm25_index(
        rebuilt, docs.filter(~F.col("doc_id").isin(gone)), n_buckets=8
    )

    logical = _serve_bm25(spark, idx)
    assert logical == _serve_bm25(spark, rebuilt)
    assert all(r[0] not in gone for r in logical)
    # n_docs/avgdl shifted: stats must equal the rebuilt index's
    s = spark.read.parquet(f"{idx}/stats").first()
    s2 = spark.read.parquet(f"{rebuilt}/stats").first()
    assert (s["n_docs"], s["sum_dl"]) == (s2["n_docs"], s2["sum_dl"])

    removed = compact_bm25_index(spark, idx)
    assert removed > 0
    assert _serve_bm25(spark, idx) == logical
    import os

    assert not os.path.isdir(f"{idx}/tombstones")
    left = {
        r["id"]
        for r in spark.read.parquet(f"{idx}/postings").select("id").collect()
    }
    assert left.isdisjoint(gone)
    assert compact_bm25_index(spark, idx) == 0


def test_bm25_delete_then_append_composes(spark, tmp_path):
    """The maintenance ops compose: delete then append serves exactly
    like a rebuild over (corpus - deleted + appended)."""
    docs = _docs(spark)
    extra = spark.createDataFrame(
        [(10, "join hash fresh append"), (11, "vector probe")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    write_bm25_index(idx, docs, n_buckets=8)
    delete_bm25_index(spark, idx, [0, 6], n_buckets=8)
    append_bm25_index(idx, extra, n_buckets=8)

    rebuilt = str(tmp_path / "rebuilt")
    write_bm25_index(
        rebuilt,
        docs.filter(~F.col("doc_id").isin([0, 6])).unionByName(extra),
        n_buckets=8,
    )
    assert _serve_bm25(spark, idx) == _serve_bm25(spark, rebuilt)


def test_bm25_delete_is_idempotent(spark, tmp_path):
    """Regression: re-deleting an already-tombstoned (not yet
    compacted) id must not decrement df/stats a second time — the
    overlapping-GDPR-batch case."""
    docs = _docs(spark)
    idx = str(tmp_path / "idx")
    write_bm25_index(idx, docs)
    delete_bm25_index(spark, idx, [0])
    s1 = spark.read.parquet(f"{idx}/stats").first()
    t1 = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{idx}/terms").select("term", "df").collect()
    )
    # overlapping batch re-deletes 0 alongside a fresh id
    delete_bm25_index(spark, idx, [0, 2])
    s2 = spark.read.parquet(f"{idx}/stats").first()
    assert s2["n_docs"] == s1["n_docs"] - 1  # only doc 2 newly gone
    # doc 0's terms were NOT decremented again: 'hash' df reflects a
    # single removal of doc 0 plus nothing from doc 2
    rebuilt = str(tmp_path / "rebuilt")
    write_bm25_index(rebuilt, docs.filter(~F.col("doc_id").isin(0, 2)))
    t2 = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{idx}/terms").select("term", "df").collect()
    )
    tr = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{rebuilt}/terms").select("term", "df").collect()
    )
    assert t2 == tr and t1 != t2
    # fully-redundant batch is a complete no-op
    delete_bm25_index(spark, idx, [0, 2])
    assert sorted(
        tuple(r)
        for r in spark.read.parquet(f"{idx}/terms").select("term", "df").collect()
    ) == tr


def test_bm25_delete_every_doc_keeps_index_readable(spark, tmp_path):
    """Regression: the delete-all end state used to leave file-less
    terms/postings dirs that later reads couldn't infer a schema
    from."""
    docs = _docs(spark)
    idx = str(tmp_path / "idx")
    write_bm25_index(idx, docs)
    delete_bm25_index(spark, idx, list(range(7)))
    assert spark.read.parquet(f"{idx}/terms").count() == 0
    assert bm25_topk_indexed(spark, idx, ["hash", "join"]).count() == 0
    removed = compact_bm25_index(spark, idx)
    assert removed > 0
    assert spark.read.parquet(f"{idx}/postings").count() == 0
    assert bm25_topk_indexed(spark, idx, ["hash"]).count() == 0
    s = spark.read.parquet(f"{idx}/stats").first()
    assert (s["n_docs"], s["sum_dl"]) == (0, 0)


def test_bm25_delete_ignores_wrong_caller_n_buckets(spark, tmp_path):
    """Regression: the index's bucket count is persisted at build time;
    a destructive rewrite (delete) or a serve passing a DIFFERENT
    n_buckets must use the layout's value, not the caller's."""
    docs = _docs(spark)
    idx = str(tmp_path / "idx")
    write_bm25_index(idx, docs, n_buckets=128)
    expect = sorted(
        tuple(r)
        for r in bm25_topk_indexed(spark, idx, ["hash", "join"], k=5).collect()
    )
    # wrong n_buckets on serve: persisted value wins
    got = sorted(
        tuple(r)
        for r in bm25_topk_indexed(
            spark, idx, ["hash", "join"], k=5, n_buckets=16
        ).collect()
    )
    assert got == expect and len(got) > 0
    # wrong n_buckets on delete: terms stay bucketed per the layout
    delete_bm25_index(spark, idx, [6], n_buckets=16)
    rebuilt = str(tmp_path / "rebuilt")
    write_bm25_index(rebuilt, docs.filter(F.col("doc_id") != 6), n_buckets=128)
    a = sorted(
        tuple(r)
        for r in bm25_topk_indexed(spark, idx, ["hash", "join"], k=5).collect()
    )
    b = sorted(
        tuple(r)
        for r in bm25_topk_indexed(
            spark, rebuilt, ["hash", "join"], k=5
        ).collect()
    )
    assert a == b and len(a) > 0


def test_ann_delete_every_vector_and_named_dataframe_ids(spark, tmp_path):
    """Regression pair: delete_ann_index accepts a one-column DataFrame
    of any name, and compacting away EVERY vector leaves a readable
    (empty) codes table."""
    vecs = _vectors(spark, n=12)
    cents, cbs = _meta()
    idx = str(tmp_path / "idx")
    write_ann_index(idx, vecs, cents, cbs)
    delete_ann_index(
        spark, idx, vecs.select(F.col("vec_id"))  # named vec_id, not neighbor_id
    )
    compact_ann_index(spark, idx)
    assert spark.read.parquet(f"{idx}/codes").count() == 0
    assert (
        ivfpq_topk_indexed(
            vecs.filter(F.col("vec_id") < 2), idx, nprobe=2, k=3
        ).count()
        == 0
    )

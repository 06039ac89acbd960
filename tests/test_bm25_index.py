"""Persisted BM25 index: round-trip equality with the in-memory
operator, partition pruning on serve, bucket determinism."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from sparkgraft.operators.textops import bm25_rank
from sparkgraft.plans import audit
from sparkgraft.sinks.bm25_index import (
    _term_bucket,
    bm25_topk_indexed,
    write_bm25_index,
)

DOCS = [
    (1, "hash join vector store for fast retrieval"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "vector search with hash buckets and join plans"),
    (4, "join the hash club hash hash"),
    (5, "completely unrelated text about weather patterns"),
    (6, "sparse vector dense vector hybrid retrieval join"),
]


@pytest.fixture(scope="module")
def index_dir(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    d = tempfile.mkdtemp(prefix="bm25idx_test_")
    write_bm25_index(d, docs, n_buckets=16)
    return d


def test_roundtrip_matches_in_memory(spark, index_dir):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    mem = sorted(
        tuple(r) for r in bm25_rank(docs, ["hash", "join", "vector"], k=5).collect()
    )
    idx = sorted(
        tuple(r)
        for r in bm25_topk_indexed(
            spark, index_dir, ["hash", "join", "vector"], k=5, n_buckets=16
        ).collect()
    )
    # only 4 docs contain any query term, so top-5 returns 4
    assert mem == idx and len(mem) == 4


def test_serve_prunes_partitions(spark, index_dir):
    df = bm25_topk_indexed(
        spark, index_dir, ["hash"], k=3, n_buckets=16
    )
    plan = audit.explain_str(df)
    assert "PartitionFilters" in plan
    # the bucket predicate must appear inside the partition filters
    seg = plan.split("PartitionFilters", 1)[1][:200]
    assert "bucket" in seg, seg


def test_python_bucket_matches_spark(spark):
    terms = ["hash", "join", "vector", "weather", "fox"]
    df = spark.createDataFrame([(t,) for t in terms], "term string").select(
        "term", _term_bucket(F.col("term"), 16).alias("b")
    )
    got = {r["term"]: r["b"] for r in df.collect()}
    import hashlib

    for t in terms:
        expect = int.from_bytes(hashlib.md5(t.encode()).digest()[:2], "big") % 16
        assert got[t] == expect


def test_df_counts_are_document_frequencies(spark, index_dir):
    terms = spark.read.parquet(f"{index_dir}/terms")
    got = {r["term"]: r["df"] for r in terms.filter(
        F.col("term").isin(["hash", "vector", "the"])).collect()}
    assert got == {"hash": 3, "vector": 3, "the": 2}


def test_append_equals_full_rebuild(spark):
    import tempfile

    from sparkgraft.sinks.bm25_index import append_bm25_index

    old = spark.createDataFrame(DOCS[:4], "doc_id long, text string")
    new = spark.createDataFrame(DOCS[4:], "doc_id long, text string")
    both = spark.createDataFrame(DOCS, "doc_id long, text string")

    inc = tempfile.mkdtemp(prefix="bm25idx_inc_")
    write_bm25_index(inc, old, n_buckets=16)
    append_bm25_index(inc, new, n_buckets=16)
    full = tempfile.mkdtemp(prefix="bm25idx_full_")
    write_bm25_index(full, both, n_buckets=16)

    q = ["hash", "join", "vector", "retrieval"]
    got_inc = sorted(tuple(r) for r in
                     bm25_topk_indexed(spark, inc, q, k=6, n_buckets=16).collect())
    got_full = sorted(tuple(r) for r in
                      bm25_topk_indexed(spark, full, q, k=6, n_buckets=16).collect())
    assert got_inc == got_full and len(got_inc) > 0
    # df and stats merged exactly
    ti = {r["term"]: r["df"] for r in spark.read.parquet(f"{inc}/terms").collect()}
    tf = {r["term"]: r["df"] for r in spark.read.parquet(f"{full}/terms").collect()}
    assert ti == tf
    si = spark.read.parquet(f"{inc}/stats").first()
    sf_ = spark.read.parquet(f"{full}/stats").first()
    assert (si["n_docs"], si["sum_dl"]) == (sf_["n_docs"], sf_["sum_dl"])

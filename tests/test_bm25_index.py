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


def test_empty_append_keeps_partitioned_layout(spark):
    """ADVICE r8: an empty (or all-empty-text) append must not journal
    a root-level zero-row schema file into the live bucket-partitioned
    postings dir (a permanent mixed flat/partitioned layout)."""
    import glob
    import os

    from sparkgraft.sinks.bm25_index import append_bm25_index

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    d = tempfile.mkdtemp(prefix="bm25idx_empty_append_")
    write_bm25_index(d, docs, n_buckets=16)
    before = sorted(
        tuple(r)
        for r in bm25_topk_indexed(
            spark, d, ["hash", "join"], k=5, n_buckets=16
        ).collect()
    )
    empty = spark.createDataFrame([], "doc_id long, text string")
    append_bm25_index(d, empty, n_buckets=16)
    # no flat root-level parquet file beside the bucket=N dirs
    root_files = [
        f
        for f in glob.glob(os.path.join(d, "postings", "*.parquet"))
        if os.path.isfile(f)
    ]
    assert root_files == [], root_files
    # no leftover incoming dir, no journal
    assert not os.path.isdir(os.path.join(d, "postings_incoming"))
    assert not os.path.isfile(os.path.join(d, "_commit_journal"))
    after = sorted(
        tuple(r)
        for r in bm25_topk_indexed(
            spark, d, ["hash", "join"], k=5, n_buckets=16
        ).collect()
    )
    assert before == after


def test_read_artifact_snapshot_dedup_and_order(spark):
    """ADVICE r8: with a committed append journal, _live_paths lists
    incoming BEFORE live, and _read_artifact dedupes by root-relative
    path — a file present in both snapshots (journal apply moved it
    mid-listing) counts ONCE."""
    import json
    import os
    import shutil

    from sparkgraft.sinks.bm25_index import _live_paths, _read_artifact

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    d = tempfile.mkdtemp(prefix="bm25idx_snapshot_")
    write_bm25_index(d, docs, n_buckets=16)
    live = os.path.join(d, "postings")
    inc = os.path.join(d, "postings_incoming")
    # simulate a committed-but-unapplied append whose files are mid-move:
    # one live part file also still has its incoming twin (same relpath)
    n_live = _read_artifact(spark, d, "postings").count()
    src = None
    for root, _dirs, files in os.walk(live):
        for f in files:
            if f.endswith(".parquet"):
                src = (root, f)
                break
        if src:
            break
    rel = os.path.relpath(src[0], live)
    os.makedirs(os.path.join(inc, rel), exist_ok=True)
    shutil.copy2(
        os.path.join(src[0], src[1]), os.path.join(inc, rel, src[1])
    )
    with open(os.path.join(d, "_commit_journal"), "w") as f:
        json.dump({"staged": [], "clear": [], "append": ["postings"]}, f)
    try:
        paths = _live_paths(d, "postings")
        assert paths == [inc, live]  # incoming first
        n_union = _read_artifact(spark, d, "postings").count()
        assert n_union == n_live  # deduped, not double-counted
    finally:
        os.remove(os.path.join(d, "_commit_journal"))
        shutil.rmtree(inc, ignore_errors=True)


def test_read_artifact_fileless_dir_raises(spark):
    """ADVICE r8: a root with no parquet files raises FileNotFoundError
    instead of Spark's misleading 'Unable to infer schema'."""
    import os

    d = tempfile.mkdtemp(prefix="bm25idx_fileless_")
    os.makedirs(os.path.join(d, "terms"))
    from sparkgraft.sinks.bm25_index import _read_artifact

    with pytest.raises(FileNotFoundError):
        _read_artifact(spark, d, "terms")

"""Edge cases for text operators: short docs, empty shingles, dedup
behavior on degenerate inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkgraft.operators import textops as T


def test_short_docs_produce_empty_shingles(spark):
    df = spark.createDataFrame(
        [(1, "one two"), (2, "a"), (3, "x y z w")], "doc_id long, text string"
    )
    out = df.select(
        "doc_id",
        F.size(T.word_shingles(T.tokenize(F.col("text")), 3)).alias("n"),
    ).collect()
    got = {r["doc_id"]: r["n"] for r in out}
    assert got == {1: 0, 2: 0, 3: 2}


def test_minhash_ignores_sub_threshold_pairs(spark):
    # Disjoint vocab docs: no pair may survive the jaccard verify.
    df = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff"), (2, "gg hh ii jj kk ll")],
        "doc_id long, text string",
    )
    pairs = T.minhash_dedup_pairs(df, shingle_k=2, num_hashes=4, bands=2)
    assert pairs.count() == 0


def test_minhash_finds_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over dogs"),
         (2, "the quick brown fox jumps over dogs"),
         (3, "completely different words here now ok")],
        "doc_id long, text string",
    )
    rows = T.minhash_dedup_pairs(df, shingle_k=2, num_hashes=4, bands=2).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in rows] == [(1, 2, 1.0)]


def test_jaccard_empty_sets_is_zero(spark):
    df = spark.createDataFrame([(1,)], "id long")
    v = df.select(
        T.jaccard(
            F.array().cast("array<string>"), F.array().cast("array<string>")
        ).alias("j")
    ).collect()[0]["j"]
    assert v == 0.0


def test_lang_id_unknown_on_no_stopwords(spark):
    df = spark.createDataFrame([(1, "zz qq ww")], "doc_id long, text string")
    assert T.lang_id(df).collect()[0]["pred_lang"] == "unknown"


def test_fingerprint_short_text(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    r = T.fingerprint(df, k=8).collect()[0]
    assert r["fingerprint"] is None and r["n_shingles"] == 0

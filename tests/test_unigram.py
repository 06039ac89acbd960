"""Unigram-LM tokenizer: Viterbi correctness, coverage, learning on a
repetitive corpus, partitioning independence, segmentation shape."""

from __future__ import annotations

from sparkgraft.operators.unigram import (
    _viterbi,
    seed_pieces,
    train_unigram,
    unigram_segment,
)
from sparkgraft.operators.bpe import word_vocab


def test_viterbi_prefers_high_score_pieces():
    scores = {"a": -100, "b": -100, "ab": -50, "abc": -30, "c": -100}
    assert _viterbi("abc", scores, 6) == ["abc"]
    assert _viterbi("abab", scores, 6) == ["ab", "ab"]
    # concatenation invariant
    for w in ("abc", "abab", "cab", "bca"):
        assert "".join(_viterbi(w, scores, 6)) == w


def test_viterbi_tie_breaks_fewer_tokens():
    # "ab"+"c" and "a"+"bc" tie on score; "abc" absent — fewer tokens
    # can't break the 2-2 tie, so the longer FINAL piece wins: a+bc
    scores = {"a": -10, "b": -10, "c": -10, "ab": -20, "bc": -20}
    assert _viterbi("abc", scores, 6) == ["a", "bc"]


def corpus(spark):
    rows = [
        (i, "the cat sat on the mat " * 3) for i in range(20)
    ] + [(100 + i, "unigram models segment text") for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_seed_contains_all_chars_and_frequent_substrings(spark):
    docs = corpus(spark)
    seed = {
        r["piece"] for r in seed_pieces(word_vocab(docs), 6, 200).collect()
    }
    for ch in "thecatsonm":
        assert ch in seed
    assert "the" in seed and "cat" in seed


def test_train_learns_repeated_words_and_segments(spark):
    docs = corpus(spark)
    pieces = train_unigram(docs, vocab_size=64, iters=2)
    vocab = {r["piece"]: r["freq"] for r in pieces.collect()}
    # whole frequent words survive as pieces
    assert "the" in vocab and "cat" in vocab
    seg = unigram_segment(docs, pieces)
    rows = seg.collect()
    assert all(r["n_tokens"] > 0 for r in rows)
    # compression: frequent words tokenize as single pieces, so the
    # repetitive docs land near 1 token/word ≈ >3 chars per token
    rep = [r for r in rows if int(r["doc_id"]) < 100]
    assert all(r["chars_per_token"] > 3.0 for r in rep)


def test_train_partitioning_independent(spark):
    docs = corpus(spark)
    a = sorted(
        tuple(r)
        for r in train_unigram(docs.repartition(1), vocab_size=64, iters=2).collect()
    )
    b = sorted(
        tuple(r)
        for r in train_unigram(docs.repartition(11), vocab_size=64, iters=2).collect()
    )
    assert a == b


def test_single_chars_never_pruned(spark):
    docs = corpus(spark)
    pieces = train_unigram(docs, vocab_size=8, iters=2)  # brutal prune
    singles = {r["piece"] for r in pieces.collect() if len(r["piece"]) == 1}
    for ch in "thecatsonm":
        assert ch in singles

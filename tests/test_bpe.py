"""BPE trainer/segmenter tests: hand-computed merges on the classic
toy corpus, greedy-fold edge cases, tie-break determinism, and
segment counts against a pure-Python reference."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from sparkgraft.operators.bpe import (
    END,
    _apply_merge,
    bpe_segment,
    train_bpe,
    word_vocab,
)


def py_train(texts: list[str], k: int):
    """Reference BPE trainer (greedy leftmost fold application)."""
    vocab = collections.Counter(w for t in texts for w in t.split() if w)
    seqs = {w: list(w) + [END] for w in vocab}
    rules = []
    for rank in range(1, k + 1):
        pc: collections.Counter = collections.Counter()
        for w, n in vocab.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += n
        if not pc:
            break
        best = max(pc.items(), key=lambda kv: (kv[1], tuple(-ord(c) for c in "\x1f".join(kv[0]))))
        # max with inverted char ordering == min string; do it directly:
        top = max(pc.values())
        cands = [p for p, c in pc.items() if c == top]
        pair = min(cands, key=lambda p: p[0] + "\x1f" + p[1])
        cnt = pc[pair]
        if cnt < 2:
            break
        rules.append((rank, pair[0], pair[1], cnt))
        a, b = pair
        for w in seqs:
            s = seqs[w]
            out = []
            for t in s:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            seqs[w] = out
    return rules, seqs, vocab


def test_classic_corpus_merges(spark):
    texts = ["low low low lower lower newest newest newest newest widest"]
    df = spark.createDataFrame([(1, texts[0])], "doc_id int, text string")
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in train_bpe(df, n_merges=6).orderBy("rank").collect()
    ]
    exp, _, _ = py_train(texts, 6)
    assert got == exp
    # Sanity on the classic result: 'es' or similar high-freq pair first.
    assert got[0][3] >= 5


def test_fold_overlapping_pair(spark):
    # 'aaa' + merge (a,a) -> [aa, a, </w>]: greedy leftmost, no overlap.
    df = spark.createDataFrame([(["a", "a", "a"],)], "syms array<string>")
    out = df.select(_apply_merge(F.col("syms"), "a", "a").alias("m")).first()["m"]
    assert out == ["aa", "a"]


def test_tie_break_is_lexicographic(spark):
    # All four pairs occur exactly twice; (a, </w>) sorts first on the
    # \x1f-joined pair string.
    df = spark.createDataFrame(
        [(1, "ba ba dc dc")], "doc_id int, text string"
    )
    first = train_bpe(df, n_merges=1).collect()[0]
    assert (first["left"], first["right"]) == ("a", END)


def test_early_stop_when_no_repeats(spark):
    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id int, text string")
    # Every adjacent pair occurs once -> zero merges learned.
    assert train_bpe(df, n_merges=5).count() == 0


def test_segment_matches_python_reference(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the the the quick quick brown",
        "unrelated words here",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    merges = train_bpe(df, n_merges=5)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_chars"])
        for r in bpe_segment(df, merges).collect()
    }
    _, seqs, _ = py_train(texts, 5)
    for i, t in enumerate(texts):
        exp_tokens = sum(len(seqs[w]) for w in t.split() if w)
        assert got[str(i)] == (exp_tokens, len(t))


def test_word_vocab_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, " b  c ")], "doc_id int, text string"
    )
    rows = {r["word"]: r["n"] for r in word_vocab(df).collect()}
    assert rows == {"a": 2, "b": 2, "c": 1}
    syms = {
        r["word"]: r["syms"]
        for r in word_vocab(df).collect()
    }
    assert syms["a"] == ["a", END]

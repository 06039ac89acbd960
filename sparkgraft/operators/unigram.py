"""Unigram-LM tokenizer (Kudo 2018, the SentencePiece unigram model) —
the second tokenizer-training family beside BPE (operators/bpe.py),
built on the same Spark-first discipline: training never iterates over
the corpus.

One corpus pass builds the frequency-weighted DISTINCT-WORD table
(bpe.word_vocab); seeding and every hard-EM iteration run on that
table alone:

- seed: all word substrings up to ``max_piece_len`` explode from the
  word table (weighted by word frequency), a map-side-combined groupBy
  keeps the ``max_vocab`` most frequent — plus every single character,
  which guarantees coverage.
- E-step: Viterbi-segment each distinct word under the current piece
  scores (an Arrow kernel; the piece table is a driver-bounded
  broadcast, the same class as the BPE merge table or IVF centroids).
- M-step: piece usage counts (weighted by word frequency) become the
  new scores; the vocabulary prunes toward ``vocab_size`` by dropping
  the lowest-count multi-character pieces (single chars never prune).

Determinism: scores are integer-quantized log-probabilities (1e6
fixed point) so Viterbi compares integers; DP ties break on fewer
tokens, then on lexicographically-greatest piece at the split point —
a total order, so the learned vocabulary and every segmentation are
bit-stable under any partitioning.  Iterative + driver-held state →
rows-only queries (the holt_forecast/BPE-merges class).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkgraft.operators.stats import exact_ratio

from sparkgraft.operators.bpe import word_vocab


def _viterbi(word: str, scores: dict[str, int], max_len: int):
    """Best segmentation of ``word`` under integer piece scores:
    maximize sum(score) with ties broken by fewer tokens, then by
    preferring the longer final piece.  Returns the piece list.
    Single characters are assumed present (coverage)."""
    n = len(word)
    # dp[i] = (total_score, -n_tokens, path) best for prefix w[:i]
    NEG = float("-inf")
    dp: list[tuple[float, int, list[str]] | None] = [None] * (n + 1)
    dp[0] = (0, 0, [])
    for i in range(1, n + 1):
        best = None
        for ln in range(1, min(max_len, i) + 1):
            piece = word[i - ln : i]
            sc = scores.get(piece)
            if sc is None or dp[i - ln] is None:
                continue
            prev = dp[i - ln]
            cand = (prev[0] + sc, prev[1] - 1, piece)
            # higher score wins; then fewer tokens; then longer piece
            # (piece length ties are impossible at fixed i)
            if best is None or (cand[0], cand[1], len(cand[2])) > (
                best[0],
                best[1],
                len(best[2]),
            ):
                best = cand
        if best is None:
            # unseen char (can't happen after seeding, but stay total)
            prev = dp[i - 1]
            best = (prev[0] + -10**9, prev[1] - 1, word[i - 1])
        dp[i] = (best[0], best[1], dp[i - len(best[2])][2] + [best[2]])
    return dp[n][2]


def seed_pieces(
    vocab: DataFrame, max_piece_len: int = 6, max_vocab: int = 4096
) -> DataFrame:
    """Seed vocabulary from the word table: every substring up to
    ``max_piece_len`` weighted by word frequency; the ``max_vocab``
    heaviest multi-char pieces plus ALL single characters.  One
    explode + map-side-combined aggregate — shuffle carries (piece,
    partial count), never words."""
    # substring enumeration needs substr(word, i, ln) with both lambda
    # variables — SQL expr is the clear way to write the nested lambda
    pieces = vocab.select(
        F.col("n"),
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(1, length(word)), i ->
                    transform(sequence(1, least({max_piece_len},
                                                length(word) - i + 1)),
                              ln -> substring(word, i, ln))))"""
            )
        ).alias("piece"),
    )
    counts = pieces.groupBy("piece").agg(F.sum("n").alias("cnt"))
    chars = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter(F.length("piece") > 1)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(max_vocab)
    )
    return chars.unionByName(multi)


def _scores_from_counts(rows: list[tuple[str, int]]) -> dict[str, int]:
    total = sum(c for _, c in rows)
    return {
        p: int(round(math.log(c / total) * 10**6)) for p, c in rows if c > 0
    }


def train_unigram(
    docs: DataFrame,
    vocab_size: int = 512,
    iters: int = 3,
    max_piece_len: int = 6,
    max_seed_vocab: int = 4096,
    shrink_num: int = 4,
    shrink_den: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hard-EM unigram-LM fit.  Returns the piece table
    ``(piece, freq, score_scaled)`` — freq is the final Viterbi usage
    count, score_scaled the 1e6-quantized log-probability the
    segmenter consumes.  Driver state is the piece dict only."""
    import pandas as pd

    spark = docs.sparkSession
    vocab = word_vocab(docs, id_col, text_col).select("word", "n").persist()
    vocab.count()
    seed = seed_pieces(vocab, max_piece_len, max_seed_vocab).collect()
    pieces = [(r["piece"], int(r["cnt"])) for r in seed]
    scores = _scores_from_counts(pieces)

    def count_usage(score_map: dict[str, int]) -> list[tuple[str, int]]:
        def kernel(batches):
            memo: dict[str, list[str]] = {}
            for pdf in batches:
                agg: dict[str, int] = {}
                for w, n in zip(pdf["word"], pdf["n"]):
                    segs = memo.get(w)
                    if segs is None:
                        segs = _viterbi(w, score_map, max_piece_len)
                        memo[w] = segs
                    for p in segs:
                        agg[p] = agg.get(p, 0) + int(n)
                yield pd.DataFrame(
                    {"piece": list(agg), "cnt": list(agg.values())}
                )

        out = vocab.mapInPandas(kernel, "piece string, cnt long")
        return [
            (r["piece"], int(r["cnt"]))
            for r in out.groupBy("piece")
            .agg(F.sum("cnt").alias("cnt"))
            .collect()
        ]

    seed_chars = {p for p, _ in pieces if len(p) == 1}
    for it in range(iters):
        used = count_usage(scores)
        # prune toward vocab_size: keep single chars + heaviest multis.
        # Coverage floor: a char absorbed into larger pieces gets no
        # Viterbi usage, but must stay in the vocabulary (count 1 → a
        # deeply negative score) or unseen words become unsegmentable.
        used_map = dict(used)
        chars = [
            (p, max(used_map.get(p, 0), 1)) for p in sorted(seed_chars)
        ]
        multis = sorted(
            ((p, c) for p, c in used if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        target = max(
            vocab_size - len(chars), len(multis) * shrink_num // shrink_den
        )
        if it == iters - 1:
            target = max(0, vocab_size - len(chars))
        pieces = chars + multis[:target]
        scores = _scores_from_counts(pieces)
    vocab.unpersist()
    rows = sorted(pieces, key=lambda pc: (-pc[1], pc[0]))
    return spark.createDataFrame(
        [(p, c, scores[p]) for p, c in rows],
        "piece string, freq long, score_scaled long",
    )


def unigram_segment(
    docs: DataFrame,
    pieces: DataFrame,
    max_piece_len: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize with a learned unigram vocabulary: per doc, Viterbi
    token count and compression ratio — an Arrow kernel with per-batch
    word memoization (bpe_segment's serving shape)."""
    import pandas as pd

    score_map = {
        r["piece"]: int(r["score_scaled"]) for r in pieces.collect()
    }

    def seg(it):
        memo: dict[str, int] = {}
        for pdf in it:
            toks, chars = [], []
            for text in pdf["text"]:
                ws = [w for w in text.split() if w]
                t = 0
                for w in ws:
                    got = memo.get(w)
                    if got is None:
                        got = len(_viterbi(w, score_map, max_piece_len))
                        memo[w] = got
                    t += got
                toks.append(t)
                chars.append(len(text))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pd.Series(toks, dtype="int64"),
                    "n_chars": pd.Series(chars, dtype="int64"),
                }
            )

    src = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    out = src.mapInPandas(seg, "doc_id string, n_tokens long, n_chars long")
    return out.select(
        "doc_id",
        "n_tokens",
        "n_chars",
        exact_ratio(F.col("n_chars"), F.col("n_tokens"), 4).alias(
            "chars_per_token"
        ),
    )

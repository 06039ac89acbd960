"""Byte-pair-encoding trainer and segmenter — the tokenizer-training
leg of an LLM data pipeline (Sennrich et al. 2016), built Spark-first.

Training never iterates over the corpus: one corpus pass builds the
(word, count) vocabulary table (compact shuffle — distinct words, not
tokens), and every merge iteration runs on that table alone: adjacent
symbol pairs explode into (left, right, weight) rows, a map-side
combined ``groupBy`` picks the heaviest pair, and the merge applies as
a JVM-side ``aggregate`` fold over each word's symbol array.  The
driver loop holds only the merge table (``n_merges`` rows) — the
classic bounded iterative shape (PageRank template, graph.py), with a
``localCheckpoint`` every few iterations to keep the plan from
deepening linearly in the merge count.

Determinism: ties on pair weight break on the concatenated pair string
(``left \\x1f right``), which equals tuple ordering because the
separator byte (0x1f) sorts below every character that can appear in a
symbol (words are whitespace-split, so symbols never contain
whitespace or control bytes).  Greedy leftmost non-overlapping merge
application (the standard BPE rule) is implemented as a left fold, and
its oracle twin as delimiter-wrapped string ``replace`` — equivalence
is exercised by the unrolled DuckDB oracle in __spark_entry__.py.

Reference anchor: the reference engine has no tokenizer surface; this
extends the LLM-pipeline operator family mandated by the build brief
(token counting in textops.text_stats is the sibling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"  # unit separator: sorts below any symbol character
END = "</w>"  # end-of-word marker (never split further)


def _chars_plus_end(word: Column) -> Column:
    """Initial symbol sequence: one symbol per character + END marker."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.substring(word, i, 1),
    )
    return F.concat(chars, F.array(F.lit(END)))


def word_vocab(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One corpus pass -> (word, n, syms): the frequency-weighted word
    table every merge iteration runs on.  Shuffle volume is the
    distinct-word set, not the corpus."""
    words = docs.select(
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
    ).filter(F.length("word") > 0)
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("n"))
        .select("word", "n", _chars_plus_end(F.col("word")).alias("syms"))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair weights over the current symbol sequences."""
    pairs = vocab.select(
        F.col("n"),
        F.explode(
            F.zip_with(
                F.slice(F.col("syms"), 1, F.size("syms") - 1),
                F.slice(F.col("syms"), 2, F.size("syms") - 1),
                lambda a, b: F.struct(a.alias("left"), b.alias("right")),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right")).agg(
        F.sum("n").alias("pair_count")
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy leftmost non-overlapping merge of (left, right) -> one
    symbol, as a JVM-side left fold (no Python in the loop)."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, t: F.when(
            # F.get is out-of-bounds-null (vs element_at, which throws
            # under ANSI mode on the empty initial accumulator).
            (F.get(acc, F.size(acc) - 1) == F.lit(left))
            & (t == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(t))),
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules; returns the merge table
    (rank, left, right, pair_count) ordered by rank.  Stops early if
    the corpus runs out of repeated pairs."""
    spark = docs.sparkSession
    vocab = word_vocab(docs, id_col, text_col).persist()
    rules: list[tuple[int, str, str, int]] = []
    try:
        for rank in range(1, n_merges + 1):
            best = (
                _pair_counts(vocab)
                .orderBy(
                    F.desc("pair_count"),
                    F.concat_ws(SEP, "left", "right"),
                )
                .limit(1)
                .collect()
            )
            if not best or best[0]["pair_count"] < 2:
                break
            left, right, cnt = (
                best[0]["left"],
                best[0]["right"],
                int(best[0]["pair_count"]),
            )
            rules.append((rank, left, right, cnt))
            nxt = vocab.select(
                "word", "n", _apply_merge(F.col("syms"), left, right).alias("syms")
            )
            if rank % checkpoint_every == 0:
                nxt = nxt.localCheckpoint(eager=True)
            else:
                nxt = nxt.persist()
            nxt.count()  # materialize before dropping the parent
            vocab.unpersist()
            vocab = nxt
    finally:
        vocab.unpersist()
    return spark.createDataFrame(
        rules, "rank int, left string, right string, pair_count bigint"
    )


def bpe_segment(
    docs: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize with a learned merge table: per doc, the BPE symbol
    count and compression ratio vs raw characters.  The merge table is
    a bounded driver-side index (``n_merges`` rows — same class as the
    IVF centroid build); application is an Arrow-batched pandas kernel
    that replays merges in rank order per word, memoized across the
    batch's repeated words."""
    import pandas as pd

    rules = [
        (r["left"], r["right"])
        for r in merges.orderBy("rank").collect()
    ]

    def seg(it):
        memo: dict[str, int] = {}

        def word_tokens(w: str) -> int:
            got = memo.get(w)
            if got is not None:
                return got
            syms = list(w) + [END]
            for left, right in rules:
                out: list[str] = []
                for t in syms:
                    if out and out[-1] == left and t == right:
                        out[-1] = left + right
                    else:
                        out.append(t)
                syms = out
            memo[w] = len(syms)
            return len(syms)

        for pdf in it:
            toks = []
            chars = []
            for text in pdf["text"]:
                ws = [w for w in text.split() if w]
                toks.append(sum(word_tokens(w) for w in ws))
                chars.append(len(text))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pd.Series(toks, dtype="int64"),
                    "n_chars": pd.Series(chars, dtype="int64"),
                }
            )

    src = docs.select(
        F.col(id_col).cast("string").alias("doc_id"), F.col(text_col).alias("text")
    )
    out = src.mapInPandas(
        seg, "doc_id string, n_tokens long, n_chars long"
    )
    from sparkgraft.operators.stats import exact_ratio

    return out.select(
        "doc_id",
        "n_tokens",
        "n_chars",
        # Integer-ratio kernel, never round(double): n_chars/n_tokens
        # terminates ON the round(·,4) half-boundary for real docs
        # (boundary audit hit 1.19375), flipping between engines.
        exact_ratio(F.col("n_chars"), F.col("n_tokens"), 4).alias(
            "chars_per_token"
        ),
    )

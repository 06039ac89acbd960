"""Exact substring-level deduplication — the character-granular,
suffix-array-class dedup surface (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better"), re-expressed for Spark.

Semantics: a character position is *covered* when some length-``L``
character window containing it occurs more than once in the corpus
(multiplicity counts — a repeat inside one document counts too, exactly
like a suffix-array scan of the concatenated corpus).  Covered
positions are reported as maximal merged spans per document; callers
cut the spans or drop documents whose covered fraction is high.  This
fixed-``L`` window formulation is the span semantics ExactSubstr-style
pipelines apply (any duplicated substring of length >= L is a union of
duplicated L-windows, and every duplicated L-window is itself a
duplicated substring), and it is ANSI-SQL-expressible, which keeps the
operator oracle-checkable.

Architecture (the 100 TB shape):

1. **Shard-local window hashing** (grouped ``applyInPandas``): each
   shard holds a slice of the corpus; a numpy-vectorized double
   polynomial rolling hash (two 31-bit prime moduli -> one 62-bit key)
   fingerprints every L-window.  Raw text NEVER leaves the shard task —
   windows travel onward as compact ``(doc_id, start, int64)`` rows,
   ~16 bytes/char instead of L bytes/char for materialized substrings.
   The shard also counts its own hashes and marks windows already
   duplicated in-shard (``local_dup``) — at scale most duplicate mass
   is bursty/local, so those hashes skip the global count entirely.
2. **Cross-shard reconciliation**: one hash-partitioned shuffle of the
   compact stream + ``count(*) over (partition by h)`` flags duplicated
   windows — a single kernel pass end-to-end (see the plan note on
   :func:`duplicated_windows` for why this beats the two-tier
   local-confirm/global-count split).  The kernel still marks
   ``local_dup`` as a per-shard diagnostic.
3. **Island merge** (window function): covered window starts per doc
   collapse into maximal spans — a new span begins when the gap to the
   previous covered start exceeds L.  Shuffles ``(doc_id, start)``
   pairs only, bounded by the duplicated fraction.

Determinism: the double hash is a fixed pure function of the window
text (collision probability ~2^-62 per pair — vanishing at any corpus
size where pairs fit in an int64 count), shard assignment is
``crc32(doc_id)``, and every aggregate is order-independent.

Reference anchor: the reference engine has no substring dedup (its
dedup surface is content-hash D3 and name+size D4 —
DataConverterUDBF.py sha256 path); this operator is part of the
LLM-pipeline extension mandated by the build brief, with
``duplicate_spans`` (textops.py) as the token-granular sibling.
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkgraft.operators.stats import exact_ratio
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Two independent (base, modulus) pairs.  Moduli are 31-bit primes so a
# codepoint (< 2^21) times a coefficient (< 2^31) stays < 2^52 and a
# length-L integer dot product stays well inside exact int64 range.
_P1, _B1 = 2147483647, 1_000_003  # 2^31 - 1 (Mersenne), prime base
_P2, _B2 = 2147483629, 1_000_033


def _shard_window_hashes(min_len: int, stride: int = 1):
    """Build the per-shard kernel: every L-window of every doc in the
    shard -> (doc_id, start, h, local_dup).  ``start`` is 1-based
    character position (matching SQL ``substr``).

    ``stride`` > 1 enables the WINNOWING BUDGET MODE (Schleimer et al.
    2003 sliding-window minimizers): instead of every window, only the
    minimum-hash window of each ``stride``-wide sliding block is
    emitted — content-defined selection, so two copies of the same
    text select the SAME windows regardless of alignment.  Guarantee:
    every duplicated substring of length >= min_len + stride - 1
    shares at least one emitted window between its copies (each copy
    contains the same stride consecutive hashes, whose argmin is a
    pure function of the block).  Emitted/shuffled rows drop to the
    winnowing density 2/(stride+1) of the exact stream (measured at
    sf0.1: stride=4 keeps 0.40, stride=8 keeps 0.22 — SCALE.md); the
    recall bound is spans shorter than min_len + stride - 1 may be
    missed and span edges fuzz by up to stride - 1 characters.
    stride=1 is the exact mode (default)."""
    import numpy as np
    import pandas as pd

    L = min_len
    s = max(1, int(stride))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        ids: list[str] = []
        starts: list[np.ndarray] = []
        hashes: list[np.ndarray] = []
        # Weight vectors w_j = B^(L-1-j) mod p, shared across docs.
        w1 = np.empty(L, dtype=np.int64)
        w2 = np.empty(L, dtype=np.int64)
        acc1 = acc2 = 1
        for j in range(L - 1, -1, -1):
            w1[j] = acc1
            w2[j] = acc2
            acc1 = (acc1 * _B1) % _P1
            acc2 = (acc2 * _B2) % _P2
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            n = len(text)
            if n < L:
                continue
            # Exact codepoints, vectorized (handles non-ASCII).
            c = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(
                np.int64
            )
            win = np.lib.stride_tricks.sliding_window_view(c, L)
            h1 = (win @ w1) % _P1  # exact: elements < 2^52, sum < 2^57
            h2 = (win @ w2) % _P2
            h = h1 * _P2 + h2  # < 2^62, unique per (h1, h2)
            ids.append(doc_id)
            if s > 1:
                m = len(h)
                if m <= s:
                    sel = np.array([int(np.argmin(h))], dtype=np.int64)
                else:
                    blocks = np.lib.stride_tricks.sliding_window_view(h, s)
                    sel = np.unique(
                        np.argmin(blocks, axis=1)
                        + np.arange(m - s + 1, dtype=np.int64)
                    )
                starts.append((sel + 1).astype(np.int32))
                hashes.append(h[sel])
            else:
                starts.append(np.arange(1, n - L + 2, dtype=np.int32))
                hashes.append(h)
        if not ids:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=object),
                    "start": pd.Series([], dtype=np.int32),
                    "h": pd.Series([], dtype=np.int64),
                    "local_dup": pd.Series([], dtype=bool),
                }
            )
        out = pd.DataFrame(
            {
                "doc_id": np.repeat(
                    np.array(ids, dtype=object),
                    [len(s) for s in starts],
                ),
                "start": np.concatenate(starts),
                "h": np.concatenate(hashes),
            }
        )
        out["local_dup"] = out["h"].duplicated(keep=False)
        return out

    return kernel


def window_hashes_sharded(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 25,
    n_shards: int = 8,
    stride: int = 1,
) -> DataFrame:
    """Stage 1: compact (doc_id, start, h, local_dup) stream of every
    L-window, computed shard-locally so raw text never shuffles.  At
    cluster scale set ``n_shards`` ~ a few x executor count; each shard
    task holds only its slice of text plus an int64 hash column.
    ``stride`` > 1 = winnowing budget mode (see _shard_window_hashes):
    the stream thins to density 2/(stride+1); repeats shorter than
    min_len + stride - 1 may be missed."""
    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("start", IntegerType()),
            StructField("h", LongType()),
            StructField("local_dup", BooleanType()),
        ]
    )
    shard = F.crc32(F.col(id_col).cast("string")) % n_shards
    src = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(text_col).alias("text"),
        shard.alias("_shard"),
    )
    return src.groupBy("_shard").applyInPandas(
        _shard_window_hashes(min_len, stride), schema
    )


def duplicated_windows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 25,
    n_shards: int = 8,
    stride: int = 1,
) -> DataFrame:
    """Stage 2: (doc_id, start) of every L-window that occurs more than
    once in the corpus, via ``count(*) over (partition by h)`` — ONE
    kernel pass and ONE shuffle of the compact window stream.

    Plan note (measured): the tempting two-tier alternative — confirm
    in-shard duplicates locally and send only in-shard singletons to a
    global ``groupBy(h)`` + join — references the kernel output from
    three subtrees whose exchanges all differ (different pre-shuffle
    filters, and the aggregate's map-side partial combine), so Spark
    re-executes the Arrow kernel per subtree: 3x the dominant cost for
    a shuffle-volume saving that is smaller than one kernel pass at any
    scale.  The window-count form keeps the hash-partitioned exchange
    unique, so every window is hashed once and shuffled once.  A
    pathologically hot window hash (mega-repeated boilerplate) buffers
    one partition's rows in the window operator — spillable, and
    bounded by that hash's true occurrence list, which any exact-dedup
    formulation must materialize somewhere.
    """
    wins = window_hashes_sharded(
        docs, id_col, text_col, min_len, n_shards, stride
    )
    w = Window.partitionBy("h")
    return (
        wins.select("doc_id", "start", "h")
        .withColumn("n_occ", F.count("*").over(w))
        .filter(F.col("n_occ") > 1)
        .select("doc_id", "start")
    )


def exact_substring_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 25,
    n_shards: int = 8,
    stride: int = 1,
) -> DataFrame:
    """Maximal duplicated spans per document: one row per maximal run
    of covered positions — ``(doc_id, span_start, span_end, span_len,
    n_windows)``, 1-based inclusive character positions.  The ExactSubstr
    cut list.

    ``stride`` > 1 = winnowing budget mode: the per-char shuffle thins
    to density 2/(stride+1); every repeat of length >= min_len +
    stride - 1 is still detected (recall bound), span edges fuzz by up
    to stride - 1, and
    the island-merge gap widens to min_len + stride - 1 so one repeat
    region stays one span (selected minimizers are at most stride
    apart inside a repeat)."""
    cov = duplicated_windows(docs, id_col, text_col, min_len, n_shards, stride)
    w = Window.partitionBy("doc_id").orderBy("start")
    gap = F.col("start") - F.lag("start").over(w)
    gap_thresh = min_len + max(1, int(stride)) - 1
    brk = F.when(gap.isNull() | (gap > gap_thresh), 1).otherwise(0)
    isl = cov.select(
        "doc_id",
        "start",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("island"),
    )
    return (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("start").alias("span_start"),
            (F.max("start") + F.lit(min_len - 1)).alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .select(
            F.col("doc_id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
            "n_windows",
        )
    )


def substring_dedup_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 25,
    n_shards: int = 8,
    max_coverage: float = 0.5,
    stride: int = 1,
    spans: "DataFrame | None" = None,
) -> DataFrame:
    """Per-document duplication profile + keep/drop gate: span count,
    covered characters, longest span, covered fraction (4 decimals),
    ``keep = covered fraction <= max_coverage``.  Left join back to the
    corpus so clean documents appear with zeros — the downstream filter
    is a single ``WHERE keep``.

    ``spans``: a precomputed :func:`exact_substring_spans` table over
    the same corpus/min_len (e.g. checkpointed once and shared across
    the detect/gate/rewrite stages so the window-hash kernel runs one
    time, not once per consumer — the session span-table cache
    discipline).  Output is identical either way."""
    if spans is None:
        spans = exact_substring_spans(
            docs, id_col, text_col, min_len, n_shards, stride
        )
    per_doc = spans.groupBy(id_col).agg(
        F.count("*").alias("n_spans"),
        F.sum("span_len").alias("dup_chars"),
        F.max("span_len").alias("max_span_len"),
    )
    base = docs.select(
        F.col(id_col).cast("string").alias(id_col),
        F.length(text_col).alias("n_chars"),
    )
    # per_doc is corpus-scaled (one row per duplicated doc) — pin a
    # shuffled join so a size misestimate can't broadcast it.
    joined = base.join(per_doc.hint("merge"), id_col, "left").select(
        id_col,
        "n_chars",
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.coalesce("dup_chars", F.lit(0)).alias("dup_chars"),
        F.coalesce("max_span_len", F.lit(0)).alias("max_span_len"),
    )
    # Integer ratio -> exact HALF-UP kernel (round-9 boundary
    # discipline; round(double) flips between engines on exact
    # half-boundary rationals like 11/32).
    frac = exact_ratio(F.col("dup_chars"), F.col("n_chars"), 4)
    return joined.select(
        id_col,
        "n_chars",
        "n_spans",
        "dup_chars",
        "max_span_len",
        frac.alias("dup_fraction"),
        (frac <= max_coverage).alias("keep"),
    )


def longest_duplicated_substring(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 8,
) -> DataFrame:
    """Corpus-level longest repeated substring, found by distributed
    binary search: a length-``l`` duplicated window exists iff a
    length-``l'`` one exists for every ``l' <= l`` (any duplicated
    substring's sub-windows are duplicated), so the maximum length is
    the boundary of a monotone predicate.  Each probe is one compact
    Spark job (window hashes -> any-duplicate flag); ~log2(max_doc_len)
    probes total — the driver loop holds two integers, never data.

    Returns one row: (length, n_occurrences) of the longest duplicated
    substring, with (doc_id, start) of its lexicographically-first
    occurrence site for reproducibility.  Length 0 with nulls when the
    corpus has no duplicated character at all.
    """
    src = docs.select(
        F.col(id_col).cast("string").alias("doc_id"), F.col(text_col).alias("text")
    )
    src = src.persist()
    try:
        hi_row = src.agg(F.max(F.length("text"))).first()
        hi = int(hi_row[0] or 0)
        lo = 0  # invariant: a duplicated window of length `lo` exists (or lo==0)
        while lo < hi:
            mid = (lo + hi + 1) // 2
            has_dup = (
                window_hashes_sharded(src, "doc_id", "text", mid, n_shards)
                .groupBy("h")
                .agg(F.count("*").alias("n"))
                .filter(F.col("n") > 1)
                .limit(1)
                .count()
                > 0
            )
            if has_dup:
                lo = mid
            else:
                hi = mid - 1
        if lo == 0:
            return src.sparkSession.createDataFrame(
                [(0, None, None, None)],
                "length int, n_occurrences long, doc_id string, start int",
            )
        wins = window_hashes_sharded(src, "doc_id", "text", lo, n_shards)
        counts = wins.groupBy("h").agg(F.count("*").alias("n_occurrences"))
        best = (
            wins.join(counts.filter(F.col("n_occurrences") > 1), "h")
            .groupBy("h", "n_occurrences")
            .agg(
                F.min(F.struct("doc_id", "start")).alias("site"),
            )
            .orderBy(F.col("n_occurrences").desc(), F.col("site"))
            .limit(1)
            .select(
                F.lit(lo).alias("length"),
                "n_occurrences",
                F.col("site.doc_id").alias("doc_id"),
                F.col("site.start").alias("start"),
            )
        )
        return best
    finally:
        src.unpersist()


def _shard_of(doc_id: str, n_shards: int = 8) -> int:
    """Python twin of the shard assignment (for tests that plant
    cross-shard repeats deliberately)."""
    return zlib.crc32(doc_id.encode()) % n_shards


def _build_suffix_automaton(corpus: str):
    """Classic online suffix-automaton construction (Blumer et al.
    1985 form): returns (transitions, links, lengths) over the corpus
    string.  O(n) states/transitions; pure-Python dicts are fine at
    benchmark-set sizes (the corpus side never builds one)."""
    trans: list[dict[str, int]] = [{}]
    link: list[int] = [-1]
    length: list[int] = [0]
    last = 0
    for ch in corpus:
        cur = len(trans)
        trans.append({})
        link.append(-2)
        length.append(length[last] + 1)
        p = last
        while p != -1 and ch not in trans[p]:
            trans[p][ch] = cur
            p = link[p]
        if p == -1:
            link[cur] = 0
        else:
            q = trans[p][ch]
            if length[p] + 1 == length[q]:
                link[cur] = q
            else:
                clone = len(trans)
                trans.append(dict(trans[q]))
                link.append(link[q])
                length.append(length[p] + 1)
                while p != -1 and trans[p].get(ch) == q:
                    trans[p][ch] = clone
                    p = link[p]
                link[q] = clone
                link[cur] = clone
        last = cur
    return trans, link, length


def longest_benchmark_overlap(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bench_chars: int = 50_000_000,
) -> DataFrame:
    """Exact benchmark-contamination scan: per corpus document, the
    length of the LONGEST substring it shares with any benchmark
    document — the character-exact complement to n-gram
    `textops.decontaminate` (which thresholds on gram-hit ratio and
    can't tell one long verbatim leak from many short coincidences).

    Architecture: the benchmark side is small by definition (eval
    suites, not training corpora) — its text is collected once
    (bounded, enforced by ``max_bench_chars``) and shipped in the
    kernel closure; each executor builds ONE generalized suffix
    automaton over it (separator-joined, so matches never span
    benchmark docs) and every corpus document streams through the
    classic longest-match walk in O(len) — state (node, match length),
    suffix-link fallback on mismatch.  The corpus side is a single
    shuffle-free ``mapInPandas`` scan: this runs at 100 TB as one pass.

    Returns (id, n_chars, max_overlap, overlap_frac 4dp).  Iterative
    per-character recurrence — not SQL-expressible; verified against
    brute force in tests.
    """
    import pandas as pd

    texts = [r[0] for r in bench.select(text_col).collect()]
    total = sum(len(t) for t in texts)
    if total > max_bench_chars:
        raise ValueError(
            f"benchmark side is {total} chars (> {max_bench_chars}); "
            "the automaton side must be the small corpus"
        )
    corpus = "\x00".join(texts)

    def kernel(it):
        trans, link, length = _build_suffix_automaton(corpus)

        def longest(t: str) -> int:
            best = 0
            cur = 0
            l = 0
            for ch in t:
                while cur != 0 and ch not in trans[cur]:
                    cur = link[cur]
                    l = length[cur]
                if ch in trans[cur]:
                    cur = trans[cur][ch]
                    l += 1
                else:
                    cur = 0
                    l = 0
                if l > best:
                    best = l
            return best

        for pdf in it:
            ml = [longest(t) for t in pdf["text"]]
            n = [len(t) for t in pdf["text"]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_chars": pd.Series(n, dtype="int64"),
                    "max_overlap": pd.Series(ml, dtype="int64"),
                }
            )

    src = docs.select(
        F.col(id_col).cast("string").alias("id"), F.col(text_col).alias("text")
    )
    out = src.mapInPandas(kernel, "id string, n_chars long, max_overlap long")
    frac = F.when(
        F.col("n_chars") > 0,
        exact_ratio(F.col("max_overlap"), F.col("n_chars"), 4),
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col("id").alias(id_col),
        "n_chars",
        "max_overlap",
        frac.alias("overlap_frac"),
    )


def remove_duplicated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 25,
    n_shards: int = 8,
    spans: "DataFrame | None" = None,
) -> DataFrame:
    """The REWRITE step of ExactSubstr dedup (Lee et al. 2022,
    deduplicate-text-datasets `self-deduplicate`): cut every maximal
    duplicated span (:func:`exact_substring_spans`) out of its
    document and stitch the remainder — detection → gate → rewrite is
    the full pipeline, and this is the rewrite.

    Shape: spans aggregate per doc via ``collect_list`` (bounded —
    spans per doc, not windows), join back to the text (spillable
    sort-merge pinned: both sides scale with the corpus and the right
    side carries text), and an Arrow kernel applies the cuts.  Output:
    ``(doc_id, text_dedup, n_cut, chars_cut)``; docs with no
    duplicated span pass through unchanged.

    ``spans``: optional precomputed :func:`exact_substring_spans`
    table (see substring_dedup_stats) — lets detect → gate → rewrite
    share ONE kernel pass.
    """
    import pandas as pd

    if spans is None:
        spans = exact_substring_spans(
            docs, id_col, text_col, min_len, n_shards
        )
    cuts = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("cuts")
    )
    src = docs.select(
        F.col(id_col), F.col(text_col).alias("__text")
    ).join(cuts.hint("merge"), id_col, "left")

    # Carry the INPUT id column's name and dtype through — a hardcoded
    # 'doc_id long' silently breaks string/other id columns despite the
    # id_col parameter accepting them.
    id_type = src.schema[id_col].dataType.simpleString()

    def kernel(batches):
        for pdf in batches:
            out_text, n_cut, chars_cut = [], [], []
            for text, cut in zip(pdf["__text"], pdf["cuts"]):
                if cut is None or len(cut) == 0:
                    out_text.append(text)
                    n_cut.append(0)
                    chars_cut.append(0)
                    continue
                ivs = sorted((int(c["span_start"]), int(c["span_end"]))
                             for c in cut)
                pieces, pos, removed = [], 0, 0
                for s, e in ivs:  # 1-based inclusive
                    s0, e0 = s - 1, e  # 0-based half-open
                    pieces.append(text[pos:s0])
                    # Clamp the span start to pos so overlapping spans
                    # never count the same character twice in the
                    # removed metric.
                    removed += max(0, min(e0, len(text)) - max(s0, pos))
                    pos = max(pos, e0)
                pieces.append(text[pos:])
                out_text.append("".join(pieces))
                n_cut.append(len(ivs))
                chars_cut.append(removed)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "text_dedup": out_text,
                    "n_cut": pd.Series(n_cut, dtype="int64"),
                    "chars_cut": pd.Series(chars_cut, dtype="int64"),
                }
            )

    return src.mapInPandas(
        kernel,
        f"`{id_col}` {id_type}, text_dedup string, n_cut long, chars_cut long",
    )

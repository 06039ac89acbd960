"""Deterministic topic modeling: hashed-TF-IDF k-means + hard-EM PLSA.

The training-data use case is domain discovery and topic-balanced
corpus mixing (the unsupervised counterpart of ``scale.domain_weights``):
cluster documents into K topics from word statistics alone, read the
topics off as top-term lists, and mix/filter by dominant topic.

Two stages, because they have complementary strengths:

1. **Global structure** — spherical k-means over feature-hashed TF-IDF
   document vectors (Weinberger et al. 2009 hashing trick; sign hash
   debiases collisions).  K-means from deterministic farthest-point
   seeds converges robustly to the corpus's coarse domain structure —
   the part cell-level EM is bad at (it gets stuck in mixed local
   optima from a cold start, measured on planted fixtures).
2. **Word-level refinement** — hard-EM PLSA (ICM with leave-one-out
   counts) warm-started from the cluster labels: given a good init it
   sharpens word-topic statistics and yields the interpretable
   (doc, topic) / (word, topic) count tables.

Discipline follows the engine's other iterative fits (bpe/unigram/
trainer): every model quantity is an INTEGER (fixed-point TF-IDF
weights, count tables), the E-step argmax compares integral-division-
quantized scores in DECIMAL(38,0) with a total tie-break, and every
hash is md5 — no RNG, no float accumulation order anywhere, so the fit
is bit-reproducible under any partitioning (asserted in tests).

Scale shape (corpus nnz = distinct (doc, term) pairs):
- Vectorization: explode → two map-side-combined aggregates; the
  shuffled rows are (d, slot, weight) — bounded by nnz, text-free.
- K-means: the existing literal-argmin assignment (shuffle-free
  projection) + exact fixed-point centroid re-fit per iteration;
  seeds come from a bounded deterministic hash-sample (no full-corpus
  farthest-point scans).
- EM: two grouped sums + one doc-keyed join + one vocab-keyed join per
  iteration; assignment tables are eagerly localCheckpoint'ed per
  round (the connected-components lineage lesson, graph.py) and raw
  text never enters the loop.

Reference: the reference pipeline has no topic layer (it is an SHM
ingestion system, SURVEY §2); this operator is part of the
LLM-data-pipeline surface the engine adds (BASELINE.json north star),
alongside dedup/quality/tokenizers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sparkgraft.operators.textops import tokenize

# Quantization for the E-step score division: scores are
# div((cdz+1)(cwz+1)·SCALE, tz+V) — integral division in
# DECIMAL(38,0).  10^12 keeps three-factor products far below 38
# digits at realistic counts while leaving ~12 significant digits of
# resolution (post-quantization ties break by topic id, so the argmax
# is total either way).
_SCORE_SCALE = 10**12
# Fixed-point scale for TF-IDF weights: slot sums run in LONG, exactly.
_W_SCALE = 1_000_000


def doc_term_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One tokenize pass → the (d, w, n) bag-of-words table both stages
    run on.  Text is dropped immediately; everything downstream only
    shuffles (d, w, n)-shaped rows."""
    return (
        docs.select(
            F.col(id_col).alias("d"),
            F.explode(tokenize(F.col(text_col))).alias("w"),
        )
        .groupBy("d", "w")
        .agg(F.count("*").alias("n"))
    )


def _md5_mod(c: Column, m: int, salt: str = "") -> Column:
    return F.pmod(
        F.conv(F.substring(F.md5(F.concat_ws("\x1f", F.lit(salt), c)), 1, 8), 16, 10)
        .cast("long"),
        F.lit(m),
    )


def _dec(c: Column) -> Column:
    return c.cast("decimal(38,0)")


def _assemble_vectors(cells: DataFrame, dim: int) -> DataFrame:
    """(d, slot, long-weight) cells → dense (d, embedding) vectors:
    exact LONG slot sums, map-assembled into a fixed-width array —
    bit-identical under any partitioning."""
    sums = cells.groupBy("d", "slot").agg(F.sum("v").alias("v"))
    m = sums.groupBy("d").agg(
        F.map_from_entries(F.collect_list(F.struct("slot", "v"))).alias("m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.col("m")[i], F.lit(0)).cast("double")
        / F.lit(float(_W_SCALE)),
    )
    return m.select("d", vec.alias("embedding"))


def _tfidf_cells(
    counts: DataFrame, dfreq: DataFrame, n_docs, dim: int, digits: int
) -> DataFrame:
    """(d, w, n) + (w, df) + corpus size → hashed signed fixed-point
    TF-IDF cells.  ``n_docs`` is a 1-row DataFrame or an int literal
    (the serving path pins the TRAINING corpus size)."""
    if isinstance(n_docs, DataFrame):
        j = counts.join(dfreq, "w").crossJoin(F.broadcast(n_docs))
        nd = F.col("n_docs").cast("double")
    else:
        j = counts.join(F.broadcast(dfreq), "w")
        nd = F.lit(float(n_docs))
    tfidf = F.round(F.col("n") * F.log(nd / F.col("df")), digits)
    sign = F.when(_md5_mod(F.col("w"), 2, "sign") == 0, 1).otherwise(-1)
    return j.select(
        "d",
        _md5_mod(F.col("w"), dim, "slot").cast("int").alias("slot"),
        (sign * F.round(tfidf * _W_SCALE, 0).cast("long")).alias("v"),
    )


def hashed_tfidf_vectors(
    counts: DataFrame, dim: int = 128, digits: int = 6
) -> DataFrame:
    """Feature-hash each document's TF-IDF weights into a dense
    ``dim``-vector: slot = md5(term) mod dim, sign = second md5 bit
    (collision debiasing), weights fixed-point-scaled so slot sums are
    exact LONG arithmetic — the vector is bit-identical under any
    partitioning.  Returns (d, embedding array<double>)."""
    dfreq = counts.groupBy("w").agg(F.count("*").alias("df"))
    total = counts.agg(F.count_distinct("d").alias("n_docs"))
    return _assemble_vectors(_tfidf_cells(counts, dfreq, total, dim, digits), dim)


def seed_centroids(
    vecs: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "d",
    sample: int = 256,
) -> list[tuple[int, list[float]]]:
    """Deterministic k seeds: a bounded md5-ordered document sample
    (the engine's standard hash-sample — no RNG, no full-corpus
    farthest-point scans), then greedy farthest-point (k-center) on
    the driver over those ≤ ``sample`` vectors.  Ties break by sample
    position, so the seed set is a pure function of the corpus."""
    cand = [
        list(r[vec_col])
        for r in vecs.select(vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample)
        .collect()
    ]
    if not cand:
        return []
    chosen = [cand[0]]
    while len(chosen) < min(k, len(cand)):
        best_i, best_d = -1, -1.0
        for i, v in enumerate(cand):
            dmin = min(
                sum((a - b) * (a - b) for a, b in zip(v, c)) for c in chosen
            )
            if dmin > best_d:
                best_i, best_d = i, dmin
        if best_d <= 0.0:
            break  # fewer distinct vectors than k
        chosen.append(cand[best_i])
    return list(enumerate(chosen))


def cluster_documents(
    docs: DataFrame,
    k: int = 4,
    dim: int = 128,
    iters: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Stage 1 end-to-end: counts → hashed TF-IDF vectors → seeded
    Lloyd iterations (similarity.kmeans_iterate) → (d, cluster)."""
    from sparkgraft.operators.similarity import (
        assign_nearest_exact6,
        kmeans_iterate,
    )

    counts = doc_term_counts(docs, id_col, text_col)
    vecs = hashed_tfidf_vectors(counts, dim=dim).localCheckpoint()
    # TF-IDF vectors are exact 6-digit decimals -> exact integer
    # distances (round-9 doubles land ON rounding half-boundaries).
    cents = kmeans_iterate(
        vecs, seed_centroids(vecs, k), iters=iters, exact6=True
    )
    return vecs.select(
        "d", assign_nearest_exact6(F.col("embedding"), cents).alias("cluster")
    )


def plsa_hard_em(
    counts: DataFrame,
    k: int = 4,
    iters: int = 5,
    init: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Hard-EM PLSA (ICM) over a (d, w, n) count table.

    Each cell is (re-)assigned to the topic maximizing p(z|d)·p(w|z)
    with add-1 smoothing, where the cell's OWN counts are subtracted
    from its current topic's statistics first (leave-one-out — without
    it the cell's own mass locks in its current topic and synchronous
    updates oscillate; with it the planted-fixture fits converge,
    measured).  The argmax compares

        div((c'_dz+1)·(c'_wz+1)·SCALE, t'_z + V)

    in DECIMAL(38,0), tie-broken by lowest topic id — exact integers
    end to end.  ``init`` is an optional (d, z) warm start (normally
    :func:`cluster_documents`' labels — cold md5 starts find mixed
    local optima); cells of unlisted docs and the default cold start
    use the md5 hash of (d, w).  Zero-reassignment rounds exit early.

    Returns ``(doc_topics, word_topics)``: raw (d, z, c_dz) and
    (w, z, c_wz) count tables.
    """
    cold = _md5_mod(
        F.concat_ws("\x1f", F.col("d").cast("string"), F.col("w")), k, "init"
    ).cast("int")
    if init is not None:
        a = counts.join(
            init.select("d", F.col(init.columns[1]).alias("__z0")), "d", "left"
        ).select(
            "d", "w", "n", F.coalesce(F.col("__z0").cast("int"), cold).alias("z")
        )
    else:
        a = counts.select("d", "w", "n", cold.alias("z"))
    a = a.localCheckpoint()
    vocab_size = counts.select("w").distinct().count()

    for _ in range(iters):
        dt = a.groupBy("d").agg(
            *[
                F.sum(F.when(F.col("z") == z, F.col("n")).otherwise(0)).alias(
                    f"cd{z}"
                )
                for z in range(k)
            ]
        )
        wt = a.groupBy("w").agg(
            *[
                F.sum(F.when(F.col("z") == z, F.col("n")).otherwise(0)).alias(
                    f"cw{z}"
                )
                for z in range(k)
            ]
        )
        # Topic totals: K numbers — the only thing the driver sees.
        tz_row = a.groupBy().agg(
            *[
                F.sum(F.when(F.col("z") == z, F.col("n")).otherwise(0)).alias(
                    f"t{z}"
                )
                for z in range(k)
            ]
        ).first()
        tz = [int(tz_row[f"t{z}"] or 0) for z in range(k)]

        scored = a.join(dt, "d").join(wt, "w")

        def _loo(col: Column, z: int) -> Column:
            return col - F.when(F.col("z") == z, F.col("n")).otherwise(0)

        scores = [
            F.call_function(
                "div",
                _dec(_loo(F.col(f"cd{z}"), z) + 1)
                * _dec(_loo(F.col(f"cw{z}"), z) + 1)
                * F.lit(_SCORE_SCALE).cast("decimal(38,0)"),
                _dec(
                    F.lit(tz[z] + vocab_size)
                    - F.when(F.col("z") == z, F.col("n")).otherwise(0)
                ),
            )
            for z in range(k)
        ]
        best = F.array_max(
            F.array(
                *[
                    F.struct(scores[z].alias("s"), F.lit(-z).alias("nz"))
                    for z in range(k)
                ]
            )
        )
        nxt = scored.select(
            "d", "w", "n", "z", (-best.getField("nz")).cast("int").alias("z2")
        ).localCheckpoint()  # eager: truncate lineage BEFORE the next round
        changed = nxt.filter(F.col("z") != F.col("z2")).count()
        a = nxt.select("d", "w", "n", F.col("z2").alias("z"))
        if changed == 0:
            break

    doc_topics = a.groupBy("d", "z").agg(F.sum("n").alias("c_dz"))
    word_topics = a.groupBy("w", "z").agg(F.sum("n").alias("c_wz"))
    return doc_topics, word_topics


def topic_model(
    docs: DataFrame,
    k: int = 4,
    dim: int = 128,
    kmeans_iters: int = 4,
    em_iters: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """The composed two-stage fit: k-means cluster labels warm-start
    the PLSA refinement.  Returns (doc_topics, word_topics)."""
    counts = doc_term_counts(docs, id_col, text_col).localCheckpoint()
    from sparkgraft.operators.similarity import (
        assign_nearest_exact6,
        kmeans_iterate,
    )

    vecs = hashed_tfidf_vectors(counts, dim=dim).localCheckpoint()
    # Exact-integer assignment: see cluster_documents' comment.
    cents = kmeans_iterate(
        vecs, seed_centroids(vecs, k), iters=kmeans_iters, exact6=True
    )
    labels = vecs.select(
        "d", assign_nearest_exact6(F.col("embedding"), cents).alias("cluster")
    )
    return plsa_hard_em(counts, k=k, iters=em_iters, init=labels)


def topic_terms(word_topics: DataFrame, top_m: int = 10) -> DataFrame:
    """Top-m terms per topic by assigned count (term asc tie-break) —
    the human-readable topic summary."""
    w = Window.partitionBy("z").orderBy(F.col("c_wz").desc(), F.col("w").asc())
    return (
        word_topics.filter(F.col("c_wz") > 0)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_m)
        .select(
            F.col("z").alias("topic"),
            "rnk",
            F.col("w").alias("term"),
            F.col("c_wz").alias("weight"),
        )
    )


def dominant_topic(doc_topics: DataFrame) -> DataFrame:
    """Each doc's dominant topic (max assigned count, lowest topic id
    on ties) — the mixing/filter key for topic-balanced curation."""
    pick = F.max(
        F.struct(F.col("c_dz").alias("c"), (-F.col("z")).alias("nz"))
    )
    return doc_topics.groupBy("d").agg(
        (-pick.getField("nz")).cast("int").alias("topic"),
        pick.getField("c").alias("weight"),
    )


def fit_topic_space(
    docs: DataFrame,
    k: int = 4,
    dim: int = 128,
    kmeans_iters: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Fit the SERVING artifact for topic assignment: the training
    corpus's document frequencies, corpus size, and k-means centroids.
    These three pin the vector space — new documents must embed with
    the TRAINING df/N (not their own batch statistics) or assignments
    drift with batch composition.

    Returns ``{"dfreq": DataFrame(w, df), "n_docs": int,
    "centroids": [(id, vec)], "dim": int}``; dfreq is checkpointed
    (vocabulary-sized)."""
    from sparkgraft.operators.similarity import kmeans_iterate

    counts = doc_term_counts(docs, id_col, text_col).localCheckpoint()
    dfreq = (
        counts.groupBy("w").agg(F.count("*").alias("df")).localCheckpoint()
    )
    n_docs = counts.select("d").distinct().count()
    vecs = _assemble_vectors(
        _tfidf_cells(counts, dfreq, n_docs, dim, 6), dim
    ).localCheckpoint()
    cents = kmeans_iterate(
        vecs, seed_centroids(vecs, k), iters=kmeans_iters, exact6=True
    )
    return {"dfreq": dfreq, "n_docs": n_docs, "centroids": cents, "dim": dim}


def assign_topics(
    new_docs: DataFrame,
    space: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Online topic assignment against a fitted space: embed new
    documents with the TRAINING df/N (OOV terms drop — they carry no
    trained signal; a document with NO trained terms at all has no
    vector and is absent from the output — callers left-join and
    route such docs to a review bucket), assign to the nearest frozen
    centroid.  After the
    per-doc vector aggregate, assignment is the shuffle-free
    literal-argmin projection — the serving path never refits
    anything (the ann_index/bm25_index serving discipline).

    On the training corpus itself this reproduces
    :func:`cluster_documents`' labels exactly (asserted in tests)."""
    from sparkgraft.operators.similarity import assign_nearest_exact6

    counts = doc_term_counts(new_docs, id_col, text_col)
    vecs = _assemble_vectors(
        _tfidf_cells(counts, space["dfreq"], space["n_docs"], space["dim"], 6),
        space["dim"],
    )
    return vecs.select(
        "d",
        assign_nearest_exact6(
            F.col("embedding"), space["centroids"]
        ).alias("topic"),
    )

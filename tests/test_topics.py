"""Two-stage topic model: recovers planted disjoint-vocabulary topics
exactly, is partitioning-independent, and conserves token counts."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sparkgraft.operators.topics import (
    cluster_documents,
    doc_term_counts,
    dominant_topic,
    hashed_tfidf_vectors,
    plsa_hard_em,
    seed_centroids,
    topic_model,
    topic_terms,
)

FRUIT = "apple banana cherry plum grape melon fig kiwi pear quince".split()
ELEC = "circuit voltage resistor diode anode cathode relay fuse coil ohm".split()


def _draw(seed, vocab, n):
    return [
        vocab[int(hashlib.md5(f"{seed}:{t}".encode()).hexdigest()[:8], 16) % len(vocab)]
        for t in range(n)
    ]


def _planted_corpus(spark, n_docs=100, doc_len=30):
    rows = [
        (i, " ".join(_draw(i, FRUIT if i % 2 == 0 else ELEC, doc_len)))
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_topic_model_recovers_planted_topics(spark):
    docs = _planted_corpus(spark)
    dt, wt = topic_model(docs, k=2, dim=64, kmeans_iters=4, em_iters=4)

    # Every doc's dominant topic agrees with its planted group, 100%.
    dom = {r["d"]: r["topic"] for r in dominant_topic(dt).collect()}
    even = {dom[d] for d in dom if d % 2 == 0}
    odd = {dom[d] for d in dom if d % 2 == 1}
    assert len(even) == 1 and len(odd) == 1 and even != odd

    # Topic top-10 terms are vocabulary-pure.
    by_topic = {}
    for r in topic_terms(wt, top_m=10).collect():
        by_topic.setdefault(r["topic"], set()).add(r["term"])
    assert sorted(by_topic.values(), key=lambda s: min(s)) == sorted(
        [set(FRUIT), set(ELEC)], key=lambda s: min(s)
    )


def test_topic_model_partitioning_independent(spark):
    docs = _planted_corpus(spark, n_docs=40)
    out = []
    for parts in (1, 7):
        dt, wt = topic_model(
            docs.repartition(parts), k=3, dim=32, kmeans_iters=3, em_iters=3
        )
        out.append(
            (
                sorted(tuple(r) for r in dt.collect()),
                sorted(tuple(r) for r in wt.collect()),
            )
        )
    assert out[0] == out[1]


def test_plsa_counts_are_conserved(spark):
    docs = _planted_corpus(spark, n_docs=30)
    counts = doc_term_counts(docs)
    total = counts.agg(F.sum("n")).first()[0]
    dt, wt = plsa_hard_em(counts, k=2, iters=3)
    assert dt.agg(F.sum("c_dz")).first()[0] == total
    assert wt.agg(F.sum("c_wz")).first()[0] == total


def test_cluster_stage_alone_separates_groups(spark):
    docs = _planted_corpus(spark, n_docs=60)
    labels = {
        r["d"]: r["cluster"]
        for r in cluster_documents(docs, k=2, dim=64, iters=4).collect()
    }
    even = {labels[d] for d in labels if d % 2 == 0}
    odd = {labels[d] for d in labels if d % 2 == 1}
    assert len(even) == 1 and len(odd) == 1 and even != odd


def test_hashed_vectors_exact_and_seeds_deterministic(spark):
    docs = _planted_corpus(spark, n_docs=20)
    counts = doc_term_counts(docs)
    v1 = {
        r["d"]: tuple(r["embedding"])
        for r in hashed_tfidf_vectors(counts, dim=16).collect()
    }
    v2 = {
        r["d"]: tuple(r["embedding"])
        for r in hashed_tfidf_vectors(counts.repartition(5), dim=16).collect()
    }
    assert v1 == v2  # exact fixed-point slot sums: partition-proof
    vecs = hashed_tfidf_vectors(counts, dim=16)
    s1 = seed_centroids(vecs, 3)
    s2 = seed_centroids(vecs.repartition(3), 3)
    assert s1 == s2 and len(s1) == 3


def test_assign_topics_serving_matches_training_labels(spark):
    """Serving on the training corpus reproduces cluster_documents'
    labels; new same-vocabulary docs land in their group's topic."""
    from sparkgraft.operators.topics import assign_topics, fit_topic_space

    docs = _planted_corpus(spark, n_docs=60)
    space = fit_topic_space(docs, k=2, dim=64, kmeans_iters=4)
    train_labels = {
        r["d"]: r["cluster"]
        for r in cluster_documents(docs, k=2, dim=64, iters=4).collect()
    }
    served = {
        r["d"]: r["topic"] for r in assign_topics(docs, space).collect()
    }
    assert served == train_labels

    # Unseen docs from each vocabulary assign to that group's topic.
    new = spark.createDataFrame(
        [
            (1000, " ".join(_draw(999, FRUIT, 25))),
            (1001, " ".join(_draw(998, ELEC, 25))),
        ],
        "doc_id long, text string",
    )
    got = {r["d"]: r["topic"] for r in assign_topics(new, space).collect()}
    fruit_topic = train_labels[0]   # doc 0 is a FRUIT doc
    elec_topic = train_labels[1]    # doc 1 is an ELEC doc
    assert got[1000] == fruit_topic and got[1001] == elec_topic

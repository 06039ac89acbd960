"""Hand-math tests for the training-data curation operators:
preference-pair mining (DPO best-vs-rest) and DSIR importance
resampling (hashed-unigram bucket LMs)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sparkgraft.operators.scale import dsir_weights, preference_pairs


def test_preference_pairs_hand_math(spark):
    rows = [
        # group a: chosen = c1 (5.0); rest by margin desc: c5(4.0),
        # c3(2.0), c2(1.0), c4(0.5 < margin, dropped)
        ("a", "c1", 5.0),
        ("a", "c2", 4.0),
        ("a", "c3", 3.0),
        ("a", "c4", 4.5),
        ("a", "c5", 1.0),
        # group b: single candidate -> no pairs
        ("b", "d1", 2.0),
        # group c: score tie at the top -> id asc wins (e1 chosen)
        ("c", "e2", 7.0),
        ("c", "e1", 7.0),
        ("c", "e3", 5.0),
    ]
    df = spark.createDataFrame(rows, ["grp", "cid", "score"])
    out = preference_pairs(
        df, "grp", "cid", "score", margin=1.0, per_group=2
    ).orderBy("grp", "rejected_id")
    got = [tuple(r) for r in out.collect()]
    assert got == [
        ("a", "c1", "c3", 5.0, 3.0, 2.0),
        ("a", "c1", "c5", 5.0, 1.0, 4.0),
        # tie pair e1-vs-e2 has margin 0.0 < 1.0, so only e3 remains
        ("c", "e1", "e3", 7.0, 5.0, 2.0),
    ]


def test_preference_pairs_deterministic_under_partitioning(spark):
    rows = [("g%d" % (i % 7), "id%03d" % i, float((i * 37) % 23)) for i in range(200)]
    df = spark.createDataFrame(rows, ["grp", "cid", "score"])
    a = preference_pairs(df, "grp", "cid", "score", margin=2.0, per_group=3)
    b = preference_pairs(
        df.repartition(13), "grp", "cid", "score", margin=2.0, per_group=3
    )
    ka = sorted(map(tuple, a.collect()))
    kb = sorted(map(tuple, b.collect()))
    assert ka == kb and len(ka) > 0
    # chosen is always the group max; margins all >= 2.0
    for _, _, _, cs, rs, m in ka:
        assert cs - rs >= 2.0 and abs(m - round(cs - rs, 6)) < 1e-12


def test_dsir_weights_prefers_in_domain(spark):
    target = spark.createDataFrame(
        [(i, "alpha beta gamma alpha") for i in range(10)],
        ["doc_id", "text"],
    )
    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha gamma"),  # in-domain
            (2, "zeta eta theta iota"),  # out-of-domain
            (3, "alpha zeta"),  # mixed
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["logw"])
        for r in dsir_weights(docs, target, n_buckets=256).collect()
    }
    assert out[1][0] == 4 and out[2][0] == 4 and out[3][0] == 2
    assert out[1][1] > out[3][1] > out[2][1]
    assert out[1][1] > 0.0 > out[2][1]


def test_dsir_weights_target_pred_matches_two_frame_form(spark):
    """Round-14 fused path: when the target is a predicate-defined
    subset of docs, the single-pass target_pred form must emit
    EXACTLY the weights of the two-DataFrame form (same bucket
    counts by construction), including docs whose predicate column
    is NULL (falsy, excluded from the target LM)."""
    import pytest

    docs = spark.createDataFrame(
        [
            (i, " ".join("w%d" % ((i * j) % 37) for j in range(1, 20)),
             "en" if i % 3 == 0 else ("fr" if i % 3 == 1 else None))
            for i in range(45)
        ],
        ["doc_id", "text", "lang"],
    )
    two = sorted(
        map(
            tuple,
            dsir_weights(docs, docs.filter(F.col("lang") == "en")).collect(),
        )
    )
    one = sorted(
        map(
            tuple,
            dsir_weights(docs, target_pred=F.col("lang") == "en").collect(),
        )
    )
    assert two == one and len(one) == 45
    with pytest.raises(ValueError, match="exactly one"):
        dsir_weights(docs)
    with pytest.raises(ValueError, match="exactly one"):
        dsir_weights(docs, docs, target_pred=F.col("lang") == "en")


def test_dsir_weights_partition_invariant(spark):
    docs = spark.createDataFrame(
        [(i, " ".join("w%d" % ((i * j) % 50) for j in range(1, 30))) for i in range(60)],
        ["doc_id", "text"],
    )
    target = docs.filter(F.col("doc_id") % 3 == 0)
    a = sorted(map(tuple, dsir_weights(docs, target).collect()))
    b = sorted(
        map(
            tuple,
            dsir_weights(docs.repartition(17), target.repartition(5)).collect(),
        )
    )
    assert a == b and len(a) == 60
    # every logw is finite (smoothing floors empty buckets)
    assert all(math.isfinite(lw) for _, _, lw in a)

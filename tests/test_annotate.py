"""Hand-math anchors for operators/annotate.py: majority vote with
deterministic ties, Cohen/Fleiss kappa, Dawid-Skene spammer
down-weighting, and partition invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkgraft.operators.annotate import (
    annotator_kappa,
    dawid_skene,
    fleiss_kappa,
    majority_label,
)


def test_majority_label_counts_and_tiebreak(spark):
    votes = spark.createDataFrame(
        [(1, 0, 1), (1, 1, 1), (1, 2, 2),      # 1 wins 2:1
         (2, 0, 2), (2, 1, 1)],                # tie -> smallest label 1
        "item_id long, annotator_id long, label int",
    )
    rows = {r["item_id"]: r for r in majority_label(votes).collect()}
    assert rows[1]["voted_label"] == 1 and rows[1]["n_agree"] == 2
    assert rows[1]["n_votes"] == 3 and rows[1]["agreement"] == round(2 / 3, 6)
    assert rows[2]["voted_label"] == 1 and rows[2]["agreement"] == 0.5


def test_cohen_kappa_hand_math(spark):
    # A=[0,0,1,1], B=[0,1,1,1]: po=3/4, pe=(2*1+2*3)/16=0.5, kappa=0.5
    votes = spark.createDataFrame(
        [(i, 0, a) for i, a in enumerate([0, 0, 1, 1])]
        + [(i, 1, b) for i, b in enumerate([0, 1, 1, 1])],
        "item_id long, annotator_id long, label int",
    )
    r = annotator_kappa(votes).first()
    assert (r["annotator_a"], r["annotator_b"], r["n_items"]) == (0, 1, 4)
    assert r["po"] == 0.75 and r["pe"] == 0.5 and r["kappa"] == 0.5


def test_cohen_kappa_degenerate_pe_one_is_null(spark):
    votes = spark.createDataFrame(
        [(0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1)],
        "item_id long, annotator_id long, label int",
    )
    r = annotator_kappa(votes).first()
    assert r["po"] == 1.0 and r["pe"] == 1.0 and r["kappa"] is None


def test_fleiss_kappa_hand_math(spark):
    # items: [0,0], [0,1], [1,1] -> P_i = 1, 0, 1; p_bar = 2/3
    # marginals 3/3 over 6 votes -> p_e = .5 -> kappa = 1/3
    votes = spark.createDataFrame(
        [(0, 0, 0), (0, 1, 0), (1, 0, 0), (1, 1, 1), (2, 0, 1), (2, 1, 1)],
        "item_id long, annotator_id long, label int",
    )
    r = fleiss_kappa(votes).first()
    assert r["n_items"] == 3
    assert r["p_bar"] == round(2 / 3, 6)
    assert r["p_e"] == 0.5
    assert r["kappa"] == round(1 / 3, 6)


def _spammer_votes(spark, n_items=30):
    # annotators 0,1: always correct; 2,3,4: always vote 0 (spammers).
    # majority is WRONG for every item with true != 0 (3 spam votes vs
    # 2 correct) — Dawid-Skene must learn the spammers' constant
    # confusion rows carry no information and follow annotators 0/1.
    rows = []
    for i in range(n_items):
        true = i % 3
        for a in (0, 1):
            rows.append((i, a, true))
        for a in (2, 3, 4):
            rows.append((i, a, 0))
    return spark.createDataFrame(
        rows, "item_id long, annotator_id long, label int"
    )


def test_dawid_skene_outvotes_spammers(spark):
    votes = _spammer_votes(spark)
    ds = {
        r["item_id"]: r["ds_label"]
        for r in dawid_skene(votes, n_classes=3, iters=10).collect()
    }
    maj = {
        r["item_id"]: r["voted_label"]
        for r in majority_label(votes).collect()
    }
    truth = {i: i % 3 for i in range(30)}
    ds_acc = sum(ds[i] == truth[i] for i in truth) / len(truth)
    maj_acc = sum(maj[i] == truth[i] for i in truth) / len(truth)
    assert maj_acc <= 0.4  # spammers win every non-zero item
    assert ds_acc == 1.0   # EM recovers every label


def test_dawid_skene_partition_invariance(spark):
    votes = _spammer_votes(spark, n_items=24)
    a = sorted(
        tuple(r)
        for r in dawid_skene(
            votes.repartition(1), n_classes=3, iters=4
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in dawid_skene(
            votes.repartition(13), n_classes=3, iters=4
        ).collect()
    )
    assert a == b


def test_dawid_skene_string_annotator_ids(spark):
    """Regression: the confusion broadcast hardcoded 'annotator long';
    string rater ids (valid for every other operator here) crashed the
    first EM iteration."""
    votes = _spammer_votes(spark, n_items=12).withColumn(
        "annotator_id",
        F.concat(F.lit("rater_"), F.col("annotator_id").cast("string")),
    )
    out = dawid_skene(votes, n_classes=3, iters=3)
    got = {r["item_id"]: r["ds_label"] for r in out.collect()}
    assert len(got) == 12
    assert all(0 <= v < 3 for v in got.values())

"""Hard-sigmoid logistic trainer: exact-integer parity with a Python
replica, partitioning independence, serving consistency, and learning
sanity on separable data."""

from __future__ import annotations

import random

from sparkgraft.operators.trainer import (
    P_DEN,
    W_SCALE,
    X_SCALE,
    Z,
    _halfup,
    doc_features,
    predict_hard_logistic,
    train_hard_logistic,
)


def py_train(rows, d, n_iters=6, lr_num=1, lr_den=2):
    """Exact replica of the scaled-integer GD (rows: (x_ints..., y))."""
    n = len(rows)
    w = [0] * d
    b = 0
    for _ in range(n_iters):
        g = [0] * (d + 1)
        for row in rows:
            xs, y = row[:d], row[d]
            z_num = b * X_SCALE + sum(wj * xj for wj, xj in zip(w, xs))
            p_num = max(0, min(P_DEN, z_num + 2 * Z))
            r = p_num - y * P_DEN
            for j in range(d):
                g[j] += r * xs[j]
            g[d] += r * X_SCALE
        den = lr_den * P_DEN * X_SCALE * n
        w = [w[j] - _halfup(lr_num * g[j] * W_SCALE, den) for j in range(d)]
        b = b - _halfup(lr_num * g[d] * W_SCALE, den)
    return w, b


def sep_rows(n=200, seed=5):
    """Linearly separable: y = 1 iff x1 + x2 > 20000 (scaled)."""
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        x1 = rng.randrange(0, 20000)
        x2 = rng.randrange(0, 20000)
        rows.append((x1, x2, 1 if x1 + x2 > 20000 else 0))
    return rows


def test_trainer_matches_python_replica(spark):
    rows = sep_rows()
    df = spark.createDataFrame(rows, "x1 long, x2 long, label long")
    got = dict(train_hard_logistic(df, ["x1", "x2"], "label", n_iters=5))
    w, b = py_train(rows, 2, n_iters=5)
    assert got == {"x1": w[0], "x2": w[1], "bias": b}


def test_trainer_partitioning_independent(spark):
    rows = sep_rows(seed=9)
    df = spark.createDataFrame(rows, "x1 long, x2 long, label long")
    a = train_hard_logistic(df.repartition(1), ["x1", "x2"], "label")
    c = train_hard_logistic(df.repartition(17), ["x1", "x2"], "label")
    assert a == c


def test_trainer_learns_separable_data(spark):
    # centered features: boundary passes through the origin, which GD
    # from w=0 reaches quickly (uncentered thresholds need a long bias
    # walk — the doc_features fixture centers via the bias term anyway)
    rng = random.Random(1)
    rows = []
    for _ in range(400):
        x1 = rng.randrange(-10000, 10000)
        x2 = rng.randrange(-10000, 10000)
        rows.append((x1, x2, 1 if x1 + x2 > 0 else 0))
    df = spark.createDataFrame(rows, "x1 long, x2 long, label long")
    weights = train_hard_logistic(df, ["x1", "x2"], "label", n_iters=12)
    pred = predict_hard_logistic(df, weights, keep_cols=["label"])
    n = pred.count()
    correct = pred.filter(
        (pred["label_pred"].cast("long")) == pred["label"]
    ).count()
    assert correct / n > 0.9


def test_predict_threshold_consistent(spark):
    rows = sep_rows(n=100, seed=2)
    df = spark.createDataFrame(rows, "x1 long, x2 long, label long")
    weights = train_hard_logistic(df, ["x1", "x2"], "label", n_iters=3)
    for r in predict_hard_logistic(df, weights).collect():
        assert 0 <= r["p_scaled"] <= X_SCALE
        assert r["label_pred"] == (r["p_scaled"] > X_SCALE // 2) or (
            # boundary: label uses z>0, p_scaled rounds — both agree
            # except exactly at p = 1/2 where label_pred is False
            r["p_scaled"] == X_SCALE // 2
        )


def test_doc_features_quantization(spark):
    docs = spark.createDataFrame(
        [(1, "ab cd3 e", "en"), (2, "", "de")],
        "doc_id long, text string, lang string",
    )
    rows = {r["doc_id"]: r for r in doc_features(docs).collect()}
    # doc 1: 3 words, 8 chars, 1 digit
    assert rows[1]["x_words"] == 300
    assert rows[1]["x_wordlen"] == _halfup(8 * X_SCALE, 3)
    assert rows[1]["x_digit"] == _halfup(1 * X_SCALE, 8)
    assert rows[1]["label"] == 1
    # empty doc: split('') -> [''] (1 word), 0 chars
    assert rows[2]["x_words"] == 100
    assert rows[2]["x_digit"] == 0 and rows[2]["label"] == 0


def test_calibration_report_hand_math(spark):
    """Reliability bins + exact ECE on a literal prediction set:
    bin 1 = {1500: wrong}, bin 9 = {9000: right, 9600: right} (and the
    10000 edge closes into bin 9); ECE reduces to the exact integer
    sum |pos*S - sum_p| / (N*S)."""
    from sparkgraft.operators.trainer import calibration_report

    preds = spark.createDataFrame(
        [(1500, 0), (9000, 1), (9600, 1), (10000, 0)],
        "p_scaled long, label long",
    )
    rows = {r["bin"]: r for r in calibration_report(preds).collect()}
    assert set(rows) == {1, 9, -1}
    b1, b9, ece = rows[1], rows[9], rows[-1]
    assert (b1["n"], b1["conf"], b1["acc"]) == (1, 0.15, 0.0)
    assert b1["gap"] == 0.15
    # bin 9: p in {9000, 9600, 10000}, labels {1, 1, 0}
    assert b9["n"] == 3
    assert b9["conf"] == round(28600 / 30000, 6)
    assert b9["acc"] == round(2 / 3, 6)
    assert b9["gap"] == round(abs(2 * 10000 - 28600) / 30000, 6)
    # ECE = (|0*S-1500| + |2*S-28600|) / (4*S)
    assert ece["n"] == 4 and ece["conf"] is None and ece["acc"] is None
    assert ece["gap"] == round((1500 + 8600) / 40000, 6)


def test_calibration_report_partition_invariance(spark):
    from sparkgraft.operators.trainer import calibration_report

    preds = spark.createDataFrame(
        [((i * 137) % 10001, i % 2) for i in range(500)],
        "p_scaled long, label long",
    )
    a = sorted(tuple(r) for r in calibration_report(preds.repartition(1)).collect())
    b = sorted(tuple(r) for r in calibration_report(preds.repartition(17)).collect())
    assert a == b


def test_classifier_eval_hand_math(spark):
    """Confusion/P/R/F1/kappa/AUC on a literal set with score TIES:
    scores [1,2,2,3] labels [0,0,1,1], pred = score >= 2."""
    from sparkgraft.operators.trainer import classifier_eval

    preds = spark.createDataFrame(
        [(1, 0, 0), (2, 1, 0), (2, 1, 1), (3, 1, 1)],
        "p_scaled long, label_pred long, label long",
    )
    r = classifier_eval(preds).first()
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (2, 1, 0, 1)
    assert r["accuracy"] == 0.75
    assert r["precision"] == round(2 / 3, 6)
    assert r["recall"] == 1.0
    assert r["f1"] == 0.8
    # kappa: po = 3/4, pe = (3*2 + 1*2)/16 = 1/2 -> (3/4-1/2)/(1/2)
    assert r["kappa"] == 0.5
    # AUC with the tie at score 2: positive midranks = 2.5 (tied pair)
    # and 4 -> U = (2.5 + 4) - 2*3/2 = 3.5 over n_pos*n_neg = 4
    assert r["auc"] == round(3.5 / 4, 6)


def test_classifier_eval_degenerate_guards(spark):
    from sparkgraft.operators.trainer import classifier_eval

    # no positives at all: recall/kappa/auc NULL, precision defined
    preds = spark.createDataFrame(
        [(1, 0, 0), (2, 0, 0)], "p_scaled long, label_pred long, label long"
    )
    r = classifier_eval(preds).first()
    assert r["recall"] is None and r["auc"] is None
    assert r["accuracy"] == 1.0
    # nothing predicted positive: precision/f1 NULL (0 tp, 0 fp)
    preds2 = spark.createDataFrame(
        [(9, 0, 1), (1, 0, 0)], "p_scaled long, label_pred long, label long"
    )
    r2 = classifier_eval(preds2).first()
    # precision undefined (0 predicted positive); F1 is 0, not NULL —
    # positives exist and none were found (2tp+fp+fn = 1 > 0)
    assert r2["precision"] is None and r2["f1"] == 0.0
    assert r2["auc"] == 1.0  # the positive outranks the negative


def test_classifier_eval_partition_invariance(spark):
    from sparkgraft.operators.trainer import classifier_eval

    rows = [((i * 37) % 101, (i * 37) % 3 == 0 and 1 or 0, i % 2)
            for i in range(400)]
    preds = spark.createDataFrame(
        rows, "p_scaled long, label_pred long, label long"
    )
    a = tuple(classifier_eval(preds.repartition(1)).first())
    b = tuple(classifier_eval(preds.repartition(19)).first())
    assert a == b

"""Distributed classifier training as Spark aggregates.

The engine's serving path (``textops.hash_classifier_score``) applies a
linear model at scan speed; this module TRAINS one.  The reference
pipeline has no trainer (its quality gates are rule-based), but a
large-scale curation stack needs the fastText-style quality-classifier
loop: featurize the corpus, fit a linear model, score and gate.

Training shape: batch gradient descent where EVERY iteration is one
map-side-combined aggregate over the (cached) feature frame — the
shuffle moves d+1 partial sums per task, never rows.  Driver state is
the scaled weight vector (d+1 Python ints).  That is the textbook
"parameter-server-free" Spark fit: at 100 TB each pass is a full scan,
so cache/persist the feature frame and keep iteration counts small
(hard-sigmoid GD converges in a handful of steps for gating purposes).

Exactness: the logistic link is replaced by the HARD sigmoid
``p = clamp(z/4 + 1/2, 0, 1)`` and all arithmetic runs in scaled
integers (features at 10^4, weights at 10^8, DECIMAL(38,0) products),
with HALF-UP integral-division rounding on the update step.  Training
is therefore bit-reproducible under any partitioning AND expressible
as unrolled SQL — the DuckDB oracle replays the identical iterations.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

X_SCALE = 10**4  # feature fixed-point scale
W_SCALE = 10**8  # weight fixed-point scale
# p = (z_num + 2*Z)/4Z with z_num = z * Z where Z = X_SCALE * W_SCALE
Z = X_SCALE * W_SCALE
P_DEN = 4 * Z


def _dec(c: Column) -> Column:
    return c.cast("decimal(38,0)")


def _halfup(num: int, den: int) -> int:
    """Round-half-up integer division for any-sign numerator."""
    s = -1 if num < 0 else 1
    return s * ((2 * abs(num) + den) // (2 * den))


def train_hard_logistic(
    feats: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    n_iters: int = 6,
    lr_num: int = 1,
    lr_den: int = 2,
    cache: bool = True,
) -> list[tuple[str, int]]:
    """Fit ``p(y=1|x) = hard_sigmoid(w·x + b)`` by batch GD.

    ``feats``: one row per example with INTEGER feature columns already
    scaled by 10^4 (see :func:`doc_features`) and a 0/1 ``label_col``.
    Returns ``[(feature, w_scaled), ..., ("bias", b_scaled)]`` with
    weights scaled by 10^8 — exact ints, identical for any
    partitioning and any engine replaying the same arithmetic.
    """
    cols = list(feature_cols)
    d = len(cols)
    if cache:
        feats = feats.persist()
    try:
        n = feats.count()
        w = [0] * d
        b = 0
        for _ in range(n_iters):
            z_num = _dec(F.lit(b)) * F.lit(X_SCALE).cast("decimal(38,0)")
            for j, c in enumerate(cols):
                z_num = z_num + _dec(F.col(c)) * _dec(F.lit(w[j]))
            p_num = F.greatest(
                F.lit(0).cast("decimal(38,0)"),
                F.least(
                    F.lit(P_DEN).cast("decimal(38,0)"),
                    z_num + F.lit(2 * Z).cast("decimal(38,0)"),
                ),
            )
            r_num = p_num - _dec(F.col(label_col)) * F.lit(P_DEN).cast(
                "decimal(38,0)"
            )
            sums = feats.select(
                *[F.sum(r_num * _dec(F.col(c))).alias(f"g{j}")
                  for j, c in enumerate(cols)],
                F.sum(r_num * F.lit(X_SCALE).cast("decimal(38,0)")).alias(
                    "gb"
                ),
            ).first()
            den = lr_den * P_DEN * X_SCALE * n
            w = [
                w[j] - _halfup(lr_num * int(sums[f"g{j}"]) * W_SCALE, den)
                for j in range(d)
            ]
            b = b - _halfup(lr_num * int(sums["gb"]) * W_SCALE, den)
    finally:
        if cache:
            feats.unpersist()
    return [*zip(cols, w), ("bias", b)]


def predict_hard_logistic(
    feats: DataFrame,
    weights: Sequence[tuple[str, int]],
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Apply a trained hard-logistic model: exact scaled score
    ``p_scaled = halfup(p * 10^4)`` plus the thresholded label
    (p > 1/2 ⟺ z_num > 0) — shuffle-free scan-speed serving, exact
    integer arithmetic end to end."""
    wmap = dict(weights)
    b = wmap.pop("bias")
    z_num = _dec(F.lit(b)) * F.lit(X_SCALE).cast("decimal(38,0)")
    for c, wj in wmap.items():
        z_num = z_num + _dec(F.col(c)) * _dec(F.lit(wj))
    p_num = F.greatest(
        F.lit(0).cast("decimal(38,0)"),
        F.least(
            F.lit(P_DEN).cast("decimal(38,0)"),
            z_num + F.lit(2 * Z).cast("decimal(38,0)"),
        ),
    )
    two = F.lit(2).cast("decimal(38,0)")
    p4 = F.call_function(
        "div",
        two * p_num * F.lit(X_SCALE).cast("decimal(38,0)")
        + F.lit(P_DEN).cast("decimal(38,0)"),
        two * F.lit(P_DEN).cast("decimal(38,0)"),
    )
    return feats.select(
        *keep_cols,
        p4.cast("long").alias("p_scaled"),
        (z_num > 0).alias("label_pred"),
    )


def doc_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Quantized per-document features for the quality classifier, all
    exact scaled integers (10^4): words/100, mean word length, digit-
    character ratio — plus the 0/1 English-language label.  Shuffle-
    free projection; ratios use HALF-UP integral division so the
    feature frame is engine-portable bit-for-bit."""
    text = F.col(text_col)
    n_words = F.size(F.split(text, r"\s+"))
    n_chars = F.length(text)
    n_digits = n_chars - F.length(F.regexp_replace(text, "[0-9]", ""))
    two = F.lit(2).cast("decimal(38,0)")

    def halfup(num: Column, den: Column) -> Column:
        return F.call_function(
            "div", two * _dec(num) + _dec(den), two * _dec(den)
        ).cast("long")

    return docs.select(
        F.col(id_col),
        (n_words * 100).cast("long").alias("x_words"),
        F.when(n_words > 0, halfup(n_chars * X_SCALE, n_words))
        .otherwise(F.lit(0))
        .alias("x_wordlen"),
        F.when(n_chars > 0, halfup(n_digits * X_SCALE, n_chars))
        .otherwise(F.lit(0))
        .alias("x_digit"),
        (F.col("lang") == "en").cast("long").alias("label"),
    )


def calibration_report(
    preds: DataFrame,
    p_col: str = "p_scaled",
    label_col: str = "label",
    p_scale: int = 10_000,
    n_bins: int = 10,
    digits: int = 6,
) -> DataFrame:
    """Reliability diagram + Expected Calibration Error over exact
    scaled-integer predictions — the calibration leg of the quality-
    classifier curation loop (train → predict → CALIBRATE; Guo et al.
    2017 temperature-scaling diagnostics, computed here exactly).

    Bins: confidence bucket ``min((p * n_bins) div p_scale, n_bins-1)``
    (equal-width, last bin closed) — exact integer division, no float
    bucketing.  Per bin: ``n``, mean confidence, empirical accuracy,
    ``gap = |acc − conf|``.  Summary row ``bin = -1`` carries
    ECE = Σ_b (n_b/N)·|acc_b − conf_b|, which reduces to the EXACT
    integer sum Σ_b |pos_b·S − sum_p_b| / (N·S) — one division at the
    end, so the SQL mirror is bit-exact and the result is
    partitioning-invariant.  Scale: one grouped aggregate over the
    prediction scan into ≤ n_bins rows.
    """
    bucket = F.least(
        F.call_function(
            "div",
            F.col(p_col).cast("long") * F.lit(n_bins),
            F.lit(p_scale).cast("long"),
        ),
        F.lit(n_bins - 1).cast("long"),
    ).cast("long")
    per = preds.groupBy(bucket.alias("bin")).agg(
        F.count("*").alias("n"),
        F.sum(F.col(p_col).cast("decimal(38,0)")).alias("_sum_p"),
        F.sum(F.col(label_col).cast("decimal(38,0)")).alias("_pos"),
    )
    gap_num = F.abs(
        F.col("_pos") * F.lit(p_scale).cast("decimal(38,0)")
        - F.col("_sum_p")
    )
    # Integer-ratio kernel, never round(double): every bin metric is a
    # ratio of exact scaled-integer sums (round-9 boundary-audit
    # class — bin ratios terminate on rounding half-boundaries).
    from sparkgraft.operators.stats import exact_ratio

    den = (F.col("n") * p_scale).cast("decimal(38,0)")
    bins = per.select(
        "bin",
        "n",
        exact_ratio(F.col("_sum_p"), den, digits).alias("conf"),
        exact_ratio(F.col("_pos"), F.col("n"), digits).alias("acc"),
        exact_ratio(gap_num, den, digits).alias("gap"),
    )
    total = per.select(F.col("n"), gap_num.alias("_g")).agg(
        F.sum("n").alias("n"), F.sum("_g").alias("_g")
    ).select(
        F.lit(-1).cast("long").alias("bin"),
        "n",
        F.lit(None).cast("double").alias("conf"),
        F.lit(None).cast("double").alias("acc"),
        exact_ratio(
            F.col("_g"), (F.col("n") * p_scale).cast("decimal(38,0)"), digits
        ).alias("gap"),
    )
    return bins.unionByName(total)


def classifier_eval(
    preds: DataFrame,
    p_col: str = "p_scaled",
    pred_col: str = "label_pred",
    label_col: str = "label",
    digits: int = 6,
) -> DataFrame:
    """One-row classifier evaluation — confusion counts, accuracy,
    precision/recall/F1, Cohen's kappa, and EXACT tie-aware ROC-AUC —
    the measurement leg beside calibration_report.

    AUC is the Mann-Whitney rank-sum statistic computed WITHOUT a
    global row sort: ``p_col`` is a bounded-domain scaled integer
    (≤ p_scale+1 distinct values), so scores aggregate to per-score
    (count, positives) first and midranks walk the score axis — one
    grouped aggregate plus a GLOBAL window over ≤ p_scale+1 rows — bounded by the
    score domain, not the data (the
    ks_test_binned bounded-domain discipline).  Ties get midranks
    (doubled to stay integer: 2·midrank = 2·cum_before + c + 1), so
    AUC = (Σ_pos 2·midrank − n_pos(n_pos+1)) / (2·n_pos·n_neg) is an
    exact integer ratio; every output metric is a round-``digits``
    double of exact integers — partitioning-invariant by construction.
    Guards: precision/F1 NULL when nothing is predicted positive,
    recall NULL when no positives exist, AUC/kappa NULL when one class
    is absent.
    """
    from pyspark.sql import Window

    pred = F.col(pred_col).cast("long")
    lab = F.col(label_col).cast("long")
    conf = preds.agg(
        F.sum(pred * lab).alias("tp"),
        F.sum(pred * (1 - lab)).alias("fp"),
        F.sum((1 - pred) * lab).alias("fn"),
        F.sum((1 - pred) * (1 - lab)).alias("tn"),
    )
    per_score = preds.groupBy(F.col(p_col).alias("s")).agg(
        F.count("*").alias("c"), F.sum(lab).alias("cp")
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    s2 = per_score.select(
        "c",
        "cp",
        (
            F.lit(2) * F.coalesce(F.sum("c").over(w), F.lit(0))
            + F.col("c")
            + F.lit(1)
        ).alias("mr2"),
    ).agg(F.sum(F.col("cp") * F.col("mr2")).alias("s2"))
    d = F.lit(None).cast("double")
    # DECIMAL(38,0) cross-products: N² and rank sums stay exact far
    # beyond long range (counts to ~10¹⁹ before 38 digits bind).
    tp, fp = _dec(F.col("tp")), _dec(F.col("fp"))
    fn_, tn = _dec(F.col("fn")), _dec(F.col("tn"))
    npos, nneg = tp + fn_, fp + tn
    n = npos + nneg
    po_num = tp + tn
    pe_num = (tp + fp) * npos + (fn_ + tn) * nneg
    # Integer-ratio kernel, never round(double): every metric is a
    # ratio of integer confusion counts (round-9 boundary-audit
    # class — e.g. recall = tp/npos terminates exactly on rounding
    # half-boundaries for real confusion tables).
    from sparkgraft.operators.stats import exact_ratio

    return conf.crossJoin(s2).select(
        "tp",
        "fp",
        "fn",
        "tn",
        exact_ratio(po_num, n, digits).alias("accuracy"),
        F.when(
            tp + fp > 0, exact_ratio(tp, tp + fp, digits)
        ).otherwise(d).alias("precision"),
        F.when(npos > 0, exact_ratio(tp, npos, digits)).otherwise(d).alias(
            "recall"
        ),
        F.when(
            tp + tp + fp + fn_ > 0,
            exact_ratio(tp + tp, tp + tp + fp + fn_, digits),
        ).otherwise(d).alias("f1"),
        F.when(
            n * n - pe_num > 0,
            exact_ratio(po_num * n - pe_num, n * n - pe_num, digits),
        ).otherwise(d).alias("kappa"),
        F.when(
            (npos > 0) & (nneg > 0),
            exact_ratio(
                _dec(F.col("s2")) - npos * (npos + 1),
                F.lit(2).cast("decimal(38,0)") * npos * nneg,
                digits,
            ),
        ).otherwise(d).alias("auc"),
    )

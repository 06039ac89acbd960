"""Annotation aggregation — the labeled-data curation leg of a
training pipeline: multiple annotators (human raters or LLM judges)
vote on items; the pipeline must fuse votes into labels, measure
annotator reliability, and weight good annotators above noisy ones.

Operators:

- :func:`majority_label` — per-item modal label with a total
  deterministic tie-break, vote counts, and agreement ratio.
- :func:`annotator_kappa` — pairwise Cohen's kappa (chance-corrected
  agreement over each pair's co-annotated items) plus observed
  agreement; the annotator-reliability screen.
- :func:`fleiss_kappa` — corpus-level Fleiss' kappa (Fleiss 1971)
  for multi-rater agreement with missing votes.
- :func:`dawid_skene` — Dawid & Skene (1979) EM: per-annotator
  confusion matrices weight votes, recovering true labels better than
  majority vote when annotator quality varies.  Iterative (rows-only
  verification class), but every per-item aggregation quantizes its
  log-likelihood terms to DECIMAL(18,12) before summing, so results
  are partition/order invariant — the engine's sequential-float
  discipline.

Scale shape: votes tables are (items x annotators)-sized — tiny next
to the corpus.  Majority/kappa are one or two grouped aggregates;
Dawid-Skene shuffles (item, class) posteriors per iteration and
broadcasts the (annotators x classes^2)-sized confusion model.

Reference anchor: the reference has no annotation tooling (its scope
ends at sensor decoding — SURVEY §2); this is a first-class LLM-data
extension like the dedup/quality/retrieval families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkgraft.operators.stats import exact_ratio, exact_ratio_scaled

__all__ = [
    "majority_label",
    "annotator_kappa",
    "fleiss_kappa",
    "dawid_skene",
]


def majority_label(
    votes: DataFrame,
    item_col: str = "item_id",
    annotator_col: str = "annotator_id",
    label_col: str = "label",
    digits: int = 6,
) -> DataFrame:
    """Per-item majority vote: ``(item, voted_label, n_agree, n_votes,
    agreement)`` where ties break to the SMALLEST label (total
    deterministic order).  ``agreement`` = n_agree / n_votes, HALF-UP
    at ``digits`` via the exact integer kernel (never ``round(double)``
    of an integer ratio — round-9 discipline)."""
    counts = votes.groupBy(item_col, label_col).agg(
        F.count("*").alias("n_agree")
    )
    w = Window.partitionBy(item_col).orderBy(
        F.col("n_agree").desc(), F.col(label_col).asc()
    )
    tot = Window.partitionBy(item_col)
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_votes", F.sum("n_agree").over(tot))
        .filter(F.col("_rn") == 1)
        .select(
            item_col,
            F.col(label_col).alias("voted_label"),
            "n_agree",
            "n_votes",
            exact_ratio(F.col("n_agree"), F.col("n_votes"), digits).alias(
                "agreement"
            ),
        )
    )


def annotator_kappa(
    votes: DataFrame,
    item_col: str = "item_id",
    annotator_col: str = "annotator_id",
    label_col: str = "label",
    digits: int = 6,
) -> DataFrame:
    """Pairwise Cohen's kappa: for every annotator pair (a < b), over
    the items BOTH annotated — ``(annotator_a, annotator_b, n_items,
    po, pe, kappa)``.  p_o = observed agreement; p_e = chance
    agreement from each side's label marginals on the co-annotated
    items (the standard Cohen construction).  Every statistic is a
    ratio of integer counts, HALF-UP-rounded via the exact integer
    kernel — including kappa, which stays rational:
    ``kappa = (po - pe)/(1 - pe) = (n_eq*n - pe_num)/(n^2 - pe_num)``
    with n = n_items — so no double ever forms before the final
    /10^digits (round-9 discipline: ``round(double)`` of an integer
    ratio flips between engines exactly when the ratio terminates on a
    rounding half-boundary, as Fleiss p_e did in round 8).  kappa is
    NULL when p_e = 1 (degenerate: both sides constant)."""
    a = votes.select(
        F.col(item_col).alias("item"),
        F.col(annotator_col).alias("annotator_a"),
        F.col(label_col).alias("la"),
    )
    b = votes.select(
        F.col(item_col).alias("item"),
        F.col(annotator_col).alias("annotator_b"),
        F.col(label_col).alias("lb"),
    )
    pairs = a.join(b, "item").filter(
        F.col("annotator_a") < F.col("annotator_b")
    )
    # label marginals per (pair, label) on the co-annotated items —
    # the ONE aggregate over the item self-join; n_items / n_eq roll
    # up from it (r14: previously a second full pass over `pairs`,
    # guide §2.3 aggregate-before-you-reuse — counts identical:
    # n_items = Σ n, n_eq = Σ n where la = lb).
    marg = pairs.groupBy("annotator_a", "annotator_b", "la", "lb").agg(
        F.count("*").alias("n")
    )
    per = marg.groupBy("annotator_a", "annotator_b").agg(
        F.sum("n").alias("n_items"),
        F.sum(
            F.when(F.col("la") == F.col("lb"), F.col("n")).otherwise(0)
        ).alias("n_eq"),
    )
    ca = marg.groupBy("annotator_a", "annotator_b", "la").agg(
        F.sum("n").alias("na")
    )
    cb = marg.groupBy("annotator_a", "annotator_b", "lb").agg(
        F.sum("n").alias("nb")
    )
    pe_num = (
        ca.join(
            cb,
            (ca["annotator_a"] == cb["annotator_a"])
            & (ca["annotator_b"] == cb["annotator_b"])
            & (ca["la"] == cb["lb"]),
        )
        .select(ca["annotator_a"], ca["annotator_b"], (F.col("na") * F.col("nb")).alias("prod"))
        .groupBy("annotator_a", "annotator_b")
        .agg(F.sum("prod").alias("pe_num"))
    )
    n = F.col("n_items").cast("decimal(38,0)")
    n_eq = F.col("n_eq").cast("decimal(38,0)")
    pe_n = F.col("pe_num").cast("decimal(38,0)")
    return (
        per.join(pe_num, ["annotator_a", "annotator_b"], "left")
        .withColumn("pe_num", F.coalesce("pe_num", F.lit(0)))
        .select(
            "annotator_a",
            "annotator_b",
            "n_items",
            exact_ratio(n_eq, n, digits).alias("po"),
            exact_ratio(pe_n, n * n, digits).alias("pe"),
            F.when(
                pe_n < n * n,
                exact_ratio(n_eq * n - pe_n, n * n - pe_n, digits),
            ).alias("kappa"),
        )
    )


def fleiss_kappa(
    votes: DataFrame,
    item_col: str = "item_id",
    label_col: str = "label",
    digits: int = 6,
) -> DataFrame:
    """Fleiss' kappa over the whole vote table (items with >= 2 votes;
    rater counts may vary — the generalized form): one row
    ``(n_items, p_bar, p_e, kappa)``.

    Exactness (round-9): per-item agreement
    ``P_i = (sq - ni)/(ni*(ni-1))`` quantizes HALF-UP to an exact
    12-digit INTEGER (``exact_ratio_scaled``) before the cross-item sum
    (partition-invariant AND engine-invariant), and every emitted
    metric stays rational in integer arithmetic down to the final
    /10^digits: with A = Σ P_i_scaled, B = n_items·10^12,
    C = sq_marg, D = n_votes² — ``p_bar = A/B``, ``p_e = C/D``, and
    kappa goes through 15-digit-quantized pb/pe (overflow headroom —
    see the inline comment).  Round-8's driver flip was
    exactly this query's ``p_e`` terminating ON the round(·,6)
    half-boundary (0.2500295): ``round(double)`` of an integer ratio is
    engine-dependent by construction and is now banned from emissions."""
    nij = votes.groupBy(item_col, label_col).agg(F.count("*").alias("nij"))
    per_item = (
        nij.groupBy(item_col)
        .agg(
            F.sum("nij").alias("ni"),
            F.sum(F.col("nij") * F.col("nij")).alias("sq"),
        )
        .filter(F.col("ni") >= 2)
    )
    p_i_scaled = exact_ratio_scaled(
        F.col("sq") - F.col("ni"),
        F.col("ni") * (F.col("ni") - 1),
        12,
    )
    agg = per_item.agg(
        F.count("*").alias("n_items"),
        F.sum(p_i_scaled).alias("p_sum_s"),
        F.sum("ni").alias("n_votes"),
    )
    marg = (
        votes.join(per_item.select(item_col), item_col)
        .groupBy(label_col)
        .agg(F.count("*").alias("nj"))
        .agg(F.sum(F.col("nj") * F.col("nj")).alias("sq_marg"))
    )
    a = F.col("p_sum_s").cast("decimal(38,0)")
    b = F.col("n_items").cast("decimal(38,0)") * F.lit(10**12).cast(
        "decimal(38,0)"
    )
    c = F.col("sq_marg").cast("decimal(38,0)")
    d = F.col("n_votes").cast("decimal(38,0)") * F.col("n_votes").cast(
        "decimal(38,0)"
    )
    # Overflow headroom (round-9 review): the one-stage kappa
    # (A·D − C·B)/(B·(D − C)) scales with n_items·n_votes²·10^12 and
    # the kernel's extra ·2·10^digits overflows DECIMAL(38,0) near
    # 10^6 items x 10^6 votes.  Quantize p_bar and p_e to exact
    # 15-digit integers FIRST (≤ 10^15 at ANY corpus size), then
    # kappa = (pb − pe)/(10^15 − pe) through the same kernel.  15
    # digits (not 12): kappa amplifies the quantization by 1/(1−p_e),
    # so the 5e-16 half-up error stays below the emitted 10^-6
    # until 1−p_e < ~5e-10 — a regime no real vote table reaches —
    # while the kernel inputs stay ≤ 10^15·2·10^6 ≪ 10^38 at any
    # corpus size.  The oracle mirrors the identical two-stage
    # arithmetic.
    pb15 = exact_ratio_scaled(a, b, 15)
    pe15 = exact_ratio_scaled(c, d, 15)
    one15 = F.lit(10**15).cast("decimal(38,0)")
    return agg.crossJoin(marg).select(
        "n_items",
        exact_ratio(a, b, digits).alias("p_bar"),
        exact_ratio(c, d, digits).alias("p_e"),
        F.when(
            pe15 < one15, exact_ratio(pb15 - pe15, one15 - pe15, digits)
        ).alias("kappa"),
    )


def dawid_skene(
    votes: DataFrame,
    n_classes: int,
    item_col: str = "item_id",
    annotator_col: str = "annotator_id",
    label_col: str = "label",
    iters: int = 10,
    smoothing: float = 0.01,
    digits: int = 6,
) -> DataFrame:
    """Dawid & Skene (1979) EM label aggregation: learn a per-annotator
    confusion matrix and a class prior, then infer each item's label
    as the posterior argmax — out-votes majority when annotator
    quality varies, because reliable annotators earn sharper confusion
    rows.  Labels must be ints in [0, n_classes).

    Output: ``(item, ds_label, posterior)`` per item.

    Determinism (round-9 rework — the last order-dependent float
    surface): posteriors live as EXACT 10^12-scaled integers
    (``p_s``), so every M-step sum is exact integer arithmetic under
    any partitioning AND matches the SQL oracle's sums bit-for-bit;
    the only floats are the libm log/exp calls themselves, whose
    INPUTS are now identical doubles on both engines (exact scaled
    sums → the same nearest-double conversions) and whose outputs
    quantize via the product-space HALF-UP ``floor(x·10^12 + 0.5)`` —
    bit-identical for identical inputs on every engine, with NO
    rounding-boundary sensitivity (unlike ``round(double, 12)``,
    whose value-vs-product tie handling differs between engines; a
    ds M-step log was measured ~1e-21 from a 12-digit boundary, where
    summation-order wiggle flips the old rounding).  Exp-normalized
    posteriors quantize through the exact integer-ratio kernel; the
    final argmax ranks by the 9-digit kernel with a class tie-break.
    Hard-EM-free: soft posteriors throughout, matching the paper."""
    import math

    from sparkgraft.operators.stats import exact_ratio, exact_ratio_scaled

    def _qlog(x: float) -> float:
        # floor(x*1e12 + 0.5)/1e12 — the oracle computes the IDENTICAL
        # IEEE product/add/floor, so ties need no cross-engine rule.
        return math.floor(x * 1e12 + 0.5) / 1e12

    spark = votes.sparkSession
    v = votes.select(
        F.col(item_col).alias("item"),
        F.col(annotator_col).alias("annotator"),
        F.col(label_col).cast("int").alias("vote"),
    )
    v = v.localCheckpoint()  # votes are metadata-sized; EM re-reads them

    # init: soft class posteriors as exact 10^12-scaled integers
    counts = v.groupBy("item", "vote").agg(F.count("*").alias("n"))
    tot = Window.partitionBy("item")
    post = counts.select(
        "item",
        F.col("vote").alias("cls"),
        exact_ratio_scaled(F.col("n"), F.sum("n").over(tot), 12)
        .cast("decimal(38,0)")
        .alias("p_s"),
    )

    classes = list(range(n_classes))
    sm = smoothing
    smk = smoothing * n_classes
    for _ in range(iters):
        # M-step: confusion pi[a][j][k] and prior — BOUNDED collects
        # (annotators x classes^2 + classes rows); sums are EXACT ints
        joined = v.join(post, "item")  # (item, annotator, vote, cls, p_s)
        conf_rows = (
            joined.groupBy("annotator", "cls", "vote")
            .agg(F.sum("p_s").alias("w"))
            .collect()
        )
        prior_rows = post.groupBy("cls").agg(F.sum("p_s").alias("w")).collect()
        n_items_total = sum(int(r["w"]) for r in prior_rows)
        prior_w = {r["cls"]: int(r["w"]) for r in prior_rows}
        prior = {
            c: (prior_w.get(c, 0) / 1e12 + sm)
            / (n_items_total / 1e12 + smk)
            for c in classes
        }
        # One dict over the bounded collect, then O(1) lookups — the
        # naive per-cell next() scan is quadratic in annotators×classes.
        w_map = {
            (r["annotator"], r["cls"], r["vote"]): int(r["w"])
            for r in conf_rows
        }
        conf: dict = {}
        anns = {r["annotator"] for r in conf_rows}
        for a_ in anns:
            for j in classes:
                row_w = [w_map.get((a_, j, k), 0) for k in classes]
                denom = sum(row_w) / 1e12 + smk  # exact int sum first
                for k in classes:
                    conf[(a_, j, k)] = (row_w[k] / 1e12 + sm) / denom
        # E-step: per (item, class) decimal-quantized log-likelihood.
        # The annotator column keeps the INPUT's type (string ids are
        # as legitimate here as in majority_label/annotator_kappa).
        from pyspark.sql.types import (
            DoubleType,
            IntegerType,
            StructField,
            StructType,
        )

        conf_schema = StructType(
            [
                StructField("annotator", v.schema["annotator"].dataType),
                StructField("cls", IntegerType()),
                StructField("vote", IntegerType()),
                StructField("logp", DoubleType()),
            ]
        )
        conf_df = spark.createDataFrame(
            [
                (a_, j, k, _qlog(math.log(conf[(a_, j, k)])))
                for (a_, j, k) in conf
            ],
            conf_schema,
        )
        prior_df = spark.createDataFrame(
            [(j, _qlog(math.log(prior[j]))) for j in classes],
            "cls int, logprior double",
        )
        ll = (
            v.crossJoin(F.broadcast(prior_df.select("cls")))
            .join(F.broadcast(conf_df), ["annotator", "cls", "vote"])
            .groupBy("item", "cls")
            .agg(
                # logp literals are exact 12-digit decimals; the cast
                # recovers them exactly and the sum is exact decimal.
                F.sum(F.col("logp").cast("decimal(28,12)")).alias("ll")
            )
            .join(F.broadcast(prior_df), "cls")
            .select(
                "item",
                "cls",
                (F.col("ll").cast("double") + F.col("logprior")).alias(
                    "score"
                ),
            )
        )
        # soft posterior via exp-normalize per item (max-shifted);
        # each exp quantizes to an exact 10^12-scaled integer so the
        # normalizing sum and the resulting posterior are exact
        # integer arithmetic (the kernel), not an order-dependent
        # float window sum.
        wmax = Window.partitionBy("item")
        expd = ll.withColumn(
            "qe",
            F.floor(
                F.exp(F.col("score") - F.max("score").over(wmax))
                * F.lit(1e12)
                + F.lit(0.5)
            ).cast("decimal(38,0)"),
        )
        post = expd.select(
            "item",
            "cls",
            exact_ratio_scaled(F.col("qe"), F.sum("qe").over(wmax), 12)
            .cast("decimal(38,0)")
            .alias("p_s"),
        ).localCheckpoint()

    se = Window.partitionBy("item")
    # The per-item total must materialize BEFORE the top-1 filter — a
    # window sum in the post-filter select would see only the
    # surviving row and emit posterior = 1.0.
    ranked = post.withColumn("_sp", F.sum("p_s").over(se)).withColumn(
        "_p9", exact_ratio_scaled(F.col("p_s"), F.col("_sp"), 9)
    )
    w = Window.partitionBy("item").orderBy(
        F.col("_p9").desc(), F.col("cls").asc()
    )
    return (
        ranked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("item").alias(item_col),
            F.col("cls").alias("ds_label"),
            exact_ratio(F.col("p_s"), F.col("_sp"), digits).alias(
                "posterior"
            ),
        )
    )

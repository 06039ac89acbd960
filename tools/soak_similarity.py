"""Similarity-family soak: replicate the sf0.1 embeddings table 32x
(64k vectors, distinct per-replica scales) and time the widened
semantic_dedup and IVF-PQ paths end-to-end — the measured-scaling
evidence behind SCALE.md's "Measured scaling" section.

Run:  python tools/soak_similarity.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from sparkgraft.operators import similarity as SIM  # noqa: E402
from sparkgraft.session import get_spark  # noqa: E402
from sparkgraft.sources.readers import read_table  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark("soak-similarity")
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, sf_dir, "embeddings")

    reps = spark.range(32).select(F.col("id").alias("rep"))
    big = (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * 1000000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: x.cast("double") * (1.0 + F.col("rep") / 1000.0),
            ).alias("embedding"),
            "label",
        )
        .repartition(64)
        .persist()
    )
    print("vectors:", big.count())

    cents = entrymod._ivf_centroids(spark, sf_dir)

    t0 = time.perf_counter()
    dups = (
        SIM.semantic_dedup(big, cents, threshold=0.999)
        .filter(F.col("is_duplicate"))
        .count()
    )
    print(f"semantic_dedup 32x: {time.perf_counter() - t0:.1f}s dups={dups}")

    codebooks = [
        [(c, v[s * 8 : (s + 1) * 8]) for c, v in cents] for s in range(8)
    ]
    queries = big.filter(F.col("vec_id") < 20)
    t0 = time.perf_counter()
    n = SIM.ivfpq_topk(queries, big, cents, codebooks, nprobe=2, k=5).count()
    print(f"ivfpq 32x corpus: {time.perf_counter() - t0:.1f}s rows={n}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")

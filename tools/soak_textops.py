"""Text-family soak: replicate the sf0.1 documents table 1x/8x/32x
(distinct doc ids, per-replica marker token prepended so replicas are
distinct rows but share all interior windows — a near-worst-case
duplication corpus) and time the round-3/4 text flagships end-to-end:
ngram_lm_score, span_coverage_gate, exact_substring_spans (suffix
dedup), and the split-leakage audit.  The point to prove empirically:
their shuffles carry metadata-sized rows (hashes, ids, counts — never
text), so wall-time grows sublinearly in task count and no single-task
cliff appears even when EVERY window is duplicated.

Run:  python tools/soak_textops.py [sf_dir]     # writes stdout table
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sparkgraft.operators import textops as T  # noqa: E402
from sparkgraft.operators.scale import hash_split  # noqa: E402
from sparkgraft.operators.suffixdedup import exact_substring_spans  # noqa: E402
from sparkgraft.session import get_spark  # noqa: E402
from sparkgraft.sources.readers import read_table  # noqa: E402


def replicate(docs, factor: int):
    if factor == 1:
        return docs.select("doc_id", "text").repartition(32).persist()
    reps = docs.sparkSession.range(factor).select(F.col("id").alias("rep"))
    return (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            F.concat(
                F.lit("rep"), F.col("rep").cast("string"), F.lit(" "), F.col("text")
            ).alias("text"),
        )
        .repartition(64)
        .persist()
    )


def timed(label: str, df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.1f}s")
    return dt


def leakage(docs):
    tagged = hash_split(docs, ["doc_id"], train_frac=0.5)
    train = tagged.filter(F.col("split") == "train").select("doc_id", "text")
    hold = tagged.filter(F.col("split") == "holdout").select("doc_id", "text")
    return T.incremental_dedup(
        hold, train, shingle_k=3, num_hashes=12, bands=2, min_jaccard=0.5
    )


def main(sf_dir: str) -> None:
    spark = get_spark("soak-textops")
    spark.sparkContext.setLogLevel("ERROR")
    base = read_table(spark, sf_dir, "documents")
    for factor in (1, 8, 32):
        big = replicate(base, factor)
        n = big.count()
        print(f"factor {factor}x: {n} docs")
        timed("ngram_lm", T.ngram_lm_score(big))
        timed(
            "span_gate",
            T.span_coverage_gate(big, window_tokens=8, max_dup_permille=300),
        )
        timed(
            "suffix_dedup",
            exact_substring_spans(big, min_len=25, n_shards=max(8, 2 * factor)),
        )
        timed("split_leakage", leakage(big))
        big.unpersist()
    spark.stop()


def round4_soak(sf_dir: str) -> None:
    """Round-4 additions at 1x/8x/32x: suffix-automaton benchmark
    overlap (linear walk), DDSketch build+quantiles (aggregate-shaped),
    gopher rule battery (scan-speed claim)."""
    from sparkgraft.operators.sketch import ddsketch_build, ddsketch_quantiles
    from sparkgraft.operators.suffixdedup import longest_benchmark_overlap
    from sparkgraft.operators.textops import gopher_quality

    spark = get_spark("soak-round4")
    spark.sparkContext.setLogLevel("ERROR")
    base = read_table(spark, sf_dir, "documents")
    bench = base.filter(F.col("doc_id") % 100 == 0).select("text")
    events = read_table(spark, sf_dir, "events")
    for factor in (1, 8, 32):
        big = replicate(base, factor)
        n = big.count()
        print(f"factor {factor}x: {n} docs")
        timed("gopher_quality", gopher_quality(big))
        timed("benchmark_overlap", longest_benchmark_overlap(big, bench))
        if factor == 1:
            ev = events.repartition(32).persist()
        else:
            reps = spark.range(factor).select(F.col("id").alias("rep"))
            ev = (
                events.crossJoin(reps)
                .select(
                    (F.col("event_id") + F.col("rep") * 10_000_000).alias(
                        "event_id"
                    ),
                    "event_type",
                    (F.col("value") * (1.0 + F.col("rep") / 100.0)).alias(
                        "value"
                    ),
                )
                .repartition(64)
                .persist()
            )
        print(f"  events: {ev.count()}")
        timed(
            "ddsketch",
            ddsketch_quantiles(
                ddsketch_build(ev, "value", ["event_type"]), ["event_type"]
            ),
        )
        big.unpersist()
        ev.unpersist()
    spark.stop()


if __name__ == "__main__":
    target = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    if os.environ.get("SPARK_GRAFT_SOAK_ROUND4"):
        round4_soak(target)
    else:
        main(target)

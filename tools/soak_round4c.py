"""Round-4 third-session soak: replicate the sf0.1 inputs 1x/8x/32x
and time the new operators end-to-end — cusum_changepoints (window
identity), phash near-dup (banded Hamming join), audio fingerprint
matching (hash join + offset vote), topic model (nnz-bound EM), and
the file-skipping pruned read.

The claims to prove empirically:
- cusum: two ordered window sums per key — wall-time tracks the sort
  of (key, ts) rows, nothing quadratic, no driver state.
- phash_neardup: candidates shuffle as (band, bucket, id, hash) only;
  pairs are bucket-local, so wall-time tracks corpus size while the
  all-pairs space grows 1024x.
- audio_match: the vote join keys on long hashes; replicated tracks
  multiply postings linearly, not quadratically (distinct ids keep
  buckets from exploding).
- topic_model: each EM iteration is two grouped sums + two joins over
  the nnz table — linear in corpus tokens.
- read_skipping: the pruned scan reads a CONSTANT file subset as the
  table grows (files added outside the window are skipped), so the
  window query's wall-time stays flat while the table grows 32x.

Run:  python tools/soak_round4c.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sparkgraft.operators.multimodal import (  # noqa: E402
    audio_fingerprint,
    audio_match,
    encode_fake_audio,
    encode_fake_image,
    image_phash,
    phash_neardup,
)
from sparkgraft.operators.stats import cusum_changepoints  # noqa: E402
from sparkgraft.operators.topics import topic_model  # noqa: E402
from sparkgraft.session import get_spark  # noqa: E402
from sparkgraft.sinks.layout import (  # noqa: E402
    read_skipping,
    write_with_stats,
)
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
    spark = get_spark("soak-r4c")
    spark.sparkContext.setLogLevel("ERROR")
    events = read_table(spark, sf_dir, "events")
    docs = read_table(spark, sf_dir, "documents")

    def gen_images(d):
        def k(batches):
            import pandas as pd

            for pdf in batches:
                ids, blobs = [], []
                for did in pdf["doc_id"]:
                    did = int(did)
                    px = np.random.RandomState(did % 100_000).randint(
                        0, 256, size=(16, 16)
                    ).astype(np.uint8)
                    ids.append(did)
                    blobs.append(encode_fake_image(16, 16, px.tobytes()))
                yield pd.DataFrame({"media_id": ids, "data": blobs})

        return d.select("doc_id").mapInPandas(k, "media_id long, data binary")

    def gen_audio(d):
        def k(batches):
            import pandas as pd

            seg, n_seg = 128 * 4, 12
            tseg = np.arange(seg) / 8000.0
            for pdf in batches:
                ids, blobs = [], []
                for did in pdf["doc_id"]:
                    did = int(did)
                    rng = np.random.RandomState(did % 100_000)
                    notes = 300 + 25 * rng.randint(0, 100, size=n_seg)
                    sig = np.concatenate(
                        [np.sin(2 * np.pi * f * tseg) for f in notes]
                    ) + 0.01 * rng.randn(seg * n_seg)
                    ids.append(did)
                    blobs.append(encode_fake_audio(sig))
                yield pd.DataFrame({"media_id": ids, "data": blobs})

        return d.select("doc_id").mapInPandas(k, "media_id long, data binary")

    for factor in (1, 8, 32):
        print(f"factor {factor}x", flush=True)
        ev = replicate(events, factor, "event_id")
        dc = replicate(docs, factor, "doc_id")
        n_ev, n_dc = ev.count(), dc.count()
        print(f"  rows: events={n_ev} docs={n_dc}", flush=True)

        timed(
            "cusum_changepoints",
            lambda: noop(
                cusum_changepoints(
                    ev.withColumn(
                        "value",
                        F.col("value")
                        + F.when(
                            F.col("ts") >= F.lit("2024-01-16").cast("timestamp"),
                            4.0,
                        ).otherwise(0.0),
                    ),
                    "event_type", "ts", "event_id", "value",
                    k=0.5, h=10.0, baseline_n=50,
                )
            ),
        )
        timed(
            "phash_neardup",
            lambda: noop(
                phash_neardup(image_phash(gen_images(dc)), max_hamming=3)
            ),
        )
        # audio corpus capped at 8x (the fixture synthesis itself is the
        # cost at 32x; the match join is the claim under test)
        if factor <= 8:
            timed(
                "audio_match",
                lambda: noop(
                    audio_match(
                        audio_fingerprint(gen_audio(dc)), min_matches=200
                    )
                ),
            )
        timed(
            "topic_model",
            lambda: [noop(x) for x in topic_model(
                dc, k=4, dim=64, kmeans_iters=2, em_iters=2
            )],
        )
        with tempfile.TemporaryDirectory(prefix="soak_skip_") as td:
            path = f"{td}/ev"
            write_with_stats(
                ev, path, ["ts"], sort_col="ts", n_files=8 * factor
            )
            lo = F.lit("2024-01-10").cast("timestamp")
            hi = F.lit("2024-01-13").cast("timestamp")
            keep = (F.col("max_ts") >= lo) & (F.col("min_ts") <= hi)
            timed(
                "read_skipping window agg",
                lambda: noop(
                    read_skipping(spark, path, keep)
                    .filter(F.col("ts").between(lo, hi))
                    .groupBy("event_type")
                    .agg(F.count("*"))
                ),
            )
        ev.unpersist()
        dc.unpersist()
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")

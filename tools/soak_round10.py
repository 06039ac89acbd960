"""Round-10 soak: the round-9 exact kernels under growth
(VERDICT r9 task 5).

Claims to prove empirically (the r4-r9 soak discipline):

- pca_components (exact integer power iteration, round 9): the
  covariance build must stay MAP-SIDE COMBINED as rows grow 32x — the
  per-batch `pair_sums` partials reduce to d(d+1)/2 shuffle rows per
  task regardless of row count, so covariance wall tracks the SCAN,
  not the shuffle; and the driver-side integer matvec cost (d x 40
  iterations on a d x d matrix) is row-count-INDEPENDENT (identical
  eigenvectors, ~constant driver wall at every data scale).  Dim
  growth (8/16/32 at 1x) bounds the d^2 term: partial rows grow as
  the triangle (36/136/528), never as rows x triangle.

- audio_fingerprint (exact integer rDFT, round 9): per-track LINEAR
  at 32x tracks — the fused hi/lo-split BLAS basis matmul is
  per-track Arrow work with no cross-track term, so wall/track is
  ~flat from 8x to 32x (1x pays Python-worker + codegen warm-up).
  Round 9 measured 1x/8x on the fingerprint+match path; this adds
  the fingerprint-only 32x point the verdict asked for.

Run:  python tools/soak_round10.py          # one JSON line per case
Results land in SCALE.md (round-10 section).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sparkgraft.operators.linalg import (  # noqa: E402
    covariance_matrix,
    pca_components,
    power_components_int,
    COV_SCALE,
)
from sparkgraft.operators.multimodal import (  # noqa: E402
    audio_fingerprint,
    encode_fake_audio,
)
from sparkgraft.session import get_spark  # noqa: E402
from sparkgraft.sources.readers import read_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(df, factor: int, id_col: str):
    if factor == 1:
        return df
    span = df.agg(F.max(id_col)).first()[0] + 1
    copies = [
        df.withColumn(id_col, F.col(id_col) + F.lit(int(i * span)))
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def soak_pca(spark) -> None:
    emb = read_table(spark, SF_DIR, "embeddings")

    # --- map-side combine witness: the covariance plan must carry a
    # partial aggregate below the exchange (rows into the shuffle are
    # batches x triangle, combined to triangle-per-task) ---
    from sparkgraft.plans.audit import explain_str

    plan = explain_str(covariance_matrix(emb, "embedding", 8))
    assert "partial_" in plan, "covariance partials not map-side combined"

    # --- row growth: driver matvec cost must be row-independent ---
    rows_out = {}
    for factor in (1, 8, 32):
        e = replicate(emb, factor, "vec_id")
        n = e.count()
        t0 = time.perf_counter()
        rows = covariance_matrix(e, "embedding", 8).collect()
        t_cov = time.perf_counter() - t0
        cov = [[0] * 8 for _ in range(8)]
        for r in rows:
            cs = int(round(r["cov"] * COV_SCALE))
            cov[r["i"]][r["j"]] = cs
            cov[r["j"]][r["i"]] = cs
        t0 = time.perf_counter()
        vecs, lams = power_components_int(cov, 4)
        t_power = time.perf_counter() - t0
        rows_out[factor] = {
            "rows": n,
            "cov_s": round(t_cov, 2),
            "power_s": round(t_power, 4),
            "lams": lams,
        }
    # replication leaves the population covariance IDENTICAL -> the
    # driver iteration must produce identical eigenvalues at every
    # scale (bit-exact: integer arithmetic end to end)
    assert rows_out[1]["lams"] == rows_out[8]["lams"] == rows_out[32]["lams"]
    print(json.dumps({"case": "pca_rows", **{str(k): v for k, v in rows_out.items()}}), flush=True)

    # --- dim growth at 1x: partial rows grow as the triangle ---
    dims_out = {}
    for dim in (8, 16, 32):
        t0 = time.perf_counter()
        comps, lams, mean = pca_components(emb, "embedding", dim, k=4)
        dims_out[dim] = {
            "fit_s": round(time.perf_counter() - t0, 2),
            "triangle": dim * (dim + 1) // 2,
        }
    print(json.dumps({"case": "pca_dims", **{str(k): v for k, v in dims_out.items()}}), flush=True)


def soak_rdft(spark) -> None:
    docs = read_table(spark, SF_DIR, "documents").select("doc_id").limit(2000)

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

        return d.mapInPandas(k, "media_id long, data binary")

    out = {}
    for factor in (1, 8, 32):
        d = replicate(docs, factor, "doc_id").repartition(32)
        n = d.count()
        t0 = time.perf_counter()
        noop(audio_fingerprint(gen_audio(d)))
        wall = time.perf_counter() - t0
        out[factor] = {
            "tracks": n,
            "wall_s": round(wall, 1),
            "ms_per_track": round(1000 * wall / n, 2),
        }
    print(json.dumps({"case": "rdft_tracks", **{str(k): v for k, v in out.items()}}), flush=True)


def main() -> None:
    spark = get_spark("soak-r10")
    spark.sparkContext.setLogLevel("ERROR")
    soak_pca(spark)
    soak_rdft(spark)
    spark.stop()


if __name__ == "__main__":
    main()

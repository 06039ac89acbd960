"""PCA building blocks: exact covariance vs numpy on quantized ints,
partitioning independence, component orthonormality/ordering, and
projection parity with a numpy reference."""

from __future__ import annotations

import random

import numpy as np
import pytest

from sparkgraft.operators.linalg import (
    X_SCALE,
    covariance_matrix,
    pca_components,
    pca_project,
)


def vec_df(spark, arr, parts=5):
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(arr)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(parts)


def quantized(arr, dim):
    # float32 storage round-trip, then the kernel's quantization
    a32 = np.asarray(arr, dtype=np.float32)[:, :dim].astype(np.float64)
    return np.rint(a32 * X_SCALE).astype(np.int64)


def py_cov(arr, dim, digits=8):
    xs = quantized(arr, dim)
    n = len(xs)
    out = {}
    for i in range(dim):
        for j in range(i, dim):
            sxy = int(np.dot(xs[:, i].astype(object), xs[:, j].astype(object)))
            num = (n * sxy - int(xs[:, i].sum()) * int(xs[:, j].sum())) * 10**digits
            den = n * n * X_SCALE * X_SCALE
            s = -1 if num < 0 else 1
            out[(i, j)] = s * ((2 * abs(num) + den) // (2 * den)) / 10**digits
    return out


@pytest.fixture(scope="module")
def data():
    rng = random.Random(12)
    # anisotropic: dim0 dominates, dim1 correlated with dim0
    arr = []
    for _ in range(300):
        a = rng.gauss(0, 3)
        b = 0.5 * a + rng.gauss(0, 1)
        c = rng.gauss(0, 0.2)
        d = rng.gauss(1, 0.1)
        arr.append([a, b, c, d])
    return arr


def test_covariance_matches_python_exact(spark, data):
    got = {
        (r["i"], r["j"]): r["cov"]
        for r in covariance_matrix(vec_df(spark, data), "embedding", 4).collect()
    }
    assert got == py_cov(data, 4)


def test_covariance_partitioning_independent(spark, data):
    a = sorted(
        tuple(r)
        for r in covariance_matrix(
            vec_df(spark, data, parts=1), "embedding", 3
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in covariance_matrix(
            vec_df(spark, data, parts=17), "embedding", 3
        ).collect()
    )
    assert a == b


def test_pca_components_orthonormal_and_ordered(spark, data):
    comps, vals, mean = pca_components(vec_df(spark, data), "embedding", 4, 3)
    c = np.array(comps)
    # r9: the fit is integer power iteration at V_SCALE=1e9 (exact,
    # SQL-replayable) — components are orthonormal to the fixed-point
    # quantization (~1e-7 after deflation), not LAPACK's 1e-15.
    assert np.allclose(c @ c.T, np.eye(3), atol=1e-6)
    assert vals[0] >= vals[1] >= vals[2] >= 0
    # dim0 dominates the top component
    assert abs(c[0][0]) > 0.7
    # sign canonicalization: pivot coordinate positive
    for row in c:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_pca_project_matches_numpy(spark, data):
    df = vec_df(spark, data)
    comps, _, mean = pca_components(df, "embedding", 4, 2)
    got = {r["vec_id"]: list(r["pc"]) for r in
           pca_project(df, "embedding", comps, mean).collect()}
    a32 = np.asarray(data, dtype=np.float32).astype(np.float64)
    # reference replays the operator's fold order: dot of raw vector
    # minus the component·mean offset, rounded at 6
    cm = np.array(comps)
    for i, row in enumerate(a32):
        ref = cm @ row - cm @ np.array(mean)
        for g, r in zip(got[i], ref):
            assert abs(g - r) < 1e-6


def test_pca_projection_reduces_reconstruction_error(spark, data):
    df = vec_df(spark, data)
    a32 = np.asarray(data, dtype=np.float32).astype(np.float64)
    centered = a32 - a32.mean(axis=0)
    errs = []
    for k in (1, 2, 4):
        comps, _, mean = pca_components(df, "embedding", 4, k)
        cm = np.array(comps)
        proj = (centered @ cm.T) @ cm
        errs.append(float(((centered - proj) ** 2).sum()))
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 1e-6 * max(errs[0], 1.0) or errs[2] < 1e-3

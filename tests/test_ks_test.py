"""Two-sample KS: exact statistic vs a fraction-arithmetic Python
reference, identical-sample zero, drift verdicts, binned variant
bounds, partitioning independence."""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F

from sparkgraft.operators.stats import ks_test, ks_test_binned


def py_ks(xs, ys, crit_num=1358, crit_den=1000):
    na, nb = len(xs), len(ys)
    cx, cy = Counter(xs), Counter(ys)
    ca = cb = m = 0
    for v in sorted(set(xs) | set(ys)):
        ca += cx[v]
        cb += cy[v]
        m = max(m, abs(ca * nb - cb * na))
    ks6 = (2 * m * 10**6 + na * nb) // (2 * na * nb) / 10**6
    drift = (m * crit_den) ** 2 > crit_num**2 * (na + nb) * na * nb
    return ks6, drift, na, nb


def vdf(spark, xs, parts=5):
    return spark.createDataFrame(
        [(float(x),) for x in xs], "value double"
    ).repartition(parts)


def run(spark, xs, ys, binned=False):
    fn = ks_test_binned if binned else ks_test
    row = fn(vdf(spark, xs), vdf(spark, ys), "value").first()
    return row["ks_stat"], row["drift"], row["n_a"], row["n_b"]


def test_ks_matches_python_reference(spark):
    rng = random.Random(7)
    xs = [rng.gauss(0, 1) for _ in range(300)]
    ys = [rng.gauss(0.5, 1.3) for _ in range(200)]
    got = run(spark, xs, ys)
    assert got == py_ks(xs, ys)


def test_ks_identical_samples_zero(spark):
    xs = [float(i % 17) for i in range(100)]
    ks, drift, na, nb = run(spark, xs, xs)
    assert ks == 0.0 and drift is False and na == nb == 100


def test_ks_obvious_shift_drifts(spark):
    xs = [float(i) for i in range(200)]
    ys = [float(i) + 1000.0 for i in range(200)]
    ks, drift, _, _ = run(spark, xs, ys)
    assert ks == 1.0 and drift is True


def test_ks_ties_across_samples(spark):
    # shared values force the ECDF step alignment the groupBy handles
    xs = [1.0, 1.0, 2.0, 3.0]
    ys = [1.0, 2.0, 2.0, 4.0]
    got = run(spark, xs, ys)
    assert got == py_ks(xs, ys)


def test_ks_grouped_and_partition_independent(spark):
    rng = random.Random(3)
    rows_a = [("g1", rng.gauss(0, 1)) for _ in range(150)] + [
        ("g2", rng.gauss(0, 1)) for _ in range(120)
    ]
    rows_b = [("g1", rng.gauss(2, 1)) for _ in range(130)] + [
        ("g2", rng.gauss(0, 1)) for _ in range(110)
    ]
    a = spark.createDataFrame(rows_a, "g string, value double")
    b = spark.createDataFrame(rows_b, "g string, value double")
    r1 = sorted(
        tuple(r)
        for r in ks_test(a.repartition(1), b.repartition(1), "value", ["g"]).collect()
    )
    r13 = sorted(
        tuple(r)
        for r in ks_test(a.repartition(13), b.repartition(7), "value", ["g"]).collect()
    )
    assert r1 == r13
    verdict = {r[0]: r[4] for r in r1}
    assert verdict == {"g1": True, "g2": False}


def test_ks_binned_close_to_exact_and_handles_signs(spark):
    rng = random.Random(11)
    xs = [rng.gauss(0, 5) for _ in range(400)]  # negatives + positives
    ys = [rng.gauss(3, 5) for _ in range(350)]
    exact, drift_e, _, _ = run(spark, xs, ys)
    binned, drift_b, _, _ = run(spark, xs, ys, binned=True)
    # alpha=1% buckets: statistic within a few bucket-masses of exact
    assert abs(exact - binned) < 0.05
    assert drift_b == drift_e is True
    # zeros route to the sign-0 cell without error
    ks0, _, _, _ = run(spark, [0.0] * 50, [0.0] * 50, binned=True)
    assert ks0 == 0.0


def test_ks_nan_and_null_filtered(spark):
    xs = vdf(spark, [1.0, 2.0, 3.0]).unionByName(
        spark.createDataFrame([(float("nan"),), (None,)], "value double")
    )
    row = ks_test(xs, vdf(spark, [1.0, 2.0, 3.0]), "value").first()
    assert row["n_a"] == 3 and row["ks_stat"] == 0.0

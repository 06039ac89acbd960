"""A-ES weighted sampling: python-replica parity, partitioning
independence, weight monotonicity, non-positive-weight exclusion."""

from __future__ import annotations

import hashlib
import math


from sparkgraft.operators.scale import weighted_sample


def py_priority(key, w, salt="ws"):
    h = hashlib.md5(f"{salt}|{key}".encode()).hexdigest()
    u = (int(h[:15], 16) + 1) / float(1 << 60)  # (0,1]: ln(u) always finite
    return math.log(u) / w


def test_matches_python_replica(spark):
    rows = [(i, float(1 + (i % 7))) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w double").repartition(9)
    got = sorted(r["id"] for r in weighted_sample(df, "w", ["id"], k=20).collect())
    expect = sorted(
        i for i, _ in sorted(
            rows, key=lambda r: -py_priority(r[0], r[1])
        )[:20]
    )
    assert got == expect


def test_partitioning_independent(spark):
    rows = [(i, float(1 + (i % 5))) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, w double")
    a = sorted(r["id"] for r in
               weighted_sample(df.repartition(1), "w", ["id"], k=30).collect())
    b = sorted(r["id"] for r in
               weighted_sample(df.repartition(13), "w", ["id"], k=30).collect())
    assert a == b


def test_heavier_weights_oversampled(spark):
    # ids 0-999 weight 10, ids 1000-1999 weight 1: the heavy stratum
    # should dominate a k=200 sample by a wide margin
    rows = [(i, 10.0) for i in range(1000)] + [(i, 1.0) for i in range(1000, 2000)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = [r["id"] for r in weighted_sample(df, "w", ["id"], k=200).collect()]
    heavy = sum(1 for i in got if i < 1000)
    assert heavy > 150


def test_nonpositive_weights_excluded(spark):
    rows = [(1, 5.0), (2, 0.0), (3, -2.0), (4, 1.0)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = {r["id"] for r in weighted_sample(df, "w", ["id"], k=10).collect()}
    assert got == {1, 4}

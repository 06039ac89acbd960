"""Misra-Gries heavy hitters: candidate guarantee, summary bounds,
partitioning independence, exactness of the two-pass result."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from sparkgraft.operators.sketch import heavy_hitters, mg_summaries


def skewed_df(spark, n_hot=5, hot=500, n_cold=2000, parts=7):
    rng = random.Random(42)
    rows = [(f"hot{i}",) for i in range(n_hot) for _ in range(hot)]
    rows += [(f"cold{rng.randrange(10**9)}",) for _ in range(n_cold)]
    rng.shuffle(rows)
    return spark.createDataFrame(rows, "key string").repartition(parts)


def exact_hh(rows, k):
    from collections import Counter

    c = Counter(r for (r,) in rows)
    n = sum(c.values())
    return {key: v for key, v in c.items() if v * k > n}


def test_heavy_hitters_exact(spark):
    df = skewed_df(spark)
    truth = exact_hh([(r["key"],) for r in df.collect()], k=10)
    got = {r["key"]: r["n"] for r in heavy_hitters(df, "key", k=10).collect()}
    assert got == truth
    assert set(got) == {f"hot{i}" for i in range(5)}


def test_heavy_hitters_partitioning_independent(spark):
    df = skewed_df(spark)
    a = sorted(
        tuple(r) for r in heavy_hitters(df.repartition(1), "key", k=10).collect()
    )
    b = sorted(
        tuple(r) for r in heavy_hitters(df.repartition(13), "key", k=10).collect()
    )
    assert a == b and len(a) > 0


def test_mg_summary_bounds(spark):
    k = 10
    df = skewed_df(spark, parts=1).coalesce(1)
    rows = df.collect()
    from collections import Counter

    truth = Counter(r["key"] for r in rows)
    summ = mg_summaries(df, "key", k=k).collect()
    keyed = {r["key"]: r["lb"] for r in summ if r["key"] is not None}
    n_part = sum(r["lb"] for r in summ if r["key"] is None)
    assert n_part == len(rows)
    # at most k-1 counters survive
    assert len(keyed) <= k - 1
    for key, lb in keyed.items():
        assert 0 < lb <= truth[key]
        # undercount bounded by n/k
        assert truth[key] - lb <= n_part / k
    # every true heavy hitter is present in the summary
    for key, v in truth.items():
        if v * k > n_part:
            assert key in keyed


def test_heavy_hitters_null_keys_ignored(spark):
    df = spark.createDataFrame(
        [("a",)] * 9 + [(None,)] * 6 + [("b",)] * 1, "key string"
    ).repartition(3)
    got = {r["key"]: (r["n"], r["share"]) for r in
           heavy_hitters(df, "key", k=2).collect()}
    # n_total = 10 non-null rows; 'a' (9) passes 9*2>10, 'b' (1) fails
    assert got == {"a": (9, 0.9)}


def test_heavy_hitters_share_column(spark):
    df = spark.createDataFrame([("x",)] * 3 + [("y",)] * 1, "key string")
    row = heavy_hitters(df, "key", k=2).filter(F.col("key") == "x").first()
    assert row["n"] == 3 and abs(row["share"] - 0.75) < 1e-12


def test_mg_trim_margin_exact(spark):
    """Regression: the trim must subtract the k-th largest counter, not
    the (k-1)-th — with k=3 and single-partition counts A=4, B=4, C=1
    (n=9) the wrong pivot evicts BOTH true heavy hitters (4*3 > 9) and
    heavy_hitters() silently returns an empty set."""
    rows = [("A",)] * 4 + [("B",)] * 4 + [("C",)]
    df = spark.createDataFrame(rows, "key string").coalesce(1)
    got = {r["key"]: r["n"] for r in heavy_hitters(df, "key", k=3).collect()}
    assert got == {"A": 4, "B": 4}
    # and the per-partition summary keeps at most k-1 counters
    summ = mg_summaries(df, "key", k=3).collect()
    assert sum(1 for r in summ if r["key"] is not None) <= 2

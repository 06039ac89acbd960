"""Engine-side properties of `semantic_dedup(max_cluster_size=...)`
(round-13, verdict r12 task 1) that the oracle witness can't see from
the outside: the no-op equivalence when nothing is oversized, the
group-size bound (observed through survivors-per-group on an
identical-vector mega-cluster), the recall trade direction, and
determinism."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sparkgraft.operators.similarity import semantic_dedup

CENTS = [(0, [3.0] + [0.0] * 7), (1, [-3.0] + [0.0] * 7)]


def _corpus(spark, n=120, planted_every=10):
    rows = []
    for i in range(n):
        v = [math.sin(0.3 * i + 0.9 * d) for d in range(8)]
        v[0] += 3.0  # everything lands in cluster 0 — one hot cluster
        rows.append((i, [float(round(x, 6)) for x in v]))
    for i in range(0, n, planted_every):
        rows.append((i + 100000, [x * 1.01 for x in rows[i][1]]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cap_above_cluster_sizes_is_a_noop(spark):
    df = _corpus(spark, n=40)
    un = sorted(map(tuple, semantic_dedup(df, CENTS, 0.999).collect()))
    cap = sorted(
        map(
            tuple,
            semantic_dedup(df, CENTS, 0.999, max_cluster_size=10000).collect(),
        )
    )
    assert un == cap
    assert all(r[2] == 0 for r in cap)  # subcluster 0 everywhere


def test_mega_cluster_of_identical_vectors_is_split_and_bounded(spark):
    """All-identical vectors are the worst case the cap exists for: the
    uncapped operator compares all n² pairs and keeps ONE survivor;
    capped, each final (cluster, sub, block) group keeps exactly its
    min id — so the survivor count reveals the group count, and the
    md5-block bound shows up as survivors ≈ n / M (≥ n/M exactly,
    since no group may exceed ~M members)."""
    n, m = 300, 25
    rows = [(i, [1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0, 4.0]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    un = semantic_dedup(df, CENTS, 0.999).collect()
    assert sum(not r["is_duplicate"] for r in un) == 1

    cap = semantic_dedup(df, CENTS, 0.999, max_cluster_size=m).collect()
    survivors = sum(not r["is_duplicate"] for r in cap)
    # every group ≤ ~M members → at least ~n/M groups; and the split
    # must not shatter into near-singletons (seeded refinement keeps
    # identical vectors together until the hard cap splits them)
    assert survivors >= n // (2 * m)
    assert survivors <= 3 * (n // m + 1)
    # every duplicate's keeper is an earlier id (greedy-by-id holds
    # within groups)
    assert all(
        r["dup_of"] < r["vec_id"] for r in cap if r["is_duplicate"]
    )


def test_recall_trade_is_one_sided_and_deterministic(spark):
    df = _corpus(spark, n=120)
    un = semantic_dedup(df, CENTS, 0.999).collect()
    c1 = semantic_dedup(df, CENTS, 0.999, max_cluster_size=20).collect()
    c2 = semantic_dedup(df, CENTS, 0.999, max_cluster_size=20).collect()
    assert sorted(map(tuple, c1)) == sorted(map(tuple, c2))
    # capped finds a subset of the uncapped duplicate SET (pairs only
    # disappear when a group boundary separates them — none appear)
    un_dups = {r["vec_id"] for r in un if r["is_duplicate"]}
    cap_dups = {r["vec_id"] for r in c1 if r["is_duplicate"]}
    assert cap_dups <= un_dups
    # ...and most planted exact-direction dups survive the split
    planted = {r["vec_id"] for r in c1 if r["vec_id"] >= 100000}
    assert len(cap_dups & planted) >= len(planted) // 2


def test_cap_validates_its_argument(spark):
    import pytest

    df = _corpus(spark, n=10)
    with pytest.raises(ValueError, match="max_cluster_size"):
        semantic_dedup(df, CENTS, 0.999, max_cluster_size=1)

"""Connected-components / dedup-representative semantics on known
topologies, plus determinism across partitionings."""

from __future__ import annotations

from sparkgraft.operators.graph import connected_components, dedup_representatives


def test_components_chain_triangle_pair(spark):
    # chain 1-2-3-4, triangle 10-11-12 (+chord), isolated pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    got = {
        r["id"]: (r["cluster_id"], r["is_representative"])
        for r in dedup_representatives(edges).collect()
    }
    assert {k: v[0] for k, v in got.items()} == {
        1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20,
    }
    reps = {k for k, v in got.items() if v[1]}
    assert reps == {1, 10, 20}


def test_components_deterministic_across_partitionings(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)] + [(1, 39), (0, 38)],
        "id_a long, id_b long",
    )
    runs = []
    for n in ("3", "16"):
        spark.conf.set("spark.sql.shuffle.partitions", n)
        runs.append(
            sorted(tuple(r) for r in connected_components(edges).collect())
        )
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert runs[0] == runs[1]

"""Merge/SCD2 edge cases: empty update batches, brand-new keys,
all-closed histories."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sparkgraft.operators.merge import merge_upsert, scd2_apply


def test_merge_with_empty_updates_is_identity(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    updates = spark.createDataFrame([], "k long, v string")
    out = sorted(map(tuple, merge_upsert(target, updates, ["k"]).collect()))
    assert out == [(1, "a"), (2, "b")]


def test_merge_insert_only(spark):
    target = spark.createDataFrame([(1, "a")], "k long, v string")
    updates = spark.createDataFrame([(2, "new")], "k long, v string")
    out = sorted(map(tuple, merge_upsert(target, updates, ["k"]).collect()))
    assert out == [(1, "a"), (2, "new")]


def test_scd2_closes_and_opens_versions(spark):
    eff = F.lit("2024-01-01 00:00:00").cast("timestamp")
    hist = spark.createDataFrame(
        [
            (1, 10.0, dt.datetime(2020, 1, 1), None),
            (2, 20.0, dt.datetime(2020, 1, 1), None),
            (1, 5.0, dt.datetime(2019, 1, 1), dt.datetime(2020, 1, 1)),
        ],
        "k long, v double, valid_from timestamp, valid_to timestamp",
    )
    updates = spark.createDataFrame([(1, 11.0)], "k long, v double")
    out = scd2_apply(hist, updates, ["k"], eff)
    rows = sorted(
        (r["k"], r["v"], r["valid_to"] is None) for r in out.collect()
    )
    # k=1: old closed row untouched, current closed at eff, new open
    # version; k=2: current stays open.
    assert rows == [
        (1, 5.0, False),
        (1, 10.0, False),
        (1, 11.0, True),
        (2, 20.0, True),
    ]
    closed_now = [
        r for r in out.collect() if r["k"] == 1 and r["v"] == 10.0
    ][0]
    assert closed_now["valid_to"] == dt.datetime(2024, 1, 1)

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


def test_anonymity_audit_hand_math(spark):
    from sparkgraft.operators.merge import anonymity_audit

    rows = [
        ("us", "m", 1),
        ("us", "m", 1),
        ("us", "m", 2),
        ("us", "f", 3),
        ("de", "m", 4),
    ]
    df = spark.createDataFrame(rows, ["country", "gender", "diag"])
    out = anonymity_audit(df, ["country", "gender"], "diag", k=2)
    got = sorted(map(tuple, out.collect()))
    assert got == [
        ("de", "m", 1, 1, False),  # singleton class: re-identifiable
        ("us", "f", 1, 1, False),
        ("us", "m", 3, 2, True),  # k=3, l=2 (diag 1 twice, diag 2)
    ]
    # table-level k/l numbers are the mins
    import pyspark.sql.functions as F

    k_tab, l_tab = out.agg(
        F.min("n_rows"), F.min("n_sensitive")
    ).first()
    assert (k_tab, l_tab) == (1, 1)
    # without a sensitive column, n_sensitive is NULL
    plain = anonymity_audit(df, ["country"], k=2)
    assert all(r["n_sensitive"] is None for r in plain.collect())
    assert {(r["country"], r["n_rows"], r["meets_k"]) for r in plain.collect()} == {
        ("us", 4, True),
        ("de", 1, False),
    }

"""Property tests for the gnarly scalar expressions (SURVEY §5):
OLE round-trip, comma-decimal parsing, filename-timestamp extraction
with mtime fallback.  Hypothesis generates inputs; Spark evaluates in
one batch per test (collecting examples first keeps JVM round-trips
bounded)."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from sparkgraft.functions import expr as E

TS_MIN = dt.datetime(1950, 1, 1)
TS_MAX = dt.datetime(2100, 1, 1)


def _eval(spark, rows, schema, col):
    df = spark.createDataFrame(rows, schema)
    return [r["out"] for r in df.select(col.alias("out")).collect()]


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.datetimes(min_value=TS_MIN, max_value=TS_MAX).map(
            lambda d: d.replace(microsecond=(d.microsecond // 1000) * 1000)
        ),
        min_size=1,
        max_size=20,
    )
)
def test_ole_round_trip_ms(spark, tss):
    """timestamp → OLE days → timestamp survives at ms granularity."""
    rows = [(t,) for t in tss]
    out = _eval(
        spark,
        rows,
        "ts timestamp",
        E.ole_to_timestamp(E.timestamp_to_ole(F.col("ts"))),
    )
    for got, want in zip(out, tss):
        assert abs((got - want).total_seconds()) < 0.001, (got, want)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.decimals(
            min_value=-10**9, max_value=10**9, allow_nan=False, allow_infinity=False, places=3
        ),
        min_size=1,
        max_size=20,
    )
)
def test_comma_decimal_parses_german_notation(spark, decs):
    rows = [(str(d).replace(".", ","),) for d in decs]
    out = _eval(spark, rows, "s string", E.comma_decimal(F.col("s")))
    for got, want in zip(out, decs):
        assert got == float(want), (got, want)


def test_comma_decimal_junk_is_null(spark):
    rows = [("abc",), ("",), ("1,2,3",), ("--5",), ("over 9000",)]
    out = _eval(spark, rows, "s string", E.comma_decimal(F.col("s")))
    assert out == [None] * len(rows)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.datetimes(
            min_value=dt.datetime(2000, 1, 1), max_value=dt.datetime(2099, 12, 31)
        ).map(lambda d: d.replace(microsecond=0)),
        min_size=1,
        max_size=20,
    )
)
def test_filename_timestamp_round_trip(spark, tss):
    rows = [(f"Logger1_{t.strftime('%Y-%m-%d_%H-%M-%S')}.dat",) for t in tss]
    out = _eval(spark, rows, "name string", E.filename_timestamp(F.col("name")))
    assert out == tss


def test_filename_timestamp_mtime_fallback(spark):
    mt = dt.datetime(2025, 6, 19, 12, 0, 0)
    rows = [("no_timestamp_here.dat", mt), ("Logger1_2025-06-19_12-20-00.dat", mt)]
    df = spark.createDataFrame(rows, "name string, mtime timestamp")
    out = [
        r["out"]
        for r in df.select(
            E.filename_timestamp(F.col("name"), F.col("mtime")).alias("out")
        ).collect()
    ]
    assert out[0] == mt  # unparsable name → mtime (helper/utility.py:8-27)
    assert out[1] == dt.datetime(2025, 6, 19, 12, 20, 0)


def test_size_health_flag_boundaries(spark):
    rows = [(402479.0,), (402480.0,), (447200.0,), (491920.0,), (491921.0,)]
    out = _eval(
        spark,
        rows,
        "size double",
        E.size_health_flag(F.col("size"), F.lit(447200.0)),
    )
    # ±10 % inclusive band around 447.2 KB (DataConverterUDBF.py:72-81).
    assert out == [1, 0, 0, 0, 1]


def test_alignment_predicate(spark):
    rows = [
        (dt.datetime(2025, 6, 19, 12, 20, 0),),
        (dt.datetime(2025, 6, 19, 12, 25, 0),),
        (dt.datetime(2025, 6, 19, 12, 20, 30),),
    ]
    out = _eval(spark, rows, "ts timestamp", E.is_10min_aligned(F.col("ts")))
    assert out == [True, False, False]

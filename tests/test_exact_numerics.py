"""Property test for the tie-proof fixed-point mean/sum kernel against
a pure-Python Decimal reference (ROUND_HALF_UP)."""

from __future__ import annotations

import decimal

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from sparkgraft.operators.stats import exact_mean, exact_rounded_sum, scaled_long


def _py_mean(values: list[decimal.Decimal], digits: int) -> float:
    mean = sum(values) / len(values)
    q = decimal.Decimal(1).scaleb(-digits)
    return float(mean.quantize(q, rounding=decimal.ROUND_HALF_UP))


def _py_sum(values: list[decimal.Decimal], digits: int) -> float:
    q = decimal.Decimal(1).scaleb(-digits)
    return float(sum(values).quantize(q, rounding=decimal.ROUND_HALF_UP))


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.decimals(min_value=-10**5, max_value=10**5, places=2, allow_nan=False),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=0, max_value=4),
)
def test_exact_mean_matches_decimal_reference(spark, decs, digits):
    df = spark.createDataFrame([(float(d),) for d in decs], "v double")
    got = df.agg(
        exact_mean(F.sum(scaled_long(F.col("v"))), F.count("v"), digits).alias("m"),
        exact_rounded_sum(F.sum(scaled_long(F.col("v"))), digits).alias("s"),
    ).collect()[0]
    assert got["m"] == _py_mean(decs, digits), (decs, digits)
    assert got["s"] == _py_sum(decs, digits), (decs, digits)

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


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.decimals(
            min_value=-10**10, max_value=10**10, places=4, allow_nan=False
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=0, max_value=4),
)
def test_exact_mean_large_magnitude(spark, decs, digits):
    """Scaled sums here exceed 2^53 — the rounding division must run in
    DECIMAL(38,0) integral `div`, not through a double, to stay exact."""
    df = spark.createDataFrame([(float(d),) for d in decs], "v double")
    got = df.agg(
        exact_mean(F.sum(scaled_long(F.col("v"))), F.count("v"), digits).alias("m"),
        exact_rounded_sum(F.sum(scaled_long(F.col("v"))), digits).alias("s"),
    ).collect()[0]
    assert got["m"] == _py_mean(decs, digits), (decs, digits)
    assert got["s"] == _py_sum(decs, digits), (decs, digits)


def test_extended_stats_nan_exclusion_and_singleton(spark):
    """NaN rows are excluded from every moment (counted in n_nans) and a
    single-row group yields NULL std, not a divide-by-zero artifact."""
    from sparkgraft.operators.stats import extended_stats

    df = spark.createDataFrame(
        [("a", 1.0), ("a", float("nan")), ("a", 3.0), ("b", 7.5)],
        "k string, value double",
    )
    out = {r["k"]: r for r in extended_stats(df, ["k"], "value", 4).collect()}
    a = out["a"]
    assert a["n_rows"] == 3 and a["n_nans"] == 1
    assert a["mean"] == 2.0 and a["min"] == 1.0 and a["max"] == 3.0
    assert a["std"] == 1.4142  # sample std of [1, 3], NaN excluded
    assert a["p50"] == 2.0 and a["p90"] == 2.8
    b = out["b"]
    assert b["n_rows"] == 1 and b["std"] is None and b["mean"] == 7.5


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.decimals(
            min_value=-10**6, max_value=10**6, places=6, allow_nan=False
        ),
        min_size=2,
        max_size=25,
    )
)
def test_extended_stats_cross_engine_six_decimals(spark, decs):
    """extended_stats must hash-match the DuckDB oracle formula on
    6-decimal data — the moments quantize at 1e6 on both sides (a 1e3
    Spark-side quantum silently diverged here)."""
    import math

    import duckdb

    from sparkgraft.operators.stats import extended_stats

    rows = [("g", float(d)) for d in decs] + [("g", float("nan")), ("s", 1.5)]
    df = spark.createDataFrame(rows, "k string, value double")
    got = {
        r["k"]: tuple(r)[1:] for r in extended_stats(df, ["k"], "value", 4).collect()
    }

    vals = ", ".join(f"('g', {float(d)!r})" for d in decs)
    sql = f"""
        WITH src AS (
            SELECT k, value,
                   CASE WHEN isnan(value) THEN NULL ELSE value END AS vv
            FROM (VALUES {vals}, ('g', CAST('nan' AS DOUBLE)), ('s', 1.5)) AS t(k, value)
        )
        SELECT k,
               count(value) AS n_rows,
               count(CASE WHEN isnan(value) THEN 1 END) AS n_nans,
               round(cast(sum(cast(vv AS DECIMAL(27,6))) AS DOUBLE) / count(vv), 4) AS mean,
               round(min(vv), 4) AS "min",
               round(max(vv), 4) AS "max",
               CASE WHEN count(vv) > 1 THEN
                   round(sqrt(greatest((cast(sum(cast(cast(vv AS DECIMAL(27,6)) * cast(vv AS DECIMAL(27,6)) AS DECIMAL(38,12))) AS DOUBLE)
                               - cast(sum(cast(vv AS DECIMAL(27,6))) AS DOUBLE) * cast(sum(cast(vv AS DECIMAL(27,6))) AS DOUBLE) / count(vv))
                              / (count(vv) - 1), 0.0)), 4)
               END AS std,
               round(quantile_cont(vv, 0.5), 4) AS p50,
               round(quantile_cont(vv, 0.9), 4) AS p90
        FROM src GROUP BY k
    """
    want = {r[0]: tuple(r)[1:] for r in duckdb.sql(sql).fetchall()}

    def close(a, b):
        if a is None or b is None:
            return a is None and b is None
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) or math.isnan(b):
                return math.isnan(a) and math.isnan(b)
            return a == b
        return a == b

    for k in ("g", "s"):
        assert all(close(a, b) for a, b in zip(got[k], want[k])), (
            k,
            got[k],
            want[k],
        )


def test_trend_stats_recovers_perfect_line(spark, tmp_path):
    # Build a tiny events-shaped parquet dir: value = 2*t + 1 exactly.
    import pyspark.sql.functions as F

    rows = [
        (i, f"2024-01-01 00:00:{i:02d}", 1, "ch", float(2 * i + 1), "{}")
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double, props string"
    ).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    import __spark_entry__ as entrymod

    out = entrymod.q_trend_stats(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_rows"] == 10
    assert r["slope_per_sec"] == 2.0
    assert r["intercept"] == 1.0
    assert r["r2"] == 1.0

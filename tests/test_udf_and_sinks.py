"""§2.11 UDF-registry passthrough and K1 CSV sink name fidelity."""

from __future__ import annotations

import csv

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from sparkgraft.operators.stats import channel_stats
from sparkgraft.sinks.kv import write_stats_csv


def test_udf_register_passthrough(spark):
    # User extension surface: a registered python UDF is callable from
    # both the DataFrame API and SQL (capability parity, SURVEY §2.11).
    spark.udf.register("celsius_to_kelvin", lambda c: c + 273.15, DoubleType())
    df = spark.createDataFrame([(20.0,), (-273.15,)], "c double")
    out = [r["k"] for r in df.selectExpr("celsius_to_kelvin(c) AS k").collect()]
    assert out == [293.15, 0.0]
    df.createOrReplaceTempView("temps")
    out2 = [
        r["k"]
        for r in spark.sql("SELECT celsius_to_kelvin(c) AS k FROM temps").collect()
    ]
    assert out2 == out


def test_matlab_sink_gated_without_scipy(spark, tmp_path):
    # K2 is import-gated: without scipy it must fail with a clear
    # NotImplementedError, not an obscure ImportError mid-write.
    import pytest

    from sparkgraft.sinks.kv import write_matlab

    df = spark.createDataFrame(
        [("2025-01-01 00:00:00", "C1", 1.0)], "ts_s string, channel string, value double"
    ).selectExpr("cast(ts_s as timestamp) as ts", "channel", "value")
    try:
        import scipy  # noqa: F401

        write_matlab(df, str(tmp_path / "out.mat"), 100.0)
        assert (tmp_path / "out.mat").exists()
    except ImportError:
        with pytest.raises(NotImplementedError, match="scipy"):
            write_matlab(df, str(tmp_path / "out.mat"), 100.0)


def test_stats_csv_name_fidelity(spark, tmp_path):
    # K1: <stem>_stats.csv, no index column (DataConverterUDBF.py:268-279).
    df = spark.createDataFrame(
        [("T_T1", 1.0), ("T_T1", 3.0), ("BS_X", 5.0)], "channel string, value double"
    )
    stats = channel_stats(df, ["channel"], "value")
    target = tmp_path / "Logger1_2025-06-19_12-20-00_stats.csv"
    write_stats_csv(stats, str(target))
    with open(target) as fh:
        rows = list(csv.DictReader(fh))
    by_ch = {r["channel"]: r for r in rows}
    assert by_ch["T_T1"]["mean"] == "2.0"
    assert by_ch["BS_X"]["min"] == "5.0"
    assert set(rows[0].keys()) == {"channel", "mean", "min", "max"}


def test_driver_sink_row_cap_fails_loudly(spark, tmp_path):
    """K1/K2 driver-side sinks are for tiny per-file results — a big
    frame must raise instead of OOMing the driver via toPandas."""
    import pytest

    from sparkgraft.sinks import kv

    big = spark.range(kv.MAX_DRIVER_SINK_ROWS + 1)
    with pytest.raises(ValueError, match="write_stats_csv"):
        kv.write_stats_csv(big, str(tmp_path / "big.csv"))


def test_udtf_matches_expression_form(spark):
    from pyspark.sql import functions as F

    from sparkgraft.functions.udtfs import register_udtfs

    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, ""), (3, "solo")], "id long, text string"
    )
    df.createOrReplaceTempView("udtf_src")
    via_udtf = {
        (r["id"], r["token"], r["idx"])
        for r in spark.sql(
            "SELECT id, token, idx FROM udtf_src, LATERAL tokenize_udtf(text)"
        ).collect()
    }
    via_expr = {
        (r["id"], r["token"], r["idx"])
        for r in df.select(
            "id",
            F.posexplode(F.split(F.trim("text"), r"\s+")).alias("idx", "token"),
        )
        .filter(F.col("token") != "")
        .collect()
    }
    assert via_udtf == via_expr


def test_numbered_lines_udtf(spark):
    from sparkgraft.functions.udtfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "first\nsecond\nthird")], "id long, text string"
    ).createOrReplaceTempView("lines_src")
    rows = spark.sql(
        "SELECT line_no, line FROM lines_src, LATERAL numbered_lines_udtf(text)"
    ).collect()
    assert [(r["line_no"], r["line"]) for r in sorted(rows, key=lambda r: r[0])] == [
        (0, "first"),
        (1, "second"),
        (2, "third"),
    ]


def test_observed_write_single_pass_metrics(spark, tmp_path):
    from pyspark.sql import functions as F

    from sparkgraft.sinks.kv import observed_write

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], "id long, v double"
    )
    got = observed_write(
        df,
        str(tmp_path / "out.parquet"),
        {
            "n_null_v": F.count(F.when(F.col("v").isNull(), 1)),
            "sum_v": F.sum("v"),
        },
    )
    assert got["n_rows"] == 3
    assert got["n_null_v"] == 1
    assert got["sum_v"] == 40.0
    back = spark.read.parquet(str(tmp_path / "out.parquet"))
    assert back.count() == 3

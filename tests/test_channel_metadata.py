"""§1.1 data-model fidelity: channel metadata on columns and the
relative-time vector."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window

from sparkgraft.functions.expr import relative_time
from sparkgraft.sources.readers import with_channel_metadata


def test_channel_metadata_survives_parquet(spark, tmp_path):
    df = spark.createDataFrame(
        [(1.0, 20.5, 0.01)], "ts double, T_T1 double, BS_X double"
    )
    tagged = with_channel_metadata(
        df, {"T_T1": "°C", "BS_X": "µm/m"}, sample_rate=100.0
    )
    assert tagged.schema["T_T1"].metadata == {"unit": "°C", "sample_rate": 100.0}
    path = str(tmp_path / "tagged.parquet")
    tagged.write.parquet(path)
    back = spark.read.parquet(path)
    assert back.schema["T_T1"].metadata["unit"] == "°C"
    assert back.schema["BS_X"].metadata["unit"] == "µm/m"


def test_relative_time_vector(spark):
    # DataConverterUDBF.py:119-126: arange(0, n/rate, 1/rate).
    df = spark.createDataFrame([(i,) for i in range(5)], "i long")
    w = Window.orderBy("i")
    out = [
        r["rel"]
        for r in df.select(
            relative_time(F.row_number().over(w), F.lit(100.0)).alias("rel")
        ).collect()
    ]
    assert out == [0.0, 0.01, 0.02, 0.03, 0.04]

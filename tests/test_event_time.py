"""Event-time streaming: tumbling-window stats with a watermark (the
§2.9 'free in Spark' semantics the reference lacks), and as-of join
tolerance behavior."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sparkgraft.operators.relational import asof_join

SCHEMA = "ts TIMESTAMP, channel STRING, value DOUBLE"


def test_windowed_stats_stream_with_watermark(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    (inp / "f1.csv").write_text(
        "ts,channel,value\n"
        "2025-01-01T00:01:00,C1,10.0\n"
        "2025-01-01T00:05:00,C1,30.0\n"
        "2025-01-01T00:11:00,C1,50.0\n"
    )
    stream = (
        spark.readStream.format("csv")
        .schema(SCHEMA)
        .option("header", "true")
        .load(str(inp))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "channel")
        .agg(F.sum("value").alias("total"), F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "channel", "total", "n")
    )
    rows: list = []
    q = (
        agg.writeStream.foreachBatch(lambda b, _i: rows.extend(b.collect()))
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["ws"].isoformat(), r["n"]): r["total"] for r in rows}
    assert got[("2025-01-01T00:00:00", 2)] == 40.0
    assert got[("2025-01-01T00:10:00", 1)] == 50.0


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [
            (1, dt.datetime(2025, 1, 1, 12, 0, 0), "k"),
            (2, dt.datetime(2025, 1, 1, 18, 0, 0), "k"),
        ],
        "id long, ts timestamp, key string",
    )
    right = spark.createDataFrame(
        [(dt.datetime(2025, 1, 1, 11, 30, 0), "k", 7.0)],
        "rts timestamp, key string, rv double",
    )
    out = asof_join(
        left, right, on=["key"], left_ts="ts", right_ts="rts",
        right_payload=["rv"], tolerance="2 HOURS",
    )
    got = {r["id"]: r["rv"] for r in out.collect()}
    # id=1: match 30 min old (within 2 h); id=2: match 6.5 h stale → nulled.
    assert got[1] == 7.0
    assert got[2] is None


def test_asof_join_no_match_before(spark):
    left = spark.createDataFrame(
        [(1, dt.datetime(2025, 1, 1, 10, 0, 0), "k")],
        "id long, ts timestamp, key string",
    )
    right = spark.createDataFrame(
        [(dt.datetime(2025, 1, 1, 11, 0, 0), "k", 7.0)],
        "rts timestamp, key string, rv double",
    )
    out = asof_join(
        left, right, on=["key"], left_ts="ts", right_ts="rts",
        right_payload=["rv"],
    )
    assert out.collect()[0]["rv"] is None  # right row is in the future

"""Streaming at higher file counts + late-data semantics across
checkpointed drains."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkgraft.operators.stats import channel_stats
from sparkgraft.streaming.pipeline import FilePipeline

SCHEMA = "ts TIMESTAMP, channel STRING, value DOUBLE"


def test_fifty_file_backlog_drains_in_batches(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    for i in range(50):
        (inp / f"f_{i:03d}_2025-01-01_00-{i:02d}-00.csv").write_text(
            f"ts,channel,value\n2025-01-01T00:{i:02d}:00,C1,{float(i)}\n"
        )
    processed: list[str] = []

    p = FilePipeline(
        spark,
        name="bulk",
        input_dir=str(inp),
        schema=SCHEMA,
        transform=lambda df: channel_stats(df, ["channel"], "value"),
        sink=lambda res, stem: processed.append(stem),
        checkpoint_dir=str(tmp_path / "ckpt"),
        archive_dir=str(tmp_path / "done"),
        max_files_per_trigger=10,
    )
    p.run_available()
    assert len(processed) == 50
    assert len(set(processed)) == 50
    assert len(list((tmp_path / "done").iterdir())) == 50


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """D2/D3 in streaming form: duplicate event ids arriving within the
    watermark horizon are emitted once (dropDuplicatesWithinWatermark
    keys state with TTL eviction — the scalable streaming dedup)."""
    inp = tmp_path / "in"
    inp.mkdir()
    (inp / "a.csv").write_text(
        "ts,event_id,value\n"
        "2025-01-01T10:00:00,e1,1.0\n"
        "2025-01-01T10:00:05,e1,1.0\n"
        "2025-01-01T10:00:10,e2,2.0\n"
    )
    stream = (
        spark.readStream.format("csv")
        .schema("ts TIMESTAMP, event_id STRING, value DOUBLE")
        .option("header", "true")
        .load(str(inp))
    )
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    rows: list = []
    q = (
        deduped.writeStream.foreachBatch(lambda b, _i: rows.extend(b.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(r["event_id"] for r in rows) == ["e1", "e2"]


def test_watermark_drops_late_event_across_drains(spark, tmp_path):
    """Event-time watermark persists in the checkpoint: an event far
    older than the advanced watermark is dropped on the next drain."""
    inp = tmp_path / "in"
    inp.mkdir()
    rows_out: list = []

    def drain():
        stream = (
            spark.readStream.format("csv")
            .schema(SCHEMA)
            .option("header", "true")
            .load(str(inp))
        )
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"), "channel")
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("ws"), "channel", "n")
        )
        q = (
            agg.writeStream.foreachBatch(
                lambda b, _i: rows_out.extend(b.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # Drain 1: watermark advances to 12:00 - 10 min = 11:50.
    (inp / "a.csv").write_text(
        "ts,channel,value\n"
        "2025-01-01T11:00:00,C1,1.0\n"
        "2025-01-01T12:00:00,C1,1.0\n"
    )
    drain()
    # Drain 2: an 09:00 event is far behind the checkpointed watermark.
    (inp / "b.csv").write_text("ts,channel,value\n2025-01-01T09:00:00,C1,1.0\n")
    drain()
    # Append mode emits only finalized windows; the 09:00 window must
    # never materialize (dropped as too late).
    emitted = {r["ws"].isoformat() for r in rows_out}
    assert "2025-01-01T09:00:00" not in emitted
    assert "2025-01-01T11:00:00" in emitted  # finalized by the 12:00 event


def test_multi_file_batch_with_action_sink_archives_all(spark, tmp_path):
    """Regression: the sink's Spark action lazily re-lists the batch's
    files, so archiving file N before file N+1's action ran used to
    throw FileNotFoundException and mis-quarantine N+1 (losing its
    result while the checkpoint marked it consumed).  Moves are now
    deferred until every file in the micro-batch is processed."""
    inp = tmp_path / "in"
    inp.mkdir()
    for i in range(6):
        (inp / f"g_{i}_2025-01-01_00-0{i}-00.csv").write_text(
            f"ts,channel,value\n2025-01-01T00:0{i}:00,C1,{float(i)}\n"
        )
    results: dict[str, float] = {}

    def action_sink(res, stem):
        rows = res.collect()  # a real sink always runs an action
        results[stem] = rows[0]["mean"]

    p = FilePipeline(
        spark,
        name="actsink",
        input_dir=str(inp),
        schema=SCHEMA,
        transform=lambda df: channel_stats(df, ["channel"], "value"),
        sink=action_sink,
        checkpoint_dir=str(tmp_path / "ckpt_act"),
        archive_dir=str(tmp_path / "done_act"),
        quarantine_dir=str(tmp_path / "failed_act"),
        max_files_per_trigger=3,
    )
    p.run_available()
    assert len(results) == 6
    assert sorted(results.values()) == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]
    assert len(list((tmp_path / "done_act").iterdir())) == 6
    assert not (tmp_path / "failed_act").exists() or not list(
        (tmp_path / "failed_act").iterdir()
    )

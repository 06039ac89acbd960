"""foreachBatch exactly-once upsert sink: last-writer-wins per key,
idempotent under batch replay (a re-applied batch id is a no-op)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkgraft.streaming.pipeline import upsert_sink


def _stage(spark, tmp_path, name: str, rows: list[tuple[int, int, str]]) -> None:
    (tmp_path / "in").mkdir(exist_ok=True)
    lines = ["k,v,tag"] + [f"{k},{v},{tag}" for k, v, tag in rows]
    (tmp_path / "in" / name).write_text("\n".join(lines) + "\n")


def _run(spark, tmp_path) -> None:
    stream = (
        spark.readStream.schema("k LONG, v LONG, tag STRING")
        .option("header", "true")
        .option("maxFilesPerTrigger", "1")
        .csv(str(tmp_path / "in"))
    )
    q = upsert_sink(
        stream,
        str(tmp_path / "table"),
        ["k"],
        "v",
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)


def test_upsert_sink_last_writer_wins_and_idempotent(spark, tmp_path):
    _stage(spark, tmp_path, "b1.csv", [(1, 10, "a"), (2, 20, "a"), (1, 11, "a")])
    _run(spark, tmp_path)
    t1 = {
        (r["k"], r["v"], r["tag"])
        for r in spark.read.parquet(str(tmp_path / "table")).collect()
    }
    # within-batch dedup kept the max-v row per key
    assert t1 == {(1, 11, "a"), (2, 20, "a")}

    # batch 2 updates key 1, inserts key 3
    _stage(spark, tmp_path, "b2.csv", [(1, 99, "b"), (3, 30, "b")])
    _run(spark, tmp_path)
    t2 = {
        (r["k"], r["v"], r["tag"])
        for r in spark.read.parquet(str(tmp_path / "table")).collect()
    }
    assert t2 == {(1, 99, "b"), (2, 20, "a"), (3, 30, "b")}

    # draining again with NO new files must be a no-op (checkpoint) —
    # and the table still reads the same.
    _run(spark, tmp_path)
    t3 = {
        (r["k"], r["v"], r["tag"])
        for r in spark.read.parquet(str(tmp_path / "table")).collect()
    }
    assert t3 == t2


def test_upsert_sink_late_row_does_not_clobber(spark, tmp_path):
    """A later micro-batch carrying an OLDER order_col for a stored
    key must lose: last-writer-wins is by order_col across batches,
    not by arrival order."""
    _stage(spark, tmp_path, "b1.csv", [(1, 50, "new")])
    _run(spark, tmp_path)
    _stage(spark, tmp_path, "b2.csv", [(1, 10, "late"), (2, 20, "b")])
    _run(spark, tmp_path)
    rows = {
        (r["k"], r["v"], r["tag"])
        for r in spark.read.parquet(str(tmp_path / "table")).collect()
    }
    assert rows == {(1, 50, "new"), (2, 20, "b")}


def test_upsert_sink_recovers_from_crashed_commit(spark, tmp_path):
    """A crash during the final overwrite leaves table_path gutted but
    _next complete — the next batch must recover from _next instead of
    failing or restarting from scratch."""
    import shutil

    _stage(spark, tmp_path, "b1.csv", [(1, 10, "a"), (2, 20, "a")])
    _run(spark, tmp_path)
    # Simulate the torn final overwrite: table dir destroyed mid-write.
    shutil.rmtree(str(tmp_path / "table"))
    (tmp_path / "table").mkdir()  # exists but empty/unreadable
    _stage(spark, tmp_path, "b2.csv", [(3, 30, "b")])
    _run(spark, tmp_path)
    rows = {
        (r["k"], r["v"], r["tag"])
        for r in spark.read.parquet(str(tmp_path / "table")).collect()
    }
    assert rows == {(1, 10, "a"), (2, 20, "a"), (3, 30, "b")}


def test_upsert_sink_replayed_batch_is_noop(spark, tmp_path):
    _stage(spark, tmp_path, "b1.csv", [(1, 10, "a")])
    _run(spark, tmp_path)
    import shutil

    # Simulate a crash between sink write and checkpoint commit: wipe
    # the checkpoint so the same file replays with the same content.
    shutil.rmtree(str(tmp_path / "ckpt"))
    _run(spark, tmp_path)
    rows = spark.read.parquet(str(tmp_path / "table")).collect()
    assert {(r["k"], r["v"]) for r in rows} == {(1, 10)}
    assert len(rows) == 1  # no duplicate application

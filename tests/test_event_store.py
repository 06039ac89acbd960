"""K5/D3/F8 event-store semantics: content-hash ids, first-write-wins
dedup, latest pointer (restapi/app_fs.py:42-51,115-141)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sparkgraft.sinks.kv import dedup_events, with_event_ids


def test_content_id_and_dedup_first_write_wins(spark):
    rows = [
        ("http://a/meta", "new_data", "2025-01-01T00:00:00Z", dt.datetime(2025, 1, 1, 10, 0)),
        ("http://a/meta", "new_data", "2025-01-01T00:00:00Z", dt.datetime(2025, 1, 1, 11, 0)),
        ("http://b/meta", "new_data", "2025-01-02T00:00:00Z", dt.datetime(2025, 1, 1, 12, 0)),
    ]
    df = spark.createDataFrame(
        rows, "metadata_url string, message_type string, created_at string, stored_at timestamp"
    )
    with_ids = with_event_ids(df, "metadata_url", "message_type", "created_at")
    ids = [r["event_id"] for r in with_ids.collect()]
    # Same canonical payload → same 16-hex id (app_fs.py:42-51).
    assert ids[0] == ids[1] and ids[0] != ids[2]
    assert len(ids[0]) == 16 and all(c in "0123456789abcdef" for c in ids[0])

    deduped = dedup_events(with_ids, "stored_at")
    assert deduped.count() == 2
    kept = {r["event_id"]: r["stored_at"] for r in deduped.collect()}
    # First write wins: the 10:00 copy is retained, 11:00 dropped.
    assert kept[ids[0]] == dt.datetime(2025, 1, 1, 10, 0)

    # Latest pointer (latest.json analog): newest event by stored_at.
    latest = deduped.orderBy(F.col("stored_at").desc()).limit(1).collect()[0]
    assert latest["metadata_url"] == "http://b/meta"


def test_jsonstore_stream_sink_atomic_and_exactly_once(spark, tmp_path):
    import json
    import os

    from sparkgraft.sinks.event_store_sink import (
        read_event_store,
        register_jsonstore_sink,
    )

    register_jsonstore_sink(spark)
    inp = tmp_path / "in"
    inp.mkdir()
    store = tmp_path / "store"
    store.mkdir()

    def write_batch(name, rows):
        (inp / name).write_text(
            "event_id,stored_at,payload\n" + "\n".join(rows) + "\n"
        )

    def drain():
        q = (
            spark.readStream.format("csv")
            .schema("event_id STRING, stored_at STRING, payload STRING")
            .option("header", "true")
            .load(str(inp))
            .writeStream.format("jsonstore")
            .option("path", str(store))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_batch("b1.csv", ["e1,2024-01-01T00:00:00,alpha", "e2,2024-01-01T01:00:00,beta"])
    drain()
    events = read_event_store(str(store))
    assert {e["event_id"] for e in events} == {"e1", "e2"}
    latest = json.load(open(store / "latest.json"))
    assert latest["event_id"] == "e2"

    # Restart with the same checkpoint: no re-application.
    drain()
    assert len(read_event_store(str(store))) == 2

    # A later batch: same-id overwrite (last write wins) + newer latest.
    write_batch("b2.csv", ["e1,2024-01-02T00:00:00,alpha2", "e3,2024-01-03T00:00:00,gamma"])
    drain()
    events = {e["event_id"]: e for e in read_event_store(str(store))}
    assert set(events) == {"e1", "e2", "e3"}
    assert events["e1"]["payload"] == "alpha2"
    assert json.load(open(store / "latest.json"))["event_id"] == "e3"
    # No staging debris or torn temp files remain.
    assert os.listdir(store / "_staging") == []
    assert not [f for f in os.listdir(store) if f.endswith(".tmp")]


def test_jsonstore_sink_sanitizes_hostile_event_ids(spark, tmp_path):
    """ADVICE r3: a data-supplied id containing path separators or
    '..' must never steer the write outside the store directory — the
    reference only ever names files from a hash it computes itself
    (restapi/app_fs.py:42-54)."""
    import os

    from sparkgraft.sinks.event_store_sink import register_jsonstore_sink

    register_jsonstore_sink(spark)
    inp = tmp_path / "in"
    inp.mkdir()
    store = tmp_path / "store"
    store.mkdir()
    outside = tmp_path / "escape.json"

    # '..|escape' style id: would write tmp_path/escape.json if the id
    # were interpolated raw into the filename.
    (inp / "b1.csv").write_text(
        "event_id,stored_at,payload\n"
        "../escape,2024-01-01T00:00:00,evil\n"
        "ok-1,2024-01-01T01:00:00,fine\n"
    )
    q = (
        spark.readStream.format("csv")
        .schema("event_id STRING, stored_at STRING, payload STRING")
        .option("header", "true")
        .load(str(inp))
        .writeStream.format("jsonstore")
        .option("path", str(store))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert not outside.exists()
    names = sorted(
        f for f in os.listdir(store) if f.startswith("event_") and f.endswith(".json")
    )
    # Both events landed INSIDE the store: the hostile id under a
    # hashed stem, the well-behaved one under its readable name.
    assert "event_ok-1.json" in names and len(names) == 2
    hashed = [n for n in names if n != "event_ok-1.json"][0]
    stem = hashed[len("event_") : -len(".json")]
    assert len(stem) == 16 and all(c in "0123456789abcdef" for c in stem)
    # Store dir contains only expected entries — nothing escaped.
    assert set(os.listdir(store)) <= {
        *names,
        "latest.json",
        "_commits",
        "_staging",
    }


def test_jsonstore_writer_rejects_missing_columns_at_construction():
    import pytest
    from pyspark.sql.types import StringType, StructField, StructType

    from sparkgraft.sinks.event_store_sink import JsonStoreStreamWriter

    schema = StructType([StructField("payload", StringType())])
    with pytest.raises(ValueError, match="event_id"):
        JsonStoreStreamWriter({"path": "/tmp/x"}, schema)


def test_jsonstore_commit_sweeps_orphaned_staging_files(tmp_path):
    """A retried task's first-attempt staging file is not in any commit
    message; the post-commit sweep must still remove it."""
    import json
    import os

    from sparkgraft.sinks.event_store_sink import (
        JsonStoreCommitMessage,
        JsonStoreStreamWriter,
    )

    store = tmp_path / "store"
    staging = store / "_staging"
    staging.mkdir(parents=True)
    listed = staging / "task-aaaa.jsonl"
    listed.write_text(
        json.dumps({"event_id": "e1", "stored_at": "2024-01-01T00:00:00"}) + "\n"
    )
    orphan = staging / "task-orphan.jsonl"
    orphan.write_text(
        json.dumps({"event_id": "e1", "stored_at": "2023-12-31T00:00:00"}) + "\n"
    )
    w = JsonStoreStreamWriter({"path": str(store)})
    w.commit([JsonStoreCommitMessage([str(listed)])], 0)
    assert os.listdir(staging) == []
    assert (store / "event_e1.json").exists()
    # Abort likewise clears everything staged.
    orphan.write_text("{}\n")
    w.abort([None], 1)
    assert os.listdir(staging) == []

"""Streaming CUSUM monitor: alarms bit-identical to the batch operator
over the streamed union (ordered arrival), replay resumes from the
pre-crash snapshot instead of double-advancing the recurrence."""

from __future__ import annotations

import datetime as dt
import json
import os


def _mk_rows(start_i, vals):
    t0 = dt.datetime(2024, 1, 1)
    return [
        {
            "key": "k1",
            "ts": (t0 + dt.timedelta(minutes=start_i + i)).strftime(
                "%Y-%m-%dT%H:%M:%S"
            ),
            "event_id": start_i + i,
            "value": v,
        }
        for i, v in enumerate(vals)
    ]


def _write_batch(path, rows, mtime=None):
    with open(path, "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in rows))
    if mtime is not None:
        # Distinct ascending mtimes pin the file-source batch order.
        os.utime(path, (mtime, mtime))


SCHEMA = "key string, ts timestamp, event_id long, value double"


def test_cusum_monitor_matches_batch_and_replays(spark, tmp_path):
    from sparkgraft.operators.stats import cusum_changepoints
    from sparkgraft.streaming.pipeline import cusum_monitor

    base = [10.0, 10.2, 9.9, 10.1, 9.8, 10.0, 10.1, 9.9]
    b1 = [10.0, 10.3, 9.7, 10.1]          # quiet
    b2 = [13.5, 13.9, 14.2, 13.7]         # shift up
    b3 = [5.2, 5.0, 4.8, 5.1]             # shift down
    all_vals = base + b1 + b2 + b3
    from pyspark.sql import functions as F

    union = spark.createDataFrame(
        [tuple(r.values()) for r in _mk_rows(0, all_vals)],
        "key string, ts string, event_id long, value double",
    ).withColumn("ts", F.to_timestamp("ts"))

    kw = dict(k=0.5, h=2.0, baseline_n=8, digits=6)
    batch_alarms = sorted(
        (r["event_id"], r["side"], r["stat"])
        for r in cusum_changepoints(
            union, "key", "ts", "event_id", "value", **kw
        ).collect()
    )
    assert batch_alarms, "fixture must fire"

    src = tmp_path / "in"
    src.mkdir()
    _write_batch(src / "b0.json", _mk_rows(0, base + b1), mtime=1700000000)
    _write_batch(
        src / "b1.json", _mk_rows(len(base) + len(b1), b2), mtime=1700000001
    )
    _write_batch(
        src / "b2.json",
        _mk_rows(len(base) + len(b1) + len(b2), b3),
        mtime=1700000002,
    )

    got = {}

    def sink(df, batch_id):
        got[batch_id] = [
            (r["event_id"], r["side"], r["stat"]) for r in df.collect()
        ]

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    ckpt = str(tmp_path / "ck")
    q = cusum_monitor(
        stream, union, "key", "ts", "event_id", "value", ckpt, sink, **kw
    )
    q.awaitTermination(180)
    assert len(got) == 3
    streamed = sorted(a for rows in got.values() for a in rows)
    assert streamed == batch_alarms

    # Crash-replay: stored keys are post-b2, prev_keys post-b1.  A
    # foreachBatch replay of b2 under the SAME batch id must resume
    # from the pre-b2 snapshot and emit b2's alarms again, unchanged —
    # not double-advance the recurrence.
    got_a = {}

    def sink_a(df, batch_id):
        got_a[batch_id] = [
            (r["event_id"], r["side"], r["stat"]) for r in df.collect()
        ]

    state_full = json.load(open(os.path.join(ckpt, "cusum_state.json")))
    src3 = tmp_path / "in3"
    src3.mkdir()
    _write_batch(
        src3 / "b2.json", _mk_rows(len(base) + len(b1) + len(b2), b3)
    )
    ck3 = tmp_path / "ck3"
    ck3.mkdir()
    replay_state = dict(state_full)
    replay_state["batch_id"] = 0  # replayed file arrives as batch 0
    with open(ck3 / "cusum_state.json", "w") as fh:
        json.dump(replay_state, fh)

    stream3 = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src3))
    )
    q3 = cusum_monitor(
        stream3, union, "key", "ts", "event_id", "value", str(ck3), sink_a,
        **kw,
    )
    q3.awaitTermination(180)
    assert got_a[0] == got[2]

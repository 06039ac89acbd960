"""Streaming KS drift monitor: statistic identical to the batch binned
operator on the streamed union, drift flips when the stream shifts,
replay never double-counts."""

from __future__ import annotations

import json
import os
import random


def _write_batch(path, vals):
    with open(path, "w") as fh:
        fh.write("\n".join(json.dumps({"value": v}) for v in vals))


def test_ks_monitor_matches_batch_and_replays(spark, tmp_path):
    from sparkgraft.operators.stats import ks_test_binned
    from sparkgraft.streaming.pipeline import ks_monitor

    rnd = random.Random(4)
    base_vals = [rnd.gauss(10, 2) for _ in range(500)]
    vals1 = [rnd.gauss(10, 2) for _ in range(300)]  # on-distribution
    vals2 = [rnd.gauss(25, 2) for _ in range(300)]  # shifted

    baseline = spark.createDataFrame([(v,) for v in base_vals], "value double")
    src = tmp_path / "in"
    src.mkdir()
    _write_batch(src / "b1.json", vals1)
    _write_batch(src / "b2.json", vals2)

    got = {}

    def sink(df, batch_id):
        got[batch_id] = [tuple(r) for r in df.collect()]

    stream = (
        spark.readStream.schema("value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    ckpt = str(tmp_path / "ck")
    q = ks_monitor(stream, "value", baseline, ckpt, sink)
    q.awaitTermination(120)
    assert len(got) == 2

    # after batch 1 (on-distribution): no drift; after batch 2 (half the
    # stream shifted to gauss(25)): drift
    assert got[0][0][3] is False or got[0][0][3] == False  # noqa: E712
    (_, n_b_final, ks_final, drift_final) = got[1][0]
    assert drift_final is True and n_b_final == 600

    # statistic == batch ks_test_binned(baseline, union of both batches)
    streamed = spark.createDataFrame(
        [(v,) for v in vals1 + vals2], "value double"
    )
    batch_row = ks_test_binned(baseline, streamed, "value").first()
    assert (batch_row["ks_stat"], batch_row["drift"]) == (ks_final, drift_final)

    # replay of the last batch: seed a fresh checkpoint with the stored
    # state re-keyed so the replayed file arrives under the same id
    state = json.load(open(os.path.join(ckpt, "ks_state.json")))
    state["batch_id"] = 0
    src2 = tmp_path / "in2"
    src2.mkdir()
    _write_batch(src2 / "b2.json", vals2)
    ck2 = tmp_path / "ck2"
    ck2.mkdir()
    with open(ck2 / "ks_state.json", "w") as fh:
        json.dump(state, fh)
    got2 = {}

    def sink2(df, batch_id):
        got2[batch_id] = [tuple(r) for r in df.collect()]

    stream2 = (
        spark.readStream.schema("value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src2))
    )
    q2 = ks_monitor(stream2, "value", baseline, str(ck2), sink2)
    q2.awaitTermination(120)
    assert got2[0] == got[1]  # merged into pre-crash snapshot, not doubled

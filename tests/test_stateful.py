"""Stateful-streaming tests: applyInPandasWithState EWMA equals the
batch fold, and state persists across micro-batches."""

from __future__ import annotations

import pandas as pd

from sparkgraft.streaming.stateful import ewma_batch, ewma_stream

SCHEMA = "ts TIMESTAMP, channel STRING, value DOUBLE"


def _run_stream(spark, input_dir, ckpt):
    stream = (
        spark.readStream.format("csv")
        .schema(SCHEMA)
        .option("header", "true")
        .load(str(input_dir))
    )
    out = ewma_stream(stream, alpha=0.5)
    collected: list = []

    q = (
        out.writeStream.foreachBatch(
            lambda batch, _id: collected.extend(batch.collect())
        )
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return collected


def test_ewma_stream_matches_batch_fold(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    rows = [
        ("2025-01-01T00:00:00", "C1", 10.0),
        ("2025-01-01T00:00:01", "C1", 20.0),
        ("2025-01-01T00:00:02", "C1", 40.0),
        ("2025-01-01T00:00:00", "C2", 5.0),
    ]
    (inp / "f1.csv").write_text(
        "ts,channel,value\n" + "\n".join(",".join(map(str, r)) for r in rows) + "\n"
    )
    res = _run_stream(spark, inp, tmp_path / "ckpt")
    got = {r["channel"]: (r["ewma"], r["n_samples"]) for r in res}
    pdf = pd.DataFrame(rows, columns=["ts", "channel", "value"])
    for ch in ("C1", "C2"):
        want = ewma_batch(pdf[pdf.channel == ch], alpha=0.5)
        assert got[ch] == want
    assert got["C1"] == (27.5, 3)  # 0.5*40 + 0.5*(0.5*20 + 0.5*10)


def test_ewma_state_persists_across_batches(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    (inp / "f1.csv").write_text("ts,channel,value\n2025-01-01T00:00:00,C1,10.0\n")
    _run_stream(spark, inp, tmp_path / "ckpt")
    # Second drain with the same checkpoint: the new value folds into
    # the retained state (not a fresh start).
    (inp / "f2.csv").write_text("ts,channel,value\n2025-01-01T00:00:05,C1,30.0\n")
    res = _run_stream(spark, inp, tmp_path / "ckpt")
    rows = {(r["channel"], r["n_samples"]): r["ewma"] for r in res}
    assert rows[("C1", 2)] == 0.5 * 30.0 + 0.5 * 10.0  # 20.0


def test_tws_variant_agrees_with_apply_in_pandas_with_state(spark, tmp_path):
    """transformWithStateInPandas and applyInPandasWithState implement
    the same EWMA semantics — both APIs must produce identical output
    over the same multi-batch stream.  Skipped where protobuf (the TWS
    driver-worker protocol dependency) is absent; the import gate
    itself is asserted below either way."""
    import pytest

    from sparkgraft.streaming.stateful import ewma_stream_tws

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="protobuf"):
            ewma_stream_tws(
                spark.readStream.format("rate").load(), alpha=0.5
            )
        pytest.skip("protobuf not installed: TWS worker cannot run here")

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )

    inp = tmp_path / "in_tws"
    inp.mkdir()
    (inp / "f1.csv").write_text(
        "ts,channel,value\n"
        "2025-01-01T00:00:00,C1,10.0\n"
        "2025-01-01T00:00:01,C1,20.0\n"
        "2025-01-01T00:00:00,C2,5.0\n"
    )
    (inp / "f2.csv").write_text(
        "ts,channel,value\n2025-01-01T00:00:02,C1,40.0\n"
    )

    def run(factory, ckpt):
        stream = (
            spark.readStream.format("csv")
            .schema(SCHEMA)
            .option("header", "true")
            .option("maxFilesPerTrigger", "1")
            .load(str(inp))
        )
        out = factory(stream, 0.5)
        collected: list = []
        q = (
            out.writeStream.foreachBatch(
                lambda batch, _id: collected.extend(batch.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted((r["channel"], r["ewma"], r["n_samples"]) for r in collected)

    old = run(lambda s, a: ewma_stream(s, alpha=a), tmp_path / "ck_old")
    new = run(lambda s, a: ewma_stream_tws(s, alpha=a), tmp_path / "ck_new")
    assert old == new
    assert ("C1", 27.5, 3) in new  # final C1 row after both batches

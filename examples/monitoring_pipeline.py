"""Streaming observability on sparkgraft: the four monitor families a
production ingest pipeline runs side by side, each with O(small) state
and crash-replay idempotence (batch-id-keyed snapshots).

    cusum_monitor     mean-shift alarms        O(1) integers / key-side
    ks_monitor        distribution drift       ~log-bucket cells / group
    quantile_monitor  running percentiles      ~log-bucket cells / group
    sample_monitor    weighted reservoir       O(k) rows

The same micro-batched event stream (events split into three
ts-ordered files, a +40.0 level shift planted mid-stream) drives all
four; each monitor's verdicts print after the drain.  The shift is
visible three ways at once — CUSUM fires per-sample alarms, KS flips
the drift verdict, and the quantiles jump — while the reservoir keeps
an unbiased weighted sample through it all.

Run:  python examples/monitoring_pipeline.py [sf_dir]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkgraft import api as sg  # noqa: E402


def stage_stream(ev, tmp: str) -> str:
    """Three ts-ordered JSON files with pinned mtimes (order-sensitive
    monitors need deterministic batch order)."""
    os.makedirs(f"{tmp}/in", exist_ok=True)
    cuts = ("2024-01-11", "2024-01-21")
    stages = (
        (1, ev.filter(F.col("ts") < cuts[0])),
        (2, ev.filter((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1]))),
        (3, ev.filter(F.col("ts") >= cuts[1])),
    )
    for i, df in stages:
        df.coalesce(1).write.mode("overwrite").json(f"{tmp}/stage_{i}")
        src = sorted(glob.glob(f"{tmp}/stage_{i}/part-*.json"))[0]
        dst = f"{tmp}/in/batch_{i}.json"
        shutil.move(src, dst)
        os.utime(dst, (1700000000 + i, 1700000000 + i))
    return f"{tmp}/in"


def main(sf_dir: str) -> None:
    spark = sg.get_spark("monitoring-pipeline", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    ev = (
        sg.read_table(spark, sf_dir, "events")
        .filter(~F.isnan("value"))
        .withColumn(
            "value",
            F.col("value")
            + F.when(
                F.col("ts") >= F.lit("2024-01-16").cast("timestamp"), 40.0
            ).otherwise(0.0),
        )
        .select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
            "event_id",
            "value",
        )
    )
    baseline = ev.withColumn("ts", F.to_timestamp("ts"))
    schema = "event_type string, ts timestamp, event_id long, value double"

    def stream(src):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .json(src)
        )

    tmp = tempfile.mkdtemp(prefix="sg_monitor_")

    # 1. CUSUM mean-shift alarms (pinned first-50 baseline per type).
    alarms: list = []
    src = stage_stream(ev, f"{tmp}/cusum")
    sg.cusum_monitor(
        stream(src), baseline, "event_type", "ts", "event_id", "value",
        f"{tmp}/cusum/ck", lambda df, b: alarms.extend(df.collect()),
        k=0.5, h=10.0, baseline_n=50,
    ).awaitTermination(300)

    # 2. KS drift vs the PRE-SHIFT distribution.
    ks_rows: dict = {}
    pre = baseline.filter(
        F.col("ts") < F.lit("2024-01-16").cast("timestamp")
    ).select("event_type", "value")
    src = stage_stream(ev, f"{tmp}/ks")
    sg.ks_monitor(
        stream(src).select("event_type", "value"), "value", pre,
        f"{tmp}/ks/ck",
        lambda df, b: ks_rows.update({b: df.collect()}),
        group_cols=["event_type"],
    ).awaitTermination(300)

    # 3. Running percentiles (DDSketch state, merge law live).
    quants: dict = {}
    src = stage_stream(ev, f"{tmp}/q")
    sg.quantile_monitor(
        stream(src).select("value"), "value", f"{tmp}/q/ck",
        lambda df, b: quants.update({b: df.collect()}),
    ).awaitTermination(300)

    # 4. Weighted reservoir: |value|-weighted sample of the whole
    # stream after every batch.
    res: dict = {}
    src = stage_stream(
        ev.withColumn("w", F.abs(F.col("value")) + 1.0), f"{tmp}/r"
    )
    sg.sample_monitor(
        spark.readStream.schema(schema + ", w double")
        .option("maxFilesPerTrigger", "1")
        .json(src),
        "w", ["event_id"], 20, f"{tmp}/r/ck",
        lambda df, b: res.update({b: df.count()}),
    ).awaitTermination(300)

    n_up = sum(1 for r in alarms if r["side"] == "up")
    last_ks = sorted(
        (r["event_type"], r["ks_stat"], r["drift"])
        for r in ks_rows[max(ks_rows)]
    )
    last_q = sorted((r["q"], r["estimate"]) for r in quants[max(quants)])
    print(
        f"cusum alarms={len(alarms)} (up={n_up}) | "
        f"ks final={last_ks[:2]}... all drift={all(d for _, _, d in last_ks)} | "
        f"quantiles final={last_q} | reservoir sizes={res}"
    )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")

"""Round-9 soak: the round-8 operators under growth + churn
(VERDICT r8 task 5).

Claims to prove empirically (the r4-r8 soak discipline — sf0.1 bench
never surfaces a quadratic or an unbounded state; growth curves do):

- alert_monitor under KEY CHURN: a rotating alarm population (cohort i
  raises in batch i, clears in batch i+1) must leave carry state
  tracking CURRENTLY-ALARMING keys only — the round-8 eviction claim.
  Asserted: after draining B batches over B disjoint cohorts, the
  persisted state holds exactly ONE cohort (the last), never the
  B-cohort union; wall per batch stays flat while the key population
  ever seen grows 32x.

- stream_alarm_join (alarm_correlation_streams) outer-join state under
  WATERMARK LAG + DEAD-LETTER BURSTS: alarms whose correlates never
  arrive (a dead-letter burst) and files that arrive a full watermark
  late must not grow state beyond rate x window.  Asserted: status
  counts exactly match the batch left-join mirror at every scale
  (1x/8x/32x volume — nothing is dropped or duplicated under lag),
  and wall tracks volume linearly (state eviction works; an
  unbounded-state join would superlinearly degrade the drain).

Run:  python tools/soak_round9.py          # writes one JSON line/case
Results land in SCALE.md (round-9 section).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sparkgraft.session import get_spark  # noqa: E402


def t(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def soak_alert_churn(spark, mult: int) -> dict:
    """B batches, each with a DISJOINT cohort of keys_per x mult keys:
    cohort i alarms through batch i and recovers in batch i + 1, so
    every batch both raises a fresh cohort and clears the previous
    one — the worst case for any 'keep every key ever seen' state."""
    from sparkgraft.streaming.pipeline import alert_monitor

    batches, keys_per = 6, 250 * mult
    tmp = tempfile.mkdtemp(prefix="soak9_alert_")
    src = os.path.join(tmp, "in")
    os.makedirs(src)
    for b in range(batches):
        rows = []
        for i in range(keys_per):
            rows.append({"key": f"c{b}_{i}", "ts": b * 10, "alarming": True})
            if b > 0:
                # previous cohort recovers
                rows.append(
                    {"key": f"c{b - 1}_{i}", "ts": b * 10, "alarming": False}
                )
        path = os.path.join(src, f"b{b}.json")
        with open(path, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
        os.utime(path, (1700000000 + b, 1700000000 + b))

    walls: list[float] = []
    counts: dict[int, dict] = {}

    def sink(df, batch_id):
        t0 = time.perf_counter()
        agg = {
            r["action"]: r["n"]
            for r in df.groupBy("action").agg(F.count("*").alias("n")).collect()
        }
        counts[batch_id] = agg
        walls.append(round(time.perf_counter() - t0, 2))

    stream = (
        spark.readStream.schema("key string, ts long, alarming boolean")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    ckpt = os.path.join(tmp, "ck")
    q = alert_monitor(
        stream, "key", "ts", "alarming", ckpt, sink,
        cooldown=100, escalate_after=2,
    )
    ok = q.awaitTermination(600)
    if not ok:
        q.stop()
        raise RuntimeError("alert churn drain did not finish in 600s")

    with open(os.path.join(ckpt, "alert_state.json")) as fh:
        state = json.load(fh)
    n_state = len(state["keys"])
    total_seen = batches * keys_per
    # THE eviction claim: state is one cohort, not the union.
    assert n_state == keys_per, (n_state, keys_per)
    assert set(k.split("_")[0] for k in state["keys"]) == {f"c{batches - 1}"}
    # every batch raised its cohort; later batches also cleared one
    assert counts[0].get("raise") == keys_per, counts[0]
    for b in range(1, batches):
        assert counts[b].get("raise") == keys_per, (b, counts[b])
        assert counts[b].get("clear") == keys_per, (b, counts[b])
    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "mult": mult,
        "keys_per_batch": keys_per,
        "total_keys_seen": total_seen,
        "state_keys_after": n_state,
        "sink_walls": walls,
    }


def soak_alarm_join(spark, mult: int) -> dict:
    """Volume-scaled alarm correlation with a DEAD-LETTER BURST (a
    contiguous run of alarms with no correlates at all) and LATE files
    (arriving one full watermark after their alarm, still inside the
    join window).  Drain must exactly match the batch mirror."""
    from sparkgraft.streaming.joins import alarm_correlation_streams

    n = 600 * mult
    base = 1_700_000_000
    # alarms every 30 s; burst = middle third has NO correlates
    alarms = [(i % 37, base + i * 30) for i in range(n)]
    burst = set(range(n // 3, 2 * n // 3))
    files, reports = [], []
    for i, (k, ts) in enumerate(alarms):
        if i in burst:
            continue
        if i % 3 != 0:
            # file arrives late in EVENT TIME near the window edge for
            # every 5th, else promptly
            files.append((k, ts + (890 if i % 5 == 0 else 60)))
        if i % 2 == 0:
            reports.append((k, ts + 600))
    sentinel_ts = base + n * 30 + 10_000

    tmp = tempfile.mkdtemp(prefix="soak9_alarmjoin_")
    streams = {}
    legs = {
        "alarms": (alarms, "alarm_ts"),
        "files": (files, "file_ts"),
        "reports": (reports, "report_ts"),
    }
    for name, (rows, ts_col) in legs.items():
        d = os.path.join(tmp, name)
        os.makedirs(d)
        with open(os.path.join(d, "data.csv"), "w") as fh:
            fh.write(f"key,{ts_col}\n")
            for k, ts in rows:
                fh.write(f"{k},{ts}\n")
            fh.write(f"-1,{sentinel_ts}\n")
        streams[name] = (
            spark.readStream.schema(f"key long, {ts_col}_e long")
            .option("header", "true")
            .csv(d)
            .select("key", F.timestamp_seconds(F.col(f"{ts_col}_e")).alias(ts_col))
        )

    out = alarm_correlation_streams(
        streams["alarms"], streams["files"], streams["reports"], "key",
        file_window=(0, 900), report_window=(300, 1800),
        watermark="60 seconds",
    )
    qname = f"soak9_aj_{mult}"
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _, wall = t(lambda: q.awaitTermination(600) or None)
    if q.isActive:
        q.stop()
        raise RuntimeError("alarm join drain did not finish in 600s")
    got = {
        (r["key"], r["status"]): r["n"]
        for r in spark.sql(
            f"SELECT key, status, count(*) AS n FROM {qname} "
            "WHERE key >= 0 GROUP BY 1, 2"
        ).collect()
    }

    # batch mirror: plain left joins with the same interval bounds
    a = spark.createDataFrame(alarms, "key long, ae long").select(
        "key", F.timestamp_seconds("ae").alias("alarm_ts")
    )
    f_ = spark.createDataFrame(files or [(-9, 0)], "key long, fe long").select(
        "key", F.timestamp_seconds("fe").alias("file_ts")
    )
    r_ = spark.createDataFrame(
        reports or [(-9, 0)], "key long, re long"
    ).select("key", F.timestamp_seconds("re").alias("report_ts"))
    j1 = a.join(
        f_,
        (a["key"] == f_["key"])
        & (F.col("file_ts") >= F.col("alarm_ts"))
        & (F.col("file_ts") <= F.col("alarm_ts") + F.expr("INTERVAL 900 SECOND")),
        "left",
    ).drop(f_["key"])
    j2 = j1.join(
        r_,
        (j1["key"] == r_["key"])
        & (F.col("report_ts") >= F.col("alarm_ts") + F.expr("INTERVAL 300 SECOND"))
        & (F.col("report_ts") <= F.col("alarm_ts") + F.expr("INTERVAL 1800 SECOND")),
        "left",
    ).drop(r_["key"])
    has_f, has_r = F.col("file_ts").isNotNull(), F.col("report_ts").isNotNull()
    mirror = {
        (r["key"], r["status"]): r["n"]
        for r in j2.withColumn(
            "status",
            F.when(has_f & has_r, F.lit("paired"))
            .when(has_f, F.lit("file_only"))
            .when(has_r, F.lit("report_only"))
            .otherwise(F.lit("dead_letter")),
        )
        .groupBy("key", "status")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == mirror, (
        len(got),
        len(mirror),
        sorted(set(got.items()) ^ set(mirror.items()))[:6],
    )
    dead = sum(v for (k, st), v in got.items() if st == "dead_letter")
    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "mult": mult,
        "alarms": n,
        "files": len(files),
        "reports": len(reports),
        "dead_letters": dead,
        "drain_wall": wall,
    }


def main() -> None:
    spark = get_spark(app_name="soak_round9")
    spark.sparkContext.setLogLevel("ERROR")
    for mult in (1, 8, 32):
        r, wall = t(lambda: soak_alert_churn(spark, mult))
        print(json.dumps({"case": "alert_churn", "wall": wall, **r}))
    for mult in (1, 8, 32):
        r, _ = t(lambda: soak_alarm_join(spark, mult))
        print(json.dumps({"case": "alarm_join", **r}))


if __name__ == "__main__":
    main()

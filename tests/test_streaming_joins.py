"""Stream-stream interval join: the streaming result must equal the
batch interval join over the same (seconds-truncated) inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR


def _batch_expected(spark):
    ev = entrymod._t(spark, SF_DIR, "events").filter(F.col("event_id") < 4000)
    trunc = F.to_timestamp(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
    views = ev.filter(F.col("event_type") == "view").select(
        trunc.alias("vts"), "user_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        trunc.alias("pts"), F.col("user_id").alias("p_user")
    )
    pairs = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("pts") >= F.col("vts"))
        & (F.col("pts") <= F.col("vts") + F.expr("INTERVAL 1800 SECOND")),
    )
    return {
        (r["user_id"], r["n_pairs"])
        for r in pairs.groupBy("user_id")
        .agg(F.count("*").alias("n_pairs"))
        .collect()
    }


def test_stream_join_matches_batch(spark):
    got = {
        (r["user_id"], r["n_pairs"])
        for r in entrymod.q_stream_join(spark, SF_DIR).collect()
    }
    assert len(got) > 0
    assert got == _batch_expected(spark)


def test_stream_enrich_matches_batch(spark):
    got = {
        (r["n_nationkey"], r["n_events"])
        for r in entrymod.q_stream_enrich(spark, SF_DIR).collect()
    }
    assert len(got) > 0
    ev = entrymod._t(spark, SF_DIR, "events").filter(F.col("event_id") < 3000)
    cust = entrymod._t(spark, SF_DIR, "customer").select(
        F.col("c_custkey"), F.col("c_nationkey").alias("n_nationkey")
    )
    expected = {
        (r["n_nationkey"], r["n_events"])
        for r in ev.select((F.col("user_id") % 1000 + 1).alias("c_custkey"))
        .join(cust, "c_custkey")
        .groupBy("n_nationkey")
        .agg(F.count("*").alias("n_events"))
        .collect()
    }
    assert got == expected


def _stage_csv(tmp_path, name, header, rows):
    d = tmp_path / name
    d.mkdir()
    with open(d / "data.csv", "w") as fh:
        fh.write(header + "\n" + "\n".join(rows) + "\n")
    return str(d)


def test_alarm_correlation_statuses_and_batch_equiv(spark, tmp_path):
    """Chained left-outer stream-stream interval joins: paired /
    file_only / report_only / dead_letter classification, the
    wait-expired dead-letter flushing on watermark advance (the
    sentinel rows), and row-set equivalence with the batch left-join
    mirror over the same inputs."""
    from sparkgraft.streaming.joins import alarm_correlation_streams

    t0 = "2024-01-01 00:00:"
    # k1: file +100s, report +700s  -> paired
    # k2: file +300s (outside 240s wait), report +650s -> report_only
    # k3: nothing arrives -> dead_letter
    # k4: file +200s, report +900s (outside 840s) -> file_only
    # zz: the far-future sentinel on every stream advances the global
    #     watermark so the outer-join state flushes under availableNow.
    alarms = ["k1,2024-01-01 00:00:00", "k2,2024-01-01 00:00:00",
              "k3,2024-01-01 00:00:00", "k4,2024-01-01 00:00:00",
              "zz,2024-01-02 00:00:00"]
    files = ["k1,2024-01-01 00:01:40", "k2,2024-01-01 00:05:00",
             "k4,2024-01-01 00:03:20", "zz,2024-01-02 00:00:00"]
    reports = ["k1,2024-01-01 00:11:40", "k2,2024-01-01 00:10:50",
               "k4,2024-01-01 00:15:00", "zz,2024-01-02 00:00:00"]
    a_dir = _stage_csv(tmp_path, "alarms", "key,alarm_ts", alarms)
    f_dir = _stage_csv(tmp_path, "files", "key,file_ts", files)
    r_dir = _stage_csv(tmp_path, "reports", "key,report_ts", reports)

    def rd(d, schema):
        return (
            spark.readStream.schema(schema).option("header", "true")
            .csv(d)
        )

    out = alarm_correlation_streams(
        rd(a_dir, "key string, alarm_ts timestamp"),
        rd(f_dir, "key string, file_ts timestamp"),
        rd(r_dir, "key string, report_ts timestamp"),
        "key",
        file_window=(0, 240),
        report_window=(600, 840),
        watermark="60 seconds",
    )
    q = (
        out.writeStream.format("memory").queryName("alarm_corr")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["key"], r["status"])
        for r in spark.sql("SELECT key, status FROM alarm_corr").collect()
        if r["key"] != "zz"
    }
    assert got == {
        ("k1", "paired"), ("k2", "report_only"),
        ("k3", "dead_letter"), ("k4", "file_only"),
    }

    # Batch mirror: same bounds as two left joins over static frames.
    ab = spark.read.schema("key string, alarm_ts timestamp").option(
        "header", "true").csv(a_dir)
    fb = spark.read.schema("key string, file_ts timestamp").option(
        "header", "true").csv(f_dir).withColumnRenamed("key", "fkey")
    rb = spark.read.schema("key string, report_ts timestamp").option(
        "header", "true").csv(r_dir).withColumnRenamed("key", "rkey")
    j = (
        ab.join(
            fb,
            (F.col("key") == F.col("fkey"))
            & (F.col("file_ts") >= F.col("alarm_ts"))
            & (F.col("file_ts") <= F.col("alarm_ts") + F.expr(
                "INTERVAL 240 SECOND")),
            "left",
        )
        .join(
            rb,
            (F.col("key") == F.col("rkey"))
            & (F.col("report_ts") >= F.col("alarm_ts") + F.expr(
                "INTERVAL 600 SECOND"))
            & (F.col("report_ts") <= F.col("alarm_ts") + F.expr(
                "INTERVAL 840 SECOND")),
            "left",
        )
    )
    # The sentinel itself is still pending at stream end (no later
    # watermark can flush it) — exclude it from the equivalence set.
    expected = {
        (r["key"], r["file_ts"], r["report_ts"])
        for r in j.collect() if r["key"] != "zz"
    }
    streamed = {
        (r["key"], r["file_ts"], r["report_ts"])
        for r in spark.sql(
            "SELECT key, file_ts, report_ts FROM alarm_corr"
        ).collect() if r["key"] != "zz"
    }
    assert streamed == expected

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

"""Round-12 verdict task 5: the restored window's four leg witnesses
(`latest_per_user`/`latest_fallback` — A2; `upload_dedup`/
`event_store_dedup` — P10/D3) exercised under ADVERSARIAL fixtures, so
a future fallback-chain or routing regression fails HERE before it can
reach the driver gate.  Fixtures documented in FIXTURES.md §W.
"""

from __future__ import annotations

from pyspark.sql import functions as F


# ---------------------------------------------------------------- A2 --


def test_latest_rows_tie_at_identical_timestamp(spark):
    """Two rows with the SAME (key, ts): the tiebreak column decides
    (highest wins), identically at every shuffle partitioning."""
    from sparkgraft.operators.stats import latest_rows

    rows = [
        (1, "2025-01-01T00:00:00", 10, "a"),
        (1, "2025-01-01T00:00:00", 11, "b"),  # tie on ts -> id 11 wins
        (1, "2024-12-31T23:59:59", 99, "c"),
        (2, "2025-01-01T00:00:00", 5, "d"),
        (2, "2025-01-01T00:00:00", 4, "e"),  # tie -> id 5 wins
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts_s string, event_id int, payload string"
    ).withColumn("ts", F.to_timestamp("ts_s"))
    expected = {(1, 11, "b"), (2, 5, "d")}
    try:
        for n in ("7", "64"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            got = {
                (r.user_id, r.event_id, r.payload)
                for r in latest_rows(
                    df, ["user_id"], "ts", tiebreak=["event_id"]
                ).collect()
            }
            assert got == expected, (n, got)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")


def test_latest_fallback_tie_and_all_unparsable(spark):
    """The A2 fallback chain under its three adversarial corners:
    (a) parsable-timestamp tie -> highest ingest index wins;
    (b) a key whose every timestamp is junk -> last physical row;
    (c) an EARLY parsable row beats LATER unparsable rows."""
    from sparkgraft.operators.stats import latest_row_fallback

    rows = [
        # (a) key 1: two identical parsable ts, indexes 10 < 20
        (1, "2025-01-01 00:00:00", 10, "lo"),
        (1, "2025-01-01 00:00:00", 20, "hi"),
        # (b) key 2: all junk -> index 31 wins
        (2, "not-a-ts", 30, "x"),
        (2, "also junk", 31, "y"),
        # (c) key 3: parsable at index 40, junk at 41/42
        (3, "2025-01-01 00:00:00", 40, "good"),
        (3, "junk", 41, "bad1"),
        (3, "junk", 42, "bad2"),
    ]
    df = spark.createDataFrame(rows, "k int, raw string, idx int, tag string")
    got = {
        (r.k, r.idx, r.tag)
        for r in latest_row_fallback(df, ["k"], "raw", "idx").collect()
    }
    assert got == {(1, 20, "hi"), (2, 31, "y"), (3, 40, "good")}


# --------------------------------------------------------------- P10 --


def test_upload_routing_rename_cycle(spark):
    """The reference's `.dup_<mtime>` path (uploader/main.py:77-85):
    the decision compares against the PLAIN remote name only, so

    - a re-offer of a size-mismatched file AFTER a rename cycle still
      routes rename_dup (the plain remote size is unchanged — it must
      NOT flip to skip because a .dup copy of identical size exists);
    - a candidate whose size differs by exactly 0 bytes from the plain
      remote routes skip, .dup clutter notwithstanding;
    - a fresh name routes upload.
    """
    from sparkgraft.functions.expr import upload_action

    # remote state AFTER a rename cycle: plain name f1 holds 100 bytes,
    # and a .dup copy (f1.dup_123, 150 bytes) exists from the earlier
    # mismatch.  The .dup name never participates in matching.
    remote = spark.createDataFrame(
        [("f1", 100), ("f1.dup_123", 150), ("f2", 200)], "name string, rsize int"
    )
    local = spark.createDataFrame(
        [
            ("f1", 150),  # re-offer of the renamed file -> rename_dup again
            ("f2", 200),  # 0-byte delta -> skip
            ("f3", 10),  # unseen -> upload
        ],
        "name string, size int",
    )
    j = local.join(remote, "name", "left")
    got = {
        (r.name, r.action)
        for r in j.select(
            "name", upload_action(F.col("size"), F.col("rsize")).alias("action")
        ).collect()
    }
    assert got == {("f1", "rename_dup"), ("f2", "skip"), ("f3", "upload")}


# ---------------------------------------------------------------- D3 --


def test_event_store_dedup_stored_at_tie_is_stable(spark):
    """Content-hash dedup when the SAME content arrives twice with the
    SAME stored_at (a min_by order tie): every non-order column is part
    of the content id, so tied rows are bit-identical and the surviving
    row is stable at any partitioning; a LATER distinct stored_at for
    the same content never displaces the first write."""
    from sparkgraft.sinks.kv import dedup_events, with_event_ids

    rows = [
        ("m1", "t", "2025-01-01", "d1", "v1", "2025-01-01 00:00:00"),
        ("m1", "t", "2025-01-01", "d1", "v1", "2025-01-01 00:00:00"),  # exact tie
        ("m1", "t", "2025-01-01", "d1", "v1", "2025-01-02 00:00:00"),  # later dup
        ("m2", "t", "2025-01-01", "d2", "v1", "2025-01-03 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows,
        "metadata_url string, message_type string, created_at string, "
        "data_url string, version string, stored_at_s string",
    ).withColumn("stored_at", F.to_timestamp("stored_at_s")).drop("stored_at_s")
    ids = with_event_ids(
        df, "metadata_url", "message_type", "created_at", "data_url", "version"
    )
    try:
        for n in ("7", "64"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            out = dedup_events(ids, "stored_at").collect()
            got = {(r.metadata_url, str(r.stored_at)) for r in out}
            assert got == {
                ("m1", "2025-01-01 00:00:00"),
                ("m2", "2025-01-03 00:00:00"),
            }, (n, got)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")

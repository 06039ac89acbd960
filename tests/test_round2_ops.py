"""Semantic unit tests for the round-2 additions: interval merging,
time-series interpolation, semantic dedup, robust stats, skew
diagnostics, classifier scoring, and n-gram support — tiny fixtures
with hand-computed expectations (oracle parity is covered separately
by test_oracle_parity)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sparkgraft.operators.relational import merge_intervals
from sparkgraft.operators.scale import skew_diagnostics
from sparkgraft.operators.similarity import semantic_dedup
from sparkgraft.operators.stats import equidepth_histogram, robust_outlier_stats
from sparkgraft.operators.textops import hash_classifier_score, ngram_support
from sparkgraft.operators.timeseries import resample_interpolate


def test_merge_intervals_touching_and_disjoint(spark):
    # [0,10] and [10,20] touch -> merge; [25,30] is separate.
    rows = [("a", 0, 10), ("a", 10, 20), ("a", 25, 30), ("b", 5, 6)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = {
        (r["k"], r["island_start"], r["island_end"]): r["n_merged"]
        for r in merge_intervals(df, "k", "s", "e").collect()
    }
    assert out == {("a", 0, 20): 2, ("a", 25, 30): 1, ("b", 5, 6): 1}


def test_merge_intervals_contained(spark):
    # A contained interval never re-opens the island.
    rows = [("a", 0, 100), ("a", 10, 20), ("a", 50, 150), ("a", 200, 201)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = sorted(
        (r["island_start"], r["island_end"], r["n_merged"])
        for r in merge_intervals(df, "k", "s", "e").collect()
    )
    assert got == [(0, 150, 3), (200, 201, 1)]


def test_resample_linear_interpolation(spark):
    # Observations at hour 0 (1.0) and hour 4 (5.0): interior hours
    # interpolate to 2,3,4; every grid point is emitted.
    rows = [
        (1, "2024-01-01 00:10:00", 7, 1.0),
        (2, "2024-01-01 04:20:00", 7, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = resample_interpolate(
        df, "user_id", "ts", "value", "event_id", step_sec=3600, digits=3
    )
    got = sorted((r["value"], r["is_observed"]) for r in out.collect())
    assert got == [
        (1.0, True),
        (2.0, False),
        (3.0, False),
        (4.0, False),
        (5.0, True),
    ]


def test_resample_picks_latest_in_bucket_and_pads_edges(spark):
    rows = [
        (1, "2024-01-01 00:10:00", 7, 1.0),
        (2, "2024-01-01 00:50:00", 7, 9.0),  # later in same bucket wins
        (3, "2024-01-01 02:00:00", 7, 3.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = resample_interpolate(
        df, "user_id", "ts", "value", "event_id", step_sec=3600, digits=3
    )
    by_ts = {
        r["bucket_ts"].hour: (r["value"], r["is_observed"])
        for r in out.collect()
    }
    assert by_ts[0] == (9.0, True)
    assert by_ts[1] == (6.0, False)  # midpoint of 9 and 3
    assert by_ts[2] == (3.0, True)


def test_semantic_dedup_flags_same_cluster_near_dup(spark):
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    rows = [
        (1, [2.0, 0.1]),
        (2, [4.0, 0.2]),  # same direction as 1 -> dup_of 1
        (3, [0.1, 3.0]),  # other cluster, survivor
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: (r["is_duplicate"], r["dup_of"], r["cluster"])
        for r in semantic_dedup(df, cents, threshold=0.999).collect()
    }
    assert out[1] == (False, None, 0)
    assert out[2] == (True, 1, 0)
    assert out[3] == (False, None, 1)


def test_robust_outliers_single_wild_value(spark):
    vals = [10.0, 11.0, 12.0, 11.5, 10.5, 1000.0]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, value double"
    )
    row = robust_outlier_stats(df, ["grp"], "value", z=3.0).collect()[0]
    assert row["n"] == 6
    assert row["median"] == 11.25
    assert row["n_outliers"] == 1  # the wild 1000 only


def test_equidepth_buckets_balanced(spark):
    df = spark.createDataFrame(
        [(float(i), i) for i in range(1, 9)], "v double, id long"
    )
    got = [
        (r["bucket"], r["n"], r["lo"], r["hi"])
        for r in equidepth_histogram(df, "v", ["id"], buckets=4).collect()
    ]
    assert got == [
        (1, 2, 1.0, 2.0),
        (2, 2, 3.0, 4.0),
        (3, 2, 5.0, 6.0),
        (4, 2, 7.0, 8.0),
    ]


def test_skew_diagnostics_summary(spark):
    rows = [(1,)] * 6 + [(2,), (3,)]
    df = spark.createDataFrame(rows, "k long")
    row = skew_diagnostics(df, "k").collect()[0]
    assert (row["n_keys"], row["n_rows"], row["max_cnt"]) == (3, 8, 6)
    assert row["top_key"] == 1
    assert row["max_share"] == 0.75
    # ceil(6 / (8/3)) = ceil(2.25) = 3 salt buckets to level the key.
    assert row["salt_buckets"] == 3


def _profile_fixture(spark, rows):
    """rows = [(column, n_rows, n_nulls, n_distinct, min_val, max_val)]"""
    return spark.createDataFrame(
        rows,
        "column string, n_rows long, n_nulls long, n_distinct long, "
        "min_val string, max_val string",
    )


def test_drift_report_ok_and_flags(spark):
    from sparkgraft.operators.stats import drift_report

    base = _profile_fixture(
        spark,
        [
            ("a", 1000, 0, 100, "0", "9"),
            ("b", 1000, 10, 50, "x", "z"),
        ],
    )
    cur = _profile_fixture(
        spark,
        [
            ("a", 1010, 0, 101, "0", "9"),      # all within tolerance
            ("b", 1000, 40, 50, "x", "zz"),     # nulls 1%→4%, max moved
        ],
    )
    out = {r["column"]: r for r in drift_report(base, cur).collect()}
    assert out["a"]["verdict"] == "ok" and out["a"]["drift_flags"] == ""
    assert out["b"]["verdict"] == "drift"
    assert out["b"]["drift_flags"] == "nulls,range"
    assert out["b"]["null_rate_base"] == 0.01
    assert out["b"]["null_rate_cur"] == 0.04


def test_drift_report_presence(spark):
    """A column missing from either snapshot is presence-drift, with
    no spurious metric flags."""
    from sparkgraft.operators.stats import drift_report

    base = _profile_fixture(spark, [("gone", 10, 0, 5, "1", "9")])
    cur = _profile_fixture(spark, [("new", 10, 0, 5, "1", "9")])
    out = {r["column"]: r for r in drift_report(base, cur).collect()}
    assert out["gone"]["drift_flags"] == "presence"
    assert out["new"]["drift_flags"] == "presence"
    assert out["gone"]["verdict"] == "drift"


def test_rolling_anomaly_large_values_no_overflow(spark):
    """vs = value·1e6, so vs² overflows LONG at |value| ≈ 3037 and the
    10-row windowed sum at |value| ≈ 960 — the squares must accumulate
    in DECIMAL(38,0) (ANSI mode would crash, non-ANSI would silently
    wrap and mis-flag)."""
    from sparkgraft.operators.stats import rolling_anomaly

    rows = [(i, 1, float(5000 + (i % 3))) for i in range(12)]
    rows.append((12, 1, 90000.0))  # genuine spike
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    df = df.withColumn("ts", F.to_timestamp(F.lit("2024-01-01")) + F.make_interval(secs=F.col("event_id")))
    # z=2: a single spike in an n-row window tops out at
    # z = sqrt(n-1) = 3, so the strict > never fires at z=3.
    out = {r["event_id"]: r["is_anomaly"] for r in rolling_anomaly(
        df, "user_id", "ts", "event_id", z=2).collect()}
    assert out[12] is True
    assert not any(out[i] for i in range(3, 12))


def test_skew_diagnostics_string_key(spark):
    """The heaviest-key argmax must work for non-numeric keys too
    (ties break to the lexicographically smallest key)."""
    rows = [("aa",)] * 4 + [("bb",)] * 4 + [("cc",)]
    df = spark.createDataFrame(rows, "k string")
    row = skew_diagnostics(df, "k").collect()[0]
    assert (row["n_keys"], row["n_rows"], row["max_cnt"]) == (3, 9, 4)
    assert row["top_key"] == "aa"


def test_hash_classifier_matches_reference_hash(spark):
    def wgt(tok: str) -> int:
        return int(hashlib.md5((tok + "w0").encode()).hexdigest()[:8], 16) % 2001 - 1000

    text = "alpha beta gamma"
    expected = sum(wgt(t) for t in text.split())
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = hash_classifier_score(df).collect()[0]
    assert row["sum_milliweight"] == expected
    assert row["label"] == (expected > 0)
    assert row["n_tokens"] == 3


def test_ngram_support_shared_vs_novel(spark):
    rows = [
        (1, "the cat sat"),
        (2, "the cat ran"),
        (3, "completely different words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_grams"], r["n_supported"], r["support_share"])
        for r in ngram_support(df, n=2, min_df=2).collect()
    }
    # docs 1 and 2 share the bigram "the cat" (1 of their 2 bigrams).
    assert out[1] == (2, 1, 0.5)
    assert out[2] == (2, 1, 0.5)
    assert out[3] == (3, 0, 0.0)


def test_orc_roundtrip(spark, tmp_path):
    from sparkgraft.sources.readers import read_orc, write_orc

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, v double"
    )
    write_orc(df, str(tmp_path / "t.orc"))
    back = read_orc(spark, str(tmp_path / "t.orc"))
    assert sorted(tuple(r) for r in back.collect()) == [
        (1, "a", 1.5),
        (2, "b", 2.5),
    ]
    # Predicate pushdown reaches the ORC scan.
    plan = back.filter(F.col("id") == 2)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), EqualTo(id,2)]" in plan


def test_jsonl_roundtrip_with_schema(spark, tmp_path):
    from sparkgraft.sources.readers import read_jsonl

    p = tmp_path / "d.jsonl"
    p.write_text('{"id": 1, "tag": "x"}\n{"id": 2, "tag": "y"}\n')
    back = read_jsonl(spark, str(p), "id LONG, tag STRING")
    assert sorted(tuple(r) for r in back.collect()) == [(1, "x"), (2, "y")]


def test_kmv_merge_law_exact(spark):
    from sparkgraft.operators.sketch import kmv_build, kmv_merge

    df = spark.createDataFrame(
        [("g", i * 7 % 113) for i in range(200)], "grp string, v long"
    )
    a = kmv_build(df.filter(F.col("v") % 2 == 0), ["grp"], "v", k=16)
    b = kmv_build(df.filter(F.col("v") % 2 == 1), ["grp"], "v", k=16)
    merged = kmv_merge(a, b, ["grp"], k=16).collect()[0]["ks"]
    direct = kmv_build(df, ["grp"], "v", k=16).collect()[0]["ks"]
    assert merged == direct  # exact, not just statistical


def test_kmv_exact_below_k(spark):
    from sparkgraft.operators.sketch import kmv_build, kmv_estimate

    df = spark.createDataFrame(
        [("g", i % 10) for i in range(100)], "grp string, v long"
    )
    row = kmv_estimate(kmv_build(df, ["grp"], "v", k=64), k=64).collect()[0]
    assert row["distinct_est"] == 10.0  # below k -> exact


def test_kmv_estimate_near_truth(spark):
    from sparkgraft.operators.sketch import kmv_build, kmv_estimate

    n = 5000
    df = spark.createDataFrame([("g", i) for i in range(n)], "grp string, v long")
    row = kmv_estimate(kmv_build(df, ["grp"], "v", k=256), k=256).collect()[0]
    assert abs(row["distinct_est"] - n) / n < 0.15


def test_kmv_intersection_estimate(spark):
    from sparkgraft.operators.sketch import kmv_build, kmv_intersection

    # A = 0..3999, B = 2000..5999 -> |A∩B| = 2000, J = 1/3.
    a = kmv_build(
        spark.createDataFrame([("g", i) for i in range(4000)], "grp string, v long"),
        ["grp"], "v", k=256,
    )
    b = kmv_build(
        spark.createDataFrame(
            [("g", i) for i in range(2000, 6000)], "grp string, v long"
        ),
        ["grp"], "v", k=256,
    )
    row = kmv_intersection(a, b, ["grp"], k=256).collect()[0]
    assert abs(row["jaccard_est"] - 1 / 3) < 0.1
    assert abs(row["intersection_est"] - 2000) / 2000 < 0.3


def test_profile_columns_null_and_distinct_counts(spark):
    from sparkgraft.operators.stats import profile_columns

    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "x"), (None, "y")], "a long, b string"
    )
    out = {r["column"]: r for r in profile_columns(df, ["a", "b"]).collect()}
    assert out["a"]["n_rows"] == 4 and out["a"]["n_nulls"] == 1
    assert out["a"]["n_distinct"] == 3
    assert (out["a"]["min_val"], out["a"]["max_val"]) == ("1", "3")
    assert out["b"]["n_nulls"] == 1 and out["b"]["n_distinct"] == 2


def test_sessionize_gap_breaks(spark):
    from sparkgraft.operators.timeseries import sessionize

    rows = [
        (1, "2024-01-01 10:00:00", 7),
        (2, "2024-01-01 10:10:00", 7),  # same session (10 min gap)
        (3, "2024-01-01 11:30:00", 7),  # 80 min gap -> new session
        (4, "2024-01-01 09:00:00", 8),  # other user
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["event_id"]: r["session_id"]
        for r in sessionize(df, gap_sec=1800).collect()
    }
    assert out == {1: 1, 2: 1, 3: 2, 4: 1}


def test_snapshot_diff_classification(spark):
    from sparkgraft.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 25.0), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    out = {
        r["k"]: (r["change_type"], sorted(r["changed_cols"]))
        for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    assert out == {
        1: ("unchanged", []),
        2: ("changed", ["s", "v"]),
        3: ("removed", []),
        4: ("added", []),
    }


def test_snapshot_diff_null_safe(spark):
    from sparkgraft.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, None)], "k long, s string")
    new = spark.createDataFrame([(1, None)], "k long, s string")
    row = snapshot_diff(old, new, ["k"], ["s"]).collect()[0]
    assert row["change_type"] == "unchanged"  # NULL == NULL here


def test_incremental_dedup_flags_cross_side_only(spark):
    from sparkgraft.operators.textops import incremental_dedup

    hist = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely unrelated history text about other things entirely")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog today"),  # dup of 1
         (11, "fresh new content that matches nothing in the corpus at all")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["is_duplicate"], r["dup_of"])
        for r in incremental_dedup(new, hist, min_jaccard=0.5).collect()
    }
    assert out[10] == (True, 1)
    assert out[11] == (False, None)


def test_validate_rows_collects_failures(spark):
    from sparkgraft.operators.merge import validate_rows

    df = spark.createDataFrame(
        [(1, 5, 0.01), (2, 40, 0.01), (3, 40, 0.2), (4, None, 0.01)],
        "id long, qty long, disc double",
    )
    rules = {
        "qty_small": F.col("qty") <= 30,
        "disc_ok": F.col("disc") <= 0.1,
    }
    out = {
        r["id"]: (sorted(r["failed_rules"]), r["admitted"])
        for r in validate_rows(df, rules, ["id"]).collect()
    }
    assert out[1] == ([], True)
    assert out[2] == (["qty_small"], False)
    assert out[3] == (["disc_ok", "qty_small"], False)
    assert out[4] == (["qty_small"], False)  # NULL rule result = failure


def test_resample_invariants_random_series(spark):
    # Seeded random series: interpolated values stay inside the hull of
    # their neighboring observations; grids are contiguous per key.
    import random

    rng = random.Random(7)
    rows = []
    eid = 0
    for user in (1, 2, 3):
        t = 0
        for _ in range(rng.randint(3, 12)):
            t += rng.randint(1, 10_000)
            rows.append((eid, f"2024-01-01 00:00:{0:02d}", user,
                         round(rng.uniform(-50, 50), 3), t))
            eid += 1
    df = (
        spark.createDataFrame(
            rows, "event_id long, base string, user_id long, value double, off long"
        )
        .withColumn(
            "ts",
            F.col("base").cast("timestamp") + F.col("off").cast("long")
            .cast("interval second"),
        )
        .drop("base", "off")
    )
    from sparkgraft.operators.timeseries import resample_interpolate

    out = resample_interpolate(
        df, "user_id", "ts", "value", "event_id", step_sec=600, digits=3
    ).collect()
    by_user: dict = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, rws in by_user.items():
        rws.sort(key=lambda r: r["bucket_ts"])
        # contiguous grid
        ts = [r["bucket_ts"] for r in rws]
        assert all(
            (b - a).total_seconds() == 600 for a, b in zip(ts, ts[1:])
        )
        obs_vals = [r["value"] for r in rws if r["is_observed"]]
        lo, hi = min(obs_vals), max(obs_vals)
        for r in rws:
            assert lo - 0.001 <= r["value"] <= hi + 0.001


def test_time_weighted_avg_vs_plain_mean(spark):
    from sparkgraft.operators.timeseries import time_weighted_avg

    # value 10 holds for 9 hours, value 100 for 1 hour -> TWA = 19;
    # the plain mean (55) would be wrong.
    rows = [
        (1, "2024-01-01 00:00:00", 7, 10.0),
        (2, "2024-01-01 09:00:00", 7, 100.0),
        (3, "2024-01-01 10:00:00", 7, 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    row = time_weighted_avg(df).collect()[0]
    assert row["n_samples"] == 3
    assert row["span_seconds"] == 36000
    assert row["twa"] == 19.0


def test_time_weighted_avg_single_sample_falls_back(spark):
    from sparkgraft.operators.timeseries import time_weighted_avg

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 7, 42.5)],
        "event_id long, ts string, user_id long, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    row = time_weighted_avg(df).collect()[0]
    assert (row["span_seconds"], row["twa"]) == (0, 42.5)


def test_golden_record_survivorship(spark):
    from sparkgraft.operators.merge import golden_record

    rows = [
        # entity 1: fresher high-prio source has a NULL name -> older
        # real name survives; balance comes from the fresh source.
        (1, 1, 1, "alice", 10.0),
        (1, 2, 2, None, 99.0),
        # entity 2: only one source.
        (2, 1, 1, "bob", 20.0),
    ]
    df = spark.createDataFrame(
        rows, "k long, prio int, ord int, name string, bal double"
    )
    out = {
        r["k"]: (r["name"], r["bal"], r["n_sources"])
        for r in golden_record(df, ["k"], ["name", "bal"], "prio", "ord").collect()
    }
    assert out[1] == ("alice", 99.0, 2)
    assert out[2] == ("bob", 20.0, 1)


def test_read_xml_rows_and_attributes(spark, tmp_path):
    from sparkgraft.sources.readers import read_xml

    p = tmp_path / "m.xml"
    p.write_text(
        "<machines>"
        '<m id="1"><name>press</name><temp>21.5</temp></m>'
        '<m id="2"><name>mill</name><temp>19.0</temp></m>'
        "</machines>"
    )
    df = read_xml(
        spark, str(p), "m", schema="_id LONG, name STRING, temp DOUBLE"
    )
    rows = {r["_id"]: (r["name"], r["temp"]) for r in df.collect()}
    assert rows == {1: ("press", 21.5), 2: ("mill", 19.0)}


def test_holt_forecast_exact_on_linear_series(spark):
    from sparkgraft.operators.timeseries import holt_forecast

    rows = [("ch", f"2024-01-01 00:00:{i:02d}", 1.0 + 2.0 * i) for i in range(8)]
    df = spark.createDataFrame(rows, "k string, ts_s string, value double").selectExpr(
        "k", "cast(ts_s as timestamp) as ts", "value"
    )
    out = {r["step"]: r for r in holt_forecast(df, ["k"], alpha=0.4, beta=0.2).collect()}
    # y = 1 + 2t: Holt reproduces a perfect line for any alpha/beta.
    assert out[1]["level"] == 15.0 and out[1]["trend"] == 2.0
    assert [out[h]["forecast"] for h in (1, 2, 3)] == [17.0, 19.0, 21.0]


def test_holt_forecast_constant_series_is_flat(spark):
    from sparkgraft.operators.timeseries import holt_forecast

    rows = [("a", f"2024-01-01 00:00:{i:02d}", 5.0) for i in range(6)] + [
        ("b", f"2024-01-01 00:00:{i:02d}", -2.5) for i in range(6)
    ]
    df = spark.createDataFrame(rows, "k string, ts_s string, value double").selectExpr(
        "k", "cast(ts_s as timestamp) as ts", "value"
    )
    got = {(r["k"], r["step"]): r["forecast"] for r in holt_forecast(df, ["k"]).collect()}
    assert all(got[("a", h)] == 5.0 for h in (1, 2, 3))
    assert all(got[("b", h)] == -2.5 for h in (1, 2, 3))


def test_holt_forecast_preserves_key_dtypes(spark):
    """ADVICE r3: numeric/date series keys come back with their
    ORIGINAL dtypes (schema built from df.schema), so forecasts join
    back to the source without implicit casts."""
    from pyspark.sql.types import IntegerType

    from sparkgraft.operators.timeseries import holt_forecast

    rows = [(7, float(t), 2.0 * t) for t in range(5)] + [
        (9, float(t), 5.0) for t in range(5)
    ]
    df = spark.createDataFrame(rows, "series_id int, ts double, value double")
    out = holt_forecast(df, ["series_id"], ts_col="ts")
    assert isinstance(out.schema["series_id"].dataType, IntegerType)
    got = {(r["series_id"], r["step"]): r["forecast"] for r in out.collect()}
    assert got[(7, 1)] == 10.0  # exact on a linear series
    assert got[(9, 3)] == 5.0  # flat on a constant series
    # Joining back on the typed key matches rows (no silent retype).
    joined = out.join(df.select("series_id").distinct(), "series_id").count()
    assert joined == 6

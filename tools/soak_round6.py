"""Round-6 soak: the auto-compaction file-count bound and the
validated CDC append fast path under table growth.

Claims to prove empirically:
- versioned_sink(auto_compact_every=N): the live file count stays
  BOUNDED (O(target + N * files/commit)) across a long ingest run,
  where the uncompacted sink grows O(commits) — and the final data is
  identical either way.
- cdc_feed's validated append fast path: per-commit feed wall stays
  FLAT while the TABLE grows (the validation is one min/max aggregate
  over the commit's new files + a manifest-sized stats read — never
  table-sized), and monotone ingest keys keep the fast path firing
  (emission stays adds-only, no full diff).

Run:  python tools/soak_round6.py [sf_dir]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sparkgraft.session import get_spark  # noqa: E402
from sparkgraft.sinks.versioned import (  # noqa: E402
    _read_manifest,
    latest_version,
    read_versioned,
    write_versioned,
)
from sparkgraft.streaming.pipeline import cdc_feed, versioned_sink  # noqa: E402


def t(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def stage_batches(spark, src: str, n_batches: int, rows_per: int) -> None:
    os.makedirs(src, exist_ok=True)
    for i in range(n_batches):
        df = spark.range(i * rows_per, (i + 1) * rows_per).selectExpr(
            "id as k", "cast(id as double) as v"
        )
        stage = f"{src}_stage_{i}"
        df.coalesce(1).write.mode("overwrite").json(stage)
        f = sorted(glob.glob(f"{stage}/part-*.json"))[0]
        dst = f"{src}/b{i:03d}.json"
        shutil.move(f, dst)
        os.utime(dst, (1700000000 + i, 1700000000 + i))


def soak_auto_compaction(spark) -> None:
    """24 micro-batch ingest, 4 files/commit: uncompacted file count
    grows linearly; auto_compact_every=6 bounds it; data identical."""
    print("== auto-compaction file-count bound (24 batches) ==")
    results = {}
    for label, every in (("none", None), ("every6", 6)):
        tmp = tempfile.mkdtemp(prefix=f"sg_soak6_ac_{label}_")
        stage_batches(spark, f"{tmp}/in", 24, 20_000)
        stream = (
            spark.readStream.schema("k long, v double")
            .option("maxFilesPerTrigger", "1")
            .json(f"{tmp}/in")
        )
        q = versioned_sink(
            stream,
            f"{tmp}/tbl",
            f"{tmp}/ckpt",
            stats_cols=["k"],
            sort_col="k",
            n_files=4,
            auto_compact_every=every,
            compact_target_files=4,
        )
        _, wall = t(lambda: q.awaitTermination(600))
        v = latest_version(f"{tmp}/tbl")
        trajectory = [
            len(_read_manifest(f"{tmp}/tbl", i)["files"]) for i in range(v + 1)
        ]
        n = read_versioned(spark, f"{tmp}/tbl").count()
        s = read_versioned(spark, f"{tmp}/tbl").agg(F.sum("k")).first()[0]
        results[label] = (n, s)
        print(
            f"  {label}: {v + 1} commits, live files "
            f"final={trajectory[-1]} max={max(trajectory)}, "
            f"wall {wall}s, rows {n}"
        )
    assert results["none"] == results["every6"], results
    print("  data identical with and without compaction: OK")


def soak_cdc_fast_path_flat(spark) -> None:
    """One constant-size monotone-key append on tables grown 1x/8x/32x:
    the validated fast path fires every time (keys provably new) and
    the per-commit CDC wall stays flat."""
    print("== validated CDC append fast path vs table growth ==")
    base_rows = 150_000
    for mult in (1, 8, 32):
        tmp = tempfile.mkdtemp(prefix=f"sg_soak6_cdc_{mult}x_")
        tbl = f"{tmp}/tbl"
        big = spark.range(base_rows * mult).selectExpr(
            "id as k", "cast(id as double) as v"
        )
        write_versioned(
            big, tbl, mode="overwrite", stats_cols=["k"], sort_col="k",
            n_files=8 * mult,
        )
        got = []

        def sink(df, batch_id):
            got.extend(
                (r["_commit_version"], r["change_type"], r["n"])
                for r in df.groupBy("_commit_version", "change_type")
                .agg(F.count("*").alias("n"))
                .collect()
            )

        def drain():
            q = cdc_feed(
                spark, tbl, ["k"], ["v"], f"{tmp}/ckpt", sink,
                append_fast_path=True,
            )
            q.awaitTermination(600)

        # Drain v0 first (its full-table 'added' emission is table-
        # sized by design) so the timed drain below is the PER-COMMIT
        # cost of the appended version alone.
        drain()
        lo = base_rows * mult
        append = spark.range(lo, lo + 1000).selectExpr(
            "id as k", "cast(id as double) as v"
        )
        write_versioned(append, tbl, mode="append", stats_cols=["k"])
        got.clear()
        _, wall = t(drain)
        assert sorted(got) == [(1, "added", 1000)], got  # fast path fired
        print(
            f"  {mult}x table ({base_rows * mult} rows, {8 * mult} files): "
            f"v1 catch-up {wall}s, emission adds-only OK"
        )


def main(sf_dir: str) -> None:
    spark = get_spark("soak-r6")
    spark.sparkContext.setLogLevel("ERROR")
    soak_auto_compaction(spark)
    soak_cdc_fast_path_flat(spark)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")

"""Round-7 soak: composite-key conjunctive pruning under table growth.

Claims to prove empirically:
- cdc_feed's validated append fast path with a TWO-COLUMN key: the
  conjunctive per-column range check (disjoint on ANY column proves
  tuple disjointness) keeps firing on monotone appends while the table
  grows 1x/8x/32x — per-commit feed wall stays FLAT (the validation
  is one multi-column min/max aggregate over the commit's new files +
  a manifest-sized stats read, never table-sized) and emission stays
  adds-only.
- upsert_versioned with a two-column key: a constant-range MERGE
  against a growing table touches a BOUNDED file subset (conjunctive
  auto-prune from the source's per-column ranges) — wall stays flat
  while the table grows 32x, the copy-on-write contract extended to
  composite keys.

Run:  python tools/soak_round7.py
"""

from __future__ import annotations

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
    upsert_versioned,
    write_versioned,
)
from sparkgraft.streaming.pipeline import cdc_feed  # noqa: E402


def t(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def build_table(spark, tdir: str, mult: int, rows_base: int = 150_000,
                files_base: int = 8) -> None:
    """A (g, k)-keyed table grown mult× — g cycles 0..15, k monotone."""
    n = rows_base * mult
    df = spark.range(n).select(
        (F.col("id") % 16).alias("g"),
        F.col("id").alias("k"),
        (F.col("id") * 2).cast("double").alias("v"),
    )
    write_versioned(
        df, tdir, mode="overwrite", stats_cols=["g", "k"],
        sort_col="k", n_files=files_base * mult,
    )


def soak_cdc(spark, base: str, mult: int) -> dict:
    tdir = os.path.join(base, f"cdc_{mult}x")
    build_table(spark, tdir, mult)
    hi = 150_000 * mult
    counts: dict = {}

    def sink(df, batch_id):
        rows = df.groupBy("change_type").count().collect()
        for r in rows:
            counts[r["change_type"]] = counts.get(r["change_type"], 0) + r["count"]

    ckpt = os.path.join(base, f"ck_{mult}x")

    def run():
        q = cdc_feed(
            spark, tdir, ["g", "k"], ["v"], ckpt, sink,
            append_fast_path=True,
        )
        q.awaitTermination(300)

    # drain v0 (full snapshot as added) first on the SAME checkpoint,
    # so the timed run processes only the append commit's catch-up
    q0 = cdc_feed(
        spark, tdir, ["g", "k"], ["v"], ckpt,
        lambda df, b: df.count(), append_fast_path=True,
    )
    q0.awaitTermination(600)
    # constant-size monotone append: k range disjoint from everything
    append = spark.range(hi, hi + 1000).select(
        (F.col("id") % 16).alias("g"),
        F.col("id").alias("k"),
        F.lit(-1.0).alias("v"),
    )
    write_versioned(append, tdir, mode="append", stats_cols=["g", "k"],
                    n_files=1)
    _, wall = t(run)
    return {"mult": mult, "wall": wall, "counts": dict(counts),
            "rows": 150_000 * mult}


def soak_merge(spark, base: str, mult: int) -> dict:
    tdir = os.path.join(base, f"mrg_{mult}x")
    build_table(spark, tdir, mult)
    parent = latest_version(tdir)
    n_parent_files = len(_read_manifest(tdir, parent)["files"])
    # constant-range source: g in {3}, k in a fixed 1000-key window —
    # the conjunctive prune should bound the touched set regardless of
    # table size
    src = spark.range(50_000, 51_000).select(
        F.lit(3).alias("g").cast("long"),
        F.col("id").alias("k"),
        F.lit(-5.0).alias("v"),
    )

    def run():
        return upsert_versioned(spark, tdir, src, ["g", "k"])

    v, wall = t(run)
    man = _read_manifest(tdir, v)
    carried = set(man["files"]) & set(_read_manifest(tdir, parent)["files"])
    touched = n_parent_files - len(carried)
    total = read_versioned(spark, tdir).count()
    return {"mult": mult, "wall": wall, "parent_files": n_parent_files,
            "touched": touched, "rows_after": total}


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="soak_r7_")
    try:
        print("== composite-key CDC append fast path under table growth ==")
        for mult in (1, 8, 32):
            print(soak_cdc(spark, base, mult), flush=True)
        print("== composite-key MERGE conjunctive auto-prune ==")
        for mult in (1, 8, 32):
            print(soak_merge(spark, base, mult), flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Round-7 soak: dedup-admission index unlearning under index growth.

Claim to prove empirically: compact_dedup_index's REWRITE work is
bounded by the forgotten docs' batch spread, not the index size — a
constant 100-doc forget set living in ONE batch partition rewrites the
same ~2 partitions (base + banded) while the index grows 1x/8x/32x.
The affected-partition DISCOVERY is a single-column (id) pruned scan
of the index — it grows with the index but at columnar-scan speed,
exactly like ann_index's tombstone-to-cluster discovery; the data
rewritten stays constant.  The honest contrast: a naive
rewrite-everything compaction would grow its WRITE volume 32x.

Run:  python tools/soak_dedup_forget.py
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
from sparkgraft.streaming.pipeline import (  # noqa: E402
    compact_dedup_index,
    delete_dedup_index,
)

DOCS_PER_BATCH = 2_000
BATCHES_BASE = 8


def t(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def build_index(spark, hist: str, n_batches: int) -> None:
    """Synthesize the sink's layout directly (base + banded,
    partitioned by _batch_id) — the compaction path only sees parquet,
    so this soaks it without paying n_batches streaming drains."""
    ids = spark.range(n_batches * DOCS_PER_BATCH).select(
        F.concat(F.lit("d"), F.col("id")).alias("id"),
        (F.col("id") % n_batches).cast("long").alias("_batch_id"),
        F.col("id").alias("n"),
    )
    base = ids.select(
        "id",
        F.transform(
            F.sequence(F.lit(0), F.lit(9)),
            lambda i: F.concat(F.col("n").cast("string"), F.lit("_"), i),
        ).alias("sh"),
        "_batch_id",
    )
    banded = ids.select(
        "id",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("band"),
        F.md5(F.concat("id", F.lit("|"))).alias("bucket"),
        "_batch_id",
    )
    base.write.partitionBy("_batch_id").mode("overwrite").parquet(
        f"{hist}/base"
    )
    banded.write.partitionBy("_batch_id").mode("overwrite").parquet(
        f"{hist}/banded"
    )


def main() -> None:
    spark = get_spark(
        "soak-dedup-forget",
        master="local[32]",
        extra_conf={"spark.sql.shuffle.partitions": "32"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for mult in (1, 8, 32):
        n_batches = BATCHES_BASE * mult
        hist = tempfile.mkdtemp(prefix=f"soak_dforget_{mult}x_")
        build_index(spark, hist, n_batches)
        # constant forget set: 100 docs, all in batch 3
        forget = [f"d{3 + i * n_batches}" for i in range(100)]
        delete_dedup_index(spark, hist, forget)
        n_touched, wall = t(lambda: compact_dedup_index(spark, hist))
        survivors = spark.read.parquet(f"{hist}/base").count()
        print(
            f"{mult}x: batches={n_batches} docs={n_batches * DOCS_PER_BATCH} "
            f"partitions_touched={n_touched} compact_wall={wall}s "
            f"survivors={survivors}"
        )
        assert n_touched == 2  # batch 3 in base AND banded, nothing else
        assert survivors == n_batches * DOCS_PER_BATCH - 100
        shutil.rmtree(hist, ignore_errors=True)


if __name__ == "__main__":
    main()

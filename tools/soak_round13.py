"""Round-13 soak (verdict r12 task 1 done-bar): semantic_dedup under a
FORCED mega-cluster — the adversarial regime the new
``max_cluster_size`` split exists for — measured at x1/x8/x32 corpus
growth, capped vs uncapped.

Fixture: the round-12 grower's embeddings tables
(/tmp/sparkgraft_soak12/{x1,x8,x32} — per-copy isometry, so the corpus
GROWS instead of repeating), with a SINGLE centroid so every vector
lands in one cluster: |c| = n and the uncapped pairwise stage is the
full n²/2.  That is the worst case the r12 verdict flagged (one
mega-cluster makes total work quadratic no matter how well the
triangle decomposition distributes it).

Expected shape (the table this tool prints):
- uncapped task-seconds grow ~(n/n0)² — measured at x1/x8 (x32
  uncapped would be ~64x the x8 task-seconds; run it only if you have
  the minutes to burn: `run ... uncapped_x32`);
- capped (M=2000) task-seconds grow ~LINEAR in n: every final group
  is ≤~M rows, so pair work is ~n*M/2.  The x8→x32 step ratio is the
  done-bar: task-seconds ratio ≤ ~5 on a 4x input step (linear + seed
  /refit overhead), vs 16x for the quadratic.

Each scale leg runs in its own subprocess (fresh JVM) with the event
log on; max-task share and task-seconds are parsed from the log over
the span of the SAME run the reported wall comes from (r12 ADVICE
measurement discipline).

Usage:
  python tools/soak_round13.py            # all legs + table
  python tools/soak_round13.py run TAG    # one leg (subprocess body)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/sparkgraft_soak12"  # reuse the r12 fixtures
M = 2000

# leg -> (fixture subdir, capped?)
LEGS = {
    "uncapped_x1": ("x1", False),
    "uncapped_x8": ("x8", False),
    "capped_x1": ("x1", True),
    "capped_x8": ("x8", True),
    "capped_x32": ("x32", True),
}


def run_leg(tag: str) -> None:
    sub, capped = LEGS[tag]
    fixture = f"{ROOT}/{sub}"
    evdir = f"{ROOT}/eventlog_r13_{tag}"
    os.makedirs(evdir, exist_ok=True)
    from pyspark.sql import functions as F

    from sparkgraft.operators.similarity import semantic_dedup
    from sparkgraft.session import get_spark
    from sparkgraft.sources.readers import read_table

    spark = get_spark(
        f"soak13-{tag}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{evdir}",
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    emb = read_table(spark, fixture, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    n = emb.count()
    cents = [(0, [0.0] * 64)]  # single centroid -> ONE mega-cluster

    def run():
        out = semantic_dedup(
            emb,
            cents,
            threshold=0.999,
            max_cluster_size=M if capped else None,
        )
        out.write.format("noop").mode("overwrite").save()

    run()  # warm (codegen, scans)
    best = float("inf")
    span = (0, 0)
    for _ in range(2):
        t0 = time.time()
        s = time.perf_counter()
        run()
        wall = time.perf_counter() - s
        if wall < best:
            best = wall
            span = (int(t0 * 1000), int(time.time() * 1000))
    spark.stop()

    tasks: list[tuple[int, float]] = []
    v2 = os.path.join(evdir, f"eventlog_v2_{app_id}")
    candidates = []
    if os.path.isdir(v2):
        candidates = sorted(
            os.path.join(v2, nme)
            for nme in os.listdir(v2)
            if nme.startswith("events_")
        )
    else:
        for cand in (
            os.path.join(evdir, app_id),
            os.path.join(evdir, app_id) + ".inprogress",
        ):
            if os.path.exists(cand):
                candidates = [cand]
                break
    for path in candidates:
        with open(path) as fh:
            for line in fh:
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                ev = json.loads(line)
                info = ev.get("Task Info", {})
                met = ev.get("Task Metrics") or {}
                rt = met.get("Executor Run Time", 0) / 1000.0
                tasks.append((info.get("Finish Time", 0), rt))
    a, b = span
    qt = [rt for fin, rt in tasks if a <= fin <= b]
    rec = {
        "tag": tag,
        "n_vectors": n,
        "wall_sec": round(best, 2),
        "n_tasks": len(qt),
        "sum_task_sec": round(sum(qt), 2),
        "max_task_share": (
            round(max(qt) / sum(qt), 4) if qt and sum(qt) > 0 else None
        ),
    }
    print("SOAK13_RESULT " + json.dumps(rec), flush=True)


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] == "run":
        run_leg(sys.argv[2])
        return 0
    for sub in ("x1", "x8", "x32"):
        if not os.path.exists(f"{ROOT}/{sub}/_READY"):
            print(
                f"fixture {ROOT}/{sub} missing — build with "
                "`python tools/soak_round12.py build` / `build32` first"
            )
            return 1
    legs = sys.argv[1:] or list(LEGS)
    results = {}
    for tag in legs:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "run", tag],
            capture_output=True,
            text=True,
        )
        sys.stdout.write(proc.stdout)
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            return 1
        for line in proc.stdout.splitlines():
            if line.startswith("SOAK13_RESULT "):
                rec = json.loads(line[len("SOAK13_RESULT "):])
                results[rec["tag"]] = rec

    print(
        f"\n{'leg':<14} {'n':>7} {'wall':>7} {'tasks':>6} "
        f"{'task-sec':>9} {'max-task':>9}"
    )
    for tag in LEGS:
        r = results.get(tag)
        if not r:
            continue
        print(
            f"{tag:<14} {r['n_vectors']:>7} {r['wall_sec']:>7} "
            f"{r['n_tasks']:>6} {r['sum_task_sec']:>9} "
            f"{str(r['max_task_share']):>9}"
        )
    cap8 = results.get("capped_x8", {}).get("sum_task_sec")
    cap32 = results.get("capped_x32", {}).get("sum_task_sec")
    if cap8 and cap32:
        print(
            f"\ncapped x8->x32 task-sec step ratio (4x input): "
            f"{cap32 / cap8:.2f} (linear=4, quadratic=16)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

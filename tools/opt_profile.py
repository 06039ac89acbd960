"""Round-13 optimization profiler (guide §1: measure first).

For each named query, isolates WHERE the wall-time goes:

  build_sec    — queries[name](spark, sf_dir): pure driver-side
                 DataFrame construction (Python + analysis of any
                 eager sub-steps the query runs while composing, e.g.
                 index builds, collects for literal tables)
  plan_sec     — explain("formatted") on the built frame: Catalyst
                 analysis+optimization+physical planning cost, a proxy
                 for the per-invocation driver tax of big plans
  exec_sec     — noop-sink execution, best-of-N (guide §1.4)

and records the plan shape: #Exchange, #BroadcastExchange, join node
histogram, Python-boundary nodes (BatchEvalPython / ArrowEvalPython /
MapInPandas / FlatMapGroupsInPandas / MapInArrow), #Scan, and whether
PushedFilters is non-empty anywhere.  Optionally dumps the formatted
plan to plans/r13/<name>_<tag>.txt.

Usage:
  python tools/opt_profile.py [sf_dir] [q1,q2,...] [--tag before] [--reps 3]
      [--plandir plans/r14]
Defaults: sf0.1, the top-30 of BENCH_r12_full.json, no dump (tag '').
With --tag the formatted plan is written to <plandir>/<q>_<tag>.txt
(plandir defaults to plans/r14 — the current optimization round).

Output: one JSON line per query to stdout + a summary table; full map
written to /tmp/opt_profile_<tag|adhoc>.json.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkgraft.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PY_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "MapInArrow",
    "FlatMapGroupsInArrow",
    "AggregateInPandas",
)
JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def plan_shape(txt: str) -> dict:
    shape = {
        "exchanges": len(re.findall(r"\bExchange\b", txt))
        - len(re.findall(r"\bBroadcastExchange\b", txt)),
        "broadcast_exchanges": len(re.findall(r"\bBroadcastExchange\b", txt)),
        "scans": len(re.findall(r"Scan parquet|Scan ExistingRDD|Scan json", txt)),
        "plan_chars": len(txt),
    }
    joins = {}
    for j in JOIN_NODES:
        n = len(re.findall(rf"\b{j}\b", txt))
        if n:
            joins[j] = n
    shape["joins"] = joins
    py = {}
    for p in PY_NODES:
        n = len(re.findall(rf"\b{p}\b", txt))
        if n:
            py[p] = n
    shape["python_nodes"] = py
    shape["pushed_filters"] = bool(
        re.search(r"PushedFilters: \[(?!\])", txt)
    )
    return shape


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    args = [a for a in sys.argv[1:]]
    tag = ""
    reps = 3
    plandir = os.path.join("plans", "r14")
    if "--plandir" in args:
        i = args.index("--plandir")
        plandir = args[i + 1]
        del args[i : i + 2]
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    if len(args) > 1 and args[1]:
        names = args[1].split(",")
    else:
        full = json.load(open(os.path.join(REPO, "BENCH_r12_full.json")))
        names = [
            k
            for k, _ in sorted(
                full["queries"].items(), key=lambda kv: -kv[1]
            )[:30]
        ]

    spark = get_spark("opt-profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    out: dict[str, dict] = {}
    for name in names:
        if name not in queries:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"profile:{name}:build")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        build = time.perf_counter() - t0
        t0 = time.perf_counter()
        txt = formatted_plan(df)
        plan = time.perf_counter() - t0
        shape = plan_shape(txt)
        if tag:
            path = os.path.join(REPO, plandir, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(txt)
        # warm-up exec (codegen compile, one-time artifacts), then best-of-N
        spark.sparkContext.setJobDescription(f"profile:{name}:exec")
        df.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(reps):
            # rebuild each rep like bench.py does (captures per-call
            # driver work inside the query fn)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        rec = {
            "build_sec": round(build, 3),
            "plan_sec": round(plan, 3),
            "exec_best_sec": round(best, 3),
            **shape,
        }
        out[name] = rec
        print(json.dumps({name: rec}))
    dest = f"/tmp/opt_profile_{tag or 'adhoc'}.json"
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\n{'query':28s} {'build':>6s} {'plan':>6s} {'exec':>6s} "
          f"{'exch':>4s} {'bcast':>5s} {'py':>3s} {'chars':>8s}")
    for n, r in sorted(out.items(), key=lambda kv: -kv[1]["exec_best_sec"]):
        print(
            f"{n:28s} {r['build_sec']:6.2f} {r['plan_sec']:6.2f} "
            f"{r['exec_best_sec']:6.2f} {r['exchanges']:4d} "
            f"{r['broadcast_exchanges']:5d} "
            f"{sum(r['python_nodes'].values()):3d} {r['plan_chars']:8d}"
        )
    print(f"written: {dest}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Round-12 soak: the slowest HEADLINE PANELS end-to-end at 8x sf0.1
(VERDICT r11 task 3 — the kernel soaks bound individual operators;
this bounds whole query plans, the closest local[32] gets to the 100x
question).

Fixture (built once into /tmp/sparkgraft_soak12/{x1,x8}): every table
replicated `copies` times with entity keys offset per copy so the
result is a larger *corpus*, not a pile of duplicates —

- dims region/nation stay fixed (they are fixed at any SF);
- fact/entity keys (custkey, orderkey, partkey, suppkey, event_id,
  user_id, doc_id, vec_id) shift by copy * max_key, foreign keys
  consistently;
- `documents.text` gets a per-copy token salt (every token suffixed
  `_sN` for copy N>0): within-copy shingle/near-dup structure is
  preserved exactly, cross-copy Jaccard drops to ~0 — so dedup pair
  counts grow ~linearly (constant dup-rate), as real corpus growth
  does, instead of the 64x cross-copy clique blow-up naive
  replication would fabricate;
- `embeddings.embedding` gets a per-copy ISOMETRY (seeded dimension
  permutation + sign flips): within-copy dot products are bit-class
  identical (the copy is an isometric clone of the corpus geometry),
  cross-copy cosines are pseudo-random — same rationale.

The x1 fixture is the SAME rewrite path with copies=1, so layout
(file count, row groups, timestamp physical type) is identical and
the x8/x1 ratio isolates data growth from layout.

Measurement per query per scale, in ONE subprocess per scale (clean
JVM, event log on): untimed warm-up (index builds, codegen), then
best-of-2 wall; the Spark event log is parsed post-stop for the tasks
inside each query's timed span → max-task share (straggler bound:
max single task runtime / sum task runtimes) and task count.

Verdict bar: no query super-quadratic (wall ratio <= ~64 = ratio^2
with ratio=8); super-linear outliers (>8x) get a written cause in
SCALE.md.

Usage:
  python tools/soak_round12.py                # build + run both + table
  python tools/soak_round12.py build          # fixtures only
  python tools/soak_round12.py run DIR TAG    # one scale (subprocess)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/sparkgraft_soak12"
COPIES = 8

# The 10 slowest queries of the round-12 full bench map
# (bench_full_latest.json) + ann_forget (the r11 watch item); override
# on the command line after `run DIR TAG`.
QUERIES = [
    "ann_panel",
    "semdedup_panel",
    "setsim_pairs",
    "contamination_panel",
    "forget_panel",
    "audio_dedup",
    "lakehouse_reads",
    "gopher_gate",
    "split_leakage",
    "ivfpq_ann",
    "ann_forget",
]

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# (table, key_col) pairs whose ids shift per copy; FKs listed with the
# table whose max defines the offset base.
ENTITY_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FOREIGN_KEYS = {
    "orders": [("o_custkey", "customer", "c_custkey")],
    "lineitem": [
        ("l_orderkey", "orders", "o_orderkey"),
        ("l_partkey", "part", "p_partkey"),
        ("l_suppkey", "supplier", "s_suppkey"),
    ],
}


def build_fixture(spark, src_dir: str, out_dir: str, copies: int) -> None:
    from pyspark.sql import functions as F

    from sparkgraft.sources.readers import read_table

    os.makedirs(out_dir, exist_ok=True)
    maxes = {
        t: read_table(spark, src_dir, t)
        .agg(F.max(ks[0]))
        .collect()[0][0]
        + 1
        for t, ks in ENTITY_KEYS.items()
    }

    user_base = (
        read_table(spark, src_dir, "events").agg(F.max("user_id")).collect()[0][0]
        + 1
    )

    def one_copy(t: str, c: int):
        df = read_table(spark, src_dir, t)
        for k in ENTITY_KEYS.get(t, []):
            base = maxes[t] if k != "user_id" else user_base
            df = df.withColumn(k, F.col(k) + F.lit(c * base))
        for fk, ft, _ in FOREIGN_KEYS.get(t, []):
            df = df.withColumn(fk, F.col(fk) + F.lit(c * maxes[ft]))
        if t == "documents" and c > 0:
            df = df.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", rf"$1_s{c}")
            ).withColumn("n_chars", F.length("text").cast("long"))
        if t == "embeddings" and c > 0:
            df = _isometry(df, c)
        return df

    for t in TABLES:
        if t in ("region", "nation"):
            df = one_copy(t, 0)
        else:
            df = one_copy(t, 0)
            for c in range(1, copies):
                df = df.unionByName(one_copy(t, c))
        df.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        print(f"[fixture] {out_dir}/{t}.parquet written", flush=True)


def _isometry(df, c: int):
    """Per-copy seeded dim-permutation + sign-flip: an exact isometry
    (within-copy dot products unchanged; cross-copy pseudo-random)."""
    import numpy as np
    import pandas as pd

    def kernel(it):
        rng = np.random.default_rng(1000 + c)
        perm = None
        signs = None
        for pdf in it:
            if len(pdf) == 0:
                yield pdf
                continue
            if perm is None:
                d = len(pdf["embedding"].iloc[0])
                perm = rng.permutation(d)
                signs = rng.choice([-1.0, 1.0], size=d).astype("float32")
            mat = np.vstack(pdf["embedding"].to_numpy())
            out = (mat[:, perm] * signs).astype("float32")
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].values,
                    "embedding": list(out),
                    "label": pdf["label"].values,
                }
            )

    return df.mapInPandas(kernel, df.schema)


def run_scale(fixture_dir: str, tag: str, names: list[str]) -> None:
    """Subprocess body: warm + best-of-2 each query on fixture_dir with
    the event log on; parse the log post-stop for max-task share."""
    evdir = f"{ROOT}/eventlog_{tag}"
    os.makedirs(evdir, exist_ok=True)
    from sparkgraft.session import get_spark

    spark = get_spark(
        f"soak12-{tag}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{evdir}",
            # plain-text log: the parser below reads it line-by-line
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    spans: dict[str, tuple[int, int]] = {}
    walls: dict[str, float] = {}
    rows: dict[str, int] = {}

    for name in names:
        fn = queries[name]
        fn(spark, fixture_dir).write.format("noop").mode("overwrite").save()  # warm
        rows[name] = fn(spark, fixture_dir).count()  # doubles as 2nd warm
        best = float("inf")
        for _ in range(2):
            # span only ONE run, and the SAME run the reported wall
            # comes from (r12 ADVICE: spans overwritten to the last
            # run could describe a slower run than the best-of wall,
            # skewing max-task/sum-task against the wall they share)
            t0 = time.time()
            s = time.perf_counter()
            fn(spark, fixture_dir).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - s
            if wall < best:
                best = wall
                spans[name] = (int(t0 * 1000), int(time.time() * 1000))
        walls[name] = round(best, 3)
        print(f"[{tag}] {name}: wall={walls[name]}s rows={rows[name]}", flush=True)
    spark.stop()

    tasks: list[tuple[int, float]] = []  # (finish_ms, runtime_sec)
    # Spark 4 defaults to the rolling (v2) layout: a directory
    # eventlog_v2_<appId>/ holding events_* part files; older layouts
    # write a single file named <appId>[.inprogress].
    candidates = []
    v2 = os.path.join(evdir, f"eventlog_v2_{app_id}")
    if os.path.isdir(v2):
        candidates = sorted(
            os.path.join(v2, n)
            for n in os.listdir(v2)
            if n.startswith("events_")
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
    out = {}
    for name, (a, b) in spans.items():
        qt = [rt for fin, rt in tasks if a <= fin <= b]
        share = round(max(qt) / sum(qt), 4) if qt and sum(qt) > 0 else None
        out[name] = {
            "wall_sec": walls[name],
            "rows": rows[name],
            "n_tasks": len(qt),
            "sum_task_sec": round(sum(qt), 2),
            "max_task_share": share,
        }
    print("SOAK12_RESULT " + json.dumps({"tag": tag, "queries": out}))


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "run":
        run_scale(sys.argv[2], sys.argv[3], sys.argv[4:] or QUERIES)
        return 0

    from sparkgraft.session import get_spark

    if len(sys.argv) == 1 or sys.argv[1] in ("build", "build32"):
        # build32 adds the 32x curvature point (1x/8x/32x gives the
        # growth exponent for the scale-growing queries — the 100x
        # question's local proxy); run it via `run <dir> x32 <q...>`
        todo = (
            [(32, "x32")]
            if len(sys.argv) > 1 and sys.argv[1] == "build32"
            else [(1, "x1"), (COPIES, "x8")]
        )
        spark = get_spark("soak12-build")
        spark.sparkContext.setLogLevel("ERROR")
        for copies, sub in todo:
            marker = f"{ROOT}/{sub}/_READY"
            if not os.path.exists(marker):
                build_fixture(spark, SRC, f"{ROOT}/{sub}", copies)
                open(marker, "w").write("ok")
        spark.stop()
        if len(sys.argv) > 1:
            return 0

    results = {}
    for sub in ("x1", "x8"):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "run", f"{ROOT}/{sub}", sub],
            capture_output=True,
            text=True,
        )
        sys.stdout.write(proc.stdout)
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            return 1
        for line in proc.stdout.splitlines():
            if line.startswith("SOAK12_RESULT "):
                rec = json.loads(line[len("SOAK12_RESULT "):])
                results[rec["tag"]] = rec["queries"]

    print(f"\n{'query':<22} {'x1 wall':>8} {'x8 wall':>8} {'ratio':>6} "
          f"{'x1 rows':>9} {'x8 rows':>9} {'x8 max-task':>11}")
    for name in QUERIES:
        a = results.get("x1", {}).get(name)
        b = results.get("x8", {}).get(name)
        if not a or not b:
            continue
        ratio = round(b["wall_sec"] / a["wall_sec"], 2) if a["wall_sec"] else None
        print(f"{name:<22} {a['wall_sec']:>8} {b['wall_sec']:>8} {ratio:>6} "
              f"{a['rows']:>9} {b['rows']:>9} {str(b['max_task_share']):>11}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

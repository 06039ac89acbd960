"""Release audit — the standing battery as ONE command (round-12
verdict task 1).

Runs, in order, each standing audit as a subprocess (own Spark
session, so a JVM left dirty by one stage can't contaminate the next):

  1. gate_mirror       — all queries vs their DuckDB oracles (the
                         driver-gate mirror; the correctness bar)
  2. dialect_audit     — oracle result-type whitelist + dialect traps
  3. boundary_audit    — round() half-boundary probes on every oracle
  4. fetch_dtype_audit — toPandas() vs fetchdf() dtype-kind symmetry
  5. determinism_audit — every query 7-vs-64 shuffle partitions

Exit 0 iff ALL stages exit 0.  Prints a per-stage PASS/FAIL line as it
goes and a final summary table; on failure the stage's last 40 output
lines are echoed so the cause is visible without re-running.

Usage:  python tools/release_audit.py [sf_dir]   (default sf0.01)

Run this once on the FINAL tree every round; cite the summary in
ROUNDn.md.  Individual tools remain runnable standalone for iteration.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

TOOLS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS_DIR)

STAGES = [
    "gate_mirror",
    "dialect_audit",
    "boundary_audit",
    "fetch_dtype_audit",
    "determinism_audit",
]


def census() -> int:
    """Stage 0 (no Spark): every queries() entry must carry an
    oracle_sql() entry and vice versa — the 0-rows-only invariant held
    since round 9."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as m

    q, o = set(m.queries()), set(m.oracle_sql())
    print(
        f"[release_audit] census: {len(q)} queries / {len(o)} oracles; "
        f"missing_oracle={sorted(q - o) or 'none'} "
        f"orphan_oracle={sorted(o - q) or 'none'}"
    )
    return 0 if q == o else 1


def main(sf_dir: str) -> int:
    results: list[tuple[str, int, float]] = []
    t0 = time.perf_counter()
    rc = census()
    results.append(("census", rc, time.perf_counter() - t0))
    print(
        f"[release_audit] {'census':<18} "
        f"{'PASS' if rc == 0 else 'FAIL'}  "
        f"({results[-1][2]:.1f}s)",
        flush=True,
    )
    for stage in STAGES:
        script = os.path.join(TOOLS_DIR, f"{stage}.py")
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, script, sf_dir],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        dt = time.perf_counter() - t0
        results.append((stage, proc.returncode, dt))
        status = "PASS" if proc.returncode == 0 else f"FAIL (exit {proc.returncode})"
        print(f"[release_audit] {stage:<18} {status}  ({dt:.1f}s)", flush=True)
        if proc.returncode != 0:
            tail = (proc.stdout + "\n" + proc.stderr).strip().splitlines()[-40:]
            for line in tail:
                print(f"    | {line}")
    print("\n[release_audit] summary:")
    for stage, rc, dt in results:
        print(f"  {stage:<18} {'PASS' if rc == 0 else 'FAIL':<4}  {dt:7.1f}s")
    failed = [s for s, rc, _ in results if rc != 0]
    if failed:
        print(f"[release_audit] FAILED stages: {', '.join(failed)}")
        return 1
    print("[release_audit] ALL GREEN")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))

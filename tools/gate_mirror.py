"""Local mirror of the driver's correctness gate: run every
``queries()`` entry on a PLAIN SparkSession at sf0.01 and compare
against ``oracle_sql()`` via DuckDB (column set + order-insensitive
canonical values) — the exact recipe in .claude/skills/verify.

Run:  python tools/gate_mirror.py [sf_dir] [name1,name2,...]
The optional second argument restricts the run to a comma-separated
query subset (iteration aid; the gate itself always runs everything).
Exit code 0 = all green.

Mismatch capture (round-8): any MISMATCH dumps the full canonical row
diff — columns, rows only on the Spark side, rows only on the oracle
side — to ``gate_mismatch_<name>.json`` next to this script, so a
one-off driver-environment flake (the r7 retrieval_metrics case) is
diagnosable from the artifact alone instead of being unreproducible.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def _capture_mismatch(name, scols, dcols, sset, dset):
    """Dump the canonical row diff for a failed compare: rows present
    only on one side (first 50 each way), plus the column sets.  The
    multiset diff preserves duplicates — a row appearing 2× on one
    side and 1× on the other shows up once in the diff."""
    s_only, d_only, i, j = [], [], 0, 0
    while i < len(sset) or j < len(dset):
        if j >= len(dset) or (i < len(sset) and sset[i] < dset[j]):
            s_only.append(sset[i]); i += 1
        elif i >= len(sset) or dset[j] < sset[i]:
            d_only.append(dset[j]); j += 1
        else:
            i += 1; j += 1
    out = {
        "query": name,
        "spark_columns": sorted(scols),
        "oracle_columns": sorted(dcols),
        "spark_rows": len(sset),
        "oracle_rows": len(dset),
        "spark_only": s_only[:50],
        "oracle_only": d_only[:50],
        "spark_only_total": len(s_only),
        "oracle_only_total": len(d_only),
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"gate_mismatch_{name}.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(f"  -> row diff captured: {path}")
    for r in s_only[:5]:
        print(f"  spark-only : {r}")
    for r in d_only[:5]:
        print(f"  oracle-only: {r}")


def main(sf_dir: str, only: "set[str] | None" = None) -> int:
    spark = SparkSession.builder.master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if only is None:
        assert entrymod.entry(spark).count() > 0
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    oracles = entrymod.oracle_sql()
    items = sorted(entrymod.queries().items())
    if only is not None:
        missing = only - {n for n, _ in items}
        if missing:
            print("UNKNOWN QUERIES:", sorted(missing))
            return 1
        items = [(n, f) for n, f in items if n in only]
    fails, empties = [], []
    for name, fn in items:
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        if not srows:
            empties.append(name)
        sql = oracles.get(name)
        if sql is None:
            print(f"{name}: rows-only ({len(srows)})")
            continue
        d = con.execute(sql)
        dcols = [c[0] for c in d.description]
        so = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
        do = sorted(range(len(dcols)), key=lambda i: dcols[i])
        sset = sorted(tuple(canon(r[i]) for i in so) for r in srows)
        dset = sorted(tuple(canon(r[i]) for i in do) for r in d.fetchall())
        ok = sorted(sdf.columns) == sorted(dcols) and sset == dset
        if not ok:
            fails.append(name)
            _capture_mismatch(name, sdf.columns, dcols, sset, dset)
        print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(srows)} rows)")
    print("EMPTIES:", empties or "none")
    print("FAILURES:", fails or "none")
    spark.stop()
    return 1 if fails or empties else 0


if __name__ == "__main__":
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
            set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None,
        )
    )

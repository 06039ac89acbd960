"""Pandas-fetch-path dtype audit over every (query, oracle) pair —
the round-11 end-to-end closure of the r7-r10 driver-red root cause.

The r10 red/green signature (HUGEINT columns red, FLOAT and
NULL-DOUBLE columns green) is consistent with a driver that fetches
BOTH sides to pandas and hashes canonical values: under that model a
divergence is possible precisely when the two engines' pandas dtypes
for a column differ in KIND (int vs float: 118 vs 118.0).  The
dialect audit's result-type whitelist blocks the known offenders by
type name; this audit closes the loop empirically — it materializes
every query on a PLAIN SparkSession via ``toPandas()`` and its oracle
via DuckDB ``fetchdf()`` and compares the per-column numpy dtype
*kinds* ('b' bool / 'i' int / 'u' uint / 'f' float / 'O' object /
'M' datetime), after sorting columns by name exactly as the driver's
compare does.

Accepted kind pairs beyond exact equality:

- (i, f) or (u, f) where the float side contains at least one NaN in
  the fetched frame: the classic pandas NULL-promotion (a nullable
  int column becomes float64) — it fires on BOTH engines' fetch paths
  whenever a NULL is present, so it is symmetric whenever the VALUES
  agree (and if the values disagreed, the value hash already fails).
- (b, O): pandas maps nullable BOOLEAN to object on some paths.

Anything else — most importantly an int-kind column on one side and a
NaN-free float-kind column on the other, the exact HUGEINT signature
— is flagged.

Run:  python tools/fetch_dtype_audit.py [sf_dir]    # exit 0 = clean
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _kinds(pdf) -> dict[str, tuple[str, bool]]:
    """column -> (dtype kind, has_nan) with columns sorted by name."""
    out = {}
    for col in sorted(pdf.columns):
        s = pdf[col]
        kind = np.dtype(s.dtype).kind if s.dtype != object else "O"
        has_nan = False
        if kind == "f":
            has_nan = bool(s.isna().any())
        out[col] = (kind, has_nan)
    return out


def _compatible(sk: tuple[str, bool], dk: tuple[str, bool]) -> bool:
    (a, a_nan), (b, b_nan) = sk, dk
    if a == b:
        return True
    pair = {a, b}
    if pair <= {"i", "u"}:
        return True  # width/signedness never changes the canon string
    if pair == {"i", "f"} or pair == {"u", "f"}:
        # NULL promotion: only symmetric (hence value-safe) when the
        # float side actually carries a NaN
        return (a == "f" and a_nan) or (b == "f" and b_nan)
    if pair == {"b", "O"}:
        return True
    return False


def main(sf_dir: str, only: "set[str] | None" = None) -> int:
    spark = SparkSession.builder.master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    oracles = entrymod.oracle_sql()
    items = sorted(entrymod.queries().items())
    if only is not None:
        items = [(n, f) for n, f in items if n in only]
    flagged: list[tuple[str, str, str, str]] = []
    for name, fn in items:
        sql = oracles.get(name)
        if sql is None:
            print(f"{name}: rows-only (skipped)")
            continue
        spdf = fn(spark, sf_dir).toPandas()
        dpdf = con.execute(sql).fetchdf()
        sk, dk = _kinds(spdf), _kinds(dpdf)
        if set(sk) != set(dk):
            flagged.append((name, "<columns>", str(sorted(sk)), str(sorted(dk))))
            print(f"{name}: COLUMN-SET MISMATCH")
            continue
        bad = [
            (c, sk[c], dk[c])
            for c in sk
            if not _compatible(sk[c], dk[c])
        ]
        for c, a, b in bad:
            flagged.append((name, c, str(a), str(b)))
        print(
            f"{name}: {'OK' if not bad else 'DTYPE MISMATCH ' + str(bad)}"
        )
    print(f"flagged: {len(flagged)}")
    for row in flagged:
        print("  ", row)
    return 1 if flagged else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    sys.exit(main(sf, only))

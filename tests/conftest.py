"""Shared fixtures: one SparkSession per test session, a DuckDB
connection with the testdata views registered (mirroring the driver's
oracle harness), and canonical result comparison helpers."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkgraft.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sparkgraft-tests", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def canon_value(v):
    """Canonicalize a cell for order-insensitive exact comparison."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in cols), out


def compare_spark_duckdb(sdf, ddb_con, sql):
    """Order-insensitive exact compare, like the driver's value hash."""
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = list(sdf.columns)
    d = ddb_con.execute(sql)
    d_cols = [c[0] for c in d.description]
    d_rows = [tuple(r) for r in d.fetchall()]
    sc, sr = canon_rows(s_cols, s_rows)
    dc, dr = canon_rows(d_cols, d_rows)
    assert sc == dc, f"column mismatch: spark={sc} duckdb={dc}"
    assert len(sr) == len(dr), f"row count: spark={len(sr)} duckdb={len(dr)}"
    mismatches = [(a, b) for a, b in zip(sr, dr) if a != b]
    assert not mismatches, f"{len(mismatches)} value mismatches; first 3: {mismatches[:3]}"

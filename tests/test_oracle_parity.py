"""The local mirror of the driver's t2 correctness gate: every
``queries()`` entry must exactly match its ``oracle_sql()`` DuckDB
result (columns, row count, order-insensitive values) on the testdata.

Run with SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full
driver-scale check (default sf0.001 for speed).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR, compare_spark_duckdb

QUERY_NAMES = sorted(entrymod.queries().keys())


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        # Weaker rows-only check (driver does the same for oracle-less ops).
        assert sdf.count() >= 0
        return
    compare_spark_duckdb(sdf, ddb, sql)

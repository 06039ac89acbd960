"""The oracle dialect must stay DuckDB-version-hardened (round 10):
no DECIMAL-typed result columns, no integer-numerator bare-decimal-
literal divisions, no bracket list-index sugar — the three construct
classes whose typing/semantics have churned between DuckDB releases
(tools/dialect_audit.py documents each).  DuckDB-only: no Spark
session needed."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_oracle_dialect_clean():
    from tools.dialect_audit import main

    assert main(SF_DIR) == 0

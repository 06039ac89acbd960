"""The oracle dialect must stay DuckDB-version- AND fetch-path-
hardened (round 10, extended round 11): every oracle result column
must be a fetch-stable type (BOOLEAN/INTEGER/BIGINT/DOUBLE/VARCHAR/
TIMESTAMP, plus the driver-proven FLOAT — DATE is deliberately
excluded, see test_date_pandas_fetch_mechanism), no integer-numerator
bare-decimal-literal divisions, no bracket list-index sugar on
expressions — the construct classes whose typing/semantics churn
between DuckDB releases or whose fetch canonicalization diverges
between ``fetchall`` and the pandas/Arrow paths
(tools/dialect_audit.py documents each).  DuckDB-only: no Spark
session needed."""

from __future__ import annotations

import duckdb

from tests.conftest import SF_DIR

# The 8 oracle emissions the r10 verdict pinned as HUGEINT-typed (the
# root cause of every driver-red row in rounds 7-10), now CAST AS
# BIGINT: (query, column) pairs the pandas-path regression locks.
_FIXED_INT_EMISSIONS = [
    ("label_vote", "n_votes"),
    ("retrieval_hits", "n_hits"),
    ("retrieval_metrics", "n_hits"),
    ("annotate_panel", "n"),
    ("dedup_rewrite", "chars_cut"),
    ("pack_sequences", "n_tokens"),
    ("sql_market_share", "nation_cents"),
    ("sql_market_share", "total_cents"),
    ("suffix_gate", "dup_chars"),
]

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _con():
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def test_oracle_dialect_clean():
    from tools.dialect_audit import main

    assert main(SF_DIR) == 0


def test_hugeint_pandas_fetch_mechanism():
    """The r7-r10 driver-red mechanism, reproduced and its fix locked:
    DuckDB ``sum(INTEGER)`` promotes to HUGEINT, which the pandas
    fetch path maps to float64 (59 -> 59.0 — a different canonical
    hash than Spark's LONG 59); ``CAST(... AS BIGINT)`` lands int64."""
    df = (
        duckdb.connect()
        .execute(
            "SELECT sum(x) AS h, CAST(sum(x) AS BIGINT) AS b "
            "FROM (SELECT 59 AS x)"
        )
        .fetchdf()
    )
    assert str(df.dtypes["h"]) == "float64"  # the red mechanism
    assert str(df.dtypes["b"]) == "int64"  # the fix
    assert df.iloc[0]["h"] == 59.0 and df.iloc[0]["b"] == 59


def test_fixed_emissions_fetch_integer_on_pandas_path():
    """Each formerly-HUGEINT oracle emission now reaches pandas as an
    integer dtype — the exact surface the driver hashes."""
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    con = _con()
    for name, col in _FIXED_INT_EMISSIONS:
        df = con.execute(
            f"SELECT * FROM ({oracles[name]}) LIMIT 5"
        ).fetchdf()
        assert str(df.dtypes[col]).startswith("int"), (
            name,
            col,
            df.dtypes[col],
        )


def test_date_pandas_fetch_mechanism():
    """Why DATE is absent from the result-type whitelist: DuckDB's
    pandas path promotes DATE to a datetime64 midnight timestamp while
    Spark fetches datetime.date objects — isoformat '2000-11-30' vs
    '2000-11-30T00:00:00', the HUGEINT asymmetry again.  (The two
    former DATE emissions now produce 'yyyy-MM-dd' VARCHAR.)"""
    df = (
        duckdb.connect()
        .execute("SELECT DATE '2000-11-30' AS d")
        .fetchdf()
    )
    assert str(df.dtypes["d"]).startswith("datetime64")  # the asymmetry
    assert "T00:00:00" in df.iloc[0]["d"].isoformat()


def test_compatible_kind_matrix():
    """fetch_dtype_audit's kind-compatibility rules: int/float passes
    only under genuine NULL promotion (NaN present on the float side),
    never for a NaN-free float — the HUGEINT signature."""
    from tools.fetch_dtype_audit import _compatible

    assert _compatible(("i", False), ("i", False))
    assert _compatible(("i", False), ("u", False))
    assert _compatible(("i", False), ("f", True))  # NULL promotion
    assert not _compatible(("i", False), ("f", False))  # HUGEINT class
    assert not _compatible(("O", False), ("M", False))  # DATE class
    assert _compatible(("b", False), ("O", False))


def test_fixed_emissions_fit_bigint():
    """MAX() probe (r10 verdict task 1): every fixed emission fits
    BIGINT with >= 6 orders of magnitude of headroom at this SF, so
    the CAST cannot overflow even at a 10^6x scale-up of the additive
    counters."""
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    con = _con()
    headroom = 2**63 // 10**6
    for name, col in _FIXED_INT_EMISSIONS:
        mx = con.execute(
            f'SELECT max(abs("{col}")) FROM ({oracles[name]})'
        ).fetchone()[0]
        assert mx is not None and int(mx) < headroom, (name, col, mx)

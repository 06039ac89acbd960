"""DuckDB-dialect audit over every oracle (round-10, VERDICT r9
task 3 made repeatable): the driver's DuckDB build is unknown and
newer releases have churned decimal/division typing — so the oracle
dialect must avoid constructs whose RESULT TYPE or semantics are
version-dependent.  Three checks:

1. **Result-type audit** (dynamic): ``DESCRIBE`` every oracle under
   the local DuckDB and flag any DECIMAL-typed result column.  A
   DECIMAL fetches as ``decimal.Decimal`` whose canonical string
   ('0.250000') differs from the double the engine emits ('0.25') —
   the singleton class that shadowed `retrieval_metrics` in r8/r9.
   HUGEINT/BIGINT/INT all fetch as Python int (safe); DOUBLE as float
   (safe).  Target: ZERO decimal-typed oracle columns repo-wide.

2. **Bare decimal-literal division** (static): ``x / 1000000.0`` —
   the literal parses as DECIMAL(8,1); `any / DECIMAL` yields DOUBLE
   in 1.0.0 but decimal-division typing is a churn area.  All four
   shared kernels pin ``CAST(n AS DOUBLE)`` since round 10.  A site
   whose numerator is already DOUBLE (an explicit ``AS DOUBLE`` cast
   or a float-returning function: ln/exp/sin/cos/pi/sqrt/...) is
   float-contagion-safe in every release — ``DOUBLE op DECIMAL →
   DOUBLE`` always — and is counted but not flagged.  Only
   INTEGER-typed numerators over a bare decimal literal flag.

3. **Bracket list indexing** (static): ``(list)[i]`` sugar — edge
   semantics shifted between releases; ``list_extract`` is the
   stable named form.

Run:  python tools/dialect_audit.py          # exit 0 = clean
Round 10 rewrote every hit, so the baseline is 0/0/0;
_ALLOWED_DIVISION_QUERIES exists for a future deliberate exception
(document the driver-green evidence in the entry's comment if used).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Driver-green (CORRECTNESS_r01..r09) or locally-green-since-introduction
# queries whose oracle still divides by a bare decimal literal.  These are
# empirical evidence the construct matches on the driver's build; new
# queries must use _ratio_sql/_mean_sql/_rsum_sql/_rowmean_sql instead.
_ALLOWED_DIVISION_QUERIES: set[str] = set()


def main(sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    oracles = entrymod.oracle_sql()
    decimal_cols: list[tuple[str, str, str]] = []
    bare_div: list[tuple[str, str]] = []
    bracket_idx: list[tuple[str, str]] = []

    div_re = re.compile(r"/\s*\d+\.\d")
    float_ctx_re = re.compile(
        r"AS DOUBLE\)|:: *DOUBLE|pi\(\)|\bln\(|\bexp\(|\bsin\(|\bcos\(|"
        r"\bsqrt\(|\blog\(|\blog2\(|\bquantile_cont\(|\d\.\d"
    )
    # bracket indexing: ")[ident]" or "][..." — a close-paren or
    # close-bracket immediately followed by an index open-bracket
    idx_re = re.compile(r"[\)\]]\s*\[\s*[A-Za-z0-9_]")

    for name in sorted(oracles):
        sql = oracles[name]
        try:
            desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: DESCRIBE FAILED: {e}")
            return 2
        for col, typ, *_ in desc:
            if typ.upper().startswith("DECIMAL"):
                decimal_cols.append((name, col, typ))
        for m in div_re.finditer(sql):
            lookback = sql[max(0, m.start() - 120): m.start()]
            if float_ctx_re.search(lookback):
                continue  # DOUBLE numerator: float contagion pins the type
            if name not in _ALLOWED_DIVISION_QUERIES:
                frag = sql[max(0, m.start() - 40): m.end() + 8]
                bare_div.append((name, " ".join(frag.split())))
        for m in idx_re.finditer(sql):
            frag = sql[max(0, m.start() - 30): m.end() + 12]
            bracket_idx.append((name, " ".join(frag.split())))

    print(f"oracles audited: {len(oracles)}")
    print(f"DECIMAL-typed result columns: {len(decimal_cols)}")
    for name, col, typ in decimal_cols:
        print(f"  {name}.{col}: {typ}")
    print(f"bare decimal-literal divisions (non-grandfathered): {len(bare_div)}")
    for name, frag in bare_div[:40]:
        print(f"  {name}: ...{frag}...")
    print(f"bracket list-index sites: {len(bracket_idx)}")
    for name, frag in bracket_idx[:40]:
        print(f"  {name}: ...{frag}...")
    return 1 if decimal_cols or bare_div or bracket_idx else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))

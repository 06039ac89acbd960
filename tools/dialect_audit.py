"""DuckDB-dialect audit over every oracle (round-10, extended in
round 11 per the r10 verdict): the driver's DuckDB build AND its
fetch path are unknown — newer releases have churned decimal/division
typing, and the driver's fetch canonicalization maps wide/exotic
result types to different Python values than ``fetchall`` does
(measured here: ``fetchdf`` maps HUGEINT -> float64, so an oracle
emitting HUGEINT ``118`` hashes as ``118.0`` against Spark's LONG
``118`` — the root cause of every driver-red row in rounds 7-10).
Three checks:

1. **Result-type whitelist** (dynamic): ``DESCRIBE`` every oracle
   under the local DuckDB and flag any result column whose type is
   outside the fetch-stable set

       BOOLEAN, INTEGER, BIGINT, DOUBLE, VARCHAR, DATE, TIMESTAMP,
       FLOAT

   Each allowed type fetches to the same canonical Python value on
   both the ``fetchall`` and the pandas/Arrow paths (BIGINT/INTEGER
   -> int, DOUBLE -> float, VARCHAR -> str, BOOLEAN -> bool,
   DATE/TIMESTAMP -> datetime; FLOAT is driver-PROVEN green —
   `kv_register_image`/`e1_flagship`/`register_image` hashed green in
   CORRECTNESS_r02..r10).  Everything else is forbidden: DECIMAL
   fetches as ``decimal.Decimal`` (the r8/r9 `retrieval_metrics`
   shadow), HUGEINT/UHUGEINT as float64/Decimal (the r7-r10 reds),
   TINYINT/SMALLINT as numpy int8/int16 (unproven), and LIST types as
   numpy arrays whose ``str()`` ("[1.5 2.5]") differs from a Python
   list's ("[1.5, 2.5]").  Target: ZERO non-whitelisted result
   columns repo-wide — SUM over integers must be wrapped in
   ``CAST(... AS BIGINT)``; array emissions explode to scalar rows or
   join to VARCHAR.

2. **Bare decimal-literal division** (static): ``x / 1000000.0`` —
   the literal parses as DECIMAL(8,1); `any / DECIMAL` yields DOUBLE
   in 1.0.0 but decimal-division typing is a churn area.  All shared
   kernels pin ``CAST(n AS DOUBLE)`` since round 10.  A site whose
   numerator is already DOUBLE (an explicit ``AS DOUBLE`` cast or a
   float-returning function: ln/exp/sin/cos/pi/sqrt/...) is
   float-contagion-safe in every release — ``DOUBLE op DECIMAL →
   DOUBLE`` always — and is counted but not flagged.  Round 11
   (ADVICE): the float-context lookback no longer accepts a bare
   ``\\d.\\d`` anywhere in the 120-char window (any unrelated float
   literal used to mask genuine hits); a decimal-literal numerator
   IMMEDIATELY before the slash (``0.5 / 100.0`` — DECIMAL/DECIMAL,
   exact in every release for these one-digit scales) is recognized
   by a tight numerator-anchored pattern instead.

3. **Bracket list indexing on expressions** (static): ``(expr)[i]``
   sugar — edge semantics shifted between releases; ``list_extract``
   is the stable named form.  (Plain column indexing ``embedding[i]``
   with a positive literal/series index has been driver-green since
   round 2 and is not flagged.)

Run:  python tools/dialect_audit.py          # exit 0 = clean
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

# Fetch-stable result types: identical canonical Python values on the
# fetchall AND pandas/Arrow fetch paths.  FLOAT rides on direct driver
# evidence (green reg_value hashes, CORRECTNESS_r02..r10).  DATE is
# deliberately ABSENT: Spark fetches dates as datetime.date objects
# ('2000-11-30') while DuckDB's pandas path yields datetime64 midnight
# timestamps ('2000-11-30 00:00:00') — asymmetric canonicalization,
# the HUGEINT class again (tools/fetch_dtype_audit.py found the two
# sites; both now emit 'yyyy-MM-dd' VARCHAR).  TIMESTAMP is symmetric:
# both paths yield datetime-kind values with identical isoformat.
ALLOWED_RESULT_TYPES = {
    "BOOLEAN",
    "INTEGER",
    "BIGINT",
    "DOUBLE",
    "VARCHAR",
    "TIMESTAMP",
    "FLOAT",
}

# Driver-green (CORRECTNESS_r01..r10) or locally-green-since-introduction
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
    bad_cols: list[tuple[str, str, str]] = []
    bare_div: list[tuple[str, str]] = []
    bracket_idx: list[tuple[str, str]] = []

    div_re = re.compile(r"/\s*\d+\.\d")
    # A numerator that pins the division to DOUBLE (or to exact
    # DECIMAL/DECIMAL semantics) must sit IMMEDIATELY before the
    # slash: an explicit cast close-paren, a float-function call's
    # close-paren, or a decimal literal.  (Round 11: the old lookback
    # accepted any `\d.\d` within 120 chars, so an unrelated float
    # literal nearby masked genuine integer/DECIMAL hits.)
    # epoch() returns DOUBLE (fractional seconds) — float-returning.
    float_fn_name_re = re.compile(
        r"\b(ln|exp|sin|cos|sqrt|log|log2|quantile_cont|pi|radians|"
        r"degrees|atan2?|tan|epoch)\s*$",
        re.IGNORECASE,
    )
    float_inside_re = re.compile(
        r"AS DOUBLE|AS FLOAT|:: *DOUBLE|\d\.\d|"
        r"\b(ln|exp|sin|cos|sqrt|log|log2|quantile_cont|pi|epoch)\s*\(",
        re.IGNORECASE,
    )

    def numerator_is_float(lookback: str) -> bool:
        """True when the expression immediately left of the slash is
        provably DOUBLE (float contagion pins the division's type in
        every DuckDB release) or itself a decimal literal (DECIMAL/
        DECIMAL — exact at these scales).  Bare identifiers and plain
        integer groups return False: their runtime type is invisible
        statically, so the site must carry an explicit cast."""
        tail = lookback.rstrip()
        if re.search(r"\d\.\d+\s*$", tail):  # decimal-literal numerator
            return True
        if not tail.endswith(")"):
            return False
        depth, i = 0, len(tail) - 1
        while i >= 0:
            if tail[i] == ")":
                depth += 1
            elif tail[i] == "(":
                depth -= 1
                if depth == 0:
                    break
            i -= 1
        if i < 0:  # unbalanced (lookback window clipped) — be strict
            return False
        group = tail[i:]
        prefix = tail[:i]
        return bool(
            float_fn_name_re.search(prefix)
            or float_inside_re.search(group)
        )
    # bracket indexing on an expression: ")[ident]" or "][..." — a
    # close-paren or close-bracket immediately followed by an index
    # open-bracket
    idx_re = re.compile(r"[\)\]]\s*\[\s*[A-Za-z0-9_]")

    for name in sorted(oracles):
        sql = oracles[name]
        try:
            desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: DESCRIBE FAILED: {e}")
            return 2
        for col, typ, *_ in desc:
            if typ.upper() not in ALLOWED_RESULT_TYPES:
                bad_cols.append((name, col, typ))
        for m in div_re.finditer(sql):
            # wide window: plane-literal arrays put >1500 chars between
            # the numerator's open paren and the slash
            lookback = sql[max(0, m.start() - 4000): m.start()]
            if numerator_is_float(lookback):
                continue
            if name not in _ALLOWED_DIVISION_QUERIES:
                frag = sql[max(0, m.start() - 40): m.end() + 8]
                bare_div.append((name, " ".join(frag.split())))
        for m in idx_re.finditer(sql):
            frag = sql[max(0, m.start() - 30): m.end() + 12]
            bracket_idx.append((name, " ".join(frag.split())))

    print(f"oracles audited: {len(oracles)}")
    print(f"non-whitelisted result columns: {len(bad_cols)}")
    for name, col, typ in bad_cols:
        print(f"  {name}.{col}: {typ}")
    print(f"bare decimal-literal divisions (non-grandfathered): {len(bare_div)}")
    for name, frag in bare_div[:40]:
        print(f"  {name}: ...{frag}...")
    print(f"bracket list-index sites: {len(bracket_idx)}")
    for name, frag in bracket_idx[:40]:
        print(f"  {name}: ...{frag}...")
    return 1 if bad_cols or bare_div or bracket_idx else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))

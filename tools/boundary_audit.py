"""Rounding-boundary linter (round-9, VERDICT task 3).

The round-8 driver flip: Fleiss ``p_e = 500059/2000000 = 0.2500295``
terminates EXACTLY on the ``round(·, 6)`` half-boundary, so Spark's
BigDecimal HALF_UP and the driver DuckDB build's float rounding
disagreed on the last digit — locally green for two rounds because the
local DuckDB happened to round the same way.  Any emitted metric that
is ``round(double)`` of a ratio of integers can land on a boundary
like this; the only local signal is the PRE-ROUND value's distance to
the boundary.

This tool recomputes every pre-round value: it rewrites each
outermost ``round(X[, d])`` call site in every oracle into a guarded
probe

    CASE WHEN abs(abs(X * 10^d) % 1 - 0.5) < 1e-9
         THEN error('BNDRY <value>')
         ELSE round(X, d) END

and runs the rewritten oracle in DuckDB.  A ``BNDRY`` hit means a
round() input sits within 1e-9 of its half-boundary — an
engine-dependent rounding waiting to flip the driver gate.  Because
engine and oracle mirror each other's arithmetic, probing the oracle
side covers both (the boundary is a property of the VALUE).

Run:  python tools/boundary_audit.py [sf_dir] [name1,name2,...]
Exit 0 = no boundary hits (probe-rewrite failures are reported but
non-fatal: a handful of oracles use round() in contexts the textual
rewrite cannot guard — they are listed so the residue is explicit).

Nested rounds: only the OUTERMOST call of a nested chain is guarded
(overlapping textual rewrites would corrupt the SQL); inner 12-digit
quantization basins are separately covered by the determinism audit.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

THRESHOLD = "1e-9"


def find_round_sites(sql: str) -> list[tuple[int, int, str, str | None]]:
    """Outermost ``round(...)`` call sites as (start, end, arg, digits);
    string literals are skipped, word-prefix matches (``lround`` or
    ``x_round``) are not sites."""
    out: list[tuple[int, int, str, str | None]] = []
    i, n = 0, len(sql)
    while True:
        j = sql.find("round(", i)
        if j < 0:
            break
        if j > 0 and (sql[j - 1].isalnum() or sql[j - 1] == "_"):
            i = j + 6
            continue
        depth, k = 1, j + 6
        top_commas: list[int] = []
        while k < n and depth:
            c = sql[k]
            if c == "'":
                k += 1
                while k < n and sql[k] != "'":
                    k += 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            elif c == "," and depth == 1:
                top_commas.append(k)
            k += 1
        if depth:  # unbalanced — malformed; bail out of this site
            break
        end = k + 1
        inner = sql[j + 6 : end - 1]
        if not top_commas:
            out.append((j, end, inner, None))
        elif len(top_commas) == 1:
            cut = top_commas[0] - (j + 6)
            out.append((j, end, inner[:cut], inner[cut + 1 :]))
        i = end  # skip past the whole call: outermost sites only
    return out


def probe_sql(sql: str) -> tuple[str, int]:
    """Rewrite every outermost round() site into the boundary guard;
    returns (rewritten_sql, n_sites)."""
    sites = find_round_sites(sql)
    for start, end, x, d in reversed(sites):
        dd = d if d is not None else "0"
        original = sql[start:end]
        guard = (
            f"(CASE WHEN ({x}) IS NOT NULL AND"
            f" abs(abs(({x}) * power(10, {dd})) % 1 - 0.5) < {THRESHOLD}"
            f" THEN error('BNDRY value=' || CAST(({x}) AS VARCHAR)"
            f" || ' digits=' || CAST(({dd}) AS VARCHAR))"
            f" ELSE {original} END)"
        )
        sql = sql[:start] + guard + sql[end:]
    return sql, len(sites)


def main(sf_dir: str, only: set[str] | None = None) -> int:
    con = duckdb.connect()
    # Deterministic verdicts: parallel float aggregation is summation-
    # order-dependent across runs, so a probed value sitting ~1e-21
    # from a boundary (ds_labels' M-step log, found in round 9) flips
    # between HIT and clean with the thread schedule.  Single-threaded
    # execution pins ONE summation order — the audit's verdict is then
    # a pure function of (code, data).
    con.execute("SET threads TO 1")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    oracles = entrymod.oracle_sql()
    hits: list[tuple[str, str]] = []
    broken: list[tuple[str, str]] = []
    clean = 0
    total_sites = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        probed, n_sites = probe_sql(oracles[name])
        total_sites += n_sites
        if n_sites == 0:
            clean += 1
            print(f"{name}: no round() sites")
            continue
        try:
            con.execute(probed).fetchall()
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            if "BNDRY" in msg:
                hits.append((name, msg.splitlines()[0][:200]))
                print(f"{name}: BOUNDARY HIT — {msg.splitlines()[0][:160]}")
            else:
                broken.append((name, msg.splitlines()[0][:200]))
                print(f"{name}: probe-rewrite failed ({n_sites} sites) — "
                      f"{msg.splitlines()[0][:120]}")
            continue
        clean += 1
        print(f"{name}: clean ({n_sites} sites probed)")
    print(
        f"\n{clean} clean, {len(hits)} boundary hits, "
        f"{len(broken)} unprobeable, {total_sites} round() sites total"
    )
    if broken:
        print("UNPROBEABLE:", [n for n, _ in broken])
    if hits:
        print("BOUNDARY:", [n for n, _ in hits])
    return 1 if hits else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = (
        {s for s in sys.argv[2].split(",") if s}
        if len(sys.argv) > 2
        else None
    )
    sys.exit(main(sf, names))

"""Decode a driver CORRECTNESS_r*.json against the round-10 bisection
design (ROUND10.md task 1): the four diagnostic window rows carry the
localization bits for the r7-r9 never-green divergence.  Run this on
the next correctness artifact FIRST — it states which hypothesis
classes the verdict eliminates, so round 11 starts from conclusions,
not raw rows.

Run:  python tools/bisect_report.py CORRECTNESS_r10.json
"""

from __future__ import annotations

import json
import sys

DIAG = ("retrieval_hits", "retrieval_scores", "label_vote", "rater_agreement")


def verdict(row: dict | None) -> str:
    if row is None:
        return "ABSENT"
    if row.get("err"):
        return f"ERR({row['err']})"
    if not row.get("rows_match"):
        return "ROWS-RED"
    if not row.get("schema_match"):
        return "SCHEMA-RED"
    return "GREEN" if row.get("hash_match") else "HASH-RED"


def main(path: str) -> int:
    d = json.load(open(path))
    v = {name: verdict(d.get(name)) for name in DIAG}
    for name in DIAG:
        print(f"{name:18s} {v[name]}")
    reds = [n for n in DIAG if v[n] != "GREEN"]
    print()

    if any(val == "ABSENT" for val in v.values()):
        print(
            "artifact predates the round-10 window surgery (diagnostic "
            "rows absent) — no bisection information; run on the r10+ "
            "artifact."
        )
        return 0

    hits, scores = v["retrieval_hits"], v["retrieval_scores"]
    if hits == "GREEN" and scores == "GREEN":
        print(
            "retrieval: RESOLVED — the r7-r9 red was the float cosine "
            "ordering and/or the DECIMAL emission (both removed in r10)."
        )
    elif hits != "GREEN":
        print(
            "retrieval: divergence reaches the RANKING/MEMBERSHIP layer "
            "even under exact integer arithmetic — suspect the driver's "
            "DuckDB build evaluating the integer constructs (HUGEINT //, "
            "list_extract, generate_series) differently, or its hasher "
            "on BIGINT columns.  The emission-layer hypotheses are NOT "
            "yet separable; check retrieval_scores only after hits is "
            "green."
        )
    else:
        print(
            "retrieval: membership EXACT, divergence isolated to the "
            "final-division/emission layer (exact_ratio doubles) — "
            "suspect the driver's double canonicalization (repr vs "
            "round-trip, -0.0, NaN) or a DuckDB division-typing shift "
            "the DESCRIBE audit could not see locally."
        )

    lv, ra = v["label_vote"], v["rater_agreement"]
    if lv == "GREEN" and ra == "GREEN":
        print(
            "annotation: RESOLVED — the r8/r9 annotate_panel red was the "
            "panel union/cast layer (or a fixed construct), not the legs."
        )
    elif lv != "GREEN" and ra != "GREEN":
        print(
            "annotation: BOTH legs red — the divergence is below both "
            "(the shared _synthetic_votes fixture or a construct both "
            "use: %, generate_series, the integer-ratio kernel)."
        )
    elif lv != "GREEN":
        print(
            "annotation: vote leg red, kappa leg green — suspect the "
            "majority/tie-break window or the single agreement ratio; "
            "the kappa/Fleiss integer kernels are exonerated."
        )
    else:
        print(
            "annotation: kappa leg red, vote leg green — the vote "
            "fixture and ratio kernel are exonerated; suspect the "
            "Cohen/Fleiss emission chain (pe_t join, HUGEINT "
            "quantization at 12/15 digits, the kappa CASE)."
        )

    print()
    print(f"diagnostic reds: {reds or 'none'}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_r10.json"))

"""Physical-plan audits (SURVEY §4): the machine-checkable version of
"did Catalyst do what we designed for?".

At 100 TB the difference between a broadcast-hash join and an
accidental sort-merge join, or between a pruned 2-column scan and a
full-width scan, is the whole game — these helpers make those
properties assertable in CI so a refactor can't silently regress them.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "simple") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_broadcast_join(df: DataFrame) -> bool:
    """True when the plan contains a BroadcastHashJoin (no shuffle of
    the probe side)."""
    return "BroadcastHashJoin" in explain_str(df)


def has_shuffle(df: DataFrame) -> bool:
    """True when the plan contains a data shuffle (hash/range exchange;
    broadcast exchanges don't count — they move only the small side)."""
    return count_shuffles(df) > 0


def count_shuffles(df: DataFrame) -> int:
    """Number of hash/range-partitioned exchanges (broadcast exchanges
    excluded — those move only the small side)."""
    plan = explain_str(df)
    return len(re.findall(r"Exchange (?:hash|range)partitioning", plan))


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every file scan in the plan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", explain_str(df))


def scan_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column names in each scan's ReadSchema (projection-pruning audit)."""
    out = []
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", explain_str(df)):
        cols = [c.split(":")[0].strip() for c in m.split(",") if c.strip()]
        out.append(cols)
    return out


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider = more of the plan is
    fused JVM code).  The "formatted" explain names the spans; simple
    mode only shows per-node ``*(n)`` markers, which under-reports."""
    spans = set(
        re.findall(
            r"WholeStageCodegen \((\d+)\)", explain_str(df, "formatted")
        )
    )
    if spans:
        return len(spans)
    # AQE hides codegen pre-execution; the codegen explain still counts.
    m = re.search(
        r"Found (\d+) WholeStageCodegen subtrees",
        explain_str(df, "codegen"),
    )
    return int(m.group(1)) if m else 0

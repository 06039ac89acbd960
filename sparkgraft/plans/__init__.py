"""Plan-inspection helpers used by tests and scale tuning."""

from sparkgraft.plans.audit import (
    explain_str,
    has_broadcast_join,
    has_shuffle,
    pushed_filters,
    scan_schema_columns,
    whole_stage_codegen_spans,
)

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "has_shuffle",
    "pushed_filters",
    "scan_schema_columns",
    "whole_stage_codegen_spans",
]

"""Scalar column-expression layer (SURVEY §2.8) + text/vector helpers."""

from sparkgraft.functions.expr import (
    comma_decimal,
    content_id,
    filename_timestamp,
    is_10min_aligned,
    ole_to_timestamp,
    relative_time,
    round_stats,
    sanitize_channel,
    size_health_flag,
    sql_ident,
    time_parts,
    timestamp_to_ole,
    window_end_berlin,
)

__all__ = [
    "comma_decimal",
    "content_id",
    "filename_timestamp",
    "is_10min_aligned",
    "ole_to_timestamp",
    "relative_time",
    "round_stats",
    "sanitize_channel",
    "size_health_flag",
    "sql_ident",
    "time_parts",
    "timestamp_to_ole",
    "window_end_berlin",
]

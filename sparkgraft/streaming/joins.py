"""Stream-stream joins (Structured Streaming).

The batch engine's interval/as-of joins (``operators.relational``)
re-expressed for unbounded inputs: both sides carry watermarks, the
join condition bounds event-time distance, and Spark sizes the join
state from exactly those two facts — rows older than
``watermark + upper bound`` are evicted, so state tracks rate x
horizon, not history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join_streams"]


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "1 hour",
    lower_sec: int = 0,
    upper_sec: int = 1800,
) -> DataFrame:
    """Inner-join two streams on ``key`` where the right event lands in
    ``[left_ts + lower_sec, left_ts + upper_sec]`` — the streaming form
    of a bounded-range correlation (view→purchase attribution, probe→
    response pairing).

    Both inputs MUST have distinct column names apart from ``key``.
    The watermarks plus the two-sided time bound are what make the join
    state finite: without the upper bound Spark would have to keep
    every left row forever.  Scale: state is partitioned by ``key``
    (one shuffle per side), eviction is per-watermark — the standard
    production shape for unbounded correlation.
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (F.col(right_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower_sec} SECOND"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper_sec} SECOND"))
    )
    return l.join(r, cond, "inner").drop(r[key])

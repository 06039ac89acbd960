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

__all__ = ["interval_join_streams", "alarm_correlation_streams"]


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


def alarm_correlation_streams(
    alarms: DataFrame,
    files: DataFrame,
    reports: DataFrame,
    key: str,
    alarm_ts: str = "alarm_ts",
    file_ts: str = "file_ts",
    report_ts: str = "report_ts",
    file_window: tuple[int, int] = (0, 240),
    report_window: tuple[int, int] = (0, 840),
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming alarm correlation — the full J2 flow from the
    reference's alarm chain (``conv/scripts/udbf_file_analysis.py:
    94-154``): an alarm (1 Hz file whose ``*_GAL``/``_RAL`` channel
    fired) waits a bounded time for its same-basename 100 Hz data
    file AND for the end-of-window report named +10 min in Berlin
    time (the Allsat CSV), copying whatever arrived when the wait
    expires.

    Re-expressed Spark-first: two chained LEFT OUTER stream-stream
    joins, each bounded to ``[alarm_ts + lower, alarm_ts + upper]``.
    The watermark is the arrival timeout — correlates inside the
    window join as they arrive; once the watermark passes
    ``alarm_ts + upper`` the alarm emits anyway with NULL correlate
    columns, which IS the reference's wait-expired dead-letter (the
    ``status`` column classifies: paired / file_only / report_only /
    dead_letter).  State is bounded by rate x window per side —
    nothing waits forever, nothing is dropped silently.

    All three inputs must share only the ``key`` column name.  Emits
    in append mode; chained stream-stream outer joins require Spark
    3.5+ (multiple stateful operators).
    """
    a = alarms.withWatermark(alarm_ts, watermark)
    f = files.withWatermark(file_ts, watermark)
    r = reports.withWatermark(report_ts, watermark)

    def _bound(ts_col: str, lo: int, hi: int):
        return (
            (F.col(ts_col) >= F.col(alarm_ts) + F.expr(f"INTERVAL {lo} SECOND"))
            & (F.col(ts_col) <= F.col(alarm_ts) + F.expr(f"INTERVAL {hi} SECOND"))
        )

    j1 = a.join(
        f,
        (a[key] == f[key]) & _bound(file_ts, *file_window),
        "leftOuter",
    ).drop(f[key])
    # The joined frame carries TWO event-time columns (both sides were
    # watermarked); a second stateful operator allows at most one.
    # Re-deriving file_ts through arithmetic strips its event-time tag
    # while keeping the value — alarm_ts stays the stream's clock.
    j1 = j1.withColumn(file_ts, F.col(file_ts) + F.expr("INTERVAL 0 SECOND"))
    j2 = j1.join(
        r,
        (j1[key] == r[key]) & _bound(report_ts, *report_window),
        "leftOuter",
    ).drop(r[key])
    has_f = F.col(file_ts).isNotNull()
    has_r = F.col(report_ts).isNotNull()
    return j2.withColumn(
        "status",
        F.when(has_f & has_r, F.lit("paired"))
        .when(has_f, F.lit("file_only"))
        .when(has_r, F.lit("report_only"))
        .otherwise(F.lit("dead_letter")),
    )

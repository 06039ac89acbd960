"""Alert lifecycle: cooldown suppression, escalation, recovery.

Engine analog of the reference's alerting flow — repeat-alarm retry
after a cooldown (``sevenio/main.py:28-31`` re-places the voice call
180 s after a non-answer), escalation while a condition persists (the
voice call fires only after the health flag stays unhealthy), and
clear-on-recovery (``README.txt:7-12``'s 0/1 health variables reset
per processed file; the legacy alarm chain
``conv/scripts/udbf_file_analysis.py:94-154`` triggers on per-file
channel maxima) — generalized to a keyed stream of batch-level alarm
evaluations.

Semantics (per key, evaluations ordered by a numeric ``ts``):

* consecutive alarming evaluations form a STREAK (gaps-and-islands);
* the first evaluation of a streak RAISEs;
* within a streak, time splits into ``cooldown``-sized buckets from
  the streak start; the first evaluation of each later bucket REPEATs
  (re-notify once per cooldown while the alarm persists — the grid
  form of the reference's fixed retry interval), every other alarming
  evaluation is SUPPRESSed;
* the evaluation at which a streak reaches ``escalate_after``
  consecutive alarms carries ``escalated = true`` (once per streak);
* the first healthy evaluation after a streak CLEARs (reporting the
  length of the streak it ended); other healthy evaluations emit
  nothing.

Everything is plain window functions over one hash partitioning by
key — no Python in the plan, and the input is the *evaluation* stream
(one row per key per batch/file — health flags, not fact rows), so
the operator is metadata-sized at any corpus scale.  The ``carry``
parameter seeds the fold with per-key state from earlier batches;
:func:`alert_monitor` (streaming/pipeline.py) uses it to make a
foreachBatch drain bit-identical to one batch run over the union of
all batches.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

CARRY_SCHEMA = (
    "in_streak boolean, streak_len0 long, streak_start0 long, "
    "prev_bucket0 long"
)


def _annotate(
    evals: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    alarm_col: str,
    cooldown: int,
    escalate_after: int,
    carry: DataFrame | None = None,
) -> DataFrame:
    """Full per-evaluation annotation (internal): every input row with
    ``action`` / ``streak_len`` / ``escalated`` / carry-out columns.
    ``(key, ts)`` must be unique — ts is the total order of the fold.
    """
    keys = list(key_cols)
    ts = F.col(ts_col).cast("long")
    alarm = F.col(alarm_col)

    df = evals.select(*keys, ts.alias("_ts"), alarm.alias("_alarm"))
    if carry is not None:
        # One row per previously-alarming key — broadcast by size.
        df = df.join(F.broadcast(carry), on=keys, how="left")
    else:
        for c, t in (
            ("in_streak", "boolean"),
            ("streak_len0", "long"),
            ("streak_start0", "long"),
            ("prev_bucket0", "long"),
        ):
            df = df.withColumn(c, F.lit(None).cast(t))

    w_key = Window.partitionBy(*keys).orderBy("_ts")
    w_flag = Window.partitionBy(*keys, "_alarm").orderBy("_ts")
    df = df.withColumn(
        "_grp", F.row_number().over(w_key) - F.row_number().over(w_flag)
    ).withColumn("_prev_alarm", F.lag("_alarm").over(w_key))

    w_isl = Window.partitionBy(*keys, "_alarm", "_grp").orderBy("_ts")
    w_isl_all = Window.partitionBy(*keys, "_alarm", "_grp")
    alarming = F.col("_alarm")
    # A streak continues the carried one iff it is the key's FIRST
    # island and starts at the key's first row (grp == 0).
    continuing = (
        alarming & (F.col("_grp") == 0) & F.coalesce("in_streak", F.lit(False))
    )
    pos = F.when(alarming, F.row_number().over(w_isl))
    df = (
        df.withColumn("_continuing", continuing)
        .withColumn(
            "_len",
            pos
            + F.when(F.col("_continuing"), F.col("streak_len0")).otherwise(
                F.lit(0)
            ),
        )
        .withColumn(
            "_start",
            F.when(F.col("_continuing"), F.col("streak_start0")).otherwise(
                F.min("_ts").over(w_isl_all)
            ),
        )
    )
    # ts >= _start always, so integral `div` == floor on both engines.
    df = df.withColumn(
        "_bucket",
        F.when(
            alarming,
            F.call_function(
                "div", F.col("_ts") - F.col("_start"), F.lit(cooldown)
            ),
        ),
    )
    prev_bucket = F.when(
        F.row_number().over(w_isl) == 1,
        F.when(F.col("_continuing"), F.col("prev_bucket0")),
    ).otherwise(F.lag("_bucket").over(w_isl))
    action = (
        F.when(
            alarming,
            F.when(F.col("_len") == 1, F.lit("raise"))
            .when(F.col("_bucket") > F.coalesce(prev_bucket, F.lit(-1)), F.lit("repeat"))
            .otherwise(F.lit("suppress")),
        )
        .when(
            (~alarming)
            & F.coalesce(
                F.col("_prev_alarm"), F.col("in_streak"), F.lit(False)
            ),
            F.lit("clear"),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    ended_len = F.when(
        F.col("_prev_alarm").isNull(), F.col("streak_len0")
    ).otherwise(F.lag("_len").over(w_key))
    return (
        df.withColumn("action", action)
        .withColumn(
            "streak_len",
            F.when(alarming, F.col("_len"))
            .when(F.col("action") == "clear", ended_len)
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .withColumn(
            "escalated",
            F.coalesce(F.col("_len") == F.lit(escalate_after), F.lit(False)),
        )
    )


def alert_lifecycle(
    evals: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    alarm_col: str,
    cooldown: int,
    escalate_after: int,
    carry: DataFrame | None = None,
) -> DataFrame:
    """Alert events from a keyed alarm-evaluation stream: rows with
    ``action`` in {raise, repeat, suppress, clear} plus ``streak_len``
    (running for alarming rows, the ended streak's length on clear)
    and ``escalated`` (true exactly once per streak reaching
    ``escalate_after``).  Healthy rows that clear nothing are dropped.

    ``carry`` (schema :data:`CARRY_SCHEMA` plus the key columns) seeds
    per-key state so batched drains replay the identical fold — see
    :func:`sparkgraft.streaming.pipeline.alert_monitor`.
    """
    ann = _annotate(
        evals, key_cols, ts_col, alarm_col, cooldown, escalate_after, carry
    )
    return ann.filter(F.col("action").isNotNull()).select(
        *key_cols,
        F.col("_ts").alias(ts_col),
        "action",
        "streak_len",
        "escalated",
    )


def alert_carry_out(
    ann: DataFrame, key_cols: Sequence[str], prev_carry: DataFrame | None
) -> DataFrame:
    """Per-key carry state after a batch annotated by :func:`_annotate`:
    the last evaluation decides — an alarming tail row carries its
    streak forward, a healthy tail row resets the key.  Keys absent
    from the batch keep their ``prev_carry`` row unchanged."""
    keys = list(key_cols)
    w_last = Window.partitionBy(*keys).orderBy(F.col("_ts").desc())
    out = (
        ann.withColumn("_rn", F.row_number().over(w_last))
        .filter(F.col("_rn") == 1)
        .select(
            *keys,
            F.col("_alarm").alias("in_streak"),
            F.when(F.col("_alarm"), F.col("_len"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("streak_len0"),
            F.when(F.col("_alarm"), F.col("_start"))
            .cast("long")
            .alias("streak_start0"),
            F.when(F.col("_alarm"), F.col("_bucket"))
            .cast("long")
            .alias("prev_bucket0"),
        )
    )
    if prev_carry is not None:
        kept = prev_carry.join(out.select(*keys), on=keys, how="left_anti")
        out = out.unionByName(kept)
    return out

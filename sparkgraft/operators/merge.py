"""Upsert / slowly-changing-dimension operators.

Spark without a lakehouse format has no ``MERGE INTO``; these are the
standard emulations (anti-join + union + window) that stay pure
DataFrame.  At 100 TB the rewrite cost is the table scan itself —
partition the target by a key prefix or date so a merge touches only
the affected partitions (see ``sinks.layout.write_partitioned``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame, updates: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """MERGE emulation: update rows win by key, unmatched target rows
    survive, unmatched update rows insert.  One broadcast-able anti
    join + union — no window needed when ``updates`` has unique keys.
    """
    keys = list(keys)
    untouched = target.join(updates, keys, "left_anti")
    return updates.unionByName(untouched)


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    effective_ts: Column,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """SCD type-2: close the current version of every updated key
    (``valid_to`` = effective ts) and append the new version
    (``valid_from`` = effective ts, open-ended).

    ``history`` rows with ``valid_to IS NULL`` are current; closed rows
    pass through untouched.  Three branches, one anti/semi join pair on
    the key — all broadcast-able when the update batch is small.
    """
    keys = list(keys)
    closed = history.filter(F.col(valid_to).isNotNull())
    current = history.filter(F.col(valid_to).isNull())
    unchanged_current = current.join(updates, keys, "left_anti")
    closed_now = current.join(
        updates.select(*keys), keys, "left_semi"
    ).withColumn(valid_to, effective_ts)
    new_versions = updates.withColumn(valid_from, effective_ts).withColumn(
        valid_to, F.lit(None).cast("timestamp")
    )
    return (
        closed.unionByName(unchanged_current)
        .unionByName(closed_now)
        .unionByName(new_versions)
    )

"""Custom stateful streaming operators (SURVEY §2.9: the reference's
TTL-expiring per-key state, T5, generalized).

``ewma_stream`` keeps one (ewma, count) state per channel across
micro-batches via ``applyInPandasWithState`` — the engine's template
for arbitrary keyed state (sketches, session windows, debouncers).
State lives in the state store (checkpointed, executor-local); a
processing-time timeout expires idle keys like the reference's Redis
TTL (udbf_file_analysis.py:18,82).

Scale: state is partitioned by key across executors (shuffle on the
group key only); each micro-batch touches only keys present in the
batch plus expiring ones.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "channel string, ewma double, n_samples long"
STATE_SCHEMA = "ewma double, n long"


def ewma_batch(pdf: pd.DataFrame, alpha: float, ts_col: str = "ts", value_col: str = "value") -> tuple[float, int]:
    """Reference fold used by both the streaming op and the tests."""
    s = pdf.sort_values(ts_col)[value_col]
    ewma = None
    for v in s:
        ewma = v if ewma is None else alpha * v + (1.0 - alpha) * ewma
    return float(ewma), int(len(s))


def ewma_stream(
    grouped_stream: DataFrame,
    alpha: float,
    key_col: str = "channel",
    ts_col: str = "ts",
    value_col: str = "value",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key exponentially-weighted moving average over a stream.

    Emits one row per key per micro-batch with the updated EWMA and the
    cumulative sample count.  ``ttl_ms`` expires idle keys (state is
    dropped, the next arrival starts fresh) — the T5 TTL semantic kept
    *inside* the engine instead of the sink.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        ewma, n = state.get if state.exists else (None, 0)
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
        for v in batch[value_col]:
            ewma = v if ewma is None else alpha * v + (1.0 - alpha) * ewma
        n += len(batch)
        state.update((float(ewma), int(n)))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {"channel": [key[0]], "ewma": [float(ewma)], "n_samples": [int(n)]}
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return grouped_stream.groupBy(key_col).applyInPandasWithState(
        update, OUTPUT_SCHEMA, STATE_SCHEMA, "append", timeout
    )

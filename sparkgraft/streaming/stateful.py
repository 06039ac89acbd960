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


def ewma_stream_tws(
    grouped_stream: DataFrame,
    alpha: float,
    key_col: str = "channel",
    ts_col: str = "ts",
    value_col: str = "value",
    ttl_ms: int | None = None,
) -> DataFrame:
    """:func:`ewma_stream` on the ``transformWithStateInPandas`` API —
    the successor to ``applyInPandasWithState`` (SPARK-49564; explicit
    typed state handles, timers, composite state).  Output and state
    semantics are identical to :func:`ewma_stream` (equality-tested),
    future-proofing T5 as the old API deprecates.

    Requirements (both checked/raised here rather than failing deep in
    the stream): the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider`` — the default HDFS-backed
    provider does not support transformWithState), and ``protobuf``
    (the TWS driver-worker protocol imports ``google.protobuf``; absent
    from this container, so the call raises NotImplementedError at the
    exact import boundary, like the scipy/PIL-gated sinks).
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "transformWithStateInPandas needs protobuf (google.protobuf) "
            "for its driver-worker protocol; not installed in this "
            "container — use ewma_stream (applyInPandasWithState) instead"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    ts_name, val_name = ts_col, value_col

    class EwmaProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            if ttl_ms is not None:
                self._state = handle.getValueState("ewma", STATE_SCHEMA, ttl_ms)
            else:
                self._state = handle.getValueState("ewma", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            prev = self._state.get() if self._state.exists() else None
            ewma, n = prev if prev is not None else (None, 0)
            batch = pd.concat(list(rows), ignore_index=True).sort_values(ts_name)
            for v in batch[val_name]:
                ewma = v if ewma is None else alpha * v + (1.0 - alpha) * ewma
            n += len(batch)
            self._state.update((float(ewma), int(n)))
            yield pd.DataFrame(
                {"channel": [key[0]], "ewma": [float(ewma)], "n_samples": [int(n)]}
            )

        def close(self) -> None:
            pass

    return grouped_stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=EwmaProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )

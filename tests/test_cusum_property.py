"""Property test: the window-identity CUSUM equals the textbook
sequential recurrence on random multi-key series, any parameters."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from sparkgraft.operators.stats import MEAN_SCALE, cusum_changepoints

BASE = dt.datetime(2025, 1, 1)


def _reference(rows, k, h, baseline_n, digits):
    """Per-key textbook recurrence over (key, ts, id, value) rows."""
    ks, hs = round(k * MEAN_SCALE), round(h * MEAN_SCALE)
    by_key: dict = {}
    for key, ts, i, v in rows:
        by_key.setdefault(key, []).append((ts, i, v))
    expect = []
    for key, series in by_key.items():
        series.sort()
        xs = [round(v * MEAN_SCALE) for _, _, v in series]
        nb = min(len(xs), baseline_n)
        sb = sum(xs[:baseline_n])
        sp = sn = 0
        for (ts, i, v), x in zip(series, xs):
            sp = max(0, sp + (nb * x - sb - nb * ks))
            sn = max(0, sn + (sb - nb * x - nb * ks))
            up, down = sp > nb * hs, sn > nb * hs
            if up or down:
                s = sp if up else sn
                unit = nb * (MEAN_SCALE // 10**digits)
                stat = ((2 * s + unit) // (2 * unit)) / 10**digits
                expect.append((key, i, "up" if up else "down", stat))
    return sorted(expect)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=5000),
            st.floats(
                min_value=-50, max_value=50,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: (t[0], t[1]),
    ),
    st.floats(min_value=0.0, max_value=2.0, allow_nan=False),
    st.floats(min_value=0.5, max_value=20.0, allow_nan=False),
    st.integers(min_value=1, max_value=10),
)
def test_cusum_equals_sequential_reference(spark, raw, k, h, baseline_n):
    rows = [
        (key, BASE + dt.timedelta(seconds=sec), sec, float(v))
        for key, sec, v in raw
    ]
    df = spark.createDataFrame(
        rows, "key string, ts timestamp, event_id long, value double"
    )
    got = sorted(
        (r["key"], r["event_id"], r["side"], r["stat"])
        for r in cusum_changepoints(
            df, "key", "ts", "event_id", "value",
            k=k, h=h, baseline_n=baseline_n, digits=6,
        ).collect()
    )
    assert got == _reference(rows, k, h, baseline_n, 6)

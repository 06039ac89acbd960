"""Round-4 operator tests: Holt-Winters seasonal smoothing anchors and
MaxSim late-interaction scoring against a Python reference."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from sparkgraft.operators.similarity import maxsim_rerank
from sparkgraft.operators.timeseries import holt_forecast, holt_winters_forecast


def mkts(i: int):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=6 * i)


def series_df(spark, values, key="k1"):
    rows = [(key, mkts(i), float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


@pytest.mark.parametrize("abg", [(0.5, 0.3, 0.4), (0.9, 0.1, 0.7), (0.2, 0.8, 0.2)])
def test_holt_winters_exact_on_constant_plus_periodic(spark, abg):
    # y_t = 10 + s_{t mod 4}, seasonal components sum to zero.
    s = [2.0, -1.0, 3.0, -4.0]
    y = [10.0 + s[i % 4] for i in range(12)]
    a, b, g = abg
    out = holt_winters_forecast(
        series_df(spark, y), ["key"], season=4,
        alpha=a, beta=b, gamma=g, horizon=4,
    ).orderBy("step").collect()
    n = len(y)
    for r in out:
        expected = 10.0 + s[(n + r["step"] - 1) % 4]
        assert math.isclose(r["forecast"], expected, abs_tol=1e-9), (
            r["step"], r["forecast"], expected)
        assert math.isclose(r["trend"], 0.0, abs_tol=1e-9)


def test_holt_winters_short_series_equals_holt(spark):
    y = [3.0, 5.0, 4.0, 6.0, 8.0]  # < 2 seasons of m=4
    df = series_df(spark, y)
    hw = holt_winters_forecast(
        df, ["key"], season=4, alpha=0.5, beta=0.3, gamma=0.9, horizon=3
    ).orderBy("step").collect()
    h = holt_forecast(
        df, ["key"], alpha=0.5, beta=0.3, horizon=3
    ).orderBy("step").collect()
    for rw, rh in zip(hw, h):
        assert rw["forecast"] == rh["forecast"]
        assert rw["seasonal"] == 0.0


def py_maxsim(qdocs, ddocs, k=3):
    """Reference: dict doc -> list of vectors."""
    import itertools

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    out = {}
    for qd, qvs in qdocs.items():
        scores = []
        for dd, dvs in ddocs.items():
            s = sum(max(cos(qv, dv) for dv in dvs) for qv in qvs)
            scores.append((dd, round(s, 4)))
        scores.sort(key=lambda t: (-t[1], t[0]))
        out[qd] = scores[:k]
    return out


def test_maxsim_matches_reference_and_self_top1(spark):
    import random

    rnd = random.Random(7)
    ddocs = {
        d: [[rnd.uniform(-1, 1) for _ in range(8)] for _ in range(4)]
        for d in range(6)
    }
    qdocs = {d: ddocs[d] for d in (0, 1)}
    qrows = [
        (qd, i, [float(x) for x in v])
        for qd, vs in qdocs.items()
        for i, v in enumerate(vs)
    ]
    drows = [
        (dd, [float(x) for x in v]) for dd, vs in ddocs.items() for v in vs
    ]
    q = spark.createDataFrame(qrows, "q_doc int, q_tok int, qv array<double>")
    d = spark.createDataFrame(drows, "d_doc int, dv array<double>")
    got = maxsim_rerank(q, d, k=3).collect()
    exp = py_maxsim(qdocs, ddocs, k=3)
    for r in got:
        ed, es = exp[r["q_doc"]][r["rnk"] - 1]
        assert r["d_doc"] == ed
        assert math.isclose(r["maxsim"], es, abs_tol=2e-4), (tuple(r), es)
    # A query doc's best match is itself: every token matches at cos=1.
    for qd in (0, 1):
        top = [r for r in got if r["q_doc"] == qd and r["rnk"] == 1][0]
        assert top["d_doc"] == qd
        assert math.isclose(top["maxsim"], 4.0, abs_tol=1e-6)

"""Time-series regularization: resample an irregular event stream onto
a fixed grid and gap-fill by linear interpolation.

Reference parity: the reference's converters emit fixed-rate sample
matrices (DataConverterUDBF.py builds a relative-time axis from the
sample rate, file_analysis.py re-bases crack rows onto a uniform grid
before density statistics); this module is the general engine form of
that "irregular observations → uniform grid" step, as one declarative
plan instead of a per-file numpy loop.

Scale notes
-----------
Everything shuffles at most once, on the series key: the per-bucket
representative pick, the grid join, and the prev/next window scans are
all ``partitionBy(key)``.  The grid explode is ``span/step`` rows per
key — bounded by the key's time span, not the corpus size — and feeds
straight into the same-key window, so no second shuffle.  Interpolation
arithmetic is exact fixed-point (scaled longs + DECIMAL integral div,
the tie-proof kernel from :mod:`sparkgraft.operators.stats`), so
results are bit-identical under any partitioning and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sparkgraft.operators.stats import exact_mean, scaled_long

__all__ = ["resample_interpolate"]


def resample_interpolate(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    step_sec: int = 3600,
    digits: int = 3,
) -> DataFrame:
    """Resample each key's series onto a ``step_sec`` grid spanning its
    observed range, linearly interpolating interior gaps and padding the
    edges with the nearest observation.

    Per (key, bucket) the representative observation is the latest event
    (``ts`` desc, ``id_col`` desc tie-break — deterministic).  For a gap
    bucket ``b`` between observations ``(pb, pv)`` and ``(nb, nv)`` the
    value is ``(pv*(nb-b) + nv*(b-pb)) / (nb-pb)`` computed on scaled
    longs with a DECIMAL integral-div HALF-UP rounding — no float ties.

    Returns ``(key, bucket_ts, value, is_observed)``.
    """
    step_us = step_sec * 1_000_000
    bucket = F.expr(f"unix_micros({ts_col}) div {step_us}")
    pick = Window.partitionBy(key_col, "b").orderBy(
        F.col(ts_col).desc(), F.col(id_col).desc()
    )
    obs = (
        df.withColumn("b", bucket)
        .withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(key_col, "b", scaled_long(F.col(value_col)).alias("vs"))
    )
    spans = obs.groupBy(key_col).agg(
        F.min("b").alias("b0"), F.max("b").alias("b1")
    )
    grid = spans.select(
        key_col, F.explode(F.sequence("b0", "b1")).alias("b")
    )
    filled = grid.join(obs, [key_col, "b"], "left")

    w = Window.partitionBy(key_col).orderBy("b")
    back = w.rowsBetween(Window.unboundedPreceding, 0)
    fwd = w.rowsBetween(0, Window.unboundedFollowing)
    ob = F.when(F.col("vs").isNotNull(), F.col("b"))
    # Materialize the four window scans ONCE: re-using the raw window
    # expressions inside the interpolation CASE would re-instantiate a
    # window aggregate per reference (28 of them, measured) — a plain
    # projection boundary collapses that to exactly four.
    scanned = filled.select(
        key_col,
        "b",
        "vs",
        F.last(ob, ignorenulls=True).over(back).alias("pb"),
        F.last("vs", ignorenulls=True).over(back).alias("pv"),
        F.first(ob, ignorenulls=True).over(fwd).alias("nb"),
        F.first("vs", ignorenulls=True).over(fwd).alias("nv"),
    )
    pb, pv, nb, nv = (F.col(c) for c in ("pb", "pv", "nb", "nv"))
    interp_num = pv * (nb - F.col("b")) + nv * (F.col("b") - pb)
    value = (
        F.when(F.col("vs").isNotNull(), exact_mean(F.col("vs"), F.lit(1), digits))
        .when(pv.isNull(), exact_mean(nv, F.lit(1), digits))
        .when(nv.isNull(), exact_mean(pv, F.lit(1), digits))
        .otherwise(exact_mean(interp_num, nb - pb, digits))
    )
    return scanned.select(
        F.col(key_col),
        F.timestamp_micros(F.col("b") * F.lit(step_us)).alias("bucket_ts"),
        value.alias("value"),
        F.col("vs").isNotNull().alias("is_observed"),
    )


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_sec: int = 1800,
) -> DataFrame:
    """Assign an inactivity-gap session id to every event: a new
    session starts when the gap to the key's previous event exceeds
    ``gap_sec``.  The per-event companion to ``session_window``
    aggregation — this keeps the events (for per-event labeling,
    funnels, next-event features) where the native function only keeps
    the aggregate.

    One shuffle on the key; ``lag`` + running sum share the same sort.
    The order is total (ts, then the unique id), so session numbering
    is deterministic.  Returns the input plus ``session_id`` (1-based
    per key) and ``session_start``.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (
            F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)
            > F.lit(gap_sec * 1_000_000)
        ),
        1,
    ).otherwise(0)
    sessioned = df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy(key_col, "session_id")
    return sessioned.withColumn("session_start", F.min(ts_col).over(ws))


def time_weighted_avg(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    digits: int = 3,
) -> DataFrame:
    """Time-weighted average per key over irregular samples — the
    statistic a plain mean gets WRONG on irregular cadence (a sensor
    that reports every second while alarming and hourly otherwise
    would dominate a plain mean with its alarm values).  Step/LOCF
    integration: each value holds until the next sample; the last
    sample closes the integral (zero width).

    Exact arithmetic throughout: scaled-long values × microsecond
    durations accumulate in DECIMAL(38,0) (the products pass 2^63),
    and the final division is the HALF-UP integral-div kernel — no
    doubles until the rounded result.  One shuffle on the key (the
    ``lead`` window), then a grouped decimal sum.

    Returns ``(key, n_samples, span_seconds, twa)``; keys with a
    single sample have zero span and fall back to the value itself.
    """
    from sparkgraft.operators.stats import _dec, scaled_long

    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    t = df.select(
        key_col,
        F.unix_micros(F.col(ts_col)).alias("tus"),
        scaled_long(F.col(value_col)).alias("vs"),
        F.col(id_col).alias("__id"),
    ).withColumn(
        "dt", F.lead("tus").over(
            Window.partitionBy(key_col).orderBy(
                F.col("tus").asc(), F.col("__id").asc()
            )
        ) - F.col("tus")
    )
    agg = t.groupBy(key_col).agg(
        F.count("*").alias("n_samples"),
        F.sum(_dec(F.col("vs")) * _dec(F.coalesce(F.col("dt"), F.lit(0)))).alias(
            "num"
        ),
        F.sum(F.coalesce(F.col("dt"), F.lit(0))).alias("den"),
        F.min(F.when(F.col("dt").isNull(), F.col("vs"))).alias("last_vs"),
    )
    unit = 1_000_000 // (10**digits)
    num2 = F.lit(2).cast("decimal(38,0)") * F.abs(F.col("num")) + F.lit(
        unit
    ).cast("decimal(38,0)") * _dec(F.col("den"))
    den2 = F.lit(2 * unit).cast("decimal(38,0)") * _dec(F.col("den"))
    q = F.call_function("div", num2, den2)
    signed = F.when(F.col("num") < 0, -q).otherwise(q)
    twa = F.when(
        F.col("den") > 0,
        signed.cast("double") / F.lit(float(10**digits)),
    ).otherwise(F.col("last_vs").cast("double") / F.lit(1e6))
    return agg.select(
        key_col,
        "n_samples",
        F.expr("den div 1000000").alias("span_seconds"),
        twa.alias("twa"),
    )


def holt_forecast(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 3,
    digits: int = 6,
) -> DataFrame:
    """Per-series Holt linear (double-exponential) smoothing +
    ``horizon``-step forecast — the engine's template for per-series
    ITERATIVE kernels SQL can't express (each smoothing step depends
    on the previous state), run as grouped ``applyInPandas``: one
    Arrow batch per series, numpy recurrence inside, forecast rows
    out.  Series are assumed regularly spaced (resample first via
    :func:`resample_interpolate` for irregular data).

    Initialization: level = y₀, trend = y₁ − y₀ (textbook), so an
    exactly-linear series is reproduced with zero error for any α/β —
    the unit-test anchor.  Deterministic: the recurrence is a fixed
    sequential fold per series (one group per task, order pinned by
    (ts, value)), so results are partitioning-independent.

    Scale shape: state is O(1) per series and work is O(n) per series;
    groups spread across executors by the series key — the classic
    embarrassingly-parallel per-key model fit.  Returns one row per
    series per step 1..horizon with the forecast and final state.
    """
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    # Key columns keep their ORIGINAL dtypes (built from df.schema) so
    # forecasts join back to the source frame without implicit casts —
    # a numeric or date series key comes back as that type, not string.
    schema = StructType(
        [StructField(k, df.schema[k].dataType) for k in keys]
        + [
            StructField("step", IntegerType()),
            StructField("forecast", DoubleType()),
            StructField("level", DoubleType()),
            StructField("trend", DoubleType()),
        ]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, value_col])
        y = pdf[value_col].astype(float).to_numpy()
        lvl = y[0]
        trend = (y[1] - y[0]) if len(y) > 1 else 0.0
        for t in range(1, len(y)):
            prev = lvl
            lvl = alpha * y[t] + (1.0 - alpha) * (lvl + trend)
            trend = beta * (lvl - prev) + (1.0 - beta) * trend
        rows = [
            tuple(pdf.iloc[0][k] for k in keys)
            + (
                h,
                round(lvl + h * trend, digits),
                round(lvl, digits),
                round(trend, digits),
            )
            for h in range(1, horizon + 1)
        ]
        return pd.DataFrame(
            rows, columns=list(keys) + ["step", "forecast", "level", "trend"]
        )

    return df.select(*keys, ts_col, value_col).groupBy(*keys).applyInPandas(
        fit, schema
    )


def holt_winters_forecast(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    season: int = 4,
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.4,
    horizon: int = 4,
    digits: int = 6,
) -> DataFrame:
    """Per-series additive Holt-Winters (triple-exponential) smoothing +
    ``horizon``-step forecast — the seasonal extension of
    :func:`holt_forecast`, same grouped ``applyInPandas`` iterative
    template (O(1) state, O(n) work per series, one Arrow batch each).

    Textbook additive init over the first two seasons: level = mean of
    season 1, trend = (mean of season 2 - mean of season 1) / m,
    seasonal_i = y_i - level.  A constant-plus-periodic series whose
    seasonal components sum to zero over the period is reproduced with
    ZERO error for any alpha/beta/gamma — the unit-test anchor.  Series
    shorter than two full seasons fall back to Holt linear semantics
    (seasonal components pinned to 0).

    Returns one row per series per step 1..horizon: forecast, final
    level/trend, and the seasonal component applied at that step.
    Deterministic: fixed sequential fold per series, rows ordered by
    (ts, value).
    """
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    m = season
    schema = StructType(
        [StructField(k, df.schema[k].dataType) for k in keys]
        + [
            StructField("step", IntegerType()),
            StructField("forecast", DoubleType()),
            StructField("level", DoubleType()),
            StructField("trend", DoubleType()),
            StructField("seasonal", DoubleType()),
        ]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, value_col])
        y = pdf[value_col].astype(float).to_numpy()
        n = len(y)
        seasonal_on = n >= 2 * m
        if seasonal_on:
            lvl = float(y[:m].mean())
            trend = float((y[m : 2 * m].mean() - y[:m].mean()) / m)
            seas = [float(y[i] - lvl) for i in range(m)]
            start = m
        else:
            # Shorter than two seasons: pure Holt linear (seasonal
            # components pinned to 0, no seasonal updates).
            lvl = y[0]
            trend = (y[1] - y[0]) if n > 1 else 0.0
            seas = [0.0] * m
            start = 1
        for t in range(start, n):
            s_old = seas[t % m]
            prev = lvl
            lvl = alpha * (y[t] - s_old) + (1.0 - alpha) * (lvl + trend)
            trend = beta * (lvl - prev) + (1.0 - beta) * trend
            if seasonal_on:
                seas[t % m] = gamma * (y[t] - lvl) + (1.0 - gamma) * s_old
        rows = [
            tuple(pdf.iloc[0][k] for k in keys)
            + (
                h,
                round(lvl + h * trend + seas[(n + h - 1) % m], digits),
                round(lvl, digits),
                round(trend, digits),
                round(seas[(n + h - 1) % m], digits),
            )
            for h in range(1, horizon + 1)
        ]
        return pd.DataFrame(
            rows,
            columns=list(keys)
            + ["step", "forecast", "level", "trend", "seasonal"],
        )

    return df.select(*keys, ts_col, value_col).groupBy(*keys).applyInPandas(
        fit, schema
    )

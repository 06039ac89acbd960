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
    pb = F.last(ob, ignorenulls=True).over(back)
    pv = F.last("vs", ignorenulls=True).over(back)
    nb = F.first(ob, ignorenulls=True).over(fwd)
    nv = F.first("vs", ignorenulls=True).over(fwd)

    interp_num = pv * (nb - F.col("b")) + nv * (F.col("b") - pb)
    value = (
        F.when(F.col("vs").isNotNull(), exact_mean(F.col("vs"), F.lit(1), digits))
        .when(pv.isNull(), exact_mean(nv, F.lit(1), digits))
        .when(nv.isNull(), exact_mean(pv, F.lit(1), digits))
        .otherwise(exact_mean(interp_num, nb - pb, digits))
    )
    return filled.select(
        F.col(key_col),
        F.timestamp_micros(F.col("b") * F.lit(step_us)).alias("bucket_ts"),
        value.alias("value"),
        F.col("vs").isNotNull().alias("is_observed"),
    )

"""Count-min sketch as DataFrame operators.

The engine's other sketches (HLL cardinality, approx percentile) are
native Spark aggregates exercised by oracle queries; count-min has no
portable built-in surface, so it is built here from the same md5
toolkit as the dedup/sampling operators — which keeps BOTH the build
and the lookup oracle-checkable in DuckDB, and the cell table mergeable
across partitions/streams by plain cell-wise addition (the distributed
sketch law the tests assert).

Scale shape: the build is ONE pass over the data (an explode of depth
(row, bucket) pairs into a map-side-combined count whose result is at
most depth x width cells); a lookup broadcasts that tiny cell table
against the probe keys.  Estimates are exact integer arithmetic — no
floating point anywhere — so results are deterministic in any engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cms_bucket(
    d: int, key_cols: Sequence[str], width: int, salt: str
) -> Column:
    """Row-``d`` bucket: the first 4 hex chars of md5(d|salt|key) mod
    width — 16 bits of hash, plenty for any practical width."""
    h = F.md5(
        F.concat_ws(
            "|", F.lit(str(d)), F.lit(salt), *[F.col(c) for c in key_cols]
        )
    )
    return F.pmod(
        F.conv(F.substring(h, 1, 4), 16, 10).cast("long"), F.lit(width)
    ).cast("int")


def cms_build(
    df: DataFrame,
    key_cols: Sequence[str],
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Build the (depth x width) count table: one row per non-empty
    cell, ``(d, bucket, n)``.  Two sketches over disjoint data merge by
    summing ``n`` cell-wise (unionByName + groupBy(d, bucket))."""
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_bucket(d, key_cols, width, salt).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell")
    )
    return (
        cells.select("cell.d", "cell.bucket")
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("n"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two sketches built with identical parameters —
    the distributive property that lets per-partition / per-stream
    sketches roll up without touching raw data."""
    return (
        a.unionByName(b)
        .groupBy("d", "bucket")
        .agg(F.sum("n").alias("n"))
    )


def cms_lookup(
    cms: DataFrame,
    probes: DataFrame,
    key_cols: Sequence[str],
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Point-estimate the count of each probe key: min over the depth
    rows of the key's cell — always >= the true count (cells only ever
    over-count on collisions).  The cell table broadcasts; probes never
    shuffle more than (key, d, bucket)."""
    exploded = probes.select(
        *key_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_bucket(d, key_cols, width, salt).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(*key_cols, "cell.d", "cell.bucket")
    joined = exploded.join(F.broadcast(cms), ["d", "bucket"], "left")
    return joined.groupBy(*key_cols).agg(
        F.min(F.coalesce(F.col("n"), F.lit(0))).alias("n_est")
    )

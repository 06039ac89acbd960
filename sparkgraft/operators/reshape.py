"""Wide ↔ long reshaping (SURVEY §1.1/§1.3).

The reference's sample matrix is *wide* (ts + N float channels, one
column per sensor) while the engine's canonical streaming form is
*long* ``(ts, channel, value)`` — Structured Streaming needs a fixed
schema, and per-file channel sets vary (§1.3).  These two operators are
the bridge, both zero-UDF:

- ``wide_to_long`` is Spark's native ``unpivot`` (an Expand — no
  shuffle; output rows = rows x channels, streamed through codegen).
- ``long_to_wide`` is a grouped ``pivot`` with an **explicit** channel
  list — never the inferred variant, which triggers an extra collect
  of distinct keys and breaks schema stability at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def wide_to_long(
    df: DataFrame,
    id_cols: Sequence[str],
    channel_cols: Sequence[str],
    key_name: str = "channel",
    value_name: str = "value",
) -> DataFrame:
    """Wide sample matrix → long form (the §1.1 canonicalization)."""
    return df.unpivot(
        list(id_cols), list(channel_cols), key_name, value_name
    )


def long_to_wide(
    df: DataFrame,
    id_cols: Sequence[str],
    key_col: str,
    channels: Sequence[str],
    value_agg: Column,
) -> DataFrame:
    """Long form → wide matrix for a *known* channel list.

    ``value_agg`` aggregates duplicates per (id, channel) cell (e.g.
    ``F.sum(...)`` / ``F.max_by(...)``); absent cells are NULL.
    """
    return df.groupBy(*id_cols).pivot(key_col, list(channels)).agg(value_agg)


def flatten_struct(df: DataFrame, sep: str = "_") -> DataFrame:
    """Recursively flatten nested struct columns into top-level columns
    (``a.b.c`` → ``a_b_c``) — the schema-normalization step after
    reading nested JSON/parquet, so downstream relational operators see
    a flat table.  Pure projection: column pruning still reaches the
    scan for any subset of the flattened columns.
    """
    from pyspark.sql.types import StructType

    def walk(schema: StructType, prefix: tuple[str, ...]) -> list[tuple[str, ...]]:
        out: list[tuple[str, ...]] = []
        for fld in schema.fields:
            path = prefix + (fld.name,)
            if isinstance(fld.dataType, StructType):
                out.extend(walk(fld.dataType, path))
            else:
                out.append(path)
        return out

    cols = [
        F.col(".".join(f"`{p}`" for p in path)).alias(sep.join(path))
        for path in walk(df.schema, ())
    ]
    return df.select(*cols)

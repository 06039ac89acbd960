"""Storage-layout sinks: partitioned writes and small-file compaction.

At 100 TB, layout is a first-class operator: date/key-partitioned
parquet gives the scanner partition pruning (queries touch only the
directories they need), and periodic compaction keeps file counts sane
when a streaming pipeline lands one small file per trigger (the
reference's 30 s cadence would produce ~1M files/year per logger).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str], fmt: str = "parquet"
) -> None:
    """Hive-style partitioned write — downstream filters on the
    partition columns prune directories before any I/O."""
    df.write.mode("overwrite").partitionBy(*partition_cols).format(fmt).save(path)


def compact_directory(
    spark: SparkSession,
    src: str,
    dst: str,
    target_files: int,
    fmt: str = "parquet",
) -> None:
    """Rewrite a many-small-files dataset into ``target_files`` files.

    ``coalesce`` (not ``repartition``): no shuffle — each output task
    concatenates a set of input files.  Run per partition directory in
    production so compaction parallelizes across partitions.
    """
    df = spark.read.format(fmt).load(src)
    df.coalesce(target_files).write.mode("overwrite").format(fmt).save(dst)

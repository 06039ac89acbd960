"""Versioned snapshot tables: time travel, append vs overwrite,
atomic pointer, vacuum of unreachable files, history audit."""

from __future__ import annotations

import os

import pytest

from sparkgraft.sinks.versioned import (
    latest_version,
    read_versioned,
    table_history,
    vacuum,
    write_versioned,
)


def df_of(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def ids(df):
    return sorted(r["id"] for r in df.collect())


def test_time_travel_across_versions(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v0 = write_versioned(df_of(spark, [1, 2]), t, mode="overwrite")
    v1 = write_versioned(df_of(spark, [3]), t, mode="append")
    v2 = write_versioned(df_of(spark, [9, 9]), t, mode="overwrite")
    assert (v0, v1, v2) == (0, 1, 2)
    assert ids(read_versioned(spark, t)) == [9, 9]
    assert ids(read_versioned(spark, t, version=0)) == [1, 2]
    assert ids(read_versioned(spark, t, version=1)) == [1, 2, 3]
    assert ids(read_versioned(spark, t, version=2)) == [9, 9]
    hist = table_history(t)
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert [h["operation"] for h in hist] == ["overwrite", "append", "overwrite"]
    assert hist[1]["parent"] == 0


def test_append_reuses_parent_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_versioned(df_of(spark, [1]), t)
    n_files_v0 = table_history(t)[0]["n_files"]
    write_versioned(df_of(spark, [2]), t, mode="append")
    hist = table_history(t)
    # v1 manifest includes v0's files plus the new ones
    assert hist[1]["n_files"] > n_files_v0
    data = os.listdir(os.path.join(t, "data"))
    assert all(f.startswith(("v0-", "v1-")) for f in data)


def test_vacuum_removes_only_unreachable(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_versioned(df_of(spark, [1, 2]), t, mode="overwrite")
    write_versioned(df_of(spark, [5, 6]), t, mode="overwrite")
    # plant a crash orphan: data file not referenced by any manifest
    orphan = os.path.join(t, "data", "v9-999.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"junk")
    deleted = vacuum(t, keep_versions=1)
    assert "data/v9-999.parquet" in deleted
    assert any(d.startswith("data/v0-") for d in deleted)
    # latest still readable; history still auditable
    assert ids(read_versioned(spark, t)) == [5, 6]
    assert len(table_history(t)) == 2
    # time travel to the vacuumed version now fails on missing files
    with pytest.raises(Exception):
        read_versioned(spark, t, version=0).collect()


def test_vacuum_keep_versions_preserves_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_versioned(df_of(spark, [1]), t, mode="overwrite")
    write_versioned(df_of(spark, [2]), t, mode="overwrite")
    deleted = vacuum(t, keep_versions=2)
    assert deleted == []
    assert ids(read_versioned(spark, t, version=0)) == [1]


def test_empty_table_and_bad_mode(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert latest_version(t) is None
    with pytest.raises(FileNotFoundError):
        read_versioned(spark, t)
    with pytest.raises(ValueError):
        write_versioned(df_of(spark, [1]), t, mode="merge")


def test_compact_table_preserves_data(spark, tmp_path):
    from sparkgraft.sinks.versioned import compact_table

    t = str(tmp_path / "tbl")
    write_versioned(df_of(spark, [1, 2]).repartition(4), t, mode="overwrite")
    write_versioned(df_of(spark, [3, 4]).repartition(4), t, mode="append")
    before = ids(read_versioned(spark, t))
    v = compact_table(spark, t, target_files=1)
    hist = table_history(t)
    assert hist[v]["n_files"] == 1 and hist[v]["n_files"] < hist[v - 1]["n_files"]
    assert ids(read_versioned(spark, t)) == before == [1, 2, 3, 4]
    # pre-compaction version still time-travels
    assert ids(read_versioned(spark, t, version=v - 1)) == before

"""Versioned snapshot tables: manifest-based time travel over plain
parquet — the minimal transactional-table primitive (the Delta/Iceberg
idea) a long-running ingest pipeline needs to make reprocessing and
audits reproducible.

Layout under ``table_dir``:

- ``data/<version>-<n>.parquet``  immutable data files, never rewritten
  in place; each write lands files under its own version prefix.
- ``_manifests/v<version>.json``  one JSON manifest per committed
  version: the ORDERED list of data files that constitute the snapshot,
  the operation ("overwrite" | "append"), and the parent version.
- ``_manifests/_latest``          pointer file holding the newest
  committed version number.

Commit protocol (single-writer): data files are fully written first,
then the manifest, then the ``_latest`` pointer flips via
``os.replace`` — readers either see the previous snapshot or the new
one, never a torn state (the same atomic-promote discipline as the K5
event store, sinks/event_store_sink.py).  A crash before the pointer
flip leaves orphan data files that a later ``vacuum`` removes —
exactly the recovery story of the big table formats.

Reads are manifest-driven: ``read_versioned(dir, version)`` loads the
snapshot's exact file list (time travel), so concurrent writers can
land new versions while a long batch job keeps reading a pinned one.
At 100 TB the manifest stays tiny (one row per FILE, not per record)
and the data scan is ordinary pruned parquet.

Reference anchor: the reference's event store keeps only ``latest``
semantics (restapi/app_fs.py); this adds the version history a
reproducible training-data pipeline requires (which exact snapshot
trained model X?).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _manifest_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_manifests")


def _latest_path(table_dir: str) -> str:
    return os.path.join(_manifest_dir(table_dir), "_latest")


def latest_version(table_dir: str) -> int | None:
    """Newest committed version, or None for an empty table."""
    p = _latest_path(table_dir)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return int(fh.read().strip())


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(
        os.path.join(_manifest_dir(table_dir), f"v{version}.json")
    ) as fh:
        return json.load(fh)


def write_versioned(
    df: DataFrame, table_dir: str, mode: str = "append"
) -> int:
    """Commit ``df`` as a new snapshot version; returns the version
    number.  ``mode='append'`` includes the parent snapshot's files in
    the new manifest (no data rewrite — append is metadata-only on top
    of the new files); ``mode='overwrite'`` starts the file list
    fresh.  Data lands before the manifest, the manifest before the
    pointer flip — each step atomic via ``os.replace``."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported mode: {mode}")
    parent = latest_version(table_dir)
    version = 0 if parent is None else parent + 1
    staging = os.path.join(table_dir, "data", f"_staging_v{version}")
    df.write.mode("overwrite").parquet(staging)
    files = []
    n = 0
    for name in sorted(os.listdir(staging)):
        if not name.endswith(".parquet"):
            continue
        final = os.path.join(table_dir, "data", f"v{version}-{n}.parquet")
        os.replace(os.path.join(staging, name), final)
        files.append(os.path.relpath(final, table_dir))
        n += 1
    for leftover in os.listdir(staging):
        os.remove(os.path.join(staging, leftover))
    os.rmdir(staging)
    if mode == "append" and parent is not None:
        files = _read_manifest(table_dir, parent)["files"] + files
    os.makedirs(_manifest_dir(table_dir), exist_ok=True)
    manifest = {
        "version": version,
        "parent": parent,
        "operation": mode,
        "files": files,
    }
    mpath = os.path.join(_manifest_dir(table_dir), f"v{version}.json")
    tmp = mpath + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, mpath)
    ltmp = _latest_path(table_dir) + ".tmp"
    with open(ltmp, "w") as fh:
        fh.write(str(version))
    os.replace(ltmp, _latest_path(table_dir))
    return version


def read_versioned(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot: the latest by default, or any committed
    ``version`` (time travel).  The scan is the manifest's exact file
    list — ordinary parquet, so pushdown/pruning apply unchanged."""
    v = latest_version(table_dir) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    manifest = _read_manifest(table_dir, v)
    if not manifest["files"]:
        raise FileNotFoundError(f"version {v} of {table_dir} is empty")
    paths = [os.path.join(table_dir, f) for f in manifest["files"]]
    return spark.read.parquet(*paths)


def table_history(table_dir: str) -> list[dict]:
    """All committed versions, oldest first: (version, parent,
    operation, n_files) — the audit trail."""
    out = []
    v = latest_version(table_dir)
    if v is None:
        return out
    for i in range(v + 1):
        m = _read_manifest(table_dir, i)
        out.append(
            {
                "version": m["version"],
                "parent": m["parent"],
                "operation": m["operation"],
                "n_files": len(m["files"]),
            }
        )
    return out


def compact_table(
    spark: SparkSession, table_dir: str, target_files: int = 1
) -> int:
    """OPTIMIZE: rewrite the latest snapshot into ``target_files``
    files and commit the result as a new version (operation recorded
    as overwrite of identical data — history keeps the pre-compaction
    version readable until vacuumed).  The small-file answer for a
    streaming ingest that lands one version per trigger."""
    latest = read_versioned(spark, table_dir)
    return write_versioned(
        latest.coalesce(target_files), table_dir, mode="overwrite"
    )


def vacuum(table_dir: str, keep_versions: int = 1) -> list[str]:
    """Remove data files unreachable from the newest ``keep_versions``
    manifests (crash orphans and compacted-away history).  Returns the
    deleted file names.  Never touches manifests — history stays
    auditable even after its data is vacuumed."""
    newest = latest_version(table_dir)
    if newest is None:
        return []
    keep = set()
    for v in range(max(0, newest - keep_versions + 1), newest + 1):
        keep.update(_read_manifest(table_dir, v)["files"])
    data_dir = os.path.join(table_dir, "data")
    deleted = []
    for name in sorted(os.listdir(data_dir)):
        rel = os.path.join("data", name)
        full = os.path.join(data_dir, name)
        if os.path.isdir(full):
            continue
        if rel not in keep:
            os.remove(full)
            deleted.append(rel)
    return deleted

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

Commit protocol (optimistic concurrency): data files (token-unique
names) and the stats table (token-unique, recorded as ``stats_file``
in the manifest) are fully written first; then the writer CLAIMS the
version by creating ``v<N>.json`` via an atomic put-if-absent
(``os.link`` from a fully-written temp file — complete content AND
exclusivity in one step).  Manifest creation is the commit point:
when two writers race the same parent, exactly one claim succeeds and
the loser raises :class:`CommitConflictError`, cleans up its own
files, and (inside the public writers) retries against the new parent
— Delta-style lost-update prevention, detected at commit time rather
than silently last-writer-wins.  The ``_latest`` pointer is a
monotone cache flipped after the claim via ``os.replace``; readers
scan forward past it, so a crash (or a slow writer flipping late)
never hides or tears a committed version.  A crash before the claim
leaves orphan data files that a later ``vacuum`` removes — exactly
the recovery story of the big table formats.

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
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflictError(RuntimeError):
    """Another writer committed this version first (optimistic-
    concurrency conflict).  The public writers catch it and retry
    against the new parent; it surfaces only when retries are
    exhausted or when calling :func:`_commit` directly."""


def _manifest_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_manifests")


def _latest_path(table_dir: str) -> str:
    return os.path.join(_manifest_dir(table_dir), "_latest")


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(_manifest_dir(table_dir), f"v{version}.json")


def latest_version(table_dir: str) -> int | None:
    """Newest COMMITTED version, or None for an empty table.  The
    commit point is manifest creation, so this starts from the
    ``_latest`` pointer cache and scans forward while newer manifests
    exist — a crash between claim and pointer flip (or a slow writer
    flipping the pointer after a faster successor) never hides a
    committed version."""
    p = _latest_path(table_dir)
    if not os.path.exists(p):
        # No pointer yet: either an empty table or a writer crashed
        # between its v0 claim and the first pointer flip.
        if not os.path.exists(_manifest_path(table_dir, 0)):
            return None
        v = 0
    else:
        with open(p) as fh:
            v = int(fh.read().strip())
    while os.path.exists(_manifest_path(table_dir, v + 1)):
        v += 1
    return v


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as fh:
        return json.load(fh)


def _stats_path(table_dir: str, version: int) -> str:
    """Stats table location for a version: the manifest's
    ``stats_file`` when recorded (token-unique name — concurrent
    losers can never have clobbered it), else the legacy fixed name
    (pre-OCC tables)."""
    default = os.path.join(
        _manifest_dir(table_dir), f"v{version}_stats.parquet"
    )
    mpath = _manifest_path(table_dir, version)
    if os.path.exists(mpath):
        sf = _read_manifest(table_dir, version).get("stats_file")
        if sf:
            return os.path.join(_manifest_dir(table_dir), sf)
    return default


def _file_stats(spark: SparkSession, table_dir: str, rel_files: list[str],
                stats_cols: list[str]) -> DataFrame:
    """Per-file (min, max, null-count, n_rows) over exactly
    ``rel_files`` — one distributed pass, one manifest row per file.
    ``file`` is stored table-relative so the table directory can
    move."""
    from pyspark.sql import functions as F

    paths = [os.path.join(table_dir, f) for f in rel_files]
    written = spark.read.parquet(*paths)
    aggs = []
    for c in stats_cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                f"nulls_{c}"
            ),
        ]
    prefix = os.path.abspath(table_dir) + os.sep
    return written.groupBy(
        F.replace(
            F.replace(F.input_file_name(), F.lit("file://"), F.lit("")),
            F.lit(prefix),
            F.lit(""),
        ).alias("file")
    ).agg(F.count("*").alias("n_rows"), *aggs)


def _file_blooms_rel(
    spark: SparkSession,
    table_dir: str,
    rel_files: list[str],
    cols: list[str],
    bits: int,
    hashes: int,
    salt: str,
) -> DataFrame:
    """Per-file Bloom bitmaps over exactly ``rel_files`` (layout.
    _file_blooms with the versioned table's relative file naming) —
    one distributed pass, one row per file."""
    from pyspark.sql import functions as F

    from sparkgraft.sinks.layout import _file_blooms

    paths = [os.path.join(table_dir, f) for f in rel_files]
    bm = _file_blooms(spark.read.parquet(*paths), cols, bits, hashes, salt)
    prefix = os.path.abspath(table_dir) + os.sep
    return bm.withColumn(
        "file",
        F.replace(
            F.replace(F.col("file"), F.lit("file://"), F.lit("")),
            F.lit(prefix),
            F.lit(""),
        ),
    )


def _bloom_config(man: dict) -> "dict | None":
    """A manifest's Bloom-index configuration, or None."""
    if not man.get("bloom_cols"):
        return None
    return {
        "cols": list(man["bloom_cols"]),
        "bits": man.get("bloom_bits", 4096),
        "hashes": man.get("bloom_hashes", 3),
        "salt": man.get("bloom_salt", "bloom"),
    }


def write_versioned(
    df: DataFrame,
    table_dir: str,
    mode: str = "append",
    stats_cols: "list[str] | None" = None,
    sort_col: str | None = None,
    n_files: int | None = None,
    extra_meta: "dict | None" = None,
    retries: int = 20,
    bloom_cols: "list[str] | None" = None,
) -> int:
    """Commit ``df`` as a new snapshot version; returns the version
    number.  ``mode='append'`` includes the parent snapshot's files in
    the new manifest (no data rewrite — append is metadata-only on top
    of the new files); ``mode='overwrite'`` starts the file list
    fresh.  Data lands before the manifest, the manifest before the
    pointer flip — each step atomic via ``os.replace``.

    ``stats_cols`` composes data skipping with versioning (Delta
    parity: per-file stats live in the commit metadata): the commit
    also writes a per-file min/max/null-count stats table beside its
    manifest, covering the NEW files only plus the parent's carried
    stats on append — no history rescan, ever.  A later
    :func:`read_versioned_skipping` prunes a time-travel read with a
    stats predicate.  ``sort_col``/``n_files`` range-partition + sort
    the write so each file covers a tight range (what makes the stats
    selective — see layout.write_with_stats).

    ``bloom_cols`` adds per-file Bloom bitmaps to the commit log
    (layout.write_bloom_manifest composed into the commit, the
    Delta/Iceberg bloom-filter-index move): EQUALITY skipping for
    point lookups on high-cardinality unsorted columns that min/max
    stats can't prune.  Once enabled, every descendant commit
    (append/DELETE/MERGE/OPTIMIZE) INHERITS the config and indexes
    only its new files (carried files' bitmap rows are copied from the
    parent — no history rescan); query with
    :func:`read_versioned_bloom`.

    Concurrency: on a commit conflict (another writer claimed the
    version first) the already-landed data files are REUSED — the
    rows being appended/overwritten don't depend on the parent — and
    the commit retries against the new parent, up to ``retries``
    times before :class:`CommitConflictError` propagates."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported mode: {mode}")
    parent = latest_version(table_dir)
    version = 0 if parent is None else parent + 1
    new_files = _land_files(df, table_dir, version, sort_col, n_files)
    for attempt in range(retries + 1):
        if mode == "append" and parent is not None:
            files = _read_manifest(table_dir, parent)["files"] + new_files
        else:
            files = new_files
        carry = (
            _read_manifest(table_dir, parent)["files"]
            if mode == "append" and parent is not None
            else []
        )
        try:
            _commit(
                df.sparkSession, table_dir, version, parent, mode, files,
                stats_cols, new_files, carry, extra_meta,
                bloom_cols=bloom_cols,
            )
            return version
        except CommitConflictError:
            if attempt == retries:
                _remove_files(table_dir, new_files)
                raise
            parent = latest_version(table_dir)
            version = 0 if parent is None else parent + 1
    raise AssertionError("unreachable")


def _land_files(
    df: DataFrame,
    table_dir: str,
    version: int,
    sort_col: str | None = None,
    n_files: int | None = None,
) -> list[str]:
    """Stage ``df``'s parquet files and rename them under the version
    prefix; returns the table-relative file list.  Data is fully on
    disk before any metadata references it.  Names carry a per-write
    token (``v<N>-<token>-<n>.parquet``) so concurrent writers racing
    the same version can never clobber each other's files — the name
    records the version at LAND time; on a commit retry the same
    files commit under the next version, and the manifest (never the
    name) is authoritative."""
    token = uuid.uuid4().hex[:8]
    staging = os.path.join(table_dir, "data", f"_staging_v{version}-{token}")
    w = df
    if sort_col is not None:
        from pyspark.sql import functions as F

        key = F.col(sort_col)
        w = df.repartitionByRange(n_files or 4, key).sortWithinPartitions(key)
    elif n_files is not None:
        # n_files without sort_col still bounds the file count (the
        # small-files intent, e.g. a quarantine commit) — coalesce is
        # deterministic (no shuffle), landing AT MOST n_files files.
        w = df.coalesce(n_files)
    w.write.mode("overwrite").parquet(staging)
    files = []
    n = 0
    for name in sorted(os.listdir(staging)):
        if not name.endswith(".parquet"):
            continue
        final = os.path.join(
            table_dir, "data", f"v{version}-{token}-{n}.parquet"
        )
        os.replace(os.path.join(staging, name), final)
        files.append(os.path.relpath(final, table_dir))
        n += 1
    for leftover in os.listdir(staging):
        os.remove(os.path.join(staging, leftover))
    os.rmdir(staging)
    return files


def _remove_files(table_dir: str, rel_files: list[str]) -> None:
    """Best-effort cleanup of a conflict loser's OWN landed files
    (token-unique names — never another writer's)."""
    for f in rel_files:
        try:
            os.remove(os.path.join(table_dir, f))
        except OSError:
            pass


def _commit(
    spark: SparkSession,
    table_dir: str,
    version: int,
    parent: "int | None",
    operation: str,
    files: list[str],
    stats_cols: "list[str] | None",
    new_files: list[str],
    carried_files: list[str],
    extra_meta: "dict | None" = None,
    bloom_cols: "list[str] | None" = None,
    bloom_bits: int = 4096,
    bloom_hashes: int = 3,
    bloom_salt: str = "bloom",
) -> None:
    """Commit metadata for an already-landed version: stats (new files
    computed fresh, carried files' rows copied from the parent stats
    table) land first under a token-unique name, then the manifest
    CLAIMS the version via atomic put-if-absent (``os.link``) — the
    commit point; a lost race raises :class:`CommitConflictError`
    after cleaning up this writer's stats table.  The ``_latest``
    pointer flips last (monotone cache; readers scan forward).

    Coverage invariant: when ``stats_cols`` is set, the committed stats
    table covers EVERY file in the manifest.  Carried files whose
    parent stats are missing, incomplete, or computed over different
    columns get their stats recomputed here (one scan of exactly those
    files) instead of silently committing a manifest that claims stats
    coverage it doesn't have — read_versioned_skipping's superset
    guarantee and stats_summary's exactness both depend on it."""
    os.makedirs(_manifest_dir(table_dir), exist_ok=True)
    token = uuid.uuid4().hex[:8]
    stats_file = None
    if stats_cols:
        from pyspark.sql import functions as F

        stats = None
        if new_files:
            stats = _file_stats(spark, table_dir, new_files, list(stats_cols))
        if carried_files:
            carried_stats = None
            missing = list(carried_files)
            if parent is not None and os.path.exists(
                _stats_path(table_dir, parent)
            ):
                parent_cols = _read_manifest(table_dir, parent).get(
                    "stats_cols"
                )
                if parent_cols == list(stats_cols):
                    parent_stats = spark.read.parquet(
                        _stats_path(table_dir, parent)
                    ).filter(F.col("file").isin(carried_files))
                    # bounded collect: one row per carried file
                    have = {
                        r["file"]
                        for r in parent_stats.select("file").collect()
                    }
                    missing = [f for f in carried_files if f not in have]
                    if len(missing) < len(carried_files):
                        carried_stats = parent_stats
            if missing:
                fresh = _file_stats(
                    spark, table_dir, missing, list(stats_cols)
                )
                carried_stats = (
                    fresh
                    if carried_stats is None
                    else carried_stats.unionByName(fresh)
                )
            stats = (
                carried_stats
                if stats is None
                else carried_stats.unionByName(stats)
            )
        if stats is not None:
            stats_file = f"v{version}_stats-{token}.parquet"
            stats.write.mode("overwrite").parquet(
                os.path.join(_manifest_dir(table_dir), stats_file)
            )
    # Bloom manifest (EQUALITY skipping beside the min/max stats):
    # explicit ``bloom_cols`` enables the index; None INHERITS the
    # parent commit's bloom config, so append/COW/compact commits keep
    # point-lookup pruning alive without re-opting-in (Delta
    # bloom-filter-index persistence).  Coverage invariant mirrors
    # stats: the bloom table covers EVERY manifest file — carried
    # files missing from the parent's bloom table (or indexed under a
    # different config) are recomputed here, one bounded scan.
    bloom_file = None
    if bloom_cols:
        bcfg = {
            "cols": list(bloom_cols), "bits": bloom_bits,
            "hashes": bloom_hashes, "salt": bloom_salt,
        }
    elif parent is not None:
        bcfg = _bloom_config(_read_manifest(table_dir, parent))
    else:
        bcfg = None
    if bcfg:
        from pyspark.sql import functions as F

        blooms = None
        if new_files:
            blooms = _file_blooms_rel(spark, table_dir, new_files, **bcfg)
        if carried_files:
            carried_bm = None
            missing = list(carried_files)
            if parent is not None:
                pman = _read_manifest(table_dir, parent)
                ppath = (
                    os.path.join(_manifest_dir(table_dir), pman["bloom_file"])
                    if pman.get("bloom_file")
                    else None
                )
                if (
                    _bloom_config(pman) == bcfg
                    and ppath
                    and os.path.exists(ppath)
                ):
                    parent_bm = spark.read.parquet(ppath).filter(
                        F.col("file").isin(carried_files)
                    )
                    # bounded collect: one row per carried file
                    have = {
                        r["file"]
                        for r in parent_bm.select("file").collect()
                    }
                    missing = [f for f in carried_files if f not in have]
                    if len(missing) < len(carried_files):
                        carried_bm = parent_bm
            if missing:
                fresh = _file_blooms_rel(spark, table_dir, missing, **bcfg)
                carried_bm = (
                    fresh
                    if carried_bm is None
                    else carried_bm.unionByName(fresh)
                )
            blooms = (
                carried_bm
                if blooms is None
                else carried_bm.unionByName(blooms)
            )
        if blooms is not None:
            bloom_file = f"v{version}_blooms-{token}.parquet"
            blooms.write.mode("overwrite").parquet(
                os.path.join(_manifest_dir(table_dir), bloom_file)
            )
    manifest = {
        "version": version,
        "parent": parent,
        "operation": operation,
        "files": files,
        "stats_cols": list(stats_cols) if stats_cols else None,
    }
    if stats_file:
        manifest["stats_file"] = stats_file
    if bcfg:
        manifest["bloom_cols"] = bcfg["cols"]
        manifest["bloom_bits"] = bcfg["bits"]
        manifest["bloom_hashes"] = bcfg["hashes"]
        manifest["bloom_salt"] = bcfg["salt"]
        if bloom_file:
            manifest["bloom_file"] = bloom_file
    if extra_meta:
        manifest.update(extra_meta)
    mpath = _manifest_path(table_dir, version)
    tmp = mpath + f".tmp-{token}"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    try:
        # Atomic put-if-absent: link the fully-written temp file to the
        # manifest name — the COMMIT POINT.  Exactly one of N racing
        # writers succeeds; everyone else gets FileExistsError.
        os.link(tmp, mpath)
    except FileExistsError:
        import shutil

        for side in (stats_file, bloom_file):
            if side:
                shutil.rmtree(
                    os.path.join(_manifest_dir(table_dir), side),
                    ignore_errors=True,
                )
        raise CommitConflictError(
            f"version {version} of {table_dir} was committed by another "
            "writer — retry against the new parent"
        ) from None
    finally:
        try:
            os.remove(tmp)
        except OSError:
            pass
    # Pointer-cache flip.  Check-then-write, NOT atomic: two racing
    # committers can interleave so a slow older writer transiently
    # regresses the pointer (v5 overwriting v6's flip).  That is
    # tolerated by design — latest_version() always scans FORWARD from
    # the cached value over the manifest dir, so reads stay correct
    # and the pointer self-heals on the next commit; the only cost is
    # extra manifest stat calls until then.
    cur = -1
    if os.path.exists(_latest_path(table_dir)):
        try:
            with open(_latest_path(table_dir)) as fh:
                cur = int(fh.read().strip())
        except ValueError:
            cur = -1
    if version > cur:
        ltmp = _latest_path(table_dir) + f".tmp-{token}"
        with open(ltmp, "w") as fh:
            fh.write(str(version))
        os.replace(ltmp, _latest_path(table_dir))


def read_versioned(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Read a snapshot: the latest by default, or any committed
    ``version`` (time travel).  The scan is the manifest's exact file
    list — ordinary parquet, so pushdown/pruning apply unchanged.
    ``merge_schema=True`` reconciles schema evolution across commits
    (an appended version may carry new columns; older files read them
    as NULL — Delta/Iceberg add-column parity) at the cost of reading
    every file's footer."""
    v = latest_version(table_dir) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    manifest = _read_manifest(table_dir, v)
    if not manifest["files"]:
        raise FileNotFoundError(f"version {v} of {table_dir} is empty")
    paths = [os.path.join(table_dir, f) for f in manifest["files"]]
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*paths)


def stats_summary(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """METADATA-ONLY table summary from the commit-log stats: row
    count, per-column min/max/null-count — computed from the stats
    table alone, zero data files opened (the Delta 'SELECT count(*)'
    optimization).  One row; column set mirrors the commit's
    stats_cols.  Exactness asserted against full scans in tests."""
    from pyspark.sql import functions as F

    v = latest_version(table_dir) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    man = _read_manifest(table_dir, v)
    cols = man.get("stats_cols")
    if not cols:
        raise ValueError(
            f"version {v} of {table_dir} was committed without stats_cols"
        )
    stats = spark.read.parquet(_stats_path(table_dir, v))
    aggs = [F.sum("n_rows").alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(f"min_{c}").alias(f"min_{c}"),
            F.max(f"max_{c}").alias(f"max_{c}"),
            F.sum(f"nulls_{c}").alias(f"nulls_{c}"),
        ]
    return stats.agg(*aggs)


def read_versioned_skipping(
    spark: SparkSession,
    table_dir: str,
    keep,
    version: int | None = None,
) -> DataFrame:
    """Time travel WITH data skipping: scan only the files of snapshot
    ``version`` whose commit-log stats survive the ``keep`` predicate
    (over ``min_*``/``max_*``/``nulls_*``/``n_rows`` — same contract as
    layout.prune_files).  Skipping is a superset guarantee, so
    ``read_versioned_skipping(...).filter(p)`` ≡
    ``read_versioned(...).filter(p)`` with fewer files opened (both
    asserted in tests/test_versioned.py).  The version must have been
    committed with ``stats_cols``."""
    v = latest_version(table_dir) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    if not _read_manifest(table_dir, v).get("stats_cols"):
        raise ValueError(
            f"version {v} of {table_dir} was committed without stats_cols"
        )
    from sparkgraft.sinks.layout import manifest_local_df

    stats = manifest_local_df(spark, _stats_path(table_dir, v))
    rel = sorted(r["file"] for r in stats.filter(keep).select("file").collect())
    if not rel:
        return read_versioned(spark, table_dir, v).limit(0)
    return spark.read.parquet(*[os.path.join(table_dir, f) for f in rel])


def read_versioned_bloom(
    spark: SparkSession,
    table_dir: str,
    eq: dict,
    version: int | None = None,
) -> DataFrame:
    """Time travel WITH Bloom equality skipping: scan only the files
    of snapshot ``version`` whose commit-log Bloom bitmaps might
    contain EVERY ``col = value`` in ``eq`` (conjunctive point
    lookup).  A list/tuple/set value means ``col IN (...)`` — ONE
    pruned read over the union of per-value survivors (the batched
    form; N sequential point reads would pay the manifest + scan
    overhead N times).  Blooms have no false negatives by
    construction (probe
    positions replay the build's md5 hashing with the commit's
    recorded bits/hashes/salt), so
    ``read_versioned_bloom(...).filter(p)`` ≡
    ``read_versioned(...).filter(p)`` with fewer files opened — the
    pruning min/max stats can't do for point predicates on
    high-cardinality unsorted columns.  Files absent from the bloom
    table are conservatively kept (the staleness guard; the commit
    coverage invariant makes this unreachable for tables written by
    this module).  The version must descend from a commit with
    ``bloom_cols`` covering every queried column."""
    from pyspark.sql import functions as F

    from sparkgraft.sinks.layout import bloom_keep

    v = latest_version(table_dir) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    man = _read_manifest(table_dir, v)
    bcfg = _bloom_config(man)
    if bcfg is None or any(c not in bcfg["cols"] for c in eq):
        raise ValueError(
            f"version {v} of {table_dir} has no Bloom index covering "
            f"{sorted(eq)} (bloom_cols={bcfg and bcfg['cols']})"
        )
    if not man["files"]:
        raise FileNotFoundError(f"version {v} of {table_dir} is empty")
    keep = None
    for c, value in eq.items():
        vals = (
            list(value)
            if isinstance(value, (list, tuple, set, frozenset))
            else [value]
        )
        term = None
        for one in vals:
            t_ = bloom_keep(
                c, one, bits=bcfg["bits"], hashes=bcfg["hashes"],
                salt=bcfg["salt"],
            )
            term = t_ if term is None else (term | t_)
        keep = term if keep is None else (keep & term)
    indexed, kept = set(), set()
    if man.get("bloom_file"):
        from sparkgraft.sinks.layout import manifest_local_df

        bm = manifest_local_df(
            spark, os.path.join(_manifest_dir(table_dir), man["bloom_file"])
        ).filter(F.col("file").isin(man["files"]))
        # ONE bounded collect (one row per manifest file) carrying the
        # keep verdict — previously two sequential driver round-trips
        # (r13 optimization round, guide §1; NULL verdicts — files
        # missing a probed bitmap — stay un-kept, exactly as the
        # filter(keep) form dropped them).
        rows = bm.select("file", keep.alias("__keep")).collect()
        indexed = {r["file"] for r in rows}
        kept = {r["file"] for r in rows if r["__keep"]}
    rel = sorted(kept | (set(man["files"]) - indexed))
    if not rel:
        return read_versioned(spark, table_dir, v).limit(0)
    return spark.read.parquet(*[os.path.join(table_dir, f) for f in rel])


def _touched_files(
    spark: SparkSession, table_dir: str, version: int, stats_keep
) -> tuple[list[str], list[str]]:
    """Split a snapshot's files into (touched, untouched) under a
    commit-log stats predicate: untouched files PROVABLY contain no
    affected row (their stats fail ``stats_keep``) and carry over to
    the child version unrewritten.  Files not covered by the stats
    table (or with NULL stats) are conservatively touched — the
    bloom-manifest staleness discipline."""
    man = _read_manifest(table_dir, version)
    if stats_keep is None or not man.get("stats_cols"):
        return list(man["files"]), []
    from pyspark.sql import functions as F

    from sparkgraft.sinks.layout import manifest_local_df

    stats = manifest_local_df(spark, _stats_path(table_dir, version))
    rows = stats.withColumn("_keep", stats_keep).select("file", "_keep").collect()
    keep_map = {r["file"]: r["_keep"] for r in rows}
    touched, untouched = [], []
    for f in man["files"]:
        if keep_map.get(f, True) is False:
            untouched.append(f)
        else:
            touched.append(f)
    return touched, untouched


def delete_versioned(
    spark: SparkSession,
    table_dir: str,
    predicate,
    stats_keep=None,
    sort_col: str | None = None,
    n_files: int | None = None,
    retries: int = 20,
) -> int:
    """Copy-on-write DELETE (Delta/Iceberg ``DELETE WHERE`` parity):
    commit a new version without the rows matching ``predicate``.
    With ``stats_keep`` (a file-stats predicate over-approximating
    "this file may contain a matching row"), only the stats-surviving
    files are read and rewritten — every other file carries over to
    the new manifest METADATA-ONLY, its stats rows copied from the
    parent commit.  At 100 TB a targeted delete rewrites the handful
    of files whose ranges overlap the predicate, not the table.

    SQL NULL semantics: rows where ``predicate`` is NULL are KEPT
    (DELETE removes only TRUE matches).  The parent version stays
    readable (time travel); ``vacuum`` reclaims rewritten files.

    Concurrency: the deleted row set depends on the parent snapshot,
    so a commit conflict RE-PLANS against the new parent (the loser's
    landed files are removed), up to ``retries`` times."""
    from pyspark.sql import functions as F

    parent = latest_version(table_dir)
    if parent is None:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    for attempt in range(retries + 1):
        man = _read_manifest(table_dir, parent)
        version = parent + 1
        touched, untouched = _touched_files(
            spark, table_dir, parent, stats_keep
        )
        new_files: list[str] = []
        if touched:
            remain = spark.read.parquet(
                *[os.path.join(table_dir, f) for f in touched]
            ).filter(~F.coalesce(predicate, F.lit(False)))
            new_files = _land_files(
                remain, table_dir, version, sort_col, n_files
            )
        try:
            _commit(
                spark, table_dir, version, parent, "delete",
                untouched + new_files, man.get("stats_cols"), new_files,
                untouched,
            )
            return version
        except CommitConflictError:
            _remove_files(table_dir, new_files)
            if attempt == retries:
                raise
            parent = latest_version(table_dir)
    raise AssertionError("unreachable")


def upsert_versioned(
    spark: SparkSession,
    table_dir: str,
    source: DataFrame,
    key_cols: list[str],
    stats_keep=None,
    sort_col: str | None = None,
    n_files: int | None = None,
    extra_meta: "dict | None" = None,
    retries: int = 20,
) -> int:
    """Copy-on-write MERGE upsert (``MERGE INTO ... WHEN MATCHED
    UPDATE WHEN NOT MATCHED INSERT`` parity): commit a new version
    where every target row whose key appears in ``source`` is replaced
    by the source row, and source rows with new keys are inserted.

    File pruning: when every key column carries commit-log stats, the
    touched set is derived automatically from the source's per-column
    key ranges — files whose [min, max] provably exclude every source
    key (disjoint on ANY key column — conjunctive pruning for
    composite keys) carry over metadata-only (their stats rows copied
    from the parent).  Pass
    ``stats_keep`` to prune on a custom predicate; it must
    over-approximate "this file may contain a source key" (soundness
    contract — an untouched file with a source key would silently skip
    the update).

    Source keys must be UNIQUE (Delta parity: MERGE errors when a
    target row matches multiple source rows) — duplicates raise
    instead of silently committing duplicate key rows; pre-dedup with
    an explicit rule (merge_sink keeps the newest per key by its order
    column).  NULL source keys never match a target row (SQL equality)
    and INSERT alongside any existing NULL-key rows.

    Concurrency: the merged row set depends on the parent snapshot, so
    a commit conflict RE-PLANS against the new parent (the loser's
    landed files are removed), up to ``retries`` times — two writers
    merging different keys against the same parent both land, serially
    ordered, with neither update lost."""
    from pyspark.sql import functions as F

    parent = latest_version(table_dir)
    if parent is None:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    # NULL-key rows are exempt from the uniqueness check: a NULL key
    # never matches any target row (SQL equality), so multiple NULL-key
    # sources are legitimate independent INSERTs, not a MERGE conflict.
    nonnull = source
    for k in key_cols:
        nonnull = nonnull.filter(F.col(k).isNotNull())
    dup = (
        nonnull.groupBy(*key_cols)
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        key = {k: dup[0][k] for k in key_cols}
        raise ValueError(
            f"upsert_versioned: duplicate source key {key} — MERGE "
            "requires unique source keys; dedup first (e.g. newest per "
            "key by an order column, as merge_sink does)"
        )
    auto_keep = stats_keep is None
    for attempt in range(retries + 1):
        man = _read_manifest(table_dir, parent)
        stats_cols = man.get("stats_cols") or []
        if auto_keep:
            # Re-derived per attempt: a conflict's new parent may carry
            # DIFFERENT stats_cols, and a stale predicate referencing
            # min_/max_ columns absent from the new stats table would
            # crash the retry instead of falling back to all-files.
            stats_keep = None
        if (
            auto_keep
            and key_cols
            and all(k in stats_cols for k in key_cols)
        ):
            # Composite keys prune conjunctively: a file MAY contain a
            # source key only if its [min, max] overlaps the source's
            # range on EVERY key column — disjointness on ANY column
            # proves no tuple equality (sound over-approximation).  A
            # file whose stats are NULL on some column (all values
            # NULL there — min/max ignore NULLs) makes the conjunction
            # NULL, and _touched_files treats a NULL _keep as touched:
            # such files are conservatively REWRITTEN, not pruned — a
            # missed pruning, never a missed match (they can't match
            # on the all-NULL column, but proving that isn't worth a
            # special case for a degenerate stats shape).
            aggs = []
            for k in key_cols:
                aggs += [F.min(k).alias(f"lo_{k}"), F.max(k).alias(f"hi_{k}")]
            bounds = source.agg(*aggs).first()
            if any(bounds[f"lo_{k}"] is None for k in key_cols):
                # Some key column is entirely NULL in the source: no
                # source row can match any target row — pure insert.
                stats_keep = F.lit(False)
            else:
                conj = None
                for k in key_cols:
                    term = (
                        F.col(f"max_{k}") >= F.lit(bounds[f"lo_{k}"])
                    ) & (F.col(f"min_{k}") <= F.lit(bounds[f"hi_{k}"]))
                    conj = term if conj is None else (conj & term)
                stats_keep = conj
        version = parent + 1
        touched, untouched = _touched_files(
            spark, table_dir, parent, stats_keep
        )
        if touched:
            target = spark.read.parquet(
                *[os.path.join(table_dir, f) for f in touched]
            )
            merged = target.join(
                source.select(*key_cols), key_cols, "left_anti"
            ).unionByName(source)
        else:
            merged = source
        new_files = _land_files(merged, table_dir, version, sort_col, n_files)
        try:
            _commit(
                spark, table_dir, version, parent, "merge",
                untouched + new_files, man.get("stats_cols"), new_files,
                untouched, extra_meta,
            )
            return version
        except CommitConflictError:
            _remove_files(table_dir, new_files)
            if attempt == retries:
                raise
            parent = latest_version(table_dir)
    raise AssertionError("unreachable")


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
    spark: SparkSession,
    table_dir: str,
    target_files: int = 1,
    zorder_cols: "list[str] | None" = None,
    zorder_bits: int = 8,
    stats_cols: "list[str] | None" = None,
    extra_meta: "dict | None" = None,
) -> int:
    """OPTIMIZE: rewrite the latest snapshot into ``target_files``
    files and commit the result as a new version (operation recorded
    as overwrite of identical data — history keeps the pre-compaction
    version readable until vacuumed).  The small-file answer for a
    streaming ingest that lands one version per trigger.

    ``zorder_cols`` = OPTIMIZE ZORDER parity: the rewrite range-
    partitions + sorts on the interleaved Morton key
    (layout.zorder_key; columns must be integer-quantized), so with
    ``stats_cols`` the recommitted per-file stats prune range filters
    on EVERY interleaved dimension."""
    latest = read_versioned(spark, table_dir)
    if zorder_cols:
        from pyspark.sql import functions as F

        from sparkgraft.sinks.layout import zorder_key

        keyed = latest.withColumn(
            "_zkey",
            zorder_key([F.col(c) for c in zorder_cols], zorder_bits),
        )
        compacted = (
            keyed.repartitionByRange(target_files, "_zkey")
            .sortWithinPartitions("_zkey")
            .drop("_zkey")
        )
        return write_versioned(
            compacted, table_dir, mode="overwrite", stats_cols=stats_cols,
            extra_meta=extra_meta,
        )
    return write_versioned(
        latest.coalesce(target_files), table_dir, mode="overwrite",
        stats_cols=stats_cols, extra_meta=extra_meta,
    )


def vacuum(
    table_dir: str,
    keep_versions: int = 1,
    min_file_age_sec: float = 600.0,
) -> list[str]:
    """Remove data files unreachable from the newest ``keep_versions``
    manifests (crash orphans and compacted-away history).  Returns the
    deleted file names.  Never touches manifests — history stays
    auditable even after its data is vacuumed.

    Files referenced by NO manifest at all are spared while younger
    than ``min_file_age_sec``: under the optimistic-concurrency commit
    protocol a concurrent writer lands its token-named data files
    BEFORE claiming the manifest, so a zero-grace vacuum could delete
    an in-flight commit's files and leave its (subsequently
    successful) manifest pointing at nothing — the retention-window
    rule Delta's VACUUM applies to uncommitted files.  Files
    referenced by a SUPERSEDED manifest (compacted/rewritten history)
    are committed, never in-flight, and delete immediately regardless
    of age.  Pass 0 only when no writer can be live."""
    import time

    newest = latest_version(table_dir)
    if newest is None:
        return []
    keep = set()
    referenced = set()
    for v in range(0, newest + 1):
        files = _read_manifest(table_dir, v)["files"]
        referenced.update(files)
        if v >= newest - keep_versions + 1:
            keep.update(files)
    data_dir = os.path.join(table_dir, "data")
    now = time.time()
    deleted = []
    for name in sorted(os.listdir(data_dir)):
        rel = os.path.join("data", name)
        full = os.path.join(data_dir, name)
        if os.path.isdir(full):
            continue
        if rel not in keep:
            if rel not in referenced:
                # never committed: possibly an in-flight writer's file
                try:
                    if now - os.path.getmtime(full) < min_file_age_sec:
                        continue
                except OSError:
                    continue  # already gone (concurrent cleanup)
            os.remove(full)
            deleted.append(rel)
    return deleted

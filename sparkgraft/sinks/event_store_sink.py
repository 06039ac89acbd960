"""K5's atomic JSON event store as a STREAMING SINK through the Python
Data Source API (Spark 4): ``df.writeStream.format("jsonstore")``.

The reference's event store (`event_store/main.py`) writes one
``event_<id>.json`` per event with an atomic rename and maintains
``latest.json``; this sink gives that contract exactly-once streaming
semantics with the V2 two-phase commit protocol:

- ``write`` (executors): each task stages its rows as one JSON-lines
  file under ``<path>/_staging`` — no visible mutation yet.
- ``commit`` (driver, all tasks succeeded): a ``_commits/<batchId>``
  marker makes replays no-ops; events promote via write-temp +
  ``os.replace`` (atomic on POSIX), so a crash mid-commit never leaves
  a torn event file; same-id events last-write-win (content-id dedup
  lands upstream, D3); ``latest.json`` re-points at the newest
  timestamp.
- ``abort``: staged files are dropped; nothing was visible.

``path`` must be storage every node and the driver can reach (local
FS in tests; NFS/object storage behind a mount in production — the
same requirement Spark's own file sinks have).
"""

from __future__ import annotations

import glob
import json
import os
import uuid

import hashlib
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)

# Filename-safe event id: anything else is hashed before it touches the
# filesystem.  The reference store never trusts data for filenames — it
# builds them from a hash it computes itself (restapi/app_fs.py:42-54);
# we keep readable names for well-behaved ids but apply the same rule
# for hostile ones ('../x', 'a/b', empty) so stream data can never
# steer a write outside the store directory.
_SAFE_ID = re.compile(r"^[A-Za-z0-9._-]{1,128}$")


def _safe_stem(eid) -> str:
    s = "" if eid is None else str(eid)
    if _SAFE_ID.match(s) and ".." not in s:
        return s
    return hashlib.sha256(s.encode("utf-8")).hexdigest()[:16]


class JsonStoreCommitMessage(WriterCommitMessage):
    def __init__(self, files: list[str]):
        self.files = files


class JsonStoreStreamWriter(DataSourceStreamWriter):
    def __init__(self, options, schema=None):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonstore sink requires a path")
        self.id_col = options.get("idcol", "event_id")
        self.ts_col = options.get("tscol", "stored_at")
        # Fail at query construction, not inside commit(), when the
        # stream schema doesn't carry the configured columns — a
        # KeyError in commit() would crash-loop the query.
        if schema is not None:
            names = set(schema.fieldNames())
            missing = [c for c in (self.id_col, self.ts_col) if c not in names]
            if missing:
                raise ValueError(
                    f"jsonstore sink: column(s) {missing} absent from the "
                    f"stream schema {sorted(names)}; set idcol/tscol options"
                )

    # -- executor side -----------------------------------------------------

    def write(self, iterator):
        rows = [r.asDict() for r in iterator]
        if not rows:
            return JsonStoreCommitMessage([])
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        fname = os.path.join(staging, f"task-{uuid.uuid4().hex}.jsonl")
        with open(fname, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r, default=str, sort_keys=True) + "\n")
        return JsonStoreCommitMessage([fname])

    # -- driver side -------------------------------------------------------

    def _staged(self, messages):
        for m in messages:
            if m is not None:
                yield from m.files

    def _sweep_staging(self) -> None:
        # Batches execute serially, so once a batch is committed or
        # aborted NOTHING under _staging is live — including files from
        # failed/retried task attempts that never made it into a commit
        # message and would otherwise accumulate forever.
        staging = os.path.join(self.path, "_staging")
        for f in glob.glob(os.path.join(staging, "task-*.jsonl")):
            try:
                os.remove(f)
            except FileNotFoundError:
                pass

    def commit(self, messages, batchId: int) -> None:
        marker_dir = os.path.join(self.path, "_commits")
        marker = os.path.join(marker_dir, str(batchId))
        staged = list(self._staged(messages))
        if os.path.exists(marker):
            # Replayed batch after a crash between commit and the
            # checkpoint advancing: already fully applied — drop the
            # re-staged files and acknowledge.
            self._sweep_staging()
            return
        events = []
        for f in staged:
            with open(f) as fh:
                events.extend(json.loads(line) for line in fh)
        for e in events:
            stem = _safe_stem(e.get(self.id_col))
            tmp = os.path.join(self.path, f".event_{stem}.json.tmp")
            final = os.path.join(self.path, f"event_{stem}.json")
            with open(tmp, "w") as fh:
                json.dump(e, fh, sort_keys=True)
            os.replace(tmp, final)  # atomic promote (K5 contract)
        self._update_latest(events)
        os.makedirs(marker_dir, exist_ok=True)
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(json.dumps({"n_events": len(events)}))
        os.replace(tmp, marker)
        self._sweep_staging()

    def _update_latest(self, events) -> None:
        candidates = [e for e in events if e.get(self.ts_col) is not None]
        if not candidates:
            return
        newest = max(
            candidates,
            key=lambda e: (str(e[self.ts_col]), str(e.get(self.id_col, ""))),
        )
        latest_path = os.path.join(self.path, "latest.json")
        if os.path.exists(latest_path):
            with open(latest_path) as fh:
                cur = json.load(fh)
            if cur.get(self.ts_col) is not None and (
                str(cur[self.ts_col]),
                cur.get(self.id_col, ""),
            ) >= (str(newest[self.ts_col]), str(newest.get(self.id_col, ""))):
                return
        tmp = latest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(newest, fh, sort_keys=True)
        os.replace(tmp, latest_path)

    def abort(self, messages, batchId: int) -> None:
        self._sweep_staging()


class JsonStoreDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonstore"

    def streamWriter(self, schema, overwrite: bool):
        return JsonStoreStreamWriter(self.options, schema)


def register_jsonstore_sink(spark) -> None:
    """Register for this session:
    ``df.writeStream.format("jsonstore").option("path", dir)``."""
    spark.dataSource.register(JsonStoreDataSource)


def read_event_store(path: str) -> list[dict]:
    """Driver-side helper: load all committed events (tests/tools)."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "event_*.json"))):
        with open(f) as fh:
            out.append(json.load(fh))
    return out

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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)


class JsonStoreCommitMessage(WriterCommitMessage):
    def __init__(self, files: list[str]):
        self.files = files


class JsonStoreStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonstore sink requires a path")
        self.id_col = options.get("idcol", "event_id")
        self.ts_col = options.get("tscol", "stored_at")

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

    def commit(self, messages, batchId: int) -> None:
        marker_dir = os.path.join(self.path, "_commits")
        marker = os.path.join(marker_dir, str(batchId))
        staged = list(self._staged(messages))
        if os.path.exists(marker):
            # Replayed batch after a crash between commit and the
            # checkpoint advancing: already fully applied — drop the
            # re-staged files and acknowledge.
            for f in staged:
                if os.path.exists(f):
                    os.remove(f)
            return
        events = []
        for f in staged:
            with open(f) as fh:
                events.extend(json.loads(line) for line in fh)
        for e in events:
            eid = e[self.id_col]
            tmp = os.path.join(self.path, f".event_{eid}.json.tmp")
            final = os.path.join(self.path, f"event_{eid}.json")
            with open(tmp, "w") as fh:
                json.dump(e, fh, sort_keys=True)
            os.replace(tmp, final)  # atomic promote (K5 contract)
        self._update_latest(events)
        os.makedirs(marker_dir, exist_ok=True)
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(json.dumps({"n_events": len(events)}))
        os.replace(tmp, marker)
        for f in staged:
            os.remove(f)

    def _update_latest(self, events) -> None:
        candidates = [e for e in events if e.get(self.ts_col) is not None]
        if not candidates:
            return
        newest = max(candidates, key=lambda e: (str(e[self.ts_col]), e[self.id_col]))
        latest_path = os.path.join(self.path, "latest.json")
        if os.path.exists(latest_path):
            with open(latest_path) as fh:
                cur = json.load(fh)
            if cur.get(self.ts_col) is not None and (
                str(cur[self.ts_col]),
                cur.get(self.id_col, ""),
            ) >= (str(newest[self.ts_col]), newest[self.id_col]):
                return
        tmp = latest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(newest, fh, sort_keys=True)
        os.replace(tmp, latest_path)

    def abort(self, messages, batchId: int) -> None:
        for f in self._staged(messages):
            if os.path.exists(f):
                os.remove(f)


class JsonStoreDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonstore"

    def streamWriter(self, schema, overwrite: bool):
        return JsonStoreStreamWriter(self.options)


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

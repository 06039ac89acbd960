"""Migration example: the reference's E3 flow (webhook → metadata fetch
→ validate → content-id → first-write-wins store → latest pointer) on
sparkgraft.

Reference: ``restapi/app_fs.py:71-141`` — a Flask endpoint that fetches
a metadata URL, validates the payload (``data_url`` plus a
``created_at``/``creation_timestamp`` field required), derives a
16-hex sha256 event id from the canonical payload, atomically writes
``event_<id>.json`` only if new, and maintains ``latest.json``.

Spark-first split (SURVEY §2.1 S6): the HTTP fetch itself is ONE
driver-side request per webhook call — not a Spark operator — so it
stays a thin adapter (``fetch_metadata_batch``).  Everything after the
fetch is engine work and runs distributed: validation is a filter,
id assignment is ``with_event_ids`` (F8), dedup is ``dedup_events``
(D3), and the latest pointer is a ``max_by`` — which is what matters
when the same projection replays a backlog of millions of stored
events instead of one webhook.

Run:  python examples/e3_event_store.py [store_dir]
(no network needed — the default fetcher serves deterministic fake
metadata; pass real URLs + ``fetch=requests_fetch`` in production).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkgraft.sinks.kv import dedup_events, with_event_ids  # noqa: E402

EVENT_SCHEMA = (
    "metadata_url string, message_type string, created_at string, "
    "data_url string, version string, stored_at timestamp"
)


def requests_fetch(url: str) -> dict:
    """Production fetcher (app_fs.py:71-95): GET + JSON decode.
    Import-gated — this container has no ``requests``/network."""
    try:
        import requests
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "requests not installed; pass a custom fetch callable"
        ) from e
    resp = requests.get(url, timeout=30)
    resp.raise_for_status()
    return resp.json()


def fake_fetch(url: str) -> dict:
    """Deterministic offline stand-in for the metadata endpoint."""
    import hashlib

    n = int(hashlib.md5(url.encode()).hexdigest(), 16) % 3
    meta = {
        "message_type": "new_data",
        "data_url": f"{url}/data.bin",
        "version": "1",
    }
    # Every third URL is invalid (missing timestamp) to exercise the
    # validation path.
    if n != 2:
        meta["created_at"] = f"2025-01-0{n + 1}T00:00:00Z"
    return meta


def fetch_metadata_batch(
    urls: list[str], fetch: Callable[[str], dict] | None = None
) -> list[tuple]:
    """S6 adapter: fetch each metadata URL driver-side and shape rows
    for ``spark.createDataFrame`` (EVENT_SCHEMA).  Fetch failures become
    rows with NULL payload fields, which the validate step rejects —
    mirroring app_fs.py's 4xx/5xx aborts without stopping the batch."""
    import datetime as dt

    fetch = fetch or fake_fetch
    rows = []
    for i, url in enumerate(urls):
        try:
            meta = fetch(url)
        except Exception:
            meta = {}
        rows.append(
            (
                url.strip(),
                meta.get("message_type"),
                meta.get("created_at") or meta.get("creation_timestamp"),
                meta.get("data_url"),
                str(meta.get("version")) if meta.get("version") is not None else None,
                # deterministic stand-in for iso_now(): arrival order
                dt.datetime(2025, 6, 1, 0, 0, i),
            )
        )
    return rows


def validate_events(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """app_fs.py:92-95 — require ``data_url`` and a timestamp; returns
    (valid, rejected)."""
    ok = F.col("data_url").isNotNull() & F.col("created_at").isNotNull()
    return df.filter(ok), df.filter(~ok)


def event_store(df: DataFrame) -> DataFrame:
    """validate → content-id → first-write-wins dedup (the E3 engine
    projection; oracle-checked as ``event_store_dedup``)."""
    valid, _ = validate_events(df)
    with_ids = with_event_ids(
        valid, "metadata_url", "message_type", "created_at", "data_url", "version"
    )
    return dedup_events(with_ids, "stored_at")


def write_store(deduped: DataFrame, store_dir: str) -> None:
    """K5 — atomic ``event_<id>.json`` files + ``latest.json`` pointer
    (app_fs.py:57-69,126-129).  Event results are tiny (one row per
    unique event in the batch), so the atomic-rename writes run
    driver-side like the reference."""
    os.makedirs(store_dir, exist_ok=True)

    def atomic_write(path: str, obj: dict) -> None:
        fd, tmp = tempfile.mkstemp(prefix=".tmp_", dir=store_dir)
        with os.fdopen(fd, "w", encoding="utf-8") as fh:
            json.dump(obj, fh, ensure_ascii=False, default=str)
        os.replace(tmp, path)

    rows = deduped.collect()
    for r in rows:
        path = os.path.join(store_dir, f"event_{r['event_id']}.json")
        if not os.path.exists(path):  # first write wins
            atomic_write(path, r.asDict())
    if rows:
        latest = max(rows, key=lambda r: r["stored_at"])
        atomic_write(os.path.join(store_dir, "latest.json"), latest.asDict())


def main(store_dir: str) -> None:
    spark = (
        SparkSession.builder.master("local[4]").appName("e3-event-store").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    urls = [f"http://sensor-{i}/meta" for i in range(8)]
    # Duplicate submissions of the same URL → same payload → same id.
    urls += urls[:3]
    batch = spark.createDataFrame(fetch_metadata_batch(urls), EVENT_SCHEMA)

    valid, rejected = validate_events(batch)
    deduped = event_store(batch)
    write_store(deduped, store_dir)

    n_all, n_rej, n_kept = batch.count(), rejected.count(), deduped.count()
    print(f"fetched={n_all} rejected={n_rej} stored={n_kept}")
    with open(os.path.join(store_dir, "latest.json"), encoding="utf-8") as fh:
        print("latest:", json.load(fh)["event_id"])
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="e3_store_"))

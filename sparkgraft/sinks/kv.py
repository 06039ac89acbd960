"""KV-projection sinks (SURVEY §2.10 K1/K3/K4/K5, §2.2 P2, §2.7 D3).

The reference's sinks are Redis hashes, a Modbus float32 register image
and an atomic-JSON event store.  Each is modeled as a DataFrame
projection here — the transport (redis client, pymodbus, HTTP) is a
thin ``foreachBatch`` adapter around these, so the *semantics* are
testable without services, and at scale the projections run
distributed while only the final tiny batch touches the transport.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkgraft.functions.expr import content_id

# Driver-side sinks (K1/K2) exist for exact-name single-file contracts
# on *tiny* per-file results; this cap makes a misuse on a big frame
# fail loudly instead of OOMing the driver.
MAX_DRIVER_SINK_ROWS = 1_000_000


def _guard_driver_sink(df: DataFrame, sink: str) -> None:
    n = df.limit(MAX_DRIVER_SINK_ROWS + 1).count()
    if n > MAX_DRIVER_SINK_ROWS:
        raise ValueError(
            f"{sink}: result exceeds {MAX_DRIVER_SINK_ROWS} rows — this "
            "driver-side single-file sink is for tiny per-file outputs; "
            "use df.write.csv/parquet for large results"
        )


def stats_to_kv(stats: DataFrame, key_col: str = "channel", file_stem: str | None = None) -> DataFrame:
    """P2/K3 — per-channel stats → Redis-hash-style (field, value) rows.

    Reference: udbf_file_analysis.py:69-87 (``stats:<stem>`` hash with
    ``<channel>:mean|min|max`` fields, values stringified; NaN → "").
    """
    metric_cols = [c for c in stats.columns if c != key_col]
    pairs: list = []
    for m in metric_cols:
        pairs.append(F.lit(m))
        pairs.append(F.col(m))
    long = stats.select(
        F.col(key_col), F.explode(F.create_map(*pairs)).alias("metric", "v")
    )
    field = F.concat_ws(":", F.col(key_col), F.col("metric"))
    if file_stem is not None:
        field = F.concat_ws(":", F.lit(file_stem), field)
    value = F.when(F.isnan(F.col("v")), F.lit("")).otherwise(
        F.col("v").cast("string")
    )
    return long.select(field.alias("field"), value.alias("value"))


def register_image(kv: DataFrame, mapping: DataFrame) -> DataFrame:
    """J1/K4 — broadcast mapping join producing the float32 register
    image (modbus_writer.py:100-122; float spans 2 registers, :67)."""
    return kv.join(F.broadcast(mapping), "field", "inner").select(
        "register",
        F.col("value").cast("double").cast("float").alias("reg_value"),
    )


def with_event_ids(events: DataFrame, *id_fields: str) -> DataFrame:
    """F8 — content-hash event ids (restapi/app_fs.py:42-51)."""
    return events.withColumn("event_id", content_id(*id_fields))


def dedup_events(events_with_ids: DataFrame, order_col: str) -> DataFrame:
    """D3 — first-write-wins content dedup (app_fs.py:123-125: skip
    write if the id already exists)."""
    return (
        events_with_ids.groupBy("event_id")
        .agg(
            F.min_by(F.struct(*[c for c in events_with_ids.columns]), F.col(order_col)).alias("e")
        )
        .select("e.*")
    )


def write_matlab(samples: DataFrame, path: str, sample_rate: float) -> None:
    """K2 — MATLAB ``.mat`` export of a long-form sample table.

    Reference: DataConverterUDBF.py:181-211 (per-channel dict; channel 0
    packs relative/absolute time, date, time, ms) — an *optional* sink
    the live flow never calls (udbf_file_analysis.py:64-66).  The
    channel packing here is real; the final serialization needs scipy,
    which this container doesn't ship (import-gated, like the media
    codecs in ``operators.multimodal``).
    """
    try:
        from scipy.io import savemat
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "K2 .mat export needs scipy (not installed); the reference "
            "treats this sink as optional (never wired into the live flow)"
        ) from e

    _guard_driver_sink(samples, "write_matlab")
    pdf = samples.toPandas().sort_values(["channel", "ts"])
    mat: dict = {}
    for i, (ch, grp) in enumerate(pdf.groupby("channel")):
        ts = grp["ts"]
        rel = (ts - ts.iloc[0]).dt.total_seconds().to_numpy()
        mat[f"channel_{i}"] = {
            "name": ch,
            "values": grp["value"].to_numpy(),
            "relative_time": rel,
            "absolute_time": ts.astype("int64").to_numpy() / 1e9,
            "sample_rate": sample_rate,
        }
    savemat(path, mat)


def write_stats_csv(stats, path: str) -> None:
    """K1 — single-file stats CSV with exact name fidelity
    (``<stem>_stats.csv``, DataConverterUDBF.py:268-279).

    Stats results are tiny (one row per channel); collecting to the
    driver for an exact-named single file matches the reference
    contract, while large results should use ``df.write.csv``.
    """
    _guard_driver_sink(stats, "write_stats_csv")
    stats.toPandas().to_csv(path, index=False)


def observed_write(
    df,
    path: str,
    metrics: dict[str, "Column"] | None = None,
    mode: str = "overwrite",
) -> dict[str, object]:
    """Write a DataFrame while collecting inline metrics in the SAME
    pass (Spark's ``Observation`` API) — row counts / null counts /
    sums come back without a second scan of the data, which at 100 TB
    is the difference between free observability and doubling the job.

    Returns the observed metrics dict (always includes ``n_rows``).
    Reference parity: the converters log per-file row/channel counts
    while writing (DataConverterUDBF.py's post-write prints); here the
    counters ride the write itself.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    mets = {"n_rows": F.count(F.lit(1)).alias("n_rows")}
    for name, col in (metrics or {}).items():
        mets[name] = col.alias(name)
    obs = Observation()
    observed = df.observe(obs, *mets.values())
    observed.write.mode(mode).parquet(path)
    return dict(obs.get)

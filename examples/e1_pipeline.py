"""Migration example: the reference's E1 flow (LPI logger files →
per-channel stats → Redis hash → Modbus register image) on sparkgraft.

In the reference this is three containers, five threads and a queue
(SURVEY.md §3 E1).  Here it is one streaming pipeline definition plus
two projection sinks; run it against a directory of SGRF sample files
(or adapt `transform` for CSV/parquet loggers).

Run:  python examples/e1_pipeline.py /path/to/arrivals
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sparkgraft import api as sg  # noqa: E402


def main(arrivals_dir: str) -> None:
    spark = sg.get_spark("e1-pipeline")

    health = sg.HealthBoard()
    kv_store: dict[str, str] = {}  # stand-in for a Redis client

    # Register mapping (modbus/setup/mapping.json analog): in production
    # load with spark.read.json; broadcast-joined against the stats KV.
    mapping = spark.createDataFrame(
        [("T_T1_L2:mean", 100), ("T_T1_L2:min", 102), ("T_T1_L2:max", 104)],
        "field string, register int",
    )

    def transform(batch):
        # batch = one logger file's binary rows (binaryFile schema).
        samples = sg.decode_sample_files(batch)
        # Restart-transient suppression (P3) + per-channel stats (A1).
        t0 = samples.agg(F.min("ts")).collect()[0][0]
        cleaned = samples.filter(
            F.col("ts") >= F.lit(t0) + F.expr("INTERVAL 10 SECONDS")
        )
        return sg.channel_stats(cleaned, ["channel"], "value")

    def sink(stats, stem):
        for row in sg.stats_to_kv(stats, "channel", file_stem=stem).collect():
            kv_store[row["field"]] = row["value"]  # HSET stats:<stem> ...
        image = sg.register_image(
            sg.stats_to_kv(stats, "channel"), mapping
        )
        for row in image.collect():
            print(f"register {row['register']} <- {row['reg_value']}")

    pipeline = sg.FilePipeline(
        spark,
        name="lpi_100hz",
        input_dir=arrivals_dir,
        schema="path string, modificationTime timestamp, length long, content binary",
        transform=transform,
        sink=sink,
        checkpoint_dir=f"{arrivals_dir}/_checkpoint",
        quarantine_dir=f"{arrivals_dir}/failed",
        archive_dir=f"{arrivals_dir}/finished",
        fmt="binaryFile",
        options={},
        health=health,
    )
    pipeline.run_available()  # or .start('2 seconds') for continuous mode
    print("health:", health.flags)
    print("kv fields:", len(kv_store))


def _stage_demo_arrivals(d: str) -> None:
    """Self-demo: synthesize two SGRF logger files (the test fixtures'
    format) so the example runs out of the box."""
    import numpy as np

    from sparkgraft.functions.expr import OLE_EPOCH_UNIX
    from sparkgraft.operators.multimodal import encode_sample_matrix

    os.makedirs(d, exist_ok=True)
    t0 = 1_700_000_000.0
    for i in (1, 2):
        rows = np.arange(40, dtype=float)
        mat = np.column_stack(
            [
                (t0 + 600 * i + rows * 0.5 - OLE_EPOCH_UNIX) / 86400.0,
                20.0 + rows / 10.0 + i,
            ]
        )
        with open(f"{d}/Logger1_2023-11-14_22-{i:02d}-00.dat", "wb") as fh:
            fh.write(encode_sample_matrix(["T-T1_L2"], 2.0, mat))


if __name__ == "__main__":
    target = sys.argv[1] if len(sys.argv) > 1 else "/tmp/e1_arrivals"
    if len(sys.argv) <= 1 and not os.path.isdir(target):
        _stage_demo_arrivals(target)
    main(target)

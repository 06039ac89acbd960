"""Round-11 soak: the triangle self-pair helper under ADVERSARIAL
block skew (VERDICT r10 task 5 — the one r10 scale claim not yet
soaked under skew; the r10 equivalence test proves correctness, this
proves the TASK-SIZE DISTRIBUTION).

Fixture: one blocking key holds 50% of ALL rows (the hot block), the
other 50% spreads over 63 cold keys — the worst case for a plain
blocked self-join, which hands the hot block its entire |hot|²/2 pair
product to ONE task.  Grown 1x/8x/32x.

Claims to prove empirically:

- **Heaviest-task share drops ~B²**: with B=8 hash sub-blocks the hot
  block's pairs spread over B(B+1)/2 = 36 cells; the heaviest cell
  (an off-diagonal block x block product) holds ~|hot|²/B² pairs =
  a 2/B² ≈ 3.1% share of the hot block's work, vs 100% for the plain
  join.  Measured by replaying the helper's own xxhash64 block
  assignment and counting pairs per (p, q) cell.

- **Wall sublinear in |hot|²**: from 8x to 32x the hot block's pair
  count grows 16x; the triangle wall must grow strictly slower (the
  B²-cell fan-out keeps all 32 cores busy, so added work amortizes
  over the idle capacity a single hot task can't use).

- **Triangle beats the plain join under skew** at every size where
  the plain join is measurable (the plain join's hot task serializes
  |hot|²/2 pair generation on one core).

Run:  python tools/soak_round11.py          # one JSON line per case
Results land in SCALE.md (round-11 section).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sparkgraft.operators.scale import triangle_self_pairs  # noqa: E402
from sparkgraft.session import get_spark  # noqa: E402

B = 8
N_COLD_KEYS = 63


def make_skewed(spark, n_rows: int):
    """50% of rows in block 'hot', the rest uniform over 63 cold keys.
    Deterministic: row i is hot iff i is even."""
    return spark.range(n_rows).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("c"), (F.col("id") % (2 * N_COLD_KEYS) // 2)))
        .alias("block"),
        F.col("id").alias("rid"),
        (F.col("id") % 97).cast("long").alias("x"),
    )


def plain_pairs(df):
    a = df.select(
        "block", F.col("rid").alias("id_a"), F.col("x").alias("x_a")
    )
    b = df.select(
        "block", F.col("rid").alias("id_b"), F.col("x").alias("x_b")
    )
    return a.join(b, "block").filter(F.col("id_a") < F.col("id_b"))


def consume(pairs) -> tuple[int, int]:
    row = pairs.agg(
        F.count("*").alias("n"), F.sum(F.col("x_a") + F.col("x_b")).alias("s")
    ).first()
    return int(row["n"]), int(row["s"] or 0)


def cell_distribution(df):
    """Replay the helper's xxhash64 block assignment and count the
    pairs each (part, p, q) join cell generates — the per-task work
    distribution the executors actually see."""
    base = df.select(
        "block",
        F.pmod(F.xxhash64("rid"), F.lit(B)).cast("int").alias("b"),
        "rid",
    )
    per_block = base.groupBy("block", "b").agg(F.count("*").alias("c"))
    l = per_block.select("block", F.col("b").alias("p"), F.col("c").alias("cl"))
    r = per_block.select("block", F.col("b").alias("q"), F.col("c").alias("cr"))
    cells = (
        l.join(r, "block")
        .filter(F.col("p") <= F.col("q"))
        .select(
            "block",
            "p",
            "q",
            F.when(
                F.col("p") == F.col("q"),
                F.col("cl") * (F.col("cl") - 1) / 2,
            )
            .otherwise(F.col("cl") * F.col("cr"))
            .cast("long")
            .alias("pairs"),
        )
    )
    agg = cells.agg(
        F.sum("pairs").alias("total"), F.max("pairs").alias("heaviest")
    ).first()
    return int(agg["total"]), int(agg["heaviest"])


def main() -> int:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    prev = None
    for mult, n_rows, run_plain in ((1, 2_000, True), (8, 16_000, True), (32, 64_000, False)):
        df = make_skewed(spark, n_rows).localCheckpoint()
        n_hot = df.filter(F.col("block") == "hot").count()

        t0 = time.time()
        n_tri, s_tri = consume(
            triangle_self_pairs(df, ["block"], "rid", ["x"], n_blocks=B)
        )
        w_tri = time.time() - t0

        total, heaviest = cell_distribution(df)
        hot_pairs = n_hot * (n_hot - 1) // 2
        heaviest_share = heaviest / hot_pairs

        rec = {
            "case": "triangle_skew",
            "mult": mult,
            "rows": n_rows,
            "hot_rows": n_hot,
            "hot_pairs": hot_pairs,
            "pairs_out": n_tri,
            "tri_wall_s": round(w_tri, 2),
            "heaviest_cell_pairs": heaviest,
            "heaviest_share_of_hot": round(heaviest_share, 4),
        }
        # claim 1: heaviest task ~2/B² of the hot block's work (the
        # plain join's share is 1.0); allow hash-imbalance slack 1.5x
        assert heaviest_share <= 1.5 * (2 / (B * B)), rec
        if run_plain:
            t0 = time.time()
            n_plain, s_plain = consume(plain_pairs(df))
            rec["plain_wall_s"] = round(time.time() - t0, 2)
            assert (n_plain, s_plain) == (n_tri, s_tri), rec
            # claim 3: triangle beats the plain join under skew
            # (skip at 1x where both are warm-up-sized)
            if mult >= 8:
                assert w_tri < rec["plain_wall_s"], rec
        if prev is not None and prev["mult"] == 8 and mult == 32:
            growth = w_tri / prev["tri_wall_s"]
            pair_growth = hot_pairs / prev["hot_pairs"]
            rec["wall_growth_8x_to_32x"] = round(growth, 2)
            rec["pair_growth_8x_to_32x"] = round(pair_growth, 2)
            # claim 2: wall sublinear in |hot|²
            assert growth < pair_growth, rec
        prev = rec
        out.append(rec)
        print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())

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

- **Wall sublinear in |hot|²**: over the 1x -> 32x span the hot
  block's pair count grows 1024x; the triangle wall (warm, best-of-2)
  must grow strictly slower — the B²-cell fan-out turns the hot
  block's serial tail into schedulable parallel work.  (8x -> 32x in
  isolation is already core-saturated on local[32], so wall tracks
  work there; the sublinearity lives in the span where a single hot
  task would otherwise serialize.)

- **Triangle beats the plain join under skew** at 8x, warm best-of-2
  (the plain join's hot task serializes |hot|²/2 pair generation +
  per-pair dots on one core).  The per-pair payload is the production
  kernels' zip_with dot: with a TRIVIAL payload both strategies are
  bounded by codegen pair-generation throughput (~40-120M pairs/s)
  and the distribution win is invisible at local[32] scale — the
  helper's value is distributing per-pair WORK and bounding the
  straggler task, which the cell-share measurement proves directly.

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


DIM = 16


def make_skewed(spark, n_rows: int):
    """50% of rows in block 'hot', the rest uniform over 63 cold keys.
    Deterministic: row i is hot iff i is even.  Each row carries a
    DIM-wide double vector so every pair costs a real dot product —
    the semantic-dedup / fuzzy-match work shape.  (With a trivial
    payload the plain join's single hot task is a bare codegen
    counter loop and nothing distinguishes the strategies; the
    helper's claim is about distributing per-pair WORK.)"""
    return spark.range(n_rows).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(
            F.concat(
                F.lit("c"),
                ((F.col("id") % (2 * N_COLD_KEYS)) / 2).cast("long"),
            )
        )
        .alias("block"),
        F.col("id").alias("rid"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda j: ((F.col("id") * j) % 97).cast("double") / 97.0,
        ).alias("vec"),
    )


def plain_pairs(df):
    a = df.select(
        "block", F.col("rid").alias("id_a"), F.col("vec").alias("vec_a")
    )
    b = df.select(
        "block", F.col("rid").alias("id_b"), F.col("vec").alias("vec_b")
    )
    return a.join(b, "block").filter(F.col("id_a") < F.col("id_b"))


def consume(pairs) -> tuple[int, float]:
    """Force a dot product per pair (the blocked-pairwise operators'
    per-pair cost shape), then reduce."""
    dot = F.aggregate(
        F.zip_with("vec_a", "vec_b", lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    row = pairs.agg(
        F.count("*").alias("n"), F.sum(dot).alias("s")
    ).first()
    return int(row["n"]), float(row["s"] or 0.0)


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
    first = None
    for mult, n_rows, run_plain in ((1, 2_000, True), (8, 16_000, True), (32, 64_000, False)):
        df = make_skewed(spark, n_rows).localCheckpoint()
        n_hot = df.filter(F.col("block") == "hot").count()

        tri = triangle_self_pairs(df, ["block"], "rid", ["vec"], n_blocks=B)
        n_tri, s_tri = consume(tri)  # warm-up (codegen + AQE replan)
        walls = []
        for _ in range(2):
            t0 = time.time()
            consume(tri)
            walls.append(time.time() - t0)
        w_tri = min(walls)

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
            pl = plain_pairs(df)
            n_plain, s_plain = consume(pl)  # warm-up
            pwalls = []
            for _ in range(2):
                t0 = time.time()
                consume(pl)
                pwalls.append(time.time() - t0)
            rec["plain_wall_s"] = round(min(pwalls), 2)
            # pair count exact; the dot-product SUM only to relative
            # tolerance (double summation order differs between plans;
            # the engine's exact kernels use integer sums — this soak
            # measures work distribution, not emission exactness)
            assert n_plain == n_tri, rec
            assert abs(s_plain - s_tri) <= 1e-6 * max(1.0, abs(s_plain)), rec
            # claim 3: triangle beats the plain join under skew
            # (skip at 1x where both are warm-up-sized)
            if mult >= 8:
                assert w_tri < rec["plain_wall_s"], rec
        if first is None:
            first = rec
        elif mult == 32:
            growth = w_tri / max(first["tri_wall_s"], 1e-9)
            pair_growth = hot_pairs / first["hot_pairs"]
            rec["wall_growth_1x_to_32x"] = round(growth, 2)
            rec["pair_growth_1x_to_32x"] = round(pair_growth, 2)
            # claim 2: wall sublinear in |hot|² over the full span
            assert growth < pair_growth, rec
        out.append(rec)
        print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())

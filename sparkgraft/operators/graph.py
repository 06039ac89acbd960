"""Graph helpers for dedup pipelines: connected components over
near-duplicate pair tables (the "keep one representative per duplicate
group" step that follows MinHash/SimHash/embedding pair generation).

Spark-first shape: min-label propagation as a driver-coordinated loop
of joins + grouped mins — the Pregel iteration pattern expressed in
DataFrames.  Each iteration is one shuffle on the node id; the loop
exits as soon as no label changes, which takes O(longest min-id path)
iterations — small for the short-diameter clusters near-dup graphs
produce.  The alternating large-star/small-star formulation
(:func:`connected_components_twophase`) is the 10^9-edge form:
O(log n) rounds regardless of diameter, identical labeling
(equality-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 50,
) -> DataFrame:
    """(node, component) labeling where component = min node id reachable
    in the undirected graph — deterministic, engine-portable (mirrors a
    recursive-CTE min-reachable query exactly).

    Only nodes that appear in ``edges`` are labeled; singleton documents
    are their own representative by definition and need no row.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(
        sym.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .persist()
    )
    for _ in range(max_iters):
        nbr = sym.join(
            labels.select(F.col("id").alias("b"), F.col("label").alias("nl")),
            "b",
        ).groupBy("a").agg(F.min("nl").alias("min_nl"))
        # localCheckpoint (not persist): each round references the
        # previous labels TWICE (update + change-count), so a lazy
        # cache leaves a logical plan that DOUBLES per iteration —
        # analysis time alone goes exponential in the round count
        # (measured: ~7 s/round by round 8 on a toy graph).  The eager
        # checkpoint truncates lineage to the materialized rows.
        new_labels = (
            labels.join(
                nbr.select(F.col("a").alias("id"), "min_nl"), "id", "left"
            )
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("min_nl"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(
                labels.select(F.col("id"), F.col("label").alias("old")), "id"
            )
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("id"), F.col("label").alias("cluster_id"))


def dedup_representatives(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Duplicate-group table from a near-dup pair table: every grouped
    node with its component id and whether it is the kept representative
    (the minimum id — the deterministic "first wins" rule used across
    this engine's dedup operators)."""
    comp = connected_components(pairs, src, dst)
    return comp.select(
        F.col("id"),
        F.col("cluster_id"),
        (F.col("id") == F.col("cluster_id")).alias("is_representative"),
    )


def pagerank_exact(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping_pct: int = 85,
    scale: int = 10**12,
) -> DataFrame:
    """PageRank in EXACT integer arithmetic: ranks are scaled longs
    (1e12 quanta), each node's contribution is the integral quotient
    ``rank // out_degree``, and the damping update is integer
    percent arithmetic — so every iteration is bit-identical in any
    engine and under any partitioning (a float formulation would sum
    contributions in shuffle order and drift in the last ulp).  The
    deliberate cost: each division truncates < 1 quantum, so total
    mass decays by < n_nodes quanta per iteration — noise at 1e-12
    resolution, and identical noise everywhere.

    Pregel-in-DataFrames shape, same as :func:`connected_components`:
    per iteration one join (ranks → edges) + one grouped sum (one
    shuffle each on node id); dangling nodes keep the teleport term
    only.  ``iters`` is fixed (no convergence test) so the trajectory
    is reproducible.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    n_nodes = nodes.count()  # scalar for the teleport term (tiny)
    teleport = ((100 - damping_pct) * scale) // (100 * n_nodes)
    ranks = nodes.withColumn("rank", F.lit(scale // n_nodes).cast("long"))
    for _ in range(iters):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div deg").alias("c"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("sc"))
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({damping_pct} * coalesce(sc, 0L)) div 100"
                    )
                ).cast("long").alias("rank"),
            )
        )
    return ranks


def personalized_pagerank(
    edges: DataFrame,
    sources: list,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping_pct: int = 85,
    scale: int = 10**12,
) -> DataFrame:
    """Personalized PageRank in the same EXACT integer arithmetic as
    :func:`pagerank_exact`, with teleport mass returning ONLY to the
    ``sources`` set (uniformly over |S|) instead of all nodes — the
    standard proximity/recommendation variant: ranks measure closeness
    to the seed set, and nodes unreachable from it stay at 0.

    ``sources`` is a small driver-side list (the personalization seed —
    the same broadcast-scale assumption as a centroid table).  Initial
    mass is scale // |S| on each seed, 0 elsewhere; per iteration the
    teleport term is added only at seeds.  Same Pregel-in-DataFrames
    shape and determinism guarantees as the global variant: one join +
    one grouped sum per iteration, integer truncation everywhere,
    fixed ``iters``.
    """
    seed = sorted(set(sources))
    n_src = len(seed)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    teleport = ((100 - damping_pct) * scale) // (100 * n_src)
    is_seed = F.col("node").isin(seed)
    ranks = nodes.withColumn(
        "rank",
        F.when(is_seed, F.lit(scale // n_src)).otherwise(F.lit(0)).cast("long"),
    )
    for _ in range(iters):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div deg").alias("c"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("sc"))
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (
                    F.when(is_seed, F.lit(teleport)).otherwise(F.lit(0))
                    + F.expr(
                        f"({damping_pct} * coalesce(sc, 0L)) div 100"
                    )
                ).cast("long").alias("rank"),
            )
        )
    return ranks


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle counts via the degree-ordered (compact-forward)
    algorithm: orient every undirected edge from its lower-(degree, id)
    endpoint to the higher one, enumerate wedges only at each node's
    out-neighbors (out-degree is O(sqrt(m)) under this orientation — the
    classic bound that makes distributed triangle counting feasible),
    and close each wedge with one equi-join back into the oriented edge
    set.  Shuffles carry (node, node) pairs only.

    Returns (node, n_triangles) for every node incident to an edge,
    zeros included.  Deterministic: orientation keys on (degree, id),
    all counts exact integers.
    """
    # The canonical edge list feeds five plan branches (nodes, degrees,
    # orientation, wedges x2, closing) — persist it, else each branch
    # re-derives it from the caller's (possibly join-heavy) edge
    # expression; same discipline as minhash_dedup_pairs' base table.
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # Orient: u -> v iff (deg(u), u) < (deg(v), v).
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    ed = e.join(da, "a").join(db, "b")
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = ed.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lower_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
        F.when(lower_first, F.col("da")).otherwise(F.col("db")).alias("du"),
    ).persist()
    # Wedges at u over its out-neighborhood, ordered so the closing edge
    # is oriented v -> w under the same (degree, id) key.
    l = o.select("u", F.col("v").alias("v"), F.col("dv").alias("dv1"))
    r = o.select("u", F.col("v").alias("w"), F.col("dv").alias("dv2"))
    wedges = l.join(r, "u").filter(
        (F.col("dv1") < F.col("dv2"))
        | ((F.col("dv1") == F.col("dv2")) & (F.col("v") < F.col("w")))
    )
    closing = o.select(F.col("u").alias("v"), F.col("v").alias("w"))
    tris = wedges.join(closing, ["v", "w"]).select("u", "v", "w")
    per_node = (
        tris.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    return nodes.join(per_node, "node", "left").select(
        "node", F.coalesce("n_triangles", F.lit(0)).alias("n_triangles")
    )


def connected_components_twophase(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond") — the formulation :func:`connected_components`' docstring
    defers to at 10^9+ edges, now implemented: min-label propagation
    needs O(diameter) rounds (a length-n path takes n rounds), the
    star alternation contracts the graph toward component-minimum
    stars in O(log n) rounds regardless of diameter.

    Per round, both operations are one ``groupBy(center)`` aggregate +
    one explode over the neighborhood, shuffling (node, node) pairs
    only:

    - large-star: every neighbor LARGER than the center re-attaches to
      the neighborhood minimum (incl. the center);
    - small-star: the center and its not-larger neighbors re-attach to
      that minimum.

    Convergence is a one-row checksum comparison (count + xor-free sum
    of pair hashes) — no data to the driver.  Returns the same
    (id, cluster_id = min reachable id) labeling as
    :func:`connected_components`, equality-tested on paths (the
    diameter worst case), random graphs, and the dedup-pair fixtures.
    """
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # Node set BEFORE dropping self-loops: a node whose only edge is a
    # self-loop is still labeled (as its own component) — matching
    # connected_components' semantics exactly.
    nodes = (
        raw.select(F.col("u").alias("id"))
        .union(raw.select(F.col("v").alias("id")))
        .distinct()
        .persist()
    )
    e = raw.filter(F.col("u") != F.col("v")).distinct().persist()

    def star(cur: DataFrame, large: bool) -> DataFrame:
        sym = cur.union(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        grouped = sym.groupBy("u").agg(
            F.collect_set("v").alias("nbrs"),
        )
        m = F.array_min(
            F.concat(F.col("nbrs"), F.array(F.col("u")))
        ).alias("m")
        if large:
            out = grouped.select(
                "u",
                m,
                F.explode(
                    F.filter(F.col("nbrs"), lambda x: x > F.col("u"))
                ).alias("w"),
            ).select(F.col("w").alias("u"), F.col("m").alias("v"))
        else:
            keep = F.concat(
                F.filter(F.col("nbrs"), lambda x: x <= F.col("u")),
                F.array(F.col("u")),
            )
            out = grouped.select("u", m, F.explode(keep).alias("w")).select(
                F.col("w").alias("u"), F.col("m").alias("v")
            )
        return out.filter(F.col("u") != F.col("v")).distinct()

    def checksum(cur: DataFrame):
        row = cur.agg(
            F.count("*").alias("n"),
            # DECIMAL sum: int64 hash sums overflow under ANSI mode.
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    prev = None
    cur = e
    for _ in range(max_iters):
        nxt = star(star(cur, large=True), large=False).localCheckpoint(
            eager=True
        )
        if cur is not e:
            cur.unpersist()
        cur = nxt
        sig = checksum(cur)
        if sig == prev:
            break
        prev = sig
    # Converged: a star forest of (child -> component min).  Centers
    # and any node only ever seen as a parent label themselves.
    labels = cur.select(F.col("u").alias("id"), F.col("v").alias("label"))
    out = (
        nodes.join(labels, "id", "left")
        .select(
            "id", F.coalesce("label", F.col("id")).alias("cluster_id")
        )
    )
    e.unpersist()
    return out

"""Round-4 operator tests: Holt-Winters seasonal smoothing anchors and
MaxSim late-interaction scoring against a Python reference."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from sparkgraft.operators.similarity import maxsim_rerank
from sparkgraft.operators.timeseries import holt_forecast, holt_winters_forecast


def mkts(i: int):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=6 * i)


def series_df(spark, values, key="k1"):
    rows = [(key, mkts(i), float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


@pytest.mark.parametrize("abg", [(0.5, 0.3, 0.4), (0.9, 0.1, 0.7), (0.2, 0.8, 0.2)])
def test_holt_winters_exact_on_constant_plus_periodic(spark, abg):
    # y_t = 10 + s_{t mod 4}, seasonal components sum to zero.
    s = [2.0, -1.0, 3.0, -4.0]
    y = [10.0 + s[i % 4] for i in range(12)]
    a, b, g = abg
    out = holt_winters_forecast(
        series_df(spark, y), ["key"], season=4,
        alpha=a, beta=b, gamma=g, horizon=4,
    ).orderBy("step").collect()
    n = len(y)
    for r in out:
        expected = 10.0 + s[(n + r["step"] - 1) % 4]
        assert math.isclose(r["forecast"], expected, abs_tol=1e-9), (
            r["step"], r["forecast"], expected)
        assert math.isclose(r["trend"], 0.0, abs_tol=1e-9)


def test_holt_winters_short_series_equals_holt(spark):
    y = [3.0, 5.0, 4.0, 6.0, 8.0]  # < 2 seasons of m=4
    df = series_df(spark, y)
    hw = holt_winters_forecast(
        df, ["key"], season=4, alpha=0.5, beta=0.3, gamma=0.9, horizon=3
    ).orderBy("step").collect()
    h = holt_forecast(
        df, ["key"], alpha=0.5, beta=0.3, horizon=3
    ).orderBy("step").collect()
    for rw, rh in zip(hw, h):
        assert rw["forecast"] == rh["forecast"]
        assert rw["seasonal"] == 0.0


def py_maxsim(qdocs, ddocs, k=3):
    """Reference: dict doc -> list of vectors."""
    import itertools

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    out = {}
    for qd, qvs in qdocs.items():
        scores = []
        for dd, dvs in ddocs.items():
            s = sum(max(cos(qv, dv) for dv in dvs) for qv in qvs)
            scores.append((dd, round(s, 4)))
        scores.sort(key=lambda t: (-t[1], t[0]))
        out[qd] = scores[:k]
    return out


def test_maxsim_matches_reference_and_self_top1(spark):
    import random

    rnd = random.Random(7)
    ddocs = {
        d: [[rnd.uniform(-1, 1) for _ in range(8)] for _ in range(4)]
        for d in range(6)
    }
    qdocs = {d: ddocs[d] for d in (0, 1)}
    qrows = [
        (qd, i, [float(x) for x in v])
        for qd, vs in qdocs.items()
        for i, v in enumerate(vs)
    ]
    drows = [
        (dd, [float(x) for x in v]) for dd, vs in ddocs.items() for v in vs
    ]
    q = spark.createDataFrame(qrows, "q_doc int, q_tok int, qv array<double>")
    d = spark.createDataFrame(drows, "d_doc int, dv array<double>")
    got = maxsim_rerank(q, d, k=3).collect()
    exp = py_maxsim(qdocs, ddocs, k=3)
    for r in got:
        ed, es = exp[r["q_doc"]][r["rnk"] - 1]
        assert r["d_doc"] == ed
        assert math.isclose(r["maxsim"], es, abs_tol=2e-4), (tuple(r), es)
    # A query doc's best match is itself: every token matches at cos=1.
    for qd in (0, 1):
        top = [r for r in got if r["q_doc"] == qd and r["rnk"] == 1][0]
        assert top["d_doc"] == qd
        assert math.isclose(top["maxsim"], 4.0, abs_tol=1e-6)


def tri_counts(spark, edge_list):
    from sparkgraft.operators.graph import triangle_count

    df = spark.createDataFrame(edge_list, "src int, dst int")
    return {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}


def test_triangle_count_k4(spark):
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    # K4 has 4 triangles; every node sits in 3.
    assert tri_counts(spark, edges) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_count_triangle_with_pendant_and_path(spark):
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (5, 6), (6, 7)]
    assert tri_counts(spark, edges) == {
        1: 1, 2: 1, 3: 1, 4: 0, 5: 0, 6: 0, 7: 0,
    }


def test_triangle_count_bowtie_and_dup_edges(spark):
    # Two triangles sharing node 3; duplicate/reversed edges collapse.
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3),
             (2, 1), (1, 3), (3, 3)]
    assert tri_counts(spark, edges) == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}


def test_gopher_quality_planted(spark):
    from sparkgraft.operators.textops import gopher_quality

    good = "the quick brown fox jumps over the lazy dog and keeps running fast today"
    bullets = "- one\n- two\n- three\n- four"
    symbols = "lots # of # symbols # here # now # ok # more # and # again # yes"
    df = spark.createDataFrame(
        [(1, good), (2, bullets), (3, symbols)], "doc_id int, text string"
    )
    rows = {r["doc_id"]: r for r in gopher_quality(df, min_words=5).collect()}
    assert rows[1]["keep"]
    assert rows[2]["bullet_line_frac"] == 1.0 and not rows[2]["keep"]
    assert rows[3]["symbol_word_ratio"] == round(9 / 19, 4) and not rows[3]["keep"]
    # entropy of a single repeated char is 0; of distinct chars = ln(n)
    import math

    df2 = spark.createDataFrame(
        [(1, "aaaa"), (2, "abcd")], "doc_id int, text string"
    )
    r2 = {r["doc_id"]: r for r in gopher_quality(df2, min_words=1).collect()}
    assert r2[1]["char_entropy"] == 0.0
    assert abs(r2[2]["char_entropy"] - round(math.log(4), 4)) < 1e-9


def test_ddsketch_relative_error_and_merge_law(spark):
    from sparkgraft.operators.sketch import (
        ddsketch_build,
        ddsketch_merge,
        ddsketch_quantiles,
    )

    import random

    rnd = random.Random(42)
    vals = [rnd.lognormvariate(2.0, 1.0) for _ in range(2000)]
    half = len(vals) // 2
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    a = spark.createDataFrame([(v,) for v in vals[:half]], "value double")
    b = spark.createDataFrame([(v,) for v in vals[half:]], "value double")

    alpha = 0.01
    sk = ddsketch_build(df, "value", alpha=alpha)
    est = {
        r["q"]: r["estimate"]
        for r in ddsketch_quantiles(sk, qs=(0.5, 0.9, 0.99), alpha=alpha).collect()
    }
    svals = sorted(vals)
    for q, e in est.items():
        exact = svals[int(q * (len(vals) - 1))]
        assert abs(e - exact) / exact <= alpha + 1e-6, (q, e, exact)

    # Merge law: sketch(A ∪ B) == merge(sketch A, sketch B), exactly.
    merged = ddsketch_merge(
        ddsketch_build(a, "value", alpha=alpha),
        ddsketch_build(b, "value", alpha=alpha),
    )
    t1 = sorted(tuple(r) for r in sk.collect())
    t2 = sorted(tuple(r) for r in merged.collect())
    assert t1 == t2


def test_ddsketch_signs_and_zero(spark):
    from sparkgraft.operators.sketch import ddsketch_build, ddsketch_quantiles

    vals = [-100.0, -10.0, 0.0, 10.0, 100.0]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    sk = ddsketch_build(df, "value", alpha=0.01)
    est = {
        r["q"]: r["estimate"]
        for r in ddsketch_quantiles(sk, qs=(0.0, 0.5, 1.0), alpha=0.01).collect()
    }
    assert est[0.0] < -99  # most negative first in the walk
    assert est[0.5] == 0.0  # median hits the zero bucket
    assert abs(est[1.0] - 100.0) / 100.0 <= 0.01


def test_streaming_dedup_admission_and_replay(spark, tmp_path):
    import json
    import os

    from sparkgraft.streaming.pipeline import dedup_admission

    src = tmp_path / "arrivals"
    src.mkdir()
    hist = str(tmp_path / "history")
    ckpt = str(tmp_path / "ckpt")

    base_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # Identical shingle set -> identical MinHash bands -> the candidate
    # join flags it deterministically (a probabilistic near-miss would
    # make the test flaky at these small band parameters).
    near = base_text
    batch1 = [
        {"doc_id": "a", "text": base_text},
        {"doc_id": "b", "text": "one two three four five six seven eight nine ten"},
    ]
    batch2 = [
        {"doc_id": "c", "text": near},  # near-dup of a
        {"doc_id": "d", "text": "totally different words without any overlap here now"},
    ]
    with open(src / "b1.json", "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in batch1))

    got: dict[int, list] = {}

    def sink(df, batch_id):
        got[batch_id] = sorted(tuple(r) for r in df.collect())

    stream = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = dedup_admission(stream, hist, ckpt, sink, min_jaccard=0.5)
    q.awaitTermination(120)

    with open(src / "b2.json", "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in batch2))
    q2 = dedup_admission(stream, hist, ckpt, sink, min_jaccard=0.5)
    q2.awaitTermination(120)

    all_rows = [r for rows in got.values() for r in rows]
    by_id = {r[0]: r for r in all_rows}
    assert not by_id["a"][1] and not by_id["b"][1] and not by_id["d"][1]
    assert by_id["c"][1] and by_id["c"][2] == "a"  # flagged against history

    # Index holds only admitted docs (a, b, d — not c).
    idx = spark.read.parquet(os.path.join(hist, "base"))
    assert sorted(r["id"] for r in idx.select("id").collect()) == ["a", "b", "d"]

    # Crash-replay: fresh checkpoint re-delivers b1.json as batch 0
    # against an index that already contains batch-0 rows — verdicts
    # must be identical (strictly-older filter) and no rows duplicated.
    got2: dict[int, list] = {}

    def sink2(df, batch_id):
        got2[batch_id] = sorted(tuple(r) for r in df.collect())

    src2 = tmp_path / "arrivals_replay"
    src2.mkdir()
    with open(src2 / "b1.json", "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in batch1))
    stream2 = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src2))
    )
    q3 = dedup_admission(
        stream2, hist, str(tmp_path / "ckpt2"), sink2, min_jaccard=0.5
    )
    q3.awaitTermination(120)
    assert got2[0] == got[0]
    idx2 = spark.read.parquet(os.path.join(hist, "base"))
    assert idx2.count() == idx.count()  # append skipped on replay


def test_streaming_quantile_monitor_matches_batch_and_replays(spark, tmp_path):
    import json
    import os

    from sparkgraft.operators.sketch import ddsketch_build, ddsketch_quantiles
    from sparkgraft.streaming.pipeline import quantile_monitor

    import random

    rnd = random.Random(9)
    vals1 = [rnd.lognormvariate(1.0, 0.8) for _ in range(400)]
    vals2 = [rnd.lognormvariate(2.5, 0.4) for _ in range(400)]

    src = tmp_path / "in"
    src.mkdir()
    for name, vals in (("b1", vals1), ("b2", vals2)):
        with open(src / f"{name}.json", "w") as fh:
            fh.write("\n".join(json.dumps({"value": v}) for v in vals))

    got = {}

    def sink(df, batch_id):
        got[batch_id] = {r["q"]: r["estimate"] for r in df.collect()}

    stream = (
        spark.readStream.schema("value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    ckpt = str(tmp_path / "ck")
    q = quantile_monitor(stream, "value", ckpt, sink)
    q.awaitTermination(120)
    assert len(got) == 2

    # Streaming result after both batches == batch operator on the
    # union (the merge law is exact).
    both = spark.createDataFrame([(v,) for v in vals1 + vals2], "value double")
    batch_q = {
        r["q"]: r["estimate"]
        for r in ddsketch_quantiles(ddsketch_build(both, "value")).collect()
    }
    assert got[max(got)] == batch_q

    # Replay of the LAST batch (same batch_id, fresh query on a copy of
    # the state): estimates identical, no double count.
    state_before = json.load(open(os.path.join(ckpt, "ddsketch_state.json")))
    src2 = tmp_path / "in2"
    src2.mkdir()
    with open(src2 / "b2.json", "w") as fh:
        fh.write("\n".join(json.dumps({"value": v}) for v in vals2))
    ck2 = tmp_path / "ck2"
    ck2.mkdir()
    # Seed the new checkpoint dir with the post-crash state: the stored
    # sketch already INCLUDES batch 1 (the replayed one, delivered as
    # batch 0 here after the simulated crash).
    state_before["batch_id"] = 0
    with open(ck2 / "ddsketch_state.json", "w") as fh:
        json.dump(state_before, fh)
    got2 = {}

    def sink2(df, batch_id):
        got2[batch_id] = {r["q"]: r["estimate"] for r in df.collect()}

    stream2 = (
        spark.readStream.schema("value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src2))
    )
    q2 = quantile_monitor(stream2, "value", str(ck2), sink2)
    q2.awaitTermination(120)
    assert got2[0] == batch_q  # merged into pre-crash snapshot, not doubled


def test_ann_index_roundtrip_equals_in_memory(spark, tmp_path):
    from sparkgraft.operators.similarity import (
        centroids_from_labels,
        ivfpq_topk,
    )
    from sparkgraft.sinks.ann_index import (
        ivfpq_topk_indexed,
        read_ann_index,
        write_ann_index,
    )
    from sparkgraft.sources.readers import read_table
    from tests.conftest import SF_DIR

    emb = read_table(spark, SF_DIR, "embeddings")
    cents = sorted(
        (r["cluster"], list(r["centroid"]))
        for r in centroids_from_labels(emb, "label", "embedding", digits=6).collect()
    )
    sub = len(cents[0][1]) // 8
    cbs = [
        [(c, v[s * sub : (s + 1) * sub]) for c, v in cents] for s in range(8)
    ]
    idx = str(tmp_path / "annidx")
    write_ann_index(idx, emb, cents, cbs)

    # Metadata survives the round trip exactly.
    rc, rcb, codes = read_ann_index(spark, idx)
    assert rc == [(c, [float(x) for x in v]) for c, v in cents]
    assert len(rcb) == 8 and rcb[0] == [
        (c, [float(x) for x in v]) for c, v in cbs[0]
    ]
    assert codes.count() == emb.count()

    # Served results == in-memory operator, bit for bit.
    q = emb.filter(F.col("vec_id") < 10)
    served = sorted(
        tuple(r)
        for r in ivfpq_topk_indexed(q, idx, nprobe=3, k=5, shortlist=20).collect()
    )
    mem = sorted(
        tuple(r)
        for r in ivfpq_topk(q, emb, cents, cbs, nprobe=3, k=5, shortlist=20).collect()
    )
    assert served == mem


def test_ann_index_append_equals_full_rebuild(spark, tmp_path):
    """Incremental append (frozen centroids/codebooks) must serve
    bit-identically to a full rebuild over old ∪ new."""
    from sparkgraft.operators.similarity import centroids_from_labels
    from sparkgraft.sinks.ann_index import (
        append_ann_index,
        ivfpq_topk_indexed,
        read_ann_index,
        write_ann_index,
    )
    from sparkgraft.sources.readers import read_table
    from tests.conftest import SF_DIR

    emb = read_table(spark, SF_DIR, "embeddings")
    cents = sorted(
        (r["cluster"], list(r["centroid"]))
        for r in centroids_from_labels(emb, "label", "embedding", digits=6).collect()
    )
    sub = len(cents[0][1]) // 8
    cbs = [
        [(c, v[s * sub : (s + 1) * sub]) for c, v in cents] for s in range(8)
    ]
    old = emb.filter(F.col("vec_id") % 3 != 0)
    new = emb.filter(F.col("vec_id") % 3 == 0)

    inc = str(tmp_path / "inc")
    write_ann_index(inc, old, cents, cbs)
    n_before = spark.read.parquet(f"{inc}/codes").count()
    append_ann_index(inc, new)

    full = str(tmp_path / "full")
    write_ann_index(full, emb, cents, cbs)

    # Codes table: identical rows (append never rewrote history files).
    inc_codes = sorted(
        (r["neighbor_id"], r["part"], tuple(r["codes"]))
        for r in spark.read.parquet(f"{inc}/codes").collect()
    )
    full_codes = sorted(
        (r["neighbor_id"], r["part"], tuple(r["codes"]))
        for r in spark.read.parquet(f"{full}/codes").collect()
    )
    assert inc_codes == full_codes
    assert n_before == old.count()

    # Metadata untouched by append.
    rc, rcb, _ = read_ann_index(spark, inc)
    assert rc == [(c, [float(x) for x in v]) for c, v in cents]

    # Serving: bit-identical results from both indexes.
    q = emb.filter(F.col("vec_id") < 10)
    got_inc = sorted(
        tuple(r)
        for r in ivfpq_topk_indexed(q, inc, nprobe=3, k=5, shortlist=20).collect()
    )
    got_full = sorted(
        tuple(r)
        for r in ivfpq_topk_indexed(q, full, nprobe=3, k=5, shortlist=20).collect()
    )
    assert got_inc == got_full


def test_cusum_matches_sequential_reference(spark):
    """The window-identity CUSUM must equal the textbook sequential
    recurrence bit for bit (same integer arithmetic)."""
    import datetime as dt

    from sparkgraft.operators.stats import MEAN_SCALE, cusum_changepoints

    vals = [10.0, 10.2, 9.9, 10.1, 9.8, 10.0,      # baseline
            13.5, 13.9, 14.2, 13.7, 14.0,          # upward shift
            10.0, 9.9, 5.2, 5.0, 4.8, 5.1]         # downward shift
    rows = [("k", dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), i, v)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "key string, ts timestamp, event_id long, value double"
    )
    k, h, bn, digits = 0.5, 2.0, 6, 6
    got = sorted(
        (r["event_id"], r["side"], r["stat"])
        for r in cusum_changepoints(
            df, "key", "ts", "event_id", "value",
            k=k, h=h, baseline_n=bn, digits=digits,
        ).collect()
    )

    xs = [round(v * MEAN_SCALE) for v in vals]
    nb = min(len(vals), bn)
    sb = sum(xs[:bn])
    ks = round(k * MEAN_SCALE)
    hs = round(h * MEAN_SCALE)
    sp = sn = 0
    expect = []
    for i, x in enumerate(xs):
        sp = max(0, sp + (nb * x - sb - nb * ks))
        sn = max(0, sn + (sb - nb * x - nb * ks))
        up, down = sp > nb * hs, sn > nb * hs
        if up or down:
            s = sp if up else sn
            unit = nb * (MEAN_SCALE // 10**digits)
            stat = ((2 * s + unit) // (2 * unit)) / 10**digits
            expect.append((i, "up" if up else "down", stat))
    assert got == expect
    # Sanity: both shift directions fire, baseline is quiet.
    assert {s for _, s, _ in got} == {"up", "down"}
    assert min(i for i, _, _ in got) >= bn


def test_dedup_admission_repairs_torn_banded_append(spark, tmp_path):
    """Regression (r4 advice): a crash BETWEEN the base and banded
    appends leaves admitted docs without LSH keys; a replay that checks
    only the base table skips both appends, so those docs can never be
    matched again.  Per-table replay checks must finish exactly the
    missing half."""
    import json
    import os
    import shutil

    from sparkgraft.streaming.pipeline import dedup_admission

    src = tmp_path / "arrivals"
    src.mkdir()
    hist = str(tmp_path / "history")

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    with open(src / "b1.json", "w") as fh:
        fh.write(json.dumps({"doc_id": "a", "text": text}))

    def mk_stream():
        return (
            spark.readStream.schema("doc_id string, text string")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )

    sunk: dict[int, list] = {}

    def sink(df, batch_id):
        sunk[batch_id] = sorted(tuple(r) for r in df.collect())

    q = dedup_admission(mk_stream(), hist, str(tmp_path / "c1"), sink)
    q.awaitTermination(120)
    base_dir = os.path.join(hist, "base")
    banded_dir = os.path.join(hist, "banded")
    n_base = spark.read.parquet(base_dir).count()
    assert spark.read.parquet(banded_dir).count() > 0

    # Torn crash: base landed, banded never did.
    shutil.rmtree(banded_dir)

    # Replay batch 0 (fresh checkpoint, same file): base append must be
    # skipped, banded append must RUN.
    q2 = dedup_admission(mk_stream(), hist, str(tmp_path / "c2"), sink)
    q2.awaitTermination(120)
    assert spark.read.parquet(base_dir).count() == n_base  # no dupes
    assert spark.read.parquet(banded_dir).count() > 0  # repaired

    # And the repaired index actually matches: a near-dup of doc a
    # arriving later is flagged against it.
    with open(src / "b2.json", "w") as fh:
        fh.write(json.dumps({"doc_id": "z", "text": text}))
    got: dict[int, list] = {}

    def sink2(df, batch_id):
        got[batch_id] = {r["doc_id"]: tuple(r) for r in df.collect()}

    q3 = dedup_admission(mk_stream(), hist, str(tmp_path / "c2"), sink2)
    q3.awaitTermination(120)
    z = [v["z"] for v in got.values() if "z" in v][0]
    assert z[1] and z[2] == "a"  # is_duplicate, matched against a

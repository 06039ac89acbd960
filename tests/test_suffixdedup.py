"""Planted-span tests for the suffix-array-class exact substring dedup
(sparkgraft/operators/suffixdedup.py): cross-shard repeats, same-doc
repeats, island merging, unicode, shard-count invariance, and the
binary-search longest-repeat against brute force."""

from __future__ import annotations

import collections

import pytest

from sparkgraft.operators.suffixdedup import (
    _shard_of,
    duplicated_windows,
    exact_substring_spans,
    longest_duplicated_substring,
    substring_dedup_stats,
    window_hashes_sharded,
)

L = 20


def brute_spans(docs: list[tuple[str, str]], min_len: int = L):
    """Reference implementation: count all L-windows, merge covered
    starts into maximal spans."""
    c = collections.Counter()
    for _, t in docs:
        for i in range(len(t) - min_len + 1):
            c[t[i : i + min_len]] += 1
    out = []
    for did, t in docs:
        starts = [
            i + 1
            for i in range(len(t) - min_len + 1)
            if c[t[i : i + min_len]] > 1
        ]
        spans: list[list[int]] = []
        for s in starts:
            if spans and s - spans[-1][1] <= min_len:
                spans[-1][1] = s
                spans[-1][2] += 1
            else:
                spans.append([s, s, 1])
        for s0, s1, nw in spans:
            end = s1 + min_len - 1
            out.append((did, s0, end, end - s0 + 1, nw))
    return sorted(out)


def run_spans(spark, docs, n_shards=4, min_len=L):
    df = spark.createDataFrame(docs, "doc_id string, text string")
    return sorted(
        tuple(r)
        for r in exact_substring_spans(
            df, min_len=min_len, n_shards=n_shards
        ).collect()
    )


def pick_ids(n_shards: int, want_distinct: bool, count: int = 2):
    """Doc ids that land in distinct (or identical) shards."""
    ids, seen = [], set()
    for i in range(10_000):
        did = f"doc{i}"
        sh = _shard_of(did, n_shards)
        if want_distinct:
            if sh not in seen:
                seen.add(sh)
                ids.append(did)
        else:
            if not ids or sh == _shard_of(ids[0], n_shards):
                ids.append(did)
        if len(ids) == count:
            return ids
    raise AssertionError("could not place ids")


REPEAT = "ALPHA BRAVO CHARLIE DELTA ECHO FOXTROT"  # 38 chars > L


def test_cross_shard_repeat_found(spark):
    a, b = pick_ids(4, want_distinct=True)
    docs = [
        (a, f"unique lead-in text {REPEAT} unique tail piece"),
        (b, f"other 123 material {REPEAT} different ending!!"),
        ("doc_clean", "completely unrelated content without any repeats x"),
    ]
    assert _shard_of(a, 4) != _shard_of(b, 4)
    assert run_spans(spark, docs) == brute_spans(docs)


def test_in_shard_repeat_bypasses_global_count(spark):
    a, b = pick_ids(4, want_distinct=False)
    docs = [
        (a, f"lead {REPEAT} tail-one material"),
        (b, f"pre {REPEAT} tail-two material"),
    ]
    assert _shard_of(a, 4) == _shard_of(b, 4)
    df = spark.createDataFrame(docs, "doc_id string, text string")
    wins = window_hashes_sharded(df, min_len=L, n_shards=4)
    # The planted windows are in-shard duplicates -> flagged locally.
    assert wins.filter("local_dup").count() > 0
    assert run_spans(spark, docs) == brute_spans(docs)


def test_same_doc_self_repeat(spark):
    docs = [
        ("d1", f"{REPEAT} ... and then again {REPEAT} at the end"),
        ("d2", "filler without duplication beyond chance 0987654321"),
    ]
    got = run_spans(spark, docs)
    assert got == brute_spans(docs)
    assert any(r[0] == "d1" for r in got)


def test_two_distant_repeats_stay_separate_islands(spark):
    import string

    filler = "".join(
        string.ascii_lowercase[(3 * i + 7) % 26] + str(i % 10)
        for i in range(2 * L)
    )
    second = "ZULU YANKEE XRAY WHISKEY VICTOR UNIFORM"
    docs = [
        ("p1", f"{REPEAT}{filler}{second}"),
        ("p2", f"{second} junk one two three {REPEAT}"),
    ]
    got = run_spans(spark, docs)
    assert got == brute_spans(docs)
    assert sum(1 for r in got if r[0] == "p1") == 2  # two islands


def test_short_and_unicode_docs(spark):
    uni = "нейросетевые данные обучения дедупликация шингль"
    docs = [
        ("u1", f"префикс {uni} суффикс один"),
        ("u2", f"другое {uni} окончание два"),
        ("tiny", "short"),
    ]
    got = run_spans(spark, docs)
    assert got == brute_spans(docs)
    assert not any(r[0] == "tiny" for r in got)


def test_shard_count_invariance(spark):
    docs = [
        (f"doc{i}", f"common shared sentence block number {i % 3} " * 2)
        for i in range(12)
    ]
    assert run_spans(spark, docs, n_shards=2) == run_spans(
        spark, docs, n_shards=5
    )


def test_dedup_stats_gate(spark):
    docs = [
        ("full", REPEAT),  # 100% covered
        ("clean", "nothing here repeats anywhere at all 13579"),
        ("twin", f"abcdefgh {REPEAT} zyxwvuts"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    rows = {
        r["doc_id"]: r
        for r in substring_dedup_stats(
            df, min_len=L, n_shards=3, max_coverage=0.5
        ).collect()
    }
    assert rows["full"]["dup_fraction"] == 1.0 and not rows["full"]["keep"]
    assert rows["clean"]["n_spans"] == 0 and rows["clean"]["keep"]
    assert rows["clean"]["dup_chars"] == 0
    assert rows["twin"]["dup_chars"] == len(REPEAT)
    assert rows["twin"]["max_span_len"] == len(REPEAT)


def test_longest_repeat_matches_brute_force(spark):
    docs = [
        ("a", "the long planted repeat SEGMENT-ONE-SEGMENT-TWO here"),
        ("b", "elsewhere the SEGMENT-ONE-SEGMENT-TWO shows up again"),
        ("c", "noise noise noise decoy"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    row = longest_duplicated_substring(df, n_shards=3).collect()[0]

    def hasdup(length):
        cc = collections.Counter()
        for _, t in docs:
            for i in range(len(t) - length + 1):
                cc[t[i : i + length]] += 1
        return any(v > 1 for v in cc.values())

    lo, hi = 0, max(len(t) for _, t in docs)
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if hasdup(mid):
            lo = mid
        else:
            hi = mid - 1
    assert row["length"] == lo > len("SEGMENT-ONE-SEGMENT-TWO") - 1
    # The reported site really carries a duplicated substring of that length.
    text = dict(docs)[row["doc_id"]]
    sub = text[row["start"] - 1 : row["start"] - 1 + row["length"]]
    occ = sum(t.count(sub) for _, t in docs)
    assert occ >= 2 and occ == row["n_occurrences"]


def test_longest_repeat_empty_corpus_case(spark):
    df = spark.createDataFrame(
        [("a", "abcdefg"), ("b", "hijklmn")], "doc_id string, text string"
    )
    row = longest_duplicated_substring(df, n_shards=2).collect()[0]
    assert row["length"] == 0 and row["doc_id"] is None


def test_duplicated_windows_counts_multiplicity(spark):
    # Three occurrences across three docs/shards: all three flagged.
    ids = pick_ids(5, want_distinct=True, count=3)
    docs = [(i, f"padding {n} {REPEAT} trailer {n}") for n, i in enumerate(ids)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    cov = duplicated_windows(df, min_len=L, n_shards=5)
    assert set(r["doc_id"] for r in cov.collect()) == set(ids)


def brute_longest_common(t: str, bench: list[str]) -> int:
    best = 0
    for b in bench:
        for i in range(len(t)):
            for j in range(i + best + 1, len(t) + 1):
                if t[i:j] in b:
                    best = max(best, j - i)
                else:
                    break
    return best


def test_longest_benchmark_overlap_matches_brute_force(spark):
    from sparkgraft.operators.suffixdedup import longest_benchmark_overlap

    bench_texts = [
        "the secret benchmark answer is forty two exactly",
        "another held out evaluation prompt with unique words",
    ]
    docs = [
        ("clean", "no overlap here at all 1234 zz qq"),
        ("leak", "prefix the secret benchmark answer is forty two exactly suffix"),
        ("partial", "contains evaluation prompt with some overlap"),
        ("crossdoc", "answer is forty two exactly another held out"),  # must NOT span bench docs
        ("empty", ""),
    ]
    ddf = spark.createDataFrame(docs, "doc_id string, text string")
    bdf = spark.createDataFrame([(t,) for t in bench_texts], "text string")
    got = {
        r["doc_id"]: (r["max_overlap"], r["n_chars"])
        for r in longest_benchmark_overlap(ddf, bdf).collect()
    }
    for did, t in docs:
        assert got[did] == (brute_longest_common(t, bench_texts), len(t)), did
    # The verbatim leak is found at full benchmark-sentence length.
    assert got["leak"][0] == len(bench_texts[0])


def test_longest_benchmark_overlap_bench_size_guard(spark):
    import pytest as _pytest

    from sparkgraft.operators.suffixdedup import longest_benchmark_overlap

    ddf = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    bdf = spark.createDataFrame([("y" * 100,)], "text string")
    with _pytest.raises(ValueError):
        longest_benchmark_overlap(ddf, bdf, max_bench_chars=10)


def test_remove_duplicated_spans_cuts_planted_repeat(spark):
    from sparkgraft.operators.suffixdedup import (
        exact_substring_spans,
        remove_duplicated_spans,
    )

    boiler = "This exact boilerplate sentence repeats verbatim in both docs."
    rows = [
        (1, f"unique head one {boiler} unique tail one"),
        (2, f"other opening {boiler} other closing"),
        (3, "entirely unique document with no repeats whatsoever here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           remove_duplicated_spans(docs, min_len=25).collect()}
    # the boilerplate is gone from both, unique parts survive
    for i in (1, 2):
        assert boiler not in out[i]["text_dedup"]
        assert out[i]["n_cut"] >= 1 and out[i]["chars_cut"] > 0
    assert "unique head one" in out[1]["text_dedup"]
    assert "other closing" in out[2]["text_dedup"]
    # untouched doc passes through byte-identical
    assert out[3]["text_dedup"] == rows[2][1]
    assert out[3]["n_cut"] == 0 and out[3]["chars_cut"] == 0
    # chars_cut consistency: len(text) - len(dedup) == chars_cut
    for i in (1, 2, 3):
        orig = dict((r[0], r[1]) for r in rows)[i]
        assert len(orig) - len(out[i]["text_dedup"]) == out[i]["chars_cut"]
    # the rewrite's cut list is exactly the span table
    spans = exact_substring_spans(docs, min_len=25)
    assert spans.filter("doc_id = 3").count() == 0


def test_remove_spans_overlapping_cuts_merge(spark):
    from sparkgraft.operators.suffixdedup import remove_duplicated_spans

    # one long repeated block shared by two docs -> one maximal span
    block = "abcdefghij" * 8  # 80 chars
    rows = [(1, f"X {block} Y"), (2, f"P {block} Q")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           remove_duplicated_spans(docs, min_len=25).collect()}
    for i in (1, 2):
        assert block not in out[i]["text_dedup"]
        assert out[i]["n_cut"] == 1  # islands merged into one maximal span


def test_remove_spans_string_id_column(spark):
    """Regression: the rewrite must carry the INPUT id column's name
    and dtype through (a hardcoded 'doc_id long' broke string ids)."""
    from sparkgraft.operators.suffixdedup import remove_duplicated_spans

    boiler = "This exact boilerplate sentence repeats verbatim in both docs."
    rows = [
        ("doc-a", f"unique head one {boiler} unique tail one"),
        ("doc-b", f"other opening {boiler} other closing"),
    ]
    docs = spark.createDataFrame(rows, "uid string, body string")
    out_df = remove_duplicated_spans(
        docs, id_col="uid", text_col="body", min_len=25
    )
    assert out_df.schema["uid"].dataType.simpleString() == "string"
    out = {r["uid"]: r for r in out_df.collect()}
    assert set(out) == {"doc-a", "doc-b"}
    for uid, body in rows:
        assert boiler not in out[uid]["text_dedup"]
        assert len(body) - len(out[uid]["text_dedup"]) == out[uid]["chars_cut"]


def test_winnowing_stride_recall_and_volume(spark):
    """Budget mode (stride>1): every planted repeat of length
    >= min_len + stride - 1 is still detected on BOTH copies at any
    alignment (content-defined minimizer selection), and the emitted
    window stream shrinks by ~stride x."""
    from sparkgraft.operators.suffixdedup import (
        exact_substring_spans,
        window_hashes_sharded,
    )

    L, S = 25, 4
    rep = "the exact same boilerplate block repeated verbatim here!"  # 56 >= L+S-1
    assert len(rep) >= L + S - 1
    import random

    rng = random.Random(7)

    def noise(n):
        return "".join(rng.choice("abcdefghij ") for _ in range(n))

    # different alignments on each side (prefixes of different length)
    rows = [
        (1, noise(13) + rep + noise(40)),
        (2, noise(29) + rep + noise(17)),
        (3, noise(120)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = exact_substring_spans(docs, min_len=L, stride=S)
    got = {int(r["doc_id"]): r for r in spans.collect()}
    for i, txt in ((1, rows[0][1]), (2, rows[1][1])):
        assert i in got, f"doc {i} repeat missed at stride {S}"
        s0, e0 = got[i]["span_start"], got[i]["span_end"]
        # span lands on the repeat, edges fuzzed by < L + S
        true_start = txt.index(rep) + 1
        assert abs(s0 - true_start) < L + S
        assert abs(e0 - (true_start + len(rep) - 1)) < L + S
    assert 3 not in got  # pure-noise doc stays clean

    n_exact = window_hashes_sharded(docs, min_len=L).count()
    n_budget = window_hashes_sharded(docs, min_len=L, stride=S).count()
    assert n_budget < n_exact / (S / 2)  # ~S x reduction, generous bound


def test_winnowing_stride_one_is_exact_mode(spark):
    """stride=1 must reproduce the exact operator bit-for-bit."""
    from sparkgraft.operators.suffixdedup import exact_substring_spans

    boiler = "This exact boilerplate sentence repeats verbatim in both docs."
    rows = [
        (1, f"unique head one {boiler} unique tail one"),
        (2, f"other opening {boiler} other closing"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(tuple(r) for r in
               exact_substring_spans(docs, min_len=25).collect())
    b = sorted(tuple(r) for r in
               exact_substring_spans(docs, min_len=25, stride=1).collect())
    assert a == b and len(a) == 2

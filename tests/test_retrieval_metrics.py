"""Hand-math anchors for relational.retrieval_metrics (recall@k, RR,
nDCG@k) — binary and graded relevance, missing-judgment and
no-relevant-retrieved edges."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sparkgraft.operators.relational import retrieval_metrics


def _q12(x: float) -> float:
    return round(x, 12)


def _f(v):
    """Metric columns are DOUBLE again since round 10 (each the nearest
    double of the exact 6-digit decimal from the integer-ratio kernel;
    round 8's DECIMAL(18,6) emission was reverted).  The float coercion
    is kept so these hand-math anchors are emission-type-agnostic."""
    return None if v is None else float(v)


def test_binary_relevance_hand_math(spark):
    # q1: rel docs {a, b, c}; retrieved [a, x, b] -> hits at ranks 1, 3
    ranked = spark.createDataFrame(
        [(1, "a", 1), (1, "x", 2), (1, "b", 3)],
        "query_id long, doc_id string, rnk long",
    )
    qrels = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 1), (1, "c", 1)],
        "query_id long, doc_id string, rel long",
    )
    row = retrieval_metrics(ranked, qrels, k=3).first()
    assert row["n_rel"] == 3 and row["n_hits"] == 2
    assert _f(row["recall_at_k"]) == round(2 / 3, 6)
    assert _f(row["rr"]) == 1.0
    # AP@3 = (P@1 + P@3) / min(3, 3) = (1 + 2/3) / 3
    assert _f(row["ap_at_k"]) == round((_q12(1 / 1) + _q12(2 / 3)) / 3, 6)
    dcg = _q12(1 / math.log2(2)) + _q12(0.0) + _q12(1 / math.log2(4))
    idcg = (
        _q12(1 / math.log2(2))
        + _q12(1 / math.log2(3))
        + _q12(1 / math.log2(4))
    )
    assert _f(row["ndcg_at_k"]) == round(dcg / idcg, 6)


def test_graded_relevance_ideal_ordering(spark):
    # Graded: d has grade 2, e grade 1; system ranks e first — ideal
    # DCG must put the grade-2 doc first, so nDCG < 1.
    ranked = spark.createDataFrame(
        [(2, "e", 1), (2, "d", 2)],
        "query_id long, doc_id string, rnk long",
    )
    qrels = spark.createDataFrame(
        [(2, "d", 2), (2, "e", 1)],
        "query_id long, doc_id string, rel long",
    )
    row = retrieval_metrics(ranked, qrels, k=10).first()
    dcg = _q12(1 / math.log2(2)) + _q12(2 / math.log2(3))
    idcg = _q12(2 / math.log2(2)) + _q12(1 / math.log2(3))
    assert _f(row["ndcg_at_k"]) == round(dcg / idcg, 6)
    assert _f(row["ndcg_at_k"]) < 1.0
    assert _f(row["rr"]) == 1.0 and _f(row["recall_at_k"]) == 1.0
    assert _f(row["ap_at_k"]) == 1.0  # both hits at perfect precision


def test_no_relevant_retrieved_and_rank_cut(spark):
    # q3 retrieves only non-relevant inside k (the relevant doc sits
    # past the cut): rr = 0, recall = 0, ndcg = 0.
    ranked = spark.createDataFrame(
        [(3, "x", 1), (3, "y", 2), (3, "g", 11)],
        "query_id long, doc_id string, rnk long",
    )
    qrels = spark.createDataFrame(
        [(3, "g", 1)], "query_id long, doc_id string, rel long"
    )
    row = retrieval_metrics(ranked, qrels, k=10).first()
    assert row["n_hits"] == 0
    assert _f(row["rr"]) == 0.0 and _f(row["recall_at_k"]) == 0.0
    assert _f(row["ap_at_k"]) == 0.0
    assert _f(row["ndcg_at_k"]) == 0.0


def test_partition_count_invariance(spark):
    # Decimal-quantized sums: identical results across partitionings.
    rows = [(q, f"d{q}_{i}", i) for q in range(4) for i in range(1, 11)]
    ranked = spark.createDataFrame(
        rows, "query_id long, doc_id string, rnk long"
    )
    qrels = spark.createDataFrame(
        [(q, f"d{q}_{i}", 1) for q in range(4) for i in range(1, 16, 2)],
        "query_id long, doc_id string, rel long",
    )
    a = sorted(
        tuple(r)
        for r in retrieval_metrics(
            ranked.repartition(1), qrels.repartition(1), k=10
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in retrieval_metrics(
            ranked.repartition(13), qrels.repartition(7), k=10
        ).collect()
    )
    assert a == b


def test_unjudged_defaults_to_zero_not_dropped(spark):
    # An unjudged retrieved doc (left join miss) must count as rel=0,
    # not vanish: dcg unaffected, but it still occupies its rank.
    ranked = spark.createDataFrame(
        [(4, "r", 1), (4, "u", 2)], "query_id long, doc_id string, rnk long"
    )
    qrels = spark.createDataFrame(
        [(4, "r", 1), (4, "z", 1)], "query_id long, doc_id string, rel long"
    )
    row = retrieval_metrics(ranked, qrels, k=10).first()
    assert row["n_rel"] == 2 and row["n_hits"] == 1
    assert _f(row["recall_at_k"]) == 0.5
    assert _f(row["ap_at_k"]) == 0.5  # P@1 = 1 over min(2, 10)
    dcg = _q12(1 / math.log2(2))
    idcg = _q12(1 / math.log2(2)) + _q12(1 / math.log2(3))
    assert _f(row["ndcg_at_k"]) == round(dcg / idcg, 6)


def test_judged_but_unretrieved_query_scores_zero(spark):
    # trec_eval semantics: a query with judgments but no retrieved rows
    # still appears, scored 0 across the board (full-outer qrels join).
    ranked = spark.createDataFrame(
        [(5, "a", 1)], "query_id long, doc_id string, rnk long"
    )
    qrels = spark.createDataFrame(
        [(5, "a", 1), (6, "b", 1), (6, "c", 2)],
        "query_id long, doc_id string, rel long",
    )
    rows = {
        r["query_id"]: r
        for r in retrieval_metrics(ranked, qrels, k=10).collect()
    }
    assert set(rows) == {5, 6}
    r6 = rows[6]
    assert r6["n_rel"] == 2 and r6["n_hits"] == 0
    assert _f(r6["recall_at_k"]) == 0.0
    assert _f(r6["rr"]) == 0.0
    assert _f(r6["ap_at_k"]) == 0.0
    assert _f(r6["ndcg_at_k"]) == 0.0


def test_ranked_query_with_no_judgments_emits_null_not_error(spark):
    # n_rel = 0: recall/AP are undefined -> NULL (never a division by
    # zero, which errors under spark.sql.ansi.enabled); rr stays 0.
    ranked = spark.createDataFrame(
        [(7, "x", 1), (7, "y", 2)], "query_id long, doc_id string, rnk long"
    )
    qrels = spark.createDataFrame(
        [], "query_id long, doc_id string, rel long"
    )
    row = retrieval_metrics(ranked, qrels, k=10).first()
    assert row["n_rel"] == 0 and row["n_hits"] == 0
    assert _f(row["recall_at_k"]) is None
    assert _f(row["rr"]) == 0.0
    assert _f(row["ap_at_k"]) is None
    assert _f(row["ndcg_at_k"]) is None


def test_out_of_domain_ranks_dropped(spark):
    """Round-9 review: rank 0 (or negative) rows are excluded like
    unjudged rows instead of crashing element_at(dcg_w, 0)."""
    from sparkgraft.operators.relational import retrieval_metrics

    ranked = spark.createDataFrame(
        [(1, 10, 0), (1, 11, 1), (1, 12, -3)],
        "query long, doc long, rank long",
    )
    qrels = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 1)], "query long, doc long, rel long"
    )
    got = {
        r["query"]: r
        for r in retrieval_metrics(
            ranked, qrels, k=10, query_col="query", id_col="doc",
            rank_col="rank", rel_col="rel",
        ).collect()
    }
    # only the rank-1 hit counts; the rank-0 and rank -3 rows drop
    assert got[1]["n_hits"] == 1 and float(got[1]["rr"]) == 1.0
    assert float(got[1]["recall_at_k"]) == 0.5

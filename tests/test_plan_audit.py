"""Physical-plan audits: assert the scale-critical plan properties so
refactors can't silently regress them (SURVEY §4 / the 100 TB design
contract): broadcast joins stay broadcast, filters and projections
reach the parquet scan, single-shuffle aggregations stay single-shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from sparkgraft.plans import audit
from tests.conftest import SF_DIR


def test_broadcast_lookup_is_broadcast(spark):
    df = entrymod.q_broadcast_lookup(spark, SF_DIR)
    assert audit.has_broadcast_join(df), audit.explain_str(df)


def test_register_image_is_broadcast(spark):
    df = entrymod.q_register_image(spark, SF_DIR)
    assert audit.has_broadcast_join(df), audit.explain_str(df)


def test_similarity_candidates_never_shuffle(spark):
    # Brute-force top-k: the candidate scan must not shuffle before
    # scoring — only the final per-query rank exchanges data.
    df = entrymod.q_cosine_topk(spark, SF_DIR)
    assert audit.count_shuffles(df) <= 1, audit.explain_str(df)


def test_channel_stats_single_shuffle(spark):
    df = entrymod.q_channel_stats(spark, SF_DIR)
    assert audit.count_shuffles(df) == 1, audit.explain_str(df)


def test_filter_pushdown_reaches_scan(spark):
    from sparkgraft.sources.readers import read_table

    events = read_table(spark, SF_DIR, "events")
    df = events.filter(F.col("event_type") == "purchase").select("event_id")
    pushed = audit.pushed_filters(df)
    assert any("event_type" in p for p in pushed), audit.explain_str(df)


def test_projection_pruning_reaches_scan(spark):
    from sparkgraft.sources.readers import read_table

    li = read_table(spark, SF_DIR, "lineitem")
    df = li.select("l_orderkey", "l_quantity")
    cols = audit.scan_schema_columns(df)
    assert cols and set(cols[0]) == {"l_orderkey", "l_quantity"}, (
        audit.explain_str(df)
    )


def test_aggregation_is_partial_final(spark):
    # Map-side combine: two HashAggregates around a single exchange.
    df = entrymod.q_channel_stats(spark, SF_DIR)
    plan = audit.explain_str(df)
    assert plan.count("HashAggregate") >= 2, plan

"""Round-12 verdict task 1: the driver grades the FIRST 50 entries of
``queries()`` — the window that went 50/50 green in round 11 after four
rounds of fetch-path archaeology.  Its composition is now FROZEN: any
reorder, rename, or accidental insertion ahead of slot 50 fails here
before it can silently swap a proven witness out of the graded set.

Intentional membership changes (there should be none without a verdict
directive) must update this list in the same commit, with the reason in
the round notes.  No Spark session needed.
"""

from __future__ import annotations

FROZEN_WINDOW = [
    "stats_panel",
    "latest_per_user",
    "latest_fallback",
    "top_per_group",
    "broadcast_lookup",
    "set_algebra",
    "asof_join",
    "rollup_pricing",
    "window_deltas",
    "forget_panel",
    "dedup_exact",
    "scalar_panel",
    "gate_panel",
    "kv_register_image",
    "classifier_panel",
    "report_scan",
    "upload_dedup",
    "event_store_dedup",
    "debounce_gate",
    "alarm_trigger",
    "gopher_gate",
    "annotate_panel",
    "minhash_dedup",
    "neardup_signals",
    "semdedup_panel",
    "ann_panel",
    "suffix_dedup",
    "text_profile",
    "bpe_segment",
    "sketch_sanity",
    "contamination_panel",
    "paragraph_dedup",
    "e1_flagship",
    "retrieval_metrics",
    "forget_flow",
    "timeseries_interp",
    "robust_outliers",
    "pagerank",
    "ngram_lm",
    "dsir_select",
    "hybrid_rrf",
    "sequence_count",
    "entity_resolution",
    "cusum_shift",
    "lakehouse_reads",
    "versioned_merge",
    "stream_cdc",
    "setsim_pairs",
    "kanon_audit",
    "suffix_budget",
]


def test_driver_window_composition_is_frozen():
    import __spark_entry__ as m

    assert list(m.queries())[:50] == FROZEN_WINDOW


def test_every_window_slot_is_oracle_backed():
    import __spark_entry__ as m

    oracles = m.oracle_sql()
    missing = [n for n in FROZEN_WINDOW if n not in oracles]
    assert missing == []

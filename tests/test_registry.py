"""Registration-order invariants for the driver correctness gate.

The external driver hash-compares only the first ``CHECK_WINDOW`` keys
of ``ALL_QUERIES`` (registration order) against their oracles — round 1
proved this the hard way: 16 late-registered extension queries got no
driver row at all. These tests pin the ordering contract so a future
registration edit can't silently push an unverified family out of the
window again.
"""

from __future__ import annotations

from remap_spark.queries import ALL_ORACLES, ALL_QUERIES, CHECK_WINDOW, _TAIL_QUERIES

WINDOW = list(ALL_QUERIES)[:CHECK_WINDOW]

# Queries that have never had a full green driver row (the 11 round-2
# additions, checked locally only, plus ext_approx_distinct whose
# oracle is new this round) — every one must sit inside the checked
# window until a green row is recorded.
NEVER_CHECKED = [
    "ext_dedup_canonical",
    "ext_dedup_incremental",
    "ext_text_decontaminate",
    "ext_text_pii",
    "ext_text_repetition",
    "ext_text_line_dedup",
    "ext_text_vocab",
    "ext_kmeans_embed",
    "ext_pack_sequences",
    "ext_sample_quality_mix",
    "ext_corpus_report",
    "ext_approx_distinct",
    # new in round 3
    "ext_text_tfidf",
    "ext_text_boilerplate",
    "ext_text_clean",
    "ext_sample_weighted",
    "ext_mix_temperature",
    "ext_split_leakage_safe",
    "ext_text_chunk",
    "ext_dedup_semantic",
    "dq41_recursive_sql",
    "dq42_star_components",
    "ext_pipeline_curate",
    "ext_text_lm_score",
    "ext_dedup_span",
    "ext_source_cap",
    "ext_dedup_bloom",
    "ext_ann_hard_negatives",
    "ext_corpus_diff",
    "ext_range_join_binned",
    "ext_text_bpe_pairs",
    "ext_quality_classifier",
    "ext_pagerank_dangling",
    "ext_approx_percentiles",
    "ext_funnel",
]

# Queries whose implementation changed in round 3 (repetition bigram
# rewrite, fixpoint block amortization, merge-upsert cents arithmetic,
# star-convergence signature, components entry checkpoint, LM-total
# window) — they need a fresh driver row.
CHANGED_R3 = [
    "ext_text_repetition",
    "ext_dedup_canonical",
    "ext_dedup_components",
    "dq16_flood_max",
    "dq44_merge_upsert",
    "dq42_star_components",
    "ext_dedup_semantic",
    "ext_split_leakage_safe",
    "ext_text_lm_score",
]


def test_never_checked_families_inside_window():
    missing = [q for q in NEVER_CHECKED if q not in WINDOW]
    assert not missing, f"unverified queries outside driver window: {missing}"


def test_changed_queries_inside_window():
    missing = [q for q in CHANGED_R3 if q not in WINDOW]
    assert not missing, f"changed queries outside driver window: {missing}"


def test_window_queries_all_have_oracles():
    # Inside the window every query should get the full rows+schema+hash
    # check; a no-oracle query there wastes a slot on a rows-only row.
    no_oracle = [q for q in WINDOW if q not in ALL_ORACLES]
    assert not no_oracle, f"window queries without oracles: {no_oracle}"


def test_tail_queries_exist_and_registered_last():
    # Every demoted name must still be a real registered query (a typo
    # here would silently shrink coverage), and the tail must actually
    # be at the end so the head fills the window.
    assert set(_TAIL_QUERIES) <= set(ALL_QUERIES)
    assert list(ALL_QUERIES)[-len(_TAIL_QUERIES):] == _TAIL_QUERIES


def test_oracles_reference_registered_queries():
    unknown = [q for q in ALL_ORACLES if q not in ALL_QUERIES]
    assert not unknown, f"oracles for unregistered queries: {unknown}"

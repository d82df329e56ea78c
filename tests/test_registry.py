"""Registration-order invariants for the driver correctness gate.

The external driver hash-compares only the first ``CHECK_WINDOW`` keys
of ``ALL_QUERIES`` (registration order) against their oracles — round 1
proved this the hard way: 16 late-registered extension queries got no
driver row at all. These tests pin the ordering contract so a future
registration edit can't silently push an unverified family out of the
window again, and bound how stale any query's latest green row may be.
"""

from __future__ import annotations

import glob
import json
import os

from remap_spark.queries import ALL_ORACLES, ALL_QUERIES, CHECK_WINDOW, _TAIL_QUERIES

WINDOW = list(ALL_QUERIES)[:CHECK_WINDOW]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Queries that have never had a full green driver row — every one must
# sit inside the checked window until a green row is recorded. The
# round-5 driver record (CORRECTNESS_r05.json) never landed, so every
# round-5 addition is still unchecked; each new queries() entry is
# appended here the same commit it is registered.
NEVER_CHECKED: list[str] = [
    "ext_dedup_incremental_fuzzy",  # new in round 5
    "ext_dedup_span_lengths",  # new in round 5
    "ext_pipeline_analytics",  # new in round 5
    "ext_active_users_approx",  # new in round 5
    "ext_ann_pq",  # new in round 5
    "ext_ann_ivf_pq",  # new in round 5
    "ext_pipeline_pretokenize",  # new in round 5
    "ext_dedup_lsh_verified",  # new in round 5
    "ext_graph_triangles",  # new in round 5
    "ext_graph_sssp",  # new in round 5
    "ext_text_bm25",  # new in round 5 (late)
    "ext_scd2_history",  # new in round 5 (late)
    "ext_scd2_incremental",  # new in round 5 (late)
    "ext_layout_zorder",  # new in round 5 (late)
    "ext_layout_hilbert",  # new in round 5 (late)
    "ext_rollup_incremental",  # new in round 5 (late)
    "ext_dedup_prefix_filter",  # new in round 5 (late)
    "ext_percentile_state",  # new in round 5 (late)
    "dq45_rank_funcs",  # new in round 6
    "ext_retrieval_rrf",  # new in round 6
    "ext_ts_gapfill",  # new in round 6
    "ext_ts_ewma",  # new in round 6
    "ext_user_paths",  # new in round 6
    "ext_text_bigram_lm",  # new in round 6
    "ext_kmv_distinct",  # new in round 6
    "ext_dedup_soft_weights",  # new in round 6
    "ext_recipe_token_budget",  # new in round 6
]

# Queries whose implementation changed in round 5 (paragraph-dedup
# separator regex fix, cohort-retention period-aligned cohort key) —
# they still need a fresh driver row because the r5 record never landed.
CHANGED_R5 = [
    "ext_dedup_paragraph_global",
    "ext_cohort_retention",
    "dq33_percentiles",  # single array-literal percentile buffer
    "ext_ann_lsh",  # multi-probe (Hamming-1) bucket expansion
]


def _recent_checked(n: int = 3) -> set[str]:
    """Union of query names green-checked in the last ``n`` RECORDED
    correctness rounds (the driver writes CORRECTNESS_r{N}.json when a
    round's verify step completes — round 5's record never landed, so
    'recorded rounds' and 'rounds' are not the same clock)."""
    records = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))[-n:]
    seen: set[str] = set()
    for path in records:
        with open(path) as f:
            seen |= set(json.load(f))
    return seen


def test_never_checked_families_inside_window():
    missing = [q for q in NEVER_CHECKED if q not in WINDOW]
    assert not missing, f"unverified queries outside driver window: {missing}"


def test_changed_queries_inside_window():
    missing = [q for q in CHANGED_R5 if q not in WINDOW]
    assert not missing, f"changed queries outside driver window: {missing}"


def test_max_staleness_three_recorded_rounds():
    """Every registered query is either in the upcoming driver window
    or has a green row within the last THREE recorded correctness
    rounds. Three is the tightest sustainable bound: the registry holds
    127 queries against a 50-slot window, so a full re-verification
    cycle needs ceil(127/50) = 3 records (the former two-round bound
    was only sustainable below 100 queries, and the lost round-5 record
    consumed any slack). The rotation comment in queries/__init__.py
    names which tail rows are due first in the next window."""
    recent = _recent_checked(3)
    stale = [q for q in ALL_QUERIES if q not in WINDOW and q not in recent]
    assert not stale, f"queries >3 recorded rounds stale and outside window: {stale}"


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

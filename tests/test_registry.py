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
# sit inside the checked window until a green row is recorded.
# (Populated as round-5 queries land; each new queries() entry is
# appended here the same commit it is registered.)
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
]

# Queries whose implementation changed in round 5 (paragraph-dedup
# separator regex fix, cohort-retention period-aligned cohort key) —
# they need a fresh driver row.
CHANGED_R5 = [
    "ext_dedup_paragraph_global",
    "ext_cohort_retention",
    "dq33_percentiles",  # single array-literal percentile buffer
    "ext_ann_lsh",  # multi-probe (Hamming-1) bucket expansion
]


def _recent_checked() -> set[str]:
    """Union of query names green-checked in the LAST TWO recorded
    correctness rounds (the driver writes CORRECTNESS_r{N}.json each
    round)."""
    records = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))[-2:]
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


def test_max_staleness_two_rounds():
    """Every registered query is either in the upcoming driver window
    or has a green row within the last TWO recorded correctness rounds
    — no query's latest driver evidence may fall more than two rounds
    behind. (Window capacity 50 over a ~105-query registry supports a
    3-round full cycle, so this bound is the tightest sustainable.)"""
    recent = _recent_checked()
    stale = [q for q in ALL_QUERIES if q not in WINDOW and q not in recent]
    assert not stale, f"queries >2 rounds stale and outside window: {stale}"


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

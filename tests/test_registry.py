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

from remap_spark.queries import (
    _DUE_FIRST_R8,
    _WINDOW_R7,
    ALL_ORACLES,
    ALL_QUERIES,
    CHECK_WINDOW,
)

WINDOW = list(ALL_QUERIES)[:CHECK_WINDOW]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Queries that have never had a full green driver row — every one must
# sit inside the checked window until a green row is recorded. Round-7
# promotion: the 33 staged queries (queries/staged_r7.py) registered
# this round; each was replay-verified against its DuckDB oracle at
# sf0.001 AND sf0.01 by tests/test_staged_r7.py before promotion, but
# none has a driver-gate row yet. Each new queries() entry is appended
# here the same commit it is registered.
NEVER_CHECKED: list[str] = [
    "ext_sample_wor",
    "ext_expectations",
    "ext_attribution",
    "ext_basket_rules",
    "ext_entity_resolution",
    "ext_rfm_segments",
    "ext_ts_zscore",
    "ext_ts_twap",
    "ext_skyline",
    "ext_skew_report",
    "ext_ab_test",
    "ext_crosstab_chi2",
    "ext_period_over_period",
    "ext_inverted_index",
    "ext_markov_transitions",
    "ext_kmv_set_ops",
    "ext_shuffle_shards",
    "ext_winsorize",
    "ext_cross_matches",
    "ext_k_core",
    "ext_table_changes",
    "ext_segment_overlap",
    "ext_pagerank_personalized",
    "ext_label_propagation",
    "ext_modularity",
    "ext_winnow",
    "ext_pca_project",
    "ext_ewma_forecast",
    "ext_seasonal",
    "ext_semantic_decontaminate",
    "ext_scd2_lookup",
    "ext_quantile_bins",
    "ext_mad_outliers",
]

# Queries whose implementation changed since their latest recorded green
# driver row. Empty at r7 start: all four round-5-changed queries
# received green CORRECTNESS_r06 rows. Any semantic change to a
# registered query this round must add its name here (forcing it into
# the window) the same commit.
CHANGED_SINCE_LAST_ROW: list[str] = [
    # r7: bigram-LM model join rewritten (left + coalesce floor, forced
    # broadcast dropped for the uncapped path per ADVICE; top-M cap
    # param added). Results bit-identical under the full local replay,
    # but a changed registered query belongs inside the window.
    "ext_text_bigram_lm",
]


def _recent_checked(n: int) -> set[str]:
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
    missing = [q for q in CHANGED_SINCE_LAST_ROW if q not in WINDOW]
    assert not missing, f"changed queries outside driver window: {missing}"


def test_max_staleness_four_recorded_rounds():
    """Every registered query is either in the upcoming driver window
    or has a green row within the last FOUR recorded correctness
    rounds. Four is the tightest sustainable bound: the registry holds
    169 queries against a 50-slot window, so a full re-verification
    cycle needs ceil(169/50) = 4 records (the former 3-round bound was
    arithmetically unsatisfiable the moment the 33 staged r7 queries
    registered: 169 − 50 = 119 > 97 = |r04 ∪ r06|). The 119 non-window
    queries are covered by r03 (23) + r04 (47) + r06 (49); the
    50×4 = 200 ceiling leaves 31 slots of registry-growth headroom,
    which is why r7 additions ship staged (see the rotation comment in
    queries/__init__.py)."""
    recent = _recent_checked(4)
    stale = [q for q in ALL_QUERIES if q not in WINDOW and q not in recent]
    assert not stale, f"queries >4 recorded rounds stale and outside window: {stale}"


def test_window_is_exactly_the_r7_plan():
    # The r7 window is pinned name-by-name: 33 staged + the 17
    # most-stale r3 rows, in documented priority order.
    assert WINDOW == _WINDOW_R7
    assert len(_WINDOW_R7) == CHECK_WINDOW


def test_due_first_r8_rows_follow_window():
    # The 23 remaining r3-green rows sit immediately after the window:
    # outside it this round (their r03 record covers them under the
    # 4-round bound) and first in line for the r8 rotation.
    assert list(ALL_QUERIES)[CHECK_WINDOW : CHECK_WINDOW + len(_DUE_FIRST_R8)] == _DUE_FIRST_R8


def test_window_queries_all_have_oracles():
    # Inside the window every query should get the full rows+schema+hash
    # check; a no-oracle query there wastes a slot on a rows-only row.
    no_oracle = [q for q in WINDOW if q not in ALL_ORACLES]
    assert not no_oracle, f"window queries without oracles: {no_oracle}"


def test_oracles_reference_registered_queries():
    unknown = [q for q in ALL_ORACLES if q not in ALL_QUERIES]
    assert not unknown, f"oracles for unregistered queries: {unknown}"

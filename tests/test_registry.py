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
    _DUE_FIRST_R9,
    _WINDOW_R8,
    ALL_ORACLES,
    ALL_QUERIES,
    CHECK_WINDOW,
)

WINDOW = list(ALL_QUERIES)[:CHECK_WINDOW]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Queries that have never had a full green driver row — every one must
# sit inside the checked window until a green row is recorded. Round-8
# promotion: 24 of the 26 staged_r8 queries registered this round
# (ext_benford / ext_interval_concurrency are HELD for r9 — see
# queries/staged_r8.HELD_FOR_R9); each was replay-verified against its
# DuckDB oracle at sf0.001 AND sf0.01 by tests/test_staged_r8.py before
# promotion, but none has a driver-gate row yet. Each new queries()
# entry is appended here the same commit it is registered.
NEVER_CHECKED: list[str] = [
    "ext_entity_resolution_multi",
    "ext_dedup_span_maximal",
    "ext_dedup_keep_one",
    "ext_mm_audio_mp3_meta",
    "ext_text_trigram_backoff",
    "ext_dedup_incremental_spans",
    "ext_graph_hits",
    "ext_decontaminate_spans",
    "ext_text_rake",
    "ext_cep_pattern",
    "ext_ivm_join_delta",
    "ext_cumulative_users",
    "ext_k_truss",
    "ext_mm_exif",
    "ext_weighted_percentiles",
    "ext_clustering_coeff",
    "ext_dedup_keep_best",
    "ext_fd_violations",
    "ext_phrase_search",
    "ext_ts_decompose",
    "ext_text_textrank",
    "ext_inclusion_profile",
    "ext_ts_interpolate",
    "ext_trend_slopes",
]

# Queries whose implementation changed since their latest recorded
# driver row. Any semantic change to a registered query this round must
# add its name here (forcing it into the window) the same commit.
CHANGED_SINCE_LAST_ROW: list[str] = [
    # r8: both r7 RED rows re-enter with their ARRAY output columns
    # serialized to comma-joined strings at the query-wrapper boundary
    # (oracles mirrored with array_to_string) — the driver's pandas
    # canonicalizer cannot hash list cells. Operators keep typed
    # arrays; see SURVEY §8's array-free output convention.
    "ext_inverted_index",
    "ext_table_changes",
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


def _latest_row_status() -> dict[str, bool]:
    """name -> is the LATEST recorded driver row green? (rows+schema+
    hash all true-or-absent and no harness error)."""
    latest: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            for name, row in json.load(f).items():
                ok = (
                    bool(row.get("rows_match"))
                    and row.get("schema_match") in (True, None)
                    and row.get("hash_match") in (True, None)
                    and not row.get("err")
                )
                latest[name] = ok
    return latest


def test_never_checked_families_inside_window():
    missing = [q for q in NEVER_CHECKED if q not in WINDOW]
    assert not missing, f"unverified queries outside driver window: {missing}"


def test_changed_queries_inside_window():
    missing = [q for q in CHANGED_SINCE_LAST_ROW if q not in WINDOW]
    assert not missing, f"changed queries outside driver window: {missing}"


def test_red_latest_rows_inside_window():
    """A registered query whose LATEST driver row is red has no valid
    green signal at any staleness — it must re-enter the window every
    round until a green row lands (the r7 lesson: ext_inverted_index /
    ext_table_changes burned their first check on the array-canon
    crash and re-check here in r8)."""
    latest = _latest_row_status()
    red = [q for q in ALL_QUERIES if q in latest and not latest[q]]
    missing = [q for q in red if q not in WINDOW]
    assert not missing, f"red-latest queries outside driver window: {missing}"


def test_max_staleness_four_recorded_rounds():
    """Every registered query is either in the upcoming driver window
    or has a row within the last FOUR recorded correctness rounds.
    Four is the tightest sustainable bound: the registry holds 191
    queries against a 50-slot window, so a full re-verification cycle
    needs ceil(191/50) = 4 records. The 141 non-window queries are
    covered by r04 (44 of its 47 — dq01_project moved in-window as the
    r9 smoothing pre-check, ext_funnel/dq21_right_outer retired to the
    pytest tier) + r06 (49) + r07 (48, the 2 reds moved in-window);
    the 50×4 = 200 ceiling leaves 9 rotation-headroom slots, which is
    why r8 additions ship staged and the rotation comment in
    queries/__init__.py budgets r9/r10 promotions."""
    recent = _recent_checked(4)
    stale = [q for q in ALL_QUERIES if q not in WINDOW and q not in recent]
    assert not stale, f"queries >4 recorded rounds stale and outside window: {stale}"


def test_window_is_exactly_the_r8_plan():
    # The r8 window is pinned name-by-name: the 2 red re-checks + 24
    # promoted staged_r8 + the 23 rows due first after r7 + the
    # dq01_project smoothing pre-check, in documented priority order.
    assert WINDOW == _WINDOW_R8
    assert len(_WINDOW_R8) == CHECK_WINDOW


def test_due_first_r9_rows_follow_window():
    # The 44 remaining r04-latest rows sit immediately after the
    # window: outside it this round (their r04 record covers them
    # under the 4-round bound) and first in line for the r9 rotation
    # (44 due-first + 6 staged promotions = exactly 50 — the retirement
    # arithmetic in queries/retired.py).
    assert (
        list(ALL_QUERIES)[CHECK_WINDOW : CHECK_WINDOW + len(_DUE_FIRST_R9)]
        == _DUE_FIRST_R9
    )


def test_window_queries_all_have_oracles():
    # Inside the window every query should get the full rows+schema+hash
    # check; a no-oracle query there wastes a slot on a rows-only row.
    no_oracle = [q for q in WINDOW if q not in ALL_ORACLES]
    assert not no_oracle, f"window queries without oracles: {no_oracle}"


def test_oracles_reference_registered_queries():
    unknown = [q for q in ALL_ORACLES if q not in ALL_QUERIES]
    assert not unknown, f"oracles for unregistered queries: {unknown}"


def test_held_staged_queries_stay_unregistered():
    """The two r8-held staged queries must NOT be registered (their
    window slot doesn't exist this round); they re-enter via the r9
    promotion with the staged replay as their interim signal."""
    from remap_spark.queries.staged_r8 import HELD_FOR_R9

    registered = [q for q in HELD_FOR_R9 if q in ALL_QUERIES]
    assert not registered, f"held staged queries leaked into registry: {registered}"


def test_r9_window_plan_arithmetic():
    """The r9 promotion is pre-verified mechanically: the 44 due-first
    rows + the 2 held staged_r8 queries + the 4 staged_r9 queries are
    exactly 50 distinct names — the retirement in queries/retired.py
    made the plan close with zero held-over candidates (it was 52
    obligations before). Every due-first name must still be registered
    and every promotion candidate must exist in its staged module, so
    a rename or deletion breaks this BEFORE the r9 window is built."""
    from remap_spark.queries.staged_r8 import HELD_FOR_R9, STAGED_R8_QUERIES
    from remap_spark.queries.staged_r9 import STAGED_R9_QUERIES

    planned = (
        list(_DUE_FIRST_R9)
        + sorted(HELD_FOR_R9)
        + sorted(STAGED_R9_QUERIES)
    )
    assert len(planned) == CHECK_WINDOW, len(planned)
    assert len(set(planned)) == CHECK_WINDOW
    missing = [n for n in _DUE_FIRST_R9 if n not in ALL_QUERIES]
    assert not missing, f"due-first rows not registered: {missing}"
    unstaged = [n for n in HELD_FOR_R9 if n not in STAGED_R8_QUERIES]
    assert not unstaged, f"held names missing from staged_r8: {unstaged}"


def test_retired_names_absent_from_rotation_lists():
    """Retired rows must not linger in any rotation structure — a
    stale name there would make the window builder silently skip it
    (membership-guarded) and under-fill the driver window."""
    from remap_spark.queries.retired import RETIRED_QUERIES

    for name in RETIRED_QUERIES:
        assert name not in _WINDOW_R8
        assert name not in _DUE_FIRST_R9

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
    _DUE_FIRST_R10,
    _DUE_FIRST_R11,
    _SMOOTHING_R10,
    _WINDOW_R10,
    ALL_ORACLES,
    ALL_QUERIES,
    CHECK_WINDOW,
)

WINDOW = list(ALL_QUERIES)[:CHECK_WINDOW]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Queries that have never had a full green driver row — every one must
# sit inside the checked window until a green row is recorded. Round-10
# promotion: the single staged_r10 row, replay-verified against its
# DuckDB oracle at sf0.001 AND sf0.01 (tests/test_staged_r10.py) and
# property-tested against a pandas ground truth before promotion, but
# with no driver-gate row yet. Each new queries() entry is appended
# here the same commit it is registered.
NEVER_CHECKED: list[str] = [
    "ext_k_anonymity",
]

# Queries whose implementation changed since their latest recorded
# driver row. Any semantic change to a registered query this round must
# add its name here (forcing it into the window) the same commit.
CHANGED_SINCE_LAST_ROW: list[str] = []


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


def _latest_round() -> dict[str, str]:
    """name -> round id ('04'..'09') of the latest recorded driver row."""
    latest: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path).split("_r")[1].split(".")[0]
        with open(path) as f:
            for name in json.load(f):
                latest[name] = rnd
    return latest


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
    round until a green row lands (the r7 lesson: the two array-canon
    crashes burned their first check and re-greened in r8). As of r9
    this set is empty; the test keeps it that way."""
    latest = _latest_row_status()
    red = [q for q in ALL_QUERIES if q in latest and not latest[q]]
    missing = [q for q in red if q not in WINDOW]
    assert not missing, f"red-latest queries outside driver window: {missing}"


def test_max_staleness_four_recorded_rounds():
    """Every registered query is either in the upcoming driver window
    or has a row within the last FOUR recorded correctness rounds.
    Four is the tightest sustainable bound: the registry holds 197
    queries (196 post-r9 plus the r10-promoted ext_k_anonymity)
    against a 50-slot window, so a full re-verification cycle needs
    ceil(197/50) = 4 records. The 147 non-window queries are covered
    by r07 (47 remaining after the smoothing pre-check) + r08 (50) +
    r09 (50); the r9 ext_sample_det retirement keeps one
    smoothing/insurance slot per round from r10 onward (see the
    rotation comment in queries/__init__.py)."""
    recent = _recent_checked(4)
    stale = [q for q in ALL_QUERIES if q not in WINDOW and q not in recent]
    assert not stale, f"queries >4 recorded rounds stale and outside window: {stale}"


def test_window_is_exactly_the_r10_plan():
    # The r10 window is pinned name-by-name: the 1 never-driver-checked
    # promotion (staged_r10's ext_k_anonymity), the smoothing-slot
    # pre-check (ext_entity_resolution — r07-latest, plan changed twice
    # since its record with bit-identical pytest pins), then the 48
    # rows due first after r9 (latest green row: r06), in documented
    # priority order — exactly the arithmetic the r9 verdict
    # pre-verified.
    assert WINDOW == _WINDOW_R10
    assert len(_WINDOW_R10) == CHECK_WINDOW
    assert _WINDOW_R10[:1] == NEVER_CHECKED
    assert _WINDOW_R10[1] == _SMOOTHING_R10
    assert _WINDOW_R10[2:] == _DUE_FIRST_R10


def test_due_first_r11_rows_follow_window():
    # The 47 r07-latest rows sit immediately after the window: outside
    # it this round (their r07 record covers them under the 4-round
    # bound) and first in line for the r11 rotation (47 due-first + 2
    # staged_r11 promotions = 49, one spare slot).
    assert (
        list(ALL_QUERIES)[CHECK_WINDOW : CHECK_WINDOW + len(_DUE_FIRST_R11)]
        == _DUE_FIRST_R11
    )


def test_window_queries_all_have_oracles():
    # Inside the window every query should get the full rows+schema+hash
    # check; a no-oracle query there wastes a slot on a rows-only row.
    no_oracle = [q for q in WINDOW if q not in ALL_ORACLES]
    assert not no_oracle, f"window queries without oracles: {no_oracle}"


def test_oracles_reference_registered_queries():
    unknown = [q for q in ALL_ORACLES if q not in ALL_QUERIES]
    assert not unknown, f"oracles for unregistered queries: {unknown}"


def test_r10_promotion_is_registered():
    """The r10 promotion must be registered with its oracle, and be
    exactly the NEVER_CHECKED set (nothing else in the registry lacks
    a driver row)."""
    from remap_spark.queries.staged_r10 import STAGED_R10_QUERIES

    promoted = sorted(STAGED_R10_QUERIES)
    missing = [q for q in promoted if q not in ALL_QUERIES]
    assert not missing, f"r10 promotion not registered: {missing}"
    no_oracle = [q for q in promoted if q not in ALL_ORACLES]
    assert not no_oracle, f"r10 promotion without oracle: {no_oracle}"
    assert promoted == sorted(NEVER_CHECKED)


def test_smoothing_pick_is_r07_latest():
    """The smoothing slot must re-check a query that HAS a recorded
    green row but the oldest one eligible (r07-latest after the r06
    set enters the window) — not burn the slot on an already-fresh
    row."""
    latest = _latest_round()
    assert latest.get(_SMOOTHING_R10) == "07"
    assert _latest_row_status()[_SMOOTHING_R10] is True


def test_r11_window_plan_arithmetic():
    """r11 lookahead, derived not asserted: the registered rows whose
    latest recorded driver row is CORRECTNESS_r07, minus the r10
    smoothing pre-check (which gets a fresh r10 row), + the 2
    staged_r11 queries fit the window with ZERO held-over candidates
    and one spare slot."""
    from remap_spark.queries.staged_r11 import STAGED_R11_QUERIES

    latest = _latest_round()
    r07_latest = [
        n
        for n, r in latest.items()
        if r == "07" and n in ALL_QUERIES and n != _SMOOTHING_R10
    ]
    planned = r07_latest + sorted(STAGED_R11_QUERIES)
    assert len(planned) <= CHECK_WINDOW - 1, len(planned)
    assert len(planned) == len(set(planned))
    already = [n for n in STAGED_R11_QUERIES if n in ALL_QUERIES]
    assert not already, f"staged_r11 queries leaked into registry: {already}"


def test_due_first_r10_is_exactly_the_r06_latest_set():
    """The window's due-first body must be derived, not asserted: it
    is exactly the set of registered queries whose latest recorded
    driver row is CORRECTNESS_r06 (not re-checked in r07/r08/r09)."""
    latest = _latest_round()
    r06_latest = sorted(
        n for n, r in latest.items() if r == "06" and n in ALL_QUERIES
    )
    assert r06_latest == sorted(_DUE_FIRST_R10)


def test_due_first_r11_is_exactly_the_remaining_r07_latest_set():
    """Same derivation for the next round's due set: the r07-latest
    registered rows minus the smoothing pre-check."""
    latest = _latest_round()
    r07_latest = sorted(
        n
        for n, r in latest.items()
        if r == "07" and n in ALL_QUERIES and n != _SMOOTHING_R10
    )
    assert r07_latest == sorted(_DUE_FIRST_R11)


def test_retired_names_absent_from_rotation_lists():
    """Retired rows must not linger in any rotation structure — a
    stale name there would make the window builder silently skip it
    (membership-guarded) and under-fill the driver window."""
    from remap_spark.queries.retired import RETIRED_QUERIES

    for name in RETIRED_QUERIES:
        assert name not in _WINDOW_R10
        assert name not in _DUE_FIRST_R11

"""Retired driver-gate rows (r8): long-green duplicate-capability
queries moved from the registry to the pytest tier to relieve the
rotation ceiling.

The driver window holds 50 slots per round with a 4-recorded-round
staleness bound, so the registry ceiling is 200 names and long-run
promotion bandwidth is (200 - registry)/4 queries per round. The r9
window was over-committed — 46 r04-latest rows due first + 6 staged
promotion candidates = 52 names for 50 slots — and the r7 verdict
sanctioned exactly this resolution: "retire ... a long-green
duplicate-capability row" per promotion beyond the bandwidth. The two
rows retired here are strict capability duplicates of still-registered
siblings, chosen so no SURVEY §2 row loses its driver-green proof:

- ``ext_funnel`` (r04-green): per-step funnel counts. Strictly
  subsumed by the registered ``ext_funnel_conversion`` (same
  sessionize → ordered-step match pipeline, plus conversion rates) and
  exercised end-to-end by the ``ext_pipeline_analytics`` flagship.
- ``dq21_right_outer`` (r04-green): the mirror image of the
  registered ``dq21_left_outer`` — Spark plans a right outer join AS a
  left outer with the build side swapped, so the physical capability
  is one and the same; ``dq21_full_outer`` stays registered too.

Retired ≠ deleted: the query functions and oracle SQL remain exactly
as registered (the functions still live in ``relational.py``; the SQL
constants here are the verbatim ``oracles.py`` texts), and
``tests/test_retired.py`` replays both against DuckDB every run — the
correctness proof continues at the pytest tier, it just no longer
consumes driver-window slots. Reinstating one is a two-line dict move.
"""

from __future__ import annotations

from . import extensions, relational
from .oracles import RETIRED_DQ_ORACLES

# r9 retirement — restores rotation slack before the registry reaches
# the 200-name ceiling at r11 (a full registry leaves ZERO spare slots
# from r12 on, so a single red row would make the next window
# 51-for-50; one slack slot per round is the red-recheck insurance):
#
# - ``ext_sample_det`` (r06-green, green since r3): constant-fraction
#   deterministic sampling. deterministic_sample(df, key, frac) IS
#   hash_split(df, key, {keep: frac})'s first CDF segment — the same
#   ``split_bucket`` md5 primitive compared against the same cumulative
#   cutoff (operators/split.py:115 vs :59-67) — so the registered
#   ``ext_split_train_test`` proves the identical engine-portable
#   assignment capability; the operator also remains load-bearing
#   inside weighted_sample and the leakage-safe splitter, both
#   registered.
RETIRED_QUERIES = {
    "ext_funnel": relational.ext_funnel,
    "dq21_right_outer": relational.dq21_right_outer,
    "ext_sample_det": extensions.ext_sample_det,
}

RETIRED_ORACLES = dict(RETIRED_DQ_ORACLES)
RETIRED_ORACLES["ext_sample_det"] = extensions._SAMPLE_SQL

assert set(RETIRED_ORACLES) == set(RETIRED_QUERIES)

"""Query registry: every declared query (SURVEY.md §2.13) plus the
training-data-pipeline extension queries, with their DuckDB oracles.

``ALL_QUERIES``: name -> (spark, sf_dir) -> DataFrame
``ALL_ORACLES``: name -> ANSI SQL for DuckDB (absent key = rows-only check)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import relational
from .graphs import (
    GRAPH_ORACLES,
    dq16_flood_max,
    dq17_pagerank,
    dq40_pointer_jump,
    dq42_star_components,
    ext_graph_sssp,
    ext_graph_triangles,
    ext_pagerank_dangling,
)
from .oracles import DQ_ORACLES

QueryFn = Callable[[SparkSession, str], DataFrame]

ALL_QUERIES: dict[str, QueryFn] = {
    "dq01_project": relational.dq01_project,
    "dq02_filter": relational.dq02_filter,
    "dq03_wordcount": relational.dq03_wordcount,
    "dq04_collation": relational.dq04_collation,
    "dq05_agg": relational.dq05_agg,
    "dq06_secondary_sort": relational.dq06_secondary_sort,
    "dq07_topk": relational.dq07_topk,
    "dq08_join_agg": relational.dq08_join_agg,
    "dq09_multiway_join": relational.dq09_multiway_join,
    "dq10_anti": relational.dq10_anti,
    "dq10_semi": relational.dq10_semi,
    "dq11_intersect": relational.dq11_intersect,
    "dq11_except": relational.dq11_except,
    "dq12_rollup": relational.dq12_rollup,
    "dq13_tumbling": relational.dq13_tumbling,
    "dq14_sessionize": relational.dq14_sessionize,
    "dq15_json": relational.dq15_json,
    "dq15_year": relational.dq15_year,
    "dq16_flood_max": dq16_flood_max,
    "dq17_pagerank": dq17_pagerank,
    "dq40_pointer_jump": dq40_pointer_jump,
    "dq42_star_components": dq42_star_components,
    "ext_pagerank_dangling": ext_pagerank_dangling,
    "ext_graph_triangles": ext_graph_triangles,
    "ext_graph_sssp": ext_graph_sssp,
    "dq18_grouped_udf": relational.dq18_grouped_udf,
    "dq19_buckets": relational.dq19_buckets,
    "dq20_range_join": relational.dq20_range_join,
    "dq21_left_outer": relational.dq21_left_outer,
    "dq21_full_outer": relational.dq21_full_outer,
    # dq21_right_outer: RETIRED to the pytest tier in r8 (duplicate
    # capability — Spark plans right outer AS left outer with the build
    # side swapped; left+full stay registered). See queries/retired.py.
    "dq22_union": relational.dq22_union,
    "dq23_cube": relational.dq23_cube,
    "dq24_asof_join": relational.dq24_asof_join,
    "dq25_window_funcs": relational.dq25_window_funcs,
    "dq26_distinct_agg": relational.dq26_distinct_agg,
    "dq27_sliding": relational.dq27_sliding,
    "dq28_exists": relational.dq28_exists,
    "dq29_scalar_subquery": relational.dq29_scalar_subquery,
    "dq30_grouping_sets": relational.dq30_grouping_sets,
    "dq31_pivot": relational.dq31_pivot,
    "dq32_session_window": relational.dq32_session_window,
    "dq33_percentiles": relational.dq33_percentiles,
    "dq34_array_funcs": relational.dq34_array_funcs,
    "dq35_regexp": relational.dq35_regexp,
    "dq36_conditional_agg": relational.dq36_conditional_agg,
    "dq37_lead_lag": relational.dq37_lead_lag,
    "dq38_sql_api": relational.dq38_sql_api,
    "dq41_recursive_sql": relational.dq41_recursive_sql,
    "dq39_running_total": relational.dq39_running_total,
    "dq45_rank_funcs": relational.dq45_rank_funcs,
    "dq43_rolling_range": relational.dq43_rolling_range,
    "dq44_merge_upsert": relational.dq44_merge_upsert,
    "ext_profile_columns": relational.ext_profile_columns,
    # HLL sketch values differ across engines: the oracle checks an
    # error-band predicate (see relational.ext_approx_distinct)
    "ext_approx_distinct": relational.ext_approx_distinct,
    "ext_approx_percentiles": relational.ext_approx_percentiles,
    # ext_funnel: RETIRED to the pytest tier in r8 (strictly subsumed
    # by ext_funnel_conversion; pipeline flagship also covers it).
    "ext_funnel_conversion": relational.ext_funnel_conversion,
    "ext_cohort_retention": relational.ext_cohort_retention,
    "ext_active_users": relational.ext_active_users,
    "ext_pipeline_analytics": relational.ext_pipeline_analytics,
    "ext_active_users_approx": relational.ext_active_users_approx,
}

ALL_ORACLES: dict[str, str] = {**DQ_ORACLES, **GRAPH_ORACLES}


def register_extensions() -> None:
    """Extension queries (dedup / similarity / text analysis) register
    themselves here as they are implemented; imported lazily so a broken
    extension never takes down the core DQ set."""
    try:
        from . import extensions  # noqa: F401

        ALL_QUERIES.update(extensions.EXT_QUERIES)
        ALL_ORACLES.update(extensions.EXT_ORACLES)
    except ImportError:
        pass
    try:
        from . import multimodal_q  # noqa: F401

        ALL_QUERIES.update(multimodal_q.MM_QUERIES)
        ALL_ORACLES.update(multimodal_q.MM_ORACLES)
    except ImportError:
        pass
    try:
        # Round-7 promotion: the 33 queries staged through round 6
        # (replay-verified at sf0.001 AND sf0.01 by tests/test_staged_r7.py,
        # plan-swept by tests/test_plans_r6.py) enter the registry and the
        # driver window this round.
        from . import staged_r7  # noqa: F401

        ALL_QUERIES.update(staged_r7.STAGED_QUERIES)
        ALL_ORACLES.update(staged_r7.STAGED_ORACLES)
    except ImportError:
        pass
    try:
        # Round-8 promotion: 24 of the 26 queries staged through round 7
        # (replay-verified at sf0.001 AND sf0.01 by tests/test_staged_r8.py,
        # plan-swept by its cartesian/Python sweeps) enter the registry
        # and the driver window this round. Two are HELD for r9 — the
        # window arithmetic below explains why — and stay staged.
        from . import staged_r8  # noqa: F401

        ALL_QUERIES.update(
            {
                k: v
                for k, v in staged_r8.STAGED_R8_QUERIES.items()
                if k not in staged_r8.HELD_FOR_R9
            }
        )
        ALL_ORACLES.update(
            {
                k: v
                for k, v in staged_r8.STAGED_R8_ORACLES.items()
                if k not in staged_r8.HELD_FOR_R9
            }
        )
    except ImportError:
        pass


register_extensions()

# ---------------------------------------------------------------------------
# Verification-priority ordering.
#
# The external correctness driver compares the FIRST `CHECK_WINDOW` keys of
# ALL_QUERIES (registration order) against their DuckDB oracles; anything
# after that gets no hard correctness signal for the round. Registration
# order therefore encodes verification priority: queries whose semantics
# changed recently and families that have never had a driver-gate row come
# first; long-green variants whose capability is also proven by an in-window
# sibling (plus their own recorded round-1 pass) fill the tail.
CHECK_WINDOW = 50

# Round-8 window arithmetic. The registry holds 169 + 24 promoted
# staged_r8 queries - 2 retired duplicate-capability rows (ext_funnel,
# dq21_right_outer — moved to the pytest tier, queries/retired.py) =
# 191 against the 50-slot window; the staleness bound stays at
# ceil(191/50) = 4 recorded rounds. The r8 window is
# over-subscribed by construction — 51 obligations for 50 slots:
#   26 staged_r8 (never driver-checked => must be in-window the commit
#      they register)
# + 23 _DUE_FIRST_R8 rows (their r03 record leaves the last-4 recorded
#      set the moment CORRECTNESS_r08 lands)
# +  2 RED r7 rows (ext_inverted_index / ext_table_changes: the driver
#      canon crashed on their ARRAY output columns, so they have never
#      been driver-green; a red latest row cannot satisfy the
#      staleness invariant — they re-enter with serialized outputs,
#      see SURVEY §8's array-free convention)
# = 51. Resolution per the r7 verdict: promote only 24 of staged_r8 —
# ext_benford and ext_interval_concurrency are HELD for r9 (their
# families keep in-window r8 siblings: fd_violations /
# inclusion_profile, ts_decompose / ts_interpolate / trend_slopes) and
# stay staged-with-replay, unregistered. That makes the window
# 2 red re-checks + 24 promotions + 23 due-first = 49, and the 50th
# slot pre-checks dq01_project (an r04-latest row) to smooth the r9
# crunch below. Non-window coverage check: 191 - 50 = 141 =
# 44 r04-latest (47 minus the pre-checked dq01 and the 2 retired) +
# 49 r06-latest + 48 r07-latest (50 minus the 2 in-window reds) —
# every one inside the last four recorded rounds (r03 r04 r06 r07 now;
# r04 r06 r07 r08 once the r8 record lands, at which point the 23 r03
# rows are in-window).
#
# r9 LOOKAHEAD (verified now so the next promotion cannot over-commit):
# when CORRECTNESS_r09 lands the last-4 set becomes r06/r07/r08/r09,
# so the 44 _DUE_FIRST_R9 rows (latest green r04) must all sit in the
# r9 window — leaving exactly 6 slots for the 6 promotion candidates
# (2 held staged_r8 + 4 staged_r9): the r9 window closes at exactly
# 44 + 6 = 50 with no held-over staged queries. This is why the r7
# verdict's sanctioned retirement option was taken in r8 (ext_funnel /
# dq21_right_outer, strict capability duplicates — see
# queries/retired.py): without it r9 had 52 obligations for 50 slots.
# r10 LOOKAHEAD: last-4 becomes r07/r08/r09/r10 and the 49 r06-latest
# rows fall due — 49 + 1 = 50 with the one spare slot earmarked for
# the single staged_r10 query (ext_k_anonymity, queries/staged_r10.py;
# replay-verified both SFs). Structurally: registry 191 + 6 = 197
# post-r9, + 1 = 198 post-r10 vs the 50x4 = 200 ceiling keeps long-run
# promotion bandwidth under 1 query per round; per the r7 verdict,
# additions beyond that must stay capacity-neutral (retire or
# consolidate a duplicate row per addition).
_WINDOW_R8 = [
    # -- the 2 red r7 rows: first priority, never driver-green --
    "ext_inverted_index",
    "ext_table_changes",
    # -- the 24 promoted staged_r8 queries (first driver check) --
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
    # -- the 23 rows due first after r7 (latest green row: r03) --
    "ext_dedup_bloom",
    "ext_ann_hard_negatives",
    "ext_mix_temperature",
    "ext_range_join_binned",
    "dq28_exists",
    "dq30_grouping_sets",
    "dq11_except",
    "dq18_grouped_udf",
    "dq24_asof_join",
    "dq41_recursive_sql",
    "dq43_rolling_range",
    "dq44_merge_upsert",
    "ext_profile_columns",
    "ext_approx_distinct",
    "ext_quality_classifier",
    "ext_dedup_exact",
    "ext_ann_ivf",
    "ext_text_pii",
    "ext_dedup_incremental",
    "ext_kmeans_embed",
    "ext_pipeline_curate",
    "ext_text_decontaminate",
    "ext_approx_percentiles",
    # -- 50th slot: r04-latest pre-check, smooths the r9 crunch --
    "dq01_project",
]

# The 44 remaining r04-latest rows (46 minus the 2 retired): OUTSIDE
# the r8 window (covered by their r04 record under the
# 4-recorded-round bound) and due FIRST in the r9 window — they fall
# outside the last-4-records set the moment the r9 verify lands a new
# CORRECTNESS file.
_DUE_FIRST_R9 = [
    "dq02_filter",
    "dq04_collation",
    "dq05_agg",
    "dq06_secondary_sort",
    "dq07_topk",
    "dq08_join_agg",
    "dq09_multiway_join",
    "dq10_anti",
    "dq10_semi",
    "dq11_intersect",
    "dq12_rollup",
    "dq13_tumbling",
    "dq14_sessionize",
    "dq15_json",
    "dq15_year",
    "dq16_flood_max",
    "dq17_pagerank",
    "dq19_buckets",
    "dq20_range_join",
    "dq21_full_outer",
    "dq21_left_outer",
    "dq22_union",
    "dq23_cube",
    "dq25_window_funcs",
    "dq26_distinct_agg",
    "dq27_sliding",
    "dq29_scalar_subquery",
    "dq31_pivot",
    "dq32_session_window",
    "dq34_array_funcs",
    "dq35_regexp",
    "dq39_running_total",
    "dq40_pointer_jump",
    "dq42_star_components",
    "ext_active_users",
    "ext_dedup_canonical",
    "ext_dedup_components",
    "ext_dedup_semantic",
    "ext_dedup_span",
    "ext_dedup_span_removal",
    "ext_funnel_conversion",
    "ext_pagerank_dangling",
    "ext_split_leakage_safe",
    "ext_text_bpe_pairs",
]


def _apply_check_priority() -> None:
    """Reorder ALL_QUERIES so the driver's 50-slot check window holds
    exactly ``_WINDOW_R8`` (in that order), immediately followed by the
    ``_DUE_FIRST_R9`` rows (outside the window this round, first in line
    next round), then every other registered query in registration
    order (all r4/r6-green, code unchanged since their latest row)."""
    # membership-guarded (register_extensions deliberately swallows a
    # broken extension module's ImportError; a KeyError here would
    # take down the core DQ set that contract protects — the registry
    # tests still fail loudly on any missing window name)
    window = {k: ALL_QUERIES[k] for k in _WINDOW_R8 if k in ALL_QUERIES}
    due_next = {k: ALL_QUERIES[k] for k in _DUE_FIRST_R9 if k in ALL_QUERIES}
    rest = {
        k: v
        for k, v in ALL_QUERIES.items()
        if k not in window and k not in due_next
    }
    ALL_QUERIES.clear()
    ALL_QUERIES.update(window)
    ALL_QUERIES.update(due_next)
    ALL_QUERIES.update(rest)


_apply_check_priority()

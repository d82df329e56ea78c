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
    "dq22_union": relational.dq22_union,
    "dq23_cube": relational.dq23_cube,
    "dq24_asof_join": relational.dq24_asof_join,
    "dq25_window_funcs": relational.dq25_window_funcs,
    "dq26_distinct_agg": relational.dq26_distinct_agg,
    "dq27_sliding": relational.dq27_sliding,
    "dq21_right_outer": relational.dq21_right_outer,
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
    "ext_funnel": relational.ext_funnel,
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

# Round-7 window arithmetic. The registry now holds 169 queries against a
# 50-slot window, so a full re-verification cycle needs ceil(169/50) = 4
# recorded correctness rounds (the former 3-round bound was only
# satisfiable below 151 queries; the staleness test in
# tests/test_registry.py moved with this promotion). The r7 window is
# exactly: the 33 staged round-7 queries (never driver-checked — they MUST
# be in-window the commit they register) + 16 of the 17 most-stale
# r3-green rows in the priority order the r6 rotation comment documented
# + ext_text_bigram_lm (r6-green but CHANGED this round: the model join
# was rewritten left+coalesce with the forced broadcast dropped for the
# uncapped path — results bit-identical under local replay, but the
# changed-query-inside-window invariant is the stronger contract, so it
# takes the 17th slot and ext_dedup_bloom waits for r8). The 119
# non-window queries are all covered by the last four recorded rounds:
# r03 covers the 23 r3-latest rows, r04 its 47, r06 its 49 (the 50th
# r6-green row, ext_text_bigram_lm, moved into the window).
#
# REGISTRY-GROWTH FREEZE (r7): 169 against the 50×4 = 200 staleness
# ceiling leaves 31 slots of rotation headroom; operators added this round
# ship STAGED with oracle replays (queries/staged_r8.py, the r6 pattern)
# and queue for the r8 window rather than registering immediately, so the
# rotation math stays satisfiable.
#
# r8 PROMOTION ARITHMETIC (verified at r7 end): staged_r8 holds 26
# queries, so the r8 registry is 169 + 26 = 195 <= 200 — the 4-recorded-
# round bound survives the promotion. The r8 window must hold the 26
# never-driver-checked staged names plus the 23 _DUE_FIRST_R8 rows
# (their r03 record leaves the last-4 set when CORRECTNESS_r08 lands) —
# 49 of 50 slots; the 145 non-window queries are then covered by
# r04 (47) + r06 (up to 50) + r07 (50), 147 >= 145 with 2 rows of
# slack. 195 also means r8 must stage (not register) anything beyond
# 5 more new queries. Wave-5 operators (added after the r8 window
# filled) stage in queries/staged_r9.py with the same replay contract
# and queue for the r9 window.
_WINDOW_R7 = [
    # -- the 33 promoted staged queries (first driver check this round) --
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
    # -- the 17 most-stale r3-green rows (latest green row: r03) --
    "dq03_wordcount",
    "ext_salted_agg",
    "ext_pack_sequences",
    "ext_text_line_dedup",
    "ext_text_repetition",
    "ext_text_boilerplate",
    "ext_text_clean",
    "ext_text_chunk",
    "ext_text_lm_score",
    "ext_text_tfidf",
    "ext_sample_weighted",
    "ext_sample_quality_mix",
    "ext_source_cap",
    "ext_corpus_report",
    "ext_corpus_diff",
    "ext_text_vocab",
    "ext_text_bigram_lm",  # CHANGED r7 (see rotation comment above)
]

# The 23 remaining r3-green rows: OUTSIDE the r7 window (covered by their
# r03 record under the 4-recorded-round bound) and due FIRST in the r8
# window — they fall outside the last-4-records set the moment the r8
# verify lands a new CORRECTNESS file, so the r8 rotation must promote
# them exactly as this round promoted the 17 above.
_DUE_FIRST_R8 = [
    "ext_dedup_bloom",  # (broadcast-probe family; ceded its r7 slot to the changed bigram-LM)
    "ext_ann_hard_negatives",  # (ANN family: topk/lsh/pq/ivf_pq canaries)
    "ext_mix_temperature",  # (mixture family: sample_det/stratified)
    "ext_range_join_binned",  # (range family: dq20 r4-green, plan-pinned)
    "dq28_exists",  # (subquery family: dq29 scalar-subquery r4-green)
    "dq30_grouping_sets",  # (grouping family: dq12/dq23/dq31 r4-green)
    "dq11_except",  # (set-op family: dq11_intersect/dq22 r4-green)
    "dq18_grouped_udf",  # (UDF family: dq19 canary; mapreduce pytest)
    "dq24_asof_join",  # (join family: dq20 range r4-green, plan-pinned)
    "dq41_recursive_sql",  # (recursive family: dq16/dq17/dq40/dq42 r4)
    "dq43_rolling_range",  # (window family: dq39/dq25 r4-green)
    "dq44_merge_upsert",  # (outer-join family: dq21 variants r4-green)
    "ext_profile_columns",  # (profiler family: corpus_report sibling)
    "ext_approx_distinct",  # (sketch family: ext_active_users_approx)
    "ext_quality_classifier",  # (broadcast-model family: lm_score sibling)
    "ext_dedup_exact",  # (dedup family: ngram/minhash/simhash siblings)
    "ext_ann_ivf",  # (ANN family)
    "ext_text_pii",  # (text family)
    "ext_dedup_incremental",  # (incremental family: incremental_fuzzy r6)
    "ext_kmeans_embed",  # (quantized-Lloyd family: ext_ann_pq training)
    "ext_pipeline_curate",  # (pipeline family: pretokenize/analytics r6)
    "ext_text_decontaminate",  # (text family)
    "ext_approx_percentiles",  # (percentile family: dq33/percentile_state)
]

def _apply_check_priority() -> None:
    """Reorder ALL_QUERIES so the driver's 50-slot check window holds
    exactly ``_WINDOW_R7`` (in that order), immediately followed by the
    ``_DUE_FIRST_R8`` rows (outside the window this round, first in line
    next round), then every other registered query in registration
    order (all r4/r6-green, code unchanged since their latest row)."""
    # membership-guarded (register_extensions deliberately swallows a
    # broken extension module's ImportError; a KeyError here would
    # take down the core DQ set that contract protects — the registry
    # tests still fail loudly on any missing window name)
    window = {k: ALL_QUERIES[k] for k in _WINDOW_R7 if k in ALL_QUERIES}
    due_r8 = {k: ALL_QUERIES[k] for k in _DUE_FIRST_R8 if k in ALL_QUERIES}
    rest = {
        k: v
        for k, v in ALL_QUERIES.items()
        if k not in window and k not in due_r8
    }
    ALL_QUERIES.clear()
    ALL_QUERIES.update(window)
    ALL_QUERIES.update(due_r8)
    ALL_QUERIES.update(rest)


_apply_check_priority()

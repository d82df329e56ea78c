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

# Green in a prior round's driver gate, unchanged since, and redundant
# with an in-window sibling. Round-4 rotation policy (VERDICT r3 #7):
# the window admits, in priority order, (1) never-checked queries,
# (2) every query whose latest green row is TWO rounds old (the 16
# r1-only rows — max staleness is pinned by test_registry), (3) every
# query whose code path changed this round (the Pregel/fixpoint family
# after the aggregator + block-convergence rework, span dedup after
# the de-skew, the funnel rewire), then (4) the oldest r2-green rows.
# Rotated OUT: all 39 r3-green rows whose code is unchanged, plus 16
# r2-green family members whose capability has an in-window canary —
# every tail entry is one round fresher than the r4 window's oldest
# admitted rows, so next round's mandatory set (the 16 r2 leftovers)
# fits the r5 window.
_TAIL_QUERIES = [
    "dq36_conditional_agg",  # r2-green fill demoted for ext_active_users (ext_profile_columns r3)
    "dq38_sql_api",  # r2-green fill demoted for ext_dedup_paragraph_global (dq41 r3-green)
    "dq37_lead_lag",  # r2-green fill demoted for ext_cohort_retention (dq06/dq25/dq43 canaries)
    "ext_ann_lsh",  # r2-green fill demoted for ext_dedup_span_removal
    # r2-green leftovers (due again by r5; in-window canary in parens):
    "ext_mm_image_features",  # multimodal decode (PNG/BMP pytest real-bytes)
    "ext_mm_frame_sample",  # multimodal 1->N expansion
    "ext_mm_audio_features",  # multimodal family (WAV pytest real-bytes)
    "ext_text_stats",  # text-projection family (ext_text_quality canary r3)
    "ext_text_langid",  # text-projection family
    "ext_text_fingerprint",  # text-projection family
    "ext_text_tokens",  # text-projection family
    "ext_text_quality",  # text-projection family (lm_score/clean r3-green)
    "ext_ann_topk",  # ANN family (ext_ann_ivf r3-green)
    "ext_sample_det",  # sampler family (ext_sample_weighted r3-green)
    "ext_sample_stratified",  # sampler family
    "ext_split_train_test",  # split family (leakage_safe in-window r4)
    "ext_dedup_ngram_jaccard",  # dedup family (span/canonical in-window r4)
    "ext_dedup_simhash",  # dedup family
    "ext_dedup_embedding",  # embedding family (ext_dedup_semantic in-window)
    "ext_dedup_minhash_lsh",  # LSH inside canonical/leakage (in-window r4)
    # r3-green, code unchanged since:
    "dq03_wordcount",
    "dq11_except",
    "dq18_grouped_udf",
    "dq24_asof_join",
    "dq28_exists",
    "dq30_grouping_sets",
    "dq41_recursive_sql",
    "dq43_rolling_range",
    "dq44_merge_upsert",
    "ext_profile_columns",
    "ext_approx_distinct",
    "ext_approx_percentiles",
    "ext_dedup_exact",
    "ext_ann_ivf",
    "ext_salted_agg",
    "ext_pack_sequences",
    "ext_text_line_dedup",
    "ext_text_decontaminate",
    "ext_text_pii",
    "ext_text_repetition",
    "ext_text_vocab",
    "ext_kmeans_embed",
    "ext_sample_quality_mix",
    "ext_dedup_incremental",
    "ext_corpus_report",
    "ext_text_tfidf",
    "ext_text_boilerplate",
    "ext_text_clean",
    "ext_sample_weighted",
    "ext_mix_temperature",
    "ext_text_chunk",
    "ext_pipeline_curate",
    "ext_text_lm_score",
    "ext_source_cap",
    "ext_dedup_bloom",
    "ext_ann_hard_negatives",
    "ext_corpus_diff",
    "ext_range_join_binned",
    "ext_quality_classifier",
]


def _apply_check_priority() -> None:
    tail = {k: ALL_QUERIES[k] for k in _TAIL_QUERIES if k in ALL_QUERIES}
    head = {k: v for k, v in ALL_QUERIES.items() if k not in tail}
    ALL_QUERIES.clear()
    ALL_QUERIES.update(head)
    ALL_QUERIES.update(tail)


_apply_check_priority()

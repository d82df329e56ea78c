"""Physical-plan regression tests: the properties that keep the
declared queries viable at 100 TB (SURVEY.md §4.2, instructions
'push down and prune', 'broadcast small dims').

These intentionally pin PLAN SHAPE, not timings — a correct result
computed through a cartesian product or a full-column scan is a bug
at scale even when the small-SF test passes.
"""

from __future__ import annotations

import pytest
from conftest import SF_DIR


def _report(spark, name):
    from remap_spark.plans import plan_report
    from remap_spark.queries import ALL_QUERIES

    return plan_report(ALL_QUERIES[name](spark, SF_DIR))


def test_dq02_filter_pushdown_and_pruning(spark):
    r = _report(spark, "dq02_filter")
    assert r["has_pushed_filters"], "shipdate/quantity filters must reach the scan"
    assert "ReadSchema" in r["plan"]
    # only 3 columns may be read: the 2 projected + nothing else beyond
    # the filter columns (shipdate is filter-only)
    import re

    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", r["plan"])
    assert schemas and all(len(s.split(",")) <= 4 for s in schemas), schemas


def test_dq09_broadcasts_small_dims(spark):
    r = _report(spark, "dq09_multiway_join")
    assert r["broadcast_joins"] >= 2, (
        "nation and region (25/5 rows at every SF) must broadcast:\n" + r["plan"]
    )
    assert not r["cartesian"]


def test_dq05_partial_aggregation(spark):
    r = _report(spark, "dq05_agg")
    # partial + final HashAggregate pair == the reference's
    # combiner/reducer split, done by Catalyst automatically
    assert r["partial_aggs"], r["plan"]
    # note: wholestage_codegen reads as 0 pre-execution under AQE
    # (AdaptiveSparkPlan defers codegen to the final plan) — asserted
    # implicitly by HashAggregate presence instead
    assert "HashAggregate" in r["plan"]


def test_dq20_range_join_not_cartesian(spark):
    r = _report(spark, "dq20_range_join")
    assert not r["cartesian"], (
        "equi key user_id=o_custkey must drive the join; BETWEEN is a "
        "post-join filter:\n" + r["plan"]
    )


def test_dq01_projection_prunes_columns(spark):
    import re

    r = _report(spark, "dq01_project")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", r["plan"])
    assert schemas
    cols = {c.split(":")[0] for c in schemas[0].split(",")}
    assert cols <= {
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        "l_discount",
    }, f"scan reads more than the 4 needed columns: {cols}"


def test_minhash_single_shuffle_per_stage(spark):
    """MinHash signatures: explode + ONE groupBy — no extra exchanges
    from the window/token pipeline beyond doc partitioning."""
    from remap_spark.engine import load_table
    from remap_spark.operators.dedup import minhash_signatures
    from remap_spark.plans import plan_report

    docs = load_table(spark, SF_DIR, "documents")
    r = plan_report(minhash_signatures(docs))
    # exactly one: the id-hash repartition; the gram window AND the
    # signature groupBy both reuse that partitioning
    assert r["exchanges"] == 1, r["plan"]


def test_salted_agg_two_phases(spark):
    """Salted aggregation = exactly two exchanges (salt phase, merge
    phase) — and still a map-side partial before each."""
    from remap_spark.plans import plan_report
    from remap_spark.queries import ALL_QUERIES

    r = plan_report(ALL_QUERIES["ext_salted_agg"](spark, SF_DIR))
    # 2 agg exchanges + the final orderBy's range exchange
    assert r["exchanges"] <= 3, r["plan"]
    assert r["partial_aggs"], r["plan"]


def test_asof_join_not_cartesian(spark):
    r = _report(spark, "dq24_asof_join")
    assert not r["cartesian"], r["plan"]


def test_ann_lsh_buckets_join_broadcasts_queries(spark):
    """The query side (5 vectors) must broadcast into the bucket join."""
    r = _report(spark, "ext_ann_lsh")
    assert r["broadcast_joins"] >= 1, r["plan"]
    assert not r["cartesian"]


def test_topk_uses_take_ordered(spark):
    """dq07 top-10 must not globally sort the grouped relation."""
    from remap_spark.plans import explain_str
    from remap_spark.queries import ALL_QUERIES

    plan = explain_str(ALL_QUERIES["dq07_topk"](spark, SF_DIR), "simple")
    assert "TakeOrderedAndProject" in plan, plan


def test_dq38_sql_api_pushdown(spark):
    """The SQL-string surface gets the same Catalyst treatment as the
    DataFrame plans: the mktsegment/date literals reach the scans."""
    r = _report(spark, "dq38_sql_api")
    assert r["has_pushed_filters"], r["plan"]
    assert not r["cartesian"]
    # BUILDING filter must appear as a pushed filter, not a post-scan one
    assert "BUILDING" in r["plan"]


def test_no_unbounded_driver_actions_in_operator_sources():
    """Operators must stay distributed: no collect()/toPandas() on a
    data path, and first()/count() only where the algorithm is an
    iterative fixpoint (Pregel halt voting) or an explicit opt-in
    fallback (dim sniff when the caller withholds dim, shingle DF
    when max_doc_freq is enabled). Round-1 verdict items #2/#4/#5."""
    import io
    import pathlib
    import tokenize

    import remap_spark.operators as ops

    root = pathlib.Path(ops.__file__).parent
    allowed = {
        # superstep halt vote (.first) and star-loop edge-set-stability
        # convergence (.count — a FULL-partition action by design: it
        # doubles as the materializer for the round's lazy checkpoints,
        # which a partial take/first would corrupt)
        "pregel.py": {".first()", ".count()"},
        # .first(): dim=None fallback only. .collect(): the GEMM tiers
        # collect model-sized relations to ship as numpy matrices — the
        # QUERY relation (cosine_topk_gemm; driver-sized by the same
        # contract under which every other top-k tier F.broadcast()s
        # it) and the CODEBOOK/centroid relations (_assign_cells_gemm,
        # kmeans_lloyd assign_mode='gemm'; k rows by definition). The
        # candidate corpus never moves.
        "similarity.py": {".first()", ".collect()"},
        # dedup.py: NO driver actions — the max_doc_freq corpus count
        # is in-plan as a broadcast 1-row relation since round 5
        # bpe_train's per-pass merge-rule batch: LIMIT batch_limit (64)
        # rows — driver-sized by construction; the greedy rule sequence
        # is the algorithm's sequential part
        "text.py": {".collect()"},
        # logistic_train: d+1 gradient floats per round — the model is
        # driver-sized by definition; the data never moves.
        # pca_train: the collected partial-sum relation is d^2+d+1 rows
        # (the d x d gram matrix) — model-sized by construction
        "ml.py": {".first()", ".collect()"},
        # assert_expectations: the report relation is rule-count-sized
        # by construction (one row per declared expectation)
        "expectations.py": {".collect()"},
    }
    for src in sorted(root.glob("*.py")):
        toks = tokenize.generate_tokens(io.StringIO(src.read_text()).readline)
        # docstrings/comments may legitimately *mention* collect(); and a
        # string argument must keep the call non-empty (F.count("*") is a
        # Catalyst aggregate, not the df.count() driver action)
        code = " ".join(
            "'s'" if t.type == tokenize.STRING else t.string
            for t in toks
            if t.type != tokenize.COMMENT
        ).replace(" ", "")
        for action in (".collect()", ".toPandas()", ".first()", ".count()"):
            if action in code:
                assert action in allowed.get(src.name, set()), (
                    f"{src.name} uses {action} on an operator data path"
                )


def test_decontaminate_broadcasts_probe_grams(spark):
    """The probe shingle set must broadcast into the contamination
    join (map-side check; the corpus gram stream is never shuffled for
    the join itself)."""
    r = _report(spark, "ext_text_decontaminate")
    assert r["broadcast_joins"] >= 1, r["plan"]
    assert not r["cartesian"]


def test_pii_redaction_zero_shuffle(spark):
    """PII scrub is a narrow projection: no exchange may appear before
    the final ORDER BY (one range exchange for presentation only)."""
    r = _report(spark, "ext_text_pii")
    assert r["exchanges"] <= 1, r["plan"]
    assert not r["cartesian"]


def test_repetition_partial_aggs_and_key_local_shuffles(spark):
    """Bigram counting must partial-aggregate map-side; every exchange
    is keyed by doc (doc,bigram / doc) — corpus-size-proportional, skew
    bounded by one document's vocabulary."""
    r = _report(spark, "ext_text_repetition")
    assert r["partial_aggs"], r["plan"]
    assert not r["cartesian"]


def test_pagerank_dangling_aggregate_is_broadcast(spark):
    """The per-superstep dangling-mass aggregate must ride into the
    rank update as a BROADCAST single-row relation (in-plan), never a
    per-step driver fetch: the superstep plan shows the aggregate under
    a BroadcastExchange feeding a nested-loop join with the vertex
    relation."""
    from remap_spark.operators.pregel import pagerank_dangling_pregel
    from remap_spark.plans import explain_str

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")], "src string, dst string"
    )
    verts = spark.createDataFrame([(v,) for v in "abcd"], "id string")
    p = pagerank_dangling_pregel(verts, edges, num_vertices=4, supersteps=2)
    p.run()
    plan = explain_str(p.last_plan, "formatted")
    assert "BroadcastExchange" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    # the aggregate itself is in-plan (a HashAggregate above the vertex
    # leaf), not a literal folded in from a driver action
    assert "HashAggregate" in plan, plan


def test_incremental_dedup_bucketed_store_no_store_exchange(spark):
    """incremental_dedup against a store bucketed on the fingerprint
    must co-locate the anti join with ZERO store-side exchange: the
    bucketed plan carries exactly one fewer Exchange than the same
    join against an unbucketed store."""
    from pyspark.sql import functions as F

    from remap_spark.engine import load_table
    from remap_spark.operators.dedup import incremental_dedup
    from remap_spark.operators.text import content_fingerprint
    from remap_spark.plans import explain_str
    from remap_spark.sources import write_bucketed_table

    docs = load_table(spark, SF_DIR, "documents")
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 3 == 0)
    store = content_fingerprint(old).select("fingerprint")
    write_bucketed_table(store, "fp_store_b", ["fingerprint"], 8)
    store.write.mode("overwrite").saveAsTable("fp_store_flat")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force non-broadcast joins so the bucket layout is what's tested
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        n_bucketed = explain_str(
            incremental_dedup(new, spark.table("fp_store_b")), "simple"
        ).count("Exchange")
        n_flat = explain_str(
            incremental_dedup(new, spark.table("fp_store_flat")), "simple"
        ).count("Exchange")
        assert n_bucketed == n_flat - 1, (n_bucketed, n_flat)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS fp_store_b")
        spark.sql("DROP TABLE IF EXISTS fp_store_flat")


def test_paragraph_global_dedup_partial_aggs_no_segment_window(spark):
    """Corpus-wide segment dedup: the first-occurrence aggregate must
    be a partial-aggregated groupBy on the segment hash (map-side
    combine collapses a boilerplate segment before the exchange), with
    no Window over the hash key — the same skew reasoning as
    span_duplication."""
    r = _report(spark, "ext_dedup_paragraph_global")
    assert "Window" not in r["plan"], r["plan"]
    assert r["partial_aggs"], r["plan"]
    assert not r["cartesian"]


def test_funnel_single_user_shuffle(spark):
    """The funnel fold costs ONE corpus-sized exchange (the user-keyed
    collect_list); everything after runs on per-user rows. The plan may
    add small exchanges for the stage-literal join and final ordering,
    but no second exchange of the event table: total exchanges stays
    tiny and no cartesian appears beyond the 1-row stage relation."""
    # ext_funnel retired to the pytest tier in r8 (queries/retired.py);
    # the plan pin stays — the operator and its registered sibling
    # ext_funnel_conversion share the fold.
    from remap_spark.plans import plan_report
    from remap_spark.queries.retired import RETIRED_QUERIES

    r = plan_report(RETIRED_QUERIES["ext_funnel"](spark, SF_DIR))
    assert r["exchanges"] <= 5, r["plan"]
    assert "CartesianProduct" not in r["plan"]


def test_span_dedup_no_gram_window(spark):
    """span_duplication's cross-corpus gram count must be a partial-
    aggregated groupBy + join back, never a count() Window partitioned
    by the gram key: a stop-gram in ~all docs would serialize n_docs
    rows onto one window task, and AQE can split skewed joins but not
    window partitions."""
    r = _report(spark, "ext_dedup_span")
    # the shingle build (which legitimately uses doc-keyed lead windows)
    # is behind a localCheckpoint, so the visible plan is purely the
    # count/join/rollup: no Window node may appear at all
    assert "Window" not in r["plan"], r["plan"]
    assert r["partial_aggs"], r["plan"]
    assert not r["cartesian"]


def test_vocab_topn_take_ordered(spark):
    """Heavy hitters must end in TakeOrderedAndProject (driver sees n
    rows) with partial aggregation below the token shuffle."""
    r = _report(spark, "ext_text_vocab")
    assert "TakeOrderedAndProject" in r["plan"], r["plan"]
    assert r["partial_aggs"], r["plan"]


def test_kmeans_broadcasts_centroids_only(spark):
    """Lloyd assignment must broadcast the k-row centroid relation into
    a per-point scan — the POINT table is never broadcast, never
    cartesian-joined against itself."""
    from remap_spark.queries import ALL_QUERIES

    from remap_spark.plans import explain_str

    df = ALL_QUERIES["ext_kmeans_embed"](spark, SF_DIR)
    plan = explain_str(df, "formatted")
    # the centroid side arrives via BroadcastExchange (nested-loop is
    # expected: a k-row cross join IS the broadcast pattern here)
    assert "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_tfidf_broadcasts_corpus_size(spark):
    """The corpus-size N must enter TF-IDF as a broadcast single-row
    relation (never a driver count()); tf/df aggregates must be partial
    map-side; no cartesian beyond that one-row broadcast."""
    r = _report(spark, "ext_text_tfidf")
    assert r["partial_aggs"], r["plan"]
    # the single-row crossJoin appears as BroadcastNestedLoopJoin — that
    # is the intended plan for a 1-row side, not an accident
    assert "BroadcastNestedLoopJoin" in r["plan"] or r["broadcast_joins"] >= 1, r["plan"]


def test_weighted_sample_zero_shuffle(spark):
    """Weighted sampling is a pure predicate: the only exchanges allowed
    in the report query are the per-lang aggregate's (partial+final)."""
    r = _report(spark, "ext_sample_weighted")
    assert r["exchanges"] <= 2, r["plan"]
    assert r["partial_aggs"], r["plan"]
    assert not r["cartesian"]


def test_boilerplate_strip_broadcasts_hot_lines(spark):
    """strip_boilerplate must broadcast the (tiny) hot-line relation
    into a left-anti join — never shuffle the corpus by line."""
    from pyspark.sql import functions as F

    from remap_spark.engine import load_table
    from remap_spark.operators.text import boilerplate_lines, strip_boilerplate
    from remap_spark.plans import plan_report

    docs = load_table(spark, SF_DIR, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(F.lit("HDR"), F.lit("\n"), F.col("text")).alias("text"),
    )
    hot = boilerplate_lines(aug, min_docs=3)
    r = plan_report(strip_boilerplate(aug, hot))
    assert r["broadcast_joins"] >= 1, r["plan"]
    assert not r["cartesian"]


def test_no_query_plans_a_cartesian_product(spark):
    """Sweeping scale audit: NO registered query may plan a
    CartesianProduct, and BroadcastNestedLoopJoin is allowed only for
    the documented constant-size broadcast sides (query sets, k
    centroids, single-row normalizing constants). A new query that
    accidentally drops its equi-key fails here before it ships."""
    from remap_spark.plans import explain_str
    from remap_spark.queries import ALL_QUERIES

    # intentional small-side broadcasts (1-row totals / k-row centroid
    # or query relations) — BNLJ over a bounded side IS the right plan
    bnlj_ok = {
        "ext_ann_topk",
        "ext_ann_ivf",
        "ext_kmeans_embed",
        "ext_text_tfidf",
        "ext_mix_temperature",
        # brute-force tier: broadcast anchors x candidates with non-equi
        # predicates only (same contract as ext_ann_topk; the scale path
        # composes the label filter with the IVF cell-probe join)
        "ext_ann_hard_negatives",
        # per-superstep single-row aggregator broadcast (in-plan dangling
        # mass — the alternative is one driver action per superstep)
        "ext_pagerank_dangling",
        # in-plan GD: the 1-row weights relation broadcasts into every
        # gradient aggregate and the scoring pass (the alternative is
        # one driver action per training round)
        "ext_quality_classifier",
        # in-plan corpus count (1-row broadcast, r5: replaced the
        # driver-side df.count() in _doc_shingles' stop-gram filter)
        "ext_dedup_ngram_jaccard",
        # ADC lookup tables: one m*n_cent integer array per QUERY,
        # broadcast into the code scan — bounded by the query set
        "ext_ann_pq",
        "ext_ann_ivf_pq",
        # final assembly of three 1-row aggregates (n_vertices x
        # n_edges x n_triangles) — each BNLJ side is a single row
        "ext_graph_triangles",
        # (N, avgdl) corpus constants: a single-row broadcast into the
        # per-term scoring join (same contract as the in-plan counts)
        "ext_text_bm25",
        # composes bm25's single-row consts broadcast AND the one-row
        # dense query-vector broadcast (ext_ann_topk contract)
        "ext_retrieval_rrf",
        # vocabulary size V: a single-row broadcast into the per-bigram
        # scoring join (same in-plan-constant contract as bm25/tfidf)
        "ext_text_bigram_lm",
        # -- r7-promoted staged queries: audited bounded-relation BNLJ
        # (same entries as the staged sweep in test_plans_r6.py) --
        "ext_basket_rules",  # 1-row basket-count relation
        "ext_rfm_segments",  # 1-row quintile-cuts relation
        "ext_skew_report",  # 1-row totals relation
        "ext_crosstab_chi2",  # 1-row grand-total relation
        "ext_kmv_set_ops",  # <=3k-row sketch-stat relations
        "ext_segment_overlap",  # |segments|-row sketch-stat pair join
        "ext_modularity",  # 1-row in-plan edge-total broadcast
        # -- r8-promoted staged queries: audited bounded-relation BNLJ
        # (same entries as the staged sweep in test_staged_r8.py) --
        # corpus trigram total N: single-row broadcast into the
        # per-trigram scoring join (bm25/tfidf in-plan-constant contract)
        "ext_text_trigram_backoff",
        # two 1-row L2-norm relations broadcast back per iteration
        # (operators/pregel.hits in-plan normalizers)
        "ext_graph_hits",
        # per-series 1-row trend/seasonal-mean constants broadcast
        # (operators/timeseries.decompose_additive)
        "ext_ts_decompose",
        # -- r9-promoted staged queries: audited bounded-relation BNLJ
        # (same entries as the staged sweeps in test_staged_r8.py /
        # test_staged_r9.py) --
        # 1-row total-count relation broadcast into the 9-digit
        # expected-frequency join (operators/expectations.benford)
        "ext_benford",
        # chi-square totals: one single-row (N_ref, N_cur) relation
        # broadcast into the bins-sized join
        "ext_distribution_drift",
        # composes the decompose grand-mean broadcast plus the
        # single-row anomaly-threshold broadcast
        "ext_ts_anomaly_seasonal",
        # -- r11-promoted staged queries: audited bounded-relation BNLJ
        # (same entry as the staged sweep in test_staged_r11.py) --
        # kmeans: the k-row centroid relation broadcast into the
        # distance scan each Lloyd iteration (ext_kmeans_embed's
        # pinned plan, extended through the pruning stage)
        "ext_dedup_semdedup",
    }
    bad = []
    for name, fn in ALL_QUERIES.items():
        plan = explain_str(fn(spark, SF_DIR), "simple")
        if "CartesianProduct" in plan:
            bad.append((name, "CartesianProduct"))
        elif "BroadcastNestedLoopJoin" in plan and name not in bnlj_ok:
            bad.append((name, "BroadcastNestedLoopJoin"))
    assert not bad, f"queries with unbounded join plans: {bad}"


def test_binned_range_join_avoids_nested_loop(spark):
    """The whole point of interval_join_binned: a BETWEEN-only join
    plans BroadcastNestedLoopJoin; the binned formulation must plan an
    equi join (covered generically by the cartesian test, asserted
    here explicitly against the operator so a regression in the bin
    key can't hide behind the allowlist)."""
    from remap_spark.plans import explain_str
    from remap_spark.queries import ALL_QUERIES

    plan = explain_str(
        ALL_QUERIES["ext_range_join_binned"](spark, SF_DIR), "simple"
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan


def test_incremental_fuzzy_bucketed_store_no_store_exchange(spark):
    """incremental_dedup_fuzzy against a signature store bucketed on
    (band, key) must co-locate the probe join with ZERO store-side
    exchange: the bucketed plan carries exactly one fewer Exchange
    than the same probe against an unbucketed store."""
    from pyspark.sql import functions as F

    from remap_spark.engine import load_table
    from remap_spark.operators.dedup import (
        incremental_dedup_fuzzy,
        minhash_signatures,
        signature_store_rows,
    )
    from remap_spark.plans import explain_str
    from remap_spark.sources import write_bucketed_table

    docs = load_table(spark, SF_DIR, "documents")
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 3 == 0)
    sig = minhash_signatures(old)
    docsigs = sig.select(
        "doc", F.array(*[F.col(f"sig{i}") for i in range(16)]).alias("sigs")
    )
    store = signature_store_rows(docsigs)
    # a killed prior run can leave the warehouse dir without a catalog
    # entry — saveAsTable then fails LOCATION_ALREADY_EXISTS
    import shutil

    for tbl in ("sig_store_b", "sig_store_flat"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(f"spark-warehouse/{tbl}", ignore_errors=True)
    write_bucketed_table(store, "sig_store_b", ["band", "key"], 8)
    store.write.mode("overwrite").saveAsTable("sig_store_flat")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        n_bucketed = explain_str(
            incremental_dedup_fuzzy(new, spark.table("sig_store_b")), "simple"
        ).count("Exchange")
        n_flat = explain_str(
            incremental_dedup_fuzzy(new, spark.table("sig_store_flat")),
            "simple",
        ).count("Exchange")
        assert n_bucketed == n_flat - 1, (n_bucketed, n_flat)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_dq33_single_percentile_aggregate(spark):
    """dq33 computes both percentiles from ONE array-literal percentile
    aggregate (two scalar percentile() calls would each buffer the full
    value stream per group — measured ~40% slower), with map-side
    partial aggregation and no extra exchange beyond the agg + the
    presentation orderBy."""
    from remap_spark.plans import plan_report
    from remap_spark.queries import ALL_QUERIES

    import re

    # r13: the query cuts lineage below its presentation orderBy (the
    # range-sampling rewrite), which truncates the visible plan at a
    # Scan ExistingRDD; disable the cut so the pin still inspects the
    # aggregate subtree
    try:
        spark.conf.set("spark.remap.lineageCut", "off")
        r = plan_report(ALL_QUERIES["dq33_percentiles"](spark, SF_DIR))
    finally:
        spark.conf.unset("spark.remap.lineageCut")
    assert r["partial_aggs"], r["plan"]
    assert r["exchanges"] <= 2, r["plan"]
    # every percentile call in the plan is the ONE array-form aggregate
    # (a scalar second argument would mean two buffering aggregates)
    calls = re.findall(
        r"percentile\(l_extendedprice#\d+, (\[[^\]]*\]|[0-9.]+)", r["plan"]
    )
    assert calls and all(c == "[0.5,0.9]" for c in calls), calls


def test_pipeline_analytics_single_user_exchange(spark):
    """The analytics composition (sessionize -> per-user funnel fold ->
    cohort rollup) must reuse the sessionize window's user_id hash
    partitioning for the per-user aggregate: exactly ONE user-keyed
    exchange in the whole plan (the report rollup and presentation
    sort key on other columns)."""
    import re

    from remap_spark.plans import explain_str
    from remap_spark.queries import ALL_QUERIES

    plan = explain_str(
        ALL_QUERIES["ext_pipeline_analytics"](spark, SF_DIR), "simple"
    )
    user_exchanges = re.findall(r"Exchange hashpartitioning\(user_id", plan)
    assert len(user_exchanges) == 1, plan


def test_pretokenize_pipeline_bounded_exchanges(spark):
    """The pretokenize flagship (quality gate -> chunk -> pack) stays
    corpus-proportional: chunking is a narrow generator, so the plan
    carries only the doc-key gate join, the per-source packing window,
    the report aggregate, and the presentation sort — no cartesian,
    and a bounded exchange count."""
    from remap_spark.plans import plan_report
    from remap_spark.queries import ALL_QUERIES

    r = plan_report(ALL_QUERIES["ext_pipeline_pretokenize"](spark, SF_DIR))
    assert not r["cartesian"]
    assert r["exchanges"] <= 6, r["plan"]
    assert r["partial_aggs"], r["plan"]


def test_top_event_paths_bounded_exchanges(spark):
    """Path mining: one user-keyed window exchange, one combiner-style
    path-count aggregate, one single-partition rank over the tiny
    path relation — nothing else may shuffle the corpus."""
    from remap_spark.engine import load_table
    from remap_spark.operators.sessions import top_event_paths
    from remap_spark.plans import plan_report

    ev = load_table(spark, SF_DIR, "events")
    r = plan_report(top_event_paths(ev, n_steps=3, topk=20))
    assert not r["cartesian"]
    assert r["partial_aggs"], r["plan"]
    assert r["exchanges"] <= 4, r["plan"]


def test_ewma_single_group_exchange(spark):
    """EWMA: the lag chain must plan as ONE window over one
    group-keyed exchange on top of the daily rollup — a per-lag
    window would multiply exchanges by the chain depth."""
    from remap_spark.engine import load_table
    from remap_spark.operators.timeseries import ewma_trailing
    from remap_spark.plans import plan_report

    from pyspark.sql import functions as F

    o = load_table(spark, SF_DIR, "orders")
    daily = o.groupBy("o_orderpriority", "o_orderdate").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "cents"
        )
    )
    import re

    r = plan_report(
        ewma_trailing(daily, ["o_orderpriority"], "o_orderdate", "cents")
    )
    window_nodes = re.findall(r"\(\d+\) Window\n", r["plan"])
    assert len(window_nodes) <= 1, r["plan"]
    assert r["exchanges"] <= 3, r["plan"]


def test_fill_date_gaps_no_cartesian_grid(spark):
    """The calendar grid must come from an in-plan sequence explode
    joined on (group, day) — never a cartesian of groups x days."""
    from remap_spark.engine import load_table
    from remap_spark.operators.timeseries import fill_date_gaps
    from remap_spark.plans import plan_report

    from pyspark.sql import functions as F

    ev = load_table(spark, SF_DIR, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"))
    r = plan_report(
        fill_date_gaps(daily, ["event_type"], "day", zero_cols=["n"])
    )
    assert not r["cartesian"], r["plan"]
    assert "Generate explode" in r["plan"] or "Generate" in r["plan"], r[
        "plan"
    ]


def test_kmv_state_partial_distinct(spark):
    """KMV: the (group, hash) distinct must partial-aggregate map-side
    (the shuffle carries collapsed hashes, not raw rows) and the rank
    window adds at most one more exchange."""
    from remap_spark.engine import load_table
    from remap_spark.operators.rollup import kmv_state
    from remap_spark.plans import plan_report

    ev = load_table(spark, SF_DIR, "events")
    r = plan_report(kmv_state(ev, ["event_type"], "user_id", k=64))
    # the distinct plans as a keys-only HashAggregate PAIR around the
    # exchange (map-side collapse; "partial_" only labels aggregates
    # with functions, so match the node pair instead)
    assert r["plan"].count("HashAggregate") >= 2, r["plan"]
    assert r["exchanges"] <= 3, r["plan"]
    assert not r["cartesian"]

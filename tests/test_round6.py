"""Unit-level properties of the round-6 operators: time-series repair
and smoothing, rank fusion, path mining, KMV distinct state, soft
dedup weights, and mixture recipes. The query-vs-oracle end-to-end
checks live in test_dq.py; these pin the operator semantics on small
constructed inputs where the expected values are hand-computable.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def test_fill_date_gaps_flags_and_carries(spark):
    from remap_spark.operators.timeseries import fill_date_gaps

    d = datetime.date
    daily = spark.createDataFrame(
        [
            ("a", d(2024, 1, 1), 3, 100),
            ("a", d(2024, 1, 4), 1, 70),
            ("b", d(2024, 1, 2), 2, 50),
        ],
        "g string, day date, n long, gauge long",
    )
    out = fill_date_gaps(
        daily, ["g"], "day", zero_cols=["n"], carry_cols=["gauge"]
    )
    rows = {
        (r.g, str(r.day)): (r.is_gap, r.n, r.gauge)
        for r in out.collect()
    }
    # span of 'a' is fully densified, gaps zero-fill n and carry gauge
    assert rows[("a", "2024-01-01")] == (0, 3, 100)
    assert rows[("a", "2024-01-02")] == (1, 0, 100)
    assert rows[("a", "2024-01-03")] == (1, 0, 100)
    assert rows[("a", "2024-01-04")] == (0, 1, 70)
    # single-day group 'b' gains no rows
    assert rows[("b", "2024-01-02")] == (0, 2, 50)
    assert len(rows) == 5


def test_ewma_trailing_hand_computed(spark):
    from remap_spark.operators.timeseries import ewma_trailing

    df = spark.createDataFrame(
        [("g", 1, 10.0), ("g", 2, 20.0), ("g", 3, 40.0)],
        "g string, t int, x double",
    )
    out = ewma_trailing(df, ["g"], "t", "x", alpha=0.5, n=8)
    got = {r.t: r.ewma for r in out.collect()}
    assert got[1] == 10.0  # single observation: the value itself
    # t=2: (20 + 0.5*10) / 1.5
    assert got[2] == (20.0 + 0.5 * 10.0) / 1.5
    # t=3: (40 + 0.5*20 + 0.25*10) / 1.75
    assert got[3] == (40.0 + 0.5 * 20.0 + 0.25 * 10.0) / 1.75


def test_rrf_fuse_integer_scores(spark):
    from remap_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(3, 1), (1, 2), (4, 3)], "doc_id long, rank int"
    )
    out = {
        r.doc_id: (r.fused_rank, r.rrf_score, r.n_lists)
        for r in rrf_fuse([a, b], rrf_k=60, topk=10).collect()
    }
    c = lambda rnk: 1_000_000_000 // (60 + rnk)
    assert out[1] == (1, c(1) + c(2), 2)  # in both lists, best ranks
    assert out[3] == (2, c(3) + c(1), 2)
    # doc 2 (sparse only, rank 2) beats doc 4 (dense only, rank 3)
    assert out[2] == (3, c(2), 1)
    assert out[4] == (4, c(3), 1)


def test_top_event_paths_counts(spark):
    from remap_spark.operators.sessions import top_event_paths

    ts = datetime.datetime(2024, 1, 1)
    s = datetime.timedelta(seconds=1)
    rows = []
    # user 1: a b c a b c -> paths abc, bca, cab, abc
    for i, et in enumerate("abcabc"):
        rows.append((1, i, ts + i * s, et))
    # user 2: a b c -> abc
    for i, et in enumerate("abc"):
        rows.append((2, 10 + i, ts + i * s, et))
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    out = top_event_paths(ev, n_steps=3, topk=5)
    got = {
        (r.step_1, r.step_2, r.step_3): (r.path_rank, r.n_occurrences)
        for r in out.collect()
    }
    assert got[("a", "b", "c")] == (1, 3)
    assert got[("b", "c", "a")][1] == 1
    assert got[("c", "a", "b")][1] == 1
    assert len(got) == 3


def test_kmv_merge_equals_full(spark):
    from remap_spark.operators.rollup import (
        kmv_estimate,
        kmv_state,
        merge_kmv_state,
    )

    df = spark.range(0, 3000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 997).alias("v"),
    )
    half_a = df.where(F.col("id") % 2 == 0)
    half_b = df.where(F.col("id") % 2 == 1)
    full_state = kmv_state(df, ["g"], "v", k=64)
    merged = merge_kmv_state(
        kmv_state(half_a, ["g"], "v", k=64),
        kmv_state(half_b, ["g"], "v", k=64),
        ["g"],
        k=64,
    )
    assert (
        full_state.exceptAll(merged).count() == 0
        and merged.exceptAll(full_state).count() == 0
    )
    est = {
        r.g: r.est_distinct
        for r in kmv_estimate(full_state, ["g"], k=64).collect()
    }
    exact = {
        r.g: r.n
        for r in df.groupBy("g")
        .agg(F.countDistinct("v").alias("n"))
        .collect()
    }
    for g, n in exact.items():
        assert abs(est[g] - n) / n < 0.35  # k=64 -> ~12% stderr


def test_kmv_exact_below_k(spark):
    from remap_spark.operators.rollup import kmv_estimate, kmv_state

    df = spark.range(0, 40).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    est = kmv_estimate(kmv_state(df, ["g"], "v", k=64), ["g"], k=64)
    r = est.collect()[0]
    assert r.n_hashes == 40 and r.est_distinct == 40


def test_soft_dedup_weights_singletons_and_clusters(spark):
    from remap_spark.operators.dedup import soft_dedup_weights

    docs = spark.createDataFrame(
        [(i,) for i in range(6)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "doc_a long, doc_b long"
    )
    out = {
        r.doc_id: (r.cluster, r.cluster_size, r.weight_ppm)
        for r in soft_dedup_weights(docs, pairs).collect()
    }
    assert out[0] == (0, 3, 333333)
    assert out[1] == (0, 3, 333333)
    assert out[2] == (0, 3, 333333)
    assert out[3] == (3, 1, 1000000)  # singleton keeps weight 1.0
    assert out[4] == (4, 2, 500000)
    assert out[5] == (4, 2, 500000)


def test_token_budget_recipe_cap_and_budget(spark):
    from remap_spark.operators.split import token_budget_recipe

    per_doc = spark.createDataFrame(
        [("tiny", 10)] * 5 + [("big", 1000)] * 10,
        "source string, n_tokens long",
    )
    out = {
        r.source: r
        for r in token_budget_recipe(
            per_doc,
            budget_tokens=10_000,
            weights={"tiny": 1, "big": 1},
            max_epochs_bp=40_000,
        ).collect()
    }
    # tiny: target 5000 over 50 tokens -> capped at 4 epochs = 200 tokens
    assert out["tiny"].epochs_bp == 40_000
    assert out["tiny"].planned_tokens == 200
    # big: target 5000 over 10000 tokens -> 0.5 epochs
    assert out["big"].epochs_bp == 5_000
    assert out["big"].planned_tokens == 5_000


def test_bigram_lm_flags_shuffled_text(spark):
    from remap_spark.operators.text import bigram_lm_scores

    fluent = "the cat sat on the mat and the cat sat on the mat again"
    docs = spark.createDataFrame(
        [(i, fluent) for i in range(8)]
        + [(8, "mat the on cat sat the and mat cat the on sat the")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.xent for r in bigram_lm_scores(docs).collect()}
    # the shuffled doc's bigrams are mostly unseen -> higher xent than
    # every fluent copy
    assert all(out[8] > out[i] for i in range(8))

"""Full oracle replay of every round-11 staged driver query at BOTH
test scale factors — the same rows+schema+hash gate the driver
applies (incl. the dtype-class check), plus the pre-registration plan
sweeps for unbounded joins and Python boundaries, and unit tests for
the new operators' dials (semdedup max_cluster_size, DSIR weight
direction)."""

from __future__ import annotations

import pytest

from conftest import (
    SF_DIR,
    SF_DIR_T2,
    _dtype_class,
    assert_driver_shape,
    canon,
    duck_con,
)

from remap_spark.queries.staged_r11 import (
    STAGED_R11_ORACLES,
    STAGED_R11_QUERIES,
)


def test_staged_sets_aligned():
    assert set(STAGED_R11_QUERIES) == set(STAGED_R11_ORACLES)


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_T2])
@pytest.mark.parametrize("name", sorted(STAGED_R11_QUERIES))
def test_staged_r11_query_matches_oracle(spark, name, sf_dir):
    sdf = STAGED_R11_QUERIES[name](spark, sf_dir)
    assert_driver_shape(sdf, name)
    srows, scols = sdf.collect(), sdf.columns

    con = duck_con(sf_dir)
    try:
        res = con.sql(STAGED_R11_ORACLES[name])
        dcols = res.columns
        dtypes = [str(t) for t in res.types]
        drows = res.fetchall()
    finally:
        con.close()

    stypemap = {c: _dtype_class(t) for c, t in sdf.dtypes}
    dtypemap = {c: _dtype_class(t) for c, t in zip(dcols, dtypes)}
    diffs = {
        c: (stypemap.get(c), dtypemap.get(c))
        for c in set(stypemap) | set(dtypemap)
        if stypemap.get(c) != dtypemap.get(c)
    }
    assert not diffs, (name, diffs)

    assert sorted(scols) == sorted(dcols), (name, scols, dcols)
    assert len(srows) == len(drows) > 0, (name, len(srows), len(drows))
    s, d = canon(srows, scols), canon(drows, dcols)
    mismatch = [(a, b) for a, b in zip(s, d) if a != b][:3]
    assert not mismatch, (name, mismatch)


def test_no_staged_r11_query_plans_a_cartesian_product(spark):
    from remap_spark.plans import explain_str

    bnlj_ok: set[str] = {
        # kmeans: the k-row centroid relation broadcast into the
        # distance scan each iteration (ext_kmeans_embed's pinned
        # plan) — a k-sized, not data-sized, nested-loop side
        "ext_dedup_semdedup",
    }
    bad = []
    for name, fn in STAGED_R11_QUERIES.items():
        p = explain_str(fn(spark, SF_DIR), "formatted")
        if "CartesianProduct" in p:
            bad.append((name, "cartesian"))
        if "BroadcastNestedLoopJoin" in p and name not in bnlj_ok:
            bad.append((name, "bnlj"))
    assert not bad, bad


def test_staged_r11_queries_stay_jvm_side(spark):
    from remap_spark.plans import explain_str

    # r12: ext_dedup_semdedup deliberately rides the int64-GEMM pair
    # tier — ONE batch-vectorized Arrow boundary (FlatMapGroupsInPandas,
    # bit-identical to the expression tier, overflow-guarded; pinned by
    # test_round11/test_round12). Row-at-a-time BatchEvalPython stays
    # banned everywhere, the other queries stay fully JVM-side.
    arrow_ok = {"ext_dedup_semdedup"}
    bad = []
    for name, fn in STAGED_R11_QUERIES.items():
        p = explain_str(fn(spark, SF_DIR), "formatted")
        if "BatchEvalPython" in p:
            bad.append((name, "row-at-a-time python"))
        if name in arrow_ok:
            continue
        if "EvalPython" in p or "MapInPandas" in p or "FlatMapGroupsInPandas" in p:
            bad.append((name, "python boundary"))
    assert not bad, bad


def test_semdedup_drops_planted_near_duplicate(spark):
    """Hand-planted corpus: vectors 0 and 5 are near-identical (cos ~
    0.9999) and land in the same cluster, so 5 (the higher id) must be
    dropped; orthogonal vectors survive. Also pins the keep-lowest-id
    direction (0 is never dropped)."""
    from remap_spark.operators.similarity import semdedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 1.0]),
        (4, [0.0, 0.6, 0.8, 0.0]),   # cos 0.6 / 0.8 vs axes: kept
        (5, [0.999, 0.001, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    out = {
        r["vec_id"]: r["dropped"]
        for r in semdedup(df, k=4, iters=2, tau_mil=950).collect()
    }
    assert out[5] is True
    assert out[0] is False
    assert sum(out.values()) == 1  # only the planted dup drops


def test_semdedup_max_cluster_size_exempts_large_clusters(spark):
    """The skew dial: with a cap below the dup pair's cluster size the
    pair's cluster is exempt and NOTHING is dropped; with a generous
    cap the planted dup drops (same corpus as above)."""
    from remap_spark.operators.similarity import semdedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 1.0]),
        (5, [0.999, 0.001, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    capped = semdedup(df, k=4, iters=2, tau_mil=950, max_cluster_size=1)
    assert sum(r["dropped"] for r in capped.collect()) == 0
    open_cap = semdedup(df, k=4, iters=2, tau_mil=950, max_cluster_size=10)
    assert sum(r["dropped"] for r in open_cap.collect()) == 1


def test_dsir_weights_prefer_target_like_documents(spark):
    """Direction check: documents sharing the target slice's
    vocabulary must out-weigh documents made of raw-only vocabulary —
    the defining property of the importance ratio."""
    from remap_spark.operators.split import dsir_log_weights

    target_rows = [(100 + i, "alpha beta gamma delta") for i in range(4)]
    raw_rows = [
        (0, "alpha beta gamma delta"),   # target-like
        (1, "zeta eta theta iota"),      # raw-only vocabulary
        (2, "alpha beta zeta eta"),      # mixed
    ] + target_rows
    raw = spark.createDataFrame(raw_rows, "doc_id bigint, text string")
    target = spark.createDataFrame(
        target_rows, "doc_id bigint, text string"
    )
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(raw, target).collect()
    }
    assert w[0] > w[2] > w[1]

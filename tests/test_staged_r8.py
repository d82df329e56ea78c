"""Full oracle replay of every round-8 staged driver query at BOTH
test scale factors — the same rows+schema+hash gate the driver
applies (conftest.assert-style typed compare), run now so the r8
promotion is a pure dict merge with zero new correctness risk. Also
sweeps the staged plans for unbounded joins (the registered-set
cartesian audit, applied pre-registration)."""

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

from remap_spark.queries.staged_r8 import STAGED_R8_ORACLES, STAGED_R8_QUERIES


def test_staged_sets_aligned():
    assert set(STAGED_R8_QUERIES) == set(STAGED_R8_ORACLES)


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_T2])
@pytest.mark.parametrize("name", sorted(STAGED_R8_QUERIES))
def test_staged_r8_query_matches_oracle(spark, name, sf_dir):
    sdf = STAGED_R8_QUERIES[name](spark, sf_dir)
    assert_driver_shape(sdf, name)
    srows, scols = sdf.collect(), sdf.columns

    con = duck_con(sf_dir)
    try:
        res = con.sql(STAGED_R8_ORACLES[name])
        dcols = res.columns
        dtypes = [str(t) for t in res.types]
        drows = res.fetchall()
    finally:
        con.close()

    # dtype-class gate (the round-7 promotion lesson: staged_r7's
    # replay skipped this and two oracles shipped HUGEINT aggregates
    # the driver's typed hash would have rejected)
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


def test_no_staged_r8_query_plans_a_cartesian_product(spark):
    from remap_spark.plans import explain_str

    bnlj_ok: set[str] = {
        # corpus trigram total N: a single-row broadcast into the
        # per-trigram scoring join (same in-plan-constant contract as
        # ext_text_bm25 / ext_text_bigram_lm in test_plans.py)
        "ext_text_trigram_backoff",
        # HITS L1 normalizers: two single-row SUM relations broadcast
        # back per iteration (operators/pregel.hits) — the in-plan
        # global-aggregate contract, bounded by construction
        "ext_graph_hits",
        # Benford total: one 9-row relation x one single-row broadcast
        "ext_benford",
        # seasonal re-centering: the mean-of-phase-means is ONE row
        # broadcast into the period-sized phase relation
        # (operators/timeseries.decompose_additive) — the same
        # in-plan-constant contract as the normalizers above
        "ext_ts_decompose",
    }
    bad = []
    for name, fn in STAGED_R8_QUERIES.items():
        p = explain_str(fn(spark, SF_DIR), "formatted")
        if "CartesianProduct" in p:
            bad.append((name, "cartesian"))
        if "BroadcastNestedLoopJoin" in p and name not in bnlj_ok:
            bad.append((name, "bnlj"))
    assert not bad, bad


def test_staged_r8_queries_stay_jvm_side(spark):
    """No staged-r8 query crosses the Python boundary in its plan —
    codegen end-to-end — EXCEPT the two multimodal fixture queries,
    whose mapInPandas IS the operator surface (parse_mp3_frames /
    parse_exif are per-blob byte parsers; fixture synthesis rides the
    same Arrow batch)."""
    from remap_spark.plans import explain_str

    python_ok = {"ext_mm_audio_mp3_meta", "ext_mm_exif"}
    bad = []
    for name, fn in STAGED_R8_QUERIES.items():
        if name in python_ok:
            continue
        p = explain_str(fn(spark, SF_DIR), "formatted")
        if "EvalPython" in p or "MapInPandas" in p or "FlatMapGroupsInPandas" in p:
            bad.append(name)
    assert not bad, bad

"""Full oracle replay of every round-9 staged driver query at BOTH
test scale factors — the same rows+schema+hash gate the driver
applies (incl. the dtype-class check the staged-r8 suite added), plus
the pre-registration plan sweeps for unbounded joins and Python
boundaries."""

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

from remap_spark.queries.staged_r9 import STAGED_R9_ORACLES, STAGED_R9_QUERIES


def test_staged_sets_aligned():
    assert set(STAGED_R9_QUERIES) == set(STAGED_R9_ORACLES)


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_T2])
@pytest.mark.parametrize("name", sorted(STAGED_R9_QUERIES))
def test_staged_r9_query_matches_oracle(spark, name, sf_dir):
    sdf = STAGED_R9_QUERIES[name](spark, sf_dir)
    assert_driver_shape(sdf, name)
    srows, scols = sdf.collect(), sdf.columns

    con = duck_con(sf_dir)
    try:
        res = con.sql(STAGED_R9_ORACLES[name])
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


def test_no_staged_r9_query_plans_a_cartesian_product(spark):
    from remap_spark.plans import explain_str

    bnlj_ok: set[str] = {
        # chi-square totals: one single-row (N_ref, N_cur) relation
        # broadcast into the bins-sized join — the in-plan-constant
        # contract of ext_benford / ext_ts_decompose
        "ext_distribution_drift",
        # composition query: the decompose grand-mean broadcast plus
        # the single-row anomaly-threshold broadcast
        "ext_ts_anomaly_seasonal",
    }
    bad = []
    for name, fn in STAGED_R9_QUERIES.items():
        p = explain_str(fn(spark, SF_DIR), "formatted")
        if "CartesianProduct" in p:
            bad.append((name, "cartesian"))
        if "BroadcastNestedLoopJoin" in p and name not in bnlj_ok:
            bad.append((name, "bnlj"))
    assert not bad, bad


def test_staged_r9_queries_stay_jvm_side(spark):
    from remap_spark.plans import explain_str

    bad = []
    for name, fn in STAGED_R9_QUERIES.items():
        p = explain_str(fn(spark, SF_DIR), "formatted")
        if "EvalPython" in p or "MapInPandas" in p or "FlatMapGroupsInPandas" in p:
            bad.append(name)
    assert not bad, bad

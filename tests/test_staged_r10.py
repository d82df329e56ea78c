"""Full oracle replay of every round-10 staged driver query at BOTH
test scale factors — the same rows+schema+hash gate the driver
applies (incl. the dtype-class check), plus the pre-registration plan
sweeps for unbounded joins and Python boundaries."""

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

from remap_spark.queries.staged_r10 import (
    STAGED_R10_ORACLES,
    STAGED_R10_QUERIES,
)


def test_staged_sets_aligned():
    assert set(STAGED_R10_QUERIES) == set(STAGED_R10_ORACLES)


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_T2])
@pytest.mark.parametrize("name", sorted(STAGED_R10_QUERIES))
def test_staged_r10_query_matches_oracle(spark, name, sf_dir):
    sdf = STAGED_R10_QUERIES[name](spark, sf_dir)
    assert_driver_shape(sdf, name)
    srows, scols = sdf.collect(), sdf.columns

    con = duck_con(sf_dir)
    try:
        res = con.sql(STAGED_R10_ORACLES[name])
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


def test_no_staged_r10_query_plans_a_cartesian_product(spark):
    from remap_spark.plans import explain_str

    bnlj_ok: set[str] = set()
    bad = []
    for name, fn in STAGED_R10_QUERIES.items():
        p = explain_str(fn(spark, SF_DIR), "formatted")
        if "CartesianProduct" in p:
            bad.append((name, "cartesian"))
        if "BroadcastNestedLoopJoin" in p and name not in bnlj_ok:
            bad.append((name, "bnlj"))
    assert not bad, bad


def test_staged_r10_queries_stay_jvm_side(spark):
    from remap_spark.plans import explain_str

    bad = []
    for name, fn in STAGED_R10_QUERIES.items():
        p = explain_str(fn(spark, SF_DIR), "formatted")
        if "EvalPython" in p or "MapInPandas" in p or "FlatMapGroupsInPandas" in p:
            bad.append(name)
    assert not bad, bad


def test_k_anonymity_hand_computed(spark):
    """Suppression semantics on a constructed table: class sizes,
    at-risk flags, and the l-diversity leak case (a k-anonymous class
    whose members all share one sensitive value still shows
    n_sensitive = 1)."""
    from remap_spark.operators.expectations import k_anonymity_report

    rows = (
        # class (30, 'F'): 3 members, all sensitive = 100 (l-leak)
        [(1, 30, "F", 100.0), (2, 30, "F", 100.0), (3, 30, "F", 100.0)]
        # class (30, 'M'): 1 member -> at risk at k=3
        + [(4, 30, "M", 50.0)]
        # class (40, 'F'): 4 members, 3 distinct sensitive values
        + [
            (5, 40, "F", 10.0),
            (6, 40, "F", 20.0),
            (7, 40, "F", 20.0),
            (8, 40, "F", 30.0),
        ]
    )
    df = spark.createDataFrame(
        rows, "rid bigint, age int, sex string, wage double"
    )
    got = {
        (r["age"], r["sex"]): (r["n_rows"], r["n_sensitive"], r["at_risk"])
        for r in k_anonymity_report(
            df, ["age", "sex"], k=3, sensitive_col="wage"
        ).collect()
    }
    assert got == {
        (30, "F"): (3, 1, False),
        (30, "M"): (1, 1, True),
        (40, "F"): (4, 3, False),
    }
    # without a sensitive column the l-diversity column is absent
    slim = k_anonymity_report(df, ["age", "sex"], k=3)
    assert "n_sensitive" not in slim.columns


def test_k_anonymity_matches_pandas_groundtruth(spark):
    """Property test: k_anonymity_report over random small tables
    equals a pandas groupby ground truth — class sizes, distinct
    sensitive counts, at-risk flags, and the set of emitted classes
    (only PRESENT combinations appear)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from remap_spark.operators.expectations import k_anonymity_report

    rows_st = st.lists(
        st.tuples(
            st.integers(0, 3),              # quasi 1
            st.sampled_from(["a", "b"]),    # quasi 2
            st.integers(0, 2),              # sensitive
        ),
        min_size=1,
        max_size=25,
    )

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows=rows_st, k=st.sampled_from([1, 2, 4]))
    def run(rows, k):
        df = spark.createDataFrame(
            rows, "q1 int, q2 string, sens int"
        )
        got = {
            (r["q1"], r["q2"]): (
                r["n_rows"], r["n_sensitive"], r["at_risk"]
            )
            for r in k_anonymity_report(
                df, ["q1", "q2"], k=k, sensitive_col="sens"
            ).collect()
        }
        want: dict = {}
        for q1, q2, s in rows:
            n, seen = want.get((q1, q2), (0, set()))
            seen = set(seen) | {s}
            want[(q1, q2)] = (n + 1, seen)
        want = {
            key: (n, len(seen), n < k) for key, (n, seen) in want.items()
        }
        assert got == want

    run()

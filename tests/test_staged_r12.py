"""Full oracle replay of the round-12 staged driver query at BOTH
test scale factors — the same rows+schema+hash gate the driver
applies (incl. the dtype-class check), plus the pre-registration plan
sweeps and a unit pin for the null-url coalesce fix the composition
depends on."""

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

from remap_spark.queries.staged_r12 import (
    STAGED_R12_ORACLES,
    STAGED_R12_QUERIES,
)


def test_staged_sets_aligned():
    assert set(STAGED_R12_QUERIES) == set(STAGED_R12_ORACLES)


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_T2])
@pytest.mark.parametrize("name", sorted(STAGED_R12_QUERIES))
def test_staged_r12_query_matches_oracle(spark, name, sf_dir):
    sdf = STAGED_R12_QUERIES[name](spark, sf_dir)
    assert_driver_shape(sdf, name)
    srows, scols = sdf.collect(), sdf.columns

    con = duck_con(sf_dir)
    try:
        res = con.sql(STAGED_R12_ORACLES[name])
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


def test_no_staged_r12_query_plans_a_cartesian_product(spark):
    from remap_spark.plans import explain_str

    bad = []
    for name, fn in STAGED_R12_QUERIES.items():
        p = explain_str(fn(spark, SF_DIR), "formatted")
        if "CartesianProduct" in p:
            bad.append((name, "cartesian"))
        if "BroadcastNestedLoopJoin" in p:
            bad.append((name, "bnlj"))
    assert not bad, bad


def test_staged_r12_queries_stay_jvm_side(spark):
    from remap_spark.plans import explain_str

    bad = []
    for name, fn in STAGED_R12_QUERIES.items():
        p = explain_str(fn(spark, SF_DIR), "formatted")
        if "EvalPython" in p or "MapInPandas" in p or "FlatMapGroupsInPandas" in p:
            bad.append(name)
    assert not bad, bad


def test_per_host_keeps_cross_site_repetition_once_per_host(spark):
    """The policy discriminator vs dedup_paragraphs_global (pinned at
    1M docs by the r11 SCALE probe, here as a permanent fixture): a
    line shared across N hosts survives once PER HOST — N survivors —
    where the global policy keeps exactly one corpus-wide."""
    from remap_spark.operators.dedup import (
        dedup_paragraphs_global,
        dedup_paragraphs_per_host,
    )

    rows = [
        (1, "https://a.com/1", "syndicated lede\nalpha"),
        (2, "https://a.com/2", "syndicated lede\nbravo"),
        (3, "https://b.com/1", "syndicated lede\ncharlie"),
        (4, "https://c.com/1", "syndicated lede"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string, text string")
    per_host = {
        r["doc"]: r["text"] for r in dedup_paragraphs_per_host(df).collect()
    }
    # one survivor per host: docs 1 (a.com first), 3 (b.com), 4 (c.com)
    assert per_host[1] == "syndicated lede\nalpha"
    assert per_host[2] == "bravo"  # same-host copy dies
    assert per_host[3] == "syndicated lede\ncharlie"
    assert per_host[4] == "syndicated lede"
    # the global policy keeps exactly ONE copy corpus-wide
    global_ = {
        r["doc"]: r["text"]
        for r in dedup_paragraphs_global(df.drop("url")).collect()
    }
    assert sum(t.count("syndicated lede") for t in global_.values()) == 1


def test_per_host_null_url_docs_dedup_in_empty_host_bucket(spark):
    """The ADVICE r10 fix: url_host(NULL) is NULL, and an inner join
    never matches null keys — before the coalesce, every segment of a
    null-url document silently vanished from the output. Pins: null-url
    docs ARE in the output, scope to host '', and dedup against each
    other (the shared line survives only in the min-doc copy)."""
    from remap_spark.operators.dedup import dedup_paragraphs_per_host

    rows = [
        (1, None, "shared line\nunique one"),
        (2, None, "shared line\nunique two"),
        (3, "https://a.com/x", "shared line"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string, text string")
    out = {r["doc"]: r for r in dedup_paragraphs_per_host(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["host"] == "" and out[2]["host"] == ""
    assert out[3]["host"] == "a.com"
    # first null-url occurrence keeps the shared line; the second drops it
    assert out[1]["text"] == "shared line\nunique one"
    assert out[2]["text"] == "unique two"
    assert out[2]["n_removed"] == 1
    # the '' bucket never deduped against a real host
    assert out[3]["text"] == "shared line"

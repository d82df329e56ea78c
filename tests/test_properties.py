"""Property tests (hypothesis) for the map/combine/reduce algebra and
the portable hash layer (SURVEY.md §5.2.3).

Spark round trips are expensive, so properties run few examples over
generated SMALL inputs; the properties themselves are the point:
- combiner on/off equivalence (the algebraic contract, SURVEY §4.3.3)
- partition-count invariance (results don't depend on layout)
- portable hash == DuckDB hash on arbitrary strings
"""

from __future__ import annotations

import json

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

words = st.text(
    alphabet=st.characters(whitelist_categories=("Ll",), max_codepoint=0x024F),
    min_size=1,
    max_size=8,
)
docs = st.lists(
    st.tuples(st.sampled_from(["f1", "f2", "f3"]), st.lists(words, max_size=6).map(" ".join)),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=docs)
def test_combiner_equivalence_property(spark, data):
    from remap_spark.operators.mapreduce import MapReduceJob

    df = spark.createDataFrame(data, "key string, value string")

    def m(key, value):
        for w in value.split():
            yield "p", w, 1

    def r(key, values):
        yield key, sum(values)

    plain = MapReduceJob(map=m, reduce=r).run(df).collect()
    combined = (
        MapReduceJob(map=m, reduce=r, combiner=lambda l: [sum(l)]).run(df).collect()
    )
    assert sorted((x["k3"], json.loads(x["v3"])) for x in plain) == sorted(
        (x["k3"], json.loads(x["v3"])) for x in combined
    )


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=docs, nparts=st.sampled_from([1, 3, 7]))
def test_partition_count_invariance(spark, data, nparts):
    """The same job over 1, 3, or 7 input partitions yields identical
    results — the reference could not guarantee this (value order
    depended on mapper file layout, SURVEY §4.3.2)."""
    from remap_spark.operators.mapreduce import MapReduceJob

    df = spark.createDataFrame(data, "key string, value string").repartition(nparts)

    def m(key, value):
        for w in value.split():
            yield "p", w, key

    def r(key, values):
        yield key, sorted(values)

    out = MapReduceJob(map=m, reduce=r).run(df).collect()
    expected = {}
    for k, v in data:
        for w in v.split():
            expected.setdefault(w, []).append(k)
    assert {x["k3"]: json.loads(x["v3"]) for x in out} == {
        w: sorted(ks) for w, ks in expected.items()
    }


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(s=st.text(max_size=40))
def test_portable_hash_matches_duckdb(spark, s):
    from pyspark.sql import functions as F

    from remap_spark.functions import portable_hash32, portable_hash60

    df = spark.createDataFrame([(s,)], "s string")
    row = df.select(
        portable_hash32("s").alias("h32"), portable_hash60("s").alias("h60")
    ).first()
    con = duckdb.connect()
    d32, d60 = con.execute(
        "SELECT CAST('0x' || substr(md5(?),1,8) AS BIGINT),"
        " CAST('0x' || substr(md5(?),1,15) AS BIGINT)",
        [s, s],
    ).fetchone()
    con.close()
    assert (row["h32"], row["h60"]) == (d32, d60)

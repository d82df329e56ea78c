"""Correctness gate mirror: every declared query vs its DuckDB oracle
at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from conftest import SF_DIR, assert_matches_oracle


def _query_names():
    from remap_spark.queries import ALL_ORACLES, ALL_QUERIES

    return sorted(n for n in ALL_QUERIES if n in ALL_ORACLES)


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, name):
    assert_matches_oracle(spark, name)


def test_all_queries_have_oracles_or_are_declared():
    """Every queries() entry either has an oracle or is explicitly in
    the known non-SQL-expressible set."""
    from remap_spark.queries import ALL_ORACLES, ALL_QUERIES

    missing = set(ALL_QUERIES) - set(ALL_ORACLES)
    assert not missing, f"queries lacking oracles: {missing}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs) or set(qs) <= set(os_)


@pytest.mark.parametrize(
    "name", ["dq10_anti", "dq11_except", "dq20_range_join"]
)
def test_formerly_vacuous_queries_return_rows(spark, name):
    """Round-1 verdict #3: these capabilities must be proven on
    non-empty results — a 0-row match is vacuous. Guards against a
    future fixture or predicate change re-emptying them."""
    from remap_spark.queries import ALL_QUERIES

    assert ALL_QUERIES[name](spark, SF_DIR).count() > 0

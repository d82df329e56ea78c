"""Full oracle replay of every round-7 staged driver query — the same
rows+schema+hash gate the driver applies, run NOW so the r7 window
promotion is a pure dict merge with zero new correctness risk."""

from __future__ import annotations

import pytest

from conftest import SF_DIR, assert_driver_shape, canon, duck_con

from remap_spark.queries.staged_r7 import STAGED_ORACLES, STAGED_QUERIES


def test_staged_sets_aligned():
    assert set(STAGED_QUERIES) == set(STAGED_ORACLES)


@pytest.mark.parametrize("name", sorted(STAGED_QUERIES))
def test_staged_query_matches_oracle(spark, name):
    sdf = STAGED_QUERIES[name](spark, SF_DIR)
    assert_driver_shape(sdf, name)
    srows, scols = sdf.collect(), sdf.columns

    con = duck_con(SF_DIR)
    try:
        res = con.sql(STAGED_ORACLES[name])
        dcols, drows = res.columns, res.fetchall()
    finally:
        con.close()

    assert sorted(scols) == sorted(dcols), (name, scols, dcols)
    assert len(srows) == len(drows) > 0, (name, len(srows), len(drows))
    s, d = canon(srows, scols), canon(drows, dcols)
    mismatch = [(a, b) for a, b in zip(s, d) if a != b][:3]
    assert not mismatch, (name, mismatch)

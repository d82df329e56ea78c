"""Pytest-tier replay of the retired driver-gate rows (r8): retired
means out of the driver window rotation, NOT out of the correctness
suite — every retired query keeps its verbatim oracle comparison here
(queries/retired.py has the retirement rationale and arithmetic)."""

from __future__ import annotations

import pytest

from conftest import assert_matches_oracle


def _retired():
    from remap_spark.queries.retired import RETIRED_ORACLES, RETIRED_QUERIES

    return sorted(RETIRED_QUERIES), RETIRED_QUERIES, RETIRED_ORACLES


@pytest.mark.parametrize("name", _retired()[0])
def test_retired_query_matches_oracle(spark, name):
    _, qs, oracles = _retired()
    assert_matches_oracle(
        spark, name, query_fn=qs[name], oracle=oracles[name]
    )


def test_retired_rows_are_not_registered():
    """Retirement must be total: a name in both tiers would consume a
    window slot while claiming pytest-tier status."""
    from remap_spark.queries import ALL_ORACLES, ALL_QUERIES
    from remap_spark.queries.retired import RETIRED_QUERIES

    leaked = [
        n for n in RETIRED_QUERIES if n in ALL_QUERIES or n in ALL_ORACLES
    ]
    assert not leaked, f"retired queries still registered: {leaked}"


def test_retired_capability_siblings_stay_registered():
    """The retirement rationale rests on each retired row having a
    registered sibling proving the same capability — if the sibling is
    ever dropped, the retired row must be reinstated first."""
    from remap_spark.queries import ALL_QUERIES

    for sibling in ("ext_funnel_conversion", "dq21_left_outer",
                    "dq21_full_outer", "ext_pipeline_analytics",
                    "ext_split_train_test"):
        assert sibling in ALL_QUERIES, (
            f"{sibling} left the registry; reinstate the retired row "
            "it was covering for (queries/retired.py)"
        )

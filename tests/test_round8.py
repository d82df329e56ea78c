"""Round-8 additions: the pre_collapse contraction pass for
connected_components_star (the r7-verdict perf experiment on the
entity-resolution closure floor)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _labels(spark, edges, **kw):
    from remap_spark.operators.pregel import connected_components_star

    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {
        (r["id"], r["component"])
        for r in connected_components_star(df, **kw).collect()
    }


def test_pre_collapse_bit_identical_adversarial_shapes(spark):
    """pre_collapse=True must reproduce the exact min-id labels of the
    plain fixpoint on every contraction-relevant shape at once:
    a star centered at its min (collapses entirely), a star centered
    at its MAX (center re-points, residual survives), a 9-vertex path
    (multi-hop residual), a triangle + pendant, self-loops, reversed
    and duplicated edges, and a 2-cycle."""
    edges = (
        # star centered at min 1
        [(1, 10), (1, 11), (1, 12)]
        # star centered at max 25 over {20..25}
        + [(25, 20), (25, 21), (25, 22), (25, 23), (25, 24)]
        # long path 30..38
        + [(i, i + 1) for i in range(30, 38)]
        # triangle + pendant
        + [(40, 41), (41, 42), (42, 40), (42, 43)]
        # noise: self-loop, duplicate, reversed duplicate, 2-cycle
        + [(50, 50), (1, 10), (10, 1), (60, 61), (61, 60)]
    )
    plain = _labels(spark, edges, pre_collapse=False)
    collapsed = _labels(spark, edges, pre_collapse=True)
    assert collapsed == plain
    # spot-check the expected minima so the equality isn't vacuous
    want = {(10, 1), (24, 20), (38, 30), (43, 40), (50, 50), (61, 60)}
    assert want <= plain


def test_pre_collapse_bit_identical_random_graph(spark):
    """Seeded random graph mixing many trivial components with a few
    larger ones — the entity-resolution pair-graph profile the pass
    is built for."""
    rng = random.Random(8)
    edges = []
    nid = 0
    for _ in range(60):  # size-2/3 components (the dominant mass)
        k = rng.choice([2, 2, 2, 3])
        ids = [nid + i for i in range(k)]
        rng.shuffle(ids)
        edges += [(ids[i], ids[i + 1]) for i in range(k - 1)]
        nid += k
    for _ in range(5):  # larger random components
        k = rng.randint(6, 14)
        ids = [nid + i for i in range(k)]
        rng.shuffle(ids)
        edges += [(ids[i], ids[i + 1]) for i in range(k - 1)]
        edges += [
            (rng.choice(ids), rng.choice(ids)) for _ in range(k // 2)
        ]
        nid += k
    plain = _labels(spark, edges, pre_collapse=False)
    collapsed = _labels(spark, edges, pre_collapse=True)
    assert collapsed == plain
    # every component's label is its min member
    by_comp: dict[int, list[int]] = {}
    for vid, comp in plain:
        by_comp.setdefault(comp, []).append(vid)
    assert all(min(v) == c for c, v in by_comp.items())


def test_resolver_multi_uses_pre_collapse_and_keeps_output(spark):
    """resolve_entities_multi output is unchanged by the pre_collapse
    wiring: a small typo corpus resolves to the same entity sets as a
    brute-force transitive closure over lev<=1 pairs."""
    from remap_spark.operators.linkage import resolve_entities_multi

    rows = [
        (1, "alpha"), (2, "alphb"), (3, "aXpha"),   # one entity via 2 keys
        (4, "gamma"), (5, "gamme"),                  # pair
        (6, "delta"),                                # singleton
    ]
    df = spark.createDataFrame(rows, "rid bigint, name string")
    out = resolve_entities_multi(
        df,
        "rid",
        "name",
        [F.substring("name", 1, 2), F.substring("name", -2, 2)],
        max_distance=1,
    )
    got = {(r["rid"], r["entity_id"]) for r in out.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)}


def test_thresholded_levenshtein_pairs_identical(spark):
    """The banded thresholded levenshtein in blocked_match_pairs /
    blocked_match_pairs_multi must produce the identical (pair,
    distance) set as the unbounded form + <= filter: distances 0, 1,
    exactly max_distance, max_distance+1, and far-over straddle the
    threshold inside one block; a NULL text and a distinct block are
    excluded by construction."""
    from remap_spark.operators.linkage import (
        blocked_match_pairs,
        blocked_match_pairs_multi,
    )

    rows = [
        (1, "kitten", "b1"),
        (2, "kitten", "b1"),    # d=0
        (3, "sitten", "b1"),    # d=1 vs kitten
        (4, "sittin", "b1"),    # d=2 vs kitten
        (5, "sitting", "b1"),   # d=3 vs kitten (excluded at max=2)
        (6, "zzzzzzzzzz", "b1"),  # far over on every pair
        (7, None, "b1"),        # NULL text never matches
        (8, "kitten", "b2"),    # other block: no cross-block pair
    ]
    df = spark.createDataFrame(rows, "rid bigint, name string, blk string")
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in blocked_match_pairs(
            df, "rid", "name", "blk", max_distance=2
        ).collect()
    }
    # unbounded-form expectation, hand-checked
    want = {
        (1, 2, 0), (1, 3, 1), (1, 4, 2),
        (2, 3, 1), (2, 4, 2),
        (3, 4, 1), (3, 5, 2), (4, 5, 1),
    }
    assert got == want
    got_multi = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in blocked_match_pairs_multi(
            df, "rid", "name", ["blk"], max_distance=2
        ).collect()
    }
    assert got_multi == want

"""Round-9 ER pair-stage equivalence on a random VARIED-LENGTH corpus
(lengths 0..14): blocked_match_pairs vs brute-force all-pairs-within-
block levenshtein for several thresholds. Written for the r9 length-
prefilter experiment and retained after the prefilter's removal (the
three-arg levenshtein performs the same length reject internally —
SCALE.md r9): it pins exactly the behavior that reject must preserve,
so a regression in the thresholded-lev semantics fails here first."""

from __future__ import annotations

import random


def _brute_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_length_prefilter_pairs_identical_random_corpus(spark):
    """Random varied-length corpus (lengths 0..14, so the prefilter
    fires on a large fraction of candidates): the blocked pair set with
    the prefilter must equal the brute-force all-pairs-within-block
    lev <= d ground truth, for d in {1, 2, 3}."""
    from remap_spark.operators.linkage import (
        blocked_match_pairs,
        blocked_match_pairs_multi,
    )

    rng = random.Random(90)
    rows = [
        (
            i,
            "".join(rng.choice("abcd") for _ in range(rng.randint(0, 14))),
            f"b{rng.randint(0, 2)}",
        )
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "rid bigint, name string, blk string")
    by_block: dict[str, list[tuple[int, str]]] = {}
    for rid, name, blk in rows:
        by_block.setdefault(blk, []).append((rid, name))
    for d in (1, 2, 3):
        want = set()
        for members in by_block.values():
            for i, (ida, ta) in enumerate(members):
                for idb, tb in members[i + 1:]:
                    lo, hi = min(ida, idb), max(ida, idb)
                    lv = _brute_lev(ta, tb)
                    if lv <= d:
                        want.add((lo, hi, lv))
        got = {
            (r["id_a"], r["id_b"], r["distance"])
            for r in blocked_match_pairs(
                df, "rid", "name", "blk", max_distance=d
            ).collect()
        }
        assert got == want, f"max_distance={d}"
        got_multi = {
            (r["id_a"], r["id_b"], r["distance"])
            for r in blocked_match_pairs_multi(
                df, "rid", "name", ["blk"], max_distance=d
            ).collect()
        }
        assert got_multi == want, f"multi max_distance={d}"

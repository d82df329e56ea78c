"""Round-7 operator tests: multi-key blocking for entity resolution
(recall vs brute force on a constructed typo corpus) and the staged-r8
query replays live in tests/test_staged_r8.py."""

from __future__ import annotations

from pyspark.sql import functions as F


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _typo_corpus():
    """40 clean names + per-name variants with a typo in the FIRST
    char (breaks prefix blocking), the LAST char (breaks suffix
    blocking), and a doubled 5th char (length +1; breaks any
    length-sensitive key) — no single key of the three blocking keys
    sees every within-identity pair, their union sees all. The
    identity digits repeat FIVE times, so distinct identities are
    >= 5 edits apart and any two variants of different identities are
    >= 3 > max_distance — brute force never pairs across identities.
    base[4] == base[5] ('XX') so the doubled-char variant keeps the
    6-char prefix AND (insertion before the tail) the 6-char suffix."""
    rows = []
    rid = 0
    for i in range(40):
        d = f"{i:02d}"
        base = f"Cu{d}XX{d}y{d}z{d}w{d}"
        rows.append((rid, base)); rid += 1
        if i % 2 == 0:  # first-char typo
            rows.append((rid, "Q" + base[1:])); rid += 1
        if i % 3 == 0:  # last-char typo
            rows.append((rid, base[:-1] + "q")); rid += 1
        if i % 5 == 0:  # doubled char (length +1)
            rows.append((rid, base[:5] + base[4:])); rid += 1
    return rows


def _brute_pairs(rows, max_distance=2):
    out = set()
    for i, (ida, ta) in enumerate(rows):
        for idb, tb in rows[i + 1 :]:
            if _lev(ta, tb) <= max_distance:
                out.add((min(ida, idb), max(ida, idb)))
    return out


def _block_keys():
    # built lazily: Column exprs need an active SparkContext
    return [
        F.substring("name", 1, 6),  # prefix
        F.substring("name", -6, 6),  # suffix
        F.concat(F.substring("name", 4, 8), F.length("name")),  # mid+len
    ]


def test_multi_key_blocking_full_recall_vs_brute_force(spark):
    from remap_spark.operators.linkage import (
        blocked_match_pairs,
        blocked_match_pairs_multi,
    )

    rows = _typo_corpus()
    df = spark.createDataFrame(rows, "id long, name string")
    want = _brute_pairs(rows)
    assert want, "corpus must produce matches"

    got = {
        (r["id_a"], r["id_b"])
        for r in blocked_match_pairs_multi(
            df, "id", "name", _block_keys(), max_distance=2
        ).collect()
    }
    # union of keys reaches every true pair on this corpus (every typo
    # leaves at least one of prefix/suffix/mid+len intact), and
    # blocking never invents pairs: candidates are lev-verified
    assert got == want

    # the single prefix key PROVABLY misses the first-char-typo pairs
    single = {
        (r["id_a"], r["id_b"])
        for r in blocked_match_pairs(
            df, "id", "name", F.substring("name", 1, 6), max_distance=2
        ).collect()
    }
    assert single < want


def test_multi_key_per_key_cap_drops_block_for_that_key_only(spark):
    from remap_spark.operators.linkage import blocked_match_pairs_multi

    # two records identical except last char: same prefix (oversized
    # shared block under key0 once we add filler rows with that
    # prefix), same suffix-key block (small). Cap kills key0's block;
    # the pair must survive via the suffix key.
    rows = [(0, "AAAA-match-Z1"), (1, "AAAA-match-Z2")]
    rows += [(10 + i, f"AAAA-filler-{i:03d}") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, name string")
    keys = [F.substring("name", 1, 4), F.substring("name", 6, 6)]
    got = {
        (r["id_a"], r["id_b"])
        for r in blocked_match_pairs_multi(
            df, "id", "name", keys, max_distance=2, max_block_size=10
        ).collect()
    }
    assert (0, 1) in got


def test_resolve_entities_multi_closure_and_self_entities(spark):
    from remap_spark.operators.linkage import resolve_entities_multi

    rows = _typo_corpus()
    df = spark.createDataFrame(rows, "id long, name string")
    out = resolve_entities_multi(
        df, "id", "name", _block_keys(), max_distance=2
    ).collect()
    assert len(out) == len(rows)
    want = _brute_pairs(rows)
    # transitive closure over brute pairs, python-side
    parent = {i: i for i, _ in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in want:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {i: find(i) for i, _ in rows}
    got = {r["id"]: r["entity_id"] for r in out}
    assert got == expect

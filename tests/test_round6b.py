"""Round-6 continuation operators: market-basket association rules,
entity resolution, anomaly detection, RFM segmentation, time-weighted
averages, skyline, and key-skew reporting. Hand-computed semantics on
constructed inputs plus DuckDB replays at sf0.001 so the r7 driver
registration is a pure re-plumb.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from conftest import SF_DIR, canon, duck_con


def test_association_rules_hand_computed(spark):
    from remap_spark.operators.basket import association_rules

    rows = [
        ("b1", "x"), ("b1", "y"), ("b1", "y"),  # dup item row: distinct-ed
        ("b2", "x"), ("b2", "y"),
        ("b3", "x"), ("b3", "z"),
        ("b4", "y"),
    ]
    df = spark.createDataFrame(rows, "bk string, it string")
    got = {
        (r.antecedent, r.consequent): (
            r.pair_baskets,
            r.support_ppm,
            r.confidence_ppm,
            r.lift_ppm,
        )
        for r in association_rules(df, "bk", "it", min_pair_baskets=1).collect()
    }
    # n=4 baskets; counts x=3 y=3 z=1; pairs (x,y)=2 (x,z)=1
    assert got[("x", "y")] == (2, 500_000, 666_666, 888_888)
    assert got[("y", "x")] == (2, 500_000, 666_666, 888_888)
    # two-step floor makes lift direction-sensitive by design:
    # x->z: floor(floor(1e6/3)*4/1) vs z->x: floor(floor(1e6/1)*4/3)
    assert got[("x", "z")] == (1, 250_000, 333_333, 1_333_332)
    assert got[("z", "x")] == (1, 250_000, 1_000_000, 1_333_333)
    assert len(got) == 4


def test_association_rules_basket_cap(spark):
    from remap_spark.operators.basket import association_rules

    rows = [("big", c) for c in "abcd"] + [("s1", "a"), ("s1", "b")]
    df = spark.createDataFrame(rows, "bk string, it string")
    got = association_rules(
        df, "bk", "it", min_pair_baskets=1, max_basket_size=3
    )
    pairs = {(r.antecedent, r.consequent) for r in got.collect()}
    # pairs only from the small basket; c/d co-occurrences dropped
    assert pairs == {("a", "b"), ("b", "a")}


def test_association_rules_match_duckdb(spark):
    """Full replay on lineitem (orderkey=basket, partkey=item)."""
    from remap_spark.engine import load_table
    from remap_spark.operators.basket import association_rules

    li = load_table(spark, SF_DIR, "lineitem")
    got = association_rules(
        li, "l_orderkey", "l_partkey", min_pair_baskets=2
    )
    srows, scols = got.collect(), got.columns

    con = duck_con(SF_DIR)
    try:
        want = con.sql(
            """
            WITH items AS (
              SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
              FROM lineitem
            ),
            n AS (SELECT COUNT(DISTINCT bk) AS n_baskets FROM items),
            ic AS (SELECT it, COUNT(*) AS c FROM items GROUP BY it),
            pairs AS (
              SELECT a.it AS ia, b.it AS ib, COUNT(*) AS pc
              FROM items a JOIN items b ON a.bk = b.bk AND a.it < b.it
              GROUP BY a.it, b.it
              HAVING COUNT(*) >= 2
            ),
            directed AS (
              SELECT ia AS antecedent, ib AS consequent, pc FROM pairs
              UNION ALL
              SELECT ib, ia, pc FROM pairs
            )
            SELECT
              d.antecedent,
              d.consequent,
              d.pc AS pair_baskets,
              ca.c AS antecedent_baskets,
              cc.c AS consequent_baskets,
              CAST(d.pc * 1000000 // n.n_baskets AS BIGINT) AS support_ppm,
              CAST(d.pc * 1000000 // ca.c AS BIGINT) AS confidence_ppm,
              CAST((d.pc * 1000000 // ca.c) * n.n_baskets // cc.c AS BIGINT)
                AS lift_ppm
            FROM directed d
            JOIN ic ca ON ca.it = d.antecedent
            JOIN ic cc ON cc.it = d.consequent
            CROSS JOIN n
            """
        )
        dcols, drows = want.columns, want.fetchall()
    finally:
        con.close()

    assert len(srows) > 0
    assert sorted(scols) == sorted(dcols)
    assert canon([tuple(r) for r in srows], scols) == canon(drows, dcols)

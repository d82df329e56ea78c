"""Round-8 staged driver registrations.

Round 7 froze registry growth (169 registered against the 50x4 = 200
staleness ceiling — see the rotation comment in ``queries/__init__``),
so operators added in round 7 stage HERE exactly the way the round-6
operators staged in ``staged_r7.py``: a deterministic ``(spark,
sf_dir) -> DataFrame`` wrapper plus the exact DuckDB oracle, replayed
at both test scale factors by ``tests/test_staged_r8.py`` and
plan-swept for unbounded joins, so the r8 promotion is again a pure
dict merge with zero new correctness risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine import load_table
from ..operators.linkage import resolve_entities_multi


def ext_entity_resolution_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key blocked entity resolution: candidate pairs from the
    UNION of two blocking keys — the name prefix through the 7th
    customer-number digit (catches typos in the trailing digits, the
    single-key r7 query's coverage) plus the LAST-7-digit suffix
    (catches typos in the leading digits, which change the prefix
    block and were invisible to the single key). Recall-vs-brute-force
    is pinned by tests/test_round7.py on a constructed typo corpus;
    here the DuckDB oracle replays the exact same key union, lev<=2
    edge predicate, and min-label closure."""
    cust = load_table(spark, sf_dir, "customer")
    out = resolve_entities_multi(
        cust,
        "c_custkey",
        "c_name",
        [F.substring("c_name", 1, 16), F.substring("c_name", -7, 7)],
        max_distance=2,
    )
    return out.select("c_custkey", "entity_id").orderBy("c_custkey")


_ENTITY_RESOLUTION_MULTI_SQL = """
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM customer a JOIN customer b
        ON (substr(a.c_name, 1, 16) = substr(b.c_name, 1, 16)
            OR substr(a.c_name, length(a.c_name) - 6, 7)
             = substr(b.c_name, length(b.c_name) - 6, 7))
       AND a.c_custkey < b.c_custkey
       AND levenshtein(a.c_name, b.c_name) <= 2
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    walk(u, lbl) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, w.lbl FROM edges e JOIN walk w ON w.u = e.v
    ),
    comp AS (SELECT u, MIN(lbl) AS ent FROM walk GROUP BY u)
    SELECT c.c_custkey, COALESCE(comp.ent, c.c_custkey) AS entity_id
    FROM customer c LEFT JOIN comp ON comp.u = c.c_custkey
    ORDER BY c_custkey
"""


STAGED_R8_QUERIES = {
    "ext_entity_resolution_multi": ext_entity_resolution_multi,
}

STAGED_R8_ORACLES = {
    "ext_entity_resolution_multi": _ENTITY_RESOLUTION_MULTI_SQL,
}

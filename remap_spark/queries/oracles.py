"""DuckDB oracle SQL for every declared query (SURVEY.md §5.2.1).

Each string is ANSI-ish SQL DuckDB 1.x runs against views named
region/nation/customer/supplier/part/orders/lineitem/events/documents/
embeddings. Column names and value semantics match the Spark builders
in ``relational.py`` / ``graphs.py`` / the extension operators exactly:

- money sums: CAST(expr AS DECIMAL(28,10)) -> SUM -> ROUND -> DOUBLE
  (exact, order-independent — same as the Spark side);
- session gaps in microseconds (epoch_us ~ Spark unix_micros);
- tokenization: translate('.,?:;!"') -> lower -> split \\s+ -> drop ''.
"""

from __future__ import annotations

TOKENS_CTE = """
toks AS (
  SELECT doc_id, source,
         unnest(string_split_regex(lower(translate(text, '.,?:;!"', '       ')), '\\s+')) AS word
  FROM documents
), words AS (SELECT * FROM toks WHERE word <> '')
"""

DQ_ORACLES: dict[str, str] = {
    "dq01_project": """
        SELECT l_orderkey, l_linenumber,
               ROUND(l_extendedprice * (1 - l_discount), 5) AS net
        FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    "dq02_filter": """
        SELECT l_orderkey, l_quantity FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1996-01-01'
          AND l_quantity > 45
        ORDER BY l_orderkey, l_quantity
    """,
    "dq03_wordcount": f"""
        WITH {TOKENS_CTE}
        SELECT word, COUNT(*) AS cnt FROM words
        GROUP BY word ORDER BY cnt DESC, word LIMIT 100
    """,
    "dq04_collation": f"""
        WITH {TOKENS_CTE}
        SELECT word, string_agg(DISTINCT source, ',' ORDER BY source) AS sources
        FROM words GROUP BY word ORDER BY word LIMIT 100
    """,
    "dq05_agg": """
        SELECT l_returnflag, l_linestatus,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_qty,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))), 4) AS DOUBLE) AS sum_net,
               ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*), 5) AS avg_disc,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "dq06_secondary_sort": """
        SELECT user_id, rn, event_id FROM (
          SELECT user_id, event_id,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events
        ) WHERE rn <= 3 ORDER BY user_id, rn
    """,
    "dq07_topk": """
        SELECT c_custkey, c_name,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY revenue DESC, c_custkey LIMIT 10
    """,
    "dq08_join_agg": """
        SELECT c_mktsegment, COUNT(*) AS cnt
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "dq09_multiway_join": """
        SELECT n_name,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name ORDER BY n_name
    """,
    "dq10_anti": """
        SELECT c_custkey FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_totalprice > 300000)
        ORDER BY c_custkey
    """,
    "dq10_semi": """
        SELECT COUNT(*) AS cnt FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
    "dq11_intersect": """
        SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
        INTERSECT
        SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
        ORDER BY n_name
    """,
    "dq11_except": """
        SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
        EXCEPT
        SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE s_acctbal >= 5000
        ORDER BY n_name
    """,
    "dq12_rollup": """
        SELECT COALESCE(l_returnflag, 'ALL') AS rf,
               COALESCE(l_linestatus, 'ALL') AS ls,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY rf, ls
    """,
    "dq13_tumbling": """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               COUNT(*) AS cnt,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))), 5) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "dq14_sessionize": """
        WITH lagged AS (
          SELECT user_id, ts, event_id,
                 epoch_us(ts) - LAG(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS gap
          FROM events
        ), flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END AS new_sess
          FROM lagged
        ), sess AS (
          SELECT user_id,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id
          FROM flagged
        ), per_sess AS (
          SELECT user_id, session_id, COUNT(*) AS n_events
          FROM sess GROUP BY user_id, session_id
        )
        SELECT user_id, COUNT(*) AS session_count, MAX(n_events) AS max_session_len
        FROM per_sess GROUP BY user_id ORDER BY user_id LIMIT 200
    """,
    "dq15_json": """
        SELECT event_type,
               -- DuckDB SUM(BIGINT) -> HUGEINT -> float64 in pandas; the outer
               -- CAST keeps the dtype bigint like Spark's (VERDICT r1 #1)
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
               COUNT(*) AS cnt
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "dq15_year": """
        SELECT year(o_orderdate) AS yr, COUNT(*) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,10))), 2) AS DOUBLE) AS total
        FROM orders GROUP BY yr ORDER BY yr
    """,
    "dq19_buckets": f"""
        WITH {TOKENS_CTE}
        SELECT CASE
                 WHEN substr(word,1,1) BETWEEN 'a' AND 'e' THEN 'a2e'
                 WHEN substr(word,1,1) BETWEEN 'f' AND 'n' THEN 'f2n'
                 WHEN substr(word,1,1) BETWEEN 'o' AND 's' THEN 'o2s'
                 WHEN substr(word,1,1) BETWEEN 't' AND 'z' THEN 't2z'
                 ELSE '_default'
               END AS bucket, COUNT(*) AS cnt
        FROM words GROUP BY bucket ORDER BY bucket
    """,
    "dq21_left_outer": """
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey ORDER BY c_custkey
    """,
    "dq21_full_outer": """
        SELECT side, COUNT(*) AS cnt FROM (
          SELECT CASE WHEN u.user_id IS NULL THEN 'customer_only'
                      WHEN c.c_custkey IS NULL THEN 'user_only'
                      ELSE 'both' END AS side
          FROM (SELECT DISTINCT user_id FROM events) u
          FULL OUTER JOIN customer c ON u.user_id = c.c_custkey
        ) GROUP BY side ORDER BY side
    """,
    "dq22_union": """
        SELECT n_name, COUNT(*) AS cnt FROM (
          SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
          UNION ALL
          SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
        ) GROUP BY n_name ORDER BY n_name
    """,
    "dq20_range_join": """
        SELECT o_orderpriority, COUNT(*) AS cnt
        FROM events e JOIN orders o
          ON e.user_id = o.o_custkey
         AND e.ts >= o.o_orderdate + INTERVAL 26 YEAR
         AND e.ts <= o.o_orderdate + INTERVAL 26 YEAR + INTERVAL 7 DAY
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
}

# dq18 is DQ5 via the UDF path — the oracle is identical by construction.
DQ_ORACLES["dq18_grouped_udf"] = DQ_ORACLES["dq05_agg"]

DQ_ORACLES["dq23_cube"] = """
    SELECT COALESCE(l_returnflag, 'ALL') AS rf,
           COALESCE(l_linestatus, 'ALL') AS ls,
           COUNT(*) AS cnt,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus) ORDER BY rf, ls
"""

DQ_ORACLES["dq24_asof_join"] = """
    WITH j AS (
      SELECT e.event_id, o.o_orderpriority,
             ROW_NUMBER() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey) AS rn
      FROM events e JOIN orders o
        ON o.o_custkey = e.user_id
       AND CAST(o.o_orderdate AS TIMESTAMP) <= e.ts
    )
    SELECT o_orderpriority, COUNT(*) AS cnt
    FROM j WHERE rn = 1 GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

DQ_ORACLES["dq25_window_funcs"] = """
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER w AS rn,
           CAST(ROUND(AVG(CAST(o_totalprice AS DECIMAL(28,10)))
                      OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 5) AS DOUBLE) AS ma3,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,10)))
                      OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 5) AS DOUBLE) AS cum_spend
    FROM orders WHERE o_custkey < 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, rn
"""

DQ_ORACLES["dq26_distinct_agg"] = """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS nd_part,
           COUNT(DISTINCT l_suppkey) AS nd_supp,
           COUNT(*) AS cnt
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""

DQ_ORACLES["dq27_sliding"] = """
    WITH wins AS (
      -- NAIVE timestamps throughout: to_timestamp() would return
      -- TIMESTAMPTZ, which string-compares differently from Spark's
      -- naive window starts
      SELECT unnest([
               TIMESTAMP '1970-01-01'
                 + CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) * INTERVAL '1 second',
               TIMESTAMP '1970-01-01'
                 + (CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) - 1800) * INTERVAL '1 second'
             ]) AS w_start,
             event_type, value
      FROM events
    )
    SELECT w_start, event_type, COUNT(*) AS cnt,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))), 5) AS DOUBLE) AS sum_value
    FROM wins GROUP BY w_start, event_type ORDER BY w_start, event_type
"""

DQ_ORACLES["dq28_exists"] = """
    SELECT o_orderpriority, COUNT(*) AS cnt
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o.o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

DQ_ORACLES["dq29_scalar_subquery"] = """
    WITH avg_qty AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE)
               / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,10))), 2) AS DOUBLE) AS total,
           COUNT(*) AS cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#23'
    JOIN avg_qty a ON l.l_partkey = a.l_partkey
    WHERE l.l_quantity < 0.2 * a.avg_qty
"""

DQ_ORACLES["dq30_grouping_sets"] = """
    SELECT COALESCE(l_returnflag, 'ALL') AS rf,
           COALESCE(l_linestatus, 'ALL') AS ls,
           COUNT(*) AS cnt,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY rf, ls
"""

DQ_ORACLES["dq31_pivot"] = """
    SELECT l_returnflag AS rf,
           COUNT(*) FILTER (WHERE l_linestatus = 'F') AS cnt_f,
           COUNT(*) FILTER (WHERE l_linestatus = 'O') AS cnt_o
    FROM lineitem GROUP BY l_returnflag ORDER BY rf
"""

DQ_ORACLES["dq32_session_window"] = """
    WITH lagged AS (
      SELECT user_id, ts, event_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS gap
      FROM events
    ), flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN gap IS NULL OR gap >= 1800000000 THEN 1 ELSE 0 END AS new_sess
      FROM lagged
    ), sess AS (
      SELECT user_id,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ), per_sess AS (
      SELECT user_id, session_id, COUNT(*) AS n_events
      FROM sess GROUP BY user_id, session_id
    )
    SELECT user_id, COUNT(*) AS session_count, MAX(n_events) AS max_session_len
    FROM per_sess GROUP BY user_id ORDER BY user_id LIMIT 200
"""

# RETIRED in r8 (queries/retired.py): declared as a standalone
# constant so DQ_ORACLES never contains it — no import-time pop.
RETIRED_RIGHT_OUTER_SQL = """
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey ORDER BY c_custkey
"""

DQ_ORACLES["dq33_percentiles"] = """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           COUNT(*) AS cnt
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""

DQ_ORACLES["dq34_array_funcs"] = """
    SELECT label, COUNT(*) AS cnt,
           CAST(ROUND(SUM(CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(28,10)))
                      / COUNT(*), 5) AS DOUBLE) AS avg_first,
           CAST(SUM(list_aggregate(
                 list_transform(embedding,
                                x -> CASE WHEN x > 0 THEN 1 ELSE 0 END),
                 'sum')) AS BIGINT) AS total_pos
    FROM embeddings GROUP BY label ORDER BY label
"""

DQ_ORACLES["dq35_regexp"] = """
    SELECT regexp_extract(text, 's[a-z]+', 0) AS first_s, COUNT(*) AS cnt
    FROM documents GROUP BY 1 ORDER BY cnt DESC, first_s LIMIT 20
"""

DQ_ORACLES["dq36_conditional_agg"] = """
    SELECT l_linestatus,
           CAST(ROUND(SUM(CAST(CASE WHEN l_discount > 0.05
                                    THEN l_extendedprice ELSE 0.0 END
                               AS DECIMAL(28,10))), 2) AS DOUBLE) AS disc_rev,
           CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_disc,
           COUNT(*) AS cnt
    FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
"""

DQ_ORACLES["dq37_lead_lag"] = """
    SELECT user_id, event_id,
           ROW_NUMBER() OVER w AS rn,
           epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us,
           NTILE(4) OVER w AS quartile
    FROM events WHERE user_id < 50
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, rn
"""

DQ_ORACLES["dq39_running_total"] = """
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,10)))
                      OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                      2) AS DOUBLE) AS running_spend
    FROM orders
    WHERE o_custkey < 200
    ORDER BY o_custkey, o_orderkey
"""

# dq38 runs the SAME SQL text in both engines (relational.SQL_API_QUERY)
from .relational import SQL_API_QUERY as _SQL_API_QUERY  # noqa: E402

DQ_ORACLES["dq38_sql_api"] = _SQL_API_QUERY

# HLL sketch values differ across engines; the driver-checkable
# contract is the error-band predicate (relational.ext_approx_distinct
# emits apx_ok = approx within ±10% of exact; the oracle asserts the
# band as a literal TRUE over the same exact counts)
DQ_ORACLES["ext_approx_distinct"] = """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_part,
           COUNT(*) AS cnt,
           TRUE AS apx_ok
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""

# sketch values differ across engines: band-predicate contract, like
# ext_approx_distinct (exact anchors + literal-TRUE bands)
DQ_ORACLES["ext_approx_percentiles"] = """
    SELECT event_type, COUNT(*) AS cnt,
           ROUND(quantile_cont(value, 0.5), 5) AS exact_p50,
           TRUE AS p50_ok,
           TRUE AS p95_ok
    FROM events GROUP BY event_type ORDER BY event_type
"""

# funnel: greedy first-match == min-(ts,event_id)-after join chain
# RETIRED in r8 (queries/retired.py): standalone constant, see above.
RETIRED_FUNNEL_SQL = """
    WITH v AS (
      SELECT user_id, ts AS t, event_id AS eid FROM (
        SELECT user_id, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'view'
      ) WHERE rn = 1
    ),
    c AS (
      SELECT user_id, t, eid, vt FROM (
        SELECT e.user_id, e.ts AS t, e.event_id AS eid, v.t AS vt,
               ROW_NUMBER() OVER (PARTITION BY e.user_id
                                  ORDER BY e.ts, e.event_id) AS rn
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND (e.ts, e.event_id) > (v.t, v.eid)
          AND epoch_us(e.ts) - epoch_us(v.t) <= 172800000000
      ) WHERE rn = 1
    ),
    p AS (
      SELECT e.user_id
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND (e.ts, e.event_id) > (c.t, c.eid)
        AND epoch_us(e.ts) - epoch_us(c.vt) <= 172800000000
      GROUP BY e.user_id
    )
    SELECT 1 AS stage_idx, 'view' AS stage,
           (SELECT COUNT(*) FROM v) AS n_users
    UNION ALL
    SELECT 2, 'click', (SELECT COUNT(*) FROM c)
    UNION ALL
    SELECT 3, 'purchase', (SELECT COUNT(*) FROM p)
    ORDER BY stage_idx
"""

# funnel with conversion-time percentiles: the same min-after chain,
# carrying each stage's first-match time; quantile_cont == Spark's
# exact `percentile` (both linear interpolation at p*(n-1))
DQ_ORACLES["ext_funnel_conversion"] = """
    WITH v AS (
      SELECT user_id, t, eid FROM (
        SELECT user_id, ts AS t, event_id AS eid,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'view'
      ) WHERE rn = 1
    ),
    c AS (
      SELECT user_id, t, eid, vt FROM (
        SELECT e.user_id, e.ts AS t, e.event_id AS eid, v.t AS vt,
               ROW_NUMBER() OVER (PARTITION BY e.user_id
                                  ORDER BY e.ts, e.event_id) AS rn
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND (e.ts, e.event_id) > (v.t, v.eid)
          AND epoch_us(e.ts) - epoch_us(v.t) <= 172800000000
      ) WHERE rn = 1
    ),
    p AS (
      SELECT user_id, t, vt FROM (
        SELECT e.user_id, e.ts AS t, c.vt AS vt,
               ROW_NUMBER() OVER (PARTITION BY e.user_id
                                  ORDER BY e.ts, e.event_id) AS rn
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND (e.ts, e.event_id) > (c.t, c.eid)
          AND epoch_us(e.ts) - epoch_us(c.vt) <= 172800000000
      ) WHERE rn = 1
    )
    SELECT 1 AS stage_idx, 'view' AS stage, COUNT(*) AS n_users,
           CAST(0.0 AS DOUBLE) AS p50_s, CAST(0.0 AS DOUBLE) AS p90_s
    FROM v
    UNION ALL
    SELECT 2, 'click', COUNT(*),
           FLOOR(quantile_cont(CAST(epoch_us(t) - epoch_us(vt) AS DOUBLE),
                               0.5) / 10.0 + 0.5) / 100000.0,
           FLOOR(quantile_cont(CAST(epoch_us(t) - epoch_us(vt) AS DOUBLE),
                               0.9) / 10.0 + 0.5) / 100000.0
    FROM c
    UNION ALL
    SELECT 3, 'purchase', COUNT(*),
           FLOOR(quantile_cont(CAST(epoch_us(t) - epoch_us(vt) AS DOUBLE),
                               0.5) / 10.0 + 0.5) / 100000.0,
           FLOOR(quantile_cont(CAST(epoch_us(t) - epoch_us(vt) AS DOUBLE),
                               0.9) / 10.0 + 0.5) / 100000.0
    FROM p
    ORDER BY stage_idx
"""

# cohort retention: first-seen day floored to the epoch-anchored
# 7-day period boundary, distinct-active cells, half-up retention in
# the 1e-5 integer domain (ROUND ties diverge)
DQ_ORACLES["ext_cohort_retention"] = """
    WITH fd AS (
      SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS d0
      FROM events GROUP BY user_id
    ),
    first AS (
      SELECT user_id,
             d0 - CAST(date_diff('day', DATE '1970-01-01', d0) % 7
                       AS INTEGER) AS c0
      FROM fd
    ),
    active AS (
      SELECT DISTINCT f.c0,
             CAST(FLOOR(date_diff('day', f.c0,
                  CAST(date_trunc('day', e.ts) AS DATE)) / 7) AS BIGINT)
               AS period_idx,
             e.user_id
      FROM events e JOIN first f ON f.user_id = e.user_id
    ),
    cells AS (
      SELECT c0, period_idx, COUNT(*) AS n_active
      FROM active GROUP BY c0, period_idx
    ),
    sizes AS (SELECT c0, COUNT(*) AS sz FROM first GROUP BY c0)
    SELECT strftime(cells.c0, '%Y-%m-%d') AS cohort, period_idx,
           n_active,
           FLOOR(n_active * 100000.0 / sz + 0.5) / 100000.0 AS retention
    FROM cells JOIN sizes ON cells.c0 = sizes.c0
    ORDER BY cohort, period_idx
"""

# DAU/WAU: distinct user-days expanded k-fold (each active day
# contributes to the next k trailing windows), one distinct + count
DQ_ORACLES["ext_active_users"] = """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ),
    dau AS (SELECT d, COUNT(*) AS dau FROM ud GROUP BY d),
    contrib AS (
      SELECT DISTINCT user_id, d + CAST(r.u AS INTEGER) AS d
      FROM ud CROSS JOIN range(7) AS r(u)
    ),
    wau AS (SELECT d, COUNT(*) AS wau FROM contrib GROUP BY d)
    SELECT strftime(dau.d, '%Y-%m-%d') AS day, dau.dau AS dau, wau.wau AS wau
    FROM dau JOIN wau ON dau.d = wau.d
    ORDER BY day
"""

# dq41 runs the SAME recursive-CTE text in both engines
from .relational import RECURSIVE_SQL_QUERY as _RECURSIVE_SQL_QUERY  # noqa: E402

DQ_ORACLES["dq41_recursive_sql"] = _RECURSIVE_SQL_QUERY

DQ_ORACLES["dq43_rolling_range"] = """
    SELECT event_id, event_type,
           COUNT(*) OVER w AS n_1h,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(28,10))) OVER w, 5)
                AS DOUBLE) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ORDER BY event_type, event_id
"""

DQ_ORACLES["dq44_merge_upsert"] = """
    WITH changes AS (
      -- +10% in integer cents with explicit half-up: ROUND(double*1.1)
      -- is engine-divergent on .005 ties (see dq44 docstring)
      SELECT o_orderkey,
             CAST((CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) * 11 + 5)
                  // 10 AS DOUBLE) / 100 AS c_price,
             'U' AS c_status
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, ROUND(o_totalprice, 2), 'I'
      FROM orders WHERE o_orderkey % 11 = 3
    ),
    base AS (
      SELECT o_orderkey, ROUND(o_totalprice, 2) AS b_price,
             o_orderstatus AS b_status
      FROM orders
    )
    SELECT COALESCE(base.o_orderkey, changes.o_orderkey) AS o_orderkey,
           COALESCE(c_price, b_price) AS o_totalprice,
           COALESCE(c_status, b_status) AS o_orderstatus,
           CASE WHEN b_price IS NULL THEN 'inserted'
                WHEN c_price IS NULL THEN 'unchanged'
                ELSE 'updated' END AS merge_action
    FROM base FULL JOIN changes ON base.o_orderkey = changes.o_orderkey
    ORDER BY o_orderkey
"""


def _profile_oracle() -> str:
    from .relational import PROFILE_COLS

    parts = [
        f"""
        SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null,
               COUNT(DISTINCT {c}) AS n_distinct,
               ROUND(MIN({c}), 5) AS min_val,
               ROUND(MAX({c}), 5) AS max_val
        FROM lineitem
        """
        for c in PROFILE_COLS
    ]
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


DQ_ORACLES["ext_profile_columns"] = _profile_oracle()

# analytics composition: sessionize (gaps-and-islands) -> per-user
# funnel stage via the v/c/p first-match chain -> epoch-aligned weekly
# cohort; the fold's prefix semantics == stage membership chain
DQ_ORACLES["ext_pipeline_analytics"] = """
    WITH g AS (
      SELECT user_id, ts, event_id, event_type,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS gap
      FROM events
    ),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(CASE WHEN gap IS NULL OR gap > 1800000000
                      THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS session_id
      FROM g
    ),
    nu AS (
      SELECT user_id, MAX(session_id) AS n_sessions,
             MIN(CAST(date_trunc('day', ts) AS DATE)) AS d0
      FROM s GROUP BY user_id
    ),
    v AS (
      SELECT user_id, t, eid FROM (
        SELECT user_id, ts AS t, event_id AS eid,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'view'
      ) WHERE rn = 1
    ),
    c AS (
      SELECT user_id, t, eid, vt FROM (
        SELECT e.user_id, e.ts AS t, e.event_id AS eid, v.t AS vt,
               ROW_NUMBER() OVER (PARTITION BY e.user_id
                                  ORDER BY e.ts, e.event_id) AS rn
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND (e.ts, e.event_id) > (v.t, v.eid)
          AND epoch_us(e.ts) - epoch_us(v.t) <= 172800000000
      ) WHERE rn = 1
    ),
    p AS (
      SELECT e.user_id
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND (e.ts, e.event_id) > (c.t, c.eid)
        AND epoch_us(e.ts) - epoch_us(c.vt) <= 172800000000
      GROUP BY e.user_id
    ),
    staged AS (
      SELECT nu.user_id,
             strftime(nu.d0 - CAST(date_diff('day', DATE '1970-01-01',
                                             nu.d0) % 7 AS INTEGER),
                      '%Y-%m-%d') AS cohort,
             CAST(CASE WHEN nu.user_id IN (SELECT user_id FROM p) THEN 3
                       WHEN nu.user_id IN (SELECT user_id FROM c) THEN 2
                       WHEN nu.user_id IN (SELECT user_id FROM v) THEN 1
                       ELSE 0 END AS BIGINT) AS stage_reached,
             CAST(LEAST(FLOOR(nu.n_sessions / 10), 20) AS BIGINT) AS sess_bucket
      FROM nu
    )
    SELECT cohort, stage_reached, sess_bucket, COUNT(*) AS n_users
    FROM staged GROUP BY cohort, stage_reached, sess_bucket
    ORDER BY cohort, stage_reached, sess_bucket
"""

# WAU sketch tier: exact anchors + literal-TRUE bands (sketch values
# are engine-specific), same contract as ext_approx_distinct
DQ_ORACLES["ext_active_users_approx"] = """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ),
    dau AS (SELECT d, COUNT(*) AS dau FROM ud GROUP BY d),
    contrib AS (
      SELECT DISTINCT user_id, d + CAST(r.u AS INTEGER) AS d
      FROM ud CROSS JOIN range(7) AS r(u)
    ),
    wau AS (SELECT d, COUNT(*) AS wau FROM contrib GROUP BY d)
    SELECT strftime(dau.d, '%Y-%m-%d') AS day, dau.dau AS dau, wau.wau AS wau,
           TRUE AS dau_ok, TRUE AS wau_ok
    FROM dau JOIN wau ON dau.d = wau.d
    ORDER BY day
"""

DQ_ORACLES["dq45_rank_funcs"] = """
    WITH o AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
      WHERE o_orderdate >= DATE '1995-01-01'
        AND o_orderdate < DATE '1995-02-01'
    )
    SELECT o_orderkey, o_orderpriority, cents,
           CAST(FLOOR(percent_rank() OVER w * 1000000 + 0.5) AS BIGINT)
             AS pr_ppm,
           CAST(FLOOR(cume_dist() OVER w * 1000000 + 0.5) AS BIGINT)
             AS cd_ppm,
           ntile(4) OVER w AS quartile,
           nth_value(cents, 3) OVER wf AS third_cents,
           first_value(cents) OVER wf AS min_cents,
           last_value(cents) OVER wf AS max_cents
    FROM o
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY cents, o_orderkey),
           wf AS (PARTITION BY o_orderpriority ORDER BY cents, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING
                           AND UNBOUNDED FOLLOWING)
    ORDER BY o_orderpriority, cents, o_orderkey
"""

# r8 retirement (queries/retired.py has the full rationale): the two
# duplicate-capability rows moved from the driver gate to the pytest
# tier. Their oracle SQL stays verbatim as the standalone constants
# above — DQ_ORACLES is a pure declaration that never contained them,
# so appending entries anywhere in this file cannot interact with the
# retirement (the r9 ADVICE fix; tests/test_retired.py keeps replaying
# them and test_retired_rows_are_not_registered guards the invariant).
RETIRED_DQ_ORACLES: dict[str, str] = {
    "ext_funnel": RETIRED_FUNNEL_SQL,
    "dq21_right_outer": RETIRED_RIGHT_OUTER_SQL,
}

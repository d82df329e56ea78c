"""Round-9 staged driver registrations.

The r8 promotion window is FULL: staged_r8's 26 queries + the 23
_DUE_FIRST_R8 rows take 49 of the 50 driver slots (see the rotation
comment in ``queries/__init__``), so operators added after that point
stage HERE for the round-9 window — same contract as staged_r7/r8: a
deterministic ``(spark, sf_dir) -> DataFrame`` wrapper plus the exact
DuckDB oracle, replayed at both test scale factors by
``tests/test_staged_r9.py`` and plan-swept for unbounded joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine import load_table

_DAILY_CENTS = """
    daily AS (
      SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    )
"""


def ext_ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point per order priority (operators/timeseries.
    cusum_changepoint): the day where the cumulative deviation of
    daily revenue from its mean peaks, in the division-free integer
    formulation S_i = n*P_i - i*T — strength is the peak as a ppm
    fraction of n*total, exact in decimal(38,0) / HUGEINT."""
    from ..operators.timeseries import cusum_changepoint

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        "o_orderpriority", F.to_date("o_orderdate").alias("day")
    ).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("bigint")
        ).alias("cents")
    )
    return cusum_changepoint(
        daily, ["o_orderpriority"], "day", "cents"
    )


_TS_CHANGEPOINT_SQL = f"""
    WITH {_DAILY_CENTS},
    st AS (
      SELECT o_orderpriority, day,
             CAST(ROW_NUMBER() OVER wo AS HUGEINT) AS i,
             CAST(SUM(cents) OVER (
               PARTITION BY o_orderpriority ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS HUGEINT) AS p,
             CAST(COUNT(*) OVER (PARTITION BY o_orderpriority)
                  AS HUGEINT) AS n,
             CAST(SUM(cents) OVER (PARTITION BY o_orderpriority)
                  AS HUGEINT) AS tot
      FROM daily
      WINDOW wo AS (PARTITION BY o_orderpriority ORDER BY day)
    ),
    sc AS (
      SELECT o_orderpriority, day, n, tot,
             abs(n * p - i * tot) AS s
      FROM st WHERE i < n
    ),
    rk AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_orderpriority ORDER BY s DESC, day ASC
      ) AS r
      FROM sc
    )
    SELECT o_orderpriority, day AS cp_at, CAST(n AS BIGINT) AS n_obs,
           CAST(s * 1000000 // (n * tot) AS BIGINT) AS strength_ppm
    FROM rk WHERE r = 1 ORDER BY o_orderpriority
"""


_DRIFT_SPLIT = "1996-01-01"
_DRIFT_BIN_CENTS = 5_000_000  # $50k-wide total-price bins


def ext_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square distribution drift (operators/expectations.
    distribution_drift) of the order total-price histogram between
    the pre-1996 reference period and the rest: per-bin homogeneity
    contributions in exact ppm (cross-multiplied — no expected-count
    division), decimal(38,0) / HUGEINT replay."""
    from ..operators.expectations import distribution_drift

    orders = load_table(spark, sf_dir, "orders")
    cents = orders.select(
        F.col("o_orderdate"),
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    ref = cents.where(F.col("o_orderdate") < _DRIFT_SPLIT)
    cur = cents.where(F.col("o_orderdate") >= _DRIFT_SPLIT)
    return distribution_drift(ref, cur, "cents", _DRIFT_BIN_CENTS)


_DISTRIBUTION_DRIFT_SQL = f"""
    WITH cents AS (
      SELECT o_orderdate,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
      FROM orders
    ),
    bref AS (
      SELECT v // {_DRIFT_BIN_CENTS} AS bin, COUNT(*) AS cr
      FROM cents WHERE o_orderdate < TIMESTAMP '{_DRIFT_SPLIT}'
      GROUP BY 1
    ),
    bcur AS (
      SELECT v // {_DRIFT_BIN_CENTS} AS bin, COUNT(*) AS cc
      FROM cents WHERE o_orderdate >= TIMESTAMP '{_DRIFT_SPLIT}'
      GROUP BY 1
    ),
    j AS (
      SELECT COALESCE(bref.bin, bcur.bin) AS bin,
             CAST(COALESCE(cr, 0) AS BIGINT) AS n_ref,
             CAST(COALESCE(cc, 0) AS BIGINT) AS n_cur
      FROM bref FULL OUTER JOIN bcur ON bref.bin = bcur.bin
    ),
    t AS (
      SELECT CAST(SUM(n_ref) AS HUGEINT) AS nr,
             CAST(SUM(n_cur) AS HUGEINT) AS nc
      FROM j
    )
    SELECT j.bin, j.n_ref, j.n_cur,
           CAST((j.n_ref * t.nc - j.n_cur * t.nr)
                * (j.n_ref * t.nc - j.n_cur * t.nr)
                * 1000000
                // (t.nr * t.nc * (j.n_ref + j.n_cur))
                AS BIGINT) AS contrib_ppm
    FROM j, t
    ORDER BY j.bin
"""


STAGED_R9_QUERIES = {
    "ext_ts_changepoint": ext_ts_changepoint,
    "ext_distribution_drift": ext_distribution_drift,
}

STAGED_R9_ORACLES = {
    "ext_ts_changepoint": _TS_CHANGEPOINT_SQL,
    "ext_distribution_drift": _DISTRIBUTION_DRIFT_SQL,
}

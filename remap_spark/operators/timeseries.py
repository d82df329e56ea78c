"""Time-series repair and smoothing operators.

The reference engine has no time-series surface; these extend the
dimension the reference's mapper/reducer pipelines were typically fed
with (append-only event logs, reference ``examples/*`` semantics) into
the standard warehouse time-series toolkit: calendar gap-filling with
forward-fill repair, and trailing exponentially-weighted smoothing.

Scale notes (100 TB):

* ``fill_date_gaps`` — the calendar grid is generated IN-PLAN with
  ``F.sequence`` per group (never a driver-side date loop), so grid
  size is #groups x span-days, independent of event volume. The
  min/max extent aggregate is combiner-style, the grid->daily join is
  keyed on (group, day) — the same key as the daily rollup that feeds
  it, so AQE plans it shuffle-free on the grid side — and the
  forward-fill is one window pass per group ordered by day. No
  corpus-sized relation is ever widened.
* ``ewma_trailing`` — weights are computed ONCE as Python literals and
  baked into the expression tree (no per-row ``pow``), so the whole
  smoother is a fixed-depth lag chain inside one window spec: one
  group-keyed shuffle, whole-stage-codegen arithmetic after it. With
  ``alpha = 0.5`` every weight is an exact binary fraction, making the
  result bit-reproducible across engines (the property the DuckDB
  oracle checks); other alphas stay deterministic because both sides
  evaluate the same double literals in the same association order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fill_date_gaps(
    daily: DataFrame,
    group_cols: Sequence[str],
    date_col: str = "day",
    zero_cols: Sequence[str] = (),
    carry_cols: Sequence[str] = (),
) -> DataFrame:
    """Densify a per-group daily relation onto its full calendar span.

    ``daily`` holds at most one row per (group, day). Every missing
    day inside [min(day), max(day)] of its group gains a row with
    ``is_gap = 1``; ``zero_cols`` are filled with 0 (count semantics),
    ``carry_cols`` forward-fill the last observed value (gauge
    semantics). Returns the densified relation with the same columns
    plus ``is_gap``.
    """
    gcols = list(group_cols)
    extent = daily.groupBy(*gcols).agg(
        F.min(date_col).alias("_d0"), F.max(date_col).alias("_d1")
    )
    grid = extent.select(
        *gcols,
        F.explode(
            F.sequence("_d0", "_d1", F.expr("interval 1 day"))
        ).alias(date_col),
    )
    marked = daily.withColumn("_present", F.lit(1))
    joined = grid.join(marked, gcols + [date_col], "left")
    out = joined.withColumn(
        "is_gap", F.when(F.col("_present").isNull(), 1).otherwise(0)
    ).drop("_present")
    for c in zero_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    if carry_cols:
        w = (
            Window.partitionBy(*gcols)
            .orderBy(date_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for c in carry_cols:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def ewma_weights(alpha: float, n: int) -> list[float]:
    """Trailing-window EWMA weights w_j = (1-alpha)^j, j = 0..n-1,
    computed by repeated multiplication so alpha = 0.5 yields exact
    binary fractions."""
    ws, w = [], 1.0
    for _ in range(n):
        ws.append(w)
        w *= 1.0 - alpha
    return ws


def ewma_trailing(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    n: int = 8,
    out_col: str = "ewma",
) -> DataFrame:
    """Trailing-window EWMA: for each row, the weighted mean of the
    last ``n`` observations (current row included) with weights
    (1-alpha)^j, j = distance in rows — normalized over the weights
    actually present, so the first rows of each group use a shorter
    effective window instead of biasing toward zero.

    The window must be presorted-unique on ``order_col`` within each
    group (one observation per tick, the shape ``fill_date_gaps``
    produces)."""
    ws = ewma_weights(alpha, n)
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    # build num = sum w_j * lag_j, den = sum w_j over PRESENT lags, as
    # one fixed left-associated expression chain so the oracle can
    # mirror the exact evaluation order
    terms_n, terms_d = [], []
    for j, wj in enumerate(ws):
        lj = F.lag(F.col(value_col), j).over(w) if j else F.col(value_col)
        terms_n.append(F.coalesce(lj * F.lit(wj), F.lit(0.0)))
        terms_d.append(
            F.when(lj.isNotNull(), F.lit(wj)).otherwise(F.lit(0.0))
        )
    num = terms_n[0]
    den = terms_d[0]
    for tn, td in zip(terms_n[1:], terms_d[1:]):
        num = num + tn
        den = den + td
    return df.withColumn(out_col, num / den)

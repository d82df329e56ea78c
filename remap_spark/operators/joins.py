"""Join strategies Spark's planner lacks natively.

``interval_join_binned`` — a PURE range join (point-in-interval with NO
equality key) planned as an equi-join. Spark executes a join whose only
predicates are inequalities as BroadcastNestedLoopJoin (or a cartesian
product), which is O(|points| x |intervals|) work and a broadcast-sized
interval side; the standard fix (Databricks' binned range join, Flink's
interval join) buckets the domain:

- every point lands in exactly ONE bin: floor(p / w);
- every interval explodes to the bins it overlaps:
  sequence(floor(s/w), floor(e/w));
- bin equality drives an ordinary shuffled hash join, and the original
  BETWEEN refines the candidates.

Each matching (point, interval) pair meets in exactly one bin (the
point's), so no dedup pass is needed. Shuffle volume: points once,
intervals x (len/w + 1) — pick ``bin_width`` near the typical interval
length so the interval blow-up is ~2x. Worst-case skew is a bin
containing many long intervals; at 100 TB split pathological bins by
salting the point side (operators/skew.py composes here unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
) -> DataFrame:
    """Inner-join ``points`` to every interval containing them
    (start <= p <= end, integer domain — e.g. epoch_us) via bin
    bucketing. Returns all columns of both inputs (caller keeps the
    names disjoint). Plans as Exchange + shuffled hash/sort-merge join
    — never a nested-loop (asserted in tests/test_plans.py)."""
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1, got {bin_width}")
    p = points.withColumn(
        "_bin", F.floor(F.col(point_col) / F.lit(bin_width))
    )
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bin_width)),
                F.floor(F.col(end_col) / F.lit(bin_width)),
            )
        ),
    )
    return (
        p.join(iv, "_bin")
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_bin")
    )

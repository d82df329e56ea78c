"""Declarative data-quality expectations — a Deequ-style contract
checker as ONE aggregate pass (the warehouse "assert before you
publish" step a 100 TB pipeline runs between every stage and its
sink).

Each expectation is a named boolean row predicate; the report is one
row per rule with rows_checked / violations / pass. All rules fold
into a SINGLE combiner-style aggregate over one scan (conditional
count-if columns — the same shape as ext_profile_columns), so adding
rules costs expression width, never extra passes or shuffles. The
relation-level helpers (uniqueness, completeness) are expressed as
aggregates too and union into the same report schema.

Severity is metadata: the caller decides whether 'error' rows abort
the pipeline (``assert_expectations``) while 'warn' rows only report.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """A named row-level contract: ``condition`` must hold on every
    row (violations = rows where it is false or null)."""

    name: str
    condition: Column
    severity: str = "error"  # 'error' | 'warn'


def expect_report(
    df: DataFrame, expectations: Sequence[Expectation]
) -> DataFrame:
    """One-pass report: (rule, severity, rows_checked, violations,
    pass) per expectation, ordered by rule name."""
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for i, e in enumerate(expectations):
        # null condition = violation: a contract that cannot be
        # evaluated on a row is not satisfied by it
        aggs.append(
            F.sum(
                F.when(F.coalesce(e.condition, F.lit(False)), 0).otherwise(1)
            ).alias(f"_v{i}")
        )
    row = df.agg(*aggs)
    # ONE aggregate row exploded into per-rule rows via a literal
    # struct array — a per-rule select + union would re-plan (and
    # re-SCAN) the aggregate subtree once per rule
    structs = [
        F.struct(
            F.lit(e.name).alias("rule"),
            F.lit(e.severity).alias("severity"),
            F.col(f"_v{i}").cast("bigint").alias("violations"),
        )
        for i, e in enumerate(expectations)
    ]
    return (
        row.select(
            F.col("_rows").cast("bigint").alias("rows_checked"),
            F.explode(F.array(*structs)).alias("_r"),
        )
        .select(
            F.col("_r.rule").alias("rule"),
            F.col("_r.severity").alias("severity"),
            "rows_checked",
            F.col("_r.violations").alias("violations"),
            (F.col("_r.violations") == 0).alias("pass"),
        )
        .orderBy("rule")
    )


def expect_unique(
    df: DataFrame, cols: Sequence[str], severity: str = "error"
) -> DataFrame:
    """Relation-level uniqueness: one report row counting rows that
    share their key with another row (total rows in over-populated
    key groups minus the one legitimate holder of each)."""
    dup = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > 1)
        .agg(
            F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias("_viol")
        )
    )
    total = df.agg(F.count(F.lit(1)).alias("_rows"))
    return dup.crossJoin(total).select(
        F.lit("unique(" + ",".join(cols) + ")").alias("rule"),
        F.lit(severity).alias("severity"),
        F.col("_rows").cast("bigint").alias("rows_checked"),
        F.col("_viol").cast("bigint").alias("violations"),
        (F.col("_viol") == 0).alias("pass"),
    )


def assert_expectations(report: DataFrame) -> None:
    """Fail fast on any violated 'error'-severity rule. The report is
    rule-count-sized (collect is bounded by the number of declared
    rules, never data)."""
    bad = [
        r.rule
        for r in report.where(
            (~F.col("pass")) & (F.col("severity") == "error")
        ).collect()
    ]
    if bad:
        raise AssertionError(f"data-quality expectations failed: {bad}")

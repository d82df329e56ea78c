"""Physical-plan inspection utilities (SURVEY.md §4: the reference has
no optimizer; our plan QUALITY is Catalyst's, and this module is how we
check Catalyst produced the plan we want at scale).

Used by tests/test_plans.py to lock in the properties that matter at
100 TB:
- filters reach the parquet scan (PushedFilters),
- scans read only needed columns (ReadSchema),
- small dims broadcast instead of shuffling,
- aggregations have a map-side partial pass,
- joins with range predicates don't degrade to cartesian products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """df.explain(...) as a string instead of stdout."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def plan_report(df: DataFrame) -> dict[str, object]:
    """Structured summary of scale-relevant plan properties."""
    plan = explain_str(df, "formatted")
    simple = explain_str(df, "simple")
    return {
        "has_pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        "cartesian": ("CartesianProduct" in plan)
        or ("BroadcastNestedLoopJoin" in plan),
        "partial_aggs": ("partial_" in simple) or ("partial_" in plan),
        "exchanges": simple.count("Exchange"),
        # codegen explain opens with "Found N WholeStageCodegen subtrees"
        "wholestage_codegen": not explain_str(df, "codegen").lstrip().startswith(
            "Found 0 "
        ),
        "plan": plan,
    }

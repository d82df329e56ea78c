"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (ext_pipeline_curate) on sf0.001.
queries()      — every implemented query from SURVEY.md §2.13 + extensions.
oracle_sql()   — matching DuckDB SQL for the correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from remap_spark.queries import (  # noqa: E402
    ALL_ORACLES,
    ALL_QUERIES,
    EXTENSION_IMPORT_ERRORS,
)

# A broken extension import must fail the driver contract LOUDLY, not
# silently shrink queries() (and the 50-slot check window) by that
# module's rows — the registry keeps the core DQ set alive for
# interactive use, but a driver run against a partial registry would
# record misleading green coverage.
if EXTENSION_IMPORT_ERRORS:
    raise ImportError(
        f"extension modules failed to import: {EXTENSION_IMPORT_ERRORS}"
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the end-to-end curation pipeline — quality gate + PII
    census + embedding LSH bucket + deterministic split in one plan
    (queries/extensions.ext_pipeline_curate); the shape of a real
    pre-training intake job."""
    return ALL_QUERIES["ext_pipeline_curate"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(ALL_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ALL_ORACLES)

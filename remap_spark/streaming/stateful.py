"""Custom stateful streaming operators via applyInPandasWithState —
the streaming analog of the reference's long-lived per-vertex worker
state (/root/reference/daemons/core/module_vertex.py:76-96: each
worker holds vertex state across supersteps; here the state store
holds per-key state across micro-batches, with fault tolerance and
watermark-driven eviction the reference never had).

Scale notes: state lives in the executor state store (RocksDB-backed
in production configs), partitioned by the grouping key — the same
shuffle co-location as any groupBy. Always set a timeout so abandoned
keys age out; unbounded key cardinality with no timeout is the classic
state-store OOM at 100 TB/day.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

USER_STATS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("events_total", LongType()),
        StructField("batches_seen", IntegerType()),
        StructField("value_sum", LongType()),
    ]
)

_USER_STATS_STATE = StructType(
    [
        StructField("events_total", LongType()),
        StructField("batches_seen", IntegerType()),
        StructField("value_sum_micros", LongType()),
    ]
)


def running_user_stats(
    events: DataFrame, timeout_ms: int | None = None
) -> DataFrame:
    """Per-user running totals maintained across micro-batches.

    Emits one updated row per user per micro-batch in which the user
    appears. value is accumulated in integer micros so state updates
    are exact and order-independent."""

    def update(
        key: tuple, pdfs: Iterator, state: GroupState
    ) -> Iterator:
        import pandas as pd

        total, batches, vsum = (
            state.get if state.exists else (0, 0, 0)
        )
        n, v = 0, 0
        for pdf in pdfs:
            n += len(pdf)
            v += int(round(pdf["value"].sum() * 1_000_000))
        total += n
        batches += 1
        vsum += v
        state.update((total, batches, vsum))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "events_total": [total],
                "batches_seen": [batches],
                "value_sum": [vsum],
            }
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=USER_STATS_OUTPUT,
        stateStructType=_USER_STATS_STATE,
        outputMode="update",
        timeoutConf=timeout,
    )

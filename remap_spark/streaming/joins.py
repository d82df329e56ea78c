"""Streaming joins (SURVEY §2.10 — ABSENT in the batch-only reference;
exposed because the engine's surface is Spark-native).

Two shapes matter for a 100 TB/day pipeline:

- stream ⋈ static ("enrichment"): each micro-batch joins against a
  dimension table. With a small dim (region/nation class) the join is
  broadcast — zero shuffle of the stream; the dim is re-read per batch
  so slowly-changing dims pick up updates.
- stream ⋈ stream: both sides buffer in the state store. UNBOUNDED
  without watermarks — both sides MUST carry one, and the join
  condition must include a time bound so Spark can evict state; these
  helpers make the bound impossible to omit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Enrich a stream with a static dimension table. ``broadcast_dim``
    pins the zero-shuffle plan for constant-size dims; leave False for
    dims that grow with data volume (they shuffle, AQE plans at
    runtime)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "1 hour",
    within: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join on an equi-key plus an event-time interval:
    right rows within [left_ts, left_ts + within]. The watermark on
    BOTH sides plus the two-sided time bound lets the state store evict
    rows once the watermark passes — state stays O(watermark-window of
    data), not O(stream history).

    Batch twin: the identical join condition on two batch DataFrames
    (tests compare the two row sets)."""
    from .windows import restore_ntz, watermarked

    l, l_ntz = watermarked(left, left_ts, watermark)
    r, r_ntz = watermarked(right, right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    out = l.join(r, cond, how)
    out = restore_ntz(out, [left_ts], l_ntz)
    return restore_ntz(out, [right_ts], r_ntz)

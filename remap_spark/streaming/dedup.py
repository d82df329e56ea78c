"""Streaming deduplication (SURVEY §2.10 extension; no batch-only
reference analog — the streaming twin of operators/dedup.exact_dedup).

One definition serves both modes:
- batch: plain ``dropDuplicates(keys)`` — one hash shuffle on the key,
  identical semantics to exact_dedup's keep-one-per-key;
- streaming: ``dropDuplicatesWithinWatermark(keys)`` — the state store
  holds one entry per key only until the watermark passes it, so state
  is bounded by (ingest rate x watermark delay), not by stream
  lifetime. Plain streaming dropDuplicates would grow state forever at
  100 TB/day; the watermark variant is the only shape that survives.

The trade encoded by ``delay``: a duplicate arriving later than the
watermark delay after its first occurrence is re-emitted (its state was
evicted). Size the delay to the real out-of-orderness bound; the
key SET emitted still equals the batch distinct key set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .windows import restore_ntz, watermarked


def dedup_events(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "30 days",
) -> DataFrame:
    """Keep the first event per key combination. ``df`` may be a batch
    or streaming DataFrame; semantics match ext_dedup_exact (one
    survivor per key)."""
    if df.isStreaming:
        src, was_ntz = watermarked(df, ts_col, delay)
        return restore_ntz(
            src.dropDuplicatesWithinWatermark(keys), [ts_col], was_ntz
        )
    return df.dropDuplicates(keys)

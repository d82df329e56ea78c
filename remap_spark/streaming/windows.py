"""Structured Streaming operators over the events stream
(SURVEY.md §2.10 — ABSENT in the batch-only reference; first-class
here).

Each transformation is defined ONCE over an unbound DataFrame, so the
identical logic runs in batch (load_table) and streaming (readStream)
— the batch twins are DQ13/DQ14 and their oracle checks; the streaming
tests feed the same fixture rows through a file stream and compare
against the batch result.

Scale notes:
- watermarks bound state: without one, windowed aggregation state
  grows forever at 100 TB/day ingest;
- session windows use F.session_window (native state store impl) —
  the batch gaps-and-islands formulation (dq14) is the oracle twin;
- custom stateful logic goes through applyInPandasWithState with an
  explicit state schema and timeout — the streaming analog of the
  reference's per-vertex state loop (module_vertex.py:106-180).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def watermarked(df: DataFrame, ts_col: str, delay: str) -> tuple[DataFrame, bool]:
    """Watermark a streaming DataFrame on ``ts_col``.

    ``withWatermark`` requires a TIMESTAMP event-time column and rejects
    TIMESTAMP_NTZ (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE); the fixtures
    surface ``ts`` as NTZ. The session time zone is pinned UTC in
    build_session (engine.py), so casting NTZ -> TIMESTAMP is
    value-preserving here; callers cast derived time columns back with
    :func:`restore_ntz` so batch and streaming outputs share one schema.

    Returns ``(df, was_ntz)``; batch DataFrames pass through untouched.
    """
    if not df.isStreaming:
        return df, False
    was_ntz = dict(df.dtypes).get(ts_col) == "timestamp_ntz"
    if was_ntz:
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df.withWatermark(ts_col, delay), was_ntz


def restore_ntz(df: DataFrame, cols: list[str], was_ntz: bool) -> DataFrame:
    """Undo the watermark cast on output time columns (see watermarked)."""
    if not was_ntz:
        return df
    for c in cols:
        df = df.withColumn(c, F.col(c).cast("timestamp_ntz"))
    return df


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts+sums per event_type (streaming DQ13)."""
    src, was_ntz = watermarked(events, ts_col, watermark)
    out = src.groupBy(
        F.window(ts_col, window).alias("win"), "event_type"
    ).agg(
        F.count("*").alias("cnt"),
        F.sum("value").alias("sum_value"),
    ).select(
        F.col("win.start").alias("hour"), "event_type", "cnt", "sum_value"
    )
    return restore_ntz(out, ["hour"], was_ntz)


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    src, was_ntz = watermarked(events, ts_col, watermark)
    out = src.groupBy(
        F.window(ts_col, window, slide).alias("win"), "event_type"
    ).agg(F.count("*").alias("cnt")).select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        "event_type",
        "cnt",
    )
    return restore_ntz(out, ["win_start", "win_end"], was_ntz)


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows per user (streaming DQ14 twin): session =
    events separated by < gap. Returns one row per closed session."""
    src, was_ntz = watermarked(events, ts_col, watermark)
    out = src.groupBy(
        F.session_window(ts_col, gap).alias("sess"), "user_id"
    ).agg(F.count("*").alias("n_events")).select(
        "user_id",
        F.col("sess.start").alias("sess_start"),
        F.col("sess.end").alias("sess_end"),
        "n_events",
    )
    return restore_ntz(out, ["sess_start", "sess_end"], was_ntz)


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, mode: str = "append"
) -> object:
    """Drive a streaming DataFrame into an in-memory sink (tests /
    interactive inspection). Returns the StreamingQuery; caller calls
    processAllAvailable() then reads table ``query_name``."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .start()
    )


def read_events_stream(
    spark, source_dir: str, schema: str | None = None, max_files_per_trigger: int = 10
) -> DataFrame:
    """File-source stream over parquet event files — the fixture-backed
    stand-in for Kafka: new files appearing in source_dir are the
    stream. At production scale swap format('kafka') — everything
    downstream is identical."""
    reader = (
        spark.readStream.format("parquet")
        .option("maxFilesPerTrigger", max_files_per_trigger)
    )
    if schema:
        reader = reader.schema(schema)
    return reader.load(source_dir)

"""Streaming sinks: durable parquet output with exactly-once semantics.

Two tiers:

- ``write_stream_parquet`` — Spark's native file sink. Exactly-once by
  construction: the sink's transaction log (``_spark_metadata``) records
  committed files per micro-batch, and a restart from the checkpoint
  replays only uncommitted batches. The right default for append-only
  streams at any scale.

- ``foreach_batch_overwrite`` — ``foreachBatch`` + dynamic partition
  overwrite keyed by batch id. For sinks the file sink cannot express
  (aggregation output modes, JDBC-ish targets, compaction rewrites).
  Idempotence contract: a replayed batch id overwrites its OWN partition
  directory and nothing else, so at-least-once delivery from the
  checkpoint becomes exactly-once in the table (the standard
  idempotent-foreachBatch recipe from the Structured Streaming guide).

Scale: both sinks write one file per output partition per batch; at
100 TB ingest, size batches via ``maxFilesPerTrigger`` / trigger
interval so each batch's task count matches the cluster, and compact
small files downstream (the compaction job is itself expressible as a
``foreach_batch_overwrite`` rewrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_stream_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> object:
    """Native exactly-once parquet file sink. Returns the
    StreamingQuery. Readers see only files committed in
    ``_spark_metadata`` — a crashed batch never exposes partial data."""
    w = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(mode)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    return w.start()


def foreach_batch_overwrite(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    batch_col: str = "_batch_id",
) -> object:
    """Idempotent foreachBatch sink: each micro-batch lands in its own
    ``_batch_id=<n>`` partition via dynamic partition overwrite, so
    batch replay after failure overwrites rather than duplicates."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.withColumn(batch_col, F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy(batch_col)
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )

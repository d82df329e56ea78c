"""Streaming SCD2 dimension maintenance: continuous Type-2 history
over a change stream, with a persistent parquet dimension store.

foreachBatch + ``operators/scd.scd2_apply_batch`` over a KEY-BUCKET
partitioned store: each micro-batch rebuilds only the buckets its keys
hash into and dynamic-partition-overwrites exactly those — IO is
O(touched buckets), not O(dimension).

Exactly-once rationale (different from streaming/dedup's _batch_id
exclusion protocol, and simpler): ``scd2_apply_batch`` is IDEMPOTENT
for append-only batches — re-applying events already folded into the
history re-observes existing states at their existing timestamps, and
the change-collapse absorbs them without opening versions. So a
replayed micro-batch (even one re-running after LATER batches
committed, and even over a partially written bucket set) converges to
the same store state; no batch-id bookkeeping is required. Pinned by
test_stream_scd2_batches_and_replay.

Preconditions are the batch operator's: per-key append-only event
order across batches, non-negative tiebreak ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _key_bucket(key_col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))


def read_dim(spark, dim_path: str) -> DataFrame:
    """Read the current dimension (all buckets, bucket column dropped)."""
    return spark.read.parquet(dim_path).drop("_kb")


def scd2_apply_stream_batch(
    batch_df: DataFrame,
    dim_path: str,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str,
    n_buckets: int = 64,
) -> None:
    """One micro-batch of the streaming SCD2 protocol (the foreachBatch
    body, exposed for direct replay testing): semi-join the store down
    to the batch's touched key-buckets, run the incremental apply, and
    overwrite exactly those bucket partitions."""
    spark = batch_df.sparkSession
    from ..operators.scd import scd2_apply_batch, scd2_history

    events = batch_df.select(key_col, ts_col, *attr_cols, tiebreak_col)
    # FS-API existence check — a bare try/except around the read would
    # treat ANY failure as "first batch" and silently fork history
    # (same rationale as streaming/dedup.ingest_dedup_batch)
    jvm = spark.sparkContext._jvm  # noqa: SLF001
    jpath = jvm.org.apache.hadoop.fs.Path(dim_path)
    fs = jpath.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
    )
    if fs.exists(jpath) and len(fs.listStatus(jpath)) > 0:
        touched = events.select(
            _key_bucket(key_col, n_buckets).alias("_kb")
        ).distinct()
        dim_touched = (
            spark.read.parquet(dim_path)
            .join(F.broadcast(touched), "_kb", "left_semi")
            .drop("_kb")
        )
        applied = scd2_apply_batch(
            dim_touched, events, key_col, ts_col, attr_cols, tiebreak_col
        )
    else:  # first batch: empty dimension
        applied = scd2_history(
            events, key_col, ts_col, attr_cols, tiebreak_col
        )
    out = applied.withColumn("_kb", _key_bucket(key_col, n_buckets))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out.write.mode("overwrite").partitionBy("_kb").parquet(dim_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def stream_scd2_apply(
    stream_df: DataFrame,
    dim_path: str,
    checkpoint: str,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str,
    n_buckets: int = 64,
) -> object:
    """Continuous SCD2 maintenance: wire the per-batch apply into a
    Structured Streaming sink. Returns the StreamingQuery."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        scd2_apply_stream_batch(
            batch_df, dim_path, key_col, ts_col, attr_cols,
            tiebreak_col, n_buckets,
        )

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .start()
    )

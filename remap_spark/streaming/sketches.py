"""Streaming distinct-count maintenance: continuous per-group KMV
sketch state over an event stream, with a persistent parquet store —
the streaming twin of ``operators/rollup.kmv_state`` and the distinct
member of the streaming mergeable-state family (SCD2 dimensions in
streaming/scd.py, exact rollups via merge_aggregate_state).

foreachBatch + ``merge_kmv_state`` over a GROUP-BUCKET partitioned
store: each micro-batch sketches only its own rows (batch-sized work),
semi-joins the store down to the touched buckets, merges, and
dynamic-partition-overwrites exactly those buckets — IO is O(touched
buckets x k rows), never O(all groups).

Exactly-once rationale (same shape as streaming/scd.py's): the KMV
merge is IDEMPOTENT — state is the k smallest distinct hashes, so
re-merging a replayed batch contributes hashes that are already
present (distinct absorbs them) or already superseded by smaller ones
(the rank cut drops them); a replayed micro-batch converges to the
identical store state even after later batches committed. No batch-id
bookkeeping is required. Pinned by test_stream_kmv_replay_idempotent.

At 100 TB: the per-batch sketch is one combiner-style distinct + a
k-bounded rank (operators/rollup scale notes); the store carries k
rows per group ever seen — a fixed small multiple of the group count,
orders below the event history it summarizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _group_bucket(keys: list[str], n_buckets: int):
    return F.pmod(
        F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)
    )


def read_kmv_store(spark, store_path: str) -> DataFrame:
    """Read the sketch store (all buckets, bucket column dropped)."""
    return spark.read.parquet(store_path).drop("_gb")


def kmv_apply_stream_batch(
    batch_df: DataFrame,
    store_path: str,
    keys: list[str],
    col: str,
    k: int = 64,
    n_buckets: int = 64,
) -> None:
    """One micro-batch of the streaming KMV protocol (the foreachBatch
    body, exposed for direct replay testing)."""
    spark = batch_df.sparkSession
    from ..operators.rollup import kmv_state, merge_kmv_state

    delta = kmv_state(batch_df, keys, col, k=k)
    # FS-API existence check — a bare try/except around the read would
    # treat ANY failure as "first batch" and silently reset the sketch
    # (same rationale as streaming/dedup.ingest_dedup_batch)
    jvm = spark.sparkContext._jvm  # noqa: SLF001
    jpath = jvm.org.apache.hadoop.fs.Path(store_path)
    fs = jpath.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
    )
    if fs.exists(jpath) and len(fs.listStatus(jpath)) > 0:
        touched = delta.select(
            _group_bucket(keys, n_buckets).alias("_gb")
        ).distinct()
        store_touched = (
            spark.read.parquet(store_path)
            .join(F.broadcast(touched), "_gb", "left_semi")
            .drop("_gb")
        )
        merged = merge_kmv_state(store_touched, delta, keys, k=k)
    else:  # first batch: the delta IS the store
        merged = delta
    out = merged.withColumn("_gb", _group_bucket(keys, n_buckets))
    prev = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out.write.mode("overwrite").partitionBy("_gb").parquet(store_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def stream_kmv_distinct(
    stream_df: DataFrame,
    store_path: str,
    checkpoint: str,
    keys: list[str],
    col: str,
    k: int = 64,
    n_buckets: int = 64,
) -> object:
    """Continuous distinct-count sketching: wire the per-batch merge
    into a Structured Streaming sink. Read estimates at any time with
    ``kmv_estimate(read_kmv_store(spark, store_path), keys, k)``.
    Returns the StreamingQuery."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        kmv_apply_stream_batch(
            batch_df, store_path, keys, col, k=k, n_buckets=n_buckets
        )

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .start()
    )

"""Streaming count-min sketch maintenance: a continuously updated
frequency grid on a BATCH-PARTITIONED parquet store — the third member
of the streaming state-store family (KMV distinct in sketches.py,
exact heavy hitters in topk.py, SCD2 in scd.py).

Exactly-once rationale — the topk store's, not the KMV store's: CMS
counters are ADDITIVE (re-merging a replayed grid would double-count),
so each micro-batch dynamic-partition-overwrites exactly its own
``_bid=N`` partition with its batch-local grid. A replayed batch
rewrites an identical partition — byte-idempotent at any replay
distance (grids are pure functions of batch content). The read side
sums grids cell-wise, which by ``merge_cms_state``'s merge == full
property equals sketching the entire history in one pass.

At 100 TB: per-batch work is one combiner aggregate bounded by
depth x width rows (batch content only); the store holds at most
batch-count x depth x width rows regardless of event volume, and
``compact_cms_store`` folds retired batch grids into the ``_bid = -1``
base under the same stop-the-stream precondition as the topk store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.rollup import cms_state

BASE_BID = -1


def cms_apply_stream_batch(
    batch_df: DataFrame,
    store_path: str,
    col: str,
    batch_id: int,
    width: int = 1024,
    depth: int = 4,
) -> None:
    """One micro-batch of the streaming CMS protocol (the foreachBatch
    body, exposed for direct replay testing)."""
    if batch_id < 0:
        raise ValueError("batch_id must be >= 0 (negatives are reserved)")
    spark = batch_df.sparkSession
    grid = cms_state(batch_df, col, width, depth).withColumn(
        "_bid", F.lit(batch_id)
    )
    prev = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        grid.write.mode("overwrite").partitionBy("_bid").parquet(store_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_cms_store(spark, store_path: str) -> DataFrame:
    """The combined grid: cell-wise sum across batch partials —
    row-identical to cms_state over the concatenated history."""
    return (
        spark.read.parquet(store_path)
        .groupBy("d", "w")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def compact_cms_store(
    spark, store_path: str, upto_batch_id: int
) -> None:
    """Fold every partition with ``_bid <= upto_batch_id`` (plus any
    existing base) into ``_bid = -1``. STOP-THE-STREAM maintenance —
    same replay precondition as compact_topk_store."""
    cur = spark.read.parquet(store_path)
    retire = cur.where(F.col("_bid") <= upto_batch_id)
    keep = cur.where(F.col("_bid") > upto_batch_id)
    base = (
        retire.groupBy("d", "w")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        .withColumn("_bid", F.lit(BASE_BID))
    )
    out = base.unionByName(keep).localCheckpoint(eager=True)
    out.write.mode("overwrite").partitionBy("_bid").parquet(store_path)


def stream_cms_counts(
    stream_df: DataFrame,
    store_path: str,
    checkpoint: str,
    col: str,
    width: int = 1024,
    depth: int = 4,
) -> object:
    """Continuous frequency sketching: wire the per-batch grid build
    into foreachBatch with exactly-once semantics from the
    batch-partitioned store."""
    return (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(
            lambda df, bid: cms_apply_stream_batch(
                df, store_path, col, bid, width, depth
            )
        )
        .start()
    )

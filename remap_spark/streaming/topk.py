"""Streaming heavy-hitter maintenance: continuous exact top-k key
counts over an event stream, on a BATCH-PARTITIONED parquet store.

The streaming twin of ``operators/skew.key_skew_report`` and the
counting member of the streaming state-store family (KMV sketches in
streaming/sketches.py, SCD2 in streaming/scd.py).

Exactly-once rationale — DIFFERENT from the KMV store's: additive
counts are NOT idempotent under re-merge (a replayed batch would
double-count), so this store is partitioned BY MICRO-BATCH ID: each
batch dynamic-partition-overwrites exactly its own ``_bid=N``
partition with its per-key partial counts. A replayed batch rewrites
an identical partition — byte-idempotent no matter how often or how
late it replays. The read side sums partials across partitions
(combiner-style: partials are already one row per (batch, key)).

At 100 TB: per-batch work is one combiner groupBy over the batch
(batch-sized, not history-sized); the store holds one row per
(batch, distinct key in that batch) — bounded by batch count x
batch key cardinality, NOT by event volume. When batch count grows,
``compact_topk_store`` folds retired partitions into one base
partition (``_bid = -1``); run it only for batch ids the checkpoint
can never replay (i.e. while the query is stopped, or ids older than
the committed offset log) — compacting a replayable batch would let
its replay re-create the partition beside the base and double-count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BASE_BID = -1


def topk_apply_stream_batch(
    batch_df: DataFrame,
    store_path: str,
    keys: list[str],
    batch_id: int,
) -> None:
    """One micro-batch of the streaming top-k protocol (the
    foreachBatch body, exposed for direct replay testing)."""
    if batch_id < 0:
        raise ValueError("batch_id must be >= 0 (negatives are reserved)")
    spark = batch_df.sparkSession
    partial = (
        batch_df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("_bid", F.lit(batch_id))
    )
    prev = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        partial.write.mode("overwrite").partitionBy("_bid").parquet(
            store_path
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_topk_store(spark, store_path: str, keys: list[str]) -> DataFrame:
    """Total count per key across all batch partials."""
    return (
        spark.read.parquet(store_path)
        .groupBy(*keys)
        .agg(F.sum("n_rows").alias("n_rows"))
    )


def read_topk(
    spark, store_path: str, keys: list[str], topk: int = 20
) -> DataFrame:
    """The current top-k keys (count desc, keys asc — deterministic
    under ties), as (rank, *keys, n_rows)."""
    order = [F.desc("n_rows")] + [F.asc(k) for k in keys]
    key_list = ", ".join(f"`{k}` ASC" for k in keys)
    return (
        read_topk_store(spark, store_path, keys)
        .orderBy(*order)
        .limit(topk)
        .withColumn(
            "rank",
            F.expr(
                f"ROW_NUMBER() OVER (ORDER BY n_rows DESC, {key_list})"
            ),
        )
        .select("rank", *keys, "n_rows")
    )


def compact_topk_store(
    spark, store_path: str, keys: list[str], upto_batch_id: int
) -> None:
    """Fold every partition with ``_bid <= upto_batch_id`` (plus any
    existing base) into the single base partition ``_bid = -1``.
    STOP-THE-STREAM maintenance: only compact ids the checkpoint can
    never replay (see module docstring). Rewrites the whole store
    atomically-per-directory via a static overwrite."""
    cur = spark.read.parquet(store_path)
    retire = cur.where(F.col("_bid") <= upto_batch_id)
    keep = cur.where(F.col("_bid") > upto_batch_id)
    base = (
        retire.groupBy(*keys)
        .agg(F.sum("n_rows").alias("n_rows"))
        .withColumn("_bid", F.lit(BASE_BID))
    )
    out = base.unionByName(keep).localCheckpoint(eager=True)
    out.write.mode("overwrite").partitionBy("_bid").parquet(store_path)


def stream_topk_keys(
    stream_df: DataFrame,
    store_path: str,
    checkpoint: str,
    keys: list[str],
) -> object:
    """Continuous heavy-hitter counting: wire the per-batch partial
    write into a Structured Streaming sink. Read the current top-k at
    any time with ``read_topk(spark, store_path, keys, k)``. Returns
    the StreamingQuery."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        topk_apply_stream_batch(batch_df, store_path, keys, batch_id)

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .start()
    )

"""Sequence packing for LLM pretraining pipelines (extension — the
batch-only reference has no analog; this is a first-class
training-data operator alongside dedup/split/text analysis).

Concat-then-chunk packing: documents are laid end-to-end in a
deterministic order (per shard) and the resulting token stream is cut
every ``seq_len`` tokens — the standard pretraining layout (documents
may span sequence boundaries; each sequence is exactly ``seq_len``
tokens except the shard's last). The assignment of every document to
its sequence range is pure integer window arithmetic:

    end_off   = prefix sum of tokens                 -- exclusive
    start_off = end_off - tokens                     -- inclusive
    first_seq = start_off div seq_len
    last_seq  = (end_off - 1) div seq_len

Scale (100 TB): one window shuffle partitioned by shard — shards are
the unit of parallelism exactly as in production packing jobs, so no
global ordering is ever required. Everything is exact integer
arithmetic (``div``, no float division), so the layout is reproducible
across engines, partitionings, and retries. Greedy no-split bin
packing by contrast is inherently sequential per shard (each placement
depends on the previous remainder) and is NOT implemented;
concat-then-chunk is both the simpler and the more standard layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def concat_chunk_pack(
    df: DataFrame,
    tokens_col: str,
    order_col: str,
    seq_len: int,
    shard_col: str | None = None,
) -> DataFrame:
    """Assign each document its [start_off, end_off) token span and
    [first_seq, last_seq] sequence range within its shard's packed
    token stream. Zero-token documents must be filtered out by the
    caller (they occupy no span). ``order_col`` must be unique within a
    shard — it defines the concatenation order, and a non-deterministic
    order would make the layout irreproducible."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    part = [shard_col] if shard_col is not None else [F.lit(0)]
    w = (
        Window.partitionBy(*part)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn(
            "end_off", F.sum(F.col(tokens_col).cast("bigint")).over(w)
        )
        .withColumn(
            "start_off", F.col("end_off") - F.col(tokens_col).cast("bigint")
        )
        .withColumn("first_seq", F.expr(f"start_off div {seq_len}"))
        .withColumn("last_seq", F.expr(f"(end_off - 1) div {seq_len}"))
    )

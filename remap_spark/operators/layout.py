"""Data-layout optimization: Z-order (Morton) clustering keys and the
min/max data-skipping model they exist to serve.

Why this is a first-class 100 TB operator: a parquet lake is pruned by
per-file (and per-row-group) min/max statistics. A single-column sort
gives tight stats on ONE column only; interleaving the bits of several
bucketized columns into a Z-order key and range-partitioning on it
gives every file a small hyper-rectangle of the key space, so
multi-dimensional box predicates skip most files. The key computation
here is pure Catalyst bit arithmetic (shift/and/or inside whole-stage
codegen — no UDF), ``cluster_by_zorder`` is one repartitionByRange +
in-partition sort, and ``skipping_stats`` is the same min/max relation
a table format's footer metadata holds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of each (already bucketized,
    non-negative integer) column into a Z-order key. Column j's bit i
    lands at key bit ``i*len(cols) + j``, so equal prefixes of the key
    correspond to aligned hyper-rectangles of the input space. Pure
    bit arithmetic -> stays in whole-stage codegen."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cs)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def bucketize(col: Column | str, lo: int, hi: int, bits: int = 8) -> Column:
    """Scale an integer column from [lo, hi] into the [0, 2**bits)
    bucket domain zorder_key expects (integer arithmetic, exact)."""
    c = F.col(col) if isinstance(col, str) else col
    span = hi - lo + 1
    return ((c - lo) * (1 << bits)) // span


def cluster_by_zorder(
    df: DataFrame, cols: list[str], bits: int = 8, num_files: int | None = None
) -> DataFrame:
    """Append ``z_key`` and cluster the frame by it: range partition
    (each output file owns a contiguous key range -> tight min/max on
    every interleaved column) + in-partition sort (row-group-level
    stats inside each file). Write the result with any sink; the
    layout, not the format, is the optimization."""
    out = df.withColumn("z_key", zorder_key(cols, bits))
    n = num_files or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    return out.repartitionByRange(n, "z_key").sortWithinPartitions("z_key")


def skipping_stats(
    df: DataFrame, bucket_col: Column | str, cols: list[str]
) -> DataFrame:
    """Per-bucket min/max/count for the given columns — the exact
    relation a lake format's file-footer statistics hold, and the
    input to any 'how many files must this predicate read' question.
    One combiner-style aggregate."""
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    b = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    return df.groupBy(b.alias("bucket")).agg(*aggs)


def eligible_buckets(
    stats: DataFrame, predicates: dict[str, tuple[int, int]]
) -> DataFrame:
    """Filter the stats relation down to buckets a box predicate
    {col: (lo, hi)} cannot skip (min<=hi AND max>=lo per column) —
    i.e. the files a stats-pruned scan would actually open."""
    cond = F.lit(True)
    for c, (lo, hi) in predicates.items():
        cond = cond & (F.col(f"min_{c}") <= hi) & (F.col(f"max_{c}") >= lo)
    return stats.where(cond)

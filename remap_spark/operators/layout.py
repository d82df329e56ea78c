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


def cluster_by_hilbert(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    num_files: int | None = None,
) -> DataFrame:
    """Hilbert twin of cluster_by_zorder — the recommended default for
    2-D clustered writes (see SCALE.md: under unaligned range splits
    Hilbert's jump-free curve bounds far tighter per-file min/max
    boxes). Appends ``h_key``, range-partitions and sorts on it."""
    out = with_hilbert_key(df, x_col, y_col, bits)
    n = num_files or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    return out.repartitionByRange(n, "h_key").sortWithinPartitions("h_key")


def with_hilbert_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    out_col: str = "h_key",
) -> DataFrame:
    """Append a 2-D Hilbert-curve key for (x, y) in [0, 2**bits)².

    Hilbert ordering dominates Morton for data skipping: the curve has
    no long jumps, so a contiguous key range maps to ONE connected,
    near-square region — file min/max boxes are tighter on average
    than Z-order's (which splits across the curve's discontinuities).
    The classic per-bit fold (quadrant extract + reflect/transpose
    rotation) is unrolled into one projection per bit level — each
    level is plain integer/CASE arithmetic on the previous level's
    columns, so the whole key stays in whole-stage codegen with no
    UDF; ``_hilbert_sql`` emits the identical computation as a chained
    SQL CTE for cross-engine verification."""
    x, y = F.col(x_col).cast("long"), F.col(y_col).cast("long")
    cur = df.withColumn("_hx", x).withColumn("_hy", y).withColumn(
        out_col, F.lit(0).cast("long")
    )
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = F.shiftright(F.col("_hx"), level).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("_hy"), level).bitwiseAND(F.lit(1))
        d = F.col(out_col) + F.lit(s) * F.lit(s) * (
            (F.lit(3) * rx).bitwiseXOR(ry)
        )
        # rotate the sub-quadrant: ry==0 -> (reflect if rx==1) + swap
        refl_x = F.when(rx == 1, F.lit(s - 1) - F.col("_hx")).otherwise(
            F.col("_hx")
        )
        refl_y = F.when(rx == 1, F.lit(s - 1) - F.col("_hy")).otherwise(
            F.col("_hy")
        )
        nx = F.when(ry == 0, refl_y).otherwise(F.col("_hx"))
        ny = F.when(ry == 0, refl_x).otherwise(F.col("_hy"))
        cur = cur.select(
            *[c for c in cur.columns if c not in ("_hx", "_hy", out_col)],
            nx.alias("_hx"),
            ny.alias("_hy"),
            d.alias(out_col),
        )
    return cur.drop("_hx", "_hy")


def hilbert_sql(x_expr: str, y_expr: str, source_sql: str, bits: int = 8) -> str:
    """Emit the with_hilbert_key computation as chained SQL CTEs over
    ``source_sql`` (which must expose columns via x_expr/y_expr plus
    anything else to carry). Returns a query whose final SELECT yields
    the source columns renamed hx/hy at their ORIGINAL values plus
    h_key. Mirrors the Spark fold level-for-level so results are
    integer-identical in any engine."""
    ctes = [
        f"h{bits} AS (SELECT {x_expr} AS ox, {y_expr} AS oy, "
        f"{x_expr} AS hx, {y_expr} AS hy, 0 AS hk FROM {source_sql})"
    ]
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        prev = f"h{level + 1}"
        rx = f"((hx >> {level}) & 1)"
        ry = f"((hy >> {level}) & 1)"
        ctes.append(
            f"h{level} AS (SELECT ox, oy, "
            f"CASE WHEN {ry} = 0 THEN "
            f"  CASE WHEN {rx} = 1 THEN {s - 1} - hy ELSE hy END "
            f"ELSE hx END AS hx, "
            f"CASE WHEN {ry} = 0 THEN "
            f"  CASE WHEN {rx} = 1 THEN {s - 1} - hx ELSE hx END "
            f"ELSE hy END AS hy, "
            f"hk + {s * s} * xor(3 * {rx}, {ry}) AS hk FROM {prev})"
        )
    body = ",\n    ".join(ctes)
    return (
        f"WITH {body}\n"
        f"SELECT ox AS hx, oy AS hy, CAST(hk AS BIGINT) AS h_key FROM h0"
    )


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


def compact_parquet(
    spark,
    path: str,
    sort_cols: list[str] | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Small-file compaction for one parquet directory: rewrite the
    directory's data as ``ceil(current_bytes / target_file_bytes)``
    files, optionally range-clustered on ``sort_cols`` (each output
    file then owns a contiguous, sorted key range — the layout
    ``cluster_by_zorder`` produces, preserved through compaction).

    Small files are the classic lake pathology: a 100 TB table fed by
    streaming micro-batches accretes millions of KB-scale files and
    scan planning starts to dominate query time (footer reads +
    task-per-file scheduling). Compaction is one shuffle-light
    rewrite: a coalesce when shrinking file count without a sort key,
    a repartitionByRange when clustering.

    Commit protocol: write to a staging sibling, then two FS renames
    (old -> trash, staging -> path) and a recursive delete. NOT an
    atomic metadata commit — a table format (Iceberg/Delta) swaps a
    manifest instead; a reader racing the rename window can see a
    missing directory. Run from the table's maintenance window, like
    ``streaming/topk.compact_topk_store``. Returns a report dict
    (files/bytes before and after).
    """
    sc = spark.sparkContext
    jvm = sc._jvm  # noqa: SLF001
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())  # noqa: SLF001

    def _stats(p):
        files = [
            s
            for s in fs.listStatus(p)
            if s.isFile() and not s.getPath().getName().startswith("_")
        ]
        return len(files), sum(s.getLen() for s in files)

    n_before, bytes_before = _stats(jpath)
    n_out = max(1, -(-bytes_before // target_file_bytes))
    df = spark.read.parquet(path)
    if sort_cols:
        out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.coalesce(n_out) if n_out < n_before else df.repartition(n_out)
    staging = jvm.org.apache.hadoop.fs.Path(path + "._compacting")
    trash = jvm.org.apache.hadoop.fs.Path(path + "._compacted_old")
    fs.delete(staging, True)
    fs.delete(trash, True)
    out.write.mode("overwrite").parquet(str(staging))
    if not fs.rename(jpath, trash):
        raise IOError(f"compact_parquet: could not move {path} aside")
    if not fs.rename(staging, jpath):
        # roll back: put the original data back before failing
        fs.rename(trash, jpath)
        raise IOError(f"compact_parquet: could not publish {path}")
    fs.delete(trash, True)
    n_after, bytes_after = _stats(jpath)
    return {
        "files_before": n_before,
        "bytes_before": bytes_before,
        "files_after": n_after,
        "bytes_after": bytes_after,
    }


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> DataFrame:
    """Materialize a relation BUCKETED by its join/aggregation key —
    the co-located-join layout: every subsequent equi-join or groupBy
    on ``key`` between tables bucketed with the SAME bucket count
    reads pre-shuffled data, so the exchange that dominates a 100 TB
    fact-to-fact join (or repeated same-key aggregation) happens ONCE
    at write time and never again (plan-pinned: the zero-Exchange
    join assertion in tests/test_round7.py). ``sort=True`` additionally
    sorts within buckets, letting the sort-merge join skip or shrink
    its per-task sort when files align.

    Bucketing requires a catalog table (``saveAsTable``); ``path``
    makes it external. Returns the re-read table handle, whose scans
    carry the bucket spec (``SelectedBucketsCount`` in explain).

    Thin delegate: ``sources.write_bucketed_table`` is the one
    canonical bucketed-write primitive (r7-advice consolidation —
    two parallel bucketBy/sortBy/saveAsTable code paths drift); this
    single-key convenience form stays for the layout-module API."""
    from ..sources import write_bucketed_table

    return write_bucketed_table(
        df,
        table,
        [key],
        num_buckets=n_buckets,
        sort_cols=[key] if sort else None,
        mode=mode,
        path=path,
    )

"""Incremental aggregate maintenance: merge a new batch into a stored
grouped-aggregate table without touching history — the materialized-
rollup twin of scd.scd2_apply_batch and the batch shape behind every
streaming "update the dashboard table" sink.

Only MERGEABLE aggregate kinds are offered (sum / count / min / max):
state ⊕ agg(batch) == agg(history ∪ batch) holds algebraically, so the
incremental path is provably identical to a full recompute — the
ext_rollup_incremental oracle IS the full-recompute SQL. Derived
measures (avg = sum/count, etc.) belong at read time, never in the
state. Non-mergeable kinds get their own mergeable STATE instead of
being squeezed into this interface: distinct -> HLL (the WAU sketch
tier), percentiles -> the fixed-bin histogram state below
(histogram_state / merge_histogram_state / histogram_percentiles).

Scale shape: agg(batch) is combiner-style and batch-proportional; the
merge is ONE full-outer equi-join on the group keys — state-sized, but
join-only (no sort, no window), and at 100 TB the state relation is
|groups|, orders smaller than the fact history it summarizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KINDS = ("sum", "count", "min", "max")


def histogram_state(
    df: DataFrame,
    keys: list[str],
    col: Column | str,
    lo: int,
    hi: int,
    bins: int = 64,
) -> DataFrame:
    """Mergeable PERCENTILE state: a fixed-bin histogram over the
    integer domain [lo, hi] — per (keys, bin) counts. Counts add, so
    state merges by plain summation (no sketch library): this is the
    percentile column of the incremental-state family (exact
    sum/count/min/max in merge_aggregate_state, distinct via HLL,
    percentiles here). Estimate error is bounded by one bin width;
    the bin arithmetic is integer-exact so two engines produce the
    IDENTICAL histogram (out-of-range values clamp to the edge
    bins)."""
    c = F.col(col) if isinstance(col, str) else col
    span = hi - lo + 1
    bin_ = F.least(
        F.lit(bins - 1),
        F.greatest(
            F.lit(0), F.floor((c - lo) * bins / F.lit(span)).cast("long")
        ),
    )
    return df.groupBy(*keys, bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def merge_histogram_state(
    state: DataFrame, delta: DataFrame, keys: list[str]
) -> DataFrame:
    """Merge two histogram states: union + re-sum per (keys, bin) —
    row-identical to building the state over the combined rows."""
    return (
        state.unionByName(delta)
        .groupBy(*keys, "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )


def histogram_percentiles(
    state: DataFrame,
    keys: list[str],
    lo: int,
    hi: int,
    bins: int,
    ps: dict[str, tuple[int, int]],
) -> DataFrame:
    """Percentile estimates from the histogram state: for each named
    percentile (num, den), the LOWER EDGE of the smallest bin whose
    cumulative count reaches num/den of the group total — integer
    compares only, so the estimate is engine-reproducible bit-for-bit
    (no error band needed in the oracle). One cumulative window over
    the bins relation, which is |keys|x|bins| — tiny."""
    from pyspark.sql.window import Window

    span = hi - lo + 1
    w = Window.partitionBy(*keys).orderBy("bin")
    cum = state.withColumn(
        "_cum", F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("_tot", F.sum("cnt").over(Window.partitionBy(*keys)))
    aggs = [F.sum("cnt").alias("n_rows")]
    for name, (num, den) in ps.items():
        hit_bin = F.min(
            F.when(F.col("_cum") * den >= F.col("_tot") * num, F.col("bin"))
        )
        aggs.append(
            (F.lit(lo) + F.floor(hit_bin * span / F.lit(bins)).cast("long"))
            .alias(name)
        )
    return cum.groupBy(*keys).agg(*aggs)


def aggregate_state(
    df: DataFrame, keys: list[str], specs: dict[str, tuple[str, Column | str]]
) -> DataFrame:
    """Build the aggregate state from raw rows. ``specs`` maps each
    output column to (kind, input column/expression); kind in
    sum|count|min|max ('count' ignores its input and counts rows)."""
    aggs = []
    for out, (kind, col) in specs.items():
        if kind not in _KINDS:
            raise ValueError(f"non-mergeable aggregate kind {kind!r}")
        c = F.col(col) if isinstance(col, str) else col
        fn = F.count(F.lit(1)) if kind == "count" else getattr(F, kind)(c)
        aggs.append(fn.alias(out))
    return df.groupBy(*keys).agg(*aggs)


def merge_aggregate_state(
    state: DataFrame,
    batch: DataFrame,
    keys: list[str],
    specs: dict[str, tuple[str, Column | str]],
) -> DataFrame:
    """Merge ``aggregate_state(batch)`` into an existing state table:
    full-outer join on the group keys, per-column mergeable combine.
    New groups appear, untouched groups pass through, overlapping
    groups combine — row-identical to recomputing over all rows."""
    delta = aggregate_state(batch, keys, specs)
    s = state.select(
        *keys, *[F.col(o).alias(f"_s_{o}") for o in specs]
    )
    d = delta.select(
        *keys, *[F.col(o).alias(f"_d_{o}") for o in specs]
    )
    merged = s.join(d, keys, "full_outer")
    out_cols = [F.col(k) for k in keys]
    for out, (kind, _) in specs.items():
        a, b = F.col(f"_s_{out}"), F.col(f"_d_{out}")
        if kind in ("sum", "count"):
            c = F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))
        elif kind == "min":
            c = F.when(a.isNull(), b).when(b.isNull(), a).otherwise(
                F.least(a, b)
            )
        else:  # max
            c = F.when(a.isNull(), b).when(b.isNull(), a).otherwise(
                F.greatest(a, b)
            )
        out_cols.append(c.alias(out))
    return merged.select(*out_cols)

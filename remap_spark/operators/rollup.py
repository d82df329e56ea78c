"""Incremental aggregate maintenance: merge a new batch into a stored
grouped-aggregate table without touching history — the materialized-
rollup twin of scd.scd2_apply_batch and the batch shape behind every
streaming "update the dashboard table" sink.

Only MERGEABLE aggregate kinds are offered (sum / count / min / max):
state ⊕ agg(batch) == agg(history ∪ batch) holds algebraically, so the
incremental path is provably identical to a full recompute — the
ext_rollup_incremental oracle IS the full-recompute SQL. Derived
measures (avg = sum/count, etc.) belong at read time, never in the
state. Non-mergeable kinds (exact distinct, exact percentile) need
their own state sketches (see the HLL WAU tier) and are deliberately
not squeezed into this interface.

Scale shape: agg(batch) is combiner-style and batch-proportional; the
merge is ONE full-outer equi-join on the group keys — state-sized, but
join-only (no sort, no window), and at 100 TB the state relation is
|groups|, orders smaller than the fact history it summarizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KINDS = ("sum", "count", "min", "max")


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

"""MapReduceJob — the reference's programming model compiled to Spark
(SURVEY.md §2.3, §7.1 step 3).

Reference contract being reproduced:
- ``map(k1, v1)`` is a generator yielding ``(partition, k2, v2)``
  triples — the user explicitly routes each record to a named shuffle
  partition (/root/reference/daemons/core/module_mapper.py:48-52;
  examples/wordcount/wordcount.py:20-37);
- optional ``combiner(list) -> list`` applied per key at spill time
  (remap.py:136-144) — must be algebraic/idempotent (SURVEY §4.3.3);
- optional ``customkey`` secondary sort of values within a key
  (remap.py:133-135, examples/secondarysort/secondarysort.py:8-9);
- ``reduce(k2, [v2, ...])`` is a generator yielding ``(k3, v3)``
  (module_reducer.py:63-80).

Spark-first compilation
-----------------------
map     -> ``mapInPandas`` (Arrow-batched generator; one Python round
           trip for the whole map phase — never a row-at-a-time UDF)
combiner-> applied inside each map batch, per (partition, k2) — the
           same "once per spill, not global" contract as the reference
shuffle -> ``groupBy(k2)`` — Spark's sort/hash machinery replaces the
           sorted-run + k-way-merge pipeline (remap.py:132-147,
           module_reducer.py:38-47) entirely
reduce  -> ``applyInPandas`` over the groups, values optionally sorted
           by ``sort_key`` first (secondary sort)

The *fast path* for algebraic jobs is: don't use this class — write
the DataFrame expression directly (wordcount ==
``groupBy(word).count()``; see queries/relational.py dq03). This class
is the escape hatch for arbitrary Python logic, matching the
reference's only programming model.

Values are JSON-encoded strings by default — the reference's
intermediate format is ``"k2,json(v2)"`` lines (remap.py:138-139,
158-159). Pass typed schemas to skip JSON entirely (the scalable
path: parquet-typed columns end-to-end).

Scale notes (100 TB): the only shuffle is groupBy(k2); Spark applies
AQE coalescing/skew splitting to it. ``partition_by`` routing is a
*semantic* grouping — reducer parallelism does NOT collapse to the
number of named partitions as in the reference (SURVEY §4.3.6);
records with the same k2 still co-locate.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MapFn = Callable[[str, object], Iterable[tuple[str, str, object]]]
ReduceFn = Callable[[str, list], Iterable[tuple[str, object]]]
CombinerFn = Callable[[list], list]


class MapReduceJob:
    """One logical job = the reference's mapper job + reducer job fused
    (the reference requires two REST posts with a manual wait between,
    SURVEY §3.2 — here the shuffle IS the handoff)."""

    def __init__(
        self,
        map: MapFn | None = None,
        reduce: ReduceFn | None = None,
        combiner: CombinerFn | None = None,
        sort_key: Callable[[object], object] | None = None,
        map_output_schema: str = "partition string, k2 string, v2 string",
        reduce_output_schema: str = "k3 string, v3 string",
        json_values: bool = True,
    ):
        self.map_fn = map
        self.reduce_fn = reduce
        self.combiner = combiner
        self.sort_key = sort_key
        self.map_output_schema = map_output_schema
        self.reduce_output_schema = reduce_output_schema
        self.json_values = json_values

    # -- map phase ----------------------------------------------------
    def _mapped(self, df: DataFrame, key_col: str, value_col: str) -> DataFrame:
        map_fn = self.map_fn
        combiner = self.combiner
        json_values = self.json_values

        def run_map(batches: Iterator) -> Iterator:
            import pandas as pd

            for pdf in batches:
                out_part, out_k2, out_v2 = [], [], []
                if combiner is None:
                    for k1, v1 in zip(pdf[key_col], pdf[value_col]):
                        for part, k2, v2 in map_fn(k1, v1):
                            out_part.append(part)
                            out_k2.append(k2)
                            out_v2.append(json.dumps(v2) if json_values else v2)
                else:
                    # spill-time combiner: buffer this batch per key,
                    # combine once, emit — remap.py:119-147 semantics
                    # (hash buffer + combine at sort_flush_close)
                    mem: dict[tuple[str, str], list] = {}
                    for k1, v1 in zip(pdf[key_col], pdf[value_col]):
                        for part, k2, v2 in map_fn(k1, v1):
                            mem.setdefault((part, k2), []).append(v2)
                    for (part, k2), vals in mem.items():
                        for v2 in combiner(vals):
                            out_part.append(part)
                            out_k2.append(k2)
                            out_v2.append(json.dumps(v2) if json_values else v2)
                yield pd.DataFrame(
                    {"partition": out_part, "k2": out_k2, "v2": out_v2}
                )

        return df.mapInPandas(run_map, schema=self.map_output_schema)

    # -- reduce phase -------------------------------------------------
    def _reduced(self, mapped: DataFrame) -> DataFrame:
        reduce_fn = self.reduce_fn
        combiner = self.combiner
        sort_key = self.sort_key
        json_values = self.json_values

        # full pandas type hints: a PARTIAL annotation makes pyspark's
        # grouped-map eval-type inference raise (and warn) on every
        # applyInPandas call; full hints resolve it silently
        def run_reduce(pdf: pd.DataFrame) -> pd.DataFrame:
            k2 = pdf["k2"].iloc[0]
            values = [
                json.loads(v) if json_values else v for v in pdf["v2"]
            ]
            # the reference's merge presents values in sorted-run order;
            # combiner may have been applied per spill — re-apply once
            # for the algebraic contract, then secondary sort
            if combiner is not None:
                values = combiner(values)
            if sort_key is not None:
                values = sorted(values, key=sort_key)
            out_k3, out_v3 = [], []
            for k3, v3 in reduce_fn(k2, values):
                out_k3.append(k3)
                out_v3.append(json.dumps(v3) if json_values else v3)
            return pd.DataFrame({"k3": out_k3, "v3": out_v3})

        return mapped.groupBy("k2").applyInPandas(
            run_reduce, schema=self.reduce_output_schema
        )

    def run(
        self,
        df: DataFrame,
        key_col: str = "key",
        value_col: str = "value",
    ) -> DataFrame:
        """Execute map [+ reduce] over df[key_col, value_col]."""
        if self.map_fn is None:
            raise ValueError("MapReduceJob requires a map function")
        mapped = self._mapped(df, key_col, value_col)
        if self.reduce_fn is None:
            return mapped
        return self._reduced(mapped)

    def run_map_only(
        self, df: DataFrame, key_col: str = "key", value_col: str = "value"
    ) -> DataFrame:
        """The reference's standalone mapper job (type='mapper'):
        returns the partitioned intermediate relation, sorted within
        partitions like the spill files (remap.py:132-147).

        ``customkey`` parity: the reference sorts each spill file's KEYS
        by ``customkey(k2)`` instead of lexicographically
        (``sorted(self.mem, key=self.customkey)``, remap.py:133-135;
        exercised by examples/secondarysort/secondarysort.py:8-9 where
        k2 is the whole record and customkey=itemgetter(3) orders by a
        value field). Here ``sort_key`` applied to the ``k2`` string
        drives the within-partition order. The derived sort column is an
        Arrow-batched pandas UDF — this class is already the arbitrary-
        Python escape hatch, and the sort column never leaves the
        within-partition sort (dropped before return, no shuffle)."""
        mapped = self._mapped(df, key_col, value_col)
        part = mapped.repartition(F.col("partition"))
        if self.sort_key is None:
            return part.sortWithinPartitions("partition", "k2")
        sort_key = self.sort_key

        @F.pandas_udf("string")
        def _spill_key(s):  # pragma: no cover - executed on workers
            return s.map(lambda k: str(sort_key(k)))

        return (
            part.withColumn("_sk", _spill_key(F.col("k2")))
            .sortWithinPartitions("partition", "_sk")
            .drop("_sk")
        )

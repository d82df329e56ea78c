"""Benchmark harness (BASELINE.md): runs every declared query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Execution is forced through the noop sink (full pipeline runs on
executors, nothing shipped to the driver) — timing measures the plan,
not driver-side row materialization.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from remap_spark.engine import build_session
    from remap_spark.queries import ALL_QUERIES

    spark = build_session(app_name="remap_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM + parquet footer caches (BASELINE.md protocol)
    _force(ALL_QUERIES["dq05_agg"](spark, SF_DIR))

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for name, fn in sorted(ALL_QUERIES.items()):
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            _force(fn(spark, SF_DIR))
            samples.append(time.perf_counter() - t0)
        # median: drops the compile-heavy first run and GC outliers
        timings[name] = round(sorted(samples)[len(samples) // 2], 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    line = json.dumps(
        {
            "metric": "declared_query_suite_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "n_queries": len(timings),
            "spark_version": spark.version,
            "cores": os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count()),
        }
    )
    print(line)
    # also persist next to the repo: stdout tail-capture truncated the
    # round-2 record mid-JSON (BENCH_r02.json parsed: null) — a file
    # copy survives log clipping
    out = Path(__file__).resolve().parent / "BENCH_LOCAL.json"
    try:
        out.write_text(line + "\n")
    except OSError:
        pass
    spark.stop()


if __name__ == "__main__":
    main()

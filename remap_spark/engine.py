"""Engine: SparkSession wrapper, config, and table registry.

Replaces the reference's entire control plane (initiator/broker/node/core
daemons, ``/root/reference/daemons/initiator/initiator.py:168-220`` and
friends) with a SparkSession: scheduling, retry, shuffle, and spill are
Spark built-ins (SURVEY.md §4.2).

Scale notes (100 TB target):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast conversion replace any hand-tuned partition count.
- ``shuffle.partitions`` is a *starting* value; AQE coalesces down. On a
  real cluster set it ~2-3x total cores; here it defaults to local cores.
- Arrow on: every pandas-UDF boundary (MapReduceJob, multimodal ops) is
  Arrow-batched, never row-at-a-time pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at ANY scale factor: region is 5
# rows and nation is 25 rows at every TPC-H SF. customer/supplier/part
# GROW with SF, so they are NOT in this list — at 100 TB a broadcast of
# customer would OOM the executors; those joins must shuffle (AQE may
# still convert them at small SF via autoBroadcastJoinThreshold).
ALWAYS_BROADCAST = frozenset({"region", "nation"})


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def build_session(
    app_name: str = "remap_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a SparkSession tuned for this engine.

    On a cluster, ``master`` comes from spark-submit; locally we default
    to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cores = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        # local mode = ONE JVM for driver + all executor threads; the
        # 1g default heap OOMs a 32-thread shuffle. On a real cluster
        # this is spark-submit's --driver-memory / --executor-memory.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        # --- adaptivity: the scale story ------------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- python boundary: always Arrow ----------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # --- shuffle sizing -------------------------------------------
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions else max(cores, 8)),
        )
        # file splits: default 128m is right for the 100 TB case; don't
        # shrink it for tiny local files (AQE handles small inputs).
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # timestamps in the fixtures are naive; pin session TZ to UTC so
        # date_trunc/year agree with DuckDB's naive-timestamp semantics.
        .config("spark.sql.session.timeZone", "UTC")
        # parquet TIMESTAMP(NANOS) (events.ts) is unreadable by Spark's
        # vectorized reader; surface it as bigint nanos and truncate to
        # micros in load_table — same truncation DuckDB applies on read.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- streaming state store ------------------------------------
        # RocksDB over the default HDFS-backed provider: measured 1.65x
        # on a key-heavy stateful stream (SCALE.md r10 probe — 2M events
        # / 50k keys / 20 micro-batches: 231 -> 140 s; the default
        # provider rewrites the full state map per partition per commit,
        # RocksDB commits deltas). Semantics identical — the provider is
        # a store implementation, not an operator change; the stream ≡
        # batch suite pins outputs either way.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    )
    if master:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{cores}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ship_package(spark: SparkSession) -> None:
    """Make ``remap_spark`` importable by executor Python workers.

    Zips the package once and registers it via ``addPyFile`` — the same
    mechanism that ships it to 1000 real executors (the Spark analog of
    the reference's per-job app snapshot copy,
    ``/root/reference/daemons/initiator/base_module.py:38-52``). Without
    this, any pandas-UDF closure that references a module-level helper
    fails on workers whenever the driver process wasn't started inside
    the repo (cloudpickle serializes module functions by reference)."""
    sc = spark.sparkContext
    if getattr(sc, "_remap_spark_shipped", False):
        return
    import tempfile
    import zipfile
    from pathlib import Path

    pkg = Path(__file__).resolve().parent
    zip_path = Path(tempfile.gettempdir()) / "remap_spark_pkg.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(pkg.rglob("*.py")):
            zf.write(py, f"remap_spark/{py.relative_to(pkg)}")
    sc.addPyFile(str(zip_path))
    sc._remap_spark_shipped = True


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan.

    Column pruning + predicate pushdown reach the scan because callers
    express plans declaratively (check ``.explain``: ``ReadSchema`` /
    ``PushedFilters``). Replaces the reference's line-at-a-time readers
    (``/root/reference/daemons/core/remap.py:20-39``).
    """
    # runtime-settable SQL conf: make nano-timestamp parquet readable
    # even when the caller's session wasn't built by build_session
    # (the correctness driver supplies its own SparkSession)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ship_package(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # nanosAsLong surfaces TIMESTAMP(NANOS) columns as bigint; restore
    # them to microsecond timestamps (floor-truncation — values are
    # positive — matching DuckDB's ns->us read behavior).
    from pyspark.sql import functions as F  # local import: avoid cycle
    from pyspark.sql.types import LongType

    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, LongType):
            # integer `div`, NOT `/` — float division loses precision
            # above 2^53 ns (~104 days of epoch-nanos)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


class Engine:
    """Top-level handle: session + fixture tables + operator entry points.

    The reference's "job" abstraction (one REST POST per map or reduce
    phase, ``/root/reference/daemons/initiator/http_interface.py:45-64``)
    collapses into ordinary method calls returning DataFrames.
    """

    def __init__(self, spark: SparkSession | None = None, sf_dir: str | None = None):
        self.spark = spark or build_session()
        self.sf_dir = sf_dir or os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )

    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, name)

    def tables(self) -> dict[str, DataFrame]:
        return load_tables(self.spark, self.sf_dir)

    def sql(self, query: str) -> DataFrame:
        from pyspark.errors import AnalysisException

        missing = []
        for t in TABLES:
            try:
                self.table(t).createOrReplaceTempView(t)
            except AnalysisException as ex:
                # a single absent table parquet is legal (partial sf_dir);
                # anything else — and an sf_dir with NO tables at all —
                # must fail here, not as "table not found" mid-query
                if "PATH_NOT_FOUND" not in str(ex):
                    raise
                missing.append(t)
        if len(missing) == len(TABLES):
            raise FileNotFoundError(
                f"no fixture tables under {self.sf_dir!r} (is the path right?)"
            )
        return self.spark.sql(query)

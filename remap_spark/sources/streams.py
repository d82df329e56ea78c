"""Streaming source registry (SURVEY.md §2.1, streaming tier).

The reference has no streaming sources at all; on Spark the source tier
is Structured Streaming's built-ins. Three adapters:

- ``read_stream_files``: the file-drop source every test and the
  driver gate use — exactly-once via the source's file-position log,
  rate-limited by ``maxFilesPerTrigger``. At 100 TB/day this is the
  object-store landing-zone pattern (files are the unit of replay).
- ``read_stream_rate``: the built-in synthetic rate source — load
  generation and latency benchmarking with zero external deps.
- ``read_stream_kafka``: the message-bus adapter. Kafka connectivity
  is CONFIGURATION (the spark-sql-kafka connector jar + bootstrap
  servers), not engine code; this wraps the options and fails with an
  actionable error when the connector is absent in the environment
  (it is absent in this container — the wrapper and its error path
  are what is tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_stream_files(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-drop streaming source: new files under ``path`` become
    micro-batches; the checkpoint's file log gives exactly-once."""
    r = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.format(fmt).load(path)


def read_stream_rate(
    spark: SparkSession,
    rows_per_second: int = 100,
    num_partitions: int | None = None,
) -> DataFrame:
    """Synthetic rate source: (timestamp, value) rows at a fixed rate —
    built-in, no external deps; the load-generation tier."""
    r = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    )
    if num_partitions is not None:
        r = r.option("numPartitions", num_partitions)
    return r.load()


def read_stream_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    **options: str,
) -> DataFrame:
    """Kafka source wrapper: returns the raw (key, value, topic,
    partition, offset, timestamp) frame; decode ``value`` downstream
    (e.g. ``F.decode`` + ``from_json``). Requires the
    ``spark-sql-kafka-0-10`` connector on the classpath — a deploy-time
    config (``--packages``), not engine code."""
    r = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in options.items():
        r = r.option(k, v)
    try:
        return r.load()
    except Exception as ex:  # connector jar absent
        raise RuntimeError(
            "Kafka streaming source requires the spark-sql-kafka-0-10 "
            "connector on the classpath (spark-submit --packages "
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>); "
            f"underlying error: {ex}"
        ) from ex

"""Streaming ≡ batch equivalence: the same window transformations fed
through a file stream must produce the batch results (SURVEY §7.1
step 5)."""

from __future__ import annotations

import pytest
from conftest import SF_DIR


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    """Materialize the events fixture as a multi-file parquet dir the
    file-source stream can consume incrementally."""
    from remap_spark.engine import load_table

    d = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, SF_DIR, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def _schema(spark):
    from remap_spark.engine import load_table

    return load_table(spark, SF_DIR, "events").schema


def test_tumbling_stream_equals_batch(spark, events_stream_dir):
    from remap_spark.engine import load_table
    from remap_spark.streaming import (
        read_events_stream,
        run_stream_to_memory,
        tumbling_counts,
    )

    stream = read_events_stream(spark, events_stream_dir, schema=_schema(spark))
    q = run_stream_to_memory(
        tumbling_counts(stream), "tumbling_test", mode="append"
    )
    try:
        q.processAllAvailable()
        got = {
            (r["hour"], r["event_type"]): (r["cnt"], round(r["sum_value"], 5))
            for r in spark.sql("SELECT * FROM tumbling_test").collect()
        }
    finally:
        q.stop()

    batch = tumbling_counts(load_table(spark, SF_DIR, "events"))
    expected = {
        (r["hour"], r["event_type"]): (r["cnt"], round(r["sum_value"], 5))
        for r in batch.collect()
    }
    # the stream emits only watermark-closed windows; every emitted
    # window must match batch exactly, and the only windows allowed to
    # be held back are those the final watermark cannot close: starts
    # within (watermark 2h + window 1h) of the stream's max event time.
    # SF-independent — a fixed slack broke the first time the fixture
    # grew 10x.
    assert got
    for key, v in got.items():
        assert expected[key] == v
    import datetime

    max_ts = max(h for h, _ in expected)
    horizon = max_ts - datetime.timedelta(hours=3)
    late_missing = [
        k for k in set(expected) - set(got) if k[0] <= horizon
    ]
    assert not late_missing, late_missing[:5]


def test_session_stream_equals_batch(spark, events_stream_dir):
    from remap_spark.engine import load_table
    from remap_spark.streaming import (
        read_events_stream,
        run_stream_to_memory,
        session_counts,
    )

    stream = read_events_stream(spark, events_stream_dir, schema=_schema(spark))
    q = run_stream_to_memory(session_counts(stream), "session_test", mode="append")
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], r["sess_start"]): r["n_events"]
            for r in spark.sql("SELECT * FROM session_test").collect()
        }
    finally:
        q.stop()

    batch = session_counts(load_table(spark, SF_DIR, "events"))
    expected = {
        (r["user_id"], r["sess_start"]): r["n_events"] for r in batch.collect()
    }
    assert got
    for key, v in got.items():
        assert expected[key] == v


def test_session_batch_equals_dq14(spark):
    """Native session_window (batch mode) must agree with the
    gaps-and-islands formulation (dq14) on per-user session counts."""
    from remap_spark.engine import load_table
    from remap_spark.queries.relational import dq14_sessionize
    from remap_spark.streaming import session_counts
    from pyspark.sql import functions as F

    native = (
        session_counts(load_table(spark, SF_DIR, "events"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("session_count"),
            F.max("n_events").alias("max_session_len"),
        )
    )
    got = {
        r["user_id"]: (r["session_count"], r["max_session_len"])
        for r in native.collect()
    }
    expected = {
        r["user_id"]: (r["session_count"], r["max_session_len"])
        for r in dq14_sessionize(spark, SF_DIR).collect()
    }
    assert got == expected


def test_stateful_running_user_stats(spark, events_stream_dir):
    """applyInPandasWithState: per-user state accumulates across
    micro-batches and the FINAL emitted row per user equals the batch
    totals exactly (integer-micros accumulation)."""
    from pyspark.sql import functions as F

    from remap_spark.engine import load_table
    from remap_spark.streaming import (
        read_events_stream,
        run_stream_to_memory,
        running_user_stats,
    )

    stream = read_events_stream(
        spark, events_stream_dir, schema=_schema(spark), max_files_per_trigger=1
    )
    q = run_stream_to_memory(running_user_stats(stream), "user_stats", mode="update")
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM user_stats ORDER BY batches_seen"
        ).collect()
    finally:
        q.stop()

    # last emission per user = final accumulated state
    final = {}
    for r in rows:
        final[r["user_id"]] = (r["events_total"], r["value_sum"], r["batches_seen"])

    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).alias("v"),
        )
        .collect()
    )
    expected = {r["user_id"]: (r["n"], r["v"]) for r in batch}
    assert set(final) == set(expected)
    multi_batch = 0
    for uid, (n, v, batches) in final.items():
        assert expected[uid] == (n, v), uid
        if batches > 1:
            multi_batch += 1
    # with maxFilesPerTrigger=1 over 4 files, state DID span batches
    assert multi_batch > 0


def test_sliding_stream_equals_batch(spark, events_stream_dir):
    from remap_spark.engine import load_table
    from remap_spark.streaming import (
        read_events_stream,
        run_stream_to_memory,
        sliding_counts,
    )

    stream = read_events_stream(spark, events_stream_dir, schema=_schema(spark))
    q = run_stream_to_memory(sliding_counts(stream), "sliding_test", mode="append")
    try:
        q.processAllAvailable()
        got = {
            (r["win_start"], r["event_type"]): r["cnt"]
            for r in spark.sql("SELECT * FROM sliding_test").collect()
        }
    finally:
        q.stop()

    batch = sliding_counts(load_table(spark, SF_DIR, "events"))
    expected = {
        (r["win_start"], r["event_type"]): r["cnt"] for r in batch.collect()
    }
    assert got
    for key, v in got.items():
        assert expected[key] == v
    # only windows the final watermark cannot close (starts within
    # watermark 2h + window 1h of stream end) may be held back —
    # SF-independent, unlike a fixed slack
    import datetime

    max_ts = max(s for s, _ in expected)
    horizon = max_ts - datetime.timedelta(hours=3)
    late_missing = [
        k for k in set(expected) - set(got) if k[0] <= horizon
    ]
    assert not late_missing, late_missing[:5]


def test_stream_static_enrich_equals_batch(spark, events_stream_dir):
    """Stream⋈static broadcast enrichment must equal the batch join."""
    from pyspark.sql import functions as F

    from remap_spark.engine import load_table
    from remap_spark.streaming import (
        read_events_stream,
        run_stream_to_memory,
        stream_static_enrich,
    )

    cust = (
        load_table(spark, SF_DIR, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    stream = read_events_stream(spark, events_stream_dir, schema=_schema(spark))
    q = run_stream_to_memory(
        stream_static_enrich(stream, cust, "user_id"), "enrich_test",
        mode="append",
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT c_mktsegment, COUNT(*) AS cnt FROM enrich_test GROUP BY 1"
        ).collect()
    finally:
        q.stop()

    ev = load_table(spark, SF_DIR, "events")
    expected = {
        (r["c_mktsegment"], r["cnt"])
        for r in ev.join(cust, "user_id")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert {(r["c_mktsegment"], r["cnt"]) for r in got} == expected


def test_stream_stream_interval_join_subset_of_batch(spark, events_stream_dir):
    """Stream-stream interval self-join: every emitted pair must appear
    in the batch twin, and the join must emit a substantial share (the
    tail can be held back by the final watermark)."""
    from pyspark.sql import functions as F

    from remap_spark.engine import load_table
    from remap_spark.streaming import (
        read_events_stream,
        run_stream_to_memory,
        stream_stream_interval_join,
    )

    def sides(src):
        l = src.select(
            F.col("user_id").alias("uid"),
            F.col("event_id").alias("l_id"),
            F.col("ts").alias("l_ts"),
        )
        r = src.select(
            F.col("user_id").alias("uid"),
            F.col("event_id").alias("r_id"),
            F.col("ts").alias("r_ts"),
        )
        return l, r

    sl, sr = sides(read_events_stream(spark, events_stream_dir, schema=_schema(spark)))
    joined = stream_stream_interval_join(
        sl, sr, key="uid", left_ts="l_ts", right_ts="r_ts",
        watermark="10 minutes", within="5 minutes",
    ).select(sl["uid"], "l_id", "r_id")
    q = run_stream_to_memory(joined, "ssj_test", mode="append")
    try:
        q.processAllAvailable()
        got = {(r["uid"], r["l_id"], r["r_id"])
               for r in spark.sql("SELECT * FROM ssj_test").collect()}
    finally:
        q.stop()

    bl, br = sides(load_table(spark, SF_DIR, "events"))
    batch = stream_stream_interval_join(
        bl, br, key="uid", left_ts="l_ts", right_ts="r_ts", within="5 minutes"
    ).select(bl["uid"], "l_id", "r_id")
    expected = {(r["uid"], r["l_id"], r["r_id"]) for r in batch.collect()}
    assert got <= expected
    assert len(got) > 0.5 * len(expected)


def test_streaming_dedup_equals_batch(spark, events_stream_dir):
    """dropDuplicatesWithinWatermark wrapper: the streamed dedup emits
    exactly the batch distinct key set (ext_dedup_exact semantics) when
    the delay exceeds the fixture's time span (no state eviction)."""
    from remap_spark.engine import load_table
    from remap_spark.streaming import (
        dedup_events,
        read_events_stream,
        run_stream_to_memory,
    )

    keys = ["user_id", "event_type"]
    stream = read_events_stream(spark, events_stream_dir, schema=_schema(spark))
    q = run_stream_to_memory(
        dedup_events(
            stream.select("user_id", "event_type", "ts"),
            keys,
            delay="3650 days",
        ),
        "dedup_stream_test",
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql(
            "SELECT user_id, event_type FROM dedup_stream_test"
        ).collect()
    finally:
        q.stop()
    got = {(r["user_id"], r["event_type"]) for r in emitted}

    batch = dedup_events(
        load_table(spark, SF_DIR, "events").select("user_id", "event_type", "ts"),
        keys,
    )
    expected = {(r["user_id"], r["event_type"]) for r in batch.collect()}
    assert got == expected
    # delay >> fixture span: state never evicted, one row per key
    assert len(emitted) == len(expected)


def test_streaming_text_pipeline_equals_batch(spark, tmp_path_factory):
    """The LLM-pipeline text operators (quality gate -> PII scrub ->
    deterministic sample) are stateless narrow transforms, so the SAME
    operator code runs on a file stream and must emit exactly the batch
    result — corpus curation as a continuous ingestion pipeline."""
    from remap_spark.engine import load_table
    from remap_spark.operators.split import deterministic_sample
    from remap_spark.operators.text import quality_score, redact_pii
    from remap_spark.streaming import run_stream_to_memory

    docs = load_table(spark, SF_DIR, "documents")
    d = str(tmp_path_factory.mktemp("docs_stream"))
    docs.repartition(4).write.mode("overwrite").parquet(d)

    def pipeline(df):
        sampled = deterministic_sample(df, "doc_id", 0.5, salt="qs")
        scored = quality_score(sampled)
        red = redact_pii(sampled).select("doc_id", "n_email")
        return scored.join(red, "doc_id")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(d)
    )
    q = run_stream_to_memory(pipeline(stream), "text_pipe_test", mode="append")
    try:
        q.processAllAvailable()
        got = {
            (r["doc_id"], r["score"], r["verdict"], r["n_email"])
            for r in spark.sql("SELECT * FROM text_pipe_test").collect()
        }
    finally:
        q.stop()

    expected = {
        (r["doc_id"], r["score"], r["verdict"], r["n_email"])
        for r in pipeline(docs).collect()
    }
    assert got == expected and len(got) > 0


def test_stream_parquet_sink_exactly_once(spark, events_stream_dir, tmp_path):
    """Native file sink: all rows land exactly once, and the sink's
    _spark_metadata commit log exists (the exactly-once mechanism)."""
    import os

    from remap_spark.engine import load_table
    from remap_spark.streaming import read_events_stream, write_stream_parquet

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = read_events_stream(
        spark, events_stream_dir, schema=_schema(spark), max_files_per_trigger=1
    ).select("event_id", "user_id", "event_type")
    q = write_stream_parquet(stream, out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert os.path.isdir(os.path.join(out, "_spark_metadata"))
    got = spark.read.parquet(out)
    n_batch = load_table(spark, SF_DIR, "events").count()
    assert got.count() == n_batch
    assert got.select("event_id").distinct().count() == n_batch


def test_foreach_batch_overwrite_idempotent(spark, events_stream_dir, tmp_path):
    """foreachBatch sink: every row exactly once across batch
    partitions, and re-writing a batch id replaces (not duplicates) its
    partition — the idempotence that makes checkpoint replay safe."""
    from pyspark.sql import functions as F

    from remap_spark.engine import load_table
    from remap_spark.streaming import foreach_batch_overwrite, read_events_stream

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = read_events_stream(
        spark, events_stream_dir, schema=_schema(spark), max_files_per_trigger=1
    ).select("event_id", "user_id")
    q = foreach_batch_overwrite(stream, out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(out)
    n_batch = load_table(spark, SF_DIR, "events").count()
    assert got.count() == n_batch
    batches = [r["_batch_id"] for r in got.select("_batch_id").distinct().collect()]
    assert len(batches) > 1  # maxFilesPerTrigger=1 over 4 files

    # simulate a replay of batch 0 with the same rows: dynamic overwrite
    # must leave the total unchanged
    replay = got.where(F.col("_batch_id") == batches[0]).drop("_batch_id")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            replay.withColumn("_batch_id", F.lit(int(batches[0])))
            .write.mode("overwrite")
            .partitionBy("_batch_id")
            .parquet(out)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    assert spark.read.parquet(out).count() == n_batch


def test_session_stream_equals_dq32(spark, events_stream_dir):
    """Streamed session windows, rolled up per user, must agree with the
    dq32_session_window declared query (whose DuckDB oracle is the
    gaps-and-islands formulation) — ties the streaming tier to a
    driver-gated result, not just its own batch twin."""
    from pyspark.sql import functions as F

    from remap_spark.queries.relational import dq32_session_window
    from remap_spark.streaming import (
        read_events_stream,
        run_stream_to_memory,
        session_counts,
    )

    stream = read_events_stream(spark, events_stream_dir, schema=_schema(spark))
    # complete mode: append would hold back each user's final session(s)
    # behind the last watermark; complete re-emits ALL sessions (open
    # ones included) every trigger, so the final table equals batch
    q = run_stream_to_memory(
        session_counts(stream), "session_dq32", mode="complete"
    )
    try:
        q.processAllAvailable()
        rolled = (
            spark.sql("SELECT * FROM session_dq32")
            .groupBy("user_id")
            .agg(
                F.count("*").alias("session_count"),
                F.max("n_events").alias("max_session_len"),
            )
        )
        got = {
            r["user_id"]: (r["session_count"], r["max_session_len"])
            for r in rolled.collect()
        }
    finally:
        q.stop()

    expected = {
        r["user_id"]: (r["session_count"], r["max_session_len"])
        for r in dq32_session_window(spark, SF_DIR).collect()
    }
    assert got == expected


def test_streaming_dedup_equals_ext_dedup_exact_keyset(spark, tmp_path_factory):
    """Streamed dedup over the documents fingerprint must keep exactly
    the keep-set of the driver-gated ext_dedup_exact query: one survivor
    per md5(text), the minimum doc_id."""
    from pyspark.sql import functions as F

    from remap_spark.engine import load_table
    from remap_spark.queries.extensions import ext_dedup_exact
    from remap_spark.streaming import dedup_events, run_stream_to_memory

    # NOT epoch 0: Spark's watermark starts at epoch 0 and never goes
    # below it, so epoch-0 event times are immediately "late" and every
    # row is dropped — a modern constant keeps all rows on time
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id",
        F.md5("text").alias("h"),
        F.lit("2024-01-01 00:00:00").cast("timestamp_ntz").alias("ts"),
    )
    d = str(tmp_path_factory.mktemp("docs_dedup_stream"))
    docs.repartition(4).write.mode("overwrite").parquet(d)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = run_stream_to_memory(
        dedup_events(stream, ["h"], delay="3650 days"), "dedup_exact_stream"
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("SELECT h FROM dedup_exact_stream").collect()
    finally:
        q.stop()
    got = {r["h"] for r in emitted}

    expected = {r["h"] for r in ext_dedup_exact(spark, SF_DIR).collect()}
    # exactly one survivor per distinct fingerprint (which survivor is
    # batch-order-dependent; the driver-gated keep_id contract is
    # batch-side — here the invariant is the KEY SET)
    assert got == expected
    assert len(emitted) == len(expected)


def test_stream_ingest_dedup_persistent_store(spark, tmp_path_factory):
    """Continuous ingestion dedup: duplicates planted ACROSS micro-
    batches must be dropped by the persistent fingerprint store (batch-
    internal dups by the per-batch window), leaving exactly one
    survivor per distinct normalized content — the batch
    incremental_dedup semantics replayed over a stream."""
    from pyspark.sql import functions as F

    from remap_spark.engine import load_table
    from remap_spark.operators.text import content_fingerprint
    from remap_spark.streaming.dedup import stream_ingest_dedup

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    # three chunks; chunk 2 and 3 re-send some of chunk 1's texts under
    # new ids (cross-batch dups) and chunk 3 contains an internal dup
    base = docs.where(F.col("doc_id") < 60)
    c1 = base.where(F.col("doc_id") < 20)
    c2 = base.where((F.col("doc_id") >= 20) & (F.col("doc_id") < 40)).unionByName(
        c1.where(F.col("doc_id") < 5).select(
            (F.col("doc_id") + 1000).alias("doc_id"), "text"
        )
    )
    c3 = base.where(F.col("doc_id") >= 40).unionByName(
        c1.where(F.col("doc_id") < 3).select(
            (F.col("doc_id") + 2000).alias("doc_id"), "text"
        )
    )
    src = str(tmp_path_factory.mktemp("ingest_src"))
    for i, c in enumerate([c1, c2, c3]):
        c.coalesce(1).write.mode("overwrite").parquet(f"{src}/f{i}.parquet")
    out = str(tmp_path_factory.mktemp("ingest_out"))
    store = str(tmp_path_factory.mktemp("ingest_store"))
    ckpt = str(tmp_path_factory.mktemp("ingest_ckpt"))

    stream = (
        spark.readStream.schema(c1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = stream_ingest_dedup(stream, out, store, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    kept = spark.read.parquet(out)
    union_all = c1.unionByName(c2).unionByName(c3)
    expected_fps = {
        r["fingerprint"]
        for r in content_fingerprint(union_all).select("fingerprint").collect()
    }
    got = [
        (r["doc_id"], r["fingerprint"])
        for r in kept.select("doc_id", "fingerprint").collect()
    ]
    got_fps = [fp for _, fp in got]
    # one survivor per distinct content, none missed, none duplicated
    assert sorted(set(got_fps)) == sorted(expected_fps)
    assert len(got_fps) == len(set(got_fps))
    # planted re-sends never survive (their originals arrived first)
    assert all(i < 1000 for i, _ in got)
    # store mirrors the survivor fingerprints
    store_fps = [
        r["fingerprint"] for r in spark.read.parquet(store).collect()
    ]
    assert sorted(store_fps) == sorted(set(got_fps))


def test_ingest_dedup_replay_idempotent_property(spark, tmp_path_factory):
    """Property (hypothesis): for ANY replay pattern — an in-order run
    of every batch followed by arbitrary re-executions of arbitrary
    batches in arbitrary order, each with identical content (Structured
    Streaming's re-execution contract, including a batch re-running
    after later batches committed) — the final output and fingerprint
    store are IDENTICAL to the clean single-run states."""
    import shutil

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from remap_spark.streaming.dedup import ingest_dedup_batch

    # batches of (doc_id, text) where texts collide across batches:
    # small text alphabet forces cross-batch and in-batch duplicates
    texts = st.sampled_from(["alpha beta", "gamma", "delta eps", "zeta"])
    batch = st.lists(texts, min_size=1, max_size=4)
    scenario = st.tuples(
        st.lists(batch, min_size=2, max_size=3),
        st.lists(st.integers(min_value=0, max_value=2), max_size=4),
    )

    root = str(tmp_path_factory.mktemp("replay_prop"))
    run_no = [0]

    def run_sequence(batches, order, tag):
        out = f"{root}/{tag}/out"
        store = f"{root}/{tag}/store"
        for bid in order:
            if bid >= len(batches):
                continue
            rows = [
                (bid * 100 + j, t) for j, t in enumerate(batches[bid])
            ]
            df = spark.createDataFrame(rows, "doc_id bigint, text string")
            ingest_dedup_batch(df, bid, out, store)
        kept = sorted(
            (r["doc_id"], r["fingerprint"])
            for r in spark.read.parquet(out).collect()
        )
        st_fps = sorted(
            (r["fingerprint"], r["_batch_id"])
            for r in spark.read.parquet(store).collect()
        )
        return kept, st_fps

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(scn=scenario)
    def prop(scn):
        batches, replays = scn
        run_no[0] += 1
        tag = run_no[0]
        clean_order = list(range(len(batches)))
        replay_order = clean_order + [b for b in replays if b < len(batches)]
        clean = run_sequence(batches, clean_order, f"c{tag}")
        replayed = run_sequence(batches, replay_order, f"r{tag}")
        assert clean == replayed, (batches, replay_order)
        shutil.rmtree(f"{root}/c{tag}", ignore_errors=True)
        shutil.rmtree(f"{root}/r{tag}", ignore_errors=True)

    prop()


def test_stream_source_registry_rate_and_kafka_error(spark, tmp_path):
    """Source registry tier: the built-in rate source streams synthetic
    rows through a real micro-batch, and the Kafka wrapper fails with
    an actionable error in a connector-less environment (Kafka
    connectivity is deploy-time config, not engine code)."""
    import pytest
    from pyspark.sql import functions as F

    from remap_spark.sources import read_stream_kafka, read_stream_rate

    src = read_stream_rate(spark, rows_per_second=500, num_partitions=2)
    assert src.isStreaming and set(src.columns) == {"timestamp", "value"}
    q = (
        src.select(F.col("value"))
        .writeStream.format("memory")
        .queryName("rate_probe")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.sql("SELECT COUNT(*) c FROM rate_probe").first()["c"] > 0:
                break
            time.sleep(0.5)
        assert spark.sql("SELECT COUNT(*) c FROM rate_probe").first()["c"] > 0
    finally:
        q.stop()

    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        read_stream_kafka(spark, "localhost:9092", "topic")


def test_streaming_funnel_equals_batch(spark, tmp_path_factory):
    """Streaming funnel (applyInPandasWithState) must converge to the
    batch fold's exact per-user stage slots when events arrive in
    (ts, event_id) order across micro-batches: the fixture is split
    into three order-respecting time chunks, streamed one file per
    trigger, and each user's final emitted row (stage slots are
    monotone — they only fill) must equal funnel_stage_times."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from remap_spark.engine import load_table
    from remap_spark.operators.sessions import funnel_stage_times
    from remap_spark.queries.relational import FUNNEL_STEPS, FUNNEL_WINDOW_US
    from remap_spark.streaming.stateful import streaming_funnel_stages

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    # order-respecting thirds: rank on (ts, event_id) so no user's
    # later event lands in an earlier batch
    ranked = ev.withColumn(
        "_tile", F.ntile(3).over(Window.orderBy("ts", "event_id"))
    )
    src = str(tmp_path_factory.mktemp("funnel_src"))
    for i in (1, 2, 3):
        ranked.where(F.col("_tile") == i).drop("_tile").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/chunk{i}.parquet")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = streaming_funnel_stages(stream, FUNNEL_STEPS, FUNNEL_WINDOW_US)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_stream")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    emitted = spark.sql("SELECT * FROM funnel_stream").collect()
    final: dict = {}
    for r in emitted:
        cur = final.get(r["user_id"])
        if cur is None or r["stage_reached"] >= cur["stage_reached"]:
            final[r["user_id"]] = r
    batch = {
        # batch emits k nullable slots; streaming emits the dense
        # reached-prefix (slots are prefix-monotone)
        r["user_id"]: [t for t in r["stage_ts"] if t is not None]
        for r in funnel_stage_times(ev, FUNNEL_STEPS, FUNNEL_WINDOW_US).collect()
    }
    assert set(final) == set(batch)
    for uid, row in final.items():
        assert list(row["stage_ts"]) == batch[uid], (
            uid, list(row["stage_ts"]), batch[uid],
        )
    # non-vacuous: some users must progress past stage 1
    assert any(r["stage_reached"] >= 2 for r in final.values())


class _FakeGroupState:
    """Minimal GroupState double for driving update closures directly
    (a real ProcessingTimeTimeout firing is not deterministically
    reachable in a test)."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.rearmed = False

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        assert self._value is not None
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value = None
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.rearmed = True


def test_stateful_timeout_evicts_without_rearm():
    """On state.hasTimedOut the update closures must evict the key and
    NOT re-arm the timeout — re-arming would keep abandoned keys in
    the store forever and re-emit an unchanged row every interval
    (round-4 advisor finding)."""
    from remap_spark.streaming.stateful import (
        _make_funnel_update,
        _make_stats_update,
    )

    # running_user_stats: timed-out key -> removed, nothing emitted
    upd = _make_stats_update(timeout_ms=1000)
    st = _FakeGroupState(value=(5, 2, 700), timed_out=True)
    out = list(upd((42,), iter([]), st))
    assert out == []
    assert st.removed and not st.rearmed

    # funnel: timed-out key -> exactly ONE final row, then removed
    upd = _make_funnel_update(
        ["a", "b", "c"], 10**9, "ts", "user_id", "event_type",
        "event_id", 1000,
    )
    st = _FakeGroupState(value=([100, 250],), timed_out=True)
    out = list(upd((7,), iter([]), st))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert row["user_id"] == 7
    assert row["stage_reached"] == 2
    assert list(row["stage_ts"]) == [100, 250]
    assert st.removed and not st.rearmed

    # live path still re-arms (the timeout contract for active keys)
    import pandas as pd

    upd = _make_stats_update(timeout_ms=1000)
    st = _FakeGroupState()
    out = list(upd((1,), iter([pd.DataFrame({"value": [2.5]})]), st))
    assert len(out) == 1 and st.rearmed and st._value == (1, 1, 2_500_000)


def test_ingest_dedup_fuzzy_batches_and_replay(spark, tmp_path_factory):
    """Fuzzy ingest dedup across micro-batches: near-dups of docs kept
    in EARLIER batches drop, fresh docs survive and extend the
    signature store; replaying committed batches (including after
    later batches committed) leaves output and store byte-identical —
    the same exactly-once contract as the exact twin."""
    from pyspark.sql import functions as F

    from remap_spark.streaming.dedup import ingest_dedup_fuzzy_batch

    root = str(tmp_path_factory.mktemp("fuzzy_ingest"))
    out, store = f"{root}/out", f"{root}/store"
    base_a = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(30))
    base_b = " ".join(f"delta{i} eps{i} zeta{i}" for i in range(30))
    b0 = spark.createDataFrame(
        [(1, base_a), (2, base_b)], "doc_id bigint, text string"
    )
    b1 = spark.createDataFrame(
        [
            (10, base_a + " tiny new tail"),  # near-dup of batch-0 doc 1
            (11, " ".join(f"fresh{i} words{i} here{i}" for i in range(30))),
            (12, " ".join(f"fresh{i} words{i} here{i}" for i in range(30))
                 + " extra"),  # near-dup of EARLIER doc 11 (keep-first)
        ],
        "doc_id bigint, text string",
    )
    ingest_dedup_fuzzy_batch(b0, 0, out, store, threshold=0.5)
    ingest_dedup_fuzzy_batch(b1, 1, out, store, threshold=0.5)

    def state():
        kept = sorted(
            r["doc_id"] for r in spark.read.parquet(out).collect()
        )
        st_rows = sorted(
            (r["band"], r["key"], r["doc"], r["_batch_id"])
            for r in spark.read.parquet(store).collect()
        )
        return kept, st_rows

    kept, st_rows = state()
    assert kept == [1, 2, 11], kept
    assert {d for _, _, d, _ in st_rows} == {1, 2, 11}
    # replay batch 0 after batch 1 committed, then batch 1 again
    ingest_dedup_fuzzy_batch(b0, 0, out, store, threshold=0.5)
    ingest_dedup_fuzzy_batch(b1, 1, out, store, threshold=0.5)
    assert state() == (kept, st_rows)
    # store partitions carry batch lineage for compaction
    assert {b for _, _, _, b in st_rows} == {0, 1}


def test_stream_scd2_batches_and_replay(spark, tmp_path_factory):
    """Streaming SCD2 protocol: three sequential micro-batches leave
    the bucket-partitioned dimension store EXACTLY equal to a full
    batch recompute over all events; replaying any batch afterwards —
    including out of order, after later batches committed — changes
    nothing (scd2_apply_batch's append-only idempotence)."""
    import datetime as dt

    from remap_spark.operators.scd import scd2_history
    from remap_spark.streaming.scd import read_dim, scd2_apply_stream_batch

    t0 = dt.datetime(2025, 6, 1)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    schema = "user_id bigint, ts timestamp, state string, event_id bigint"
    batches = [
        [(1, ts(0), "A", 1), (2, ts(1), "X", 2), (1, ts(5), "B", 3)],
        [(1, ts(10), "B", 4), (3, ts(11), "K", 5), (2, ts(12), "Y", 6)],
        [(2, ts(20), "X", 7), (1, ts(21), "A", 8), (4, ts(22), "Q", 9)],
    ]
    root = str(tmp_path_factory.mktemp("stream_scd2"))
    dim = f"{root}/dim"
    kw = dict(
        key_col="user_id", ts_col="ts",
        attr_cols=["state"], tiebreak_col="event_id",
    )

    def snapshot():
        cols = ["user_id", "version", "state", "valid_from", "valid_to",
                "is_current"]
        return sorted(
            tuple(r) for r in read_dim(spark, dim).select(cols).collect()
        )

    for rows in batches:
        scd2_apply_stream_batch(
            spark.createDataFrame(rows, schema), dim, n_buckets=8, **kw
        )
    full = scd2_history(
        spark.createDataFrame(sum(batches, []), schema), **kw
    )
    expected = sorted(
        tuple(r)
        for r in full.select(
            "user_id", "version", "state", "valid_from", "valid_to",
            "is_current",
        ).collect()
    )
    clean = snapshot()
    assert clean == expected

    # replays: last batch, then an OLD batch after later ones committed
    for rows in (batches[2], batches[1], batches[0]):
        scd2_apply_stream_batch(
            spark.createDataFrame(rows, schema), dim, n_buckets=8, **kw
        )
        assert snapshot() == clean


def test_stream_kmv_replay_idempotent(spark, tmp_path_factory):
    """Streaming KMV protocol: sequential micro-batches leave the
    bucket-partitioned sketch store EXACTLY equal to the batch sketch
    over all rows; replaying any batch afterwards — out of order,
    after later batches committed — changes nothing (KMV merge
    idempotence)."""
    from remap_spark.operators.rollup import kmv_estimate, kmv_state
    from remap_spark.streaming.sketches import (
        kmv_apply_stream_batch,
        read_kmv_store,
    )

    schema = "g string, v bigint"
    batches = [
        [("a", i) for i in range(0, 120)] + [("b", i) for i in range(10)],
        [("a", i) for i in range(60, 200)] + [("c", i) for i in range(5)],
        [("b", i) for i in range(5, 40)] + [("a", i) for i in range(150, 260)],
    ]
    root = str(tmp_path_factory.mktemp("stream_kmv"))
    store = f"{root}/kmv"

    def snapshot():
        return sorted(
            tuple(r)
            for r in read_kmv_store(spark, store).select("g", "h").collect()
        )

    for rows in batches:
        kmv_apply_stream_batch(
            spark.createDataFrame(rows, schema), store, ["g"], "v",
            k=64, n_buckets=8,
        )
    full = kmv_state(
        spark.createDataFrame(sum(batches, []), schema), ["g"], "v", k=64
    )
    expected = sorted(tuple(r) for r in full.select("g", "h").collect())
    assert snapshot() == expected

    after_batches = snapshot()
    # replay batch 0 after batches 1-2 committed: store must not move
    kmv_apply_stream_batch(
        spark.createDataFrame(batches[0], schema), store, ["g"], "v",
        k=64, n_buckets=8,
    )
    assert snapshot() == after_batches

    # estimates read off the store match the batch-side estimator
    est_store = {
        r.g: (r.n_hashes, r.est_distinct)
        for r in kmv_estimate(
            read_kmv_store(spark, store), ["g"], k=64
        ).collect()
    }
    est_batch = {
        r.g: (r.n_hashes, r.est_distinct)
        for r in kmv_estimate(full, ["g"], k=64).collect()
    }
    assert est_store == est_batch
    # group b saw 40 distinct (< k): exact by construction
    assert est_store["b"] == (40, 40)


def test_stream_topk_replay_and_compact(spark, tmp_path_factory):
    """Streaming heavy-hitter protocol: batch-partitioned partial
    counts sum to the exact batch recompute; replaying any batch —
    including an old one after later commits — rewrites an identical
    partition and changes nothing; compaction folds retired
    partitions into the base without moving totals."""
    from remap_spark.streaming.topk import (
        compact_topk_store,
        read_topk,
        read_topk_store,
        topk_apply_stream_batch,
    )

    schema = "k string"
    batches = [
        [("a",)] * 30 + [("b",)] * 10,
        [("a",)] * 5 + [("c",)] * 25,
        [("b",)] * 40 + [("d",)] * 1,
    ]
    root = str(tmp_path_factory.mktemp("stream_topk"))
    store = f"{root}/topk"

    for i, rows in enumerate(batches):
        topk_apply_stream_batch(
            spark.createDataFrame(rows, schema), store, ["k"], i
        )

    def totals():
        return {
            r.k: r.n_rows
            for r in read_topk_store(spark, store, ["k"]).collect()
        }

    expected = {"a": 35, "b": 50, "c": 25, "d": 1}
    assert totals() == expected

    # replay batch 0 out of order, after batches 1-2 committed
    topk_apply_stream_batch(
        spark.createDataFrame(batches[0], schema), store, ["k"], 0
    )
    assert totals() == expected

    top = [
        (r.rank, r.k, r.n_rows)
        for r in read_topk(spark, store, ["k"], topk=3).collect()
    ]
    assert top == [(1, "b", 50), (2, "a", 35), (3, "c", 25)]

    # compact batches 0-1 into the base partition; totals unchanged,
    # partitions reduced to base + batch 2
    compact_topk_store(spark, store, ["k"], upto_batch_id=1)
    assert totals() == expected
    bids = {
        r._bid for r in spark.read.parquet(store).select("_bid").collect()
    }
    assert bids == {-1, 2}

    # a still-live batch (2) replaying AFTER compaction stays correct
    topk_apply_stream_batch(
        spark.createDataFrame(batches[2], schema), store, ["k"], 2
    )
    assert totals() == expected

    import pytest as _pytest

    with _pytest.raises(ValueError, match="reserved"):
        topk_apply_stream_batch(
            spark.createDataFrame(batches[0], schema), store, ["k"], -3
        )


def test_streaming_match_pattern_equals_batch(spark, tmp_path_factory):
    """Streaming CEP automaton (applyInPandasWithState) emits exactly
    the batch match_pattern rows when events arrive in (ts, event_id)
    order across micro-batches: the events fixture is split into
    three order-respecting chunks, streamed one file per trigger, and
    the union of emitted matches must equal the batch run as a
    multiset — each match exactly once, never duplicated across
    batch boundaries even when a pattern STRADDLES two batches."""
    from collections import Counter

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from remap_spark.engine import load_table
    from remap_spark.operators.sessions import match_pattern
    from remap_spark.streaming.stateful import streaming_match_pattern

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    ranked = ev.withColumn(
        "_tile", F.ntile(3).over(Window.orderBy("ts", "event_id"))
    )
    src = str(tmp_path_factory.mktemp("cep_src"))
    for i in (1, 2, 3):
        ranked.where(F.col("_tile") == i).drop("_tile").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/chunk{i}.parquet")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = streaming_match_pattern(stream, "signup", "click", "purchase")
    q = (
        out.writeStream.format("memory")
        .queryName("cep_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = Counter(
        tuple(r) for r in spark.sql("SELECT * FROM cep_stream").collect()
    )
    want = Counter(
        tuple(r)
        for r in match_pattern(ev, "signup", "click", "purchase").collect()
    )
    assert got == want and sum(want.values()) > 0

"""Round-12 pins: the r11 ADVICE fixes in operators/similarity.py.

1. The int64 GEMM tiers RAISE on overflow risk instead of silently
   wrapping (numpy int64 wraps where Spark ANSI bigint raises — the
   bit-identity contract requires checking the bound, not documenting
   it).
2. semdedup's gemm pair tier RAISES on a cluster whose dense n^2 dot
   matrix would OOM one executor (mirroring bpe_train_local's
   max_table_rows contract) instead of building it.
3. _assign_cells_gemm / kmeans _assign_gemm derive the id column type
   from the caller's schema (drop-in parity with the expression tiers,
   which preserve it) instead of hardcoding bigint.
4. ivf_probe_topk materializes the probes subtree once
   (localCheckpoint) so the collected cell filter and the join read
   the same probes even for a nondeterministic queries input.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from remap_spark.operators import similarity as sim


def _embed_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


# ---------------------------------------------------------------------------
# 1. overflow guards


def test_check_int64_gemm_bound_arithmetic():
    # unit-ish vectors at the default scale pass with huge margin
    sim._check_int64_gemm_bound(2_000_000, 2_000_000, 64, "t")
    # components big enough to wrap the distance combination raise
    with pytest.raises(ValueError, match="int64 GEMM overflow"):
        sim._check_int64_gemm_bound(2**31, 2**31, 64, "t")
    # the check itself is Python-int exact: just under the bound passes
    import math

    m = math.isqrt(2**62 // 2) // 2 - 1
    sim._check_int64_gemm_bound(m, m, 2, "t")
    with pytest.raises(ValueError, match="int64 GEMM overflow"):
        sim._check_int64_gemm_bound(m * 2, m * 2, 2, "t")


def test_kmeans_gemm_raises_on_overflow_risk(spark):
    # scale=10**9 quantizes unit-ish components to ~1e9; at dim=2 the
    # distance-combination bound dim*(a+b)^2 ~ 2*(4e18) exceeds 2^62 —
    # the expression tier would compute this exactly in decimal, so the
    # gemm tier must refuse rather than silently wrap.
    df = _embed_df(
        spark, [(i, [1.0, float(i % 3) - 1.0]) for i in range(12)]
    )
    # the raise surfaces during kmeans_lloyd itself: the final
    # assignment's centroid collect executes the gemm batches
    with pytest.raises(Exception, match="int64 GEMM overflow"):
        sim.kmeans_lloyd(
            df, k=2, iters=1, scale=10**9, assign_mode="gemm"
        )[0].collect()


def test_semdedup_gemm_cluster_cap_raises(spark):
    prunable = spark.createDataFrame(
        [(0, i, [i, 1], 4) for i in range(6)],
        "cluster bigint, _id bigint, _q array<bigint>, _n2 bigint",
    )
    capped = sim._semdedup_prune_gemm(
        prunable, tau_mil=950, max_gemm_cluster_rows=3
    )
    with pytest.raises(Exception, match="max_gemm_cluster_rows"):
        capped.collect()
    # under the cap the same relation prunes fine
    ok = sim._semdedup_prune_gemm(
        prunable, tau_mil=950, max_gemm_cluster_rows=10
    )
    assert ok.count() >= 0


# ---------------------------------------------------------------------------
# 2b. bpe_train auto-delegation (r11 verdict item 4: steer users off
# the measured-inert distributed merge loop)


def test_bpe_train_auto_delegates_to_local_loop(spark):
    from remap_spark.operators.text import bpe_train

    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    stats: dict = {}
    merges = bpe_train(df, n_merges=4, _stats=stats)
    # default mode='auto' ran the in-process loop (the vocab table
    # fits), NOT the distributed per-pass loop
    assert stats == {"delegated": True}
    # and the learned rules are identical to the distributed tier
    assert merges == bpe_train(df, n_merges=4, mode="distributed")
    # mode='local' raises loudly past the cap instead of collecting
    with pytest.raises(ValueError, match="max_table_rows"):
        bpe_train(df, n_merges=4, mode="local", max_table_rows=2)
    # mode='auto' past the cap falls through to the distributed loop
    assert (
        bpe_train(df, n_merges=4, mode="auto", max_table_rows=2) == merges
    )
    with pytest.raises(ValueError, match="unknown mode"):
        bpe_train(df, n_merges=4, mode="cluster")


# ---------------------------------------------------------------------------
# 3. id-dtype drop-in parity


def test_assign_cells_gemm_preserves_id_type(spark):
    cands = spark.createDataFrame(
        [(i, [float(i % 4), 1.0]) for i in range(16)],
        "vec_id int, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [3.0, 1.0])], "cid bigint, cv array<double>"
    )
    out = sim._assign_cells_gemm(cands, cents, "embedding", "vec_id")
    assert dict(out.dtypes)["vec_id"] == "int"
    rows = {r["vec_id"]: r["cell"] for r in out.collect()}
    assert len(rows) == 16
    # expression tier agrees row-for-row on the same non-bigint ids
    expr = sim._assign_cells_expr(cands, cents, "embedding", "vec_id")
    erows = {r["vec_id"]: r["cell"] for r in expr.collect()}
    assert rows == erows


def test_kmeans_gemm_preserves_id_type(spark):
    df = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 3)]) for i in range(20)],
        "vec_id int, embedding array<double>",
    )
    a_gemm, _ = sim.kmeans_lloyd(df, k=2, iters=2, assign_mode="gemm")
    a_expr, _ = sim.kmeans_lloyd(df, k=2, iters=2, assign_mode="expr")
    assert dict(a_gemm.dtypes)["vec_id"] == "int"
    assert sorted(map(tuple, a_gemm.collect())) == sorted(
        map(tuple, a_expr.collect())
    )


# ---------------------------------------------------------------------------
# 4. probe materialization


def test_ivf_probe_topk_consistent_on_nondeterministic_queries(
    spark, tmp_path
):
    corpus = _embed_df(
        spark,
        [(i, [float(i % 7) + 0.1, float(i % 3) + 0.1]) for i in range(64)],
    )
    path = str(tmp_path / "ivf")
    sim.write_ivf_layout(corpus, path, n_centroids=4)
    # a nondeterministic queries input: without the localCheckpoint the
    # cells collect and the join would re-sample DIFFERENT rows
    queries = corpus.sample(0.3)
    out = sim.ivf_probe_topk(spark, path, queries, k=3, n_probe=2).collect()
    # every returned query must have ranked rows starting at 1 — a
    # probe/join mismatch would surface as query_ids with missing or
    # empty probe cells
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (q, ranks)


# ---------------------------------------------------------------------------
# 5. rolling_zscore_anomalies int64 tier (value_bound promise)


def test_rolling_zscore_int64_tier_matches_decimal(spark):
    import random

    from remap_spark.operators.timeseries import rolling_zscore_anomalies

    rng = random.Random(7)
    rows = []
    for g in range(4):
        for t in range(120):
            v = None if rng.random() < 0.05 else rng.randint(-10_000, 10_000)
            rows.append((f"g{g}", t, v))
    df = spark.createDataFrame(rows, "g string, t int, x long")
    dec = rolling_zscore_anomalies(
        df, ["g"], "t", "x", n=10, min_periods=3
    )
    i64 = rolling_zscore_anomalies(
        df, ["g"], "t", "x", n=10, min_periods=3, value_bound=10_000
    )
    assert dec.schema == i64.schema
    key = lambda r: (r.g, r.t)
    a = sorted(dec.collect(), key=key)
    b = sorted(i64.collect(), key=key)
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_rolling_zscore_int64_tier_raises_on_broken_promise(spark):
    from pyspark.errors import PySparkRuntimeError
    from py4j.protocol import Py4JJavaError

    from remap_spark.operators.timeseries import rolling_zscore_anomalies

    df = spark.createDataFrame(
        [("g", 0, 10), ("g", 1, 10_001)], "g string, t int, x long"
    )
    out = rolling_zscore_anomalies(
        df, ["g"], "t", "x", n=5, min_periods=1, value_bound=10_000
    )
    with pytest.raises((PySparkRuntimeError, Py4JJavaError, Exception)) as ei:
        out.collect()
    assert "value_bound" in str(ei.value)


def test_rolling_zscore_int64_tier_static_bound_check(spark):
    from remap_spark.operators.timeseries import rolling_zscore_anomalies

    df = spark.createDataFrame([("g", 0, 1)], "g string, t int, x long")
    # 2*k_num^2*n^2*b^2 = 18 * 900 * 1e30 >> 2^63: must raise at plan
    # time, before any job runs
    with pytest.raises(ValueError, match="2\\^63"):
        rolling_zscore_anomalies(df, ["g"], "t", "x", value_bound=10**15)

"""Round-10 additions: url_host and per-host paragraph dedup (the
crawl-curation composition the r9 verdict earmarked — pytest-tier
surface, capacity-neutral per the registry's standing rule)."""

from __future__ import annotations

import pytest


def test_url_host_extraction(spark):
    from remap_spark.operators.text import url_host

    rows = [
        ("https://WWW.Example.com/a/b?q=1",),
        ("http://example.com:8080/x",),
        ("https://user:pw@site.org/p",),
        ("ftp://Files.Site.NET",),
        ("no-scheme/path",),
        ("https://example.com",),
    ]
    df = spark.createDataFrame(rows, "url string")
    got = [r[0] for r in df.select(url_host("url")).collect()]
    assert got == [
        "www.example.com",
        "example.com",
        "site.org",
        "files.site.net",
        "",
        "example.com",
    ]


def test_dedup_paragraphs_per_host_hand_computed(spark):
    """Within-site boilerplate goes; cross-site repetition stays.
    Docs 1,2 share host a.com (footer repeated -> kept once, at the
    earlier doc); doc 3 on b.com repeats the SAME footer -> kept
    (different host). Within-doc repetition on one host page dedups
    against the earlier position."""
    from remap_spark.operators.dedup import dedup_paragraphs_per_host

    rows = [
        (1, "http://a.com/p1", "intro one\nFOOTER\nbody one"),
        (2, "http://A.COM/p2", "intro two\nFOOTER\nbody two"),
        (3, "http://b.com/p1", "intro three\nFOOTER"),
        (4, "http://b.com/p2", "dup\ndup\ntail"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string, text string")
    got = {
        r["doc"]: (r["host"], r["text"], r["n_segments"], r["n_removed"])
        for r in dedup_paragraphs_per_host(df).collect()
    }
    assert got == {
        1: ("a.com", "intro one\nFOOTER\nbody one", 3, 0),
        2: ("a.com", "intro two\nbody two", 3, 1),
        3: ("b.com", "intro three\nFOOTER", 2, 0),
        4: ("b.com", "dup\ntail", 3, 1),
    }


def test_dedup_paragraphs_per_host_matches_python_reference(spark):
    """Property test: per-host first-occurrence semantics on random
    small corpora equal a pure-Python reference (kept text, segment
    counts, removed counts)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from remap_spark.operators.dedup import dedup_paragraphs_per_host

    segs_st = st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", " "]), min_size=1, max_size=6
    )
    docs_st = st.lists(
        st.tuples(st.sampled_from(["h1", "h2"]), segs_st),
        min_size=1,
        max_size=8,
    )

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(docs=docs_st)
    def run(docs):
        rows = [
            (i, f"http://{h}.com/p{i}", "\n".join(segs))
            for i, (h, segs) in enumerate(docs)
        ]
        df = spark.createDataFrame(
            rows, "doc_id bigint, url string, text string"
        )
        got = {
            r["doc"]: (r["text"], r["n_segments"], r["n_removed"])
            for r in dedup_paragraphs_per_host(df).collect()
        }
        first: dict = {}
        want: dict = {}
        for i, (h, segs) in enumerate(docs):
            host = f"{h}.com"
            kept, n_seg, n_rm = [], 0, 0
            for pos, s in enumerate(segs):
                if not s.strip():
                    continue
                n_seg += 1
                if first.setdefault((host, s), (i, pos)) == (i, pos):
                    kept.append(s)
                else:
                    n_rm += 1
            if n_seg:
                want[i] = ("\n".join(kept), n_seg, n_rm)
        assert got == want

    run()


def test_dedup_paragraphs_per_host_single_exchange_per_side(spark):
    """Plan shape: no cartesian, no Python boundary; the
    first-occurrence aggregate is partial (map-side combine)."""
    from remap_spark.operators.dedup import dedup_paragraphs_per_host
    from remap_spark.plans import explain_str

    df = spark.createDataFrame(
        [(1, "http://a.com/x", "p\nq")],
        "doc_id bigint, url string, text string",
    )
    p = explain_str(dedup_paragraphs_per_host(df), "formatted")
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p and "MapInPandas" not in p
    assert "partial_min" in p or "HashAggregate" in p


def test_repartition_for_media_floors_at_parallelism(spark, tmp_path):
    """The byte target is a ceiling, not the only rule: a small-blob
    table whose total bytes fit in fewer byte-sized partitions than
    the cluster has cores must still fan out to defaultParallelism
    (r10 probe: 2 partitions starved 30 of 32 cores). An explicit
    min_partitions pins the count exactly."""
    import pandas as pd

    from remap_spark.operators.multimodal import repartition_for_media

    p = str(tmp_path / "media.parquet")
    pd.DataFrame(
        {"media_id": range(100), "media": [b"x" * 1000] * 100}
    ).to_parquet(p, index=False)
    df = spark.read.parquet(p)
    dp = spark.sparkContext.defaultParallelism
    assert repartition_for_media(df, 1000).rdd.getNumPartitions() == dp
    assert (
        repartition_for_media(df, 1000, min_partitions=3)
        .rdd.getNumPartitions()
        == 3
    )
    # fat rows: the byte ceiling still splits beyond the floor
    n = repartition_for_media(
        df, 5 << 20, target_partition_bytes=10 << 20,
        approx_total_rows=10_000, min_partitions=4,
    ).rdd.getNumPartitions()
    assert n == 5000


def test_cosine_topk_gemm_equals_bruteforce(spark):
    """The GEMM scale tier must return the exact same top-k rows as
    the Catalyst-expression tier (ids, ranks; cosines to float
    tolerance) — including self-exclusion and the (desc cosine,
    vec_id) tie order — on random clustered vectors."""
    import numpy as np

    from remap_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_gemm,
    )

    rng = np.random.RandomState(3)
    X = rng.randn(300, 16).astype(np.float32)
    cand = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in range(300)],
        "vec_id bigint, embedding array<float>",
    )
    qs = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in range(0, 300, 37)],
        "vec_id bigint, embedding array<float>",
    ).repartition(1)

    brute = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in cosine_topk_bruteforce(qs, cand, k=5).collect()
    }
    gemm = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in cosine_topk_gemm(qs, cand.repartition(7), k=5).collect()
    }
    assert set(brute) == set(gemm)
    for key in brute:
        assert brute[key][0] == gemm[key][0], (key, brute[key], gemm[key])
        assert abs(brute[key][1] - gemm[key][1]) < 1e-9, key
    # no query matches itself
    assert all(q != v for (q, _), (v, _c) in gemm.items())


def test_hard_negative_gemm_equals_expression(spark):
    """The GEMM hard-negative tier must return the exact same rows as
    the expression tier: same-label candidates masked, self excluded,
    (desc cosine, vec_id) order."""
    import numpy as np

    from remap_spark.operators.similarity import (
        hard_negative_topk,
        hard_negative_topk_gemm,
    )

    rng = np.random.RandomState(4)
    X = rng.randn(200, 12).astype(np.float32)
    labels = ["c%d" % (i % 4) for i in range(200)]
    cand = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]], labels[i]) for i in range(200)],
        "vec_id bigint, embedding array<float>, label string",
    )
    anchors = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]], labels[i])
         for i in range(0, 200, 23)],
        "vec_id bigint, embedding array<float>, label string",
    )
    expr = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in hard_negative_topk(anchors, cand, k=4).collect()
    }
    gemm = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in hard_negative_topk_gemm(
            anchors, cand.repartition(5), k=4
        ).collect()
    }
    assert set(expr) == set(gemm)
    for key in expr:
        assert expr[key][0] == gemm[key][0], (key, expr[key], gemm[key])
        assert abs(expr[key][1] - gemm[key][1]) < 1e-9, key

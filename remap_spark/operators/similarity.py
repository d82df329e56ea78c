"""Similarity search over embedding columns (array<float>).

Two tiers:
- brute-force cosine top-k  : exact; broadcast the (small) query set,
  scan candidates once — linear, fully parallel, no shuffle until the
  per-query top-k (which is a TakeOrdered per group, not a global sort)
- LSH-bucketed ANN          : random-hyperplane signatures; candidates
  only from matching buckets — the 100 TB path (sub-linear probes)

All vector math is JVM-side (zip_with/aggregate fold) — no UDF, no
driver collect. Pre-normalizing vectors turns cosine into a dot
product; ``normalize_embeddings`` does this once so repeated queries
skip the norm work.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import cosine_similarity, dot_product, l2_norm


def normalize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Scale vectors to unit L2 norm (cosine becomes dot product)."""
    norm = l2_norm(F.col(vec_col))
    unit = F.transform(F.col(vec_col), lambda x: x.cast("double") / norm)
    return df.withColumn(vec_col, unit)


def cosine_topk_bruteforce(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    The query set is broadcast (it must be small — driver-sized);
    candidates stream through map-side; the only shuffle is the
    per-query window. Returns (query_id, rank, vec_id, cosine)."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
    )
    c = candidates.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def _topk_gemm(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    vec_col: str,
    id_col: str,
    label_col: str | None,
) -> DataFrame:
    """Shared core of the GEMM top-k tiers: broadcast query matrix,
    one dense numpy GEMM per Arrow batch of candidates, per-batch
    local top-k (exact — top-k distributes over a partition of the
    candidates), one final per-query window. With ``label_col``,
    same-label pairs are masked out (the hard-negative contract) in
    addition to self-ids."""
    import numpy as np

    q_cols = [id_col, vec_col] + ([label_col] if label_col else [])
    q_rows = queries.select(*q_cols).collect()
    if not q_rows:
        return candidates.sparkSession.createDataFrame(
            [], "query_id bigint, rank int, vec_id bigint, cosine double"
        )
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_labels = (
        np.array([r[2] for r in q_rows], dtype=object) if label_col else None
    )
    q_norm = np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_unit = np.divide(
        q_mat, q_norm, out=np.zeros_like(q_mat), where=q_norm != 0
    )
    sc = queries.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, q_unit, q_labels))

    def local_topk(pdfs):
        import pandas as pd

        ids, unit, labels = bq.value
        for pdf in pdfs:
            if not len(pdf):
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_norm = np.linalg.norm(c_mat, axis=1, keepdims=True)
            c_unit = np.divide(
                c_mat, c_norm, out=np.zeros_like(c_mat), where=c_norm != 0
            )
            sims = unit @ c_unit.T  # nq x batch
            sims[np.equal.outer(ids, c_ids)] = -np.inf  # self-exclusion
            if labels is not None:
                c_labels = np.array(list(pdf[label_col]), dtype=object)
                sims[labels[:, None] == c_labels[None, :]] = -np.inf
            kk = min(k, sims.shape[1])
            # per-query local top-k with (desc sim, asc id) tie order
            order = np.lexsort((c_ids[None, :].repeat(len(ids), 0), -sims))
            top = order[:, :kk]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids, kk),
                    "vec_id": c_ids[top].ravel(),
                    "cosine": np.take_along_axis(sims, top, 1).ravel(),
                }
            )

    c_cols = [id_col, vec_col] + ([label_col] if label_col else [])
    local = candidates.select(*c_cols).mapInPandas(
        local_topk, schema="query_id bigint, vec_id bigint, cosine double"
    ).where(F.col("cosine") != float("-inf"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        local.select("*", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def cosine_topk_gemm(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine — the SCALE tier of cosine_topk_bruteforce
    (same contract and ranking: (query_id, rank, vec_id, cosine),
    desc-cosine then vec_id, self-ids excluded). The expression-based
    tier keeps the fold in Catalyst so the DuckDB oracle can replay it;
    this tier trades that replayability for BLAS: the query matrix
    (driver-sized by the shared broadcast contract) ships to every
    candidate partition, each Arrow batch runs ONE dense numpy GEMM
    (nq x batch) and emits only its per-query local top-k (k rows per
    query per batch — top-k distributes over a partition of the
    candidates), and one final per-query window reduces local to
    global. r10 probe, 100 queries x 100k 64-dim vectors: 137.3 s
    expression tier -> 3.7 s this tier (37x) at recall 1.000, pinned
    row-identical to the expression tier by
    tests/test_round10.test_cosine_topk_gemm_equals_bruteforce.
    Shuffle volume is k x queries x partitions rows — independent of
    corpus size.

    Row-identity caveats (degenerate inputs): the claim holds for
    NON-ZERO-NORM vectors — a zero-norm vector makes the expression
    tier's dot/(na*nb) raise DIVIDE_BY_ZERO under Spark 4 ANSI mode,
    while this tier guards (where=norm!=0) and scores such pairs at
    cosine 0.0. The tiers also compute cosine by different float
    formulas (unit-normalize-then-dot here vs dot/(na*nb) there), so
    an exact float TIE in one tier can rank differently in the other;
    real-valued embeddings make that probability-zero, but synthetic
    integer fixtures can hit it."""
    return _topk_gemm(queries, candidates, k, vec_col, id_col, None)


def hard_negative_topk_gemm(
    anchors: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """GEMM scale tier of :func:`hard_negative_topk` — identical
    contract (top-k most-similar DIFFERENT-label candidates per
    anchor, desc-cosine then vec_id), the same-label mask applied
    per Arrow batch on the sims matrix instead of a crossJoin
    predicate. Row-identical to the expression tier
    (tests/test_round10.test_hard_negative_gemm_equals_expression);
    same per-batch-local-top-k exactness argument as
    cosine_topk_gemm."""
    return _topk_gemm(anchors, candidates, k, vec_col, id_col, label_col)


def hard_negative_topk(
    anchors: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive / retrieval training
    (the ANCE recipe, Xiong et al. 2021): for each anchor vector, the
    top-k most-similar vectors with a DIFFERENT label — the negatives
    near the decision boundary that actually train it; random
    negatives are trivially separable and teach nothing.

    Shape mirrors cosine_topk_bruteforce: the anchor set is the small,
    broadcast side (per-batch anchor mining is how this runs at scale —
    nobody mines all 10^9 anchors in one pass); candidates stream
    map-side; one per-anchor window ranks. At 100 TB swap the
    crossJoin for the IVF cell-probe join (ivf_topk) — the label
    filter composes unchanged."""
    a = F.broadcast(
        anchors.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.col(label_col).alias("qlabel"),
        )
    )
    c = candidates.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cv"),
        F.col(label_col).alias("clabel"),
    )
    scored = (
        a.crossJoin(c)
        .where(
            (F.col("query_id") != F.col("vec_id"))
            & (F.col("qlabel") != F.col("clabel"))
        )
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (LCG — no numpy
    dependency on executors, reproducible everywhere)."""
    state = seed * 6364136223846793005 + 1442695040888963407
    planes = []
    for _ in range(n_planes):
        v = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            v.append((state / (1 << 63)) * 2.0 - 1.0)
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def lsh_bucket_signatures(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Random-hyperplane (sign) LSH: bucket = n_planes-bit sign
    pattern of the vector against fixed hyperplanes. Collision
    probability = (1 - θ/π)^n_planes.

    Pass ``dim`` explicitly on large inputs — leaving it None falls
    back to sniffing the first row, which launches a Spark job per
    call."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = None
    for i, p in enumerate(planes):
        plane_col = F.array(*[F.lit(x) for x in p])
        bit = F.when(dot_product(F.col(vec_col), plane_col) >= 0, 1).otherwise(0)
        term = bit * F.lit(1 << i)
        bucket = term if bucket is None else bucket + term
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        bucket.alias("bucket"),
    )


def cosine_topk_lsh(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
    probe_hamming: int = 0,
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's LSH
    bucket. Recall < 1 by construction; ``probe_hamming=1`` enables
    MULTI-PROBE — each query additionally probes every bucket whose
    sign signature differs by one bit (the n_planes nearest buckets,
    where a near-neighbor most likely lands when a single hyperplane
    margin was crossed) — lifting recall at fixed n_planes for a
    bounded (n_planes+1)x candidate growth. The probe expansion lives
    on the broadcast QUERY side (an explode of xor'd bucket ids), so
    the corpus is still bucketed once and never rescanned; each
    candidate sits in exactly one bucket and probed buckets are
    distinct, so no pair is scored twice. At 100 TB this turns a
    full-corpus scan per query into n_planes+1 bucket lookups."""
    qsig = (
        lsh_bucket_signatures(queries, vec_col, id_col, n_planes, seed, dim)
        .withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("vec", "qv")
    )
    if probe_hamming >= 1:
        # Hamming<=1 perturbations; higher orders grow combinatorially
        # and are better served by a second hash table (different seed)
        masks = [0] + [1 << i for i in range(n_planes)]
        qsig = qsig.select(
            "query_id",
            "qv",
            F.explode(
                F.array(
                    *[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks]
                )
            ).alias("bucket"),
        )
    qb = F.broadcast(qsig)
    cb = lsh_bucket_signatures(candidates, vec_col, id_col, n_planes, seed, dim)
    scored = (
        qb.join(cb, "bucket")
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("qv"), F.col("vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def _assign_cells_expr(
    candidates: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    id_col: str,
    include_vec: bool = True,
) -> DataFrame:
    """Expression-tier nearest-centroid assignment — the
    oracle-replayable form shared by ivf_topk / ivf_pq_topk /
    write_ivf_layout: candidates x broadcast centroids through the
    Catalyst cosine expression, argmax as a lexicographic struct-MIN
    aggregate with map-side partials (r12; the kmeans argmin rewrite):
    the corpus x n_centroids intermediate collapses to one row per
    vector BEFORE the exchange, and the former row_number window's
    corpus-wide sort disappears. The min key is (-sim, cid) with NaN
    mapped to -infinity so the selection is identical to the old
    orderBy(desc(sim), cid) row_number — Spark sorts NaN above every
    double, so a NaN sim won under desc and must win under min too
    (cosine is in [-1, 1] or NaN, so -inf cannot collide with a real
    key). cid is unique within a vector's group, so the tie chain
    never reaches the carried vector payload. The GEMM tier below is
    the measured 100 TB path (SCALE.md r11: 15.8x at 100k vectors).
    Returns (vec_id, vec, cell) or (vec_id, cell)."""
    cent = F.broadcast(centroids.select("cid", "cv"))
    neg_key = F.when(
        F.isnan(F.col("sim")), F.lit(float("-inf"))
    ).otherwise(-F.col("sim"))
    payload = (
        [F.col("cv2").alias("vec")] if include_vec else []
    )
    out_cols = (
        ["vec_id", F.col("_m.vec").alias("vec"), F.col("_m.cid").alias("cell")]
        if include_vec
        else ["vec_id", F.col("_m.cid").alias("cell")]
    )
    return (
        candidates.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv2")
        )
        .crossJoin(cent)
        .select(
            "vec_id",
            "cv2",
            "cid",
            cosine_similarity(F.col("cv2"), F.col("cv")).alias("sim"),
        )
        .groupBy("vec_id")
        .agg(
            F.min(
                F.struct(
                    neg_key.alias("_k"), F.col("cid").alias("cid"), *payload
                )
            ).alias("_m")
        )
        .select(*out_cols)
    )


def _assign_cells_gemm(
    candidates: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    id_col: str,
    include_vec: bool = True,
) -> DataFrame:
    """Map-side nearest-centroid assignment — the SCALE tier of
    ivf_topk's coarse quantization. The centroid matrix (codebook-sized
    by definition: the collect is n_centroids rows, covered by the
    action lint's driver-sized contract for similarity.py) broadcasts
    to every candidate partition; each Arrow batch runs ONE dense numpy
    GEMM (batch x n_centroids) and an argmax — NO shuffle, NO window,
    NO corpus x n_centroids intermediate. Ties break to the lowest cid
    (centroid rows are cid-sorted, so argmax's first-hit rule matches
    the expression tier's orderBy(desc sim, cid)); zero-norm vectors
    assign to the lowest cid at similarity 0. Returns
    (vec_id, vec, cell), or (vec_id, cell) with ``include_vec=False``
    (the IVF-PQ caller only needs the cell — keeping the vector out of
    the Arrow round-trip halves the boundary bytes)."""
    import numpy as np

    cent_rows = sorted(
        centroids.select("cid", "cv").collect(), key=lambda r: r["cid"]
    )
    c_ids = np.array([r["cid"] for r in cent_rows], dtype=np.int64)
    c_mat = np.array([r["cv"] for r in cent_rows], dtype=np.float64)
    n = np.linalg.norm(c_mat, axis=1, keepdims=True)
    c_unit = np.divide(c_mat, n, out=np.zeros_like(c_mat), where=n != 0)
    bc = candidates.sparkSession.sparkContext.broadcast((c_ids, c_unit))

    # derive BOTH column types from the caller's schema (the expr tier
    # preserves whatever id_col type arrives — a hardcoded bigint here
    # would crash or silently coerce string/decimal ids only in this
    # tier, breaking the drop-in equivalence; r11 ADVICE, low)
    vec_type = candidates.schema[vec_col].dataType.simpleString()
    id_type = candidates.schema[id_col].dataType.simpleString()
    if include_vec:
        out_schema = f"vec_id {id_type}, vec {vec_type}, cell bigint"
    else:
        out_schema = f"vec_id {id_type}, cell bigint"

    def assign_batches(pdfs):
        import pandas as pd

        ids, unit = bc.value
        for pdf in pdfs:
            if not len(pdf):
                continue
            mat = np.array(list(pdf["vec"]), dtype=np.float64)
            nn = np.linalg.norm(mat, axis=1, keepdims=True)
            vu = np.divide(mat, nn, out=np.zeros_like(mat), where=nn != 0)
            best = np.argmax(vu @ unit.T, axis=1)
            out = {"vec_id": pdf["vec_id"]}
            if include_vec:
                out["vec"] = pdf["vec"]
            out["cell"] = ids[best]
            yield pd.DataFrame(out)

    return candidates.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    ).mapInPandas(assign_batches, schema=out_schema)


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    assign: str = "expr",
) -> DataFrame:
    """IVF-flat approximate top-k: candidates are pre-assigned to the
    cell of their nearest coarse centroid (one broadcast pass, linear);
    each query scores only the ``n_probe`` cells nearest to it.

    The default coarse quantizer is DETERMINISTIC — the ``n_centroids``
    lowest-id candidate vectors — so the oracle can replay it. Pass
    ``centroids`` (columns: cid, cv float-array) to use a TRAINED
    codebook instead — e.g. kmeans_lloyd's output dequantized — with
    everything downstream identical (composition asserted in
    test_extensions.test_ivf_with_trained_centroids). At 100 TB the
    assignment pass writes (cell) as a partition column so probes
    become partition-pruned scans.

    ``assign`` picks the quantization tier. ``"expr"`` (default — the
    registered oracle query's replayable form) scores candidates x
    centroids through the Catalyst cosine expression and argmins via a
    per-vector window: a corpus x n_centroids intermediate plus a
    corpus-sized shuffle — fine at oracle scale, the measured
    bottleneck at 100k+ vectors (r10 probe: 68-82 s of the IVF wall).
    ``"gemm"`` (the SCALE tier) replaces that pass with
    :func:`_assign_cells_gemm`: map-side numpy argmax against the
    broadcast codebook — no shuffle, no window, no blown-up
    intermediate; assignment ties and results pinned identical to the
    expression tier on non-degenerate (non-zero-norm, tie-free) inputs
    by tests/test_round11.test_ivf_gemm_assignment_matches_expression.
    Everything downstream (probe selection, cell join, final window)
    is identical."""
    if centroids is None:
        centroids = candidates.where(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
        )
    cent = F.broadcast(centroids.select("cid", "cv"))
    if assign == "gemm":
        assign_df = _assign_cells_gemm(candidates, centroids, vec_col, id_col)
    else:
        assign_df = _assign_cells_expr(candidates, centroids, vec_col, id_col)
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("sim"), "cid")
    probes = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .crossJoin(cent)
        .select(
            "query_id",
            "qv",
            "cid",
            cosine_similarity(F.col("qv"), F.col("cv")).alias("sim"),
        )
        .select("*", F.row_number().over(w_probe).alias("rn"))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "qv", F.col("cid").alias("cell"))
    )
    scored = (
        F.broadcast(probes)
        .join(assign_df, "cell")
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("qv"), F.col("vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def write_ivf_layout(
    candidates: DataFrame,
    path: str,
    n_centroids: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    assign: str = "gemm",
) -> None:
    """Materialize the IVF layout the ivf_topk docstring promises at
    100 TB: the corpus written ONCE partitioned by its coarse cell
    (``<path>/corpus``, parquet partition column ``cell``) plus the
    codebook (``<path>/centroids``), so every subsequent probe is a
    PARTITION-PRUNED scan — n_probe/n_centroids of the corpus bytes
    read per query batch, enforced by the planner rather than by a
    filter over a full scan (plan-pinned: PartitionFilters in
    tests/test_round11.py). Assignment defaults to the map-side GEMM
    tier (one linear pass, no shuffle beyond the write's own
    partitioning); ``assign='expr'`` keeps the oracle-replayable
    expression form. Same deterministic default quantizer as ivf_topk."""
    if centroids is None:
        centroids = candidates.where(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
        )
    if assign == "gemm":
        assigned = _assign_cells_gemm(candidates, centroids, vec_col, id_col)
    else:
        assigned = _assign_cells_expr(candidates, centroids, vec_col, id_col)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/corpus"
    )
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_probe_topk(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Query a :func:`write_ivf_layout` corpus: pick each query's
    ``n_probe`` nearest cells against the stored codebook (broadcast,
    query-sized), then scan ONLY those cells' partitions — the probe
    cell set (driver-sized: queries x n_probe ids; the same bounded
    contract as the GEMM tiers' query collect) is pushed as a static
    partition filter, so the scan's PartitionFilters prune at plan
    time and the corpus bytes read scale with n_probe/n_centroids,
    not corpus size. Scoring and ranking are ivf_topk's exactly —
    row-identical on the same centroids + assignment (pinned by
    tests/test_round11.py)."""
    cents = F.broadcast(spark.read.parquet(f"{path}/centroids"))
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("sim"), "cid")
    probes = (
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
        .crossJoin(cents)
        .select(
            "query_id",
            "qv",
            "cid",
            cosine_similarity(F.col("qv"), F.col("cv")).alias("sim"),
        )
        .select("*", F.row_number().over(w_probe).alias("rn"))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "qv", F.col("cid").alias("cell"))
    )
    # materialize ONCE before the cells collect: the probe subtree is
    # otherwise evaluated twice (here and inside the returned join),
    # and a nondeterministic queries input (sample/limit/rand
    # upstream) could recompute DIFFERENT probes at action time than
    # the cell set collected for the partition filter — silently
    # dropping candidate cells from the scan (r11 ADVICE, low). The
    # checkpoint is query-relation-sized (queries x n_probe rows),
    # inside the same bounded-driver contract as the collect below.
    probes = probes.localCheckpoint(eager=True)
    cells = [r["cell"] for r in probes.select("cell").distinct().collect()]
    if not cells:  # empty query set: empty result, correct schema
        return spark.createDataFrame(
            [], "query_id bigint, rank int, vec_id bigint, cosine double"
        )
    corpus = spark.read.parquet(f"{path}/corpus").where(
        F.col("cell").isin(cells)
    )
    scored = (
        F.broadcast(probes)
        .join(corpus, "cell")
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("qv"), F.col("vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


_PAIR_SCHEMA = "vec_a bigint, vec_b bigint, cosine double"


# Headroom bound for the exact-integer GEMM tiers: every intermediate
# (dot product, squared norm, distance combination) must stay under
# 2^62 so the int64 matmul cannot wrap. numpy int64 overflow wraps
# SILENTLY where the Spark ANSI bigint expression tier would raise —
# the tiers' bit-identity contract therefore requires checking the
# bound, not documenting it (r11 ADVICE, medium).
_INT64_GEMM_HEADROOM = 2**62


def _check_int64_gemm_bound(
    max_abs_a: int, max_abs_b: int, dim: int, context: str
) -> None:
    """Raise before an int64 GEMM whose intermediates could exceed
    2^62. The conservative bound covers dots (dim*a*b), squared norms
    (dim*a^2 / dim*b^2), and the distance combination
    |x|^2 - 2x.c + |c|^2 <= dim*(a+b)^2 — computed in Python ints, so
    the check itself cannot overflow. Unit-ish embeddings at the
    default scale=1e6 give max_abs ~1e6 and 64*(2e6)^2 ~ 2.6e14,
    comfortably inside; quantized components beyond ~2.6e8 at dim=64
    trip the guard instead of silently wrapping."""
    bound = dim * (int(max_abs_a) + int(max_abs_b)) ** 2
    if bound >= _INT64_GEMM_HEADROOM:
        raise ValueError(
            f"{context}: int64 GEMM overflow risk — dim={dim}, "
            f"max|component|={max(max_abs_a, max_abs_b)} gives "
            f"intermediate bound {bound} >= 2^62. Reduce the "
            "quantization scale or use the expression tier "
            "(assign_mode/pair_mode='expr'), which computes in "
            "arbitrary-precision decimal and errors loudly under "
            "ANSI mode instead of wrapping."
        )


def _gemm_pairs(a_ids, a_mat, b_ids, b_mat, threshold: float, same: bool):
    """Dense cosine GEMM between two id/matrix sides; emits each
    qualifying unordered pair once as (min_id, max_id, cosine)."""
    import numpy as np
    import pandas as pd

    a_norms = np.sqrt((a_mat * a_mat).sum(axis=1))
    b_norms = np.sqrt((b_mat * b_mat).sum(axis=1))
    sims = (a_mat @ b_mat.T) / np.outer(a_norms, b_norms)
    mask = sims >= threshold
    if same:
        mask &= a_ids[:, None] < b_ids[None, :]
    else:
        mask &= a_ids[:, None] != b_ids[None, :]
    ai, bj = np.nonzero(mask)
    lo = np.minimum(a_ids[ai], b_ids[bj])
    hi = np.maximum(a_ids[ai], b_ids[bj])
    return pd.DataFrame({"vec_a": lo, "vec_b": hi, "cosine": sims[ai, bj]})


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_blocks: int = 8,
) -> DataFrame:
    """All pairs with cosine >= threshold — EXACT, fully distributed.

    Block-pair decomposition: vectors hash into ``n_blocks`` blocks by
    id; every unordered block pair (i <= j) becomes one group that runs
    a single dense numpy GEMM over its two sides. Each vector is
    replicated ``n_blocks`` times (one copy per partner block), so the
    cluster sees O(n·B) rows shuffled and O(n²) flops spread over
    B·(B+1)/2 independent tasks — nothing is ever collected to the
    driver, and no single task holds more than ~2n/B vectors. Grow
    ``n_blocks`` with the corpus so a block side stays executor-sized
    (64-dim float64 → ~0.5 GB per million vectors per side).

    Exactness: a pair lands in exactly one group — (block_a, block_b)
    sorted — so no dedup pass is needed and the output matches the
    naive all-pairs join row for row. The O(n²) flops are inherent to
    the exact tier; for the approximate/cheap tier over billions of
    docs use ``embedding_near_dup_pairs_lsh``."""
    import numpy as np

    block = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks))
    partners = F.explode(F.array(*[F.lit(p) for p in range(n_blocks)])).alias("p")
    exploded = (
        df.select(F.col(id_col), F.col(vec_col), block.alias("block"))
        .select(id_col, vec_col, "block", partners)
        .select(
            F.least("block", "p").alias("bi"),
            F.greatest("block", "p").alias("bj"),
            "block",
            F.col(id_col),
            F.col(vec_col),
        )
        # each vector yields exactly one row per partner block: p == block
        # lands it once in the diagonal group (i,i); p != block lands it
        # once in the off-diagonal (min,max) group — no dedup needed
    )

    def gemm_group(pdf):
        import pandas as pd

        bi, bj = int(pdf["bi"].iloc[0]), int(pdf["bj"].iloc[0])
        same = bi == bj
        a = pdf[pdf["block"] == bi]
        a_ids = a[id_col].to_numpy(dtype=np.int64)
        a_mat = np.array(list(a[vec_col]), dtype=np.float64)
        if same:
            if len(a) < 2:
                return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
            return _gemm_pairs(a_ids, a_mat, a_ids, a_mat, threshold, same=True)
        b = pdf[pdf["block"] == bj]
        if not len(a) or not len(b):
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
        b_ids = b[id_col].to_numpy(dtype=np.int64)
        b_mat = np.array(list(b[vec_col]), dtype=np.float64)
        return _gemm_pairs(a_ids, a_mat, b_ids, b_mat, threshold, same=False)

    return exploded.groupBy("bi", "bj").applyInPandas(gemm_group, schema=_PAIR_SCHEMA)


def embedding_near_dup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate near-dup pairs: candidates only from the same
    random-hyperplane bucket, dense GEMM within each bucket — the
    100 TB tier. Recall for a pair at angle θ is (1 - θ/π)^n_planes,
    so this fits HIGH thresholds (true near-dups, cosine ≳ 0.8);
    a 0.4-threshold sweep belongs to the exact block-pair tier.
    Each pair appears in at most one bucket (full-signature equality),
    so output needs no dedup and is a deterministic subset of the
    exact result."""
    import numpy as np

    bucketed = lsh_bucket_signatures(df, vec_col, id_col, n_planes, seed, dim)

    def gemm_bucket(pdf):
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf["vec"]), dtype=np.float64)
        return _gemm_pairs(ids, mat, ids, mat, threshold, same=True)

    return bucketed.groupBy("bucket").applyInPandas(gemm_bucket, schema=_PAIR_SCHEMA)


def kmeans_lloyd(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    iters: int = 3,
    scale: int = 1_000_000,
    assign_mode: str = "expr",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic Lloyd k-means over an embedding column — the
    clustering tier of semantic dedup / corpus curation (cluster, then
    sample or drop per cluster). Returns ``(assignment, centroids)``:
    ``assignment`` is (id, cluster) under the FINAL centroids;
    ``centroids`` is (cluster, centroid) as a quantized int array.

    ``assign_mode`` picks the per-iteration assignment tier.
    ``"expr"`` (default — the registered oracle query's replayable
    form) scores points x centroids through the Catalyst
    zip_with/aggregate distance and argmins via a per-point window: a
    points x k intermediate plus a point-table-sized shuffle per
    iteration. ``"gemm"`` collects the k centroids each iteration
    (model-sized by definition — the classic driver-resident-model
    kmeans loop; action-lint contract) and assigns map-side per Arrow
    batch: |x|^2 - 2x.c + |c|^2 via ONE int64 matmul — every quantity
    an exact integer (64-dim dots of scale-quantized components sit
    far under 2^63), argmin first-hit on the cluster-sorted codebook
    = the min-cluster-id tie rule — so assignments, centroid updates,
    and the final output are BIT-IDENTICAL to the expression tier
    (pinned by tests/test_round11.py), with no shuffle, no window,
    and no points x k blow-up.

    Engine-portable by construction: vectors are quantized to int64 at
    ``scale`` (ROUND(x * scale) — identical IEEE double multiply +
    half-away-from-zero round in Spark and DuckDB), so every distance
    is an exact integer sum, every argmin tie breaks on cluster id, and
    centroid updates use FLOOR(sum/count) in exact arithmetic. No
    float-summation-order nondeterminism anywhere — the same property
    the decimal aggregates give the relational queries.

    Seeding is the k smallest ids' vectors (a real system would use
    k-means|| — the seeding is config, the operator shape is the
    contract). Scale: per iteration, one broadcast of k centroids into
    a map-side distance scan (no shuffle on the points), one
    row_number per point (hash-partitioned by id), and one
    (cluster, pos)-keyed centroid aggregation of k*dim rows — the
    point table is never reshuffled across iterations. Lineage is cut
    per round with localCheckpoint, the same pattern as
    operators/pregel (pagerank)."""
    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * scale).cast("bigint"),
    )
    # repartition by id BEFORE the iteration: the per-iteration distance
    # scan's parallelism is the point table's partitioning (no shuffle
    # inside the loop — that's the design), and a compact parquet
    # source arrives in file-sized partitions that would serialize the
    # scan onto a few cores (measured 20k x 64-dim points, k=16: 20.1 s
    # at the source's 2 partitions vs 3.4 s after this line). Results
    # are bit-identical: assignment is per-row and the centroid update
    # is an exact integer sum — both order-independent.
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    pts = (
        df.select(F.col(id_col).alias("_pid"), q.alias("_q"))
        .repartition(n_part, F.col("_pid"))
        .localCheckpoint(eager=False)
    )
    cents = pts.where(F.col("_pid") < k).select(
        F.col("_pid").alias("cluster"), F.col("_q").alias("_cq")
    )
    dist = F.aggregate(
        F.zip_with("_q", "_cq", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )

    def _assign_expr(cents: DataFrame) -> DataFrame:
        # argmin as MIN(struct(_d, cluster, _q)) — struct comparison is
        # lexicographic, so the winner is the (min distance, min
        # cluster-id) row: byte-identical to the former row_number()
        # over orderBy(_d, cluster) (all-integer values, no FP ties),
        # but a HASH AGGREGATE with map-side partials instead of a
        # per-point sort window (guide §2.3 "aggregate before you
        # shuffle"); (_d, cluster) is unique per point, so the trailing
        # _q never participates in the comparison.
        return (
            pts.crossJoin(F.broadcast(cents))
            .select("_pid", "_q", "cluster", dist.alias("_d"))
            .groupBy("_pid")
            .agg(F.min(F.struct("_d", "cluster", "_q")).alias("_m"))
            .select(
                "_pid",
                F.col("_m._q").alias("_q"),
                F.col("_m.cluster").alias("cluster"),
            )
        )

    # the gemm tier must be a drop-in for the expr tier, which
    # preserves the caller's id type — derive it rather than hardcode
    # bigint (r11 ADVICE, low); seeding already requires a numeric id
    # (`_pid < k`), so any Spark integral/floating id type round-trips
    # Arrow unchanged.
    pid_type = df.schema[id_col].dataType.simpleString()

    def _assign_gemm(cents: DataFrame) -> DataFrame:
        import numpy as np

        rows = sorted(
            cents.select("cluster", "_cq").collect(), key=lambda r: r["cluster"]
        )
        c_ids = np.array([r["cluster"] for r in rows], dtype=np.int64)
        c_mat = np.array([r["_cq"] for r in rows], dtype=np.int64)
        c_max = int(np.abs(c_mat).max()) if c_mat.size else 0
        c_n2 = (c_mat * c_mat).sum(axis=1)
        bc = df.sparkSession.sparkContext.broadcast((c_ids, c_mat, c_n2, c_max))

        def go(pdfs):
            import pandas as pd

            ids, cmat, cn2, cmax = bc.value
            for pdf in pdfs:
                if not len(pdf):
                    continue
                mat = np.array(list(pdf["_q"]), dtype=np.int64)
                _check_int64_gemm_bound(
                    int(np.abs(mat).max()) if mat.size else 0,
                    cmax,
                    mat.shape[1] if mat.ndim == 2 else 0,
                    "kmeans_lloyd(assign_mode='gemm')",
                )
                xn2 = (mat * mat).sum(axis=1)
                d = xn2[:, None] - 2 * (mat @ cmat.T) + cn2[None, :]
                best = np.argmin(d, axis=1)  # first-hit = min cluster id
                yield pd.DataFrame(
                    {
                        "_pid": pdf["_pid"],
                        "_q": pdf["_q"],
                        "cluster": ids[best],
                    }
                )

        # cluster ids are seed point ids, so they carry pid_type in the
        # expr tier too — declare the same type for drop-in parity
        return pts.mapInPandas(
            go, schema=f"_pid {pid_type}, _q array<bigint>, cluster {pid_type}"
        )

    _assign = _assign_gemm if assign_mode == "gemm" else _assign_expr

    for _ in range(iters):
        assign = _assign(cents)
        cents = (
            assign.select("cluster", F.posexplode("_q").alias("_pos", "_v"))
            .groupBy("cluster", "_pos")
            .agg(
                F.floor(
                    F.sum("_v").cast("double") / F.count("*")
                ).alias("_m")
            )
            .groupBy("cluster")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("_pos", "_m"))
                ).alias("_s")
            )
            .select(
                "cluster",
                F.transform("_s", lambda s: s["_m"]).alias("_cq"),
            )
            .localCheckpoint(eager=False)
        )
    final = _assign(cents).select(F.col("_pid").alias(id_col), "cluster")
    centroids = cents.select("cluster", F.col("_cq").alias("centroid"))
    return final, centroids


def _quantized(vec_col: str, scale: int) -> Column:
    """int64-quantized vector (the kmeans_lloyd determinism contract:
    identical IEEE double multiply + half-away-from-zero round in
    Spark and DuckDB, so every downstream distance is an exact
    integer)."""
    return F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * scale).cast("bigint"),
    )


def _semdedup_prune_gemm(
    prunable: DataFrame,
    tau_mil: int,
    max_gemm_cluster_rows: int = 20_000,
) -> DataFrame:
    """Within-cluster near-duplicate drops via one int64 GEMM per
    cluster — the scale tier of semdedup's pairwise prune, with the
    expression tier's EXACT integer semantics: drop j iff some i < j
    in its cluster has dot > 0 and dot^2 * 10^6 >= tau^2 * n_i^2 *
    n_j^2. The dot matrix is exact (int64 matmul; 64-dim dots of
    ~scale-bounded components are < 2^53); the squared-threshold
    inequality is screened in float64 and any pair inside the 1e-9
    relative borderline band is re-decided with arbitrary-precision
    Python ints, so the drop set is bit-identical to the decimal(38,0)
    expression, not float-approximate. Input: (cluster, _id, _q, _n2)
    restricted to prunable clusters (the caller's max_cluster_size cap
    bounds the per-cluster size^2 matrix). Returns one (_id) row per
    dropped point per cluster.

    ``max_gemm_cluster_rows`` is the enforced skew guard (r11 ADVICE,
    low — mirroring bpe_train_local's max_table_rows contract): a
    cluster larger than the bound would build an n^2 int64 dot matrix
    inside ONE task (20k rows -> 3.2 GB); instead of OOM-ing that
    executor the group raises with the cap to set. The expression
    tier degrades to a large-but-distributed join for such clusters —
    use it (pair_mode='expr') or pass semdedup(max_cluster_size=...)
    to split them."""
    import numpy as np

    tau2 = tau_mil * tau_mil

    def prune(pdf):
        import pandas as pd

        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"_id": np.empty(0, dtype=np.int64)})
        if n > max_gemm_cluster_rows:
            raise ValueError(
                f"semdedup(pair_mode='gemm'): cluster of {n} rows exceeds "
                f"max_gemm_cluster_rows={max_gemm_cluster_rows} — the dense "
                f"n^2 dot matrix ({8 * n * n / 1e9:.1f} GB) would OOM one "
                "executor. Pass max_cluster_size to split skewed clusters, "
                "raise max_gemm_cluster_rows if the executors have room, "
                "or use pair_mode='expr' (distributed join)."
            )
        order = np.argsort(pdf["_id"].to_numpy(dtype=np.int64), kind="stable")
        ids = pdf["_id"].to_numpy(dtype=np.int64)[order]
        mat = np.array(list(pdf["_q"].iloc[order]), dtype=np.int64)
        m_abs = int(np.abs(mat).max()) if mat.size else 0
        _check_int64_gemm_bound(
            m_abs, m_abs, mat.shape[1] if mat.ndim == 2 else 0,
            "semdedup(pair_mode='gemm')",
        )
        n2 = pdf["_n2"].to_numpy(dtype=np.int64)[order]
        dots = mat @ mat.T
        iu, ju = np.triu_indices(n, k=1)
        d = dots[iu, ju]
        pos = d > 0
        df_ = d.astype(np.float64)
        lhs = df_ * df_ * 1e6
        rhs = float(tau2) * n2[iu].astype(np.float64) * n2[ju].astype(np.float64)
        ge = lhs >= rhs
        # ulp-borderline band: re-decide exactly with Python ints
        denom = np.maximum(np.abs(lhs), np.abs(rhs))
        border = np.abs(lhs - rhs) <= 1e-9 * denom
        for t in np.nonzero(border & pos)[0]:
            di = int(d[t])
            ge[t] = di * di * 1_000_000 >= tau2 * int(n2[iu[t]]) * int(
                n2[ju[t]]
            )
        drop_j = np.unique(ju[pos & ge])
        return pd.DataFrame({"_id": ids[drop_j]})

    return prunable.select("cluster", "_id", "_q", "_n2").groupBy(
        "cluster"
    ).applyInPandas(prune, schema="_id bigint")


def semdedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 3,
    tau_mil: int = 950,
    scale: int = 1_000_000,
    max_cluster_size: int | None = None,
    pair_mode: str = "expr",
    assign_mode: str = "expr",
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    embedding space with :func:`kmeans_lloyd`, then prune near-
    duplicates WITHIN each cluster — a point is dropped iff some
    lower-id point in its cluster has cosine similarity >=
    ``tau_mil``/1000 with it (the deterministic keep-lowest-id form of
    the paper's one-per-duplicate-group rule; no transitive closure).
    Returns (``id_col``, cluster, dropped) for every input point.

    ``pair_mode`` picks the within-cluster pruning tier. ``"expr"``
    (default — the registered oracle query's replayable form) scores
    each candidate pair through the Catalyst zip_with/aggregate dot:
    exact, but ~orders slower than BLAS per element (the r10/r11 probe
    theme). ``"gemm"`` computes the SAME exact integer semantics per
    cluster in numpy: one int64 matmul for all pairwise dots (exact —
    quantized components stay ~<= scale for unit-ish vectors, so
    64-dim dots are < 2^53 and far under int64), a float64 screen on
    the squared-threshold inequality, and an arbitrary-precision
    Python-int recheck for the ulp-borderline band — so drops are
    BIT-IDENTICAL to the expression tier (pinned by
    tests/test_round11.py), not float-approximate. Cluster matrices
    are bounded by ``max_cluster_size`` (the skew dial); a cluster
    that still exceeds the gemm tier's enforced per-task bound
    (``_semdedup_prune_gemm``'s max_gemm_cluster_rows, default 20k
    rows) RAISES with the cap to set instead of building a size^2
    dot matrix that would OOM one executor, and components large
    enough to overflow the int64 dots raise via
    ``_check_int64_gemm_bound`` instead of silently wrapping.
    ``assign_mode`` forwards to kmeans_lloyd the same way (its "gemm"
    tier is integer-exact too, so ("gemm", "gemm") is still
    bit-identical to the oracle form end-to-end — the full scale
    configuration).

    Exact integer arithmetic throughout, so the DuckDB oracle
    hash-matches: vectors int64-quantized at ``scale``; the cosine
    test  cos >= tau  becomes  dot > 0 AND dot^2 * 10^6 >=
    tau_mil^2 * |a|^2 * |b|^2  in decimal(38,0) — for 64-dim unit-norm
    vectors dot^2*10^6 < 10^32 and tau^2*na*nb < 10^34, both inside
    38 digits; no float comparison anywhere.

    Scale shape: the pairwise stage is the cluster-keyed self-join —
    candidate volume is sum over clusters of size^2, the quantity ``k``
    controls (SemDeDup at corpus scale runs k ~ sqrt(n) so clusters
    stay small). ``max_cluster_size`` is the skew guard: clusters
    above the cap pass through UNPRUNED (conservative — no drops) and
    deterministically, the same dial as blocking's max_block_size;
    the oracle replays the cap. No cartesian, no driver collect; the
    kmeans stage is the documented one-broadcast-per-iteration plan."""
    assign, _cents = kmeans_lloyd(
        df,
        vec_col=vec_col,
        id_col=id_col,
        k=k,
        iters=iters,
        scale=scale,
        assign_mode=assign_mode,
    )
    # pts feeds both sides of the self-join plus the final output join;
    # no lineage cut here — the exchange is identical on both join
    # sides so ReusedExchange dedupes it, and an explicit
    # localCheckpoint measured SLOWER fresh (6.21 vs 5.59 s at sf0.1:
    # materializing the quantized corpus costs more than replaying the
    # already-checkpointed-centroid assignment scan)
    pts = (
        df.select(
            F.col(id_col).alias("_id"), _quantized(vec_col, scale).alias("_q")
        )
        .join(assign.withColumnRenamed(id_col, "_id"), "_id")
        .withColumn(
            "_n2",
            F.aggregate(
                F.zip_with("_q", "_q", lambda a, b: a * b),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ),
        )
    )
    if max_cluster_size is not None:
        sizes = pts.groupBy("cluster").agg(F.count(F.lit(1)).alias("_cs"))
        prunable = pts.join(
            sizes.where(F.col("_cs") <= max_cluster_size).drop("_cs"),
            "cluster",
        )
    else:
        prunable = pts
    if pair_mode == "gemm":
        dropped = (
            _semdedup_prune_gemm(prunable, tau_mil)
            .distinct()
            .withColumn("_dropped", F.lit(True))
        )
    else:
        a = prunable.select(
            "cluster",
            F.col("_id").alias("_ida"),
            F.col("_q").alias("_qa"),
            F.col("_n2").alias("_na2"),
        )
        b = prunable.select(
            "cluster",
            F.col("_id").alias("_idb"),
            F.col("_q").alias("_qb"),
            F.col("_n2").alias("_nb2"),
        )
        dot = F.aggregate(
            F.zip_with("_qa", "_qb", lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        dec = "decimal(38,0)"
        dropped = (
            a.join(b, "cluster")
            .where(F.col("_ida") < F.col("_idb"))
            .withColumn("_dot", dot)
            .where(
                (F.col("_dot") > 0)
                & (
                    F.col("_dot").cast(dec)
                    * F.col("_dot").cast(dec)
                    * F.lit(1_000_000).cast(dec)
                    >= F.lit(tau_mil * tau_mil).cast(dec)
                    * F.col("_na2").cast(dec)
                    * F.col("_nb2").cast(dec)
                )
            )
            .select(F.col("_idb").alias("_id"))
            .distinct()
            .withColumn("_dropped", F.lit(True))
        )
    return (
        pts.join(dropped, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "cluster",
            F.coalesce("_dropped", F.lit(False)).alias("dropped"),
        )
    )


def pq_codebook(
    candidates: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    scale: int = 1_000_000,
) -> DataFrame:
    """Deterministic product-quantization codebook: subspace ``s``'s
    ``k`` centroids are the k lowest-id vectors' s-th dim/m-slices,
    int64-quantized. Returns (sub, cid, cq array<bigint>). Like
    ivf_topk's coarse quantizer, the deterministic default exists so
    the oracle can replay it; pass pq_train's output for a trained
    codebook with everything downstream identical."""
    d_sub = dim // m
    q = _quantized(vec_col, scale)
    slices = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice(q, s * d_sub + 1, d_sub).alias("cq"),
            )
            for s in range(m)
        ]
    )
    return (
        candidates.where(F.col(id_col) < k)
        .select(F.col(id_col).alias("cid"), F.explode(slices).alias("x"))
        .select("x.sub", "cid", "x.cq")
    )


def pq_train(
    candidates: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-subspace Lloyd refinement of pq_codebook — ALL m subspaces
    train in one pass per iteration: the (point, sub) slice stream is
    built once, each round broadcasts the m*k centroid rows into a
    map-side argmin (no shuffle of the points), and the update is one
    (sub, cid, pos)-keyed aggregate. Same int64-quantized exact
    arithmetic as kmeans_lloyd (argmin ties break on cid, centroid
    update is FLOOR(sum/count)); lineage cut per round."""
    d_sub = dim // m
    q = _quantized(vec_col, scale)
    slices = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice(q, s * d_sub + 1, d_sub).alias("sq"),
            )
            for s in range(m)
        ]
    )
    pts = (
        candidates.select(
            F.col(id_col).alias("_pid"), F.explode(slices).alias("x")
        )
        .select("_pid", "x.sub", "x.sq")
        .localCheckpoint(eager=False)
    )
    cents = pq_codebook(candidates, m, k, vec_col, id_col, dim, scale)
    dist = F.aggregate(
        F.zip_with("sq", "cq", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    for _ in range(iters):
        # argmin as struct-MIN (r12, same as pq_encode): exact int64
        # distances, cid unique per (point, sub) group so the carried
        # sq slice is never compared
        assign = (
            pts.join(F.broadcast(cents), "sub")
            .select("_pid", "sub", "sq", "cid", dist.alias("_d"))
            .groupBy("_pid", "sub")
            .agg(F.min(F.struct("_d", "cid", "sq")).alias("_m"))
            .select(
                "_pid", "sub",
                F.col("_m.sq").alias("sq"), F.col("_m.cid").alias("cid"),
            )
        )
        cents = (
            assign.select("sub", "cid", F.posexplode("sq").alias("_pos", "_v"))
            .groupBy("sub", "cid", "_pos")
            .agg(
                F.floor(F.sum("_v").cast("double") / F.count("*")).alias("_m")
            )
            .groupBy("sub", "cid")
            .agg(
                F.array_sort(F.collect_list(F.struct("_pos", "_m"))).alias(
                    "_s"
                )
            )
            .select(
                "sub", "cid", F.transform("_s", lambda s: s["_m"]).alias("cq")
            )
            .localCheckpoint(eager=False)
        )
    return cents


def pq_encode(
    candidates: DataFrame,
    codebook: DataFrame,
    m: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    scale: int = 1_000_000,
) -> DataFrame:
    """PQ encode: each vector compressed to m uint8-sized codes (the
    argmin centroid per subspace, ties on cid). Returns (vec_id,
    codes array<int> in sub order) — dim doubles (256 B at dim=64)
    become m bytes; at 100 TB this is the compressed corpus
    representation the ADC scan reads instead of raw vectors."""
    d_sub = dim // m
    q = _quantized(vec_col, scale)
    slices = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice(q, s * d_sub + 1, d_sub).alias("sq"),
            )
            for s in range(m)
        ]
    )
    subs = candidates.select(
        F.col(id_col).alias("_pid"), F.explode(slices).alias("x")
    ).select("_pid", "x.sub", "x.sq")
    dist = F.aggregate(
        F.zip_with("sq", "cq", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    # per-(vector, subspace) argmin as a lexicographic struct-MIN
    # aggregate (r12; same rewrite as kmeans/_assign_cells_expr): the
    # distances are exact int64 so min(struct(_d, cid)) IS the old
    # row_number-over-orderBy(_d, cid) winner, map-side partials
    # collapse the m*k candidate rows to m per vector before the
    # exchange, and the window's corpus-wide sort disappears.
    return (
        subs.join(F.broadcast(codebook), "sub")
        .select("_pid", "sub", "cid", dist.alias("_d"))
        .groupBy("_pid", "sub")
        .agg(F.min(F.struct("_d", "cid")).alias("_m"))
        .groupBy("_pid")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("sub", F.col("_m.cid").alias("cid")))
                ),
                lambda s: s["cid"],
            ).alias("codes")
        )
        .select(F.col("_pid").alias(id_col), "codes")
    )


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    k: int = 10,
    m: int = 8,
    n_cent: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    scale: int = 1_000_000,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over a PQ-encoded corpus: per
    query, an m*n_cent lookup table of exact integer part-distances
    (query slice vs centroid) is packed into ONE array and broadcast;
    each candidate's distance is m array lookups summed over its
    codes — no raw vectors are read in the scan. Returns (query_id,
    rank, vec_id, dist2) with dist2 the EXACT quantized ADC distance
    (engine-portable integer). Self-matches excluded.

    Scale: the corpus side touches only the m-byte codes column
    (dim/m * 8-byte compression of the scan), the LUT is
    queries x m x n_cent tiny rows built broadcast-side, and the
    per-candidate score is computed map-side before the top-k
    shuffle. Compose with ivf_topk cells to prune candidates before
    the ADC scan."""
    d_sub = dim // m
    q = _quantized(vec_col, scale)
    qslices = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice(q, s * d_sub + 1, d_sub).alias("sq"),
            )
            for s in range(m)
        ]
    )
    pdist = F.aggregate(
        F.zip_with("sq", "cq", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    lut = (
        queries.select(
            F.col(id_col).alias("query_id"), F.explode(qslices).alias("x")
        )
        .select("query_id", "x.sub", "x.sq")
        .join(F.broadcast(codebook), "sub")
        .select(
            "query_id",
            (F.col("sub") * n_cent + F.col("cid")).alias("_key"),
            pdist.alias("_pd"),
        )
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_key", "_pd"))),
                lambda s: s["_pd"],
            ).alias("_lut")
        )
    )
    score = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0).cast("bigint"),
        lambda acc, s: acc
        + F.element_at(
            "_lut",
            (s * n_cent + F.element_at("codes", (s + 1).cast("int")) + 1).cast(
                "int"
            ),
        ),
    )
    w = Window.partitionBy("query_id").orderBy("dist2", "vec_id")
    return (
        codes.crossJoin(F.broadcast(lut))
        .where(F.col("query_id") != F.col(id_col))
        .select("query_id", F.col(id_col).alias("vec_id"), score.alias("dist2"))
        .select(
            "query_id", "vec_id", "dist2",
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "dist2")
    )


def ivf_pq_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    m: int = 8,
    n_cent: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    scale: int = 1_000_000,
    codebook: DataFrame | None = None,
    assign: str = "expr",
) -> DataFrame:
    """IVF+PQ — the full production ANN composition: the coarse
    quantizer prunes the candidate set to the query's n_probe cells
    (ivf_topk's cosine cells, deterministic default), then the ADC
    scan scores ONLY those candidates' m-byte codes via the broadcast
    lookup table (pq_topk's integer distances). At 100 TB: cell is the
    partition column (probes = partition-pruned scans), codes are the
    only corpus bytes the scan touches, and the per-candidate work is
    m array lookups — the FAISS IVFADC layout expressed as DataFrame
    ops. Returns (query_id, rank, vec_id, dist2), dist2 the exact
    quantized ADC distance.

    ``assign`` mirrors ivf_topk: ``"expr"`` (default, oracle-replayable)
    runs the corpus x centroids cosine expression + per-vector window;
    ``"gemm"`` swaps that pass for the map-side numpy argmax
    (:func:`_assign_cells_gemm`, cell only — the vector stays out of
    the Arrow round-trip), results pinned identical by
    tests/test_round11.py."""
    if codebook is None:
        codebook = pq_codebook(candidates, m, n_cent, vec_col, id_col, dim, scale)
    codes = pq_encode(candidates, codebook, m, vec_col, id_col, dim, scale)
    centroids = candidates.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
    )
    cent = F.broadcast(centroids)
    if assign == "gemm":
        assign_df = _assign_cells_gemm(
            candidates, centroids, vec_col, id_col, include_vec=False
        )
    else:
        assign_df = _assign_cells_expr(
            candidates, centroids, vec_col, id_col, include_vec=False
        )
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("sim"), "cid")
    probes = (
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
        .crossJoin(cent)
        .select(
            "query_id", "cid",
            cosine_similarity(F.col("qv"), F.col("cv")).alias("sim"),
        )
        .select("*", F.row_number().over(w_probe).alias("rn"))
        .where(F.col("rn") <= n_probe)
        .select("query_id", F.col("cid").alias("cell"))
    )
    d_sub = dim // m
    q = _quantized(vec_col, scale)
    qslices = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice(q, s * d_sub + 1, d_sub).alias("sq"),
            )
            for s in range(m)
        ]
    )
    pdist = F.aggregate(
        F.zip_with("sq", "cq", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    lut = (
        queries.select(
            F.col(id_col).alias("query_id"), F.explode(qslices).alias("x")
        )
        .select("query_id", "x.sub", "x.sq")
        .join(F.broadcast(codebook), "sub")
        .select(
            "query_id",
            (F.col("sub") * n_cent + F.col("cid")).alias("_key"),
            pdist.alias("_pd"),
        )
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_key", "_pd"))),
                lambda s: s["_pd"],
            ).alias("_lut")
        )
    )
    score = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0).cast("bigint"),
        lambda acc, s: acc
        + F.element_at(
            "_lut",
            (s * n_cent + F.element_at("codes", (s + 1).cast("int")) + 1).cast(
                "int"
            ),
        ),
    )
    w = Window.partitionBy("query_id").orderBy("dist2", "vec_id")
    return (
        codes.join(assign_df, "vec_id")
        .join(F.broadcast(probes), "cell")
        .where(F.col("query_id") != F.col("vec_id"))
        .join(F.broadcast(lut), "query_id")
        .select("query_id", "vec_id", score.alias("dist2"))
        .select(
            "query_id", "vec_id", "dist2",
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "dist2")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    rrf_k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    topk: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval rankings (Cormack et al.
    SIGIR'09) — the standard hybrid-retrieval combiner for sparse
    (BM25) + dense (embedding) candidate lists feeding RAG or
    training-data mining. Each input holds one (id, rank) row per
    retrieved item, rank 1-based; fusion score(d) = sum over lists of
    1/(rrf_k + rank_d).

    The score is computed in FIXED-POINT: each contribution is
    10^9 // (rrf_k + rank) as a bigint, so fusion is pure integer
    arithmetic — bit-identical across engines and insensitive to
    summation order (the property the DuckDB oracle checks; float RRF
    would hash-diverge on associativity).

    Returns (fused_rank, id, rrf_score, n_lists) for the topk fused
    ids, ordered by (score desc, id). Shape: the inputs are top-k
    relations (k rows each — broadcast-sized by construction), so the
    union + groupBy is a few-KB shuffle regardless of corpus size; the
    heavy lifting happened inside the per-list retrievers, which are
    scale-audited separately (bm25_topk: one combiner-style corpus
    aggregate; cosine_topk_*: banded / broadcast designs)."""
    parts = []
    for r in rankings:
        # FLOOR over the double division (not integer `/`): Spark and
        # DuckDB disagree on what int/int returns, but both produce the
        # identical IEEE double here, and floor of it is exact
        parts.append(
            r.select(
                F.col(id_col).alias("_id"),
                F.floor(
                    F.lit(1_000_000_000)
                    / (F.lit(rrf_k) + F.col(rank_col))
                )
                .cast("bigint")
                .alias("_c"),
            )
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    fused = allp.groupBy("_id").agg(
        F.sum("_c").alias("rrf_score"), F.count("*").alias("n_lists")
    )
    w = Window.orderBy(F.desc("rrf_score"), F.col("_id"))
    return (
        fused.select(
            F.row_number().over(w).alias("fused_rank"),
            F.col("_id").alias(id_col),
            "rrf_score",
            "n_lists",
        )
        .where(F.col("fused_rank") <= topk)
    )


def _gemm_cross(a_ids, a_mat, b_ids, b_mat, threshold: float):
    """Dense cosine GEMM between two DISTINCT corpora; emits every
    qualifying directed (a_id, b_id) pair — no id-inequality filter,
    the sides are different relations and ids may legally collide."""
    import numpy as np
    import pandas as pd

    a_norms = np.sqrt((a_mat * a_mat).sum(axis=1))
    b_norms = np.sqrt((b_mat * b_mat).sum(axis=1))
    sims = (a_mat @ b_mat.T) / np.outer(a_norms, b_norms)
    ai, bj = np.nonzero(sims >= threshold)
    return pd.DataFrame(
        {"a_id": a_ids[ai], "b_id": b_ids[bj], "cosine": sims[ai, bj]}
    )


_CROSS_SCHEMA = "a_id bigint, b_id bigint, cosine double"


def embedding_cross_matches(
    a: DataFrame,
    b: DataFrame,
    threshold: float = 0.8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_blocks_a: int = 8,
    n_blocks_b: int = 8,
) -> DataFrame:
    """All cross-corpus pairs (a_id, b_id, cosine >= threshold) —
    EXACT, the A x B twin of embedding_near_dup_pairs' block-pair
    decomposition. Side A hashes into ``n_blocks_a`` blocks and
    replicates once per B-block (and vice versa), so every (i, j)
    block pair is one independent dense-GEMM task: O(|A|·Bb + |B|·Ba)
    rows shuffled, no driver materialization, no cartesian node.
    Size the block counts so each side of a task stays executor-sized;
    the O(|A|·|B|) flops are inherent to the exact tier — the scale
    tier is embedding_cross_matches_lsh."""
    import numpy as np

    def tagged(df, n_own, n_other, side):
        block = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_own))
        partner = F.explode(
            F.array(*[F.lit(p) for p in range(n_other)])
        ).alias("_p")
        out = df.select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"),
            block.alias("_blk"), partner,
        )
        bi = F.col("_blk") if side == "a" else F.col("_p")
        bj = F.col("_p") if side == "a" else F.col("_blk")
        return out.select(
            bi.alias("bi"), bj.alias("bj"),
            F.lit(side).alias("_side"), "_id", "_vec",
        )

    both = tagged(a, n_blocks_a, n_blocks_b, "a").unionByName(
        tagged(b, n_blocks_b, n_blocks_a, "b")
    )

    def gemm_group(pdf):
        import pandas as pd

        pa = pdf[pdf["_side"] == "a"]
        pb = pdf[pdf["_side"] == "b"]
        if not len(pa) or not len(pb):
            return pd.DataFrame({"a_id": [], "b_id": [], "cosine": []})
        return _gemm_cross(
            pa["_id"].to_numpy(dtype=np.int64),
            np.array(list(pa["_vec"]), dtype=np.float64),
            pb["_id"].to_numpy(dtype=np.int64),
            np.array(list(pb["_vec"]), dtype=np.float64),
            threshold,
        )

    return both.groupBy("bi", "bj").applyInPandas(
        gemm_group, schema=_CROSS_SCHEMA
    )


def embedding_cross_matches_lsh(
    a: DataFrame,
    b: DataFrame,
    threshold: float = 0.8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate cross-corpus matches: BOTH corpora bucket under the
    SAME fixed hyperplanes (identical seed — the property that makes
    the bucket join meaningful), candidates only from equal buckets,
    dense A x B GEMM within each. Each cross pair can collide in at
    most one bucket (full-signature equality), so the output is a
    deterministic subset of the exact tier with recall
    (1 - θ/π)^n_planes — the high-threshold decontamination regime.
    Shuffle volume is one bucket-keyed exchange per side; no
    replication at all, the reason this is the 100 TB tier."""
    import numpy as np

    ba = lsh_bucket_signatures(a, vec_col, id_col, n_planes, seed, dim)
    bb = lsh_bucket_signatures(b, vec_col, id_col, n_planes, seed, dim)
    both = ba.select(
        "bucket", F.lit("a").alias("_side"), "vec_id", "vec"
    ).unionByName(
        bb.select("bucket", F.lit("b").alias("_side"), "vec_id", "vec")
    )

    def gemm_bucket(pdf):
        import pandas as pd

        pa = pdf[pdf["_side"] == "a"]
        pb = pdf[pdf["_side"] == "b"]
        if not len(pa) or not len(pb):
            return pd.DataFrame({"a_id": [], "b_id": [], "cosine": []})
        return _gemm_cross(
            pa["vec_id"].to_numpy(dtype=np.int64),
            np.array(list(pa["vec"]), dtype=np.float64),
            pb["vec_id"].to_numpy(dtype=np.int64),
            np.array(list(pb["vec"]), dtype=np.float64),
            threshold,
        )

    return both.groupBy("bucket").applyInPandas(
        gemm_bucket, schema=_CROSS_SCHEMA
    )


def semantic_decontaminate(
    train: DataFrame,
    evalset: DataFrame,
    threshold: float = 0.8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exact: bool = False,
    **kwargs,
) -> DataFrame:
    """Drop training rows whose embedding matches ANY eval-set row at
    cosine >= threshold — the semantic tier of eval-set
    decontamination (the shingle tier is contamination_hits /
    decontaminate in operators/dedup.py; paraphrased contamination
    that shares no n-grams only shows up here). Returns the retained
    train relation, original schema.

    ``exact=False`` (default) uses the LSH-bucketed matcher — at
    decontamination thresholds (>= 0.8) its per-pair recall is the
    (1 - θ/π)^n_planes LSH bound; ``exact=True`` pays the block-pair
    GEMM for a guarantee. The flagged-id relation is tiny (bounded by
    |train|); the final filter is one left-anti join that AQE
    broadcasts in the common small-eval case."""
    matcher = embedding_cross_matches if exact else embedding_cross_matches_lsh
    matches = matcher(train, evalset, threshold, vec_col, id_col, **kwargs)
    flagged = matches.select(F.col("a_id").alias(id_col)).distinct()
    return train.join(flagged, id_col, "left_anti")

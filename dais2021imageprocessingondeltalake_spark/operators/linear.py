"""Distributed linear-model training — the certified-fit idiom
(kmeans_fit_distributed, pq_fit) applied to supervised learning.

A full-batch gradient-descent logistic regression is the canonical
quality-classifier trainer of an LLM data pipeline (fastText-style
filters, CCNet's LM filter, the Gopher/FineWeb quality gates are all
linear or near-linear scorers over cheap document features). At 100 TB
the training loop is exactly the shape Spark executes well: each
iteration is ONE scan with a map-side-combinable partial-gradient
aggregate (d+1 doubles per partition), the model state is d+1 doubles
on the driver, and nothing corpus-sized ever crosses a shuffle.

Determinism contract (the certified-sibling convention): weights are
rounded to `round_dp` decimals after every update, and each gradient
component is rounded to `round_dp` before the update — each iteration
therefore consumes identical doubles on any engine, which is what lets
an unrolled-CTE SQL oracle replay the whole trajectory
(queries_llm._logreg_fit_oracle). Sigmoid/exp last-ulp differences
between libm and the JVM are absorbed by the gradient rounding exactly
as BLAS reassociation is absorbed in the k-means M-step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def logreg_fit_distributed(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 3,
    lr: float = 1.0,
    round_dp: int = 6,
    materialize: str | bool | None = "localCheckpoint",
) -> list[tuple[str, float]]:
    """Full-batch gradient-descent logistic regression with an
    intercept, fully distributed: per iteration, ONE scan computes the
    d+1 gradient components g_j = round(avg(x_j · (σ(x·w) − y)), dp)
    as a map-side-combined aggregate, then the driver applies
    w_j ← round(w_j − lr·g_j, dp). Weights start at 0 (deterministic;
    no RNG). Returns [("intercept", w0), (feature, w_j), ...] — the
    model is dimension-sized by definition and lives with the caller
    (broadcast back for scoring via logreg_score).

    The avg (not sum) normalization keeps the gradient O(feature
    magnitude) regardless of corpus size, so one learning rate works at
    every scale — and keeps the rounded values far from the round_dp
    quantum at any N. `iters` is a FIXED count, not a convergence test:
    the trajectory itself is the certified artifact; production
    deployments run more iterations with round_dp=None (full
    precision) once certification is not the goal."""
    if iters < 1:
        raise ValueError(f"logreg_fit_distributed needs iters >= 1, got {iters}")
    feats = df.select(
        F.col(label_col).cast("double").alias("__y"),
        *[F.col(c).cast("double").alias(f"__x{j}") for j, c in enumerate(feature_cols)],
    )
    if materialize == "localCheckpoint":
        # one materialization feeds every iteration's scan: the feature
        # projection (often derived from text) would otherwise re-run
        # per iteration
        feats = feats.localCheckpoint()
    names = ["intercept", *feature_cols]
    xs: list[Column | None] = [None, *[F.col(f"__x{j}") for j in range(len(feature_cols))]]
    w = [0.0] * len(names)

    def _r(v: float) -> float:
        return round(v, round_dp) if round_dp is not None else v

    for _ in range(iters):
        z = F.lit(w[0])
        for j in range(1, len(names)):
            z = z + F.lit(w[j]) * xs[j]
        resid = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("__y")
        aggs = []
        for j, name in enumerate(names):
            g = resid if j == 0 else resid * xs[j]
            expr = F.avg(g)
            if round_dp is not None:
                expr = F.round(expr, round_dp)
            aggs.append(expr.alias(f"g{j}"))
        grad = feats.agg(*aggs).collect()[0]
        w = [_r(w[j] - lr * grad[f"g{j}"]) for j in range(len(names))]
    return list(zip(names, w))


def logreg_score(
    df: DataFrame,
    weights: list[tuple[str, float]],
    threshold: float = 0.0,
) -> Column:
    """Linear scorer for a fitted model: returns the BOOLEAN decision
    column x·w + b >= threshold (threshold in LOGIT space — 0.0 is
    probability 0.5). Decisions compare a double against a literal, so
    they are exact-comparable cross-engine wherever the margin is not
    identically the last ulp; certified consumers report integer
    decision COUNTS, the repo's robust-compare idiom."""
    it = dict(weights)
    z = F.lit(it["intercept"])
    for name, wj in weights:
        if name == "intercept":
            continue
        z = z + F.lit(wj) * F.col(name).cast("double")
    return z >= F.lit(threshold)

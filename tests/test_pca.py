"""Tests for the distributed-PCA tier (similarity.gram_matrix /
pca_power_iteration / pca_project): numerical ground truth against
straight numpy on the collected sf0.001 corpus, plus the structural
claims the docstrings make."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from dais2021imageprocessingondeltalake_spark.catalog import load_table
from dais2021imageprocessingondeltalake_spark.operators import similarity as SIM

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def X(spark):
    emb = load_table(spark, "embeddings", SF_DIR).orderBy("vec_id").collect()
    return np.array([r["embedding"] for r in emb], dtype=np.float64)


def test_gram_matches_numpy(spark, X):
    """Distributed partial-sum Gram == single-shot numpy X'X."""
    emb = load_table(spark, "embeddings", SF_DIR)
    rows = SIM.gram_matrix(emb, "embedding").collect()
    d = X.shape[1]
    G = np.zeros((d, d))
    for r in rows:
        G[r["i"] - 1, r["j"] - 1] = r["g"]
    assert np.allclose(G, X.T @ X, rtol=1e-9)


def test_gram_is_symmetric_psd_shape(spark):
    emb = load_table(spark, "embeddings", SF_DIR)
    rows = SIM.gram_matrix(emb, "embedding", round_dp=6).collect()
    assert len(rows) == 64 * 64
    vals = {(r["i"], r["j"]): r["g"] for r in rows}
    assert all(vals[(i, j)] == vals[(j, i)] for (i, j) in vals)
    assert all(vals[(i, i)] > 0 for i in range(1, 65))


def test_power_iteration_captures_top_variance(spark):
    """The synthetic corpus is near-isotropic (lambda2/lambda1 ~ 0.93),
    so after 8 steps the DIRECTION is still mixing among near-equal
    eigenvectors — but the Rayleigh quotient (variance captured) must
    already sit within a few percent of lambda1, which is what PCA
    optimizes. Direction recovery itself is checked on the planted-spike
    case below."""
    emb = load_table(spark, "embeddings", SF_DIR)
    rows = SIM.gram_matrix(emb, "embedding", round_dp=6).collect()
    v = np.array(SIM.pca_power_iteration(rows, d=64, iters=8, round_dp=6))
    G = np.zeros((64, 64))
    for r in rows:
        G[r["i"] - 1, r["j"] - 1] = r["g"]
    lam1 = np.linalg.eigvalsh(G)[-1]
    rayleigh = v @ G @ v / (v @ v)
    assert rayleigh > 0.9 * lam1, (rayleigh, lam1)
    assert v[0] >= 0  # sign canonicalization


def test_power_iteration_recovers_planted_spike(spark):
    """With a genuine eigengap the 8 rounded steps nail the direction:
    plant a dominant component (every vector biased along a fixed unit
    direction) and require cosine > 0.999 to the true top eigenvector."""
    rng = np.random.default_rng(13)
    d = 16
    u = np.zeros(d)
    u[3] = 1.0
    Xp = rng.normal(size=(200, d)) + 6.0 * rng.normal(size=(200, 1)) * u
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(Xp)],
        "vec_id long, embedding array<double>",
    )
    rows = SIM.gram_matrix(df, "embedding", round_dp=6).collect()
    v = np.array(SIM.pca_power_iteration(rows, d=d, iters=8, round_dp=6))
    G = np.zeros((d, d))
    for r in rows:
        G[r["i"] - 1, r["j"] - 1] = r["g"]
    top = np.linalg.eigh(G)[1][:, -1]
    assert abs(np.dot(v, top) / np.linalg.norm(v)) > 0.999


def test_projection_matches_numpy(spark, X):
    emb = load_table(spark, "embeddings", SF_DIR)
    rows = SIM.gram_matrix(emb, "embedding", round_dp=6).collect()
    comp = SIM.pca_power_iteration(rows, d=64, iters=8, round_dp=6)
    got = {
        r["vec_id"]: r["proj"]
        for r in SIM.pca_project(emb, comp).collect()
    }
    ids = [r["vec_id"] for r in load_table(spark, "embeddings", SF_DIR).orderBy("vec_id").collect()]
    want = X @ np.array(comp)
    for vid, w in zip(ids, want):
        assert got[vid] == pytest.approx(round(w, 6), abs=2e-6)


def test_embedding_dim_is_64(spark):
    """The static-dim assumption the generated PCA/LSH oracles bake in."""
    emb = load_table(spark, "embeddings", SF_DIR)
    dims = emb.select(F.size("embedding").alias("d")).distinct().collect()
    assert [r["d"] for r in dims] == [64]


def test_round_half_up_matches_spark_semantics():
    assert SIM._round_half_up(1.84125, 4) == 1.8413
    assert SIM._round_half_up(-1.84125, 4) == -1.8413
    assert SIM._round_half_up(0.1234564, 6) == 0.123456
    assert SIM._round_half_up(0.1234565, 6) == 0.123457

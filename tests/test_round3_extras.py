"""Invariant tests for the late round-3 statistical/mining queries that
go beyond their oracles: planted-signal recovery for margin mining,
conservation laws for feature hashing, and sanity bounds for the
one-number statistics."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dais2021imageprocessingondeltalake_spark import queries_all as q
from dais2021imageprocessingondeltalake_spark.operators import similarity as SIM

from .conftest import SF_DIR


def test_margin_mine_recovers_planted_pair(spark):
    """Plant a near-identical vector in ANOTHER group: the probe's best
    cross-group neighbor must be the plant, with a margin far above the
    background (near-orthogonal random vectors)."""
    import numpy as np

    rng = np.random.default_rng(5)
    d = 16
    base = rng.normal(size=(40, d))
    plant = base[0] + rng.normal(scale=0.01, size=d)  # near-dup of vec 0
    rows = [(i, [float(x) for x in base[i]], i % 4) for i in range(40)]
    rows.append((100, [float(x) for x in plant], 1))  # vec 0 is group 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = {r["probe_id"]: r for r in SIM.margin_mine(df, min_margin_x10k=0).collect()}
    assert out[0]["best_id"] == 100
    assert out[0]["sim1"] > 0.99
    assert out[0]["margin_x10k"] > 15000  # plant dominates runner-up


def test_feature_hash_conserves_tokens(spark):
    """Bucket counts must sum to the total token count of the selected
    docs, and the bucket space is at most 256 two-hex-char values."""
    df = q.REGISTRY["q_feature_hash"].fn(spark, SF_DIR)
    from dais2021imageprocessingondeltalake_spark.catalog import load_table

    docs = load_table(spark, "documents", SF_DIR).filter(F.col("doc_id") % 10 == 0)
    n_tokens = docs.select(F.explode(F.split("text", " "))).count()
    agg = df.agg(F.sum("cnt").alias("s"), F.count_distinct("bucket").alias("b")).first()
    assert agg["s"] == n_tokens
    assert agg["b"] <= 256
    assert df.filter(~F.col("bucket").rlike("^[0-9a-f]{2}$")).count() == 0


def test_gini_and_entropy_bounds(spark):
    gini = q.REGISTRY["q_gini_spend"].fn(spark, SF_DIR).first()
    assert 0.0 <= gini["gini"] < 1.0
    ent = q.REGISTRY["q_token_entropy"].fn(spark, SF_DIR).first()
    import math

    assert 0.0 < ent["entropy_nats"] <= math.log(ent["vocab"]) + 1e-9


def test_kappa_bounds_and_agreement_consistency(spark):
    r = q.REGISTRY["q_cohens_kappa"].fn(spark, SF_DIR).first()
    assert -1.0 <= r["kappa"] <= 1.0
    assert 0.0 <= r["po"] <= 1.0 and 0.0 < r["pe"] < 1.0
    # kappa must match its defining identity on the emitted po/pe
    assert r["kappa"] == pytest.approx((r["po"] - r["pe"]) / (1 - r["pe"]), abs=1e-4)


def test_psi_near_zero_on_random_split(spark):
    """Even/odd doc halves are exchangeable, so PSI should read far
    below the classic 0.1 'investigate' threshold."""
    r = q.REGISTRY["q_psi_drift"].fn(spark, SF_DIR).first()
    assert 0.0 <= r["psi"] < 0.1


def test_share_of_parent_sums_to_one_per_region(spark):
    df = q.REGISTRY["q_share_of_parent"].fn(spark, SF_DIR)
    sums = df.groupBy("r_name").agg(F.sum("share_of_region").alias("s")).collect()
    for row in sums:
        assert row["s"] == pytest.approx(1.0, abs=1e-9)


def test_top_paths_all_contain_purchase(spark):
    df = q.REGISTRY["q_top_paths"].fn(spark, SF_DIR)
    rows = df.collect()
    assert 0 < len(rows) <= 10
    assert all("purchase" in r["path"] for r in rows)

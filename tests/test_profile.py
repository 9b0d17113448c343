"""Chi-square drift report: planted-value and plan-shape tests.

(profile_columns and the expectation checks are covered in
tests/test_advanced.py next to their queries.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dais2021imageprocessingondeltalake_spark.operators import profile as P


def test_drift_report_no_drift_is_zero(spark):
    # identical distributions in both slices -> every chi2 contribution 0
    rows = [(i % 5, s) for i in range(50) for s in ("a", "b")]
    df = spark.createDataFrame(rows, "bin_val: bigint, side: string")
    out = P.drift_report(df, in_a=F.col("side") == "a", bin_expr=F.col("bin_val"))
    got = out.collect()
    assert len(got) == 5
    assert all(r["chi2_x1e9"] == 0 for r in got)
    assert all(r["cnt_a"] == 10 and r["cnt_b"] == 10 for r in got)


def test_drift_report_planted_drift(spark):
    # slice a: all mass in bin 0; slice b: all mass in bin 1 -> maximal drift
    rows = [(0, "a")] * 10 + [(1, "b")] * 10
    df = spark.createDataFrame(rows, "bin_val: bigint, side: string")
    out = {
        r["bin"]: r
        for r in P.drift_report(
            df, in_a=F.col("side") == "a", bin_expr=F.col("bin_val")
        ).collect()
    }
    # chi2 contribution per disjoint bin: (10*10 - 0)^2 / (10*10*10) = 10.0
    assert out[0]["chi2_x1e9"] == 10 * 10**9
    assert out[1]["chi2_x1e9"] == 10 * 10**9
    assert out[0]["cnt_a"] == 10 and out[0]["cnt_b"] == 0


def test_drift_single_scan_no_cartesian(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = P.drift_report(
        docs, in_a=F.col("lang") == "en", bin_expr=F.expr("n_chars div 50")
    )
    out.collect()  # finalize the adaptive plan so exchange reuse is visible
    plan = out._jdf.queryExecution().executedPlan().toString()
    # conditional aggregation builds both histograms in one aggregate; the
    # totals branch REUSES that aggregate's exchange (AQE ReuseExchange), so
    # the corpus is scanned once at execution, and the 1-row totals join is
    # broadcast, never a shuffled cartesian
    assert "ReusedExchange" in plan
    assert "CartesianProduct" not in plan


def test_spearman_plan_broadcasts_midrank_tables(spark, sf_dir):
    """spearman_rho's declared scale shape: the two dim-sized midrank
    tables reach the rows via broadcast joins; the corpus itself is
    never sorted or windowed."""
    from dais2021imageprocessingondeltalake_spark.operators.aggregates import spearman_rho
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "n_chars", F.length("text").alias("n_len")
    )
    out = spearman_rho(docs, "n_chars", "n_len")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_negative_sample_plan_no_cartesian(spark, sf_dir):
    """negative_sample's declared shape: candidates equi-join the
    position index (shuffled hash join is fine); the only nested-loop
    join is the broadcast 1-row count. Never a shuffled cartesian
    against the corpus."""
    from dais2021imageprocessingondeltalake_spark.operators.sampling import negative_sample
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    anchors = docs.filter(F.col("doc_id") % 100 == 0)
    out = negative_sample(docs, anchors, "doc_id", k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan

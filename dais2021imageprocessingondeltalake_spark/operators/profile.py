"""Dataset profiling: the "data card" step of a training-data pipeline.

Before a corpus is admitted to a 100 TB training mix, the pipeline emits a
per-column profile (row/null/distinct counts, min/max) and a drift report
against the previous snapshot.  The reference's Explore notebook does this
interactively (`00. Explore.py:66-90` — display() of label counts over the
Delta table); here it is a first-class operator pair with exact oracles.

Scale design:
- ``profile_columns`` is ONE aggregate over ONE scan.  Multiple exact
  COUNT(DISTINCT) in a single agg plan as a Catalyst Expand (one
  row-multiplication by #distinct-columns, then a single hash aggregate) —
  no per-column job, no driver loop.  For columns where exact distinct is
  too hot at 100 TB, swap ``F.count_distinct`` for
  ``F.approx_count_distinct`` (HLL, fixed-size state) — the q_count_distinct
  query already certifies both paths agree on this corpus.
- ``drift_report`` is ONE scan + ONE groupBy shuffle: both snapshots'
  histograms come from conditional aggregation over the union predicate
  (no self-join), totals are a broadcast of a 1-row aggregate, and the
  chi-square statistic is per-bin IEEE arithmetic on exact integer counts
  (scaled-floor idiom), so the oracle replays it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns", "drift_report"]


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per column: (col_name, n_rows, n_null, n_distinct,
    min_str, max_str).  min/max are cast to string so heterogeneous
    column types share one report schema (bigint→string is exact
    decimal formatting in both Spark and DuckDB).
    """
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"__null_{c}"),
            F.count_distinct(col).alias(f"__dist_{c}"),
            F.min(col).cast("string").alias(f"__min_{c}"),
            F.max(col).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', `__null_{c}`, `__dist_{c}`, `__min_{c}`, `__max_{c}`" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack}) AS (col_name, n_null, n_distinct, min_str, max_str)",
        "__n_rows AS n_rows",
    )


def drift_report(
    df: DataFrame,
    in_a: Column,
    bin_expr: Column,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Two-sample chi-square drift between the ``in_a`` slice and its
    complement, binned by ``bin_expr`` (an integer-valued column).

    Returns (bin, cnt_a, cnt_b, chi2_x1e9): the per-bin counts plus the
    bin's scaled chi-square homogeneity contribution
    ``floor(scale * (cnt_a*Qt - cnt_b*Pt)^2 / (Pt*Qt*(cnt_a+cnt_b)))``
    where Pt/Qt are the slice totals.  Every input to the float math is
    an exact integer (counts and their products stay far below 2^53
    until the final square), each IEEE op is deterministic, and the
    floor-scale makes the output a hashable BIGINT — the oracle replays
    the identical expression tree.

    One scan at execution: both histograms come from conditional
    aggregation (sum CASE) in a single groupBy — no self-join — and the
    totals branch reuses that aggregate's shuffle output (AQE
    ReuseExchange, plan-asserted in tests/test_profile.py) before being
    broadcast back as one row.  Summing ``chi2_x1e9`` gives the corpus
    drift statistic; per-bin rows localize WHERE the distributions
    diverged.
    """
    g = df.groupBy(bin_expr.alias("bin")).agg(
        F.sum(F.when(in_a, 1).otherwise(0)).alias("cnt_a"),
        F.sum(F.when(in_a, 0).otherwise(1)).alias("cnt_b"),
    )
    tot = g.agg(
        F.sum("cnt_a").alias("pt"),
        F.sum("cnt_b").alias("qt"),
    )
    chi2 = (
        f"CAST(floor({float(scale)} * ("
        "(CAST(cnt_a * qt - cnt_b * pt AS DOUBLE) * "
        "CAST(cnt_a * qt - cnt_b * pt AS DOUBLE)) / "
        "CAST(pt * qt * (cnt_a + cnt_b) AS DOUBLE))) AS BIGINT)"
    )
    return g.crossJoin(F.broadcast(tot)).select(
        "bin",
        "cnt_a",
        "cnt_b",
        F.expr(chi2).alias("chi2_x1e9"),
    )

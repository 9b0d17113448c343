"""Data-quality expectations + table profiling (analytics-engine surface).

Two shapes a production lakehouse runs on every ingest:
- `profile_columns`: one row per column with null fraction, distinct
  count, min/max — the dataset card / drift-detection input. One pass,
  one aggregate; every statistic is a builtin JVM agg.
- constraint checks (not-null, unique-key, referential integrity):
  violation COUNTS, not booleans — a gate that reports how broken a
  batch is, cheap enough to run inline before a write. Each check is a
  single agg or anti-join; nothing materializes the violating rows
  unless a caller asks.
- `drift_report`: the chi-square homogeneity complement to the
  KS/PSI drift scores (queries_curation) — per-bin counts plus each
  bin's floor-scaled chi2 contribution, so the report localizes WHERE
  two slices diverged and certifies exactly (integer counts in, one
  deterministic IEEE expression per bin, BIGINT out).

Scale notes: profiling numeric/short-string min/max and exact distinct
counts shuffles once per aggregate batch; at 100 TB swap exact distinct
for the engine's HLL sketch tier (aggregates.sketch_rollup) — the seam
is the `exact_distinct` flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_null, null_frac, n_distinct, min_str, max_str)
    per column — min/max rendered as strings so one schema fits every
    column type (the profile is a report, not a typed feed).

    The row count rides in the SAME aggregate as the per-column stats,
    so the table is scanned exactly once (the earlier shape paid a
    separate driver-side ``df.count()`` — a second full scan at 100 TB
    for one scalar).  ``null_frac`` divides the two LONG aggregates
    cast to double per row, which is the identical IEEE value the old
    ``n_null / float(total)`` literal produced."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_null"),
                F.count_distinct(F.col(c)).alias("n_distinct"),
                F.min(F.col(c).cast("string")).alias("min_str"),
                F.max(F.col(c).cast("string")).alias("max_str"),
            ).alias(f"__p_{c}")
        )
    row = df.agg(*aggs)
    profiles = row.select(
        F.col("__n_rows"),
        F.explode(F.array(*[F.col(f"__p_{c}") for c in cols])).alias("p"),
    )
    return profiles.select(
        F.col("p.column").alias("column"),
        F.col("__n_rows").cast("bigint").alias("n_rows"),
        F.col("p.n_null").alias("n_null"),
        F.round(
            F.col("p.n_null").cast("double") / F.col("__n_rows").cast("double"), 6
        ).alias("null_frac"),
        F.col("p.n_distinct").alias("n_distinct"),
        F.col("p.min_str").alias("min_str"),
        F.col("p.max_str").alias("max_str"),
    )


def check_not_null(df: DataFrame, col: str) -> DataFrame:
    """1-row (check, violations): rows where `col` IS NULL."""
    return df.agg(
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("violations")
    ).select(F.lit(f"not_null:{col}").alias("check"), "violations")


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """1-row (check, violations): rows beyond the first per key — the
    duplicate surplus (0 == key is unique)."""
    name = ",".join(cols)
    dup = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__n"))
    return dup.agg(
        F.sum(F.col("__n") - 1).cast("bigint").alias("violations")
    ).select(F.lit(f"unique:{name}").alias("check"), "violations")


def check_foreign_key(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str
) -> DataFrame:
    """1-row (check, violations): child rows whose key has no parent
    (anti-join count) — referential integrity."""
    orphans = child.select(F.col(child_col)).join(
        parent.select(F.col(parent_col).alias(child_col)),
        [child_col],
        "left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).cast("bigint").alias("violations")).select(
        F.lit(f"fk:{child_col}").alias("check"), "violations"
    )


def check_accepted_values(df: DataFrame, col: str, values: list) -> DataFrame:
    """1-row (check, violations): non-null rows outside the accepted
    set."""
    return df.agg(
        F.sum(
            F.when(
                F.col(col).isNotNull() & ~F.col(col).isin(*values), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("violations")
    ).select(F.lit(f"accepted:{col}").alias("check"), "violations")


def drift_report(
    df: DataFrame,
    in_a,
    bin_expr,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Two-sample chi-square drift between the ``in_a`` slice and its
    complement, binned by ``bin_expr`` (an integer-valued column).

    Returns (bin, cnt_a, cnt_b, chi2_x1e9): the per-bin counts plus the
    bin's scaled chi-square homogeneity contribution
    ``floor(scale * (cnt_a*Qt - cnt_b*Pt)^2 / (Pt*Qt*(cnt_a+cnt_b)))``
    where Pt/Qt are the slice totals.  Every input to the float math is
    an exact integer; each IEEE op is deterministic, and the
    floor-scale makes the output a hashable BIGINT — the oracle replays
    the identical expression tree.  Numeric headroom: the BIGINT
    numerator cnt*total holds to ~3e9 total rows; the denominator is
    formed from individually-cast DOUBLE factors (the BIGINT triple
    product would overflow at few-million-row corpora); an empty slice
    reports 0 per bin instead of 0/0.  Summing ``chi2_x1e9`` gives the
    corpus drift statistic; the per-bin rows localize WHERE the
    distributions diverged (which the scalar KS/PSI scores in
    queries_curation cannot).

    One scan at execution: both histograms come from conditional
    aggregation (sum CASE) in a single groupBy — no self-join — and the
    totals branch reuses that aggregate's shuffle output (AQE
    ReuseExchange, plan-asserted in tests/test_profile.py) before being
    broadcast back as one row.
    """
    g = df.groupBy(bin_expr.alias("bin")).agg(
        F.sum(F.when(in_a, 1).otherwise(0)).alias("cnt_a"),
        F.sum(F.when(in_a, 0).otherwise(1)).alias("cnt_b"),
    )
    return drift_finalize(g, scale=scale)


def drift_finalize(g: DataFrame, scale: int = 1_000_000_000) -> DataFrame:
    """Finalize a (bin, cnt_a, cnt_b) histogram into the drift report —
    exposed separately because per-bin counts are MERGEABLE: a
    streaming ingest folds per-micro-batch partial histograms into a
    counter store and finalizes the merged counts here, yielding
    exactly the batch report (certified by q_stream_drift, which shares
    q_profile_drift's oracle)."""
    tot = g.agg(
        F.sum("cnt_a").alias("pt"),
        F.sum("cnt_b").alias("qt"),
    )
    # Denominator factors cast to DOUBLE individually: the BIGINT product
    # pt*qt*(cnt_a+cnt_b) overflows at few-million-row corpora (ANSI
    # throws), while double factors are exact below 2^53 each and the
    # product rounds deterministically. An empty slice (pt or qt = 0)
    # reports 0 drift per bin rather than 0/0 = NaN (which ANSI refuses
    # to cast to BIGINT).
    chi2 = (
        "CASE WHEN pt = 0 OR qt = 0 THEN CAST(0 AS BIGINT) ELSE "
        f"CAST(floor({float(scale)} * ("
        "(CAST(cnt_a * qt - cnt_b * pt AS DOUBLE) * "
        "CAST(cnt_a * qt - cnt_b * pt AS DOUBLE)) / "
        "(CAST(pt AS DOUBLE) * CAST(qt AS DOUBLE) * "
        "CAST(cnt_a + cnt_b AS DOUBLE)))) AS BIGINT) END"
    )
    return g.crossJoin(F.broadcast(tot)).select(
        "bin",
        "cnt_a",
        "cnt_b",
        F.expr(chi2).alias("chi2_x1e9"),
    )

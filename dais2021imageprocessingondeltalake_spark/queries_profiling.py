"""Drift-report query registration (round 6).

The chi-square homogeneity complement to the existing drift scores:
`q_ks_drift` and `q_psi_drift` (queries_curation.py) emit one scalar per
corpus pair, while this report keeps per-bin rows — counts plus each
bin's floor-scaled chi2 contribution — so it localizes WHERE two slices
diverged, and certifies exactly (integer counts in, one deterministic
IEEE expression per bin, BIGINT out; no rounded libm anywhere).
The per-column data card itself is `q_data_profile`
(queries_advanced.py), sharing operators/profile.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .operators import profile as P
from .registry import query


@query(
    "q_profile_drift",
    oracle="""
    WITH g AS (
      SELECT n_chars // 50 AS bin,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
             CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS cnt_b
      FROM documents GROUP BY 1),
    t AS (SELECT CAST(sum(cnt_a) AS BIGINT) AS pt,
                 CAST(sum(cnt_b) AS BIGINT) AS qt FROM g)
    SELECT g.bin, g.cnt_a, g.cnt_b,
           CASE WHEN t.pt = 0 OR t.qt = 0 THEN CAST(0 AS BIGINT) ELSE
           CAST(floor(1000000000.0 * (
             (CAST(g.cnt_a * t.qt - g.cnt_b * t.pt AS DOUBLE) *
              CAST(g.cnt_a * t.qt - g.cnt_b * t.pt AS DOUBLE)) /
             (CAST(t.pt AS DOUBLE) * CAST(t.qt AS DOUBLE) *
              CAST(g.cnt_a + g.cnt_b AS DOUBLE)))) AS BIGINT) END AS chi2_x1e9
    FROM g, t
    """,
)
def q_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-distribution drift between the English slice and the rest
    of the corpus: per 50-char bin, both counts plus the bin's scaled
    chi-square homogeneity contribution.  One scan at execution + one
    groupBy shuffle (conditional aggregation — no self-join; the totals
    branch reuses the histogram exchange via AQE and is broadcast
    back).  All float inputs are exact integers, so the oracle replays
    the identical IEEE expression tree (scaled-floor idiom)."""
    docs = load_table(spark, "documents", sf_dir)
    return P.drift_report(
        docs,
        in_a=F.col("lang") == "en",
        bin_expr=F.expr("n_chars div 50"),
    )

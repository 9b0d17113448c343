"""Dataset-profiling query registrations (round 6).

The "data card" tier of the training-data pipeline: a one-pass per-column
profile of the corpus and an exact chi-square drift report between corpus
slices.  Both carry full DuckDB oracles — the profile is plain aggregates,
and the drift statistic uses the scaled-floor idiom over exact integer
counts so the float math replays bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .operators import profile as P
from .registry import query

_PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(
            f"""
    SELECT '{c}' AS col_name,
           CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_str,
           CAST(max({c}) AS VARCHAR) AS max_str,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM documents"""
        )
    return "\nUNION ALL\n".join(parts)


@query("q_profile_table", oracle=_profile_oracle())
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data card for the documents corpus: row count, null
    count, exact distinct count, min/max (as strings) — ONE aggregate
    over ONE scan (multiple COUNT DISTINCT plan as a single Catalyst
    Expand + hash aggregate, no per-column job).  The 100 TB variant
    swaps exact distinct for approx_count_distinct; see
    operators/profile.py docstring."""
    docs = load_table(spark, "documents", sf_dir)
    return P.profile_columns(docs, _PROFILE_COLS)


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
           CAST(floor(1000000000.0 * (
             (CAST(g.cnt_a * t.qt - g.cnt_b * t.pt AS DOUBLE) *
              CAST(g.cnt_a * t.qt - g.cnt_b * t.pt AS DOUBLE)) /
             CAST(t.pt * t.qt * (g.cnt_a + g.cnt_b) AS DOUBLE))) AS BIGINT) AS chi2_x1e9
    FROM g, t
    """,
)
def q_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-distribution drift between the English slice and the rest
    of the corpus: per 50-char bin, both counts plus the bin's scaled
    chi-square homogeneity contribution.  One scan + one groupBy
    shuffle (conditional aggregation — no self-join); the 1-row totals
    aggregate is broadcast.  All float inputs are exact integers, so
    the oracle replays the identical IEEE expression tree (scaled-floor
    idiom)."""
    docs = load_table(spark, "documents", sf_dir)
    return P.drift_report(
        docs,
        in_a=F.col("lang") == "en",
        bin_expr=F.expr("n_chars div 50"),
    )

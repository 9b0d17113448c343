"""Joins (SURVEY.md §2 C1-C4).

The reference's only join is a left-outer equi-join on a non-unique key
(`01. Ingest.py:129`) whose build side is a ~|groups|-row aggregate —
Catalyst auto-broadcasts it. We keep that shape and add the standard
variants plus an explicit broadcast policy for dimension joins, which is
the scalable replacement for the reference's driver-collected label dict
(`01. Ingest.py:76-82`).

Scale notes (100 TB): large-large equi-joins shuffle both sides on the
key (sort-merge under AQE, skew-join splitting on); dimension joins must
broadcast — a 25-row `nation` table shuffled against 600B lineitem rows
would be a catastrophic plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-join (C1/C2). USING-style key list merges the key columns, as in
    `df.join(aug, ['label'], 'leftouter')` (`01. Ingest.py:129`)."""
    return left.join(right, on, how)


def left_outer_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """C1 — preserves the reference's fan-out semantics: joining on a
    non-unique key row-multiplies each group (SURVEY.md §3.1)."""
    return left.join(right, list(on), "leftouter")


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """C3 — EXISTS. No right columns, no row multiplication."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """C3 — NOT EXISTS. The dedup workhorse."""
    return left.join(right, on, "left_anti")


def broadcast_join(
    left: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """C4 — dimension join with an explicit broadcast hint. Replaces the
    reference's closure-captured dict: same lookup, but the dim stays a
    DataFrame (no driver collect on the data path) and ships once per
    executor instead of once per task."""
    return left.join(F.broadcast(dim), on, how)


def dense_index_dim(df: DataFrame, key: str, index_col: str = "label_index") -> DataFrame:
    """Build a dense 0-based index over the sorted distinct values of
    ``key`` — the scalable equivalent of the reference's
    ``sorted(distinct labels) → {label: i}`` driver dict
    (`01. Ingest.py:76-78`): ``row_number() over (order by key) - 1``.

    The single-partition window is fine: the dim is |distinct keys| rows
    (5 in the reference); attach it to facts with broadcast_join."""
    w = W.orderBy(F.col(key))
    return (
        df.select(key)
        .distinct()
        .withColumn(index_col, (F.row_number().over(w) - F.lit(1)).cast("long"))
    )

"""Partitioning / sampling / driver hand-off (SURVEY.md §2 J1-J3).

Reference sites: `randomSplit([0.6,0.4], seed=12345)`
`02.a Train - TensorFlow Distributed.py:79`; `repartition(2)` `02.a:82-83`;
`collect()`/`toPandas()` `01. Ingest.py:76,135`.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame


def random_split(
    df: DataFrame, weights: Sequence[float], seed: int = 12345
) -> list[DataFrame]:
    """J1 — seeded per-partition Bernoulli split (no shuffle). Splits are
    disjoint and exhaustive; exact membership varies with partitioning, so
    tests assert invariants, not row identity (SURVEY.md §7 hard part b)."""
    return df.randomSplit(list(weights), seed=seed)


def ensure_min_partitions(df: DataFrame, n: int) -> DataFrame:
    """J2 — parallelism floor: the reference repartitions to >= #training
    workers (`02.a:82-83`). Round-robin shuffle only when actually below."""
    return df.repartition(n) if df.rdd.getNumPartitions() < n else df


def collect_sample(df: DataFrame, n: int = 10) -> pd.DataFrame:
    """J3 — bounded debug sample to the driver (Arrow-accelerated), the
    reference's `limit(10).toPandas()` iteration loop (`01. Ingest.py:135`).
    Always limits first: never an unbounded collect on the data path."""
    return df.limit(n).toPandas()


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 12345
) -> DataFrame:
    """Per-stratum Bernoulli sampling (`df.sampleBy`) — the class-balance
    tool for training-set construction (downsample majority classes,
    keep rare ones whole). Executes as a per-partition filter with a
    seeded RNG: no shuffle, no driver collection, linear scan at any
    scale. Rows-only checkable (engines differ in RNG streams); the
    invariants — subset-of-input, only listed strata, approximate
    per-stratum rates, seed determinism — are asserted in tests."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)

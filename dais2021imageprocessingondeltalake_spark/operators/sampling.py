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


def _md5_threshold(rate: float) -> str:
    """First-8-hex-chars md5 threshold for a Bernoulli keep-rate.

    md5 hex is lowercase in both Spark and DuckDB and hex digits sort
    lexicographically in value order ('0'..'9' < 'a'..'f'), so a
    fixed-width string compare IS a uniform numeric compare — no hex
    parsing needed (the engines disagree on hex→int builtins, not on
    md5 itself)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(min(int(rate * 16**8), 16**8 - 1), "08x")


def hash_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff
    md5(key || salt)[:8] < threshold(rate).

    This is how a 100 TB curation pipeline samples — `df.sample()` is
    seed-AND-partitioning dependent (a repartition changes the sample),
    while a content-hash keep rule is reproducible across runs, engines,
    cluster sizes, and incremental re-ingests: the same document always
    makes the same keep/drop decision. `salt` derives independent
    samples from the same keys (vary it to draw a fresh replicate).
    Pure projection+filter, no shuffle, fully pushed down."""
    from pyspark.sql import functions as F

    if rate >= 1.0:
        return df
    thr = _md5_threshold(rate)
    digest = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    return df.filter(F.substring(digest, 1, 8) < F.lit(thr))


def hash_sample_stratified(
    df: DataFrame, key_col: str, strata_col: str, rates: dict[str, float],
    default_rate: float = 0.0, salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the domain-mixing primitive
    (sample web text at 10%, keep books at 100%, ...). The per-row
    threshold is a CASE over the stratum column; everything else matches
    hash_sample. Rates ≥ 1.0 keep the whole stratum; strata not listed
    fall back to default_rate."""
    from pyspark.sql import functions as F

    thr_col = F.lit(_md5_threshold(min(default_rate, 1.0)))
    for stratum, rate in sorted(rates.items()):
        thr_col = F.when(
            F.col(strata_col) == stratum, F.lit(_md5_threshold(min(rate, 1.0)))
        ).otherwise(thr_col)
    digest = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    full = {s for s, r in rates.items() if r >= 1.0}
    keep = F.substring(digest, 1, 8) < thr_col
    if full:
        keep = keep | F.col(strata_col).isin(*sorted(full))
    if default_rate >= 1.0:
        keep = keep | ~F.col(strata_col).isin(*sorted(rates))
    return df.filter(keep)


def hash_sample_fixed_k(
    df: DataFrame, key_col: str, strata_col: str, k: int, salt: str = ""
) -> DataFrame:
    """Deterministic EXACTLY-k-per-stratum sample: rank rows within each
    stratum by md5(key || salt) (ties by key) and keep the k smallest —
    the fixed-budget companion to rate-based hash_sample (e.g. 'exactly
    10k eval docs per domain'), equally layout/engine/rerun-stable.

    Scale shape: one shuffle on the stratum key + a per-stratum sort on
    an 8-byte digest prefix; k << |stratum|, and the rank filter
    short-circuits via WindowGroupLimit (Spark pushes rn <= k into the
    sort, keeping per-partition heaps of k, not full sorts)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    digest = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(strata_col).orderBy(digest, F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )

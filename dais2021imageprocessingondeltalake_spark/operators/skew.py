"""Skew mitigation (SURVEY.md §4 engine policies; 100 TB survival kit).

Two standard tactics, both pure DataFrame ops:

- `salted_aggregate`: two-phase aggregation for hot grouping keys —
  pre-aggregate on (key, salt) so the hot key's rows spread over `salt_n`
  partitions, then finalize on key. Works for any algebraic aggregate
  (sum/count/min/max); avg = salted sum + salted count finalized as a
  division.
- `salted_join`: replicate the small side `salt_n` times (one copy per
  salt value) and salt the large side's key randomly — the hot key's rows
  land on salt_n different partitions instead of one straggler. For
  broadcast-able small sides prefer `F.broadcast` (no salting needed);
  this is for the medium-dim case where neither broadcast nor plain
  shuffle works.

AQE's skew-join splitting (on by default in session.py) handles *sort-
merge* skew automatically at runtime; explicit salting remains necessary
for skewed *aggregations* and for pre-AQE-style deterministic plans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    salt_n: int = 16,
) -> DataFrame:
    """Two-phase (salted) sum/count aggregation. Phase 1 shuffles on
    (keys, salt) — hot keys spread across salt_n reducers; phase 2
    shuffles salt_n rows per key. Emits sum_<c> per column plus n_rows.

    The salt is monotonically_increasing_id() % salt_n: uniform enough to
    spread, and NOT stable across stage retries/AQE replans — which is
    fine because the final result is salt-invariant (sums/counts compose
    regardless of which salt each row drew)."""
    salt = (F.monotonically_increasing_id() % salt_n).alias("__salt")
    phase1 = (
        df.select(*keys, *sum_cols, salt)
        .groupBy(*keys, "__salt")
        .agg(
            *[F.sum(c).alias(f"__s_{c}") for c in sum_cols],
            F.count(F.lit(1)).alias("__n"),
        )
    )
    return phase1.groupBy(*keys).agg(
        *[F.sum(f"__s_{c}").alias(f"sum_{c}") for c in sum_cols],
        F.sum("__n").alias("n_rows"),
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt_n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: large side gets a random salt in
    [0, salt_n); small side is replicated once per salt value via an
    explode; join key becomes (on, salt). Row multiplication: small side
    costs x salt_n (storage of the build side), large side unchanged."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        # outer-on-the-small-side variants are wrong under salting: an
        # unmatched small-side row was replicated salt_n times pre-join and
        # would surface salt_n duplicate null-padded rows in the output
        raise ValueError(
            f"salted_join supports how='inner'|'left' (large side preserved); got {how!r}"
        )
    salted_large = large.withColumn(
        "__salt", (F.monotonically_increasing_id() % salt_n).cast("int")
    )
    replicated_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    out = salted_large.join(replicated_small, [on, "__salt"], how)
    return out.drop("__salt")

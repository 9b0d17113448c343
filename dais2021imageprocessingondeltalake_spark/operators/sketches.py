"""Bounded-memory sketch operators (100 TB survival kit, round 3).

Two classic patterns a petabyte pipeline needs that plain groupBy can't
deliver at scale:

- `heavy_hitters_exact`: EXACT top-k frequent items without a
  full-cardinality shuffle. A plain `groupBy(item).count()` over 100 TB
  of tokens shuffles every distinct token (billions of keys); the
  two-pass Misra-Gries plan shuffles only a bounded candidate set.
  Pass 1 is a narrow `mapInPandas` scan keeping at most `counters`
  (item, count) pairs per partition (Misra-Gries summaries, mergeable per
  Agarwal et al., "Mergeable Summaries", PODS'12); pass 2 re-counts ONLY
  the union of per-partition candidates (<= counters x n_partitions rows)
  exactly. Guarantee: any item with global count > n/(counters+1)
  appears in some partition summary, so when the true k-th count clears
  that threshold the result is EXACTLY the true top-k — which is what
  makes the DuckDB oracle (a plain top-k) valid.
- `bloom_filter_semi_join`: semi-join where the probe side is pre-pruned
  by a broadcast Bloom filter built from the build side's keys — the
  manual version of Spark's runtime bloom-filter join pushdown
  (spark.sql.optimizer.runtime.bloomFilter.enabled), built from plain
  expressions so the pruning is explicit, testable, and usable where the
  optimizer declines to inject one (e.g. after a non-equi derivation).
  Only Bloom survivors (true matches + fpp false positives) reach the
  exact confirming join, so at 100 TB the big-side shuffle shrinks from
  |big| rows to ~|matches| rows. False positives are REMOVED by the
  confirming join, so the output is exactly the semi-join — fully
  oracle-checkable.

Neither operator collects data rows to the driver: the Misra-Gries
candidate set and the Bloom bitmap are both bounded BY CONSTRUCTION
(counters x partitions entries; n_bits/64 longs), the same bounded-fit
exemption the IVF/k-means samples use.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_partials(
    df: DataFrame, col: str, counters: int = 256
) -> DataFrame:
    """Pass 1: per-partition Misra-Gries summaries of `col`.

    Emits at most `counters` (item, est) rows per partition; `est`
    undercounts the partition-true count by at most n_p/(counters+1).
    Batch-merge variant: per Arrow batch, add exact batch counts into the
    running summary, then trim to `counters` items by subtracting the
    (counters+1)-th largest count and dropping non-positives — the
    mergeable-summaries trim, which preserves the Misra-Gries error
    bound across merges.

    NULL items are excluded up front (explicit filter, matching the
    pandas value_counts dropna the summaries rely on): the top-k
    contract here is over non-null values — unlike SQL GROUP BY, which
    counts the null group. Callers ranking nullable columns must count
    nulls separately."""
    if counters < 1:
        raise ValueError(f"counters must be >= 1, got {counters}")

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: dict = {}
        for batch in batches:
            for item, cnt in batch["item"].value_counts().items():
                summary[item] = summary.get(item, 0) + int(cnt)
            if len(summary) > counters:
                cut = sorted(summary.values(), reverse=True)[counters]
                summary = {i: c - cut for i, c in summary.items() if c > cut}
        if summary:
            yield pd.DataFrame(
                {"item": list(summary.keys()), "est": list(summary.values())}
            )

    return (
        df.select(F.col(col).alias("item"))
        .filter(F.col("item").isNotNull())
        .mapInPandas(mg, schema="item string, est long")
    )


def heavy_hitters_exact(
    df: DataFrame, col: str, k: int = 10, counters: int = 256
) -> DataFrame:
    """EXACT top-k most frequent values of `col` via two bounded passes
    (see module docstring for the guarantee). Output: (item, cnt),
    count-descending with item ascending as the deterministic tiebreak.

    The guarantee requires the true k-th count to exceed n/(counters+1);
    `assert_heavy_hitters_valid` (tests) checks that on the corpus, and
    at 100 TB the operator is sized the same way: counters >= n/f_k for
    the expected k-th frequency f_k."""
    candidates = misra_gries_partials(df, col, counters).select("item").distinct()
    exact = (
        df.select(F.col(col).alias("item"))
        .filter(F.col("item").isNotNull())  # same non-null contract as pass 1
        .join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return exact.orderBy(F.desc("cnt"), F.asc("item")).limit(k)


# --------------------------------------------------------------------------
# Bloom-filter-pruned semi-join
# --------------------------------------------------------------------------


def _bloom_positions(key, n_bits: int, n_hashes: int) -> list:
    """k bit positions for `key`: pmod(xxhash64(seed_i, key), n_bits),
    seeding by prepending a literal (xxhash64 is variadic and chains)."""
    return [
        F.pmod(F.xxhash64(F.lit(i), key), F.lit(n_bits)) for i in range(n_hashes)
    ]


def bloom_bitmap(small: DataFrame, key: str, n_bits: int, n_hashes: int) -> list[int]:
    """Build the Bloom bitmap from the build side as n_bits/64 longs.

    Pure DataFrame aggregation: explode each key's bit positions, group
    by 64-bit word index, OR the bits — one tiny shuffle of at most
    n_bits/64 groups. The collect is the bounded-summary exemption: the
    bitmap size is fixed by `n_bits` (e.g. 2^20 bits = 16 KiB), never by
    data volume."""
    pos = F.explode(F.array(*_bloom_positions(F.col(key), n_bits, n_hashes)))
    words = (
        small.select(pos.alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("word"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    bitmap = [0] * ((n_bits + 63) // 64)
    for r in words:
        bitmap[r["word"]] = r["bits"]
    return bitmap


def bloom_filter_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 5,
) -> DataFrame:
    """Semi-join `big` to `small` on `key`, pre-pruning `big` with a
    broadcast Bloom filter over `small`'s keys before the exact
    confirming left-semi join.

    The probe is pure whole-stage-codegen'd expressions — an array
    literal lookup + bitwise AND per hash — so the big side is filtered
    DURING ITS SCAN with zero shuffle; only survivors (matches + ~fpp
    false positives) continue into the exact semi-join. Output is
    EXACTLY `big semi-join small` (false positives die in the confirming
    join), which the oracle checks. fpp ~ (1 - e^(-kn/m))^k; size m
    (n_bits) for the build-side cardinality as usual.

    SIZE CAP (honest): the bitmap is an ARRAY LITERAL inlined once per
    hash probe in the optimized plan — Catalyst re-inlines a projected
    alias through filter pushdown, so there is no cheap way to bind it
    once (measured: a `withColumn` indirection is collapsed away and the
    plan still carries n_hashes copies, on both join sides). At the
    2^16-bit default that is 5 x 1024 longs of literals — fine; pushing
    n_bits past ~2^20 blows up analysis/codegen size. For build sides
    that need a bigger filter, use Spark's own runtime bloom-filter join
    pushdown (plan-tested in test_scale_properties) or a bitmap-as-
    dimension broadcast join instead of this literal form."""
    bitmap = bloom_bitmap(small, key, n_bits, n_hashes)
    lut = F.array(*[F.lit(w).cast("long") for w in bitmap])
    cond = F.lit(True)
    for pos in _bloom_positions(F.col(key), n_bits, n_hashes):
        word = F.element_at(lut, (pos / 64).cast("int") + 1)
        bit = F.call_function("shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int"))
        cond = cond & (word.bitwiseAND(bit) != 0)
    survivors = big.filter(cond)
    return survivors.join(
        F.broadcast(small.select(key).distinct()), key, "left_semi"
    )

"""Sorts / limits / top-k (SURVEY.md §2 E1-E3).

Reference sites: `limit(100)` `02.a Train - TensorFlow Distributed.py:76`,
debug `limit(10)` `01. Ingest.py:135`; the only sort is driver-side
`sorted(labels)` (`01. Ingest.py:77`) — the engine provides the
distributed forms.

Scale notes: `orderBy().limit(k)` compiles to TakeOrderedAndProject —
each partition keeps a k-heap, the driver merges |partitions|x k rows; no
global sort materializes. A bare global `orderBy` is a range-partitioned
full sort (sampling pass + shuffle) — only use when total order is truly
required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def order_by(df: DataFrame, *cols: Column | str) -> DataFrame:
    """E2 — distributed range-partitioned sort."""
    return df.orderBy(*cols)


def limit_rows(df: DataFrame, n: int) -> DataFrame:
    """E1 — GlobalLimit/CollectLimit."""
    return df.limit(n)


def top_k(df: DataFrame, k: int, *order: Column | str) -> DataFrame:
    """E3 — TakeOrderedAndProject; pass fully-deterministic order columns
    (include a unique tiebreaker) so results are stable across runs."""
    return df.orderBy(*order).limit(k)

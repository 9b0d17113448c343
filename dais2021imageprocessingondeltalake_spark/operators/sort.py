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


def parallel_global_rank(
    df: DataFrame,
    order: list,
    rank_col: str = "rnk",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global row_number over a DATA-SIZED input without the
    single-reducer window: range-partition on the order columns (so
    partition p holds a contiguous slice of the total order), rank
    WITHIN each partition in parallel, then add each partition's
    exclusive prefix count — collected once as a |partitions|-row
    summary (bounded by construction) and broadcast back as a literal
    CASE map. rank = within-partition row_number + offset reproduces the
    global row_number EXACTLY as long as `order` is a total order
    (include a unique tiebreaker) — partition boundaries come from range
    sampling and vary run to run, but any boundary placement yields the
    same global positions.

    This is the production form of every partitionless global window
    (see tests/test_window_audit.py): the dimension-sized
    sites keep the plain window; anything corpus-sized ranks through
    here. Cost: one range shuffle (the same one a global orderBy pays)
    + a per-partition sort; no stage ever funnels the corpus through one
    task."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if not order:
        raise ValueError("parallel_global_rank needs at least one order column")
    cols = [F.col(c) if isinstance(c, str) else c for c in order]
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n_parts, *cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    # pin the range partitioning: the offset summary and the final rank
    # pass must see the SAME boundaries (range sampling re-running in a
    # second job is not contractually stable), and pinning also runs the
    # range shuffle once
    ranged = ranged.localCheckpoint()
    # bounded collect: one (pid, count) row per partition
    sizes = {
        r["__pid"]: r["n"]
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offset, offsets = 0, {}
    for pid in sorted(sizes):
        offsets[pid] = offset
        offset += sizes[pid]
    off_expr = F.lit(0).cast("long")
    for pid, off in offsets.items():
        off_expr = F.when(F.col("__pid") == pid, F.lit(off).cast("long")).otherwise(
            off_expr
        )
    # dim-sized window: partitionBy(__pid) — each window sees one range
    # partition's rows, ranked in parallel across partitions
    w = Window.partitionBy("__pid").orderBy(*cols)
    return (
        ranged.withColumn(rank_col, F.row_number().over(w) + off_expr)
        .drop("__pid")
    )


def parallel_prefix_sum(
    df: DataFrame,
    order: list,
    value_col: str,
    out_col: str = "offset",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global EXCLUSIVE prefix sum of `value_col` over a total `order`,
    without the single-reducer window — parallel_global_rank's
    machinery applied to a running sum (the classic two-pass parallel
    scan): range-partition on the order columns, cumulative-sum WITHIN
    each partition in parallel, then add each partition's exclusive
    prefix TOTAL — collected once as a |partitions|-row summary
    (bounded by construction) and broadcast back as a literal CASE map.
    Exactness: integer values sum associatively, so the two-pass result
    equals the global window's for any boundary placement (callers pass
    integer token counts / byte lengths; float inputs would be
    order-dependent and are the caller's responsibility to avoid).

    This is the scale form of every corpus-sized running total —
    sequence packing offsets, byte-range shard layout, cumulative
    token budgets. Cost: one range shuffle + a per-partition sort."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if not order:
        raise ValueError("parallel_prefix_sum needs at least one order column")
    cols = [F.col(c) if isinstance(c, str) else c for c in order]
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n_parts, *cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    # pin the range partitioning: the per-partition totals and the final
    # cumsum pass must see the SAME boundaries (range sampling is not
    # contractually stable across jobs), and pinning runs the shuffle once
    ranged = ranged.localCheckpoint()
    totals = {
        r["__pid"]: r["t"]
        for r in ranged.groupBy("__pid")
        .agg(F.sum(F.col(value_col).cast("long")).alias("t"))
        .collect()
    }
    offset, offsets = 0, {}
    for pid in sorted(totals):
        offsets[pid] = offset
        offset += totals[pid] or 0
    off_expr = F.lit(0).cast("long")
    for pid, off in offsets.items():
        off_expr = F.when(F.col("__pid") == pid, F.lit(off).cast("long")).otherwise(
            off_expr
        )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col(value_col).cast("long")).over(w)
    return (
        ranged.withColumn(
            out_col, (running - F.col(value_col).cast("long")) + off_expr
        )
        .drop("__pid")
    )

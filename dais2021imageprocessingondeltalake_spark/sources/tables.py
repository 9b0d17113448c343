"""Table sinks + write policies (SURVEY.md §2 A5-A6, A11; §4.2 tactics).

The reference writes Delta with overwrite + mergeSchema and tunes parquet
for binary payloads (`01. Ingest.py:176-183`, `03. Inference.py:43-54`).
Delta's jar isn't in this container, so sinks fall back to parquet with
identical operator semantics (SURVEY.md §1.4); the Delta branch activates
when `delta` is importable.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

try:  # Delta is optional: present on a real cluster, absent in this image
    from delta.tables import DeltaTable  # type: ignore # noqa: F401

    HAS_DELTA = True
except ImportError:
    HAS_DELTA = False

_FORMAT = "delta" if HAS_DELTA else "parquet"


@contextmanager
def binary_write_mode(spark: SparkSession):
    """§4.2 policy: disable parquet compression while writing tables whose
    payload bytes are already compressed (JPEG/PNG), restoring the prior
    codec after — exactly the reference's conf toggle
    (`01. Ingest.py:176-183`). Snappy on image bytes burns CPU for ~0%
    ratio at 100 TB scale."""
    key = "spark.sql.parquet.compression.codec"
    prior = spark.conf.get(key, "snappy")
    spark.conf.set(key, "uncompressed")
    try:
        yield
    finally:
        spark.conf.set(key, prior)


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    merge_schema: bool = False,
    binary_payload: bool = False,
    row_group_bytes: int | None = None,
    compact_to: int | None = None,
) -> None:
    """A5/A6 — batch sink with the reference's knobs:

    - merge_schema: schema evolution on an existing table
      (`01. Ingest.py:180`, `03. Inference.py:49`)
    - binary_payload: uncompressed codec context (§4.2)
    - row_group_bytes: small row groups for wide binary rows, the
      reference's `parquet_row_group_size_bytes=1000000` (`02.a:95-96`)
    - compact_to: pre-write repartition — the engine's portable stand-in
      for post-write `OPTIMIZE` (A11, `00. Explore.py:90`): bin-packing
      compaction by writing N right-sized files in the first place
    """
    spark = df.sparkSession
    if compact_to:
        df = df.repartition(compact_to)
    writer = df.write.format(_FORMAT).mode(mode)
    if merge_schema:
        writer = writer.option("mergeSchema", "true")
    if row_group_bytes:
        writer = writer.option("parquet.block.size", str(row_group_bytes))
    if binary_payload:
        with binary_write_mode(spark):
            writer.save(path)
    else:
        writer.save(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """A3/A4 — path-addressed table scan."""
    return spark.read.format(_FORMAT).load(path)


def compact_table(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """A11 — small-file compaction, the engine's portable `OPTIMIZE`
    (`00. Explore.py:90`, `01. Ingest.py:188-189`): rewrite the table into
    ceil(size/target) files via an atomic-ish tmp swap. Many small files
    destroy scan throughput at 100 TB (per-file open + listing overhead
    and tiny row groups); Delta's OPTIMIZE does this transactionally —
    this fallback rewrites in place. Returns the resulting file count."""
    import math
    import shutil
    from pathlib import Path

    p = Path(path)
    total = sum(f.stat().st_size for f in p.rglob("*.parquet"))
    n_files = max(1, math.ceil(total / target_file_bytes))
    tmp = str(p) + "__compact_tmp"
    spark.read.parquet(path).repartition(n_files).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)
    return len(list(Path(path).rglob("*.parquet")))


def sort_for_skipping(df: DataFrame, *cols: str, n_files: int = 8) -> DataFrame:
    """Layout for parquet min/max data skipping (the Z-order-lite for a
    single sort dimension): range-partition then sort within partitions on
    the skip columns, so each output file (and row group) covers a narrow,
    mostly-disjoint value range. A later filtered scan prunes whole row
    groups via their min/max stats — at 100 TB the difference between a
    full scan and reading a few files. (Delta's OPTIMIZE ZORDER is the
    multi-dimension version; single-dimension sorting is plain Spark.)"""
    return df.repartitionByRange(n_files, *[df[c] for c in cols]).sortWithinPartitions(
        *cols
    )


def zorder_sort_for_skipping(
    df: DataFrame, *cols: str, bits_per_col: int = 8, n_files: int = 8
) -> DataFrame:
    """Multi-column skipping layout: cluster rows on a Z-order
    (Morton) curve over `cols`, so every output file covers a small
    HYPER-RECTANGLE of the value space and a filter on ANY of the
    columns prunes most files via parquet min/max stats. Linear sort
    (sort_for_skipping) gives perfect pruning on the leading column and
    none on the others; Z-order trades a little of each for pruning on
    all — what Delta's OPTIMIZE ZORDER does, built here from plain Spark
    expressions.

    Mechanics: each column is normalized to a `bits_per_col`-bit integer
    with equal-width buckets off a one-row min/max aggregate (for heavily
    skewed columns substitute approxQuantile boundaries — same plan
    shape), then the bits are interleaved column-round-robin into a
    single long key; repartitionByRange + sortWithinPartitions on the key
    gives the curve-ordered layout. Everything is whole-stage-codegen'd
    bitwise expressions; the only extra job is the tiny stats aggregate.
    """
    from pyspark.sql import functions as F

    n_buckets = 1 << bits_per_col
    stats = df.agg(
        *[F.min(c).alias(f"min_{c}") for c in cols],
        *[F.max(c).alias(f"max_{c}") for c in cols],
    ).first()
    zkey = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        lo, hi = float(stats[f"min_{c}"]), float(stats[f"max_{c}"])
        # width_bucket: 1..n_buckets inside [lo,hi); clamp + shift to 0-based
        bucket = F.least(
            F.lit(n_buckets - 1),
            F.greatest(
                F.lit(0),
                F.width_bucket(F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(n_buckets))
                - F.lit(1),
            ),
        ).cast("long")
        for b in range(bits_per_col):
            bit = F.shiftright(bucket, b).bitwiseAND(F.lit(1).cast("long"))
            zkey = zkey.bitwiseOR(F.shiftleft(bit, b * len(cols) + i))
    keyed = df.withColumn("__zkey", zkey)
    return (
        keyed.repartitionByRange(n_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )


def drop_table(spark: SparkSession, path: str) -> None:
    """A10 — DROP TABLE for path-addressed tables (`03. Inference.py:62`
    is `DROP TABLE` + the `%fs rm -r` checkpoint reset at `:67`)."""
    import shutil
    from pathlib import Path

    if Path(path).exists():
        shutil.rmtree(path)


def overwrite_partitions_dynamic(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Incremental partition replacement: with partitionOverwriteMode =
    dynamic, `overwrite` rewrites ONLY the partitions present in `df`,
    leaving every other partition untouched — the idempotent daily-batch
    pattern (re-run day X without truncating the year). Static mode (the
    default) would delete the whole table first; at 100 TB that is the
    difference between rewriting one day and rewriting three years.
    Delta's `replaceWhere` is the transactional equivalent of this seam."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write a catalog table hash-bucketed (and sorted) on the join key.
    Two tables co-bucketed on the same key with the same bucket count
    join with ZERO exchanges — the scan's bucket layout already satisfies
    the join's required distribution, and sortBy lets sort-merge skip its
    sort. THE co-location lever for 100 TB fact-fact joins that recur on
    one key (events⋈users, lineitem⋈orders): pay one shuffle at write
    time, never again at read time. Requires saveAsTable (bucket
    metadata lives in the catalog, not in parquet)."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def join_bucketed(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key. With both
    sides bucketed (same key, same count) Spark plans a sort-merge join
    with NO Exchange on either side — asserted by the scale tests."""
    return spark.table(left_table).join(spark.table(right_table), [on], how)

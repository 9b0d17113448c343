"""Table-maintenance ops (SURVEY.md §2 A10/A11): compaction and drop."""

from __future__ import annotations

import tempfile
from pathlib import Path

from dais2021imageprocessingondeltalake_spark.catalog import load_table
from dais2021imageprocessingondeltalake_spark.sources.tables import (
    compact_table,
    drop_table,
)

from .conftest import SF_DIR


def test_compact_many_small_files(spark):
    docs = load_table(spark, "documents", SF_DIR)
    path = tempfile.mkdtemp(prefix="dais_compact_") + "/t"
    docs.repartition(16).write.parquet(path)  # deliberately fragmented
    before = len(list(Path(path).rglob("*.parquet")))
    assert before == 16
    n = docs.count()
    after = compact_table(spark, path)
    assert after < before
    assert spark.read.parquet(path).count() == n  # lossless rewrite


def test_drop_table(spark):
    docs = load_table(spark, "documents", SF_DIR)
    path = tempfile.mkdtemp(prefix="dais_drop_") + "/t"
    docs.write.parquet(path)
    assert Path(path).exists()
    drop_table(spark, path)
    assert not Path(path).exists()


def test_dynamic_partition_overwrite_touches_only_written_partitions(spark, tmp_path):
    """Overwriting a frame containing only partition X must replace X and
    leave the other partitions' data intact (static mode would truncate
    the whole table) — the idempotent daily-batch re-run pattern."""
    from pyspark.sql import functions as F

    from dais2021imageprocessingondeltalake_spark.sources.tables import (
        overwrite_partitions_dynamic,
    )

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 10), ("c", 100)], ["part", "v"]
    )
    base.write.partitionBy("part").parquet(path)
    fresh = spark.createDataFrame([("b", 99)], ["part", "v"])
    overwrite_partitions_dynamic(fresh, path, ["part"])
    got = {
        (r["part"], r["v"]) for r in spark.read.parquet(path).collect()
    }
    assert got == {("a", 1), ("a", 2), ("b", 99), ("c", 100)}

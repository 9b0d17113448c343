"""SparkSession builder for the engine.

Local harness runs one JVM with N executor threads; on a real cluster the
same configs hold (AQE, Arrow, shuffle-partition sizing) — only master and
memory change. The reference creates its session implicitly on Databricks;
we centralize tuning here so every entry point (tests, bench, driver
contract) gets identical behavior.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "dais2021-spark-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this workload.

    - AQE on: runtime coalescing of shuffle partitions + skew-join splitting
      matter at 100 TB and cost nothing locally.
    - Arrow on: every Python boundary (pandas UDF, applyInPandas, toPandas)
      moves columnar batches, not pickled rows.
    - UTC session timezone: parquet timestamps compare bit-identically with
      the DuckDB oracle.
    - shuffle partitions sized to cores locally; a cluster deployment would
      raise this to ~2-3x total cores (AQE coalesces the excess).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    nparts = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(nparts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's parallelism-first coalescing bottoms out at
        # minPartitionSize (default 1 MB), which serializes CPU-dense
        # small shuffles onto 2-4 cores (the prefix-filter verify join
        # ran its array_intersect stage on 4 of 32 cores). A 16 KB floor
        # keeps those stages wide; at cluster scale shuffle partitions
        # are >> 1 MB, so lowering the FLOOR is a no-op there — the
        # target stays max(bytes/parallelism, floor). Env-overridable
        # for deployments whose scheduler overhead dominates.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "16k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

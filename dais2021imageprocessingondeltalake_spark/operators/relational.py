"""Projections, filters, column ops (SURVEY.md §2 B1-B9).

Reference usage sites: computed-column projection `01. Ingest.py:66-70`,
column pruning `01. Ingest.py:123`, withColumn `01. Ingest.py:87`,
drop `03. Inference.py:34`, typed nulls `01. Ingest.py:119-120`,
cast `02.a Train - TensorFlow Distributed.py:75`, nested access/struct
construction `03. Inference.py:32-33`.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def project(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Projection with computed columns/aliases (B1) — also the vehicle for
    parquet column pruning (SURVEY.md §4.1): narrow early so wide payloads
    (100KB+ binary `content`) never enter the shuffle."""
    return df.select(*cols)


def filter_rows(df: DataFrame, predicate: Column | str) -> DataFrame:
    """Row filter (B9). Declarative predicate → Catalyst pushes it into the
    parquet scan (`PushedFilters`) and prunes partitions."""
    return df.filter(predicate)


def with_column(df: DataFrame, name: str, expr: Column) -> DataFrame:
    """Add/replace a column (B3)."""
    return df.withColumn(name, expr)


def drop_columns(df: DataFrame, *names: str) -> DataFrame:
    """Drop columns (B4)."""
    return df.drop(*names)


def cast_column(df: DataFrame, name: str, dtype: T.DataType | str) -> DataFrame:
    """Cast a column in place (B6)."""
    return df.withColumn(name, F.col(name).cast(dtype))


def null_pad(df: DataFrame, columns: Mapping[str, T.DataType | str]) -> DataFrame:
    """Typed null-literal padding (B5) — build a target schema by adding
    NULL columns of declared types, as the reference does to construct the
    applyInPandas output template (`01. Ingest.py:118-120`)."""
    for name, dtype in columns.items():
        df = df.withColumn(name, F.lit(None).cast(dtype))
    return df


def nested_field(df: DataFrame, path: str, alias: str | None = None) -> DataFrame:
    """Nested struct field access (B7): `col("image.origin")`."""
    c = F.col(path)
    return df.withColumn(alias or path.split(".")[-1], c)


def make_struct(*cols: Column | str, alias: str = "s") -> Column:
    """Struct construction (B8): `struct("origin")`."""
    return F.struct(*cols).alias(alias)


def ensure_columns(df: DataFrame, ordered: Iterable[str]) -> DataFrame:
    """Reorder/subset to a canonical column order (stable schemas for
    sinks and oracle comparison)."""
    return df.select(*ordered)


def observe_metrics(df: DataFrame, name: str = "metrics", *exprs: Column):
    """Attach observed metrics to a plan (df.observe): aggregate
    expressions evaluated PIGGYBACKED on whatever action runs next — the
    data-quality-gate pattern (row counts, null counts, value bounds)
    with ZERO extra passes over the data, unlike a separate .agg() job.
    Returns (df, observation); read observation.get after an action.

    At 100 TB this is the difference between monitoring and doubling the
    job: the metrics ride the existing scan inside each task and merge on
    the driver as a handful of scalars."""
    from pyspark.sql import Observation

    obs = Observation(name)
    if not exprs:
        exprs = (F.count(F.lit(1)).alias("n_rows"),)
    return df.observe(obs, *exprs), obs

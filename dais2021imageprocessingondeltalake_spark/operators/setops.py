"""Set operations (SURVEY.md §2 F) — absent in the reference, standard
engine capability via Spark builtins."""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """UNION ALL by column name (safer than positional `union`)."""
    return a.unionByName(b)


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b).distinct()


def intersect_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_rows(a: DataFrame, b: DataFrame, keep_duplicates: bool = True) -> DataFrame:
    return a.exceptAll(b) if keep_duplicates else a.subtract(b)

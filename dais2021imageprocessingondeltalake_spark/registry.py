"""Query registry: the driver-contract surface.

Every operator from SURVEY.md §2 registers a named query here with an
optional DuckDB oracle SQL. `__spark_entry__.py` re-exports this registry.

Conventions (driver compares row-count + schema + order-insensitive value
hash between the Spark result and the DuckDB oracle):
- Every computed column is aliased identically in Spark and SQL.
- Float aggregates are wrapped in round(x, 2..6) on BOTH sides — sums of
  doubles are order-dependent in the last bits, and Spark/DuckDB aggregate
  in different orders. Per-row float arithmetic needs no rounding (IEEE
  ops on identical inputs are bit-identical), except libm functions
  (ln/exp/pow), which we round.
- Integer-typed aggregates are cast to BIGINT in the oracle (DuckDB sums
  integers into HUGEINT, Spark into LONG).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    headline: bool = False  # include in bench.py


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, headline: bool = False):
    """Register a (spark_fn, oracle_sql) pair under a SURVEY §2 query id."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


def headline_queries() -> dict[str, QuerySpec]:
    return {name: spec for name, spec in REGISTRY.items() if spec.headline}

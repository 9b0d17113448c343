"""Per-operator oracle tests (SURVEY.md §5.2 item 1): every registered
query with an oracle must match DuckDB on the sf0.001 corpus — the local
pre-flight for the driver's sf0.01 gate."""

from __future__ import annotations

import pytest

from dais2021imageprocessingondeltalake_spark import queries_all as q

from .conftest import SF_DIR
from .oracle_harness import compare, run_oracle

ORACLE_QUERIES = sorted(q.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, name):
    spec = q.REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    cols, rows = run_oracle(spec.oracle, SF_DIR)
    problems = compare(df, cols, rows)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must execute and return a DataFrame."""
    for name, spec in q.REGISTRY.items():
        if spec.oracle is None:
            df = spec.fn(spark, SF_DIR)
            assert df.count() >= 0, name

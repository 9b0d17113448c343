"""Differential testing: hypothesis generates random predicates from a
small grammar; each is rendered BOTH as a Spark Column expression and as
the equivalent SQL, executed on Spark and DuckDB, and compared exactly.
This covers the predicate/comparison/boolean-logic surface far beyond the
hand-written oracle queries (null handling, chained AND/OR, numeric
comparisons across int/double columns)."""

from __future__ import annotations

import operator

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dais2021imageprocessingondeltalake_spark.catalog import load_table

from .conftest import SF_DIR
from .oracle_harness import compare, run_oracle

# grammar: atoms over lineitem columns with literal values in-range
_COLS = {
    "l_quantity": st.integers(1, 50).map(float),
    "l_discount": st.sampled_from([0.0, 0.02, 0.05, 0.07, 0.1]),
    "l_linenumber": st.integers(1, 7),
    "l_extendedprice": st.integers(1000, 90000).map(float),
}
_OPS = {
    "<": operator.lt,
    "<=": operator.le,
    ">": operator.gt,
    ">=": operator.ge,
    "=": operator.eq,
    "<>": operator.ne,
}


@st.composite
def atoms(draw):
    col = draw(st.sampled_from(sorted(_COLS)))
    op = draw(st.sampled_from(sorted(_OPS)))
    val = draw(_COLS[col])
    return (col, op, val)


@st.composite
def predicates(draw):
    """1-3 atoms combined with AND/OR (left-associated)."""
    n = draw(st.integers(1, 3))
    parts = [draw(atoms()) for _ in range(n)]
    joiners = [draw(st.sampled_from(["AND", "OR"])) for _ in range(n - 1)]
    return parts, joiners


def _to_spark(parts, joiners):
    col, op, val = parts[0]
    e = _OPS[op](F.col(col), F.lit(val))
    for (col, op, val), j in zip(parts[1:], joiners):
        nxt = _OPS[op](F.col(col), F.lit(val))
        e = (e & nxt) if j == "AND" else (e | nxt)
    return e


def _to_sql(parts, joiners):
    def atom(a):
        col, op, val = a
        lit = repr(val) if isinstance(val, float) else str(val)
        return f"({col} {op} {lit})"

    s = atom(parts[0])
    for a, j in zip(parts[1:], joiners):
        s = f"({s} {j} {atom(a)})"
    return s


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicates())
def test_random_predicates_match_duckdb(spark, pred):
    parts, joiners = pred
    li = load_table(spark, "lineitem", SF_DIR)
    got = li.filter(_to_spark(parts, joiners)).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    sql = (
        "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE "
        + _to_sql(parts, joiners)
    )
    cols, rows = run_oracle(sql, SF_DIR)
    problems = compare(got, cols, rows, rel_tol=0.0)
    assert not problems, f"{_to_sql(parts, joiners)}: {problems[:2]}"


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.sets(
        st.sampled_from(["l_returnflag", "l_linestatus", "l_linenumber"]), min_size=1
    ).map(sorted),
    pred=predicates(),
)
def test_random_grouped_counts_match_duckdb(spark, keys, pred):
    """Random GROUP BY over a random predicate: counts + integer-valued
    sums must match exactly regardless of grouping keys."""
    parts, joiners = pred
    li = load_table(spark, "lineitem", SF_DIR).filter(_to_spark(parts, joiners))
    got = li.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("sum_qty")
    )
    sql = (
        f"SELECT {', '.join(keys)}, count(*) AS n, sum(l_quantity) AS sum_qty "
        f"FROM lineitem WHERE {_to_sql(parts, joiners)} GROUP BY {', '.join(keys)}"
    )
    cols, rows = run_oracle(sql, SF_DIR)
    problems = compare(got, cols, rows, rel_tol=0.0)
    assert not problems, f"{sql}: {problems[:2]}"

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


# ---- extended grammar: strings, BETWEEN, IN, NOT ----------------------------
_STR_COLS = {
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["F", "O"],
}


@st.composite
def ext_atoms(draw):
    """Atom kinds: numeric compare | string equality | BETWEEN | IN."""
    kind = draw(st.sampled_from(["num", "str_eq", "between", "in"]))
    if kind == "num":
        return ("num", draw(atoms()))
    if kind == "str_eq":
        col = draw(st.sampled_from(sorted(_STR_COLS)))
        val = draw(st.sampled_from(_STR_COLS[col]))
        op = draw(st.sampled_from(["=", "<>"]))
        return ("str_eq", (col, op, val))
    if kind == "between":
        lo = draw(st.integers(1, 40))
        hi = lo + draw(st.integers(0, 10))
        return ("between", ("l_quantity", float(lo), float(hi)))
    col = draw(st.sampled_from(sorted(_STR_COLS)))
    vals = draw(st.sets(st.sampled_from(_STR_COLS[col]), min_size=1).map(sorted))
    return ("in", (col, vals))


def _ext_to_spark(a):
    kind, payload = a
    if kind == "num":
        col, op, val = payload
        return _OPS[op](F.col(col), F.lit(val))
    if kind == "str_eq":
        col, op, val = payload
        e = F.col(col) == val
        return e if op == "=" else ~e
    if kind == "between":
        col, lo, hi = payload
        return F.col(col).between(lo, hi)
    col, vals = payload
    return F.col(col).isin(vals)


def _ext_to_sql(a):
    kind, payload = a
    if kind == "num":
        col, op, val = payload
        return f"({col} {op} {val!r})"
    if kind == "str_eq":
        col, op, val = payload
        return f"({col} {op} '{val}')"
    if kind == "between":
        col, lo, hi = payload
        return f"({col} BETWEEN {lo!r} AND {hi!r})"
    col, vals = payload
    return f"({col} IN ({', '.join(repr(v) for v in vals)}))"


@st.composite
def ext_predicates(draw):
    """1-3 extended atoms, optional NOT per atom, AND/OR joined."""
    n = draw(st.integers(1, 3))
    parts = [(draw(ext_atoms()), draw(st.booleans())) for _ in range(n)]
    joiners = [draw(st.sampled_from(["AND", "OR"])) for _ in range(n - 1)]
    return parts, joiners


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=ext_predicates())
def test_extended_predicates_match_duckdb(spark, pred):
    """BETWEEN / IN / string equality / NOT — the predicate surface the
    simple numeric grammar misses, same exact-compare harness."""
    parts, joiners = pred
    e = None
    for (a, neg), j in zip(parts, [None] + joiners):
        cur = _ext_to_spark(a)
        cur_sql = _ext_to_sql(a)
        if neg:
            cur = ~cur
            cur_sql = f"(NOT {cur_sql})"
        if e is None:
            e, s = cur, cur_sql
        else:
            e = (e & cur) if j == "AND" else (e | cur)
            s = f"({s} {j} {cur_sql})"
    li = load_table(spark, "lineitem", SF_DIR)
    got = li.filter(e).select("l_orderkey", "l_linenumber")
    sql = f"SELECT l_orderkey, l_linenumber FROM lineitem WHERE {s}"
    cols, rows = run_oracle(sql, SF_DIR)
    problems = compare(got, cols, rows, rel_tol=0.0)
    assert not problems, f"{sql}: {problems[:2]}"


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sort_col=st.sampled_from(["l_quantity", "l_extendedprice", "l_linenumber"]),
    desc=st.booleans(),
    k=st.integers(1, 50),
    pred=predicates(),
)
def test_random_topk_matches_duckdb(spark, sort_col, desc, k, pred):
    """Random ORDER BY + LIMIT with a full tiebreak chain: the selected
    row SET must match exactly (exercises TakeOrderedAndProject vs
    DuckDB's top-n)."""
    parts, joiners = pred
    li = load_table(spark, "lineitem", SF_DIR).filter(_to_spark(parts, joiners))
    sc = F.col(sort_col).desc() if desc else F.col(sort_col).asc()
    got = (
        li.select("l_orderkey", "l_linenumber", sort_col)
        .orderBy(sc, F.col("l_orderkey"), F.col("l_linenumber"))
        .limit(k)
    )
    direction = "DESC" if desc else "ASC"
    sql = (
        f"SELECT l_orderkey, l_linenumber, {sort_col} FROM lineitem "
        f"WHERE {_to_sql(parts, joiners)} "
        f"ORDER BY {sort_col} {direction}, l_orderkey, l_linenumber LIMIT {k}"
    )
    cols, rows = run_oracle(sql, SF_DIR)
    problems = compare(got, cols, rows, rel_tol=0.0)
    assert not problems, f"{sql}: {problems[:2]}"


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pred=predicates(),
    how=st.sampled_from(["inner", "left"]),
)
def test_random_join_matches_duckdb(spark, pred, how):
    """Random filter pushed through an orders⋈lineitem join in a random
    join mode — NULL-extension rows from LEFT joins must hash-match."""
    parts, joiners = pred
    o = load_table(spark, "orders", SF_DIR).select("o_orderkey", "o_orderpriority")
    li = load_table(spark, "lineitem", SF_DIR).filter(_to_spark(parts, joiners)).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    got = o.join(li, o["o_orderkey"] == li["l_orderkey"], how).select(
        "o_orderkey", "o_orderpriority", "l_linenumber", "l_quantity"
    )
    join_kw = "JOIN" if how == "inner" else "LEFT JOIN"
    sql = (
        "SELECT o_orderkey, o_orderpriority, l_linenumber, l_quantity "
        "FROM orders o "
        f"{join_kw} (SELECT * FROM lineitem WHERE {_to_sql(parts, joiners)}) l "
        "ON o.o_orderkey = l.l_orderkey"
    )
    cols, rows = run_oracle(sql, SF_DIR)
    problems = compare(got, cols, rows, rel_tol=0.0)
    assert not problems, f"{sql}: {problems[:2]}"


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.sets(
        st.sampled_from(["l_returnflag", "l_linestatus", "l_linenumber"]), min_size=1
    ).map(sorted),
    aggs=st.sets(
        st.sampled_from(["min_qty", "max_qty", "avg_qty", "nd_line", "min_flag"]),
        min_size=1,
    ).map(sorted),
    pred=predicates(),
)
def test_random_agg_functions_match_duckdb(spark, keys, aggs, pred):
    """Random aggregate-function subset over random keys: min/max/avg on
    integer-valued doubles (exact — sums stay under 2^53), exact
    count distinct, and string min. Exercises partial-aggregation merge
    paths the fixed oracle queries touch only one way."""
    parts, joiners = pred
    li = load_table(spark, "lineitem", SF_DIR).filter(_to_spark(parts, joiners))
    spark_aggs = {
        "min_qty": F.min("l_quantity").alias("min_qty"),
        "max_qty": F.max("l_quantity").alias("max_qty"),
        "avg_qty": F.avg("l_quantity").alias("avg_qty"),
        "nd_line": F.count_distinct("l_linenumber").alias("nd_line"),
        "min_flag": F.min("l_returnflag").alias("min_flag"),
    }
    sql_aggs = {
        "min_qty": "min(l_quantity) AS min_qty",
        "max_qty": "max(l_quantity) AS max_qty",
        "avg_qty": "avg(l_quantity) AS avg_qty",
        "nd_line": "CAST(count(DISTINCT l_linenumber) AS BIGINT) AS nd_line",
        "min_flag": "min(l_returnflag) AS min_flag",
    }
    got = li.groupBy(*keys).agg(*[spark_aggs[a] for a in aggs])
    sql = (
        f"SELECT {', '.join(keys)}, {', '.join(sql_aggs[a] for a in aggs)} "
        f"FROM lineitem WHERE {_to_sql(parts, joiners)} GROUP BY {', '.join(keys)}"
    )
    cols, rows = run_oracle(sql, SF_DIR)
    problems = compare(got, cols, rows, rel_tol=0.0)
    assert not problems, f"{sql}: {problems[:2]}"


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.sets(
        st.sampled_from(["l_returnflag", "l_linestatus", "l_linenumber"]), min_size=1
    ).map(sorted),
    threshold=st.integers(1, 2000),
    pred=predicates(),
)
def test_random_having_matches_duckdb(spark, keys, threshold, pred):
    """Random HAVING over grouped counts — the filter-after-aggregate
    path (Catalyst keeps it above the agg, never pushes it into the
    pre-shuffle partial)."""
    parts, joiners = pred
    li = load_table(spark, "lineitem", SF_DIR).filter(_to_spark(parts, joiners))
    got = (
        li.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > threshold)
    )
    sql = (
        f"SELECT {', '.join(keys)}, count(*) AS n FROM lineitem "
        f"WHERE {_to_sql(parts, joiners)} GROUP BY {', '.join(keys)} "
        f"HAVING count(*) > {threshold}"
    )
    cols, rows = run_oracle(sql, SF_DIR)
    problems = compare(got, cols, rows, rel_tol=0.0)
    assert not problems, f"{sql}: {problems[:2]}"


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicates(), else_val=st.integers(-5, 5))
def test_random_case_expression_matches_duckdb(spark, pred, else_val):
    """Random CASE WHEN <predicate> THEN <int> ELSE <int> projected and
    summed as BIGINT — conditional-expression evaluation incl. NULL
    predicate semantics (NULL condition takes the ELSE branch in both
    engines)."""
    parts, joiners = pred
    li = load_table(spark, "lineitem", SF_DIR)
    case_col = F.when(_to_spark(parts, joiners), F.lit(1)).otherwise(F.lit(else_val))
    got = li.agg(
        F.sum(case_col.cast("bigint")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    sql = (
        f"SELECT CAST(sum(CASE WHEN {_to_sql(parts, joiners)} THEN 1 "
        f"ELSE {else_val} END) AS BIGINT) AS s, count(*) AS n FROM lineitem"
    )
    cols, rows = run_oracle(sql, SF_DIR)
    problems = compare(got, cols, rows, rel_tol=0.0)
    assert not problems, f"{sql}: {problems[:2]}"


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pkey=st.sampled_from(["l_returnflag", "l_linestatus", "l_linenumber"]),
    okey=st.sampled_from(["l_quantity", "l_extendedprice", "l_discount"]),
    fn=st.sampled_from(["row_number", "rank", "dense_rank"]),
    pred=predicates(),
)
def test_random_window_rank_matches_duckdb(spark, pkey, okey, fn, pred):
    """Random ranking function over random partition/order keys with a
    full (orderkey, linenumber) tiebreak so both engines rank
    identically — covers the window shuffle+sort path with every
    ranking-function/key combination."""
    from pyspark.sql import Window

    parts, joiners = pred
    li = load_table(spark, "lineitem", SF_DIR).filter(_to_spark(parts, joiners))
    w = Window.partitionBy(pkey).orderBy(okey, "l_orderkey", "l_linenumber")
    spark_fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}
    got = li.select(
        "l_orderkey", "l_linenumber", F.col(pkey).alias("pk"),
        spark_fn[fn]().over(w).alias("rnk"),
    )
    sql = (
        f"SELECT l_orderkey, l_linenumber, {pkey} AS pk, "
        f"CAST({fn}() OVER (PARTITION BY {pkey} "
        f"ORDER BY {okey}, l_orderkey, l_linenumber) AS BIGINT) AS rnk "
        f"FROM lineitem WHERE {_to_sql(parts, joiners)}"
    )
    cols, rows = run_oracle(sql, SF_DIR)
    problems = compare(got, cols, rows, rel_tol=0.0)
    assert not problems, f"{sql}: {problems[:2]}"


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sets=st.lists(
        st.sets(
            st.sampled_from(["l_returnflag", "l_linestatus", "l_linenumber"]),
        ).map(sorted),
        min_size=1,
        max_size=3,
        unique_by=tuple,
    ),
    pred=predicates(),
)
def test_random_grouping_sets_match_duckdb(spark, sets, pred):
    """Random GROUPING SETS (including the empty grand-total set): the
    expansion + grouping-id handling must match DuckDB exactly, with
    NULLs distinguishing 'not in this set' from data NULLs via the
    GROUPING marker.

    DOCUMENTED DIVERGENCE (found by this test): over an EMPTY input,
    Spark's GROUPING SETS ((), ...) emits zero rows — its Expand+groupBy
    lowering has nothing to expand — while DuckDB/PostgreSQL follow the
    SQL standard and still emit the grand-total row (count=0). Verified
    identical in Spark SQL and the DataFrame API, so it's engine
    semantics, not this repo. Non-empty inputs agree exactly; the test
    assumes a non-empty filter result."""
    from hypothesis import assume

    parts, joiners = pred
    li = load_table(spark, "lineitem", SF_DIR).filter(_to_spark(parts, joiners))
    assume(li.limit(1).count() == 1)
    all_keys = sorted({k for s in sets for k in s})
    if not all_keys:
        return  # all-empty sets: plain grand total, covered elsewhere
    got = (
        li.groupingSets([list(s) for s in sets], *[F.col(k) for k in all_keys])
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[F.grouping(k).cast("bigint").alias(f"g_{k}") for k in all_keys],
        )
    )
    sql_sets = ", ".join("(" + ", ".join(s) + ")" for s in sets)
    sql = (
        f"SELECT {', '.join(all_keys)}, count(*) AS n, "
        + ", ".join(f"CAST(GROUPING({k}) AS BIGINT) AS g_{k}" for k in all_keys)
        + f" FROM lineitem WHERE {_to_sql(parts, joiners)} "
        + f"GROUP BY GROUPING SETS ({sql_sets})"
    )
    cols, rows = run_oracle(sql, SF_DIR)
    problems = compare(got, cols, rows, rel_tol=0.0)
    assert not problems, f"{sql}: {problems[:2]}"


@st.composite
def doc_atoms(draw):
    """Atoms over the documents table: length ranges, language/source
    equality, and LIKE patterns (prefix/suffix/containment)."""
    kind = draw(st.sampled_from(["len", "lang", "source", "like"]))
    if kind == "len":
        lo = draw(st.integers(0, 400))
        return ("len", lo, lo + draw(st.integers(10, 300)))
    if kind == "lang":
        return ("lang", draw(st.sampled_from(["en", "de", "fr", "es", "zz"])))
    if kind == "source":
        return ("source", draw(st.sampled_from(["web", "books", "code", "wiki", "none"])))
    pat = draw(st.sampled_from(["the", "data", "q", "xyz"]))
    shape = draw(st.sampled_from(["prefix", "suffix", "contains"]))
    return ("like", pat, shape)


def _doc_atom_spark(a):
    if a[0] == "len":
        return F.col("n_chars").between(a[1], a[2])
    if a[0] == "lang":
        return F.col("lang") == a[1]
    if a[0] == "source":
        return F.col("source") == a[1]
    _, pat, shape = a
    return {
        "prefix": F.col("text").startswith(pat),
        "suffix": F.col("text").endswith(pat),
        "contains": F.col("text").contains(pat),
    }[shape]


def _doc_atom_sql(a):
    if a[0] == "len":
        return f"(n_chars BETWEEN {a[1]} AND {a[2]})"
    if a[0] == "lang":
        return f"(lang = '{a[1]}')"
    if a[0] == "source":
        return f"(source = '{a[1]}')"
    _, pat, shape = a
    return {
        "prefix": f"(text LIKE '{pat}%')",
        "suffix": f"(text LIKE '%{pat}')",
        "contains": f"(text LIKE '%{pat}%')",
    }[shape]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    atoms_=st.lists(doc_atoms(), min_size=1, max_size=3),
    joiners=st.lists(st.sampled_from(["AND", "OR"]), min_size=2, max_size=2),
)
def test_random_document_predicates_match_duckdb(spark, atoms_, joiners):
    """Random predicates over the documents corpus — startswith/endswith/
    contains must translate to LIKE with identical semantics, grouped
    counts per (lang, source) compare exactly."""
    e = _doc_atom_spark(atoms_[0])
    sql_pred = _doc_atom_sql(atoms_[0])
    for a, j in zip(atoms_[1:], joiners):
        nxt, nxt_sql = _doc_atom_spark(a), _doc_atom_sql(a)
        e = (e & nxt) if j == "AND" else (e | nxt)
        sql_pred = f"({sql_pred} {j} {nxt_sql})"
    docs = load_table(spark, "documents", SF_DIR).filter(e)
    got = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("total_chars"),
    )
    # CAST(sum(..) AS BIGINT): DuckDB sums integers into HUGEINT, which
    # run_oracle now rejects as not Spark-representable (r6 type guard)
    sql = (
        "SELECT lang, source, count(*) AS n, "
        "CAST(sum(n_chars) AS BIGINT) AS total_chars "
        f"FROM documents WHERE {sql_pred} GROUP BY lang, source"
    )
    cols, rows = run_oracle(sql, SF_DIR)
    problems = compare(got, cols, rows, rel_tol=0.0)
    assert not problems, f"{sql}: {problems[:2]}"


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    month=st.integers(1, 12),
    year=st.sampled_from([1995, 1997, 1999, 2001]),
    op=st.sampled_from(["<", ">=", "="]),
    bucket=st.sampled_from(["year", "month", "quarter"]),
)
def test_random_timestamp_predicates_match_duckdb(spark, month, year, op, bucket):
    """Random timestamp-literal comparisons + calendar-bucket grouping:
    date_trunc/year/month/quarter extraction and timestamp ordering must
    agree across engines at microsecond precision."""
    lit = f"{year}-{month:02d}-01"
    li = load_table(spark, "orders", SF_DIR)
    spark_ops = {"<": F.col("o_orderdate") < F.lit(lit).cast("timestamp"),
                 ">=": F.col("o_orderdate") >= F.lit(lit).cast("timestamp"),
                 "=": F.col("o_orderdate") == F.lit(lit).cast("timestamp")}
    spark_bucket = {
        "year": F.year("o_orderdate"),
        "month": F.month("o_orderdate"),
        "quarter": F.quarter("o_orderdate"),
    }[bucket].cast("bigint")
    got = (
        li.filter(spark_ops[op])
        .groupBy(spark_bucket.alias("b"))
        .agg(F.count(F.lit(1)).alias("n"), F.max("o_orderdate").alias("max_d"))
    )
    sql = (
        f"SELECT CAST({bucket}(o_orderdate) AS BIGINT) AS b, count(*) AS n, "
        f"max(o_orderdate) AS max_d FROM orders "
        f"WHERE o_orderdate {op} TIMESTAMP '{lit}' GROUP BY 1"
    )
    cols, rows = run_oracle(sql, SF_DIR)
    problems = compare(got, cols, rows, rel_tol=0.0)
    assert not problems, f"{sql}: {problems[:2]}"


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    k=st.integers(1, 30),
    off=st.integers(0, 40),
    desc=st.booleans(),
)
def test_random_limit_offset_matches_duckdb(spark, k, off, desc):
    """ORDER BY + OFFSET + LIMIT with a full tiebreak: pagination must
    select the identical row window in both engines."""
    li = load_table(spark, "lineitem", SF_DIR)
    sc = F.col("l_extendedprice").desc() if desc else F.col("l_extendedprice").asc()
    got = (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(sc, F.col("l_orderkey"), F.col("l_linenumber"))
        .offset(off)
        .limit(k)
    )
    direction = "DESC" if desc else "ASC"
    sql = (
        "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem "
        f"ORDER BY l_extendedprice {direction}, l_orderkey, l_linenumber "
        f"LIMIT {k} OFFSET {off}"
    )
    cols, rows = run_oracle(sql, SF_DIR)
    problems = compare(got, cols, rows, rel_tol=0.0)
    assert not problems, f"{sql}: {problems[:2]}"


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    p1=predicates(),
    p2=predicates(),
    setop=st.sampled_from(["union", "union_all", "intersect", "except"]),
)
def test_random_set_operations_match_duckdb(spark, p1, p2, setop):
    """Random UNION [ALL] / INTERSECT / EXCEPT of two filtered subsets —
    bag vs set semantics (UNION dedups, UNION ALL keeps multiplicity,
    INTERSECT/EXCEPT are set-wise) must match exactly."""
    a_parts, a_join = p1
    b_parts, b_join = p2
    li = load_table(spark, "lineitem", SF_DIR).select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )
    a = li.filter(_to_spark(a_parts, a_join))
    b = li.filter(_to_spark(b_parts, b_join))
    got = {
        "union": lambda: a.union(b).distinct(),
        "union_all": lambda: a.union(b),
        "intersect": lambda: a.intersect(b),
        "except": lambda: a.subtract(b),  # subtract == SQL EXCEPT (set-wise)
    }[setop]()
    kw = {
        "union": "UNION",
        "union_all": "UNION ALL",
        "intersect": "INTERSECT",
        "except": "EXCEPT",
    }[setop]
    sub = "SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem WHERE "
    sql = f"({sub}{_to_sql(a_parts, a_join)}) {kw} ({sub}{_to_sql(b_parts, b_join)})"
    cols, rows = run_oracle(sql, SF_DIR)
    problems = compare(got, cols, rows, rel_tol=0.0)
    assert not problems, f"{sql}: {problems[:2]}"


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicates(), keys=st.sets(
    st.sampled_from(["l_returnflag", "l_linestatus"]), min_size=1).map(sorted))
def test_count_null_semantics_match_duckdb(spark, pred, keys):
    """COUNT(col) skips NULLs, COUNT(*) doesn't, SUM over all-NULL groups
    is NULL not 0 — the classic aggregate-null semantics, exercised over
    a derived nullable column."""
    parts, joiners = pred
    li = load_table(spark, "lineitem", SF_DIR)
    nullable = F.when(_to_spark(parts, joiners), F.col("l_quantity"))
    got = li.groupBy(*keys).agg(
        F.count(nullable).alias("n_nonnull"),
        F.count(F.lit(1)).alias("n_all"),
        F.sum(nullable).alias("s"),
    )
    case = f"CASE WHEN {_to_sql(parts, joiners)} THEN l_quantity END"
    sql = (
        f"SELECT {', '.join(keys)}, count({case}) AS n_nonnull, "
        f"count(*) AS n_all, sum({case}) AS s "
        f"FROM lineitem GROUP BY {', '.join(keys)}"
    )
    cols, rows = run_oracle(sql, SF_DIR)
    problems = compare(got, cols, rows, rel_tol=0.0)
    assert not problems, f"{sql}: {problems[:2]}"


# --------------------------------------------------------------------------
# Curation-expression differentials over documents: the text-scalar and
# deterministic-sampling surface the curation tier rests on (token counts,
# distinct counts, md5-prefix Bernoulli predicates, LIKE shapes, modular
# slicing), rendered to both engines and compared exactly.
# --------------------------------------------------------------------------
_CUR_WORDS = ["the", "data", "model", "learning", "and"]

_CUR_EXPRS = {
    # name -> (spark Column factory, SQL text)
    "tok_count": (
        lambda: F.size(F.split(F.col("text"), " ")).cast("bigint"),
        "CAST(len(string_split(text, ' ')) AS BIGINT)",
    ),
    "distinct_toks": (
        lambda: F.size(F.array_distinct(F.split(F.col("text"), " "))).cast("bigint"),
        "CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)",
    ),
    "n_chars_live": (
        lambda: F.length(F.col("text")).cast("bigint"),
        "CAST(len(text) AS BIGINT)",
    ),
    "ttr": (
        lambda: F.size(F.array_distinct(F.split(F.col("text"), " ")))
        / F.size(F.split(F.col("text"), " ")),
        "len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' '))",
    ),
}


@st.composite
def curation_queries(draw):
    cols = draw(
        st.lists(st.sampled_from(sorted(_CUR_EXPRS)), min_size=1, max_size=3, unique=True)
    )
    pred_kind = draw(st.sampled_from(["md5", "like", "mod", "tok"]))
    if pred_kind == "md5":
        rate16 = draw(st.integers(1, 15))
        thr = format(rate16 * 16**7, "08x")
        pred = (
            lambda: F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) < thr,
            f"substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{thr}'",
        )
    elif pred_kind == "like":
        w = draw(st.sampled_from(_CUR_WORDS))
        pred = (lambda: F.col("text").like(f"%{w}%"), f"text LIKE '%{w}%'")
    elif pred_kind == "mod":
        k = draw(st.integers(2, 13))
        r = draw(st.integers(0, 1))
        pred = (lambda: F.col("doc_id") % k == r, f"doc_id % {k} = {r}")
    else:
        n = draw(st.integers(5, 120))
        pred = (
            lambda: F.size(F.split(F.col("text"), " ")) >= n,
            f"len(string_split(text, ' ')) >= {n}",
        )
    return cols, pred


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=curation_queries())
def test_random_curation_exprs_match_duckdb(spark, q):
    cols, (spark_pred, sql_pred) = q
    docs = load_table(spark, "documents", SF_DIR)
    got = docs.filter(spark_pred()).select(
        "doc_id", *[_CUR_EXPRS[c][0]().alias(c) for c in cols]
    )
    sel = ", ".join(f"{_CUR_EXPRS[c][1]} AS {c}" for c in cols)
    sql = f"SELECT doc_id, {sel} FROM documents WHERE {sql_pred}"
    oracle_cols, rows = run_oracle(sql, SF_DIR)
    problems = compare(got, oracle_cols, rows, rel_tol=0.0)
    assert not problems, f"{sql}: {problems[:2]}"


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pred=predicates(),
    how=st.sampled_from(["left_semi", "left_anti"]),
)
def test_random_semi_anti_join_matches_duckdb(spark, pred, how):
    """Random filter on the EXISTS side of a semi/anti join — the
    existence-test surface the fixed oracles only cover at two points.
    Semi must not multiply rows; anti must be the exact complement."""
    parts, joiners = pred
    o = load_table(spark, "orders", SF_DIR).select("o_orderkey", "o_orderpriority")
    li = load_table(spark, "lineitem", SF_DIR).filter(_to_spark(parts, joiners)).select(
        "l_orderkey"
    )
    got = o.join(li, o["o_orderkey"] == li["l_orderkey"], how)
    exists_kw = "EXISTS" if how == "left_semi" else "NOT EXISTS"
    sql = (
        "SELECT o_orderkey, o_orderpriority FROM orders o "
        f"WHERE {exists_kw} (SELECT 1 FROM lineitem l "
        f"WHERE l.l_orderkey = o.o_orderkey AND ({_to_sql(parts, joiners)}))"
    )
    cols, rows = run_oracle(sql, SF_DIR)
    problems = compare(got, cols, rows, rel_tol=0.0)
    assert not problems, f"{sql}: {problems[:2]}"


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pred=predicates(),
    frame=st.sampled_from(["rows_2p", "rows_unb", "rows_1f"]),
    pkey=st.sampled_from(["l_returnflag", "l_linestatus"]),
)
def test_random_window_frames_match_duckdb(spark, pred, frame, pkey):
    """Random ROWS-frame running aggregates over a random filtered input.
    ROWS frames on integer sums are engine-exact (no float, no RANGE
    peer-group ambiguity); the input pre-aggregates to one row per
    (partition, orderkey, linenumber) because the synthetic lineitem has
    duplicate line keys — a non-unique ROWS order would make frame
    contents engine-dependent."""
    from pyspark.sql import Window

    parts, joiners = pred
    li = (
        load_table(spark, "lineitem", SF_DIR)
        .filter(_to_spark(parts, joiners))
        .groupBy("l_orderkey", "l_linenumber", pkey)
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
    )
    specs = {
        "rows_2p": ((-2, 0), "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW"),
        "rows_unb": ((Window.unboundedPreceding, 0), "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"),
        "rows_1f": ((0, 1), "ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING"),
    }
    (lo, hi), sql_frame = specs[frame]
    w = (
        Window.partitionBy(pkey)
        .orderBy("l_orderkey", "l_linenumber")
        .rowsBetween(lo, hi)
    )
    got = li.select(
        "l_orderkey", "l_linenumber", pkey, F.sum("q").over(w).alias("running_q")
    )
    sql = (
        f"SELECT l_orderkey, l_linenumber, {pkey}, "
        f"CAST(sum(q) OVER (PARTITION BY {pkey} ORDER BY l_orderkey, l_linenumber "
        f"{sql_frame}) AS BIGINT) AS running_q "
        f"FROM (SELECT l_orderkey, l_linenumber, {pkey}, "
        f"CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q FROM lineitem "
        f"WHERE {_to_sql(parts, joiners)} GROUP BY 1, 2, 3)"
    )
    cols, rows = run_oracle(sql, SF_DIR)
    problems = compare(got, cols, rows, rel_tol=0.0)
    assert not problems, f"{sql}: {problems[:2]}"


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    agg=st.sampled_from(["min", "max", "count"]),
    op=st.sampled_from([">", "<", ">=", "<="]),
    pred=predicates(),
)
def test_same_sql_correlated_subquery_matches_duckdb(spark, agg, op, pred):
    """ONE SQL text executed by BOTH engines: a correlated scalar
    subquery over a random-filtered lineitem compared against an order
    column. Exercises Spark's decorrelation (Catalyst rewrites to an
    aggregate + join) against DuckDB's native evaluation. Integer-safe
    quantities only (count/min/max on BIGINT casts)."""
    from dais2021imageprocessingondeltalake_spark.catalog import register_views

    parts, joiners = pred
    inner_pred = _to_sql(parts, joiners)
    sql = (
        "SELECT o_orderkey, o_orderpriority FROM orders o "
        f"WHERE CAST(coalesce((SELECT {agg}(CAST(l.l_linenumber AS BIGINT)) "
        f"FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND ({inner_pred})), 0) "
        f"AS BIGINT) {op} 3"
    )
    register_views(spark, SF_DIR)
    got = spark.sql(sql)
    cols, rows = run_oracle(sql, SF_DIR)
    problems = compare(got, cols, rows, rel_tol=0.0)
    assert not problems, f"{sql}: {problems[:2]}"


# ---------------------------------------------------------------------------
# Data-dependent hex-threshold sampling family: random rates + salts, the
# in-engine rate->md5-threshold conversion (sampling._hex_threshold_col)
# rendered on both engines and compared exactly. This is the idiom behind
# temperature rebalancing and curate_v2 — boundary bugs here (lpad
# truncation at rate>=1, floor at the 2^32 edge, hex case) silently skew
# samples, so the family sweeps rates across [0, 1.2] including exact 0,
# 1, and just-under-1 values.
# ---------------------------------------------------------------------------
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rate=st.one_of(
        st.sampled_from([0.0, 1.0, 0.999999, 1.2, 0.5]),
        st.floats(0.0, 1.2, allow_nan=False, allow_infinity=False),
    ),
    salt=st.sampled_from(["", "x", "temp", "q"]),
)
def test_random_hex_threshold_sampling_matches_duckdb(spark, rate, salt):
    from dais2021imageprocessingondeltalake_spark.operators.sampling import (
        _hex_threshold_col,
    )

    r6 = round(rate, 6)
    docs = load_table(spark, "documents", SF_DIR).select("doc_id")
    digest = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(salt))), 1, 8
    )
    got = docs.withColumn("r", F.lit(float(r6))).filter(
        digest < _hex_threshold_col(F.col("r"))
    ).select("doc_id")
    sql = f"""
    SELECT doc_id FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR) || '{salt}'), 1, 8) <
          CASE WHEN {r6!r} >= 1.0 THEN 'g'
               ELSE lower(lpad(hex(CAST(floor({r6!r} * 4294967296.0) AS BIGINT)), 8, '0'))
          END
    """
    problems = compare(got, *run_oracle(sql, SF_DIR), rel_tol=0.0)
    assert not problems, problems

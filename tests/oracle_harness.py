"""Local replica of the driver's DuckDB-oracle compare.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, then compares row counts, column names, and (column-name-sorted,
row-sorted) values. Floats compare with a tiny relative tolerance so this
harness flags real mismatches, not last-bit libm noise — the driver's
exact hash is stricter, which is why registered queries round/cast on
both sides.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb

from dais2021imageprocessingondeltalake_spark.catalog import TABLES


#: DuckDB result types with no Spark equivalent. The driver's value hash
#: is TYPE-sensitive, so an oracle column typed HUGEINT (what DuckDB
#: gives sum() over integers) hash-mismatches a bigint Spark column even
#: when every value is identical — the exact failure mode of the r5
#: q_tpch_priority_lines red row, which this harness's value-level
#: compare could not see (VERDICT r5 item 1). Raising here makes the
#: sweep catch the class before the driver does. Fix in the oracle:
#: CAST(sum(..) AS BIGINT).
_NON_SPARK_TYPES = {
    "HUGEINT",
    "UHUGEINT",
    "UBIGINT",
    "UINTEGER",
    "USMALLINT",
    "UTINYINT",
}


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    rel = con.sql(sql)
    cols = list(rel.columns)
    bad_types = [
        f"{c}: {t}"
        for c, t in zip(cols, (str(t).upper() for t in rel.types))
        if t in _NON_SPARK_TYPES
    ]
    if bad_types:
        con.close()
        raise AssertionError(
            "oracle result types not Spark-representable (the driver's "
            f"type-sensitive hash WILL mismatch): {bad_types}; wrap the "
            "offending expression in CAST(... AS BIGINT) in the oracle SQL"
        )
    rows = rel.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _sort_key(row):
    return tuple((x is None, str(x)) for x in row)


def compare(spark_df, oracle_cols, oracle_rows, rel_tol=1e-9):
    """Return a list of mismatch descriptions (empty == pass)."""
    problems = []
    s_cols = spark_df.columns
    if sorted(s_cols) != sorted(oracle_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(oracle_cols)}")
        return problems
    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    s_rows = [
        tuple(_norm(r[i]) for i in order) for r in spark_df.collect()
    ]
    o_order = sorted(range(len(oracle_cols)), key=lambda i: oracle_cols[i])
    o_rows = [tuple(_norm(r[i]) for i in o_order) for r in oracle_rows]
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")
        return problems
    s_rows.sort(key=_sort_key)
    o_rows.sort(key=_sort_key)
    n_bad = 0
    for sr, orow in zip(s_rows, o_rows):
        for a, b in zip(sr, orow):
            if isinstance(a, float) and isinstance(b, float):
                if not math.isclose(a, b, rel_tol=rel_tol, abs_tol=1e-9):
                    n_bad += 1
                    if n_bad <= 3:
                        problems.append(f"value differs: spark={sr} oracle={orow}")
                    break
            elif a != b:
                n_bad += 1
                if n_bad <= 3:
                    problems.append(f"value differs: spark={sr} oracle={orow}")
                break
    if n_bad:
        problems.append(f"{n_bad}/{len(s_rows)} rows differ")
    return problems

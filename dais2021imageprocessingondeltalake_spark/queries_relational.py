"""Relational query registrations (SURVEY.md §2 A3, B, C, D, E, F + flagship).

Each query is a thin composition of the operator library over the synthetic
corpus, with a matching DuckDB oracle. See registry.py for conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .operators import aggregates as agg
from .operators import joins as J
from .operators import relational as R
from .operators import setops as S
from .operators import sort as E
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# --------------------------------------------------------------------------
# A3/A4 — table scan
# --------------------------------------------------------------------------
@query(
    "q_scan_table",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def q_scan_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog/path table scan (`00. Explore.py:75`, `02.b:80`)."""
    return R.ensure_columns(
        _t(spark, sf_dir, "nation"), ["n_nationkey", "n_name", "n_regionkey"]
    )


# --------------------------------------------------------------------------
# B1-B4 — projection / computed columns / add / drop
# --------------------------------------------------------------------------
@query(
    "q_project",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           upper(l_returnflag) AS flag
    FROM lineitem
    """,
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed-column projection with aliases (`01. Ingest.py:66-70`),
    withColumn + drop (`03. Inference.py:32-34`). Narrow select → parquet
    reads only 5 of 11 lineitem columns. net_price is a raw per-row IEEE
    product — bit-identical across engines, so no rounding (rounding would
    actually *hurt*: Spark and DuckDB disagree on .xx5-boundary doubles)."""
    li = _t(spark, sf_dir, "lineitem")
    out = R.project(
        li,
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        F.col("l_returnflag"),
    )
    out = R.with_column(out, "flag", F.upper(F.col("l_returnflag")))
    return R.drop_columns(out, "l_returnflag")


@query(
    "q_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_quantity > 25.0
    """,
)
def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row filter (B9 — the capability the reference delegates to
    pathGlobFilter/partition dirs). Predicate reaches the parquet scan as
    PushedFilters."""
    li = _t(spark, sf_dir, "lineitem")
    out = R.filter_rows(
        li,
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_quantity") > 25.0),
    )
    return R.ensure_columns(out, ["l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"])


@query(
    "q_cast",
    oracle="""
    SELECT l_orderkey,
           CAST(l_linenumber AS BIGINT) AS line_no,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           CAST(l_shipdate AS DATE) AS ship_day
    FROM lineitem
    """,
)
def q_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts (B6, `02.a:75`). floor() before the int cast: Spark truncates
    double→int, DuckDB rounds — floor makes both explicit and identical."""
    li = _t(spark, sf_dir, "lineitem")
    out = R.project(
        li,
        F.col("l_orderkey"),
        F.col("l_linenumber").cast("bigint").alias("line_no"),
        F.floor(F.col("l_quantity")).cast("bigint").alias("qty_floor"),
        F.col("l_shipdate").cast("date").alias("ship_day"),
    )
    return out


@query(
    "q_null_cast",
    oracle="""
    SELECT doc_id,
           CAST(NULL AS VARCHAR) AS pad_str,
           CAST(NULL AS BIGINT) AS pad_long,
           coalesce(CAST(NULL AS BIGINT), n_chars) AS filled
    FROM documents
    """,
)
def q_null_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed null-literal padding (B5, `01. Ingest.py:119-120`) — the
    schema-template construction pattern."""
    docs = _t(spark, sf_dir, "documents")
    out = R.null_pad(docs.select("doc_id", "n_chars"), {"pad_str": "string", "pad_long": "bigint"})
    out = R.with_column(out, "filled", F.coalesce(F.col("pad_long"), F.col("n_chars")))
    return R.ensure_columns(out, ["doc_id", "pad_str", "pad_long", "filled"])


@query(
    "q_struct_ops",
    oracle="""
    SELECT p_partkey, p_size AS w, p_size * 2 AS h, p_brand AS brand_out
    FROM part
    """,
)
def q_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + nested field access (B7/B8,
    `03. Inference.py:32-33`): build size-struct like the reference's
    extract_size_udf output (`01. Ingest.py:59-62`), then read fields back
    out via dotted paths. Oracle validates the round-tripped values."""
    part = _t(spark, sf_dir, "part")
    with_struct = part.select(
        "p_partkey",
        F.struct(
            F.col("p_size").alias("width"),
            (F.col("p_size") * 2).alias("height"),
        ).alias("size"),
        F.struct(F.col("p_brand").alias("brand")).alias("meta"),
    )
    return with_struct.select(
        "p_partkey",
        F.col("size.width").alias("w"),
        F.col("size.height").alias("h"),
        F.col("meta.brand").alias("brand_out"),
    )


# --------------------------------------------------------------------------
# C — joins
# --------------------------------------------------------------------------
@query(
    "q_join_inner",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus, o.o_orderpriority
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large inner equi-join (C2): shuffles both sides on the key;
    AQE handles skew. At 100 TB this is the sort-merge path."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_orderpriority")
    out = J.equi_join(li, o, li["l_orderkey"] == o["o_orderkey"], "inner")
    return out.select("l_orderkey", "l_linenumber", "o_orderstatus", "o_orderpriority")


@query(
    "q_join_left",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_acctbal
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_acctbal > 5000.0
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join (C1, `01. Ingest.py:129`) with an extra join-side
    predicate so null-padding is actually exercised."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    out = o.join(
        c, (o["o_custkey"] == c["c_custkey"]) & (c["c_acctbal"] > 5000.0), "left"
    )
    return out.select("o_orderkey", "o_custkey", "c_name", "c_acctbal")


@query(
    "q_join_semi",
    oracle="""
    SELECT p_partkey, p_name FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45.0)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (C3) — EXISTS without row multiplication."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45.0).select("l_partkey")
    return J.semi_join(p, li, p["p_partkey"] == li["l_partkey"])


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (C3) — NOT EXISTS; the exact-dedup/difference
    workhorse for the north-star pipeline.

    The anti side is restricted to urgent orders so the result is non-empty
    at every test scale (18/203/1986 rows at sf0.001/0.01/0.1) — every
    customer in the synthetic corpus has *some* order, so the unfiltered
    variant would prove only that both engines return empty.
    """
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return J.anti_join(c, o, c["c_custkey"] == o["o_custkey"])


@query(
    "q_label_index_join",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(dense_rank() OVER (ORDER BY c_mktsegment) - 1 AS BIGINT) AS label_index
    FROM customer
    """,
)
def q_label_index_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense label index via broadcast dimension join (C4) — the scalable
    replacement for the reference's driver-collected dict
    (`01. Ingest.py:76-82`): row_number over sorted distinct keys - 1,
    broadcast back onto the fact table. Same sorted-dense-index semantics,
    zero driver-side data."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    dim = J.dense_index_dim(c, "c_mktsegment", "label_index")
    return J.broadcast_join(c, dim, ["c_mktsegment"], "inner").select(
        "c_custkey", "c_mktsegment", "label_index"
    )


# --------------------------------------------------------------------------
# D — aggregations
# --------------------------------------------------------------------------
@query("q_count", oracle="SELECT count(*) AS n FROM lineitem")
def q_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global count (D1, `00. Explore.py:79`) as a 1-row relation."""
    return agg.count_rows_df(_t(spark, sf_dir, "lineitem"), "n")


@query(
    "q_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct over a projection (D2, `01. Ingest.py:76`)."""
    return agg.distinct_rows(_t(spark, sf_dir, "lineitem"), "l_returnflag", "l_linestatus")


@query(
    "q_count_distinct",
    oracle="SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custkeys FROM orders",
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count (D3, `02.a:78`). The approx (HLL) variant is
    exercised rows-only in tests — approx values differ across engines."""
    return agg.distinct_count(_t(spark, sf_dir, "orders"), "o_custkey", alias="n_custkeys")


@query(
    "q_groupby_agg",
    headline=True,
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 AS sum_base_price,
           sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) / 10000.0 AS sum_disc_price,
           sum(l_quantity) / count(*) AS avg_qty,
           (sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0) / count(*) AS avg_price,
           (sum(CAST(round(l_discount * 100, 0) AS BIGINT)) / 100.0) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped grouped aggregate (D4+D5): partial+final hash agg —
    the shuffle carries |partitions| x 6 groups, not 600k rows.

    Float determinism: money columns are exact 2-decimal values — summed
    as integer cents (exact, order-independent, ~2x faster than DECIMAL;
    see aggregates.money_cents) and divided back once. l_quantity is
    integer-valued, so its double sum is exact as-is. Raw double sums
    would differ between engines in the last bits (aggregation order),
    and round() is not a fix (engines disagree on .xx5 boundaries)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    cents = agg.money_cents(F.col("l_extendedprice"))
    disc_c = agg.money_cents(F.col("l_discount"))
    n = F.count(F.lit(1))
    return agg.grouped_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        [
            F.sum("l_quantity").alias("sum_qty"),
            agg.exact_money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            (F.sum(cents * (F.lit(100) - disc_c)) / F.lit(10000.0)).alias("sum_disc_price"),
            (F.sum("l_quantity") / n).alias("avg_qty"),
            (agg.exact_money_sum(F.col("l_extendedprice")) / n).alias("avg_price"),
            (agg.exact_money_sum(F.col("l_discount")) / n).alias("avg_disc"),
            n.alias("count_order"),
        ],
    )


@query(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           sum(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets rollup (absent in reference; Spark builtin).
    sum_qty: integer-valued doubles → exact sum, no rounding needed."""
    return agg.rollup_agg(
        _t(spark, sf_dir, "lineitem"),
        ["l_returnflag", "l_linestatus"],
        [F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("sum_qty")],
    )


# --------------------------------------------------------------------------
# E — sort / limit / top-k
# --------------------------------------------------------------------------
@query(
    "q_orderby",
    oracle="SELECT c_custkey, c_acctbal FROM customer ORDER BY c_acctbal DESC, c_custkey",
)
def q_orderby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed range-partitioned sort (E2) — the engine form of the
    reference's driver-side sorted() (`01. Ingest.py:77`)."""
    return E.order_by(
        _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal"),
        F.col("c_acctbal").desc(),
        F.col("c_custkey"),
    )


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k (E3) → TakeOrderedAndProject: per-partition k-heaps, driver
    merges partitions x k rows; no global sort. Unique tiebreaker
    (o_orderkey) makes the result deterministic."""
    return E.top_k(
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        10,
        F.col("o_totalprice").desc(),
        F.col("o_orderkey"),
    )


@query("q_limit", oracle=None)  # rows-only: content is partition-order-dependent
def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Limit (E1, `02.a:76`) — rows-only check; which rows survive depends
    on partition order."""
    return E.limit_rows(_t(spark, sf_dir, "lineitem"), 100)


# --------------------------------------------------------------------------
# F — set ops
# --------------------------------------------------------------------------
@query(
    "q_union",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS src, count(*) AS n
    FROM customer GROUP BY c_nationkey
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS src, count(*) AS n
    FROM supplier GROUP BY s_nationkey
    """,
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName over two conforming aggregates (F)."""
    c = agg.grouped_agg(
        _t(spark, sf_dir, "customer").withColumnRenamed("c_nationkey", "nationkey"),
        ["nationkey"],
        [F.count(F.lit(1)).alias("n")],
    ).select("nationkey", F.lit("customer").alias("src"), "n")
    s = agg.grouped_agg(
        _t(spark, sf_dir, "supplier").withColumnRenamed("s_nationkey", "nationkey"),
        ["nationkey"],
        [F.count(F.lit(1)).alias("n")],
    ).select("nationkey", F.lit("supplier").alias("src"), "n")
    return S.union_all(c, s)


@query(
    "q_except_intersect",
    oracle="""
    SELECT n FROM (
      SELECT c_nationkey AS n FROM customer
      INTERSECT
      SELECT s_nationkey AS n FROM supplier
    ) t
    UNION ALL
    SELECT n FROM (
      SELECT c_nationkey AS n FROM customer
      EXCEPT
      SELECT s_nationkey AS n FROM supplier
    ) t2
    """,
)
def q_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT + EXCEPT (distinct set semantics) unioned into one result."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n"))
    return S.union_all(S.intersect_rows(c, s), c.subtract(s))


# --------------------------------------------------------------------------
# Flagship (SURVEY.md §7 step 1)
# --------------------------------------------------------------------------
@query(
    "q_flagship_revenue",
    headline=True,
    oracle="""
    SELECT n.n_name,
           sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) / 10000.0 AS revenue,
           count(*) AS n_items,
           sum(l.l_quantity) / count(*) AS avg_qty
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    LIMIT 10
    """,
)
def q_flagship_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: revenue by nation — scan → filter → 3 joins → agg → top-k
    in one plan (SURVEY.md §7 step 1).

    Scale shape: lineitem⋈orders is the large-large shuffle; customer and
    nation are dimensions → broadcast (nation explicitly; customer is small
    enough at test SF that AQE/threshold broadcasts it, and at 100 TB it
    becomes a shuffle join automatically). Filter on o_orderdate is pushed
    to the orders scan before the join."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    )
    cents = agg.money_cents(F.col("l_extendedprice"))
    disc_c = agg.money_cents(F.col("l_discount"))
    by_nation = agg.grouped_agg(
        joined,
        ["n_name"],
        [
            # exact integer-cents sum → one division: deterministic across
            # engines, ~2x faster than DECIMAL aggregation
            (F.sum(cents * (F.lit(100) - disc_c)) / F.lit(10000.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
            (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
        ],
    )
    return E.top_k(by_nation, 10, F.col("revenue").desc(), F.col("n_name"))


# --------------------------------------------------------------------------
# Window functions (engine capability; absent in reference)
# --------------------------------------------------------------------------
@query(
    "q_window_funcs",
    headline=True,
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS BIGINT) AS prio_rank,
           lag(o_totalprice) OVER w AS prev_price,
           sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions: row_number/rank/lag/running sum partitioned by
    customer. One shuffle on o_custkey serves all four windows."""
    from pyspark.sql import Window as W

    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = W.partitionBy("o_custkey").orderBy("o_orderpriority")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(wp).cast("bigint").alias("prio_rank"),
        # lag copies a value → raw. The running sum must be integer cents:
        # DuckDB evaluates window sums with a segment tree (different
        # association order than sequential), so double window sums
        # diverge in the last ulp on long frames — caught at sf0.1.
        F.lag("o_totalprice").over(w).alias("prev_price"),
        (
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            )
            / F.lit(100.0)
        ).alias("running_total"),
    )


@query(
    "q_null_handling",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type = 'purchase' THEN 'buy' ELSE event_type END AS type_n,
           COALESCE(CASE WHEN value < 1.0 THEN NULL ELSE value END, -1.0) AS value_filled
    FROM events
    WHERE event_type <> 'view'
    """,
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DataFrameNaFunctions surface (na.replace / na.fill / na.drop)
    over deterministically derived NULLs (the corpus base tables are
    NULL-free): small values null out then fill to a sentinel, one
    category nulls out then drops its rows, another rewrites via the
    replace map. All three compile to CASE/COALESCE projections and a
    filter — no shuffle; the oracle states them directly in SQL."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_type") == "view", None)
        .otherwise(F.col("event_type"))
        .alias("type_n"),
        F.when(F.col("value") < 1.0, None).otherwise(F.col("value")).alias("value_n"),
    )
    return (
        ev.na.replace({"purchase": "buy"}, subset=["type_n"])
        .na.fill({"value_n": -1.0})
        .na.drop(subset=["type_n"])
        .select("event_id", "type_n", F.col("value_n").alias("value_filled"))
    )


@query(
    "q_pagination",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50 OFFSET 100
    """,
)
def q_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-free pagination (ORDER BY + OFFSET + LIMIT with a full
    tiebreak): Spark plans offset+limit into a single
    CollectLimit/GlobalLimit over the sort — rows [100, 150) of the
    price ranking, deterministic via the orderkey tiebreak. OFFSET is
    the anti-pattern at depth (it scans offset+k rows); this pins the
    semantics for the shallow pages where it is the right tool."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(100)
        .limit(50)
    )

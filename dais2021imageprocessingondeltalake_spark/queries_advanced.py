"""Advanced operator registrations: as-of join, range join,
sessionization, pivot, cube, percentiles, statistical aggregates,
explode, SQL-API parity, MERGE upsert. These close the gap between the
reference's modest surface and a complete analytics engine (SURVEY.md §2
inventory summary: "gaps the engine fills").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table, register_views
from .operators import aggregates as agg
from .operators.sampling import local_rows_df
from .operators.merge import upsert
from .operators import temporal as TEMP
from .operators.temporal import asof_join, range_join, session_stats
from .registry import query


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, "events", sf_dir)


@query(
    "q_asof_join",
    headline=True,
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.ts,
           c.event_id AS click_event_id, c.ts AS click_ts
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (native in DuckDB/kdb, absent in Spark): each purchase
    event picks the latest preceding click by the same user. Engine
    implementation is union + window — one shuffle, no Python, no
    per-key pandas (operators/temporal.asof_join). (user_id, ts) is
    unique in events, so matches are well-defined."""
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    out = asof_join(purchases, clicks, on="user_id", ts="ts", right_cols=["event_id"], suffix="_click")
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("event_id_click").alias("click_event_id"),
        F.col("ts_click").alias("click_ts"),
    )


@query(
    "q_range_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate, o.o_orderdate
    FROM lineitem l JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 60 DAY
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range join: hash join on the key with the range as a join
    predicate (never a cartesian product)."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    out = range_join(
        li,
        o,
        li["l_orderkey"] == o["o_orderkey"],
        (li["l_shipdate"] >= o["o_orderdate"])
        & (li["l_shipdate"] < o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
    )
    return out.select("l_orderkey", "l_linenumber", "l_shipdate", "o_orderdate")


@query(
    "q_sessionize",
    headline=True,
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30*60*1000000
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM g
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end,
           (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS duration_sec
    FROM s
    GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (lag + gap-cumsum): per-user sessions with a
    30-minute inactivity gap, aggregated to per-session stats. One
    shuffle on the key serves both window passes and the final agg."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id")
    return session_stats(ev, "user_id", "ts", gap_minutes=30, order_tiebreak="event_id")


@query(
    "q_pivot",
    oracle="""
    SELECT user_id,
           sum(CASE WHEN event_type = 'click'    THEN CAST(round(value*100,0) AS BIGINT) ELSE 0 END) / 100.0 AS click,
           sum(CASE WHEN event_type = 'purchase' THEN CAST(round(value*100,0) AS BIGINT) ELSE 0 END) / 100.0 AS purchase,
           sum(CASE WHEN event_type = 'view'     THEN CAST(round(value*100,0) AS BIGINT) ELSE 0 END) / 100.0 AS view
    FROM events
    GROUP BY user_id
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation) with an explicit value list — Catalyst
    compiles it to exactly the oracle's CASE-sum form; listing values
    avoids the extra distinct-scan job. Cents-sum for determinism; pivot
    NULLs (user never clicked) coalesced to 0 to match SQL SUM(CASE)."""
    ev = _events(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100, 0).cast("long")
    )
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "view"])
        .agg(F.sum("cents"))
    )
    return pivoted.select(
        "user_id",
        *[
            (F.coalesce(F.col(c), F.lit(0)) / F.lit(100.0)).alias(c)
            for c in ("click", "purchase", "view")
        ],
    )


@query(
    "q_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube grouping sets (all 4 combinations of the two keys)."""
    return agg.cube_agg(
        load_table(spark, "lineitem", sf_dir),
        ["l_returnflag", "l_linestatus"],
        [F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("sum_qty")],
    )


@query(
    "q_percentiles",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.9) AS p90,
           quantile_cont(value, 0.99) AS p99
    FROM events
    GROUP BY event_type
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`: both linear-interpolate over the sorted group).
    `approx_percentile` (t-digest/GK) is the 100 TB path but its results
    are engine-specific — exercised rows-only in tests."""
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
            F.expr("percentile(value, 0.99)").alias("p99"),
        )
    )


@query(
    "q_stats_agg",
    oracle="""
    SELECT event_type,
           round(stddev_samp(value), 6) AS sd,
           round(var_samp(value), 6) AS var,
           round(corr(value, CAST(user_id AS DOUBLE)), 6) AS corr_uid,
           round(covar_samp(value, CAST(user_id AS DOUBLE)), 6) AS covar_uid
    FROM events
    GROUP BY event_type
    """,
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates. These use streaming merge formulas whose
    accumulation order differs per engine — rounded to 6dp (values are
    irrational-ish, so boundary collisions are ~1e-9 probability, unlike
    money sums where rounding is structurally unsafe)."""
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.round(F.stddev_samp("value"), 6).alias("sd"),
            F.round(F.var_samp("value"), 6).alias("var"),
            F.round(F.corr("value", F.col("user_id").cast("double")), 6).alias("corr_uid"),
            F.round(F.covar_samp("value", F.col("user_id").cast("double")), 6).alias(
                "covar_uid"
            ),
            # skewness/kurtosis omitted from the oracle set: Spark computes
            # the population form, DuckDB the sample-corrected form
        )
    )


@query(
    "q_explode",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id < 50
    """,
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode (table-generating projection): one row per token."""
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 50)
    return docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))


@query(
    "q_sql_api",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders,
           sum(CAST(round(o_totalprice*100,0) AS BIGINT)) / CAST(100 AS DOUBLE) AS total
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY o_orderpriority
    """,
)
def q_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL front-end parity: the same engine is reachable through
    `spark.sql` over registered views — Catalyst produces the identical
    plan as the DataFrame API (SURVEY.md guide: use whichever is
    clearer)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders,
               -- CAST: Spark SQL parses a bare 100.0 literal as DECIMAL(4,1),
               -- which would make the division decimal-typed
               sum(CAST(round(o_totalprice*100,0) AS BIGINT)) / CAST(100 AS DOUBLE) AS total
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        GROUP BY o_orderpriority
        """
    )


@query(
    "q_merge_upsert",
    oracle="""
    WITH docs AS (SELECT doc_id, text, lang FROM documents),
    src AS (
      SELECT doc_id, 'updated: ' || text AS text, lang,
             (doc_id % 21 = 0) AS del
      FROM docs WHERE doc_id % 7 = 0
      UNION ALL
      SELECT doc_id + 1000000, text, lang, false FROM docs WHERE doc_id % 11 = 0
    )
    SELECT d.doc_id, d.text, d.lang FROM docs d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM src)
    UNION ALL
    SELECT doc_id, text, lang FROM src WHERE NOT del
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE emulation (anti-join + union): update half the docs, insert
    new ones, delete flagged ones. The whole MERGE is deterministic, so
    the oracle replays update/insert/delete set algebra in SQL —
    upgraded from rows-only. Invariants in tests/test_advanced.py."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text", "lang")
    updates = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .withColumn("text", F.concat(F.lit("updated: "), F.col("text")))
        .withColumn("__delete", F.col("doc_id") % 21 == 0)
    )
    inserts = docs.filter(F.col("doc_id") % 11 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    ).withColumn("__delete", F.lit(False))
    return upsert(docs, updates.unionByName(inserts), ["doc_id"], delete_col="__delete")


@query(
    "q_unpivot",
    oracle="""
    SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val FROM customer
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long) via the stack() generator — the inverse of
    q_pivot, one pass, no shuffle."""
    c = load_table(spark, "customer", sf_dir)
    return c.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, val)"
        ),
    )


@query(
    "q_array_agg",
    oracle="""
    SELECT n_regionkey,
           list_sort(list(n_name)) AS names,
           string_agg(n_name, ',' ORDER BY n_name) AS names_csv,
           CAST(count(*) AS BIGINT) AS n
    FROM nation
    GROUP BY n_regionkey
    """,
)
def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/string aggregation: collect_list is unordered (partition
    arrival order), so determinism comes from sort_array before compare/
    join — the same trick DuckDB needs (list_sort / ORDER BY in
    string_agg)."""
    n = load_table(spark, "nation", sf_dir)
    return n.groupBy("n_regionkey").agg(
        F.sort_array(F.collect_list("n_name")).alias("names"),
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("names_csv"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_null_semantics",
    oracle="""
    SELECT o_orderkey,
           coalesce(c_name, 'NO_CUSTOMER') AS cust_or_default,
           CASE WHEN c_name IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END AS is_null_safe,
           nullif(o_orderstatus, 'O') AS status_or_null,
           CASE WHEN c_acctbal IS NULL THEN -1.0 ELSE c_acctbal END AS bal_filled
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey AND c_acctbal > 9000.0
    """,
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling semantics: coalesce, null-safe equality (<=> /
    IS NOT DISTINCT FROM), nullif, explicit NULL CASE — over a left join
    that actually produces NULLs."""
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey", "o_orderstatus")
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name", "c_acctbal")
    joined = o.join(c, (o["o_custkey"] == c["c_custkey"]) & (c["c_acctbal"] > 9000.0), "left")
    return joined.select(
        "o_orderkey",
        F.coalesce("c_name", F.lit("NO_CUSTOMER")).alias("cust_or_default"),
        F.when(F.col("c_name").eqNullSafe(F.lit(None)), 1).otherwise(0).alias("is_null_safe"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        F.when(F.col("c_acctbal").isNull(), F.lit(-1.0)).otherwise(F.col("c_acctbal")).alias(
            "bal_filled"
        ),
    )


@query(
    "q_unix_time",
    oracle="""
    SELECT event_id,
           epoch_us(ts) AS ts_micros,
           epoch_us(ts) // 1000000 AS ts_seconds,
           CAST(make_timestamp(epoch_us(ts)) AS TIMESTAMP) AS ts_roundtrip
    FROM events
    """,
)
def q_unix_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unix-epoch conversions at microsecond precision (the only
    precision both engines share losslessly for this data)."""
    e = load_table(spark, "events", sf_dir)
    return e.select(
        "event_id",
        F.unix_micros("ts").alias("ts_micros"),
        F.expr("unix_micros(ts) div 1000000").alias("ts_seconds"),
        F.timestamp_micros(F.unix_micros("ts")).alias("ts_roundtrip"),
    )


@query(
    "q_theta_join",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r JOIN nation n ON r.r_regionkey <> n.n_regionkey
    """,
)
def q_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure theta (non-equi) join: no equi key → broadcast-nested-loop.
    Legitimate ONLY for tiny-x-small shapes like this (5x25); anything
    larger must bucketize to recover an equi key (see range_join)."""
    r = load_table(spark, "region", sf_dir).select("r_regionkey", "r_name")
    n = load_table(spark, "nation", sf_dir).select("n_regionkey", "n_name")
    return r.join(n, r["r_regionkey"] != n["n_regionkey"]).select("r_name", "n_name")


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT c_custkey,
           (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
           (SELECT sum(CAST(round(o_totalprice*100,0) AS BIGINT)) / CAST(100 AS DOUBLE)
            FROM orders o WHERE o.o_custkey = c.c_custkey) AS total_spend
    FROM customer c
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries — Catalyst decorrelates them into
    left outer aggregated joins (SURVEY.md §4.1 'built-in if needed');
    the SQL front-end is the natural surface for this shape."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
               (SELECT sum(CAST(round(o_totalprice*100,0) AS BIGINT)) / CAST(100 AS DOUBLE)
                FROM orders o WHERE o.o_custkey = c.c_custkey) AS total_spend
        FROM customer c
        """
    )


@query(
    "q_in_subquery",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49.0)
      AND p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_discount > 0.09)
    """,
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN subqueries — Catalyst rewrites to semi/anti joins
    (the declarative face of q_join_semi/q_join_anti)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_name FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49.0)
          AND p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_discount > 0.09)
        """
    )


@query(
    "q_session_window",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30*60*1000000
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM g
    )
    SELECT user_id,
           min(ts) AS session_start,
           CAST(max(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
           count(*) AS n_events,
           sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS total_value
    FROM s
    GROUP BY user_id, sid
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window grouping (Spark's built-in sessionization,
    also valid on streams) — cross-validated against the manual
    lag/cumsum sessionize oracle: window.start == min(ts) and
    window.end == max(ts) + gap for each merged session."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("long")) / F.lit(100.0)).alias(
                "total_value"
            ),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "q_grouping_id",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_flag,
           CAST(grouping(l_linestatus) AS INT) AS g_status,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping() markers disambiguate subtotal NULLs from data NULLs in
    grouping-set results — required for correct rollup consumption when
    grouping keys are nullable."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count(F.lit(1)).alias("n"),
    ).select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n")


@query(
    "q_mixed_distinct_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           sum(l_quantity) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_mixed_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggregates mixed with plain ones — Catalyst plans
    this via Expand (one duplicated stream per distinct set), the shape
    that silently multiplies shuffle volume at scale; declared here so the
    plan is a known quantity."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_posexplode",
    oracle="""
    SELECT vec_id, generate_subscripts(ve, 1) - 1 AS pos, unnest(ve) AS val
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve
          FROM embeddings WHERE vec_id < 20)
    """,
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — ordinal-preserving array flattening (the position
    column is what explode loses; required for any order-sensitive
    array pipeline, e.g. re-assembling embedding dimensions)."""
    emb = load_table(spark, "embeddings", sf_dir).filter(F.col("vec_id") < 20)
    return emb.select(
        "vec_id",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "pos", "val"
        ),
    )


@query(
    "q_gap_fill",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             sum(CAST(round(value*100,0) AS BIGINT)) / 100.0 AS total
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT min(date_trunc('hour', ts)) AS lo, max(date_trunc('hour', ts)) AS hi
      FROM events
    ), grid AS (
      SELECT t.event_type, g.h
      FROM (SELECT DISTINCT event_type FROM events) t,
           (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds) g
    )
    SELECT g.event_type, g.h AS bucket,
           coalesce(hourly.total, 0.0) AS total,
           last_value(hourly.total IGNORE NULLS)
             OVER (PARTITION BY g.event_type ORDER BY g.h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS total_ffill
    FROM grid g
    LEFT JOIN hourly ON hourly.event_type = g.event_type AND hourly.h = g.h
    """,
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with forward fill (the hypertable rollup
    pattern): every (event_type, hour) cell of the observed range exists
    in the output, empty hours carry 0 / the last seen value. Money sums
    in integer cents; NULL ffill before a key's first bucket matches the
    oracle's IGNORE NULLS semantics exactly."""
    ev = load_table(spark, "events", sf_dir)
    cents_sum = (F.sum(F.round(F.col("value") * 100, 0).cast("long")) / F.lit(100.0))
    return TEMP.gap_fill(ev, "event_type", "ts", cents_sum, step="1 hour")


@query(
    "q_scd2",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_type,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)
    ), numbered AS (
      SELECT user_id, ts, event_type,
             CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_type
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run
      FROM marked
    ), runs AS (
      SELECT user_id, run, event_type, min(ts) AS valid_from
      FROM numbered GROUP BY user_id, run, event_type
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER v AS valid_to,
           lead(valid_from) OVER v IS NULL AS is_current
    FROM runs
    WINDOW v AS (PARTITION BY user_id ORDER BY valid_from, run)
    """,
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension built from the event history:
    per-user runs of the tracked attribute with [valid_from, valid_to)
    validity and is_current — consecutive equal values collapse into one
    version. Two window passes over one key-partitioned shuffle; the
    oracle replays the same run numbering in SQL. The incremental form
    (scd2_apply: batch MERGE folding new events into an existing
    dimension without rewriting untouched keys) is equivalence-tested
    against this full rebuild in tests/test_advanced.py."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_type")
    return TEMP.scd2_from_history(ev, key="user_id", ts="ts", attr="event_type")


@query(
    "q_time_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CASE WHEN GROUPING(date_trunc('hour', ts)) = 0
                THEN date_trunc('hour', ts) END AS hour,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS total_value
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY GROUPING SETS ((date_trunc('day', ts), date_trunc('hour', ts)),
                            (date_trunc('day', ts)))
    """,
)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: one pass produces BOTH the
    hourly and the daily rollup via GROUPING SETS over derived time
    buckets (hour rows carry their day; day rows have hour NULL). The
    hour->day hierarchy means Spark computes the day tier by partial
    re-aggregation of the hour tier, not a second scan — the batch
    analogue of a streaming continuous aggregate, and the layout a
    100 TB metrics store materializes per time grain. Money in cents."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    hour = F.date_trunc("hour", F.col("ts")).alias("hour")
    cents = agg.money_cents(F.col("value"))
    return (
        ev.select(day, hour, cents.alias("cents"))
        .groupingSets(
            [[F.col("day"), F.col("hour")], [F.col("day")]],
            F.col("day"),
            F.col("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("cents") / F.lit(100.0)).alias("total_value"),
        )
    )


@query("q_sketch_rollup", oracle=None)
def q_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users via a two-tier mergeable-HLL rollup:
    daily sketches unioned per type, then estimated (rows-only — sketch
    binaries and estimates are engine-specific; the <=2% relative-error
    contract against exact count(DISTINCT) is asserted in
    tests/test_advanced.py). The sketch tier is what a 100 TB metrics
    pipeline materializes per day/partition so distinct counts roll up
    without rescanning raw events."""
    ev = _events(spark, sf_dir)
    out = agg.sketch_rollup(
        ev, "event_type", F.date_trunc("day", F.col("ts")), "user_id", lg_k=12
    )
    return out.select(
        "event_type", F.col("est_distinct").cast("bigint").alias("est_users"), "n_buckets"
    )


@query(
    "q_table_diff",
    oracle="""
    WITH old_t AS (
      SELECT o_orderkey, o_totalprice FROM orders
    ), new_t AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 13 = 0
                  THEN round(o_totalprice + 1.0, 2) ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_totalprice FROM orders WHERE o_orderkey % 101 = 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                WHEN o.o_totalprice <> n.o_totalprice THEN 'update' END AS change_type,
           o.o_totalprice AS old_o_totalprice,
           n.o_totalprice AS new_o_totalprice
    FROM old_t o FULL OUTER JOIN new_t n USING (o_orderkey)
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_totalprice <> n.o_totalprice
    """,
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff → CDC feed (the parquet-world Delta change-data-feed):
    the 'new' snapshot is the orders table with deterministic deletes
    (key % 97), price bumps (key % 13), and remapped inserts (key % 101
    offset by 1e8); table_diff classifies every changed key as
    insert/delete/update via ONE full outer join. Unchanged keys drop
    out, so downstream incremental consumers (SCD2 fold, streaming
    MERGE) touch |changes|, not |table|."""
    from .operators.merge import table_diff

    old = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    kept = old.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 13 == 0, F.round(F.col("o_totalprice") + 1.0, 2)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    inserts = old.filter(F.col("o_orderkey") % 101 == 0).select(
        (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"), "o_totalprice"
    )
    new = kept.unionByName(inserts)
    return table_diff(old, new, ["o_orderkey"], ["o_totalprice"])


@query(
    "q_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t_view
      WHERE e.event_type = 'click' GROUP BY 1
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t_click
      WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT s1.user_id, s1.t_view, s2.t_click, s3.t_purchase,
           CAST(1 + CAST(s2.user_id IS NOT NULL AS INT)
                  + CAST(s3.user_id IS NOT NULL AS INT) AS BIGINT) AS stage
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase per user:
    each step's earliest event strictly after the previous step. All
    step aggregates and joins share the user key (one exchange reused);
    `stage` counts completed steps."""
    from .operators.temporal import funnel

    ev = _events(spark, sf_dir).select("user_id", "ts", "event_type")
    return funnel(ev, ["view", "click", "purchase"])


@query(
    "q_cohort_retention",
    oracle="""
    WITH ev AS (
      SELECT user_id, CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS BIGINT) AS wk
      FROM events
    ), first AS (
      SELECT user_id, min(wk) AS cohort_week FROM ev GROUP BY 1
    )
    SELECT f.cohort_week, e.wk - f.cohort_week AS week_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM ev e JOIN first f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix over the event stream: first-seen-week
    cohorts x week offsets x distinct active users — the engagement
    decay report. Epoch-fixed 7-day buckets keep the bucketing
    engine-portable."""
    from .operators.temporal import cohort_retention

    ev = _events(spark, sf_dir).select("user_id", "ts")
    return cohort_retention(ev)


def _pagerank_oracle(iters: int = 5, damping: float = 0.85, round_dp: int = 12) -> str:
    """Unroll the fixed-iteration PageRank as a generated CTE chain.
    The damping constants embed as the EXACT repr of the Python doubles
    the Spark side uses (1.0-0.85 != the SQL literal 0.15 in the last
    ulp), so both engines iterate on identical values."""
    base = repr(1.0 - damping)
    d = repr(damping)
    ctes = [
        """e AS (
      SELECT DISTINCT 'p' || l_partkey AS src, 's' || l_suppkey AS dst FROM lineitem
      UNION
      SELECT DISTINCT 's' || l_suppkey AS src, 'p' || l_partkey AS dst FROM lineitem
    ), deg AS (
      SELECT src, count(*) AS deg FROM e GROUP BY 1
    ), n AS (
      SELECT src AS node FROM deg
    ), r0 AS (
      SELECT node, 1.0 AS rank FROM n
    )"""
    ]
    for i in range(iters):
        ctes.append(f"""s{i} AS (
      SELECT e.dst AS node, round(sum(r.rank / d.deg), {round_dp}) AS s
      FROM e JOIN r{i} r ON e.src = r.node JOIN deg d ON e.src = d.src
      GROUP BY 1
    ), r{i + 1} AS (
      SELECT n.node,
             round({base} + {d} * coalesce(s.s, 0.0), {round_dp}) AS rank
      FROM n LEFT JOIN s{i} s ON n.node = s.node
    )""")
    return (
        "\n    WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT node, rank FROM r{iters}"
    )


@query("q_pagerank", oracle=_pagerank_oracle())
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (5 fixed iterations, damping 0.85) over the symmetrized
    part–supplier bipartite graph from lineitem — random-walk centrality,
    the canonical iterative graph workload. Every iteration's per-node
    sums round to 12dp so the generated unrolled-CTE oracle replays all
    five fixpoint steps bit-for-bit (the iterative sibling of the
    connected-components recursive-CTE oracle)."""
    from .operators.graph import pagerank

    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    fwd = li.select(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    ).distinct()
    rev = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return pagerank(fwd.unionByName(rev).distinct(), iters=5, damping=0.85)


@query(
    "q_data_profile",
    oracle="""
    WITH t AS (SELECT count(*) AS n FROM documents)
    SELECT 'doc_id' AS column, (SELECT CAST(n AS BIGINT) FROM t) AS n_rows,
           CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           round(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)
                 / (SELECT CAST(n AS DOUBLE) FROM t), 6) AS null_frac,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
           min(CAST(doc_id AS VARCHAR)) AS min_str,
           max(CAST(doc_id AS VARCHAR)) AS max_str
    FROM documents
    UNION ALL
    SELECT 'lang', (SELECT CAST(n AS BIGINT) FROM t),
           CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           round(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)
                 / (SELECT CAST(n AS DOUBLE) FROM t), 6),
           CAST(count(DISTINCT lang) AS BIGINT),
           min(lang), max(lang)
    FROM documents
    UNION ALL
    SELECT 'source', (SELECT CAST(n AS BIGINT) FROM t),
           CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           round(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END)
                 / (SELECT CAST(n AS DOUBLE) FROM t), 6),
           CAST(count(DISTINCT source) AS BIGINT),
           min(source), max(source)
    FROM documents
    UNION ALL
    SELECT 'n_chars', (SELECT CAST(n AS BIGINT) FROM t),
           CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           round(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)
                 / (SELECT CAST(n AS DOUBLE) FROM t), 6),
           CAST(count(DISTINCT n_chars) AS BIGINT),
           min(CAST(n_chars AS VARCHAR)), max(CAST(n_chars AS VARCHAR))
    FROM documents
    """,
)
def q_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the documents table (null fraction, distinct
    count, stringified min/max per column) — the dataset-card /
    drift-detection report, one aggregate pass. min/max stringify so a
    single report schema fits every column type; note string min/max of
    numerics is LEXICOGRAPHIC by design (both engines agree)."""
    from .operators.profile import profile_columns

    docs = load_table(spark, "documents", sf_dir)
    return profile_columns(docs, ["doc_id", "lang", "source", "n_chars"])


@query(
    "q_integrity_checks",
    oracle="""
    SELECT 'not_null:o_custkey' AS check,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations
    FROM orders
    UNION ALL
    SELECT 'unique:o_orderkey',
           CAST(sum(n - 1) AS BIGINT)
    FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey)
    UNION ALL
    SELECT 'fk:o_custkey',
           CAST(count(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS (
      SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'fk:l_orderkey',
           CAST(count(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'accepted:o_orderstatus',
           CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
                         AND o_orderstatus NOT IN ('F', 'O', 'P')
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    """,
)
def q_integrity_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint suite over the warehouse tables: not-null, unique-key,
    two referential-integrity checks, and an accepted-values domain
    check, each a violation COUNT (dbt-style expectations run inline
    before a write). The two row-local orders checks (not-null +
    accepted-values) share ONE aggregate over ONE scan (stacked to two
    report rows — the q_data_profile one-scan discipline); unique-key
    needs its own groupBy and the FK checks are anti-joins, so the
    suite costs 2 orders scans + 1 lineitem + 1 customer, not 3+1+1."""
    from .operators import profile as P

    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    row_local = orders.agg(
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("__nn"),
        F.sum(
            F.when(
                F.col("o_orderstatus").isNotNull()
                & ~F.col("o_orderstatus").isin("F", "O", "P"),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("__av"),
    ).selectExpr(
        "stack(2, 'not_null:o_custkey', __nn, 'accepted:o_orderstatus', __av)"
        " AS (check, violations)"
    )
    return (
        row_local
        .unionByName(P.check_unique(orders, ["o_orderkey"]))
        .unionByName(P.check_foreign_key(orders, "o_custkey", customer, "c_custkey"))
        .unionByName(P.check_foreign_key(lineitem, "l_orderkey", orders, "o_orderkey"))
    )


@query(
    "q_incremental_agg",
    oracle="""
    SELECT lang, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(n_chars) AS BIGINT) AS sum_v,
           min(n_chars) AS min_v, max(n_chars) AS max_v,
           round(sum(n_chars) / CAST(count(*) AS DOUBLE), 6) AS avg_v
    FROM documents GROUP BY 1
    """,
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: three disjoint batches of the
    corpus each produce a mergeable per-lang state (n/sum/min/max), and
    the states combine into the final answer WITHOUT rescanning any
    batch — the materialized-view refresh pattern. The oracle computes
    the same stats from the full table directly, so the hash certifies
    state merging == recomputation."""
    from .operators.aggregates import merge_agg_states, partial_agg_states

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang", "n_chars")
    batches = [
        partial_agg_states(docs.filter(F.col("doc_id") % 3 == i), ["lang"], "n_chars")
        for i in range(3)
    ]
    merged = merge_agg_states(batches, ["lang"])
    return merged.select(
        "lang",
        F.col("n").cast("bigint").alias("n"),
        F.col("sum_v").cast("bigint").alias("sum_v"),
        "min_v",
        "max_v",
        "avg_v",
    )


@query(
    "q_rolling_window",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w AS BIGINT) / 100.0
             AS value_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def q_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based rolling aggregate: per-user trailing-1-hour event count
    and value sum at every event — the sliding-window feature/alerting
    query. The RANGE frame runs over epoch MICROSECONDS (bigint), which
    both engines frame identically (interval-typed ranges differ in
    edge conventions across engines; integer ranges don't), and value
    sums in integer cents. Same-timestamp events share one frame by
    RANGE semantics — no tie-break dependence."""
    from pyspark.sql import Window

    from .operators import aggregates as agg

    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        (F.sum(agg.money_cents(F.col("value"))).over(w) / F.lit(100.0)).alias(
            "value_last_hour"
        ),
    )


@query(
    "q_ab_test",
    oracle="""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS variant,
             sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS spend
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    ), g AS (
      SELECT variant,
             CAST(count(*) AS BIGINT) AS n,
             round(avg(spend), 6) AS mean_spend,
             round(var_samp(spend), 6) AS var_spend
      FROM per_user GROUP BY 1
    )
    SELECT a.n AS n_a, b.n AS n_b,
           a.mean_spend AS mean_a, b.mean_spend AS mean_b,
           round((a.mean_spend - b.mean_spend)
                 / sqrt(a.var_spend / a.n + b.var_spend / b.n), 4) AS t_stat
    FROM g a JOIN g b ON a.variant = 0 AND b.variant = 1
    """,
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-test readout: Welch's t-statistic on per-user purchase spend
    between two variants (user_id parity as the assignment — in
    production this is the experiment's hash bucket, same md5 idiom as
    the samplers). Spend sums in exact cents; means/variances round to
    6dp BEFORE the t formula (var_samp accumulates in engine-specific
    order), so the t-stat is computed from identical operands and rounds
    to 4dp. Two aggregates + a 2x2 join — scale-free."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    from .operators import aggregates as agg

    per_user = ev.groupBy("user_id").agg(
        (F.sum(agg.money_cents(F.col("value"))) / F.lit(100.0)).alias("spend")
    ).withColumn("variant", F.col("user_id") % 2)
    g = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("spend"), 6).alias("mean_spend"),
        F.round(F.var_samp("spend"), 6).alias("var_spend"),
    )
    a = g.filter(F.col("variant") == 0).alias("a")
    b = g.filter(F.col("variant") == 1).alias("b")
    return a.crossJoin(b).select(
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        F.col("a.mean_spend").alias("mean_a"),
        F.col("b.mean_spend").alias("mean_b"),
        F.round(
            (F.col("a.mean_spend") - F.col("b.mean_spend"))
            / F.sqrt(
                F.col("a.var_spend") / F.col("a.n")
                + F.col("b.var_spend") / F.col("b.n")
            ),
            4,
        ).alias("t_stat"),
    )


@query(
    "q_decay_features",
    oracle="""
    WITH anchor AS (SELECT max(ts) AS a FROM events),
    w AS (
      SELECT user_id,
             CAST(round(value * 100, 0) AS BIGINT) / 100.0 AS v,
             round(exp(-0.023104906018664842
                       * ((epoch_us((SELECT a FROM anchor)) - epoch_us(ts))
                          / 86400000000.0)), 12) AS decay
      FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_purchases,
           round(sum(v * decay), 4) AS decayed_spend
    FROM w GROUP BY 1
    """,
)
def q_decay_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted user features: exponentially decayed purchase
    spend with a 30-day half-life, anchored at the corpus's latest event
    (the feature-engineering shape behind churn/value models — recent
    behavior dominates, anchor shifts with each batch). The decay
    constant embeds as the repr of the Python double (ln(2)/30 computed
    in SQL differs in the last ulp); per-event decay factors round to
    12dp and the weighted sum to 4dp per the libm convention; spend is
    cents-exact before weighting."""
    all_ev = _events(spark, sf_dir)
    ev = all_ev.filter(F.col("event_type") == "purchase")
    from .operators import aggregates as agg

    anchor = all_ev.agg(F.max("ts").alias("a"))
    decay = F.round(
        F.exp(
            F.lit(-0.023104906018664842)
            * (
                (F.unix_micros(F.col("a")) - F.unix_micros(F.col("ts")))
                / F.lit(86400000000.0)
            )
        ),
        12,
    )
    w = ev.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        (agg.money_cents(F.col("value")) / F.lit(100.0)).alias("v"),
        decay.alias("decay"),
    )
    return w.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum(F.col("v") * F.col("decay")), 4).alias("decayed_spend"),
    )


@query(
    "q_markov_transitions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ), c AS (
      SELECT cur, nxt, count(*) AS n FROM ordered WHERE nxt IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT cur, nxt, CAST(n AS BIGINT) AS n,
           round(n / CAST(sum(n) OVER (PARTITION BY cur) AS DOUBLE), 6) AS p
    FROM c
    """,
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types per user
    journey: P(next | current) from consecutive event pairs (lead window
    ordered by ts with event_id tie-break). The user-behavior model
    behind next-action prediction and anomaly scoring. One user-keyed
    window + one (cur, next) agg; probabilities are exact integer ratios
    rounded to 6dp."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    pairs = (
        ev.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wc = Window.partitionBy("cur")
    return pairs.select(
        "cur",
        "nxt",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") / F.sum("n").over(wc).cast("double"), 6).alias("p"),
    )


@query(
    "q_rfm_segments",
    oracle="""
    WITH anchor AS (SELECT max(ts) AS a FROM events),
    per_user AS (
      SELECT user_id,
             (epoch_us((SELECT a FROM anchor)) - epoch_us(max(ts))) // 86400000000 AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS monetary
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    )
    SELECT user_id, recency_days, frequency, monetary,
           CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f, CAST(m AS BIGINT) AS m,
           CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR) AS segment
    FROM (
      SELECT *,
             ntile(5) OVER (ORDER BY recency_days, user_id) AS r,
             ntile(5) OVER (ORDER BY frequency DESC, user_id) AS f,
             ntile(5) OVER (ORDER BY monetary DESC, user_id) AS m
      FROM per_user
    )
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-user recency (days since last purchase,
    integer-floored), frequency, and cents-exact monetary value, each
    quintiled (ntile, user_id tie-break) into the classic 'rfm' segment
    code — the marketing-analytics workhorse.

    ONE window pass for all three quintiles (VERDICT r5 item 7): the
    per-user table melts into 3 (metric, key) rows — descending metrics
    negate their key so every metric sorts ascending with the same
    user_id tie-break — then a SINGLE WindowExec partitioned by metric
    computes ntile(5) and a groupBy pivots the tiles back. The r5 shape
    ran THREE partitionless windows, i.e. three Exchange
    SinglePartition funnels over the same table; this crosses one hash
    exchange and sorts the three orderings in parallel (3 tasks), with
    identical output — ntile per metric sees exactly the rows and order
    the global window saw. At larger |users| swap ntile for
    histogram_quantiles bucketing (documented seam, same contract)."""
    from pyspark.sql import Window

    from .operators import aggregates as agg

    ev = _events(spark, sf_dir)
    anchor = ev.agg(F.max("ts").alias("a"))
    per_user = (
        ev.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.floor(
                (F.unix_micros(F.first("a")) - F.unix_micros(F.max("ts")))
                / F.lit(86400000000)
            ).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            (F.sum(agg.money_cents(F.col("value"))) / F.lit(100.0)).alias("monetary"),
        )
    )
    # melt: metric 0 = recency asc, 1 = frequency desc, 2 = monetary
    # desc. Keys cast to double — recency_days and frequency are far
    # below 2^53, so the cast (and the descending negation) is exact.
    melted = per_user.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("metric"),
                    F.col("recency_days").cast("double").alias("key"),
                ),
                F.struct(
                    F.lit(1).alias("metric"),
                    (-F.col("frequency")).cast("double").alias("key"),
                ),
                F.struct(
                    F.lit(2).alias("metric"),
                    (-F.col("monetary")).cast("double").alias("key"),
                ),
            )
        ).alias("mk"),
    ).select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.col("mk.metric").alias("metric"),
        F.col("mk.key").alias("key"),
    )
    w = Window.partitionBy("metric").orderBy(F.col("key"), F.col("user_id"))
    tiles = melted.withColumn("tile", F.ntile(5).over(w))
    seg = tiles.groupBy("user_id").agg(
        # the metric columns are identical across a user's 3 melted rows
        F.max("recency_days").alias("recency_days"),
        F.max("frequency").alias("frequency"),
        F.max("monetary").alias("monetary"),
        F.max(F.when(F.col("metric") == 0, F.col("tile"))).cast("bigint").alias("r"),
        F.max(F.when(F.col("metric") == 1, F.col("tile"))).cast("bigint").alias("f"),
        F.max(F.when(F.col("metric") == 2, F.col("tile"))).cast("bigint").alias("m"),
    )
    return seg.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        "r",
        "f",
        "m",
        F.concat(
            F.col("r").cast("string"), F.col("f").cast("string"), F.col("m").cast("string")
        ).alias("segment"),
    )


@query(
    "q_basket_lift",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
    ), n_orders AS (
      SELECT CAST(count(DISTINCT okey) AS DOUBLE) AS n FROM items
    ), part_n AS (
      SELECT part, count(*) AS cnt FROM items GROUP BY 1
    ), pairs AS (
      SELECT a.part AS part_a, b.part AS part_b, count(*) AS n_both
      FROM items a JOIN items b ON a.okey = b.okey AND a.part < b.part
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, CAST(n_both AS BIGINT) AS n_both,
           round(n_both / n.n, 6) AS support,
           CAST(floor(10000.0 * n_both * n.n / (pa.cnt * pb.cnt)) AS BIGINT)
             AS lift_x10k
    FROM pairs
    JOIN part_n pa ON pa.part = part_a
    JOIN part_n pb ON pb.part = part_b
    CROSS JOIN n_orders n
    WHERE n_both >= 2
    """,
)
def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: co-purchase support and lift
    for part pairs appearing together in >= 2 orders (lift > 1 = bought
    together more than chance — the cross-sell signal). Distinct
    (order, part) first so line-level duplicates don't inflate counts;
    the within-order self-join is bounded by Σ basket_size² per order,
    never |parts|². Lift is emitted as floor(1e4 * n_both * n /
    (ca * cb)) — the exact-rational form as a scaled integer — because
    round(x, 4) of the factored ratio landed EXACTLY on a half-boundary
    (1.84125) at sf0.001 and Spark (BigDecimal HALF_UP on shortest repr)
    and DuckDB (scale-multiply) round opposite ways there; the floor of
    a single IEEE division of exact integers is bit-identical in both
    engines (quotient sits >=1/(ca*cb) from any integer, far above the
    ~1e-12 double error)."""
    li = load_table(spark, "lineitem", sf_dir)
    items = li.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part")
    ).distinct()
    n_orders = items.agg(F.count_distinct("okey").cast("double").alias("n"))
    part_n = items.groupBy("part").agg(F.count(F.lit(1)).alias("cnt"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(b, (F.col("a.okey") == F.col("b.okey")) & (F.col("a.part") < F.col("b.part")))
        .groupBy(F.col("a.part").alias("part_a"), F.col("b.part").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 2)
    )
    return (
        pairs.join(part_n.withColumnRenamed("part", "part_a").withColumnRenamed("cnt", "ca"), "part_a")
        .join(part_n.withColumnRenamed("part", "part_b").withColumnRenamed("cnt", "cb"), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            F.col("n_both").cast("bigint").alias("n_both"),
            F.round(F.col("n_both") / F.col("n"), 6).alias("support"),
            F.floor(
                F.lit(10000.0) * F.col("n_both") * F.col("n")
                / (F.col("ca") * F.col("cb"))
            )
            .cast("bigint")
            .alias("lift_x10k"),
        )
    )


@query(
    "q_rolling_wau",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), days AS (
      SELECT DISTINCT day FROM du
    )
    SELECT d.day,
           CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
    FROM days d JOIN du u
      ON u.day <= d.day AND u.day >= d.day - INTERVAL 6 DAY
    GROUP BY 1
    """,
)
def q_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day (WAU) — the sliding-window
    DISTINCT count that window frames cannot express (distinct doesn't
    decompose over frames): the (day, user) activity pairs range-join
    the day grid, then count distinct per day. Cost is bounded by
    |days| x |daily actives| x 7, never the raw event count — the
    standard exact formulation; the HLL sketch tier is the
    approximate seam when |actives| explodes."""
    ev = _events(spark, sf_dir)
    du = ev.select(
        F.col("ts").cast("date").alias("day"), F.col("user_id")
    ).distinct()
    days = du.select("day").distinct()
    d, u = days.alias("d"), du.alias("u")
    return (
        d.join(
            u,
            (F.col("u.day") <= F.col("d.day"))
            & (F.col("u.day") >= F.date_sub(F.col("d.day"), 6)),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.count_distinct(F.col("u.user_id")).alias("wau"))
    )


@query(
    "q_graph_bfs",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT DISTINCT 'p' || l_partkey AS src, 's' || l_suppkey AS dst FROM lineitem
      UNION
      SELECT DISTINCT 's' || l_suppkey AS src, 'p' || l_partkey AS dst FROM lineitem
    ), seeds AS (
      SELECT DISTINCT 'p' || l_partkey AS node FROM lineitem WHERE l_partkey % 97 = 0
    ), walk AS (
      SELECT node, 0 AS dist FROM seeds
      UNION
      SELECT e.dst AS node, w.dist + 1 AS dist
      FROM walk w JOIN e ON w.node = e.src
      WHERE w.dist < 3
    )
    SELECT node, CAST(min(dist) AS INT) AS dist FROM walk GROUP BY 1
    """,
)
def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS (3 hops) over the symmetrized part–supplier
    graph from seed parts (partkey % 97 == 0) — the k-hop-neighborhood /
    blast-radius query. Frontier-based (each round joins only the newly
    discovered nodes), integer first-discovery distances, so the
    recursive-CTE oracle (UNION dedup keeps the level tables polynomial)
    replays it exactly."""
    from .operators.graph import bfs_distances

    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    fwd = li.select(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    ).distinct()
    rev = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    edges = fwd.unionByName(rev)
    seeds = (
        li.filter(F.col("l_partkey") % 97 == 0)
        .select(F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("node"))
        .distinct()
    )
    return bfs_distances(edges, seeds, max_hops=3)


def _label_prop_oracle(iters: int = 4) -> str:
    """Unroll deterministic synchronous LPA: per round a (node, label)
    neighbor count, the max-count-then-min-label argmax, and a left
    join carrying isolated nodes' labels forward. Integer counts and
    string id comparisons only — zero floats, so no rounding anywhere.
    MATERIALIZED per level (each l{i} is referenced twice: neighbor
    join + isolated-node spine)."""
    ctes = ["""fwd AS MATERIALIZED (
      SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM lineitem WHERE l_partkey % 3 = 0
    ), e AS MATERIALIZED (
      SELECT src, dst FROM fwd UNION ALL SELECT dst, src FROM fwd
    ), l0 AS MATERIALIZED (
      SELECT node, node AS lbl FROM (
        SELECT DISTINCT src AS node FROM e
      )
    )"""]
    for i in range(iters):
        ctes.append(f"""l{i + 1} AS MATERIALIZED (
      SELECT l.node, coalesce(w.new_lbl, l.lbl) AS lbl
      FROM l{i} l LEFT JOIN (
        SELECT node, min(lbl) AS new_lbl FROM (
          SELECT c.node, c.lbl, c.cnt, max(c.cnt) OVER (PARTITION BY c.node) AS mx
          FROM (
            SELECT e.src AS node, x.lbl, count(*) AS cnt
            FROM e JOIN l{i} x ON e.dst = x.node GROUP BY 1, 2
          ) c
        ) WHERE cnt = mx GROUP BY node
      ) w ON l.node = w.node
    )""")
    return (
        "\n    WITH " + ",\n    ".join(ctes)
        + f"""
    SELECT node, lbl AS community FROM l{iters}"""
    )


@query("q_label_prop", oracle=_label_prop_oracle())
def q_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the symmetrized part–supplier graph via
    deterministic synchronous label propagation (4 rounds): most
    frequent neighbor label, count ties to the MINIMUM label, isolated
    nodes keep their own — the dedup-cluster/community analogue of
    connected components that respects edge multiplicity instead of
    mere reachability. Pure integer counts + id comparisons, so the
    unrolled-CTE oracle replays every round exactly (the pagerank/HITS
    certification idiom, with zero rounding because there are zero
    floats). Per-round cost: one (node, label) count shuffle + two
    map-side-combinable aggs — no per-node sort anywhere."""
    from .operators.graph import label_propagation

    li = (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.col("l_partkey") % 3 == 0)
        .select("l_partkey", "l_suppkey")
    )
    fwd = li.select(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    ).distinct()
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return label_propagation(edges, iters=4)


@query(
    "q_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
      FROM events GROUP BY 1
    ), mad AS (
      SELECT e.event_type, round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type, e.value
    FROM events e
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    WHERE abs(e.value - m.med) > 3 * d.mad
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: events whose value sits more than
    3 MADs (median absolute deviation) from their event-type median —
    the anomaly filter that, unlike z-scores, isn't dragged by the
    outliers themselves. Two exact-percentile aggregates + two broadcast
    joins. Both med and mad are rounded to 6dp on BOTH engine sides (the
    repo's round-before-compare convention) because Spark percentile()
    and DuckDB quantile_cont() interpolate even-count medians with
    expressions that can differ by 1 ulp — unrounded, that ulp could
    flip membership at the strict 3-MAD boundary on some scale."""
    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    j = ev.join(F.broadcast(med), "event_type")
    mad = j.groupBy("event_type").agg(
        F.round(F.expr("percentile(abs(value - med), 0.5)"), 6).alias("mad")
    )
    return (
        j.join(F.broadcast(mad), "event_type")
        .filter(F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad"))
        .select("event_id", "event_type", "value")
    )


@query(
    "q_source_kl",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
    ), sc AS (
      SELECT source, t, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY 1, 2
    ), st AS (
      SELECT source, CAST(sum(c) AS DOUBLE) AS n FROM sc GROUP BY 1
    ), ct AS (
      SELECT t, CAST(sum(c) AS DOUBLE) AS c FROM sc GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(c) AS DOUBLE) AS n FROM ct
    )
    SELECT sc.source,
           CAST(st.n AS BIGINT) AS n_tokens,
           round(sum((sc.c / st.n) * ln((sc.c / st.n) / (ct.c / tot.n))), 6)
             AS kl_from_corpus
    FROM sc
    JOIN st ON sc.source = st.source
    JOIN ct ON sc.t = ct.t
    CROSS JOIN tot
    GROUP BY sc.source, st.n
    """,
)
def q_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence of each source's token distribution from the
    corpus-wide mix — the domain-shift score behind DoReMi-style source
    weighting and drift alarms. One token-count shuffle; the per-source
    marginals broadcast, while the per-TOKEN marginal joins on the token
    key (vocabulary-sized — a deliberate shuffle join, since at 100 TB
    the vocabulary is not broadcastable); per-term log ratios differ across libm
    implementations by <= 1 ulp, absorbed by the 6dp sum rounding (the
    q_unigram_logprob convention)."""
    docs = load_table(spark, "documents", sf_dir)
    sc = (
        docs.select("source", F.explode(F.split("text", " ")).alias("t"))
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    st = sc.groupBy("source").agg(F.sum("c").alias("n"))
    ct = sc.groupBy("t").agg(F.sum("c").alias("c_t"))
    tot = ct.agg(F.sum("c_t").alias("n_tot"))
    p_s = F.col("c") / F.col("n")
    p_c = F.col("c_t") / F.col("n_tot")
    return (
        sc.join(F.broadcast(st), "source")
        .join(ct, "t")
        .crossJoin(F.broadcast(tot))
        .groupBy("source", "n")
        .agg(F.round(F.sum(p_s * F.log(p_s / p_c)), 6).alias("kl_from_corpus"))
        .select(
            "source",
            F.col("n").cast("bigint").alias("n_tokens"),
            "kl_from_corpus",
        )
    )


@query(
    "q_groupwise_ols",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sx,
             CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) AS sy,
             CAST(sum(CAST(l_quantity AS BIGINT)
                      * CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) AS sxy,
             CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sxx,
             CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                      * CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) AS syy
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           round(((n * sxy - sx * sy) / (n * sxx - sx * sx)) / 100.0, 6) AS slope,
           round(((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n) / 100.0, 6)
             AS intercept,
           round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s
    """,
)
def q_groupwise_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise closed-form OLS: price ~ quantity per return flag —
    the scalable per-segment regression (one aggregation of five
    sufficient-statistic sums; no solver, no iteration). All sums are
    EXACT integers (quantity is integral, price in cents; the squared-
    cents sum rides decimal(38)/HUGEINT and both engines cast the exact
    integer to double identically), and the slope/intercept/r2 formulas
    then run the same IEEE expression tree on identical doubles — the
    only rounding is the final 6dp display. At 100 TB this is one
    map-side-combined shuffle of 6 numbers per group."""
    li = load_table(spark, "lineitem", sf_dir)
    x = F.col("l_quantity").cast("bigint")
    y = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    # y-bearing sums ride decimal(38,0): per-row x*y reaches ~5e8, so a
    # bigint sum would wrap near 2e10 rows — inside the 100 TB envelope
    # this query claims. DuckDB already sums into HUGEINT; both engines
    # cast the exact integer to double identically.
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y.cast("decimal(38,0)")).cast("double").alias("sy"),
        F.sum((x * y).cast("decimal(38,0)")).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(38,0)")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope_c = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        F.round(slope_c / 100.0, 6).alias("slope"),
        F.round(((sy - slope_c * sx) / n) / 100.0, 6).alias("intercept"),
        F.round(
            (n * sxy - sx * sy) * (n * sxy - sx * sy)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


@query(
    "q_chi2_independence",
    oracle="""
    WITH o AS (
      SELECT lang, source, CAST(count(*) AS DOUBLE) AS o
      FROM documents GROUP BY 1, 2
    ), r AS (
      SELECT lang, sum(o) AS rt FROM o GROUP BY 1
    ), c AS (
      SELECT source, sum(o) AS ct FROM o GROUP BY 1
    ), n AS (
      SELECT sum(o) AS n FROM o
    ), grid AS (
      SELECT r.lang, c.source, r.rt, c.ct, coalesce(o.o, 0.0) AS o
      FROM r CROSS JOIN c LEFT JOIN o USING (lang, source)
    )
    SELECT round(sum((g.o - g.rt * g.ct / n.n) * (g.o - g.rt * g.ct / n.n)
                     / (g.rt * g.ct / n.n)), 4) AS chi2,
           CAST(((SELECT count(*) FROM r) - 1)
                * ((SELECT count(*) FROM c) - 1) AS BIGINT) AS dof
    FROM grid g CROSS JOIN n
    """,
)
def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence for the lang x source
    contingency table (are languages distributed evenly across
    sources?), including zero-observation cells via the full
    marginal-grid cross join — the categorical drift/bias check. Counts
    are exact integers-as-doubles (order-independent sums); only the
    final statistic, a sum of ratios, needs rounding."""
    docs = load_table(spark, "documents", sf_dir)
    o = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).cast("double").alias("o"))
    r = o.groupBy("lang").agg(F.sum("o").alias("rt"))
    c = o.groupBy("source").agg(F.sum("o").alias("ct"))
    n = o.agg(F.sum("o").alias("n"))
    grid = (
        r.crossJoin(c)
        .join(o, ["lang", "source"], "left")
        .na.fill({"o": 0.0})
        .crossJoin(F.broadcast(n))
    )
    e = F.col("rt") * F.col("ct") / F.col("n")
    # dof derived inside the same aggregation — separate r.count()/
    # c.count() actions would rescan documents twice for two scalars
    return grid.agg(
        F.round(F.sum((F.col("o") - e) * (F.col("o") - e) / e), 4).alias("chi2"),
        ((F.count_distinct("lang") - 1) * (F.count_distinct("source") - 1))
        .cast("bigint")
        .alias("dof"),
    )


@query(
    "q_salted_agg",
    oracle="""
    SELECT o_custkey,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM orders GROUP BY 1
    """,
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase SALTED aggregation, driver-gate-certified: per-customer
    order totals where phase 1 shuffles on (key, salt) — a hot key's
    rows spread over 16 reducers instead of one straggler — and phase 2
    combines 16 partials per key. Salt-invariant by construction (exact
    integer cents compose regardless of which salt each row drew), which
    is precisely what the plain-groupBy oracle certifies."""
    from .operators.skew import salted_aggregate

    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    out = salted_aggregate(o, keys=["o_custkey"], sum_cols=["cents"], salt_n=16)
    return out.select(
        "o_custkey",
        F.col("sum_cents").cast("bigint").alias("sum_cents"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
    )


@query(
    "q_salted_join",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, n.n_name
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant SALTED join, driver-gate-certified: orders joined
    to the customer->nation dim through a salted key — the medium-dim
    case where the small side is replicated once per salt value and the
    large side's rows scatter across salt partitions, so one hot
    customer can't pin a single reducer. The plain-join oracle certifies
    salting never changes the result multiset."""
    from .operators.skew import salted_join

    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    dim = (
        load_table(spark, "customer", sf_dir)
        .join(
            F.broadcast(load_table(spark, "nation", sf_dir)),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("c_custkey").alias("o_custkey"), "n_name")
    )
    return salted_join(o, dim, on="o_custkey", salt_n=8, how="inner").select(
        "o_orderkey", "o_custkey", "n_name"
    )


_ZORDER_SCRATCH: list[str] = []


def _zorder_scratch_dir() -> str:
    """One tempdir per process for q_zorder_layout's parquet copy,
    removed at interpreter exit — bounds disk use across rotation/bench
    reruns (each call overwrites in place instead of mkdtemp-leaking)."""
    if not _ZORDER_SCRATCH:
        import atexit
        import shutil
        import tempfile

        d = tempfile.mkdtemp(prefix="dais_zorder_q_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        _ZORDER_SCRATCH.append(d)
    return _ZORDER_SCRATCH[0]


@query(
    "q_zorder_layout",
    oracle="SELECT * FROM lineitem",
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering write + scan-back — the plain-
    Spark build of Delta's OPTIMIZE ZORDER (reference runs OPTIMIZE at
    `00. Explore.py:90`): rows cluster on interleaved bits of
    (l_orderkey, l_partkey) so parquet min/max stats prune filtered
    scans on EITHER column. The driver hash certifies the layout is a
    pure reordering (content-identical to the source — the oracle is the
    source table); the pruning benefit itself is plan/stat-asserted in
    tests/test_scale_properties.py. The scratch dir is process-cached
    and atexit-cleaned (overwrite mode), so repeated rotation/bench
    invocations reuse ONE directory instead of leaking a full lineitem
    copy per call."""
    from .sources.tables import zorder_sort_for_skipping

    li = load_table(spark, "lineitem", sf_dir)
    out = _zorder_scratch_dir() + "/lineitem"
    zorder_sort_for_skipping(li, "l_orderkey", "l_partkey", n_files=8).write.mode(
        "overwrite"
    ).parquet(out)
    return spark.read.parquet(out)


@query(
    "q_burst_detection",
    oracle="""
    WITH b AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT event_type,
             CAST(count(*) AS DOUBLE) AS nb,
             CAST(sum(n_events) AS DOUBLE) AS sc,
             CAST(sum(n_events * n_events) AS DOUBLE) AS sxx
      FROM b GROUP BY 1
    )
    SELECT b.event_type, b.bucket, b.n_events
    FROM b JOIN s USING (event_type)
    WHERE s.nb > 1
      AND b.n_events > round(s.sc / s.nb
            + 3 * sqrt((s.nb * s.sxx - s.sc * s.sc) / (s.nb * (s.nb - 1))), 6)
    """,
)
def q_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection: hourly event buckets whose count exceeds the
    per-type mean by 3 sample standard deviations — the rate-anomaly
    alarm (traffic spikes, scraper storms). Bucket counts and their
    sums/squares are exact integers cast to double and the mean/var/sqrt
    tree is correctly-rounded IEEE on both engines; the threshold is
    still rounded to 6dp on BOTH sides (round-before-compare convention)
    so the strict '>' boundary cannot hinge on a last-ulp difference in
    expression evaluation at some other scale."""
    ev = _events(spark, sf_dir)
    b = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    s = b.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("nb"),
        F.sum("n_events").cast("double").alias("sc"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("double").alias("sxx"),
    )
    nb, sc, sxx = F.col("nb"), F.col("sc"), F.col("sxx")
    thresh = F.round(sc / nb + 3 * F.sqrt((nb * sxx - sc * sc) / (nb * (nb - 1))), 6)
    return (
        b.join(F.broadcast(s), "event_type")
        .filter((nb > 1) & (F.col("n_events") > thresh))
        .select("event_type", "bucket", F.col("n_events").cast("bigint").alias("n_events"))
    )


def _hits_oracle(iters: int = 4, round_dp: int = 9) -> str:
    """Unrolled HITS replay (the pagerank-oracle idiom): per iteration a
    rounded authority sum, max-normalize, rounded hub sum, max-normalize
    — max is order-independent, so only the sums need the rounding."""
    ctes = [
        """e AS MATERIALIZED (
      SELECT DISTINCT 's' || l_suppkey AS src, 'p' || l_partkey AS dst
      FROM lineitem
    ), h0 AS (
      SELECT DISTINCT src, 1.0 AS h FROM e
    )"""
    ]
    for t in range(1, iters + 1):
        ctes.append(f"""ar{t} AS MATERIALIZED (
      SELECT e.dst, round(sum(h.h), {round_dp}) AS a_raw
      FROM e JOIN h{t - 1} h ON e.src = h.src GROUP BY 1
    ), a{t} AS MATERIALIZED (
      SELECT dst, round(a_raw / (SELECT max(a_raw) FROM ar{t}), {round_dp}) AS a
      FROM ar{t}
    ), hr{t} AS MATERIALIZED (
      SELECT e.src, round(sum(a.a), {round_dp}) AS h_raw
      FROM e JOIN a{t} a ON e.dst = a.dst GROUP BY 1
    ), h{t} AS MATERIALIZED (
      SELECT src, round(h_raw / (SELECT max(h_raw) FROM hr{t}), {round_dp}) AS h
      FROM hr{t}
    )""")
    return (
        "\n    WITH " + ",\n    ".join(ctes)
        + f"""
    SELECT src AS node, 'hub' AS role, h AS score FROM h{iters}
    UNION ALL
    SELECT dst AS node, 'authority' AS role, a AS score FROM a{iters}"""
    )


@query("q_graph_hits", oracle=_hits_oracle())
def q_graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (4 fixed rounds, max-normalized) over the
    supplier->part bipartite graph: suppliers rank as hubs (breadth of
    important parts carried), parts as authorities (backed by strong
    suppliers) — the companion centrality to PageRank with the same
    certified-replay contract (per-round rounded sums + order-free max
    normalizer -> unrolled-CTE oracle)."""
    from .operators.graph import hits

    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    edges = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    ).distinct()
    return hits(edges, iters=4)


_RECURSIVE_SQL = """
WITH RECURSIVE up AS (
  SELECT doc_id, doc_id AS node, 0 AS depth FROM {tbl}
  UNION ALL
  SELECT doc_id, CAST(floor(node / 10) AS BIGINT) AS node, depth + 1 AS depth
  FROM up WHERE node >= 10
)
SELECT doc_id, CAST(max(depth) AS INT) AS depth,
       CAST(max(CASE WHEN node < 10 THEN node END) AS BIGINT) AS root_digit
FROM up GROUP BY doc_id
"""


@query("q_recursive_cte", oracle=_RECURSIVE_SQL.format(tbl="documents"))
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE executed BY SPARK (WITH RECURSIVE landed in Spark
    4): every document (including doc 0, whose walk terminates
    immediately at root digit 0) walks its decimal-trie ancestry
    (node -> node/10) to the root digit — the org-chart/BOM
    hierarchy-walk shape, one parent per node so UNION ALL recursion
    stays linear (Spark doesn't support UNION-dedup recursion yet;
    cyclic graphs go through graph.bfs_distances instead). The SAME SQL
    text runs on DuckDB as the oracle — the dialect-portable subset is
    the whole point."""
    load_table(spark, "documents", sf_dir).createOrReplaceTempView(
        "documents_recursive_src"
    )
    return spark.sql(_RECURSIVE_SQL.format(tbl="documents_recursive_src"))


@query(
    "q_revenue_share",
    oracle="""
    WITH n AS (
      SELECT n.n_name,
             sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    )
    SELECT n_name,
           CAST(cents AS BIGINT) AS revenue_cents,
           CAST(cents AS DOUBLE) / (SELECT CAST(sum(cents) AS DOUBLE) FROM n)
             AS share
    FROM n
    """,
)
def q_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total report (ratio_to_report): each nation's share of
    global order revenue via an unpartitioned window sum over the
    per-nation aggregate — 25 rows, so the infamous single-partition
    window is harmless AFTER aggregation (never window the raw fact
    table for a grand total). Exact cents integers; the share division
    runs on identical doubles in both engines — zero rounding."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    from pyspark.sql import Window

    agg = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("cents")
        )
    )
    total = F.sum("cents").over(Window.partitionBy())
    return agg.select(
        "n_name",
        F.col("cents").cast("bigint").alias("revenue_cents"),
        (F.col("cents").cast("double") / total.cast("double")).alias("share"),
    )


@query(
    "q_survival_curve",
    oracle="""
    WITH mx AS (
      SELECT max(ts) AS m FROM events
    ), entry AS (
      SELECT user_id, min(ts) AS entry FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), ev AS (
      SELECT e.user_id, e.entry, min(p.ts) AS ets
      FROM entry e LEFT JOIN events p
        ON p.user_id = e.user_id AND p.event_type = 'purchase'
       AND p.ts > e.entry
      GROUP BY e.user_id, e.entry
    ), durs AS (
      SELECT CAST(floor((epoch_us(coalesce(ets, mx.m)) - epoch_us(entry))
                        / 86400000000.0) AS BIGINT) AS dur,
             CASE WHEN ets IS NULL THEN 0 ELSE 1 END AS observed
      FROM ev CROSS JOIN mx
    ), days AS (
      SELECT dur AS day, CAST(sum(observed) AS BIGINT) AS n_events
      FROM durs WHERE observed = 1 GROUP BY 1
    ), risk AS (
      SELECT d.day, d.n_events, CAST(count(*) AS BIGINT) AS n_risk
      FROM days d JOIN durs u ON u.dur >= d.day
      GROUP BY d.day, d.n_events
    )
    SELECT day, n_risk, n_events,
           round(product(1.0 - CAST(n_events AS DOUBLE) / n_risk)
                 OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS survival
    FROM risk
    """,
)
def q_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for view->purchase conversion: each
    user enters at their first view, 'dies' at their first subsequent
    purchase, and is right-censored at the corpus horizon otherwise —
    the churn/time-to-event estimator. S(t) = prod over event days
    <= t of (1 - d_t/n_t) with the at-risk set n_t = users whose
    event-or-censor day >= t. Every count is exact; the hazard ratios
    are identical doubles in both engines; the cumulative product runs
    over the same ascending-day frame (rounded 6dp — window products
    may reassociate like window sums). The risk-set range join is
    |event days| x |users|, bounded by the corpus time span, never by
    raw event count."""
    ev = _events(spark, sf_dir)
    mx = ev.agg(F.max("ts").alias("m"))
    entry = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("entry"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"), F.col("ts").alias("p_ts")
    )
    first_purchase = (
        entry.join(
            p, (F.col("p_uid") == F.col("user_id")) & (F.col("p_ts") > F.col("entry")), "left"
        )
        .groupBy("user_id", "entry")
        .agg(F.min("p_ts").alias("ets"))
    )
    durs = first_purchase.crossJoin(F.broadcast(mx)).select(
        F.floor(
            (F.unix_micros(F.coalesce(F.col("ets"), F.col("m"))) - F.unix_micros(F.col("entry")))
            / 86400000000.0
        )
        .cast("bigint")
        .alias("dur"),
        F.when(F.col("ets").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("observed"),
    )
    days = (
        durs.filter(F.col("observed") == 1)
        .groupBy(F.col("dur").alias("day"))
        .agg(F.sum("observed").cast("bigint").alias("n_events"))
    )
    risk = (
        days.join(durs, durs["dur"] >= days["day"])
        .groupBy("day", "n_events")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_risk"))
    )
    from pyspark.sql import Window

    # dim-sized window: input is the per-DAY risk table (|distinct
    # integer durations| rows, post-agg), never event-sized
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hazard = 1.0 - F.col("n_events").cast("double") / F.col("n_risk")
    return risk.select(
        "day",
        "n_risk",
        "n_events",
        F.round(F.product(hazard).over(w), 6).alias("survival"),
    )


@query(
    "q_gini_spend",
    oracle="""
    WITH s AS (
      SELECT o_custkey,
             sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    ), r AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, o_custkey) AS rnk
      FROM s
    ), m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(cents) AS DOUBLE) AS tot,
             CAST(sum(CAST(rnk AS HUGEINT) * cents) AS DOUBLE) AS wsum
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           round(2.0 * wsum / (n * tot) - (n + 1) / n, 6) AS gini
    FROM m
    """,
)
def q_gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend concentration — the
    inequality/whale-dependence metric (0 = uniform, ->1 = one customer
    is the business). Exact cents, deterministic rank (cents then
    custkey tiebreak), and the rank-weighted sum rides HUGEINT/decimal —
    so the closed-form Gini is one IEEE expression on identical doubles.
    One aggregate + one global sort of |customers| rows (post-
    aggregation, so the sort input is dimension-sized)."""
    o = load_table(spark, "orders", sf_dir)
    s = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("cents")
    )
    from .operators.sort import parallel_global_rank

    # |customers| scales WITH the corpus (TPC-H: 150k x SF), so the rank
    # runs through parallel_global_rank — range partition, rank within
    # partitions, broadcast prefix offsets — never a single-reducer
    # window (VERDICT r6 item 3). Integer cents + unique custkey
    # tiebreak keep the two-pass rank bit-identical to the SQL window.
    r = parallel_global_rank(s, ["cents", "o_custkey"], rank_col="rnk").select(
        "cents", "rnk"
    )
    m = r.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("cents").cast("double").alias("tot"),
        # cast the OPERAND before multiplying: rnk*cents reaches ~8e19 at
        # the 100 TB envelope, past int64 — the product itself must be
        # decimal/HUGEINT, not just the sum (the q_groupwise_ols lesson)
        F.sum(F.col("rnk").cast("decimal(38,0)") * F.col("cents"))
        .cast("double")
        .alias("wsum"),
    )
    n, tot, wsum = F.col("n"), F.col("tot"), F.col("wsum")
    return m.select(
        n.cast("bigint").alias("n_customers"),
        F.round(2.0 * wsum / (n * tot) - (n + 1) / n, 6).alias("gini"),
    )


@query(
    "q_token_entropy",
    oracle="""
    WITH tf AS (
      SELECT t, CAST(count(*) AS DOUBLE) AS c FROM (
        SELECT unnest(string_split(text, ' ')) AS t FROM documents
      ) GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(c) AS DOUBLE) AS n FROM tf
    )
    SELECT CAST(tot.n AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab,
           round(sum(-(c / tot.n) * ln(c / tot.n)), 6) AS entropy_nats
    FROM tf CROSS JOIN tot
    GROUP BY tot.n
    """,
)
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the corpus unigram distribution (nats) plus
    vocabulary size — exp(entropy) is the 'effective vocabulary', the
    one-number diversity diagnostic next to the Zipf slope (a collapsed
    or templated corpus shows up as entropy far below ln(vocab)). One
    token-count shuffle; the p·ln p sum rounds 6dp (libm + accumulation
    order, the q_unigram_logprob convention)."""
    docs = load_table(spark, "documents", sf_dir)
    tf = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    tot = tf.agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    return (
        tf.crossJoin(F.broadcast(tot))
        .groupBy("n")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("vocab"),
            F.round(F.sum(-p * F.log(p)), 6).alias("entropy_nats"),
        )
        .select(
            F.col("n").cast("bigint").alias("n_tokens"),
            "vocab",
            "entropy_nats",
        )
    )


@query(
    "q_skew_diagnosis",
    oracle="""
    WITH l AS (
      SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS n_left
      FROM lineitem GROUP BY 1
    ), r AS (
      SELECT ps_partkey AS k, CAST(count(*) AS BIGINT) AS n_right FROM (
        SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey FROM lineitem
      ) GROUP BY 1
    )
    SELECT l.k AS join_key, l.n_left, r.n_right,
           CAST(l.n_left * r.n_right AS BIGINT) AS out_rows
    FROM l JOIN r ON l.k = r.k
    ORDER BY out_rows DESC, join_key
    LIMIT 10
    """,
)
def q_skew_diagnosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join skew diagnosis: the 10 join keys whose per-side
    multiplicity PRODUCT (= output rows they alone will generate)
    dominates a lineitem x part-supplier join — the report you run
    BEFORE a 100 TB join to decide between AQE skew splitting, salting,
    or key isolation. Two key-count aggregates and a tiny top-k; exact
    integers throughout."""
    li = load_table(spark, "lineitem", sf_dir)
    left = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_left")
    )
    right = (
        li.select(F.col("l_partkey").alias("k"), "l_suppkey")
        .distinct()
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_right"))
    )
    return (
        left.join(right, "k")
        .select(
            F.col("k").alias("join_key"),
            "n_left",
            "n_right",
            (F.col("n_left") * F.col("n_right")).cast("bigint").alias("out_rows"),
        )
        .orderBy(F.desc("out_rows"), F.asc("join_key"))
        .limit(10)
    )


@query(
    "q_share_of_parent",
    oracle="""
    WITH rev AS (
      SELECT r.r_name, n.n_name,
             sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    )
    SELECT r_name, n_name,
           CAST(cents AS BIGINT) AS revenue_cents,
           CAST(cents AS DOUBLE)
             / CAST(sum(cents) OVER (PARTITION BY r_name) AS DOUBLE)
             AS share_of_region
    FROM rev
    """,
)
def q_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical share-of-parent: each nation's revenue as a fraction
    of its region's total — the drill-down ratio every BI rollup needs,
    expressed as a window sum partitioned by the PARENT level over the
    already-aggregated child table (dimension-sized, so the window is
    cheap). Exact cents; the share division runs on identical doubles —
    zero rounding."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    from pyspark.sql import Window

    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("cents")
        )
    )
    parent = F.sum("cents").over(Window.partitionBy("r_name"))
    return rev.select(
        "r_name",
        "n_name",
        F.col("cents").cast("bigint").alias("revenue_cents"),
        (F.col("cents").cast("double") / parent.cast("double")).alias("share_of_region"),
    )


@query(
    "q_top_paths",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > 30*60*1000000 THEN 1 ELSE 0 END AS brk
      FROM events
    ), s AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM g
    ), paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM s GROUP BY 1, 2
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM paths WHERE converted = 1
    GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 10
    """,
)
def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 converting session paths: per (user, 30-min session) the
    ordered event-type sequence joined with '>', filtered to sessions
    containing a purchase, counted — the product-analytics 'what do
    converting journeys look like' staple. Path order is deterministic
    via (ts, event_id) sorting; the path strings themselves are the
    group keys, so everything downstream is exact counts with a
    lexicographic tiebreak."""
    from .operators.temporal import sessionize

    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    s = sessionize(ev, key="user_id", ts="ts", gap_minutes=30, order_tiebreak="event_id")
    paths = s.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda r: r["event_type"],
            ),
            ">",
        ).alias("path"),
        F.max(
            F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(F.lit(0))
        ).alias("converted"),
    )
    return (
        paths.filter(F.col("converted") == 1)
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(10)
    )


@query(
    "q_pareto_deciles",
    oracle="""
    WITH s AS (
      SELECT o_custkey,
             sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    ), r AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents DESC, o_custkey) AS rnk
      FROM s
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS DOUBLE) AS tot
      FROM r
    ), d AS (
      SELECT CAST(ceil(10.0 * r.rnk / m.n) AS INT) AS decile,
             CAST(sum(r.cents) AS BIGINT) AS cents,
             CAST(count(*) AS BIGINT) AS n_customers
      FROM r CROSS JOIN m GROUP BY 1
    )
    SELECT d.decile, d.n_customers, d.cents AS revenue_cents,
           CAST(sum(d.cents) OVER (ORDER BY d.decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / m.tot AS cum_share
    FROM d CROSS JOIN m
    """,
)
def q_pareto_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration curve: customers ranked by spend, split into
    top-10%...bottom-10% deciles, with each decile's revenue and the
    cumulative share — the '80/20' readout that pairs with the Gini
    scalar. Exact cents + deterministic rank; the cumulative share is an
    exact-integer running sum divided by an exact total — zero
    rounding."""
    o = load_table(spark, "orders", sf_dir)
    from pyspark.sql import Window

    from .operators.sort import parallel_global_rank

    s = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("cents")
    )
    # |customers| scales WITH the corpus (TPC-H: 150k x SF), so the rank
    # runs through parallel_global_rank (VERDICT r6 item 3) — the decile
    # cumulative window below stays plain, it sees exactly 10 rows.
    r = parallel_global_rank(
        s, [F.col("cents").desc(), F.col("o_custkey").asc()], rank_col="rnk"
    ).select("cents", "rnk")
    m = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("double").alias("tot"),
    )
    d = (
        r.crossJoin(F.broadcast(m))
        .groupBy(F.ceil(10.0 * F.col("rnk") / F.col("n")).cast("int").alias("decile"))
        .agg(
            F.sum("cents").cast("bigint").alias("revenue_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        )
    )
    # dim-sized window: exactly 10 decile rows
    cum = F.sum("revenue_cents").over(
        Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.crossJoin(F.broadcast(m.select("tot")))
        .select(
            "decile",
            "n_customers",
            "revenue_cents",
            (cum.cast("double") / F.col("tot")).alias("cum_share"),
        )
    )


@query(
    "q_global_rank",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(row_number() OVER (
             ORDER BY CAST(round(l_extendedprice * 100, 0) AS BIGINT) DESC,
                      l_orderkey, l_linenumber) AS BIGINT) AS rnk
    FROM lineitem
    """,
)
def q_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global row_number over the DATA-SIZED lineitem table — ranked by
    exact price cents with a unique (orderkey, linenumber) tiebreak —
    via parallel_global_rank: range partition, rank within partitions in
    parallel, add broadcast prefix offsets. The oracle is the plain SQL
    window; the whole point is that the ENGINE side never funnels the
    corpus through a single-reducer WindowExec (plan-asserted in
    tests/test_scale_properties.py) — the production answer to the
    r3 partitionless-window audit for corpus-sized ranking."""
    from .operators.sort import parallel_global_rank

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
    )
    ranked = parallel_global_rank(
        li,
        [F.col("cents").desc(), F.col("l_orderkey"), F.col("l_linenumber")],
        rank_col="rnk",
    )
    return ranked.select("l_orderkey", "l_linenumber", F.col("rnk").cast("bigint").alias("rnk"))


@query(
    "q_stickiness",
    oracle="""
    WITH du AS (
      SELECT DISTINCT date_trunc('week', CAST(ts AS DATE)) AS week,
             CAST(ts AS DATE) AS day, user_id
      FROM events
    ), daily AS (
      SELECT week, day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      FROM du GROUP BY 1, 2
    ), weekly AS (
      SELECT week, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
      FROM du GROUP BY 1
    )
    SELECT w.week,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(d.dau) AS BIGINT) AS dau_days,
           w.wau,
           CAST(floor(10000.0 * sum(d.dau) / (count(*) * w.wau)) AS BIGINT)
             AS stickiness_x10k
    FROM daily d JOIN weekly w USING (week)
    GROUP BY w.week, w.wau
    """,
)
def q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per week — mean daily actives over weekly
    actives, THE product-engagement ratio (1.0 = everyone active every
    day). Two distinct-count aggregates over (week, day, user) pairs +
    one broadcast join back; the ratio ships floor-scaled (exact
    rational of exact integers). Bounded by |weeks| x |actives|,
    never raw events."""
    ev = _events(spark, sf_dir)
    du = ev.select(
        F.date_trunc("week", F.col("ts").cast("date")).cast("date").alias("week"),
        F.col("ts").cast("date").alias("day"),
        "user_id",
    ).distinct()
    daily = du.groupBy("week", "day").agg(
        F.count_distinct("user_id").alias("dau")
    )
    weekly = du.groupBy("week").agg(F.count_distinct("user_id").alias("wau"))
    return (
        daily.join(F.broadcast(weekly), "week")
        .groupBy("week", "wau")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("dau").alias("dau_days"),
            F.floor(
                F.lit(10000.0) * F.sum("dau") / (F.count(F.lit(1)) * F.col("wau"))
            ).cast("bigint").alias("stickiness_x10k"),
        )
        .select("week", "n_days", "dau_days", "wau", "stickiness_x10k")
    )


@query(
    "q_vocab_coverage",
    oracle="""
    WITH tc AS MATERIALIZED (
      SELECT t, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
      GROUP BY t
    ), ranked AS MATERIALIZED (
      SELECT c, row_number() OVER (ORDER BY c DESC, t) AS rnk FROM tc
    ), tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_types
      FROM tc
    )
    SELECT k.vocab_size,
           CAST(sum(r.c) AS BIGINT) AS covered_tokens,
           t.n AS total_tokens,
           t.n_types,
           CAST(floor(10000.0 * sum(r.c) / t.n) AS BIGINT) AS coverage_x10k
    FROM (SELECT unnest([10, 50, 100, 500, 1000]) AS vocab_size) k
    JOIN ranked r ON r.rnk <= k.vocab_size
    CROSS JOIN tot t
    GROUP BY k.vocab_size, t.n, t.n_types
    """,
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: for candidate vocab sizes, the share
    of token OCCURRENCES covered by the top-k most frequent types — the
    Zipf-law curve that sizes tokenizer vocabularies and OOV budgets
    (complementing q_zipf_slope and q_bpe_fertility). Type counts rank
    once; the tiny size grid joins the ranked dictionary with a
    range predicate and sums covered mass.

    Only ranks <= max(vocab grid) are ever consumed, so the rank runs
    POST-LIMIT: TakeOrderedAndProject keeps a 1000-row heap per
    partition and the window orders exactly 1000 rows — never the full
    term dictionary, whose type count grows with N on web-scale corpora
    (typos/URLs/numerals; VERDICT r6 called the old full-dictionary
    window's 'bounded by the language' comment optimistic, and it was)."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    tc = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab_grid = [10, 50, 100, 500, 1000]
    # the heap bound derives from the grid it must dominate: extending
    # the grid cannot silently leave a size reading a truncated ranking
    max_k = max(vocab_grid)
    top = tc.orderBy(F.desc("c"), F.asc("t")).limit(max_k)
    # dim-sized window: exactly max_k rows, post-limit (the q_topk idiom)
    ranked = top.select(
        "c", F.row_number().over(Window.orderBy(F.desc("c"), F.asc("t"))).alias("rnk")
    )
    tot = tc.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_types")
    )
    sizes = local_rows_df(
        docs.sparkSession, [(k,) for k in vocab_grid], "vocab_size int"
    )
    return (
        sizes.join(ranked, F.col("rnk") <= F.col("vocab_size"))
        .groupBy("vocab_size")
        .agg(F.sum("c").alias("covered_tokens"))
        .crossJoin(F.broadcast(tot))
        .select(
            "vocab_size",
            "covered_tokens",
            F.col("n").alias("total_tokens"),
            "n_types",
            F.floor(F.lit(10000.0) * F.col("covered_tokens") / F.col("n"))
            .cast("bigint")
            .alias("coverage_x10k"),
        )
    )


@query(
    "q_auc_ranked",
    oracle="""
    WITH g AS (
      SELECT n_chars AS s, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos
      FROM documents GROUP BY 1),
    r AS (
      SELECT cnt, pos,
             CAST(COALESCE(sum(cnt) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS before
      FROM g),
    a AS (
      SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
             CAST(sum(cnt) - sum(pos) AS BIGINT) AS n_neg,
             CAST(sum(pos * (2 * before + cnt + 1)) AS BIGINT) AS s2
      FROM r)
    SELECT n_pos, n_neg,
           CAST((1000000 * (s2 - n_pos * (n_pos + 1))) // (2 * n_pos * n_neg) AS BIGINT) AS auc_x1e6
    FROM a
    """,
)
def q_auc_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of document length as a predictor of lang='en' — the
    Mann-Whitney rank statistic with midrank ties, ALL integer
    arithmetic (aggregates.ranked_auc), so the metric certifies
    bit-exact with zero float rounding. The classifier-evaluation
    metric every quality-model loop needs; near 0.5 here (length
    doesn't separate languages in this corpus), which the oracle
    confirms exactly rather than approximately."""
    docs = load_table(spark, "documents", sf_dir)
    return agg.ranked_auc(docs, F.col("lang") == "en", "n_chars")


@query(
    "q_spearman",
    oracle="""
    WITH rx AS (
      SELECT v AS vx, CAST(2 * COALESCE(sum(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + cnt + 1 AS BIGINT) AS r2x
      FROM (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS cnt
            FROM documents GROUP BY 1)),
    ry AS (
      SELECT v AS vy, CAST(2 * COALESCE(sum(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + cnt + 1 AS BIGINT) AS r2y
      FROM (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS v,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM documents GROUP BY 1)),
    j AS (
      SELECT r2x, r2y
      FROM (SELECT n_chars AS vx,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS vy
            FROM documents) d
      JOIN rx USING (vx) JOIN ry USING (vy)),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r2x) AS BIGINT) AS sx, CAST(sum(r2y) AS BIGINT) AS sy,
             CAST(sum(r2x * r2x) AS BIGINT) AS sxx,
             CAST(sum(r2y * r2y) AS BIGINT) AS syy,
             CAST(sum(r2x * r2y) AS BIGINT) AS sxy
      FROM j)
    SELECT n,
           CAST(floor(1000000.0 * (
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                  (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))) AS BIGINT) AS rho_x1e6
    FROM m
    """,
)
def q_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between character length and token
    count — the metric-correlation audit (are two quality signals
    redundant?). Midrank ties via the doubled-midrank integer idiom
    (aggregates.spearman_rho): every moment is an exact BIGINT and the
    only float step is the final sqrt+division, replayed identically by
    the oracle. Expect strongly positive (lengths co-vary) but not 1.0
    (ties + varying word lengths)."""
    from .operators.text import token_count

    docs = load_table(spark, "documents", sf_dir).select(
        "n_chars", token_count(F.col("text")).alias("n_tok")
    )
    return agg.spearman_rho(docs, "n_chars", "n_tok")

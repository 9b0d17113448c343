"""Scalar-function query registrations (SURVEY.md §2 G1-G4).

G1 regex extract mirrors the reference's path→label parse
(`01. Ingest.py:50-52`); G3 JSON mirrors the model UDF's json.dumps
probabilities (`02.a:231`) — here inverted: parse the `events.props` JSON
strings. Date/math/array functions are the engine-capability fill (G4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .registry import query


@query(
    "q_regexp_extract",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, 'Customer#([0-9]+)', 1) AS cust_num,
           CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS cust_num_int
    FROM customer
    """,
)
def q_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex group extraction (G1) — same shape as the reference's
    label-from-path regex `regexp_extract(path, "flower_photos/([^/]+)", 1)`
    (`01. Ingest.py:50-52`)."""
    c = load_table(spark, "customer", sf_dir)
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"Customer#([0-9]+)", 1).alias("cust_num"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).cast("bigint").alias("cust_num_int"),
    )


@query(
    "q_string_funcs",
    oracle="""
    SELECT n_nationkey,
           upper(n_name) AS name_upper,
           lower(n_name) AS name_lower,
           CAST(length(n_name) AS INT) AS name_len,
           substr(n_name, 1, 3) AS name_pre,
           concat(n_name, '-', CAST(n_regionkey AS VARCHAR)) AS name_tag,
           replace(n_name, 'A', '_') AS name_repl,
           trim('  pad  ') AS trimmed
    FROM nation
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions (G2 family: the reference's str.replace at
    `02.a:215` lifted to engine level)."""
    n = load_table(spark, "nation", sf_dir)
    return n.select(
        "n_nationkey",
        F.upper("n_name").alias("name_upper"),
        F.lower("n_name").alias("name_lower"),
        F.length("n_name").cast("int").alias("name_len"),
        F.substring("n_name", 1, 3).alias("name_pre"),
        F.concat_ws("-", F.col("n_name"), F.col("n_regionkey").cast("string")).alias(
            "name_tag"
        ),
        F.regexp_replace("n_name", "A", "_").alias("name_repl"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
    )


@query(
    "q_json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing_val
    FROM events
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON parse/serialize (G3): get_json_object over the events.props
    JSON strings — the inverse of the reference's json.dumps probability
    maps (`02.a:231`). from_json/to_json round-trip is covered in tests."""
    e = load_table(spark, "events", sf_dir)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        F.get_json_object("props", "$.missing").cast("bigint").alias("missing_val"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(date_part('day', o_orderdate) AS INT) AS order_day,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP) AS due_ts,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_epoch_start
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar functions (G4). due_ts: DATE + INTERVAL yields a
    timestamp-compatible value in both engines; datediff day-granularity."""
    o = load_table(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        (F.col("o_orderdate").cast("date") + F.expr("INTERVAL 30 DAYS"))
        .cast("timestamp")
        .alias("due_ts"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch_start"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS abs_disc,
           sqrt(l_quantity) AS sqrt_qty,
           round(ln(l_extendedprice + 1), 6) AS ln_price,
           round(pow(l_tax + 1, 2), 6) AS tax_sq,
           CAST(floor(l_quantity / 10) AS BIGINT) AS qty_bucket,
           CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct
    FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar functions (G4). libm-backed fns (sqrt/ln/pow) are
    rounded: IEEE mandates correctly-rounded sqrt but not ln/pow, so the
    last bits may differ between JVM and DuckDB's libm."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # abs/sqrt: IEEE-exact per-row → raw; ln/pow: libm, not correctly
        # rounded → round 6 on both sides
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc"),
        F.sqrt("l_quantity").alias("sqrt_qty"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("ln_price"),
        F.round(F.pow(F.col("l_tax") + 1, 2), 6).alias("tax_sq"),
        F.floor(F.col("l_quantity") / 10).cast("bigint").alias("qty_bucket"),
        F.ceil(F.col("l_discount") * 100).cast("bigint").alias("disc_pct"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           round(list_sum(CAST(embedding AS DOUBLE[])), 4) AS vec_sum,
           round(list_max(CAST(embedding AS DOUBLE[])), 6) AS vec_max,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar functions (G4) over the embedding column: size,
    element access, higher-order aggregate/filter (F.aggregate/F.filter —
    JVM-side, no Python). Elements cast float→double identically in both
    engines before summing; in-array order is fixed, so sums agree."""
    e = load_table(spark, "embeddings", sf_dir)
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double") + 0.0, 6).alias("first_elem"),
        F.round(
            F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("vec_sum"),
        F.round(F.array_max(emb_d), 6).alias("vec_max"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("int").alias(
            "n_positive"
        ),
    )


@query(
    "q_bpe_tokens",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' '))
                + (length(text) - len(string_split(text, ' ')) + 1) // 4
                AS BIGINT) AS bpe_tokens
    FROM documents
    """,
)
def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-word token estimate without a tokenizer model (words + chars/4,
    the BPE rule of thumb) — the cheap JVM-side stand-in for tiktoken-style
    counting over 100 TB of text."""
    from .operators.text import bpe_ish_token_estimate

    docs = load_table(spark, "documents", sf_dir)
    return docs.select("doc_id", bpe_ish_token_estimate(F.col("text")).alias("bpe_tokens"))


@query(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           json_keys(props)[1] AS first_key,
           CAST(json_extract_string(props, '$.' || json_keys(props)[1]) AS BIGINT) AS first_val,
           CAST(len(json_keys(props)) AS INT) AS n_keys
    FROM events
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column functions (G4): parse props into map<string,bigint>,
    then map_keys/map_values/size — the MAP branch of the type system the
    reference never touches."""
    e = load_table(spark, "events", sf_dir)
    m = F.from_json("props", "map<string,bigint>")
    return e.select(
        "event_id",
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.element_at(F.map_values(m), 1).alias("first_val"),
        F.size(m).cast("int").alias("n_keys"),
    )


@query(
    "q_higher_order_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS INT) AS n_pos,
           CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> abs(x) > 1.5)) AS INT)
             AS n_big,
           round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), 6)
             AS sum_sq,
           list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS max_abs
    FROM embeddings
    """,
)
def q_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array lambdas (transform/filter/aggregate) over the
    embedding column — the JVM-side array calculus that keeps vector math
    out of Python. Counts and max are exact; the aggregate fold rounds to
    6dp because DuckDB's list_sum accumulates in a different order than
    the sequential lambda fold."""
    emb = load_table(spark, "embeddings", sf_dir)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size(F.filter(v, lambda x: x > 0)).cast("int").alias("n_pos"),
        F.size(F.filter(v, lambda x: F.abs(x) > 1.5)).cast("int").alias("n_big"),
        F.round(
            F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("sum_sq"),
        F.array_max(F.transform(v, lambda x: F.abs(x))).alias("max_abs"),
    )


@query(
    "q_arg_max",
    oracle="""
    SELECT event_type, event_id AS top_event_id, value_cents AS top_value_cents FROM (
      SELECT event_type, event_id,
             CAST(round(value * 100, 0) AS BIGINT) AS value_cents,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY CAST(round(value * 100, 0) AS BIGINT) DESC, event_id DESC
             ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_arg_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax per group via max_by with a composite (value, id) ordering
    key — one hash aggregate, no window shuffle-and-sort (the window
    formulation is the ORACLE here precisely because it is the slower
    plan). Ties are impossible on the composite key (event_id unique), so
    both engines select identically. Money compared in integer cents."""
    e = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    key = F.struct(cents.alias("v"), F.col("event_id").alias("i"))
    return (
        e.groupBy("event_type")
        .agg(
            F.max_by("event_id", key).alias("top_event_id"),
            F.max(cents).alias("top_value_cents"),
        )
        .select("event_type", "top_event_id", "top_value_cents")
    )


@query(
    "q_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_var,
           CAST(json_extract(props, '$.k') IS NOT NULL AS BOOLEAN) AS has_k,
           json_extract_string(props, '$.k') AS k_str
    FROM events
    """,
)
def q_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured type (Spark 4): parse_json into the
    binary variant encoding, then typed variant_get path extraction —
    the open-schema ingestion path that skips per-dataset schemas while
    keeping columnar pushdown on extracted paths. The oracle pins the
    extracted values against DuckDB's JSON functions (the variant
    ENCODING is engine-private; its extraction semantics are not)."""
    e = load_table(spark, "events", sf_dir)
    v = F.parse_json(F.col("props"))
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_var"),
        F.try_variant_get(v, "$.k", "string").isNotNull().alias("has_k"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
    )

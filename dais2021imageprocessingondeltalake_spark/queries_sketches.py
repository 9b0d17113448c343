"""Bounded-memory sketch query registrations (round 3).

Both queries are EXACT despite the sketch in the plan — the sketch only
bounds the candidate set / pre-prunes the scan, and an exact second
phase confirms — so both carry full DuckDB oracles (the whole point of
the two-pass designs in operators/sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .operators import sketches as SK
from .registry import query


@query(
    "q_heavy_hitters",
    headline=True,
    oracle="""
    SELECT item, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS item FROM documents)
    GROUP BY item
    ORDER BY cnt DESC, item
    LIMIT 20
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-20 tokens via two-pass Misra-Gries (bounded memory, no
    full-cardinality shuffle): pass 1 keeps <=256 counters per partition
    in a narrow mapInPandas scan, pass 2 re-counts only the broadcast
    candidate union. The oracle is the PLAIN top-k — valid because the
    true 20th token count clears the n/(counters+1) recovery threshold
    (asserted in tests/test_sketches.py), which is exactly how the
    operator is sized for a 100 TB corpus."""
    docs = load_table(spark, "documents", sf_dir)
    tokens = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    return SK.heavy_hitters_exact(tokens, "tok", k=20, counters=256)


@query(
    "q_bloom_join",
    oracle="""
    SELECT l.* FROM lineitem l
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderkey = l.l_orderkey
                    AND o.o_totalprice > 300000)
    """,
)
def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join lineitem to high-value orders with an explicit broadcast
    Bloom filter pruning the lineitem scan before the exact confirming
    join (the manual form of Spark's runtime bloom-filter pushdown).
    False positives are removed by the confirming semi-join, so the
    result is EXACTLY the semi-join and the oracle is plain NOT-EXISTS-
    free SQL. At 100 TB the win is that only ~|matching orderkeys| of
    the lineitem scan reaches the shuffle."""
    li = load_table(spark, "lineitem", sf_dir)
    hot = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    return SK.bloom_filter_semi_join(li, hot, "l_orderkey")


@query(
    "q_count_min",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS t FROM documents
    ), tc AS MATERIALIZED (
      SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY t
    ), cms AS MATERIALIZED (
      SELECT j, substr(md5(CAST(j AS VARCHAR) || ':' || t), 1, 2) AS b,
             CAST(sum(c) AS BIGINT) AS cnt
      FROM tc CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)
      GROUP BY 1, 2
    ), top AS MATERIALIZED (
      SELECT t, c FROM tc ORDER BY c DESC, t LIMIT 30
    )
    SELECT top.t AS item, top.c AS exact_cnt,
           CAST(min(cms.cnt) AS BIGINT) AS cms_est
    FROM top JOIN cms
      ON cms.b = substr(md5(CAST(cms.j AS VARCHAR) || ':' || top.t), 1, 2)
    GROUP BY 1, 2
    """,
)
def q_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch point queries for the exact top-30 tokens, with
    the exact count alongside — the frequency-summary audit a streaming
    pipeline ships (est >= exact ALWAYS; the gap is the collision
    overcount the depth-4 min suppresses). The sketch is 4 x 256
    counters built with the md5-portable bucket idiom, so the ENTIRE
    sketch and every estimate replay bit-for-bit in the SQL oracle —
    unlike xxhash64 sketches, which are rows-only by contract. At 100 TB
    the sketch is the only frequency table that still fits anywhere:
    depth x width longs, mergeable across shards by counter addition
    (tested), broadcastable to any probe site."""
    docs = load_table(spark, "documents", sf_dir)
    tokens = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    cms = SK.cms_table(tokens, "tok", depth=4, hex_chars=2)
    exact = (
        tokens.groupBy(F.col("tok").alias("item"))
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    top = exact.orderBy(F.desc("exact_cnt"), F.asc("item")).limit(30)
    est = SK.cms_estimate(cms, top, depth=4, hex_chars=2)
    return top.join(est, "item").select("item", "exact_cnt", "cms_est")

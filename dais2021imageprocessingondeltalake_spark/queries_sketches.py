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

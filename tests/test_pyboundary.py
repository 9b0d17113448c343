"""Invariant tests for the rows-only Python-boundary ops (SURVEY.md §5.2
item 2): split disjointness, round-trip equality, binary-scan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from dais2021imageprocessingondeltalake_spark.catalog import load_table
from dais2021imageprocessingondeltalake_spark.operators.sampling import (
    ensure_min_partitions,
    random_split,
)
from dais2021imageprocessingondeltalake_spark.queries_pyboundary import (
    q_scan_binary,
    q_write_roundtrip,
)
from dais2021imageprocessingondeltalake_spark.sources.binaryfiles import make_png, png_size
from dais2021imageprocessingondeltalake_spark.sources.fixtures import (
    IMAGES_PER_LABEL,
    LABELS,
)

from .conftest import SF_DIR


def test_random_split_invariants(spark):
    docs = load_table(spark, "documents", SF_DIR).select("doc_id")
    train, val = random_split(docs, [0.6, 0.4], seed=12345)
    n_train, n_val, n_all = train.count(), val.count(), docs.count()
    assert n_train + n_val == n_all  # exhaustive
    assert train.join(val, "doc_id", "inner").count() == 0  # disjoint
    # seeded determinism: same split twice → identical membership
    train2, _ = random_split(docs, [0.6, 0.4], seed=12345)
    assert train.exceptAll(train2).count() == 0


def test_ensure_min_partitions(spark):
    docs = load_table(spark, "documents", SF_DIR)
    assert ensure_min_partitions(docs, 4).rdd.getNumPartitions() >= 4
    # already enough → no-op (no added shuffle)
    wide = docs.repartition(8)
    assert ensure_min_partitions(wide, 2).rdd.getNumPartitions() == 8


def test_write_roundtrip_lossless(spark):
    docs = load_table(spark, "documents", SF_DIR)
    back = q_write_roundtrip(spark, SF_DIR)
    assert back.count() == docs.count()
    assert set(back.columns) == set(docs.columns)
    assert back.select("doc_id", "text").exceptAll(docs.select("doc_id", "text")).count() == 0


def test_binary_scan_fixture(spark):
    df = q_scan_binary(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) == len(LABELS) * IMAGES_PER_LABEL
    assert {r["label"] for r in rows} == set(LABELS)
    assert all(r["length"] > 0 for r in rows)


def test_png_codec_roundtrip():
    png = make_png(12, 7, gray=100)
    assert png_size(png) == (12, 7)


def test_udtf_chunks_match_jvm_chunker_on_nonoverlap_config(spark):
    """The UDTF's 32/0-overlap chunks must equal chunk_documents with
    chunk_tokens=32, overlap=0 (modulo that op's extra chunk_len/ids) —
    one semantics, two execution paths."""
    from dais2021imageprocessingondeltalake_spark.operators.text import chunk_documents
    from dais2021imageprocessingondeltalake_spark.queries_pyboundary import q_udtf_chunks

    from .conftest import SF_DIR

    udtf_rows = {
        (r["doc_id"], r["chunk_id"], r["chunk"])
        for r in q_udtf_chunks(spark, SF_DIR).collect()
    }
    docs = load_table(spark, "documents", SF_DIR)
    jvm_rows = {
        (r["doc_id"], r["chunk_id"], r["chunk_text"])
        for r in chunk_documents(docs, "doc_id", chunk_tokens=32, overlap=0).collect()
    }
    assert udtf_rows == jvm_rows

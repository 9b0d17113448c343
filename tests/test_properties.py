"""Property-based tests (SURVEY.md §5.2 item 4, hypothesis): write/read
round-trips under random column subsets; stream==batch under random
stateless transforms. Example counts are small — each example spins Spark
jobs — but the properties cover the combinatorial surface unit cases
miss."""

from __future__ import annotations

import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dais2021imageprocessingondeltalake_spark.catalog import load_table
from dais2021imageprocessingondeltalake_spark.streaming.stream import batch_and_stream

from .conftest import SF_DIR

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, "documents", SF_DIR)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cols=st.sets(st.sampled_from(DOC_COLS), min_size=1).map(sorted))
def test_roundtrip_any_column_subset(spark, docs, cols):
    """A5/A6 property: any projection survives a parquet round-trip
    losslessly (schema + values)."""
    sub = docs.select(*cols)
    path = tempfile.mkdtemp(prefix="dais_prop_rt_") + "/t"
    sub.write.parquet(path)
    back = spark.read.parquet(path)
    assert back.schema == sub.schema
    assert back.exceptAll(sub).count() == 0
    assert sub.exceptAll(back).count() == 0


_TRANSFORMS = {
    "double_value": lambda df: df.select("event_id", (F.col("value") * 2).alias("v")),
    "upper_type": lambda df: df.select("event_id", F.upper("event_type").alias("t")),
    "filter_high": lambda df: df.filter(F.col("value") > 100).select("event_id"),
    "json_k": lambda df: df.select(
        "event_id", F.get_json_object("props", "$.k").cast("bigint").alias("k")
    ),
    "hour_bucket": lambda df: df.select(
        "event_id", F.date_trunc("hour", "ts").alias("h")
    ),
}


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(name=st.sampled_from(sorted(_TRANSFORMS)))
def test_stream_equals_batch_property(spark, name):
    """H2 property: ANY stateless transform yields identical results on
    the bounded and streaming plan of the same source."""
    batch, stream = batch_and_stream(spark, SF_DIR, _TRANSFORMS[name], "append")
    assert batch.exceptAll(stream).count() == 0
    assert stream.exceptAll(batch).count() == 0


def test_observe_metrics_piggyback(spark):
    """Observed metrics must match a separate aggregation without running
    one: one action yields both the data and the quality scalars."""
    from dais2021imageprocessingondeltalake_spark.catalog import load_table
    from dais2021imageprocessingondeltalake_spark.operators.relational import (
        observe_metrics,
    )

    docs = load_table(spark, "documents", SF_DIR)
    observed, obs = observe_metrics(
        docs,
        "quality",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("text").isNull() | (F.length("text") == 0), 1).otherwise(0)).alias(
            "n_empty"
        ),
        F.min(F.length("text")).alias("min_len"),
    )
    n = observed.count()  # the one action; metrics ride along
    got = obs.get
    assert got["n_rows"] == n
    assert got["n_empty"] == 0
    assert got["min_len"] >= 1

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


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(1, 5),               # key
            st.integers(0, 30),              # ts (days)
            st.sampled_from(["a", "b", "c"]),  # attr
        ),
        min_size=1,
        max_size=40,
    ),
    split_day=st.integers(0, 30),
)
def test_scd2_invariants_random_histories(spark, events, split_day):
    """SCD2 structural invariants on random event sequences: per key,
    versions tile time with no gaps or overlaps (valid_to == next
    valid_from), exactly one open current version, no two consecutive
    versions share an attribute (full collapse), and incremental folding
    at ANY time split equals the full rebuild."""
    from datetime import datetime, timedelta

    from dais2021imageprocessingondeltalake_spark.operators.temporal import (
        scd2_apply_history,
        scd2_from_history,
    )

    base = datetime(2024, 1, 1)
    rows = [(k, base + timedelta(days=d), a) for k, d, a in events]
    ev = spark.createDataFrame(rows, "id int, ts timestamp, v string")
    dim = scd2_from_history(ev, key="id", ts="ts", attr="v").collect()

    by_key: dict[int, list] = {}
    for r in sorted(dim, key=lambda r: (r["id"], r["valid_from"])):
        by_key.setdefault(r["id"], []).append(r)
    assert set(by_key) == {k for k, _, _ in events}
    for k, versions in by_key.items():
        assert sum(v["is_current"] for v in versions) == 1
        assert versions[-1]["is_current"] and versions[-1]["valid_to"] is None
        for prev, nxt in zip(versions, versions[1:]):
            assert prev["valid_to"] == nxt["valid_from"]  # tiling
            assert prev["v"] != nxt["v"]  # full collapse
        key_events = sorted((ts, a) for kk, ts, a in rows if kk == k)
        assert versions[0]["valid_from"] == key_events[0][0]

    cut = base + timedelta(days=split_day)
    b1, b2 = ev.filter(F.col("ts") <= cut), ev.filter(F.col("ts") > cut)
    if b1.count() and b2.count():
        folded = scd2_apply_history(
            scd2_from_history(b1, key="id", ts="ts", attr="v"),
            b2, key="id", ts="ts", attr="v",
        )
        assert sorted(map(tuple, folded.collect())) == sorted(map(tuple, dim))


def test_new_ops_partitioning_invariance(spark):
    """Operator results must be independent of the input's physical
    layout: chunking, shard packing, and SCD2 give bit-identical output
    whether the corpus arrives in 1 partition or 17."""
    from dais2021imageprocessingondeltalake_spark.operators.temporal import (
        scd2_from_history,
    )
    from dais2021imageprocessingondeltalake_spark.operators.text import (
        bpe_ish_token_estimate,
        chunk_documents,
        pack_token_shards,
    )

    docs = load_table(spark, "documents", SF_DIR)
    ev = load_table(spark, "events", SF_DIR).select("user_id", "ts", "event_type")
    for xform, frame in (
        (lambda d: chunk_documents(d, "doc_id"), docs),
        (
            lambda d: pack_token_shards(
                d, "source", "doc_id", bpe_ish_token_estimate(F.col("text")), 4096
            ).select("doc_id", "shard_id"),
            docs,
        ),
        (lambda d: scd2_from_history(d, key="user_id", ts="ts", attr="event_type"), ev),
    ):
        a = sorted(map(tuple, xform(frame.coalesce(1)).collect()))
        b = sorted(map(tuple, xform(frame.repartition(17)).collect()))
        assert a == b


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]),
        min_size=1,
        max_size=400,
    ),
    counters=st.integers(min_value=2, max_value=8),
)
def test_heavy_hitters_exact_whenever_threshold_holds(spark, data, counters):
    """Misra-Gries two-pass property: on ANY input, for every k where
    the true k-th count clears n/(counters+1), the result prefix equals
    the true top-k (the exactness guarantee the oracle relies on)."""
    from collections import Counter

    from dais2021imageprocessingondeltalake_spark.operators import sketches as SK

    df = spark.createDataFrame([(x,) for x in data], "item string").repartition(3)
    got = [
        (r["item"], r["cnt"])
        for r in SK.heavy_hitters_exact(
            df, "item", k=len(set(data)), counters=counters, validate=False
        ).collect()
    ]
    true = sorted(Counter(data).items(), key=lambda kv: (-kv[1], kv[0]))
    n = len(data)
    for k in range(1, len(true) + 1):
        if true[k - 1][1] > n / (counters + 1):
            assert got[:k] == true[:k], (k, counters, got[:k], true[:k])


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    big_keys=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=60),
    small_keys=st.sets(st.integers(min_value=0, max_value=50), max_size=10),
)
def test_bloom_semi_join_equals_semi_join(spark, big_keys, small_keys):
    """Bloom pruning + confirm == plain semi-join on ANY key sets
    (false positives must always die in the confirming join)."""
    from dais2021imageprocessingondeltalake_spark.operators import sketches as SK

    big = spark.createDataFrame([(k,) for k in big_keys], "k long")
    small = spark.createDataFrame([(k,) for k in small_keys] or [(-1,)], "k long")
    got = sorted(r["k"] for r in SK.bloom_filter_semi_join(big, small, "k", n_bits=1 << 10).collect())
    want = sorted(k for k in big_keys if k in (small_keys or {-1}))
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=300),
    n_parts=st.integers(min_value=1, max_value=9),
)
def test_parallel_global_rank_matches_sorted_enumeration(spark, vals, n_parts):
    """parallel_global_rank == rank-by-sorted-position on ANY input
    (heavy duplicates included — the unique id column is the tiebreak)
    and ANY partition count, including more partitions than rows."""
    from dais2021imageprocessingondeltalake_spark.operators.sort import (
        parallel_global_rank,
    )

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(4)
    got = {
        r["id"]: r["rnk"]
        for r in parallel_global_rank(
            df, [F.col("v"), F.col("id")], num_partitions=n_parts
        ).collect()
    }
    want = {
        rid: rank + 1
        for rank, (rid, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),  # score (heavy ties)
            st.booleans(),
        ),
        min_size=2,
        max_size=120,
    ).filter(lambda r: any(y for _, y in r) and any(not y for _, y in r))
)
def test_ranked_auc_matches_pairwise_on_random_inputs(spark, rows):
    """ranked_auc == the brute-force pairwise definition
    P(s_pos > s_neg) + 0.5*P(tie) on ANY input with both classes,
    heavy ties included."""
    from dais2021imageprocessingondeltalake_spark.operators.aggregates import ranked_auc

    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    num = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    # floor(1e6 * num / (n_pos*n_neg)) in exact integer arithmetic:
    # num is a multiple of 0.5, so 2*num is an exact int
    expected = (1_000_000 * int(2 * num)) // (2 * len(pos) * len(neg))
    df = spark.createDataFrame(
        [(s, 1 if y else 0) for s, y in rows], "s: bigint, y: int"
    )
    r = ranked_auc(df, F.col("y") == 1, "s").collect()[0]
    assert r["auc_x1e6"] == expected


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=3,
        max_size=100,
    ).filter(
        lambda r: len({x for x, _ in r}) > 1 and len({y for _, y in r}) > 1
    )
)
def test_spearman_matches_python_midranks_on_random_inputs(spark, rows):
    """spearman_rho == plain-Python Pearson on midranks on ANY input
    with variance in both columns (tie-heavy by construction)."""
    import math

    from dais2021imageprocessingondeltalake_spark.operators.aggregates import spearman_rho

    def midranks(vals):
        out, before = {}, 0
        for v in sorted(set(vals)):
            cnt = vals.count(v)
            out[v] = before + (cnt + 1) / 2
            before += cnt
        return [out[v] for v in vals]

    xs = midranks([r[0] for r in rows])
    ys = midranks([r[1] for r in rows])
    n = len(rows)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    rho = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    df = spark.createDataFrame(rows, "x: bigint, y: bigint")
    got = spearman_rho(df, "x", "y").collect()[0]["rho_x1e6"]
    assert abs(got - math.floor(1_000_000 * rho)) <= 1  # engine floats vs
    # Python floats may differ in the last ulp of rho; floor can flip by 1

"""Tests for operators/sketches.py: the exactness preconditions and the
bounded-memory claims the module docstring makes."""

from __future__ import annotations

from pyspark.sql import functions as F

from dais2021imageprocessingondeltalake_spark.catalog import load_table
from dais2021imageprocessingondeltalake_spark.operators import sketches as SK

from .conftest import SF_DIR


def _tokens(spark):
    docs = load_table(spark, "documents", SF_DIR)
    return docs.select(F.explode(F.split("text", " ")).alias("tok"))


def test_heavy_hitters_equals_plain_topk(spark):
    """Two-pass Misra-Gries must be EXACT when the recovery threshold
    holds — compare against the straight groupBy top-k."""
    toks = _tokens(spark)
    got = SK.heavy_hitters_exact(toks, "tok", k=15, counters=256).collect()
    want = (
        toks.groupBy(F.col("tok").alias("item"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("item"))
        .limit(15)
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_heavy_hitters_recovery_threshold_holds(spark):
    """The oracle-validity precondition: the true k-th count must exceed
    n/(counters+1), otherwise the sketch could miss a top-k item. This
    is the sizing rule a 100 TB run applies up front."""
    toks = _tokens(spark)
    n = toks.count()
    kth = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"))
        .limit(20)
        .collect()[-1]["cnt"]
    )
    assert kth > n / (256 + 1), (kth, n)


def test_misra_gries_partials_bounded(spark):
    """Pass 1 emits at most `counters` rows per partition — the bounded-
    memory contract (and the bound on what pass 2 broadcasts)."""
    toks = _tokens(spark).repartition(4)
    partials = SK.misra_gries_partials(toks, "tok", counters=64)
    per_part = (
        partials.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert all(r["n"] <= 64 for r in per_part), per_part
    # ... and the union still contains every sufficiently-frequent item
    n = toks.count()
    heavy = {
        r["tok"]
        for r in toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > n / 65)
        .collect()
    }
    cand = {r["item"] for r in partials.select("item").distinct().collect()}
    assert heavy <= cand, heavy - cand


def test_heavy_hitters_counters_validation():
    import pytest

    with pytest.raises(ValueError):
        SK.misra_gries_partials(None, "x", counters=0)


def test_bloom_semi_join_exact(spark):
    """Bloom pruning + confirming join == plain semi-join, exactly."""
    li = load_table(spark, "lineitem", SF_DIR)
    hot = (
        load_table(spark, "orders", SF_DIR)
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    got = SK.bloom_filter_semi_join(li, hot, "l_orderkey", n_bits=1 << 14)
    want = li.join(hot.distinct(), "l_orderkey", "left_semi")
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bloom_filter_prunes_scan(spark):
    """The broadcast-literal probe must kill most non-matching rows
    BEFORE the join: survivors ~= matches + fpp x non-matches, far below
    the full scan. With m >> n the false-positive add-on is tiny."""
    li = load_table(spark, "lineitem", SF_DIR)
    hot = (
        load_table(spark, "orders", SF_DIR)
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    n_total = li.count()
    n_match = li.join(hot.distinct(), "l_orderkey", "left_semi").count()
    bitmap = SK.bloom_bitmap(hot, "l_orderkey", n_bits=1 << 16, n_hashes=5)
    assert len(bitmap) == (1 << 16) // 64
    lut = F.array(*[F.lit(w).cast("long") for w in bitmap])
    cond = F.lit(True)
    for pos in SK._bloom_positions(F.col("l_orderkey"), 1 << 16, 5):
        word = F.element_at(lut, (pos / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        cond = cond & (word.bitwiseAND(bit) != 0)
    n_survivors = li.filter(cond).count()
    assert n_match <= n_survivors < n_match + 0.1 * (n_total - n_match), (
        n_match,
        n_survivors,
        n_total,
    )


def test_heavy_hitters_guard_raises_below_threshold(spark):
    """Runtime validity guard (round-4 ADVICE): a flat distribution whose
    k-th count cannot clear n/(counters+1) must raise, not silently
    return a wrong 'EXACT' top-k."""
    import pytest

    flat = spark.createDataFrame([(str(i),) for i in range(200)], "item string")
    with pytest.raises(ValueError, match="guaranteed exact"):
        SK.heavy_hitters_exact(flat, "item", k=5, counters=2)
    # validate=False keeps the old lazy, unguarded behavior — and on this
    # input it IS silently wrong (trimmed summaries miss items), which is
    # exactly what the guard now surfaces
    assert SK.heavy_hitters_exact(flat, "item", k=5, counters=2, validate=False).count() < 5


def test_heavy_hitters_guard_passes_and_matches_lazy(spark):
    """When the threshold holds, the validated (local) result equals the
    unvalidated lazy plan's result — the guard changes nothing else."""
    toks = _tokens(spark)
    got = SK.heavy_hitters_exact(toks, "tok", k=10, counters=256)
    lazy = SK.heavy_hitters_exact(toks, "tok", k=10, counters=256, validate=False)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in lazy.collect()]


def test_bloom_join_mixed_int_widths_no_false_negatives(spark):
    """xxhash64 is type-sensitive: int 5 and bigint 5 hash differently.
    The canonical-type cast (round-4 ADVICE) must make an int-keyed probe
    against a bigint-keyed build side equal the plain semi-join instead
    of Bloom-dropping every true match."""
    big = spark.createDataFrame([(i % 50,) for i in range(500)], "k int")
    small = spark.createDataFrame([(int(i),) for i in range(0, 50, 7)], "k bigint")
    got = SK.bloom_filter_semi_join(big, small, "k", n_bits=1 << 12)
    want = big.join(small.distinct(), "k", "left_semi")
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0


def test_bloom_join_incompatible_key_types_refused(spark):
    """Non-integral dtype mismatches are refused up front rather than
    silently hashed into false negatives."""
    import pytest

    big = spark.createDataFrame([("1",)], "k string")
    small = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError, match="dtypes differ"):
        SK.bloom_filter_semi_join(big, small, "k")


def test_cms_one_sided_error_and_exact_on_light_load(spark):
    """CMS invariants: estimate >= true count for EVERY item (one-sided
    error — the min over rows can only overcount), and with width far
    above distinct-count the estimate is exactly the true count."""
    toks = _tokens(spark)
    exact = {
        r["item"]: r["c"]
        for r in toks.groupBy(F.col("tok").alias("item"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    cms = SK.cms_table(toks, "tok", depth=4, hex_chars=2)
    probe = toks.select(F.col("tok").alias("item")).distinct()
    est = {
        r["item"]: r["cms_est"]
        for r in SK.cms_estimate(cms, probe, depth=4, hex_chars=2).collect()
    }
    assert set(est) == set(exact)
    assert all(est[i] >= exact[i] for i in exact), "CMS undercounted"
    # wide sketch (16^4 = 65536 buckets vs ~hundreds of distinct tokens):
    # collisions vanish, estimates become exact
    cms_wide = SK.cms_table(toks, "tok", depth=4, hex_chars=4)
    est_wide = {
        r["item"]: r["cms_est"]
        for r in SK.cms_estimate(cms_wide, probe, depth=4, hex_chars=4).collect()
    }
    assert est_wide == exact


def test_cms_estimate_absent_probe_returns_zero(spark):
    """Probing items that were NEVER inserted (ADVICE r4 → left-join +
    coalesce fix): each absent item must appear in the output — not be
    silently dropped by an inner join against the sparse sketch — and
    must estimate 0 whenever ANY of its depth buckets is untouched
    (min sees the 0), which a wide sketch makes near-certain."""
    toks = _tokens(spark)
    cms_wide = SK.cms_table(toks, "tok", depth=4, hex_chars=4)
    absent = spark.createDataFrame(
        [(f"__never_inserted_{i}__",) for i in range(20)], "item string"
    )
    est = {
        r["item"]: r["cms_est"]
        for r in SK.cms_estimate(cms_wide, absent, depth=4, hex_chars=4).collect()
    }
    assert len(est) == 20, "absent probe items were dropped from the output"
    # 16^4 buckets vs ~hundreds of inserted tokens: every absent item has
    # at least one untouched bucket with overwhelming probability
    assert all(v == 0 for v in est.values()), est


def test_cms_mergeable_across_shards(spark):
    """Sketches of disjoint shards merged by counter addition equal the
    sketch of the union — the mergeable-summaries property that makes
    CMS the federated/streaming counter."""
    toks = _tokens(spark)
    a = toks.filter(F.crc32(F.col("tok")) % 2 == 0)
    b = toks.filter(F.crc32(F.col("tok")) % 2 == 1)
    merged = (
        SK.cms_table(a, "tok")
        .unionByName(SK.cms_table(b, "tok"))
        .groupBy("j", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = SK.cms_table(toks, "tok")
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_cms_validation():
    import pytest

    with pytest.raises(ValueError):
        SK.cms_table(None, "x", depth=0)
    with pytest.raises(ValueError):
        SK.cms_table(None, "x", hex_chars=9)

"""Invariant tests for advanced operators: MERGE semantics, SCD2, as-of
correctness on hand-built frames, approx aggregates."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from dais2021imageprocessingondeltalake_spark.operators.merge import scd2_apply, upsert
from dais2021imageprocessingondeltalake_spark.operators.temporal import asof_join


def test_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["id", "val"]
    )
    source = spark.createDataFrame(
        [(2, "B", False), (4, "D", False), (3, "x", True)], ["id", "val", "del"]
    )
    out = {r["id"]: r["val"] for r in upsert(target, source, ["id"], delete_col="del").collect()}
    assert out == {1: "a", 2: "B", 4: "D"}  # 2 updated, 3 deleted, 4 inserted


def test_scd2_apply(spark):
    t0, t1 = datetime(2024, 1, 1), datetime(2024, 6, 1)
    current = spark.createDataFrame(
        [(1, "v1", t0, None), (2, "w1", t0, None)],
        "id int, val string, ts timestamp, valid_to timestamp",
    )
    updates = spark.createDataFrame(
        [(1, "v2", t1)], "id int, val string, ts timestamp"
    )
    out = scd2_apply(current, updates, ["id"], "ts").collect()
    rows = {(r["id"], r["val"]): r["valid_to"] for r in out}
    assert rows[(1, "v1")] == t1  # closed out
    assert rows[(1, "v2")] is None  # new open version
    assert rows[(2, "w1")] is None  # untouched
    assert len(out) == 3


def test_asof_join_handbuilt(spark):
    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 200, "p2"), (2, 50, "p3")],
        "k int, t long, name string",
    ).withColumn("t", F.timestamp_micros(F.col("t") * 1_000_000))
    right = spark.createDataFrame(
        [(1, 90, "c1"), (1, 150, "c2"), (1, 200, "c3"), (2, 60, "c4")],
        "k int, t long, rname string",
    ).withColumn("t", F.timestamp_micros(F.col("t") * 1_000_000))
    out = asof_join(left, right, on="k", ts="t", right_cols=["rname"], suffix="_r")
    got = {r["name"]: r["rname_r"] for r in out.collect()}
    # p1(t=100) → c1(90); p2(t=200) → c3(200, inclusive >=); p3(t=50) → none
    assert got == {"p1": "c1", "p2": "c3", "p3": None}


def test_asof_join_null_carried_column(spark):
    """Regression: a matched right row whose carried column is NULL must
    yield NULL — not a value stitched in from an older right row."""
    left = spark.createDataFrame([(1, 200, "p")], "k int, t long, name string")
    right = spark.createDataFrame(
        [(1, 90, "old"), (1, 150, None)], "k int, t long, val string"
    )
    out = asof_join(left, right, on="k", ts="t", right_cols=["val"], suffix="_r").collect()
    assert len(out) == 1
    # match is the t=150 row: val NULL, matched ts 150
    assert out[0]["val_r"] is None
    assert out[0]["t_r"] == 150


def test_approx_aggregates_run(spark):
    """approx_percentile / approx_count_distinct are the 100 TB path but
    engine-specific — assert sanity bounds, not oracle equality."""
    from dais2021imageprocessingondeltalake_spark.catalog import load_table

    from .conftest import SF_DIR

    ev = load_table(spark, "events", SF_DIR)
    row = ev.agg(
        F.expr("approx_percentile(value, 0.5)").alias("p50"),
        F.approx_count_distinct("user_id").alias("nu"),
    ).collect()[0]
    exact_p50 = ev.agg(F.expr("percentile(value, 0.5)")).collect()[0][0]
    exact_nu = ev.select("user_id").distinct().count()
    assert abs(row["p50"] - exact_p50) / exact_p50 < 0.1
    assert abs(row["nu"] - exact_nu) / exact_nu < 0.1


def test_gap_fill_step_aligns_grid_and_aggregate(spark):
    """The event bucketing must share the grid implied by `step` — with a
    15-minute step, a value at :20 belongs to the :15 cell, and the grid
    advances in 15-minute strides (a truncation/step mismatch would land
    every total on 0/ffill)."""
    from dais2021imageprocessingondeltalake_spark.operators.temporal import gap_fill

    rows = [
        ("a", datetime(2024, 1, 1, 10, 20, 0), 5.0),
        ("a", datetime(2024, 1, 1, 11, 5, 0), 7.0),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = {
        (r["bucket"].isoformat(), ): (r["total"], r["total_ffill"])
        for r in gap_fill(df, "k", "ts", F.sum("v"), step="15 minutes").collect()
    }
    assert out[("2024-01-01T10:15:00",)] == (5.0, 5.0)
    # the gap cells between the two events forward-fill the first value
    assert out[("2024-01-01T10:30:00",)] == (0.0, 5.0)
    assert out[("2024-01-01T10:45:00",)] == (0.0, 5.0)
    assert out[("2024-01-01T11:00:00",)] == (7.0, 7.0)
    assert len(out) == 4  # 10:15 .. 11:00 inclusive, 15-min stride


def test_gap_fill_rejects_calendar_steps(spark):
    import pytest

    from dais2021imageprocessingondeltalake_spark.operators.temporal import gap_fill

    df = spark.createDataFrame([("a", datetime(2024, 1, 1), 1.0)], ["k", "ts", "v"])
    with pytest.raises(ValueError, match="step unit"):
        gap_fill(df, "k", "ts", F.sum("v"), step="1 month")


def test_scd2_from_history_collapses_noop_runs(spark):
    """Consecutive equal attribute values must collapse into ONE version;
    out-of-order input must not change the result (order comes from ts)."""
    from dais2021imageprocessingondeltalake_spark.operators.temporal import (
        scd2_from_history,
    )

    t = lambda d: datetime(2024, 1, d)
    rows = [(1, t(3), "a"), (1, t(1), "a"), (1, t(2), "a"),
            (1, t(5), "b"), (1, t(7), "a"), (2, t(1), "x")]
    ev = spark.createDataFrame(rows, "id int, ts timestamp, v string")
    out = scd2_from_history(ev, key="id", ts="ts", attr="v")
    got = sorted(
        (r["id"], r["v"], r["valid_from"].day,
         r["valid_to"].day if r["valid_to"] else None, r["is_current"])
        for r in out.collect()
    )
    assert got == [
        (1, "a", 1, 5, False),   # days 1-3 collapse into one version
        (1, "a", 7, None, True),  # the value RETURNS — a new run, not merged
        (1, "b", 5, 7, False),
        (2, "x", 1, None, True),
    ]


def test_scd2_apply_history_equals_full_rebuild(spark):
    """Folding event batches incrementally through scd2_apply_history must
    produce exactly the dimension a full-history rebuild produces — for
    every batch split point, including out-of-order batches."""
    from dais2021imageprocessingondeltalake_spark.catalog import load_table
    from dais2021imageprocessingondeltalake_spark.operators.temporal import (
        scd2_apply_history,
        scd2_from_history,
    )

    from .conftest import SF_DIR

    ev = (
        load_table(spark, "events", SF_DIR)
        .filter(F.col("user_id") < 20)
        .select("user_id", "ts", "event_type")
    )
    full = scd2_from_history(ev, key="user_id", ts="ts", attr="event_type")
    split = F.col("user_id") % 2 == 0  # key-disjoint split
    ts_split = F.dayofmonth("ts") <= 15
    for b1_pred in (split, ts_split):
        b1, b2 = ev.filter(b1_pred), ev.filter(~b1_pred)
        dim = scd2_from_history(b1, key="user_id", ts="ts", attr="event_type")
        folded = scd2_apply_history(dim, b2, key="user_id", ts="ts", attr="event_type")
        assert sorted(map(tuple, folded.collect())) == sorted(
            map(tuple, full.collect())
        )


def test_sketch_rollup_accuracy_and_mergeability(spark):
    """The two-tier HLL rollup must estimate within lg_k=12's error bound
    of the exact per-group distinct count, and the union-of-buckets
    estimate must equal the single-pass sketch estimate (mergeability —
    splitting into buckets loses nothing)."""
    from dais2021imageprocessingondeltalake_spark.catalog import load_table
    from dais2021imageprocessingondeltalake_spark.operators.aggregates import (
        sketch_rollup,
    )

    from .conftest import SF_DIR

    ev = load_table(spark, "events", SF_DIR)
    got = {
        r["event_type"]: r["est_distinct"]
        for r in sketch_rollup(
            ev, "event_type", F.date_trunc("day", F.col("ts")), "user_id"
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])
    # mergeability: one bucket == many buckets
    single = {
        r["event_type"]: r["est_distinct"]
        for r in sketch_rollup(ev, "event_type", F.lit(1), "user_id").collect()
    }
    assert got == single


def test_scd2_multi_attribute(spark):
    """A version opens when ANY tracked attribute changes; single-attr
    tracking must reduce to scd2_from_history exactly."""
    from dais2021imageprocessingondeltalake_spark.operators.temporal import (
        scd2_from_history,
        scd2_from_history_multi,
    )

    t = lambda d: datetime(2024, 1, d)
    rows = [
        (1, t(1), "a", 10),
        (1, t(2), "a", 10),   # nothing changed: collapses
        (1, t(3), "a", 20),   # second attr changed: new version
        (1, t(4), "b", 20),   # first attr changed: new version
    ]
    ev = spark.createDataFrame(rows, "id int, ts timestamp, v string, w int")
    out = sorted(
        (r["v"], r["w"], r["valid_from"].day, r["is_current"])
        for r in scd2_from_history_multi(ev, "id", "ts", ["v", "w"]).collect()
    )
    assert out == [("a", 10, 1, False), ("a", 20, 3, False), ("b", 20, 4, True)]

    single = scd2_from_history(
        ev.select("id", "ts", "v"), key="id", ts="ts", attr="v"
    )
    multi = scd2_from_history_multi(ev.select("id", "ts", "v"), "id", "ts", ["v"])
    assert sorted(map(tuple, multi.collect())) == sorted(map(tuple, single.collect()))


def test_asof_join_tolerance(spark):
    """A match staler than the tolerance drops (all carried columns NULL
    together); within-tolerance matches are unchanged."""
    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 4000, "p2")], "k int, t long, name string"
    ).withColumn("t", F.timestamp_micros(F.col("t") * 1_000_000))
    right = spark.createDataFrame(
        [(1, 90, "c1")], "k int, t long, rname string"
    ).withColumn("t", F.timestamp_micros(F.col("t") * 1_000_000))
    out = {
        r["name"]: (r["rname_r"], r["t_r"])
        for r in asof_join(
            left, right, on="k", ts="t", right_cols=["rname"], suffix="_r",
            tolerance="60 seconds",
        ).collect()
    }
    assert out["p1"][0] == "c1"        # 10s stale: within tolerance
    assert out["p2"] == (None, None)   # ~65min stale: dropped entirely


def test_table_diff_upsert_roundtrip(spark):
    """CDC closure property: applying the diff-derived change feed to the
    old snapshot with MERGE semantics must reproduce the new snapshot
    bit-for-bit — diff and apply are true inverses."""
    from dais2021imageprocessingondeltalake_spark.catalog import load_table
    from dais2021imageprocessingondeltalake_spark.operators.merge import (
        table_diff,
        upsert,
    )

    from .conftest import SF_DIR

    old = load_table(spark, "orders", SF_DIR).select("o_orderkey", "o_totalprice")
    new = (
        old.filter(F.col("o_orderkey") % 97 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 13 == 0, F.round(F.col("o_totalprice") + 1.0, 2)
            ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        )
        .unionByName(
            old.filter(F.col("o_orderkey") % 101 == 0).select(
                (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
                "o_totalprice",
            )
        )
    )
    diff = table_diff(old, new, ["o_orderkey"], ["o_totalprice"])
    source = diff.select(
        "o_orderkey",
        F.coalesce("new_o_totalprice", "old_o_totalprice").alias("o_totalprice"),
        (F.col("change_type") == "delete").alias("__del"),
    )
    applied = upsert(old, source, ["o_orderkey"], delete_col="__del")
    assert sorted(map(tuple, applied.collect())) == sorted(map(tuple, new.collect()))


class TestFunnel:
    def test_hand_built_funnel(self, spark):
        """u1 completes all steps in order; u2 has the purchase BEFORE
        the click (must not count); u3 only views."""
        from datetime import datetime

        from dais2021imageprocessingondeltalake_spark.operators.temporal import funnel

        t = lambda m: datetime(2024, 1, 1, 0, m)
        rows = [
            (1, t(0), "view"), (1, t(1), "click"), (1, t(2), "purchase"),
            (2, t(0), "view"), (2, t(1), "purchase"), (2, t(5), "click"),
            (3, t(0), "view"),
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
        out = {r["user_id"]: r for r in funnel(df, ["view", "click", "purchase"]).collect()}
        assert out[1]["stage"] == 3
        assert out[2]["stage"] == 2 and out[2]["t_purchase"] is None
        assert out[3]["stage"] == 1 and out[3]["t_click"] is None

    def test_same_timestamp_does_not_advance(self, spark):
        from datetime import datetime

        from dais2021imageprocessingondeltalake_spark.operators.temporal import funnel

        ts = datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(1, ts, "view"), (1, ts, "click")], ["user_id", "ts", "event_type"]
        )
        out = funnel(df, ["view", "click"]).collect()[0]
        assert out["stage"] == 1 and out["t_click"] is None

    def test_needs_two_steps(self, spark):
        import pytest

        from dais2021imageprocessingondeltalake_spark.operators.temporal import funnel

        df = spark.createDataFrame([(1, 1, "view")], ["user_id", "ts", "event_type"])
        with pytest.raises(ValueError):
            funnel(df, ["view"])


class TestCohortRetention:
    def test_hand_built_matrix(self, spark):
        """u1 active weeks 0 and 2; u2 joins week 1, active weeks 1+2:
        cohort 0 -> offsets {0, 2}; cohort 1 -> offsets {0, 1}."""
        from datetime import datetime

        from dais2021imageprocessingondeltalake_spark.operators.temporal import (
            cohort_retention,
        )

        d = lambda day: datetime(1970, 1, 1 + day)
        rows = [
            (1, d(0)), (1, d(15)),          # weeks 0 and 2
            (2, d(8)), (2, d(15)),          # weeks 1 and 2
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts"])
        got = {
            (r["cohort_week"], r["week_offset"]): r["n_active"]
            for r in cohort_retention(df).collect()
        }
        assert got == {(0, 0): 1, (0, 2): 1, (1, 0): 1, (1, 1): 1}

    def test_offset_zero_counts_whole_cohort(self, spark):
        """Every user is active in their own first week, so offset 0 per
        cohort equals the cohort size."""
        from dais2021imageprocessingondeltalake_spark.operators.temporal import (
            cohort_retention,
        )
        from dais2021imageprocessingondeltalake_spark.queries_advanced import _events

        from .conftest import SF_DIR

        ev = _events(spark, SF_DIR).select("user_id", "ts")
        m = cohort_retention(ev)
        zero = {
            r["cohort_week"]: r["n_active"]
            for r in m.filter(F.col("week_offset") == 0).collect()
        }
        sizes = {
            r["cohort_week"]: r["n"]
            for r in ev.groupBy("user_id")
            .agg(
                (
                    F.min(
                        (
                            F.datediff(
                                F.col("ts").cast("date"),
                                F.lit("1970-01-01").cast("date"),
                            )
                            / 7
                        ).cast("bigint")
                    )
                ).alias("cw")
            )
            .groupBy("cw")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumnRenamed("cw", "cohort_week")
            .collect()
        }
        assert zero == sizes


class TestPagerank:
    def test_symmetric_pair_is_fixed_point(self, spark):
        """Two nodes pointing at each other: every iteration maps rank 1.0
        to 0.15 + 0.85*1.0 = 1.0 exactly."""
        from dais2021imageprocessingondeltalake_spark.operators.graph import pagerank

        e = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
        got = {r["node"]: r["rank"] for r in pagerank(e, iters=3).collect()}
        assert got == {"a": 1.0, "b": 1.0}

    def test_hub_outranks_leaves(self, spark):
        """Star graph (symmetrized): the center accumulates every leaf's
        whole rank, leaves split the center's."""
        from dais2021imageprocessingondeltalake_spark.operators.graph import pagerank

        edges = [("c", f"l{i}") for i in range(5)] + [(f"l{i}", "c") for i in range(5)]
        e = spark.createDataFrame(edges, ["src", "dst"])
        got = {r["node"]: r["rank"] for r in pagerank(e, iters=5).collect()}
        assert all(got["c"] > got[f"l{i}"] for i in range(5))

    def test_rank_mass_conserved(self, spark):
        """No dangling nodes (symmetrized graph) => sum of ranks stays
        |nodes| up to the per-iteration rounding."""
        from dais2021imageprocessingondeltalake_spark.operators.graph import pagerank

        edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "a"), ("a", "c")]
        e = spark.createDataFrame(edges, ["src", "dst"])
        ranks = pagerank(e, iters=4).collect()
        assert abs(sum(r["rank"] for r in ranks) - 3.0) < 1e-9

    def test_iters_validated(self, spark):
        import pytest

        from dais2021imageprocessingondeltalake_spark.operators.graph import pagerank

        e = spark.createDataFrame([("a", "b")], ["src", "dst"])
        with pytest.raises(ValueError):
            pagerank(e, iters=0)


class TestDataQuality:
    def test_planted_violations_counted(self, spark):
        from dais2021imageprocessingondeltalake_spark.operators import profile as P

        child = spark.createDataFrame(
            [(1, "x"), (1, "y"), (2, None), (9, "z")], ["k", "v"]
        )
        parent = spark.createDataFrame([(1,), (2,)], ["pk"])
        checks = {
            r["check"]: r["violations"]
            for df in (
                P.check_not_null(child, "v"),
                P.check_unique(child, ["k"]),
                P.check_foreign_key(child, "k", parent, "pk"),
                P.check_accepted_values(child, "v", ["x", "y"]),
            )
            for r in df.collect()
        }
        assert checks["not_null:v"] == 1
        assert checks["unique:k"] == 1   # one surplus row for k=1
        assert checks["fk:k"] == 1       # k=9 orphan
        assert checks["accepted:v"] == 1 # 'z' outside domain (NULL ignored)

    def test_profile_matches_hand_counts(self, spark):
        from dais2021imageprocessingondeltalake_spark.operators.profile import (
            profile_columns,
        )

        df = spark.createDataFrame(
            [(1, "a"), (2, None), (3, "a")], ["k", "v"]
        )
        prof = {r["column"]: r for r in profile_columns(df).collect()}
        assert prof["k"]["n_rows"] == 3 and prof["k"]["n_null"] == 0
        assert prof["k"]["n_distinct"] == 3
        assert prof["v"]["n_null"] == 1 and prof["v"]["n_distinct"] == 1
        assert prof["v"]["null_frac"] == round(1 / 3, 6)

    def test_corpus_integrity_is_clean(self, spark):
        """The synthetic warehouse must pass its own constraint suite —
        and the check names enumerate exactly the suite."""
        from dais2021imageprocessingondeltalake_spark.queries_advanced import (
            q_integrity_checks,
        )

        from .conftest import SF_DIR

        rows = {r["check"]: r["violations"] for r in q_integrity_checks(spark, SF_DIR).collect()}
        assert set(rows) == {
            "not_null:o_custkey", "unique:o_orderkey", "fk:o_custkey",
            "fk:l_orderkey", "accepted:o_orderstatus",
        }
        assert all(v == 0 for v in rows.values()), rows


class TestIncrementalAgg:
    def test_merge_equals_recompute(self, spark):
        from dais2021imageprocessingondeltalake_spark.operators.aggregates import (
            merge_agg_states,
            partial_agg_states,
        )

        df = spark.createDataFrame(
            [("a", 1), ("a", 5), ("b", 2), ("b", 8), ("a", 3)], ["k", "v"]
        )
        parts = [
            partial_agg_states(df.filter(F.col("v") % 2 == i), ["k"], "v")
            for i in range(2)
        ]
        merged = {r["k"]: r for r in merge_agg_states(parts, ["k"]).collect()}
        assert merged["a"]["n"] == 3 and merged["a"]["sum_v"] == 9
        assert merged["a"]["min_v"] == 1 and merged["a"]["max_v"] == 5
        assert merged["b"]["avg_v"] == 5.0

    def test_empty_states_rejected(self, spark):
        import pytest

        from dais2021imageprocessingondeltalake_spark.operators.aggregates import (
            merge_agg_states,
        )

        with pytest.raises(ValueError):
            merge_agg_states([], ["k"])


class TestTriangles:
    def test_hand_built_graph(self, spark):
        """K4 on {1,2,3,4} minus edge (3,4): triangles are (1,2,3) and
        (1,2,4) exactly, each emitted once."""
        from dais2021imageprocessingondeltalake_spark.operators.graph import triangles

        edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)]
        e = spark.createDataFrame(edges, ["doc_a", "doc_b"])
        got = sorted(
            (r["node_a"], r["node_b"], r["node_c"]) for r in triangles(e).collect()
        )
        assert got == [(1, 2, 3), (1, 2, 4)]

    def test_chain_has_no_triangles(self, spark):
        from dais2021imageprocessingondeltalake_spark.operators.graph import triangles

        e = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["doc_a", "doc_b"])
        assert triangles(e).count() == 0


class TestMarkovTransitions:
    def test_rows_are_probability_distributions(self, spark):
        from dais2021imageprocessingondeltalake_spark.queries_advanced import (
            q_markov_transitions,
        )

        from .conftest import SF_DIR

        rows = q_markov_transitions(spark, SF_DIR).collect()
        by_cur = {}
        for r in rows:
            by_cur.setdefault(r["cur"], 0.0)
            by_cur[r["cur"]] += r["p"]
        assert by_cur and all(abs(s - 1.0) < 1e-4 for s in by_cur.values()), by_cur

    def test_hand_built_chain(self, spark):
        from datetime import datetime

        from dais2021imageprocessingondeltalake_spark.queries_advanced import (
            q_markov_transitions,
        )
        from dais2021imageprocessingondeltalake_spark.operators.temporal import funnel  # noqa: F401

        # direct on a tiny frame via the same plan pieces
        from pyspark.sql import Window

        t = lambda m: datetime(2024, 1, 1, 0, m)
        ev = spark.createDataFrame(
            [(1, t(0), 1, "a"), (1, t(1), 2, "b"), (1, t(2), 3, "a"), (1, t(3), 4, "b")],
            ["user_id", "ts", "event_id", "event_type"],
        )
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        pairs = (
            ev.select(F.col("event_type").alias("cur"), F.lead("event_type").over(w).alias("nxt"))
            .filter(F.col("nxt").isNotNull())
            .groupBy("cur", "nxt")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        got = {(r["cur"], r["nxt"]): r["n"] for r in pairs}
        assert got == {("a", "b"): 2, ("b", "a"): 1}


class TestBfsDistances:
    def _run(self, spark, edges, seeds, max_hops=3):
        from dais2021imageprocessingondeltalake_spark.operators.graph import bfs_distances

        e = spark.createDataFrame(edges, "src string, dst string")
        s = spark.createDataFrame([(x,) for x in seeds], "node string")
        return {
            r["node"]: r["dist"]
            for r in bfs_distances(e, s, max_hops=max_hops).collect()
        }

    def test_hand_built_chain(self, spark):
        # a -> b -> c -> d -> e; 3 hops from a reaches d but not e
        edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
        got = self._run(spark, edges, ["a"], max_hops=3)
        assert got == {"a": 0, "b": 1, "c": 2, "d": 3}

    def test_min_distance_wins_over_longer_path(self, spark):
        # two routes a->d: direct edge (1 hop) and via b,c (3 hops)
        edges = [("a", "d"), ("a", "b"), ("b", "c"), ("c", "d")]
        got = self._run(spark, edges, ["a"], max_hops=3)
        assert got["d"] == 1

    def test_multi_source_takes_nearest_seed(self, spark):
        edges = [("a", "b"), ("b", "c"), ("z", "c")]
        got = self._run(spark, edges, ["a", "z"], max_hops=3)
        assert got == {"a": 0, "z": 0, "b": 1, "c": 1}

    def test_unreached_nodes_absent_and_early_exit(self, spark):
        # disconnected node q never appears; frontier empties at hop 2
        edges = [("a", "b"), ("q", "q2")]
        got = self._run(spark, edges, ["a"], max_hops=5)
        assert got == {"a": 0, "b": 1}

    def test_max_hops_validated(self, spark):
        import pytest

        from dais2021imageprocessingondeltalake_spark.operators.graph import bfs_distances

        with pytest.raises(ValueError):
            bfs_distances(None, None, max_hops=-1)


class TestMadOutliers:
    def test_planted_outlier_flagged_inlier_not(self, spark):
        from dais2021imageprocessingondeltalake_spark import queries_all  # noqa: F401
        from dais2021imageprocessingondeltalake_spark.registry import REGISTRY

        # run the registered query on sf0.001 and cross-check one group
        # by hand: every flagged value must sit > 3 MADs from the median
        import numpy as np

        from dais2021imageprocessingondeltalake_spark.queries_advanced import _events

        df = REGISTRY["q_mad_outliers"].fn(spark, "/root/testdata/sf0.001")
        flagged = {r["event_id"] for r in df.collect()}
        ev = _events(spark, "/root/testdata/sf0.001").select(
            "event_id", "event_type", "value"
        ).collect()
        by_type: dict = {}
        for r in ev:
            by_type.setdefault(r["event_type"], []).append((r["event_id"], r["value"]))
        for rows in by_type.values():
            vals = np.array([v for _, v in rows])
            med = float(np.median(vals))
            mad = float(np.median(np.abs(vals - med)))
            for eid, v in rows:
                assert (abs(v - med) > 3 * mad) == (eid in flagged), (eid, v, med, mad)


class TestHits:
    def test_star_graph_hub_and_authority(self, spark):
        """One supplier links every part, a second links one part: the
        first must be the max hub (score 1.0); every part linked only by
        the strong hub shares the max authority."""
        from dais2021imageprocessingondeltalake_spark.operators.graph import hits

        edges = [("s1", "p1"), ("s1", "p2"), ("s1", "p3"), ("s2", "p3")]
        e = spark.createDataFrame(edges, "src string, dst string")
        got = {(r["node"], r["role"]): r["score"] for r in hits(e, iters=4).collect()}
        assert got[("s1", "hub")] == 1.0
        assert got[("s2", "hub")] < 1.0
        # p3 has both suppliers -> strictly the top authority
        assert got[("p3", "authority")] == 1.0
        assert got[("p1", "authority")] == got[("p2", "authority")] < 1.0

    def test_scores_bounded_and_complete(self, spark):
        from dais2021imageprocessingondeltalake_spark.operators.graph import hits

        edges = [("a", "x"), ("b", "x"), ("b", "y"), ("c", "z")]
        e = spark.createDataFrame(edges, "src string, dst string")
        rows = hits(e, iters=3).collect()
        assert {(r["node"], r["role"]) for r in rows} == {
            ("a", "hub"), ("b", "hub"), ("c", "hub"),
            ("x", "authority"), ("y", "authority"), ("z", "authority"),
        }
        assert all(0 < r["score"] <= 1.0 for r in rows)

    def test_iters_validated(self, spark):
        import pytest

        from dais2021imageprocessingondeltalake_spark.operators.graph import hits

        with pytest.raises(ValueError):
            hits(None, iters=0)


def test_survival_curve_is_valid_km(spark):
    """KM invariants: survival within [0,1] (0 is legitimate — the last
    at-risk users all converting gives hazard 1), monotone
    non-increasing over days, first point equal to its own hazard
    complement, and the at-risk set never grows over time."""
    from dais2021imageprocessingondeltalake_spark import queries_all  # noqa: F401
    from dais2021imageprocessingondeltalake_spark.registry import REGISTRY

    rows = sorted(
        REGISTRY["q_survival_curve"].fn(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["day"],
    )
    assert rows
    prev_s, prev_n = 1.0, None
    for r in rows:
        assert 0 <= r["survival"] <= 1.0
        assert r["survival"] <= prev_s + 1e-9
        assert 0 < r["n_events"] <= r["n_risk"]
        if prev_n is not None:
            assert r["n_risk"] <= prev_n
        prev_s, prev_n = r["survival"], r["n_risk"]
    first = rows[0]
    assert first["survival"] == round(1.0 - first["n_events"] / first["n_risk"], 6)


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge plus a disconnected pair:
    each clique must converge to ONE internal label (majority voting),
    and the disconnected pair can never acquire a clique label (labels
    only travel along edges). Note min-tie-breaking means round 1 (all
    counts equal) behaves like min-propagation, so the bridge CAN carry
    the global minimum into the far clique — community separation is a
    majority effect, not guaranteed across a single bridge; the
    invariants below are the deterministic contract."""
    from dais2021imageprocessingondeltalake_spark.operators.graph import (
        label_propagation,
    )

    cliq1 = [(a, b) for a in "abcd" for b in "abcd" if a != b]
    cliq2 = [(a, b) for a in "wxyz" for b in "wxyz" if a != b]
    bridge = [("d", "w"), ("w", "d")]
    iso = [("q", "r"), ("r", "q")]
    edges = spark.createDataFrame(cliq1 + cliq2 + bridge + iso, ["src", "dst"])
    got = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iters=4).collect()
    }
    assert len({got[n] for n in "abcd"}) == 1, got
    assert len({got[n] for n in "wxyz"}) == 1, got
    # the disconnected pair's labels never leave {q, r} (labels only
    # travel along edges; synchronous updates may oscillate on a
    # 2-cycle, so equality between them is NOT guaranteed)
    assert {got["q"], got["r"]} <= {"q", "r"}
    assert got["a"] not in {"q", "r"} and got["w"] not in {"q", "r"}
    # and the result is a pure function of the input: rerun == same
    again = {
        r["node"]: r["community"]
        for r in label_propagation(edges, iters=4).collect()
    }
    assert again == got


def test_label_propagation_validation():
    import pytest

    from dais2021imageprocessingondeltalake_spark.operators.graph import (
        label_propagation,
    )

    with pytest.raises(ValueError):
        label_propagation(None, iters=0)


class TestRankedAuc:
    def test_perfect_separation(self, spark):
        from dais2021imageprocessingondeltalake_spark.operators.aggregates import ranked_auc
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(3, 1), (3, 1), (2, 1), (1, 0), (1, 0)], "s: bigint, y: int"
        )
        r = ranked_auc(df, F.col("y") == 1, "s").collect()[0]
        assert (r["n_pos"], r["n_neg"], r["auc_x1e6"]) == (3, 2, 1_000_000)

    def test_anti_separation_is_zero(self, spark):
        from dais2021imageprocessingondeltalake_spark.operators.aggregates import ranked_auc
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(1, 1), (2, 0)], "s: bigint, y: int")
        r = ranked_auc(df, F.col("y") == 1, "s").collect()[0]
        assert r["auc_x1e6"] == 0

    def test_all_tied_is_half(self, spark):
        """Midrank convention: a fully tied score column gives AUC 0.5
        exactly, not 0 or 1."""
        from dais2021imageprocessingondeltalake_spark.operators.aggregates import ranked_auc
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(2, 1), (2, 0), (2, 1), (2, 0)], "s: bigint, y: int"
        )
        r = ranked_auc(df, F.col("y") == 1, "s").collect()[0]
        assert r["auc_x1e6"] == 500_000

    def test_matches_pairwise_definition(self, spark):
        """AUC == P(score_pos > score_neg) + 0.5*P(tie), checked by
        brute-force pair enumeration on a small random-ish fixture."""
        from dais2021imageprocessingondeltalake_spark.operators.aggregates import ranked_auc
        from pyspark.sql import functions as F

        rows = [(s, y) for i, (s, y) in enumerate(
            [(5, 1), (3, 0), (3, 1), (8, 0), (1, 0), (5, 0), (7, 1), (2, 1), (3, 0), (9, 1)]
        )]
        pos = [s for s, y in rows if y == 1]
        neg = [s for s, y in rows if y == 0]
        num = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
        expected = int(1_000_000 * num) // (len(pos) * len(neg))
        df = spark.createDataFrame(rows, "s: bigint, y: int")
        r = ranked_auc(df, F.col("y") == 1, "s").collect()[0]
        assert r["auc_x1e6"] == expected


class TestSpearman:
    def _rho(self, spark, rows):
        from dais2021imageprocessingondeltalake_spark.operators.aggregates import spearman_rho

        df = spark.createDataFrame(rows, "x: bigint, y: bigint")
        return spearman_rho(df, "x", "y").collect()[0]["rho_x1e6"]

    def test_perfect_monotone(self, spark):
        assert self._rho(spark, [(i, 10 * i + 3) for i in range(1, 9)]) == 1_000_000

    def test_perfect_inverse(self, spark):
        assert self._rho(spark, [(i, -i) for i in range(1, 9)]) == -1_000_000

    def test_matches_python_midranks(self, spark):
        """Ties: engine result equals a plain-Python Pearson on midranks."""
        import math

        rows = [(1, 2), (2, 2), (2, 5), (3, 4), (3, 4), (4, 1), (5, 9), (5, 9)]

        def midranks(vals):
            out = {}
            before = 0
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
        assert self._rho(spark, rows) == math.floor(1_000_000 * rho)


class TestRankMetricEdges:
    def test_auc_single_class_is_null_not_error(self, spark):
        from dais2021imageprocessingondeltalake_spark.operators.aggregates import ranked_auc
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(1, 1), (2, 1)], "s: bigint, y: int")
        r = ranked_auc(df, F.col("y") == 1, "s").collect()[0]
        assert r["n_neg"] == 0 and r["auc_x1e6"] is None

    def test_auc_drops_null_scores(self, spark):
        from dais2021imageprocessingondeltalake_spark.operators.aggregates import ranked_auc
        from pyspark.sql import functions as F

        clean = [(3, 1), (2, 0), (1, 0)]
        with_nulls = clean + [(None, 1), (None, 0)]
        a = ranked_auc(
            spark.createDataFrame(clean, "s: bigint, y: int"), F.col("y") == 1, "s"
        ).collect()[0]
        b = ranked_auc(
            spark.createDataFrame(with_nulls, "s: bigint, y: int"),
            F.col("y") == 1,
            "s",
        ).collect()[0]
        assert (a["n_pos"], a["n_neg"], a["auc_x1e6"]) == (
            b["n_pos"],
            b["n_neg"],
            b["auc_x1e6"],
        )

    def test_spearman_drops_null_pairs(self, spark):
        from dais2021imageprocessingondeltalake_spark.operators.aggregates import spearman_rho

        clean = [(1, 10), (2, 20), (3, 30), (4, 25)]
        with_nulls = clean + [(None, 5), (7, None)]
        a = spearman_rho(
            spark.createDataFrame(clean, "x: bigint, y: bigint"), "x", "y"
        ).collect()[0]
        b = spearman_rho(
            spark.createDataFrame(with_nulls, "x: bigint, y: bigint"), "x", "y"
        ).collect()[0]
        assert (a["n"], a["rho_x1e6"]) == (b["n"], b["rho_x1e6"])

    def test_auc_continuous_scores_scalable_and_exact(self, spark):
        """VERDICT r6 item 5's done-criterion: a CONTINUOUS unrounded
        score column (every score distinct — distinct-count == N, the
        case where the retired midrank window became a single-reducer
        corpus sort) must pass scalably AND exactly. Exactness: with no
        ties AUC is the plain Mann-Whitney pair count. Scalability: the
        physical plan contains no partitionless Window (the prefix sum
        runs per-range-partition)."""
        import itertools

        from dais2021imageprocessingondeltalake_spark.operators.aggregates import (
            ranked_auc,
        )
        from pyspark.sql import functions as F

        rows = [
            (((i * 2654435761) % 997) / 997.0 + i * 1e-9, i % 3 == 0)
            for i in range(400)
        ]
        assert len({s for s, _ in rows}) == len(rows)  # genuinely continuous
        pos = [s for s, y in rows if y]
        neg = [s for s, y in rows if not y]
        num = sum(1 for p, q in itertools.product(pos, neg) if p > q)
        expected = (1_000_000 * 2 * num) // (2 * len(pos) * len(neg))
        df = spark.createDataFrame(rows, "s: double, y: boolean")
        out = ranked_auc(df, F.col("y"), "s")
        plan = out._jdf.queryExecution().executedPlan().toString()
        # EVERY Window node must be the per-range-partition one (keyed by
        # __pid) — 'no partitionless window anywhere', not merely 'the
        # parallel path exists somewhere' (which a regression could
        # satisfy while adding a single-reducer window alongside it)
        for line in plan.splitlines():
            if line.strip().startswith("Window ") or "WindowExec" in line:
                assert "__pid" in line, line
        r = out.collect()[0]
        assert (r["n_pos"], r["n_neg"]) == (len(pos), len(neg))
        assert r["auc_x1e6"] == expected

    def test_spearman_continuous_columns_scalable_and_exact(self, spark):
        """Same criterion for spearman_rho: continuous x and y (no ties,
        distinct-count == N) — rho must equal the closed-form Spearman on
        permutation ranks, and the midrank build must not be a
        partitionless window."""
        import math

        from dais2021imageprocessingondeltalake_spark.operators.aggregates import (
            spearman_rho,
        )

        n = 300
        rows = [
            (
                ((i * 2654435761) % 1009) / 1009.0 + i * 1e-9,
                ((i * 40503) % 1009) / 1009.0 + i * 1e-9,
            )
            for i in range(n)
        ]
        xs = sorted(range(n), key=lambda i: rows[i][0])
        ys = sorted(range(n), key=lambda i: rows[i][1])
        rank_x = {i: r + 1 for r, i in enumerate(xs)}
        rank_y = {i: r + 1 for r, i in enumerate(ys)}
        d2 = sum((rank_x[i] - rank_y[i]) ** 2 for i in range(n))
        rho = 1 - 6 * d2 / (n * (n * n - 1))
        df = spark.createDataFrame(rows, "x: double, y: double")
        r = spearman_rho(df, "x", "y").collect()[0]
        assert r["n"] == n
        assert r["rho_x1e6"] == math.floor(1_000_000 * rho)

    def test_drift_empty_slice_reports_zero(self, spark):
        from dais2021imageprocessingondeltalake_spark.operators.profile import drift_report
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(1, "b"), (2, "b")], "bin_val: bigint, side: string")
        rows = drift_report(
            df, in_a=F.col("side") == "a", bin_expr=F.col("bin_val")
        ).collect()
        assert all(r["chi2_x1e9"] == 0 for r in rows) and len(rows) == 2
